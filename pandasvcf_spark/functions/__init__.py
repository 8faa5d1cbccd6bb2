from pandasvcf_spark.functions import genomics, text, vectors

__all__ = ["genomics", "text", "vectors"]
