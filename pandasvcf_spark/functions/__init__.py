from pandasvcf_spark.functions import genomics, maps, text, udf_ext, vectors

__all__ = ["genomics", "maps", "text", "udf_ext", "vectors"]
