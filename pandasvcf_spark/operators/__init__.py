from pandasvcf_spark.operators.annotate import (
    annotate_genotypes,
    annotate_vcf,
    explode_genotypes,
)

__all__ = ["annotate_genotypes", "annotate_vcf", "explode_genotypes"]
