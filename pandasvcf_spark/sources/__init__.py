from pandasvcf_spark.sources.vcf import (
    VCFHeader,
    read_vcf,
    read_vcf_header,
    vcf_to_parquet,
)

__all__ = ["VCFHeader", "read_vcf", "read_vcf_header", "vcf_to_parquet"]
