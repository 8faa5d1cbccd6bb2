"""pandasvcf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of erscott/pandasVCF, rebuilt Spark-first.

The reference (https://github.com/erscott/pandasVCF) is a pandas library that
parses VCF genomic files into DataFrames and derives per-genotype annotations.
This package re-expresses that surface as lazy, distributed Spark DataFrame
plans — declarative column expressions instead of Python row functions, one
static schema (samples as MAP<STRING,STRING>) instead of dynamic columns, and
zero joins in the core annotation path — plus the large-scale extension
operators (dedup, similarity search, text analysis, streaming) a 100 TB
training-data pipeline needs.

Layout:
    sources/    VCF reader (driver-side header parse + distributed body parse),
                parquet ingest.
    functions/  Column-expression builders: genomics (GT/zygosity/vartype),
                text analysis, vector math.
    operators/  Composite dataflows: annotate (wide->long genotype pipeline),
                dedup, similarity.
    plans/      SparkSession factory, tuning defaults, plan-inspection helpers.
    streaming/  Structured Streaming versions of the event operators.
"""

from pandasvcf_spark.plans.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
