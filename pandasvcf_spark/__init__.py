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
                text analysis, vector math, map/JSON parsing, pandas-UDF
                extension surface.
    operators/  Composite dataflows: annotate (wide->long genotype pipeline),
                generic relational layer, dedup (exact/MinHash-LSH/SimHash),
                similarity search (cosine top-k, LSH ANN), TF-IDF,
                multimodal binary columns.
    plans/      SparkSession factory, tuning defaults.
    streaming/  Structured Streaming event operators (windows, sessions,
                watermark dedup) with oracle-checked batch twins.
    queries/    The declared catalog: one oracle-checked query per operator
                (drives __spark_entry__.py and bench.py).
"""

from pandasvcf_spark.plans.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
