"""Testdata table loaders (see TESTDATA.md).

One quirk worth a loader: `events.parquet` stores `ts` as parquet
TIMESTAMP(NANOS) which Spark cannot read natively (PARQUET_TYPE_ILLEGAL).
The loader flips the legacy nanos-as-long conf (runtime-settable) and
rebuilds a proper TIMESTAMP at microsecond precision — the same truncation
DuckDB's epoch_us applies, so the two engines agree on derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # ns since epoch -> microsecond TIMESTAMP (matches DuckDB epoch_us)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)
