"""Testdata table loaders (see TESTDATA.md).

One quirk worth a loader: `events.parquet` has stored `ts` either as parquet
TIMESTAMP(NANOS) (unreadable natively — PARQUET_TYPE_ILLEGAL) or as
microsecond timestamp with isAdjustedToUTC=false (read back as
TIMESTAMP_NTZ, which `withWatermark` rejects). The loader normalizes both
to a session-tz TIMESTAMP at microsecond precision; with the session
timezone pinned to UTC (plans/session.py) the wall-clock values are
identical to DuckDB's naive timestamps, so derived values agree.
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
        # Sessions built by get_spark are born with nanosAsLong=true
        # (plans/session.py). For an externally-built session reading a
        # genuinely nanos-typed file, schema resolution raises here
        # (PARQUET_TYPE_ILLEGAL) — only then flip the conf, and leave it
        # set: the returned DataFrame is lazy, so a save/restore around
        # this call would be re-read as the OLD value at action time and
        # fail mid-job. Never mutated on the normal (micros/NTZ) path.
        try:
            df = spark.read.parquet(path)
        except Exception:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns since epoch -> microsecond TIMESTAMP (matches DuckDB epoch_us)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ wall clock -> session-tz (UTC) TIMESTAMP: same instant, and
            # the streaming operators can watermark it.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, suffix: str = ""
) -> list[str]:
    """Register every testdata table as a temp view so the whole engine
    surface is drivable from plain ``spark.sql`` — the declarative entry
    point the DataFrame catalog queries compile to anyway. Views are
    session-scoped and lazy (no data is read until queried); `suffix`
    namespaces two scale factors side by side (``register_views(spark,
    sf001, "_a")``). Returns the registered view names.

    The same `load` normalizations apply (events ts handling), so SQL
    over the views agrees with the DataFrame loaders and the DuckDB
    oracle to the value."""
    names = []
    for name in TABLE_NAMES:
        view = f"{name}{suffix}"
        load(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
