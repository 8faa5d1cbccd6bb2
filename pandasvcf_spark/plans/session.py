"""SparkSession factory with scale-oriented defaults.

Tuned for correctness tests on local[N] but with configs chosen to also be
sane on a large cluster: AQE on (runtime coalesce + skew-join handling),
Arrow enabled for the few pandas-UDF paths, UTC session timezone so results
are reproducible against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[N] test harness; on a real cluster the same
# knobs apply, just sized to the executor fleet (shuffle partitions ~2-3x
# total cores; AQE coalesces the excess at runtime so overshooting is cheap).
_DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Read parquet TIMESTAMP(NANOS) columns as BIGINT instead of failing with
    # PARQUET_TYPE_ILLEGAL — set at session birth (not mutated in loaders) so
    # it is a declared property of the session, alongside the UTC pin.
    # queries/tables.load converts the raw nanos to microsecond TIMESTAMP.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128 MB input splits: big enough to amortize task overhead, small enough
    # that a partition's working set fits executor memory at 100 TB inputs.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "pandasvcf-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cpus: local parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to 2x cpus (AQE coalesces down at runtime).
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = 2 * int(cpus)
        except (TypeError, ValueError):
            shuffle_partitions = 2 * (os.cpu_count() or 8)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
