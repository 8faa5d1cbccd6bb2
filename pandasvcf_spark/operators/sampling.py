"""Deterministic sampling, per-group capping, and sequence packing —
the corpus-shaping operators of a training-data pipeline (beyond-reference
extension surface, same family as operators/dedup.py).

Design rules shared by all three:
  * determinism is a feature, not an accident: sampling keys on a portable
    content hash (`poly_hash_expr` — exactly reproducible in ANSI SQL, so
    the oracle recomputes the same sample), never on RAND() or partition
    order;
  * every operator is a pure column/window plan — no Python, no collect;
  * the scale story is explicit: per-group windows shuffle by group key
    and parallelize across groups; the one inherently sequential operator
    (next-fit packing) takes a `shard_col` so each shard packs
    independently — the shape real pipelines use (pack within output
    shards), keeping the window partitioned instead of global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import poly_hash_expr


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic content-keyed sample: keep rows whose portable hash of
    `key` lands in the first `fraction` of `buckets` residue classes —
    `poly_hash(key) % buckets < fraction * buckets`.

    Unlike `df.sample()` (seeded per-partition RNG: resampling after a
    repartition or a rerun yields a DIFFERENT row set), this sample is a
    pure function of row content: stable across runs, partitionings and
    engines, and composable (a 1% sample is a subset of the same key's
    10% sample because the residue classes nest). The filter is a plain
    predicate — it pushes into scans of tables materialized with the hash
    column. Selection granularity is 1/buckets."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    k = F.col(key) if isinstance(key, str) else key
    threshold = int(round(fraction * buckets))
    return df.filter(
        poly_hash_expr(k.cast("string")) % F.lit(buckets) < F.lit(threshold)
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_by: list[Column | str],
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen by `order_by` (make it a
    TOTAL order — include a unique id as the last key — or the kept set is
    partition-dependent): the per-source / per-language / per-domain quota
    every corpus-balancing step needs.

    One window shuffle on the group key; groups process in parallel, and
    Spark's WindowGroupLimit pushes the rank<=cap cutoff below the sort,
    so a mega-group never materializes fully ranked."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: list[Column | str],
    shard_col: str | None = None,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Next-fit sequence packing: lay documents end-to-end in `order_by`
    order and chunk the token stream into bins of `budget` tokens — each
    doc gets the bin where its FIRST token lands (`bin_col`) and its token
    offset within that bin (`offset_col`). The assignment is a running
    exclusive prefix sum over one window: bin = floor(excl_cumsum/budget).
    A doc longer than the remaining bin space straddles into the next
    bin(s); the writer downstream decides split vs pad, this operator
    provides the deterministic layout.

    Packing a totally ordered stream is inherently sequential, so the
    GLOBAL form (shard_col=None) is a single-partition window — fine for
    one shard, wrong for a corpus. Pass `shard_col` to pack each shard
    independently (the window partitions by shard): that is exactly how
    production packing runs — documents are first sharded (e.g. by
    `hash_sample`'s hash mod n_shards), then each output shard packs its
    own stream in parallel. Bin ids are then per-shard."""
    parts = [F.col(shard_col)] if shard_col else []
    w = Window.partitionBy(*parts).orderBy(*order_by)
    toks = F.col(token_col).cast("long")
    excl = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return df.withColumn(bin_col, F.floor(excl / F.lit(budget))).withColumn(
        offset_col, excl % F.lit(budget)
    )
