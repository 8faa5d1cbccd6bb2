"""Physical-plan shape guards for the round-6 operators: the claims their
docstrings make about the plan (TakeOrdered not global sort, partial
aggregation, partitioned windows, zero shuffles) asserted against
`explain` output so a regression in plan shape fails fast, not just slow."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_is_take_ordered(spark):
    from pandasvcf_spark.operators.sampling import weighted_sample

    d = spark.range(1000).select(
        (F.col("id") * 7919).alias("k"), (F.col("id") % 5 + 1).alias("w")
    )
    plan = _plan(weighted_sample(d, "k", "w", k=20))
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort node


def test_kmv_is_take_ordered_with_partial_distinct(spark):
    from pandasvcf_spark.operators.sketches import kmv_distinct

    d = spark.range(1000).select(F.concat(F.lit("k"), "id").alias("k"))
    plan = _plan(kmv_distinct(d, "k", k=64))
    assert "TakeOrderedAndProject" in plan
    # map-side distinct: a HashAggregate below the exchange on h
    assert plan.count("HashAggregate") >= 2


def test_label_centroids_partial_aggregated(spark):
    from pandasvcf_spark.operators.similarity import label_centroids

    e = spark.range(100).select(
        (F.col("id") % 5).cast("int").alias("label"),
        F.array(*[F.rand(seed=i) for i in range(8)]).alias("embedding"),
    )
    plan = _plan(label_centroids(e, "label", "embedding"))
    # partial_avg before the exchange keeps the shuffle at labels x dims
    assert "partial_avg" in plan or "partial_average" in plan.lower()


def test_split_multiallelic_zero_shuffle(spark):
    from pandasvcf_spark.operators.reshape import split_multiallelic

    d = spark.createDataFrame(
        [(1, "G,T", "1/2")], "site long, ALT string, GT string"
    )
    plan = _plan(split_multiallelic(d))
    assert "Exchange" not in plan  # pure Generate + projection
    assert "Generate" in plan


def test_take_token_budget_window_is_partitioned(spark):
    from pandasvcf_spark.operators.sampling import take_token_budget

    d = spark.range(500).select(
        (F.col("id") * 31337).alias("k"), (F.col("id") % 97 + 1).alias("t")
    )
    out = take_token_budget(d, "t", budget=2000, key="k", buckets=8)
    plan = _plan(out)
    if "Window" in plan:
        # the boundary bucket's window partitions by __bkt — never a
        # single-partition global window
        assert "windowspecdefinition(__bkt" in plan.replace(" ", "").lower()


def test_merge_latest_single_window_shuffle(spark):
    from pandasvcf_spark.operators.relational import merge_latest

    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit(0).alias("ver")
    )
    upd = spark.range(50).select(F.col("id").alias("k"), F.lit(1).alias("ver"))
    plan = _plan(merge_latest(base, upd, ["k"], "ver"))
    # one key-partitioned exchange feeding the row_number window; union
    # itself must not add extra shuffles
    assert plan.count("Exchange hashpartitioning(k") == 1
