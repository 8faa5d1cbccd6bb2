"""asof_join (operators/relational.py) point-in-time semantics."""

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.operators.relational import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 8, 1.0), (1, 10, 2.0), (1, 19, 3.0), (2, 30, 4.0)],
        "k long, t long, rv double",
    )
    return left, right


def _rows(df):
    return {
        r["lv"]: (r["matched_t"], r["matched_rv"]) for r in df.collect()
    }


def test_backward_latest_at_or_before(spark, frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="t", by=["k"]))
    assert got == {
        "a": (10, 2.0),  # equal timestamp IS matchable
        "b": (19, 3.0),  # latest <= 20
        "c": (None, None),  # right rows only in the future
        "d": (None, None),  # key absent on the right
    }


def test_forward_earliest_at_or_after(spark, frames):
    left, right = frames
    got = _rows(asof_join(left, right, on="t", by=["k"], direction="forward"))
    assert got == {
        "a": (10, 2.0),
        "b": (None, None),  # nothing at/after 20 for k=1
        "c": (30, 4.0),
        "d": (None, None),
    }


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(
            left,
            right,
            on="t",
            by=["k"],
            tolerance=lambda lt, mt: (lt - mt) <= F.lit(0),
        )
    )
    # only exact-time matches survive a zero tolerance; rows are KEPT
    assert got == {
        "a": (10, 2.0),
        "b": (None, None),
        "c": (None, None),
        "d": (None, None),
    }


def test_plan_has_no_join_node(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, on="t", by=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window only
    assert plan.count("Exchange") <= 2  # one per union branch, same key


def test_range_join_banded_no_theta_join(spark):
    from pandasvcf_spark.operators.relational import range_join

    points = spark.createDataFrame(
        [(1, 5, "p1"), (1, 100, "p2"), (1, 650, "p3"), (2, 5, "p4")],
        "k long, s long, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, 0, 120, "i1"), (1, 600, 700, "i2"), (3, 0, 1000, "i3")],
        "k long, lo long, hi long, iid string",
    )
    out = range_join(points, intervals, "s", "lo", "hi", by=["k"], bin_width=100)
    pairs = {(r["iid"], r["pid"]) for r in out.collect()}
    assert pairs == {("i1", "p1"), ("i1", "p2"), ("i2", "p3")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
