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


def test_event_funnel_hand_cases(spark):
    """event_funnel on hand-built sequences: in-order completes, out-of-
    order stalls, repeats don't double-advance, later re-attempts do
    advance, non-step events ignored."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import event_funnel

    rows = [
        # u1: full in-order completion (with noise)
        (1, "view", 1), (1, "noise", 2), (1, "signup", 3), (1, "purchase", 4),
        # u2: the early purchase never counts (out of order); the later
        # signup still advances to 2, but nothing completes step 3
        (2, "view", 1), (2, "purchase", 2), (2, "signup", 3),
        # u3: repeat of step 1 doesn't advance past it
        (3, "view", 1), (3, "view", 2), (3, "view", 3),
        # u4: stall then later completion
        (4, "signup", 1), (4, "view", 2), (4, "signup", 3), (4, "purchase", 4),
        # u5: only noise -> absent from output
        (5, "noise", 1),
    ]
    d = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        r.user: r.steps_completed
        for r in event_funnel(
            d, "user_id", "event_type", "ts", ["view", "signup", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 4: 3}


def test_event_funnel_validates_steps(spark):
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import event_funnel

    d = spark.createDataFrame([(1, "a", 1)], "u long, t string, ts long")
    with _pytest.raises(ValueError, match="steps"):
        event_funnel(d, "u", "t", "ts", [])


def test_event_funnel_repeated_steps(spark):
    """A funnel step can repeat ('purchase' twice): each occurrence must
    be satisfied by a distinct later event."""
    from pandasvcf_spark.operators.relational import event_funnel

    rows = [
        (1, "view", 1), (1, "purchase", 2), (1, "purchase", 3),  # completes
        (2, "view", 1), (2, "purchase", 2),  # only one purchase -> 2
    ]
    d = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        r.user: r.steps_completed
        for r in event_funnel(
            d, "user_id", "event_type", "ts", ["view", "purchase", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 2}


def test_event_funnel_ties_break_by_step_position(spark):
    """Equal-timestamp ties order by step POSITION, not event-type
    string: a simultaneous signup+purchase after a view advances both
    steps even though 'purchase' < 'signup' lexicographically."""
    from pandasvcf_spark.operators.relational import event_funnel

    rows = [
        (1, "view", 1), (1, "signup", 5), (1, "purchase", 5),
        # u2: simultaneous view+signup at the very start
        (2, "signup", 1), (2, "view", 1), (2, "purchase", 2),
    ]
    d = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        r.user: r.steps_completed
        for r in event_funnel(
            d, "user_id", "event_type", "ts", ["view", "signup", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 3}


def test_interval_overlap_join_model_and_plan(spark):
    """interval_overlap_join vs the brute-force model on hand intervals
    spanning multiple shared bins (the dedup-free first-shared-bin trick
    must emit each pair exactly once), plus the no-theta-join plan check."""
    from pandasvcf_spark.operators.relational import interval_overlap_join

    A = [(1, 0, 1000, "a1"), (1, 500, 520, "a2"), (2, 0, 100, "a3")]
    B = [(1, 900, 2500, "b1"), (1, 0, 2000, "b2"), (2, 200, 300, "b3")]
    a = spark.createDataFrame(A, "k long, s long, e long, aid string")
    b = spark.createDataFrame(B, "k long, bs long, be long, bid string")
    out = interval_overlap_join(
        a, b, "s", "e", "bs", "be", by=["k"], bin_width=100
    )
    got = {(r.aid, r.bid): r.overlap_len for r in out.collect()}
    want = {}
    for k1, s, e, aid in A:
        for k2, bs, be, bid in B:
            ov = min(e, be) - max(s, bs) + 1
            if k1 == k2 and ov >= 1:
                want[(aid, bid)] = ov
    assert got == want  # exactly once per pair, correct lengths
    assert ("a1", "b2") in got and got[("a1", "b2")] == 1001  # many shared bins
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_min_overlap_threshold(spark):
    from pandasvcf_spark.operators.relational import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 10, "a")], "k long, s long, e long, aid string")
    b = spark.createDataFrame([(1, 10, 20, "b")], "k long, bs long, be long, bid string")
    one = interval_overlap_join(a, b, "s", "e", "bs", "be", by=["k"], bin_width=5)
    assert one.count() == 1  # closed intervals touch at 10 -> overlap 1
    none = interval_overlap_join(
        a, b, "s", "e", "bs", "be", by=["k"], bin_width=5, min_overlap=2
    )
    assert none.count() == 0


def test_interval_overlap_reciprocal_fractions(spark):
    """bedtools -f/-r semantics: the overlap must cover the given
    fraction of each side's length."""
    from pandasvcf_spark.operators.relational import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 99, "a")], "k long, s long, e long, aid string"
    )  # len 100
    b = spark.createDataFrame(
        [(1, 50, 1049, "b")], "k long, bs long, be long, bid string"
    )  # len 1000, overlap 50
    kw = dict(by=["k"], bin_width=100)
    assert interval_overlap_join(
        a, b, "s", "e", "bs", "be", min_frac_left=0.5, **kw
    ).count() == 1  # 50 >= 0.5 * 100
    assert interval_overlap_join(
        a, b, "s", "e", "bs", "be", min_frac_left=0.6, **kw
    ).count() == 0
    assert interval_overlap_join(
        a, b, "s", "e", "bs", "be", min_frac_left=0.5, min_frac_right=0.5, **kw
    ).count() == 0  # reciprocal: 50 < 0.5 * 1000


def test_retention_matrix_hand_case(spark):
    """Two cohorts, hand-checkable comebacks (epoch seconds, 10s period):
    cohort 0 = {u1, u2} (u1 returns at ages 1 and 2, u2 only at 2);
    cohort 1 = {u3} (never returns)."""
    from pandasvcf_spark.operators.relational import retention_matrix

    rows = [
        (1, 0), (1, 12), (1, 25),   # u1: periods 0, 1, 2
        (2, 5), (2, 29),            # u2: periods 0, 2
        (3, 15),                    # u3: period 1 only
    ]
    d = spark.createDataFrame(rows, "user_id long, epoch long").select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {
        (r.cohort_period, r.age): (r.n_active, r.retention)
        for r in retention_matrix(
            d, "user_id", "ts", period_seconds=10
        ).collect()
    }
    assert out == {
        (0, 0): (2, 1.0),
        (0, 1): (1, 0.5),
        (0, 2): (2, 1.0),
        (1, 0): (1, 1.0),
    }


def test_transition_counts_hand_case(spark):
    from pandasvcf_spark.operators.relational import transition_counts

    rows = [
        (1, "a", 1), (1, "b", 2), (1, "a", 3),   # a->b, b->a
        (2, "a", 1), (2, "b", 2),                 # a->b
        (3, "c", 1),                              # no successor
    ]
    d = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        (r.from_type, r.to_type): r.n
        for r in transition_counts(d, "user_id", "event_type", "ts").collect()
    }
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_interval_overlap_derived_bin_width_and_guard(spark):
    """bin_width=None derives ~the median interval length (results
    identical to an explicit width); a pathological interval spanning
    more than max_bins_per_row bins raises with the remedy named instead
    of silently exploding the shuffle."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import interval_overlap_join

    A = [(1, 0, 1000, "a1"), (1, 500, 520, "a2"), (2, 0, 100, "a3")]
    B = [(1, 900, 2500, "b1"), (1, 0, 2000, "b2"), (2, 200, 300, "b3")]
    a = spark.createDataFrame(A, "k long, s long, e long, aid string")
    b = spark.createDataFrame(B, "k long, bs long, be long, bid string")
    derived = {
        (r.aid, r.bid): r.overlap_len
        for r in interval_overlap_join(
            a, b, "s", "e", "bs", "be", by=["k"]
        ).collect()
    }
    explicit = {
        (r.aid, r.bid): r.overlap_len
        for r in interval_overlap_join(
            a, b, "s", "e", "bs", "be", by=["k"], bin_width=100
        ).collect()
    }
    assert derived == explicit and derived

    # millisecond-scale interval against a seconds-scale width: error,
    # with the offending interval and the remedies in the message
    wide = spark.createDataFrame(
        [(1, 0, 10_000_000, "w")], "k long, s long, e long, aid string"
    )
    with _pytest.raises(Exception, match="bin_width"):
        interval_overlap_join(
            wide, b, "s", "e", "bs", "be", by=["k"], bin_width=5,
            max_bins_per_row=1000,
        ).collect()


def test_bloom_prune_no_false_negatives_and_join_equivalence(spark):
    """Every true match survives the prune (false negatives impossible);
    joining after the prune equals joining without it; false positives
    exist but are rare at the default sizing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import bloom_prune

    big = spark.range(20000).select(F.col("id").alias("k"),
                                    (F.col("id") % 7).alias("v"))
    small = spark.range(150).select((F.col("id") * 131).alias("k"))
    pruned = bloom_prune(big, "k", small, "k", m=8192, k=3)
    kept = {r.k for r in pruned.select("k").collect()}
    true_keys = {i * 131 for i in range(150) if i * 131 < 20000}
    assert true_keys <= kept  # no false negatives, ever
    fp = len(kept) - len(true_keys)
    assert fp < 2000  # sanity: ~1% regime, not a pass-through
    # composition: join after prune == join without prune
    direct = sorted(
        tuple(r) for r in big.join(small, "k").collect()
    )
    via_prune = sorted(
        tuple(r) for r in pruned.join(small, "k").collect()
    )
    assert direct == via_prune
    with _pytest.raises(ValueError, match="m >= 32"):
        bloom_prune(big, "k", small, "k", m=16)


def test_ewma_last_hand_case(spark):
    """Fold order and init-with-first: 10,20,30 at alpha 0.5 gives 22.5;
    NULL values never update; alpha validated."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import ewma_last

    rows = [
        (1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0),
        (2, 1, 5.0), (2, 2, None),
        (3, 1, None),
    ]
    d = spark.createDataFrame(rows, "u long, t long, v double")
    out = {
        r.key: (r.n_events, r.ewma)
        for r in ewma_last(d, "u", ["t"], "v", alpha=0.5).collect()
    }
    assert out == {1: (3, 22.5), 2: (1, 5.0)}  # u3 all-NULL -> absent
    with _pytest.raises(ValueError, match="alpha"):
        ewma_last(d, "u", ["t"], "v", alpha=0.0)


def test_forecasting_key_series_tripwire(spark):
    """The per-key collect_list contract is ENFORCED (round-12 verdict
    task 2): a skewed key above max_key_rows raises with the
    pre-aggregate re-route instruction in every forecasting-family
    operator; below the bound results are identical to the unguarded
    (max_key_rows=None) path; NULL values don't count toward the
    bound (they never enter the array)."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import (
        croston_forecast,
        ewma_last,
        holt_linear_last,
        holt_winters_last,
    )

    rows = [(1, t, float(t % 7)) for t in range(50)] + [
        (2, t, float(t)) for t in range(10)
    ]
    d = spark.createDataFrame(rows, "u long, t long, v double")
    for op, kw in (
        (ewma_last, {"alpha": 0.5}),
        (holt_linear_last, {}),
        (croston_forecast, {}),
        (holt_winters_last, {"m": 3}),
    ):
        with _pytest.raises(ValueError, match="max_key_rows"):
            op(d, "u", ["t"], "v", max_key_rows=20, **kw)
        guarded = sorted(
            map(tuple, op(d, "u", ["t"], "v", max_key_rows=100, **kw)
                .collect())
        )
        unguarded = sorted(
            map(tuple, op(d, "u", ["t"], "v", max_key_rows=None, **kw)
                .collect())
        )
        assert guarded == unguarded and len(guarded) == 2
    # NULLs are excluded before the fold, so they don't trip the bound
    nulls = spark.createDataFrame(
        [(1, t, None) for t in range(30)] + [(1, 30, 1.0)],
        "u long, t long, v double",
    )
    assert ewma_last(nulls, "u", ["t"], "v", 0.5,
                     max_key_rows=5).count() == 1


def test_rate_anomaly_flags_spike_and_handles_constant(spark):
    from datetime import datetime

    import pytest as _pytest

    from pandasvcf_spark.operators.relational import rate_anomaly

    def ts(h, i):
        return datetime(2026, 1, 1, h, 0, i)

    rows = (
        [(ts(h, i),) for h in range(6) for i in range(10)]  # 10/hour
        + [(ts(6, i),) for i in range(50)]                   # spike hour
    )
    d = spark.createDataFrame(rows, "ts timestamp")
    out = {r.bucket: (r.n, r.is_anomaly) for r in
           rate_anomaly(d, "ts", 3600, z_threshold=2.0).collect()}
    assert len(out) == 7
    spike = [b for b, (n, a) in out.items() if n == 50]
    assert len(spike) == 1 and out[spike[0]][1] is True
    assert all(a is False for b, (n, a) in out.items() if n == 10)

    const = spark.createDataFrame(
        [(ts(h, i),) for h in range(3) for i in range(5)], "ts timestamp"
    )
    rc = rate_anomaly(const, "ts").collect()
    assert all(r.z is None and r.is_anomaly is None for r in rc)
    with _pytest.raises(ValueError, match="bucket_seconds"):
        rate_anomaly(d, "ts", 0)


def test_resample_ffill_hand_case(spark):
    """Grid points carry the latest at-or-before observation; a leading
    grid point before the first observation stays NULL (strict LOCF);
    keys fill independently; step validates."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import resample_ffill

    rows = [(1, 105, 10.0), (1, 128, 20.0), (1, 131, 30.0), (2, 50, 5.0)]
    d = spark.createDataFrame(rows, "k long, e long, v double").select(
        "k", F.col("e").cast("timestamp").alias("ts"), "v"
    )
    out = sorted(
        (r.k, r.grid_ts, r.v)
        for r in resample_ffill(d, "k", "ts", "v", 10).collect()
    )
    assert out == [
        (1, 100, None), (1, 110, 10.0), (1, 120, 10.0), (1, 130, 20.0),
        (2, 50, 5.0),
    ]
    with _pytest.raises(ValueError, match="step_seconds"):
        resample_ffill(d, "k", "ts", "v", 0)


def test_interval_overlap_null_bounds_drop_not_crash(spark):
    """Rows with NULL start/end silently drop (sequence(NULL,...) is
    NULL, explode skips it) — the bin-span guard must not raise on the
    NULL condition (assert_true raises on NULL, so the guard carries an
    explicit isNull disjunct); non-NULL rows still match and the
    pathological-span error still fires."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import interval_overlap_join

    a = spark.createDataFrame(
        [(1, None, 100, "a_null_s"), (1, 50, None, "a_null_e"),
         (1, 10, 20, "a_ok")],
        "k long, s long, e long, aid string",
    )
    b = spark.createDataFrame(
        [(1, 15, 30, "b1")], "k long, bs long, be long, bid string"
    )
    out = interval_overlap_join(
        a, b, "s", "e", "bs", "be", by=["k"], bin_width=10
    ).collect()
    assert {(r.aid, r.bid) for r in out} == {("a_ok", "b1")}
    # NULL-bounded on the right side too
    b2 = spark.createDataFrame(
        [(1, 15, 30, "b1"), (1, None, None, "bnull")],
        "k long, bs long, be long, bid string",
    )
    out2 = interval_overlap_join(
        a, b2, "s", "e", "bs", "be", by=["k"], bin_width=10
    ).collect()
    assert {(r.aid, r.bid) for r in out2} == {("a_ok", "b1")}
    # the span guard still fires for real offenders alongside NULL rows
    mixed = spark.createDataFrame(
        [(1, None, 100, "n"), (1, 0, 10_000_000, "w")],
        "k long, s long, e long, aid string",
    )
    with _pytest.raises(Exception, match="bin_width"):
        interval_overlap_join(
            mixed, b, "s", "e", "bs", "be", by=["k"], bin_width=5,
            max_bins_per_row=1000,
        ).collect()


def test_corpus_diff_classification_and_null_safety(spark):
    """added/removed/changed classify against a hand fixture; a value
    changing to/from NULL counts as changed (IS DISTINCT FROM
    semantics); include_unchanged emits the full audit; compare_cols
    validates against both snapshots."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {r.k: r.change for r in corpus_diff(old, new, "k").collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    full = {
        r.k: r.change
        for r in corpus_diff(
            old, new, "k", include_unchanged=True
        ).collect()
    }
    assert full[1] == "unchanged" and len(full) == 5
    only_v = {
        r.k: r.change
        for r in corpus_diff(old, new, "k", compare_cols=["v"]).collect()
    }
    assert only_v == {3: "removed", 5: "added"}  # v never changed
    with _pytest.raises(ValueError, match="compare_cols"):
        corpus_diff(old, new, "k", compare_cols=["nope"])


def test_exact_quantiles_matches_sorted_definition(spark):
    """The bucketed two-pass result equals the type-1 / inverse-ECDF
    definition (sorted[max(0, ceil(n*p)-1)] — DuckDB quantile_disc; the
    floor((n-1)p) convention disagrees whenever frac(n*p) lands in
    (0, p], which an all-distinct column exposes) on data with
    duplicates and skew, at bucket counts above and below n; constant
    column short-circuits; all-null raises; probs validate."""
    import math

    import pytest as _pytest

    from pandasvcf_spark.operators.relational import exact_quantiles

    # all-distinct: every rank convention difference changes the VALUE
    distinct = list(range(1962))
    dd = spark.createDataFrame(
        [(float(v),) for v in distinct], "x double"
    ).repartition(8)
    got_d = {
        r.p: r.value for r in exact_quantiles(dd, "x", [0.75]).collect()
    }
    # ceil(1962*0.75)-1 = 1471 (floor((n-1)p) would give 1470)
    assert got_d == {0.75: 1471.0}

    vals = sorted(
        [(i * 37) % 211 for i in range(500)] + [7] * 100 + [211] * 3
    )
    d = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).repartition(8)
    probs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    n = len(vals)
    want = {p: float(vals[max(0, math.ceil(n * p) - 1)]) for p in probs}
    for buckets in (4, 64, 2048):
        got = {
            r.p: r.value
            for r in exact_quantiles(d, "x", probs, n_buckets=buckets)
            .collect()
        }
        assert got == want, (buckets, got, want)
    const = spark.range(50).select(F.lit(5.0).alias("x"))
    got_c = {
        r.p: r.value for r in exact_quantiles(const, "x", [0.1, 0.9]).collect()
    }
    assert got_c == {0.1: 5.0, 0.9: 5.0}
    allnull = spark.range(5).select(F.lit(None).cast("double").alias("x"))
    with _pytest.raises(ValueError, match="non-null"):
        exact_quantiles(allnull, "x", [0.5])
    with _pytest.raises(ValueError, match="probs"):
        exact_quantiles(d, "x", [])
    with _pytest.raises(ValueError, match="probs"):
        exact_quantiles(d, "x", [1.5])


def test_edit_distance_join_exactness_k1_k2(spark):
    """Symmetric-delete candidates + levenshtein verify equal the
    brute-force model for k=1 and k=2 on a hand set exercising
    substitution, insertion, deletion, transposition (dist 2 under
    plain Levenshtein), and no-match; NULLs drop; k validates."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import edit_distance_join

    L = [(1, "spark"), (2, "table"), (3, "abc"), (4, None)]
    R = [
        (10, "spark"),   # dist 0
        (11, "sparc"),   # substitution: 1
        (12, "sparky"),  # insertion: 1
        (13, "spak"),    # deletion: 1
        (14, "aspkr"),   # jumbled: >2 from spark? lev(spark,aspkr)
        (15, "tabel"),   # transposition: 2 (no damerau)
        (16, "cab"),     # lev(abc,cab)=2
        (17, None),
    ]
    left = spark.createDataFrame(L, "lid long, s string")
    right = spark.createDataFrame(R, "rid long, t string")

    def brute(k):
        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[len(b)]

        return {
            (i, j, lev(a, b))
            for i, a in L
            if a is not None
            for j, b in R
            if b is not None
            if lev(a, b) <= k
        }

    for k in (1, 2):
        got = {
            (r.lid, r.rid, r.dist)
            for r in edit_distance_join(
                left, right, "lid", "s", "rid", "t", k=k
            ).collect()
        }
        assert got == brute(k), (k, got, brute(k))
    with _pytest.raises(ValueError, match="k must be"):
        edit_distance_join(left, right, "lid", "s", "rid", "t", k=3)


# ---------------------------------------------------------------------------
# group_auc (Mann-Whitney rank AUC)
# ---------------------------------------------------------------------------


def test_group_auc_ties_one_class_and_perfect_separation(spark):
    import pytest

    from pandasvcf_spark.operators.relational import group_auc

    rows = [
        # group a: ties on 0.2 and 0.3 -> tie-averaged AUC 7/9
        ("a", 0.1, 0), ("a", 0.2, 0), ("a", 0.2, 1),
        ("a", 0.3, 1), ("a", 0.3, 0), ("a", 0.9, 1),
        # group b: positives only -> NULL (undefined, not 0.5)
        ("b", 1.0, 1), ("b", 1.0, 1),
        # group c: perfect separation -> 1.0
        ("c", 0.5, 0), ("c", 0.7, 1),
        # group d: anti-separation -> 0.0
        ("d", 0.9, 0), ("d", 0.1, 1),
    ]
    d = spark.createDataFrame(rows, "g string, s double, y int")
    out = {
        r.g: (r.n_pos, r.n_neg, r.auc)
        for r in group_auc(d, ["g"], "s", "y").collect()
    }
    assert out["a"] == (3, 3, round(7.0 / 9.0, 6))
    assert out["b"] == (2, 0, None)
    assert out["c"] == (1, 1, 1.0)
    assert out["d"] == (1, 1, 0.0)
    with pytest.raises(ValueError, match="group_cols"):
        group_auc(d, [], "s", "y")


# ---------------------------------------------------------------------------
# sorted_neighborhood_join
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_matches_single_window_model(spark):
    """Bucketed ranks + offsets must reproduce exactly the pairs a
    single global sort would produce, for every window size."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import (
        sorted_neighborhood_join,
    )

    rows = [
        (1, "anna"), (2, "annc"), (3, "annz"), (4, "bob"),
        (5, "bobb"), (6, "carl"), (7, "carla"), (8, "zed"),
    ]
    d = spark.createDataFrame(rows, "id int, k string").repartition(3)

    for w in (2, 3, 4):
        got = {
            (r.a_id, r.b_id)
            for r in sorted_neighborhood_join(d, "id", "k", window=w).collect()
        }
        # sequential model on the same total order (k, id)
        order = [i for i, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
        expect = {
            (order[i], order[j])
            for i in range(len(order))
            for j in range(i + 1, min(i + w, len(order)))
        }
        assert got == expect, (w, got ^ expect)


def test_sorted_neighborhood_verify_and_validation(spark):
    import pytest

    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import (
        sorted_neighborhood_join,
    )

    rows = [(1, "smith"), (2, "smyth"), (3, "smythe"), (4, "jones")]
    d = spark.createDataFrame(rows, "id int, k string")
    out = {
        (r.a_id, r.b_id): r.dist
        for r in sorted_neighborhood_join(
            d, "id", "k", window=3, max_dist=1
        ).collect()
    }
    # name order: jones, smith, smyth, smythe -> verified pairs are
    # smith~smyth (1) and smyth~smythe (1); every jones pair exceeds 1
    assert out == {(1, 2): 1, (2, 3): 1}
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_join(d, "id", "k", window=1)


# mutual_information (categorical association)


def test_mutual_information_hand_cases(spark):
    """Perfect dependence (y = f(x), uniform 2x2 diagonal): mi = ln 2,
    chi2 = n, V = 1. Independence (balanced product table): mi = 0,
    chi2 = 0, V = 0. Degenerate single-level column: dof 0, NULL V.
    NULL rows excluded from n."""
    import math

    from pandasvcf_spark.operators.relational import mutual_information

    # perfect dependence: (a,p) x10, (b,q) x10
    dep = spark.createDataFrame(
        [("a", "p")] * 10 + [("b", "q")] * 10 + [(None, "p"), ("a", None)],
        "x string, y string",
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert r["n"] == 20 and (r["r"], r["c"]) == (2, 2) and r["dof"] == 1
    assert abs(r["mi"] - round(math.log(2), 6)) < 1e-9
    assert abs(r["chi2"] - 20.0) < 1e-9
    assert abs(r["cramers_v"] - 1.0) < 1e-9

    # independence: every (x, y) combination equally often
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "pqr" for _ in range(5)],
        "x string, y string",
    )
    r = mutual_information(ind, "x", "y").collect()[0]
    assert r["n"] == 30 and (r["r"], r["c"]) == (2, 3) and r["dof"] == 2
    assert r["mi"] == 0.0 and r["chi2"] == 0.0 and r["cramers_v"] == 0.0

    # degenerate: one x level
    deg = spark.createDataFrame(
        [("a", "p")] * 3 + [("a", "q")] * 3, "x string, y string"
    )
    r = mutual_information(deg, "x", "y").collect()[0]
    assert (r["r"], r["c"], r["dof"]) == (1, 2, 0)
    assert r["mi"] == 0.0 and r["chi2"] == 0.0 and r["cramers_v"] is None


# ks_lift_table (decile lift/gain + KS separation)


def test_ks_lift_table_hand_case(spark):
    """Perfectly separating score: 20 rows, scores 1..20, positives =
    top 5 scores, 4 bins. KS must reach 1.0 at the last all-positive
    cumulative bin; lift of the top bin = pos_rate/base = 1/0.25 = 4."""
    from pandasvcf_spark.operators.relational import ks_lift_table

    rows = [(float(i), 1 if i > 15 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "sc double, y int")
    out = {r["bin"]: r for r in ks_lift_table(df, "sc", "y", n_bins=4).collect()}

    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[b]["n"] == 5 for b in out)
    top = out[1]
    assert top["n_pos"] == 5 and top["pos_rate"] == 1.0
    assert abs(top["lift"] - 4.0) < 1e-9
    assert abs(top["cum_pos_frac"] - 1.0) < 1e-9
    assert abs(top["cum_neg_frac"] - 0.0) < 1e-9
    assert abs(top["ks"] - 1.0) < 1e-9          # full separation
    assert out[4]["n_pos"] == 0
    assert abs(out[4]["cum_lift"] - 1.0) < 1e-9  # full corpus: lift 1
    assert abs(out[4]["ks"] - 0.0) < 1e-9


def test_ks_lift_table_ties_share_a_bin_and_one_class(spark):
    """A massively tied score collapses bins (ties never split across a
    boundary); an all-negative corpus yields NULL lift/ks columns."""
    from pandasvcf_spark.operators.relational import ks_lift_table

    tied = spark.createDataFrame(
        [(1.0, 1)] * 12 + [(0.0, 0)] * 4, "sc double, y int"
    )
    out = ks_lift_table(tied, "sc", "y", n_bins=4).collect()
    assert sum(r["n"] for r in out) == 16
    # the 12 tied 1.0 scores never split across a bin boundary
    sizes = sorted(r["n"] for r in out)
    assert sizes == [4, 12]
    big = next(r for r in out if r["n"] == 12)
    assert big["n_pos"] == 12
    small = next(r for r in out if r["n"] == 4)
    assert big["bin"] < small["bin"]   # higher scores in the lower bin id

    noneg = spark.createDataFrame(
        [(float(i), 0) for i in range(8)], "sc double, y int"
    )
    for r in ks_lift_table(noneg, "sc", "y", n_bins=2).collect():
        assert r["lift"] is None and r["ks"] is None
        assert r["cum_neg_frac"] is not None


def test_grouped_exact_quantiles_matches_definition(spark):
    """Fully distributed grouped quantiles equal the per-group type-1 /
    inverse-ECDF definition across skewed group sizes (including the
    n=1962/p=0.75 rank-convention witness), a constant group, and a
    group of all NULLs (absent from output). Validation raises on bad
    probs."""
    import math
    import random

    import pytest as _pytest

    from pandasvcf_spark.operators.relational import grouped_exact_quantiles

    rnd = random.Random(11)
    rows = []
    for g, sz in [("a", 1962), ("b", 17), ("c", 300)]:
        rows += [(g, float(int(rnd.uniform(0, 500)))) for _ in range(sz)]
    rows += [("const", 5.0)] * 9
    rows += [("nulls", None)] * 4
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    probs = [0.0, 0.25, 0.5, 0.75, 0.95, 1.0]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in grouped_exact_quantiles(df, ["g"], "v", probs,
                                         n_buckets=64).collect()
    }
    byg = {}
    for g, x in rows:
        if x is not None:
            byg.setdefault(g, []).append(x)
    for g, vals in byg.items():
        vals.sort()
        n = len(vals)
        for p in probs:
            assert got[(g, p)] == vals[max(0, math.ceil(n * p) - 1)], (g, p)
    assert len(got) == 4 * len(probs)
    assert not any(g == "nulls" for g, _ in got)

    with _pytest.raises(ValueError):
        grouped_exact_quantiles(df, ["g"], "v", [1.5])
    with _pytest.raises(ValueError):
        grouped_exact_quantiles(df, ["g"], "v", [])


# profile_table (one-pass column profiling)


def test_profile_table_hand_case(spark):
    """Typed stats per column family: numeric rows carry min/max/mean
    with NULL string stats and vice versa; null_frac exact; validation
    raises on unknown columns; approx mode still returns a row per
    column."""
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "b", None), (None, "a", 4.0)],
        "id long, s string, v double",
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    rid = got["id"]
    assert (rid["dtype"], rid["n_rows"], rid["n_null"]) == ("bigint", 4, 1)
    assert rid["null_frac"] == 0.25 and rid["n_distinct"] == 3
    assert (rid["min_num"], rid["max_num"], rid["mean"]) == (1.0, 3.0, 2.0)
    assert rid["min_str"] is None and rid["max_str"] is None
    rs = got["s"]
    assert (rs["min_str"], rs["max_str"]) == ("a", "b")
    assert rs["min_num"] is None and rs["mean"] is None
    rv = got["v"]
    assert (rv["min_num"], rv["max_num"]) == (1.5, 4.0)
    assert abs(rv["mean"] - round((1.5 + 2.5 + 4.0) / 3, 6)) < 1e-12

    with _pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, ["nope"])

    approx = {r["col_name"]: r for r in
              profile_table(df, exact_distinct=False).collect()}
    assert all(approx[c]["n_distinct"] >= 1 for c in approx)


# ols_fit (one-pass distributed OLS)


def test_ols_fit_recovers_coefficients(spark):
    """OLS on a planted linear model recovers the coefficients to the
    noise floor and matches numpy lstsq exactly on the same data;
    complete-case filtering drops NULL rows; collinear features raise;
    constant-y r2 is NULL."""
    import numpy as np
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import ols_fit

    rng = np.random.RandomState(0)
    x1 = rng.uniform(0, 10, 2000)
    x2 = rng.uniform(-5, 5, 2000)
    yv = 3.0 + 2.0 * x1 - 0.5 * x2 + rng.randn(2000)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, yv)]
    rows.append((None, 1.0, 1.0))  # dropped
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = {r["term"]: r["beta"] for r in
           ols_fit(df, "y", ["x1", "x2"]).collect()}
    A = np.column_stack([np.ones(2000), x1, x2])
    want, *_ = np.linalg.lstsq(A, yv, rcond=None)
    assert got["(n)"] == 2000.0
    assert abs(got["(intercept)"] - round(want[0], 6)) < 1e-6
    assert abs(got["x1"] - round(want[1], 6)) < 1e-6
    assert abs(got["x2"] - round(want[2], 6)) < 1e-6
    assert 0.9 < got["(r2)"] <= 1.0

    dup = df.withColumn("x3", F.col("x1") * 2)
    with _pytest.raises(ValueError, match="singular"):
        ols_fit(dup, "y", ["x1", "x3"])

    const = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "x1 double, y double"
    )
    gotc = {r["term"]: r["beta"] for r in
            ols_fit(const, "y", ["x1"]).collect()}
    assert gotc["(r2)"] is None


# seasonal_profile + benford_screen


def test_seasonal_profile_hand_case(spark):
    """Two days of traffic: type A fires 3x at hour 2 and 1x at hour 5
    each day; missing (date, hour) cells are missing, not zero (hour 5
    on day 2 absent -> n_days 1). z is computed within each key's own
    profile; a constant profile gives NULL z."""
    from pandasvcf_spark.operators.relational import seasonal_profile

    rows = []
    for d in ["2024-01-01", "2024-01-02"]:
        rows += [("A", f"{d} 02:0{i}:00") for i in range(3)]
    rows += [("A", "2024-01-01 05:00:00")]
    rows += [("B", "2024-01-01 07:00:00"), ("B", "2024-01-02 07:30:00")]
    df = spark.createDataFrame(rows, "k string, ts_s string").select(
        "k", F.to_timestamp("ts_s").alias("ts")
    )
    got = {(r["key"], r["hod"]): r for r in
           seasonal_profile(df, "k", "ts").collect()}
    a2, a5 = got[("A", 2)], got[("A", 5)]
    assert (a2["n_days"], a2["mean_cnt"]) == (2, 3.0)
    assert (a5["n_days"], a5["mean_cnt"]) == (1, 1.0)
    assert a2["z"] > 0 > a5["z"]
    # B fires once per day at hour 7 only -> constant 1-cell profile
    b7 = got[("B", 7)]
    assert b7["n_days"] == 2 and b7["mean_cnt"] == 1.0 and b7["z"] is None


def test_benford_screen_organic_vs_uniform(spark):
    """A log-uniform (organic-magnitude) sample passes Benford (small
    chi2); a narrow uniform sample fails loudly; digits cover 1..9 and
    frequencies sum to 1; zeros/NULLs excluded."""
    import math
    import random

    from pandasvcf_spark.operators.relational import benford_screen

    rnd = random.Random(2)
    organic = [(10 ** rnd.uniform(0, 4),) for _ in range(20000)]
    df = spark.createDataFrame(organic + [(0.0,), (None,)], "v double")
    rows = benford_screen(df, "v").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["n"] for r in rows) == 20000
    assert abs(sum(r["freq"] for r in rows) - 1.0) < 1e-6
    chi_organic = sum(r["chi2_term"] for r in rows)
    assert chi_organic < 30  # 8 dof, organic data

    uniform = spark.createDataFrame(
        [(rnd.uniform(40, 50),) for _ in range(5000)], "v double"
    )
    chi_uniform = sum(
        r["chi2_term"] for r in benford_screen(uniform, "v").collect()
    )
    assert chi_uniform > 1000  # all mass on digit 4 -> loud failure


def test_rolling_corr_hand_case(spark):
    """Perfectly correlated segment gives corr 1, anti-correlated -1;
    frames shorter than 2 complete pairs and constant-column frames are
    NULL; NULL rows hold their slot without contributing."""
    from pandasvcf_spark.operators.relational import rolling_corr

    rows = [
        # key A: y = 2x -> corr 1 once the frame has 2 points
        (1, 1, 1.0, 2.0), (1, 2, 2.0, 4.0), (1, 3, 3.0, 6.0),
        # a NULL x at t=4 contributes nothing but stays in the ordering
        (1, 4, None, 9.0), (1, 5, 4.0, 8.0),
        # key B: y = -x -> corr -1
        (2, 1, 1.0, -1.0), (2, 2, 2.0, -2.0), (2, 3, 3.0, -3.0),
        # key C: constant y -> NULL corr
        (3, 1, 1.0, 5.0), (3, 2, 2.0, 5.0), (3, 3, 3.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, x double, y double")
    out = {(r["k"], r["t"]): r for r in
           rolling_corr(df, "k", "t", "x", "y", window=3).collect()}
    assert out[(1, 1)]["corr"] is None and out[(1, 1)]["n_w"] == 1
    assert abs(out[(1, 2)]["corr"] - 1.0) < 1e-9
    assert abs(out[(1, 3)]["corr"] - 1.0) < 1e-9
    assert out[(1, 4)]["n_w"] == 2          # frame t=2..4, null dropped
    assert abs(out[(1, 5)]["corr"] - 1.0) < 1e-9  # frame t=3..5: two pts
    assert abs(out[(2, 3)]["corr"] + 1.0) < 1e-9
    assert out[(3, 3)]["corr"] is None      # zero variance in y

    import pytest as _pytest
    with _pytest.raises(ValueError, match="window"):
        rolling_corr(df, "k", "t", "x", "y", window=1)


# ab_test_proportions + trimmed_mean


def test_ab_test_proportions_hand_case(spark):
    """Planted effect: A converts 20/100, B converts 35/100 -> diff
    0.15, z from the pooled SE by hand; a third arm is ignored; empty
    arm gives NULL z/CI."""
    import math

    from pandasvcf_spark.operators.relational import ab_test_proportions

    rows = (
        [("A", 1)] * 20 + [("A", 0)] * 80
        + [("B", 1)] * 35 + [("B", 0)] * 65
        + [("C", 1)] * 10                      # ignored arm
    )
    df = spark.createDataFrame(rows, "var string, y int")
    r = ab_test_proportions(df, "var", "y", "A", "B").collect()[0]
    assert (r["n_a"], r["succ_a"], r["n_b"], r["succ_b"]) == (100, 20, 100, 35)
    assert r["rate_a"] == 0.2 and r["rate_b"] == 0.35
    assert abs(r["diff"] - 0.15) < 1e-9
    pool = 55 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert abs(r["z"] - round(0.15 / se, 6)) < 1e-9
    sew = math.sqrt(0.2 * 0.8 / 100 + 0.35 * 0.65 / 100)
    assert abs(r["ci_lo"] - round(0.15 - 1.96 * sew, 6)) < 1e-9
    assert abs(r["ci_hi"] - round(0.15 + 1.96 * sew, 6)) < 1e-9

    onearm = spark.createDataFrame([("A", 1)] * 5, "var string, y int")
    r2 = ab_test_proportions(onearm, "var", "y", "A", "B").collect()[0]
    assert r2["n_b"] == 0 and r2["z"] is None and r2["ci_lo"] is None


def test_trimmed_mean_hand_case(spark):
    """Outliers beyond the cuts vanish from the trimmed mean but only
    get clamped under winsorize; n_used reflects the difference."""
    from pandasvcf_spark.operators.relational import trimmed_mean

    vals = [float(i) for i in range(1, 100)] + [10000.0]  # one outlier
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    t = trimmed_mean(df, "v", trim=0.05).collect()[0]
    assert t["n"] == 100 and t["n_used"] < 100
    assert t["hi_cut"] < 10000.0 and t["mean"] < 100.0

    w = trimmed_mean(df, "v", trim=0.05, winsorize=True).collect()[0]
    assert w["n_used"] == 100
    # winsorized mean includes the outlier clamped to hi_cut
    assert t["mean"] < w["mean"] < 10000.0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="trim"):
        trimmed_mean(df, "v", trim=0.5)


# merge_intervals (gap-and-island generic)


def test_merge_intervals_nested_and_gap(spark):
    """The running-max-end device: after [1,100] a contained [2,3] must
    NOT end the island — [50,60] still merges into it (the lag(end)
    bug). Touching intervals merge at gap=0; gap=2 bridges a 2-unit
    hole; keys independent; NULL-bounded rows drop."""
    from pandasvcf_spark.operators.relational import merge_intervals

    rows = [
        ("a", 1, 100), ("a", 2, 3), ("a", 50, 60),   # one island
        ("a", 101, 110),                              # touches? 101 > 100 -> gap
        ("a", 200, 210),
        ("b", 5, 5), ("b", 5, 7),                     # touching at a point
        ("b", None, 9),
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    out = {(r["k"], r["start"]): r for r in
           merge_intervals(df, ["k"], "s", "e", gap=0).collect()}
    assert out[("a", 1)]["end"] == 100 and out[("a", 1)]["n_merged"] == 3
    assert out[("a", 101)]["end"] == 110
    assert out[("a", 200)]["end"] == 210
    assert out[("b", 5)]["end"] == 7 and out[("b", 5)]["n_merged"] == 2
    assert len(out) == 4

    bridged = {(r["k"], r["start"]): r for r in
               merge_intervals(df, ["k"], "s", "e", gap=2).collect()}
    # gap=2 bridges 100 -> 101 but not 110 -> 200
    assert bridged[("a", 1)]["end"] == 110 and bridged[("a", 1)]["n_merged"] == 4
    assert ("a", 200) in bridged and len(bridged) == 3


# kaplan_meier (right-censored survival)


def test_kaplan_meier_textbook_case(spark):
    """The classic worked example: events at 1, 2, 4 with a censor at 3
    -> S = 0.75, 0.5, 0.0 (the last subject's event drives S to exactly
    zero via the d = n flag, never NaN). Censored-only times emit no
    row; ties at one time fold into one step."""
    from pandasvcf_spark.operators.relational import kaplan_meier

    rows = [(1.0, 1), (2.0, 1), (3.0, 0), (4.0, 1)]
    df = spark.createDataFrame(rows, "t double, e int")
    out = [r.asDict() for r in kaplan_meier(df, "t", "e").collect()]
    assert [(r["t"], r["n_risk"], r["survival"]) for r in out] == [
        (1.0, 4, 0.75), (2.0, 3, 0.5), (4.0, 1, 0.0)
    ]

    # ties: two events + one censor at t=1 of five subjects
    tied = [(1.0, 1), (1.0, 1), (1.0, 0), (2.0, 1), (3.0, 0)]
    df2 = spark.createDataFrame(tied, "t double, e int")
    out2 = {r["t"]: r for r in kaplan_meier(df2, "t", "e").collect()}
    r1 = out2[1.0]
    assert (r1["n_risk"], r1["n_events"], r1["n_censored"]) == (5, 2, 1)
    assert abs(r1["survival"] - 0.6) < 1e-9      # 1 - 2/5
    r2 = out2[2.0]
    assert r2["n_risk"] == 2                     # censor left at t=1
    assert abs(r2["survival"] - 0.3) < 1e-9      # 0.6 * (1 - 1/2)


# confusion_report (thresholded operating point)


def test_confusion_report_hand_case(spark):
    """Hand-counted 2x2 at threshold 0.5: tp=3 fp=1 tn=4 fn=2; all five
    metrics verified; all-negative corpus yields NULL precision (not
    zero) and NULL mcc."""
    import math

    from pandasvcf_spark.operators.relational import confusion_report

    rows = (
        [(0.9, 1)] * 3 + [(0.8, 0)]            # tp=3, fp=1
        + [(0.1, 0)] * 4 + [(0.2, 1)] * 2      # tn=4, fn=2
    )
    df = spark.createDataFrame(rows, "s double, y int")
    r = confusion_report(df, "s", "y").collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (3, 1, 4, 2)
    assert r["precision"] == 0.75
    assert abs(r["recall"] - 0.6) < 1e-9
    p, rc = 0.75, 0.6
    assert abs(r["f1"] - round(2 * p * rc / (p + rc), 6)) < 1e-9
    assert r["accuracy"] == 0.7
    mcc = (3 * 4 - 1 * 2) / math.sqrt(4 * 5 * 5 * 6)
    assert abs(r["mcc"] - round(mcc, 6)) < 1e-9

    neg = spark.createDataFrame([(0.1, 0)] * 5, "s double, y int")
    r2 = confusion_report(neg, "s", "y").collect()[0]
    assert r2["precision"] is None and r2["mcc"] is None
    assert r2["accuracy"] == 1.0


# logistic_fit (IRLS Newton)


def test_logistic_fit_recovers_planted_model(spark):
    """4 IRLS steps on a planted logistic model match a numpy reference
    IRLS exactly and land near the true coefficients; y validation and
    collinearity raise."""
    import numpy as np
    import pytest as _pytest

    from pandasvcf_spark.operators.relational import logistic_fit

    rng = np.random.RandomState(1)
    n = 3000
    x1 = rng.uniform(-2, 2, n)
    x2 = rng.uniform(-2, 2, n)
    p = 1 / (1 + np.exp(-(0.5 + 1.5 * x1 - 0.8 * x2)))
    yv = (rng.uniform(size=n) < p).astype(float)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, yv)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = {r["term"]: r["beta"] for r in
           logistic_fit(df, "y", ["x1", "x2"], iters=4).collect()}

    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.zeros(3)
    for _ in range(4):
        eta = X @ beta
        mu = 1 / (1 + np.exp(-eta))
        w = mu * (1 - mu)
        z = eta + (yv - mu) / w
        beta = np.linalg.solve(X.T @ (X * w[:, None]), X.T @ (w * z))
    assert abs(got["(intercept)"] - round(beta[0], 6)) < 1e-5
    assert abs(got["x1"] - round(beta[1], 6)) < 1e-5
    assert abs(got["x2"] - round(beta[2], 6)) < 1e-5
    assert abs(got["x1"] - 1.5) < 0.2          # near the planted truth
    assert got["(n)"] == float(n)

    bad = spark.createDataFrame([(1.0, 2.0)], "x1 double, y double")
    with _pytest.raises(ValueError, match="0/1"):
        logistic_fit(bad, "y", ["x1"])
    dup = df.withColumn("x3", F.col("x1") * 2)
    with _pytest.raises(ValueError, match="singular"):
        logistic_fit(dup, "y", ["x1", "x3"])


# assortativity (Newman degree mixing)


def test_assortativity_hand_cases(spark):
    """A star graph is maximally disassortative (r = -1); a cycle is
    degree-regular (NULL — mixing undefined, not zero); duplicate and
    reversed edge rows and self-loops are cleaned before counting."""
    from pandasvcf_spark.operators.graph import assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(2, 0), (0, 0)],  # rev dup + loop
        "u long, v long",
    )
    r = assortativity(star).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (6, 5)
    assert abs(r["assortativity"] + 1.0) < 1e-9
    assert abs(r["mean_degree"] - 10 / 6) < 1e-6

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "u long, v long"
    )
    r2 = assortativity(cycle).collect()[0]
    assert (r2["n_nodes"], r2["n_edges"]) == (6, 6)
    assert r2["mean_degree"] == 2.0
    assert r2["assortativity"] is None


# target_encode_loo (leakage-aware categorical encoding)


def test_target_encode_loo_hand_case(spark):
    """Pure LOO: each row's encoding excludes its own target; singleton
    categories encode NULL at s=0 but shrink to the global mean with
    smoothing; NULL categories form a cohort; NULL-target rows get the
    full category mean."""
    from pandasvcf_spark.operators.relational import target_encode_loo

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0),
            (None, 5.0), (None, 7.0), ("a", None)]
    df = spark.createDataFrame(rows, "cat string, y double")
    got = {(r["cat"], r["y"]): r["enc"]
           for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[("a", 1.0)] == 2.5 and got[("a", 3.0)] == 1.5
    assert got[("b", 10.0)] is None          # singleton, s=0
    assert got[(None, 5.0)] == 7.0           # NULL cohort LOO
    assert got[("a", None)] == 2.0           # full category mean

    sm = {(r["cat"], r["y"]): r["enc"]
          for r in target_encode_loo(df, "cat", "y",
                                     smoothing=2.0).collect()}
    gmean = (1 + 2 + 3 + 10 + 5 + 7) / 6
    assert abs(sm[("b", 10.0)] - round((2 * gmean) / 2, 6)) < 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="smoothing"):
        target_encode_loo(df, "cat", "y", smoothing=-1)


# skew_report (shuffle-key diagnosis)


def test_skew_report_hand_cases(spark):
    """A 90%-hot key reports its share, a high Gini and a salt factor
    that caps per-task rows; a uniform key distribution reports Gini 0
    and salt 1; NULL keys count as a (hot) key."""
    from pandasvcf_spark.operators.relational import skew_report

    hot = spark.createDataFrame(
        [("hot",)] * 90 + [(f"k{i}",) for i in range(10)], "k string"
    )
    r = skew_report(hot, "k", top_k=3, target_rows_per_task=40).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (100, 11, 90)
    assert r["top1_share"] == 0.9 and r["topk_share"] == 0.92
    assert r["gini"] > 0.8 and r["recommended_salt"] == 3

    uni = spark.createDataFrame(
        [(f"k{i % 10}",) for i in range(100)], "k string"
    )
    r2 = skew_report(uni, "k").collect()[0]
    assert r2["gini"] == 0.0 and r2["recommended_salt"] == 1

    nulls = spark.createDataFrame(
        [(None,)] * 50 + [("a",)] * 2, "k string"
    )
    r3 = skew_report(nulls, "k").collect()[0]
    assert r3["n_keys"] == 2 and r3["max_key_rows"] == 50


# path_ngrams (sequential pattern discovery)


def test_path_ngrams_hand_case(spark):
    """Paths stay inside a key's stream (no cross-user grams), n_keys
    counts distinct walkers, incomplete tails drop, ties order by
    path."""
    from pandasvcf_spark.operators.relational import path_ngrams

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "c"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        (3, 1, "x"), (3, 2, "y"),          # too short for n=3
    ]
    df = spark.createDataFrame(rows, "u long, t long, e string")
    out = {r["path"]: r for r in
           path_ngrams(df, "u", ["t"], "e", n=3, top_n=10).collect()}
    assert out["a>b>c"]["n_total"] == 2 and out["a>b>c"]["n_keys"] == 2
    assert out["b>c>b"]["n_total"] == 1
    assert out["c>b>c"]["n_total"] == 1
    assert "y>a>b" not in out          # never crosses users
    assert "x>y" not in out and len(out) == 3


# autocorrelation (series fingerprint)


def test_autocorrelation_periodic_and_constant(spark):
    """A period-4 sine shows acf ~ -1 at lag 2 and ~ +1 at lag 4 (the
    biased estimator shrinks slightly with lag); lag 0 is exactly 1;
    a constant series yields NULL acf everywhere (zero variance)."""
    import math

    from pandasvcf_spark.operators.relational import autocorrelation

    rows = [(t, math.sin(2 * math.pi * t / 4)) for t in range(200)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = {r["lag"]: r for r in
           autocorrelation(df, "v", "t", max_lag=4).collect()}
    assert out[0]["acf"] == 1.0 and out[0]["n_pairs"] == 200
    assert out[2]["acf"] < -0.95
    assert out[4]["acf"] > 0.95
    assert abs(out[1]["acf"]) < 0.05
    assert out[4]["n_pairs"] == 196

    const = spark.createDataFrame([(t, 5.0) for t in range(20)],
                                  "t long, v double")
    for r in autocorrelation(const, "v", "t", max_lag=2).collect():
        assert r["acf"] is None


# cohens_kappa (chance-corrected agreement)


def test_cohens_kappa_hand_cases(spark):
    """Perfect agreement gives kappa 1; independent raters with the
    textbook 2x2 give the hand-computed value; identical constant
    raters give NULL (vacuous agreement); NULL rows excluded."""
    from pandasvcf_spark.operators.relational import cohens_kappa

    perfect = spark.createDataFrame(
        [("x", "x")] * 6 + [("y", "y")] * 4 + [(None, "x")],
        "a string, b string",
    )
    r = cohens_kappa(perfect, "a", "b").collect()[0]
    assert r["n"] == 10 and r["po"] == 1.0
    assert abs(r["kappa"] - 1.0) < 1e-9

    # classic worked example: po=0.7, pe=0.5 -> kappa=0.4
    rows = (
        [("y", "y")] * 4 + [("y", "n")] * 1
        + [("n", "y")] * 2 + [("n", "n")] * 3
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r2 = cohens_kappa(df, "a", "b").collect()[0]
    assert r2["po"] == 0.7
    # pe = P_a(y)*P_b(y) + P_a(n)*P_b(n) = .5*.6 + .5*.4 = 0.5
    assert abs(r2["pe"] - 0.5) < 1e-9
    assert abs(r2["kappa"] - 0.4) < 1e-9

    const = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r3 = cohens_kappa(const, "a", "b").collect()[0]
    assert r3["pe"] == 1.0 and r3["kappa"] is None


# modularity (community-assignment audit)


def test_modularity_double_clique_hand_case(spark):
    """Two K4 cliques joined by one bridge, split at the bridge:
    hand-computed q terms (e_c/m - (d_c/2m)^2 = 6/13 - 0.25); the
    structure-blind one-community assignment scores Q = 0 exactly;
    unassigned nodes keep their degree mass in m."""
    from pandasvcf_spark.operators.graph import modularity

    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 4))
    e = spark.createDataFrame(edges, "u long, v long")

    cm = spark.createDataFrame([(i, i // 4) for i in range(8)],
                               "n long, c long")
    rows = {r["community"]: r for r in modularity(e, cm).collect()}
    for c in (0, 1):
        r = rows[c]
        assert (r["n_nodes"], r["inner_edges"], r["degree_sum"]) == (4, 6, 13)
        assert abs(r["q"] - round(6 / 13 - 0.25, 6)) < 1e-9

    # everything in one community: Q = m/m - (2m/2m)^2 = 0
    one = spark.createDataFrame([(i, 0) for i in range(8)],
                                "n long, c long")
    r1 = modularity(e, one).collect()[0]
    assert r1["inner_edges"] == 13 and r1["q"] == 0.0

    # partial assignment: community 0 only; its q uses the FULL m
    part = spark.createDataFrame([(i, 0) for i in range(4)],
                                 "n long, c long")
    rp = {r["community"]: r for r in modularity(e, part).collect()}
    assert list(rp) == [0] and rp[0]["degree_sum"] == 13


def test_geo_near_join_equals_brute_force(spark):
    """Property check: the banded spherical join must equal the
    brute-force all-pairs haversine EXACTLY — including antimeridian
    seam pairs and near-clamp latitudes (the two classes the grid can
    silently drop: a ceil-sized partial seam cell and an undersized
    chord bound were both caught by this test during development)."""
    import math
    import random

    from pandasvcf_spark.operators.relational import geo_near_join

    rng = random.Random(7)
    pts = []
    for i in range(250):
        lat = rng.uniform(-84.9, 84.9) if i % 3 else rng.uniform(80, 84.9)
        lon = (
            rng.uniform(-180, 180)
            if i % 5
            else rng.uniform(178, 180) * rng.choice([1, -1])
        )
        pts.append((i, lat, lon))
    df = spark.createDataFrame(pts, "id int, lat double, lon double")

    def hav(p, q):
        R = 6371.0088
        la1, lo1, la2, lo2 = map(
            math.radians, (p[1], p[2], q[1], q[2])
        )
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1)
            * math.cos(la2)
            * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * R * math.asin(min(1.0, math.sqrt(h)))

    for radius in (50.0, 800.0):
        truth = {
            (p[0], q[0])
            for p in pts
            for q in pts
            if p[0] != q[0] and hav(p, q) <= radius
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in geo_near_join(df, df, radius, "id", "id").collect()
            if r["id_a"] != r["id_b"]
        }
        assert got == truth, (radius, len(truth - got), len(got - truth))
    # polar clamp raises, not mis-buckets
    import pytest as _pytest

    polar = spark.createDataFrame(
        [(0, 89.0, 0.0), (1, 88.9, 1.0)], "id int, lat double, lon double"
    )
    with _pytest.raises(ValueError, match="max_abs_lat"):
        geo_near_join(polar, polar, 50.0, "id", "id")


def test_morans_i_and_dbscan_hand_cases(spark):
    """Moran's I on the 4-point line graph (I = 1/3 exactly; E[I] =
    -1/3); spherical DBSCAN on planted clusters: a 2-core cluster
    with two border points, a 4-core cluster, and an isolated noise
    point — border attachment is the deterministic min core label."""
    from pandasvcf_spark.operators.relational import dbscan_geo, morans_i

    pts = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)], "id int, value double"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a int, id_b int"
    )
    r = morans_i(pts, pairs, "id", "value").collect()[0]
    assert (r["n"], r["w_sum"], r["i"], r["e_i"]) == (
        4, 6, 0.333333, -0.333333,
    )

    geo = spark.createDataFrame(
        [
            (1, 10.0, 10.0), (2, 10.05, 10.0),
            (3, 10.0, 10.05), (4, 10.088, 10.0),
            (5, 40.0, 40.0), (6, 40.01, 40.0),
            (7, 40.0, 40.01), (8, 40.01, 40.01),
            (9, 70.0, 70.0),
        ],
        "id int, lat double, lon double",
    )
    out = {
        r["id"]: (r["role"], r["cluster"])
        for r in dbscan_geo(geo, 10.0, 4).collect()
    }
    assert out == {
        1: ("core", 1), 2: ("core", 1),
        3: ("border", 1), 4: ("border", 1),
        5: ("core", 5), 6: ("core", 5),
        7: ("core", 5), 8: ("core", 5),
        9: ("noise", None),
    }


def test_gearys_c_line_graph(spark):
    """Geary's C on the 4-point line graph: squared neighbor diffs all
    1 -> C = 3*6/(2*6*5) = 0.3 exactly; E[C] = 1."""
    from pandasvcf_spark.operators.relational import gearys_c

    pts = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)], "id int, value double"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a int, id_b int"
    )
    r = gearys_c(pts, pairs, "id", "value").collect()[0]
    assert (r["n"], r["w_sum"], r["c"], r["e_c"]) == (4, 6, 0.3, 1.0)


def test_spatial_autocorrelation_empty_pairs_keeps_n(spark):
    """Output contract on an empty neighbor relation: n is the point
    count (BIGINT, never NULL) — only the statistics go NULL (round-10
    ADVICE: F.max('n') inside the pair fold nulled n on zero pairs)."""
    from pandasvcf_spark.operators.relational import gearys_c, morans_i

    pts = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "id int, value double"
    )
    empty = spark.createDataFrame([], "id_a int, id_b int")
    r = morans_i(pts, empty, "id", "value").collect()[0]
    assert (r["n"], r["w_sum"], r["i"], r["e_i"]) == (3, 0, None, None)
    r = gearys_c(pts, empty, "id", "value").collect()[0]
    assert (r["n"], r["w_sum"], r["c"], r["e_c"]) == (3, 0, None, None)


def test_geo_knn_join_equals_brute_force(spark):
    """Radius-bounded kNN against the brute-force ranking on a 200-pt
    hash lattice: exact pair set, exact ranks (deterministic
    (distance, id) ties), k-truncation, self-exclusion, and the
    bounded-search contract (isolated points return < k rows)."""
    import math

    from pandasvcf_spark.operators.relational import geo_knn_join

    pts = [
        (
            i,
            ((i * 2654435761) % 140000) / 1000.0 - 70.0,
            ((i * 40503) % 360000) / 1000.0 - 180.0,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    R = 6371.0088

    def hav(a, b):
        p1, l1 = math.radians(a[1]), math.radians(a[2])
        p2, l2 = math.radians(b[1]), math.radians(b[2])
        return 2 * R * math.asin(
            math.sqrt(
                min(
                    math.sin((p2 - p1) / 2) ** 2
                    + math.cos(p1)
                    * math.cos(p2)
                    * math.sin((l2 - l1) / 2) ** 2,
                    1.0,
                )
            )
        )

    k, radius = 3, 2000.0
    want = set()
    for a in pts:
        cands = sorted(
            (
                (hav(a, b), b[0])
                for b in pts
                if b[0] != a[0] and hav(a, b) <= radius
            ),
        )
        for rank, (d, bid) in enumerate(cands[:k], 1):
            want.add((a[0], bid, round(d, 6), rank))
    got = {
        (r["id_a"], r["id_b"], r["distance_km"], r["rank"])
        for r in geo_knn_join(
            df, df, k=k, radius_km=radius, left_id="id", right_id="id"
        ).collect()
    }
    assert got == want
    # some point must have fewer than k in-radius neighbors for the
    # bounded-search contract to actually be exercised
    from collections import Counter

    per_point = Counter(a for a, _, _, _ in want)
    assert min(per_point.values(), default=0) < k or len(per_point) < 200

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        geo_knn_join(df, df, k=0, radius_km=radius)


def test_holt_linear_and_croston_vs_replicas(spark):
    """Holt linear-trend fold against the textbook recurrence
    (l1=y1, b1=y2-y1, smoothing from y3) incl. the n<2 NULL contract;
    Croston on a hand intermittent series (demands 4@3, 6@7, 2@9,
    5@12: interval EWMA with the first-position cold start)."""
    from pandasvcf_spark.operators.relational import (
        croston_forecast,
        holt_linear_last,
    )

    ys = [3.0, 5.0, 9.0, 12.0, 13.0]
    a, b = 0.4, 0.3
    lv, tr = ys[1], ys[1] - ys[0]
    for x in ys[2:]:
        ln = a * x + (1 - a) * (lv + tr)
        tr = b * (ln - lv) + (1 - b) * tr
        lv = ln
    rows = [(1, i, y) for i, y in enumerate(ys)] + [(2, 0, 7.0)]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    out = {
        r["key"]: r for r in holt_linear_last(df, "k", ["t"], "v").collect()
    }
    assert (out[1]["level"], out[1]["trend"], out[1]["forecast"]) == (
        round(lv, 4), round(tr, 4), round(lv + tr, 4),
    )
    assert out[2]["n_events"] == 1 and out[2]["level"] is None

    series = [0, 0, 4, 0, 0, 0, 6, 0, 2, 0, 0, 5]
    rows = [(1, i + 1, float(v)) for i, v in enumerate(series)]
    rows += [(2, 1, 0.0)]  # no demand at all: NULL estimates
    df = spark.createDataFrame(rows, "k int, t int, v double")
    al = 0.2

    def fold(arr):
        acc = arr[0]
        for x in arr[1:]:
            acc = al * x + (1 - al) * acc
        return acc

    zh = fold([4.0, 6.0, 2.0, 5.0])
    qh = fold([3.0, 4.0, 2.0, 3.0])
    out = {
        r["key"]: r
        for r in croston_forecast(df, "k", ["t"], "v", alpha=0.2).collect()
    }
    assert (
        out[1]["n_periods"], out[1]["n_demands"],
        out[1]["z_hat"], out[1]["q_hat"], out[1]["forecast"],
    ) == (12, 4, round(zh, 4), round(qh, 4), round(zh / qh, 4))
    assert out[2]["n_demands"] == 0 and out[2]["forecast"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        holt_linear_last(df, "k", ["t"], "v", alpha=0.0)
    with _pytest.raises(ValueError, match="beta"):
        holt_linear_last(df, "k", ["t"], "v", beta=1.5)
    with _pytest.raises(ValueError, match="alpha"):
        croston_forecast(df, "k", ["t"], "v", alpha=2.0)


def test_point_in_polygon_join_hand_cases(spark):
    """Even-odd ray cast on a square, a triangle and a CONCAVE L
    polygon (the notch must read outside), with the cell prejoin
    verified against brute force and the no-cartesian plan guard."""
    from pandasvcf_spark.operators.relational import (
        point_in_polygon_join,
    )

    polys = [
        (1, [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]),
        (2, [(10.0, 0.0), (14.0, 0.0), (12.0, 3.0)]),
        (3, [(20.0, 0.0), (26.0, 0.0), (26.0, 2.0), (22.0, 2.0),
             (22.0, 6.0), (20.0, 6.0)]),
    ]
    pdf = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in vs]) for pid, vs in polys],
        "poly_id int, vertices array<struct<x:double,y:double>>",
    )
    pts = [
        (1, 2.0, 2.0),    # in square
        (2, 5.0, 5.0),    # outside all
        (3, 12.0, 1.0),   # in triangle
        (4, 12.0, 2.9),   # in triangle, near the apex
        (5, 13.9, 2.9),   # outside the slanted edge
        (6, 21.0, 5.0),   # in the L's vertical arm
        (7, 25.0, 1.0),   # in the L's horizontal arm
        (8, 25.0, 5.0),   # in the L's NOTCH -> outside (concavity)
        (9, 0.5, 3.9),    # in square
    ]
    tdf = spark.createDataFrame(pts, "point_id int, x double, y double")
    df = point_in_polygon_join(tdf, pdf, cell_size=3.0)
    out = {(r["point_id"], r["poly_id"]) for r in df.collect()}
    assert out == {(1, 1), (3, 2), (4, 2), (6, 3), (7, 3), (9, 1)}

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # cell size independence: a much finer grid gives the same answer
    out2 = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(tdf, pdf, cell_size=0.7).collect()
    }
    assert out2 == out

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cell_size"):
        point_in_polygon_join(tdf, pdf, cell_size=0.0)
