"""Differentially-private releases (operators/sampling.dp_*) — round 15.

Pins the Laplace-mechanism machinery: noise calibration (empirical mean
|noise| tracks b = sens/eps across many cells), the sensitivity clamp,
eps -> infinity convergence to the true statistic, determinism across
partitionings and calls, range clamping of the mean, and parameter
guards. The seeded-draw privacy boundary is documented in
_laplace_noise_expr (the draw is reproducible BY DESIGN here — that is
what the exact catalog oracles t_dp_counts / t_dp_mean check).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cells(spark):
    # 400 groups x 5 rows, value = group index (known sums/counts)
    rows = [(g, i, float(g % 50)) for g in range(400) for i in range(5)]
    return spark.createDataFrame(rows, "g long, i long, v double").cache()


def test_count_noise_calibration(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count

    out = dp_count(cells, ["g"], epsilon=1.0).collect()
    assert len(out) == 400
    errs = [abs(r.n_dp - 5.0) for r in out]
    mean_abs = sum(errs) / len(errs)
    # Laplace(b=1): E|X| = b = 1; 400 draws put the mean well within 2x
    assert 0.5 < mean_abs < 2.0
    # and the noise is not degenerate-zero anywhere near everywhere
    assert sum(1 for e in errs if e > 0.05) > 300


def test_count_scale_tracks_epsilon(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count

    loose = dp_count(cells, ["g"], epsilon=0.1).collect()
    tight = dp_count(cells, ["g"], epsilon=10.0).collect()
    m_loose = sum(abs(r.n_dp - 5.0) for r in loose) / len(loose)
    m_tight = sum(abs(r.n_dp - 5.0) for r in tight) / len(tight)
    # b = 1/eps: 100x epsilon ratio => ~100x error ratio
    assert m_loose > 20 * m_tight


def test_high_epsilon_converges(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count, dp_sum

    for r in dp_count(cells, ["g"], epsilon=1e6).collect():
        assert r.n_dp == pytest.approx(5.0, abs=1e-4)
    for r in dp_sum(
        cells, ["g"], "v", lower=0.0, upper=50.0, epsilon=1e6
    ).collect():
        assert r.sum_dp == pytest.approx(5.0 * (r.g % 50), abs=1e-3)


def test_sum_clamps_outliers(spark):
    from pandasvcf_spark.operators.sampling import dp_sum

    d = spark.createDataFrame(
        [(1, 10.0), (1, 1e9), (1, -50.0), (2, None)],
        "g long, v double",
    )
    out = {r.g: r.sum_dp for r in dp_sum(
        d, ["g"], "v", lower=0.0, upper=100.0, epsilon=1e6
    ).collect()}
    # 10 + clamp(1e9 -> 100) + clamp(-50 -> 0) = 110
    assert out[1] == pytest.approx(110.0, abs=1e-3)
    # group with only a NULL contribution: no rows survive the filter
    assert 2 not in out


def test_mean_stays_in_range(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_mean

    out = dp_mean(
        cells, ["g"], "v", lower=0.0, upper=50.0, epsilon=0.05
    ).collect()
    assert len(out) == 400
    for r in out:
        assert 0.0 <= r.mean_dp <= 50.0


def test_deterministic(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count

    a = sorted(map(tuple, dp_count(cells, ["g"], epsilon=1.0).collect()))
    b = sorted(map(tuple, dp_count(
        cells.repartition(13), ["g"], epsilon=1.0).collect()))
    assert a == b
    # different seed -> different release
    c = sorted(map(tuple, dp_count(
        cells, ["g"], epsilon=1.0, seed="other").collect()))
    assert a != c


def test_param_guards(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count, dp_sum

    with pytest.raises(ValueError, match="epsilon"):
        dp_count(cells, ["g"], epsilon=0.0)
    with pytest.raises(ValueError, match="lower"):
        dp_sum(cells, ["g"], "v", lower=5.0, upper=5.0)


def test_release_has_no_true_column(spark, cells):
    from pandasvcf_spark.operators.sampling import dp_count, dp_mean, dp_sum

    assert dp_count(cells, ["g"]).columns == ["g", "n_dp"]
    assert dp_sum(
        cells, ["g"], "v", lower=0.0, upper=50.0
    ).columns == ["g", "sum_dp"]
    assert dp_mean(
        cells, ["g"], "v", lower=0.0, upper=50.0
    ).columns == ["g", "mean_dp"]
