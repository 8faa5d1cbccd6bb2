"""Time-series and sequence statistics.

Mechanically split from the former single-file operators/stats.py
(round-11 verdict task 5) — bodies are verbatim; behavior, plans
and oracles unchanged. See the package __init__ for the re-export
surface and the original module docstring.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._guards import (
    _assert_cell_bound,
    _assert_series_contract,
    _assert_series_sized,
)


def pacf_stats(
    series: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Partial autocorrelation of a regular series at lags 1-3 via the
    closed-form Durbin-Levinson recursion — "is the lag-2 echo real
    or just lag-1 twice?", the AR-order diagnostic beside the plain
    ACF (`m_acf`): PACF removes the shorter-lag pathways, so an AR(1)
    series shows phi_22 ~ 0 where its ACF still decays geometrically.

        phi_11 = r1
        phi_22 = (r2 − r1²) / (1 − r1²)
        phi_21 = r1 − phi_22·r1
        phi_33 = (r3 − phi_21·r2 − phi_22·r1)
                 / (1 − phi_21·r1 − phi_22·r2)

    with r_k the biased ACF (lag-k cross sums over the squared-
    deviation denominator, the m_acf convention). INTENDED FOR
    PRE-AGGREGATED SERIES (the corpus collapses to hourly/daily
    points first).

    Output: 3 rows (lag INT, acf DOUBLE round 6, pacf DOUBLE
    round 6); NULL where a denominator vanishes.

    Plan: lead() columns over one ordered window + ONE 1-row fold,
    then pure closed-form projections — no joins, no iteration.
    """
    mu = series.agg(F.avg(F.col(value_col).cast("double")).alias("m"))
    w = Window.orderBy(time_col)
    x = F.col(value_col).cast("double")
    d = series.join(F.broadcast(mu)).select(
        (x - F.col("m")).alias("d0"),
        (F.lead(x, 1).over(w) - F.col("m")).alias("d1"),
        (F.lead(x, 2).over(w) - F.col("m")).alias("d2"),
        (F.lead(x, 3).over(w) - F.col("m")).alias("d3"),
    )
    agg = d.agg(
        F.sum(F.col("d0") * F.col("d0")).alias("den"),
        F.sum(F.col("d0") * F.col("d1")).alias("n1"),
        F.sum(F.col("d0") * F.col("d2")).alias("n2"),
        F.sum(F.col("d0") * F.col("d3")).alias("n3"),
    )
    r1 = F.col("n1") / F.col("den")
    r2 = F.col("n2") / F.col("den")
    r3 = F.col("n3") / F.col("den")
    p22_den = F.lit(1.0) - r1 * r1
    p22 = (r2 - r1 * r1) / p22_den
    p21 = r1 - p22 * r1
    p33_den = F.lit(1.0) - p21 * r1 - p22 * r2
    p33 = (r3 - p21 * r2 - p22 * r1) / p33_den
    ok = F.col("den") > 0
    base = agg.select(
        (F.round(F.when(ok, r1), 6) + F.lit(0.0)).alias("a1"),
        (F.round(F.when(ok, r2), 6) + F.lit(0.0)).alias("a2"),
        (F.round(F.when(ok, r3), 6) + F.lit(0.0)).alias("a3"),
        (F.round(F.when(ok, r1), 6) + F.lit(0.0)).alias("p1"),
        (
            F.round(F.when(ok & (p22_den != 0), p22), 6) + F.lit(0.0)
        ).alias("p2"),
        (
            F.round(
                F.when(ok & (p22_den != 0) & (p33_den != 0), p33), 6
            )
            + F.lit(0.0)
        ).alias("p3"),
    )
    out = None
    for lag in (1, 2, 3):
        row = base.select(
            F.lit(lag).alias("lag"),
            F.col(f"a{lag}").alias("acf"),
            F.col(f"p{lag}").alias("pacf"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def seasonal_naive_eval(
    series: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest — the no-model baseline every
    forecasting effort must beat (pred(t) = x(t − period)), evaluated
    in-sample per group:

        MAE   = mean |x − pred|
        sMAPE = mean ( 2·|x − pred| / (|x| + |pred|) )   (0 when both 0)

    over the points that HAVE a period-lag ancestor. INTENDED FOR
    PRE-AGGREGATED SERIES; `time_col` must step uniformly (the lag is
    positional, not temporal — resample gaps first via
    `resample_ffill`).

    Output: (*group_cols, n_eval BIGINT, mae DOUBLE round 4, smape
    DOUBLE round 6).

    Plan: one lag() window per group on the series table + one
    group-keyed agg. Integer counts make the errors exact rationals.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    if period < 1:
        raise ValueError("period must be >= 1")
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*gcols).orderBy(time_col)
    d = series.select(
        *gcols, x.alias("__x"), F.lag(x, period).over(w).alias("__p")
    ).filter(F.col("__p").isNotNull())
    err = F.abs(F.col("__x") - F.col("__p"))
    den = F.abs(F.col("__x")) + F.abs(F.col("__p"))
    smape_term = F.when(den > 0, F.lit(2.0) * err / den).otherwise(
        F.lit(0.0)
    )
    return d.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.round(F.avg(err), 4).alias("mae"),
        F.round(F.avg(smape_term), 6).alias("smape"),
    )


def max_drawdown(
    series: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group maximum drawdown of a cumulative series — the
    worst peak-to-trough drop of the running total, the
    risk/regression-depth summary for any monotone-hope metric
    (revenue, tokens accepted, capacity):

        cum_t  = running sum;  peak_t = running max of cum
        max_dd = max(peak_t − cum_t)

    INTENDED FOR PRE-AGGREGATED SERIES whose per-step values are
    already rounded (pin increments before calling — the running
    sums then replay bit-for-bit over the shared time order).

    Output: (*group_cols, n_steps BIGINT, final DOUBLE round 4,
    max_dd DOUBLE round 4).

    Plan: two cumulative windows over one group-keyed exchange + one
    group agg.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    r = series.select(*gcols, F.col(time_col).alias("__t"), x.alias("__x"))
    w2 = (
        Window.partitionBy(*gcols)
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = r.select(
        *gcols, "__t", F.sum("__x").over(w2).alias("__cum")
    ).select(
        *gcols,
        "__cum",
        (F.max("__cum").over(w2) - F.col("__cum")).alias("__dd"),
        F.row_number()
        .over(Window.partitionBy(*gcols).orderBy(F.col("__t").desc()))
        .alias("__last"),
    )
    return c.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.round(F.max(F.when(F.col("__last") == 1, F.col("__cum"))), 4)
        .alias("final"),
        F.round(F.max("__dd"), 4).alias("max_dd"),
    )


def burstiness_stats(
    series: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group burstiness of a count series (Goh & Barabási 2008)
    — is the activity Poisson-smooth or bursty? The stream-health
    scalar pair:

        fano       = var / mean            (1 = Poisson)
        burstiness = (sd − mean) / (sd + mean)   in (−1, 1)

    with sample variance over the series points. INTENDED FOR
    PRE-AGGREGATED COUNT SERIES (integer values — the sums are then
    engine-exact).

    Output: (*group_cols, n BIGINT, mean DOUBLE round 4, fano DOUBLE
    round 6, burstiness DOUBLE round 6); NULL statistics when n < 2
    or mean/sd degenerate.

    Plan: one 3-sum partial-aggregated groupBy; both scalars are
    moment ratios.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    g = series.filter(x.isNotNull()).groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("__s") / nd
    var = (F.col("__q") - F.col("__s") * F.col("__s") / nd) / (
        nd - F.lit(1.0)
    )
    sd = F.sqrt(var)
    return g.select(
        *gcols,
        "n",
        F.round(mean, 4).alias("mean"),
        F.round(
            F.when((F.col("n") >= 2) & (mean > 0), var / mean), 6
        ).alias("fano"),
        (
            F.round(
                F.when(
                    (F.col("n") >= 2) & (sd + mean > 0),
                    (sd - mean) / (sd + mean),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("burstiness"),
    )


def changepoint_single(
    series: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Best single mean-shift changepoint per group — the one-split
    exact solution CUSUM's sequential scores approximate: choose the
    split k (first segment = positions 1..k) maximizing the
    between-segment sum-of-squares gain

        gain(k) = S_k²/k + (S_n − S_k)²/(n − k) − S_n²/n

    (equivalently the variance-reduction of a 2-segment fit; ties
    break to the smallest k). INTENDED FOR PRE-AGGREGATED SERIES
    with PINNED (rounded) values — gains then replay exactly enough
    that the ROUNDED-gain argmax order is engine-stable (the repo's
    rounded-score top-k rule).

    Output: (*group_cols, n BIGINT, k_best BIGINT, t_split — the
    time of the LAST point in the left segment, gain DOUBLE round 4,
    mean_left DOUBLE round 4, mean_right DOUBLE round 4).

    Plan: one cumulative window + one rank window on the same
    group-keyed exchange; candidate splits never leave the series
    table.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*gcols).orderBy(time_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(*gcols)
    r = series.select(
        *gcols,
        F.col(time_col).alias("__t"),
        F.row_number().over(w).alias("__k"),
        F.sum(x).over(w_cum).alias("__sk"),
        F.sum(x).over(w_all).alias("__sn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    ).filter(F.col("__k") < F.col("__n"))
    kd = F.col("__k").cast("double")
    nd = F.col("__n").cast("double")
    gain = (
        F.col("__sk") * F.col("__sk") / kd
        + (F.col("__sn") - F.col("__sk"))
        * (F.col("__sn") - F.col("__sk"))
        / (nd - kd)
        - F.col("__sn") * F.col("__sn") / nd
    )
    scored = r.select(
        *gcols,
        "__t",
        "__k",
        "__n",
        "__sk",
        "__sn",
        F.round(gain, 4).alias("__g"),
    )
    w_pick = Window.partitionBy(*gcols).orderBy(
        F.col("__g").desc(), F.col("__k").asc()
    )
    best = scored.withColumn(
        "__rn", F.row_number().over(w_pick)
    ).filter(F.col("__rn") == 1)
    return best.select(
        *gcols,
        F.col("__n").cast("long").alias("n"),
        F.col("__k").cast("long").alias("k_best"),
        F.col("__t").alias("t_split"),
        F.col("__g").alias("gain"),
        F.round(F.col("__sk") / F.col("__k").cast("double"), 4).alias(
            "mean_left"
        ),
        F.round(
            (F.col("__sn") - F.col("__sk"))
            / (F.col("__n") - F.col("__k")).cast("double"),
            4,
        ).alias("mean_right"),
    )


def dominant_period(
    series: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
    max_lag: int = 30,
) -> DataFrame:
    """Dominant periodicity per group — the argmax of the biased ACF
    over lags 1..max_lag (the m_acf machinery turned into a detector):
    "does this stream breathe daily or weekly?" without a Fourier
    library. Ties and near-ties resolve on the ROUNDED correlation
    with the smallest lag winning (the rounded-score argmax rule).
    INTENDED FOR PRE-AGGREGATED REGULAR SERIES.

    Output: (*group_cols, n BIGINT, best_lag INT, acf DOUBLE
    round 6); groups whose denominator is 0 (constant series) drop.

    Plan: max_lag lead() columns over ONE group-keyed window + one
    group agg + a lag-stacked argmax window over group x max_lag
    rows.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*gcols).orderBy(time_col)
    mu = series.groupBy(*gcols).agg(F.avg(x).alias("__m"))
    j = series.join(F.broadcast(mu), gcols)
    d = j.select(
        *gcols,
        (x - F.col("__m")).alias("d0"),
        *[
            (F.lead(x, k).over(w) - F.col("__m")).alias(f"d{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    agg = d.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("d0") * F.col("d0")).alias("__den"),
        *[
            F.sum(F.col("d0") * F.col(f"d{k}")).alias(f"__n{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stacked = None
    for k in range(1, max_lag + 1):
        row = agg.filter(F.col("__den") > 0).select(
            *gcols,
            "n",
            F.lit(k).alias("lag"),
            (
                F.round(F.col(f"__n{k}") / F.col("__den"), 6)
                + F.lit(0.0)
            ).alias("acf"),
        )
        stacked = row if stacked is None else stacked.unionAll(row)
    w_pick = Window.partitionBy(*gcols).orderBy(
        F.col("acf").desc(), F.col("lag").asc()
    )
    return (
        stacked.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .select(*gcols, "n", F.col("lag").cast("int").alias("best_lag"), "acf")
    )


def seasonal_strength(
    series: DataFrame,
    group_cols: Sequence[str],
    slot_col: str,
    value_col: str,
) -> DataFrame:
    """Seasonality-strength scalar per group (the STL-style measure,
    Wang/Smith/Hyndman):

        strength = max(0, 1 − var(x − slot_mean) / var(x))

    over a regular series with a seasonal slot label (hour-of-day,
    day-of-week) — the one-number answer to "is this stream's rhythm
    real?", the scalar partner of e_seasonal_profile's per-slot
    means and e_dominant_period's lag argmax. Population variances;
    NULL when var(x) = 0.

    Output: (*group_cols, n BIGINT, strength DOUBLE round 6).

    Plan: one (group, slot)-keyed mean (slot-sized), a broadcast
    join-back, and one group-keyed moment agg — three
    partial-aggregated passes, no windows.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    base = series.filter(
        x.isNotNull() & F.col(slot_col).isNotNull()
    ).select(*gcols, F.col(slot_col).alias("__slot"), x.alias("__x"))
    slots = base.groupBy(*gcols, "__slot").agg(
        F.avg("__x").alias("__sm")
    )
    j = base.join(F.broadcast(slots), [*gcols, "__slot"])
    g = j.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__q"),
        F.sum(
            (F.col("__x") - F.col("__sm"))
            * (F.col("__x") - F.col("__sm"))
        ).alias("__qr"),
    )
    nd = F.col("n").cast("double")
    var_x = F.col("__q") / nd - (F.col("__s") / nd) * (F.col("__s") / nd)
    var_r = F.col("__qr") / nd
    return g.select(
        *gcols,
        "n",
        F.round(
            F.when(
                var_x > 0,
                F.greatest(
                    F.lit(0.0), F.lit(1.0) - var_r / var_x
                ),
            ),
            6,
        ).alias("strength"),
    )


def cox_stuart(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Cox-Stuart trend test (Cox & Stuart 1955) — the sign-test
    cousin of `mann_kendall`: pair the series' first half against its
    second half position-by-position (x_i vs x_{i+m}, m = ceil(n/2);
    the middle element of an odd-length series is unpaired) and sign-
    test the differences. Needs only n/2 comparisons where Kendall's
    grid prices every pair — the quick monotone-trend triage:

        s_plus  = #(x_{i+m} > x_i)      (rises)
        s_minus = #(x_{i+m} < x_i)      (falls; ties dropped)
        z = (|s_plus - n'/2| - 0.5) / sqrt(n'/4),  n' = s_plus+s_minus

    (the continuity-corrected normal approximation of the two-sided
    binomial; sign(s_plus - s_minus) carries direction). Output: ONE
    row (n_pairs, s_plus, s_minus BIGINT, z DOUBLE round 6 — SIGNED by
    trend direction); z NULL when n' = 0.

    Plan: one series-sized rank window (ENFORCED by the `max_rows`
    tripwire — the runs_test discipline) + ONE equi-join of the series
    on itself at offset m (rn = rn + m, never a cross pair grid) +
    1-row folds."""
    x = F.col(value_col).cast("double")
    base = series.filter(
        x.isNotNull() & F.col(time_col).isNotNull()
    ).select(F.col(time_col).alias("__t"), x.alias("__x"))
    _assert_series_sized(base, "cox_stuart", max_rows)
    w = Window.orderBy("__t")
    wn = Window.partitionBy()
    rn = base.select(
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
        "__x",
    )
    m = F.ceil(F.col("__n") / 2).cast("int")
    left = rn.filter(F.col("__r") <= F.col("__n") - m).select(
        (F.col("__r") + m).alias("__k"), F.col("__x").alias("__x1")
    )
    right = rn.select(
        F.col("__r").alias("__k"), F.col("__x").alias("__x2")
    )
    pairs = left.join(right, "__k")
    g = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("__x2") > F.col("__x1"), 1).otherwise(0))
        .cast("long").alias("s_plus"),
        F.sum(F.when(F.col("__x2") < F.col("__x1"), 1).otherwise(0))
        .cast("long").alias("s_minus"),
    )
    np_ = (F.col("s_plus") + F.col("s_minus")).cast("double")
    sp = F.col("s_plus").cast("double")
    zmag = (F.abs(sp - np_ / 2) - F.lit(0.5)) / F.sqrt(np_ / 4)
    z = F.when(
        F.col("s_plus") >= F.col("s_minus"), F.greatest(zmag, F.lit(0.0))
    ).otherwise(-F.greatest(zmag, F.lit(0.0)))
    return g.select(
        "n_pairs",
        "s_plus",
        "s_minus",
        (
            F.round(F.when(np_ > 0, z), 6) + F.lit(0.0)
        ).alias("z"),
    )


def runs_test(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a sequence — are
    the above-median / below-median excursions independent, or does
    the series trend/oscillate? (Too FEW runs = trending, too MANY =
    oscillating.) The one-number sanity check before trusting any
    i.i.d.-assuming statistic on a monitoring series:

        R    = number of runs of same-side values (median excluded)
        E[R] = 1 + 2·n1·n2 / n
        Var  = 2·n1·n2·(2·n1·n2 − n) / (n²·(n − 1))
        z    = (R − E) / sqrt(Var)

    with n1/n2 the above/below counts and the exact lower median
    (the repo's quantile convention) as the split. Values EQUAL to
    the median are excluded (the standard treatment).

    Output: ONE row (n1, n2, runs BIGINT, z DOUBLE round 6); z NULL
    when either side is empty or Var = 0.

    Plan: one median rank window + one lag window over the same
    global sort + 1-row folds — series-sized (ENFORCED by the
    `max_rows` tripwire), no joins.
    """
    x = F.col(value_col).cast("double")
    base = series.filter(
        x.isNotNull() & F.col(time_col).isNotNull()
    ).select(F.col(time_col).alias("__t"), x.alias("__x"))
    _assert_series_sized(base, "runs_test", max_rows)
    w_med = Window.orderBy("__x")
    wn = Window.partitionBy()
    med = (
        base.select(
            "__x",
            F.row_number().over(w_med).alias("__r"),
            F.count(F.lit(1)).over(wn).alias("__n"),
        )
        .filter(
            F.col("__r")
            == F.greatest(F.ceil(F.col("__n") / 2), F.lit(1))
        )
        .select(F.col("__x").alias("__med"))
    )
    sided = (
        base.join(F.broadcast(med))
        .filter(F.col("__x") != F.col("__med"))
        .select(
            "__t",
            F.when(F.col("__x") > F.col("__med"), 1)
            .otherwise(0)
            .alias("__s"),
        )
    )
    w_t = Window.orderBy("__t")
    flagged = sided.select(
        "__s",
        F.when(
            F.lag("__s").over(w_t).isNull()
            | (F.lag("__s").over(w_t) != F.col("__s")),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    )
    g = flagged.agg(
        F.sum("__s").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("__s")).cast("long").alias("n2"),
        F.sum("__new_run").cast("long").alias("runs"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    e = F.lit(1.0) + F.lit(2.0) * n1d * n2d / nd
    var = (
        F.lit(2.0)
        * n1d
        * n2d
        * (F.lit(2.0) * n1d * n2d - nd)
        / (nd * nd * (nd - F.lit(1.0)))
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0)
    return g.select(
        "n1",
        "n2",
        "runs",
        (
            F.round(
                F.when(
                    ok,
                    (F.col("runs").cast("double") - e) / F.sqrt(var),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def control_chart(
    series: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Shewhart c-chart summary for count series — the SPC classic
    for defect/error streams: control limits at mean ± 3·sqrt(mean)
    (the Poisson 3-sigma), and how many points breach them.

        ucl = cl + 3·sqrt(cl),  lcl = max(0, cl − 3·sqrt(cl))

    INTENDED FOR PRE-AGGREGATED COUNT SERIES (integer values — the
    mean is then an exact-sum ratio and the limit compares are
    engine-deterministic).

    Output: (*group_cols, n BIGINT, cl DOUBLE round 4, lcl DOUBLE
    round 4, ucl DOUBLE round 4, n_above BIGINT, n_below BIGINT).

    Plan: one group agg for the mean (broadcast back) + one flagging
    agg — two partial-aggregated passes, no windows.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    base = series.filter(x.isNotNull()).select(*gcols, x.alias("__x"))
    m = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__x").alias("__cl"),
    )
    j = base.join(F.broadcast(m), gcols)
    ucl = F.col("__cl") + F.lit(3.0) * F.sqrt(F.col("__cl"))
    lcl = F.greatest(
        F.lit(0.0), F.col("__cl") - F.lit(3.0) * F.sqrt(F.col("__cl"))
    )
    return (
        j.groupBy(*gcols)
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("__cl"), 4).alias("cl"),
            F.round(F.max(lcl), 4).alias("lcl"),
            F.round(F.max(ucl), 4).alias("ucl"),
            F.sum(F.when(F.col("__x") > ucl, 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.sum(F.when(F.col("__x") < lcl, 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
        )
    )


def durbin_watson(
    series: DataFrame,
    group_cols: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Durbin-Watson first-order autocorrelation statistic per group —
    the residual-independence check on a regular series (intercept-only
    residuals, i.e. the demeaned series):

        dw = sum_{t>=2} (v_t - v_{t-1})^2 / sum (v_t - mean)^2

    dw ~ 2 means no lag-1 autocorrelation, -> 0 positive, -> 4
    negative. INTENDED FOR PRE-AGGREGATED INTEGER SERIES (counts —
    the numerator's successive differences and the denominator's
    sum/sumsq are then exact-integer aggregates; the mean enters once
    as a final double ratio). NULL time/value rows drop.

    Output: (*group_cols, n BIGINT, dw DOUBLE round 6); NULL when
    n < 2 or the series is constant.

    Plan: one group-partitioned lag window + one group agg on the
    same exchange — the seasonal_naive_error shape.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*gcols).orderBy(time_col)
    d = series.filter(
        x.isNotNull() & F.col(time_col).isNotNull()
    ).select(
        *gcols,
        x.alias("__x"),
        (x - F.lag(x, 1).over(w)).alias("__d"),
    )
    g = d.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).alias("__q"),
        F.sum(F.col("__d") * F.col("__d")).alias("__num"),
    )
    nd = F.col("n").cast("double")
    den = F.col("__q") - F.col("__s") * F.col("__s") / nd
    return g.select(
        *gcols,
        "n",
        (
            F.round(
                F.when(
                    (F.col("n") >= 2) & (den > 0),
                    F.col("__num") / den,
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("dw"),
    )


def ljung_box(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_lag: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978) — "is this series
    white noise?" across the first `max_lag` autocorrelations at once,
    the residual-diagnostics closer for the m_acf / m_pacf family:

        Q = n(n+2) * sum_{k=1..m} r_k^2 / (n - k)

    with r_k the biased ACF (the m_acf/m_pacf convention: lag-k cross
    sums of mean deviations over the squared-deviation sum). INTENDED
    FOR PRE-AGGREGATED SERIES (collapse to hourly/daily points first —
    the pacf_stats discipline). NULL time/value rows drop.

    Output: ONE row (n BIGINT, m INT, q DOUBLE round 6); NULL q when
    n <= max_lag or the series is constant.

    Plan: the pacf_stats device at width m: lead() columns over one
    ordered window (the series is pre-aggregated and small by
    contract) + ONE 1-row fold.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    x = F.col(value_col).cast("double")
    base = series.filter(x.isNotNull() & F.col(time_col).isNotNull())
    mu = base.agg(
        F.avg(x).alias("__m"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = Window.orderBy(time_col)
    d = (
        base
        .join(F.broadcast(mu))
        .select(
            "__n",
            (x - F.col("__m")).alias("d0"),
            *[
                (F.lead(x, k).over(w) - F.col("__m")).alias(f"d{k}")
                for k in range(1, max_lag + 1)
            ],
        )
    )
    agg = d.agg(
        F.max("__n").alias("__n"),
        F.sum(F.col("d0") * F.col("d0")).alias("den"),
        *[
            F.sum(F.col("d0") * F.col(f"d{k}")).alias(f"n{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    nd = F.col("__n").cast("double")
    terms = None
    for k in range(1, max_lag + 1):
        r = F.col(f"n{k}") / F.col("den")
        t = r * r / (nd - F.lit(float(k)))
        terms = t if terms is None else terms + t
    q = nd * (nd + F.lit(2.0)) * terms
    ok = (F.col("den") > 0) & (nd > F.lit(float(max_lag)))
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.lit(max_lag).cast("int").alias("m"),
        (F.round(F.when(ok, q), 6) + F.lit(0.0)).alias("q"),
    )


def mann_kendall(
    df: DataFrame,
    time_col: str,
    value_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945, Kendall 1975) — the
    nonparametric monotone-trend standard of environmental/monitoring
    statistics:  S = sum_{i<j} sign(v_j - v_i) over time order, with
    the tie-corrected variance and continuity-corrected z,

        var = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18
        z   = (S -/+ 1) / sqrt(var)   (0 when S = 0)

    Pairs tied on TIME are excluded (the test assumes a sequence;
    duplicate timestamps should be pre-aggregated). PRE-BUCKET dense
    values (ENFORCED by the `max_cells` tripwire on (t, v) cells).
    Output: ONE row (n BIGINT, s BIGINT, var_s DOUBLE, z DOUBLE
    round 6); z NULL when var = 0.

    Plan: the kendall_tau_b cell device with time as x — one (t, v)
    collapse, one broadcast cell-grid sign fold, one v-marginal agg.
    """
    tc = F.col(time_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = df.filter(tc.isNotNull() & vc.isNotNull()).select(
        tc.alias("__t"), vc.alias("__v")
    )
    _assert_cell_bound(base, ["__t", "__v"], "mann_kendall", max_cells)
    cells = base.groupBy("__t", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__t").alias("__ta"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__t").alias("__tb"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    w = F.col("__na") * F.col("__nb")
    s_fold = a.join(
        F.broadcast(b), F.col("__tb") > F.col("__ta"), "inner"
    ).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("__vb") > F.col("__va"), w)
                .when(F.col("__vb") < F.col("__va"), -w)
                .otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("s")
    )
    ties = cells.groupBy("__v").agg(F.sum("__n").alias("__t")).agg(
        F.sum(
            F.col("__t")
            * (F.col("__t") - 1)
            * (2 * F.col("__t") + 5)
        ).alias("__tsum"),
        F.sum("__t").cast("long").alias("n"),
    )
    g = s_fold.join(F.broadcast(ties))
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - 1) * (2 * nd + 5)
        - F.col("__tsum").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sd - 1) / F.sqrt(var_s)).when(
        F.col("s") < 0, (sd + 1) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return g.select(
        "n",
        "s",
        F.round(var_s, 4).alias("var_s"),
        (
            F.round(F.when(var_s > 0, z), 6) + F.lit(0.0)
        ).alias("z"),
    )


def pettitt_test(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Pettitt change-point test (Pettitt 1979) — the rank-based
    single-change-point detector for monitoring series (the
    nonparametric partner of `e_changepoint`'s mean-shift scan):

        U_t = 2 * sum_{i<=t} r_i - t (n + 1)      (mid-ranks r)
        K   = max_t |U_t|,   t* = argmax (earliest on ties)
        p   = 2 exp(-6 K² / (n³ + n²))            (approximate)

    using the rank identity U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)
    so the statistic needs only ONE cumulative rank sum, never a pair
    grid. INTENDED FOR PRE-AGGREGATED SERIES (ENFORCED by `max_rows`).
    Output: ONE row (n BIGINT, change_t DOUBLE, k DOUBLE round 4,
    p_value DOUBLE round 6); NULL stats when n < 2.

    Plan: mid-ranks from the distinct-value cell ladder broadcast back
    onto the series, one time-ordered cumulative window, one 1-row
    max fold with the earliest-t tie-break.
    """
    tc = F.col(time_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = series.filter(tc.isNotNull() & vc.isNotNull()).select(
        tc.alias("__t"), vc.alias("__v")
    )
    _assert_series_sized(base, "pettitt_test", max_rows)
    vcells = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w_prev = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranks = vcells.select(
        "__v",
        (
            F.coalesce(F.sum("__c").over(w_prev), F.lit(0.0))
            + (F.col("__c") + 1) / 2
        ).alias("__r"),
    )
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_t = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_idx = Window.orderBy("__t")
    u = (
        base.join(F.broadcast(ranks), "__v")
        .crossJoin(F.broadcast(nrow))
        .select(
            "__t",
            "n",
            (
                F.lit(2.0) * F.sum("__r").over(w_t)
                - F.row_number().over(w_idx).cast("double")
                * (F.col("n") + 1)
            ).alias("__u"),
            F.row_number().over(w_idx).alias("__i"),
        )
        .filter(F.col("__i") < F.col("n"))  # U_n = 0 by construction
    )
    best = u.orderBy(
        F.abs(F.col("__u")).desc(), F.col("__t").asc()
    ).limit(1)
    nd = F.col("n").cast("double")
    k = F.abs(F.col("__u"))
    p = F.lit(2.0) * F.exp(
        F.lit(-6.0) * k * k / (nd * nd * nd + nd * nd)
    )
    ok = F.col("n") >= 2
    return best.select(
        "n",
        F.round(F.col("__t"), 6).alias("change_t"),
        (F.round(F.when(ok, k), 4) + F.lit(0.0)).alias("k"),
        (
            F.round(F.when(ok, F.least(p, F.lit(1.0))), 6) + F.lit(0.0)
        ).alias("p_value"),
    )


def page_hinkley(
    series: DataFrame,
    time_col: str,
    value_col: str,
    delta: float = 0.0,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Page-Hinkley drift statistic (Page 1954; Hinkley 1971; the
    standard concept-drift monitor in streaming ML) — has the series'
    mean INCREASED somewhere? Accumulate deviations from the running
    mean and measure the climb above the historical minimum:

        xbar_t = (1/t) Σ_{i<=t} x_i           (running mean)
        m_t    = Σ_{i<=t} (x_i − xbar_i − δ)  (cumulative deviation)
        PH     = max_t (m_t − min_{i<=t} m_i)

    (δ is the tolerated drift per step; alarm when PH exceeds a
    business λ — this operator emits the peak statistic and where it
    occurred, the monitoring dashboard's number). Output: ONE row
    (n BIGINT, ph DOUBLE round 6, t_peak — the time at the maximizing
    t, earliest on ties); ph NULL when the series is empty.

    Plan: series-sized windows over ONE global sort (cumsum, running
    mean, running min — tripwire-enforced like runs_test), one
    TakeOrdered(1) finish. Pre-aggregate to your monitoring bucket
    first; that is the contract."""
    x = F.col(value_col).cast("double")
    base = series.filter(
        x.isNotNull() & F.col(time_col).isNotNull()
    ).select(F.col(time_col).alias("__t"), x.alias("__x"))
    _assert_series_sized(base, "page_hinkley", max_rows)
    w = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wn = Window.partitionBy()
    stepped = base.select(
        "__t",
        "__x",
        F.count(F.lit(1)).over(wn).alias("__n"),
        (F.col("__x") - F.sum("__x").over(w) / F.count(F.lit(1)).over(w)
         - F.lit(float(delta))).alias("__dev"),
    )
    cum = stepped.select(
        "__t",
        "__n",
        F.sum("__dev").over(w).alias("__m"),
    )
    ph = cum.select(
        "__t",
        "__n",
        (
            F.col("__m")
            - F.min("__m").over(w)
        ).alias("__ph"),
    )
    return (
        ph.orderBy(F.col("__ph").desc(), F.col("__t").asc())
        .limit(1)
        .select(
            F.col("__n").cast("long").alias("n"),
            (F.round(F.col("__ph"), 6) + F.lit(0.0)).alias("ph"),
            F.col("__t").alias("t_peak"),
        )
    )


def granger_causality(
    series: DataFrame,
    time_col: str,
    y_col: str,
    x_col: str,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Granger causality test, one lag (Granger 1969) — does the
    HISTORY of x improve the prediction of y beyond y's own history?
    The standard lead-lag screen between two monitoring series
    (deploys→errors, marketing→signups):

        restricted    y_t = a + b y_{t-1}
        unrestricted  y_t = a + b y_{t-1} + c x_{t-1}
        F = (RSS_r − RSS_u) / (RSS_u / (T − 3))   ~ F(1, T−3)

    both fit by closed-form OLS on centered moment sums (the
    two-regressor normal equations — no iteration). "Granger-causes"
    is predictive, not mechanistic; the docstring states what the F
    tests and nothing more. Output: ONE row (n BIGINT usable
    (y_t, y_{t-1}, x_{t-1}) triples, f DOUBLE round 6, b_y, b_x DOUBLE
    round 6 — the unrestricted coefficients); NULL when T <= 3, a
    regressor is constant, or the regressor cross-moment matrix is
    singular.

    Plan: ONE ordered lag window over the (tripwire-guarded,
    pre-aggregated) series + ONE 10-sum moment agg + 1-row closed
    forms."""
    yc = F.col(y_col).cast("double")
    xc = F.col(x_col).cast("double")
    base = series.filter(
        yc.isNotNull() & xc.isNotNull() & F.col(time_col).isNotNull()
    ).select(F.col(time_col).alias("__t"), yc.alias("__y"),
             xc.alias("__x"))
    _assert_series_sized(base, "granger_causality", max_rows)
    w = Window.orderBy("__t")
    lagged = base.select(
        "__y",
        F.lag("__y").over(w).alias("__u"),   # y_{t-1}
        F.lag("__x").over(w).alias("__v"),   # x_{t-1}
    ).filter(F.col("__u").isNotNull() & F.col("__v").isNotNull())
    g = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").alias("__sy"),
        F.sum("__u").alias("__su"),
        F.sum("__v").alias("__sv"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__u") * F.col("__u")).alias("__suu"),
        F.sum(F.col("__v") * F.col("__v")).alias("__svv"),
        F.sum(F.col("__y") * F.col("__u")).alias("__syu"),
        F.sum(F.col("__y") * F.col("__v")).alias("__syv"),
        F.sum(F.col("__u") * F.col("__v")).alias("__suv"),
    )
    nd = F.col("n").cast("double")
    syy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nd
    suu = F.col("__suu") - F.col("__su") * F.col("__su") / nd
    svv = F.col("__svv") - F.col("__sv") * F.col("__sv") / nd
    syu = F.col("__syu") - F.col("__sy") * F.col("__su") / nd
    syv = F.col("__syv") - F.col("__sy") * F.col("__sv") / nd
    suv = F.col("__suv") - F.col("__su") * F.col("__sv") / nd
    rss_r = syy - syu * syu / suu
    det = suu * svv - suv * suv
    b_y = (syu * svv - syv * suv) / det
    b_x = (syv * suu - syu * suv) / det
    rss_u = syy - b_y * syu - b_x * syv
    f_stat = (rss_r - rss_u) / (rss_u / (nd - 3))
    ok = (
        (F.col("n") > 3) & (suu > 0) & (svv > 0) & (det > 0)
        & (rss_u > 0)
    )
    return g.select(
        "n",
        (F.round(F.when(ok, f_stat), 6) + F.lit(0.0)).alias("f"),
        (F.round(F.when(ok, b_y), 6) + F.lit(0.0)).alias("b_y"),
        (F.round(F.when(ok, b_x), 6) + F.lit(0.0)).alias("b_x"),
    )


def classical_decompose(
    series: DataFrame,
    time_col: str,
    value_col: str,
    period: int,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of Macaulay 1931; R's decompose()) — split a regular series
    into trend + seasonal + remainder, the first thing an analyst does
    to a periodic monitoring signal:

        trend_t    = centered MA over one period (even periods use
                     half-weights at both ends — the standard 2xMA)
        detrend_t  = x_t − trend_t
        seasonal_k = mean(detrend over slot k) − grand mean of those
                     slot means (indexes sum to ~0)
        remainder  = x − trend − seasonal

    The series must be REGULAR (positionally spaced — resample gaps
    first); slots are row-position mod period. Output: one row per
    input point (t, x DOUBLE, trend, seasonal, remainder DOUBLE round
    6) — trend/remainder NULL at the edges where the centered window
    is incomplete (the textbook convention).

    Plan: series-guarded windows over ONE global sort (row positions +
    the centered sum), a period-sized slot-mean groupBy broadcast back
    — the runs_test cost discipline; pre-aggregate to your bucket
    first."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    x = F.col(value_col).cast("double")
    base = series.filter(
        x.isNotNull() & F.col(time_col).isNotNull()
    ).select(F.col(time_col).alias("__t"), x.alias("__x"))
    _assert_series_sized(base, "classical_decompose", max_rows)
    w = Window.orderBy("__t")
    even = period % 2 == 0
    h = period // 2 if even else (period - 1) // 2
    w_ma = w.rowsBetween(-h, h)
    pos = base.select(
        "__t",
        "__x",
        F.row_number().over(w).alias("__i"),
        F.count(F.lit(1)).over(w_ma).alias("__wn"),
        F.sum("__x").over(w_ma).alias("__ws"),
        F.first("__x").over(w_ma).alias("__wlo"),
        F.last("__x").over(w_ma).alias("__whi"),
    )
    full = F.col("__wn") == (2 * h + 1)
    if even:
        trend = F.when(
            full,
            (
                F.col("__ws")
                - F.col("__wlo") / 2
                - F.col("__whi") / 2
            )
            / period,
        )
    else:
        trend = F.when(full, F.col("__ws") / period)
    td = pos.select(
        "__t",
        "__x",
        ((F.col("__i") - 1) % period).alias("__slot"),
        trend.alias("__trend"),
    )
    slot_means = td.filter(F.col("__trend").isNotNull()).groupBy(
        "__slot"
    ).agg(F.avg(F.col("__x") - F.col("__trend")).alias("__sm"))
    grand = slot_means.agg(F.avg("__sm").alias("__gm"))
    seas = slot_means.crossJoin(F.broadcast(grand)).select(
        "__slot", (F.col("__sm") - F.col("__gm")).alias("__seas")
    )
    out = td.join(F.broadcast(seas), "__slot", "left")
    return out.select(
        F.col("__t").alias("t"),
        F.col("__x").alias("x"),
        (F.round(F.col("__trend"), 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("__seas"), 6) + F.lit(0.0)).alias("seasonal"),
        (
            F.round(
                F.col("__x") - F.col("__trend") - F.col("__seas"), 6
            )
            + F.lit(0.0)
        ).alias("remainder"),
    )


def chow_test(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_col,
) -> DataFrame:
    """Chow test for a structural break in a simple linear regression —
    do two regimes (before/after a date, cohort A/B) share the same
    (intercept, slope)? The parametric companion to pettitt_test
    (rank-based location break) and changepoint_single (mean break):

        F = ((SSR_pooled − SSR_a − SSR_b) / k)
            / ((SSR_a + SSR_b) / (n − 2k)),   k = 2

    Everything is closed-form from per-regime moment sums: for each
    regime SSR = Syy − Sxy²/Sxx with the centered S's built from raw
    sums, and the pooled SSR from the regime sums' totals — so the
    ENTIRE test is ONE grouped aggregation over the two regimes plus a
    2-row fold. No residuals are materialized; nothing data-sized
    shuffles.

    `group_col` must 2-partition the rows (boolean or any expression;
    rows where it is NULL are excluded, as are NULL y/x). Output
    (1 row): n_a, n_b BIGINT, ssr_split DOUBLE round 4, ssr_pooled
    DOUBLE round 4, f_stat DOUBLE round 6, df1 INT, df2 BIGINT.
    Raises if either regime has < 3 rows or zero x-variance (the
    per-regime fit is under-determined)."""
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    nn = df.filter(y.isNotNull() & x.isNotNull() & g.isNotNull())
    per = nn.groupBy(g.alias("__g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    rows = per.collect()  # 2 regime rows — model-sized by contract
    if len(rows) != 2:
        raise ValueError(
            f"chow_test: group_col must 2-partition the rows, got "
            f"{len(rows)} regime(s)"
        )

    def _ssr(r):
        cxx = r["sxx"] - r["sx"] ** 2 / r["n"]
        cxy = r["sxy"] - r["sx"] * r["sy"] / r["n"]
        cyy = r["syy"] - r["sy"] ** 2 / r["n"]
        if r["n"] < 3 or cxx <= 0:
            raise ValueError(
                "chow_test: a regime has < 3 rows or zero x-variance"
            )
        return cyy - cxy * cxy / cxx

    rows = sorted(rows, key=lambda r: str(r["__g"]))
    ra, rb = rows
    ssr_a, ssr_b = _ssr(ra), _ssr(rb)
    n = ra["n"] + rb["n"]
    tot = {
        f: ra[f] + rb[f] for f in ("sx", "sy", "sxx", "sxy", "syy")
    }
    cxx = tot["sxx"] - tot["sx"] ** 2 / n
    cxy = tot["sxy"] - tot["sx"] * tot["sy"] / n
    cyy = tot["syy"] - tot["sy"] ** 2 / n
    ssr_p = cyy - cxy * cxy / cxx
    k = 2
    df2 = n - 2 * k
    ssr_s = ssr_a + ssr_b
    f_stat = ((ssr_p - ssr_s) / k) / (ssr_s / df2) if ssr_s > 0 else None
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            int(ra["n"]), int(rb["n"]),
            round(ssr_s, 4) + 0.0, round(ssr_p, 4) + 0.0,
            round(f_stat, 6) + 0.0 if f_stat is not None else None,
            k, int(df2),
        )],
        "n_a bigint, n_b bigint, ssr_split double, ssr_pooled double, "
        "f_stat double, df1 int, df2 bigint",
    )


def seasonal_mann_kendall(
    df: DataFrame,
    season_col: str,
    time_col: str,
    value_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch, Slack & Smith 1982) —
    the monotone-trend test for series with a seasonal cycle, where
    plain `mann_kendall` confounds trend with seasonality: S and its
    tie-corrected variance are computed WITHIN each season (Jan-vs-Jan,
    3am-vs-3am) and summed,

        S' = Σ_g S_g,   Var' = Σ_g Var_g,
        z  = (S' ∓ 1) / sqrt(Var')       (continuity-corrected)

    (the independent-seasons form — the serial-correlation covariance
    extension is out of scope and documented as such). Duplicate
    (season, time) rows RAISE (enforced — S excludes time-tied pairs
    but the Hirsch-Slack-Smith variance carries NO ties-in-time
    correction term, so duplicates would silently inflate-variance /
    bias z rather than error); PRE-BUCKET dense values (ENFORCED by
    the `max_cells` tripwire on (season, t, v) cells).

    Output: ONE row (n BIGINT, n_seasons BIGINT, s BIGINT, var_s
    DOUBLE round 4, z DOUBLE round 6); z NULL when Var' = 0.

    Plan: the mann_kendall cell device with season in every key — one
    (season, t, v) collapse, one broadcast season-matched cell-grid
    sign fold, one (season, v)-marginal tie agg, 1-row fold."""
    gc = F.col(season_col)
    tc = F.col(time_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = df.filter(
        gc.isNotNull() & tc.isNotNull() & vc.isNotNull()
    ).select(gc.alias("__g"), tc.alias("__t"), vc.alias("__v"))
    # fused cell-bound + duplicate probe: ONE agg job (round-13
    # verdict task 6); raise precedence preserved (cells first)
    _assert_series_contract(
        base,
        ["__g", "__t"],
        "seasonal_mann_kendall",
        max_rows=None,
        reason=(
            "S excludes time-tied pairs but the Hirsch-Slack-Smith "
            "variance has no ties-in-time correction, so z would be "
            "silently biased"
        ),
        max_cells=max_cells,
        cell_cols=["__g", "__t", "__v"],
    )
    cells = base.groupBy("__g", "__t", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__g").alias("__ga"), F.col("__t").alias("__ta"),
        F.col("__v").alias("__va"), F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"), F.col("__t").alias("__tb"),
        F.col("__v").alias("__vb"), F.col("__n").alias("__nb"),
    )
    w = F.col("__na") * F.col("__nb")
    s_fold = a.join(
        F.broadcast(b),
        (F.col("__ga") == F.col("__gb"))
        & (F.col("__tb") > F.col("__ta")),
        "inner",
    ).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("__vb") > F.col("__va"), w)
                .when(F.col("__vb") < F.col("__va"), -w)
                .otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("s")
    )
    per_season = (
        cells.groupBy("__g", "__v")
        .agg(F.sum("__n").alias("__t"))
        .groupBy("__g")
        .agg(
            F.sum(
                F.col("__t")
                * (F.col("__t") - 1)
                * (2 * F.col("__t") + 5)
            ).alias("__tsum"),
            F.sum("__t").alias("__ng"),
        )
    )
    ng = F.col("__ng").cast("double")
    var_g = (
        ng * (ng - 1) * (2 * ng + 5) - F.col("__tsum").cast("double")
    ) / F.lit(18.0)
    ties = per_season.agg(
        F.sum(var_g).alias("__var"),
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
    )
    g = s_fold.join(F.broadcast(ties))
    sd = F.col("s").cast("double")
    var_s = F.col("__var")
    z = F.when(F.col("s") > 0, (sd - 1) / F.sqrt(var_s)).when(
        F.col("s") < 0, (sd + 1) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    return g.select(
        "n",
        "n_seasons",
        "s",
        F.round(var_s, 4).alias("var_s"),
        (F.round(F.when(var_s > 0, z), 6) + F.lit(0.0)).alias("z"),
    )


def kpss_test(
    series: DataFrame,
    time_col: str,
    value_col: str,
    lags: int = 4,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    Shin 1992) — the NULL-of-stationarity complement to
    `mann_kendall`'s null-of-no-trend (run both: MK asks "is there a
    trend?", KPSS asks "is the level even stable?"):

        e_t = y_t − ȳ,   S_t = Σ_{s<=t} e_s
        s²(l) = γ₀ + 2 Σ_{j=1..l} (1 − j/(l+1)) γ_j,
        γ_j  = Σ_t e_t e_{t+j} / n          (Bartlett long-run var)
        η    = Σ_t S_t² / (n² s²(l))

    Reject stationarity for large η (5% critical value 0.463 — the
    caller compares; no p interpolation here). Input is a SERIES (one
    row per time point — pre-aggregate, the runs_test contract;
    ENFORCED by `max_rows`); duplicate times RAISE (enforced by one
    count-vs-count_distinct probe — positions come from row_number()
    over the time order, so with ties every γ_j would be silently
    order-dependent, not an error).

    Output: ONE row (n BIGINT, eta DOUBLE round 6, s2_l DOUBLE round
    4); NULL when s²(l) <= 0 or n <= lags.

    Plan: one mean broadcast, ONE time-ordered cumulative window over
    the series rows (series-sized by contract), and the γ_j sums from
    a position EQUI-join: each row explodes to its 0..l lag keys and
    hash-joins back on position — series × (l+1) pair rows planned as
    a hash join, never a nested-loop range predicate over rows²."""
    if lags < 0:
        raise ValueError(f"lags must be >= 0, got {lags}")
    tc = F.col(time_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = series.filter(tc.isNotNull() & vc.isNotNull()).select(
        tc.alias("__t"), vc.alias("__v")
    )
    # fused size+duplicate probe: ONE agg job (round-13 verdict task 6)
    _assert_series_contract(base, ["__t"], "kpss_test", max_rows)
    mu = base.agg(
        F.avg("__v").alias("__mu"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    w_cum = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = base.crossJoin(F.broadcast(mu)).select(
        "__t",
        (F.col("__v") - F.col("__mu")).alias("__e"),
        F.col("__n"),
        F.row_number().over(Window.orderBy("__t")).alias("__i"),
        F.sum(F.col("__v") - F.col("__mu")).over(w_cum).alias("__S"),
    )
    num = dev.agg(
        F.max("__n").alias("n"),
        F.sum(F.col("__S") * F.col("__S")).alias("__ss"),
    )
    # explode each position to its 0..lags lag keys so the pairing is
    # a HASH-JOINABLE equi-join (a bare range predicate would plan a
    # BroadcastNestedLoopJoin over n² pair evaluations — the adf_test
    # lag-1 device generalized to l lags)
    a = dev.select(
        F.col("__e").alias("__ea"),
        F.explode(
            F.sequence(F.col("__i"), F.col("__i") + lags)
        ).alias("__ib"),
        F.col("__i").alias("__ia"),
    )
    b = dev.select(
        F.col("__i").alias("__ib"), F.col("__e").alias("__eb")
    )
    gammas = a.join(b, on="__ib").groupBy(
        (F.col("__ib") - F.col("__ia")).alias("__j")
    ).agg(F.sum(F.col("__ea") * F.col("__eb")).alias("__g"))
    s2 = gammas.crossJoin(F.broadcast(num)).agg(
        F.sum(
            F.when(F.col("__j") == 0, F.col("__g"))
            .otherwise(
                2.0
                * (1.0 - F.col("__j") / F.lit(float(lags + 1)))
                * F.col("__g")
            )
            / F.col("n").cast("double")
        ).alias("__s2")
    )
    out = num.crossJoin(F.broadcast(s2))
    nd = F.col("n").cast("double")
    ok = (F.col("__s2") > 0) & (F.col("n") > lags)
    eta = F.col("__ss") / (nd * nd * F.col("__s2"))
    return out.select(
        "n",
        (F.round(F.when(ok, eta), 6) + F.lit(0.0)).alias("eta"),
        (F.round(F.when(ok, F.col("__s2")), 4) + F.lit(0.0)).alias(
            "s2_l"
        ),
    )


def adf_test(
    series: DataFrame,
    time_col: str,
    value_col: str,
    max_rows: int | None = 5_000_000,
) -> DataFrame:
    """Dickey-Fuller unit-root test (Dickey & Fuller 1979; the
    0-augmentation-lag form) — the null-of-UNIT-ROOT partner KPSS is
    always paired with (KPSS null: stationary; DF null: unit root —
    agreement between them is what settles the question):

        Δy_t = α + ρ y_{t−1} + ε_t,
        t_ρ  = ρ̂ / SE(ρ̂)

    with ρ̂/SE from the closed-form simple-OLS sums. Compare t_ρ to
    the DICKEY-FULLER critical values (−2.86 at 5% with constant) —
    NOT the t table; no p interpolation here. Input is a SERIES (one
    row per time point — the kpss_test contract, tripwired via
    `max_rows`; duplicate times RAISE, same probe as kpss_test — the
    lag-1 position pairing would otherwise be order-dependent).

    Output: ONE row (n BIGINT — the differenced length, rho DOUBLE
    round 6, t_stat DOUBLE round 6); NULL stats when n < 3 or x has
    no variance.

    Plan: one position window + ONE position self-join (i+1 — the
    lag-1 pairing), one 6-sum fold; everything after the pre-agg is
    series-sized."""
    tc = F.col(time_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = series.filter(tc.isNotNull() & vc.isNotNull()).select(
        tc.alias("__t"), vc.alias("__v")
    )
    # fused size+duplicate probe: ONE agg job (round-13 verdict task 6)
    _assert_series_contract(base, ["__t"], "adf_test", max_rows)
    pos = base.select(
        F.row_number().over(Window.orderBy("__t")).alias("__i"), "__v"
    )
    a = pos.select(F.col("__i").alias("__ia"), F.col("__v").alias("__x"))
    b = pos.select(F.col("__i").alias("__ib"), F.col("__v").alias("__vb"))
    d = a.join(
        F.broadcast(b), F.col("__ib") == F.col("__ia") + 1
    ).select("__x", (F.col("__vb") - F.col("__x")).alias("__y"))
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    n = F.col("n")
    det = n * F.col("sxx") - F.col("sx") * F.col("sx")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / det
    alpha = (F.col("sy") - rho * F.col("sx")) / n
    ssr = (
        F.col("syy")
        - alpha * F.col("sy")
        - rho * F.col("sxy")
    )
    s2 = ssr / (n - 2.0)
    se = F.sqrt(s2 * n / det)
    ok = (n >= 3) & (det > 0)
    return m.select(
        n.cast("long").alias("n"),
        (F.round(F.when(ok, rho), 6) + F.lit(0.0)).alias("rho"),
        (
            F.round(F.when(ok & (s2 > 0), rho / se), 6) + F.lit(0.0)
        ).alias("t_stat"),
    )
