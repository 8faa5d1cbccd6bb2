"""Parametric, contingency and proportion tests.

Mechanically split from the former single-file operators/stats.py
(round-11 verdict task 5) — bodies are verbatim; behavior, plans
and oracles unchanged. See the package __init__ for the re-export
surface and the original module docstring.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .distribution import _group_median


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA F statistic of `value_col` across the levels of
    `group_col` — the k-sample mean-difference screen (does segment /
    source / shard matter for this metric?), computed entirely from
    per-level (n, sum, sum-of-squares) partials:

        SSB = sum_g(S_g^2 / n_g) - S^2 / N      (between groups)
        SSW = Q - sum_g(S_g^2 / n_g)            (within groups)
        F   = (SSB / (k-1)) / (SSW / (N-k))
        eta^2 = SSB / (SSB + SSW)               (effect size)

    with S_g/S the level/grand sums, Q the grand sum of squares. F is
    NULL when k < 2, N <= k, or SSW = 0. NULL values/levels drop.

    Output: ONE row (k BIGINT, n BIGINT, f_stat DOUBLE round 6,
    eta_sq DOUBLE round 6). Raw SS terms are deliberately NOT output:
    their absolute magnitude (~Q) makes fixed-decimal rounding
    unstable across engine accumulation orders, while the two ratios
    carry only ~1e-10 relative error and round exactly.

    Plan: one partial-aggregated groupBy over the levels, then a 1-row
    global agg — the classic two-level combiner tree; nothing scales
    with row count on the driver.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(vc.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), vc.alias("__v")
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__n").cast("long").alias("n"),
        F.sum("__s").alias("__S"),
        F.sum("__q").alias("__Q"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__W"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("__W") - F.col("__S") * F.col("__S") / nd
    ssw = F.col("__Q") - F.col("__W")
    f_stat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (nd > kd) & (ssw > 0)
    return g.select(
        "k",
        "n",
        (F.round(F.when(ok, f_stat), 6) + F.lit(0.0)).alias("f_stat"),
        (
            F.round(F.when(ssb + ssw > 0, ssb / (ssb + ssw)), 6)
            + F.lit(0.0)
        ).alias("eta_sq"),
    )


def theil_sen(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    max_group_rows: int | None = 10_000,
) -> DataFrame:
    """Per-group Theil-Sen robust trend — the median of all pairwise
    slopes (Theil 1950, Sen 1968), the outlier-proof replacement for
    OLS slope on monitoring series (one wild day cannot move it):

        slope     = median over i<j of (y_j − y_i) / (x_j − x_i)
        intercept = median over i of (y_i − slope·x_i)

    using the repo's exact lower-median convention (inverse ECDF /
    Hyndman-Fan type 1: index ceil(n/2) of the sorted values). Rows
    with NULL x/y drop; pairs with equal x are skipped (vertical).

    Output: (*group_cols, n_points BIGINT, n_pairs BIGINT, slope
    DOUBLE round 6, intercept DOUBLE round 4); slope NULL when no
    valid pair exists.

    INTENDED FOR PRE-AGGREGATED SERIES (daily/hourly rollups): the
    pair self-join is O(n²) per group by definition of the statistic
    — aggregate the corpus to the series FIRST (the m_acf
    discipline; ENFORCED by the `max_group_rows` tripwire). The join
    is group-keyed; medians are windows over the pair table.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *gcols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    if max_group_rows is not None:
        mx = (
            base.groupBy(*gcols)
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )
        if mx is not None and mx > max_group_rows:
            raise ValueError(
                f"theil_sen: largest group holds {mx:,} points, over "
                f"max_group_rows={max_group_rows:,} — the pairwise-"
                "slope join is O(n²) PER GROUP by definition of the "
                "statistic. Aggregate the corpus to the series first "
                "(daily/hourly rollups, the m_acf discipline), or "
                "pass max_group_rows=None after confirming the cost."
            )
    a = base.alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in gcols]
    pairs = (
        a.join(b, cond)
        .filter(F.col("b.__x") > F.col("a.__x"))
        .select(
            *[F.col(f"a.{c}").alias(c) for c in gcols],
            (
                (F.col("b.__y") - F.col("a.__y"))
                / (F.col("b.__x") - F.col("a.__x"))
            ).alias("__s"),
        )
    )
    w_s = Window.partitionBy(*gcols).orderBy("__s")
    w_n = Window.partitionBy(*gcols)
    ranked = pairs.select(
        *gcols,
        "__s",
        F.row_number().over(w_s).alias("__r"),
        F.count(F.lit(1)).over(w_n).alias("__m"),
    )
    med = ranked.filter(
        F.col("__r") == F.greatest(F.ceil(F.col("__m") / 2), F.lit(1))
    ).select(*gcols, F.col("__s").alias("__slope"), F.col("__m"))
    resid = base.join(med, gcols).select(
        *gcols,
        "__slope",
        "__m",
        (F.col("__y") - F.col("__slope") * F.col("__x")).alias("__e"),
    )
    w_e = Window.partitionBy(*gcols).orderBy("__e")
    w_en = Window.partitionBy(*gcols)
    er = resid.select(
        *gcols,
        "__slope",
        "__m",
        "__e",
        F.row_number().over(w_e).alias("__r"),
        F.count(F.lit(1)).over(w_en).alias("__k"),
    )
    picked = er.filter(
        F.col("__r") == F.greatest(F.ceil(F.col("__k") / 2), F.lit(1))
    )
    counts = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return counts.join(picked, gcols, "left").select(
        *gcols,
        "n_points",
        F.coalesce(F.col("__m"), F.lit(0)).cast("long").alias("n_pairs"),
        (F.round(F.col("__slope"), 6) + F.lit(0.0)).alias("slope"),
        (F.round(F.col("__e"), 4) + F.lit(0.0)).alias("intercept"),
    )


def lin_ccc(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Lin's concordance correlation coefficient (Lin 1989)
    — agreement with the 45° line, not just linear association: two
    judges can correlate perfectly (Pearson 1) while disagreeing by a
    constant offset (CCC < 1). The multi-judge / model-vs-gold
    numeric-agreement metric beside `m_cohens_kappa`'s categorical
    one:

        CCC = 2·cov(x,y) / (var(x) + var(y) + (mean_x − mean_y)²)

    (population moments). Rows with NULL x/y drop; CCC NULL when the
    denominator is 0 (both constant and equal-mean).

    Output: (*group_cols, n BIGINT, pearson DOUBLE round 6, ccc
    DOUBLE round 6).

    Plan: one partial-aggregated 5-sum groupBy; both statistics are
    moment ratios (the m_anova rounding-stability argument).
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        *gcols, xc.alias("__x"), yc.alias("__y")
    )
    g = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    nd = F.col("n").cast("double")
    vx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nd
    vy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nd
    cv = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nd
    dm = (F.col("__sx") - F.col("__sy")) / nd
    den = vx + vy + nd * dm * dm
    return g.select(
        *gcols,
        "n",
        (
            F.round(
                F.when((vx > 0) & (vy > 0), cv / F.sqrt(vx * vy)), 6
            )
            + F.lit(0.0)
        ).alias("pearson"),
        (
            F.round(F.when(den > 0, F.lit(2.0) * cv / den), 6)
            + F.lit(0.0)
        ).alias("ccc"),
    )


def levene_bf(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe test of variance homogeneity (Levene's test with
    the median center, Brown & Forsythe 1974) — "do these segments
    merely differ in SPREAD?", the robust precondition check for
    `anova_oneway` (whose F compares means assuming equal variances):
    a one-way ANOVA F computed on z_ij = |x_ij − median_j|.

    Output: ONE row (k BIGINT, n BIGINT, f_stat DOUBLE round 6,
    eta_sq DOUBLE round 6) — `anova_oneway`'s output over the
    deviation scores.

    Plan: one exact-median rank window + a group-sized broadcast
    join-back, then anova_oneway's two-level combiner tree.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(
        vc.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("__g"), vc.alias("__v"))
    med = _group_median(base, ["__g"], "__v", "med")
    dev = base.join(F.broadcast(med), ["__g"]).select(
        "__g", F.abs(F.col("__v") - F.col("med")).alias("__z")
    )
    return anova_oneway(dev, "__g", "__z")


def odds_ratio(
    df: DataFrame,
    exposure_col: str,
    outcome_col: str,
    z: float = 1.96,
) -> DataFrame:
    """2x2 odds ratio + relative risk with the Woolf log-normal CI —
    the epidemiology-style exposure/outcome readout (feature flag vs
    crash, segment vs churn) beside m_ab_test's difference-of-
    proportions z:

        OR = (a·d) / (b·c),  RR = (a/(a+b)) / (c/(c+d))
        CI = exp(ln OR ± z·sqrt(1/a + 1/b + 1/c + 1/d))

    with a = exposed+outcome, b = exposed−, c = unexposed+,
    d = unexposed−. Any zero cell makes OR/CI NULL (no continuity
    fudge — the caller should see the boundary). exposure/outcome
    must be 0/1.

    Output: ONE row (a, b, c, d BIGINT, odds_ratio, rel_risk, ci_lo,
    ci_hi DOUBLE round 4).

    Plan: one 4-counter conditional aggregation (the m_confusion
    shape) + pure arithmetic.
    """
    ex = F.col(exposure_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    g = df.filter(ex.isNotNull() & oc.isNotNull()).agg(
        F.sum(F.when((ex == 1) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((ex == 1) & (oc == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((ex == 0) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((ex == 0) & (oc == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    ad_, bd_, cd_, dd_ = (
        F.col("a").cast("double"),
        F.col("b").cast("double"),
        F.col("c").cast("double"),
        F.col("d").cast("double"),
    )
    ok = (
        (F.col("a") > 0)
        & (F.col("b") > 0)
        & (F.col("c") > 0)
        & (F.col("d") > 0)
    )
    orr = ad_ * dd_ / (bd_ * cd_)
    rr = (ad_ / (ad_ + bd_)) / (cd_ / (cd_ + dd_))
    se = F.sqrt(
        F.lit(1.0) / ad_
        + F.lit(1.0) / bd_
        + F.lit(1.0) / cd_
        + F.lit(1.0) / dd_
    )
    return g.select(
        "a",
        "b",
        "c",
        "d",
        F.round(F.when(ok, orr), 4).alias("odds_ratio"),
        F.round(F.when(ok, rr), 4).alias("rel_risk"),
        F.round(F.when(ok, F.exp(F.log(orr) - F.lit(z) * se)), 4).alias(
            "ci_lo"
        ),
        F.round(F.when(ok, F.exp(F.log(orr) + F.lit(z) * se)), 4).alias(
            "ci_hi"
        ),
    )


def capture_recapture(
    df_a: DataFrame,
    key_a,
    df_b: DataFrame,
    key_b,
) -> DataFrame:
    """Lincoln-Petersen / Chapman population estimate from two
    overlapping samples — "how many distinct items exist in total?"
    when you can only afford two partial crawls (the exact-count
    sibling of `kmv_intersect`'s sketched overlap):

        lincoln = n1·n2 / m
        chapman = (n1+1)(n2+1)/(m+1) − 1    (bias-corrected, finite
                                             even at m = 0)

    with n1/n2 the distinct key counts and m the distinct overlap.
    lincoln is NULL at m = 0. NULL keys drop.

    Output: ONE row (n1, n2, m BIGINT, lincoln DOUBLE round 4,
    chapman DOUBLE round 4).

    Plan: two map-side-distinct counts + one distinct-key equi-join
    for the overlap; everything combines in 1-row aggregates.
    """
    ka = F.col(key_a) if isinstance(key_a, str) else key_a
    kb = F.col(key_b) if isinstance(key_b, str) else key_b
    a = df_a.filter(ka.isNotNull()).select(ka.alias("__k")).distinct()
    b = df_b.filter(kb.isNotNull()).select(kb.alias("__k")).distinct()
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    m = a.join(b, "__k").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    g = na.join(F.broadcast(nb)).join(F.broadcast(m))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    md = F.col("m").cast("double")
    return g.select(
        "n1",
        "n2",
        "m",
        F.round(F.when(F.col("m") > 0, n1d * n2d / md), 4).alias(
            "lincoln"
        ),
        F.round(
            (n1d + F.lit(1.0))
            * (n2d + F.lit(1.0))
            / (md + F.lit(1.0))
            - F.lit(1.0),
            4,
        ).alias("chapman"),
    )


def sample_size_2prop(
    df: DataFrame,
    group_col: str,
    outcome_col: str,
    z_alpha: float = 1.96,
    z_power: float = 0.8416212335729143,
) -> DataFrame:
    """A/B sample-size planner from observed proportions — "how many
    units per arm would detecting THIS difference take?" (the
    standard two-proportion formula at alpha = .05 two-sided, power
    = .80 by default):

        n/arm = (z_a + z_b)² · (p1·q1 + p2·q2) / (p1 − p2)²

    with p1/p2 the observed outcome rates of group 1/0. The z
    quantiles are caller-supplied DOUBLE literals (no inverse-normal
    in either engine — mirror the digits in the oracle). n is NULL
    when the observed difference is < 1e-6 (the answer would be
    absurd and unstable, surface the hole).

    Output: ONE row (n1, n2 BIGINT, p1, p2 DOUBLE round 6, diff
    DOUBLE round 6, n_per_arm BIGINT).

    Plan: one 4-counter conditional agg + pure arithmetic.
    """
    gr = F.col(group_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    g = df.filter(gr.isNotNull() & oc.isNotNull()).agg(
        F.sum(F.when(gr == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(gr == 0, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when((gr == 1) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("__s1"),
        F.sum(F.when((gr == 0) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("__s2"),
    )
    p1 = F.col("__s1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("__s2").cast("double") / F.col("n2").cast("double")
    diff = p1 - p2
    zz = F.lit(z_alpha) + F.lit(z_power)
    n_arm = (
        zz
        * zz
        * (p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2))
        / (diff * diff)
    )
    ok = (
        (F.col("n1") > 0)
        & (F.col("n2") > 0)
        & (F.abs(diff) >= 1e-6)
    )
    return g.select(
        "n1",
        "n2",
        F.round(F.when(F.col("n1") > 0, p1), 6).alias("p1"),
        F.round(F.when(F.col("n2") > 0, p2), 6).alias("p2"),
        (
            F.round(
                F.when((F.col("n1") > 0) & (F.col("n2") > 0), diff), 6
            )
            + F.lit(0.0)
        ).alias("diff"),
        F.when(ok, F.ceil(n_arm)).cast("long").alias("n_per_arm"),
    )


def mcnemar_test(
    df: DataFrame,
    y1_col: str,
    y2_col: str,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes (McNemar 1947) — did
    the same units change state between two conditions? (before/after
    a launch, judge A vs judge B on the same items — the paired
    counterpart of m_ab_test's independent-samples z). Only the
    discordant cells carry information:

        b = (1, 0) pairs,  c = (0, 1) pairs
        chi2 = (b − c)² / (b + c)     (no continuity correction)
        z    = (b − c) / sqrt(b + c)

    Output: ONE row (n, n11, b, c, n00 BIGINT, chi2 DOUBLE round 6,
    z DOUBLE round 6); NULL statistics when b + c = 0 (no discordant
    pairs — nothing to test). NULL outcomes drop the pair.

    Plan: one 4-counter conditional aggregation (the m_confusion
    shape) + pure arithmetic.
    """
    a = F.col(y1_col).cast("int")
    b = F.col(y2_col).cast("int")
    g = df.filter(a.isNotNull() & b.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((a == 1) & (b == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((a == 1) & (b == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((a == 0) & (b == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((a == 0) & (b == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    bd = F.col("b").cast("double")
    cd = F.col("c").cast("double")
    ok = (F.col("b") + F.col("c")) > 0
    return g.select(
        "n",
        "n11",
        "b",
        "c",
        "n00",
        F.round(
            F.when(ok, (bd - cd) * (bd - cd) / (bd + cd)), 6
        ).alias("chi2"),
        (
            F.round(F.when(ok, (bd - cd) / F.sqrt(bd + cd)), 6)
            + F.lit(0.0)
        ).alias("z"),
    )


def equivalence_test(
    df: DataFrame,
    group_col: str,
    outcome_col: str,
    margin: float,
    z: float = 1.6448536269514722,
) -> DataFrame:
    """Two-proportion equivalence test (TOST via the 90% CI shortcut:
    Schuirmann 1987) — "did this change do NOTHING?", the question a
    significance test cannot answer (failing to reject is not
    equivalence). The launch-safety gate for refactors and
    infrastructure swaps:

        equivalent <=> the (1 − 2·alpha) CI of p1 − p2 lies entirely
                       inside (−margin, +margin)

    with the default z the 90% two-sided quantile (alpha = .05 per
    one-sided test), digit-mirrored in the oracle. group/outcome must
    be 0/1.

    Output: ONE row (n1, n2 BIGINT, p1, p2, diff, ci_lo, ci_hi
    DOUBLE round 6, equivalent BOOLEAN — NULL when either arm is
    empty).

    Plan: one 4-counter agg (the m_confusion shape) + arithmetic.
    """
    if margin <= 0:
        raise ValueError("margin must be > 0")
    gr = F.col(group_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    g = df.filter(gr.isNotNull() & oc.isNotNull()).agg(
        F.sum(F.when(gr == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(gr == 0, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when((gr == 1) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("__s1"),
        F.sum(F.when((gr == 0) & (oc == 1), 1).otherwise(0))
        .cast("long")
        .alias("__s2"),
    )
    p1 = F.col("__s1").cast("double") / F.col("n1").cast("double")
    p2 = F.col("__s2").cast("double") / F.col("n2").cast("double")
    diff = p1 - p2
    se = F.sqrt(
        p1 * (F.lit(1.0) - p1) / F.col("n1").cast("double")
        + p2 * (F.lit(1.0) - p2) / F.col("n2").cast("double")
    )
    lo = diff - F.lit(z) * se
    hi = diff + F.lit(z) * se
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return g.select(
        "n1",
        "n2",
        F.round(F.when(ok, p1), 6).alias("p1"),
        F.round(F.when(ok, p2), 6).alias("p2"),
        (F.round(F.when(ok, diff), 6) + F.lit(0.0)).alias("diff"),
        (F.round(F.when(ok, lo), 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(F.when(ok, hi), 6) + F.lit(0.0)).alias("ci_hi"),
        F.when(
            ok, (lo > F.lit(-margin)) & (hi < F.lit(margin))
        ).alias("equivalent"),
    )


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 analysis (Mantel &
    Haenszel 1959) — the confounder-adjusted companion of
    `odds_ratio`: a common exposure-outcome odds ratio ACROSS strata,
    immune to the Simpson's-paradox reversal a pooled 2x2 invites:

        OR_mh = sum(a_i d_i / n_i) / sum(b_i c_i / n_i)
        chi2  = (sum a_i - sum E_i)^2 / sum V_i     (no continuity corr.)
        E_i   = (a+b)(a+c)/n
        V_i   = (a+b)(c+d)(a+c)(b+d) / (n^2 (n-1))

    exposure and outcome must be 0/1; NULL rows drop; single-row
    strata contribute no variance (V undefined at n=1 — excluded from
    all three sums, the standard convention).

    Output: ONE row (n_strata BIGINT, n BIGINT, or_mh DOUBLE round 6,
    chi2 DOUBLE round 6); NULLs when a denominator vanishes.

    Plan: one stratum-keyed 4-counter partial agg + a 1-row fold —
    cost is the stratum count, never the corpus.
    """
    ec = F.col(exposure_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    base = df.filter(
        F.col(stratum_col).isNotNull()
        & ec.isNotNull()
        & oc.isNotNull()
    ).select(
        F.col(stratum_col).alias("__s"), ec.alias("__e"), oc.alias("__o")
    )
    cells = base.groupBy("__s").agg(
        F.sum(((F.col("__e") == 1) & (F.col("__o") == 1)).cast("long"))
        .alias("__a"),
        F.sum(((F.col("__e") == 1) & (F.col("__o") == 0)).cast("long"))
        .alias("__b"),
        F.sum(((F.col("__e") == 0) & (F.col("__o") == 1)).cast("long"))
        .alias("__c"),
        F.sum(((F.col("__e") == 0) & (F.col("__o") == 0)).cast("long"))
        .alias("__d"),
    )
    a = F.col("__a").cast("double")
    b = F.col("__b").cast("double")
    c = F.col("__c").cast("double")
    d = F.col("__d").cast("double")
    n = a + b + c + d
    usable = n > 1
    e_i = (a + b) * (a + c) / n
    v_i = (
        (a + b) * (c + d) * (a + c) * (b + d)
        / (n * n * (n - F.lit(1.0)))
    )
    g = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(n).cast("long").alias("n"),
        F.sum(F.when(usable, a * d / n)).alias("__ad"),
        F.sum(F.when(usable, b * c / n)).alias("__bc"),
        F.sum(F.when(usable, a)).alias("__sa"),
        F.sum(F.when(usable, e_i)).alias("__se"),
        F.sum(F.when(usable, v_i)).alias("__sv"),
    )
    dev = F.col("__sa") - F.col("__se")
    return g.select(
        "n_strata",
        "n",
        (
            F.round(
                F.when(F.col("__bc") > 0, F.col("__ad") / F.col("__bc")),
                6,
            )
            + F.lit(0.0)
        ).alias("or_mh"),
        (
            F.round(
                F.when(F.col("__sv") > 0, dev * dev / F.col("__sv")), 6
            )
            + F.lit(0.0)
        ).alias("chi2"),
    )


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Bartlett's test of variance homogeneity (Bartlett 1937) — ARE
    the K groups' variances equal? The parametric sharp-tooth beside
    `m_brown_forsythe`'s robust version (Bartlett is the more powerful
    test when normality holds, and the one classic ANOVA assumes):

        Sp2  = sum (n_k - 1) s_k^2 / (N - K)
        stat = [(N-K) ln Sp2 - sum (n_k-1) ln s_k^2]
               / [1 + (sum 1/(n_k-1) - 1/(N-K)) / (3(K-1))]

    Groups with n_k < 2 or zero variance drop from the fold (ln
    undefined — the standard treatment; remaining K must be >= 2).

    Output: ONE row (n BIGINT, k BIGINT, stat DOUBLE round 6); NULL
    when fewer than 2 usable groups. Plan: one group-keyed 3-moment
    partial agg + a 1-row fold.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(
        F.col(group_col).isNotNull() & vc.isNotNull()
    ).select(F.col(group_col).alias("__g"), vc.alias("__v"))
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__nk"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    var_k = (
        F.col("__q") - F.col("__s") * F.col("__s") / F.col("__nk")
    ) / (F.col("__nk") - F.lit(1.0))
    usable = (F.col("__nk") >= 2) & (var_k > 0)
    g = per.agg(
        F.sum(F.when(usable, F.col("__nk"))).alias("__N"),
        F.count(F.when(usable, 1)).cast("long").alias("k"),
        F.sum(
            F.when(usable, (F.col("__nk") - F.lit(1.0)) * var_k)
        ).alias("__sw"),
        F.sum(
            F.when(
                usable, (F.col("__nk") - F.lit(1.0)) * F.log(var_k)
            )
        ).alias("__slog"),
        F.sum(
            F.when(usable, F.lit(1.0) / (F.col("__nk") - F.lit(1.0)))
        ).alias("__sinv"),
    )
    nd = F.col("__N")
    kd = F.col("k").cast("double")
    dof = nd - kd
    sp2 = F.col("__sw") / dof
    num = dof * F.log(sp2) - F.col("__slog")
    den = F.lit(1.0) + (
        F.col("__sinv") - F.lit(1.0) / dof
    ) / (F.lit(3.0) * (kd - F.lit(1.0)))
    ok = (F.col("k") >= 2) & (dof > 0) & (sp2 > 0)
    return g.select(
        F.coalesce(nd, F.lit(0.0)).cast("long").alias("n"),
        "k",
        (F.round(F.when(ok, num / den), 6) + F.lit(0.0)).alias("stat"),
    )


def cochrans_q(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — K related BINARY treatments
    measured once per block: do success rates differ across
    treatments? The binary-outcome sibling of `friedman_test` (and the
    K-treatment generalization of McNemar):

        Q = K(K-1) sum_j (C_j - T/K)^2 / (K T - sum_i R_i^2)

    with C_j the treatment success totals, R_i the block success
    totals, T the grand total. outcome must be 0/1; every block must
    carry exactly one outcome per treatment (validated with a 1-row
    check, the friedman convention).

    Output: ONE row (n_blocks, k BIGINT, q DOUBLE round 6); NULL q at
    the degenerate denominator (all-0 or all-1 blocks only).

    Plan: one (block, treat)-keyed input; two partial-aggregated
    count folds (treatment totals, block totals) + 1-row combines —
    counts only, exact integer arithmetic into one final ratio.
    """
    oc = F.col(outcome_col).cast("int")
    base = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & oc.isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        F.col(treat_col).alias("__k"),
        oc.alias("__o"),
    )
    per_block = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.countDistinct("__k").alias("__kd"),
        F.sum("__o").cast("long").alias("__R"),
    )
    chk = per_block.agg(
        F.min("__cnt").alias("clo"),
        F.max("__cnt").alias("chi"),
        F.min("__kd").alias("klo"),
        F.max("__kd").alias("khi"),
        F.count(F.lit(1)).cast("long").alias("nb"),
    ).join(
        F.broadcast(base.agg(F.countDistinct("__k").alias("kg")))
    ).collect()[0]
    if chk["nb"] == 0:
        raise ValueError("cochrans_q: empty input")
    if not (
        chk["clo"] == chk["chi"] == chk["klo"] == chk["khi"] == chk["kg"]
    ):
        raise ValueError(
            "cochrans_q: blocks must hold exactly one outcome per "
            f"treatment (counts {chk['clo']}-{chk['chi']}, distinct "
            f"treatments {chk['klo']}-{chk['khi']}, global "
            f"{chk['kg']}) -- every block must cover the SAME "
            "treatment set"
        )
    k = int(chk["klo"])
    if k < 2:
        raise ValueError("cochrans_q: need >= 2 treatments")
    n = int(chk["nb"])
    cols = base.groupBy("__k").agg(
        F.sum("__o").cast("long").alias("__C")
    )
    blocks = per_block.agg(
        F.sum("__R").cast("long").alias("__T"),
        F.sum(F.col("__R") * F.col("__R")).cast("long").alias("__R2"),
    )
    colsum = cols.agg(
        F.sum(F.col("__C") * F.col("__C")).cast("long").alias("__C2"),
    )
    g = colsum.join(F.broadcast(blocks))
    td = F.col("__T").cast("double")
    # K(K-1) [sum C_j^2 - T^2/K] / (K T - sum R_i^2)  — the expanded
    # equivalent of sum (C_j - T/K)^2 with exact integer C2/R2/T
    num = F.lit(float(k * (k - 1))) * (
        F.col("__C2").cast("double") - td * td / F.lit(float(k))
    )
    den = F.lit(float(k)) * td - F.col("__R2").cast("double")
    return g.select(
        F.lit(n).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        (
            F.round(F.when(den > 0, num / den), 6) + F.lit(0.0)
        ).alias("q"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    case_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Cochran-Armitage trend test (Armitage 1955; R's
    prop.trend.test) — does a BINARY outcome's rate trend linearly
    with an ordinal score? The 2xK dose-response classic (and the
    GWAS allelic trend test at genotype dosage scores 0/1/2):

        chi2 = (sum s a - A (sum s n) / N)^2
               / [ A/N (1 - A/N) (sum s^2 n - (sum s n)^2 / N) ]

    with per-score-level cases a_k, totals n_k, A = sum a, N = sum n.
    case must be 0/1; score numeric-ordinal. NULL rows drop.

    Output: one row per group — or ONE row with empty `group_cols` —
    (*group_cols, n BIGINT, k BIGINT, chi2 DOUBLE round 6, slope
    DOUBLE round 6 — the numerator's sign carrier, rate change per
    score unit); NULL at degenerate margins. The grouped form is the
    SCAN shape (one trend test per site/stratum — the GWAS per-variant
    allelic trend scan).

    Plan: one (group, score)-keyed 2-counter partial agg + one
    group-keyed fold — exact integer sums into one final rational
    expression per group.
    """
    gcols = list(group_cols)
    sc = F.col(score_col).cast("double")
    cc = F.col(case_col).cast("int")
    base = df.filter(sc.isNotNull() & cc.isNotNull()).select(
        *gcols, sc.alias("__s"), cc.alias("__c")
    )
    cells = base.groupBy(*gcols, "__s").agg(
        F.sum("__c").cast("long").alias("__a"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    g = cells.groupBy(*gcols).agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__a").cast("long").alias("__A"),
        F.sum(F.col("__s") * F.col("__a")).alias("__sa"),
        F.sum(F.col("__s") * F.col("__n")).alias("__sn"),
        F.sum(F.col("__s") * F.col("__s") * F.col("__n")).alias(
            "__ssn"
        ),
    )
    nd = F.col("n").cast("double")
    ad = F.col("__A").cast("double")
    num = F.col("__sa") - ad * F.col("__sn") / nd
    svar = F.col("__ssn") - F.col("__sn") * F.col("__sn") / nd
    p = ad / nd
    den = p * (F.lit(1.0) - p) * svar
    ok = (F.col("k") >= 2) & (den > 0)
    return g.select(
        *gcols,
        "n",
        "k",
        (F.round(F.when(ok, num * num / den), 6) + F.lit(0.0)).alias(
            "chi2"
        ),
        (F.round(F.when(ok, num / svar), 6) + F.lit(0.0)).alias(
            "slope"
        ),
    )


def welch_t_test(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Welch's two-sample t test (Welch 1947) — the unequal-variance
    mean comparison that should be the DEFAULT over Student's t (it
    costs nothing when variances match and stays honest when they
    don't); the parametric partner of `mann_whitney_u`:

        t  = (m1 - m0) / sqrt(s1^2/n1 + s0^2/n0)
        df = (s1^2/n1 + s0^2/n0)^2
             / [ (s1^2/n1)^2/(n1-1) + (s0^2/n0)^2/(n0-1) ]

    (Welch-Satterthwaite degrees of freedom). flag must be 0/1; NULL
    rows drop. Output: (*group_cols, n0, n1 BIGINT, mean_diff DOUBLE
    round 6, t DOUBLE round 6, df DOUBLE round 4); NULL statistics
    when either side has n < 2 or both variances are 0.

    Plan: one group-keyed 6-sum conditional partial agg — moment
    ratios only, no second pass.
    """
    gcols = list(group_cols)
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        *gcols, fc.alias("__f"), vc.alias("__v")
    )
    is1 = F.col("__f") == 1
    is0 = F.col("__f") == 0
    g = base.groupBy(*gcols).agg(
        F.count(F.when(is0, 1)).cast("long").alias("n0"),
        F.count(F.when(is1, 1)).cast("long").alias("n1"),
        F.sum(F.when(is0, F.col("__v"))).alias("__s0"),
        F.sum(F.when(is1, F.col("__v"))).alias("__s1"),
        F.sum(F.when(is0, F.col("__v") * F.col("__v"))).alias("__q0"),
        F.sum(F.when(is1, F.col("__v") * F.col("__v"))).alias("__q1"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    m0 = F.col("__s0") / n0d
    m1 = F.col("__s1") / n1d
    v0 = (F.col("__q0") - F.col("__s0") * F.col("__s0") / n0d) / (
        n0d - F.lit(1.0)
    )
    v1 = (F.col("__q1") - F.col("__s1") * F.col("__s1") / n1d) / (
        n1d - F.lit(1.0)
    )
    se2 = v1 / n1d + v0 / n0d
    t = (m1 - m0) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (v1 / n1d) * (v1 / n1d) / (n1d - F.lit(1.0))
        + (v0 / n0d) * (v0 / n0d) / (n0d - F.lit(1.0))
    )
    ok = (F.col("n0") >= 2) & (F.col("n1") >= 2) & (se2 > 0)
    return g.select(
        *gcols,
        "n0",
        "n1",
        (F.round(F.when(ok, m1 - m0), 6) + F.lit(0.0)).alias(
            "mean_diff"
        ),
        (F.round(F.when(ok, t), 6) + F.lit(0.0)).alias("t"),
        (F.round(F.when(ok, dof), 4) + F.lit(0.0)).alias("df"),
    )


def paired_t_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Paired t test — the parametric partner of
    `wilcoxon_signed_rank` (same design: one difference per unit,
    is its mean zero?):

        t = mean(d) / (sd(d) / sqrt(n)),   d = x - y,  df = n - 1

    NULL-incomplete pairs drop (both sides required). Output:
    (*group_cols, n BIGINT, mean_diff DOUBLE round 6, t DOUBLE
    round 6); NULL statistics when n < 2 or sd = 0.

    Plan: one group-keyed 3-sum partial agg over the differences.
    """
    gcols = list(group_cols)
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        *gcols, (xc - yc).alias("__d")
    )
    g = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__d").alias("__s"),
        F.sum(F.col("__d") * F.col("__d")).alias("__q"),
    )
    nd = F.col("n").cast("double")
    m = F.col("__s") / nd
    var = (F.col("__q") - F.col("__s") * F.col("__s") / nd) / (
        nd - F.lit(1.0)
    )
    t = m / F.sqrt(var / nd)
    ok = (F.col("n") >= 2) & (var > 0)
    return g.select(
        *gcols,
        "n",
        (F.round(F.when(F.col("n") >= 1, m), 6) + F.lit(0.0)).alias(
            "mean_diff"
        ),
        (F.round(F.when(ok, t), 6) + F.lit(0.0)).alias("t"),
    )


def tost_means(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    margin: float,
) -> DataFrame:
    """Mean-equivalence TOST (Schuirmann 1987) on the Welch footing —
    the `equivalence_test` sibling for MEANS: is the two-group mean
    difference provably NEGLIGIBLE (within ±margin), which failing to
    reject a t test never shows? Verdict = the 90% Welch CI sitting
    strictly inside the margin (the two-one-sided-tests identity):

        ci = (m1 - m0) ± 1.6448536269514722 * sqrt(s1²/n1 + s0²/n0)

    (z form of the TOST — the large-sample practice; the 90% normal
    quantile is a digit-mirrored DOUBLE literal, the m_equivalence
    convention). flag must be 0/1. Output: ONE row (n0, n1 BIGINT,
    diff, ci_lo, ci_hi DOUBLE round 6, equivalent BOOLEAN); NULLs at
    degenerate sides.

    Plan: the welch_t_test 6-sum conditional agg, one pass.
    """
    if margin <= 0:
        raise ValueError("margin must be > 0")
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    is1 = F.col("__f") == 1
    is0 = F.col("__f") == 0
    g = base.agg(
        F.count(F.when(is0, 1)).cast("long").alias("n0"),
        F.count(F.when(is1, 1)).cast("long").alias("n1"),
        F.sum(F.when(is0, F.col("__v"))).alias("__s0"),
        F.sum(F.when(is1, F.col("__v"))).alias("__s1"),
        F.sum(F.when(is0, F.col("__v") * F.col("__v"))).alias("__q0"),
        F.sum(F.when(is1, F.col("__v") * F.col("__v"))).alias("__q1"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    m0 = F.col("__s0") / n0d
    m1 = F.col("__s1") / n1d
    v0 = (F.col("__q0") - F.col("__s0") * F.col("__s0") / n0d) / (
        n0d - F.lit(1.0)
    )
    v1 = (F.col("__q1") - F.col("__s1") * F.col("__s1") / n1d) / (
        n1d - F.lit(1.0)
    )
    se = F.sqrt(v1 / n1d + v0 / n0d)
    z90 = F.lit(1.6448536269514722)
    diff = m1 - m0
    lo = diff - z90 * se
    hi = diff + z90 * se
    ok = (F.col("n0") >= 2) & (F.col("n1") >= 2) & (se > 0)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, diff), 6) + F.lit(0.0)).alias("diff"),
        (F.round(F.when(ok, lo), 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(F.when(ok, hi), 6) + F.lit(0.0)).alias("ci_hi"),
        F.when(
            ok,
            (lo > F.lit(-float(margin))) & (hi < F.lit(float(margin))),
        ).alias("equivalent"),
    )


def rate_ratio(
    df: DataFrame,
    flag_col: str,
    event_col: str,
    exposure_col: str,
) -> DataFrame:
    """Poisson incidence-rate ratio — the two-RATE comparison
    `odds_ratio` (2x2 counts) and `ab_test_proportions` (per-unit
    binomial) don't cover: events per unit of EXPOSURE (person-time,
    tokens processed, requests served), compared across two groups:

        irr = (e1/x1) / (e0/x0)
        z   = ln(irr) / sqrt(1/e1 + 1/e0)   (the classic log-IRR SE)

    flag must be 0/1; event COUNTS and positive exposures per row
    (pre-aggregated units are fine — sums are what matter). Output:
    ONE row (events0, events1 BIGINT, exposure0, exposure1 DOUBLE
    round 4, irr DOUBLE round 6, z DOUBLE round 6); NULLs when either
    side has zero events or exposure.

    Plan: one 4-sum conditional agg + a 1-row fold; engine ln parity
    holds at 6dp (the m_js_divergence precedent).
    """
    fc = F.col(flag_col).cast("int")
    ec = F.col(event_col).cast("long")
    xc = F.col(exposure_col).cast("double")
    base = df.filter(
        fc.isNotNull() & ec.isNotNull() & xc.isNotNull() & (xc > 0)
    ).select(fc.alias("__f"), ec.alias("__e"), xc.alias("__x"))
    is1 = F.col("__f") == 1
    is0 = F.col("__f") == 0
    g = base.agg(
        F.coalesce(F.sum(F.when(is0, F.col("__e"))), F.lit(0))
        .cast("long").alias("events0"),
        F.coalesce(F.sum(F.when(is1, F.col("__e"))), F.lit(0))
        .cast("long").alias("events1"),
        F.coalesce(F.sum(F.when(is0, F.col("__x"))), F.lit(0.0))
        .alias("__x0"),
        F.coalesce(F.sum(F.when(is1, F.col("__x"))), F.lit(0.0))
        .alias("__x1"),
    )
    e0 = F.col("events0").cast("double")
    e1 = F.col("events1").cast("double")
    irr = (e1 / F.col("__x1")) / (e0 / F.col("__x0"))
    z = F.log(irr) / F.sqrt(
        F.lit(1.0) / e1 + F.lit(1.0) / e0
    )
    ok = (
        (F.col("events0") > 0)
        & (F.col("events1") > 0)
        & (F.col("__x0") > 0)
        & (F.col("__x1") > 0)
    )
    return g.select(
        "events0",
        "events1",
        F.round(F.col("__x0"), 4).alias("exposure0"),
        F.round(F.col("__x1"), 4).alias("exposure1"),
        (F.round(F.when(ok, irr), 6) + F.lit(0.0)).alias("irr"),
        (F.round(F.when(ok, z), 6) + F.lit(0.0)).alias("z"),
    )


def grubbs_test(df: DataFrame, value_col: str) -> DataFrame:
    """Grubbs' maximum-outlier test (Grubbs 1950): is the single most
    extreme value an outlier under normality?  G = max|x - mean| / sd.
    Output: ONE row (n BIGINT, suspect DOUBLE, g DOUBLE round 6) — the
    suspect value is the extreme itself (ties broken toward the
    smaller value for determinism); g NULL when n < 3 or sd = 0.

    Plan: one moment agg + one TakeOrdered(1) on the deviation — no
    window, no join."""
    vc = F.col(value_col).cast("double")
    base = df.filter(vc.isNotNull()).select(vc.alias("__v"))
    mom = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__v").alias("__m"),
        F.stddev_samp("__v").alias("__sd"),
    )
    dev = base.crossJoin(F.broadcast(mom)).select(
        "n",
        "__m",
        "__sd",
        "__v",
        F.abs(F.col("__v") - F.col("__m")).alias("__d"),
    )
    top = dev.orderBy(F.col("__d").desc(), F.col("__v").asc()).limit(1)
    ok = (F.col("n") >= 3) & (F.col("__sd") > 0)
    return top.select(
        "n",
        F.round(F.col("__v"), 6).alias("suspect"),
        (
            F.round(F.when(ok, F.col("__d") / F.col("__sd")), 6)
            + F.lit(0.0)
        ).alias("g"),
    )


def jarque_bera(df: DataFrame, value_col: str) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera 1980) — the
    moments-only normality screen (the one test here that needs NO
    ranks, ladder or grid):

        g1 = m3 / m2^1.5,   g2 = m4 / m2² - 3     (biased moments)
        JB = n/6 (g1² + g2²/4)                     ~ chi²(2) under H0

    Output: ONE row (n BIGINT, skew, kurtosis, jb DOUBLE round 6);
    NULL stats when n < 2 or variance = 0.

    Plan: ONE partial-aggregated pass accumulating the four power
    sums; everything else is a 1-row fold — the cheapest statistic in
    the family, and the first normality gate before reaching for
    m_fligner / m_vdw's rank machinery.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(vc.isNotNull()).select(vc.alias("__v"))
    g = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("__s1"),
        F.sum(F.col("__v") * F.col("__v")).alias("__s2"),
        F.sum(F.col("__v") * F.col("__v") * F.col("__v")).alias("__s3"),
        F.sum(
            F.col("__v") * F.col("__v") * F.col("__v") * F.col("__v")
        ).alias("__s4"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("__s1") / nd
    m2 = F.col("__s2") / nd - mu * mu
    m3 = (
        F.col("__s3") / nd
        - 3 * mu * F.col("__s2") / nd
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("__s4") / nd
        - 4 * mu * F.col("__s3") / nd
        + 6 * mu * mu * F.col("__s2") / nd
        - 3 * mu * mu * mu * mu
    )
    g1 = m3 / F.pow(m2, 1.5)
    g2 = m4 / (m2 * m2) - 3
    jb = nd / 6 * (g1 * g1 + g2 * g2 / 4)
    ok = (F.col("n") >= 2) & (m2 > 0)
    return g.select(
        "n",
        (F.round(F.when(ok, g1), 6) + F.lit(0.0)).alias("skew"),
        (F.round(F.when(ok, g2), 6) + F.lit(0.0)).alias("kurtosis"),
        (F.round(F.when(ok, jb), 6) + F.lit(0.0)).alias("jb"),
    )


def cohens_d(
    df: DataFrame,
    flag_col: str,
    value_col: str,
) -> DataFrame:
    """Cohen's d standardized mean difference (Cohen 1969) with
    Hedges' g small-sample correction (Hedges 1981) — the effect size
    every two-sample mean comparison must report beside its p-value
    (m_welch_t says whether the difference is REAL; this says whether
    it is BIG):

        d = (m1 - m0) / s_pooled,
        s_pooled² = [(n0-1)s0² + (n1-1)s1²] / (n0+n2-2)
        g = d * (1 - 3 / (4(n0+n1) - 9))     (the standard J approx)

    flag must be 0/1. Output: ONE row (n0, n1 BIGINT, mean_diff, d,
    g DOUBLE round 6); NULL effect when either n < 2 or the pooled
    variance is 0.

    Plan: ONE conditional 6-sum pass (the welch_t device) + a 1-row
    fold.
    """
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )

    def side(f, what):
        m = F.col("__f") == f
        if what == "n":
            return F.sum(F.when(m, 1).otherwise(0)).cast("long")
        if what == "s":
            return F.sum(F.when(m, F.col("__v")).otherwise(0.0))
        return F.sum(
            F.when(m, F.col("__v") * F.col("__v")).otherwise(0.0)
        )

    g = base.agg(
        *[
            side(f, w).alias(f"__{w}{f}")
            for f in (0, 1)
            for w in ("n", "s", "q")
        ]
    )
    n0 = F.col("__n0").cast("double")
    n1 = F.col("__n1").cast("double")
    m0 = F.col("__s0") / n0
    m1 = F.col("__s1") / n1
    ss0 = F.col("__q0") - n0 * m0 * m0
    ss1 = F.col("__q1") - n1 * m1 * m1
    sp2 = (ss0 + ss1) / (n0 + n1 - 2)
    d = (m1 - m0) / F.sqrt(sp2)
    corr = 1 - F.lit(3.0) / (4 * (n0 + n1) - 9)
    ok = (F.col("__n0") >= 2) & (F.col("__n1") >= 2) & (sp2 > 0)
    return g.select(
        F.col("__n0").alias("n0"),
        F.col("__n1").alias("n1"),
        (
            F.round(
                F.when(
                    (F.col("__n0") >= 1) & (F.col("__n1") >= 1), m1 - m0
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_diff"),
        (F.round(F.when(ok, d), 6) + F.lit(0.0)).alias("d"),
        (F.round(F.when(ok, d * corr), 6) + F.lit(0.0)).alias("g"),
    )


def fisher_exact_2x2(
    df: DataFrame,
    flag_a_col: str,
    flag_b_col: str,
    max_n: int | None = 100_000,
) -> DataFrame:
    """Fisher's exact test for a 2x2 table (Fisher 1935; R's
    fisher.test two-sided "minimum-likelihood" convention) — the exact
    small-sample association test where the chi-square approximation
    (m_cramers_v / m_odds_ratio's z) breaks down:

        p(k)  = C(ra,k) C(n−ra, ca−k) / C(n, ca)   (hypergeometric)
        p_two = Σ_{k : p(k) <= p(a)·(1+1e-7)} p(k)

    over the support k ∈ [max(0, ra+ca−n), min(ra, ca)], with
    a = both-flags count, ra/ca the flag-A row and flag-B column
    totals. Log-factorials evaluate as Σ ln i HOF folds; the support
    walks INCREMENTALLY (log p(k) = log p(k−1) + ln(ra−k+1) +
    ln(ca−k+1) − ln k − ln(n−ra−ca+k)) so the whole test is
    O(n + support) single-row expression work — the `max_n` tripwire
    raises beyond exact-test territory (use m_cmh / chi-square there).
    Both flags must be 0/1. Output: ONE row (a, b, c, d BIGINT,
    p_value DOUBLE round 8, odds_ratio DOUBLE round 6 — the sample OR
    ad/bc, NULL when any margin is empty or b·c = 0).

    Plan: ONE conditional 4-counter agg collapses the corpus; all the
    combinatorics are 1-row column expressions (a struct-accumulator
    HOF fold — fine in Spark; the SQL twin walks the same recurrence
    with WITH RECURSIVE because DuckDB struct-LAMBDA accumulators
    mis-evaluate sibling fields)."""
    fa = F.col(flag_a_col).cast("int")
    fb = F.col(flag_b_col).cast("int")
    base = df.filter(fa.isNotNull() & fb.isNotNull()).select(
        fa.alias("__a"), fb.alias("__b")
    )
    g = base.agg(
        F.sum(F.when((F.col("__a") == 1) & (F.col("__b") == 1), 1)
              .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("__a") == 1) & (F.col("__b") == 0), 1)
              .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("__a") == 0) & (F.col("__b") == 1), 1)
              .otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("__a") == 0) & (F.col("__b") == 0), 1)
              .otherwise(0)).cast("long").alias("d"),
    )
    if max_n is not None:
        n_rows = base.count()
        if n_rows > max_n:
            raise ValueError(
                f"fisher_exact_2x2: {n_rows:,} rows exceed "
                f"max_n={max_n:,} — the exact test is a small-sample "
                "tool and its support walk is O(n) in one task; use "
                "cmh_test / cramers_v at this scale, or pass "
                "max_n=None after pricing the cost."
            )

    def lf(x):  # log-factorial as a HOF fold; lf(0) = lf(1) = 0
        return F.when(x < 2, F.lit(0.0)).otherwise(
            F.aggregate(
                F.sequence(F.lit(2).cast("long"), x.cast("long")),
                F.lit(0.0),
                lambda acc, i: acc + F.log(i.cast("double")),
            )
        )

    a = F.col("a").cast("long")
    b = F.col("b").cast("long")
    c = F.col("c").cast("long")
    d = F.col("d").cast("long")
    n = a + b + c + d
    ra = a + b
    ca = a + c
    const = lf(ra) + lf(n - ra) + lf(ca) + lf(n - ca) - lf(n)

    def logp(k):  # k a long Column
        return const - lf(k) - lf(ra - k) - lf(ca - k) - lf(
            n - ra - ca + k
        )

    lo = F.greatest(F.lit(0).cast("long"), ra + ca - n)
    hi = F.least(ra, ca)
    lp_obs = logp(a)
    thresh = F.exp(lp_obs) * F.lit(1.0 + 1e-7)
    init = F.struct(
        logp(lo).alias("lp"),
        F.when(F.exp(logp(lo)) <= thresh, F.exp(logp(lo)))
        .otherwise(F.lit(0.0)).alias("s"),
    )
    walk = F.aggregate(
        F.when(hi > lo, F.sequence(lo + 1, hi)).otherwise(
            F.array().cast("array<long>")
        ),
        init,
        lambda acc, k: F.struct(
            (
                acc["lp"]
                + F.log((ra - k + 1).cast("double"))
                + F.log((ca - k + 1).cast("double"))
                - F.log(k.cast("double"))
                - F.log((n - ra - ca + k).cast("double"))
            ).alias("lp"),
            (
                acc["s"]
                + F.when(
                    F.exp(
                        acc["lp"]
                        + F.log((ra - k + 1).cast("double"))
                        + F.log((ca - k + 1).cast("double"))
                        - F.log(k.cast("double"))
                        - F.log((n - ra - ca + k).cast("double"))
                    )
                    <= thresh,
                    F.exp(
                        acc["lp"]
                        + F.log((ra - k + 1).cast("double"))
                        + F.log((ca - k + 1).cast("double"))
                        - F.log(k.cast("double"))
                        - F.log((n - ra - ca + k).cast("double"))
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("s"),
        ),
    )
    orat = (a.cast("double") * d) / (b.cast("double") * c)
    ok = (ra > 0) & (ca > 0) & (n - ra > 0) & (n - ca > 0)
    return g.select(
        "a",
        "b",
        "c",
        "d",
        (
            F.round(
                F.when(ok, F.least(walk["s"], F.lit(1.0))), 8
            )
            + F.lit(0.0)
        ).alias("p_value"),
        (
            F.round(F.when(ok & (b * c > 0), orat), 6) + F.lit(0.0)
        ).alias("odds_ratio"),
    )


def _binom_minlike_p(k, n, p0: float):
    """Two-sided exact binomial p-value (R's minimum-likelihood
    convention) as a pure column expression over BIGINT k, n: walk the
    full support with the log-pmf recurrence

        lp(0)   = n ln(1-p0)
        lp(j+1) = lp(j) + ln(n-j) - ln(j+1) + ln(p0/(1-p0))

    summing pmf(j) wherever pmf(j) <= pmf(k)·(1+1e-7). O(n) expression
    work — callers own the n tripwire. Both engines replay the
    identical recurrence (scalar struct fold in Spark; the SQL twin
    uses WITH RECURSIVE per the DuckDB struct-lambda finding)."""
    import math

    lq = math.log1p(-p0)
    lodds = math.log(p0) - lq
    nd = n.cast("double")
    kd = k.cast("double")
    # lp(k) directly via the same partial sums the walk uses would be
    # O(n) anyway — reuse one walk that carries (lp_j, p_obs-matching
    # sum) and a FIRST pass value lp(k) computed by its own fold
    lp_obs = (
        nd * F.lit(lq)
        + F.aggregate(
            F.when(k >= 1, F.sequence(F.lit(1).cast("long"), k))
            .otherwise(F.array().cast("array<long>")),
            F.lit(0.0),
            lambda acc, j: acc
            + F.log((n - j + 1).cast("double"))
            - F.log(j.cast("double"))
            + F.lit(lodds),
        )
    )
    thresh = F.exp(lp_obs) * F.lit(1.0 + 1e-7)
    init = F.struct(
        (nd * F.lit(lq)).alias("lp"),
        F.when(F.exp(nd * F.lit(lq)) <= thresh, F.exp(nd * F.lit(lq)))
        .otherwise(F.lit(0.0)).alias("s"),
    )
    step_lp = lambda acc, j: (
        acc["lp"]
        + F.log((n - j + 1).cast("double"))
        - F.log(j.cast("double"))
        + F.lit(lodds)
    )
    walk = F.aggregate(
        F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n))
        .otherwise(F.array().cast("array<long>")),
        init,
        lambda acc, j: F.struct(
            step_lp(acc, j).alias("lp"),
            (
                acc["s"]
                + F.when(
                    F.exp(step_lp(acc, j)) <= thresh,
                    F.exp(step_lp(acc, j)),
                ).otherwise(F.lit(0.0))
            ).alias("s"),
        ),
    )
    return F.least(walk["s"], F.lit(1.0))


def binom_test_exact(
    df: DataFrame,
    success_col: str,
    p0: float = 0.5,
    max_n: int | None = 100_000,
) -> DataFrame:
    """Exact binomial test (R's binom.test two-sided minimum-
    likelihood convention) — is the success rate p0? The exact
    single-proportion companion of `sample_size_2prop`'s normal
    machinery, correct at any n (and the only honest choice at small
    n). success must be 0/1. Output: ONE row (n, k BIGINT, p_hat
    DOUBLE round 6, p_value DOUBLE round 8); NULL p when n = 0.

    Plan: ONE 2-counter agg + the O(n) log-pmf support walk as 1-row
    expression work behind the `max_n` tripwire (a proportion at
    n > 100k is normal-approximation territory — m_ab_test)."""
    if not 0.0 < p0 < 1.0:
        raise ValueError(f"p0 must be in (0, 1), got {p0}")
    sc = F.col(success_col).cast("int")
    base = df.filter(sc.isNotNull()).select(sc.alias("__s"))
    g = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__s").cast("long").alias("k"),
    )
    if max_n is not None:
        n_rows = base.count()
        if n_rows > max_n:
            raise ValueError(
                f"binom_test_exact: {n_rows:,} rows exceed "
                f"max_n={max_n:,} — the exact support walk is O(n) in "
                "one task; use the normal-approximation machinery "
                "(m_ab_test / sample_size_2prop) at this scale, or "
                "pass max_n=None after pricing the cost."
            )
    p = _binom_minlike_p(F.col("k"), F.col("n"), p0)
    return g.select(
        "n",
        "k",
        (
            F.round(
                F.when(
                    F.col("n") > 0,
                    F.col("k").cast("double") / F.col("n"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("p_hat"),
        (
            F.round(F.when(F.col("n") > 0, p), 8) + F.lit(0.0)
        ).alias("p_value"),
    )


def mcnemar_exact(
    df: DataFrame,
    flag_a_col: str,
    flag_b_col: str,
    max_n: int | None = 100_000,
) -> DataFrame:
    """Exact McNemar test — the small-sample form of `mcnemar_test`'s
    chi-square: under H0 the b discordant (1,0) pairs among the b + c
    discordant pairs are Binomial(b + c, 1/2), so the p-value is the
    exact two-sided binomial test on the discordant counts (the
    standard exact convention; concordant pairs carry no information).
    Flags must be 0/1 per paired observation row. Output: ONE row
    (b, c BIGINT, p_value DOUBLE round 8); NULL p when b + c = 0 (no
    discordance — the test is undefined, not significant).

    Plan: ONE 2-counter agg + the shared `_binom_minlike_p` support
    walk over b + c (discordant pairs, not rows — usually tiny) behind
    the `max_n` tripwire on the DISCORDANT count."""
    fa = F.col(flag_a_col).cast("int")
    fb = F.col(flag_b_col).cast("int")
    base = df.filter(fa.isNotNull() & fb.isNotNull()).select(
        fa.alias("__a"), fb.alias("__b")
    )
    g = base.agg(
        F.sum(F.when((F.col("__a") == 1) & (F.col("__b") == 0), 1)
              .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("__a") == 0) & (F.col("__b") == 1), 1)
              .otherwise(0)).cast("long").alias("c"),
    )
    if max_n is not None:
        nd = g.select((F.col("b") + F.col("c")).alias("nd")).collect()[
            0
        ]["nd"]
        if nd is not None and nd > max_n:
            raise ValueError(
                f"mcnemar_exact: {nd:,} discordant pairs exceed "
                f"max_n={max_n:,} — use mcnemar_test's chi-square at "
                "this scale, or pass max_n=None."
            )
    p = _binom_minlike_p(F.col("b"), F.col("b") + F.col("c"), 0.5)
    return g.select(
        "b",
        "c",
        (
            F.round(F.when(F.col("b") + F.col("c") > 0, p), 8)
            + F.lit(0.0)
        ).alias("p_value"),
    )


def sign_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_n: int | None = 100_000,
) -> DataFrame:
    """Exact paired sign test (Arbuthnott 1710 — the oldest test in
    the book) — completes the paired triad beside `paired_t_test`
    (parametric) and `wilcoxon_signed_rank` (rank): only the SIGN of
    each within-pair difference counts, so it survives any monotone
    distortion and arbitrary outliers. Ties (x = y) drop (the standard
    convention); the positive count among the n_pos + n_neg informative
    pairs is Binomial(·, 1/2) under H0, tested with the shared
    `_binom_minlike_p` exact walk (R binom.test semantics — for
    p0 = 1/2 minimum-likelihood equals the doubled smaller tail up to
    clamping). Output: ONE row (n_pos, n_neg BIGINT, p_value DOUBLE
    round 8); NULL p when no informative pair exists.

    Plan: ONE 2-counter conditional agg + the O(n_informative) support
    walk as 1-row expression work behind the `max_n` tripwire."""
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        (xc - yc).alias("__d")
    )
    g = base.agg(
        F.sum(F.when(F.col("__d") > 0, 1).otherwise(0))
        .cast("long").alias("n_pos"),
        F.sum(F.when(F.col("__d") < 0, 1).otherwise(0))
        .cast("long").alias("n_neg"),
    )
    if max_n is not None:
        ni = g.select(
            (F.col("n_pos") + F.col("n_neg")).alias("ni")
        ).collect()[0]["ni"]
        if ni is not None and ni > max_n:
            raise ValueError(
                f"sign_test: {ni:,} informative pairs exceed "
                f"max_n={max_n:,} — use the normal approximation "
                "(wilcoxon_signed_rank's z) at this scale, or pass "
                "max_n=None."
            )
    p = _binom_minlike_p(
        F.col("n_pos"), F.col("n_pos") + F.col("n_neg"), 0.5
    )
    return g.select(
        "n_pos",
        "n_neg",
        (
            F.round(
                F.when(F.col("n_pos") + F.col("n_neg") > 0, p), 8
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )


def vif_screen(
    df: DataFrame,
    x_cols: Sequence[str],
) -> DataFrame:
    """Variance inflation factors — the collinearity screen every
    regression (ols_fit / logistic_fit / poisson_fit) should run before
    trusting its coefficients: VIF_j = 1/(1-R²_j) where R²_j regresses
    feature j on the others. Computed the closed-form way — VIF_j is
    the j-th diagonal of the INVERSE CORRELATION matrix — so the whole
    screen is ONE partial-aggregated pass over the corpus collecting
    the p(p+1)/2 cross-moments (nothing else ever shuffles), a
    model-sized p×p driver inverse, and a p-row result:

        (term STRING, vif DOUBLE round 6, r2_aux DOUBLE round 6)

    with r2_aux = 1 - 1/VIF (the aux-regression R² the textbooks
    quote). Complete-case rows only; a zero-variance feature or an
    exactly-singular correlation matrix raises (VIF is infinite —
    the honest answer is "drop the feature", not a number).

    Scale: the data-sized work is one map-side agg of ~p² sums; the
    inverse is p×p on the driver (model-sized, the ols_fit
    convention)."""
    import numpy as np

    if len(x_cols) < 2:
        raise ValueError("vif_screen needs >= 2 features")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = xs[0].isNotNull()
    for x in xs[1:]:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    p = len(xs)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(p):
        aggs.append(F.sum(xs[i]).alias(f"__s_{i}"))
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"__ss_{i}_{j}"))
    row = nn.agg(*aggs).collect()[0]
    n = row["__n"]
    if n < 3:
        raise ValueError(f"vif_screen needs >= 3 complete rows, got {n}")
    s = np.array([row[f"__s_{i}"] for i in range(p)])
    ss = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            ss[i, j] = ss[j, i] = row[f"__ss_{i}_{j}"]
    cov = ss - np.outer(s, s) / n
    sd = np.sqrt(np.diag(cov))
    if (sd <= 0).any():
        bad = [x_cols[i] for i in range(p) if sd[i] <= 0]
        raise ValueError(f"zero-variance feature(s): {bad}")
    corr = cov / np.outer(sd, sd)
    det = np.linalg.det(corr)
    if abs(det) < 1e-12:
        raise ValueError("singular correlation matrix (exact collinearity)")
    inv = np.linalg.inv(corr)
    spark = df.sparkSession
    out = []
    for i, nm in enumerate(x_cols):
        vif = float(inv[i, i])
        out.append(
            (nm, round(vif, 6) + 0.0, round(1.0 - 1.0 / vif, 6) + 0.0)
        )
    return spark.createDataFrame(
        out, "term string, vif double, r2_aux double"
    )


def breusch_pagan(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test — does the OLS residual
    variance move with the regressors? The diagnostic that says whether
    ols_fit's standard errors can be believed. Classic LM form:

        stage 1: OLS of y on X       (one sums pass + driver solve)
        stage 2: regress e² on X     (one more sums pass re-using the
                                      SAME X'X; only X'u, Σu, Σu² are
                                      new)
        LM = n · R²_aux  ~  χ²(p)

    Two partial-aggregated passes total; both collapse map-side to
    p²-sized rows, and both solves are model-sized driver work (the
    ols_fit convention). Stage 2 injects stage 1's β as literals, so
    e² = (y − Xβ̂)² is pure column arithmetic — no residual column is
    ever materialized or shuffled.

    Output (1 row): n BIGINT, lm_stat DOUBLE round 6, df INT,
    p_value DOUBLE round 6 (χ²(p) survival — closed form exp(−LM/2)
    when p = 2, Wilson-Hilferty otherwise... p = 2 only for now: the
    exact-replay oracle needs a closed-form tail, so this
    implementation requires len(x_cols) == 2 and documents it).
    Complete-case rows only; singular X'X raises."""
    import numpy as np

    if len(x_cols) != 2:
        raise ValueError(
            "breusch_pagan: exactly 2 regressors supported (the χ²(2) "
            "closed-form tail exp(−LM/2) is what keeps the oracle an "
            "exact replay)"
        )
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    terms = [F.lit(1.0)] + xs
    d = len(terms)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"__xx_{i}_{j}"))
        aggs.append(F.sum(terms[i] * y).alias(f"__xy_{i}"))
    row = nn.agg(*aggs).collect()[0]
    n = row["__n"]
    if n < d + 1:
        raise ValueError(f"breusch_pagan needs > {d} complete rows, got {n}")
    XX = np.zeros((d, d))
    Xy = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
        Xy[i] = row[f"__xy_{i}"]
    if abs(np.linalg.det(XX)) < 1e-10 * max(1.0, abs(XX).max()) ** d:
        raise ValueError("singular design matrix (collinear features)")
    beta = np.linalg.solve(XX, Xy)
    # stage 2: u = e² as pure arithmetic with beta literals
    eta = sum(
        (F.lit(float(beta[i])) * terms[i] for i in range(1, d)),
        F.lit(float(beta[0])),
    )
    u = (y - eta) * (y - eta)
    aggs2 = [F.sum(u).alias("__su"), F.sum(u * u).alias("__suu")]
    for i in range(d):
        aggs2.append(F.sum(terms[i] * u).alias(f"__xu_{i}"))
    row2 = nn.agg(*aggs2).collect()[0]
    Xu = np.array([row2[f"__xu_{i}"] for i in range(d)])
    beta_aux = np.linalg.solve(XX, Xu)
    ssr = row2["__suu"] - float(beta_aux @ Xu)
    sst = row2["__suu"] - row2["__su"] ** 2 / n
    r2 = 1.0 - ssr / sst if sst > 0 else 0.0
    lm = n * r2
    p_value = math.exp(-lm / 2.0)  # χ²(2) survival, closed form
    spark = df.sparkSession
    return spark.createDataFrame(
        # lm rounds at 4dp: LM = n·R²_aux amplifies the engines'
        # ~1e-11 relative sum noise by n, so 6dp would sit inside the
        # noise band at sf0.1
        [(int(n), round(lm, 4) + 0.0, 2, round(p_value, 6) + 0.0)],
        "n bigint, lm_stat double, df int, p_value double",
    )


def partial_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
) -> DataFrame:
    """First-order partial correlation r_xy.z — the association between
    x and y with the control z regressed out of both (the screen that
    separates a direct relationship from one that merely rides a
    common driver):

        r_xy.z = (r_xy − r_xz r_zy)
                 / sqrt((1 − r_xz²)(1 − r_zy²))

    ONE partial-aggregated pass collects the 3x3 moment sums (the
    vif_screen device); the three pairwise correlations and the
    closed form are a 1-row fold. Complete-case rows only; a
    zero-variance column or |r_xz| = 1 / |r_zy| = 1 (the control
    determines a variable — partialling is undefined) yields NULL.

    Output (1 row): n BIGINT, r_xy DOUBLE round 6, r_partial DOUBLE
    round 6."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    z = F.col(z_col).cast("double")
    nn = df.filter(x.isNotNull() & y.isNotNull() & z.isNotNull())
    m = nn.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"), F.sum(z).alias("sz"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(z * z).alias("szz"),
        F.sum(x * y).alias("sxy"), F.sum(x * z).alias("sxz"),
        F.sum(z * y).alias("szy"),
    )

    def _r(sab, sa, sb, saa, sbb):
        num = m["n"] * F.col(sab) - F.col(sa) * F.col(sb)
        den = F.sqrt(
            (m["n"] * F.col(saa) - F.col(sa) * F.col(sa))
            * (m["n"] * F.col(sbb) - F.col(sb) * F.col(sb))
        )
        return F.when(den > 0, num / den)

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("sxz", "sx", "sz", "sxx", "szz")
    rzy = _r("szy", "sz", "sy", "szz", "syy")
    den_p = F.sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy))
    rp = F.when(den_p > 0, (rxy - rxz * rzy) / den_p)
    return m.select(
        F.col("n").cast("long").alias("n"),
        (F.round(rxy, 6) + F.lit(0.0)).alias("r_xy"),
        (F.round(rp, 6) + F.lit(0.0)).alias("r_partial"),
    )


def welch_anova(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA (Welch 1951) — the k-group
    mean test that does NOT assume equal variances, the omnibus
    companion to welch_t_test the way anova_oneway companions the
    pooled t: with w_i = n_i/s_i²,

        F* = [Σ w_i (x̄_i − x̄_w)² / (k−1)]
             / [1 + 2(k−2)/(k²−1) · Λ],
        Λ  = Σ (1 − w_i/W)² / (n_i − 1),
        df2 = (k² − 1) / (3Λ)

    Plan: ONE groupBy collapses the data to per-group (n, mean, var)
    — group-count-sized; the weighted folds are two more aggs over
    those k rows with a 1-row broadcast in between. Groups need
    n_i >= 2 and s_i² > 0 (a constant group has infinite weight —
    excluded with its honest NULL contribution impossible, so such
    groups RAISE rather than silently skew). NULL group is its own
    cohort; NULL values drop.

    Output (1 row): k INT, f_stat DOUBLE round 6, df1 BIGINT,
    df2 DOUBLE round 4."""
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull())
    g = nn.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("double").alias("ni"),
        F.avg(v).alias("mi"),
        F.var_samp(v).alias("vi"),
    ).localCheckpoint(eager=True)  # group-count-sized; read 3x
    # (validation count, weight totals, final fold)
    bad = g.filter(
        (F.col("ni") < 2) | F.col("vi").isNull() | (F.col("vi") <= 0)
    ).count()
    if bad:
        raise ValueError(
            f"welch_anova: {bad} group(s) with n < 2 or zero variance — "
            "their weights are undefined; drop or merge them first"
        )
    tot = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("ni") / F.col("vi")).alias("W"),
        F.sum(F.col("ni") / F.col("vi") * F.col("mi")).alias("wm"),
    )
    j = g.crossJoin(F.broadcast(tot))
    wi = F.col("ni") / F.col("vi")
    xw = F.col("wm") / F.col("W")
    fold = j.agg(
        F.max("k").alias("k"),
        F.sum(wi * (F.col("mi") - xw) * (F.col("mi") - xw)).alias("num"),
        F.sum(
            (1.0 - wi / F.col("W")) * (1.0 - wi / F.col("W"))
            / (F.col("ni") - 1.0)
        ).alias("lam"),
    )
    k = F.col("k")
    a = F.col("num") / (k - 1.0)
    b = 1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * F.col("lam")
    return fold.select(
        k.cast("int").alias("k"),
        (F.round(F.when(k >= 2, a / b), 6) + F.lit(0.0)).alias("f_stat"),
        (k - 1).cast("long").alias("df1"),
        (
            F.round(
                F.when(
                    (k >= 2) & (F.col("lam") > 0),
                    (k * k - 1.0) / (3.0 * F.col("lam")),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("df2"),
    )


def breslow_day(
    df: DataFrame,
    stratum_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Breslow-Day test of odds-ratio homogeneity across strata
    (Breslow & Day 1980 §IV) — the check that LICENSES `cmh_test`'s
    common odds ratio: CMH assumes one OR; this asks whether the
    per-stratum 2x2 tables are consistent with it. Under the
    Mantel-Haenszel common OR, each stratum's expected a-cell E_i
    solves the margin-preserving quadratic

        E(n − r1 − c1 + E) = OR·(r1 − E)(c1 − E)

    (the root inside (max(0, r1+c1−n), min(r1, c1)) — exactly one is
    valid for OR > 0; OR = 1 degenerates to the linear E = r1 c1/n),
    with asymptotic variance 1/V = 1/E + 1/(r1−E) + 1/(c1−E) +
    1/(n−r1−c1+E), and

        X² = Σ (a_i − E_i)² V_i   ~   χ²(k−1)

    (the Tarone correction is a documented non-goal — it shifts X² by
    O(1/ΣV), negligible at these strata sizes). exposure/outcome must
    be 0/1; NULL rows drop; strata with an empty margin contribute
    nothing (their OR is undefined) and are excluded from k.

    Output (1 row): k BIGINT, or_mh DOUBLE round 6, x2 DOUBLE round
    6, df BIGINT. Plan: ONE stratum-keyed 4-counter aggregation
    (stratum-count-sized), a 1-row common-OR broadcast, and per-row
    closed-form arithmetic — the cmh_test shape plus the quadratic."""
    ex = F.col(exposure_col).cast("int")
    oc = F.col(outcome_col).cast("int")
    st = F.col(stratum_col)
    nn = df.filter(st.isNotNull() & ex.isNotNull() & oc.isNotNull())
    g = nn.groupBy(st.alias("__s")).agg(
        F.sum(F.when((ex == 1) & (oc == 1), 1).otherwise(0))
        .cast("double").alias("a"),
        F.sum(F.when((ex == 1) & (oc == 0), 1).otherwise(0))
        .cast("double").alias("b"),
        F.sum(F.when((ex == 0) & (oc == 1), 1).otherwise(0))
        .cast("double").alias("c"),
        F.sum(F.when((ex == 0) & (oc == 0), 1).otherwise(0))
        .cast("double").alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    # margin-degenerate strata (an all-zero row or column) are excluded
    ok = (
        ((F.col("a") + F.col("b")) > 0)
        & ((F.col("c") + F.col("d")) > 0)
        & ((F.col("a") + F.col("c")) > 0)
        & ((F.col("b") + F.col("d")) > 0)
    )
    g = g.filter(ok).withColumn("n", n)
    mh = g.agg(
        F.sum(F.col("a") * F.col("d") / F.col("n")).alias("__num"),
        F.sum(F.col("b") * F.col("c") / F.col("n")).alias("__den"),
    )
    j = g.crossJoin(F.broadcast(mh)).withColumn(
        "__or", F.col("__num") / F.col("__den")
    )
    r1 = F.col("a") + F.col("b")
    c1 = F.col("a") + F.col("c")
    orr = F.col("__or")
    qa = 1.0 - orr
    qb = (F.col("n") - r1 - c1) + orr * (r1 + c1)
    qc = -(orr * r1 * c1)
    disc = F.sqrt(qb * qb - 4.0 * qa * qc)
    lo_b = F.greatest(F.lit(0.0), r1 + c1 - F.col("n"))
    hi_b = F.least(r1, c1)
    root1 = (-qb + disc) / (2.0 * qa)
    root2 = (-qb - disc) / (2.0 * qa)
    e_lin = r1 * c1 / F.col("n")
    e = F.when(
        F.abs(qa) < 1e-12, e_lin
    ).when(
        (root1 > lo_b) & (root1 < hi_b), root1
    ).otherwise(root2)
    vinv = (
        1.0 / e
        + 1.0 / (r1 - e)
        + 1.0 / (c1 - e)
        + 1.0 / (F.col("n") - r1 - c1 + e)
    )
    term = (F.col("a") - e) * (F.col("a") - e) * vinv
    fold = j.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("__or").alias("__ormh"),
        F.sum(term).alias("__x2"),
    )
    return fold.select(
        "k",
        (F.round(F.col("__ormh"), 6) + F.lit(0.0)).alias("or_mh"),
        (
            F.round(F.when(F.col("k") >= 2, F.col("__x2")), 6)
            + F.lit(0.0)
        ).alias("x2"),
        (F.col("k") - 1).alias("df"),
    )


def rake_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    iters: int = 3,
) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan
    1940) to UNIFORM target margins — the survey-weighting staple: per
    (row, col) cell, the weight that makes the weighted row and column
    totals each match an equal share of N, alternating

        w ← w · (N/k_r) / Σ_col (w n)     (row pass)
        w ← w · (N/k_c) / Σ_row (w n)     (column pass)

    for a FIXED `iters` rounds from w = 1 (the g_pagerank fixed-budget
    convention — the whole fit replays as an unrolled SQL oracle;
    uniform targets keep the operator a pure function of the data —
    margin-table targets are a trivial extension). NULL row/col rows
    drop; empty margins cannot occur (every present cell has mass).

    Output: one row per cell (row_col, col_col, n BIGINT, weight
    DOUBLE round 6, weighted_n DOUBLE round 4 = n·w). After
    convergence each row margin's Σ weighted_n ≈ N/k_r and each
    column's ≈ N/k_c.

    Plan: ONE data-sized groupBy collapses to the margin-cell table;
    every IPF pass is two window sums over those cells
    (margin-count-sized) — no joins, no driver state."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    r = F.col(row_col)
    c = F.col(col_col)
    nn = df.filter(r.isNotNull() & c.isNotNull())
    cells = nn.groupBy(r.alias("__r"), c.alias("__c")).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    w_row = Window.partitionBy("__r")
    w_col = Window.partitionBy("__c")
    # N / k_r / k_c are a model-sized 1-row collect (joining the
    # aggregate back would self-join cells with its own lineage, which
    # Spark 4's reference dedup then flags ambiguous); the division
    # happens here in the same double arithmetic the oracle replays
    trow = cells.agg(
        F.sum("__n").alias("N"),
        F.countDistinct("__r").cast("double").alias("kr"),
        F.countDistinct("__c").cast("double").alias("kc"),
    ).collect()[0]
    if not trow["N"]:
        raise ValueError("rake_weights: no complete-case rows")
    tr = F.lit(float(trow["N"]) / float(trow["kr"]))
    tc2 = F.lit(float(trow["N"]) / float(trow["kc"]))
    cur = cells.withColumn("__w", F.lit(1.0))
    for _ in range(iters):
        # fresh alias + rename per pass: replacing a column that the
        # same projection's window expression reads trips Spark 4's
        # stricter ambiguity check
        row_tot = F.sum(F.col("__w") * F.col("__n")).over(w_row)
        cur = (
            cur.withColumn("__w2", F.col("__w") * tr / row_tot)
            .drop("__w")
            .withColumnRenamed("__w2", "__w")
        )
        col_tot = F.sum(F.col("__w") * F.col("__n")).over(w_col)
        cur = (
            cur.withColumn("__w2", F.col("__w") * tc2 / col_tot)
            .drop("__w")
            .withColumnRenamed("__w2", "__w")
        )
    return cur.select(
        F.col("__r").alias(row_col),
        F.col("__c").alias(col_col),
        F.col("__n").cast("long").alias("n"),
        (F.round(F.col("__w"), 6) + F.lit(0.0)).alias("weight"),
        (
            F.round(F.col("__n") * F.col("__w"), 4) + F.lit(0.0)
        ).alias("weighted_n"),
    )


def cooks_screen(
    df: DataFrame,
    y_col: str,
    x_cols: Sequence[str],
    threshold_factor: float = 4.0,
) -> DataFrame:
    """Cook's-distance influence screen for an OLS fit — the
    diagnostics-shelf closer beside vif_screen (collinearity) and
    breusch_pagan (heteroscedasticity): which rows SINGLE-HANDEDLY
    move the regression?

        h_i = x_i' (X'X)⁻¹ x_i          (leverage)
        D_i = e_i² h_i / (p s² (1−h_i)²),  s² = SSR/(n−p)

    flagged when D_i > threshold_factor/n (the classical 4/n cut).
    ONE normal-equation pass (the ols_fit sums), a model-sized driver
    solve + p×p inverse, then ONE more pass where leverage, residual
    and D are pure row arithmetic with the inverse's entries as
    literals — no per-row matrix op ever ships.

    Output (1 row): n BIGINT, n_influential BIGINT, max_d DOUBLE
    round 6, cut DOUBLE round 8. Complete-case rows; singular X'X
    raises; s² = 0 (perfect fit) yields zero influence."""
    import numpy as np

    if not x_cols:
        raise ValueError("x_cols must be non-empty")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    terms = [F.lit(1.0)] + xs
    d = len(terms)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"__xx_{i}_{j}"))
        aggs.append(F.sum(terms[i] * y).alias(f"__xy_{i}"))
    aggs.append(F.sum(y * y).alias("__syy"))
    row = nn.agg(*aggs).collect()[0]
    n = row["__n"]
    if n <= d:
        raise ValueError(f"cooks_screen needs > {d} complete rows, got {n}")
    XX = np.zeros((d, d))
    Xy = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
        Xy[i] = row[f"__xy_{i}"]
    if abs(np.linalg.det(XX)) < 1e-10 * max(1.0, abs(XX).max()) ** d:
        raise ValueError("singular design matrix (collinear features)")
    beta = np.linalg.solve(XX, Xy)
    inv = np.linalg.inv(XX)
    ssr = row["__syy"] - float(beta @ Xy)
    s2 = ssr / (n - d)
    eta = sum(
        (F.lit(float(beta[i])) * terms[i] for i in range(1, d)),
        F.lit(float(beta[0])),
    )
    e = y - eta
    h = F.lit(0.0)
    for i in range(d):
        for j in range(d):
            h = h + F.lit(float(inv[i, j])) * terms[i] * terms[j]
    cut = float(threshold_factor) / n
    if s2 > 0:
        dd = (e * e) * h / (
            F.lit(float(d) * s2) * (F.lit(1.0) - h) * (F.lit(1.0) - h)
        )
    else:
        dd = F.lit(0.0)
    g = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(dd > F.lit(cut), 1).otherwise(0))
        .cast("long")
        .alias("n_influential"),
        (F.round(F.max(dd), 6) + F.lit(0.0)).alias("max_d"),
    )
    return g.select(
        "n", "n_influential", "max_d",
        (F.round(F.lit(cut), 8) + F.lit(0.0)).alias("cut"),
    )
