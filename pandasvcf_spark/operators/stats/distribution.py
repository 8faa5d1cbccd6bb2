"""Distribution shape, divergence and inequality statistics.

Mechanically split from the former single-file operators/stats.py
(round-11 verdict task 5) — bodies are verbatim; behavior, plans
and oracles unchanged. See the package __init__ for the re-export
surface and the original module docstring.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._guards import _assert_cell_bound


def cramers_v(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Cramér's V association between two categorical columns — the
    [0, 1]-normalized cousin of the chi-square statistic (the
    m_mutual_info family's effect-size view): V = sqrt(chi2 / (n *
    (min(r, c) - 1))) with chi2 = sum (o - e)^2 / e over the
    contingency cells, e = rowsum * colsum / n.

    Output: ONE row (r BIGINT, c BIGINT, n BIGINT, chi2 DOUBLE
    round 4, v DOUBLE round 6). V is NULL when min(r, c) < 2. NULL
    categories drop.

    Plan: one (a, b)-keyed cell count (partial-aggregated), two
    marginal re-aggs of the CELL table (category-sized, not
    corpus-sized), then the FULL r x c grid is rebuilt as the
    marginal cross join (zero cells contribute (0-e)^2/e = e — a
    chi-square over observed cells only understates the statistic)
    with observed counts left-joined on, and a 1-row final agg.
    """
    base = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
    cells = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("double").alias("__oc")
    )
    ra = cells.groupBy("__a").agg(F.sum("__oc").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__oc").alias("__cb"))
    grid = ra.crossJoin(cb)
    j = grid.join(cells, ["__a", "__b"], "left").withColumn(
        "__o", F.coalesce(F.col("__oc"), F.lit(0.0))
    )
    n = cells.agg(
        F.sum("__oc").alias("__n"),
        F.countDistinct("__a").cast("long").alias("r"),
        F.countDistinct("__b").cast("long").alias("c"),
    )
    chi = j.join(F.broadcast(n)).select(
        (
            (F.col("__o") - F.col("__ra") * F.col("__cb") / F.col("__n"))
            * (F.col("__o") - F.col("__ra") * F.col("__cb") / F.col("__n"))
            / (F.col("__ra") * F.col("__cb") / F.col("__n"))
        ).alias("__t"),
        "r",
        "c",
        "__n",
    )
    out = chi.groupBy("r", "c", "__n").agg(F.sum("__t").alias("__chi2"))
    mind = F.least(F.col("r"), F.col("c")).cast("double") - F.lit(1.0)
    return out.select(
        "r",
        "c",
        F.col("__n").cast("long").alias("n"),
        F.round(F.col("__chi2"), 4).alias("chi2"),
        F.round(
            F.when(
                mind > 0,
                F.sqrt(F.col("__chi2") / (F.col("__n") * mind)),
            ),
            6,
        ).alias("v"),
    )


def js_divergence(
    df: DataFrame,
    cat_col: str,
    side_col: str,
) -> DataFrame:
    """Jensen-Shannon divergence (log base 2, so JS in [0, 1]) between
    the categorical distributions of side 0 and side 1 — the symmetric,
    finite drift measure to set beside `psi_report` (PSI blows up on
    empty bins; JS never does): JS = (KL(P||M) + KL(Q||M)) / 2 with
    M = (P + Q) / 2.

    ``side_col`` must be 0/1 (cast to int). Categories present on only
    one side contribute only their own side's KL term (the other term
    is 0 by continuity). NULL categories/sides drop.

    Output: ONE row (n0 BIGINT, n1 BIGINT, k BIGINT, kl_pm DOUBLE
    round 6, kl_qm DOUBLE round 6, js DOUBLE round 6). NULL js when
    either side is empty.

    Plan: one (category)-keyed two-counter agg (partial-aggregated,
    vocabulary-sized), a 1-row totals broadcast, then a 1-row final
    agg of the per-category terms.
    """
    sc = F.col(side_col).cast("int")
    base = df.filter(F.col(cat_col).isNotNull() & sc.isNotNull()).select(
        F.col(cat_col).alias("__c"), sc.alias("__f")
    )
    cells = base.groupBy("__c").agg(
        F.sum(F.when(F.col("__f") == 0, 1).otherwise(0))
        .cast("double")
        .alias("__a"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast("double")
        .alias("__b"),
    )
    tot = cells.agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )
    j = cells.join(F.broadcast(tot))
    p = F.col("__a") / F.col("__ta")
    q = F.col("__b") / F.col("__tb")
    m = (p + q) / F.lit(2.0)
    term_p = F.when(p > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(q > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    agg = j.groupBy().agg(
        F.max("__ta").alias("__ta"),
        F.max("__tb").alias("__tb"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(term_p).alias("__kp"),
        F.sum(term_q).alias("__kq"),
    )
    ok = (F.col("__ta") > 0) & (F.col("__tb") > 0)
    return agg.select(
        F.col("__ta").cast("long").alias("n0"),
        F.col("__tb").cast("long").alias("n1"),
        "k",
        (F.round(F.when(ok, F.col("__kp")), 6) + F.lit(0.0)).alias("kl_pm"),
        (F.round(F.when(ok, F.col("__kq")), 6) + F.lit(0.0)).alias("kl_qm"),
        (
            F.round(
                F.when(ok, (F.col("__kp") + F.col("__kq")) / F.lit(2.0)),
                6,
            )
            + F.lit(0.0)
        ).alias("js"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group weighted quantiles — inverse weighted-ECDF (type-1):
    q_p = the smallest value whose cumulative weight reaches p·W.
    The token-weighted percentile ("the median TOKEN sits in a doc of
    length …") that unweighted quantiles get wrong on skewed weights.
    Rows with NULL value or weight, or weight <= 0, drop.

    Output: (*group_cols, p DOUBLE, q DOUBLE) — one row per group per
    requested prob, prob-ascending.

    Plan: ONE exchange on the group keys serves the cumulative-weight
    window and the final groupBy (one conditional MIN per prob) —
    the agg_grouped_quantiles device with weights replacing row
    counts. Integer weights keep the cumulative ladder engine-exact.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    ps = sorted(set(float(p) for p in probs))
    if not ps or any(p <= 0 or p > 1 for p in ps):
        raise ValueError("probs must be in (0, 1]")
    vc = F.col(value_col).cast("double")
    wc = F.col(weight_col).cast("long")
    base = df.filter(vc.isNotNull() & wc.isNotNull() & (wc > 0)).select(
        *gcols, vc.alias("__v"), wc.alias("__w")
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*gcols)
    r = base.select(
        *gcols,
        "__v",
        F.sum("__w").over(w_cum).alias("__cw"),
        F.sum("__w").over(w_tot).alias("__W"),
    )
    aggs = []
    for p in ps:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cw").cast("double")
                    >= F.lit(p) * F.col("__W").cast("double"),
                    F.col("__v"),
                )
            ).alias(f"__q{int(p * 10000)}")
        )
    g = r.groupBy(*gcols).agg(*aggs)
    out = None
    for p in ps:
        row = g.select(
            *gcols,
            F.lit(p).alias("p"),
            F.col(f"__q{int(p * 10000)}").alias("q"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def diversity_indices(
    df: DataFrame,
    group_cols: Sequence[str],
    cat_col: str,
) -> DataFrame:
    """Per-group categorical diversity indices — the corpus-balance
    report card (species-diversity math applied to sources, langs,
    topics, token types):

        richness  = distinct categories
        shannon   = −sum p ln p                (nats)
        simpson   = 1 − sum p²                 (Gini-Simpson)
        evenness  = shannon / ln(richness)     (Pielou; NULL at k = 1)

    Output: (*group_cols, n BIGINT, richness BIGINT, shannon,
    simpson, evenness DOUBLE round 6).

    Plan: one (group, category)-keyed partial-aggregated count
    (vocabulary-sized), then one group-keyed agg of the p-terms.
    evenness divides by the ENGINE's own ln(richness) — never a
    Python literal (the t_l_diversity 1-ulp lesson).
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    base = df.filter(F.col(cat_col).isNotNull()).select(
        *gcols, F.col(cat_col).alias("__c")
    )
    cells = base.groupBy(*gcols, "__c").agg(
        F.count(F.lit(1)).cast("double").alias("__cnt")
    )
    w = Window.partitionBy(*gcols)
    withp = cells.withColumn("__n", F.sum("__cnt").over(w)).withColumn(
        "__p", F.col("__cnt") / F.col("__n")
    )
    agg = withp.groupBy(*gcols).agg(
        F.max("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("richness"),
        F.sum(-F.col("__p") * F.log("__p")).alias("__sh"),
        F.sum(F.col("__p") * F.col("__p")).alias("__sp"),
    )
    return agg.select(
        *gcols,
        "n",
        "richness",
        (F.round(F.col("__sh"), 6) + F.lit(0.0)).alias("shannon"),
        F.round(F.lit(1.0) - F.col("__sp"), 6).alias("simpson"),
        (
            F.round(
                F.when(
                    F.col("richness") >= 2,
                    F.col("__sh")
                    / F.log(F.col("richness").cast("double")),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("evenness"),
    )


def ks_test_2samp(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Per-group exact two-sample Kolmogorov-Smirnov statistic —
    the distribution-shift detector that sees SHAPE changes the
    mean-based tests miss (the drift sibling of `mann_whitney_u`,
    which only sees location):

        D = max over pooled values v of |F1(v) − F0(v)|
        z = D · sqrt(n1·n0 / (n1 + n0))     (the asymptotic scaling)

    ECDFs are evaluated at every pooled observation with ties merged
    (a RANGE cumulative frame, so all rows of an equal value carry
    the full step). D is exact — no binning (the m_ks_lift table
    bins; this is the statistic itself). z is NULL when either
    sample is empty.

    Output: (*group_cols, n1 BIGINT, n0 BIGINT, d DOUBLE round 6,
    z DOUBLE round 6).

    Plan: ONE exchange on the group keys serves both cumulative
    RANGE windows and the final MAX agg — no joins; integer
    cumulative counts make D exact rational arithmetic on both
    engines.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    vc = F.col(value_col).cast("double")
    fc = F.col(flag_col).cast("int")
    base = df.filter(vc.isNotNull() & fc.isNotNull()).select(
        *gcols, vc.alias("__v"), fc.alias("__f")
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*gcols)
    r = base.select(
        *gcols,
        F.sum("__f").over(w_cum).alias("__c1"),
        F.sum(F.lit(1) - F.col("__f")).over(w_cum).alias("__c0"),
        F.sum("__f").over(w_all).alias("__n1"),
        F.sum(F.lit(1) - F.col("__f")).over(w_all).alias("__n0"),
    )
    diff = F.abs(
        F.col("__c1").cast("double") / F.col("__n1").cast("double")
        - F.col("__c0").cast("double") / F.col("__n0").cast("double")
    )
    agg = r.groupBy(*gcols).agg(
        F.max("__n1").cast("long").alias("n1"),
        F.max("__n0").cast("long").alias("n0"),
        F.max(diff).alias("__d"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    ok = (F.col("n1") > 0) & (F.col("n0") > 0)
    return agg.select(
        *gcols,
        "n1",
        "n0",
        F.round(F.when(ok, F.col("__d")), 6).alias("d"),
        F.round(
            F.when(
                ok,
                F.col("__d") * F.sqrt(n1d * n0d / (n1d + n0d)),
            ),
            6,
        ).alias("z"),
    )


def _group_median(df: DataFrame, gcols, val: str, out: str) -> DataFrame:
    """Exact per-group lower median (inverse-ECDF ceil(n/2) index, the
    repo's quantile_disc convention) — one rank window + one filter."""
    w = Window.partitionBy(*gcols).orderBy(val)
    wn = Window.partitionBy(*gcols)
    r = df.select(
        *gcols,
        F.col(val),
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    return r.filter(
        F.col("__r") == F.greatest(F.ceil(F.col("__n") / 2), F.lit(1))
    ).select(*gcols, F.col(val).alias(out))


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier report via median absolute deviation —
    the monitoring staple that a few wild points cannot recalibrate
    (mean/stddev z-scores move with the outliers they hunt):

        MAD = median(|x − median(x)|)
        outlier <=> |x − median| > k · 1.4826 · MAD

    (1.4826 ≈ 1/Φ⁻¹(3/4) scales MAD to σ under normality). Medians
    use the repo's exact lower-median convention. MAD = 0 (over half
    the group tied at the median) flags only exact-departures as
    outliers when k·0 = 0 — every non-median value; that degenerate
    case is the caller's signal the group is near-constant.

    Output: (*group_cols, n BIGINT, med DOUBLE, mad DOUBLE,
    n_outliers BIGINT).

    Plan: two rank-window passes (median, then deviation median) and
    one group-keyed count — all on the SAME group-key exchange; the
    join-backs are group-sized broadcast joins. All comparisons are
    exact IEEE arithmetic on both engines (no rounding needed before
    the threshold compare).
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    vc = F.col(value_col).cast("double")
    base = df.filter(vc.isNotNull()).select(*gcols, vc.alias("__v"))
    med = _group_median(base, gcols, "__v", "med")
    withmed = base.join(F.broadcast(med), gcols)
    dev = withmed.select(
        *gcols, "med", F.abs(F.col("__v") - F.col("med")).alias("__d")
    )
    mad = _group_median(
        dev.select(*gcols, "__d"), gcols, "__d", "mad"
    )
    j = withmed.join(F.broadcast(mad), gcols)
    thr = F.lit(k) * F.lit(1.4826) * F.col("mad")
    return (
        j.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("__v") - F.col("med")) > thr, 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


def lorenz_deciles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Lorenz-curve points over equal-population value buckets — the
    concentration picture behind `t_gini`'s scalar ("the top decile
    holds X% of the mass"): rows sort by value ascending (id
    tie-break), split into `n_buckets` equal-population buckets by
    explicit floor-rank arithmetic (the rfm_segments device), and
    each bucket reports the cumulative share of total value at and
    below it. Values must be non-negative (checked: the curve is
    meaningless otherwise — raise, don't mislead).

    Output: (bucket INT, n BIGINT, cum_share DOUBLE round 6),
    bucket-ascending; cum_share is 1.0 at the last bucket.

    Plan: ranks come from the `bucketed_row_number` histogram device
    (bucket-partitioned sort tasks — no corpus-sized relation ever
    enters an unpartitioned window, the round-8 single-partition-sort
    fix), totals ride a 1-row broadcast, then one bucket agg + a
    cumulative window over the <= n_buckets rows. Integer values keep
    the sums exact.
    """
    from pandasvcf_spark.operators.relational import bucketed_row_number

    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & F.col(id_col).isNotNull()).select(
        v.alias("__v"), F.col(id_col).alias("__id")
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("__n"), F.min("__v").alias("__min")
    )
    r = bucketed_row_number(
        base.join(F.broadcast(tot)), "__v", ["__id"], "__rn"
    )
    checked = r.withColumn(
        "__v",
        F.when(
            F.col("__min") < 0,
            F.raise_error(F.lit("lorenz_deciles: negative values")),
        ).otherwise(F.col("__v")),
    )
    b = checked.select(
        "__v",
        F.floor(
            (F.col("__rn") - F.lit(1)) * F.lit(n_buckets) / F.col("__n")
        )
        .cast("int")
        .alias("bucket"),
    )
    agg = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").alias("__bs"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy()
    return agg.select(
        "bucket",
        "n",
        F.round(
            F.sum("__bs").over(w_cum) / F.sum("__bs").over(w_tot), 6
        ).alias("cum_share"),
    ).orderBy("bucket")


#: double literals shared with the SQL oracles (write these exact
#: digits on both sides — pi()/engine constants are NOT guaranteed to
#: be the same double as a parsed literal)
GUMBEL_PI = 3.141592653589793


GUMBEL_GAMMA = 0.5772156649015329


def gumbel_extremes(
    block_maxima: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    return_period: float = 100.0,
) -> DataFrame:
    """Gumbel (EV-I) fit of block maxima by the method of moments —
    "how bad is the 1-in-100 day?" for latency/queue/load ceilings:

        beta = sd · sqrt(6) / pi
        mu   = mean − gamma · beta          (Euler-Mascheroni gamma)
        RL_T = mu − beta · ln(−ln(1 − 1/T)) (the T-period return level)

    Input is the BLOCK-MAXIMA series (pre-aggregate per day/hour
    first). Sample sd; statistics NULL when n < 2 or sd = 0.

    Output: (*group_cols, n BIGINT, mu DOUBLE round 4, beta DOUBLE
    round 4, rl DOUBLE round 4).

    Plan: one 3-sum partial-aggregated groupBy + pure arithmetic.
    The pi/gamma constants are module literals mirrored digit-for-
    digit in the oracle (an engine's pi() need not be the same
    double as the parsed literal).
    """
    import math

    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    if return_period <= 1:
        raise ValueError("return_period must be > 1")
    x = F.col(value_col).cast("double")
    g = block_maxima.filter(x.isNotNull()).groupBy(*gcols).agg(
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
    beta = sd * F.lit(math.sqrt(6.0)) / F.lit(GUMBEL_PI)
    mu = mean - F.lit(GUMBEL_GAMMA) * beta
    rl = mu - beta * F.log(
        -F.log(F.lit(1.0) - F.lit(1.0) / F.lit(return_period))
    )
    ok = (F.col("n") >= 2) & (var > 0)
    return g.select(
        *gcols,
        "n",
        F.round(F.when(ok, mu), 4).alias("mu"),
        F.round(F.when(ok, beta), 4).alias("beta"),
        F.round(F.when(ok, rl), 4).alias("rl"),
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier, both dimensions minimized) —
    the multi-objective shortlist query ("no other option is at
    least as good on both axes and better on one"): price/latency,
    cost/error, size/loss fronts.

    Algorithm: over DISTINCT points sorted by (x ASC, y ASC), a point
    is on the skyline iff no preceding point has y <= its y — the
    classic sort-based sweep, which makes the frontier ONE window
    pass instead of the naive all-pairs dominance join (the oracle
    states exactly that naive NOT EXISTS form as an independent
    formulation). Exact comparisons — no rounding involved.

    Output: (x DOUBLE, y DOUBLE), x-ascending.

    Plan: one distinct + one cumulative-MIN window over a single
    sort. At 100 TB pre-filter with a coarse grid (only cells on the
    lower-left staircase can host skyline points) — the sweep itself
    is already one pass.
    """
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    pts = (
        df.filter(xc.isNotNull() & yc.isNotNull())
        .select(xc.alias("x"), yc.alias("y"))
        .distinct()
    )
    w = Window.orderBy(F.col("x").asc(), F.col("y").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    swept = pts.withColumn("__miny", F.min("y").over(w))
    return (
        swept.filter(
            F.col("__miny").isNull() | (F.col("y") < F.col("__miny"))
        )
        .select("x", "y")
        .orderBy("x")
    )


def js_divergence_from_counts(
    counts_a: DataFrame,
    counts_b: DataFrame,
    cat_col: str = "cat",
    n_col: str = "n",
) -> DataFrame:
    """`js_divergence` over PRE-AGGREGATED category counts — the form
    streaming monitors need (their per-batch state is the count cell
    table, not the raw rows). Same output contract as js_divergence:
    ONE row (n0, n1, k BIGINT, kl_pm, kl_qm, js DOUBLE round 6);
    equivalence with the row-level form is pytest-pinned.

    Plan: one full-outer join of two vocabulary-sized cell tables +
    a 1-row totals broadcast + a 1-row term agg.
    """
    a = counts_a.select(
        F.col(cat_col).alias("__c"),
        F.col(n_col).cast("double").alias("__a"),
    ).filter(F.col("__c").isNotNull())
    b = counts_b.select(
        F.col(cat_col).alias("__c"),
        F.col(n_col).cast("double").alias("__b"),
    ).filter(F.col("__c").isNotNull())
    cells = a.join(b, "__c", "full_outer").select(
        "__c",
        F.coalesce(F.col("__a"), F.lit(0.0)).alias("__a"),
        F.coalesce(F.col("__b"), F.lit(0.0)).alias("__b"),
    )
    tot = cells.agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )
    j = cells.join(F.broadcast(tot))
    p = F.col("__a") / F.col("__ta")
    q = F.col("__b") / F.col("__tb")
    m = (p + q) / F.lit(2.0)
    term_p = F.when(p > 0, p * F.log2(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(q > 0, q * F.log2(q / m)).otherwise(F.lit(0.0))
    agg = j.groupBy().agg(
        F.max("__ta").alias("__ta"),
        F.max("__tb").alias("__tb"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(term_p).alias("__kp"),
        F.sum(term_q).alias("__kq"),
    )
    ok = (F.col("__ta") > 0) & (F.col("__tb") > 0)
    return agg.select(
        F.col("__ta").cast("long").alias("n0"),
        F.col("__tb").cast("long").alias("n1"),
        "k",
        (F.round(F.when(ok, F.col("__kp")), 6) + F.lit(0.0)).alias(
            "kl_pm"
        ),
        (F.round(F.when(ok, F.col("__kq")), 6) + F.lit(0.0)).alias(
            "kl_qm"
        ),
        (
            F.round(
                F.when(
                    ok, (F.col("__kp") + F.col("__kq")) / F.lit(2.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("js"),
    )


def quantile_shift(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    probs: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Distributional shift function — per-quantile treatment effect
    between flag=1 and flag=0 samples (the Doksum shift function the
    mean difference hides: a treatment can move the tail and not the
    median): q1(p) − q0(p) at each requested prob, with the repo's
    exact inverse-ECDF (type-1) convention. flag must be 0/1; NULL
    value/flag rows drop.

    Output: (p DOUBLE, q0 DOUBLE, q1 DOUBLE, shift DOUBLE),
    prob-ascending; quantile SELECTION is exact (no rounding — the
    chosen values are input values, the shift their exact
    difference).

    Plan: both sides' quantiles come from ONE `grouped_exact_quantiles`
    call (group key = the flag) — the fully-distributed bucket walk
    (group- and (group, bucket)-keyed shuffles only), replacing the
    flag-partitioned cumulative window whose two partitions each
    sorted half the corpus in one task (the round-8
    single-partition-sort fix). Rank convention is identical: the
    type-1 rank ceil(p·W) on the same double product, so the selected
    values are bit-for-bit the old ones. Two tiny probs-keyed
    broadcast joins pivot the sides together.
    """
    from pandasvcf_spark.operators.relational import (
        grouped_exact_quantiles,
    )

    ps = sorted(set(float(p) for p in probs))
    if not ps or any(p <= 0 or p > 1 for p in ps):
        raise ValueError("probs must be in (0, 1]")
    vc = F.col(value_col).cast("double")
    fc = F.col(flag_col).cast("int")
    base = df.filter(vc.isNotNull() & fc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    q = grouped_exact_quantiles(base, ["__f"], "__v", ps)
    pdf = df.sparkSession.createDataFrame(
        [(p,) for p in ps], "p double"
    )
    q0 = q.filter(F.col("__f") == 0).select(
        "p", F.col("value").alias("q0")
    )
    q1 = q.filter(F.col("__f") == 1).select(
        "p", F.col("value").alias("q1")
    )
    return (
        pdf.join(F.broadcast(q0), "p", "left")
        .join(F.broadcast(q1), "p", "left")
        .select(
            "p",
            "q0",
            "q1",
            (F.col("q1") - F.col("q0") + F.lit(0.0)).alias("shift"),
        )
        .orderBy("p")
    )


def overlap_coeff(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Histogram overlap coefficient + Bhattacharyya coefficient
    between flag=1 and flag=0 value distributions — the
    covariate-balance / matching diagnostic ("how much common support
    do these two populations share?"):

        OVL = sum_bins min(p_i, q_i)      (1 = identical, 0 = disjoint)
        BC  = sum_bins sqrt(p_i · q_i)

    over `n_bins` fixed-width bins spanning the POOLED [min, max]
    (exact extrema, so the bin edges are engine-identical). flag must
    be 0/1; degenerate spans (min = max) put all mass in bin 0 (OVL
    1 — identical by construction).

    Output: ONE row (n0, n1 BIGINT, ovl DOUBLE round 6, bc DOUBLE
    round 6); NULL when either side is empty.

    Plan: a 1-row extrema broadcast + one bin-keyed two-counter agg
    (n_bins cells) + a 1-row fold.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    ext = base.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    j = base.join(F.broadcast(ext))
    span = F.col("__hi") - F.col("__lo")
    b = F.when(span > 0, F.least(
        F.floor((F.col("__v") - F.col("__lo")) / span * n_bins)
        .cast("int"),
        F.lit(n_bins - 1),
    )).otherwise(F.lit(0))
    cells = j.select(b.alias("__b"), "__f").groupBy("__b").agg(
        F.sum(F.when(F.col("__f") == 0, 1).otherwise(0))
        .cast("double")
        .alias("__a"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast("double")
        .alias("__c"),
    )
    tot = cells.agg(
        F.sum("__a").alias("__ta"), F.sum("__c").alias("__tc")
    )
    t = cells.join(F.broadcast(tot))
    p = F.col("__a") / F.col("__ta")
    q = F.col("__c") / F.col("__tc")
    g = t.groupBy().agg(
        F.max("__ta").alias("__ta"),
        F.max("__tc").alias("__tc"),
        F.sum(F.least(p, q)).alias("__ovl"),
        F.sum(F.sqrt(p * q)).alias("__bc"),
    )
    ok = (F.col("__ta") > 0) & (F.col("__tc") > 0)
    return g.select(
        F.col("__ta").cast("long").alias("n0"),
        F.col("__tc").cast("long").alias("n1"),
        F.round(F.when(ok, F.col("__ovl")), 6).alias("ovl"),
        F.round(F.when(ok, F.col("__bc")), 6).alias("bc"),
    )


def theil_index(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Theil inequality indices (Theil 1967) — the entropy-based
    concentration pair beside `gini_concentration`'s rank-based
    scalar, and the one that DECOMPOSES additively across subgroups
    (why economists reach for it):

        T (Theil-T / GE(1)) = (1/n) sum (x/mu) ln(x/mu)
                            = (sum x ln x)/(n mu) - ln mu
        L (Theil-L / MLD)   = ln mu - (1/n) sum ln x

    Non-positive values DROP (ln undefined — the standard convention;
    the dropped count reports so the denominator is never silent).

    Output: (*group_cols, n BIGINT, n_dropped BIGINT, theil_t DOUBLE
    round 6, theil_l DOUBLE round 6); NULL indices when n = 0.

    Plan: one group-keyed 4-sum partial agg — moment ratios only (the
    m_anova rounding-stability argument); engine ln parity holds at
    6dp (the m_js_divergence precedent).
    """
    gcols = list(group_cols)
    vc = F.col(value_col).cast("double")
    base = df.filter(vc.isNotNull()).select(*gcols, vc.alias("__v"))
    g = base.groupBy(*gcols).agg(
        F.sum((F.col("__v") <= 0).cast("long")).alias("n_dropped"),
        F.count(F.when(F.col("__v") > 0, 1)).cast("long").alias("n"),
        F.sum(F.when(F.col("__v") > 0, F.col("__v"))).alias("__s"),
        F.sum(
            F.when(F.col("__v") > 0, F.col("__v") * F.log("__v"))
        ).alias("__xlx"),
        F.sum(F.when(F.col("__v") > 0, F.log("__v"))).alias("__lx"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("__s") / nd
    t = F.col("__xlx") / (nd * mu) - F.log(mu)
    l_ = F.log(mu) - F.col("__lx") / nd
    ok = F.col("n") > 0
    return g.select(
        *gcols,
        "n",
        "n_dropped",
        (F.round(F.when(ok, t), 6) + F.lit(0.0)).alias("theil_t"),
        (F.round(F.when(ok, l_), 6) + F.lit(0.0)).alias("theil_l"),
    )


def _ecdf_cells(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    op_name: str,
    max_cells: int | None,
    count_type: str = "long",
) -> tuple[DataFrame, int | None]:
    """Shared front half of the two-sample ECDF family: filter, collapse
    to distinct-value (c0, c1) cells, tripwire. Returns (cells, est)."""
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    est = _assert_cell_bound(
        base, ["__v"], op_name, max_cells,
        plan_word="distinct-value ECDF ladder",
    )
    cells = base.groupBy("__v").agg(
        F.sum(F.when(F.col("__f") == 0, 1).otherwise(0))
        .cast(count_type).alias("__c0"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast(count_type).alias("__c1"),
    )
    return cells, est


def _ecdf_ladder(
    cells: DataFrame,
    est: int | None,
    ladder_cells: int,
    n_buckets: int,
    with_next: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared back half: cells + __cum0/__cum1 running counts through
    the current distinct value ascending (+ __nxt, the next distinct
    value, when `with_next`). At <= `ladder_cells` estimated cells the
    ladder is the plain global window; above it the windows re-cut
    through `_ladder.bucketed_running_sums` — bit-identical (integer
    counts), no single-task sort (round-11 verdict ask #4, the
    fdr_correct device generalized).

    Returns (lad, cells). In the big regime the returned cells are the
    LOCALCHECKPOINTED snapshot the ladder rides — callers must build
    their totals from it, or the data-sized distinct-value collapse
    runs twice (review-caught)."""
    from ._ladder import bucketed_running_sums

    lad = None
    if est is not None and est > ladder_cells:
        cells = cells.localCheckpoint(eager=True)
        lad = bucketed_running_sums(
            cells, "__v", ["__c0", "__c1"], ["__cum0", "__cum1"],
            n_buckets=n_buckets,
            next_col="__nxt" if with_next else None,
            assume_checkpointed=True,
        )
    if lad is None:
        w_ord = Window.orderBy("__v")
        w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
        extra = (
            [F.lead("__v", 1).over(w_ord).alias("__nxt")]
            if with_next
            else []
        )
        lad = cells.select(
            "__v",
            "__c0",
            "__c1",
            F.sum("__c0").over(w_cum).alias("__cum0"),
            F.sum("__c1").over(w_cum).alias("__cum1"),
            *extra,
        )
    return lad, cells


def ks_2sample(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (Smirnov 1939) — the
    distribution-comparison workhorse: the supremum gap between the
    two groups' empirical CDFs, with the classic asymptotic p-value

        D   = sup_v |F0(v) - F1(v)|
        lam = (sqrt(en) + 0.12 + 0.11/sqrt(en)) * D,  en = n0*n1/(n0+n1)
        p   = 2 * sum_{k>=1} (-1)^(k-1) exp(-2 k^2 lam^2)   (100 terms)

    (the Numerical-Recipes small-sample-corrected lambda; p clamped to
    [0, 1]). flag must be 0/1. Output: ONE row (n0, n1 BIGINT, d
    DOUBLE round 6, p_value DOUBLE round 6); NULL stats when either
    group is empty.

    Plan: collapse to distinct-value cells (the kendall/roc
    discipline; ENFORCED by the `max_cells` tripwire), ONE cumulative
    window over the value ladder for both ECDFs, 1-row folds — the
    sup over a corpus never materializes raw-row ranks. Above
    `ladder_cells` estimated cells the ladder re-cuts through the
    bucketed-offset device (`_ecdf_ladder`) — bit-identical, no
    single-task sort.
    """
    cells, est = _ecdf_cells(
        df, flag_col, value_col, "ks_2sample", max_cells
    )
    lad, cells = _ecdf_ladder(cells, est, ladder_cells, n_buckets)
    tot = cells.agg(
        F.sum("__c0").cast("long").alias("n0"),
        F.sum("__c1").cast("long").alias("n1"),
    )
    lad = lad.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("__cum0").cast("double") / F.col("n0")
            - F.col("__cum1").cast("double") / F.col("n1")
        ).alias("__gap"),
        "n0",
        "n1",
    )
    g = lad.groupBy("n0", "n1").agg(F.max("__gap").alias("__d"))
    en = (
        F.col("n0").cast("double") * F.col("n1")
        / (F.col("n0") + F.col("n1"))
    )
    lam = (
        F.sqrt(en) + F.lit(0.12) + F.lit(0.11) / F.sqrt(en)
    ) * F.col("__d")
    p_raw = F.lit(2.0) * F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.when(k % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.exp(F.lit(-2.0) * (k * k).cast("double") * lam * lam),
    )
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, F.col("__d")), 6) + F.lit(0.0)).alias("d"),
        (
            F.round(
                F.when(ok, F.greatest(F.least(p_raw, F.lit(1.0)), F.lit(0.0))),
                6,
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )


def kuiper_2sample(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Kuiper test (Kuiper 1960) — the cyclic-sensitive
    companion of `ks_2sample`: V = D+ + D− (the one-sided supremum
    gaps ADDED, not maxed), equally sensitive at the distribution's
    tails and median and invariant under cyclic shifts — the standard
    choice for phase/time-of-day/angle-valued comparisons where KS
    under-weights the wrap-around point:

        V   = max_v(F0 - F1) + max_v(F1 - F0)
        lam = (sqrt(en) + 0.155 + 0.24/sqrt(en)) * V
        p   = 2 * sum_{k>=1} (4 k² lam² - 1) exp(-2 k² lam²)

    (the Numerical-Recipes small-sample-corrected lambda; 100-term
    fold; p clamped to [0, 1]). flag must be 0/1. Output: ONE row
    (n0, n1 BIGINT, v DOUBLE round 6, p_value DOUBLE round 6); NULL
    stats when either group is empty.

    Plan: identical to `ks_2sample` — the distinct-value cell ladder
    (tripwire-enforced; bucketed-offset re-cut above `ladder_cells`),
    ONE cumulative window, 1-row folds; the only difference is
    folding max of each SIGNED gap instead of max |gap|.
    """
    cells, est = _ecdf_cells(
        df, flag_col, value_col, "kuiper_2sample", max_cells
    )
    lad, cells = _ecdf_ladder(cells, est, ladder_cells, n_buckets)
    tot = cells.agg(
        F.sum("__c0").cast("long").alias("n0"),
        F.sum("__c1").cast("long").alias("n1"),
    )
    lad = lad.crossJoin(F.broadcast(tot)).select(
        (
            F.col("__cum0").cast("double") / F.col("n0")
            - F.col("__cum1").cast("double") / F.col("n1")
        ).alias("__gap"),
        "n0",
        "n1",
    )
    g = lad.groupBy("n0", "n1").agg(
        F.greatest(F.max("__gap"), F.lit(0.0)).alias("__dp"),
        F.greatest(F.max(-F.col("__gap")), F.lit(0.0)).alias("__dm"),
    )
    v = F.col("__dp") + F.col("__dm")
    en = (
        F.col("n0").cast("double") * F.col("n1")
        / (F.col("n0") + F.col("n1"))
    )
    lam = (
        F.sqrt(en) + F.lit(0.155) + F.lit(0.24) / F.sqrt(en)
    ) * v
    p_raw = F.lit(2.0) * F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda acc, k: acc
        + (
            F.lit(4.0) * (k * k).cast("double") * lam * lam - F.lit(1.0)
        )
        * F.exp(F.lit(-2.0) * (k * k).cast("double") * lam * lam),
    )
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, v), 6) + F.lit(0.0)).alias("v"),
        (
            F.round(
                F.when(
                    ok,
                    F.greatest(F.least(p_raw, F.lit(1.0)), F.lit(0.0)),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("p_value"),
    )


def anderson_darling_2samp(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Anderson-Darling test statistic (Scholz & Stephens
    1987, the tie-adjusted midrank form A²akN — scipy's
    anderson_ksamp default) — the tail-weighted member of the
    ECDF-ladder family: where KS sees only the largest gap and CvM the
    mean-square gap, AD divides each gap by its binomial variance, so
    tail disagreements (where H(1-H) is tiny) count heavily — THE
    two-sample test to run when tail behavior is the question
    (latency p99s, losses, extremes):

      A² = (N-1)/N Σ_{i∈{0,1}} (1/n_i) Σ_j (l_j/N) ·
             (N·M_aij − n_i·B_aj)² / (B_aj(N−B_aj) − N·l_j/4)

    over distinct pooled values j with multiplicity l_j, where B_aj
    (pooled) and M_aij (per-group) are cumulative counts THROUGH the
    previous cell plus HALF this cell (the midrank convention).
    Output: ONE row (n0, n1 BIGINT, a2 DOUBLE round 6) — the
    standardized p-value needs the Scholz-Stephens variance +
    interpolation table and is intentionally not emitted (scipy caps
    it at [0.001, 0.25] for the same reason); compare a2 against the
    k=2 critical points (1.960 at 5%, 3.752 at 1%). NULL a2 when
    either group is empty or the pooled sample is constant.

    Plan: the ks_2sample cell ladder (tripwire-enforced;
    bucketed-offset re-cut above `ladder_cells`); the previous-row
    midrank cumulatives derive from the through-current running
    counts as cum − cell (exact — integer-valued doubles); every term
    is a per-cell closed form, then one 1-row fold."""
    cells, est = _ecdf_cells(
        df, flag_col, value_col, "anderson_darling_2samp", max_cells,
        count_type="double",
    )
    lj = F.col("__c0") + F.col("__c1")
    lad, cells = _ecdf_ladder(cells, est, ladder_cells, n_buckets)
    tot = cells.agg(
        F.sum("__c0").cast("long").alias("n0"),
        F.sum("__c1").cast("long").alias("n1"),
    )
    lad = lad.crossJoin(F.broadcast(tot)).select(
        "n0",
        "n1",
        lj.alias("__l"),
        (
            F.col("__cum0") + F.col("__cum1") - lj
            + lj / 2
        ).alias("__ba"),          # pooled midrank cumulative
        (
            F.col("__cum0") - F.col("__c0")
            + F.col("__c0") / 2
        ).alias("__ma0"),
        (
            F.col("__cum1") - F.col("__c1")
            + F.col("__c1") / 2
        ).alias("__ma1"),
    )
    nn = (F.col("n0") + F.col("n1")).cast("double")
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    denom = F.col("__ba") * (nn - F.col("__ba")) - nn * F.col("__l") / 4
    term = (F.col("__l") / nn) * F.when(
        denom > 0,
        (
            (nn * F.col("__ma0") - n0d * F.col("__ba"))
            * (nn * F.col("__ma0") - n0d * F.col("__ba"))
            / n0d
            + (nn * F.col("__ma1") - n1d * F.col("__ba"))
            * (nn * F.col("__ma1") - n1d * F.col("__ba"))
            / n1d
        )
        / denom,
    ).otherwise(F.lit(0.0))
    g = lad.groupBy("n0", "n1").agg(
        F.sum(term).alias("__s"),
        F.count(F.lit(1)).alias("__cells"),
    )
    a2 = (nn - 1) / nn * F.col("__s")
    ok = (F.col("n0") > 0) & (F.col("n1") > 0) & (F.col("__cells") > 1)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, a2), 6) + F.lit(0.0)).alias("a2"),
    )


def wasserstein_1d(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """1-D earth mover's distance (Wasserstein-1, Monge 1781 /
    Vaserstein 1969) between the two groups' value distributions —
    the drift metric that, unlike KS's sup, weights HOW FAR mass must
    move:  W1 = integral over v of |F0(v) - F1(v)| dv,  computed
    exactly as the segment-weighted fold over the merged distinct-
    value ladder (the CDF gap is constant between consecutive distinct
    values). flag must be 0/1. Output: ONE row (n0, n1 BIGINT, w1
    DOUBLE round 6); NULL when either group is empty.

    Plan: same distinct-value collapse + ONE cumulative window as
    `ks_2sample` (tripwire-enforced; bucketed-offset re-cut above
    `ladder_cells`, where the lead() becomes per-bucket with the
    bucket-boundary next value read off the same driver walk), plus
    one lead() for the segment widths; exact — no binning.
    """
    cells, est = _ecdf_cells(
        df, flag_col, value_col, "wasserstein_1d", max_cells
    )
    lad, cells = _ecdf_ladder(
        cells, est, ladder_cells, n_buckets, with_next=True
    )
    tot = cells.agg(
        F.sum("__c0").cast("long").alias("n0"),
        F.sum("__c1").cast("long").alias("n1"),
    )
    lad = lad.crossJoin(F.broadcast(tot)).select(
        "__v",
        "n0",
        "n1",
        F.abs(
            F.col("__cum0").cast("double") / F.col("n0")
            - F.col("__cum1").cast("double") / F.col("n1")
        ).alias("__gap"),
        "__nxt",
    )
    g = lad.groupBy("n0", "n1").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__nxt").isNotNull(),
                    F.col("__gap") * (F.col("__nxt") - F.col("__v")),
                )
            ),
            F.lit(0.0),
        ).alias("__w1")
    )
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, F.col("__w1")), 6) + F.lit(0.0)).alias("w1"),
    )


def js_divergence_binned(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991) between the two groups'
    binned CONTINUOUS value distributions — the equal-width-bin
    companion of the categorical `js_divergence` (natural log here;
    the drift monitor for numeric features) — the symmetric, bounded (<= ln 2)
    drift metric:  JS = [KL(P||M) + KL(Q||M)] / 2,  M = (P+Q)/2, over
    `n_bins` equal-width bins priced from the GLOBAL min/max (one
    1-row agg; 0 ln 0 = 0 by convention; natural log). flag must be
    0/1. Output: ONE row (n0, n1 BIGINT, js DOUBLE round 6); NULL
    when either group is empty or min = max.

    Plan: one bounds agg + one bin groupBy (<= n_bins cells) + 1-row
    folds — two exchanges total, both cell-sized after the first."""
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    bounds = base.agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    binned = base.crossJoin(F.broadcast(bounds)).select(
        "__f",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins)))
                ),
                F.lit(n_bins - 1),
            ),
        ).otherwise(F.lit(0)).alias("__b"),
    )
    hist = binned.groupBy("__b").agg(
        F.sum(F.when(F.col("__f") == 0, 1).otherwise(0))
        .cast("double").alias("__h0"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast("double").alias("__h1"),
    )
    tot = hist.agg(
        F.sum("__h0").alias("__n0"), F.sum("__h1").alias("__n1")
    )
    j = hist.crossJoin(F.broadcast(tot))
    p = F.col("__h0") / F.col("__n0")
    q = F.col("__h1") / F.col("__n1")
    m = (p + q) / 2
    term = (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    g = j.groupBy().agg(
        F.max("__n0").cast("long").alias("n0"),
        F.max("__n1").cast("long").alias("n1"),
        F.sum(term).alias("__js"),
    )
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, F.col("__js")), 6) + F.lit(0.0)).alias("js"),
    )


def cvm_2sample(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Two-sample Cramér-von Mises test (Anderson 1962) — the
    quadratic companion completing the ECDF ladder triad (`ks_2sample`
    takes the sup, `wasserstein_1d` the L1 area, this the weighted L2):

        T = (n0 n1 / N²) * sum over the POOLED sample (with
            multiplicity) of [F0(z) - F1(z)]²

    i.e. each distinct value v contributes count(v) · gap(v)². More
    sensitive than KS to distributed (non-localized) differences.
    flag must be 0/1. Output: ONE row (n0, n1 BIGINT, t DOUBLE
    round 6); NULL when either group is empty.

    Plan: identical to ks_2sample — distinct-value cell collapse
    (tripwire-enforced; bucketed-offset re-cut above `ladder_cells`)
    + ONE cumulative window + a 1-row fold.
    """
    cells, est = _ecdf_cells(
        df, flag_col, value_col, "cvm_2sample", max_cells
    )
    gap = (
        F.col("__cum0").cast("double") / F.col("n0")
        - F.col("__cum1").cast("double") / F.col("n1")
    )
    lad, cells = _ecdf_ladder(cells, est, ladder_cells, n_buckets)
    tot = cells.agg(
        F.sum("__c0").cast("long").alias("n0"),
        F.sum("__c1").cast("long").alias("n1"),
    )
    lad = lad.crossJoin(F.broadcast(tot)).select(
        "n0",
        "n1",
        ((F.col("__c0") + F.col("__c1")).cast("double") * gap * gap)
        .alias("__w"),
    )
    g = lad.groupBy("n0", "n1").agg(F.sum("__w").alias("__s"))
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    nd = n0d + n1d
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return g.select(
        "n0",
        "n1",
        (
            F.round(
                F.when(ok, n0d * n1d / (nd * nd) * F.col("__s")), 6
            )
            + F.lit(0.0)
        ).alias("t"),
    )


def energy_distance_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Two-sample energy distance (Székely & Rizzo 2004) — the
    metric-space divergence that completes the ECDF comparison family
    (KS: sup gap; Wasserstein: area; CvM/AD: weighted L2; this:
    pairwise-distance energy, consistent against ALL alternatives):

        D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
        T  = (n m / (n+m)) · D²        (the permutation-test statistic)

    group must be 0/1 (the logrank convention). PRE-BUCKET dense
    values (ENFORCED by the `max_cells` tripwire): the corpus
    collapses to (group, value) count cells, and every expectation is
    ONE broadcast cell×cell grid fold with integer pair weights —
    |cells|², never rows². Output: ONE row (n1, n2 BIGINT, e_dist
    DOUBLE round 6 — that is D², the squared form — t_stat DOUBLE
    round 6); NULL when either sample is empty."""
    gc = F.col(group_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    _assert_cell_bound(
        base, ["__g", "__v"], "energy_distance_2samp", max_cells
    )
    cells = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__g").alias("__ga"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    w = (F.col("__na") * F.col("__nb")).cast("double") * F.abs(
        F.col("__va") - F.col("__vb")
    )
    pairs = a.join(F.broadcast(b), F.lit(True), "inner")
    g = pairs.agg(
        F.sum(
            F.when((F.col("__ga") == 0) & (F.col("__gb") == 1), w)
        ).alias("__sxy"),
        F.sum(
            F.when((F.col("__ga") == 0) & (F.col("__gb") == 0), w)
        ).alias("__sxx"),
        F.sum(
            F.when((F.col("__ga") == 1) & (F.col("__gb") == 1), w)
        ).alias("__syy"),
    )
    tot = cells.agg(
        F.sum(F.when(F.col("__g") == 0, F.col("__n"))).alias("__n1"),
        F.sum(F.when(F.col("__g") == 1, F.col("__n"))).alias("__n2"),
    )
    g = g.join(F.broadcast(tot))
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    ok = (n1 > 0) & (n2 > 0)
    d2 = (
        2.0 * F.coalesce(F.col("__sxy"), F.lit(0.0)) / (n1 * n2)
        - F.coalesce(F.col("__sxx"), F.lit(0.0)) / (n1 * n1)
        - F.coalesce(F.col("__syy"), F.lit(0.0)) / (n2 * n2)
    )
    return g.select(
        F.col("__n1").cast("long").alias("n1"),
        F.col("__n2").cast("long").alias("n2"),
        (F.round(F.when(ok, d2), 6) + F.lit(0.0)).alias("e_dist"),
        (
            F.round(F.when(ok, n1 * n2 / (n1 + n2) * d2), 6)
            + F.lit(0.0)
        ).alias("t_stat"),
    )


def mmd_rbf_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sigma: float = 1.0,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Kernel two-sample MMD² (Gretton et al. 2012), RBF kernel with
    EXPLICIT bandwidth — the kernel-embedding member of the two-sample
    family beside `energy_distance_2samp` (energy is MMD with the
    distance kernel; the RBF form weights LOCAL discrepancies, the
    classic drift detector for bounded features):

        k(x, y) = exp(−(x−y)² / (2σ²))
        MMD²    = E k(X,X') + E k(Y,Y') − 2 E k(X,Y)   (V-statistic)

    σ is a parameter, not data-derived (pass the median pairwise
    distance if you want the median heuristic — keeping it explicit
    is what makes the statistic a pure function of (data, σ) and the
    oracle an exact replay). group must be 0/1; PRE-BUCKET dense
    values (`max_cells` tripwire). Same plan as energy distance: one
    (group, value) collapse, ONE broadcast cell×cell grid fold.
    Output: ONE row (n1, n2 BIGINT, mmd2 DOUBLE round 6); NULL when
    either sample is empty."""
    if sigma <= 0:
        raise ValueError(f"sigma must be > 0, got {sigma}")
    gc = F.col(group_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    _assert_cell_bound(
        base, ["__g", "__v"], "mmd_rbf_2samp", max_cells
    )
    cells = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__g").alias("__ga"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    dd = F.col("__va") - F.col("__vb")
    w = (F.col("__na") * F.col("__nb")).cast("double") * F.exp(
        -(dd * dd) / F.lit(2.0 * float(sigma) * float(sigma))
    )
    pairs = a.join(F.broadcast(b), F.lit(True), "inner")
    g = pairs.agg(
        F.sum(
            F.when((F.col("__ga") == 0) & (F.col("__gb") == 1), w)
        ).alias("__kxy"),
        F.sum(
            F.when((F.col("__ga") == 0) & (F.col("__gb") == 0), w)
        ).alias("__kxx"),
        F.sum(
            F.when((F.col("__ga") == 1) & (F.col("__gb") == 1), w)
        ).alias("__kyy"),
    )
    tot = cells.agg(
        F.sum(F.when(F.col("__g") == 0, F.col("__n"))).alias("__n1"),
        F.sum(F.when(F.col("__g") == 1, F.col("__n"))).alias("__n2"),
    )
    g = g.join(F.broadcast(tot))
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    ok = (n1 > 0) & (n2 > 0)
    mmd2 = (
        F.coalesce(F.col("__kxx"), F.lit(0.0)) / (n1 * n1)
        + F.coalesce(F.col("__kyy"), F.lit(0.0)) / (n2 * n2)
        - 2.0 * F.coalesce(F.col("__kxy"), F.lit(0.0)) / (n1 * n2)
    )
    return g.select(
        F.col("__n1").cast("long").alias("n1"),
        F.col("__n2").cast("long").alias("n2"),
        (F.round(F.when(ok, mmd2), 6) + F.lit(0.0)).alias("mmd2"),
    )
