"""Survival, causal and multiple-testing operators.

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
from ._ladder import bucketed_running_extreme


def cuped_adjust(
    df: DataFrame,
    unit_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance-reduction summary (Deng et al. 2013) — the
    modern A/B-test practice of regressing out a pre-experiment
    covariate: theta = cov(pre, post) / var(pre), adjusted metric
    y − theta·(x − mean x), whose variance shrinks by exactly corr²:

        var_reduction = corr(pre, post)²

    Input: ONE ROW PER UNIT (pre-aggregate user metrics first — this
    operator consumes the per-user table, not raw events). Units with
    NULL pre/post drop.

    Output: ONE row (n BIGINT, theta DOUBLE round 6, corr DOUBLE
    round 6, var_reduction DOUBLE round 6) — all moment ratios (the
    m_anova rounding-stability argument); NULL when var(pre) or
    var(post) is 0.

    Plan: one partial-aggregated 5-sum pass over the unit table.
    """
    xc = F.col(pre_col).cast("double")
    yc = F.col(post_col).cast("double")
    base = df.filter(
        F.col(unit_col).isNotNull() & xc.isNotNull() & yc.isNotNull()
    ).select(xc.alias("__x"), yc.alias("__y"))
    g = base.agg(
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
    ok = (vx > 0) & (vy > 0)
    return g.select(
        "n",
        (F.round(F.when(ok, cv / vx), 6) + F.lit(0.0)).alias("theta"),
        (
            F.round(F.when(ok, cv / F.sqrt(vx * vy)), 6) + F.lit(0.0)
        ).alias("corr"),
        F.round(F.when(ok, cv * cv / (vx * vy)), 6).alias(
            "var_reduction"
        ),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — ARE the two survival
    curves different? The hypothesis-test closer for the
    `kaplan_meier` / `nelson_aalen` family: at each distinct event
    time, the observed group-1 events are compared to the
    hypergeometric expectation given the at-risk split:

        E1_t = d_t · n1_t / n_t
        V_t  = d_t (n1_t/n_t)(1 − n1_t/n_t)(n_t − d_t)/(n_t − 1)
        z    = (O1 − E1) / sqrt(sum V_t),   chi2 = z²

    group must be 0/1; censored rows (event = 0) leave the risk sets
    without contributing events. NULL duration/event/group drop.

    Output: ONE row (n1, n2, o1 BIGINT, e1 DOUBLE round 4, chi2
    DOUBLE round 6, z DOUBLE round 6); NULL statistics when the
    variance sum is 0.

    Plan: the kaplan_meier shape twice over — one groupBy(duration)
    collapses the corpus to per-time 4-counter rows, the two at-risk
    ladders are cumulative windows over the SAME distinct-times
    order (bit-exact integer ladders), and the test statistic is a
    1-row fold.
    """
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    gr = F.col(group_col).cast("int")
    nn = df.filter(t.isNotNull() & ev.isNotNull() & gr.isNotNull())
    per_t = nn.groupBy(t.alias("t")).agg(
        F.sum(F.when((ev != 0) & (gr == 1), 1).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when((ev != 0) & (gr == 0), 1).otherwise(0))
        .cast("long")
        .alias("d0"),
        F.sum(F.when(gr == 1, 1).otherwise(0)).cast("long").alias("a1"),
        F.sum(F.when(gr == 0, 1).otherwise(0)).cast("long").alias("a0"),
    )
    tot = per_t.agg(
        F.sum("a1").alias("__N1"), F.sum("a0").alias("__N0")
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = per_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d1",
        "d0",
        (
            F.col("__N1")
            - F.coalesce(F.sum("a1").over(w_prev), F.lit(0))
        ).alias("n1t"),
        (
            F.col("__N0")
            - F.coalesce(F.sum("a0").over(w_prev), F.lit(0))
        ).alias("n0t"),
        F.col("__N1"),
        F.col("__N0"),
    )
    nt = (F.col("n1t") + F.col("n0t")).cast("double")
    dt = (F.col("d1") + F.col("d0")).cast("double")
    p1 = F.col("n1t").cast("double") / nt
    e1t = dt * p1
    vt = F.when(
        nt > 1,
        dt * p1 * (F.lit(1.0) - p1) * (nt - dt) / (nt - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    g = b.filter(F.col("d1") + F.col("d0") > 0).agg(
        F.max("__N1").cast("long").alias("n1"),
        F.max("__N0").cast("long").alias("n2"),
        F.sum("d1").cast("long").alias("o1"),
        F.sum(e1t).alias("__e1"),
        F.sum(vt).alias("__v"),
    )
    z = (F.col("o1").cast("double") - F.col("__e1")) / F.sqrt(
        F.col("__v")
    )
    return g.select(
        "n1",
        "n2",
        "o1",
        F.round(F.col("__e1"), 4).alias("e1"),
        F.round(F.when(F.col("__v") > 0, z * z), 6).alias("chi2"),
        (F.round(F.when(F.col("__v") > 0, z), 6) + F.lit(0.0)).alias(
            "z"
        ),
    )


def harrell_c(
    df: DataFrame,
    time_col: str,
    event_col: str,
    score_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Harrell's concordance index (Harrell et al. 1982) — THE ranking
    metric for survival/churn risk scores: of all permissible pairs,
    the fraction where the higher-risk score belongs to the subject
    who failed earlier,

        permissible = {(i, j): t_i < t_j and event_i = 1}
        C = (#[s_i > s_j] + 0.5 #[s_i = s_j]) / #permissible

    (the original definition: pairs tied on time are not permissible;
    a censored i is never the early member — its true time is only
    known to exceed t_i). PRE-BUCKET dense scores (ENFORCED by the
    `max_cells` tripwire). Output: ONE row (n BIGINT, n_pairs,
    concordant, tied BIGINT, c_index DOUBLE round 6); NULL c when no
    permissible pair exists.

    Plan: collapse to (time, event, score) cells, ONE broadcast
    cell-grid fold over (early-event cell) x (later cell) — integer
    pair counts, exact rational C.
    """
    tc = F.col(time_col).cast("double")
    ec = F.col(event_col).cast("int")
    sc = F.col(score_col).cast("double")
    base = df.filter(
        tc.isNotNull() & ec.isNotNull() & sc.isNotNull()
    ).select(tc.alias("__t"), ec.alias("__e"), sc.alias("__s"))
    _assert_cell_bound(
        base, ["__t", "__e", "__s"], "harrell_c", max_cells
    )
    cells = base.groupBy("__t", "__e", "__s").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.filter(F.col("__e") == 1).select(
        F.col("__t").alias("__ta"),
        F.col("__s").alias("__sa"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__t").alias("__tb"),
        F.col("__s").alias("__sb"),
        F.col("__n").alias("__nb"),
    )
    w = F.col("__na") * F.col("__nb")
    grid = a.join(
        F.broadcast(b), F.col("__tb") > F.col("__ta"), "inner"
    ).agg(
        F.coalesce(F.sum(w), F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("__sa") > F.col("__sb"), w).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("concordant"),
        F.coalesce(
            F.sum(F.when(F.col("__sa") == F.col("__sb"), w).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("tied"),
    )
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = grid.crossJoin(F.broadcast(nrow))
    c = (
        F.col("concordant").cast("double")
        + F.lit(0.5) * F.col("tied").cast("double")
    ) / F.col("n_pairs").cast("double")
    return g.select(
        "n",
        "n_pairs",
        "concordant",
        "tied",
        (
            F.round(F.when(F.col("n_pairs") > 0, c), 6) + F.lit(0.0)
        ).alias("c_index"),
    )


def fdr_correct(
    df: DataFrame,
    p_col: str,
    method: str = "bh",
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Multiple-testing correction over a hypothesis table — the step
    every p-value sweep (per-site GWAS scans, per-segment A/B grids,
    per-term burst tests) needs before anyone reads its smallest p.
    Adds `p_adj` to every input row:

        bh         : Benjamini-Hochberg (1995) step-up FDR —
                     p_adj(i) = min_{j >= i} m p_(j) / j, the suffix
                     min taken from the largest p downward
        by         : Benjamini-Yekutieli (2001) — BH's envelope scaled
                     by the harmonic factor c(m) = Σ 1/i, valid under
                     ARBITRARY dependence between the hypotheses (the
                     correlated-scan case BH's PRDS assumption
                     excludes); c(m) is a driver scalar (one 1-row
                     count collect), and min commutes with the
                     positive scaling so the same suffix-min ladder
                     serves both methods
        holm       : Holm (1979) step-down FWER —
                     p_adj(i) = max_{j <= i} (m - j + 1) p_(j)
        bonferroni : m p, the one-liner baseline

    all clamped to 1; tied p-values share one adjusted value (within a
    tie run BH's min lands at the run's LAST position and Holm's max
    at its FIRST, so both are per-run closed forms — no per-row rank).

    Output: the input columns + p_adj DOUBLE (round 9). NULL p rows
    pass through with NULL p_adj and do not count toward m (the R
    p.adjust convention).

    Plan: collapse to distinct-p cells (tripwire at `max_cells` — a
    hypothesis table at 10M distinct p's is already suspicious), ONE
    cumulative-count window up the ladder for positions, ONE
    running-extreme window back down for the step-up/step-down
    envelope, then a join of the cell table onto the rows — the
    corpus never sorts. The tripwire's cardinality estimate ROUTES
    the plan (round-10 verdict task 6 + ADVICE): at <= `ladder_cells`
    distinct p's the ladder is the plain global window and the
    join-back broadcasts; above it the windows re-cut through the
    `bucketed_row_number` equal-width-bucket device (per-bucket
    running aggregates + a driver-walked <= `n_buckets`-row offset
    table — bit-identical, no single-task sort, see
    `relational.bucketed_row_number`) and the join-back is a plain
    shuffle join (a multi-hundred-MB cell table must not broadcast).
    `max_cells=None` disables both the tripwire and the routing
    (plain windows + broadcast — the caller has priced the plan).
    """
    method = method.lower()
    if method not in ("bh", "by", "holm", "bonferroni"):
        raise ValueError(f"unknown method {method!r}")
    pc = F.col(p_col).cast("double")
    rows = df.withColumn("__p", pc)
    cells = (
        rows.filter(F.col("__p").isNotNull())
        .groupBy("__p")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    est = _assert_cell_bound(
        cells, ["__p"], "fdr_correct", max_cells,
        plan_word="distinct-p envelope ladder",
    )
    big = est is not None and est > ladder_cells
    if big:
        adj = _fdr_adj_bucketed(cells, method, n_buckets)
        if adj is None:  # degenerate distinct-p set: plain ladder
            big = False
    if not big:
        w_cum = Window.orderBy("__p").rowsBetween(
            Window.unboundedPreceding, 0
        )
        if method == "by":
            # one model-sized collect feeds BOTH the harmonic factor
            # and m itself — a tot relation would re-scan cells
            m_by = float(
                cells.agg(F.sum("__c")).collect()[0][0] or 0.0
            )
            pos = cells.select(
                "__p",
                F.lit(m_by).alias("__m"),
                F.sum("__c").over(w_cum).alias("__hi"),
            )
        else:
            tot = cells.agg(F.sum("__c").alias("__m"))
            pos = cells.crossJoin(F.broadcast(tot)).select(
                "__p",
                "__m",
                F.sum("__c").over(w_cum).alias("__hi"),  # run END
            )
        if method == "bonferroni":
            adj = pos.select(
                "__p",
                F.least(F.col("__m") * F.col("__p"), F.lit(1.0)).alias(
                    "__adj"
                ),
            )
        elif method in ("bh", "by"):
            cand = F.col("__m") * F.col("__p") / F.col("__hi")
            if method == "by":
                cand = F.lit(_harmonic(int(m_by))) * cand
            w_sfx = Window.orderBy(F.col("__p").desc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
            adj = pos.select(
                "__p",
                F.least(F.min(cand).over(w_sfx), F.lit(1.0)).alias(
                    "__adj"
                ),
            )
        else:  # holm: run START position lo = hi - c + 1
            lo = F.col("__hi") - F.col("__c") + 1
            cand = (F.col("__m") - lo + 1) * F.col("__p")
            w_pfx = Window.orderBy("__p").rowsBetween(
                Window.unboundedPreceding, 0
            )
            adj = pos.join(cells.select("__p", "__c"), "__p").select(
                "__p",
                F.least(F.max(cand).over(w_pfx), F.lit(1.0)).alias(
                    "__adj"
                ),
            )
    joined = (
        rows.join(F.broadcast(adj), "__p", "left")
        if not big
        else rows.join(adj, "__p", "left")  # cell table too big to ship
    )
    return (
        joined
        .withColumn("p_adj", F.round(F.col("__adj"), 9))
        .drop("__p", "__adj")
    )


def _harmonic(m: int) -> float:
    """c(m) = Σ_{i=1..m} 1/i, summed ASCENDING (the documented order —
    an oracle replaying it sums the same magnitudes; the ~1e-16
    relative order sensitivity sits five orders below the p_adj
    rounding)."""
    s = 0.0
    for i in range(1, m + 1):
        s += 1.0 / i
    return s


def _fdr_adj_bucketed(
    cells: DataFrame, method: str, n_buckets: int
) -> DataFrame | None:
    """The > `ladder_cells` regime of `fdr_correct`: re-cut its three
    global ladder windows (cumulative position count, BH suffix-min,
    Holm prefix-max) through the equal-width-bucket offset device of
    `relational.bucketed_row_number` so no single task ever sorts the
    distinct-p cell table. Same arithmetic, same double ops, so the
    result is bit-identical to the plain-window form:

      1. one (min, max) pass prices equal-width p buckets; the cell
         table localCheckpoints (the bucketed_row_number determinism
         precondition — three jobs must see one snapshot);
      2. per-bucket count sums (<= n_buckets rows collected) give each
         bucket its exact global position offset by a driver walk;
         the grand total m falls out of the same walk as a scalar —
         positions are then offset + a per-BUCKET cumulative window;
      3. the envelope re-cuts the same way: per-bucket candidate
         extremes (<= n_buckets rows collected), a driver suffix-min
         (BH) / prefix-max (Holm) walk over the STRICTLY later /
         earlier buckets, and a per-bucket running extreme merged with
         the broadcast cross-bucket offset.

    Returns (__p, __adj), or None when the p range is degenerate
    (empty / single distinct value — the plain window is then one
    cell and costs nothing)."""
    cells = cells.localCheckpoint(eager=True)
    st = cells.agg(
        F.min("__p").alias("lo"), F.max("__p").alias("hi")
    ).collect()[0]
    if st["lo"] is None or st["lo"] == st["hi"]:
        return None
    lo_p, hi_p = st["lo"], st["hi"]
    width = (hi_p - lo_p) / n_buckets
    bucket = F.least(
        F.floor((F.col("__p") - F.lit(lo_p)) / F.lit(width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    binned = cells.withColumn("__bk", bucket)
    csum = {
        r["__bk"]: r["s"]
        for r in binned.groupBy("__bk")
        .agg(F.sum("__c").alias("s"))
        .collect()
    }
    offs, cum = [], 0.0
    for bk in sorted(csum):
        offs.append((bk, cum))
        cum += csum[bk]
    m = cum  # grand total count — a scalar, not a 1-row relation
    spark = cells.sparkSession
    odf = spark.createDataFrame(offs, "__bk int, __coff double")
    w_cum = Window.partitionBy("__bk").orderBy("__p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pos = binned.join(F.broadcast(odf), "__bk").select(
        "__bk",
        "__p",
        "__c",
        (F.col("__coff") + F.sum("__c").over(w_cum)).alias("__hi"),
    )
    if method == "bonferroni":
        return pos.select(
            "__p",
            F.least(F.lit(m) * F.col("__p"), F.lit(1.0)).alias("__adj"),
        )
    if method in ("bh", "by"):
        cand = F.lit(m) * F.col("__p") / F.col("__hi")
        if method == "by":
            cand = F.lit(_harmonic(int(m))) * cand
        later = True  # suffix-min envelope: offset from LATER buckets
    else:  # holm
        lo_pos = F.col("__hi") - F.col("__c") + 1
        cand = (F.lit(m) - lo_pos + 1) * F.col("__p")
        later = False  # prefix-max envelope: offset from EARLIER ones
    scored = pos.withColumn("__cand", cand)
    # envelope via the SHARED ladder helper (round-12 verdict ask #6:
    # the suffix-min/prefix-max half lifted into _ladder.py beside the
    # cumulative half). bucket_col="__bk" reuses this function's own
    # binning, so the jobs, the window, and the merge expression are
    # the ones this block previously inlined — bit-identical, and the
    # test_plan_shapes assert is unchanged.
    env = bucketed_running_extreme(
        scored,
        "__p",
        "__cand",
        "__env",
        suffix=later,
        op="min" if later else "max",
        bucket_col="__bk",
    )
    return env.select(
        "__p",
        F.least(F.col("__env"), F.lit(1.0)).alias("__adj"),
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    outcome_col: str,
) -> DataFrame:
    """Difference-in-differences (the 2x2 canonical form; Card &
    Krueger 1994 usage) — the workhorse causal estimate when treatment
    arrived at a point in time and a control group shares the trend:

        DiD = (ybar_t,post - ybar_t,pre) - (ybar_c,post - ybar_c,pre)
        SE  = sqrt(sum over the four cells of s²_cell / n_cell)

    (the unequal-variance cell SE; t = DiD / SE). treat and post must
    be 0/1. Output: ONE row (n00, n01, n10, n11 BIGINT — control/pre,
    control/post, treated/pre, treated/post — did DOUBLE round 6,
    se DOUBLE round 6, t DOUBLE round 6); NULLs when any cell is
    empty (the design is undefined without all four).

    Plan: ONE partial-aggregated pass over the corpus accumulating
    the four cells' (n, sum, sumsq); everything else is a 1-row fold.
    """
    tc = F.col(treat_col).cast("int")
    pc = F.col(post_col).cast("int")
    yc = F.col(outcome_col).cast("double")
    base = df.filter(
        tc.isNotNull() & pc.isNotNull() & yc.isNotNull()
    ).select(tc.alias("__t"), pc.alias("__p"), yc.alias("__y"))

    def cell(t, p, what):
        m = (F.col("__t") == t) & (F.col("__p") == p)
        if what == "n":
            return F.sum(F.when(m, 1).otherwise(0)).cast("long")
        if what == "s":
            return F.sum(F.when(m, F.col("__y")).otherwise(0.0))
        return F.sum(
            F.when(m, F.col("__y") * F.col("__y")).otherwise(0.0)
        )

    g = base.agg(
        *[
            cell(t, p, w).alias(f"__{w}{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
            for w in ("n", "s", "q")
        ]
    )

    def mean(t, p):
        return F.col(f"__s{t}{p}") / F.col(f"__n{t}{p}").cast("double")

    def var_over_n(t, p):
        n = F.col(f"__n{t}{p}").cast("double")
        m = mean(t, p)
        return ((F.col(f"__q{t}{p}") - n * m * m) / (n - 1)) / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(
        var_over_n(0, 0) + var_over_n(0, 1)
        + var_over_n(1, 0) + var_over_n(1, 1)
    )
    ok = (
        (F.col("__n00") >= 2) & (F.col("__n01") >= 2)
        & (F.col("__n10") >= 2) & (F.col("__n11") >= 2)
    )
    return g.select(
        F.col("__n00").alias("n00"),
        F.col("__n01").alias("n01"),
        F.col("__n10").alias("n10"),
        F.col("__n11").alias("n11"),
        (F.round(F.when(ok, did), 6) + F.lit(0.0)).alias("did"),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
        (
            F.round(F.when(ok & (se > 0), did / se), 6) + F.lit(0.0)
        ).alias("t"),
    )


def stratified_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    strata_cols: Sequence[str],
    min_cell: int = 1,
) -> DataFrame:
    """Post-stratification average treatment effect — exact matching
    on discrete covariate strata (the non-parametric ancestor of
    propensity weighting; Cochran 1968):

        ATE = sum_s w_s (ybar_{1,s} - ybar_{0,s}),
        w_s = n_s / N over strata with BOTH arms present
        SE  = sqrt(sum_s w_s² (s²_{1,s}/n_{1,s} + s²_{0,s}/n_{0,s}))

    Strata missing either arm are EXCLUDED and accounted (the honest
    overlap violation report — silently reweighting them would claim
    support that isn't there). treat must be 0/1. Output: ONE row
    (n_strata, n_used, n_dropped BIGINT, n BIGINT = rows in used
    strata, ate, se DOUBLE round 6); NULL estimates when nothing
    overlaps.

    Plan: one (strata, arm)-keyed partial agg collapses the corpus to
    per-stratum-arm moments; a strata-keyed pivot + 1-row folds do the
    rest — cost is one exchange on the strata key.
    """
    scols = list(strata_cols)
    if not scols:
        raise ValueError("strata_cols must be non-empty")
    tc = F.col(treat_col).cast("int")
    yc = F.col(outcome_col).cast("double")
    base = df.filter(tc.isNotNull() & yc.isNotNull()).select(
        *scols, tc.alias("__t"), yc.alias("__y")
    )
    cells = base.groupBy(*scols, "__t").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__y").alias("__m"),
        F.sum(F.col("__y") * F.col("__y")).alias("__q"),
    )
    strat = cells.groupBy(*scols).agg(
        F.sum("__n").alias("__ns"),
        F.max(F.when(F.col("__t") == 1, F.col("__n"))).alias("__n1"),
        F.max(F.when(F.col("__t") == 0, F.col("__n"))).alias("__n0"),
        F.max(F.when(F.col("__t") == 1, F.col("__m"))).alias("__m1"),
        F.max(F.when(F.col("__t") == 0, F.col("__m"))).alias("__m0"),
        F.max(F.when(F.col("__t") == 1, F.col("__q"))).alias("__q1"),
        F.max(F.when(F.col("__t") == 0, F.col("__q"))).alias("__q0"),
    )
    used = (
        F.col("__n1").isNotNull()
        & F.col("__n0").isNotNull()
        & (F.col("__n1") >= min_cell)
        & (F.col("__n0") >= min_cell)
    )

    def v_over_n(side):
        n = F.col(f"__n{side}")
        m = F.col(f"__m{side}")
        q = F.col(f"__q{side}")
        return F.when(
            n >= 2, ((q - n * m * m) / (n - 1)) / n
        ).otherwise(F.lit(0.0))

    g = strat.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(F.when(used, 1).otherwise(0)).cast("long").alias(
            "n_used"
        ),
        F.sum(F.when(~used, 1).otherwise(0)).cast("long").alias(
            "n_dropped"
        ),
        F.coalesce(
            F.sum(F.when(used, F.col("__ns"))), F.lit(0.0)
        ).alias("__N"),
        F.sum(
            F.when(used, F.col("__ns") * (F.col("__m1") - F.col("__m0")))
        ).alias("__wd"),
        F.sum(
            F.when(
                used,
                F.col("__ns") * F.col("__ns")
                * (v_over_n(1) + v_over_n(0)),
            )
        ).alias("__wv"),
    )
    ate = F.col("__wd") / F.col("__N")
    se = F.sqrt(F.col("__wv")) / F.col("__N")
    ok = F.col("n_used") > 0
    return g.select(
        "n_strata",
        "n_used",
        "n_dropped",
        F.col("__N").cast("long").alias("n"),
        (F.round(F.when(ok, ate), 6) + F.lit(0.0)).alias("ate"),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
    )


def iv_wald(
    df: DataFrame,
    instrument_col: str,
    treat_col: str,
    outcome_col: str,
) -> DataFrame:
    """Instrumental-variable Wald estimator (Wald 1940; the binary-
    instrument LATE of Imbens & Angrist 1994) — the causal estimate
    when treatment is confounded but an INSTRUMENT moved it (an
    encouragement email, a random eligibility threshold, a rollout
    lottery):

        ITT  = ybar_{z=1} - ybar_{z=0}        (reduced form)
        FS   = tbar_{z=1} - tbar_{z=0}        (first stage)
        LATE = ITT / FS
        SE   = sqrt(v_itt + LATE² v_fs - 2 LATE c_cross) / |FS|

    the delta-method SE with v_itt = s²y1/n1 + s²y0/n0, v_fs the same
    on t, and c_cross = cov(y,t|z=1)/n1 + cov(y,t|z=0)/n0 (sample
    covariances, n-1 denominators). z must be 0/1; t numeric (0/1
    take-up is the classic case). Output: ONE row (n0, n1 BIGINT,
    itt, fs, late, se DOUBLE round 6); late/se NULL when either arm
    is empty, an arm has n < 2, or FS = 0 (no first stage — the
    estimator is undefined, not zero).

    Plan: ONE conditional partial-aggregated pass accumulating per-
    arm (n, Σy, Σy², Σt, Σt², Σyt) — 12 counters — then a 1-row fold.
    """
    zc = F.col(instrument_col).cast("int")
    tc = F.col(treat_col).cast("double")
    yc = F.col(outcome_col).cast("double")
    base = df.filter(
        zc.isNotNull() & tc.isNotNull() & yc.isNotNull()
    ).select(zc.alias("__z"), tc.alias("__t"), yc.alias("__y"))

    def arm(z, expr):
        return F.sum(F.when(F.col("__z") == z, expr).otherwise(0.0))

    aggs = []
    for z in (0, 1):
        aggs += [
            F.sum(F.when(F.col("__z") == z, 1).otherwise(0))
            .cast("long").alias(f"n{z}"),
            arm(z, F.col("__y")).alias(f"__sy{z}"),
            arm(z, F.col("__y") * F.col("__y")).alias(f"__syy{z}"),
            arm(z, F.col("__t")).alias(f"__st{z}"),
            arm(z, F.col("__t") * F.col("__t")).alias(f"__stt{z}"),
            arm(z, F.col("__y") * F.col("__t")).alias(f"__syt{z}"),
        ]
    g = base.agg(*aggs)

    def moments(z):
        n = F.col(f"n{z}").cast("double")
        my = F.col(f"__sy{z}") / n
        mt = F.col(f"__st{z}") / n
        vy = (F.col(f"__syy{z}") - n * my * my) / (n - 1)
        vt = (F.col(f"__stt{z}") - n * mt * mt) / (n - 1)
        cyt = (F.col(f"__syt{z}") - n * my * mt) / (n - 1)
        return n, my, mt, vy, vt, cyt

    n0, my0, mt0, vy0, vt0, c0 = moments(0)
    n1, my1, mt1, vy1, vt1, c1 = moments(1)
    itt = my1 - my0
    fs = mt1 - mt0
    late = itt / fs
    v_itt = vy1 / n1 + vy0 / n0
    v_fs = vt1 / n1 + vt0 / n0
    c_cross = c1 / n1 + c0 / n0
    se = (
        F.sqrt(v_itt + late * late * v_fs - 2 * late * c_cross)
        / F.abs(fs)
    )
    ok = (F.col("n0") >= 2) & (F.col("n1") >= 2)
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, itt), 6) + F.lit(0.0)).alias("itt"),
        (F.round(F.when(ok, fs), 6) + F.lit(0.0)).alias("fs"),
        (
            F.round(F.when(ok & (fs != 0), late), 6) + F.lit(0.0)
        ).alias("late"),
        (
            F.round(F.when(ok & (fs != 0), se), 6) + F.lit(0.0)
        ).alias("se"),
    )


def event_study(
    df: DataFrame,
    treat_col: str,
    period_col: str,
    outcome_col: str,
    base_period: int = -1,
) -> DataFrame:
    """Event-study estimates — `diff_in_diff` unrolled over event time
    (the leads-and-lags plot every modern DiD paper opens with): one
    DiD per relative period k against the reference period (k = -1 by
    convention, the last pre-treatment period),

        effect_k = (ybar_{T,k} - ybar_{T,base})
                 - (ybar_{C,k} - ybar_{C,base})
        se_k     = sqrt(Σ over the four cells s²/n)

    Pre-treatment effect_k ≈ 0 is the parallel-trends diagnostic; the
    post-treatment path is the dynamic treatment effect. treat must be
    0/1; period integer relative event time. Output: one row per
    period present in the data EXCEPT the base (period INT, n_treat,
    n_ctrl BIGINT — cell sizes at that period, effect, se DOUBLE
    round 6); NULL estimates where any of the four cells is empty or a
    variance is undefined (n < 2).

    Plan: ONE (treat, period)-keyed partial agg collapses the corpus
    to per-cell moments; the base-period cells broadcast back onto the
    period rows; per-period closed forms. Cost = one exchange on
    (treat, period)."""
    tc = F.col(treat_col).cast("int")
    pc = F.col(period_col).cast("int")
    yc = F.col(outcome_col).cast("double")
    base = df.filter(
        tc.isNotNull() & pc.isNotNull() & yc.isNotNull()
    ).select(tc.alias("__t"), pc.alias("__p"), yc.alias("__y"))
    cells = base.groupBy("__t", "__p").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.avg("__y").alias("__m"),
        F.sum(F.col("__y") * F.col("__y")).alias("__q"),
    )
    # unbiased cell variance from the power sums
    vcell = (
        (F.col("__q") - F.col("__n") * F.col("__m") * F.col("__m"))
        / (F.col("__n") - 1)
    )
    cells = cells.withColumn(
        "__v", F.when(F.col("__n") >= 2, vcell)
    )
    b = cells.filter(F.col("__p") == base_period).select(
        "__t",
        F.col("__n").alias("__nb"),
        F.col("__m").alias("__mb"),
        F.col("__v").alias("__vb"),
    )
    j = (
        cells.filter(F.col("__p") != base_period)
        .join(F.broadcast(b), "__t")
    )
    piv = j.groupBy("__p").agg(
        F.max(F.when(F.col("__t") == 1, F.col("__n"))).alias("n_treat"),
        F.max(F.when(F.col("__t") == 0, F.col("__n"))).alias("n_ctrl"),
        F.max(F.when(F.col("__t") == 1, F.col("__m"))).alias("__m1"),
        F.max(F.when(F.col("__t") == 0, F.col("__m"))).alias("__m0"),
        F.max(F.when(F.col("__t") == 1, F.col("__v"))).alias("__v1"),
        F.max(F.when(F.col("__t") == 0, F.col("__v"))).alias("__v0"),
        F.max(F.when(F.col("__t") == 1, F.col("__mb"))).alias("__mb1"),
        F.max(F.when(F.col("__t") == 0, F.col("__mb"))).alias("__mb0"),
        F.max(F.when(F.col("__t") == 1, F.col("__vb"))).alias("__vb1"),
        F.max(F.when(F.col("__t") == 0, F.col("__vb"))).alias("__vb0"),
        F.max(F.when(F.col("__t") == 1, F.col("__nb"))).alias("__nb1"),
        F.max(F.when(F.col("__t") == 0, F.col("__nb"))).alias("__nb0"),
    )
    effect = (F.col("__m1") - F.col("__mb1")) - (
        F.col("__m0") - F.col("__mb0")
    )
    se = F.sqrt(
        F.col("__v1") / F.col("n_treat")
        + F.col("__vb1") / F.col("__nb1")
        + F.col("__v0") / F.col("n_ctrl")
        + F.col("__vb0") / F.col("__nb0")
    )
    ok = (
        F.col("n_treat").isNotNull()
        & F.col("n_ctrl").isNotNull()
        & F.col("__nb1").isNotNull()
        & F.col("__nb0").isNotNull()
    )
    return piv.select(
        F.col("__p").cast("int").alias("period"),
        F.coalesce(F.col("n_treat"), F.lit(0)).cast("long").alias(
            "n_treat"
        ),
        F.coalesce(F.col("n_ctrl"), F.lit(0)).cast("long").alias(
            "n_ctrl"
        ),
        (F.round(F.when(ok, effect), 6) + F.lit(0.0)).alias("effect"),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
    )


def rdd_sharp(
    df: DataFrame,
    running_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
) -> DataFrame:
    """Sharp regression-discontinuity estimate (Thistlethwaite &
    Campbell 1960; the local-linear form of Imbens & Lemieux 2008,
    rectangular kernel) — the causal effect at an eligibility
    threshold: fit y = a + b(x − c) by OLS separately on each side of
    the cutoff within the bandwidth window and difference the
    intercepts,

        tau = a_right − a_left,
        Var(a_side) = s² (1/n + xbar²/Sxx)      (homoskedastic OLS)
        SE = sqrt(Var_left + Var_right)

    with the LEFT window [c−h, c) and the RIGHT [c, c+h] (the cutoff
    row treats, the sharp-design convention). Output: ONE row (n_left,
    n_right BIGINT, tau, se, slope_left, slope_right DOUBLE round 6);
    NULL estimates when either side has n < 3 (two OLS params + 1 df)
    or zero running-variable variance.

    Plan: ONE conditional partial-aggregated pass over the bandwidth
    window accumulating per-side (n, Σx, Σx², Σy, Σy², Σxy) on the
    centered running variable — 12 counters — then 1-row closed
    forms. The window filter pushes to the scan."""
    if bandwidth <= 0:
        raise ValueError(f"bandwidth must be > 0, got {bandwidth}")
    c = float(cutoff)
    h = float(bandwidth)
    xc = F.col(running_col).cast("double")
    yc = F.col(outcome_col).cast("double")
    base = (
        df.filter(
            xc.isNotNull()
            & yc.isNotNull()
            & (xc >= c - h)
            & (xc <= c + h)
        )
        .select(
            (xc - F.lit(c)).alias("__x"),
            yc.alias("__y"),
            F.when(xc >= c, 1).otherwise(0).alias("__s"),
        )
    )

    def side(s, expr):
        return F.sum(F.when(F.col("__s") == s, expr).otherwise(0.0))

    aggs = []
    for s, nm in ((0, "l"), (1, "r")):
        aggs += [
            F.sum(F.when(F.col("__s") == s, 1).otherwise(0))
            .cast("long").alias(f"__n{nm}"),
            side(s, F.col("__x")).alias(f"__sx{nm}"),
            side(s, F.col("__x") * F.col("__x")).alias(f"__sxx{nm}"),
            side(s, F.col("__y")).alias(f"__sy{nm}"),
            side(s, F.col("__y") * F.col("__y")).alias(f"__syy{nm}"),
            side(s, F.col("__x") * F.col("__y")).alias(f"__sxy{nm}"),
        ]
    g = base.agg(*aggs)

    def ols(nm):
        n = F.col(f"__n{nm}").cast("double")
        mx = F.col(f"__sx{nm}") / n
        my = F.col(f"__sy{nm}") / n
        sxx = F.col(f"__sxx{nm}") - n * mx * mx
        sxy = F.col(f"__sxy{nm}") - n * mx * my
        syy = F.col(f"__syy{nm}") - n * my * my
        b = sxy / sxx
        a = my - b * mx
        rss = syy - b * sxy
        s2 = rss / (n - 2)
        var_a = s2 * (1 / n + mx * mx / sxx)
        return n, a, b, var_a, sxx

    nl, al, bl, val, sxxl = ols("l")
    nr, ar, br, var, sxxr = ols("r")
    tau = ar - al
    se = F.sqrt(val + var)
    ok = (
        (F.col("__nl") >= 3) & (F.col("__nr") >= 3)
        & (sxxl > 0) & (sxxr > 0)
    )
    return g.select(
        F.col("__nl").alias("n_left"),
        F.col("__nr").alias("n_right"),
        (F.round(F.when(ok, tau), 6) + F.lit(0.0)).alias("tau"),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
        (F.round(F.when(ok, bl), 6) + F.lit(0.0)).alias("slope_left"),
        (F.round(F.when(ok, br), 6) + F.lit(0.0)).alias("slope_right"),
    )


def cox_ph_binary(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    iters: int = 5,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Cox proportional-hazards regression with ONE binary covariate
    (Cox 1972; Breslow tie handling; fixed-round Newton) — THE
    survival-analysis effect estimate: the log hazard ratio beta of
    group 1 vs group 0, with the partial-likelihood closed forms a
    binary covariate admits,

        p_j(b)  = R1_j e^b / (R0_j + R1_j e^b)  (risk-set mean of x)
        U(b)    = Σ_j (s_j − d_j p_j)           (score)
        I(b)    = Σ_j d_j p_j (1 − p_j)         (information)
        b ← b + U/I                              (`iters` Newton steps
                                                  from b = 0)

    over the distinct EVENT times j with d_j events (s_j of them in
    group 1) and at-risk counts R0_j/R1_j (subjects with time >= t_j).
    Fixed iteration count — the m_logit / pagerank showpiece
    convention: the whole optimization replays as unrolled SQL, and
    five Newton steps are far past convergence for one parameter
    (quadratic convergence; the replica test pins |U(b_5)| ~ 0).

    Output: ONE row (n, n_events BIGINT, beta, se, hr, z DOUBLE round
    6) with se = 1/sqrt(I(b_final)), hr = e^beta, z = beta/se; NULL
    estimates when there are no events or no group variation in any
    risk set (I = 0 — the MLE is unbounded or undefined).

    Plan: ONE (time)-keyed partial agg collapses the cohort to
    distinct-time cells (tripwire-enforced), ONE suffix-cumulative
    window prices every risk set, then each Newton round is a 1-row
    aggregate over the cells crossJoined with the previous round's
    1-row beta — cells never leave the executors, and nothing scales
    with the cohort after the first agg."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    tc = F.col(time_col).cast("double")
    ec = F.col(event_col).cast("int")
    gc = F.col(group_col).cast("int")
    base = df.filter(
        tc.isNotNull() & ec.isNotNull() & gc.isNotNull()
    ).select(tc.alias("__t"), ec.alias("__e"), gc.alias("__g"))
    _assert_cell_bound(
        base, ["__t"], "cox_ph_binary", max_cells,
        plan_word="distinct-time risk-set ladder",
    )
    cells = base.groupBy("__t").agg(
        F.sum("__e").cast("double").alias("__d"),
        F.sum(F.col("__e") * F.col("__g")).cast("double").alias("__s"),
        F.sum(F.when(F.col("__g") == 0, 1).otherwise(0))
        .cast("double").alias("__c0"),
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0))
        .cast("double").alias("__c1"),
    )
    w_sfx = Window.orderBy(F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    lad = cells.select(
        "__d",
        "__s",
        F.sum("__c0").over(w_sfx).alias("__r0"),
        F.sum("__c1").over(w_sfx).alias("__r1"),
    ).filter(F.col("__d") > 0)
    lad = lad.localCheckpoint(eager=True)  # 5 rounds re-read it
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__e").cast("long").alias("n_events"),
    )
    spark = df.sparkSession
    beta = spark.createDataFrame([(0.0,)], "__b double")
    for _ in range(iters):
        eb = F.exp(F.col("__b"))
        p = F.col("__r1") * eb / (F.col("__r0") + F.col("__r1") * eb)
        stats = lad.crossJoin(F.broadcast(beta)).agg(
            F.max("__b").alias("__b"),
            F.sum(F.col("__s") - F.col("__d") * p).alias("__u"),
            F.sum(
                F.col("__d") * p * (F.lit(1.0) - p)
            ).alias("__i"),
        )
        beta = stats.select(
            F.when(
                F.col("__i") > 0,
                F.col("__b") + F.col("__u") / F.col("__i"),
            ).otherwise(F.col("__b")).alias("__b")
        )
    eb = F.exp(F.col("__b"))
    p = F.col("__r1") * eb / (F.col("__r0") + F.col("__r1") * eb)
    fin = lad.crossJoin(F.broadcast(beta)).agg(
        F.max("__b").alias("__b"),
        F.sum(F.col("__d") * p * (F.lit(1.0) - p)).alias("__i"),
        F.count(F.lit(1)).cast("long").alias("__cells"),
    )
    out = fin.crossJoin(F.broadcast(tot))
    ok = (F.col("n_events") > 0) & (F.col("__i") > 0)
    se = F.lit(1.0) / F.sqrt(F.col("__i"))
    return out.select(
        "n",
        "n_events",
        (F.round(F.when(ok, F.col("__b")), 6) + F.lit(0.0)).alias(
            "beta"
        ),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
        (
            F.round(F.when(ok, F.exp(F.col("__b"))), 6) + F.lit(0.0)
        ).alias("hr"),
        (
            F.round(F.when(ok, F.col("__b") / se), 6) + F.lit(0.0)
        ).alias("z"),
    )


def cox_ph(
    df: DataFrame,
    time_col: str,
    event_col: str,
    covariate_cols: Sequence[str],
    iters: int = 5,
    max_cells: int | None = 1_000_000,
    strata_col: str | None = None,
) -> DataFrame:
    """Cox proportional-hazards regression with p covariates (Cox
    1972; Breslow ties; fixed-round Newton-Raphson) — the
    multi-covariate upgrade of `cox_ph_binary` (round-11 verdict ask
    #3). Real survival analyses ADJUST: the hazard-ratio for the
    treatment indicator is only interpretable with the confounders in
    the linear predictor, which a single-binary fit cannot do.

    Per distinct event time t_j, the Breslow partial likelihood needs
    three risk-set sufficient statistics under the current beta,

        S0_j = sum_{k: t_k >= t_j} e^{x_k . beta}
        S1_j = sum x_k e^{x_k . beta}            (p-vector)
        S2_j = sum x_k x_k^T e^{x_k . beta}      (p x p, upper tri)

    from which the score and information fold as

        U   = sum_j (sum_{events at j} x) - d_j S1_j/S0_j
        I   = sum_j d_j (S2_j/S0_j - (S1_j/S0_j)(S1_j/S0_j)^T)
        beta <- beta + I^{-1} U        (`iters` fixed Newton steps)

    Plan: ONE (time, x1..xp)-keyed partial agg collapses the cohort to
    distinct-covariate-pattern cells (tripwire-enforced via
    `max_cells`), checkpointed once. Because the weights e^{x.beta}
    change every round, each Newton step re-prices the ladder: one
    suffix-cumulative RANGE window over the cells (1 + p + p(p+1)/2
    running sums; RANGE not ROWS so tied times share one risk set)
    followed by ONE 1-row aggregate. The p-vector/pxp-matrix Newton
    system is collected and solved DRIVER-SIDE each round — a
    model-sized collect (p + p(p+1)/2 doubles, p <= ~10 by contract),
    the bound the verdict's design sketch names explicitly. p = 2
    solves via the fixed-op-order Cramer closed form so the catalog
    oracle (`m_cox_multi`, unrolled SQL) replays the identical
    arithmetic; p >= 3 uses NATURAL-ORDER (pivot-free) Gaussian
    elimination (pure Python, p^3 on p<=10 — nanoseconds), valid
    because the information matrix is SPD wherever the step is taken
    (positive natural pivots ⟺ positive leading minors, Sylvester)
    and chosen over partial pivoting precisely so the op order is
    data-independent and an unrolled SQL oracle replays it
    (`m_cox_multi3` at p=3).

    Output: ONE ROW PER COVARIATE (covariate STRING, n, n_events
    BIGINT, beta, se, hr, z DOUBLE round 6) with se_i =
    sqrt((I^{-1})_ii) at the final beta; NULL estimates when there
    are no events or the information matrix is singular /
    non-positive at any round (unbounded or undefined MLE — the
    cox_ph_binary guard, generalized to det-and-leading-minor
    checks).

    Scale shape: nothing after the first agg scales with the cohort —
    the per-round window runs over <= max_cells ladder rows (the
    single-task-sort watch item shared with the ECDF ladders; the
    tripwire raise names the re-route) and every fold is 1 row.

    `strata_col` fits the STRATIFIED model (Cox 1972 §7; the standard
    cure for a covariate that violates proportional hazards: give each
    stratum its own unconstrained baseline hazard, share beta): risk
    sets form WITHIN each stratum — the ladder window gains a
    PARTITION BY stratum (which also parallelizes the single-task-sort
    watch item) and cells key on (stratum, time, covariates) — while
    the score/information folds still sum across strata, so the Newton
    arithmetic is otherwise unchanged and stratum never shuffles
    anything data-sized."""
    p = len(covariate_cols)
    if p < 1:
        raise ValueError("need at least one covariate")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    tc = F.col(time_col).cast("double")
    ec = F.col(event_col).cast("int")
    xs = [F.col(c).cast("double") for c in covariate_cols]
    keep = tc.isNotNull() & ec.isNotNull()
    for x in xs:
        keep = keep & x.isNotNull()
    snames: list[str] = []
    scols = []
    if strata_col is not None:
        keep = keep & F.col(strata_col).isNotNull()
        snames = ["__s"]
        scols = [F.col(strata_col).alias("__s")]
    xnames = [f"__x{i}" for i in range(p)]
    base = df.filter(keep).select(
        tc.alias("__t"), ec.alias("__e"),
        *scols,
        *[x.alias(nm) for x, nm in zip(xs, xnames)],
    )
    _assert_cell_bound(
        base, [*snames, "__t", *xnames], "cox_ph", max_cells,
        plan_word="distinct (time, covariates) risk-set ladder",
    )
    cells = base.groupBy(*snames, "__t", *xnames).agg(
        F.count(F.lit(1)).cast("double").alias("__cnt"),
        F.sum("__e").cast("double").alias("__d"),
    )
    cells = cells.localCheckpoint(eager=True)  # every round re-reads it
    n, n_events = base.agg(
        F.count(F.lit(1)).cast("long"),
        F.sum("__e").cast("long"),
    ).first()
    n_events = int(n_events or 0)

    # upper-triangle index pairs for S2 / I
    pairs = [(i, j) for i in range(p) for j in range(i, p)]
    w_base = (
        Window.partitionBy(*snames) if snames else Window
    )
    w_sfx = w_base.orderBy(F.col("__t").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def _newton_stats(beta: list[float]) -> tuple:
        """One ladder + 1-row fold under beta (literals); returns
        (U p-list, I upper-tri dict) as driver floats."""
        xb = F.lit(0.0)
        for bi, nm in zip(beta, xnames):
            xb = xb + F.lit(bi) * F.col(nm)
        w = F.col("__cnt") * F.exp(xb)
        lad = cells.select(
            "__t", "__d", *xnames,
            F.sum(w).over(w_sfx).alias("__s0"),
            *[
                F.sum(w * F.col(nm)).over(w_sfx).alias(f"__s1_{i}")
                for i, nm in enumerate(xnames)
            ],
            *[
                F.sum(w * F.col(xnames[i]) * F.col(xnames[j]))
                .over(w_sfx).alias(f"__s2_{i}_{j}")
                for i, j in pairs
            ],
        ).filter(F.col("__d") > 0)
        aggs = []
        for i, nm in enumerate(xnames):
            aggs.append(
                F.sum(
                    F.col("__d") * F.col(nm)
                    - F.col("__d") * F.col(f"__s1_{i}") / F.col("__s0")
                ).alias(f"u{i}")
            )
        for i, j in pairs:
            aggs.append(
                F.sum(
                    F.col("__d")
                    * (
                        F.col(f"__s2_{i}_{j}") / F.col("__s0")
                        - (F.col(f"__s1_{i}") / F.col("__s0"))
                        * (F.col(f"__s1_{j}") / F.col("__s0"))
                    )
                ).alias(f"i{i}_{j}")
            )
        row = lad.agg(*aggs).first()
        u = [row[f"u{i}"] for i in range(p)]
        imat = {(i, j): row[f"i{i}_{j}"] for i, j in pairs}
        return u, imat

    def _solve(imat: dict, rhs: list[float]) -> list[float] | None:
        """Solve I x = rhs; None when singular / non-positive. p = 2
        uses the exact Cramer op-order the SQL oracle replays."""
        vals = list(imat.values()) + list(rhs)
        if any(v is None or v != v for v in vals):
            return None
        if p == 1:
            ii = imat[(0, 0)]
            return [rhs[0] / ii] if ii > 0 else None
        if p == 2:
            i11, i12, i22 = imat[(0, 0)], imat[(0, 1)], imat[(1, 1)]
            det = i11 * i22 - i12 * i12
            if not (det > 0 and i11 > 0):
                return None
            return [
                (rhs[0] * i22 - rhs[1] * i12) / det,
                (rhs[1] * i11 - rhs[0] * i12) / det,
            ]
        # general p: NATURAL-ORDER (pivot-free) Gaussian elimination on
        # the symmetric system (p <= ~10 by the docstring contract).
        # No row swaps: the information matrix is symmetric
        # POSITIVE-DEFINITE at a valid MLE step, where natural-order
        # pivots are exactly the leading-principal-minor ratios
        # (Sylvester) — all positive, so the positivity check below IS
        # the p=2 path's (det > 0 AND i11 > 0) guard generalized, and
        # the op order is FIXED so an unrolled SQL oracle replays the
        # solve term-for-term (m_cox_multi3; round-12 verdict task 5 —
        # partial pivoting's data-dependent row swaps were the one
        # driver-side branch SQL could not replay).
        a = [
            [imat[(min(i, j), max(i, j))] for j in range(p)] + [rhs[i]]
            for i in range(p)
        ]
        for col in range(p):
            if not (a[col][col] > 0):
                return None
            for r in range(col + 1, p):
                f = a[r][col] / a[col][col]
                for c in range(col, p + 1):
                    a[r][c] -= f * a[col][c]
        x = [0.0] * p
        for r in range(p - 1, -1, -1):
            s = a[r][p] - sum(a[r][c] * x[c] for c in range(r + 1, p))
            x[r] = s / a[r][r]
        return x

    beta = [0.0] * p
    ok = n_events > 0
    if ok:
        for _ in range(iters):
            u, imat = _newton_stats(beta)
            step = _solve(imat, u)
            if step is None:
                continue  # keep beta — the binary-cox `otherwise` guard
            beta = [b + s for b, s in zip(beta, step)]
        # final information at beta for the covariance: (I^{-1})_ii
        _, imat = _newton_stats(beta)
        if p == 2:
            vals = list(imat.values())
            if any(v is None or v != v for v in vals):
                ok = False
            else:
                i11, i12, i22 = (
                    imat[(0, 0)], imat[(0, 1)], imat[(1, 1)]
                )
                det = i11 * i22 - i12 * i12
                ok = det > 0 and i11 > 0
                var_diag = (
                    [i22 / det, i11 / det] if ok else [None, None]
                )
        else:
            var_diag = []
            ok_inv = True
            for i in range(p):
                e_i = [1.0 if j == i else 0.0 for j in range(p)]
                col_i = _solve(imat, e_i)
                if col_i is None or not (col_i[i] > 0):
                    ok_inv = False
                    break
                var_diag.append(col_i[i])
            ok = ok and ok_inv
            if not ok:
                var_diag = [None] * p

    spark = df.sparkSession
    rows = [
        (
            str(covariate_cols[i]),
            float(beta[i]) if ok else None,
            float(var_diag[i]) if ok else None,
        )
        for i in range(p)
    ]
    est = spark.createDataFrame(
        rows, "covariate string, __b double, __v double"
    )
    # rounding + hr/z arithmetic happen IN SPARK from the exact double
    # literals so the engine's round semantics match every other entry
    okc = F.col("__b").isNotNull() & F.col("__v").isNotNull()
    se = F.sqrt(F.col("__v"))
    return est.select(
        "covariate",
        F.lit(int(n)).cast("long").alias("n"),
        F.lit(n_events).cast("long").alias("n_events"),
        (F.round(F.when(okc, F.col("__b")), 6) + F.lit(0.0)).alias(
            "beta"
        ),
        (F.round(F.when(okc, se), 6) + F.lit(0.0)).alias("se"),
        (
            F.round(F.when(okc, F.exp(F.col("__b"))), 6) + F.lit(0.0)
        ).alias("hr"),
        (
            F.round(F.when(okc, F.col("__b") / se), 6) + F.lit(0.0)
        ).alias("z"),
    )


def ipw_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    x_cols: Sequence[str],
    iters: int = 2,
    clip: tuple[float, float] = (0.01, 0.99),
) -> DataFrame:
    """Inverse-propensity-weighted ATE (Horvitz-Thompson 1952 →
    Rosenbaum & Rubin 1983), Hájek-stabilized — the observational
    companion to `stratified_ate` when the confounders are continuous:

        e(x)  = σ(xβ̂) clipped into `clip`   (overlap guard)
        ATE   = Σ t y / e  ⁄  Σ t / e
              − Σ (1−t) y / (1−e)  ⁄  Σ (1−t) / (1−e)

    The propensity model is `relational.logistic_fit`'s fixed-`iters`
    IRLS (its ROUNDED 6dp betas — deliberately: rounding makes the
    model a replayable constant, the m_logit oracle convention), so
    the whole estimator is: the IRLS passes + one 1-row weighted fold
    with β as literals. Complete-case rows only; treatment must be
    0/1 (the logistic_fit validation); a one-armed cohort yields NULL
    ATE.

    Output (1 row): n BIGINT, p_treated DOUBLE round 4, ate DOUBLE
    round 6."""
    from pandasvcf_spark.operators.relational import logistic_fit

    lo, hi = clip
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"clip must satisfy 0 < lo < hi < 1, got {clip}")
    t = F.col(treat_col).cast("double")
    y = F.col(outcome_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = t.isNotNull() & y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    fit = {
        r["term"]: r["beta"]
        for r in logistic_fit(nn, treat_col, list(x_cols),
                              iters=iters).collect()
    }
    eta = sum(
        (F.lit(float(fit[c])) * x for c, x in zip(x_cols, xs)),
        F.lit(float(fit["(intercept)"])),
    )
    e = 1.0 / (1.0 + F.exp(-eta))
    e = F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), e))
    g = nn.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(t).alias("__pt"),
        F.sum(t * y / e).alias("__sy1"),
        F.sum(t / e).alias("__sw1"),
        F.sum((1.0 - t) * y / (1.0 - e)).alias("__sy0"),
        F.sum((1.0 - t) / (1.0 - e)).alias("__sw0"),
    )
    ok = (F.col("__sw1") > 0) & (F.col("__sw0") > 0)
    ate = (
        F.col("__sy1") / F.col("__sw1")
        - F.col("__sy0") / F.col("__sw0")
    )
    return g.select(
        "n",
        (F.round(F.col("__pt"), 4) + F.lit(0.0)).alias("p_treated"),
        (F.round(F.when(ok, ate), 6) + F.lit(0.0)).alias("ate"),
    )


def dml_ate(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    x_cols: Sequence[str],
) -> DataFrame:
    """Double/debiased ML, partialling-out form (Chernozhukov et al.
    2018, the linear instantiation = Frisch-Waugh-Lovell) — the third
    member of the observational-causal trio (m_stratified_ate:
    discrete cells; ipw_ate: propensity weights; this: residual-on-
    residual):

        e_y = y − X β̂_y,   e_t = t − X β̂_t      (OLS nuisance fits)
        θ̂  = Σ e_t e_y / Σ e_t²
        SE  = sqrt(Σ e_t² (e_y − θ̂ e_t)²) / Σ e_t²   (HC0 sandwich on
                                                  the residualized
                                                  moment — the proper
                                                  heteroscedasticity-
                                                  robust form, round-12
                                                  ADVICE; expanded into
                                                  three extra sums so
                                                  one pass still
                                                  suffices)

    Everything is closed form: TWO normal-equation passes share one
    X'X (a single agg — both fits differ only in the right-hand
    side), the betas inject as literals, and the residual products
    fold in ONE more pass. Complete-case rows only; singular X'X or
    zero treatment-residual variance raises/NULLs.

    Output (1 row): n BIGINT, theta DOUBLE round 6, se DOUBLE round
    6. Plan: two partial-aggregated scans + model-sized driver
    solves — the breusch_pagan shape with two RHS."""
    import numpy as np

    t = F.col(treat_col).cast("double")
    y = F.col(outcome_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = t.isNotNull() & y.isNotNull()
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
        aggs.append(F.sum(terms[i] * t).alias(f"__xt_{i}"))
    row = nn.agg(*aggs).collect()[0]
    n = row["__n"]
    if n < d + 2:
        raise ValueError(f"dml_ate needs > {d + 1} complete rows, got {n}")
    XX = np.zeros((d, d))
    Xy = np.zeros(d)
    Xt = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
        Xy[i] = row[f"__xy_{i}"]
        Xt[i] = row[f"__xt_{i}"]
    if abs(np.linalg.det(XX)) < 1e-10 * max(1.0, abs(XX).max()) ** d:
        raise ValueError("singular design matrix (collinear features)")
    by = np.linalg.solve(XX, Xy)
    bt = np.linalg.solve(XX, Xt)

    def _resid(target, beta):
        eta = sum(
            (F.lit(float(beta[i])) * terms[i] for i in range(1, d)),
            F.lit(float(beta[0])),
        )
        return target - eta

    ey = _resid(y, by)
    et = _resid(t, bt)
    g = nn.agg(
        F.sum(et * ey).alias("__sty"),
        F.sum(et * et).alias("__stt"),
        F.sum(et * et * ey * ey).alias("__s22"),
        F.sum(et * et * et * ey).alias("__s31"),
        F.sum(et * et * et * et).alias("__s40"),
    )
    theta = F.col("__sty") / F.col("__stt")
    # HC0 sandwich on the residualized moment ψ = e_t (e_y − θ e_t):
    # Var(θ̂) = Σ e_t² (e_y − θ e_t)² / (Σ e_t²)², with the square
    # expanded (e_t²e_y² − 2θ e_t³e_y + θ² e_t⁴) so ONE pass still
    # suffices (round-12 ADVICE: the previous Σ e_t² e_y² form
    # silently dropped the cross terms and was only conservative).
    # greatest(..., 0) guards the float-cancellation corner where the
    # expansion lands a hair below zero.
    hc0 = F.greatest(
        F.col("__s22")
        - 2.0 * theta * F.col("__s31")
        + theta * theta * F.col("__s40"),
        F.lit(0.0),
    )
    se = F.sqrt(hc0) / F.col("__stt")
    ok = F.col("__stt") > 0
    return g.select(
        F.lit(int(n)).cast("long").alias("n"),
        (F.round(F.when(ok, theta), 6) + F.lit(0.0)).alias("theta"),
        (F.round(F.when(ok, se), 6) + F.lit(0.0)).alias("se"),
    )
