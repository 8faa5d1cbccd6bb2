"""Rank-based tests and the Acklam normal-scores device.

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


def mann_whitney_u(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Per-group Mann-Whitney U (Wilcoxon rank-sum) two-sample test of
    `value_col` between flag=1 and flag=0 rows — the nonparametric
    A/B-test partner of `ab_test_proportions`: does treatment shift
    the value distribution, without assuming normality?

        U1 = R1 - n1(n1+1)/2          (R1 = tie-averaged rank sum of flag=1)
        mu = n1*n2/2
        sigma^2 = (n1*n2/12) * ((n+1) - sum(t^3-t) / (n(n-1)))
        z = (U1 - mu) / sigma          (no continuity correction)

    where t ranges over the tie-group sizes. z is NULL when either
    sample is empty or all values are tied (sigma = 0). Rows with NULL
    value or flag drop. flag must be 0/1 (cast to int).

    Output: (*group_cols, n1 BIGINT, n2 BIGINT, u DOUBLE round 4,
    z DOUBLE round 6).

    Plan: one exchange on the group keys serves the rank window and the
    tie window; the tie-correction term comes from a (group, value)
    partial-aggregated count — no joins, no driver state.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    vc = F.col(value_col).cast("double")
    fc = F.col(flag_col).cast("int")
    base = df.filter(vc.isNotNull() & fc.isNotNull()).select(
        *gcols, vc.alias("__v"), fc.alias("__f")
    )
    w_rank = Window.partitionBy(*gcols).orderBy("__v")
    w_tie = Window.partitionBy(*gcols, "__v")
    ranked = base.select(
        *gcols,
        "__f",
        "__v",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    # tie-group sizes: one (group, value)-keyed agg (map-side combinable)
    ties = (
        base.groupBy(*gcols, "__v")
        .agg(F.count(F.lit(1)).cast("double").alias("__t"))
        .groupBy(*gcols)
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            ).alias("__tsum")
        )
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__f").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("__f")).cast("long").alias("n2"),
        F.sum(F.when(F.col("__f") == 1, F.col("__r"))).alias("__r1"),
    )
    j = agg.join(ties, gcols, "inner")
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    u1 = F.col("__r1") - n1d * (n1d + F.lit(1.0)) / F.lit(2.0)
    mu = n1d * n2d / F.lit(2.0)
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("__tsum") / (nd * (nd - F.lit(1.0)))
        )
    )
    return j.select(
        *gcols,
        "n1",
        "n2",
        (
            F.round(F.when((F.col("n1") > 0) & (F.col("n2") > 0), u1), 4)
            + F.lit(0.0)
        ).alias("u"),
        (
            F.round(
                F.when(
                    (F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0),
                    (u1 - mu) / F.sqrt(var),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def spearman_corr(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation of two columns — Pearson
    correlation over tie-averaged ranks, the monotone-association
    measure robust to outliers and nonlinearity (the screening
    statistic for feature/quality-signal monotonicity at corpus
    scale).

        rho = (n*Sab - Sa*Sb)
              / sqrt((n*Saa - Sa^2) * (n*Sbb - Sb^2))

    over rank pairs (a, b); NULL when either rank variance is 0.
    Rows with NULL x or y drop.

    Output: (*group_cols, n BIGINT, rho DOUBLE round 6).

    Plan: one exchange on the group keys serves all four windows (two
    rank sorts + two tie partitions within the same partitioning) and
    the final groupBy; rho is a pure moment expression over ranks.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        *gcols, xc.alias("__x"), yc.alias("__y")
    )
    wx = Window.partitionBy(*gcols).orderBy("__x")
    wxt = Window.partitionBy(*gcols, "__x")
    wy = Window.partitionBy(*gcols).orderBy("__y")
    wyt = Window.partitionBy(*gcols, "__y")
    ranked = base.select(
        *gcols,
        (
            F.rank().over(wx).cast("double")
            + (F.count(F.lit(1)).over(wxt) - F.lit(1)) / F.lit(2.0)
        ).alias("__a"),
        (
            F.rank().over(wy).cast("double")
            + (F.count(F.lit(1)).over(wyt) - F.lit(1)) / F.lit(2.0)
        ).alias("__b"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__a").alias("__sa"),
        F.sum("__b").alias("__sb"),
        F.sum(F.col("__a") * F.col("__a")).alias("__saa"),
        F.sum(F.col("__b") * F.col("__b")).alias("__sbb"),
        F.sum(F.col("__a") * F.col("__b")).alias("__sab"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("__saa") - F.col("__sa") * F.col("__sa")
    vy = nd * F.col("__sbb") - F.col("__sb") * F.col("__sb")
    num = nd * F.col("__sab") - F.col("__sa") * F.col("__sb")
    return agg.select(
        *gcols,
        "n",
        (
            F.round(
                F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy)), 6
            )
            + F.lit(0.0)
        ).alias("rho"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_cols: Sequence[str],
    treat_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis 1952) — the K-group
    generalization of `mann_whitney_u`: do K treatment groups share a
    value distribution, without assuming normality? Tie-averaged
    mid-ranks, with the standard tie correction:

        H = 12/(N(N+1)) * sum_k R_k^2/n_k - 3(N+1)
        C = 1 - sum(t^3 - t)/(N^3 - N)        (t = tie-group sizes)
        h = H / C

    NULL value/treat rows drop. Output: (*group_cols, n BIGINT,
    k BIGINT, h DOUBLE round 6); h NULL when N < 2, k < 2 or every
    value ties (C = 0).

    Plan: the corpus collapses FIRST to (value, treat) count cells,
    mid-ranks come from a cumulative window over the DISTINCT-VALUE
    cells only (the classifier_report / roc_points device — never a
    rank window over raw rows), and the statistic is two cell-keyed
    aggs + one join of vocabulary-sized relations.
    """
    gcols = list(group_cols)
    vc = F.col(value_col).cast("double")
    base = df.filter(
        vc.isNotNull() & F.col(treat_col).isNotNull()
    ).select(*gcols, vc.alias("__v"), F.col(treat_col).alias("__k"))
    _assert_cell_bound(
        base,
        [*gcols, "__v"],
        "kruskal_wallis",
        max_cells,
        plan_word="distinct-value cell-ladder window",
    )
    tcells = base.groupBy(*gcols, "__v", "__k").agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    vcells = tcells.groupBy(*gcols, "__v").agg(
        F.sum("__n").alias("__t")
    )
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mid = vcells.select(
        *gcols,
        "__v",
        "__t",
        (
            F.coalesce(F.sum("__t").over(w_prev), F.lit(0.0))
            + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("__mr"),
    )
    per_treat = (
        tcells.join(mid, gcols + ["__v"])
        .groupBy(*gcols, "__k")
        .agg(
            F.sum(F.col("__n") * F.col("__mr")).alias("__R"),
            F.sum("__n").alias("__nk"),
        )
    )
    tot = vcells.groupBy(*gcols).agg(
        F.sum("__t").alias("__N"),
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).alias("__tsum"),
    )
    stat = per_treat.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.col("__R") * F.col("__R") / F.col("__nk")
        ).alias("__s"),
    )
    j = (
        stat.join(tot, gcols)
        if gcols
        else stat.join(F.broadcast(tot))
    )
    nd = F.col("__N")
    h_raw = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("__s")
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("__tsum") / (nd * nd * nd - nd)
    ok = (nd >= 2) & (F.col("k") >= 2) & (corr > 0)
    return j.select(
        *gcols,
        nd.cast("long").alias("n"),
        "k",
        (F.round(F.when(ok, h_raw / corr), 6) + F.lit(0.0)).alias("h"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED
    nonparametric test `mann_whitney_u` (independent samples) cannot
    answer: did the paired difference x - y shift from zero? Zero
    differences drop (the standard Wilcoxon convention); |d| gets
    tie-averaged mid-ranks; the normal approximation carries the tie
    correction:

        W+   = sum of ranks where d > 0
        mu   = n(n+1)/4
        var  = n(n+1)(2n+1)/24 - sum(t^3 - t)/48
        z    = (W+ - mu)/sqrt(var)

    INTENDED FOR EXACT-INTEGER PAIRS (counts, cents — the e_rfm
    lesson: a rounded float aggregate is not a safe pin for the
    discrete tie structure ranks depend on). Output: (*group_cols,
    n BIGINT, w_plus DOUBLE round 4, z DOUBLE round 6); NULL
    statistics when n = 0 or var = 0.

    Plan: collapses to |d| count cells first; the mid-rank ladder is
    a cumulative window over the distinct-|d| cells only (the
    kruskal_wallis device) — no raw-row windows.
    """
    gcols = list(group_cols)
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = (
        df.filter(xc.isNotNull() & yc.isNotNull())
        .select(*gcols, (xc - yc).alias("__d"))
        .filter(F.col("__d") != 0)
        .select(
            *gcols,
            F.abs(F.col("__d")).alias("__a"),
            (F.col("__d") > 0).cast("double").alias("__p"),
        )
    )
    acells = base.groupBy(*gcols, "__a").agg(
        F.count(F.lit(1)).cast("double").alias("__t"),
        F.sum("__p").alias("__tp"),
    )
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy("__a")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mid = acells.select(
        *gcols,
        "__t",
        "__tp",
        (
            F.coalesce(F.sum("__t").over(w_prev), F.lit(0.0))
            + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("__mr"),
    )
    g = mid.groupBy(*gcols).agg(
        F.sum("__t").alias("__n"),
        F.sum(F.col("__tp") * F.col("__mr")).alias("__wp"),
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).alias("__tsum"),
    )
    nd = F.col("__n")
    mu = nd * (nd + F.lit(1.0)) / F.lit(4.0)
    var = (
        nd * (nd + F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(1.0))
        / F.lit(24.0)
        - F.col("__tsum") / F.lit(48.0)
    )
    ok = (nd > 0) & (var > 0)
    return g.select(
        *gcols,
        nd.cast("long").alias("n"),
        (F.round(F.when(nd > 0, F.col("__wp")), 4) + F.lit(0.0)).alias(
            "w_plus"
        ),
        (
            F.round(
                F.when(ok, (F.col("__wp") - mu) / F.sqrt(var)), 6
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def friedman_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Friedman test (Friedman 1937) — K related treatments measured
    once per block (the repeated-measures / within-subject companion
    of `kruskal_wallis`): rank the K values WITHIN each block
    (tie-averaged), then test whether treatment rank sums diverge:

        Q = 12/(nK(K+1)) * sum_j R_j^2 - 3n(K+1)
        C = 1 - sum_blocks sum(t^3 - t) / (n K (K^2 - 1))
        q = Q / C                         (tie-corrected)

    Every block must carry EXACTLY one value per treatment — validated
    with a 1-row check (raise, don't silently mis-rank; the
    fleiss_kappa convention). Output: ONE row (n_blocks, k BIGINT,
    q DOUBLE round 6); q NULL at the all-tied degeneracy (C = 0).

    Plan: one (block, treat)-keyed input; rank windows partition BY
    BLOCK (K rows per partition — bounded by the treatment count, the
    definition of scale-safe); then one treat-keyed agg + 1-row
    combines.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & vc.isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        F.col(treat_col).alias("__k"),
        vc.alias("__v"),
    )
    per_block = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.countDistinct("__k").alias("__kd"),
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
        raise ValueError("friedman_test: empty input")
    if not (
        chk["clo"] == chk["chi"] == chk["klo"] == chk["khi"] == chk["kg"]
    ):
        raise ValueError(
            "friedman_test: blocks must hold exactly one value per "
            f"treatment (counts {chk['clo']}-{chk['chi']}, distinct "
            f"treatments {chk['klo']}-{chk['khi']}, global "
            f"{chk['kg']}) -- every block must cover the SAME "
            "treatment set"
        )
    k = int(chk["klo"])
    if k < 2:
        raise ValueError("friedman_test: need >= 2 treatments")
    n = int(chk["nb"])
    w_rank = Window.partitionBy("__b").orderBy("__v")
    w_tie = Window.partitionBy("__b", "__v")
    ranked = base.select(
        "__b",
        "__k",
        "__v",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    rj = ranked.groupBy("__k").agg(F.sum("__r").alias("__R"))
    ties = (
        base.groupBy("__b", "__v")
        .agg(F.count(F.lit(1)).cast("double").alias("__t"))
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t")
                - F.col("__t")
            ).alias("__tsum")
        )
    )
    stat = rj.agg(
        F.sum(F.col("__R") * F.col("__R")).alias("__s")
    ).join(F.broadcast(ties))
    q_raw = (
        F.lit(12.0 / (n * k * (k + 1.0))) * F.col("__s")
        - F.lit(3.0 * n * (k + 1.0))
    )
    corr = F.lit(1.0) - F.col("__tsum") / F.lit(
        n * k * (k * k - 1.0)
    )
    return stat.select(
        F.lit(n).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        (
            F.round(F.when(corr > 0, q_raw / corr), 6) + F.lit(0.0)
        ).alias("q"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Kendall's tau-b rank correlation (Kendall 1945 tie-corrected
    form) — the concordance companion of `spearman_corr`: of all pairs,
    how many agree in order on x and y?

        tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2))
        n0 = n(n-1)/2,  n1 = sum_x t(t-1)/2,  n2 = sum_y t(t-1)/2

    PRE-BUCKET dense continuous columns (round/quantize first — the
    roc_points discipline; ENFORCED by the `max_cells` tripwire, which
    raises on over-cardinality input): the corpus collapses to (x, y) count
    cells and concordant/discordant pairs come from a CELL-grid
    comparison, so cost is |cells|^2 (vocabulary-squared), never
    rows^2. Output: ONE row (n BIGINT, concordant BIGINT,
    discordant BIGINT, tau_b DOUBLE round 6); NULL tau at the
    all-tied degeneracy.

    Plan: one (x, y)-keyed partial agg collapses the corpus; the grid
    comparison is a broadcast join of the cell table against itself
    (strictly-greater x), then 1-row folds — integer pair counts make
    tau exact rational arithmetic.
    """
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        xc.alias("__x"), yc.alias("__y")
    )
    _assert_cell_bound(base, ["__x", "__y"], "kendall_tau_b", max_cells)
    cells = base.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__n").alias("__nb"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("__xb") > F.col("__xa"), "inner"
    ).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__yb") > F.col("__ya"),
                    F.col("__na") * F.col("__nb"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__yb") < F.col("__ya"),
                    F.col("__na") * F.col("__nb"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("discordant"),
    )
    tx = cells.groupBy("__x").agg(F.sum("__n").alias("__t")).agg(
        F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__n1x2"),
        F.sum("__t").cast("long").alias("n"),
    )
    ty = cells.groupBy("__y").agg(F.sum("__n").alias("__t")).agg(
        F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__n2x2")
    )
    g = pairs.join(F.broadcast(tx)).join(F.broadcast(ty))
    nd = F.col("n").cast("double")
    n0x2 = nd * (nd - F.lit(1.0))  # 2*n0
    den = F.sqrt(
        (n0x2 - F.col("__n1x2")) * (n0x2 - F.col("__n2x2"))
    )
    num = (
        F.col("concordant").cast("double")
        - F.col("discordant").cast("double")
    ) * F.lit(2.0)
    return g.select(
        "n",
        "concordant",
        "discordant",
        (
            F.round(F.when(den > 0, num / den), 6) + F.lit(0.0)
        ).alias("tau_b"),
    )


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Jonckheere-Terpstra trend test (Jonckheere 1954) — does the
    value distribution shift MONOTONICALLY with an ORDERED grouping
    (dose, tier, time bucket)? The ordered-alternative power upgrade
    over `kruskal_wallis` (which ignores group order):

        J  = sum_{i<j} [ #(x_i < x_j) + 0.5 #(x_i = x_j) ]
        mu = (N^2 - sum n_k^2) / 4
        var = (N^2 (2N+3) - sum n_k^2 (2 n_k + 3)) / 72
        z  = (J - mu) / sqrt(var)

    (the classic no-tie variance approximation — documented; J itself
    counts ties at 1/2). `group_col` must be numerically ordered.
    PRE-BUCKET dense values (the kendall_tau_b discipline; ENFORCED by
    the `max_cells` tripwire): the corpus
    collapses to (group, value) count cells and J comes from a
    broadcast CELL-grid comparison over ordered group pairs.

    Output: ONE row (n BIGINT, k BIGINT, j_stat DOUBLE round 4,
    z DOUBLE round 6); z NULL when var = 0.
    """
    gc = F.col(group_col).cast("double")
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    _assert_cell_bound(
        base, ["__g", "__v"], "jonckheere_terpstra", max_cells
    )
    cells = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__g").alias("__ga"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__g").alias("__gb"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("__gb") > F.col("__ga"), "inner"
    ).agg(
        F.sum(
            F.when(
                F.col("__va") < F.col("__vb"),
                (F.col("__na") * F.col("__nb")).cast("double"),
            )
            .when(
                F.col("__va") == F.col("__vb"),
                (F.col("__na") * F.col("__nb")).cast("double")
                / F.lit(2.0),
            )
            .otherwise(F.lit(0.0))
        ).alias("__J")
    )
    per_g = cells.groupBy("__g").agg(F.sum("__n").alias("__nk"))
    tot = per_g.agg(
        F.sum("__nk").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__nk") * F.col("__nk")).alias("__sq"),
        F.sum(
            F.col("__nk")
            * F.col("__nk")
            * (F.lit(2) * F.col("__nk") + F.lit(3))
        ).alias("__sq3"),
    )
    g = pairs.join(F.broadcast(tot))
    nd = F.col("n").cast("double")
    mu = (nd * nd - F.col("__sq")) / F.lit(4.0)
    var = (
        nd * nd * (F.lit(2.0) * nd + F.lit(3.0)) - F.col("__sq3")
    ) / F.lit(72.0)
    return g.select(
        "n",
        "k",
        (F.round(F.col("__J"), 4) + F.lit(0.0)).alias("j_stat"),
        (
            F.round(
                F.when(var > 0, (F.col("__J") - mu) / F.sqrt(var)), 6
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def cliffs_delta(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Cliff's delta (Cliff 1993) — the nonparametric EFFECT SIZE the
    mann_whitney z cannot give (z grows with n; delta doesn't): the
    probability a flag=1 value exceeds a flag=0 value minus the
    reverse,

        delta = [#(x1 > x0) - #(x1 < x0)] / (n1 * n0)   in [-1, 1]

    PRE-BUCKET dense values (the kendall_tau_b cell discipline;
    ENFORCED by the `max_cells` tripwire); flag must be 0/1. Output: ONE row (n0, n1 BIGINT, delta DOUBLE
    round 6); NULL when either side is empty.

    Plan: one (flag, value)-keyed partial agg + a broadcast cell-grid
    fold — integer dominance counts, exact rational delta.
    """
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    _assert_cell_bound(base, ["__f", "__v"], "cliffs_delta", max_cells)
    cells = base.groupBy("__f", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    c0 = cells.filter(F.col("__f") == 0).select(
        F.col("__v").alias("__v0"), F.col("__n").alias("__n0")
    )
    c1 = cells.filter(F.col("__f") == 1).select(
        F.col("__v").alias("__v1"), F.col("__n").alias("__n1")
    )
    grid = c1.join(F.broadcast(c0)).agg(
        F.sum(
            F.when(
                F.col("__v1") > F.col("__v0"),
                F.col("__n1") * F.col("__n0"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("__gt"),
        F.sum(
            F.when(
                F.col("__v1") < F.col("__v0"),
                F.col("__n1") * F.col("__n0"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("__lt"),
    )
    tots = cells.groupBy().agg(
        F.sum(F.when(F.col("__f") == 0, F.col("__n"))).cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("__f") == 1, F.col("__n"))).cast("long")
        .alias("n1"),
    )
    g = grid.join(F.broadcast(tots))
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    delta = (
        F.col("__gt").cast("double") - F.col("__lt").cast("double")
    ) / (F.col("n1").cast("double") * F.col("n0").cast("double"))
    return g.select(
        "n0",
        "n1",
        (F.round(F.when(ok, delta), 6) + F.lit(0.0)).alias("delta"),
    )


def mood_median_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Mood's median test — do the K groups share a median? The
    crudest-but-most-robust K-sample location test (only counts
    above/at-or-below the POOLED median, so it survives wild outliers
    that bend kruskal_wallis's ranks):

        chi2 = sum over K x 2 cells (O - E)^2 / E

    with the pooled median the repo's exact type-1 quantile (the
    `exact_quantiles` bucket-walk — no global sort, documented
    model-size collects) and E from the margins. Groups and cells
    with E = 0 make chi2 NULL (degenerate margin).

    Output: ONE row (n BIGINT, k BIGINT, median DOUBLE, chi2 DOUBLE
    round 6).

    Plan: the exact_quantiles device for the median + one group-keyed
    2-counter agg + a 1-row fold.
    """
    from pandasvcf_spark.operators.relational import exact_quantiles

    vc = F.col(value_col).cast("double")
    base = df.filter(
        F.col(group_col).isNotNull() & vc.isNotNull()
    ).select(F.col(group_col).alias("__g"), vc.alias("__v"))
    _assert_cell_bound(
        base,
        ["__g"],
        "mood_median_test",
        max_cells,
        plan_word="K-group chi-square cell",
    )
    med_rows = exact_quantiles(base, "__v", [0.5]).collect()
    med = float(med_rows[0]["value"])
    cells = base.groupBy("__g").agg(
        F.sum((F.col("__v") > F.lit(med)).cast("long")).alias("__a"),
        F.sum((F.col("__v") <= F.lit(med)).cast("long")).alias("__b"),
    )
    tot = cells.agg(
        F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb")
    )
    j = cells.join(F.broadcast(tot))
    nd = (F.col("__ta") + F.col("__tb")).cast("double")
    rowt = (F.col("__a") + F.col("__b")).cast("double")
    ea = rowt * F.col("__ta").cast("double") / nd
    eb = rowt * F.col("__tb").cast("double") / nd
    term = F.when(
        (ea > 0) & (eb > 0),
        (F.col("__a").cast("double") - ea)
        * (F.col("__a").cast("double") - ea)
        / ea
        + (F.col("__b").cast("double") - eb)
        * (F.col("__b").cast("double") - eb)
        / eb,
    )
    g = j.agg(
        F.sum(F.col("__a") + F.col("__b")).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.count(F.when(term.isNull(), 1)).alias("__bad"),
        F.sum(term).alias("__chi2"),
    )
    return g.select(
        "n",
        "k",
        F.lit(med).alias("median"),
        (
            F.round(
                F.when(
                    (F.col("__bad") == 0) & (F.col("k") >= 2),
                    F.col("__chi2"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("chi2"),
    )


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Page's L trend test (Page 1963) — the ORDERED-treatment upgrade
    of `friedman_test` (as jonckheere_terpstra is to kruskal_wallis):
    within-block mid-ranks, but weighted by the treatment ORDER, so a
    monotone dose response scores where Friedman only sees "some
    difference":

        L  = sum_j j * R_j        (j = 1..K by ascending treat order)
        mu = n K (K+1)^2 / 4
        var = n K^2 (K+1) (K^2 - 1) / 144
        z  = (L - mu) / sqrt(var)   (classic no-tie moments — documented
                                     approximation under mid-rank ties)

    `treat_col` must be numerically ordered; block completeness is
    validated (the friedman convention). Output: ONE row (n_blocks,
    k BIGINT, l_stat DOUBLE round 4, z DOUBLE round 6).

    Plan: the friedman_test machinery — within-block rank windows
    (K rows per partition) + one treat-keyed agg + a 1-row fold.
    """
    vc = F.col(value_col).cast("double")
    tc = F.col(treat_col).cast("double")
    base = df.filter(
        F.col(block_col).isNotNull() & tc.isNotNull() & vc.isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        tc.alias("__k"),
        vc.alias("__v"),
    )
    per_block = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.countDistinct("__k").alias("__kd"),
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
        raise ValueError("page_trend_test: empty input")
    if not (
        chk["clo"] == chk["chi"] == chk["klo"] == chk["khi"] == chk["kg"]
    ):
        raise ValueError(
            "page_trend_test: blocks must hold exactly one value per "
            f"treatment (counts {chk['clo']}-{chk['chi']}, distinct "
            f"treatments {chk['klo']}-{chk['khi']}, global "
            f"{chk['kg']}) -- every block must cover the SAME "
            "treatment set"
        )
    k = int(chk["klo"])
    if k < 2:
        raise ValueError("page_trend_test: need >= 2 treatments")
    n = int(chk["nb"])
    w_rank = Window.partitionBy("__b").orderBy("__v")
    w_tie = Window.partitionBy("__b", "__v")
    w_ord = Window.partitionBy(F.lit(1)).orderBy("__k")
    ranked = base.select(
        "__b",
        "__k",
        "__v",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    rj = ranked.groupBy("__k").agg(F.sum("__r").alias("__R"))
    # treatment order index 1..K over the K-row treatment table
    rj = rj.select(
        "__R", F.dense_rank().over(w_ord).cast("double").alias("__j")
    )
    stat = rj.agg(F.sum(F.col("__j") * F.col("__R")).alias("__L"))
    mu = n * k * (k + 1.0) * (k + 1.0) / 4.0
    var = n * k * k * (k + 1.0) * (k * k - 1.0) / 144.0
    import math

    sd = math.sqrt(var)
    return stat.select(
        F.lit(n).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        (F.round(F.col("__L"), 4) + F.lit(0.0)).alias("l_stat"),
        (
            F.round(
                F.when(
                    F.lit(sd > 0),
                    (F.col("__L") - F.lit(mu)) / F.lit(sd),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def brunner_munzel(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Brunner-Munzel test (Brunner & Munzel 2000) — the modern
    replacement for `mann_whitney_u` under the rank Behrens-Fisher
    problem (MWU's variance assumes the two distributions differ only
    by shift; BM stays honest when their SHAPES differ too — the
    recommendation in current methods literature):

        p_hat = P(X0 < X1) + 0.5 P(X0 = X1)
              = (mean_rank_1 - (n1+1)/2) / n0
        W = n0 n1 (m1 - m0) / N / sqrt(n0 S0^2 + n1 S1^2)

    with m_g the group means of COMBINED mid-ranks and S_g^2 the
    variances of the rank PLACEMENTS (combined minus within-group
    mid-ranks) — the scipy/lawstat formulation, pinned to scipy's
    documented example in tests. flag must be 0/1; PRE-BUCKET dense
    values (the kendall_tau_b cell discipline; ENFORCED by the
    `max_cells` tripwire on distinct values).

    Output: ONE row (n0, n1 BIGINT, p_hat DOUBLE round 6, w DOUBLE
    round 6); NULL statistics when a group has n < 2 or the placement
    variances both vanish.

    Plan: everything computes over (flag, value) count cells — every
    member of a cell shares its combined AND within-group mid-rank,
    so the placement variance is a weighted cell fold. Two cumulative
    windows over distinct-value cells, two cells-sized joins, 1-row
    combines. No raw-row window anywhere.
    """
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    _assert_cell_bound(
        base,
        ["__v"],
        "brunner_munzel",
        max_cells,
        plan_word="distinct-value cell-ladder window",
    )
    cells = base.groupBy("__f", "__v").agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    vcells = cells.groupBy("__v").agg(F.sum("__n").alias("__t"))
    w_all = (
        Window.orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rc = vcells.select(
        "__v",
        (
            F.coalesce(F.sum("__t").over(w_all), F.lit(0.0))
            + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("__rc"),
    )
    w_within = (
        Window.partitionBy("__f")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = cells.select(
        "__f",
        "__v",
        "__n",
        (
            F.coalesce(F.sum("__n").over(w_within), F.lit(0.0))
            + (F.col("__n") + F.lit(1.0)) / F.lit(2.0)
        ).alias("__rw"),
    )
    j = wc.join(rc, "__v")
    grp = j.groupBy("__f").agg(
        F.sum("__n").alias("__ng"),
        F.sum(F.col("__n") * F.col("__rc")).alias("__sr"),
    )
    grp = grp.select(
        "__f",
        "__ng",
        (F.col("__sr") / F.col("__ng")).alias("__m"),
    )
    j2 = j.join(grp, "__f")
    term = (
        F.col("__rc")
        - F.col("__rw")
        - F.col("__m")
        + (F.col("__ng") + F.lit(1.0)) / F.lit(2.0)
    )
    s = j2.groupBy("__f").agg(
        F.max("__ng").alias("__ng"),
        F.max("__m").alias("__m"),
        (
            F.sum(F.col("__n") * term * term)
            / (F.max("__ng") - F.lit(1.0))
        ).alias("__S"),
    )
    g0 = s.filter(F.col("__f") == 0).select(
        F.col("__ng").alias("__n0"),
        F.col("__m").alias("__m0"),
        F.col("__S").alias("__S0"),
    )
    g1 = s.filter(F.col("__f") == 1).select(
        F.col("__ng").alias("__n1"),
        F.col("__m").alias("__m1"),
        F.col("__S").alias("__S1"),
    )
    g = g0.join(F.broadcast(g1))
    n0d = F.col("__n0")
    n1d = F.col("__n1")
    nd = n0d + n1d
    p_hat = (F.col("__m1") - (n1d + F.lit(1.0)) / F.lit(2.0)) / n0d
    den = F.sqrt(
        n0d * F.col("__S0") + n1d * F.col("__S1")
    )
    w_stat = (
        n0d * n1d * (F.col("__m1") - F.col("__m0")) / nd / den
    )
    ok = (n0d >= 2) & (n1d >= 2)
    return g.select(
        n0d.cast("long").alias("n0"),
        n1d.cast("long").alias("n1"),
        (F.round(F.when(ok, p_hat), 6) + F.lit(0.0)).alias("p_hat"),
        (
            F.round(F.when(ok & (den > 0), w_stat), 6) + F.lit(0.0)
        ).alias("w"),
    )


def ordinal_association(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_cells: int | None = 65536,
) -> DataFrame:
    """Ordinal-by-ordinal association family in one pass — Goodman-
    Kruskal gamma (1954), Somers' D (1962, the asymmetric y|x form),
    and Stuart-Kendall tau-c (1953): the three standard refinements of
    `kendall_tau_b` that contingency-table users actually quote,

        gamma = (C - D) / (C + D)                (ignores all ties)
        d_yx  = (C - D) / (n0 - n_x_ties)        (penalizes x ties)
        tau_c = 2 m (C - D) / (n^2 (m - 1)),  m = min(#x, #y) levels

    PRE-BUCKET dense values (ENFORCED by the `max_cells` tripwire).
    Output: ONE row (n, concordant, discordant BIGINT, gamma,
    somers_dyx, tau_c DOUBLE round 6); NULLs at degenerate margins.

    Plan: exactly the kendall_tau_b device — one (x, y) cell collapse,
    one broadcast cell-grid fold for C/D, two marginal aggs; the three
    statistics differ only in their 1-row denominators.
    """
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    base = df.filter(xc.isNotNull() & yc.isNotNull()).select(
        xc.alias("__x"), yc.alias("__y")
    )
    _assert_cell_bound(
        base, ["__x", "__y"], "ordinal_association", max_cells
    )
    cells = base.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    a = cells.select(
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.col("__n").alias("__na"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__n").alias("__nb"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("__xb") > F.col("__xa"), "inner"
    ).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__yb") > F.col("__ya"),
                    F.col("__na") * F.col("__nb"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__yb") < F.col("__ya"),
                    F.col("__na") * F.col("__nb"),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("discordant"),
    )
    tx = cells.groupBy("__x").agg(F.sum("__n").alias("__t")).agg(
        F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__n1x2"),
        F.sum("__t").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("__r"),
    )
    ty = cells.groupBy("__y").agg(F.sum("__n").alias("__t")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    g = pairs.join(F.broadcast(tx)).join(F.broadcast(ty))
    cd = (
        F.col("concordant").cast("double")
        - F.col("discordant").cast("double")
    )
    csum = (
        F.col("concordant").cast("double")
        + F.col("discordant").cast("double")
    )
    nd = F.col("n").cast("double")
    n0x2 = nd * (nd - F.lit(1.0))
    m = F.least(F.col("__r"), F.col("__c")).cast("double")
    return g.select(
        "n",
        "concordant",
        "discordant",
        (
            F.round(F.when(csum > 0, cd / csum), 6) + F.lit(0.0)
        ).alias("gamma"),
        (
            F.round(
                F.when(
                    (n0x2 - F.col("__n1x2")) > 0,
                    F.lit(2.0) * cd / (n0x2 - F.col("__n1x2")),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("somers_dyx"),
        (
            F.round(
                F.when(
                    (m > 1) & (nd > 0),
                    F.lit(2.0) * m * cd / (nd * nd * (m - F.lit(1.0))),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_c"),
    )


def ansari_bradley(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Ansari-Bradley rank SCALE test (Ansari & Bradley 1960) — do the
    two groups share dispersion around a common median? The two-sample
    nonparametric companion of `levene_bf`/`bartlett_test`: rank the
    pooled sample from BOTH ends (score = min(rank, N+1-rank), ties by
    run-average), then test whether group 1's score sum AB is what
    exchangeability predicts,

        AB   = sum of group-1 scores
        E    = n1 * mean(score)                    (permutation form)
        Var  = n0 n1 (sum s² - N mean²) / (N (N-1))
        z    = (AB - E) / sqrt(Var)

    (the tie-robust sampling-without-replacement moments — reduces to
    the textbook even/odd-N constants when values are distinct). flag
    must be 0/1. Output: ONE row (n0, n1 BIGINT, ab DOUBLE round 4,
    z DOUBLE round 6); z NULL when Var = 0.

    Plan: the tie-run score sum has a CLOSED FORM per distinct-value
    cell (an arithmetic series split at the pooled center), so the
    whole statistic is the cell ladder + 1-row folds — no raw-row
    rank window (tripwire-enforced cells).
    """
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    _assert_cell_bound(
        base, ["__v"], "ansari_bradley", max_cells,
        plan_word="distinct-value score ladder",
    )
    cells = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast("long").alias("__t1"),
    )
    tot = cells.agg(F.sum("__t").cast("long").alias("__N"))
    w_prev = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lad = cells.crossJoin(F.broadcast(tot)).select(
        "__v",
        "__t",
        "__t1",
        "__N",
        (
            F.coalesce(F.sum("__t").over(w_prev), F.lit(0)) + 1
        ).cast("double").alias("__a"),  # run start position
    )
    # sum of min(i, N+1-i) for i in [a, b] and the matching sum of
    # squares: split the run at m1 = floor((N+1)/2) — below it the
    # score is i, above it N+1-i (an arithmetic series either side).
    nd = F.col("__N").cast("double")
    a = F.col("__a")
    b = a + F.col("__t").cast("double") - 1
    m1 = F.floor((nd + 1) / 2).cast("double")

    def _series_sum(lo, hi):
        # sum_{i=lo..hi} i, empty-safe
        cnt = F.greatest(hi - lo + 1, F.lit(0.0))
        return F.when(cnt > 0, cnt * (lo + hi) / 2).otherwise(F.lit(0.0))

    lo1, hi1 = a, F.least(b, m1)
    lo2, hi2 = F.greatest(a, m1 + 1), b
    run_sum = _series_sum(lo1, hi1) + (
        _series_sum(F.lit(0.0) + (nd + 1 - hi2), nd + 1 - lo2)
    )
    scored = lad.select(
        "__t",
        "__t1",
        "__N",
        (run_sum / F.col("__t")).alias("__s"),       # per-member score
    )
    # NOTE: within a tie run every member carries the AVERAGE score
    # (mid-score), so sum s² uses t * mean² per run — the mid-rank
    # convention (matches R's ansari.test tie treatment).
    g = scored.agg(
        F.sum(F.col("__t") - F.col("__t1")).cast("long").alias("n0"),
        F.sum("__t1").cast("long").alias("n1"),
        F.max("__N").cast("double").alias("__nd"),
        F.sum(F.col("__t1") * F.col("__s")).alias("__ab"),
        F.sum(F.col("__t") * F.col("__s")).alias("__ssum"),
        F.sum(
            F.col("__t") * F.col("__s") * F.col("__s")
        ).alias("__ssq"),
    )
    n0d = F.col("n0").cast("double")
    n1d = F.col("n1").cast("double")
    nd2 = F.col("__nd")
    mean_s = F.col("__ssum") / nd2
    var = (
        n0d
        * n1d
        * (F.col("__ssq") - nd2 * mean_s * mean_s)
        / (nd2 * (nd2 - 1))
    )
    z = (F.col("__ab") - n1d * mean_s) / F.sqrt(var)
    return g.select(
        "n0",
        "n1",
        F.round(F.col("__ab"), 4).alias("ab"),
        (
            F.round(
                F.when((F.col("n0") > 0) & (F.col("n1") > 0) & (var > 0), z),
                6,
            )
            + F.lit(0.0)
        ).alias("z"),
    )


def quade_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
) -> DataFrame:
    """Quade test (Quade 1979) — the block-weighted upgrade of
    `friedman_test`: blocks with a LARGER within-block spread carry
    more evidence about treatment differences, so each block's rank
    signal is weighted by the rank of its range,

        R_ij = within-block mid-rank of x_ij
        Q_i  = across-block mid-rank of range_i = max_i - min_i
        S_ij = Q_i (R_ij - (k+1)/2)
        F = (n-1) B / (A - B),  A = sum S_ij²,  B = (1/n) sum_j S_j²/n

    More powerful than Friedman at small k (<= ~5) when blocks differ
    in scale. Complete blocks required — validated exactly like
    `friedman_test` (per-block counts AND the global treatment set).
    Output: ONE row (n_blocks, k BIGINT, f DOUBLE round 6); f NULL at
    the A = B degeneracy (all blocks internally tied).

    Plan: within-block rank windows (K rows per partition), one
    block-keyed range agg, the across-block range ranking via the
    distinct-range cell ladder (never a blocks-sized single-task
    window), one broadcast join back + 1-row folds.
    """
    vc = F.col(value_col).cast("double")
    base = df.filter(
        F.col(block_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & vc.isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        F.col(treat_col).alias("__k"),
        vc.alias("__v"),
    )
    per_block = base.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.countDistinct("__k").alias("__kd"),
        (F.max("__v") - F.min("__v")).alias("__rng"),
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
        raise ValueError("quade_test: empty input")
    if not (
        chk["clo"] == chk["chi"] == chk["klo"] == chk["khi"] == chk["kg"]
    ):
        raise ValueError(
            "quade_test: blocks must hold exactly one value per "
            f"treatment (counts {chk['clo']}-{chk['chi']}, distinct "
            f"treatments {chk['klo']}-{chk['khi']}, global "
            f"{chk['kg']}) -- every block must cover the SAME "
            "treatment set"
        )
    k = int(chk["klo"])
    if k < 2:
        raise ValueError("quade_test: need >= 2 treatments")
    n = int(chk["nb"])
    # across-block mid-rank of the range via the distinct-range ladder
    rcells = per_block.groupBy("__rng").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w_prev = Window.orderBy("__rng").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rq = rcells.select(
        "__rng",
        (
            F.coalesce(F.sum("__c").over(w_prev), F.lit(0.0))
            + (F.col("__c") + 1) / 2
        ).alias("__q"),
    )
    blocks = per_block.join(F.broadcast(rq), "__rng").select("__b", "__q")
    w_rank = Window.partitionBy("__b").orderBy("__v")
    w_tie = Window.partitionBy("__b", "__v")
    s = (
        base.select(
            "__b",
            "__k",
            (
                F.rank().over(w_rank).cast("double")
                + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
            ).alias("__r"),
        )
        .join(F.broadcast(blocks), "__b")
        .select(
            "__k",
            (
                F.col("__q") * (F.col("__r") - F.lit((k + 1) / 2.0))
            ).alias("__s"),
        )
    )
    a_fold = s.agg(F.sum(F.col("__s") * F.col("__s")).alias("__a"))
    b_fold = s.groupBy("__k").agg(F.sum("__s").alias("__sj")).agg(
        (F.sum(F.col("__sj") * F.col("__sj")) / F.lit(float(n))).alias(
            "__bb"
        )
    )
    g = a_fold.join(F.broadcast(b_fold))
    f_stat = (
        F.lit(float(n - 1))
        * F.col("__bb")
        / (F.col("__a") - F.col("__bb"))
    )
    return g.select(
        F.lit(n).cast("long").alias("n_blocks"),
        F.lit(k).cast("long").alias("k"),
        (
            F.round(
                F.when(F.col("__a") - F.col("__bb") > 0, f_stat), 6
            )
            + F.lit(0.0)
        ).alias("f"),
    )


# Acklam's inverse-normal rational approximation (public algorithm,
# |err| < 1.2e-8; verified against stdlib NormalDist.inv_cdf in tests).
# The SAME constant list generates both the Spark expression and the
# DuckDB oracle SQL so the two engines replay identical arithmetic.
_ACKLAM_A = [-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00]


_ACKLAM_B = [-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01]


_ACKLAM_C = [-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00]


_ACKLAM_D = [7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00]


_ACKLAM_PLOW = 0.02425


def norm_ppf_expr(p):
    """Standard-normal quantile Φ⁻¹(p) as a pure column expression
    (Acklam's piecewise rational approximation) — the normal-scores
    ingredient for rank statistics (fligner_killeen, van der Waerden
    scores) that keeps everything inside whole-stage codegen."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D

    def horner(coefs, x):
        acc = F.lit(coefs[0])
        for co in coefs[1:]:
            acc = acc * x + F.lit(co)
        return acc

    q_c = p - F.lit(0.5)
    r_c = q_c * q_c
    central = horner(a, r_c) * q_c / (horner(b, r_c) * r_c + F.lit(1.0))
    q_l = F.sqrt(F.lit(-2.0) * F.log(p))
    lower = horner(c, q_l) / (horner(d, q_l) * q_l + F.lit(1.0))
    q_u = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    upper = -horner(c, q_u) / (horner(d, q_u) * q_u + F.lit(1.0))
    return (
        F.when(p < F.lit(_ACKLAM_PLOW), lower)
        .when(p > F.lit(1.0 - _ACKLAM_PLOW), upper)
        .otherwise(central)
    )


def norm_ppf_sql(expr: str) -> str:
    """The DuckDB twin of `norm_ppf_expr`, generated from the SAME
    constants with the SAME Horner nesting so the oracle replays the
    Spark arithmetic operation-for-operation."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D

    def horner(coefs, x):
        acc = repr(coefs[0])
        for co in coefs[1:]:
            acc = f"(({acc}) * ({x}) + {co!r})"
        return acc

    p = f"({expr})"
    q_c = f"({p} - 0.5)"
    r_c = f"({q_c} * {q_c})"
    central = (
        f"(({horner(a, r_c)}) * {q_c}"
        f" / (({horner(b, r_c)}) * {r_c} + 1.0))"
    )
    q_l = f"sqrt(-2.0 * ln({p}))"
    lower = f"(({horner(c, q_l)}) / (({horner(d, q_l)}) * {q_l} + 1.0))"
    q_u = f"sqrt(-2.0 * ln(1.0 - {p}))"
    upper = f"(-({horner(c, q_u)}) / (({horner(d, q_u)}) * {q_u} + 1.0))"
    return (
        f"CASE WHEN {p} < {_ACKLAM_PLOW!r} THEN {lower} "
        f"WHEN {p} > {1.0 - _ACKLAM_PLOW!r} THEN {upper} "
        f"ELSE {central} END"
    )


def conover_squared_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Conover squared-ranks test for equal variances (Conover 1980
    §5.3) — the K-sample rank SCALE test between `ansari_bradley`
    (two-sample) and `fligner_killeen` (normal-scores): rank the
    absolute deviations from each group's OWN mean, square the
    midranks, and chi-square the per-group squared-rank sums,

        u_ij = |x_ij − x̄_i|,  R_ij = pooled midrank of u_ij
        S_i  = Σ_j R_ij²,      S̄ = (1/N) Σ R²
        D²   = (1/(N−1)) (Σ R⁴ − N S̄²)
        T    = (Σ_i S_i²/n_i − N S̄²) / D²   ~  chi²(k−1)

    Output: ONE row (k, n BIGINT, t DOUBLE round 6); t NULL when
    k < 2 or D² = 0 (all deviations tied).

    Plan: one per-group moment agg (means), one join back (group-
    keyed), then the collapse-first discipline — a (group, |dev|)
    grid, the pooled distinct-|dev| midrank ladder (tripwire-enforced
    cells), one grid↔ladder equi-join, per-group folds + a 1-row
    fold. Midranks, R² and R⁴ are all per-cell closed forms."""
    gc = F.col(group_col)
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__x")
    )
    means = base.groupBy("__g").agg(F.avg("__x").alias("__m"))
    dev = base.join(means, "__g").select(
        "__g", F.abs(F.col("__x") - F.col("__m")).alias("__u")
    )
    _assert_cell_bound(
        dev, ["__u"], "conover_squared_ranks", max_cells,
        plan_word="distinct-deviation midrank ladder",
    )
    grid = dev.groupBy("__g", "__u").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    cells = grid.groupBy("__u").agg(F.sum("__c").alias("__t"))
    w_prev = Window.orderBy("__u").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lad = cells.select(
        "__u",
        (
            F.coalesce(F.sum("__t").over(w_prev), F.lit(0.0))
            + (F.col("__t") + 1) / 2
        ).alias("__mr"),  # midrank of the tie run
    )
    j = grid.join(lad, "__u")
    per_g = j.groupBy("__g").agg(
        F.sum("__c").alias("__ni"),
        F.sum(F.col("__c") * F.col("__mr") * F.col("__mr")).alias(
            "__si"
        ),
        F.sum(
            F.col("__c")
            * F.col("__mr") * F.col("__mr")
            * F.col("__mr") * F.col("__mr")
        ).alias("__r4"),
    )
    g = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("__ni").cast("long").alias("n"),
        F.sum("__si").alias("__stot"),
        F.sum("__r4").alias("__r4tot"),
        F.sum(F.col("__si") * F.col("__si") / F.col("__ni")).alias(
            "__ssq"
        ),
    )
    nd = F.col("n").cast("double")
    sbar = F.col("__stot") / nd
    d2 = (F.col("__r4tot") - nd * sbar * sbar) / (nd - 1)
    t = (F.col("__ssq") - nd * sbar * sbar) / d2
    ok = (F.col("k") >= 2) & (d2 > 0)
    return g.select(
        "k",
        "n",
        (F.round(F.when(ok, t), 6) + F.lit(0.0)).alias("t"),
    )


def fligner_killeen(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Fligner-Killeen variance-homogeneity test (Fligner & Killeen
    1976; the scale test R recommends as most robust to non-normality,
    `fligner.test`): normal scores of the pooled ranks of absolute
    deviations from group MEDIANS,

        z_i = |x_i - median_g|,  r_i = pooled mid-rank of z
        a_i = Φ⁻¹(0.5 + r_i / (2(N+1)))
        FK  = sum_g n_g (abar_g - abar)² / s²,   s² = var(a, ddof=1)

    chi-square with k-1 df under H0. Output: ONE row (n, k BIGINT,
    fk DOUBLE round 6); NULL when k < 2 or s² = 0.

    Plan: per-group exact type-1 medians (the levene_bf rank device),
    pooled mid-ranks from the distinct-|z| cell ladder (tripwire-
    enforced; PRE-ROUND near-unique values), Φ⁻¹ as the pure
    `norm_ppf_expr` column (no Python), then two group-keyed aggs.
    """
    gc = F.col(group_col)
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    w_rank = Window.partitionBy("__g").orderBy("__v")
    w_n = Window.partitionBy("__g")
    med = (
        base.select(
            "__g",
            "__v",
            F.row_number().over(w_rank).alias("__r"),
            F.count(F.lit(1)).over(w_n).alias("__cnt"),
        )
        .filter(
            F.col("__r")
            == F.greatest(F.ceil(F.col("__cnt") / 2), F.lit(1))
        )
        .select("__g", F.col("__v").alias("__med"))
    )
    z = base.join(F.broadcast(med), "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__med")).alias("__z")
    )
    _assert_cell_bound(
        z, ["__z"], "fligner_killeen", max_cells,
        plan_word="distinct-|z| rank ladder",
    )
    zc = z.groupBy("__z").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    w_prev = Window.orderBy("__z").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranks = zc.select(
        "__z",
        (
            F.coalesce(F.sum("__c").over(w_prev), F.lit(0.0))
            + (F.col("__c") + 1) / 2
        ).alias("__rk"),
    )
    nrow = z.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    scored = (
        z.join(F.broadcast(ranks), "__z")
        .crossJoin(F.broadcast(nrow))
        .select(
            "__g",
            "__N",
            norm_ppf_expr(
                F.lit(0.5)
                + F.col("__rk") / (F.lit(2.0) * (F.col("__N") + 1))
            ).alias("__a"),
        )
    )
    per_g = scored.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__ng"),
        F.avg("__a").alias("__ag"),
        F.sum(F.col("__a") * F.col("__a")).alias("__aq"),
    )
    g = per_g.agg(
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__ng") * F.col("__ag")).alias("__sa"),
        F.sum(
            F.col("__ng") * F.col("__ag") * F.col("__ag")
        ).alias("__saa"),
        F.sum("__aq").alias("__qq"),
    )
    nd = F.col("n").cast("double")
    abar = F.col("__sa") / nd
    s2 = (F.col("__qq") - nd * abar * abar) / (nd - 1)
    fk = (
        F.col("__saa") - F.col("__sa") * F.col("__sa") / nd
    ) / s2
    ok = (F.col("k") >= 2) & (s2 > 0)
    return g.select(
        "n",
        "k",
        (F.round(F.when(ok, fk), 6) + F.lit(0.0)).alias("fk"),
    )


def van_der_waerden(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Van der Waerden normal-scores test (van der Waerden 1952) — the
    k-sample LOCATION test on normal quantiles of pooled ranks: as
    robust as `kruskal_wallis` but with ANOVA's efficiency when the
    data really are normal (the textbook reason to prefer it),

        a_i = Φ⁻¹(r_i / (N + 1))       (pooled mid-ranks r)
        T   = sum_g (sum_{i in g} a_i)² / n_g / s²,
        s²  = (1/(N-1)) sum a_i²        (scores are centered by design)

    chi-square with k-1 df. Output: ONE row (n, k BIGINT, t DOUBLE
    round 6); NULL when k < 2 or s² = 0.

    Plan: the fligner_killeen machinery minus the median step — pooled
    mid-ranks from the distinct-value cell ladder (tripwire-enforced),
    `norm_ppf_expr` scores inside codegen, two group-keyed aggs.
    """
    gc = F.col(group_col)
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    _assert_cell_bound(
        base, ["__v"], "van_der_waerden", max_cells,
        plan_word="distinct-value rank ladder",
    )
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
        ).alias("__rk"),
    )
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    scored = (
        base.join(F.broadcast(ranks), "__v")
        .crossJoin(F.broadcast(nrow))
        .select(
            "__g",
            norm_ppf_expr(
                F.col("__rk") / (F.col("__N") + F.lit(1.0))
            ).alias("__a"),
        )
    )
    per_g = scored.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__ng"),
        F.sum("__a").alias("__sg"),
        F.sum(F.col("__a") * F.col("__a")).alias("__qg"),
    )
    g = per_g.agg(
        F.sum("__ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("__sg") * F.col("__sg") / F.col("__ng")).alias(
            "__t"
        ),
        F.sum("__qg").alias("__qq"),
    )
    nd = F.col("n").cast("double")
    s2 = F.col("__qq") / (nd - 1)
    ok = (F.col("k") >= 2) & (s2 > 0)
    return g.select(
        "n",
        "k",
        (
            F.round(F.when(ok, F.col("__t") / s2), 6) + F.lit(0.0)
        ).alias("t"),
    )


def hodges_lehmann_shift(
    df: DataFrame,
    flag_col: str,
    value_col: str,
    max_grid: int = 4_000_000,
) -> DataFrame:
    """Two-sample Hodges-Lehmann shift estimator (Hodges & Lehmann
    1963) — the EFFECT SIZE that belongs with `mann_whitney_u`'s test:
    the median of all pairwise differences x1 - x0, the robust "how
    much did the distribution move" number (a single wild outlier
    cannot move it, unlike the difference of means):

        HL = median over (i, j) of x1_i - x0_j

    using the repo's weighted type-1 median (smallest difference
    whose cumulative pair count reaches half). flag must be 0/1;
    PRE-BUCKET dense values — the grid is |cells0| x |cells1| pairs,
    ENFORCED against `max_grid` with one cheap two-sided distinct
    count. Output: ONE row (n0, n1 BIGINT, hl_shift DOUBLE round 6);
    NULL when either group is empty.

    Plan: two distinct-value cell collapses, one broadcast cell grid
    carrying integer pair WEIGHTS (never raw pairs), one cumulative
    window over distinct differences, a 1-row fold.
    """
    fc = F.col(flag_col).cast("int")
    vc = F.col(value_col).cast("double")
    base = df.filter(fc.isNotNull() & vc.isNotNull()).select(
        fc.alias("__f"), vc.alias("__v")
    )
    sizes = base.groupBy("__f").agg(
        F.countDistinct("__v").alias("__d")
    ).collect()
    d = {r["__f"]: r["__d"] for r in sizes}
    grid = d.get(0, 0) * d.get(1, 0)
    if grid > max_grid:
        raise ValueError(
            f"hodges_lehmann_shift: {d.get(0, 0):,} x {d.get(1, 0):,} "
            f"distinct-value cells = {grid:,} grid pairs exceed "
            f"max_grid={max_grid:,} — the pairwise-difference grid "
            "would degrade toward rows². PRE-BUCKET dense continuous "
            "values first (round/quantize), or raise max_grid after "
            "confirming the cost."
        )
    cells = base.groupBy("__f", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    c0 = cells.filter(F.col("__f") == 0).select(
        F.col("__v").alias("__v0"), F.col("__n").alias("__n0")
    )
    c1 = cells.filter(F.col("__f") == 1).select(
        F.col("__v").alias("__v1"), F.col("__n").alias("__n1")
    )
    diffs = (
        c1.join(F.broadcast(c0))
        .groupBy((F.col("__v1") - F.col("__v0")).alias("__d"))
        .agg(F.sum(F.col("__n1") * F.col("__n0")).alias("__w"))
    )
    w_cum = Window.orderBy("__d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = diffs.agg(F.sum("__w").alias("__wtot"))
    lad = diffs.crossJoin(F.broadcast(tot)).select(
        "__d",
        F.sum("__w").over(w_cum).alias("__cw"),
        "__wtot",
    )
    g = lad.agg(
        F.min(
            F.when(
                F.col("__cw").cast("double")
                >= F.lit(0.5) * F.col("__wtot").cast("double"),
                F.col("__d"),
            )
        ).alias("__hl"),
    )
    n01 = base.agg(
        F.sum(F.when(F.col("__f") == 0, 1).otherwise(0))
        .cast("long").alias("n0"),
        F.sum(F.when(F.col("__f") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
    )
    out = g.crossJoin(F.broadcast(n01))
    ok = (F.col("n0") > 0) & (F.col("n1") > 0)
    return out.select(
        "n0",
        "n1",
        (F.round(F.when(ok, F.col("__hl")), 6) + F.lit(0.0)).alias(
            "hl_shift"
        ),
    )


def dunn_test(
    df: DataFrame,
    treat_col: str,
    value_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons (Dunn 1964) — WHICH groups
    differ after `kruskal_wallis` rejects: for every treatment pair,
    the tie-corrected normal statistic on pooled mid-rank means

        z = (R̄_a − R̄_b) / sqrt(σ² (1/n_a + 1/n_b)),
        σ² = N(N+1)/12 − Σ(t³−t) / (12(N−1))

    Report z against a multiplicity-adjusted cut (feed |z|-derived
    p-values to `fdr_correct` for the BH version) — k(k−1)/2 pairs.

    Plan: identical collapse to `kruskal_wallis` (distinct-value count
    cells, tripwired; the mid-rank ladder runs over cells only); the
    pair expansion is a self-join of the K-row rank-sum table —
    model-sized. Output: (treat_a, treat_b, n_a, n_b BIGINT, mr_a,
    mr_b DOUBLE round 4, z DOUBLE round 6), pairs ordered
    treat_a < treat_b by string order; z NULL when σ² is undefined
    (N < 2 or all values tied)."""
    vc = F.col(value_col).cast("double")
    base = df.filter(
        vc.isNotNull() & F.col(treat_col).isNotNull()
    ).select(vc.alias("__v"), F.col(treat_col).alias("__k"))
    _assert_cell_bound(
        base, ["__v"], "dunn_test", max_cells,
        plan_word="distinct-value cell-ladder window",
    )
    tcells = base.groupBy("__v", "__k").agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    vcells = tcells.groupBy("__v").agg(F.sum("__n").alias("__t"))
    w_prev = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    mid = vcells.select(
        "__v",
        "__t",
        (
            F.coalesce(F.sum("__t").over(w_prev), F.lit(0.0))
            + (F.col("__t") + F.lit(1.0)) / F.lit(2.0)
        ).alias("__mr"),
    )
    pt = (
        tcells.join(mid, "__v")
        .groupBy("__k")
        .agg(
            F.sum(F.col("__n") * F.col("__mr")).alias("__R"),
            F.sum("__n").alias("__nk"),
        )
    )
    tot = vcells.agg(
        F.sum("__t").alias("__N"),
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).alias("__tsum"),
    )
    a = pt.select(
        F.col("__k").alias("treat_a"),
        F.col("__R").alias("__Ra"),
        F.col("__nk").alias("__na"),
    )
    b = pt.select(
        F.col("__k").alias("treat_b"),
        F.col("__R").alias("__Rb"),
        F.col("__nk").alias("__nb"),
    )
    pairs = a.join(
        F.broadcast(b),
        a["treat_a"].cast("string") < b["treat_b"].cast("string"),
    ).crossJoin(F.broadcast(tot))
    n = F.col("__N")
    sig2 = n * (n + 1.0) / 12.0 - F.col("__tsum") / (12.0 * (n - 1.0))
    z = F.when(
        (n >= 2) & (sig2 > 0),
        (F.col("__Ra") / F.col("__na") - F.col("__Rb") / F.col("__nb"))
        / F.sqrt(sig2 * (1.0 / F.col("__na") + 1.0 / F.col("__nb"))),
    )
    return pairs.select(
        "treat_a",
        "treat_b",
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        (F.round(F.col("__Ra") / F.col("__na"), 4) + F.lit(0.0)).alias(
            "mr_a"
        ),
        (F.round(F.col("__Rb") / F.col("__nb"), 4) + F.lit(0.0)).alias(
            "mr_b"
        ),
        (F.round(z, 6) + F.lit(0.0)).alias("z"),
    )
