"""Ranking / classifier-eval / clustering / agreement statistics.

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



def ndcg_at_k(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group NDCG@k of a score ranking against graded relevance —
    the retrieval-evaluation loop for embedding / BM25 rankers: per
    query group, how close is the score order to the ideal order?

        DCG@k  = sum_{r<=k} (2^rel - 1) / log2(r + 1)   (score desc)
        IDCG@k = same over the ideal (rel desc) order
        NDCG@k = DCG / IDCG   (NULL when IDCG = 0)

    Ranks are row_number with `id_col` as the tie-break, so the metric
    is deterministic across retries/partitionings (the repo's top-k
    rule). The ideal order ties on equal rel are position-equivalent,
    so IDCG is deterministic regardless of tie order. Rows with NULL
    score or rel are dropped.

    Output: (*group_cols, n BIGINT, dcg, idcg, ndcg DOUBLE round 6).

    Plan: ONE exchange on the group keys serves both rank windows and
    the final groupBy — no joins, pure expressions.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        *gcols,
        F.col(score_col).cast("double").alias("__s"),
        F.col(rel_col).cast("double").alias("__rel"),
        F.col(id_col).alias("__id"),
    )
    w_score = Window.partitionBy(*gcols).orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    w_ideal = Window.partitionBy(*gcols).orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    gain = F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0)
    ranked = base.select(
        *gcols,
        "__rel",
        F.row_number().over(w_score).alias("__r"),
        F.row_number().over(w_ideal).alias("__ri"),
        gain.alias("__g"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("__r") <= k,
                F.col("__g") / F.log2(F.col("__r") + F.lit(1.0)),
            )
        ).alias("__dcg"),
        F.sum(
            F.when(
                F.col("__ri") <= k,
                F.col("__g") / F.log2(F.col("__ri") + F.lit(1.0)),
            )
        ).alias("__idcg"),
    )
    return agg.select(
        *gcols,
        "n",
        (F.round(F.coalesce(F.col("__dcg"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "dcg"
        ),
        (F.round(F.coalesce(F.col("__idcg"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "idcg"
        ),
        (
            F.round(
                F.when(
                    F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("ndcg"),
    )


def average_precision(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group average precision (the area under the precision-recall
    curve at observed operating points) — the binary-relevance partner
    of `ndcg_at_k` and the ranking-aware complement of `group_auc`:

        AP = sum_i ( precision@i * y_i ) / n_pos

    over rows ordered by score desc (id asc tie-break), where
    precision@i = (# positives in the first i rows) / i. Groups with
    no positives yield ap NULL. Rows with NULL score or label drop.

    Output: (*group_cols, n BIGINT, n_pos BIGINT, ap DOUBLE round 6).

    Plan: one exchange on the group keys — a row_number window and a
    running-sum window over the same sort, then one groupBy.
    """
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        *gcols,
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
        F.col(id_col).alias("__id"),
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    ranked = base.select(
        *gcols,
        "__y",
        F.row_number().over(w).alias("__i"),
        F.sum("__y").over(w).alias("__cum"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(
            F.when(
                F.col("__y") == 1,
                F.col("__cum").cast("double") / F.col("__i"),
            )
        ).alias("__ap_num"),
    )
    return agg.select(
        *gcols,
        "n",
        "n_pos",
        F.round(
            F.when(
                F.col("n_pos") > 0, F.col("__ap_num") / F.col("n_pos")
            ),
            6,
        ).alias("ap"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    feat_cols: Sequence[str],
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over numeric feature columns —
    the clustering showpiece of the fixed-budget-iteration family
    (g_pagerank, m_logit): with a FIXED iteration count and a
    deterministic seed (the k rows with the smallest `id_col` are the
    initial centroids), the entire optimization replays as an unrolled
    SQL oracle.

    Per iteration:
      1. assignment — each row goes to the nearest centroid by squared
         L2 distance, smallest centroid index on exact ties; this is
         pure broadcast-literal column arithmetic (no join, no UDF);
      2. update — one partial-aggregated groupBy over <= k keys takes
         per-dimension means, ROUNDED TO 6dp (the rounding pins the
         replayed trajectory: both engines see bit-identical centroid
         literals next round, so the discrete assignments cannot drift
         on accumulation-order ulps); clusters that lose all members
         drop out (both sides see the same survivor set).

    Driver traffic is the k x d rounded centroid table per round —
    model-sized (the BPE argmax-collect precedent); the data never
    leaves the executors. Rows with any NULL feature drop.

    Output after `iters` assignment rounds: one row per non-empty
    cluster (cluster INT, n BIGINT, c_<feat> DOUBLE round 6 — the
    mean of the final assignment, i.e. the next centroid).
    """
    feats = list(feat_cols)
    if not feats or k < 1 or iters < 1:
        raise ValueError("need features, k >= 1, iters >= 1")
    cond = F.col(id_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        F.col(id_col).alias("__id"),
        *[F.col(c).cast("double").alias(c) for c in feats],
    )
    # deterministic seed: the k smallest-id rows, in id order
    seed = base.orderBy("__id").limit(k).collect()
    centroids = [
        (j, [float(r[c]) for c in feats]) for j, r in enumerate(seed)
    ]

    def assign(cents):
        dists = [
            sum(
                (F.col(c) - F.lit(cv)) * (F.col(c) - F.lit(cv))
                for c, cv in zip(feats, vec)
            )
            for _, vec in cents
        ]
        best_c = F.lit(cents[0][0])
        best_d = dists[0]
        for (cid, _), d in zip(cents[1:], dists[1:]):
            best_c = F.when(d < best_d, F.lit(cid)).otherwise(best_c)
            best_d = F.when(d < best_d, d).otherwise(best_d)
        return base.select(
            "__id", *feats, best_c.cast("int").alias("cluster")
        )

    for it in range(iters):
        assigned = assign(centroids)
        means = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                (F.round(F.avg(c), 6) + F.lit(0.0)).alias(f"c_{c}")
                for c in feats
            ],
        )
        if it == iters - 1:
            return means.orderBy("cluster")
        rows = sorted(means.collect(), key=lambda r: r["cluster"])
        centroids = [
            (int(r["cluster"]), [float(r[f"c_{c}"]) for c in feats])
            for r in rows
        ]


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier — the
    calibration audit behind ECE: fixed-width score bins, and per bin
    the observed positive rate vs the mean predicted score.

    ``score_col`` must already be in [0, 1); bin = floor(score *
    n_bins) capped at n_bins - 1 (binning is pure arithmetic on the
    raw score — no transcendental reshaping here, so the bin edges are
    engine-exact). Rows with NULL score or label drop.

    Output: one row per non-empty bin (bin INT, n BIGINT, avg_score
    DOUBLE round 6, frac_pos DOUBLE round 6, gap DOUBLE round 6 =
    |frac_pos - avg_score|, the per-bin ECE contribution before
    weighting).

    Plan: one partial-aggregated groupBy over <= n_bins keys — nothing
    else.
    """
    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        sc.alias("__s"), lc.alias("__y")
    )
    b = F.least(
        F.floor(F.col("__s") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    agg = (
        base.select(b.alias("bin"), "__s", "__y")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__s"), 6).alias("avg_score"),
            F.round(F.avg(F.col("__y").cast("double")), 6).alias(
                "frac_pos"
            ),
        )
    )
    return agg.select(
        "bin",
        "n",
        "avg_score",
        "frac_pos",
        F.round(F.abs(F.col("frac_pos") - F.col("avg_score")), 6).alias(
            "gap"
        ),
    ).orderBy("bin")


def wilson_topk(
    df: DataFrame,
    item_cols: Sequence[str],
    label_col: str,
    k: int = 20,
    z: float = 1.96,
) -> DataFrame:
    """Wilson-score lower-bound ranking of binary outcomes per item —
    the "sort by positive rate without being fooled by tiny n" ranking
    (comment/quality-vote ordering, CTR ranking, acceptance-rate
    leaderboards):

        lb = (p + z²/2n − z·sqrt(p(1−p)/n + z²/4n²)) / (1 + z²/n)

    A 1-of-1 item (p = 1, n = 1) ranks below a 95-of-100 item — the
    property naive rate sorting lacks. label must be 0/1.

    Output: top-k rows (*item_cols, n BIGINT, pos BIGINT, rate DOUBLE
    round 6, wilson_lb DOUBLE round 6), ordered by (wilson_lb DESC,
    *item_cols) — the cut runs on the ROUNDED score (ulp-proof
    membership, the repo's top-k rule).

    Plan: one item-keyed two-counter agg, then pure arithmetic and a
    TakeOrdered — no second shuffle.
    """
    icols = list(item_cols)
    if not icols:
        raise ValueError("item_cols must be non-empty")
    lc = F.col(label_col).cast("int")
    agg = (
        df.filter(lc.isNotNull())
        .groupBy(*icols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(lc).cast("long").alias("pos"),
        )
    )
    nd = F.col("n").cast("double")
    p = F.col("pos").cast("double") / nd
    z2 = F.lit(z * z)
    lb = (
        p
        + z2 / (F.lit(2.0) * nd)
        - F.lit(z)
        * F.sqrt(
            p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd)
        )
    ) / (F.lit(1.0) + z2 / nd)
    scored = agg.select(
        *icols,
        "n",
        "pos",
        F.round(p, 6).alias("rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )
    return scored.orderBy(
        F.col("wilson_lb").desc(), *[F.col(c).asc() for c in icols]
    ).limit(k)


def cronbach_alpha(
    df: DataFrame,
    item_cols: Sequence[str],
) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability of k item
    columns (Cronbach 1951) — do the items measure one underlying
    construct? The survey/rubric/multi-judge-score sanity check:

        alpha = k/(k−1) · (1 − sum_i var(item_i) / var(total))

    with sample variances (n−1 denominator) and total = sum of items
    per row. Rows with any NULL item drop.

    Output: ONE row (k BIGINT, n BIGINT, alpha DOUBLE round 6) —
    alpha NULL when n < 2 or var(total) = 0.

    Plan: ONE 1-row aggregation of per-item sums/sum-of-squares and
    the total's moments — 2k+3 partial-aggregated counters, no
    shuffle beyond the combine tree. alpha is a variance RATIO, so
    engine accumulation-order noise cancels to ~1e-10 relative (the
    m_anova rounding argument).
    """
    items = list(item_cols)
    if len(items) < 2:
        raise ValueError("need >= 2 items")
    cond = F.lit(True)
    for c in items:
        cond = cond & F.col(c).isNotNull()
    tot = None
    for c in items:
        tc = F.col(c).cast("double")
        tot = tc if tot is None else tot + tc
    base = df.filter(cond).select(
        *[F.col(c).cast("double").alias(c) for c in items],
        tot.alias("__t"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in items:
        aggs.append(F.sum(F.col(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"__q_{c}"))
    aggs.append(F.sum("__t").alias("__st"))
    aggs.append(F.sum(F.col("__t") * F.col("__t")).alias("__qt"))
    g = base.agg(*aggs)
    nd = F.col("n").cast("double")

    def var(s, q):
        return (q - s * s / nd) / (nd - F.lit(1.0))

    item_var = None
    for c in items:
        v = var(F.col(f"__s_{c}"), F.col(f"__q_{c}"))
        item_var = v if item_var is None else item_var + v
    tot_var = var(F.col("__st"), F.col("__qt"))
    kk = float(len(items))
    alpha = F.lit(kk / (kk - 1.0)) * (F.lit(1.0) - item_var / tot_var)
    return g.select(
        F.lit(len(items)).cast("long").alias("k"),
        "n",
        (
            F.round(
                F.when((F.col("n") >= 2) & (tot_var > 0), alpha), 6
            )
            + F.lit(0.0)
        ).alias("alpha"),
    )


def silhouette_by_centroid(
    df: DataFrame,
    label_col: str,
    feat_cols: Sequence[str],
) -> DataFrame:
    """Simplified (centroid-based) silhouette score per cluster — the
    cluster-quality audit for `kmeans_fit` / label assignments at
    corpus scale: per point, a = euclidean distance to its OWN
    cluster centroid, b = to the NEAREST OTHER centroid,
    s = (b − a) / max(a, b) (0 when both distances are 0). The full
    silhouette's O(n²) pairwise distances never materialize — this is
    the O(n·k) form every large-scale library ships.

    Centroids are per-dimension means ROUNDED TO 6dp (the kmeans_fit
    trajectory device: both engines then score against bit-identical
    centroid literals). Requires >= 2 clusters (b is NULL otherwise —
    the caller should see the hole, not a fake score). Rows with NULL
    label/features drop.

    Output: one row per cluster (label, n BIGINT, mean_sil DOUBLE
    round 6).

    Plan: one k-key groupBy for centroids (model-sized collect, the
    BPE precedent), then per-point broadcast-literal arithmetic and
    one label-keyed agg — the corpus is read twice and never joined.
    """
    feats = list(feat_cols)
    if not feats:
        raise ValueError("feat_cols must be non-empty")
    cond = F.col(label_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        F.col(label_col).alias("__l"),
        *[F.col(c).cast("double").alias(c) for c in feats],
    )
    cents = base.groupBy("__l").agg(
        *[
            (F.round(F.avg(c), 6) + F.lit(0.0)).alias(f"c_{c}")
            for c in feats
        ]
    )
    rows = cents.collect()  # model-sized: k x d
    if len(rows) < 2:
        raise ValueError("need >= 2 clusters for silhouette")

    def dist(vec):
        s = None
        for c, cv in zip(feats, vec):
            t = (F.col(c) - F.lit(cv)) * (F.col(c) - F.lit(cv))
            s = t if s is None else s + t
        return F.sqrt(s)

    a_expr = None
    b_expr = None
    for r in rows:
        lab = r["__l"]
        d = dist([float(r[f"c_{c}"]) for c in feats])
        own = F.when(F.col("__l") == F.lit(lab), d)
        other = F.when(F.col("__l") != F.lit(lab), d)
        a_expr = own if a_expr is None else F.coalesce(a_expr, own)
        b_expr = other if b_expr is None else F.least(b_expr, other)
    scored = base.select(
        "__l",
        a_expr.alias("__a"),
        b_expr.alias("__b"),
    )
    s = F.when(
        F.greatest(F.col("__a"), F.col("__b")) > 0,
        (F.col("__b") - F.col("__a"))
        / F.greatest(F.col("__a"), F.col("__b")),
    ).otherwise(F.lit(0.0))
    return (
        scored.groupBy(F.col("__l").alias(label_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.avg(s), 6) + F.lit(0.0)).alias("mean_sil"),
        )
    )


def pca_power_topvec(
    df: DataFrame,
    feat_cols: Sequence[str],
    iters: int = 2,
) -> DataFrame:
    """Leading principal component by fixed-iteration power method —
    PCA without a linear-algebra library, as pure 1-row column
    arithmetic (the v_kmeans / m_logit fixed-budget family): the
    sample covariance of the feature columns is built from one
    partial-aggregated sums pass, ROUNDED TO 6dp (pinning the
    trajectory on both engines), then `iters` rounds of v ← C·v /
    ||C·v|| starting from e1 run as expressions ON THE 1-ROW FRAME —
    no collect, no driver math, no MLlib.

    Output: ONE row (n BIGINT, rayleigh DOUBLE round 6 — the Rayleigh
    quotient v'Cv after the final round, the eigenvalue estimate —
    and v_<feat> DOUBLE round 6 loading components). Sign convention: whatever the e1-seeded
    trajectory produces (deterministic; callers wanting a canonical
    sign flip on the first component's sign themselves).

    The d² covariance expressions bound d to expression-tree scale
    (fine to ~32 dims; use `embedding_covariance`'s mapInPandas grid
    + a driver eigensolver beyond that — documented boundary, not a
    silent cap).
    """
    feats = list(feat_cols)
    d = len(feats)
    if d < 2:
        raise ValueError("need >= 2 features")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    cond = F.lit(True)
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        *[F.col(c).cast("double").alias(c) for c in feats]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, ci in enumerate(feats):
        aggs.append(F.sum(F.col(ci)).alias(f"__s{i}"))
        for j, cj in enumerate(feats):
            if i <= j:
                aggs.append(
                    F.sum(F.col(ci) * F.col(cj)).alias(f"__q{i}{j}")
                )
    g = base.agg(*aggs)
    nd = F.col("n").cast("double")

    def cov(i, j):
        a, b = min(i, j), max(i, j)
        raw = (
            F.col(f"__q{a}{b}")
            - F.col(f"__s{a}") * F.col(f"__s{b}") / nd
        ) / (nd - F.lit(1.0))
        return F.round(raw, 6) + F.lit(0.0)

    withc = g.select(
        "n",
        *[
            (cov(i, j)).alias(f"__c{i}{j}")
            for i in range(d)
            for j in range(d)
            if i <= j
        ],
    )

    def c_ref(i, j):
        a, b = min(i, j), max(i, j)
        return F.col(f"__c{a}{b}")

    # power iterations as expressions on the 1-row frame
    v = [F.lit(1.0)] + [F.lit(0.0)] * (d - 1)  # e1 seed
    u = v
    for _ in range(iters):
        u = []
        for i in range(d):
            acc = None
            for j in range(d):
                t = c_ref(i, j) * v[j]
                acc = t if acc is None else acc + t
            u.append(acc)
        norm = None
        for i in range(d):
            t = u[i] * u[i]
            norm = t if norm is None else norm + t
        norm = F.sqrt(norm)
        v = [u[i] / norm for i in range(d)]
    lam = None
    for i in range(d):
        acc = None
        for j in range(d):
            t = c_ref(i, j) * v[j]
            acc = t if acc is None else acc + t
        t = v[i] * acc
        lam = t if lam is None else lam + t
    return withc.select(
        "n",
        (F.round(lam, 6) + F.lit(0.0)).alias("rayleigh"),
        *[
            (F.round(v[i], 6) + F.lit(0.0)).alias(f"v_{feats[i]}")
            for i in range(d)
        ],
    )


def _cum_score_ladder(
    df: DataFrame,
    score_col: str,
    label_col: str,
    name: str,
    max_cells: int | None,
    ladder_cells: int,
    n_buckets: int,
) -> DataFrame:
    """Shared curve device behind `roc_points` / `pr_points`: collapse
    to distinct-score (pos, neg) cells (tripwired), then the
    score-DESCENDING cumulative ladder — through the bucketed-offset
    re-cut above `ladder_cells`, else one plain window — returning
    (__s, __cp, __cn, __P, __N): cumulative and total positive/
    negative counts at every distinct score threshold."""
    from ._guards import _assert_cell_bound
    from ._ladder import bucketed_running_sums

    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        sc.alias("__s"), lc.alias("__y")
    )
    est = _assert_cell_bound(
        base, ["__s"], name, max_cells,
        plan_word="distinct-score curve ladder",
    )
    cells = base.groupBy("__s").agg(
        F.sum("__y").alias("__pos"),
        F.sum(F.lit(1) - F.col("__y")).alias("__neg"),
    )
    r = None
    if est is not None and est > ladder_cells:
        # one checkpointed snapshot serves BOTH the bucketed ladder and
        # the totals (review-caught: an un-checkpointed tot re-ran the
        # data-sized distinct-score collapse)
        cells = cells.localCheckpoint(eager=True)
        lad = bucketed_running_sums(
            cells, "__s", ["__pos", "__neg"], ["__cp", "__cn"],
            n_buckets=n_buckets, descending=True,
            assume_checkpointed=True,
        )
        if lad is not None:
            tot = cells.agg(
                F.sum("__pos").alias("__P"),
                F.sum("__neg").alias("__N"),
            )
            r = lad.crossJoin(F.broadcast(tot)).select(
                "__s", "__cp", "__cn", "__P", "__N"
            )
    if r is None:
        w_cum = Window.orderBy(F.col("__s").desc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_all = Window.partitionBy()
        r = cells.select(
            "__s",
            F.sum("__pos").over(w_cum).alias("__cp"),
            F.sum("__neg").over(w_cum).alias("__cn"),
            F.sum("__pos").over(w_all).alias("__P"),
            F.sum("__neg").over(w_all).alias("__N"),
        )
    return r


def roc_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """ROC curve operating points at every distinct score threshold —
    the full curve behind `group_auc`'s scalar: at threshold t
    (classify positive when score >= t), TPR = positives scored >= t
    over all positives, FPR likewise over negatives. Ties merge (the
    groupBy collapses them before the score-descending cumulative
    ladder), so each distinct score yields exactly one point. label
    must be 0/1.

    PRE-BUCKET the score for dense continuous scores (round/quantize
    first) — the output has one row per distinct score by definition.

    Output: (score DOUBLE, tpr DOUBLE round 6, fpr DOUBLE round 6),
    score-descending (the curve from (0,0) toward (1,1)).

    Plan: the corpus collapses FIRST to a distinct-score (pos, neg)
    count table (one partial-aggregated groupBy; ENFORCED by the
    `max_cells` tripwire since round 12); the cumulative windows then
    run over that SMALL cell table only — the `classifier_report`
    device, so no raw-row relation ever enters an unpartitioned
    window (the round-8 single-partition-sort fix). Above
    `ladder_cells` estimated distinct scores the score-descending
    ladder re-cuts through the bucketed-offset device
    (`_ladder.bucketed_running_sums`, the fdr_correct re-cut
    generalized) and the totals come from a 1-row broadcast agg —
    bit-identical (integer counts), no single-task sort. Integer
    counts make every point exact rational arithmetic.
    """
    r = _cum_score_ladder(
        df, score_col, label_col, "roc_points",
        max_cells, ladder_cells, n_buckets,
    )
    return r.select(
        F.col("__s").alias("score"),
        F.round(
            F.when(
                F.col("__P") > 0,
                F.col("__cp").cast("double") / F.col("__P"),
            ),
            6,
        ).alias("tpr"),
        F.round(
            F.when(
                F.col("__N") > 0,
                F.col("__cn").cast("double") / F.col("__N"),
            ),
            6,
        ).alias("fpr"),
    ).orderBy(F.col("score").desc())


def pr_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Precision-recall curve at every distinct score threshold — the
    class-imbalance-honest companion to `roc_points` (on a 1:10³
    positive:negative corpus the ROC curve can look perfect while
    precision is 1%; retrieval and rare-event pipelines read THIS
    curve): at threshold t (positive when score >= t),

        precision = cum_pos / (cum_pos + cum_neg)
        recall    = cum_pos / total_pos
        f1        = harmonic mean (NULL when precision + recall = 0)

    Same device as roc_points (`_cum_score_ladder`): distinct-score
    cells first (tripwired), bucketed-offset ladder above
    `ladder_cells`, integer counts → exact rational points. Ties
    merge; pre-bucket dense scores. Output: (score DOUBLE,
    precision, recall, f1 DOUBLE round 6), score-descending. The
    denominator cum_pos + cum_neg is the number of rows scored >= t,
    always > 0 at every emitted threshold."""
    r = _cum_score_ladder(
        df, score_col, label_col, "pr_points",
        max_cells, ladder_cells, n_buckets,
    )
    prec = F.col("__cp").cast("double") / (F.col("__cp") + F.col("__cn"))
    rec = F.when(
        F.col("__P") > 0, F.col("__cp").cast("double") / F.col("__P")
    )
    f1 = F.when(
        prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
    )
    return r.select(
        F.col("__s").alias("score"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy(F.col("score").desc())


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    feat_cols: Sequence[str],
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Final cluster ASSIGNMENTS of the `kmeans_fit` trajectory —
    identical seed (k smallest ids), identical 6dp-pinned centroid
    updates, identical tie-breaks, but returning the per-row label
    (id, cluster INT) after `iters` assignment rounds instead of the
    cluster summary — the input `rand_index`/downstream joins need.
    Same plan economics as kmeans_fit: broadcast-literal assignment
    arithmetic + one k-key groupBy per round, k x d driver traffic.
    """
    feats = list(feat_cols)
    if not feats or k < 1 or iters < 1:
        raise ValueError("need features, k >= 1, iters >= 1")
    cond = F.col(id_col).isNotNull()
    for c in feats:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond).select(
        F.col(id_col).alias("__id"),
        *[F.col(c).cast("double").alias(c) for c in feats],
    )
    seed = base.orderBy("__id").limit(k).collect()
    centroids = [
        (j, [float(r[c]) for c in feats]) for j, r in enumerate(seed)
    ]

    def assign(cents):
        dists = [
            sum(
                (F.col(c) - F.lit(cv)) * (F.col(c) - F.lit(cv))
                for c, cv in zip(feats, vec)
            )
            for _, vec in cents
        ]
        best_c = F.lit(cents[0][0])
        best_d = dists[0]
        for (cid, _), d in zip(cents[1:], dists[1:]):
            best_c = F.when(d < best_d, F.lit(cid)).otherwise(best_c)
            best_d = F.when(d < best_d, d).otherwise(best_d)
        return base.select(
            "__id", *feats, best_c.cast("int").alias("cluster")
        )

    for it in range(iters):
        assigned = assign(centroids)
        if it == iters - 1:
            return assigned.select(
                F.col("__id").alias(id_col), "cluster"
            )
        means = assigned.groupBy("cluster").agg(
            *[
                (F.round(F.avg(c), 6) + F.lit(0.0)).alias(f"c_{c}")
                for c in feats
            ],
        )
        rows = sorted(means.collect(), key=lambda r: r["cluster"])
        centroids = [
            (int(r["cluster"]), [float(r[f"c_{c}"]) for c in feats])
            for r in rows
        ]


def rand_index(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Rand index + adjusted Rand index between two labelings of the
    same rows (Hubert & Arabie 1985) — does the clustering recover
    the reference partition? The clustering-evaluation closer for
    `kmeans_fit`/`kmeans_assign`: pair-counting agreement, chance-
    corrected in the ARI.

        RI  = (C(n,2) + 2·Σ C(n_ij,2) − Σ C(a_i,2) − Σ C(b_j,2))
              / C(n,2)
        ARI = (Σ C(n_ij,2) − E) / ((Σ C(a_i,2) + Σ C(b_j,2))/2 − E),
        E   = Σ C(a_i,2) · Σ C(b_j,2) / C(n,2)

    All pair counts are exact BIGINTs (no pair enumeration — the
    contingency-table identity); ARI NULL when the denominator is 0
    (both partitions trivial). NULL labels drop.

    Output: ONE row (n, s_cells, s_a, s_b BIGINT, rand DOUBLE
    round 6, ari DOUBLE round 6).

    Plan: one (a, b)-keyed cell count + two category-sized marginal
    re-aggs of the CELL table + a 1-row combine (the cramers_v
    shape).
    """
    base = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
    cells = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).alias("__c")
    )

    def pairs(c):
        return c * (c - F.lit(1)) / F.lit(2)

    sc = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(pairs(F.col("__c"))).cast("long").alias("s_cells"),
    )
    sa = (
        cells.groupBy("__a")
        .agg(F.sum("__c").alias("__ai"))
        .agg(F.sum(pairs(F.col("__ai"))).cast("long").alias("s_a"))
    )
    sb = (
        cells.groupBy("__b")
        .agg(F.sum("__c").alias("__bj"))
        .agg(F.sum(pairs(F.col("__bj"))).cast("long").alias("s_b"))
    )
    g = sc.join(F.broadcast(sa)).join(F.broadcast(sb))
    nd = F.col("n").cast("double")
    total = nd * (nd - F.lit(1.0)) / F.lit(2.0)
    sij = F.col("s_cells").cast("double")
    sad = F.col("s_a").cast("double")
    sbd = F.col("s_b").cast("double")
    exp = sad * sbd / total
    den = (sad + sbd) / F.lit(2.0) - exp
    return g.select(
        "n",
        "s_cells",
        "s_a",
        "s_b",
        F.round(
            F.when(
                total > 0,
                (total + F.lit(2.0) * sij - sad - sbd) / total,
            ),
            6,
        ).alias("rand"),
        (
            F.round(F.when(den != 0, (sij - exp) / den), 6)
            + F.lit(0.0)
        ).alias("ari"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str,
    cat_col: str,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement among a FIXED number
    of raters per item (Fleiss 1971), the n-rater generalization of
    Cohen's kappa (m_cohens_kappa handles exactly 2): the multi-judge
    labeling-consistency gate for annotation pipelines.

    Input: one row per individual rating (item, category). Every item
    must carry the same number of ratings n — validated with a 1-row
    check (raise, don't silently mis-weight).

        P_i   = (sum_j n_ij² − n) / (n(n−1))
        p_j   = category share over all ratings
        kappa = (mean P_i − sum p_j²) / (1 − sum p_j²)

    Output: ONE row (n_items BIGINT, n_raters BIGINT, p_bar, p_e,
    kappa DOUBLE round 6); kappa NULL at the p_e = 1 degeneracy
    (all ratings one category).

    Plan: one (item, category)-keyed count (partial-aggregated), an
    item-keyed P_i agg, a category-keyed share agg, 1-row combines.
    """
    base = ratings.filter(
        F.col(item_col).isNotNull() & F.col(cat_col).isNotNull()
    ).select(F.col(item_col).alias("__i"), F.col(cat_col).alias("__c"))
    cells = base.groupBy("__i", "__c").agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    per_item = cells.groupBy("__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sq"),
    )
    chk = per_item.agg(
        F.min("__ni").alias("lo"), F.max("__ni").alias("hi")
    ).collect()[0]
    if chk["lo"] != chk["hi"]:
        raise ValueError(
            f"fleiss_kappa: ratings per item vary ({chk['lo']}–{chk['hi']})"
        )
    n = float(chk["lo"])
    if n < 2:
        raise ValueError("fleiss_kappa: need >= 2 raters per item")
    pi = per_item.select(
        (
            (F.col("__sq") - F.lit(n)) / F.lit(n * (n - 1.0))
        ).alias("__pi")
    )
    pbar = pi.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.avg("__pi").alias("__pbar"),
    )
    shares = cells.groupBy("__c").agg(F.sum("__n").alias("__cn"))
    tot = shares.agg(F.sum("__cn").alias("__t"))
    pe = (
        shares.join(F.broadcast(tot))
        .select(
            (
                (F.col("__cn") / F.col("__t"))
                * (F.col("__cn") / F.col("__t"))
            ).alias("__p2")
        )
        .agg(F.sum("__p2").alias("__pe"))
    )
    g = pbar.join(F.broadcast(pe))
    kappa = (F.col("__pbar") - F.col("__pe")) / (
        F.lit(1.0) - F.col("__pe")
    )
    return g.select(
        "n_items",
        F.lit(int(n)).cast("long").alias("n_raters"),
        (F.round(F.col("__pbar"), 6) + F.lit(0.0)).alias("p_bar"),
        F.round(F.col("__pe"), 6).alias("p_e"),
        (
            F.round(
                F.when(F.col("__pe") < 1.0, kappa), 6
            )
            + F.lit(0.0)
        ).alias("kappa"),
    )


def classifier_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """One-call probabilistic-classifier report — AUC, KS separation,
    Brier score and 10-bin ECE in a single pass, the "is this score
    any good?" dashboard row (m_group_auc / m_ks_lift / m_calibration
    each give one lens; this gives the row a monitoring table wants).

    ``score_col`` must be in [0, 1]. The corpus collapses FIRST to a
    distinct-score (pos, neg) count table — AUC and KS then come from
    cumulative windows over that SMALL table (ties handled exactly:
    AUC counts a tied pair 1/2, the rank-form identity), so no
    corpus-sized global sort ever happens (an unpartitioned
    row-number over raw rows would single-partition at scale; this
    is the scale-honest formulation):

        AUC   = sum_s neg_s · (cum_pos_<s + pos_s/2) / (P·N)
        KS    = max_s |F1(s) − F0(s)|
        Brier = mean (p − y)²          (row-level partial agg)
        ECE   = sum_b (n_b/n) · |acc_b − conf_b|   (10 bins)

    Output: ONE row (n, n_pos BIGINT, auc, ks, brier, ece DOUBLE
    round 6); AUC/KS NULL when either class is empty.
    """
    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        sc.alias("__p"), lc.alias("__y")
    )
    # distinct-score class counts (vocabulary-sized)
    cells = base.groupBy("__p").agg(
        F.sum("__y").cast("long").alias("__pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("__neg"),
    )
    w_prev = Window.orderBy("__p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    r = cells.select(
        "__pos",
        "__neg",
        F.coalesce(F.sum("__pos").over(w_prev), F.lit(0)).alias(
            "__cum_pos"
        ),
        F.sum("__pos").over(w_all).alias("__P"),
        F.sum("__neg").over(w_all).alias("__N"),
    )
    pd_ = F.col("__P").cast("double")
    nd_ = F.col("__N").cast("double")
    # for each negative at score s: positives STRICTLY ABOVE s count 1,
    # ties count 1/2 (the rank-form identity). The first cut of this
    # operator used cum_pos BELOW s — that computes 1 − AUC, and the
    # oracle replayed the same inversion (green against itself); the
    # perfect-scorer hand test is what caught it.
    auc_num = F.sum(
        F.col("__neg").cast("double")
        * (
            (
                F.col("__P").cast("double")
                - F.col("__cum_pos").cast("double")
                - F.col("__pos").cast("double")
            )
            + F.col("__pos").cast("double") / F.lit(2.0)
        )
    )
    ks_term = F.abs(
        (F.col("__cum_pos") + F.col("__pos")).cast("double") / pd_
        - (
            F.coalesce(F.sum("__neg").over(w_prev), F.lit(0))
            + F.col("__neg")
        ).cast("double")
        / nd_
    )
    curve = r.select(
        "__pos", "__neg", "__cum_pos", "__P", "__N",
        ks_term.alias("__ks"),
    ).groupBy("__P", "__N").agg(
        auc_num.alias("__auc_num"), F.max("__ks").alias("__ks_max")
    )
    # row-level Brier + binned ECE (one pass each, partial-aggregated)
    b = F.least(F.floor(F.col("__p") * 10).cast("int"), F.lit(9))
    bins = (
        base.select(b.alias("__b"), "__p", "__y")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__nb"),
            F.avg("__p").alias("__conf"),
            F.avg(F.col("__y").cast("double")).alias("__acc"),
        )
    )
    brier = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.avg(
            (F.col("__p") - F.col("__y").cast("double"))
            * (F.col("__p") - F.col("__y").cast("double"))
        ).alias("__brier"),
    )
    ece = bins.join(
        F.broadcast(bins.agg(F.sum("__nb").alias("__tot")))
    ).agg(
        F.sum(
            F.col("__nb")
            / F.col("__tot")
            * F.abs(F.col("__acc") - F.col("__conf"))
        ).alias("__ece")
    )
    g = brier.join(F.broadcast(curve)).join(F.broadcast(ece))
    ok = (F.col("__P") > 0) & (F.col("__N") > 0)
    return g.select(
        "n",
        "n_pos",
        F.round(
            F.when(
                ok,
                F.col("__auc_num")
                / (F.col("__P").cast("double") * F.col("__N").cast("double")),
            ),
            6,
        ).alias("auc"),
        F.round(F.when(ok, F.col("__ks_max")), 6).alias("ks"),
        F.round(F.col("__brier"), 6).alias("brier"),
        F.round(F.col("__ece"), 6).alias("ece"),
    )


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over forecast
    bins — WHY is the score what it is?

        REL = sum_b (n_b/n)·(conf_b − acc_b)²   (calibration error)
        RES = sum_b (n_b/n)·(acc_b − base)²     (discrimination)
        UNC = base·(1 − base)                   (irreducible)
        Brier = REL − RES + UNC + residual

    where `residual` is the within-bin variance term binning
    introduces (exactly 0 only when forecasts are constant within
    bins) — reported honestly instead of pretending the identity is
    exact. ``score_col`` must be in [0, 1].

    Output: ONE row (n BIGINT, brier, rel, res, unc, residual DOUBLE
    round 6).

    Plan: one n_bins-cell agg + one 1-row base-rate/Brier agg — the
    calibration_bins economics.
    """
    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        sc.alias("__p"), lc.alias("__y")
    )
    b = F.least(
        F.floor(F.col("__p") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = (
        base.select(b.alias("__b"), "__p", "__y")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__nb"),
            F.avg("__p").alias("__conf"),
            F.avg(F.col("__y").cast("double")).alias("__acc"),
        )
    )
    g0 = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("__y").cast("double")).alias("__base"),
        F.avg(
            (F.col("__p") - F.col("__y").cast("double"))
            * (F.col("__p") - F.col("__y").cast("double"))
        ).alias("__brier"),
    )
    terms = bins.join(F.broadcast(g0)).agg(
        F.max("n").alias("n"),
        F.max("__base").alias("__base"),
        F.max("__brier").alias("__brier"),
        F.sum(
            F.col("__nb")
            / F.col("n").cast("double")
            * (F.col("__conf") - F.col("__acc"))
            * (F.col("__conf") - F.col("__acc"))
        ).alias("__rel"),
        F.sum(
            F.col("__nb")
            / F.col("n").cast("double")
            * (F.col("__acc") - F.col("__base"))
            * (F.col("__acc") - F.col("__base"))
        ).alias("__res"),
    )
    unc = F.col("__base") * (F.lit(1.0) - F.col("__base"))
    resid = F.col("__brier") - (
        F.col("__rel") - F.col("__res") + unc
    )
    return terms.select(
        "n",
        F.round(F.col("__brier"), 6).alias("brier"),
        F.round(F.col("__rel"), 6).alias("rel"),
        F.round(F.col("__res"), 6).alias("res"),
        F.round(unc, 6).alias("unc"),
        (F.round(resid, 6) + F.lit(0.0)).alias("residual"),
    )


def icc_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1)
    (Shrout & Fleiss 1979 case 1) — how much of the variance is
    BETWEEN subjects? The rater-reliability / repeated-measures
    companion of `cronbach_alpha`:

        MSB = SSB / (g - 1),   MSW = SSW / (N - g)
        n0  = (N - sum n_g² / N) / (g - 1)     (unbalanced correction)
        ICC = (MSB - MSW) / (MSB + (n0 - 1) MSW)

    Output: ONE row (n BIGINT, groups BIGINT, msb, msw DOUBLE round 6,
    icc DOUBLE round 6); NULL when g < 2, N <= g, or the denominator
    vanishes. Groups with one observation still contribute to MSB.

    Plan: one group-keyed moment agg + 1-row folds — the anova_oneway
    combiner tree with the n0 correction added.
    """
    gc = F.col(group_col)
    vc = F.col(value_col).cast("double")
    base = df.filter(gc.isNotNull() & vc.isNotNull()).select(
        gc.alias("__g"), vc.alias("__v")
    )
    per_g = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    g = per_g.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("groups"),
        F.sum("__s").alias("__ts"),
        F.sum("__q").alias("__tq"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias(
            "__sb"
        ),
        F.sum(F.col("__n") * F.col("__n")).alias("__nn"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("groups").cast("double")
    ssb = F.col("__sb") - F.col("__ts") * F.col("__ts") / nd
    ssw = F.col("__tq") - F.col("__sb")
    msb = ssb / (kd - 1)
    msw = ssw / (nd - kd)
    n0 = (nd - F.col("__nn") / nd) / (kd - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    ok = (
        (F.col("groups") >= 2)
        & (nd > kd)
        & ((msb + (n0 - 1) * msw) > 0)
    )
    return g.select(
        "n",
        "groups",
        (F.round(F.when(ok, msb), 6) + F.lit(0.0)).alias("msb"),
        (F.round(F.when(ok, msw), 6) + F.lit(0.0)).alias("msw"),
        (F.round(F.when(ok, icc), 6) + F.lit(0.0)).alias("icc"),
    )


def auc_delong(
    df: DataFrame,
    label_col: str,
    score_col: str,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """AUC with the DeLong variance (DeLong, DeLong & Clarke-Pearson
    1988) — the number every "is model A better than B" comparison
    needs beside the point AUC: the standard error from the structural
    components, so confidence intervals and paired tests don't lean on
    the (badly biased) Hanley-McNeil approximation:

        V10(pos at s) = (#neg < s + 0.5 #neg = s) / n     (placement)
        V01(neg at s) = (#pos > s + 0.5 #pos = s) / m
        AUC = mean(V10) = mean(V01)
        SE² = var(V10)/m + var(V01)/n      (sample variances, n-1)

    label must be 0/1. Output: ONE row (n_pos, n_neg BIGINT, auc, se
    DOUBLE round 6); NULL when either class is empty (or a variance is
    undefined at m or n = 1 → se NULL, auc still emitted).

    Plan: the collapse-first discipline — distinct-score cells
    (tripwire-enforced) carry per-class counts; ONE cumulative window
    prices every placement (V10/V01 are constant within a cell, so the
    variances are weighted cell folds); 1-row finish. No raw-row
    ranks, no pos × neg pair relation."""
    yc = F.col(label_col).cast("int")
    sc = F.col(score_col).cast("double")
    base = df.filter(yc.isNotNull() & sc.isNotNull()).select(
        yc.alias("__y"), sc.alias("__s")
    )
    _assert_cell_bound(
        base, ["__s"], "auc_delong", max_cells,
        plan_word="distinct-score placement ladder",
    )
    cells = base.groupBy("__s").agg(
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0))
        .cast("double").alias("__p"),
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0))
        .cast("double").alias("__q"),
    )
    tot = cells.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__q").cast("long").alias("n_neg"),
    )
    w_prev = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_after = Window.orderBy(F.col("__s").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lad = cells.crossJoin(F.broadcast(tot)).select(
        "__p",
        "__q",
        "n_pos",
        "n_neg",
        (
            (
                F.coalesce(F.sum("__q").over(w_prev), F.lit(0.0))
                + F.col("__q") / 2
            )
            / F.col("n_neg")
        ).alias("__v10"),
        (
            (
                F.coalesce(F.sum("__p").over(w_after), F.lit(0.0))
                + F.col("__p") / 2
            )
            / F.col("n_pos")
        ).alias("__v01"),
    )
    g = lad.groupBy("n_pos", "n_neg").agg(
        F.sum(F.col("__p") * F.col("__v10")).alias("__s10"),
        F.sum(
            F.col("__p") * F.col("__v10") * F.col("__v10")
        ).alias("__ss10"),
        F.sum(F.col("__q") * F.col("__v01")).alias("__s01"),
        F.sum(
            F.col("__q") * F.col("__v01") * F.col("__v01")
        ).alias("__ss01"),
    )
    m = F.col("n_pos").cast("double")
    n = F.col("n_neg").cast("double")
    auc = F.col("__s10") / m
    var10 = (F.col("__ss10") - m * auc * auc) / (m - 1)
    mean01 = F.col("__s01") / n
    var01 = (F.col("__ss01") - n * mean01 * mean01) / (n - 1)
    se = F.sqrt(var10 / m + var01 / n)
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    ok_se = ok & (F.col("n_pos") > 1) & (F.col("n_neg") > 1)
    return g.select(
        "n_pos",
        "n_neg",
        (F.round(F.when(ok, auc), 6) + F.lit(0.0)).alias("auc"),
        (F.round(F.when(ok_se, se), 6) + F.lit(0.0)).alias("se"),
    )


def mrr_eval(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Mean reciprocal rank + hit-rate@k over scored candidate lists —
    the first-relevant-result retrieval metric beside ndcg_at_k
    (graded gain) and average_precision (all-relevant): MRR rewards
    putting ONE right answer first, the metric of record for QA /
    entity-lookup / nearest-duplicate retrieval.

    Computed WITHOUT per-query rank windows: under the total order
    (score DESC, id ASC), the first relevant rank is

        1 + #{candidates strictly ahead of the best relevant one}

    so the whole metric is (a) two query-keyed aggs taking each
    query's best relevant candidate (max score, then min id among the
    score ties — type-generic, so string ids work); (b) one
    query-keyed equi-join of that (query-sized) table back onto the
    candidates; (c) one conditional count + the final fold. A rank
    window would sort every query's full candidate list; this shape
    never globally sorts anything.

    Queries with NO relevant candidate contribute reciprocal rank 0
    and miss @k (the standard convention — they stay in the
    denominator). Output (1 row): n_queries BIGINT, mrr DOUBLE round
    6, hit_rate_at_k DOUBLE round 6."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = F.col(query_col)
    cid = F.col(id_col)
    sc = F.col(score_col).cast("double")
    rel = F.col(rel_col).cast("boolean")
    nn = df.filter(q.isNotNull() & cid.isNotNull() & sc.isNotNull())
    # best relevant = max score, then MIN id among score ties — two
    # query-keyed aggs so the tie-break works for ANY orderable id
    # type (negating the id inside a struct-max would cast string ids
    # to DOUBLE: an ANSI crash, or silent NULL misranks without ANSI)
    bs = (
        nn.filter(rel)
        .groupBy(q.alias("__q"))
        .agg(F.max(sc).alias("__bs"))
    )
    best = (
        nn.join(bs, nn[query_col] == bs["__q"], "inner")
        .filter(rel & (sc == F.col("__bs")))
        .groupBy("__q")
        .agg(F.max(sc).alias("__bs2"), F.min(cid).alias("__bid"))
        .select(
            "__q",
            F.col("__bs2").alias("__bs"),
            "__bid",
        )
    )
    ranks = (
        nn.join(best, nn[query_col] == best["__q"], "inner")
        .groupBy("__q")
        .agg(
            F.sum(
                F.when(
                    (sc > F.col("__bs"))
                    | ((sc == F.col("__bs")) & (cid < F.col("__bid"))),
                    1,
                ).otherwise(0)
            ).alias("__ahead")
        )
        .select("__q", (F.col("__ahead") + 1).alias("__rank"))
    )
    allq = nn.select(q.alias("__q")).distinct()
    per = allq.join(ranks, on="__q", how="left")
    return per.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (
            F.round(
                F.avg(
                    F.when(
                        F.col("__rank").isNotNull(),
                        F.lit(1.0) / F.col("__rank"),
                    ).otherwise(F.lit(0.0))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("mrr"),
        (
            F.round(
                F.avg(
                    F.when(F.col("__rank") <= k, F.lit(1.0)).otherwise(
                        F.lit(0.0)
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("hit_rate_at_k"),
    )


def ece_summary(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error — `calibration_bins` folded to the
    headline pair every model card quotes:

        ECE = Σ_b (n_b / N) |frac_pos_b − avg_score_b|
        MCE = max_b |frac_pos_b − avg_score_b|

    Same fixed-width binning contract as calibration_bins (score in
    [0, 1]; bin edges are pure arithmetic, engine-exact) — and the
    contract is VALIDATED (round-12 ADVICE; round-14 ADVICE relaxes
    the upper edge): scores outside [0, 1] RAISE via one (min, max)
    probe, because a negative score would otherwise land silently in
    a negative floor-bin id and scores > 1 would clamp into bin
    n_bins-1, skewing ECE/MCE with no error. A score of EXACTLY 1.0
    is a legitimate probability endpoint (saturated sigmoids emit it
    routinely; sklearn's calibration folds it into the last bin) and
    is accepted — the least(floor(s*n_bins), n_bins-1) clamp places
    it in bin n_bins-1. Gaps are computed UNROUNDED per bin and
    rounded once at the fold. Output (1 row): n BIGINT, n_bins_used
    INT, ece DOUBLE round 6, mce DOUBLE round 6. Plan (round-13
    verdict task 6 — the validation probe is FUSED into the bin agg):
    ONE scan builds the <= n_bins bin table carrying per-bin min/max
    score; the collected bins validate the range AND become a local
    relation the final fold aggregates — the corpus is scanned once,
    where the unfused form paid the (min, max) probe scan plus a
    second full scan at action time. The bin key stays DOUBLE until
    after validation (an ANSI int cast would throw on NaN scores
    before the contract raise could)."""
    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        sc.alias("__s"), lc.alias("__y")
    )
    b = F.least(
        F.floor(F.col("__s") * n_bins), F.lit(float(n_bins - 1))
    )
    bin_rows = (
        base.groupBy(b.alias("__b"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.avg("__s").alias("__ms"),
            F.avg(F.col("__y").cast("double")).alias("__fp"),
            F.min("__s").alias("__blo"),
            F.max("__s").alias("__bhi"),
        )
        .collect()
    )
    lo = min((r["__blo"] for r in bin_rows), default=None)
    # max() must see NaN the way Spark's global F.max does (NaN sorts
    # largest): python max treats nan unreliably, so check explicitly
    his = [r["__bhi"] for r in bin_rows]
    hi = None
    if his:
        hi = next((x for x in his if x != x), None)
        if hi is None:
            hi = max(his)
    if lo is not None and (
        lo < 0.0 or hi > 1.0 or lo != lo or hi != hi
    ):
        raise ValueError(
            f"ece_summary: scores span [{lo}, {hi}] "
            "outside the documented [0, 1] binning contract — a "
            "negative score lands in a negative bin id and a score "
            "> 1 clamps into the last bin, silently skewing ECE/MCE. "
            "Rescale (e.g. a sigmoid/min-max transform) or clamp "
            "explicitly before calling."
        )
    bins = df.sparkSession.createDataFrame(
        [(r["__n"], r["__ms"], r["__fp"]) for r in bin_rows],
        "__n double, __ms double, __fp double",
    )
    gap = F.abs(F.col("__fp") - F.col("__ms"))
    return bins.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("int").alias("n_bins_used"),
        (
            F.round(F.sum(F.col("__n") * gap) / F.sum("__n"), 6)
            + F.lit(0.0)
        ).alias("ece"),
        (F.round(F.max(gap), 6) + F.lit(0.0)).alias("mce"),
    )


def fairness_report(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Group-fairness gap summary for a binary classifier — the model-
    governance screen beside the accuracy metrics: across the
    protected groups,

        dp_gap  = max − min of P(pred = 1 | group)   (demographic
                                                      parity)
        tpr_gap = max − min of P(pred = 1 | y = 1, group)   (equal
                                                      opportunity)
        fpr_gap = max − min of P(pred = 1 | y = 0, group)   (the other
                                                      equalized-odds
                                                      arm)

    Groups missing a class (no positives / no negatives) contribute
    NULL to that rate and are EXCLUDED from that gap's extremes (the
    honest treatment — a group with no positives has no TPR). label
    and pred must be 0/1; NULL rows drop.

    Output (1 row): k BIGINT, dp_gap, tpr_gap, fpr_gap DOUBLE round
    6. Plan: ONE group-keyed conditional aggregation (group-count-
    sized) + a 1-row extremes fold."""
    g = F.col(group_col)
    y = F.col(label_col).cast("int")
    p = F.col(pred_col).cast("int")
    nn = df.filter(g.isNotNull() & y.isNotNull() & p.isNotNull())
    per = nn.groupBy(g.alias("__g")).agg(
        F.avg(p.cast("double")).alias("__pr"),
        F.avg(F.when(y == 1, p.cast("double"))).alias("__tpr"),
        F.avg(F.when(y == 0, p.cast("double"))).alias("__fpr"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        (
            F.round(F.max("__pr") - F.min("__pr"), 6) + F.lit(0.0)
        ).alias("dp_gap"),
        (
            F.round(F.max("__tpr") - F.min("__tpr"), 6) + F.lit(0.0)
        ).alias("tpr_gap"),
        (
            F.round(F.max("__fpr") - F.min("__fpr"), 6) + F.lit(0.0)
        ).alias("fpr_gap"),
    )


def conformal_interval(
    df: DataFrame,
    calib_col: str,
    group_col: str,
    y_col: str,
    alpha: float = 0.1,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Split conformal prediction (Vovk et al. 2005; Lei et al. 2018)
    with a group-mean base model — the distribution-free interval
    machinery every prediction service bolts on: on the CALIBRATION
    slice (`calib_col` true) fit ŷ = per-`group_col` mean (unseen
    groups fall back to the global calibration mean), take

        q̂ = the k-th smallest |y − ŷ|,  k = ceil((n_cal + 1)(1 − α))

    and the guarantee says P(|y_test − ŷ| <= q̂) >= 1 − α for
    exchangeable data. This operator reports q̂ AND the realized test
    coverage, the audit pair.

    Scores round to 4dp BEFORE the ladder (the distinct-cell
    discipline, tripwired via `max_cells`; the comparison uses the
    same rounded scores on both slices, so coverage is exact for the
    rounded score). k computes in the same double arithmetic an SQL
    replay performs (ceil((n+1)·(1−α)) — both engines see identical
    products). n_cal < k (tiny calibration) yields q̂ NULL and
    coverage 1.0 (the honest infinite interval).

    Output (1 row): n_cal, n_test BIGINT, qhat DOUBLE round 4,
    coverage DOUBLE round 4. Plan: one group-mean agg + broadcast
    join-back, one distinct-score cell ladder (cumulative count →
    min cell with cum >= k), one test fold; one model-sized 1-row
    collect for n_cal."""
    import math

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    cal = F.col(calib_col).cast("boolean")
    y = F.col(y_col).cast("double")
    g = F.col(group_col)
    nn = df.filter(
        cal.isNotNull() & y.isNotNull() & g.isNotNull()
    ).select(cal.alias("__cal"), g.alias("__g"), y.alias("__y"))
    means = (
        nn.filter(F.col("__cal"))
        .groupBy("__g")
        .agg(F.avg("__y").alias("__m"))
    )
    gm = nn.filter(F.col("__cal")).agg(
        F.avg("__y").alias("__gm"),
        F.count(F.lit(1)).cast("long").alias("__ncal"),
    )
    n_cal = gm.collect()[0]
    if not n_cal["__ncal"]:
        raise ValueError("conformal_interval: empty calibration slice")
    ncal = int(n_cal["__ncal"])
    k = math.ceil((ncal + 1) * (1.0 - float(alpha)))
    # the global mean rides the SAME collected row as n_cal — joining
    # gm back lazily would re-run the calibration aggregate
    scored = nn.join(means, on="__g", how="left").select(
        "__cal",
        F.round(
            F.abs(
                F.col("__y")
                - F.coalesce(
                    F.col("__m"), F.lit(float(n_cal["__gm"]))
                )
            ),
            4,
        ).alias("__s"),
    )
    cal_scores = scored.filter(F.col("__cal")).select("__s")
    _assert_cell_bound(
        cal_scores, ["__s"], "conformal_interval", max_cells,
        plan_word="distinct-score order-statistic ladder",
    )
    cells = cal_scores.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    qhat_row = (
        cells.select(
            "__s", F.sum("__c").over(w_cum).alias("__cum")
        )
        .filter(F.col("__cum") >= k)
        .agg(F.min("__s").alias("__q"))
    )
    test = scored.filter(~F.col("__cal"))
    out = test.crossJoin(F.broadcast(qhat_row)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        (
            F.round(
                F.avg(
                    F.when(
                        F.col("__q").isNull()
                        | (F.col("__s") <= F.col("__q")),
                        1.0,
                    ).otherwise(0.0)
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("coverage"),
        (F.round(F.max("__q"), 4) + F.lit(0.0)).alias("qhat"),
    )
    return out.select(
        F.lit(ncal).cast("long").alias("n_cal"),
        "n_test",
        "qhat",
        "coverage",
    )


def best_split(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Best binary split of a numeric feature against a 0/1 label by
    information gain — the decision-stump / feature-screening
    primitive (the inner loop of tree induction, and the quick "does
    this feature carry signal at any threshold?" audit):

        at threshold t (left branch: score >= t):
        gain(t) = H(p) − (n_L/n) H(p_L) − (n_R/n) H(p_R)

    evaluated at EVERY distinct score from the same cumulative ladder
    roc_points/pr_points ride (`_cum_score_ladder`: distinct-score
    cells, tripwired, bucketed re-cut above `ladder_cells`), then one
    deterministic argmax (gain DESC, threshold ASC). Degenerate
    branches (empty side) have gain 0 by construction of the entropy
    guard. PRE-BUCKET dense scores.

    Output (1 row): n BIGINT, threshold DOUBLE, gain DOUBLE round 6,
    p_left, p_right DOUBLE round 6 (positive rates of the chosen
    branches; NULL when a branch is empty)."""
    r = _cum_score_ladder(
        df, score_col, label_col, "best_split",
        max_cells, ladder_cells, n_buckets,
    )

    def _h(p):
        return F.when(
            (p > 0) & (p < 1),
            -(p * F.log2(p) + (1.0 - p) * F.log2(1.0 - p)),
        ).otherwise(F.lit(0.0))

    nl = (F.col("__cp") + F.col("__cn")).cast("double")
    nr = (
        F.col("__P") + F.col("__N") - F.col("__cp") - F.col("__cn")
    ).cast("double")
    n = (F.col("__P") + F.col("__N")).cast("double")
    p_all = F.col("__P") / n
    pl = F.when(nl > 0, F.col("__cp") / nl)
    pr = F.when(nr > 0, (F.col("__P") - F.col("__cp")) / nr)
    gain = (
        _h(p_all)
        - (nl / n) * F.coalesce(_h(pl), F.lit(0.0))
        - (nr / n) * F.coalesce(_h(pr), F.lit(0.0))
    )
    best = r.select(
        F.struct(
            gain.alias("g"),
            (-F.col("__s")).alias("ns"),
            F.col("__s").alias("s"),
            pl.alias("pl"),
            pr.alias("pr"),
            n.alias("n"),
        ).alias("__cand")
    ).agg(F.max("__cand").alias("__b"))
    return best.select(
        F.col("__b.n").cast("long").alias("n"),
        F.col("__b.s").alias("threshold"),
        (F.round(F.col("__b.g"), 6) + F.lit(0.0)).alias("gain"),
        (F.round(F.col("__b.pl"), 6) + F.lit(0.0)).alias("p_left"),
        (F.round(F.col("__b.pr"), 6) + F.lit(0.0)).alias("p_right"),
    )
