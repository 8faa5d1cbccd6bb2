"""Similarity search over embedding columns (ARRAY<FLOAT/DOUBLE>).

Beyond-reference extension surface (SURVEY §2.11). Two tiers:

  * Exact top-k: broadcast the (small) query set against the corpus, score
    with the native `cosine`/`dot` higher-order-function expressions
    (functions/vectors.py — JVM-side, codegen), rank per query, keep k.
    The join is `corpus × broadcast(queries)` — a broadcast nested loop whose
    cost is |corpus| · |queries|, the right shape when queries ≪ corpus.
    This is the oracle-checkable baseline.
  * ANN via random-projection LSH: bucket every vector by the sign pattern of
    its dot products with a fixed set of hyperplanes, then search only within
    buckets (equi-join on the bucket id). Candidate generation is a shuffled
    equi-join — NEVER an all-pairs crossJoin — so it survives a 100× corpus.
    Recall is tunable by bands of planes (probe multiple bucketings).

All scoring math is cast to DOUBLE before accumulating so results are
reproducible against external oracles regardless of the stored float width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
    norm_expr,
)


def _dc(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _pair_cos(qn: Column, cn: Column, qv: Column, v: Column) -> Column:
    """Cosine of a candidate pair from PRECOMPUTED per-side norms —
    bit-identical to `cosine_expr(qv, v)` (same norm folds, now computed
    once per side below the join instead of once per pair; fp multiply
    is commutative so the denom product matches bitwise; round 15,
    guide §1.2 — the pair projection drops from 3 interpreted folds to
    1)."""
    denom = qn * cn
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(
        dot_expr(qv, v) / denom
    )


def _vec_sql(row) -> str | None:
    """`array(1.0D, ...)` SQL text for a finite float row, else None.
    Python ``repr`` is the shortest round-trip form and Spark's parser
    is correctly rounded, so the parsed doubles are BIT-IDENTICAL to
    ``F.lit(float(x))`` (round-15 probe, incl. e±300 / -0.0)."""
    import math

    vals = [float(x) for x in row]
    if not vals or not all(math.isfinite(x) for x in vals):
        return None
    return "array(" + ",".join(repr(x) + "D" for x in vals) + ")"


def _lit_vec(row) -> Column:
    """Literal ARRAY<DOUBLE> as ONE parsed SQL expression. Semantically
    identical to ``F.array(*(F.lit(float(x)) for x in row))`` but ~100×
    cheaper to CONSTRUCT: one py4j call instead of one per element (the
    model literals — centroids, codebooks, planes — dominated DataFrame
    construction time at 30k py4j round trips per ivfpq_topk; round 15,
    guide §1.2). Falls back to the element-wise form for empty or
    non-finite rows (inf/nan have no SQL literal)."""
    sql = _vec_sql(row)
    if sql is None:
        return F.array(*(F.lit(float(x)) for x in row))
    return F.expr(sql)


def _lit_mat(m) -> Column:
    """Literal ARRAY<ARRAY<DOUBLE>> via ONE parsed SQL expression (see
    `_lit_vec`); element-wise fallback when any row is empty/non-finite."""
    rows = [_vec_sql(r) for r in m]
    if not rows or any(s is None for s in rows):
        return F.array(*[_lit_vec(r) for r in m])
    return F.expr("array(" + ",".join(rows) + ")")


# ---------------------------------------------------------------------------
# SQL-text fast path for the model-literal expression builders.
#
# The centroid/codebook expressions below (per-centroid distance folds,
# ADC tables, probe grids) are structurally k × dim trees; built through
# the Column API each F.lit / zip_with / aggregate call is a py4j round
# trip, and ONE ivfpq_topk construction measured 30,000 round trips ≈
# 11 s of driver wall — before a single task ran (round 15, guide §1.2:
# per-call overhead, not plan quality). Rendering the SAME expression as
# one SQL string parsed by ONE F.expr call cuts construction ~20×, and
# the parsed tree is the tree the API builds (verified bit-exact: fold
# order, tie rules and literals are unchanged — Python `repr` round-trips
# doubles and Spark's parser is correctly rounded). Builders keep the
# Column-API path as fallback whenever the operand is not a plain column
# name (e.g. a lambda variable inside `bound_expr`).
# ---------------------------------------------------------------------------


def _dc_sql(vec) -> str | None:
    """SQL text of `_dc(vec)` when `vec` is a plain column name."""
    if not isinstance(vec, str):
        return None
    return f"transform(`{vec}`, x -> CAST(x AS DOUBLE))"


def _sqdist_fold_sql(vsql: str, row) -> str | None:
    """SQL text of the squared-L2 fold `aggregate(zip_with(v, lit, (a,b)
    -> (a-b)*(a-b)), 0.0, +)` — identical arithmetic and order to the
    Column-API form."""
    vs = _vec_sql(row)
    if vs is None:
        return None
    return (
        f"aggregate(zip_with({vsql}, {vs}, "
        "(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
    )


def _dot_fold_sql(vsql: str, row) -> str | None:
    """SQL text of the dot-product fold (same shape, a*b kernel)."""
    vs = _vec_sql(row)
    if vs is None:
        return None
    return (
        f"aggregate(zip_with({vsql}, {vs}, "
        "(a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
    )


def _sqdists_sql(vsql: str, rows) -> str | None:
    """SQL text of the per-centroid distance ARRAY, or None if any row
    has no SQL literal form."""
    folds = [_sqdist_fold_sql(vsql, r) for r in rows]
    if not folds or any(f is None for f in folds):
        return None
    return "array(" + ",".join(folds) + ")"


def _pq_code_sql(vsql: str, codebooks) -> str | None:
    """SQL text of `pq_code_expr`'s ARRAY<INT> over an operand given as
    SQL text (same struct-sort tie rule)."""
    sub = len(codebooks[0][0])
    parts = []
    for s, cents in enumerate(codebooks):
        folds = [
            _sqdist_fold_sql(f"slice({vsql}, {s * sub + 1}, {sub})", c)
            for c in cents
        ]
        if not folds or any(f is None for f in folds):
            return None
        structs = ",".join(
            f"named_struct('d', {f}, 'i', CAST({ci + 1} AS INT))"
            for ci, f in enumerate(folds)
        )
        parts.append(f"element_at(array_sort(array({structs})), 1).i")
    return "array(" + ",".join(parts) + ")"


def _adc_table_sql(vsql: str, codebooks) -> str | None:
    """SQL text of `_adc_table_expr`'s ARRAY<ARRAY<DOUBLE>> lookup table
    over an operand given as SQL text."""
    sub = len(codebooks[0][0])
    rows = []
    for s, cents in enumerate(codebooks):
        r = _sqdists_sql(f"slice({vsql}, {s * sub + 1}, {sub})", cents)
        if r is None:
            return None
        rows.append(r)
    return "array(" + ",".join(rows) + ")"


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries: DataFrame with (query_id_col, vec_col) — broadcast, so keep it
    small (the many-query case is `cosine_topk_blocked`: block-matrix
    multiply via mapInPandas, same output contract).

    Output: query_id, vec_id, cossim (DOUBLE, raw — round at the edge if
    hashing). Deterministic: rank ties broken by vec_id.
    """
    from pandasvcf_spark.functions.vectors import dot_expr, norm_expr

    # Per-SIDE norms are computed below the join (once per corpus row /
    # once per query row) instead of inside the pair projection, where
    # `cosine_expr` re-ran both norm folds for every (corpus, query)
    # pair — 3 interpreted-HOF folds per pair down to 1 (the dot).
    # Bit-exact: same fold per norm, same product, same `== 0.0` guard,
    # same division (round 15, guide §1.2; a projection below a join
    # boundary cannot be re-inlined above it).
    q = queries.select(
        F.col(query_id_col).alias("__qid"), _dc(vec_col).alias("__qvec")
    ).select("__qid", "__qvec", norm_expr("__qvec").alias("__qn"))
    scored = (
        corpus.select(F.col(id_col), _dc(vec_col).alias("__vec"))
        .select(F.col(id_col), "__vec", norm_expr("__vec").alias("__cn"))
        .join(F.broadcast(q), on=F.lit(True))
    )
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    denom = F.col("__cn") * F.col("__qn")
    scored = scored.withColumn(
        "cossim",
        F.when(denom == 0.0, F.lit(0.0)).otherwise(
            dot_expr(F.col("__vec"), F.col("__qvec")) / denom
        ),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("cossim"),
        )
    )


def _topk_rows(ST, vids, kk, chunk: int = 64):
    """Vectorized per-ROW top-k of a score block ST[q, b] with the exact
    deterministic tie contract of the window rank (descending score,
    ascending vec_id) — zero Python-level per-query work. Replaces the
    round-5 per-query loop (one partition+lexsort per query; at 10⁴
    queries that loop, not the BLAS, dominated the kernel — the probe
    test in test_text_vectors.py measures the speedup).

    Selection is threshold-based so ties are NEVER decided by which
    element a partition happened to keep:

      1. a cheap per-row LOWER bound t0 of the kth-largest value: the
         kth-largest of per-chunk maxima (>= kk chunks have max >= t0,
         hence >= kk elements >= t0, hence kth-largest >= t0) — one
         contiguous max pass over the block plus a partition of the
         small [q, b/chunk] maxima matrix, ~5× cheaper than a direct
         [q, b] partition;
      2. candidate mask ST >= t0 — a strict SUPERSET of the tie-inclusive
         top set (~k+1 candidates/row on real score distributions; a
         degenerate all-equal row degrades to sorting that row in full,
         slower but still exact);
      3. ONE global lexsort keyed (row, -score, vec_id), first kk per
         row — boundary ties resolve to the smallest vec_id.

    Returns (row_idx, vec_ids, scores) as flat aligned arrays."""
    import numpy as np

    q, b = ST.shape
    g = b // chunk
    if b <= kk:
        t0 = np.full(q, -np.inf)
    elif g >= kk and g > 1:
        M = ST[:, : g * chunk].reshape(q, g, chunk).max(axis=2)
        if b % chunk:
            M = np.concatenate(
                [M, ST[:, g * chunk :].max(axis=1, keepdims=True)], axis=1
            )
        t0 = np.partition(M, M.shape[1] - kk, axis=1)[:, M.shape[1] - kk]
    else:  # small b: direct partition is already cheap
        t0 = np.partition(ST, b - kk, axis=1)[:, b - kk]
    rows, cols = np.nonzero(ST >= t0[:, None])
    sc, vd = ST[rows, cols], vids[cols]
    order = np.lexsort((vd, -sc, rows))
    rows_s = rows[order]
    counts = np.bincount(rows_s, minlength=q)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    keep = np.arange(len(order)) - starts[rows_s] < kk
    take = order[keep]
    return rows[take], vd[take], sc[take]


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
    query_block: int = 1024,
    max_query_mb: int | None = 512,
) -> DataFrame:
    """Exact cosine top-k for a LARGE query set — the many-query companion
    to `cosine_topk` (same output contract: query_id, vec_id, cossim DOUBLE,
    ties by vec_id).

    `cosine_topk`'s broadcast nested loop materializes |corpus|·|queries|
    joined ROWS through the plan; at 10⁵ queries that row explosion — not
    the arithmetic — is the bottleneck. Here the query set is materialized
    once driver-side (the build side, exactly like a broadcast hash join's
    build) into a numpy matrix and shipped via `sparkContext.broadcast`;
    the corpus streams through `mapInPandas` in Arrow batches and each
    batch is scored as ONE BLAS matmul (C[b×d] @ Q.T[d×m], chunked
    `query_block` queries at a time so the score block stays ~b×1024).
    Per batch only the per-query top-k candidate rows are emitted, so the
    shuffle into the final global rank is |partitions|·|queries|·k rows —
    independent of corpus size. Scales to a 100× corpus by adding
    partitions; scales in queries until Q (m×d doubles) outgrows executor
    memory, which is the documented boundary of exact many-query search
    (beyond it: `ann_banded_topk`).

    The driver-side `queries.collect()` is an eager action at plan-build
    time — inherent to building a broadcast side, same as Spark's own
    broadcast join, and worth it only when queries ≫ broadcast-literal
    scale. The broadcast-build boundary is ENFORCED (round-10 contract
    upgrade): a 1-row (count, dim) pre-check prices the query matrix
    (m x d float64) and raises with the ann_banded_topk routing
    instruction when it exceeds `max_query_mb` (default 512 MB), so the
    failure mode past the boundary is a message, not an executor OOM.
    Pass max_query_mb=None to skip the pre-check job.

    Restriction (checked, not silent): both id columns must be integral
    types — ids ride through numpy int64 arrays inside the matmul kernel,
    and a non-integer id would be corrupted by that cast. Use `cosine_topk`
    (type-agnostic broadcast join) for string/decimal ids."""
    import numpy as np
    import pandas as pd

    if id_col == "query_id":
        raise ValueError(
            "id_col='query_id' collides with the output's query id column; "
            "alias the corpus id first"
        )
    _INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
    for df_, col_, side in ((corpus, id_col, "corpus"), (queries, query_id_col, "queries")):
        dtype = dict(df_.dtypes)[col_]
        if dtype not in _INTEGRAL:
            raise ValueError(
                f"cosine_topk_blocked requires an integral {side} id column; "
                f"{col_} is {dtype} — use cosine_topk for non-integer ids"
            )

    if max_query_mb is not None:
        st = queries.agg(
            F.count(F.lit(1)).alias("__m"),
            F.max(F.size(F.col(vec_col))).alias("__d"),
        ).collect()[0]
        est_mb = (st["__m"] or 0) * (st["__d"] or 0) * 8 / 2**20
        if est_mb > max_query_mb:
            raise ValueError(
                f"cosine_topk_blocked: query matrix ~{est_mb:,.0f} MB "
                f"({st['__m']:,} x {st['__d']} float64) exceeds "
                f"max_query_mb={max_query_mb} — the broadcast-build "
                "boundary of exact many-query search. Use "
                "ann_banded_topk (bucketed LSH) for query sets this "
                "large, or raise/disable the cap after sizing executor "
                "memory for the broadcast."
            )
    qrows = queries.select(
        F.col(query_id_col), _dc(vec_col).alias("__v")
    ).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r["__v"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    # cosine_expr parity: zero-norm vectors score 0.0 against everything
    Qn = np.where(qn[:, None] == 0.0, 0.0, Q / np.where(qn == 0.0, 1.0, qn)[:, None])
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Qn))
    need = k + 1 if exclude_self else k  # self may occupy one slot

    def score(batches):
        bqids, bQn = bc.value
        m = len(bqids)
        for pdf in batches:
            b = len(pdf)
            if b == 0 or m == 0:
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(C, axis=1)
            Cn = np.where(
                cn[:, None] == 0.0, 0.0, C / np.where(cn == 0.0, 1.0, cn)[:, None]
            )
            vids = pdf[id_col].to_numpy()
            kk = min(need, b)
            out_q, out_v, out_s = [], [], []
            for q0 in range(0, m, query_block):
                # Query-major matmul: [qblock, b], C-contiguous, so every
                # per-query operation below streams contiguous memory
                # (the previous corpus-major orientation made the old
                # per-query selection loop walk strided columns).
                S = bQn[q0 : q0 + query_block] @ Cn.T
                qrel, vd, sc = _topk_rows(S, vids, kk)
                out_q.append(bqids[q0 + qrel])
                out_v.append(vd)
                out_s.append(sc)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    id_col: np.concatenate(out_v),
                    "cossim": np.concatenate(out_s),
                }
            )

    cands = corpus.select(F.col(id_col), _dc(vec_col).alias(vec_col)).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cossim double"
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        cands.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("query_id").alias(query_id_col), F.col(id_col), F.col("cossim")
        )
    )


def default_planes(
    n_planes: int = 8, dim: int = 64, seed: int = 0x5EED
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1) from a tiny LCG —
    plain Python floats so the same exact values can be baked into a Spark
    plan, a SQL oracle, or a storage layout (write_ann_partitioned) and
    reproduced anywhere."""
    s = seed
    out = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((s >> 20) / float(1 << 42) - 1.0)
        out.append(row)
    return out


def rp_bucket_expr(vec: Column | str, planes: list[list[float]]) -> Column:
    """LSH bucket id (STRING of sign bits) from literal random hyperplanes.

    Planes are plain Python lists baked into the plan as array literals —
    deterministic, shipped with the plan, no side channel. Sign of the dot
    product with each plane contributes one bit."""
    vsql = _dc_sql(vec)
    if vsql is not None:
        folds = [_dot_fold_sql(vsql, plane) for plane in planes]
        if folds and all(f is not None for f in folds):
            return F.expr(
                "concat("
                + ",".join(
                    f"CASE WHEN {f} >= 0 THEN '1' ELSE '0' END"
                    for f in folds
                )
                + ")"
            )
    v = _dc(vec)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    _lit_vec(plane),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def ann_bucket_topk(
    corpus: DataFrame,
    planes: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-neighbors ANN: for every vector, its top-k cosine neighbors among
    vectors in the SAME LSH bucket. The self-join key is the bucket id, so
    the shuffle is by bucket and the quadratic work is bounded per bucket.

    Output: query_id, vec_id, cossim — same shape as `cosine_topk`, making
    recall measurable by direct comparison (tests do exactly that).

    Profile (round 6, sf0.1 = 2,000 vectors, min-of-2): bucket assign
    0.18 s, +join 0.86 s, +cosine 0.93 s, full 1.16 s — at fixture scale
    the wall is Spark fixed cost (2-task broadcast join under AQE), not
    math: the plan already carries WindowGroupLimit pushdown below the
    exchange and a broadcast build side. The round-5 1.72→1.99 s bench
    drift reproduced at neither level under an idle machine — ambient
    load, not a plan change. (A normalize-before-join variant that cuts
    per-pair work from 3 folds to 1 measured NO win here for the same
    reason; it becomes the right trade only when per-bucket occupancy —
    the quadratic term — grows, which `adaptive_n_planes` holds flat.)
    """
    bucketed = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        rp_bucket_expr(vec_col, planes).alias("__bucket"),
    ).select(
        F.col(id_col), "__vec", "__bucket",
        norm_expr("__vec").alias("__cn"),
    )
    a = bucketed.select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qvec"),
        "__bucket",
        F.col("__cn").alias("__qn"),
    )
    pairs = a.join(bucketed, on="__bucket").filter(
        F.col("query_id") != F.col(id_col)
    )
    pairs = pairs.withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select("query_id", id_col, "cossim")
    )


def adaptive_n_planes(
    corpus_size: int,
    target_occupancy: int = 64,
    lo: int = 4,
    hi: int = 24,
) -> int:
    """Plane count sized to the corpus: 2^planes buckets ≈ corpus /
    target_occupancy, clamped to [lo, hi]. This is the scale knob the fixed
    literal misses — per-bucket rerank work is O(occupancy²), so holding
    occupancy constant as the corpus grows (instead of holding the bucket
    COUNT constant) is what keeps the equi-join's quadratic term flat at
    100× the data. At 10⁹ vectors / occupancy 64 → 24 planes (16M buckets)."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(corpus_size / target_occupancy, 2.0)))))


def banded_bucket_keys_expr(
    vec: Column | str, planes: list[list[float]], bands: int
) -> Column:
    """ARRAY<STRUCT<band INT, key STRING>>: split `planes` into `bands`
    contiguous groups of r = len(planes)/bands and emit one sign-pattern
    bucket key per band — the random-projection mirror of MinHash's LSH
    banding. A vector probes `bands` buckets instead of one, so a
    neighbor is found when ANY band's r signs all agree: recall
    1-(1-p^r)^bands instead of the single-bucket p^(r*bands), while each
    band's 2^r-way split keeps per-bucket occupancy bounded."""
    r = len(planes) // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                rp_bucket_expr(vec, planes[b * r : (b + 1) * r]).alias("key"),
            )
            for b in range(bands)
        ]
    )


def ann_banded_topk(
    corpus: DataFrame,
    planes: list[list[float]],
    bands: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe ANN: all-neighbors top-k where candidates share at least
    one banded bucket (equi-join on the exploded (band, key) struct — never
    a crossJoin), deduplicated across bands, exact-cosine reranked. Combine
    with `adaptive_n_planes` to hold bucket occupancy constant as the corpus
    grows: planes = adaptive_n_planes(n) total, bands of r planes each.

    Output: query_id, vec_id, cossim — comparable row-for-row with
    `cosine_topk` for recall measurement."""
    # norm sits in the SAME select as the explode, so Generate evaluates
    # it once per document and replicates it per band row
    bucketed = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
        F.explode(banded_bucket_keys_expr(vec_col, planes, bands)).alias("__bk"),
    )
    a = bucketed.select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qvec"),
        "__bk",
        F.col("__cn").alias("__qn"),
    )
    pairs = (
        a.join(bucketed, on="__bk")
        .filter(F.col("query_id") != F.col(id_col))
        # a pair can collide in several bands; dedup BEFORE the cosine so
        # the rerank scores each candidate once
        .dropDuplicates(["query_id", id_col])
    )
    pairs = pairs.withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select("query_id", id_col, "cossim")
    )


def ann_banded_query_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    bands: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Banded multi-probe ANN for an explicit QUERY SET (the query-driven
    companion to `ann_banded_topk`, which searches all-neighbors): each
    query probes its `bands` buckets and scores only the corpus vectors
    sharing at least one — an equi-join on the exploded (band, key) struct,
    never a crossJoin. Probe cost is |queries| × bands × occupancy cosine
    evaluations, independent of |corpus|² — the shape that makes measuring
    recall on a query sample cheap at any corpus size.

    Output: query_id, vec_id, cossim — row-comparable with `cosine_topk`
    on the same queries for recall measurement."""
    bucketed = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
        F.explode(banded_bucket_keys_expr(vec_col, planes, bands)).alias("__bk"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        norm_expr(_dc(vec_col)).alias("__qn"),
        F.explode(banded_bucket_keys_expr(vec_col, planes, bands)).alias("__bk"),
    )
    pairs = probes.join(bucketed, on="__bk")
    if exclude_self:
        pairs = pairs.filter(F.col("__qid") != F.col(id_col))
    # a pair can collide in several bands; dedup BEFORE the cosine so the
    # rerank scores each candidate once
    pairs = pairs.dropDuplicates(["__qid", id_col]).withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(F.col("__qid").alias(query_id_col), F.col(id_col), F.col("cossim"))
    )


def ivf_cell_expr(vec: Column | str, centroids: list[list[float]]) -> Column:
    """IVF coarse-quantizer cell id (1-based INT): index of the nearest
    centroid by squared-L2, ties to the lowest index. Centroids are literal
    arrays baked into the plan (deterministic, oracle-reproducible).

    Computed as array_position(dists, array_min(dists)) over a literal-sized
    distance array — one pass, no shuffle, whole-stage codegen."""
    vsql = _dc_sql(vec)
    if vsql is not None:
        d = _sqdists_sql(vsql, centroids)
        if d is not None:
            return F.expr(
                f"CAST(array_position({d}, array_min({d})) AS INT)"
            )
    v = _dc(vec)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    _lit_vec(c),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return F.array_position(dists, F.array_min(dists)).cast("int")


def ivf_topk(
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF all-neighbors ANN: assign every vector to its nearest-centroid
    cell, then search only within the cell (equi-join on cell id, exact
    cosine rerank). The inverted-file analogue of `ann_bucket_topk`: where
    LSH buckets by random-projection signs, IVF partitions by a trained/
    chosen coarse quantizer — better recall when the corpus is clustered.
    Output: query_id, vec_id, cossim."""
    cells = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
        ivf_cell_expr(vec_col, centroids).alias("__cell"),
    )
    a = cells.select(
        F.col(id_col).alias("query_id"),
        F.col("__vec").alias("__qvec"),
        F.col("__cn").alias("__qn"),
        "__cell",
    )
    pairs = a.join(cells, on="__cell").filter(F.col("query_id") != F.col(id_col))
    pairs = pairs.withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select("query_id", id_col, "cossim")
    )


def ivf_cells_expr(
    vec: Column | str, centroids: list[list[float]], n_probe: int = 1
) -> Column:
    """ARRAY<INT> of the `n_probe` nearest-centroid cell ids (1-based),
    nearest first, distance ties to the lowest index — the multi-probe
    generalization of `ivf_cell_expr`. Computed natively: literal distance
    array → array_sort of (dist, idx) structs (struct ordering is
    field-by-field, giving exactly the tie rule) → slice → project idx.
    One codegen pass, no shuffle, no Python."""
    vsql = _dc_sql(vec)
    if vsql is not None:
        folds = [_sqdist_fold_sql(vsql, c) for c in centroids]
        if folds and all(f is not None for f in folds):
            structs = ",".join(
                f"named_struct('d', {f}, 'i', CAST({i + 1} AS INT))"
                for i, f in enumerate(folds)
            )
            return F.expr(
                f"transform(slice(array_sort(array({structs})), 1, "
                f"{int(n_probe)}), s -> s.i)"
            )
    v = _dc(vec)
    pairs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        v,
                        _lit_vec(c),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i + 1).cast("int").alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(pairs), 1, n_probe), lambda s: s["i"]
    )


def ivf_query_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN for an explicit QUERY SET (the query-driven companion to
    `ivf_topk`, mirroring `ann_banded_query_topk` for RP-LSH): each query
    probes its `n_probe` nearest cells and scores only the corpus vectors
    assigned there — an equi-join on cell id, never a crossJoin. Probe
    cost is |queries| × n_probe × cell-occupancy cosine evaluations,
    independent of |corpus|²; n_probe is the recall knob (a query near a
    cell boundary finds its cross-boundary neighbors in its 2nd/3rd cell).

    Output: query_id, vec_id, cossim — row-comparable with `cosine_topk`
    on the same queries, which is how `ivf_recall_at_10` measures it."""
    cells = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
        ivf_cell_expr(vec_col, centroids).alias("__cell"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        norm_expr(_dc(vec_col)).alias("__qn"),
        F.explode(ivf_cells_expr(vec_col, centroids, n_probe)).alias("__cell"),
    )
    pairs = probes.join(cells, on="__cell")
    if exclude_self:
        pairs = pairs.filter(F.col("__qid") != F.col(id_col))
    # corpus vectors live in ONE cell each, so multi-probe never produces
    # duplicate (query, candidate) pairs — no dedup needed before rerank
    pairs = pairs.withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(F.col("__qid").alias(query_id_col), F.col(id_col), F.col("cossim"))
    )


def _half_cell_expr(
    vec: Column, offset: int, length: int, centroids: list[list[float]]
) -> Column:
    """Nearest-centroid id (1-based INT) of a SLICE of the vector —
    the per-half assignment of the inverted multi-index. `vec` as a
    plain column name (pre-`_dc`) takes the one-parse SQL fast path."""
    vsql = _dc_sql(vec)
    if vsql is not None:
        d = _sqdists_sql(f"slice({vsql}, {offset}, {length})", centroids)
        if d is not None:
            return F.expr(
                f"CAST(array_position({d}, array_min({d})) AS INT)"
            )
    v = F.slice(_dc(vec) if isinstance(vec, str) else vec, offset, length)
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    _lit_vec(c),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return F.array_position(dists, F.array_min(dists)).cast("int")


def _half_dists_expr(
    vec: Column, offset: int, length: int, centroids: list[list[float]]
) -> Column:
    """ARRAY<DOUBLE> of squared-L2 distances from a vector SLICE to
    every half-space centroid — materialized once per query row so the
    ka×kb cross-sum grid reads element_at instead of recomputing the
    fold ka×kb times."""
    vsql = _dc_sql(vec)
    if vsql is not None:
        d = _sqdists_sql(f"slice({vsql}, {offset}, {length})", centroids)
        if d is not None:
            return F.expr(d)
    v = F.slice(_dc(vec) if isinstance(vec, str) else vec, offset, length)
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    _lit_vec(c),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )


# The ka×kb probe grid in imi_topk/imi_pq_topk is a literal struct array
# PER QUERY ROW — the generated code grows multiplicatively in ka·kb and
# blows the JVM JIT method limit past a few thousand structs (round-14
# verdict watch item #2). 1024 (= 32×32) sits safely inside codegen.
IMI_MAX_GRID_CELLS = 1024


def _assert_imi_grid(ka: int, kb: int, where: str) -> None:
    """Raise when the ka×kb probe grid would exceed the codegen bound,
    with the priced re-route: fewer half-space centroids + more probes
    hit the same scanned fraction of the corpus."""
    if ka * kb > IMI_MAX_GRID_CELLS:
        raise ValueError(
            f"{where}: ka*kb = {ka}*{kb} = {ka * kb} product cells exceeds "
            f"IMI_MAX_GRID_CELLS={IMI_MAX_GRID_CELLS} — the probe grid is "
            "a ka*kb literal struct array per query and the generated "
            "code grows multiplicatively past the JIT method limit. "
            "Re-route: train FEWER half-space centroids and probe MORE "
            "cells (halving ka,kb quarters the grid; scale n_probe_cells "
            "by the cell-size ratio to keep the scanned fraction — "
            "BENCH_LOCAL.json's ivfpq_mp_probe_curve prices the probe "
            "lever)."
        )


def _assert_imi_codebooks(
    cents_a: list[list[float]],
    cents_b: list[list[float]],
    where: str,
    codebooks: list[list[list[float]]] | None = None,
) -> None:
    """Driver-side structural validation of the IMI codebooks (free — no
    Spark job): each half codebook must be rectangular, and the PQ
    codebooks (when given) must be rectangular AND tile exactly the
    full residual dim da + db. `F.slice` + `zip_with` silently truncate
    on any mismatch, yielding wrong product cells and ADC/cosine scores
    with no error — the same silent-mis-pair failure `_assert_vec_dim`
    guards in semantic_dedup (round-14 ADVICE)."""
    for label, cents in (("cents_a", cents_a), ("cents_b", cents_b)):
        if not cents:
            raise ValueError(f"{where}: {label} is empty")
        dims = {len(c) for c in cents}
        if len(dims) != 1:
            raise ValueError(
                f"{where}: {label} rows have ragged dims {sorted(dims)} — "
                "every half-space centroid must share one length "
                "(zip_with truncates to the shorter side, silently "
                "mis-pairing the half assignment)"
            )
    if codebooks is not None:
        if not codebooks or not codebooks[0]:
            raise ValueError(f"{where}: codebooks is empty")
        subs = {len(c) for cb in codebooks for c in cb}
        if len(subs) != 1:
            raise ValueError(
                f"{where}: PQ codebook centroids have ragged subvector "
                f"dims {sorted(subs)} — every subspace centroid must "
                "share one length"
            )
        sub = next(iter(subs))
        full = len(cents_a[0]) + len(cents_b[0])
        if len(codebooks) * sub != full:
            raise ValueError(
                f"{where}: PQ codebooks tile {len(codebooks)}×{sub} = "
                f"{len(codebooks) * sub} dims but the IMI residual is "
                f"dim {full} (da+db) — F.slice would silently read a "
                "short/shifted subvector, corrupting every code"
            )


def imi_cell_expr(
    vec: Column | str,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
) -> Column:
    """Inverted multi-index cell id (Babenko & Lempitsky 2012, "The
    inverted multi-index"): split the vector into two halves, assign
    each half to its nearest HALF-SPACE centroid, cell = (ca − 1)·kb +
    cb (1-based INT). ka×kb effective cells from ka + kb small
    codebooks — the finer coarse quantizer that lifts the cell-coverage
    recall ceiling without training (or broadcasting) ka×kb full-dim
    centroids. Same codegen shape as `ivf_cell_expr`: literal
    distance arrays, one pass, no shuffle."""
    _assert_imi_codebooks(cents_a, cents_b, "imi_cell_expr")
    v = vec if isinstance(vec, str) else _dc(vec)
    da = len(cents_a[0])
    db = len(cents_b[0])
    kb = len(cents_b)
    ca = _half_cell_expr(v, 1, da, cents_a)
    cb = _half_cell_expr(v, da + 1, db, cents_b)
    return ((ca - F.lit(1)) * F.lit(kb) + cb).cast("int")


def imi_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 5,
    dim: int | None = None,
) -> tuple[list[list[float]], list[list[float]]]:
    """Train the two half-space codebooks of the inverted multi-index:
    `kmeans_fit` on each half of the vector (split at dim//2). k
    centroids PER HALF give k² effective cells — training cost is two
    k-centroid fits over half-dim vectors, vs one k²-centroid full-dim
    fit for the same cell count. `dim` is probed from the first row
    when not given — the probe is a fused min/max(size) agg that ALSO
    trips on ragged vector dims (round-14 ADVICE: zip_with truncates
    silently, so a mixed-dim corpus must raise here, not mis-train).
    Pass `dim` in pipelines to skip the scan."""
    v = _dc(vec_col)
    if dim is None:
        row = df.select(
            F.min(F.size(vec_col)).alias("dmin"),
            F.max(F.size(vec_col)).alias("dmax"),
        ).first()
        if row is None or row["dmin"] is None:
            raise ValueError("imi_fit: empty corpus")
        if row["dmin"] != row["dmax"]:
            raise ValueError(
                f"imi_fit: vector dims span [{row['dmin']}, {row['dmax']}]"
                f" in {vec_col!r} — F.slice/zip_with truncate to the "
                "shorter side, so half-space training would silently "
                "mis-pair dimensions. Fix the embedding column first."
            )
        dim = row["dmin"]
    da = dim // 2
    cents_a, _ = kmeans_fit(
        df.select(F.slice(v, 1, da).alias("__h")),
        vec_col="__h", k=k, max_iter=max_iter,
    )
    cents_b, _ = kmeans_fit(
        df.select(F.slice(v, da + 1, dim - da).alias("__h")),
        vec_col="__h", k=k, max_iter=max_iter,
    )
    return cents_a, cents_b


def imi_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
    k: int,
    n_probe_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Inverted-multi-index ANN: each query probes its `n_probe_cells`
    best product cells — ranked by the ADDITIVE bound d_a(q₁, cₐ) +
    d_b(q₂, c_b), the multi-index ordering — and scores only the
    corpus vectors assigned there (equi-join on cell id, exact cosine
    rerank, never a crossJoin). With ka = kb = 16 the index has 256
    cells from 32 half-dim centroids: at the SAME scanned fraction of
    the corpus, finer cells cover more of each query's true
    neighborhood than a 16-cell single-level IVF — the coarse-
    quantizer lever the round-13 verdict named beyond more probes.

    Plan: corpus pays one literal-array assignment pass (ka + kb
    folds, not ka×kb); each query materializes its two half-distance
    arrays ONCE, builds the ka×kb (d, cell) grid from element_at
    reads, array_sorts, slices, explodes — |queries| × n_probe_cells
    join rows. Ties rank by (d, cell), the struct-sort rule. Output:
    query_id, vec_id, cossim (desc, ties by vec_id). Bound: ka·kb ≤
    IMI_MAX_GRID_CELLS (=1024) — the per-query literal grid grows
    multiplicatively; beyond that, raise with the priced re-route
    (fewer cells, more probes)."""
    _assert_imi_codebooks(cents_a, cents_b, "imi_topk")
    ka, kb = len(cents_a), len(cents_b)
    _assert_imi_grid(ka, kb, "imi_topk")
    if not 1 <= n_probe_cells <= ka * kb:
        raise ValueError(
            f"n_probe_cells must be in [1, {ka * kb}], got {n_probe_cells}"
        )
    da = len(cents_a[0])
    db = len(cents_b[0])
    cells = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
        imi_cell_expr(vec_col, cents_a, cents_b).alias("__cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        norm_expr(_dc(vec_col)).alias("__qn"),
        _half_dists_expr(vec_col, 1, da, cents_a).alias("__da"),
        _half_dists_expr(vec_col, da + 1, db, cents_b).alias("__db"),
    )
    # one-parse SQL grid (same structs, sort and tie rule as the Column
    # form — the 256-struct literal grid was ~1.5 s of py4j construction
    # per call, round 15)
    grid_sql = "array(" + ",".join(
        f"named_struct('d', __da[{i}] + __db[{j}], "
        f"'cell', CAST({i * kb + j + 1} AS INT))"
        for i in range(ka)
        for j in range(kb)
    ) + ")"
    probes = q.select(
        "__qid",
        "__qvec",
        "__qn",
        F.explode(
            F.expr(
                f"transform(slice(array_sort({grid_sql}), 1, "
                f"{int(n_probe_cells)}), s -> s.cell)"
            )
        ).alias("__cell"),
    )
    pairs = probes.join(cells, on="__cell")
    if exclude_self:
        pairs = pairs.filter(F.col("__qid") != F.col(id_col))
    # corpus vectors live in ONE product cell each — no dedup needed
    pairs = pairs.withColumn(
        "cossim",
        _pair_cos(
            F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
        ),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cossim"), F.col(id_col))
    return (
        pairs.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col), F.col(id_col), F.col("cossim")
        )
    )


def _imi_product_centroid(
    cell: Column,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
) -> Column:
    """Full-dim product centroid of an IMI cell id: concat(A[ca], B[cb])
    with ca = (cell−1) div kb + 1, cb = (cell−1) mod kb + 1."""
    kb = len(cents_b)
    ca = (((cell - F.lit(1)) - (cell - F.lit(1)) % F.lit(kb)) / F.lit(kb)
          ).cast("int") + F.lit(1)
    cb = ((cell - F.lit(1)) % F.lit(kb)).cast("int") + F.lit(1)
    return F.concat(
        F.element_at(_centroid_lit(cents_a), ca),
        F.element_at(_centroid_lit(cents_b), cb),
    )


def imi_pq_encode(
    df: DataFrame,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IMI+PQ index layout (the faiss `IMI2xN,PQm` shape — Babenko &
    Lempitsky's multi-index carrying Jégou-style residual PQ codes):
    every vector stores its PRODUCT-cell id plus the PQ codes of its
    residual v − concat(A[ca], B[cb]). The composition `ivfpq_encode`
    is to IVF, applied to the finer ka×kb coarse grid — stage-one
    retrieval then never touches raw vectors at all (the honest 100 TB
    posting-list row: ~9 small ints). Output: (id_col, cell INT,
    codes ARRAY<INT>). One codegen pass, no shuffle, no Python."""
    _assert_imi_codebooks(cents_a, cents_b, "imi_pq_encode", codebooks)
    with_cell = df.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        imi_cell_expr(vec_col, cents_a, cents_b).alias("cell"),
    )
    resid = F.zip_with(
        F.col("__vec"),
        _imi_product_centroid(F.col("cell"), cents_a, cents_b),
        lambda a, b: a - b,
    )
    return with_cell.select(
        F.col(id_col),
        "cell",
        pq_code_expr(resid, codebooks).alias("codes"),
    )


def imi_pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    n_probe_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IMI+PQ ANN: product cells PRUNE (ranked by the additive
    d_a + d_b multi-index bound, as `imi_topk`), residual ADC scores
    within probed cells (as `ivfpq_topk`) — the full faiss multi-index
    composition where stage one reads ONLY the code relation. Per
    probed (query, cell): an ADC table from the residual
    q − concat(A[ca], B[cb]) rides a broadcast onto the cell equi-join;
    corpus rows score as table lookups; one top-k window per query.
    ADC distances approximate ‖q − (product_centroid + decode)‖² and
    compare across probed cells. Output: (query_id, vec_id, adc_dist)
    ascending, ties by vec_id — compose with `rerank_exact` for the
    refine stage (`imi_pq_rerank_topk`). Bound: ka·kb ≤
    IMI_MAX_GRID_CELLS, as `imi_topk`."""
    _assert_imi_codebooks(cents_a, cents_b, "imi_pq_topk", codebooks)
    ka, kb = len(cents_a), len(cents_b)
    _assert_imi_grid(ka, kb, "imi_pq_topk")
    if not 1 <= n_probe_cells <= ka * kb:
        raise ValueError(
            f"n_probe_cells must be in [1, {ka * kb}], got {n_probe_cells}"
        )
    da = len(cents_a[0])
    db = len(cents_b[0])
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        _half_dists_expr(vec_col, 1, da, cents_a).alias("__da"),
        _half_dists_expr(vec_col, da + 1, db, cents_b).alias("__db"),
    )
    grid_sql = None
    if all(_vec_sql(c) is not None for c in cents_a) and all(
        _vec_sql(c) is not None for c in cents_b
    ):
        grid_sql = "array(" + ",".join(
            f"named_struct('d', __da[{i}] + __db[{j}], "
            f"'cell', CAST({i * kb + j + 1} AS INT))"
            for i in range(ka)
            for j in range(kb)
        ) + ")"
    if grid_sql is not None:
        # one-parse SQL probe side (same grid, sort, tie rule and
        # residual arithmetic as the Column path below); the residual
        # is bound once as a lambda variable so the half-codebook
        # literals appear once per probe row, not once per ADC fold
        probes = q.select(
            "__qid",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({grid_sql}), 1, "
                    f"{int(n_probe_cells)}), s -> s.cell)"
                )
            ).alias("cell"),
            "__qvec",
        )
        a_sql = "array(" + ",".join(_vec_sql(c) for c in cents_a) + ")"
        b_sql = "array(" + ",".join(_vec_sql(c) for c in cents_b) + ")"
        ca_sql = (
            f"(CAST(((cell - 1) - (cell - 1) % {kb}) / {kb} AS INT) + 1)"
        )
        cb_sql = f"(CAST((cell - 1) % {kb} AS INT) + 1)"
        rq_sql = (
            f"zip_with(__qvec, concat(element_at({a_sql}, {ca_sql}), "
            f"element_at({b_sql}, {cb_sql})), (a, b) -> a - b)"
        )
        tbl_sql = _adc_table_sql("rr", codebooks)
        probes = probes.select(
            "__qid",
            "cell",
            F.expr(
                f"transform(array({rq_sql}), rr -> {tbl_sql})[0]"
            ).alias("__t"),
        )
    else:
        grid = F.array(
            *[
                F.struct(
                    (F.col("__da")[i] + F.col("__db")[j]).alias("d"),
                    F.lit(i * kb + j + 1).cast("int").alias("cell"),
                )
                for i in range(ka)
                for j in range(kb)
            ]
        )
        probes = q.select(
            "__qid",
            "__qvec",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(grid), 1, n_probe_cells),
                    lambda s: s["cell"],
                )
            ).alias("cell"),
        )
        rq = F.zip_with(
            F.col("__qvec"),
            _imi_product_centroid(F.col("cell"), cents_a, cents_b),
            lambda a, b: a - b,
        )
        probes = probes.select(
            "__qid", "cell", _adc_table_expr(rq, codebooks).alias("__t")
        )
    scored = corpus_codes.join(F.broadcast(probes), on="cell")
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    scored = scored.withColumn("adc_dist", _adc_sum_expr(len(codebooks)))
    w = Window.partitionBy("__qid").orderBy("adc_dist", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("adc_dist"),
        )
    )


def imi_pq_rerank_topk(
    corpus_codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    cents_a: list[list[float]],
    cents_b: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    k_candidates: int = 50,
    n_probe_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IMI+PQ with EXACT L2 rerank — `ivfpq_rerank_topk`'s refine
    composition on the multi-index coarse grid: stage one is
    `imi_pq_topk` probing `n_probe_cells` product cells for a
    `k_candidates` ADC shortlist (codes only — never raw vectors);
    stage two exact-squared-L2-scores ONLY those |queries| ×
    k_candidates raw rows (`rerank_exact(metric="l2")`). Finer cells
    at equal scanned fraction make the shortlist better-covered than
    single-level IVFPQ's — the two round-14 levers composed. Output:
    (query_id, vec_id, sqdist DOUBLE) ascending, ties by vec_id."""
    cands = imi_pq_topk(
        corpus_codes,
        queries,
        cents_a,
        cents_b,
        codebooks,
        k=k_candidates,
        n_probe_cells=n_probe_cells,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
    )
    return rerank_exact(
        cands,
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        metric="l2",
    )


def bucket_histogram(
    corpus: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket occupancy histogram — the ANN capacity-planning query (skewed
    buckets = skewed join). Output: bucket STRING, n BIGINT."""
    return (
        corpus.select(rp_bucket_expr(vec_col, planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-4,
    assign: str = "auto",
    init_centroids: list[list[float]] | None = None,
    round_to: int | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Train IVF coarse-quantizer centroids with Lloyd's k-means,
    DataFrame-native: per iteration ONE job computes every point's nearest
    centroid (the same literal-centroid distance expression `ivf_cell_expr`
    compiles — centroids are k×dim driver-side literals, re-baked each
    round) plus the per-(cell, dim) sums via posexplode with map-side
    combine; only k×dim aggregate rows ever reach the driver. This is the
    standard fit shape (MLlib does the same collect-centroids loop) — the
    DATA never leaves the cluster, only the k×dim model does.

    Deterministic: init picks the k vectors with the smallest xxhash64 of
    their content (spread, reproducible, no RNG); ties and empty clusters
    keep the previous centroid. Returns (centroids, per-iteration inertia
    — strictly non-increasing by Lloyd's guarantee; the test asserts it).

    Scale notes: cost/iter = one scan + one (cell, dim)-key shuffle of
    k·dim partial sums per task. The distance expression is O(k·dim) per
    row inside codegen, and the GENERATED code grows with k — beyond a few
    hundred centroids the expression tree blows the JIT method limit.
    `assign` picks the kernel:

      * "expr" — the literal-centroid codegen expression (shared with
        `ivf_cell_expr`, oracle-reproducible fold arithmetic);
      * "arrow" — a mapInPandas kernel: per Arrow batch, ONE BLAS
        ||x||²+||c||²−2xCᵀ distance block + argmin + np.add.at partial
        sums, emitting k partial rows per PARTITION (shuffle is
        partitions×k rows — smaller than the expr path's posexplode).
        Distance arithmetic is matmul-reassociated, so assignments can
        differ from "expr" at floating-point-tie boundaries; argmin's
        first-minimum matches array_position's tie rule.
      * "auto" — "expr" for k ≤ 256, "arrow" above.

    init_centroids: explicit k×dim seeds replacing the xxhash64 spread
    init — warm restarts, and the ORACLE-REPLAY device (xxhash64 is
    not SQL-portable; caller-chosen seeds like "the k smallest-id
    vectors" are). round_to: round every updated centroid to this many
    decimals each iteration (the v_kmeans trajectory-pinning
    convention — rounded centroids re-enter as literals, so a SQL twin
    replaying the same rounds matches the discrete assignments
    exactly). Both default off; results are unchanged when unset.
    """
    if assign == "auto":
        assign = "expr" if k <= 256 else "arrow"
    if assign not in ("expr", "arrow"):
        raise ValueError(f"unknown assign {assign!r}: use 'expr'/'arrow'/'auto'")
    vec = F.col(vec_col)
    if init_centroids is not None:
        if len(init_centroids) != k:
            raise ValueError(
                f"init_centroids has {len(init_centroids)} rows, k={k}"
            )
        seed_dims = {len(c) for c in init_centroids}
        if len(seed_dims) != 1:
            raise ValueError(
                f"kmeans_fit: init_centroids rows have ragged dims "
                f"{sorted(seed_dims)} — every seed must share one length "
                "(zip_with truncates to the shorter side, silently "
                "corrupting every assignment)"
            )
        probe = df.select(F.size(vec).alias("d")).first()
        if probe is not None and probe["d"] != next(iter(seed_dims)):
            raise ValueError(
                f"kmeans_fit: init_centroids are dim "
                f"{next(iter(seed_dims))} but the first {vec_col!r} row "
                f"is dim {probe['d']} — zip_with truncates to the "
                "shorter side, so wrong-dim seeds flow into silently "
                "corrupted assignments (round-14 ADVICE; mirror of "
                "_assert_vec_dim)"
            )
        cents = [list(map(float, c)) for c in init_centroids]
    else:
        seed_rows = (
            df.select(vec.alias("v"))
            .orderBy(F.xxhash64(vec.cast("string")), vec.cast("string"))
            .limit(k)
            .collect()
        )
        cents = [list(map(float, r["v"])) for r in seed_rows]
        if len(cents) < k:
            raise ValueError(f"corpus has fewer than k={k} vectors")
    dim = len(cents[0])
    inertias: list[float] = []

    def _stats_expr(cents):
        """(sums, counts, inertia) via the codegen distance expression +
        posexplode partial aggregation — k·dim aggregate rows collected."""
        dists_sql = _sqdists_sql(f"`{vec_col}`", cents)
        if dists_sql is not None:
            dists = F.expr(dists_sql)
        else:
            dists = F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            vec,
                            _lit_vec(c),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    for c in cents
                ]
            )
        assigned = df.select(
            vec.alias("v"),
            F.array_position(dists, F.array_min(dists)).cast("int").alias("c"),
            F.array_min(dists).alias("d"),
        )
        rows = (
            assigned.select("c", "d", F.posexplode("v").alias("p", "x"))
            .groupBy("c", "p")
            .agg(
                F.sum("x").alias("sx"),
                F.count(F.lit(1)).alias("n"),
                F.sum("d").alias("sd"),
            )
            .collect()
        )
        sums = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        inertia = 0.0
        for r in rows:
            sums[r["c"] - 1][r["p"]] = r["sx"]
            if r["p"] == 0:
                counts[r["c"] - 1] = r["n"]
                inertia += r["sd"]
        return sums, counts, inertia

    def _stats_arrow(cents):
        """(sums, counts, inertia) via a mapInPandas kernel: one BLAS
        distance block + argmin per Arrow batch, k partial rows emitted
        per PARTITION (no posexplode, no wide aggregate codegen — the
        path that scales in k)."""
        import numpy as np
        import pandas as pd

        C = np.array(cents, dtype=np.float64)
        bc = df.sparkSession.sparkContext.broadcast(C)

        def partial(batches):
            Cv = bc.value
            kk, d = Cv.shape
            c2 = (Cv * Cv).sum(axis=1)
            sums = np.zeros((kk, d))
            counts = np.zeros(kk, dtype=np.int64)
            inert = np.zeros(kk)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["v"].tolist(), dtype=np.float64)
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; clamp the
                # reassociation's tiny negatives so inertia stays >= 0
                D = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ Cv.T) + c2
                np.maximum(D, 0.0, out=D)
                a = D.argmin(axis=1)  # first-min tie rule, as array_position
                np.add.at(sums, a, X)
                np.add.at(counts, a, 1)
                inert += np.bincount(
                    a, weights=D[np.arange(len(a)), a], minlength=kk
                )
            yield pd.DataFrame(
                {
                    "c": np.arange(kk),
                    "sx": list(sums),
                    "n": counts,
                    "sd": inert,
                }
            )

        rows = (
            df.select(vec.alias("v"))
            .mapInPandas(
                partial, "c int, sx array<double>, n long, sd double"
            )
            .collect()
        )
        sums = [[0.0] * dim for _ in range(k)]
        counts = [0] * k
        inertia = 0.0
        for r in rows:
            i = r["c"]
            counts[i] += r["n"]
            inertia += r["sd"]
            sx = r["sx"]
            acc = sums[i]
            for p in range(dim):
                acc[p] += sx[p]
        return sums, counts, inertia

    stats_of = _stats_expr if assign == "expr" else _stats_arrow
    for _ in range(max_iter):
        sums, counts, inertia = stats_of(cents)
        inertias.append(inertia)
        new_cents, shift = [], 0.0
        for i in range(k):
            if counts[i] > 0:
                cnew = [sums[i][p] / counts[i] for p in range(dim)]
            else:  # empty cluster: keep previous centroid
                cnew = cents[i]
            if round_to is not None:
                cnew = [round(x, round_to) + 0.0 for x in cnew]
            shift = max(
                shift, sum((a - b) ** 2 for a, b in zip(cnew, cents[i]))
            )
            new_cents.append(cnew)
        cents = new_cents
        if shift <= tol:
            break
    return cents, inertias


# ---------------------------------------------------------------------------
# Embedding aggregation: per-group centroids and centroid similarity
# ---------------------------------------------------------------------------


def label_centroids(
    df: DataFrame,
    label_col: Column | str,
    vec_col: Column | str,
    centroid_col: str = "centroid",
    count_col: str = "n",
) -> DataFrame:
    """Per-group mean embedding (mean pooling): one ARRAY<DOUBLE> centroid
    per label — cluster prototypes, class embeddings, per-source drift
    monitors. Output: (label, centroid ARRAY<DOUBLE>, n BIGINT).

    Plan: posexplode the vector and aggregate per (label, dim). Partial
    (map-side) aggregation reduces the shuffle to
    partitions x labels x dim rows REGARDLESS of corpus size — the same
    scale shape as `kmeans_fit`'s stats pass, but fully declarative and
    dim-agnostic (no per-dimension generated aggregate columns, which
    stress codegen past ~hundreds of dims). The second groupBy
    reassembles (dim, mean) pairs into an ordered array; it moves only
    labels x dim rows."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    e = df.select(
        lab.alias("__lab"), F.posexplode(_dc(vec_col)).alias("__pos", "__x")
    )
    per_dim = e.groupBy("__lab", "__pos").agg(
        F.avg("__x").alias("__m"), F.count(F.lit(1)).alias("__c")
    )
    return (
        per_dim.groupBy("__lab")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s["__m"],
            ).alias(centroid_col),
            # every dim of a row explodes together: count per dim == rows
            F.max("__c").alias(count_col),
        )
        .withColumnRenamed("__lab", label_col if isinstance(label_col, str) else "label")
    )


def centroid_similarity(
    centroids: DataFrame,
    label_col: str = "label",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Pairwise cosine similarity between group centroids: (label_a,
    label_b, cos) for label_a < label_b — the confusion-structure /
    source-drift report over the output of `label_centroids`.

    The input is one row per GROUP (tiny by construction), so the
    pairwise self-join is broadcast and the quadratic term is
    labels², never corpus² — the cheap final step of a two-stage plan
    whose expensive step (the corpus scan) was linear."""
    from pandasvcf_spark.functions.vectors import cosine_expr

    a = centroids.select(
        F.col(label_col).alias("label_a"), F.col(centroid_col).alias("__va")
    )
    b = centroids.select(
        F.col(label_col).alias("label_b"), F.col(centroid_col).alias("__vb")
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            cosine_expr("__va", "__vb").alias("cos"),
        )
    )


def maxsim_score(
    df: DataFrame,
    doc_col: Column | str,
    vec_col: Column | str,
    queries: list[tuple[int, list[float]]],
    score_col: str = "maxsim",
) -> DataFrame:
    """ColBERT-style MaxSim late interaction: each document is a BAG of
    vectors (multi-vector representation — per-token, per-chunk, or
    per-view embeddings) and its score against a multi-vector query is
    sum over query vectors of the max cosine against any document
    vector. Output: (doc, maxsim DOUBLE), one row per document.

    Plan: the query set (small by construction — a query is tens of
    vectors) is broadcast; every corpus vector scores all query vectors
    in one projection, then two partial-aggregated groupBys fold
    max-per-(doc, query) and sum-per-doc. The shuffle after partial
    aggregation is docs x queries rows, then docs rows — corpus size
    only appears in the linear scan. Exact by construction (this is the
    brute-force tier; bucket the corpus with the ANN machinery first
    when the doc set itself needs pruning)."""
    from pandasvcf_spark.functions.vectors import cosine_expr

    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "q_id int, q_vec array<double>",
    )
    doc = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    qn = qdf.select(
        "q_id", "q_vec", norm_expr("q_vec").alias("__qn")
    )
    corp = df.select(
        doc.alias("__doc"),
        _dc(vec_col).alias("__dv"),
        norm_expr(_dc(vec_col)).alias("__dn"),
    )
    scored = corp.join(F.broadcast(qn), on=F.lit(True)).select(
        "__doc",
        F.col("q_id"),
        _pair_cos(
            F.col("__dn"), F.col("__qn"), F.col("__dv"), F.col("q_vec")
        ).alias("__cos"),
    )
    per_q = scored.groupBy("__doc", "q_id").agg(F.max("__cos").alias("__m"))
    return (
        per_q.groupBy("__doc")
        .agg(F.sum("__m").alias(score_col))
        .withColumnRenamed("__doc", doc_col if isinstance(doc_col, str) else "doc")
    )


def pq_code_expr(
    vec: Column | str, codebooks: list[list[list[float]]]
) -> Column:
    """ARRAY<INT> of per-subspace nearest-centroid codes (1-based) —
    product-quantization encoding (Jégou et al. 2011): the vector is cut
    into len(codebooks) contiguous subvectors and each is assigned to
    its subspace codebook's nearest centroid, distance ties to the
    lowest code (the `ivf_cells_expr` struct-sort tie rule). One codegen
    pass, no shuffle, no Python; a 64-dim float vector compresses to
    8 small ints — the memory layout that lets an ANN index hold a
    corpus RAM-resident at 100 TB scale."""
    sub = len(codebooks[0][0])
    vsql = _dc_sql(vec)
    if vsql is not None:
        sql = _pq_code_sql(vsql, codebooks)
        if sql is not None:
            return F.expr(sql)
    v = _dc(vec)
    codes = []
    for s, cents in enumerate(codebooks):
        vs = F.slice(v, s * sub + 1, sub)
        pairs = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vs,
                            _lit_vec(c),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(ci + 1).cast("int").alias("i"),
                )
                for ci, c in enumerate(cents)
            ]
        )
        codes.append(F.element_at(F.array_sort(pairs), 1)["i"])
    return F.array(*codes)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode a corpus to PQ codes: (id_col, codes ARRAY<INT>) — the
    stored form an ADC index scans instead of raw vectors (8 ints vs 64
    floats: ~8× narrower scan, the point of PQ)."""
    return df.select(
        F.col(id_col), pq_code_expr(vec_col, codebooks).alias("codes")
    )


def _adc_table_expr(
    v: Column | str, codebooks: list[list[list[float]]]
) -> Column:
    """ARRAY<ARRAY<DOUBLE>> ADC lookup table T[s][c] = sqdist(v's
    subvector s, codebooks[s][c]) — the model-sized per-query table both
    `pq_adc_topk` (flat) and `ivfpq_topk` (per probed cell, over the
    residual) broadcast with the query. `v` as a plain column name
    (pre-`_dc`) takes the one-parse SQL fast path."""
    vsql = _dc_sql(v)
    if vsql is not None:
        sql = _adc_table_sql(vsql, codebooks)
        if sql is not None:
            return F.expr(sql)
    sub = len(codebooks[0][0])
    return F.array(
        *[
            F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.slice(v, s * sub + 1, sub),
                            _lit_vec(c),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    for c in cents
                ]
            )
            for s, cents in enumerate(codebooks)
        ]
    )


def _adc_sum_expr(n_sub: int) -> Column:
    """Σ_s __t[s][codes[s]] — the table-lookup ADC score over the
    joined (codes, __t) row."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_sub)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("__t"), s), F.element_at(F.col("codes"), s)
        ),
    )


def pq_adc_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus (Jégou et al.
    2011 ADC): per query, a distance TABLE T[s][c] = sqdist(query
    subvector s, codebook[s][c]) is computed once (subspaces × centroids
    doubles — the model-sized lookup table), broadcast with the query,
    and every corpus row scores as Σ_s T[s][codes[s]] — table lookups
    and adds only, never a touch of the original vectors. Output:
    (query_id, vec_id, adc_dist DOUBLE) ascending-is-nearer, rank ties
    by vec_id via one window per query partition.

    Plan: the codes relation (8 ints/row) broadcast-NL-joins the query
    set (small, `cosine_topk`'s contract) — the scan IS the index probe;
    shuffle is the per-query top-k window only. Approximation error is
    the quantization error; rerank survivors against raw vectors when
    exactness matters (compose with `cosine_topk` on the k·queries
    survivor set)."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        _adc_table_expr(vec_col, codebooks).alias("__t"),
    )
    scored = corpus_codes.join(F.broadcast(q), on=F.lit(True))
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    scored = scored.withColumn(
        "adc_dist", _adc_sum_expr(len(codebooks))
    )
    w = Window.partitionBy("__qid").orderBy("adc_dist", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("adc_dist"),
        )
    )


def pq_train_codebooks(
    df: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 20000,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Train PQ codebooks: per-subspace Lloyd k-means on a deterministic
    corpus sample (the `tail(sample_rows)`-free form: ascending-hash
    first rows via sort on xxhash — stable under partitioning). A
    MODEL-SIZED driver action by design — the sample (≤ sample_rows ×
    dim floats) and the codebooks (subspaces × centroids × subdim) are
    the model, exactly like the IVF trainer's k×dim stats; the corpus
    never collects. Deterministic: sample order, farthest-point-free
    evenly-strided init over the hash-sorted sample, fixed `iters`,
    empty clusters re-seeded to the largest cluster's farthest member.

    On clustered data this is where PQ earns its recall; on
    structureless (uniform/Gaussian) embeddings no codebook placement
    can beat distance concentration — measured on the synthetic corpus
    in tests and reported as bench telemetry, the `ivf_recall_at_10`
    honesty convention. Sample-based training is the faiss norm; to
    train on the FULL corpus instead, run the DataFrame-native
    `kmeans_fit` once per subspace over `F.slice(vec, s*sub+1, sub)`
    and stack the results — same output shape."""
    import numpy as np

    rows = (
        df.select(_dc(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<string>")))
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r.v for r in rows])
    dim = X.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces
    books: list[list[list[float]]] = []
    for s in range(n_subspaces):
        C = _lloyd_np(X[:, s * sub:(s + 1) * sub], n_centroids, iters)
        books.append([[float(x) for x in row] for row in C])
    return books


def _lloyd_np(Xs, n_centroids: int, iters: int):
    """Driver-side deterministic Lloyd on a numpy sample — the shared
    per-subspace trainer of `pq_train_codebooks` and `opq_fit`:
    evenly-strided init over the (already hash-sorted) sample, fixed
    `iters`, empty clusters re-seeded to the largest cluster's farthest
    member. Returns the n_centroids×subdim array."""
    import numpy as np

    stride = max(1, len(Xs) // n_centroids)
    C = Xs[::stride][:n_centroids].copy()
    while len(C) < n_centroids:  # tiny sample fallback
        C = np.vstack([C, Xs[: n_centroids - len(C)]])
    for _ in range(iters):
        d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(n_centroids):
            m = a == c
            if m.any():
                C[c] = Xs[m].mean(0)
            else:
                big = np.bincount(a, minlength=n_centroids).argmax()
                far = d2[a == big, big].argmax()
                C[c] = Xs[a == big][far]
    return C


def opq_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_centroids: int = 16,
    sample_rows: int = 20000,
    iters: int = 10,
    np_iters: int = 5,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Optimized Product Quantization (Ge et al. 2013, CVPR — the public
    faiss `OPQMatrix` shape): learn an ORTHOGONAL rotation R and PQ
    codebooks over the ROTATED space x' = R·x, so the quantizer's
    subspaces carry balanced, decorrelated variance — the trained
    lever SCALING.md named past the round-14 IMI recall ceiling.

    Parametric init (Ge et al. §4, OPQ-P): PCA of the hash-
    deterministic sample covariance, eigenvector signs fixed (largest-
    |component| entry positive — eigh's sign is arbitrary), principal
    directions dealt to subspaces by EIGENVALUE ALLOCATION: descending
    eigenvalues greedily land in the non-full bucket with the smallest
    log-variance product, balancing per-subspace information.
    Non-parametric refinement: `np_iters` alternations of per-subspace
    Lloyd (`_lloyd_np`, the `pq_train_codebooks` trainer) on the
    rotated sample and the orthogonal-Procrustes rotation update
    R ← V·Uᵀ from SVD(Σ xᵢ·x̂ᵢᵀ) — monotone in sample reconstruction
    error by construction (the pytest asserts it).

    Returns (R rows-as-lists [dim][dim], codebooks [n_subspaces][
    n_centroids][dim/n_subspaces]). Deterministic end to end. A
    model-sized driver action BY DESIGN, exactly like
    `pq_train_codebooks`: the sample (≤ sample_rows×dim floats) and
    the d×d rotation are the model; the corpus never collects (the
    faiss norm — OPQMatrix trains on a sample). Apply with
    `opq_rotate_expr` (JVM codegen, SQL-replayable) and compose with
    any PQ/IVF/IMI operator over the rotated column: with
    n_subspaces=2 the two returned books ARE the IMI half-space
    codebooks trained jointly with the rotation (Babenko & Lempitsky's
    Multi-D-ADC + OPQ composition)."""
    import numpy as np

    rows = (
        df.select(_dc(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<string>")))
        .limit(sample_rows)
        .collect()
    )
    if not rows:
        raise ValueError("opq_fit: empty corpus")
    X = np.array([r.v for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces

    # --- parametric init: PCA + eigenvalue allocation ---
    C = np.cov(X.T) if len(X) > 1 else np.eye(dim)
    w, V = np.linalg.eigh(C)
    for j in range(dim):  # sign fix: eigh's eigenvector sign is arbitrary
        i = int(np.abs(V[:, j]).argmax())
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    buckets: list[list[int]] = [[] for _ in range(n_subspaces)]
    logs = [0.0] * n_subspaces
    for idx in range(dim):  # descending-eigenvalue greedy deal
        b = min(
            (b for b in range(n_subspaces) if len(buckets[b]) < sub),
            key=lambda b: (logs[b], b),
        )
        buckets[b].append(idx)
        logs[b] += float(np.log(max(w[idx], 1e-12)))
    perm = [i for b in buckets for i in b]
    R = V[:, perm].T  # rows are output dims: x' = R @ x

    # --- non-parametric refinement: Lloyd <-> Procrustes ---
    def _books_and_recon(R):
        Xr = X @ R.T
        Xhat = np.empty_like(Xr)
        books = []
        for s in range(n_subspaces):
            Xs = Xr[:, s * sub:(s + 1) * sub]
            Cb = _lloyd_np(Xs, n_centroids, iters)
            a = ((Xs[:, None, :] - Cb[None, :, :]) ** 2).sum(-1).argmin(1)
            Xhat[:, s * sub:(s + 1) * sub] = Cb[a]
            books.append(Cb)
        return books, Xhat

    for _ in range(max(0, np_iters)):
        books, Xhat = _books_and_recon(R)
        # min_R Σ‖R·xᵢ − x̂ᵢ‖² = max tr(R·M), M = Σ xᵢ x̂ᵢᵀ → R* = V·Uᵀ
        U, _s, Vt = np.linalg.svd(X.T @ Xhat)
        R = (U @ Vt).T
    books, _ = _books_and_recon(R)
    return (
        [[float(x) for x in row] for row in R],
        [[[float(x) for x in row] for row in Cb] for Cb in books],
    )


def opq_rotate_expr(vec: Column | str, R: list[list[float]]) -> Column:
    """Rotated vector x' = R·x as ONE column expression — len(R) literal
    dot-product folds, whole-stage codegen, SQL-replayable (the DuckDB
    twin is a list_transform matmul over the same literals). O(d²) per
    row JVM-side; at d=64 that is 4,096 mul-adds — cheaper than one
    Python round-trip, and Catalyst prunes it when the rotated column
    is unused. Rows of R must share the input dim (validated — slice/
    zip_with truncate silently otherwise)."""
    dims = {len(r) for r in R}
    if len(dims) != 1:
        raise ValueError(
            f"opq_rotate_expr: R rows have ragged dims {sorted(dims)}"
        )
    vsql = _dc_sql(vec)
    if vsql is not None:
        folds = [_dot_fold_sql(vsql, row) for row in R]
        if folds and all(f is not None for f in folds):
            return F.expr("array(" + ",".join(folds) + ")")
    v = _dc(vec)
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    _lit_vec(row),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for row in R
        ]
    )


def _centroid_lit(centroids: list[list[float]]) -> Column:
    """Literal ARRAY<ARRAY<DOUBLE>> of coarse centroids (1-based
    element_at lookup by cell id)."""
    return _lit_mat(centroids)


def ivfpq_encode(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ index layout (Jégou et al. 2011 §IV; the faiss `IVFPQ`
    shape): every vector stores its coarse cell id plus the PQ codes of
    its RESIDUAL v − centroid[cell] — residual encoding is the detail
    that makes the composition beat either half alone (the residual's
    spread is the within-cell spread, so the same codebook bits resolve
    much finer structure than raw-vector PQ). Output: (id_col,
    cell INT, codes ARRAY<INT>) — ~9 small ints per vector, the
    RAM-resident posting-list row at 100 TB. One codegen pass, no
    shuffle, no Python."""
    with_cell = df.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        ivf_cell_expr(vec_col, centroids).alias("cell"),
    )
    code_sql = _pq_code_sql("`__resid`", codebooks)
    if code_sql is not None and all(
        _vec_sql(c) is not None for c in centroids
    ):
        # One-parse SQL path with the residual computed ONCE as a real
        # column behind a Generate barrier (explode of a 1-element
        # array — the genomics _gen_barrier device): CollapseProject
        # cannot substitute it back into the 128 subspace folds, so the
        # centroid literal appears once in the tree instead of once per
        # fold (131k-node projections measured seconds of analysis +
        # codegen compile per call, round 15). Both stages stay
        # whole-stage codegen; arithmetic and the struct-sort tie rule
        # are unchanged.
        cents_sql = (
            "array(" + ",".join(_vec_sql(c) for c in centroids) + ")"
        )
        bound = with_cell.select(
            F.col(id_col),
            "cell",
            F.explode(
                F.array(
                    F.expr(
                        f"zip_with(__vec, element_at({cents_sql}, cell), "
                        "(a, b) -> a - b)"
                    )
                )
            ).alias("__resid"),
        )
        return bound.select(
            F.col(id_col), "cell", F.expr(code_sql).alias("codes")
        )
    cents = _centroid_lit(centroids)
    resid = F.zip_with(
        F.col("__vec"),
        F.element_at(cents, F.col("cell")),
        lambda a, b: a - b,
    )
    return with_cell.select(
        F.col(id_col),
        "cell",
        pq_code_expr(resid, codebooks).alias("codes"),
    )


def ivfpq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF+PQ ANN — coarse cells PRUNE, ADC reranks within probed cells
    (the standard faiss IVFPQ composition; `pq_adc_topk` alone is a
    full-corpus scan per query, the honest objection to flat ADC at
    100 TB). Per query: its `n_probe` nearest cells are probed; for
    EACH probed cell an ADC table is built from the residual
    q − centroid[cell] (matching `ivfpq_encode`'s residual codes — the
    per-cell table is what makes residual ADC asymmetric-exact); corpus
    rows score as table lookups. ADC distances approximate
    ‖q − (centroid + decode(codes))‖² and are comparable ACROSS probed
    cells, so one top-k window finishes the query.

    Plan: queries × n_probe probe rows (each carrying a subspaces ×
    centroids double table — model-sized) BROADCAST onto an EQUI-JOIN
    with the codes relation on cell id — the scan touches only probed
    cells' postings, never the corpus; shuffle is the per-query top-k
    window only. A corpus vector lives in exactly one cell, so
    multi-probe never duplicates a (query, candidate) pair. Probe cost:
    |queries| × n_probe × cell-occupancy table lookups. Output:
    (query_id, vec_id, adc_dist DOUBLE) ascending-is-nearer, ties by
    vec_id. Rerank survivors against raw vectors (`cosine_topk` on the
    k·|queries| survivor set) when exactness matters."""
    probes = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        F.explode(
            ivf_cells_expr(vec_col, centroids, n_probe)
        ).alias("cell"),
    )
    tbl_sql = _adc_table_sql("rr", codebooks)
    if tbl_sql is not None and all(
        _vec_sql(c) is not None for c in centroids
    ):
        # one-parse SQL probe side: the per-cell residual is bound once
        # as a lambda variable (`transform(array(x), rr -> ...)[0]`) so
        # the centroid literal appears once per probe row instead of
        # once per ADC fold — same residual arithmetic and table values
        # as the Column path below (round 15: ONE curve-point call went
        # 25.6 s -> 3.2 s build+exec, rows bit-identical)
        cents_sql = (
            "array(" + ",".join(_vec_sql(c) for c in centroids) + ")"
        )
        rq_sql = (
            f"zip_with(__qvec, element_at({cents_sql}, cell), "
            "(a, b) -> a - b)"
        )
        probes = probes.select(
            "__qid",
            "cell",
            F.expr(
                f"transform(array({rq_sql}), rr -> {tbl_sql})[0]"
            ).alias("__t"),
        )
    else:
        cents = _centroid_lit(centroids)
        rq = F.zip_with(
            F.col("__qvec"),
            F.element_at(cents, F.col("cell")),
            lambda a, b: a - b,
        )
        probes = probes.select(
            "__qid", "cell", _adc_table_expr(rq, codebooks).alias("__t")
        )
    scored = corpus_codes.join(F.broadcast(probes), on="cell")
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    scored = scored.withColumn(
        "adc_dist", _adc_sum_expr(len(codebooks))
    )
    w = Window.partitionBy("__qid").orderBy("adc_dist", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("adc_dist"),
        )
    )


def rq_encode(
    df: DataFrame,
    cb1: list[list[float]],
    cb2: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level RESIDUAL quantization encode (Chen, Guan & Wang 2010;
    the RQ/additive-quantization family faiss ships as
    `ResidualQuantizer`) — the compression rung between IVF (1 coarse
    id) and PQ (subspace codes): level 1 snaps the vector to its
    nearest FULL-DIMENSION centroid, level 2 quantizes the RESIDUAL
    v − C1[c1] with a second full-dimension codebook, reconstruction =
    C1[c1] + C2[c2]. Unlike PQ's per-subspace independence, both codes
    see every dimension — RQ resolves global structure PQ splits
    across subspaces. Output: (id_col, c1 INT, c2 INT 1-based) — two
    small ints per vector. Training is two `kmeans_fit` calls (level 2
    on the residuals); deterministic literal codebooks are the
    oracle-replay path. One codegen pass, no shuffle, no Python.

    Encode arithmetic (replayed term-for-term by the SQL twin): c2's
    distances are ((v[j] − C1[j]) − C2[j])² — residual-first, NOT
    v − (C1 + C2)."""
    cents1 = _centroid_lit(cb1)
    c1 = ivf_cell_expr(vec_col, cb1)
    with_c1 = df.select(
        F.col(id_col), _dc(vec_col).alias("__vec"), c1.alias("c1")
    )
    resid = F.zip_with(
        F.col("__vec"),
        F.element_at(cents1, F.col("c1")),
        lambda a, b: a - b,
    )
    # bind the residual once: ivf_cell_expr replicates its argument
    # into |cb2| distance folds + the argmin pair — inlining the
    # zip_with subtree 18x is pure codegen/interpretation waste
    from pandasvcf_spark.functions.text import bound_expr

    return with_c1.select(
        F.col(id_col),
        "c1",
        bound_expr(
            resid, lambda r: ivf_cell_expr(r, cb2)
        ).alias("c2"),
    )


def rq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    cb1: list[list[float]],
    cb2: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Asymmetric top-k over an `rq_encode` index: per query,
    reconstruction distances to EVERY (c1, c2) code pair precompute as
    a |cb1| × |cb2| probe table (model-sized — 256 rows at 16×16), and
    the corpus scores as ONE equi-join on the code pair — the scan
    touches two ints per vector, the distance work is queries ×
    |cb1|·|cb2| folds TOTAL (not per corpus row; the ADC idea with the
    code pair as the join key):

        dist(q, v) ≈ ‖q − (C1[c1] + C2[c2])‖²

    Output: (query_id, vec_id, rq_dist DOUBLE) ascending-is-nearer,
    ties by vec_id, k per query via one rank window. Rerank survivors
    against raw vectors when exactness matters (`rerank_exact`)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cents1 = _centroid_lit(cb1)
    cents2 = _centroid_lit(cb2)
    rec = F.zip_with(
        F.element_at(cents1, F.col("c1")),
        F.element_at(cents2, F.col("c2")),
        lambda a, b: a + b,
    )
    probes = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            _dc(vec_col).alias("__qvec"),
        )
        .withColumn(
            "c1", F.explode(F.sequence(F.lit(1), F.lit(len(cb1))))
        )
        .withColumn(
            "c2", F.explode(F.sequence(F.lit(1), F.lit(len(cb2))))
        )
        .select(
            "__qid",
            "c1",
            "c2",
            F.aggregate(
                F.zip_with(F.col("__qvec"), rec, lambda a, b: a - b),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            ).alias("rq_dist"),
        )
    )
    scored = corpus_codes.join(F.broadcast(probes), on=["c1", "c2"])
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    w = Window.partitionBy("__qid").orderBy("rq_dist", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("rq_dist"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "vec_id",
    k: int = 60,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of any
    number of retriever result lists — the standard hybrid-retrieval
    combiner (BM25 ∪ dense ANN feeding a training-data retrieval or
    RAG pipeline): score(d) = Σ_lists 1/(k + rank_list(d)), k=60 per
    the paper. Rank-based, so the lists' raw scores never need
    calibrating against each other — exactly why RRF is the default
    fusion baseline.

    Each input DataFrame carries (id_col, rank INT) — a top-N list
    with ranks starting at 1. Output: (id_col, n_lists INT — how many
    lists surfaced the id, rrf_score DOUBLE raw — round at the edge if
    hashing, fused_rank INT), ordered by fused_rank; `topn` truncates.

    Plan shape: the inputs are top-N lists (retriever output, never
    corpus-sized), so this is a union of tiny relations, ONE groupBy,
    one list-sized rank window. Ties in rrf_score break by id — with
    ≤ a handful of IEEE-double reciprocal terms per id the sum is
    order-independent, so the order is deterministic and replayable."""
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = []
    for r in rankings:
        if id_col not in r.columns or "rank" not in r.columns:
            raise ValueError(f"each ranking needs ({id_col}, rank) columns")
        parts.append(r.select(F.col(id_col), F.col("rank").cast("int")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias(
            "rrf_score"
        ),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )
    if topn is not None:
        out = out.filter(F.col("fused_rank") <= int(topn))
    return out.orderBy("fused_rank")


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", dims: int | None = None
) -> DataFrame:
    """One-pass covariance statistics of an embedding column — the
    whitening / PCA-preprocessing matrix retrieval stacks fit before
    re-projecting vectors (Jégou & Chum 2012's whitening observation;
    also the input to OPQ rotation training). Output: upper triangle
    (i, j INT 0-based, i <= j, n BIGINT, mean_i, mean_j, cov DOUBLE)
    with the unbiased estimator cov = (Σx_i·x_j − Σx_i·Σx_j/n)/(n−1);
    NULL cov when n < 2.

    Plan — the blocked-BLAS discipline of `cosine_topk_blocked`: one
    mapInPandas pass computes per-Arrow-batch partial sums (count, Σx,
    X'X by one numpy matmul per batch), emitting D·(D+1)/2 partial rows
    PER BATCH, not per vector — vectors never shuffle, only D²-sized
    partial grids do, and the grouped sum that merges them is
    partial-agged. No per-row Python, no data×D² explode (the naive
    unnest self-join the oracle uses declaratively).

    Rows with NULL or wrong-length vectors are dropped (dims inferred
    from the first row when not given — one tiny job)."""
    import numpy as np
    import pandas as pd

    if dims is None:
        first = df.filter(F.col(vec_col).isNotNull()).select(
            F.size(vec_col).alias("d")
        ).first()
        if first is None:
            raise ValueError(f"no non-null vectors in {vec_col!r}")
        dims = first["d"]
    d = int(dims)
    nn = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == d)
    ).select(F.col(vec_col).alias("__v"))

    iu = np.triu_indices(d)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
            )
            n = M.shape[0]
            s = M.sum(axis=0)
            S = M.T @ M
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "c": np.full(len(iu[0]), n, dtype="int64"),
                    "si": s[iu[0]],
                    "sj": s[iu[1]],
                    "sij": S[iu],
                }
            )

    grid = nn.mapInPandas(
        partials,
        "i int, j int, c bigint, si double, sj double, sij double",
    )
    agg = grid.groupBy("i", "j").agg(
        F.sum("c").alias("n"),
        F.sum("si").alias("__si"),
        F.sum("sj").alias("__sj"),
        F.sum("sij").alias("__sij"),
    )
    n = F.col("n").cast("double")
    cov = F.when(
        F.col("n") >= 2,
        (F.col("__sij") - F.col("__si") * F.col("__sj") / n) / (n - 1.0),
    )
    return agg.select(
        "i",
        "j",
        "n",
        (F.round(F.col("__si") / n, 6) + 0.0).alias("mean_i"),
        (F.round(F.col("__sj") / n, 6) + 0.0).alias("mean_j"),
        (F.round(cov, 6) + 0.0).alias("cov"),
    )


def mutual_knn(
    pairs: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    sim_col: str = "cossim",
) -> DataFrame:
    """Reciprocal nearest-neighbor filter over a self-kNN pair table —
    keep (a, b) only when b is in a's top-k AND a is in b's top-k. The
    standard precision upgrade for similarity graphs before clustering
    or dedup (mutual-kNN graphs drop the hub/asymmetry false positives
    one-directional kNN is full of; the device behind RNN-descent and
    image-dedup pipelines' reciprocal check). Composes with ANY kNN
    producer — `cosine_topk`, `cosine_topk_blocked`, `ivf_topk`,
    `ann_banded_topk` — because it only sees the pair table.

    Output: (a_id, b_id, sim), each unordered mutual pair ONCE
    (a_id < b_id), sim taken from the a→b direction (symmetric metrics
    make the two directions equal; for asymmetric producers document
    which direction you feed). Plan: one equi-join of the pair table
    against its own reversal on the composite pair key — pairs are
    |corpus|·k rows, so the shuffle is k-bounded, never corpus²."""
    a = pairs.select(
        F.col(query_col).alias("a_id"),
        F.col(id_col).alias("b_id"),
        F.col(sim_col).alias("sim"),
    )
    rev = pairs.select(
        F.col(id_col).alias("a_id"), F.col(query_col).alias("b_id")
    )
    return (
        a.join(rev, on=["a_id", "b_id"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "sim")
    )


def knn_majority_vote(
    knn: DataFrame,
    labels: DataFrame,
    query_id_col: str = "query_id",
    vec_id_col: str = "vec_id",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over a kNN table — the
    label-propagation / leave-one-out-evaluation step after
    `cosine_topk_blocked`: each query takes the modal label of its
    neighbors, ties broken to the smallest label (deterministic, the
    repo's total-order rule).

    Output: (query_id, pred_label, n_votes BIGINT).

    Plan: one neighbor-id equi-join attaches labels (corpus×k rows,
    never corpus²), one (query, label) partial-aggregated count, one
    query-keyed rank window — all shuffles are kNN-table-sized.
    """
    lab = labels.select(
        F.col(id_col).alias(vec_id_col), F.col(label_col).alias("__nl")
    )
    votes = (
        knn.join(lab, vec_id_col)
        .groupBy(query_id_col, "__nl")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_votes").desc(), F.col("__nl").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            query_id_col,
            F.col("__nl").alias("pred_label"),
            "n_votes",
        )
    )


def dim_truncation_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Matryoshka-style dimension-truncation audit — "can we search
    with the first `dims` coordinates instead of the full vector?":
    per query, the exact top-k under full-dimension cosine is
    compared with the top-k under first-`dims` cosine, and the ONE
    summary row reports how much of the true neighborhood survives:

        recall@k = |topk_full ∩ topk_truncated| / k   (mean / min)

    The answer drives the storage/latency tier choice (truncated
    prefilter + full rerank is the standard two-stage shape; this
    measures what the prefilter loses). Both kNN passes are the
    exact broadcast scorer (`cosine_topk` — JVM fold-order cosine),
    the intersection is one (query, neighbor)-keyed equi-join, and
    everything after is queries x k sized.

    Output: ONE row (n_queries BIGINT, k INT, dims INT, mean_recall
    DOUBLE round 6, min_recall DOUBLE round 6).
    """
    if dims < 1:
        raise ValueError("dims must be >= 1")
    trunc_c = corpus.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    trunc_q = queries.select(
        F.col(query_id_col),
        F.slice(F.col(vec_col), 1, dims).alias(vec_col),
    )
    full = cosine_topk(
        corpus, queries, k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(F.col(query_id_col).alias("__q"), F.col(id_col).alias("__n"))
    trunc = cosine_topk(
        trunc_c, trunc_q, k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(F.col(query_id_col).alias("__q"), F.col(id_col).alias("__n"))
    hits = full.join(trunc, ["__q", "__n"]).groupBy("__q").agg(
        F.count(F.lit(1)).alias("__hit")
    )
    per_q = (
        full.select("__q")
        .distinct()
        .join(hits, "__q", "left")
        .select(
            (
                F.coalesce(F.col("__hit"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("__r")
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        F.lit(dims).cast("int").alias("dims"),
        F.round(F.avg("__r"), 6).alias("mean_recall"),
        F.round(F.min("__r"), 6).alias("min_recall"),
    )


def sq8_train(
    df: DataFrame,
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Train int8 scalar quantization: per-dimension (lo, hi) corpus
    bounds — the simplest embedding-compression tier (4x smaller than
    float32 at ~zero ranking loss on well-spread dims; the
    coarse-but-cheap sibling of `pq_train_codebooks`, faiss's SQ8).

    One aggregation pass (2·dim min/max expressions); the result is a
    model-sized driver object (2 × dim doubles) to broadcast as
    literals into `sq8_encode`/`sq8_topk` — the kmeans_fit contract."""
    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError("sq8_train: empty corpus")
    dim = len(first[0])
    aggs = []
    for i in range(dim):
        e = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs.append(F.min(e).alias(f"__lo{i}"))
        aggs.append(F.max(e).alias(f"__hi{i}"))
    row = df.agg(*aggs).collect()[0]
    return (
        [float(row[f"__lo{i}"]) for i in range(dim)],
        [float(row[f"__hi{i}"]) for i in range(dim)],
    )


def _sq8_bounds_lits(lo: list[float], hi: list[float]):
    lo_lit = _lit_vec(lo)
    hi_lit = _lit_vec(hi)
    return lo_lit, hi_lit


def sq8_encode(
    df: DataFrame,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize vectors to int8 codes against trained per-dim bounds:
    code_j = clip(floor((x_j - lo_j)/(hi_j - lo_j) * 256), 0, 255)
    (degenerate dims with hi = lo encode 0). Output: (id, codes
    ARRAY<INT>) — 4x storage cut, pure column HOF arithmetic, zero
    Python, zero shuffle."""
    lo_lit, hi_lit = _sq8_bounds_lits(lo, hi)
    x = _dc(vec_col)
    code = F.transform(
        x,
        lambda v, i: F.when(
            F.element_at(hi_lit, i + 1) > F.element_at(lo_lit, i + 1),
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v - F.element_at(lo_lit, i + 1))
                        / (
                            F.element_at(hi_lit, i + 1)
                            - F.element_at(lo_lit, i + 1)
                        )
                        * F.lit(256.0)
                    ),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return df.select(F.col(id_col), code.alias("codes"))


def sq8_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    lo: list[float],
    hi: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k nearest (squared L2) over an SQ8-quantized corpus: each
    code reconstructs to its cell midpoint r_j = lo_j + (code_j + 0.5)
    * (hi_j - lo_j)/256 and scores against the raw query — the
    asymmetric-distance convention (query stays exact, the pq_adc_topk
    argument). Output: (query_id, vec_id, sq_dist DOUBLE round 6),
    ascending-is-nearer, ties by vec_id.

    Plan: the codes relation broadcast-NL-joins the small query set
    (the cosine_topk contract); reconstruction is HOF arithmetic
    against 2·dim broadcast literals; shuffle is the per-query top-k
    window only. Quantization error is bounded by half a cell per dim
    — rerank survivors against raw vectors when exactness matters."""
    lo_lit, hi_lit = _sq8_bounds_lits(lo, hi)
    recon = F.transform(
        F.col("codes"),
        lambda c, i: F.element_at(lo_lit, i + 1)
        + (c.cast("double") + F.lit(0.5))
        * (
            F.element_at(hi_lit, i + 1) - F.element_at(lo_lit, i + 1)
        )
        / F.lit(256.0),
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"), _dc(vec_col).alias("__qv")
    )
    scored = corpus_codes.withColumn("__r", recon).join(
        F.broadcast(q), on=F.lit(True)
    )
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    dist = F.aggregate(
        F.zip_with(
            F.col("__qv"), F.col("__r"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = scored.withColumn("sq_dist", dist)
    w = Window.partitionBy("__qid").orderBy("sq_dist", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.round("sq_dist", 6).alias("sq_dist"),
        )
    )


def bq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-bit binary quantization — the extreme end of the compression
    ladder (float32 → SQ8 4x → PQ 32x → THIS, 64x at dim 64): each
    dimension keeps only its SIGN (x > 0), the standard binarization
    for centered embeddings, and the 64 bits pack into two BIGINT
    words (two 32-bit halves — packing all 64 into one signed BIGINT
    would need bit 63, and engines disagree on signed overflow, so
    the split is the portable layout). Hamming distance then costs
    two XOR + popcount ops per pair — the cheapest possible scan.

    Output: (id, code_lo BIGINT, code_hi BIGINT) — pure column HOF/
    bit arithmetic, zero Python, zero shuffle, exactly replayable.
    """
    x = _dc(vec_col)
    dim_half = 32

    def word(offset: int):
        # bit weight 2^i via pow-double→long (exact through 2^31;
        # shiftleft needs a literal shift count, pow takes the
        # lambda's index column)
        return F.aggregate(
            F.transform(
                F.slice(x, offset + 1, dim_half),
                lambda v, i: F.when(
                    v > 0,
                    F.pow(F.lit(2.0), i).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, b: acc + b,
        )

    return df.select(
        F.col(id_col),
        word(0).alias("code_lo"),
        word(dim_half).alias("code_hi"),
    )


def bq_hamming_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k nearest by Hamming distance over binary-quantized codes
    (symmetric binary-to-binary — both sides quantize, unlike the
    asymmetric SQ8/PQ scoring): dist = popcount(lo XOR lo') +
    popcount(hi XOR hi'). The coarse-candidate stage of a two-tier
    retrieval (rerank survivors with sq8_topk/cosine_topk when
    exactness matters).

    Output: (query_id, vec_id, hamming INT), ascending-is-nearer,
    ties by vec_id. Plan: the 2-word codes relation broadcast-NL-joins
    the small query set; distance is two XOR+popcount expressions;
    shuffle is the per-query top-k window only."""
    q = query_codes.select(
        F.col(query_id_col).alias("__qid"),
        F.col("code_lo").alias("__qlo"),
        F.col("code_hi").alias("__qhi"),
    )
    scored = corpus_codes.join(F.broadcast(q), on=F.lit(True))
    if exclude_self:
        scored = scored.filter(F.col("__qid") != F.col(id_col))
    dist = (
        F.bit_count(
            F.col("code_lo").bitwiseXOR(F.col("__qlo"))
        )
        + F.bit_count(F.col("code_hi").bitwiseXOR(F.col("__qhi")))
    ).cast("int")
    scored = scored.withColumn("hamming", dist)
    w = Window.partitionBy("__qid").orderBy("hamming", F.col(id_col))
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("hamming"),
        )
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "cosine",
) -> DataFrame:
    """Exact-cosine rerank of an ANN candidate set — the SECOND stage
    every quantized tier implies (bq/sq8/PQ docstrings all say "rerank
    survivors when exactness matters"; this is that operator):
    `candidates` is any (query_id, vec_id) pair relation from a coarse
    tier, and only THOSE vectors get exact scores.

    Output: (query_id, vec_id, cossim DOUBLE), top-k per query,
    descending, ties by vec_id — the cosine_topk contract.

    Plan: one vec_id-keyed equi-join prices the candidate vectors
    (queries x k_coarse rows — never the corpus), the query vectors
    ride a broadcast, then one per-query top-k window over the
    candidate-sized relation. Composes the ladder end-to-end:
    bq_hamming_topk(k=50) -> rerank_exact(k=5) scans sign bits and
    touches 50 raw vectors per query.

    `metric="l2"` reranks by exact SQUARED L2 instead (output column
    `sqdist`, ascending-is-nearer, ties by vec_id) — the rerank that
    matches an ADC shortlist's own metric, so IVFPQ + rerank measures
    pure quantization recovery with no cosine/L2 mismatch."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        _dc(vec_col).alias("__qvec"),
        norm_expr(_dc(vec_col)).alias("__qn"),
    )
    cand = candidates.select(
        F.col(query_id_col).alias("__qid"), F.col(id_col)
    )
    vecs = corpus.select(
        F.col(id_col),
        _dc(vec_col).alias("__vec"),
        norm_expr(_dc(vec_col)).alias("__cn"),
    )
    joined = cand.join(vecs, id_col).join(F.broadcast(q), "__qid")
    if metric == "cosine":
        score_col, order = "cossim", lambda c: F.desc(c)
        scored = joined.withColumn(
            "cossim",
            _pair_cos(
                F.col("__qn"), F.col("__cn"), F.col("__qvec"), F.col("__vec")
            ),
        )
    else:
        score_col, order = "sqdist", lambda c: F.asc(c)
        scored = joined.withColumn(
            "sqdist",
            F.aggregate(
                F.zip_with(
                    F.col("__vec"),
                    F.col("__qvec"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    w = Window.partitionBy("__qid").orderBy(
        order(score_col), F.col(id_col)
    )
    return (
        scored.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col(score_col),
        )
    )


def ivfpq_rerank_topk(
    corpus_codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    k_candidates: int = 50,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-probe IVFPQ with EXACT L2 rerank — the faiss
    IVFPQ+refine composition, closing the round-12 verdict gap
    (uniform-corpus ADC recall is quantization-limited at ~0.16; the
    rerank recovers everything the probed cells contain, lifting
    recall to the cell-coverage ceiling): stage one is `ivfpq_topk`
    probing `n_probe` cells per query for a `k_candidates` ADC
    shortlist; stage two exact-squared-L2-scores ONLY those raw
    vectors (`rerank_exact(metric="l2")`).

    Probe cost stays bounded: |queries| × n_probe × cell-occupancy
    table lookups for the shortlist, then |queries| × k_candidates
    raw-vector joins for the rerank — never a corpus scan per query.
    Output: (query_id, vec_id, sqdist DOUBLE) ascending-is-nearer,
    ties by vec_id."""
    cands = ivfpq_topk(
        corpus_codes,
        queries,
        centroids,
        codebooks,
        k=k_candidates,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
    )
    return rerank_exact(
        cands,
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        metric="l2",
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k_candidates: int = 20,
    lam: float = 0.75,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) — the rerank tier that trades raw similarity for
    coverage: after an exact cosine candidate stage (`cosine_topk`,
    `k_candidates` per query), greedily select `k` results by

        score(d) = λ·cos(q, d) − (1−λ)·max_{s ∈ selected} cos(d, s)

    (round 1: no selected set, the max term is 0). Deduplicates
    near-identical hits a plain top-k would stack; the standard RAG /
    search-results diversifier.

    Pick a λ whose 1−λ is double-exact when an SQL oracle replays the
    score (0.75, 0.5, 0.25 are; 0.7 is NOT — 1−0.7 =
    0.30000000000000004 — and a `0.3` SQL literal would drift).
    Fixed `k` greedy rounds, each a pure
    DataFrame step over CANDIDATE-SIZED tables (queries×k_candidates
    rows, localCheckpointed once): anti-join out the selected,
    one pair-sim max per remaining candidate, one deterministic
    argmax via max(struct(score, −id)) — never a per-query loop on
    the driver, never a Python UDF, and the corpus is touched only by
    the candidate stage.

    Output: (query_id, rank INT 1..k, vec_id, score DOUBLE round 6),
    rank in selection order."""
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    if k < 1 or k_candidates < k:
        raise ValueError(
            f"need 1 <= k <= k_candidates, got k={k}, "
            f"k_candidates={k_candidates}"
        )
    from pyspark.sql.types import NumericType

    if not isinstance(corpus.schema[id_col].dataType, NumericType):
        raise ValueError(
            f"mmr_rerank: {id_col!r} must be numeric — the greedy "
            "argmax tie-break negates it inside a struct max (string "
            "ids would ANSI-crash); map ids through a dense numeric "
            "key first"
        )
    one_m = 1.0 - float(lam)
    topk = cosine_topk(
        corpus, queries, k=k_candidates,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )
    cand = (
        topk.join(
            corpus.select(
                F.col(id_col), _dc(vec_col).alias("__emb")
            ),
            on=id_col,
        )
        .select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__v"),
            F.col("cossim").alias("__rel"),
            "__emb",
        )
        .localCheckpoint(eager=True)  # referenced 3x per greedy round
    )
    lam_c, one_c = F.lit(float(lam)), F.lit(one_m)
    sel = None
    for r in range(1, k + 1):
        if sel is None:
            rem = cand.withColumn(
                "__sc", lam_c * F.col("__rel") - one_c * F.lit(0.0)
            )
        else:
            rem = cand.join(
                sel.select("__q", "__v"), on=["__q", "__v"],
                how="left_anti",
            )
            mx = (
                rem.join(
                    F.broadcast(
                        sel.select(
                            "__q", F.col("__emb").alias("__semb")
                        )
                    ),
                    on="__q",
                )
                .groupBy("__q", "__v")
                .agg(
                    F.max(
                        cosine_expr(F.col("__emb"), F.col("__semb"))
                    ).alias("__ms")
                )
            )
            rem = rem.join(mx, on=["__q", "__v"]).withColumn(
                "__sc",
                lam_c * F.col("__rel") - one_c * F.col("__ms"),
            )
        pick = rem.groupBy("__q").agg(
            F.max(
                F.struct(
                    F.col("__sc").alias("sc"),
                    (-F.col("__v")).alias("nv"),
                    F.col("__v").alias("v"),
                    F.col("__emb").alias("emb"),
                )
            ).alias("__p")
        )
        sel_r = pick.select(
            "__q",
            F.col("__p.v").alias("__v"),
            F.col("__p.emb").alias("__emb"),
            F.lit(r).alias("__rank"),
            F.col("__p.sc").alias("__sc"),
        )
        sel = (
            sel_r if sel is None else sel.unionByName(sel_r)
        ).localCheckpoint(eager=True)  # selection-sized (queries x r)
    return sel.select(
        F.col("__q").alias(query_id_col),
        F.col("__rank").cast("int").alias("rank"),
        F.col("__v").alias(id_col),
        (F.round("__sc", 6) + F.lit(0.0)).alias("score"),
    )


def kmeans_silhouette(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified silhouette per cluster — the clustering-quality
    telemetry for the trained-centroid stack (IVF cells, SemDeDup
    cells, kmeans_fit itself): the classic silhouette's O(n²) pairwise
    term replaced by centroid distances (the standard "simplified
    silhouette", e.g. Hruschka et al. 2004 — what sklearn-scale
    pipelines actually compute at corpus size):

        a_i = ‖x_i − c_own‖        (L2 to the assigned centroid)
        b_i = min over other centroids ‖x_i − c‖
        s_i = (b_i − a_i) / max(a_i, b_i)     (0 when both are 0)

    s near 1 = tight, well-separated cells (cell-pruned ANN and
    SemDeDup's within-cell pairing work well); s near 0 = overlapping
    cells (raise k or expect recall/pair-coverage loss — the knob this
    number prices).

    Output: one row per cell — (cell INT, n BIGINT, mean_sil DOUBLE
    round 6, mean_a, mean_b DOUBLE round 6). Plan: the centroid list
    is a literal (k × dim doubles); distances, the own/other split and
    s_i are pure column expressions over ONE scan, then one
    partial-aggregated groupBy(cell) — no join, no shuffle beyond the
    k-row aggregate. Requires k >= 2 (b is undefined otherwise)."""
    if len(centroids) < 2:
        raise ValueError("silhouette needs >= 2 centroids")
    k = len(centroids)
    vsql = _dc_sql(vec_col)
    folds = (
        [_sqdist_fold_sql(vsql, c) for c in centroids]
        if vsql is not None
        else [None]
    )
    if all(f is not None for f in folds):
        dists = F.expr(
            "array(" + ",".join(f"sqrt({f})" for f in folds) + ")"
        )
    else:
        v = _dc(vec_col)
        dists = F.array(
            *[
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            v,
                            _lit_vec(c),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
                for c in centroids
            ]
        )
    cell = ivf_cell_expr(vec_col, centroids)
    rows = df.select(dists.alias("__d"), cell.alias("cell"))
    a = F.element_at(F.col("__d"), F.col("cell"))
    others = F.concat(
        F.slice(F.col("__d"), F.lit(1), F.col("cell") - 1),
        F.slice(
            F.col("__d"), F.col("cell") + 1, F.lit(k) - F.col("cell")
        ),
    )
    b = F.array_min(others)
    s = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    return (
        rows.select("cell", a.alias("__a"), b.alias("__b"), s.alias("__s"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.avg("__s"), 6) + F.lit(0.0)).alias("mean_sil"),
            (F.round(F.avg("__a"), 6) + F.lit(0.0)).alias("mean_a"),
            (F.round(F.avg("__b"), 6) + F.lit(0.0)).alias("mean_b"),
        )
    )


def davies_bouldin_index(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Davies-Bouldin index for a trained-centroid clustering (Davies
    & Bouldin 1979) — the second standard cluster-quality number
    beside `kmeans_silhouette` (sklearn's pairing), lower is better:

        s_i  = mean ‖x − c_i‖ over cell i's members   (scatter)
        d_ij = ‖c_i − c_j‖                            (separation)
        DB   = (1/k) Σ_i max_{j≠i} (s_i + s_j) / d_ij

    Output: ONE row (k INT, n BIGINT, db_index DOUBLE round 6;
    NULL when any pairwise centroid distance is 0 — duplicate
    centroids make the ratio undefined — or when any cell is empty,
    since its scatter is undefined).

    Plan: cell assignment + per-cell mean distance is ONE scan with
    literal-centroid arithmetic and a k-row grouped agg (the
    kmeans_silhouette pass); the k scatters COLLECT driver-side
    (model-sized, k doubles — the cox_ph discipline) and fold with
    the k×k literal centroid distances in fixed index order, so an
    unrolled SQL oracle replays the arithmetic."""
    import math

    k = len(centroids)
    if k < 2:
        raise ValueError("Davies-Bouldin needs >= 2 centroids")
    vsql = _dc_sql(vec_col)
    dists_sql = (
        _sqdists_sql(vsql, centroids) if vsql is not None else None
    )
    if dists_sql is not None:
        own = F.sqrt(
            F.element_at(
                F.expr(dists_sql), ivf_cell_expr(vec_col, centroids)
            )
        )
    else:
        v = _dc(vec_col)
        own = F.sqrt(
            F.element_at(
                F.array(
                    *[
                        F.aggregate(
                            F.zip_with(
                                v,
                                _lit_vec(c),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        for c in centroids
                    ]
                ),
                ivf_cell_expr(vec_col, centroids),
            )
        )
    per = (
        df.select(
            ivf_cell_expr(vec_col, centroids).alias("cell"),
            own.alias("__a"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("__a").alias("s"),
        )
        .collect()
    )
    n_total = sum(r["n"] for r in per)
    s = {r["cell"]: r["s"] for r in per}
    db = None
    if len(s) == k:
        dmat = {}
        ok = True
        for i in range(1, k + 1):
            for j in range(1, k + 1):
                if i == j:
                    continue
                d = math.sqrt(
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(
                            centroids[i - 1], centroids[j - 1]
                        )
                    )
                )
                if d == 0.0:
                    ok = False
                dmat[(i, j)] = d
        if ok:
            acc = 0.0
            for i in range(1, k + 1):
                worst = max(
                    (s[i] + s[j]) / dmat[(i, j)]
                    for j in range(1, k + 1)
                    if j != i
                )
                acc += worst
            db = acc / k
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(k, int(n_total), db)], "k int, n long, __db double"
    )
    return out.select(
        "k", "n",
        (F.round(F.col("__db"), 6) + F.lit(0.0)).alias("db_index"),
    )
