"""Deterministic sketches for corpus analytics (beyond-reference extension
surface, SURVEY §2.11 family).

The house discipline is exact external oracles, which rules out sketches
built on engine-internal hash families. Every sketch here is instead built
on the portable polynomial hash (plus, where the statistic demands
avalanche rather than equidistribution, the public mix32 finalizer), so
registers, counters and ESTIMATES — to the last bit — are pure functions
of the data, reproducible in ANSI SQL. Determinism as a feature:

  * KMV (k-minimum-values): order-statistic distinct count, relative error
    ~1/sqrt(k-2) (Bar-Yossef et al. 2002);
  * Count-Min: frequency grid, overcount-only point queries (Cormode &
    Muthukrishnan 2005);
  * HyperLogLog: leading-zero distinct count, ~1.04/sqrt(m), cell-wise-MAX
    mergeable (Flajolet et al. 2007).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import POLY_MOD, mix32_expr, poly_hash_expr


def kmv_distinct(
    df: DataFrame,
    key: Column | str,
    k: int = 1024,
) -> DataFrame:
    """KMV distinct-count estimate: one row
    (k_used INT, kth_hash BIGINT, estimate DOUBLE).

    Hash every key with the portable polynomial (uniform-ish over
    [0, POLY_MOD)), take the k smallest DISTINCT hash values; if the k-th
    is h_k, the density k/h_k extrapolates to estimate = (k-1) *
    POLY_MOD / h_k. Fewer than k distinct keys means the sketch saw
    everything — the estimate is then the exact distinct count.

    Plan shape at 100 TB: the shuffle moves 8-byte hashes, never keys
    (map-side partial DISTINCT collapses duplicates first), and the
    ORDER BY h LIMIT k is Spark's TakeOrdered — per-partition top-k then
    a k-row driver merge, NOT a global sort. The oracle recomputes the
    identical k-th hash, so even the floating-point estimate matches.

    The raw polynomial clusters into bands on shared-prefix keys (see
    hash_sample's caveat), which collapses a KMV estimate by ~10x
    (measured: est 672 for 5,000 true on 'document-content-<i>' keys).
    The sketch therefore scrambles with a Knuth multiplicative step,
    ``h' = (h * 2654435761) mod P``: a BIJECTION mod the prime (gcd = 1,
    distinct count untouched) that spreads each band into a
    low-discrepancy Weyl sequence across [0, P) — measured error after
    scrambling: <2.5% on prefix+counter, pure-decimal and mixed key
    shapes at k=512. The scramble is two integer ops, reproduced
    verbatim in the oracle SQL."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    kc = F.col(key) if isinstance(key, str) else key
    scrambled = (
        poly_hash_expr(kc.cast("string")) * F.lit(2654435761)
    ) % F.lit(POLY_MOD)
    # NULL-filter the raw key, not the hash: filtering on h would clone
    # the whole HOF hash expression into the Filter node (2x per-row
    # evaluation; the hash is NULL iff the key is NULL anyway)
    hashes = (
        df.filter(kc.isNotNull())
        .select(scrambled.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return hashes.agg(
        F.count(F.lit(1)).cast("int").alias("k_used"),
        F.max("h").alias("kth_hash"),
    ).select(
        "k_used",
        "kth_hash",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        )
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(float(POLY_MOD))) / F.col("kth_hash")
        )
        .alias("estimate"),
    )


def countmin_sketch(
    df: DataFrame,
    key: Column | str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch of a key's frequency distribution: (d INT,
    cell INT, n BIGINT), one row per NON-EMPTY cell of a depth × width
    counter grid (Cormode & Muthukrishnan 2005). Row d hashes the key
    with the portable polynomial over ``d || ':' || key`` (the seed
    prefix makes the rows independent, same device as
    `epoch_shuffle_key`), Knuth-scrambled for uniformity (the banding
    caveat — see `kmv_distinct`) and reduced mod `width`.

    The sketch is a pure groupBy: |rows| × depth hash evaluations, one
    partial-agged shuffle of at most depth × width cells — a
    fixed-size summary regardless of corpus size, mergeable across
    partitions/batches by cell-wise addition (union two sketches and
    re-aggregate). Estimates (see `countmin_estimate`) overcount only:
    est(x) >= true(x), with error <= 2N/width at ~e^-depth probability.
    Deterministic hash family → the whole grid, and therefore every
    estimate, is reproducible in ANSI SQL."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    kc = (F.col(key) if isinstance(key, str) else key).cast("string")
    rows = df.filter(kc.isNotNull()).select(kc.alias("__k")).select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), "__k"
    )
    return (
        rows.select("d", _cms_cell(F.col("d"), F.col("__k"), width).alias("cell"))
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cms_cell(d: Column, k: Column, width: int) -> Column:
    h = poly_hash_expr(F.concat(d.cast("string"), F.lit(":"), k))
    return (
        ((h * F.lit(2654435761)) % F.lit(POLY_MOD)) % F.lit(width)
    ).cast("int")


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key: Column | str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a `countmin_sketch`: for each row of `items`, the
    estimated frequency ``est = min over d of grid[d][h_d(key)]`` —
    all `items` columns are kept, plus est BIGINT. depth/width must
    match the sketch's build parameters (they are part of its identity).

    Plan: items expand × depth (tiny — items is a probe set), broadcast
    the sketch (bounded by depth × width rows by construction) onto the
    (d, cell) lookups, min per item. An absent cell means count 0."""
    kc = (F.col(key) if isinstance(key, str) else key).cast("string")
    probes = items.withColumn(
        "__d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn("__cell", _cms_cell(F.col("__d"), kc, width))
    joined = probes.join(
        F.broadcast(sketch.select(
            F.col("d").alias("__d"), F.col("cell").alias("__cell"), "n"
        )),
        ["__d", "__cell"],
        "left",
    )
    return (
        joined.groupBy(*items.columns)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def hll_sketch(
    df: DataFrame,
    key: Column | str,
    m: int = 256,
) -> DataFrame:
    """HyperLogLog register grid (Flajolet et al. 2007) over the portable
    polynomial hash finished with `mix32_expr`: (bucket INT, rho INT),
    one row per NON-EMPTY register of an `m`-bucket grid. The mixed
    32-bit hash splits into bucket = h mod m and a (32 − log2 m)-bit
    suffix w = h div m; rho is the position of w's leftmost 1-bit from
    the top of that suffix width (w = 0 → width + 1), and the register
    keeps the MAX rho seen.

    The same determinism argument as `kmv_distinct` applies: a fixed
    public hash family makes every register — and therefore the
    estimate — a pure function of the data, reproducible in ANSI SQL.
    The uniformizer differs on purpose: KMV's Knuth scramble is a Weyl
    sequence — ideal for order statistics, but its missing extreme gaps
    bias leading-zero statistics 20%+ low, so HLL avalanches with
    mix32_expr instead (measured: −23% → ≤7.5% across key shapes at
    m=256). What HLL adds over KMV is the merge story: grids are
    mergeable by cell-wise MAX (union register frames and re-aggregate)
    in O(m) — the cross-partition / cross-batch combine a 100 TB count
    wants — vs KMV's k-way minimum merge, and the shuffle moves at most
    m cells after map-side partial max. Accuracy ~1.04/sqrt(m)
    relative."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    p_bits = m.bit_length() - 1
    width = 32 - p_bits  # mixed hash is 32-bit; suffix w in [0, 2^width)
    kc = F.col(key) if isinstance(key, str) else key
    # NOT the Knuth scramble: rho is a leading-zero statistic, and the
    # scramble's Weyl sequence has no extreme gaps (measured: -23% bias
    # at 5k keys). mix32's avalanche restores geometric rho tails.
    mixed = mix32_expr(poly_hash_expr(kc.cast("string")))
    h = df.filter(kc.isNotNull()).select(mixed.alias("h"))
    # h < 2^32 and m is a power of two, so h/m is exact in double and
    # floor gives the integer suffix (Column has no // operator)
    w = F.floor(F.col("h") / F.lit(m)).cast("long")
    rho = F.when(
        w > 0, F.lit(width) - F.floor(F.log2(w)).cast("int")
    ).otherwise(F.lit(width + 1))
    return (
        h.select(
            (F.col("h") % F.lit(m)).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(sketch: DataFrame, m: int = 256) -> DataFrame:
    """Collapse a `hll_sketch` register grid to one row
    (m INT, n_zero INT, estimate DOUBLE): the bias-corrected harmonic
    mean α_m · m² / Σ 2^−M_j (empty registers contribute 2⁰), with the
    linear-counting small-range correction m·ln(m/V) when the raw
    estimate ≤ 2.5 m and V empty registers remain — the original paper's
    regime switch. One aggregation over ≤ m rows; pair with
    `hll_sketch`'s cell-wise-MAX merge for incremental maintenance."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    agg = sketch.agg(
        F.count(F.lit(1)).cast("int").alias("__hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
    )
    n_zero = F.lit(m) - F.col("__hit")
    s = F.col("__s") + n_zero.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        n_zero.cast("int").alias("n_zero"),
        est.alias("estimate"),
    )


def hll_group_estimate(
    df: DataFrame,
    group_cols: list[str],
    key: Column | str,
    m: int = 256,
) -> DataFrame:
    """Grouped HyperLogLog distinct counts — `hll_sketch` + `hll_estimate`
    per group key in ONE aggregation pipeline: (group cols..., n_zero
    INT, estimate DOUBLE). The production shape of the sketch (distinct
    users per page, distinct documents per shard): a per-(group, bucket)
    MAX-rho partial agg (at most groups × m cells after map-side
    combine), then a per-group collapse of ≤ m register rows computing
    the bias-corrected harmonic mean with the linear-counting switch.
    Exactly `hll_estimate`'s arithmetic, so the same bit-exact SQL
    replay holds group-wise."""
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    p_bits = m.bit_length() - 1
    width = 32 - p_bits
    kc = F.col(key) if isinstance(key, str) else key
    mixed = mix32_expr(poly_hash_expr(kc.cast("string")))
    h = df.filter(kc.isNotNull()).select(*group_cols, mixed.alias("h"))
    w = F.floor(F.col("h") / F.lit(m)).cast("long")
    rho = F.when(
        w > 0, F.lit(width) - F.floor(F.log2(w)).cast("int")
    ).otherwise(F.lit(width + 1))
    regs = (
        h.select(
            *group_cols,
            (F.col("h") % F.lit(m)).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    return _hll_collapse(regs, group_cols, m)


def _hll_collapse(regs: DataFrame, group_cols: list[str], m: int) -> DataFrame:
    """Collapse per-(group, bucket) MAX-rho registers into per-group
    bias-corrected HLL estimates (the shared tail of hll_group_estimate
    and sliding_distinct_hll): (group cols..., n_zero INT, estimate
    DOUBLE), exactly hll_estimate's arithmetic."""
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("__hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s"),
    )
    n_zero = F.lit(m) - F.col("__hit")
    s = F.col("__s") + n_zero.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        n_zero.cast("int").alias("n_zero"),
        est.alias("estimate"),
    )


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    support: float = 0.001,
    k: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters — every key with frequency >=
    ceil(support * N) and its exact count — via the two-pass
    Misra-Gries candidate protocol (Misra & Gries 1982; merge rule
    from Agarwal et al. 2013, "Mergeable summaries"). Output:
    (<key col>, cnt BIGINT), unordered.

    The naive plan (groupBy every key, filter) shuffles the ENTIRE
    key stream — at 100 TB that is the corpus. This plan never
    shuffles the long tail:

      * Pass 1 — candidates. Each partition folds its key stream
        through a k-counter Misra-Gries summary inside one
        `mapInPandas` pass (Arrow batches; per-batch vectorized
        value_counts merged into the running summary, then the
        standard reduction: subtract the (k+1)-th largest counter,
        drop the non-positive). Only the <= k surviving candidate
        keys per partition leave the executor — k*P rows total, no
        shuffle of the stream itself. The summary also emits its
        partition's row count, so N costs no extra scan.
      * Pass 2 — exact recount. The candidate union (distinct,
        <= k*P keys) broadcast-semi-joins the stream; only rows
        whose key IS a candidate reach the groupBy, so the shuffle
        carries heavy keys only. Exact counts, then the threshold
        filter.

    Why no false negatives: MG with k counters undercounts any key
    by at most N_i/(k+1) on partition i (total decrement mass is
    bounded by the partition's stream length). A key with global
    frequency >= support*N has, on SOME partition (averaging
    argument), local frequency >= support*N_i; with
    k >= ceil(2/support) (the default) that exceeds the maximum
    undercount, so the key survives that partition's summary. False
    positives cannot survive pass 2's exact recount — the sketch is
    used ONLY to prune, never to report a count, which is what makes
    the final relation deterministic (partitioning-independent) and
    exactly oracle-checkable as GROUP BY ... HAVING.

    The two driver-side scalars (N, threshold) are 1-row collects —
    the model-sized-collect convention (percentile edges, bucket
    totals)."""
    import math

    if not (0.0 < support < 1.0):
        raise ValueError(f"support must be in (0,1), got {support}")
    if k is None:
        k = int(math.ceil(2.0 / support))
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    name = key if isinstance(key, str) else df.select(key).columns[0]
    kc = F.col(name)
    keyed = df.filter(kc.isNotNull()).select(kc.alias("__k"))
    ktype = keyed.schema["__k"].dataType.simpleString()

    def mg(batches):
        import pandas as pd

        counts: dict = {}
        n_rows = 0
        for pdf in batches:
            col = pdf["__k"]
            n_rows += len(col)
            for val, c in col.value_counts().items():
                counts[val] = counts.get(val, 0) + int(c)
            if len(counts) > k:
                sub = sorted(counts.values(), reverse=True)[k]
                counts = {x: c - sub for x, c in counts.items() if c > sub}
        yield pd.DataFrame(
            {
                "__k": list(counts.keys()) + [None],
                "__pn": [None] * len(counts) + [n_rows],
            }
        )

    summary = keyed.mapInPandas(
        mg, schema=f"__k {ktype}, __pn bigint"
    ).persist()
    # materialize everything needed from the summary, then release the
    # cache before returning — the candidate set is ≤ k·n_partitions
    # rows, so pinning it via a local DataFrame (not the cached plan)
    # keeps executor memory clean for the life of the session
    try:
        n_total = (
            summary.agg(F.sum("__pn").alias("n")).collect()[0]["n"] or 0
        )
        if n_total == 0:
            return keyed.select(F.col("__k").alias(name)).limit(
                0
            ).withColumn("cnt", F.lit(0).cast("long"))
        cand_rows = (
            summary.filter(F.col("__k").isNotNull())
            .select("__k")
            .distinct()
            .collect()
        )
    finally:
        summary.unpersist()
    threshold = int(math.ceil(support * n_total))
    cands = keyed.sparkSession.createDataFrame(
        cand_rows, schema=f"__k {ktype}"
    )
    out = (
        keyed.join(F.broadcast(cands), "__k", "leftsemi")
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .select(F.col("__k").alias(name), "cnt")
    )
    return out


def quantile_grid(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_cells: int = 256,
) -> DataFrame:
    """Mergeable equal-width quantile sketch — the fourth standard
    sketch beside KMV (distinct), HLL (mergeable distinct) and
    Count-Min (frequency): a fixed-domain histogram grid (cell INT,
    c BIGINT), one row per NON-EMPTY cell of an `n_cells`-cell
    equal-width partition of [lo, hi). Out-of-domain values clamp into
    the edge cells — fixed bounds are the PRICE of additivity (get
    them from `profile_table`; a data-dependent domain would make two
    sketches unmergeable), and the deterministic grid is what keeps
    the estimate oracle-replayable where a t-digest's
    insertion-order-dependent centroids are not.

    Merge = cell-wise SUM (union grids, re-aggregate) — the additive
    combine of `countmin_sketch`, so per-shard/per-day grids roll up
    in O(n_cells); the shuffle moves at most n_cells cells after
    map-side partial sums. Query with `quantile_grid_estimate`;
    value-domain error ≤ one cell width. NULL values are excluded."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if n_cells < 2:
        raise ValueError(f"n_cells must be >= 2, got {n_cells}")
    v = F.col(value_col).cast("double")
    w = (hi - lo) / n_cells
    cell = F.least(
        F.greatest(F.floor((v - lo) / w), F.lit(0)), F.lit(n_cells - 1)
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(cell.alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def quantile_grid_estimate(
    grid: DataFrame,
    probs: list[float],
    lo: float,
    hi: float,
    n_cells: int = 256,
) -> DataFrame:
    """Quantile estimates from a `quantile_grid` sketch: for each prob,
    the MIDPOINT of the cell containing the type-1 rank max(1,
    ceil(N·p)) under the cumulative cell walk — a deterministic rule
    (no interpolation heuristics), so the whole estimate replays in
    SQL. Output: (p DOUBLE, est DOUBLE round 6, cell INT). Error ≤
    half a cell width for in-domain data by construction. Runs
    entirely on the ≤ n_cells-row grid."""
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"probs must be in [0, 1], got {p}")
    w = (hi - lo) / n_cells
    wc = Window.orderBy("cell").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.withColumn("__cum", F.sum("c").over(wc)).crossJoin(
        F.broadcast(grid.agg(F.sum("c").alias("__N")))
    )
    pcol = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    targets = cum.select("cell", "__cum", "__N", "c", pcol).withColumn(
        "__r",
        F.greatest(F.lit(1).cast("bigint"),
                   F.ceil(F.col("__N") * F.col("p"))),
    )
    hit = targets.filter(
        (F.col("__cum") >= F.col("__r"))
        & (F.col("__cum") - F.col("c") < F.col("__r"))
    )
    est = F.lit(lo) + (F.col("cell") + 0.5) * F.lit(w)
    return hit.select(
        "p",
        (F.round(est, 6) + 0.0).alias("est"),
        "cell",
    )


def sliding_distinct_hll(
    df: DataFrame,
    ts_col: str,
    key: Column | str,
    window_hours: int = 24,
    m: int = 256,
) -> DataFrame:
    """Sliding-window distinct counts via mergeable HLL grids — the
    "distinct users in the trailing 24 h, per hour" metric that EXACT
    distinct cannot provide at scale (every slide re-counts the whole
    window) and that the MAX-merge property solves in one pass: build
    each hour's register grid ONCE, replicate grid CELLS (never rows
    of data) into the ≤ `window_hours` windows they serve, cell-wise
    MAX, collapse. Output: (win_end TIMESTAMP — the hour the window
    ends in, inclusive; n_hours BIGINT — hours of data actually inside
    the window; n_zero INT; estimate DOUBLE), one row per hour present
    in the data (leading windows are PARTIAL — n_hours says how
    partial, the honest convention for the stream's warm-up).

    Why this beats re-counting: the shuffle after the per-hour grid is
    hours × m × window_hours CELLS, independent of corpus size; exact
    sliding distinct shuffles the key stream window_hours times.
    Accuracy is `hll_estimate`'s ~1.04/√m, identical across slides
    because every window's grid is exactly what a from-scratch build
    would produce (MAX-merge is idempotent and lossless)."""
    if window_hours < 1:
        raise ValueError(
            f"window_hours must be >= 1, got {window_hours}"
        )
    if m < 16 or m & (m - 1):
        raise ValueError(f"m must be a power of two >= 16, got {m}")
    p_bits = m.bit_length() - 1
    width = 32 - p_bits
    kc = F.col(key) if isinstance(key, str) else key
    ts = F.col(ts_col)
    base = df.filter(kc.isNotNull() & ts.isNotNull())
    hour = F.date_trunc("hour", ts)
    mixed = mix32_expr(poly_hash_expr(kc.cast("string")))
    h = base.select(hour.alias("__h"), mixed.alias("h"))
    w = F.floor(F.col("h") / F.lit(m)).cast("long")
    rho = F.when(
        w > 0, F.lit(width) - F.floor(F.log2(w)).cast("int")
    ).otherwise(F.lit(width + 1))
    grid = (
        h.select(
            "__h",
            (F.col("h") % F.lit(m)).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("__h", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    # replicate grid CELLS into the windows they serve, then keep only
    # windows ending at an hour that exists in the data
    tgt = grid.select(
        F.explode(
            F.sequence(
                F.col("__h"),
                F.col("__h")
                + F.expr(f"INTERVAL {window_hours - 1} HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("win_end"),
        "__h",
        "bucket",
        "rho",
    )
    present = grid.select(F.col("__h").alias("win_end")).distinct()
    merged = (
        tgt.join(present, on="win_end")
        .groupBy("win_end", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    hours_in = (
        tgt.join(present, on="win_end")
        .select("win_end", "__h")
        .distinct()
        .groupBy("win_end")
        .agg(F.count(F.lit(1)).alias("n_hours"))
    )
    est = _hll_collapse(merged, ["win_end"], m)
    return est.join(hours_in, on="win_end").select(
        "win_end", "n_hours", "n_zero", "estimate"
    )


def kmv_intersect(
    df_a: DataFrame,
    key_a: Column | str,
    df_b: DataFrame,
    key_b: Column | str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style set intersection from two KMV sketches
    (Dasgupta et al. 2016, the DataSketches theta framework) — the
    mergeable answer to "how much do these two corpora overlap?"
    without shuffling either corpus: each side keeps its k smallest
    distinct scrambled hashes, theta = min of the two k-th hashes
    (P = POLY_MOD when a side saw fewer than k distinct keys — its
    sketch is then exhaustive), and every sketch hash <= theta is a
    uniform sample of the corresponding set at density theta / P:

        est_intersection = n_common * P / theta
        jaccard ~= n_common / n_union      (both within theta)

    When BOTH sides are exhaustive the estimates are exact counts.

    Output: ONE row (k_used_a, k_used_b INT, theta BIGINT, n_common,
    n_union BIGINT, jaccard DOUBLE round 6, est_intersection DOUBLE
    round 4, est_union DOUBLE round 4).

    Plan shape at 100 TB: per side one map-side-distinct TakeOrdered
    over 8-byte hashes (the kmv_distinct plan — per-partition top-k +
    a k-row driver merge, no global sort); everything downstream is
    sketch-sized (<= 2k rows) with 1-row broadcast combines. The
    estimate replays bit-for-bit: all inputs are integers and the
    scaling is one multiply + one divide."""
    from pandasvcf_spark.functions.text import POLY_MOD, poly_hash_expr

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def sketch(df, key):
        kc = F.col(key) if isinstance(key, str) else key
        scrambled = (
            poly_hash_expr(kc.cast("string")) * F.lit(2654435761)
        ) % F.lit(POLY_MOD)
        return (
            df.filter(kc.isNotNull())
            .select(scrambled.alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
        )
    ha = sketch(df_a, key_a)
    hb = sketch(df_b, key_b)
    ka = ha.agg(
        F.count(F.lit(1)).cast("int").alias("k_used_a"),
        F.max("h").alias("__kth_a"),
    )
    kb = hb.agg(
        F.count(F.lit(1)).cast("int").alias("k_used_b"),
        F.max("h").alias("__kth_b"),
    )
    p = F.lit(POLY_MOD).cast("long")
    th = ka.join(F.broadcast(kb)).select(
        "k_used_a",
        "k_used_b",
        F.least(
            F.when(F.col("k_used_a") < k, p).otherwise(F.col("__kth_a")),
            F.when(F.col("k_used_b") < k, p).otherwise(F.col("__kth_b")),
        ).alias("theta"),
    )
    inter = (
        ha.join(hb, "h")
        .join(F.broadcast(th))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    uni = (
        ha.unionAll(hb)
        .distinct()
        .join(F.broadcast(th))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_union"))
    )
    pd_ = F.lit(float(POLY_MOD))
    return (
        th.join(F.broadcast(inter))
        .join(F.broadcast(uni))
        .select(
            "k_used_a",
            "k_used_b",
            "theta",
            "n_common",
            "n_union",
            F.round(
                F.when(
                    F.col("n_union") > 0,
                    F.col("n_common").cast("double") / F.col("n_union"),
                ),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("n_common").cast("double") * pd_
                / F.col("theta"),
                4,
            ).alias("est_intersection"),
            F.round(
                F.col("n_union").cast("double") * pd_ / F.col("theta"),
                4,
            ).alias("est_union"),
        )
    )


def ams_f2_sketch(
    df: DataFrame,
    key: Column | str,
    rows: int = 32,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996):
    (r INT, s BIGINT), one signed sum per estimator row,

        s_r = sum_k sign_r(key_k) * count(key_k),   E[s_r²] = F2

    where F2 = Σ c_k² is the self-join size / repeat rate of the key —
    the statistic that prices a shuffle join's output and a key's skew
    in ONE number. sign_r comes from one bit of the seeded portable
    polynomial hash (`r || ':' || key`, Knuth-scrambled — the
    countmin_sketch seeding device), so the whole sketch is
    deterministic and ANSI-SQL-replayable.

    Plan: one data-sized groupBy collapses to per-key counts; the
    `rows`-way explode runs over DISTINCT KEYS only (never raw rows)
    and partial-aggs into a fixed `rows`-cell grid. Mergeable: signed
    sums add cell-wise across batches/shards (union + re-sum by r).
    Estimate with `ams_f2_estimate`."""
    if rows < 1:
        raise ValueError(f"need rows >= 1, got {rows}")
    kc = (F.col(key) if isinstance(key, str) else key).cast("string")
    counts = (
        df.filter(kc.isNotNull())
        .groupBy(kc.alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    exploded = counts.select(
        F.explode(F.sequence(F.lit(0), F.lit(rows - 1))).alias("r"),
        "__k",
        "__c",
    )
    h = poly_hash_expr(
        F.concat(F.col("r").cast("string"), F.lit(":"), F.col("__k"))
    )
    sign = (
        F.lit(2) * (((h * F.lit(2654435761)) % F.lit(POLY_MOD)) % F.lit(2))
        - F.lit(1)
    )
    return (
        exploded.select("r", (sign * F.col("__c")).alias("__sc"))
        .groupBy("r")
        .agg(F.sum("__sc").cast("long").alias("s"))
    )


def ams_f2_estimate(sketch: DataFrame) -> DataFrame:
    """Fold an `ams_f2_sketch` into the F2 point estimate: the mean of
    the squared signed sums (the basic unbiased AMS estimator;
    variance ~ 2 F2²/rows — pick rows for the precision you need).
    Output (1 row): f2_est DOUBLE round 2. Squares compute in DOUBLE
    (exact for |s| < 2^26 ~ 67M repeat-pairs per row; beyond that the
    2dp rounding absorbs the ulp) so BIGINT*BIGINT can never
    overflow."""
    s = F.col("s").cast("double")
    return sketch.agg(
        (F.round(F.avg(s * s), 2) + F.lit(0.0)).alias("f2_est")
    )
