"""Deterministic sampling, source mixing, per-group capping, token-budget
selection, filter-funnel accounting, and sequence packing — the
corpus-shaping operators of a training-data pipeline (beyond-reference
extension surface, same family as operators/dedup.py).

Design rules shared by all of them:
  * determinism is a feature, not an accident: sampling keys on a portable
    content hash (`poly_hash_expr` — exactly reproducible in ANSI SQL, so
    the oracle recomputes the same sample), never on RAND() or partition
    order;
  * every operator is a pure column/window plan — no Python, no collect;
  * the scale story is explicit: per-group windows shuffle by group key
    and parallelize across groups; the one inherently sequential operator
    (next-fit packing) takes a `shard_col` so each shard packs
    independently — the shape real pipelines use (pack within output
    shards), keeping the window partitioned instead of global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import POLY_MOD, poly_hash_expr


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic content-keyed sample: keep rows whose portable hash of
    `key` lands in the first `fraction` of `buckets` residue classes —
    `poly_hash(key) % buckets < fraction * buckets`.

    Unlike `df.sample()` (seeded per-partition RNG: resampling after a
    repartition or a rerun yields a DIFFERENT row set), this sample is a
    pure function of row content: stable across runs, partitionings and
    engines, and composable (a 1% sample is a subset of the same key's
    10% sample because the residue classes nest). The filter is a plain
    predicate — it pushes into scans of tables materialized with the hash
    column. Selection granularity is 1/buckets.

    Rate accuracy depends on key entropy: the portable polynomial is
    affine in a string's tail characters, so a small CONTIGUOUS block of
    decimal ids lands in a narrow residue band and its local sampling
    rate can deviate far from `fraction` (measured in
    tests/test_corpus_shaping.py). Over a wide id range the bands wrap
    the modulus many times and the aggregate rate converges; for
    rate-critical sampling of short sequential keys, key on content
    (e.g. a text fingerprint) instead."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    k = F.col(key) if isinstance(key, str) else key
    threshold = int(round(fraction * buckets))
    return df.filter(
        poly_hash_expr(k.cast("string")) % F.lit(buckets) < F.lit(threshold)
    )


def mix_sources(
    df: DataFrame,
    group_col: Column | str,
    weights: dict[str, float],
    key: Column | str,
    buckets: int = 10_000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Weighted source mixing: keep `weights[source]` of each source's rows
    (deterministically, via the same portable content-hash predicate as
    `hash_sample`) — the "20% of web, 100% of books, 5% of forums" step
    every pretraining mixture specifies. Groups absent from `weights` get
    `default_fraction` (0.0 = drop unknown sources, the safe default for a
    curated mixture; 1.0 = pass them through).

    The per-group threshold is a small literal map looked up per row
    (`element_at` on a CREATE_MAP — no join, no second scan), and the
    whole operator is one pure predicate: it pushes into scans, it
    composes with itself (re-weighting a source re-uses the same nested
    residue classes, so lowering 20% -> 10% keeps a subset of the same
    rows — stable corpus diffs across mixture revisions), and two runs
    on different partitionings keep identical row sets."""
    for src, frac in weights.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"weight for {src!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    k = F.col(key) if isinstance(key, str) else key
    pairs: list[Column] = []
    for src, frac in sorted(weights.items()):
        pairs.append(F.lit(src))
        pairs.append(F.lit(int(round(frac * buckets))))
    default_t = F.lit(int(round(default_fraction * buckets)))
    threshold = (
        F.coalesce(F.element_at(F.create_map(*pairs), g.cast("string")), default_t)
        if pairs
        else default_t
    )
    return df.filter(poly_hash_expr(k.cast("string")) % F.lit(buckets) < threshold)


def filter_funnel(
    df: DataFrame,
    stages: list[tuple[str, Column]],
) -> DataFrame:
    """One-pass filter-funnel accounting: for an ordered list of (name,
    predicate) quality gates, report how many rows survive each prefix of
    the pipeline — the "input 10B docs -> 7.2B after lang-id -> 5.1B after
    quality -> ..." table every corpus-cleaning run publishes.

    Returns (stage_idx INT, stage STRING, survivors BIGINT), row 0 being
    the unfiltered input count. Survivors at stage i are rows passing
    predicates 1..i CONJOINED — the funnel is monotone by construction,
    which per-stage independent counts (a common accounting bug) are not.
    The plan is ONE scan with a partial-aggregated conditional sum per
    stage (no per-stage job, no cache dance); the long output shape comes
    from exploding the single aggregated row, so the whole report costs
    exactly one pass over the data at any corpus size. NULL predicate
    results count as failures (filter semantics), not as missing data."""
    aggs = [F.count(F.lit(1)).alias("__s0")]
    conj: Column | None = None
    for i, (_, pred) in enumerate(stages, start=1):
        conj = pred if conj is None else (conj & pred)
        aggs.append(
            F.sum(F.when(conj, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"__s{i}")
        )
    row = df.agg(*aggs)
    names = ["input"] + [name for name, _ in stages]
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(names[i]).alias("stage"),
                F.coalesce(F.col(f"__s{i}"), F.lit(0)).cast("long").alias("survivors"),
            )
            for i in range(len(names))
        ]
    )
    return row.select(F.explode(entries).alias("e")).select(
        "e.stage_idx", "e.stage", "e.survivors"
    )


def take_token_budget(
    df: DataFrame,
    token_col: str,
    budget: int,
    key: Column | str,
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic token-budget selection: order the corpus by
    (portable_hash(key) % buckets, key) and keep documents while the
    EXCLUSIVE running token sum is under `budget` — "give me the first
    1T tokens of this corpus, reproducibly". The one document straddling
    the boundary is kept (its first token is inside the budget), so the
    selection is exactly the prefix a sequential reader would take.

    Scale story — the global prefix sum never happens: per-bucket token
    totals are one tiny aggregation (`buckets` rows to the driver — a
    documented model-size collect, same class as the k-means stats);
    the driver's cumulative walk finds the single boundary bucket, and
    only THAT bucket (~1/buckets of the corpus) pays a window sort. Every
    earlier bucket is admitted by a pure pushdown-able predicate and
    every later bucket is pruned by the same predicate; rerunning with a
    bigger budget keeps a superset (the order is content-keyed, not
    partition-dependent).

    NULL-key policy: rows with a NULL key are excluded, matching the
    other hash-keyed operators here (hash_sample / mix_sources /
    split_label_expr) — a NULL key has no stable content identity, so it
    cannot participate in a reproducible content-ordered prefix."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    k = F.col(key) if isinstance(key, str) else key
    bucket = (poly_hash_expr(k.cast("string")) % F.lit(buckets)).alias("__bkt")
    toks = F.col(token_col).cast("long")
    with_b = df.filter(k.isNotNull()).withColumn("__bkt", bucket)
    totals = {
        r["__bkt"]: r["t"]
        for r in with_b.groupBy("__bkt")
        .agg(F.coalesce(F.sum(toks), F.lit(0)).alias("t"))
        .collect()
    }
    running = 0
    full_max = -1  # highest bucket id admitted wholesale
    boundary = None  # (bucket_id, tokens_already_spent) for the window bucket
    for b in sorted(totals):
        if running >= budget:
            break
        if running + totals[b] < budget:
            full_max = b
        else:
            boundary = (b, running)
            break
        running += totals[b]
    if boundary is None:
        return with_b.filter(F.col("__bkt") <= F.lit(full_max)).drop("__bkt")
    b_star, spent = boundary
    w = Window.partitionBy("__bkt").orderBy(k)
    excl = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    full = with_b.filter(F.col("__bkt") <= F.lit(full_max))
    edge = (
        with_b.filter(F.col("__bkt") == F.lit(b_star))
        .withColumn("__excl", excl)
        .filter(F.col("__excl") < F.lit(budget - spent))
        .drop("__excl")
    )
    return full.unionByName(edge).drop("__bkt")


def split_label_expr(
    key: Column | str,
    fractions: dict[str, float],
    buckets: int = 10_000,
) -> Column:
    """Deterministic train/val/test assignment: a STRING label column
    mapping each row to one split by content-hash residue bands —
    ``fractions={'train': 0.98, 'val': 0.01, 'test': 0.01}``. Splits are
    DISJOINT and EXHAUSTIVE by construction (consecutive residue bands in
    the given dict order; fractions must sum to 1 within 1/buckets), and,
    like all the hash-keyed operators, a pure function of row content:
    the same doc lands in the same split on every run, engine and
    partitioning, and membership is a pushdown-friendly predicate
    (`label == 'val'` folds to a residue-range check). Band granularity
    is 1/buckets. The polynomial's banding caveat applies (see
    `hash_sample`): on tiny contiguous-decimal-id corpora local split
    rates deviate; key on content for rate-critical splits."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / buckets:
        raise ValueError(f"fractions must sum to 1, got {total}")
    k = F.col(key) if isinstance(key, str) else key
    residue = poly_hash_expr(k.cast("string")) % F.lit(buckets)
    expr = None
    cum = 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        cum += fractions[name]
        hi = buckets if i == len(names) - 1 else int(round(cum * buckets))
        cond = residue < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def weighted_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    k: int,
    max_weight: int = 64,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sample of k rows: integer-weight bottom-k.
    Each row draws `weight` salted hashes of its key and ranks by the
    MINIMUM — a row with weight w holds w lottery tickets, so inclusion
    odds scale ~linearly with w, yet everything stays INTEGER arithmetic:
    no pow/ln whose float rounding could flip a boundary row between
    engines (the reason the classic Efraimidis-Spirakis exponential rank
    can't keep an exact cross-engine oracle; this bottom-k-of-replicas
    scheme is the integer-stable member of the same family).

    Deterministic given (key, weight): rerunning, repartitioning or
    re-running on another engine selects the identical row set, and the
    selection composes with upstream hash operators (independent salts).
    Weights are clamped to [1, max_weight] (clamping documented rather
    than a data-dependent runtime error; raise `max_weight` for wider
    dynamic range — cost is one O(len(key)) hash per unit of weight).
    Plan: per-row rank expression, then global top-k = TakeOrdered
    (per-partition k + k-row driver merge — no global sort, no shuffle
    of the corpus). Pass `rank_col` to keep the rank for inspection.

    NULL-key policy: rows with a NULL key are excluded before ranking
    (matching hash_sample / mix_sources / take_token_budget). Without the
    filter a NULL key would yield a NULL rank, and ascending-nulls-first
    ordering would hand every NULL-keyed row a guaranteed sample slot
    regardless of weight."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    kc = F.col(key) if isinstance(key, str) else key
    wc = F.col(weight) if isinstance(weight, str) else weight
    w_eff = F.greatest(F.least(wc.cast("int"), F.lit(max_weight)), F.lit(1))
    rank = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w_eff),
            lambda i: (
                poly_hash_expr(
                    F.concat(kc.cast("string"), F.lit(":"), i.cast("string"))
                )
                * F.lit(2654435761)
            )
            % F.lit(POLY_MOD),
        )
    )
    name = rank_col or "__rank"
    out = (
        df.filter(kc.isNotNull())
        .withColumn(name, rank)
        .orderBy(name, kc)
        .limit(k)
    )
    return out if rank_col else out.drop(name)


def epoch_shuffle_key(
    key: Column | str,
    epoch: int,
) -> Column:
    """Deterministic per-epoch shuffle key: the portable hash of
    ``epoch || ':' || key``. Sorting by (this, key) gives each training
    epoch its own reproducible global permutation of the corpus — the
    "reshuffle every epoch, but identically on every rerun" contract a
    training-data server needs. Changing `epoch` decorrelates the order;
    keeping it reproduces the order exactly (any engine, any partitioning).

    Use with a plain ``df.orderBy(epoch_shuffle_key(...), key)`` — Spark's
    orderBy is a range-partitioned DISTRIBUTED sort (sampled boundaries,
    no single-task funnel), which is exactly the right plan for laying a
    corpus out in serving order, and writers preserve it per output shard."""
    k = F.col(key) if isinstance(key, str) else key
    return poly_hash_expr(
        F.concat(F.lit(str(int(epoch))), F.lit(":"), k.cast("string"))
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    order_by: list[Column | str],
) -> DataFrame:
    """Keep at most `cap` rows per group, chosen by `order_by` (make it a
    TOTAL order — include a unique id as the last key — or the kept set is
    partition-dependent): the per-source / per-language / per-domain quota
    every corpus-balancing step needs.

    One window shuffle on the group key; groups process in parallel, and
    Spark's WindowGroupLimit pushes the rank<=cap cutoff below the sort,
    so a mega-group never materializes fully ranked."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: list[Column | str],
    shard_col: str | None = None,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Next-fit sequence packing: lay documents end-to-end in `order_by`
    order and chunk the token stream into bins of `budget` tokens — each
    doc gets the bin where its FIRST token lands (`bin_col`) and its token
    offset within that bin (`offset_col`). The assignment is a running
    exclusive prefix sum over one window: bin = floor(excl_cumsum/budget).
    A doc longer than the remaining bin space straddles into the next
    bin(s); the writer downstream decides split vs pad, this operator
    provides the deterministic layout.

    Packing a totally ordered stream is inherently sequential, so the
    GLOBAL form (shard_col=None) is a single-partition window — fine for
    one shard, wrong for a corpus. Pass `shard_col` to pack each shard
    independently (the window partitions by shard): that is exactly how
    production packing runs — documents are first sharded (e.g. by
    `hash_sample`'s hash mod n_shards), then each output shard packs its
    own stream in parallel. Bin ids are then per-shard."""
    parts = [F.col(shard_col)] if shard_col else []
    w = Window.partitionBy(*parts).orderBy(*order_by)
    toks = F.col(token_col).cast("long")
    excl = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return df.withColumn(bin_col, F.floor(excl / F.lit(budget))).withColumn(
        offset_col, excl % F.lit(budget)
    )


def pack_sequences_global(
    df: DataFrame,
    token_col: str,
    budget: int,
    key: Column | str,
    buckets: int = 1024,
    bin_col: str = "bin_id",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """GLOBAL next-fit sequence packing in one call — the corpus-wide
    form `pack_sequences` documents as out of scope for a single window
    (a global order is inherently sequential; a single-partition window
    over 100 TB is not a plan). The corpus order is the canonical
    content-derived order of `take_token_budget` —
    (poly_hash(key) % buckets, key) — and the layout is EXACTLY what a
    sequential reader walking that order would assign: global bin ids,
    continuous across bucket boundaries (a doc straddles a bucket edge
    the same way it straddles any bin edge).

    The take_token_budget trick, generalized from one boundary to every
    boundary: pass 1 aggregates per-bucket token totals (`buckets` rows
    to the driver — the documented model-size collect), the driver's
    cumulative walk yields each bucket's global start offset; pass 2 is
    ONE per-bucket window (parallel across buckets) whose local
    exclusive prefix sum plus the bucket's literal start offset IS the
    global prefix sum — bin = floor(global_excl / budget), offset =
    global_excl % budget. No global sort ever happens; the oracle
    replays the single sequential window and proves the two-pass layout
    equals it. Composes with `take_token_budget(same key, same
    buckets)`: the budget prefix packs to a prefix of the full corpus
    layout.

    NULL-key rows are excluded (the hash-keyed-operator convention —
    no stable content identity, no reproducible position)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    k = F.col(key) if isinstance(key, str) else key
    toks = F.col(token_col).cast("long")
    with_b = df.filter(k.isNotNull()).withColumn(
        "__bkt", poly_hash_expr(k.cast("string")) % F.lit(buckets)
    )
    totals = (
        with_b.groupBy("__bkt")
        .agg(F.coalesce(F.sum(toks), F.lit(0)).alias("t"))
        .collect()
    )
    if not totals:
        return with_b.drop("__bkt").withColumn(
            bin_col, F.lit(0).cast("long")
        ).withColumn(offset_col, F.lit(0).cast("long"))
    by_bucket = {r["__bkt"]: r["t"] for r in totals}
    starts: dict[int, int] = {}
    running = 0
    for b in sorted(by_bucket):
        starts[b] = running
        running += by_bucket[b]
    start_expr = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for b in starts
                for x in (b, starts[b])
            ]
        ),
        F.col("__bkt"),
    ).cast("long")
    w = Window.partitionBy("__bkt").orderBy(k)
    excl_local = F.coalesce(
        F.sum(toks).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    gexcl = start_expr + excl_local
    return (
        with_b.withColumn(bin_col, F.floor(gexcl / F.lit(budget)))
        .withColumn(offset_col, gexcl % F.lit(budget))
        .drop("__bkt")
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    count_col: str | None = None,
) -> DataFrame:
    """k-anonymity suppression (Sweeney 2002): keep only rows whose
    quasi-identifier combination occurs in at least `k` rows — the
    release-gate a privacy review applies before corpus publication
    (a (lang, region, age-bucket) combo seen twice re-identifies; seen
    10,000 times it doesn't). NULL is a legitimate quasi-value here:
    NULL combos group together (a suppressed-attribute row is itself a
    disclosure shape), matching SQL GROUP BY semantics on both engines.

    Plan: ONE window count over the quasi key — no join back, no second
    scan of the corpus; with `count_col` the group size is kept as a
    column (the auditors' report wants it). Mega-groups are fine: count
    over an unordered window needs no sort, only the hash exchange."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*quasi_cols)
    name = count_col or "__qn"
    out = df.withColumn(name, F.count(F.lit(1)).over(w)).filter(
        F.col(name) >= k
    )
    return out if count_col else out.drop(name)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key: Column | str,
    fraction: float,
    min_per_stratum: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact proportional stratified sample: per stratum, KEEP exactly
    ``max(ceil(fraction * n_h), min(min_per_stratum, n_h))`` rows — the
    corpus-balancing sampler that guarantees per-source/-language/
    -domain quotas instead of `df.sampleBy`'s Bernoulli draws (whose
    per-stratum counts fluctuate and whose seeded RNG changes row sets
    under repartitioning; at 100 TB the rerun-stability matters more
    than the randomness).

    Rows are chosen by scrambled portable hash of `key` (the Knuth
    multiplicative step — order statistics want the scramble, see
    kmv_distinct's banding note) with `key` itself as tie-break, so
    the selection is a pure function of content: deterministic across
    runs, partitionings and engines, and nested (a stratum's 10%
    sample contains its 5% sample — same order, shorter prefix).

    Plan shape: ONE exchange on the strata keys serves the rank window
    AND the stratum-count window (same partitioning); the cutoff is a
    per-row expression — no second pass, no driver-side stratum table,
    any number of strata. NULL-keyed rows are excluded before ranking
    (the weighted_sample convention); NULL strata form their own group.
    Pass `rank_col` to keep the within-stratum rank for inspection."""
    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if min_per_stratum < 0:
        raise ValueError(
            f"min_per_stratum must be >= 0, got {min_per_stratum}"
        )
    kc = F.col(key) if isinstance(key, str) else key
    ks = kc.cast("string")
    scrambled = (
        poly_hash_expr(ks) * F.lit(2654435761)
    ) % F.lit(POLY_MOD)
    w_rank = Window.partitionBy(*strata_cols).orderBy(
        scrambled.asc(), ks.asc()
    )
    w_n = Window.partitionBy(*strata_cols)
    ranked = df.filter(kc.isNotNull()).withColumn(
        "__rk", F.row_number().over(w_rank)
    ).withColumn("__n", F.count(F.lit(1)).over(w_n))
    take = F.greatest(
        F.ceil(F.col("__n") * F.lit(float(fraction))),
        F.least(F.lit(int(min_per_stratum)).cast("long"), F.col("__n")),
    )
    out = ranked.filter(F.col("__rk") <= take)
    if rank_col is not None:
        return out.withColumnRenamed("__rk", rank_col).drop("__n")
    return out.drop("__rk", "__n")


#: P(Poisson(1) <= k) scaled to the 32-bit hash range: floor(cdf * 2^32)
#: for k = 0..7 — integer thresholds so the weight ladder is bit-exact
#: across engines (tail beyond 8 has mass < 1.2e-8 and is truncated).
_POISSON1_CDF_U32 = [
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777, 4294923276,
]


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_reps: int = 20,
    alpha: float = 0.05,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean
    of a column — THE bootstrap that works on data too large to resample
    by index (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams"; equivalent in the limit to the classic multinomial
    bootstrap): in replicate r every row independently carries weight
    w ~ Poisson(1), and the spread of the R weighted means estimates the
    sampling distribution of the mean.

    Weights are a PURE FUNCTION of (key, replicate): u32 =
    mix32(poly_hash(key ∥ '#' ∥ r)) and w = #{k : u32 ≥ CDF_k} over
    integer thresholds — bit-exact across engines, runs, and
    partitionings (df.sample's per-partition RNG is none of these), so
    the whole simulation replays in an external SQL oracle. Output one
    row: (n BIGINT data rows, n_reps INT, mean point estimate, boot_se
    stddev of replicate means, ci_lo/ci_hi DOUBLE — type-1 quantiles of
    the replicate means at alpha/2 and 1−alpha/2, round 6). Replicates
    whose total weight is 0 (only possible on tiny data) are excluded.

    Plan: the corpus explodes × n_reps but collapses to n_reps rows in
    the SAME stage (partial-agged groupBy(rep) of (Σw·x, Σw)) — the
    shuffle carries n_reps rows, and everything after runs on the
    replicate-means table. The key-prefix hash is folded ONCE per data
    row and extended per replicate by str(r)'s digit chars (the
    polynomial hash factorizes over concatenation), so the interpreted
    per-character fold is not paid n_reps times; the row is pruned to
    (key, value) before the explode."""
    if n_reps < 2:
        raise ValueError(f"n_reps must be >= 2, got {n_reps}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    import math

    from pandasvcf_spark.functions.text import (
        POLY_MOD,
        mix32_expr,
        poly_hash_expr,
    )

    v = F.col(value_col).cast("double")
    k = F.col(key_col).cast("string")
    nn = df.filter(v.isNotNull()).select(v.alias("__x"), k.alias("__k"))
    # The polynomial hash factorizes over concatenation:
    # hash(key∥'#'∥r) = fold(digits of r, starting from hash(key∥'#')).
    # So the per-CHARACTER fold (an interpreted higher-order function)
    # runs ONCE per row on the key prefix, and each replicate row extends
    # it by str(r)'s 1-2 digit chars as flat codegen arithmetic — the
    # earlier shape re-folded the whole string per (row, replicate):
    # n_reps× the interpreted work (round 15, guide §1.2/§4; full query
    # 4.16 s → 1.20 s at sf0.1 min-of-3, bit-identical rows). Same
    # recurrence, same order, same mod ⇒ bit-identical weights; the
    # explode(array(..)) Generate barrier pins one evaluation of the fold
    # (CollapseProject would otherwise inline it into every replicate).
    h0 = poly_hash_expr(F.concat(F.col("__k"), F.lit("#")))
    keyed = nn.select("__x", F.explode(F.array(h0)).alias("__h0"))
    rep = F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("__r")
    ex = keyed.select("__x", "__h0", rep)
    pm = F.lit(POLY_MOD).cast("long")
    L31 = F.lit(31).cast("long")
    r = F.col("__r").cast("long")
    # h = fold of str(r)'s decimal digit chars onto the prefix hash; one
    # branch per digit COUNT (known bound: len(str(n_reps-1)) branches).
    def _ext(nd: int) -> Column:
        acc = F.col("__h0")
        for i in range(nd - 1, -1, -1):
            digit = F.floor(r / (10**i)) % 10
            acc = (acc * L31 + (F.lit(48).cast("long") + digit)) % pm
        return acc

    max_digits = len(str(n_reps - 1))
    if max_digits == 1:
        h = _ext(1)
    else:
        h = F.when(r < 10, _ext(1))
        for nd in range(2, max_digits):
            h = h.when(r < 10**nd, _ext(nd))
        h = h.otherwise(_ext(max_digits))
    u32 = mix32_expr(h)
    w = sum((u32 >= F.lit(t)).cast("int") for t in _POISSON1_CDF_U32)
    means = (
        ex.select("__r", "__x", w.alias("__w"))
        .groupBy("__r")
        .agg(
            F.sum(F.col("__w") * F.col("__x")).alias("__wx"),
            F.sum("__w").alias("__sw"),
        )
        .filter(F.col("__sw") > 0)
        .select((F.col("__wx") / F.col("__sw")).alias("__m"))
    )
    # Materialize the n_reps-row replicate-means table ONCE: it feeds the
    # rank window, the replicate-count broadcast AND the band aggregate,
    # and each broadcast-subquery job otherwise re-executes the whole
    # weighted-sums pass over the corpus (the minhash verify-diamond
    # lesson — exchange reuse does not span broadcast jobs). n_reps rows,
    # so the checkpoint is free at any scale.
    means = means.localCheckpoint()
    wq = Window.orderBy("__m")
    ranked = means.withColumn("__rn", F.row_number().over(wq)).crossJoin(
        F.broadcast(means.agg(F.count(F.lit(1)).alias("__R")))
    )
    lo_rank = F.greatest(
        F.lit(1).cast("bigint"), F.ceil(F.col("__R") * (alpha / 2.0))
    )
    hi_rank = F.greatest(
        F.lit(1).cast("bigint"), F.ceil(F.col("__R") * (1.0 - alpha / 2.0))
    )
    band = ranked.agg(
        F.max(F.when(F.col("__rn") == lo_rank, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__rn") == hi_rank, F.col("__m"))).alias("__hi"),
        F.stddev_samp("__m").alias("__se"),
        F.count(F.lit(1)).alias("__R"),
    )
    stats = nn.agg(
        F.count(F.lit(1)).alias("n"), F.avg("__x").alias("__mean")
    )
    return stats.crossJoin(F.broadcast(band)).select(
        "n",
        F.col("__R").cast("int").alias("n_reps"),
        (F.round(F.col("__mean"), 6) + 0.0).alias("mean"),
        (F.round(F.col("__se"), 6) + 0.0).alias("boot_se"),
        (F.round(F.col("__lo"), 6) + 0.0).alias("ci_lo"),
        (F.round(F.col("__hi"), 6) + 0.0).alias("ci_hi"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit per quasi-identifier group (Machanavajjhala et
    al. 2007) — the privacy check k-anonymity misses: a group can be
    large (k-anonymous) yet carry ONE sensitive value, so membership
    alone discloses it (the homogeneity attack). Per quasi group:
    group size, number of distinct sensitive values, the largest single
    value's share, the entropy of the sensitive distribution, and the
    pass/fail flags both definitions use:

        distinct_l_ok = n_sensitive >= l          (distinct
                                                   l-diversity)
        entropy_l_ok  = entropy >= ln(l)          (entropy
                                                   l-diversity —
                                                   strictly stronger)

    Rows with a NULL sensitive value are excluded from the diversity
    counts but still counted in group size (a suppressed sensitive
    attribute protects, it doesn't diversify). Groups whose every
    sensitive value is NULL report n_sensitive 0 and NULL
    entropy/top_share. Output: quasi_cols + (n BIGINT, n_sensitive
    BIGINT, top_share, entropy DOUBLE round 6, distinct_l_ok,
    entropy_l_ok BOOLEAN).

    Plan: one groupBy(quasi, sensitive) collapses the corpus to value
    cells; per-group rollup + a max/entropy fold run over the cells
    table (groups × values rows, not data rows)."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")

    s = F.col(sensitive_col)
    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols], s.alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__c"))
    g = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("n"),
        F.sum(F.when(F.col("__sv").isNotNull(), F.col("__c"))
              .otherwise(0)).alias("__ns_rows"),
        F.count(F.when(F.col("__sv").isNotNull(), F.lit(1)))
         .cast("bigint").alias("n_sensitive"),
        F.max(F.when(F.col("__sv").isNotNull(), F.col("__c")))
         .alias("__top"),
        F.sum(
            F.when(F.col("__sv").isNotNull(),
                   F.col("__c").cast("double")
                   * F.log(F.col("__c").cast("double")))
        ).alias("__clogc"),
    )
    ns = F.col("__ns_rows").cast("double")
    top_share = F.when(F.col("n_sensitive") > 0, F.col("__top") / ns)
    # entropy of p_i = c_i/ns:  ln(ns) − Σ c·ln(c)/ns
    entropy = F.when(
        F.col("n_sensitive") > 0, F.log(ns) - F.col("__clogc") / ns
    )
    return g.select(
        *quasi_cols,
        "n",
        "n_sensitive",
        (F.round(top_share, 6) + 0.0).alias("top_share"),
        (F.round(entropy, 6) + 0.0).alias("entropy"),
        (F.col("n_sensitive") >= l).alias("distinct_l_ok"),
        # threshold via the ENGINE's own ln, not a Python literal: a
        # group of l equally-frequent values has entropy exactly
        # this engine's ln(l), and a 1-ulp cross-library difference
        # would flip the boundary case
        F.when(F.col("n_sensitive") > 0,
               entropy >= F.log(F.lit(float(l)))).otherwise(F.lit(False))
         .alias("entropy_l_ok"),
    )


def curriculum_tiers(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_tiers: int = 4,
) -> DataFrame:
    """Curriculum ordering for training-data scheduling — cut the corpus
    into `n_tiers` difficulty tiers at EXACT type-1 quantile edges of
    the score (the ks_lift_table edge-comparison convention: a tier is
    a predicate against collected edge literals, never a global rank),
    and stamp every row a deterministic within-tier shuffle key (the
    mix32 avalanche of its id), so a downstream sort by (tier,
    order_key) replays the same easy→hard schedule on any cluster, any
    partitioning, any round (the epoch_shuffle_key discipline).

    tier = number of edges STRICTLY BELOW the score (0 = easiest /
    lowest-score tier); heavily tied scores can collapse adjacent
    tiers (duplicate edges) — populations stay deterministic either
    way. Edges come from the `exact_quantiles` bucket walk (its
    documented model-size collects).

    Output: (id, score DOUBLE, tier INT, order_key BIGINT).
    Plan: after the build-time edge walk, one pure projection — no
    shuffle, no window, no join."""
    if n_tiers < 2:
        raise ValueError("n_tiers must be >= 2")
    from pandasvcf_spark.functions.text import mix32_expr
    from pandasvcf_spark.operators.relational import exact_quantiles

    sc = F.col(score_col).cast("double")
    base = df.filter(
        F.col(id_col).isNotNull() & sc.isNotNull()
    ).select(F.col(id_col), sc.alias("__score"))
    probs = [k / n_tiers for k in range(1, n_tiers)]
    edges = {
        r["p"]: r["value"]
        for r in exact_quantiles(base, "__score", probs).collect()
    }
    tier = F.lit(0)
    for p in probs:
        tier = tier + (F.col("__score") > F.lit(float(edges[p]))).cast(
            "int"
        )
    h0 = (F.col(id_col).cast("long") % F.lit(4294967296)).cast("long")
    return base.select(
        F.col(id_col),
        F.col("__score").alias("score"),
        tier.cast("int").alias("tier"),
        mix32_expr(h0).alias("order_key"),
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
    weight_col: Column | str | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling weights — the multilingual /
    multi-source rebalancing recipe of mBERT/XLM-R/mT5 (Devlin et al.
    2019 exponential smoothing; Conneau et al. 2020 §3; Xue et al.
    2021 use α ≈ 0.3): sample group l with probability

        p_l = n_l^α / Σ_m n_m^α

    so α = 1 reproduces the natural distribution, α = 0 is uniform,
    and α in between up-samples the tail (low-resource languages /
    rare sources) without flattening the head. `weight_col` sizes
    groups by a mass column (token counts) instead of row counts.

    Output: one row per group — (group_col, n BIGINT rows, mass
    DOUBLE, p_natural, p_temp DOUBLE round 9, sample_factor DOUBLE
    round 6 = p_temp / p_natural, the per-group multiplier a sampler
    like `weighted_sample` or a loader's repeat factor consumes).

    Plan: ONE partial-aggregated groupBy (group-count-sized) + a
    1-row total fold broadcast back — nothing row-scale after the
    first agg; the group table is the model."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    g = F.col(group_col)
    mass = (
        F.lit(1.0)
        if weight_col is None
        else (
            F.col(weight_col) if isinstance(weight_col, str) else weight_col
        ).cast("double")
    )
    per = (
        df.filter(g.isNotNull())
        .groupBy(g.alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(mass).alias("mass"),
        )
    )
    pa = F.pow(F.col("mass"), F.lit(float(alpha)))
    tot = per.agg(
        F.sum("mass").alias("__tm"),
        F.sum(pa).alias("__ta"),
    )
    p_nat = F.col("mass") / F.col("__tm")
    p_tmp = pa / F.col("__ta")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n",
            F.round("mass", 4).alias("mass"),
            (F.round(p_nat, 9) + F.lit(0.0)).alias("p_natural"),
            (F.round(p_tmp, 9) + F.lit(0.0)).alias("p_temp"),
            (F.round(p_tmp / p_nat, 6) + F.lit(0.0)).alias(
                "sample_factor"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Differentially-private releases — the Laplace mechanism
# ---------------------------------------------------------------------------


def _laplace_noise_expr(key: Column, scale_b: float, seed: str) -> Column:
    """Seeded deterministic Laplace(b) draw per release cell, DOUBLE.

    u = (poly_hash(seed || ':' || key) + 0.5) / p maps the portable hash
    to (0, 1); the inverse CDF ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)``
    turns it into a Laplace variate. Every step is plain arithmetic + one
    ln, so the oracle replays the draw exactly (rounded to the catalog's
    6 dp on both sides).

    HONEST BOUNDARY: a hash-seeded draw gives the Laplace *calibration*
    (the sensitivity/epsilon machinery, testable and reproducible — the
    point of this module's determinism rule), NOT cryptographic
    unpredictability: anyone knowing the seed can subtract the noise. A
    production release must swap this one expression for a CSPRNG draw;
    everything else (clamping, sensitivity accounting, the plan) is the
    deployable part."""
    u = (
        poly_hash_expr(F.concat_ws(":", F.lit(seed), key)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(POLY_MOD))
    centered = u - F.lit(0.5)
    return (
        -F.lit(float(scale_b))
        * F.signum(centered)
        * F.log(F.lit(1.0) - 2.0 * F.abs(centered))
    )


def dp_count(
    df: DataFrame,
    keys: list[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private histogram (Dwork et al. 2006): per-group
    count + Laplace(1/epsilon) noise — counting queries have sensitivity
    1 (one individual moves one cell by one). Returns (*keys,
    n_dp DOUBLE round 6): the RELEASE only; the true count never leaves
    the plan. Groups absent from the data are absent from the release
    (the standard known-domain histogram caveat — enumerate the domain
    and left-join before release when absence itself is sensitive).

    Plan: ONE groupBy on the release key; the noise draw is one hash +
    ln per OUTPUT cell, free at any scale. See `_laplace_noise_expr` for
    the seeded-draw boundary."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    cell = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            *keys,
            F.round(
                F.col("__n").cast("double")
                + _laplace_noise_expr(cell, 1.0 / epsilon, seed),
                6,
            ).alias("n_dp"),
        )
    )


def dp_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lower: float,
    upper: float,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private per-group sum: every contribution is
    CLAMPED to [lower, upper] (the sensitivity bound — without the clamp
    one outlier individual moves the sum arbitrarily and no finite noise
    is private), then Laplace(max(|lower|, |upper|)/epsilon) noise is
    added per cell. Returns (*keys, sum_dp DOUBLE round 6).

    NULL values contribute nothing (they clamp inside coalesce to 0
    only if 0 is inside [lower, upper]; otherwise they are dropped —
    matching the 'absent individual' semantics, not the 'zero-valued
    individual' one)."""
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not lower < upper:
        raise ValueError(f"need lower < upper, got [{lower}, {upper}]")
    sens = max(abs(lower), abs(upper))
    clamped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(float(lower))),
        F.lit(float(upper)),
    )
    cell = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(F.sum(clamped).alias("__s"))
        .select(
            *keys,
            F.round(
                F.col("__s")
                + _laplace_noise_expr(cell, sens / epsilon, seed),
                6,
            ).alias("sum_dp"),
        )
    )


def dp_mean(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lower: float,
    upper: float,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private per-group mean as noisy-sum / noisy-count
    with the budget split evenly (epsilon/2 each — sequential
    composition): the textbook release. The noisy denominator is floored
    at 1 so an unlucky draw cannot flip its sign; the ratio is clamped
    back into [lower, upper] (both post-processing — free under DP).
    Returns (*keys, mean_dp DOUBLE round 6)."""
    half = epsilon / 2.0
    s = dp_sum(df, keys, value_col, lower, upper, half, seed=seed + ":s")
    c = dp_count(
        df.filter(F.col(value_col).isNotNull()), keys, half,
        seed=seed + ":c",
    )
    ratio = F.col("sum_dp") / F.greatest(F.col("n_dp"), F.lit(1.0))
    return s.join(c, keys).select(
        *keys,
        F.round(
            F.least(
                F.greatest(ratio, F.lit(float(lower))), F.lit(float(upper))
            ),
            6,
        ).alias("mean_dp"),
    )
