"""Generic relational operators (SURVEY §2.4/2.5/2.7, milestone M3).

The reference's relational surface is tiny (left equi-joins used to re-attach
derived data, one grouped count, no sorts/windows — SURVEY.md §2.4-2.7); a
user of a general engine needs the full set. These are thin, deliberately
boring wrappers over the DataFrame API: the value is the *declared plan shape*
(broadcast hints for dimension tables, rank-not-row_number for determinism,
tie-broken top-k) and the oracle-checked catalog entries built on them
(`pandasvcf_spark/queries/`), not cleverness.

Scale notes (100 TB posture):
  * `join_dim` broadcasts the small side explicitly — a dimension table never
    justifies shuffling the fact table.
  * semi/anti joins use the native left_semi/left_anti join types, which keep
    only the left schema and let AQE pick broadcast variants at runtime.
  * `topk` / `rank_per_group` require a total order (tie-break columns) so a
    LIMIT is deterministic across retries/partitionings — at scale a
    nondeterministic top-k silently diverges between runs.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.operators.stats._guards import (
    _assert_cell_bound,
    _assert_key_series_bound,
)
from pandasvcf_spark.operators.stats._ladder import bucketed_running_extreme


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ dimension with an explicit broadcast hint on the dim side.

    Reference J1/J2 are this shape (variant_annotations.py:683-685, 709-712):
    a big table joined to a small derived/dimension table. At scale the
    broadcast hint removes the fact-side shuffle entirely.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """Rows of `left` with a match in `right` (left schema only)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """Rows of `left` with NO match in `right` (left schema only)."""
    return left.join(right, on=on, how="left_anti")


def dedup_annotate_join(
    df: DataFrame,
    keys: Sequence[str],
    annotations: Sequence[Column],
) -> DataFrame:
    """Reference J1 (variant_annotations.py:667-685) as a generic operator:
    compute `annotations` once per distinct key combination, then broadcast
    the (small) distinct-annotated side back onto every row.

    In the VCF core we fold annotations into per-row expressions instead
    (operators/annotate.py) — this form exists for expensive annotation
    functions where compute-once-per-distinct-key genuinely pays.
    """
    distinct = df.select(*keys).distinct().select(*_cols(keys), *annotations)
    return df.join(F.broadcast(distinct), on=list(keys), how="left")


def topk(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
) -> DataFrame:
    """Deterministic global top-k. `order_by` must be a total order
    (include a unique tie-break column). Spark plans this as TakeOrdered —
    per-partition heaps + a k-row merge on the driver, no global sort."""
    return df.orderBy(*_cols(order_by)).limit(k)


def rank_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int | None = None,
    method: str = "rank",
    out: str = "rnk",
) -> DataFrame:
    """rank()/row_number()/dense_rank() within groups, optionally keeping
    ranks <= k (top-k per group). One shuffle on the group key."""
    fn = {"rank": F.rank, "row_number": F.row_number, "dense_rank": F.dense_rank}[
        method
    ]
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    out_df = df.withColumn(out, fn().over(w))
    if k is not None:
        out_df = out_df.filter(F.col(out) <= k)
    return out_df


def running_agg(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    agg: Column,
    out: str = "running",
) -> DataFrame:
    """Cumulative frame aggregate (rows unbounded preceding → current)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, agg.over(w))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: when one join key dominates the fact table,
    a plain shuffle join sends that key's entire volume to ONE reducer.
    Salting splits it: the fact side gets a deterministic salt derived from a
    high-cardinality column (`salt_src`), the dim side is replicated
    n_salts×, and the join runs on (key, salt) — the hot key now spreads
    over n_salts reducers. Result is row-identical to the unsalted join.

    (AQE's skew-join handles this at runtime for sort-merge joins; the
    explicit form remains necessary for skewed AGGREGATIONS and as the
    portable fallback — and documents the technique for 100 TB planning.)
    """
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    fact_s = fact.withColumn("__salt", salt)
    # generators can't nest inside expressions (no .cast around explode);
    # sequence of int literals already yields INT elements
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, on=[key, "__salt"]).drop("__salt")


def salted_count(
    df: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant grouped count: pre-aggregate on (key, salt) so a hot
    key's partial counts spread across reducers, then combine the (tiny)
    per-salt partials. Output: key, n BIGINT — identical to a plain
    groupBy(key).count()."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    return partial.groupBy(key).agg(F.sum("__pn").cast("long").alias("n"))


def pivot_counts(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
) -> DataFrame:
    """Long → wide count pivot (reference R2 generalized). Passing explicit
    `values` skips the distinct-discovery job and fixes output column order —
    at scale the discovery pass is a full extra scan."""
    out = df.groupBy(*group_by).pivot(pivot_col, list(values)).count()
    # Missing (group, value) combinations are structural zeros, not unknowns.
    return out.na.fill(0, [str(v) for v in values])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, attach the single right row with the
    greatest `on` <= left.`on` (direction='backward'; 'forward' takes the
    least `on` >= left.`on`), matched within the same `by` keys. The
    operator the reference family lacks and time-series/feature pipelines
    need (point-in-time correctness: "the latest signal known at event
    time" — never a future leak).

    Spark-first plan — UNION + ONE WINDOW, no join node at all: tag rows by
    side, pack each side's payload into ONE struct (so all matched columns
    come from the SAME right row — per-column last() could mix rows), union,
    then per-key window ordered by (on, side) with right-before-left at
    equal timestamps (an exactly-simultaneous right row IS matchable) and
    last(payload, ignorenulls) over rows unbounded-preceding..current;
    finally keep the left rows. Cost is one shuffle on the `by` keys — the
    same exchange a plain equi-join pays, but with no range explosion (a
    naive range join is O(|L|·|R|) per key), and a hot key streams through
    the running-last frame instead of buffering.

    tolerance: optional callable (left_on Column, matched_on Column) ->
    BOOLEAN Column; matches failing it become NULL (left rows are always
    kept — left-outer semantics throughout).

    Right columns (all but `on`/`by`) return as `matched_<name>`; the
    matched timestamp itself as `matched_<on>`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    rcols = [c for c in right.columns if c != on and c not in by]
    rpay = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in rcols])
    lpay = F.struct(*[F.col(c).alias(c) for c in left.columns])
    # dtype probes are plan-only (no jobs)
    rpay_t = right.select(rpay.alias("x")).schema[0].dataType
    lpay_t = left.select(lpay.alias("x")).schema[0].dataType
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        rpay.alias("__rpay"),
        F.lit(None).cast(lpay_t).alias("__lpay"),
    )
    l_ = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rpay_t).alias("__rpay"),
        lpay.alias("__lpay"),
    )
    order = (
        [F.col("__t").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l_)
        .withColumn("__m", F.last(F.col("__rpay"), ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        ok = tolerance(F.col("__t"), F.col("__m").getField(on))
        out = out.withColumn("__m", F.when(ok, F.col("__m")))
    return out.select(
        *[F.col("__lpay").getField(c).alias(c) for c in left.columns],
        F.col("__m").getField(on).alias(f"matched_{on}"),
        *[F.col("__m").getField(c).alias(f"matched_{c}") for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_width: int | None = None,
) -> DataFrame:
    """Interval containment join: every (interval, point) pair with
    start <= point <= end (and equal `by` keys), WITHOUT a theta join — a
    naive range predicate plans as BroadcastNestedLoop/Cartesian and dies
    at scale.

    Banded plan: pick a bin width, explode each interval onto the bins it
    covers (sequence(floor(start/w), floor(end/w)) — explode factor is
    len/width + 1), bucket each point into its single bin, EQUI-join on
    (by..., bin), then filter exact containment. Each true pair meets in
    exactly one bin (the point's), so no dedup pass is needed. The join is
    a plain hash/sort-merge equi-join Catalyst can reorder, broadcast, or
    AQE-skew-split like any other.

    point_col/start_col/end_col must be integral (cast timestamps to epoch
    seconds first). bin_width defaults to a heuristic the caller should
    override with ~the median interval length: too wide puts many
    intervals in one bin (bigger post-filter), too narrow explodes long
    intervals into many rows. A pathologically long interval's explode
    cost is len/width rows — bound interval lengths upstream or raise
    bin_width for such data.

    Output: all interval columns + all point columns (name collisions on
    the `by` keys collapse to one).
    """
    if bin_width is None:
        bin_width = 3600
    by = list(by)
    b = int(bin_width)
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(start_col) / b).cast("long"),
                (F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bin", (F.col(point_col) / b).cast("long"))
    joined = iv.join(pt, on=by + ["__bin"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def merge_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Latest-wins upsert (the MERGE a corpus-refresh job runs without a
    table format): union base and updates, keep the highest-`version_col`
    row per key. New keys insert, existing keys take the newest version;
    ties prefer the UPDATES side (the batch being applied), so replaying
    an already-applied batch is idempotent rather than partition-lottery.

    Determinism contract: the survivor is fully determined only when
    (key, version) is unique WITHIN each side — the usual CDC shape. If a
    side can carry duplicate (key, version) rows, pass `tiebreak_cols`
    (columns forming a total order within the tie, e.g. an offset or a
    content hash) or the within-side tie falls back to ascending order of
    all non-key columns — deterministic, but an arbitrary choice the
    caller should make explicit.

    One window shuffle on the key — the declarative twin of Delta/Iceberg
    MERGE for the common CDC shape. Schemas must match (unionByName); the
    priority column is internal and dropped."""
    b = base.withColumn("__pri", F.lit(0))
    u = updates.withColumn("__pri", F.lit(1))
    if tiebreak_cols is None:
        tiebreak_cols = [
            c for c in base.columns
            if c not in set(key_cols) | {version_col}
        ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc_nulls_last(),
        F.col("__pri").desc(),
        *[F.col(c).asc_nulls_last() for c in tiebreak_cols],
    )
    return (
        b.unionByName(u)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )


def event_funnel(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: per user, the furthest PREFIX of `steps`
    completed in order — the "viewed → signed up → purchased" progression
    report. Output: (user, steps_completed INT); aggregate downstream for
    the funnel histogram. Each event advances the funnel only when its
    type matches the NEXT outstanding step; order is event time (ties
    break by step position, deterministically). Users with no qualifying
    events do not appear.

    Plan: one groupBy(user) collecting the user's (ts, step-index) events
    sorted, then a single HOF fold over the array — sequential-pattern
    matching as a pure column expression, no window re-scan per step, no
    self-join per transition (the naive k-step funnel is k-1 self-joins;
    this is ONE shuffle regardless of k). Per-user state is the user's
    OWN event list — bounded by per-user activity, the same contract as
    sessionization; events not in `steps` are filtered out before the
    collect."""
    if not steps:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    # The sort struct carries the event's FIRST position in `steps` so
    # equal-timestamp ties order by step position (the documented rule):
    # a simultaneous signup+purchase processes signup first and advances
    # BOTH steps, instead of whichever type string sorts lower.
    per_user = (
        events.filter(F.col(type_col).isin(list(set(steps))))
        .select(
            F.col(user_col).alias("user"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.array_position(steps_arr, F.col(type_col)).alias("i"),
                F.col(type_col).alias("t"),
            ).alias("e"),
        )
        .groupBy("user")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    # General fold: an event advances the funnel when it equals the NEXT
    # outstanding step BY POSITION — comparing against element_at of the
    # literal step array (not a type->index map) so REPEATED steps
    # ('purchase', 'purchase') work; the accumulator and elements have
    # different types, which Spark's aggregate permits.
    completed = F.aggregate(
        F.transform("evs", lambda e: e["t"]),
        F.lit(0),
        lambda acc, t: F.when(
            (acc < len(steps)) & (t == F.element_at(steps_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return per_user.select(
        "user", completed.cast("int").alias("steps_completed")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    bin_width: int | None = None,
    min_overlap: int = 1,
    min_frac_left: float | None = None,
    min_frac_right: float | None = None,
    max_bins_per_row: int = 8192,
) -> DataFrame:
    """Interval × interval overlap join — the bedtools-intersect family
    (feature annotation: which genes does each variant region touch,
    which ad sessions overlap which outages). Emits every (left, right)
    pair of intervals with CLOSED-interval overlap of at least
    `min_overlap` units (and equal `by` keys), plus an `overlap_len`
    column (overlap in integer units, inclusive of both endpoints —
    genomics convention for base-pair counts).

    Banded like `range_join` — never a theta join: both sides explode
    onto the bins they cover and EQUI-join on (by..., bin). Unlike the
    point form, a true pair can meet in EVERY shared bin, so the join
    keeps only the pair's FIRST shared bin (bin == max of the two start
    bins — computable per row, no dedup shuffle: the distinct() a naive
    banded overlap needs is usually its most expensive stage). Explode
    factor is len/bin_width per interval: pass bin_width ~ the median
    interval length, or leave it None to DERIVE exactly that (an
    approx-median over both sides' lengths — one extra cheap aggregation
    job; pass the width explicitly in iterating pipelines to skip it).
    Either way, a row that would explode onto more than
    `max_bins_per_row` bins (a pathological interval ≫ the bin width —
    e.g. millisecond timestamps against a seconds-scale width) raises a
    clear runtime error naming the fix instead of silently detonating
    the shuffle.

    min_frac_left / min_frac_right: additionally require the overlap to
    cover at least this fraction of the left / right interval's length
    (bedtools -f / -r reciprocal-overlap semantics) — "a variant region
    counts as hitting a gene only if 50% of it lies inside". Fractions
    compose with min_overlap; all are plain post-join predicates.

    Output: all `left` columns + all `right` columns (shared `by` keys
    collapse to one) + overlap_len LONG."""
    if bin_width is None:
        lens = left.select(
            (F.col(left_end) - F.col(left_start) + 1).cast("double").alias("l")
        ).union(
            right.select(
                (F.col(right_end) - F.col(right_start) + 1)
                .cast("double")
                .alias("l")
            )
        )
        med = lens.approxQuantile("l", [0.5], 0.1)
        bin_width = max(1, int(med[0])) if med and med[0] else 1
    by = list(by)
    b = int(bin_width)
    if b < 1:
        raise ValueError(f"bin_width must be >= 1, got {b}")

    def binned(df, start, end):
        start_bin = (F.col(start) / b).cast("long")
        end_bin = (F.col(end) / b).cast("long")
        # assert_true raises (with the remedy in the message) on a row
        # whose bin span exceeds the cap; nested inside the sequence
        # bound so column pruning can't drop the guard
        # NULL-bounded rows must keep dropping (sequence(NULL, ...) is
        # NULL and explode skips it) — assert_true raises on NULL
        # conditions, so the guard passes them through explicitly
        guarded_end = F.when(
            F.assert_true(
                F.col(start).isNull()
                | F.col(end).isNull()
                | (end_bin - start_bin < F.lit(int(max_bins_per_row))),
                F.concat(
                    F.lit(
                        "interval_overlap_join: interval spans more than "
                        f"{int(max_bins_per_row)} bins of width {b} "
                        "(interval ["
                    ),
                    F.col(start).cast("string"),
                    F.lit(", "),
                    F.col(end).cast("string"),
                    F.lit(
                        "]); pass a larger bin_width (~median interval "
                        "length), raise max_bins_per_row, or bound "
                        "interval lengths upstream"
                    ),
                ),
            ).isNull(),
            end_bin,
        )
        return df.withColumn(
            "__bin", F.explode(F.sequence(start_bin, guarded_end))
        )

    l = binned(left, left_start, left_end)
    r = binned(right, right_start, right_end)
    joined = l.join(r, on=by + ["__bin"])
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = F.least(le, re_) - F.greatest(ls, rs) + 1
    first_shared_bin = (F.greatest(ls, rs) / b).cast("long")
    cond = (overlap >= F.lit(int(min_overlap))) & (
        F.col("__bin") == first_shared_bin
    )
    if min_frac_left is not None:
        cond = cond & (
            overlap >= F.lit(float(min_frac_left)) * (le - ls + 1)
        )
    if min_frac_right is not None:
        cond = cond & (
            overlap >= F.lit(float(min_frac_right)) * (re_ - rs + 1)
        )
    return (
        joined.filter(cond)
        .withColumn("overlap_len", overlap.cast("long"))
        .drop("__bin")
    )


def retention_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix — the product-analytics classic: users
    grouped by their FIRST-activity period (the cohort), each later
    period reporting how many of them came back. Output:
    (cohort_period BIGINT, age BIGINT, n_active BIGINT, retention DOUBLE)
    with age in periods since the cohort and retention = n_active /
    cohort size (age 0 is the cohort itself, retention 1.0).

    Periods are integer epoch buckets (epoch // period_seconds) — no
    calendar truncation, so the bucketing is timezone-proof and
    reproducible on any engine. Plan: one user-partitioned window for
    the cohort anchor, distinct (user, period), one partial-aggregated
    count-distinct, and a broadcast join of the (tiny, one row per
    cohort) size relation — the events table is shuffled once, by
    user."""
    per = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(int(period_seconds))).cast(
        "long"
    )
    w = Window.partitionBy("__u")
    act = (
        events.select(F.col(user_col).alias("__u"), per.alias("__p"))
        .withColumn("__cohort", F.min("__p").over(w))
        .select("__u", "__cohort", (F.col("__p") - F.col("__cohort")).alias("age"))
        .distinct()
    )
    m = act.groupBy(F.col("__cohort").alias("cohort_period"), "age").agg(
        F.countDistinct("__u").alias("n_active")
    )
    sizes = m.filter(F.col("age") == 0).select(
        F.col("cohort_period").alias("__c"), F.col("n_active").alias("__size")
    )
    return (
        m.join(F.broadcast(sizes), m["cohort_period"] == F.col("__c"))
        .select(
            "cohort_period",
            "age",
            "n_active",
            F.round(F.col("n_active") / F.col("__size"), 4).alias("retention"),
        )
    )


def transition_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """First-order transition (Markov bigram) counts over per-user event
    sequences: (from_type, to_type, n) for every consecutive pair in
    event-time order — the path-analysis / next-action model behind
    "what do users do after signup". Ties at equal timestamps order by
    type (deterministic, same contract as `event_funnel`); each user's
    last event has no successor and contributes nothing.

    One window shuffle on the user key (lead over the per-user order),
    then a partial-aggregated pair count — the shuffle after partial agg
    is |type-vocabulary|² rows regardless of event count."""
    return (
        events.select(
            F.col(user_col).alias("__u"),
            F.col(type_col).alias("from_type"),
            F.col(ts_col).alias("__ts"),
        )
        .withColumn(
            "to_type",
            F.lead("from_type").over(
                Window.partitionBy("__u").orderBy("__ts", "from_type")
            ),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bloom_positions(i: int, key: Column, m: int) -> Column:
    """Bit position of hash family i for `key`: seeded scrambled portable
    hash mod m — deterministic, replayable in ANSI SQL."""
    from pandasvcf_spark.functions.text import POLY_MOD, poly_hash_expr

    h = poly_hash_expr(F.concat(F.lit(str(i)), F.lit(":"), key.cast("string")))
    return ((h * F.lit(2654435761)) % F.lit(POLY_MOD)) % F.lit(m)


def bloom_prune(
    big: DataFrame,
    big_key: Column | str,
    small: DataFrame,
    small_key: Column | str,
    m: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Runtime-filter join pruning: keep only `big` rows whose key MIGHT
    appear in `small`'s key set, tested against a Bloom filter built from
    the small side — the pre-shuffle prune Spark's own runtime filters
    apply, exposed as an operator so any join (or a sink, or a later
    stage) can reuse one cheap membership test instead of shuffling
    non-matching rows across the cluster. False positives pass (join
    correctness is unaffected — the real join still decides); false
    negatives cannot happen.

    Build: the small side's k seeded positions collapse to a DISTINCT set
    (one tiny aggregation) collected to the driver — ≤ m integers, a
    documented model-size collect, the same thing Spark broadcasts for
    its InSubquery/bloom runtime filters — and packed into an
    array<int> literal bitmask of ⌈m/32⌉ words. Probe: per row, k hash
    positions, each tested with pure integer arithmetic
    (word div 2^(p%32)) % 2 — no join, no Python, pushdown-compatible.
    With the deterministic portable hash family the surviving row set —
    including the false positives — is reproducible in ANSI SQL.

    Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; default 8192×3 is
    ~1.1% at n=1000. Raise m for bigger small sides (driver cost stays
    m bits)."""
    if m < 32 or k < 1:
        raise ValueError(f"need m >= 32 and k >= 1, got m={m}, k={k}")
    sk = (F.col(small_key) if isinstance(small_key, str) else small_key)
    bk = (F.col(big_key) if isinstance(big_key, str) else big_key)
    pos_rows = (
        small.filter(sk.isNotNull())
        .select(
            F.explode(
                F.array(*[_bloom_positions(i, sk, m) for i in range(k)])
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    n_words = (m + 31) // 32
    words = [0] * n_words
    for r in pos_rows:
        p = int(r["p"])
        words[p // 32] |= 1 << (p % 32)
    mask = F.array(*[F.lit(w).cast("long") for w in words])
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(32)])
    cond = None
    for i in range(k):
        p = _bloom_positions(i, bk, m)
        word = F.element_at(mask, (p / 32).cast("int") + 1)
        bit = ((word / F.element_at(pow2, (p % 32).cast("int") + 1))
               .cast("long") % 2) == 1
        cond = bit if cond is None else (cond & bit)
    return big.filter(bk.isNotNull() & cond)


def ewma_last(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    alpha: float,
    max_key_rows: int | None = 1_000_000,
) -> DataFrame:
    """Per-key exponentially-weighted moving average, final value — the
    smoothed per-user/per-device signal a monitoring or feature pipeline
    reads last ("current smoothed spend"): walk the key's rows in
    `order_cols` order and fold

        ewma_0 = x_0;   ewma_i = α·x_i + (1−α)·ewma_{i−1}

    (initialize-with-first-observation convention). `order_cols` must be
    a total order — include a unique id — or the fold order, and
    therefore the float result, is partition-lottery. Output: (key,
    n_events BIGINT, ewma DOUBLE round 4). NULL values are excluded
    before the fold (no observation, no update).

    Plan: one groupBy(key) collecting the key's ordered values, one HOF
    fold — sequential per-key state as a pure column expression, the
    sessionization/funnel contract (state bounded by per-key activity),
    never a window re-scan per row and never applyInPandas. The
    per-key array contract is ENFORCED: a cheap one-row-per-key probe
    raises when any key exceeds `max_key_rows` observations (see
    `stats._guards._assert_key_series_bound`)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    _assert_key_series_bound(
        df, key_col, value_col, "ewma_last", max_key_rows
    )
    ordered = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.struct(
                *[
                    (F.col(c) if isinstance(c, str) else c).alias(f"o{i}")
                    for i, c in enumerate(order_cols)
                ],
                F.col(value_col).cast("double").alias("x"),
            ).alias("e"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    xs = F.transform("evs", lambda e: e["x"])
    folded = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(float(alpha)) * x
        + F.lit(1.0 - float(alpha)) * acc,
    )
    return ordered.select(
        "key",
        F.size("evs").cast("long").alias("n_events"),
        F.round(folded, 4).alias("ewma"),
    )


def holt_linear_last(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    alpha: float = 0.4,
    beta: float = 0.3,
    max_key_rows: int | None = 1_000_000,
) -> DataFrame:
    """Per-key Holt linear-trend smoothing, final state (Holt 1957) —
    `ewma_last` upgraded with a trend component, the standard
    short-horizon forecaster for level+drift series (spend ramping,
    queue growth):

        l_1 = y_1,  b_1 = y_2 − y_1              (standard init)
        l_t = α y_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β (l_t − l_{t−1}) + (1−β) b_{t−1}
        forecast(+h) = l_T + h b_T                (h = 1 emitted)

    `order_cols` must be a total order (the ewma_last contract — fold
    order decides the floats). Output: (key, n_events BIGINT, level,
    trend, forecast DOUBLE round 4); NULL state when the key has fewer
    than 2 observations (no trend is estimable).

    Plan: one groupBy(key) collecting the key's ordered values + one
    HOF fold with a STRUCT accumulator (level, trend) — sequential
    per-key state as a pure column expression, state bounded by
    per-key activity, never a window re-scan and never
    applyInPandas. The per-key array contract is ENFORCED via
    `max_key_rows` (the ewma_last tripwire)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 < beta <= 1.0:
        raise ValueError(f"beta must be in (0, 1], got {beta}")
    _assert_key_series_bound(
        df, key_col, value_col, "holt_linear_last", max_key_rows
    )
    ordered = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.struct(
                *[
                    (F.col(c) if isinstance(c, str) else c).alias(f"o{i}")
                    for i, c in enumerate(order_cols)
                ],
                F.col(value_col).cast("double").alias("x"),
            ).alias("e"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    xs = F.transform("evs", lambda e: e["x"])
    a = F.lit(float(alpha))
    b = F.lit(float(beta))
    init = F.struct(
        F.element_at(xs, 2).alias("l"),
        (F.element_at(xs, 2) - F.element_at(xs, 1)).alias("b"),
    )
    # NOTE init uses l = y_2 (the first UPDATE has already consumed
    # y_2): fold starts at y_3. Equivalent to l_1=y_1, b_1=y_2-y_1
    # with the first smoothing step applied at t=2 under the common
    # convention that (l_2, b_2) = (y_2, y_2-y_1) exactly — both
    # engines replay this identical form.
    folded = F.aggregate(
        F.slice(xs, 3, F.greatest(F.size(xs) - 2, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])).alias(
                "l"
            ),
            (
                b
                * (
                    a * x
                    + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
                    - acc["l"]
                )
                + (F.lit(1.0) - b) * acc["b"]
            ).alias("b"),
        ),
    )
    ok = F.size("evs") >= 2
    return ordered.select(
        "key",
        F.size("evs").cast("long").alias("n_events"),
        (F.round(F.when(ok, folded["l"]), 4) + F.lit(0.0)).alias(
            "level"
        ),
        (F.round(F.when(ok, folded["b"]), 4) + F.lit(0.0)).alias(
            "trend"
        ),
        (
            F.round(F.when(ok, folded["l"] + folded["b"]), 4)
            + F.lit(0.0)
        ).alias("forecast"),
    )


def croston_forecast(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    alpha: float = 0.2,
    max_key_rows: int | None = 1_000_000,
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972) — the
    standard forecaster when most periods are zero (spare parts, rare
    SKU orders, sparse event streams), where plain EWMA chases zeros:
    smooth the NONZERO demand sizes and the inter-demand intervals
    separately and forecast their ratio,

        z_hat = ewma(nonzero demands, α)     (init = first demand)
        q_hat = ewma(inter-demand intervals, α)
                (init = first demand's position — the cold-start
                 convention; intervals measured in periods)
        forecast = z_hat / q_hat              (demand per period)

    Output: (key, n_periods, n_demands BIGINT, z_hat, q_hat, forecast
    DOUBLE round 4); NULL estimates for keys with no nonzero demand.

    Plan: one per-key rank window (positions), the nonzero filter, one
    groupBy(key) collecting ordered (position, demand) pairs, two HOF
    ewma folds — per-key state bounded by that key's DEMAND count, not
    its period count. The per-key position window AND demand array are
    both bounded by the `max_key_rows` tripwire (the ewma_last
    contract; probe counts PERIODS, the larger of the two)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    _assert_key_series_bound(
        df, key_col, value_col, "croston_forecast", max_key_rows
    )
    oc = [
        (F.col(c) if isinstance(c, str) else c).asc()
        for c in order_cols
    ]
    w = Window.partitionBy(key_col).orderBy(*oc)
    pos = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__pos", F.row_number().over(w))
        .withColumn("__x", F.col(value_col).cast("double"))
    )
    per_key = pos.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__x") != 0.0,
                    F.struct(
                        F.col("__pos").alias("p"),
                        F.col("__x").alias("x"),
                    ),
                )
            )
        ).alias("dem"),
    )
    zs = F.transform("dem", lambda e: e["x"])
    ps = F.transform("dem", lambda e: e["p"].cast("double"))
    # intervals: first = position of the first demand, then diffs
    qs = F.zip_with(
        ps,
        F.concat(F.array(F.lit(0.0)), F.slice(
            ps, 1, F.greatest(F.size(ps) - 1, F.lit(0))
        )),
        lambda cur, prev: cur - prev,
    )
    a = F.lit(float(alpha))

    def ewma_fold(arr):
        return F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1),
            lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
        )

    z_hat = ewma_fold(zs)
    q_hat = ewma_fold(qs)
    ok = F.size("dem") > 0
    return per_key.select(
        "key",
        "n_periods",
        F.size("dem").cast("long").alias("n_demands"),
        (F.round(F.when(ok, z_hat), 4) + F.lit(0.0)).alias("z_hat"),
        (F.round(F.when(ok, q_hat), 4) + F.lit(0.0)).alias("q_hat"),
        (
            F.round(F.when(ok, z_hat / q_hat), 4) + F.lit(0.0)
        ).alias("forecast"),
    )


def rate_anomaly(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int = 3600,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Volume-anomaly screen over an event stream: bucket events into
    epoch-aligned windows, z-score each bucket's count against the
    stream's own bucket-count distribution (population stddev), flag
    |z| ≥ `z_threshold` — the pager rule "this hour is 4σ off". Output:
    (bucket BIGINT epoch-bucket index, n BIGINT, z DOUBLE round 4,
    is_anomaly BOOLEAN); z NULL (and is_anomaly NULL) when the stream
    has a single bucket or zero variance — a constant history supports
    no anomaly claim.

    Plan: one partial-aggregated groupBy to bucket counts (the corpus
    never leaves the scan stage un-aggregated), a 1-row broadcast for
    mean/stddev, pure projections after. Integer epoch buckets, the
    events-family convention — timezone-proof on both engines."""
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    sec = (F.unix_micros(F.col(ts_col)) / 1_000_000).cast("long")
    counts = df.groupBy(
        (sec / bucket_seconds).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.avg("n").alias("__mu"), F.stddev_pop("n").alias("__sd")
    )
    z = F.when(
        F.col("__sd") > 0, (F.col("n") - F.col("__mu")) / F.col("__sd")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            "n",
            F.round(z, 4).alias("z"),
            (F.abs(z) >= F.lit(float(z_threshold))).alias("is_anomaly"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_cols: Sequence[Column | str] = (),
    out: str = "qnorm",
) -> DataFrame:
    """Quantile normalization across groups — the microarray/omics
    classic, equally at home normalizing per-shard feature distributions
    before training: rank each group's values, replace every value by
    the MEAN of the values holding that rank across all groups. After
    it, every group has an identical value distribution (exactly
    identical when group sizes match; with ragged sizes a rank's mean is
    taken over the groups that reach it — the well-defined restriction
    of the classic algorithm, stated rather than silently interpolated).

    NULL values are left out of ranking and come back with NULL `out`.
    Ranking needs a total order: ties on `value_col` break by
    `tiebreak_cols` — include a unique id, or equal values land on
    partition-lottery ranks (their rank-mean targets differ even though
    the SET of targets does not).

    Plan: one row_number window per group (shuffle on the group key),
    one rank-mean aggregation (ranks × 8-byte shuffle), one broadcast-
    able join back on the rank. Output: all input columns + `out`
    DOUBLE."""
    order = [F.col(value_col).asc()] + [
        (F.col(c) if isinstance(c, str) else c) for c in tiebreak_cols
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    nn = df.filter(F.col(value_col).isNotNull()).withColumn(
        "__rk", F.row_number().over(w)
    )
    means = nn.groupBy("__rk").agg(
        F.avg(F.col(value_col).cast("double")).alias(out)
    )
    normed = nn.join(F.broadcast(means), "__rk").drop("__rk")
    nulls = df.filter(F.col(value_col).isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return normed.unionByName(nulls)


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build (the Kimball SCD2
    load a warehouse runs on every dimension refresh; also the
    change-log → validity-interval compaction of a CDC feed): from an
    update log (key, version, attributes), emit one row per CHANGE —
    consecutive updates with identical attributes collapse into the
    first — with

        valid_from  = the change's version,
        valid_to    = the NEXT change's version (NULL while current),
        is_current  = valid_to IS NULL.

    Attribute comparison is null-safe (NULL → NULL is "no change";
    NULL → value is a change). Precondition, as for `merge_latest`:
    (key, version) unique per input — duplicate versions tie on the
    window order and would pick a partition-dependent survivor.

    Plan: two windows over the SAME (key × version-order) partitioning
    — lag to detect changes, lead on the filtered rows to close
    intervals — so the plan pays ONE shuffle; the second window reuses
    the first's exchange and sort (same keys, same order). No joins,
    no self-diamond: the change filter sits between the windows in one
    linear pipeline."""
    if not attr_cols:
        raise ValueError("attr_cols must name at least one attribute")
    w = Window.partitionBy(*key_cols).orderBy(version_col)
    vc = F.col(version_col)
    changed = F.lag(vc).over(w).isNull()  # first version per key
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    kept = (
        df.withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .select(*key_cols, vc.alias("valid_from"), *attr_cols)
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    out = kept.withColumn("valid_to", F.lead("valid_from").over(w2))
    return out.select(
        *key_cols,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        *attr_cols,
    )


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.0,
) -> DataFrame:
    """Pairwise association rules over baskets (the Agrawal & Srikant
    1994 market-basket analysis, restricted to the 2-itemsets that
    cover the overwhelming share of real use): for every ordered pair
    of distinct items (a → b),

        support    = baskets containing both / total baskets,
        confidence = baskets with both / baskets with a,
        lift       = confidence / (baskets with b / total baskets)

    — lift > 1 means a and b co-occur more than independence predicts.
    Rules below `min_support` are dropped AFTER counting (their counts
    still derive from the full basket set). Output: (item_a, item_b,
    n_both BIGINT, support / confidence / lift DOUBLE round 6), both
    orientations of each pair (confidence is asymmetric).

    Plan: one groupBy(basket) packs the basket's DISTINCT items —
    bounded by vocabulary, the king_kinship panel contract — a HOF
    expands within-basket ordered pairs, ONE partial-agged
    groupBy(pair) counts, and the per-item basket counts (vocabulary-
    sized) broadcast back onto the pair relation twice. No basket×
    basket term, no item×item shuffle beyond the pair counts."""
    b = F.col(basket_col)
    it = F.col(item_col)
    baskets = (
        df.filter(b.isNotNull() & it.isNotNull())
        .groupBy(b.alias("__b"))
        .agg(F.sort_array(F.collect_set(it)).alias("g"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("__n"))
    item_counts = (
        baskets.select(F.explode("g").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__n_item"))
    )
    n = F.size("g")
    # Streaming ordered-pair expansion in two chained generators (explode
    # each item, then explode the basket minus that item) — the flattened
    # nested-transform form materialized all deg·(deg−1) structs as one
    # array per basket row first. Same rewrite class as graph.py's wedge
    # expansion (round 15).
    counted = (
        baskets.filter(n >= 2)
        .select("g", F.explode("g").alias("a"))
        .select(
            "a",
            F.explode(
                F.filter(F.col("g"), lambda y: y != F.col("a"))
            ).alias("b"),
        )
        .groupBy(F.col("a").alias("item_a"), F.col("b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = (
        counted.join(F.broadcast(n_baskets))
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("item").alias("item_a"),
                    F.col("__n_item").alias("__na"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_counts.select(
                    F.col("item").alias("item_b"),
                    F.col("__n_item").alias("__nb"),
                )
            ),
            "item_b",
        )
    )
    support = F.col("n_both") / F.col("__n")
    confidence = F.col("n_both") / F.col("__na")
    lift = confidence / (F.col("__nb") / F.col("__n"))
    return (
        out.filter(support >= F.lit(float(min_support)))
        .select(
            "item_a",
            "item_b",
            "n_both",
            F.round(support, 6).alias("support"),
            F.round(confidence, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


def robust_scale(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization + robust z-score — the outlier-handling
    step a corpus pipeline runs before thresholding a heavy-tailed
    metric (doc lengths, perplexities, QUAL scores): per group,

        clamped  = clip(x, P_lo, P_hi)        (winsorize, exact
                                               percentiles, linear
                                               interpolation)
        robust_z = (x − median) / (1.4826·MAD),  MAD = median(|x −
                                               median|); NULL when
                                               MAD = 0 (degenerate
                                               group — a z would be
                                               ±inf noise)

    1.4826 makes MAD σ-consistent under normality — the standard robust
    alternative to mean/stddev, immune to the very outliers being
    clipped. All input columns pass through, plus (clamped, robust_z).

    Plan: two grouped EXACT-percentile aggregations (groups × 3 values
    each — Spark's sort-based `percentile`, the `agg_percentiles`
    exactness precedent) with the deviation pass keyed on the first's
    broadcast join-back; group stats stay group-count-sized, the corpus
    shuffles never."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(float(p_lo))).alias("__plo"),
        F.percentile(v, F.lit(float(p_hi))).alias("__phi"),
        F.percentile(v, F.lit(0.5)).alias("__med"),
    )
    with_med = df.join(F.broadcast(stats), on=group_cols)
    mad = (
        with_med.groupBy(*group_cols)
        .agg(F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).alias("__mad"))
    )
    out = with_med.join(F.broadcast(mad), on=group_cols)
    clamped = F.least(F.greatest(v, F.col("__plo")), F.col("__phi"))
    z = F.when(
        F.col("__mad") > 0,
        (v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")),
    )
    return out.select(
        *df.columns,
        F.round(clamped, 6).alias("clamped"),
        F.round(z, 6).alias("robust_z"),
    )


def hamming_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    k: int = 1,
) -> DataFrame:
    """Fuzzy equi-length string join under Hamming distance ≤ k (the
    record-linkage / barcode-demultiplexing matcher: sequencing reads
    against a barcode manifest, noisy keys against a reference list).
    Output: (left_id, right_id, hamming INT), every cross pair of
    equal-length strings differing in at most k positions, exactly once.

    Candidate generation is the pigeonhole partition scheme (the
    PassJoin family, Li et al. 2011, specialized to Hamming where it is
    EXACT): split every string into k+1 contiguous segments at
    length-determined positions — two equal-length strings within
    Hamming k MUST agree on at least one segment (k errors cannot touch
    k+1 segments), and since Hamming never shifts alignment the
    agreement is at identical positions. So candidates are ONE
    equi-join on (length, segment index, segment text), verified with
    one zip_with mismatch count, deduplicated by the FIRST agreeing
    segment (a cheaper filter than distinct: keep the pair only at its
    smallest agreeing segment index — no shuffle-sized distinct).

    Skew warning (in the operator contract, not just the fixture): keys
    sharing a long constant run put that run's segments in one bucket
    and the join degenerates toward n² through it. Put the entropy
    where the segments are — strip constant prefixes or reverse the
    key before joining (the catalog entry does exactly this, and the
    docstring is the documentation of why)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    n_seg = k + 1

    def segs(df, idc, sc, side):
        s = F.col(sc)
        ln = F.length(s)
        seg_len = F.floor(ln / F.lit(n_seg))
        rem = ln % F.lit(n_seg)
        out = []
        for i in range(n_seg):
            # first `rem` segments get one extra char (positions are a
            # pure function of length, identical on both sides)
            start = (
                F.lit(i) * seg_len
                + F.least(F.lit(i), rem)
                + F.lit(1)
            ).cast("int")
            width = (seg_len + (F.lit(i) < rem).cast("long")).cast("int")
            out.append(
                F.struct(
                    F.lit(i).alias("si"),
                    s.substr(start, width).alias("seg"),
                )
            )
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            ln.alias(f"{side}_len"),
            F.explode(F.array(*out)).alias("p"),
        ).select(
            f"{side}_id",
            f"{side}_s",
            f"{side}_len",
            F.col("p.si").alias("si"),
            F.col("p.seg").alias("seg"),
        )

    ls = segs(left, left_id, left_str, "l").withColumnRenamed(
        "l_len", "len"
    )
    rs = segs(right, right_id, right_str, "r").withColumnRenamed(
        "r_len", "len"
    )
    # length is part of the BUCKET key, not a post-join filter: two
    # strings of different lengths can share (si, seg) and would
    # otherwise materialize as candidates only to be discarded
    cand = ls.join(rs, ["si", "seg", "len"])
    a = F.split(F.col("l_s"), "")
    b = F.split(F.col("r_s"), "")
    ham = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    # keep each pair once: at its FIRST agreeing segment. Recompute
    # whether any earlier segment also agreed; cheaper than a distinct
    # over the candidate relation.
    ln = F.col("len")
    seg_len = F.floor(ln / F.lit(n_seg))
    rem = ln % F.lit(n_seg)
    earlier_agrees = F.lit(False)
    for i in range(n_seg):
        start = (F.lit(i) * seg_len + F.least(F.lit(i), rem) + F.lit(1)).cast(
            "int"
        )
        width = (seg_len + (F.lit(i) < rem).cast("long")).cast("int")
        agrees_i = F.col("l_s").substr(start, width) == F.col("r_s").substr(
            start, width
        )
        earlier_agrees = earlier_agrees | (
            (F.lit(i) < F.col("si")) & agrees_i
        )
    first_match = ~earlier_agrees
    return (
        cand.withColumn("__ham", ham)
        .filter((F.col("__ham") <= k) & first_match)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            F.col("__ham").cast("int").alias("hamming"),
        )
    )


def psi_report(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column (the drift monitor a corpus/feature pipeline runs between
    refreshes; credit-scoring heritage, the standard 0.1/0.25
    watch/alarm thresholds): bin edges are the BASE snapshot's
    `n_bins`-quantiles (the convention — drift is measured against
    where the base put its mass), both snapshots histogram into those
    edges, and

        PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base)

    with proportions floored at `eps` so empty bins contribute a large
    finite term instead of ±inf. Output: one row per bin
    (bin INT, lo/hi DOUBLE — NULL at the open ends, n_base/n_cur
    BIGINT, psi_term DOUBLE round 6) plus the caller sums psi_term for
    the headline number (keeping terms per bin is the point: the
    report says WHERE the mass moved). Duplicate quantile edges (a
    low-cardinality base) are deduplicated, so the report may carry
    fewer than `n_bins` rows; an all-null base raises ValueError
    (edges would be undefined).

    Plan: one exact-percentile agg on base (the `agg_percentiles`
    exactness precedent) collected as ~n_bins edges (model-sized), then
    ONE pass over each snapshot binning by a literal CASE ladder into a
    partial-agged histogram — two scans, bins-sized shuffles, no
    joins between the snapshots."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    v = F.col(value_col).cast("double")
    probs = [i / n_bins for i in range(1, n_bins)]
    edges_row = base.agg(
        *[
            F.percentile(v, F.lit(p)).alias(f"q{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    edges = [edges_row[i] for i in range(len(probs))]
    if any(e is None for e in edges):
        raise ValueError(
            "psi_report: base snapshot has no non-null values in "
            f"{value_col!r} — quantile edges are undefined"
        )
    # Low-cardinality bases repeat quantile edges; duplicates would
    # create unreachable bins whose psi_term is the eps floor on both
    # sides (phantom drift). Deduplicate (order-preserving) and report
    # the effective bin count instead.
    edges = sorted({float(e) for e in edges})
    n_bins = len(edges) + 1

    def bin_expr():
        e = F.when(v <= F.lit(float(edges[0])), F.lit(0))
        for i in range(1, len(edges)):
            e = e.when(v <= F.lit(float(edges[i])), F.lit(i))
        return e.otherwise(F.lit(len(edges)))

    def hist(df, name):
        return (
            df.filter(v.isNotNull())
            .groupBy(bin_expr().alias("bin"))
            .agg(F.count(F.lit(1)).alias(name))
        )
    hb = hist(base, "n_base")
    hc = hist(current, "n_cur")
    spark = base.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    j = (
        bins.join(F.broadcast(hb), "bin", "left")
        .join(F.broadcast(hc), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tb = j.agg(
        F.sum("n_base").alias("__tb"), F.sum("n_cur").alias("__tc")
    )
    j = j.join(F.broadcast(tb))
    pb = F.greatest(F.col("n_base") / F.col("__tb"), F.lit(float(eps)))
    pc = F.greatest(F.col("n_cur") / F.col("__tc"), F.lit(float(eps)))
    lo = [None] + [float(x) for x in edges]
    hi = [float(x) for x in edges] + [None]
    lo_expr = F.element_at(
        F.array(*[F.lit(x).cast("double") for x in lo]), F.col("bin") + 1
    )
    hi_expr = F.element_at(
        F.array(*[F.lit(x).cast("double") for x in hi]), F.col("bin") + 1
    )
    return j.select(
        "bin",
        lo_expr.alias("lo"),
        hi_expr.alias("hi"),
        "n_base",
        "n_cur",
        F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Regular-grid resampling with forward fill (pandas
    ``resample().ffill()`` / timescaledb time_bucket + locf): per key,
    emit one row per `step_seconds` grid point from the key's first
    observation (floored to the grid) through its last, carrying the
    most recent observed value at-or-before each point. Output:
    (key_col, grid_ts BIGINT epoch-seconds, value_col — NULL exactly
    on leading grid points before the key's first observation, which
    the floored grid start can produce; strict LOCF never invents a
    value it has not seen). The gap-filling step every downstream
    fixed-frequency consumer (feature windows, charting, joins on
    aligned clocks) needs.

    Plan — the `asof_join` device, no join node for the fill: per-key
    min/max (one partial agg) → grid rows via an exploded sequence
    (epoch ints end to end, the catalog's timestamp convention) →
    UNION with observations tagged obs-first-at-equal-ts → ONE window
    (key, ts-order) carrying ``last(value, ignorenulls)`` → keep grid
    rows. Shuffle: the minmax agg plus one (key × ts-sorted) exchange
    shared by the window; grid size is bounded by span/step per key,
    the operator's own output size.

    Precondition (the `merge_latest` convention): one observation per
    (key, second) — equal-timestamp duplicates tie in the fill order
    and the carried value becomes partition-dependent; collapse them
    first (max/avg per key-second) as the catalog entry does."""
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    k = F.col(key_col)
    ts = F.col(ts_col).cast("timestamp").cast("long")
    obs = df.select(
        k.alias("__k"), ts.alias("__ts"), F.col(value_col).alias("__v")
    )
    span = obs.groupBy("__k").agg(
        F.min("__ts").alias("__lo"), F.max("__ts").alias("__hi")
    )
    step = F.lit(int(step_seconds))
    grid = span.select(
        "__k",
        F.explode(
            F.sequence(
                (F.floor(F.col("__lo") / step) * step).cast("long"),
                F.col("__hi"),
                step,
            )
        ).alias("__ts"),
    ).select("__k", "__ts", F.lit(None).cast(obs.schema["__v"].dataType).alias("__v"), F.lit(1).alias("__g"))
    tagged = obs.withColumn("__g", F.lit(0)).unionByName(grid)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "__f", F.last("__v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("__g") == 1).select(
        F.col("__k").alias(key_col),
        F.col("__ts").alias("grid_ts"),
        F.col("__f").alias(value_col),
    )


def cusum_scores(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    drift: float,
    threshold: float | None = None,
) -> DataFrame:
    """One-sided CUSUM change-point scores per key (Page 1954; the
    sequential upward-shift detector a metrics pipeline runs beside the
    windowed z-score of `rate_anomaly`): the textbook recursion

        S_t = max(0, S_{t-1} + x_t − drift),   S_0 = 0

    computed in CLOSED FORM — S_t = P_t − min_{0 ≤ j ≤ t} P_j with
    P_t = Σ_{i ≤ t}(x_i − drift) and P_0 = 0 (the empty prefix: the
    running min is clamped at 0, else a history whose first values
    exceed drift — exactly the early-shift case CUSUM exists to catch
    — would have its scores understated by the positive prefix min)
    — so the nonlinear recursion becomes
    two cumulative windows over the SAME (key, order) exchange and
    sort: a prefix sum and a running minimum. No fold state, no
    per-key list materialization (the EWMA collect-fold shape is not
    needed here), arbitrarily long histories stream through the
    window. Output: all input rows plus cusum DOUBLE (round 6) and,
    when `threshold` is given, alarm BOOLEAN (S_t > threshold).
    Ordering ties on (key, order) make prefix sums partition-dependent
    — `order_col` must be unique per key (the `merge_latest`
    precondition convention)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(value_col).cast("double") - F.lit(float(drift))).over(w)
    out = df.withColumn("__p", p).withColumn(
        "cusum",
        F.round(
            F.col("__p") - F.least(F.lit(0.0), F.min("__p").over(w)), 6
        ),
    )
    if threshold is not None:
        out = out.withColumn(
            "alarm", F.col("cusum") > F.lit(float(threshold))
        )
    return out.drop("__p")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot delta between two corpus versions (the recurring-crawl
    companion to `scd2_history`/`merge_latest`: "what changed since the
    last refresh" is the question every incremental pipeline asks before
    re-running dedup/tokenize/pack on 100 TB it already processed).
    Classifies every key as added (new only), removed (old only),
    changed (present in both, any compare column differs — NULL-safe via
    IS DISTINCT FROM semantics), or unchanged. Output: (key, change
    STRING) — by default only the delta rows (at corpus scale unchanged
    is the bulk and emitting it defeats the point); pass
    `include_unchanged=True` for the full audit.

    compare_cols defaults to the columns the snapshots share (minus the
    key). Precondition: `key` is unique within each snapshot (the
    `merge_latest` convention — collapse duplicates first or the outer
    join multiplies).

    Plan: ONE full-outer shuffle join on the key; the classification is
    a pure CASE over existence markers and column comparisons — no
    second scan, no window. Downstream: feed the 'added'+'changed' keys
    to `near_dedup_incremental` and the 'removed' keys to index
    retirement."""
    shared = [c for c in new.columns if c != key and c in old.columns]
    cols = list(compare_cols) if compare_cols is not None else shared
    missing = [c for c in cols if c not in shared]
    if missing:
        raise ValueError(
            f"compare_cols not in both snapshots: {missing}"
        )
    o = old.select(
        F.col(key),
        F.lit(True).alias("__eo"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key),
        F.lit(True).alias("__en"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, on=key, how="full_outer")
    differs = F.lit(False)
    for c in cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(
            F.col(f"__n_{c}")
        )
    change = (
        F.when(F.col("__eo").isNull(), F.lit("added"))
        .when(F.col("__en").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col(key), change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT discrete quantiles of a numeric column at corpus scale —
    the order statistic `F.percentile` cannot honestly provide there
    (Spark's exact percentile aggregate buffers every group value in
    executor memory; fine for `agg_percentiles`-sized groups, not for a
    10¹¹-row column). Convention: value at 1-based rank
    max(1, ceil(n·p)) of the sorted non-null values — the inverse-ECDF
    (Hyndman-Fan type-1) quantile, which IS DuckDB's `quantile_disc`
    (verified by an index-by-index probe across n × p grids; the
    superficially similar floor((n−1)·p) convention disagrees whenever
    frac(n·p) ∈ (0, p]), so the oracle replays it directly. Output:
    (p DOUBLE, value DOUBLE), one row per requested prob.

    The `take_token_budget` bucket device on the VALUE axis: pass 1 is
    one (count, min, max) agg + one per-bucket histogram over
    equal-width value buckets (`n_buckets` rows to the driver — the
    documented model-size collect); the driver's cumulative walk maps
    each target rank to its bucket and residual rank; pass 2 sorts ONLY
    the ≤ len(probs) target buckets (~1/n_buckets of the data each)
    with a per-bucket window and keeps the residual-rank row via a
    broadcast join against the (p, bucket, rank) targets. No global
    sort, no full-column buffering. Degenerate distributions (one value
    dominating a bucket) degrade that bucket's sort toward the naive
    cost but never break exactness; a constant column short-circuits.

    Raises ValueError on an all-null/empty column (quantiles
    undefined — the `psi_report` convention) or probs outside [0, 1]."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"probs must be in [0, 1], got {p}")
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull())
    stats = nn.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    ).collect()[0]
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if n == 0:
        raise ValueError(
            f"exact_quantiles: no non-null values in {value_col!r}"
        )
    spark = df.sparkSession
    if lo == hi:  # constant column: every quantile is that value
        return spark.createDataFrame(
            [(float(p), float(lo)) for p in probs], "p double, value double"
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("int")
    hist = {
        r["__b"]: r["c"]
        for r in nn.select(bucket.alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    import math

    targets = []  # (p, bucket, residual 1-based rank)
    for p in probs:
        r = max(1, math.ceil(n * p))  # 1-based rank (type-1 / inv-ECDF)
        cum = 0
        for b in sorted(hist):
            if cum + hist[b] >= r:
                targets.append((float(p), b, r - cum))
                break
            cum += hist[b]
    tdf = spark.createDataFrame(targets, "p double, __b int, __r int")
    needed = sorted({b for _, b, _ in targets})
    w = Window.partitionBy("__b").orderBy(v)
    ranked = (
        nn.withColumn("__b", bucket)
        .filter(F.col("__b").isin(needed))
        .withColumn("__rn", F.row_number().over(w))
    )
    return ranked.join(
        F.broadcast(tdf),
        (ranked["__b"] == tdf["__b"]) & (ranked["__rn"] == tdf["__r"]),
    ).select("p", v.alias("value"))


def bucketed_row_number(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: list[str],
    out_col: str,
    n_buckets: int = 1024,
    checkpoint: bool = False,
) -> DataFrame:
    """EXACT global row_number over (key ASC, *tiebreaks ASC) — without
    the single-task global sort `row_number().over(Window.orderBy(...))`
    costs (an unpartitioned window funnels the whole relation through
    one partition; at corpus scale that is THE plan-killer the round-8
    verdict flagged in lorenz_deciles / rfm_segments).

    The `exact_quantiles` histogram device turned into a ranking
    device: (1) one (count, min, max) agg prices equal-width value
    buckets on the NUMERIC key; (2) a per-bucket histogram (≤ n_buckets
    rows — the documented model-size collect) gives each bucket its
    exact global rank OFFSET by a driver-side cumulative walk; (3) the
    final rank is offset + row_number() over a window partitioned BY
    BUCKET — ~1/n_buckets of the data per sort task, never one task.
    Equal keys always share a bucket, so tie-break ordering stays
    within a partition and the result is bit-identical to the global
    window form.

    Preconditions: `key_col` numeric (castable to double) and non-null
    on every row (raise, don't silently mis-rank). Degenerate
    distributions (one value dominating) degrade toward the naive sort
    cost but never break exactness; a CONSTANT key short-circuits to
    the plain window (the sort is then tie-break-only — unavoidable).
    The input plan must be DETERMINISTIC across re-evaluation: the
    operator runs three jobs against it (stats, histogram, final rank)
    and a rand()/sample/un-checkpointed-shuffle input could hand them
    inconsistent data, silently mis-ranking. Pass `checkpoint=True` to
    localCheckpoint the input up front when the caller can't guarantee
    this (all in-repo callers — rfm_segments, lorenz_deciles — read
    deterministic parquet-derived plans and skip the materialization).

    Output: the input columns + `out_col` BIGINT (1-based dense rank
    by position, i.e. row_number semantics)."""
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    k = F.col(key_col).cast("double")
    tb = [F.col(c).asc() for c in tiebreak_cols]
    st = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("nk"),
        F.min(k).alias("lo"),
        F.max(k).alias("hi"),
    ).collect()[0]
    if st["n"] != st["nk"]:
        raise ValueError(
            f"bucketed_row_number: {key_col!r} has NULLs "
            f"({st['n'] - st['nk']} of {st['n']} rows)"
        )
    lo, hi = st["lo"], st["hi"]
    if lo is None or lo == hi:  # empty or constant key
        w = Window.orderBy(k.asc(), *tb)
        return df.withColumn(
            out_col, F.row_number().over(w).cast("long")
        )
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((k - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("int")
    binned = df.withColumn("__bk", bucket)
    hist = {
        r["__bk"]: r["c"]
        for r in binned.groupBy("__bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, cum = [], 0
    for bk in sorted(hist):
        offsets.append((bk, cum))
        cum += hist[bk]
    odf = df.sparkSession.createDataFrame(
        offsets, "__bk int, __off bigint"
    )
    w = Window.partitionBy("__bk").orderBy(k.asc(), *tb)
    return (
        binned.join(F.broadcast(odf), "__bk")
        .withColumn(
            out_col,
            (F.col("__off") + F.row_number().over(w)).cast("long"),
        )
        .drop("__bk", "__off")
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    k: int = 1,
) -> DataFrame:
    """Fuzzy string join under Levenshtein distance ≤ k (the general
    edit-distance companion to `hamming_join`: insertions and deletions
    shift alignment, so the pigeonhole segment scheme no longer
    applies). Output: (left_id, right_id, dist INT), every cross pair
    within distance k exactly once. k ∈ {1, 2} — the record-linkage
    regimes; beyond 2 the deletion neighborhood grows ~L^k and q-gram
    filters are the right tool.

    Candidate generation is the symmetric-delete scheme (the SymSpell
    device): every string emits its deletion neighborhood up to depth k
    (itself + all strings reachable by deleting ≤ k characters —
    computed NATIVELY as nested transform/flatten HOFs, no Python); if
    lev(s, t) ≤ k, deleting the edit-script positions from each side
    reaches a COMMON variant, so one equi-join on the variant string
    finds a candidate superset with no false negatives. Verification is
    one JVM-side `levenshtein` call per distinct candidate pair.

    Costs, called out: each row emits O(L^k) join keys (L+1 at k=1),
    and candidate dedup is a distinct over the pair relation (edits
    shift positions, so Hamming's first-agreeing-segment trick has no
    analogue here). Near-identical key families cluster their variants
    into shared buckets — the `hamming_join` skew warning applies
    verbatim: put entropy at both ends of the key. NULL strings on
    either side are dropped (no content, no neighborhood)."""
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")

    def _one_delete(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(
                t.substr(F.lit(1), (i - 1).cast("int")),
                t.substr(
                    (i + 1).cast("int"), (F.length(t) - i).cast("int")
                ),
            ),
        )

    def _neighborhood(s: Column) -> Column:
        d1 = _one_delete(s)
        all_v = F.concat(F.array(s), d1)
        if k == 2:
            d2 = F.flatten(F.transform(d1, _one_delete))
            all_v = F.concat(all_v, d2)
        return F.array_distinct(all_v)

    def _keys(df, idc, sc, side):
        s = F.col(sc)
        return df.filter(s.isNotNull()).select(
            F.col(idc).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            F.explode(_neighborhood(s)).alias("__v"),
        )

    ls = _keys(left, left_id, left_str, "l")
    rs = _keys(right, right_id, right_str, "r")
    cand = ls.join(rs, "__v").select(
        "l_id", "l_s", "r_id", "r_s"
    ).distinct()
    return (
        cand.withColumn("__d", F.levenshtein(F.col("l_s"), F.col("r_s")))
        .filter(F.col("__d") <= k)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            F.col("__d").cast("int").alias("dist"),
        )
    )


def group_auc(
    df: DataFrame,
    group_cols: Sequence[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC-AUC of a score against a binary label via the
    Mann-Whitney rank form — the evaluation loop of classifier-based
    corpus quality filtering (FastText/logreg quality scores, toxicity
    screens): per source/domain/shard, how well does the score separate
    kept from dropped?

        AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)

    with average ranks on score ties (the tie-corrected U statistic —
    equivalently, ties count 1/2). label must be 0/1 (cast to int);
    rows with NULL score or label are dropped. Groups with no positives
    or no negatives yield auc NULL (undefined, not 0.5 — the caller
    should see the hole). Output: (*group_cols, n_pos BIGINT,
    n_neg BIGINT, auc DOUBLE round 6).

    Plan shape: ONE exchange on the group keys serves both windows (the
    score-rank window and the tie-count window sort within the same
    partitioning), then one groupBy on the same keys — no joins, no
    driver state, group cardinality bounds nothing (a group's rows
    stream through the sort). AUC is exactly an expression over rank
    sums, so the whole statistic replays in ANSI SQL."""
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must be non-empty")
    sc = F.col(score_col).cast("double")
    lc = F.col(label_col).cast("int")
    base = df.filter(sc.isNotNull() & lc.isNotNull()).select(
        *gcols, sc.alias("__s"), lc.alias("__y")
    )
    w_rank = Window.partitionBy(*gcols).orderBy("__s")
    w_tie = Window.partitionBy(*gcols, "__s")
    ranked = base.select(
        *gcols,
        "__y",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie) - F.lit(1)) / F.lit(2.0)
        ).alias("__r"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__rp"),
    )
    auc = (
        F.col("__rp")
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / F.lit(2.0)
    ) / (F.col("n_pos").cast("double") * F.col("n_neg"))
    return agg.select(
        *gcols,
        "n_pos",
        "n_neg",
        F.round(
            F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc), 6
        ).alias("auc"),
    )


def sorted_neighborhood_join(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 4,
    bucket_expr: Column | None = None,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking for record linkage (Hernández &
    Stolfo 1995): sort records by a blocking key, then candidate pairs
    are exactly the records within `window` positions of each other —
    the linkage blocker for typo-adjacent keys that hash blocking
    (which needs an exact segment match, cf. `hamming_join` /
    `edit_distance_join`) scatters apart. Candidates per record are
    bounded by `window`, so total pair work is n·(window−1) whatever
    the key distribution — the property that makes SNM the default
    blocker for messy entity resolution.

    Output: (a_id, b_id, a_key, b_key[, dist INT]) for every ordered-
    by-rank pair 0 < rank(b) − rank(a) < window; with `max_dist` the
    pairs are verified with Levenshtein and filtered to dist <=
    max_dist.

    Scale shape — the global sort never runs in one task: `bucket_expr`
    (default: first 2 chars of the key; REQUIRED to be monotone
    non-decreasing in the key, or ranks interleave) splits the sort
    into per-bucket window sorts that run in parallel; exact global
    ranks come from adding per-bucket offsets computed by ONE
    buckets-sized cumulative window (the take_token_budget /
    pack_global bucket-offset device — no driver collect). Pair
    generation is an explode(1..window−1) + rank EQUI-join — never a
    range self-join. NULL key or id rows are excluded."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    kc, ic = F.col(key_col), F.col(id_col)
    b = (
        bucket_expr
        if bucket_expr is not None
        else F.substring(kc.cast("string"), 1, 2)
    )
    base = df.filter(kc.isNotNull() & ic.isNotNull()).select(
        ic.alias("__id"), kc.cast("string").alias("__k"), b.alias("__b")
    )
    counts = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__b",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    )
    w_rank = Window.partitionBy("__b").orderBy("__k", "__id")
    ranked = (
        base.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__r", F.row_number().over(w_rank) + F.col("__off")
        )
        .select("__id", "__k", "__r")
    )
    left = ranked.select(
        F.col("__id").alias("a_id"),
        F.col("__k").alias("a_key"),
        F.explode(
            F.sequence(F.col("__r") + 1, F.col("__r") + (window - 1))
        ).alias("__t"),
    )
    pairs = left.join(
        ranked.select(
            F.col("__id").alias("b_id"),
            F.col("__k").alias("b_key"),
            F.col("__r").alias("__t"),
        ),
        "__t",
    ).select("a_id", "b_id", "a_key", "b_key")
    if max_dist is None:
        return pairs
    return pairs.withColumn(
        "dist", F.levenshtein("a_key", "b_key").cast("int")
    ).filter(F.col("dist") <= F.lit(int(max_dist)))


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Association between two categorical columns in one row:
    (n BIGINT, r, c BIGINT distinct levels, mi DOUBLE nats,
    chi2 DOUBLE, dof BIGINT, cramers_v DOUBLE) — the feature-relevance /
    leakage screen a pipeline runs before trusting a grouping column
    (is `source` predictive of `lang`? is a fold assignment independent
    of the label?).

        mi   = Σ_xy (n_xy/n) · ln(n_xy · n / (n_x · n_y))
        chi2 = n · (Σ_xy n_xy²/(n_x·n_y) − 1)
        V    = sqrt(chi2 / (n · (min(r,c) − 1)))

    The chi-square uses the closed form above because it is exact over
    SPARSE contingency tables: absent (x, y) cells contribute their full
    expected count to Pearson's statistic, and Σ n_xy²/(n_x n_y) over
    observed cells only already accounts for that — no dense r×c
    cross join materializes. MI's zero cells contribute 0 by limit.

    Rows with a NULL in either column are excluded (n counts complete
    pairs). Degenerate tables (r = 1 or c = 1) return mi = 0, chi2 = 0
    and NULL cramers_v (dof = 0 — independence is unfalsifiable).

    Plan: one groupBy(x, y) collapses the data to cell counts (the only
    data-sized shuffle); marginals are two window sums OVER THE CELLS
    table (|X|·|Y| rows, not data rows); the final reduce is a 1-row
    aggregation. MI uses the rearranged form
    Σ n_xy·ln(n_xy/(n_x·n_y))/n + ln(n) so the grand total n is an
    ordinary aggregate, not a partition-free window over the cells.
    All JVM-side column arithmetic."""
    x, y = F.col(x_col), F.col(y_col)
    cells = (
        df.filter(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("__x"), y.alias("__y"))
        .agg(F.count(F.lit(1)).alias("__nxy"))
    )
    wx = Window.partitionBy("__x")
    wy = Window.partitionBy("__y")
    cells = cells.withColumn("__nx", F.sum("__nxy").over(wx)).withColumn(
        "__ny", F.sum("__nxy").over(wy)
    )
    nxy = F.col("__nxy").cast("double")
    nx = F.col("__nx").cast("double")
    ny = F.col("__ny").cast("double")
    mi_term = nxy * F.log(nxy / (nx * ny))
    chi_term = nxy * nxy / (nx * ny)
    out = cells.agg(
        F.sum("__nxy").cast("bigint").alias("n"),
        F.countDistinct("__x").alias("r"),
        F.countDistinct("__y").alias("c"),
        F.sum(mi_term).alias("__mi_raw"),
        F.sum(chi_term).alias("__chi_frac"),
    )
    r, c = F.col("r").cast("double"), F.col("c").cast("double")
    nn = F.col("n").cast("double")
    mi = F.when(nn > 0, F.col("__mi_raw") / nn + F.log(nn))
    # greatest(…, 0): chi_frac is 1 up to float error on independent
    # tables, and a -1e-16 under the sqrt would be NaN, not 0
    chi2 = F.greatest(nn * (F.col("__chi_frac") - 1.0), F.lit(0.0))
    dof = ((r - 1.0) * (c - 1.0)).cast("bigint")
    v = F.when(
        (F.least(r, c) > 1.0) & (nn > 0),
        F.sqrt(chi2 / (nn * (F.least(r, c) - 1.0))),
    )
    return out.select(
        "n",
        "r",
        "c",
        # + 0.0 canonicalizes IEEE -0.0 (mi/chi2 are 0 up to float
        # error on independent columns and can round to -0.0)
        (F.round(mi, 6) + 0.0).alias("mi"),
        (F.round(chi2, 4) + 0.0).alias("chi2"),
        dof.alias("dof"),
        (F.round(v, 6) + 0.0).alias("cramers_v"),
    )


def ks_lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Decile lift/gain table + Kolmogorov-Smirnov separation for a
    score against a binary label — the model-evaluation report every
    quality-classifier gate reads (with `group_auc` as the scalar
    summary): per score-decile, how concentrated are the positives,
    and what is the maximum cumulative separation between the positive
    and negative score distributions (KS = max_t |F_pos(t) − F_neg(t)|,
    the industry credit-scoring statistic)?

    Binning is by EXACT quantile thresholds (`exact_quantiles`, type-1 /
    `quantile_disc` semantics), not equal-count ntile: bin b(s) =
    n_bins + 1 − (1 + Σ_k [s > e_k]) over the n_bins−1 edges, so bin 1
    is the top scores and TIED SCORES ALWAYS SHARE A BIN — deterministic
    under any row order, replayable by an engine-independent oracle,
    and free of the global sort a true ntile needs (the scale killer:
    ranking 10¹¹ eval rows through one window). Heavily tied scores make
    unequal or empty bins — empty bins are simply absent rows.

    Output, one row per non-empty bin ordered by bin: bin INT,
    n / n_pos BIGINT, pos_rate, cum_pos_frac, cum_neg_frac, ks, lift,
    cum_lift DOUBLE (round 6; lift NULL when the corpus has no
    positives, ks NULL when either class is empty — separation is
    undefined). max(ks) over the rows is the KS statistic.

    Plan: edges are a ≤ n_bins-row driver collect (exact_quantiles'
    bucketed two-pass — no global sort); binning is a literal
    comparison fold at the scan; one groupBy(bin) collapses the data to
    ≤ n_bins rows; totals broadcast back as a 1-row cross join and the
    cumulative window runs over the bins table only. Rows with a NULL
    score or label are excluded."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    nn = df.filter(s.isNotNull() & y.isNotNull())
    probs = [k / n_bins for k in range(1, n_bins)]
    edges = [
        r["value"]
        for r in exact_quantiles(nn, score_col, probs).orderBy("p").collect()
    ]
    asc = F.lit(1)
    for e in edges:
        asc = asc + (s > F.lit(float(e))).cast("int")
    bins = (
        nn.select((F.lit(n_bins + 1) - asc).alias("bin"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").cast("bigint").alias("n_pos"),
        )
    )
    tot = bins.agg(
        F.sum("n").alias("__tn"), F.sum("n_pos").alias("__tp")
    )
    b = bins.crossJoin(F.broadcast(tot))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum_n = F.sum("n").over(w).cast("double")
    cum_p = F.sum("n_pos").over(w).cast("double")
    tn = F.col("__tn").cast("double")
    tp = F.col("__tp").cast("double")
    neg = tn - tp
    pos_rate = F.col("n_pos") / F.col("n")
    base = F.when(tp > 0, tp / tn)
    cum_pos_frac = F.when(tp > 0, cum_p / tp)
    cum_neg_frac = F.when(neg > 0, (cum_n - cum_p) / neg)
    r6 = lambda c: (F.round(c, 6) + 0.0)
    return b.select(
        F.col("bin").cast("int").alias("bin"),
        "n",
        "n_pos",
        r6(pos_rate).alias("pos_rate"),
        r6(cum_pos_frac).alias("cum_pos_frac"),
        r6(cum_neg_frac).alias("cum_neg_frac"),
        r6(F.abs(cum_pos_frac - cum_neg_frac)).alias("ks"),
        r6(pos_rate / base).alias("lift"),
        r6((cum_p / cum_n) / base).alias("cum_lift"),
    ).orderBy("bin")


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT per-group discrete quantiles at corpus scale — the grouped
    form of `exact_quantiles`, closing the gap its docstring names:
    Spark's exact `percentile` aggregate buffers every group value in
    executor memory (fine for `agg_percentiles`-sized groups, fatal for
    a group holding 10⁹ rows), and `approx_percentile` is not an
    oracle-checkable answer. Same type-1 / inverse-ECDF convention
    (value at 1-based rank max(1, ceil(n_g·p)) of the group's sorted
    non-null values = DuckDB's per-group `quantile_disc`). Output:
    group_cols + (p DOUBLE, value DOUBLE), one row per (group, prob);
    groups with no non-null values yield no rows.

    Unlike the global form, NOTHING is collected — the bucket walk is
    distributed: (1) per-group (n, lo, hi) agg; (2) join-back prices
    each row's equal-width value bucket (constant groups collapse to
    bucket 0); (3) per-(group, bucket) histogram + a cumulative window
    ALONG THE BUCKET AXIS of each group maps every target rank
    r = max(1, ceil(n_g·p)) to its bucket and residual rank; (4) only
    rows of targeted buckets (~len(probs)/n_buckets of each group) are
    ranked by a per-(group, bucket) window and kept at the residual
    rank. Shuffles are keyed on the group (stats, histogram) and
    (group, bucket) (final rank) — partial-agged, skew-bounded by
    bucket granularity, with no global sort and no driver round trip,
    so the operator composes inside a larger lazy plan."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"probs must be in [0, 1], got {p}")
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull())
    stats = nn.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min(v).alias("__lo"),
        F.max(v).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / n_buckets
    bucket = F.when(width > 0, F.least(
        F.floor((v - F.col("__lo")) / width), F.lit(n_buckets - 1)
    ).cast("int")).otherwise(F.lit(0))
    binned = nn.join(stats, on=group_cols).withColumn("__b", bucket)
    hist = binned.groupBy(*group_cols, "__b").agg(
        F.count(F.lit(1)).alias("__c"), F.max("__n").alias("__n")
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(wcum))
    # targets: one row per (group, p) with its 1-based type-1 rank
    pcol = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("p")
    targets = stats.select(*group_cols, "__n", pcol).select(
        *group_cols,
        "p",
        F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.col("__n") * F.col("p"))
        ).alias("__r"),
    )
    located = (
        cum.join(targets, on=group_cols)
        .filter(
            (F.col("__cum") >= F.col("__r"))
            & (F.col("__cum") - F.col("__c") < F.col("__r"))
        )
        .select(
            *group_cols,
            "p",
            "__b",
            (F.col("__r") - (F.col("__cum") - F.col("__c"))).alias("__rr"),
        )
    )
    wrank = Window.partitionBy(*group_cols, "__b").orderBy(v)
    ranked = (
        binned.join(
            located.select(*group_cols, "__b").distinct(),
            on=group_cols + ["__b"],
        )
        .withColumn("__rn", F.row_number().over(wrank))
    )
    return ranked.join(
        located,
        on=group_cols + ["__b"],
    ).filter(F.col("__rn") == F.col("__rr")).select(
        *group_cols, "p", v.alias("value")
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-call column profiling report — the data-quality screen a
    pipeline runs on an unfamiliar or freshly-landed table (the
    expectation-suite / dbt-test shape): one row per column with
    (col_name, dtype STRING, n_rows, n_null BIGINT, null_frac DOUBLE,
    n_distinct BIGINT, min_num/max_num/mean DOUBLE for numeric columns,
    min_str/max_str STRING for string columns; the inapplicable family
    is NULL). Numeric and string stats stay in TYPED columns rather
    than casting everything to display strings — cross-engine float
    formatting is exactly the non-determinism an oracle-checked report
    must not contain.

    ALL columns profile in ONE aggregation pass over the data (a single
    wide agg, then a stack() unpivot of the 1-row result — the unpivot
    runs over one row, not the data). exact_distinct=True uses
    count(DISTINCT col) per column — Spark expands the input once per
    distinct aggregate, so at true corpus scale (10¹¹ rows × many
    columns) set exact_distinct=False to switch every column to
    approx_count_distinct (HLL, one expand total) and treat n_distinct
    as an estimate; the flag exists precisely because the exact form is
    the oracle-checkable one and the approximate form is the 100 TB
    one."""
    from pyspark.sql import types as T

    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"column {c!r} not in DataFrame")
    num_types = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    aggs, rows = [], []
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    for i, c in enumerate(cols):
        col = F.col(c)
        is_num = isinstance(schema[c], num_types)
        is_str = isinstance(schema[c], T.StringType)
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{i}"),
            F.sum(col.isNull().cast("bigint")).alias(f"__nl_{i}"),
            nd(c).alias(f"__nd_{i}"),
            (F.min(col.cast("double")) if is_num else F.lit(None).cast(
                "double")).alias(f"__mn_{i}"),
            (F.max(col.cast("double")) if is_num else F.lit(None).cast(
                "double")).alias(f"__mx_{i}"),
            (F.round(F.avg(col.cast("double")), 6) if is_num
             else F.lit(None).cast("double")).alias(f"__av_{i}"),
            (F.min(col) if is_str else F.lit(None).cast("string")).alias(
                f"__ms_{i}"),
            (F.max(col) if is_str else F.lit(None).cast("string")).alias(
                f"__xs_{i}"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            f"'{c}'", f"'{schema[c].simpleString()}'",
            f"__n_{i}", f"__nl_{i}", f"__nd_{i}",
            f"__mn_{i}", f"__mx_{i}", f"__av_{i}",
            f"__ms_{i}", f"__xs_{i}",
        ]
    stacked = one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(col_name, dtype, n_rows, n_null, n_distinct, "
            "min_num, max_num, mean, min_str, max_str)"
        )
    )
    return stacked.select(
        "col_name",
        "dtype",
        "n_rows",
        "n_null",
        F.round(
            F.when(
                F.col("n_rows") > 0,
                F.col("n_null").cast("double") / F.col("n_rows"),
            ),
            6,
        ).alias("null_frac"),
        "n_distinct",
        "min_num",
        "max_num",
        "mean",
        "min_str",
        "max_str",
    )


def ols_fit(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    intercept: bool = True,
) -> DataFrame:
    """Ordinary least squares at corpus scale — one pass of
    partial-aggregated normal-equation sums, then a driver-side d×d
    solve (the documented model-sized collect: d features, never data).
    The regression every pipeline eventually runs on its own telemetry
    (trend fits, mixture-weight calibration, throughput models), in the
    only shape that distributes: X'X and X'y are sums of per-row outer
    products, so ONE .agg() with d(d+1)/2 + d + 2 sum expressions
    collapses the corpus map-side; no row ever shuffles.

    Output: one row per coefficient (term STRING — '(intercept)' or the
    feature name, beta DOUBLE round 6) plus diagnostics rows
    ('(n)', '(r2)') — long form so the schema is d-agnostic. R² =
    1 − SSR/SST (NULL for a constant y). Rows with any NULL among
    y/x are excluded (complete-case). Raises on singular X'X (collinear
    features) — a silent pseudo-inverse would hide a modeling bug.

    Exactness note: the driver solve uses numpy's LAPACK; the SQL
    oracle replays Cramer's rule — both on the SAME aggregated sums, so
    agreement to 1e-6 holds for any well-conditioned design, and the
    sums themselves (the distributed part) are exact replays."""
    import numpy as np

    if not x_cols:
        raise ValueError("x_cols must be non-empty")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    terms = ([F.lit(1.0)] if intercept else []) + xs
    names = (["(intercept)"] if intercept else []) + list(x_cols)
    d = len(terms)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"__xx_{i}_{j}"))
        aggs.append(F.sum(terms[i] * y).alias(f"__xy_{i}"))
    aggs.append(F.sum(y).alias("__sy"))
    aggs.append(F.sum(y * y).alias("__syy"))
    row = nn.agg(*aggs).collect()[0]
    n = row["__n"]
    if n == 0:
        raise ValueError("no complete-case rows to fit")
    XX = np.zeros((d, d))
    Xy = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
        Xy[i] = row[f"__xy_{i}"]
    if abs(np.linalg.det(XX)) < 1e-10 * max(1.0, abs(XX).max()) ** d:
        raise ValueError("singular design matrix (collinear features)")
    beta = np.linalg.solve(XX, Xy)
    ssr = row["__syy"] - float(beta @ Xy)
    sst = row["__syy"] - row["__sy"] ** 2 / n
    r2 = 1.0 - ssr / sst if sst > 0 else None
    spark = df.sparkSession
    out = [(nm, round(float(b), 6) + 0.0) for nm, b in zip(names, beta)]
    out.append(("(n)", float(n)))
    out.append(("(r2)", round(r2, 6) + 0.0 if r2 is not None else None))
    return spark.createDataFrame(out, "term string, beta double")


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Hour-of-day seasonal profile per key with deviation z-scores —
    the seasonality-aware companion to `rate_anomaly` (whose global
    hourly z treats 3am and 3pm as exchangeable): per (key,
    hour-of-day), the mean DAILY event count across the dates that hour
    actually fired, and how far that hour's mean sits from the key's
    own across-hours distribution:

        hourly  = count per (key, date, hour)
        profile = mean over dates per (key, hour)     (absent
                  (date, hour) cells are MISSING, not zero — a day
                  with no 3am events doesn't drag the 3am mean down;
                  n_days says how much support each cell has)
        z       = (profile − mean_h(profile)) / stddev_h(profile)

    Output: (key, hod INT, n_days BIGINT, mean_cnt DOUBLE round 6,
    z DOUBLE round 6; NULL z for keys whose 24 profile cells are
    constant). The peak/trough hours a traffic pipeline alerts on are
    exactly the |z| tails.

    Plan: one groupBy(key, date, hod) collapses the data (the only
    data-sized shuffle); the profile agg and the per-key window run
    over ≤ keys×24 rows."""
    k = F.col(key_col)
    ts = F.col(ts_col)
    nn = df.filter(k.isNotNull() & ts.isNotNull())
    hourly = nn.groupBy(
        k.alias("key"),
        F.to_date(ts).alias("__d"),
        F.hour(ts).alias("hod"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    prof = hourly.groupBy("key", "hod").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("__c").alias("__m"),
    )
    w = Window.partitionBy("key")
    mu = F.avg("__m").over(w)
    sd = F.stddev_samp("__m").over(w)
    z = F.when(sd > 0, (F.col("__m") - mu) / sd)
    return prof.select(
        "key",
        F.col("hod").cast("int").alias("hod"),
        "n_days",
        (F.round(F.col("__m"), 6) + 0.0).alias("mean_cnt"),
        (F.round(z, 6) + 0.0).alias("z"),
    )


#: P(first significant digit = d) under Benford's law, d = 1..9
_BENFORD = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def benford_screen(
    df: DataFrame, value_col: str
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    data-forensics screen for fabricated or truncated numeric columns
    (Nigrini's audit test; a synthetic uniform column fails it loudly,
    which is itself the signal that a column is NOT organic magnitude
    data). Digits come from the absolute value's scientific-notation
    lead digit (zero and NULL rows excluded — they have no first
    significant digit). Output: one row per digit 1..9 with n BIGINT,
    freq, expected DOUBLE, dev (freq − expected), plus the per-digit
    chi-square term; sum(chi2_term) is the 8-dof statistic a gate
    thresholds.

    Plan: one groupBy over a 9-value key after a pure-projection digit
    extraction; totals broadcast back as one row. The digit expression
    is log10-free: format the absolute value with `format_number`-style
    scientific printing? No — printing is engine-specific, so the digit
    is computed ARITHMETICALLY: y = |x| / 10^floor(log10(|x|)) then a
    ±1-decade correction CASE (y ≥ 10 → y/10, y < 1 → y·10) — so a
    1-ulp log10 disagreement between engines at exact powers of 10
    cannot flip the digit."""
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull() & (v != 0.0) & ~F.isnan(v))
    mag = F.floor(F.log10(F.abs(v)))
    y = F.abs(v) / F.pow(F.lit(10.0), mag)
    digit = (
        F.when(y >= 10.0, F.floor(y / 10.0))
        .when(y < 1.0, F.floor(y * 10.0))
        .otherwise(F.floor(y))
    ).cast("int")
    counts = nn.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    b = counts.crossJoin(F.broadcast(tot))
    freq = F.col("n").cast("double") / F.col("__t")
    exp_map = F.map_from_arrays(
        F.array(*[F.lit(i + 1) for i in range(9)]),
        F.array(*[F.lit(p) for p in _BENFORD]),
    )
    expected = exp_map[F.col("digit")]
    chi = (
        (freq - expected) * (freq - expected) / expected * F.col("__t")
    )
    return b.select(
        "digit",
        "n",
        (F.round(freq, 6) + 0.0).alias("freq"),
        F.round(expected, 6).alias("expected"),
        (F.round(freq - expected, 6) + 0.0).alias("dev"),
        (F.round(chi, 6) + 0.0).alias("chi2_term"),
    ).orderBy("digit")


def rolling_corr(
    df: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
    window: int = 10,
) -> DataFrame:
    """Per-key rolling Pearson correlation of two columns over the last
    `window` rows in `order_col` order — the co-movement monitor
    (metric-vs-metric drift, price-vs-volume, latency-vs-load) in its
    streaming-friendly form. Output: all input columns + n_w BIGINT
    (rows in the frame) and corr DOUBLE (round 6; NULL while the frame
    holds < 2 rows or either column is constant within it).

    corr is assembled from FIVE frame sums (Σx, Σy, Σxy, Σx², Σy², all
    over the same rowsBetween frame, all served by ONE exchange on the
    key + one sort — Catalyst collapses same-frame window functions
    into a single Window node):

        corr = (n·Σxy − Σx·Σy) /
               sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)

    Rows where x or y is NULL keep their place in the ordering but
    contribute nothing to the sums (count counts complete pairs) — the
    pairwise-deletion convention of `ld_r2`. Variance guards use
    greatest(·, 0) against float-negative zero variance."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    k, o = F.col(key_col), F.col(order_col)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xv = F.when(both, x)
    yv = F.when(both, y)
    w = (
        Window.partitionBy(k)
        .orderBy(o)
        .rowsBetween(-(window - 1), 0)
    )
    n = F.count(xv).over(w).cast("double")
    sx = F.sum(xv).over(w)
    sy = F.sum(yv).over(w)
    sxy = F.sum(xv * yv).over(w)
    sxx = F.sum(xv * xv).over(w)
    syy = F.sum(yv * yv).over(w)
    vx = F.greatest(n * sxx - sx * sx, F.lit(0.0))
    vy = F.greatest(n * syy - sy * sy, F.lit(0.0))
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        (n * sxy - sx * sy) / F.sqrt(vx) / F.sqrt(vy),
    )
    return df.select(
        "*",
        F.count(xv).over(w).alias("n_w"),
        (F.round(corr, 6) + 0.0).alias("corr"),
    )


def ab_test_proportions(
    df: DataFrame,
    variant_col: str,
    success_col: str,
    variant_a: str,
    variant_b: str,
) -> DataFrame:
    """Two-proportion A/B comparison in one row — the experiment
    readout (conversion-rate difference between variants) with the
    pooled two-proportion z statistic and the unpooled Wald 95% CI of
    the difference:

        z  = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),
             p̂ = pooled rate
        CI = (p_b − p_a) ± 1.96·sqrt(p_a(1−p_a)/n_a + p_b(1−p_b)/n_b)

    success is any column castable to int (nonzero/true = success;
    NULL rows excluded). Rows of other variants are ignored, so a
    multi-arm table scans pairwise without pre-filtering. Output:
    (n_a, succ_a, n_b, succ_b BIGINT, rate_a, rate_b, diff, z, ci_lo,
    ci_hi DOUBLE round 6; z and the CI are NULL when either arm is
    empty or the pooled rate is degenerate 0/1 — no information, not
    infinite certainty).

    Plan: ONE conditional-sum aggregation (4 counters) — the corpus
    collapses map-side; every statistic is a projection of the four
    counts. The z threshold itself (1.96) is the caller's concern;
    this reports the statistic, not a verdict."""
    v = F.col(variant_col)
    s = F.col(success_col).cast("int")
    nn = df.filter(v.isNotNull() & s.isNotNull())
    ina = v == variant_a
    inb = v == variant_b
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    agg = nn.agg(
        cnt(ina).alias("n_a"),
        cnt(ina & (s != 0)).alias("succ_a"),
        cnt(inb).alias("n_b"),
        cnt(inb & (s != 0)).alias("succ_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.when(F.col("n_a") > 0, F.col("succ_a") / na)
    pb = F.when(F.col("n_b") > 0, F.col("succ_b") / nb)
    pool = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (F.col("succ_a") + F.col("succ_b")) / (na + nb),
    )
    se_pool = F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    z = F.when(se_pool > 0, (pb - pa) / se_pool)
    se_wald = F.sqrt(
        pa * (1.0 - pa) / na + pb * (1.0 - pb) / nb
    )
    diff = pb - pa
    r6 = lambda c: (F.round(c, 6) + 0.0)
    return agg.select(
        "n_a",
        "succ_a",
        "n_b",
        "succ_b",
        r6(pa).alias("rate_a"),
        r6(pb).alias("rate_b"),
        r6(diff).alias("diff"),
        r6(z).alias("z"),
        r6(diff - 1.96 * se_wald).alias("ci_lo"),
        r6(diff + 1.96 * se_wald).alias("ci_hi"),
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    trim: float = 0.05,
    winsorize: bool = False,
) -> DataFrame:
    """Trimmed (or winsorized) mean of a column at corpus scale — the
    robust location estimate for heavy-tailed metrics where the plain
    mean is one outlier away from useless. trim=0.05 drops (trimmed) or
    clamps (winsorized) the values beyond the exact 5th/95th
    percentiles; cut points are EXACT type-1 quantiles via
    `exact_quantiles`' bucketed two-pass (no global sort), and the
    estimate itself is one conditional aggregation after that. Output
    one row: (n BIGINT all non-null rows, n_used BIGINT rows inside
    the cuts — equal to n when winsorizing, lo_cut, hi_cut, mean
    DOUBLE round 6).

    Boundary convention: values EQUAL to a cut point are kept (closed
    interval) — with heavy ties this can retain more than 1−2·trim of
    the mass, which is the standard, well-defined behavior of
    quantile-based trimming on discrete data."""
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull())
    qs = exact_quantiles(nn, value_col, [trim, 1.0 - trim])
    cuts = {r["p"]: r["value"] for r in qs.collect()}
    lo, hi = cuts[trim], cuts[1.0 - trim]
    if winsorize:
        clamped = F.least(F.greatest(v, F.lit(lo)), F.lit(hi))
        agg = nn.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.lit(1)).alias("n_used"),
            F.avg(clamped).alias("__m"),
        )
    else:
        inside = (v >= lo) & (v <= hi)
        agg = nn.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(inside.cast("bigint")).alias("n_used"),
            F.avg(F.when(inside, v)).alias("__m"),
        )
    return agg.select(
        "n",
        "n_used",
        F.lit(float(lo)).alias("lo_cut"),
        F.lit(float(hi)).alias("hi_cut"),
        (F.round(F.col("__m"), 6) + 0.0).alias("mean"),
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    gap: int = 0,
) -> DataFrame:
    """Merge overlapping/adjacent intervals per key — the generic
    `bedtools merge` / calendar-consolidation operator (the relational
    form of the gap-and-island device `roh_runs` and `sessionize` use
    for their domains): closed intervals [start, end] merge when the
    next start is within `gap` of the running maximum end seen so far
    (gap=0: touching intervals [1,5],[5,9] merge; [1,5],[6,9] need
    gap >= 1). Output: key_cols + (start, end, n_merged BIGINT) per
    merged run.

    The running-max-end formulation (not lag(end)) is what makes this
    CORRECT for nested/contained intervals: after [1, 100], [2, 3],
    the next interval [50, 60] must compare against 100, not 3 —
    the classic island-detection bug.

    Plan: one window stack on a single (key)-keyed exchange — ordered
    running max → island flag → cumulative island id — then one
    groupBy((key, island)). Rows with NULL start/end are dropped;
    start > end raises at the first action (assert_true guarded to
    non-null rows, the `interval_overlap_join` convention)."""
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    nn = df.filter(s.isNotNull() & e.isNotNull()).select(
        *key_cols,
        F.assert_true(s <= e, F.lit("merge_intervals: start > end"))
         .alias("__chk"),
        s.alias("__s"),
        e.alias("__e"),
    ).drop("__chk")
    wo = Window.partitionBy(*key_cols).orderBy("__s", "__e")
    prev_max = F.max("__e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = F.when(
        prev_max.isNull() | (F.col("__s") > prev_max + gap), 1
    ).otherwise(0)
    isl = nn.withColumn("__new", flag).withColumn(
        "__isl", F.sum("__new").over(wo)
    )
    return (
        isl.groupBy(*key_cols, "__isl")
        .agg(
            F.min("__s").alias("start"),
            F.max("__e").alias("end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(*key_cols, "start", "end", "n_merged")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve with right censoring — the standard
    nonparametric time-to-event estimate (user churn, session lifetime,
    hardware failure, subscription survival): at each distinct observed
    EVENT time t, with n at risk and d events,

        S(t) = Π_{t_j <= t} (1 − d_j / n_j)

    computed as exp(Σ ln(1 − d/n)) over the DISTINCT-TIMES table, with
    the d = n boundary (everyone at risk dies) handled by a cumulative
    zero-flag — survival is exactly 0.0 from that time on, never a NaN
    from ln(0). Censored observations (event = 0) leave the risk set
    after their time without contributing an event — the whole point
    of KM over a naive empirical CDF.

    Output, one row per distinct time with >= 1 event, time-ascending:
    (t DOUBLE, n_risk, n_events, n_censored BIGINT, survival DOUBLE
    round 6). Rows with NULL duration/event are excluded.

    Plan: one groupBy(duration) collapses the corpus to per-time
    (events, censored) counters — the only data-sized shuffle; the
    at-risk ladder and the product are cumulative windows over the
    distinct-times table, ordered ascending with n_risk derived from
    total − cumulative-preceding (no second scan)."""
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    nn = df.filter(t.isNotNull() & ev.isNotNull())
    per_t = nn.groupBy(t.alias("t")).agg(
        F.sum(F.when(ev != 0, 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(ev == 0, 1).otherwise(0)).cast("bigint").alias("c"),
    )
    tot = per_t.agg(F.sum(F.col("d") + F.col("c")).alias("__N"))
    w_prev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    b = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("__N")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev),
                     F.lit(0)),
    )
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    log_term = F.when(F.col("d") < F.col("n_risk"), F.log(1.0 - frac))
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(
        w_cum
    )
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(w_cum))
    )
    return (
        b.filter(F.col("d") > 0)
        .select(
            "t",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            (F.round(surv, 6) + 0.0).alias("survival"),
        )
        .orderBy("t")
    )


def confusion_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Thresholded binary-classification report in one row — the
    operating-point summary beside `group_auc` (threshold-free) and
    `ks_lift_table` (all deciles): confusion counts and the derived
    metrics at `score >= threshold`:

        precision = TP/(TP+FP)   recall = TP/(TP+FN)
        f1 = 2PR/(P+R)           accuracy = (TP+TN)/n
        mcc = (TP·TN − FP·FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN))

    MCC included because accuracy and F1 both mislead on imbalanced
    corpora (the norm for quality filters) and MCC is the one
    single-number summary that doesn't. Degenerate denominators yield
    NULL, not 0 (an undefined precision is not a zero precision).
    Output: (n, tp, fp, tn, fn BIGINT, precision, recall, f1,
    accuracy, mcc DOUBLE round 6).

    Plan: ONE conditional-sum aggregation (4 counters) collapsing
    map-side; every metric is a projection. NULL score/label rows are
    excluded."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    nn = df.filter(s.isNotNull() & y.isNotNull())
    pred = s >= threshold
    pos = y != 0
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    agg = nn.agg(
        cnt(pred & pos).alias("tp"),
        cnt(pred & ~pos).alias("fp"),
        cnt(~pred & ~pos).alias("tn"),
        cnt(~pred & pos).alias("fn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    tn = F.col("tn").cast("double")
    fn = F.col("fn").cast("double")
    n = tp + fp + tn + fn
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        2.0 * prec * rec / (prec + rec),
    )
    acc = F.when(n > 0, (tp + tn) / n)
    mcc_den = F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    mcc = F.when(mcc_den > 0, (tp * tn - fp * fn) / mcc_den)
    r6 = lambda c: (F.round(c, 6) + 0.0)
    return agg.select(
        (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn"))
        .alias("n"),
        "tp",
        "fp",
        "tn",
        "fn",
        r6(prec).alias("precision"),
        r6(rec).alias("recall"),
        r6(f1).alias("f1"),
        r6(acc).alias("accuracy"),
        r6(mcc).alias("mcc"),
    )


def logistic_fit(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    iters: int = 3,
) -> DataFrame:
    """Logistic regression by IRLS (iteratively reweighted least
    squares — Newton's method on the log-likelihood), the
    quality-classifier trainer in its distributed shape: each iteration
    is ONE partial-aggregated pass collecting the weighted
    normal-equation sums

        μ = σ(Xβ),  w = μ(1−μ),  z = Xβ + (y−μ)/w
        β ← solve(X'WX, X'Wz)

    with the d×d solve on the driver (model-sized, like `ols_fit` and
    the k-means stats). Fixed `iters` Newton steps from β = 0 — on
    separable-ish data 3-5 steps sit within 1e-6 of the optimum, and a
    FIXED count is what makes the whole fit replayable by an unrolled
    SQL oracle (the `g_pagerank` fixed-iteration precedent). Intercept
    always included. Output: long form (term STRING, beta DOUBLE round
    6) + an '(n)' diagnostics row.

    Complete-case rows only; y must be 0/1 (validated in the first
    pass); singular X'WX raises. iters × one-scan cost is the honest
    price of a second-order method — each pass shuffles only the
    d(d+1)/2 + d partial sums."""
    import numpy as np

    if not x_cols:
        raise ValueError("x_cols must be non-empty")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    terms = [F.lit(1.0)] + xs
    names = ["(intercept)"] + list(x_cols)
    d = len(terms)
    beta = np.zeros(d)
    n_rows = None
    for it in range(iters):
        eta = sum(
            (F.lit(float(beta[i])) * terms[i] for i in range(1, d)),
            F.lit(float(beta[0])),
        )
        # clamp mu into [eps, 1−eps] (the standard IRLS guard): when a
        # later iteration saturates eta, mu hits exactly 0/1 and the
        # working-response division would NaN-poison the row — which
        # then silently DROPS from the normal-equation sums instead of
        # raising (round-8 advice). The oracle replays the same clamp.
        mu = 1.0 / (1.0 + F.exp(-eta))
        mu = F.greatest(
            F.lit(1e-10), F.least(F.lit(1.0 - 1e-10), mu)
        )
        wgt = mu * (1.0 - mu)
        z = eta + (y - mu) / wgt
        aggs = [F.count(F.lit(1)).alias("__n")]
        if it == 0:
            aggs.append(
                F.sum(F.when((y != 0.0) & (y != 1.0), 1).otherwise(0))
                .alias("__bad")
            )
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(wgt * terms[i] * terms[j]).alias(f"__xx_{i}_{j}")
                )
            aggs.append(F.sum(wgt * terms[i] * z).alias(f"__xz_{i}"))
        row = nn.agg(*aggs).collect()[0]
        n_rows = row["__n"]
        if n_rows == 0:
            raise ValueError("no complete-case rows to fit")
        if it == 0 and row["__bad"]:
            raise ValueError(
                f"y must be 0/1; found {row['__bad']} other values"
            )
        XX = np.zeros((d, d))
        Xz = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
            Xz[i] = row[f"__xz_{i}"]
        if abs(np.linalg.det(XX)) < 1e-12 * max(1.0, abs(XX).max()) ** d:
            raise ValueError("singular weighted design (collinear features)")
        beta = np.linalg.solve(XX, Xz)
    spark = df.sparkSession
    out = [
        (nm, round(float(b), 6) + 0.0) for nm, b in zip(names, beta)
    ]
    out.append(("(n)", float(n_rows)))
    return spark.createDataFrame(out, "term string, beta double")


def poisson_fit(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    iters: int = 2,
) -> DataFrame:
    """Poisson regression (log link) by IRLS — the count-model third of
    the GLM trio beside `ols_fit` (identity/gaussian) and
    `logistic_fit` (logit/binomial): event counts, defect counts,
    tokens-per-document rates. Each Newton step is ONE
    partial-aggregated pass collecting the weighted normal-equation
    sums

        η = Xβ (clamped to ±30 so exp never overflows),
        μ = e^η,  w = μ,  z = η + (y−μ)/μ
        β ← solve(X'WX, X'Wz)

    with the d×d solve on the driver (model-sized, the ols_fit/
    logistic_fit convention). β starts at the NULL MODEL — intercept
    ln(ȳ), zero slopes (the standard GLM warm start; starting from 0
    with large counts puts the first working response at y−1 and the
    clamp path in play) — so a FIXED `iters` budget lands within 1e-6
    on well-conditioned data and the whole fit replays as an unrolled
    SQL oracle (the g_pagerank / m_logit fixed-iteration precedent).
    Output: long form (term STRING, beta DOUBLE round 6) + '(n)'.

    Complete-case rows only; y must be >= 0 (validated in the init
    pass); singular X'WX raises. iters+1 one-scan passes total; each
    shuffles only the d(d+1)/2 + d partial sums."""
    import numpy as np

    if not x_cols:
        raise ValueError("x_cols must be non-empty")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    nn = df.filter(cond)
    terms = [F.lit(1.0)] + xs
    names = ["(intercept)"] + list(x_cols)
    d = len(terms)
    init = nn.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(y).alias("__sy"),
        F.sum(F.when(y < 0.0, 1).otherwise(0)).alias("__bad"),
    ).collect()[0]
    n_rows = init["__n"]
    if n_rows == 0:
        raise ValueError("no complete-case rows to fit")
    if init["__bad"]:
        raise ValueError(
            f"y must be >= 0; found {init['__bad']} negative values"
        )
    beta = np.zeros(d)
    beta[0] = math.log(max(init["__sy"] / n_rows, 1e-10))
    for _ in range(iters):
        eta = sum(
            (F.lit(float(beta[i])) * terms[i] for i in range(1, d)),
            F.lit(float(beta[0])),
        )
        # clamp eta into [-30, 30]: e^30 ~ 1e13 stays finite and the
        # working-response division stays well-posed even when a round
        # overshoots — the logistic_fit mu-clamp lesson, log-link
        # edition. The oracle replays the same clamp.
        eta = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), eta))
        mu = F.exp(eta)
        z = eta + (y - mu) / mu
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(mu * terms[i] * terms[j]).alias(f"__xx_{i}_{j}")
                )
            aggs.append(F.sum(mu * terms[i] * z).alias(f"__xz_{i}"))
        row = nn.agg(*aggs).collect()[0]
        XX = np.zeros((d, d))
        Xz = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                XX[i, j] = XX[j, i] = row[f"__xx_{i}_{j}"]
            Xz[i] = row[f"__xz_{i}"]
        if abs(np.linalg.det(XX)) < 1e-12 * max(1.0, abs(XX).max()) ** d:
            raise ValueError("singular weighted design (collinear features)")
        beta = np.linalg.solve(XX, Xz)
    spark = df.sparkSession
    out = [
        (nm, round(float(b), 6) + 0.0) for nm, b in zip(names, beta)
    ]
    out.append(("(n)", float(n_rows)))
    return spark.createDataFrame(out, "term string, beta double")


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 0.0,
) -> DataFrame:
    """Leave-one-out target encoding of a categorical column — the
    feature-engineering staple done WITHOUT the leakage that makes the
    naive version overfit: each row's encoding is its category's target
    mean computed over the OTHER rows,

        enc = (Σ_cat y − y_row + s·ȳ) / (n_cat − 1 + s)

    with optional smoothing s toward the global mean (s = 0: pure LOO;
    singleton categories then have no other rows and encode NULL — the
    honest answer; with s > 0 they shrink to the global mean).
    NULL categories form their own group (a missing attribute is a
    real cohort); NULL targets are excluded from the sums but their
    rows still receive an encoding.

    Output: all input columns + (enc DOUBLE round 6). Plan: one
    groupBy(cat) builds (Σy, n) — category-sized — joined back on the
    category key; the global mean is a 1-row broadcast. The LOO
    subtraction is per-row arithmetic, NOT a per-row window (the naive
    window formulation re-sorts every category; the join-back is one
    hash exchange)."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    y = F.col(target_col).cast("double")
    cat = F.col(cat_col)
    stats = df.groupBy(cat.alias("__cat")).agg(
        F.sum(y).alias("__sy"),
        F.count(y).alias("__ny"),
    )
    glob = df.agg(
        (F.sum(y) / F.count(y)).alias("__gmean")
    )
    j = df.join(
        stats, df[cat_col].eqNullSafe(stats["__cat"]), "left"
    ).crossJoin(F.broadcast(glob))
    sy = F.coalesce(F.col("__sy"), F.lit(0.0))
    ny = F.coalesce(F.col("__ny"), F.lit(0)).cast("double")
    own = F.when(y.isNotNull(), y).otherwise(F.lit(0.0))
    own_n = y.isNotNull().cast("int").cast("double")
    denom = ny - own_n + smoothing
    enc = F.when(
        denom > 0,
        (sy - own + smoothing * F.col("__gmean")) / denom,
    )
    return j.select(
        *[df[c] for c in df.columns],
        (F.round(enc, 6) + 0.0).alias("enc"),
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/groupBy-key skew diagnosis in one row — the report to run
    BEFORE shipping a shuffle on this key at 100 TB (the repo's
    `skew_salted_join` is the cure; this is the screen that says
    whether and how much): (n_rows, n_keys, max_key_rows BIGINT,
    top1_share, topk_share DOUBLE — mass in the single / `top_k`
    hottest keys, gini DOUBLE — inequality of the key-size
    distribution, recommended_salt INT = ceil(max_key_rows /
    target_rows_per_task), the salt factor that caps the hottest key's
    per-task rows at the target; 1 = no salting needed).

    NULL keys count as a key (they hash to one partition like any hot
    key — the classic accidental-skew source, and this report is where
    it shows up). Plan: one groupBy(key) collapses the data to the
    key-size table; everything else (top-k TakeOrdered, the Gini rank
    window, the 1-row fold) runs key-sized."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    rw = Window.orderBy(F.desc("__c"), "__k")
    ranked = counts.withColumn("__r", F.row_number().over(rw))
    agg = ranked.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_key_rows"),
        F.sum(F.when(F.col("__r") == 1, F.col("__c")).otherwise(0))
        .alias("__t1"),
        F.sum(F.when(F.col("__r") <= top_k, F.col("__c")).otherwise(0))
        .alias("__tk"),
        F.sum((F.col("__c") * F.col("__r")).cast("double")).alias("__cr"),
    )
    n = F.col("n_rows").cast("double")
    k = F.col("n_keys").cast("double")
    # Gini needs Σ c·(ascending rank) = (K+1)·Σc − Σ c·(desc rank)
    ic = (k + 1.0) * n - F.col("__cr")
    gini = F.when(
        (F.col("n_keys") > 0) & (F.col("n_rows") > 0),
        (2.0 * ic - (k + 1.0) * n) / (k * n),
    )
    salt = F.ceil(
        F.col("max_key_rows").cast("double") / target_rows_per_task
    ).cast("int")
    return agg.select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        (F.round(F.col("__t1") / n, 6) + 0.0).alias("top1_share"),
        (F.round(F.col("__tk") / n, 6) + 0.0).alias("topk_share"),
        (F.round(gini, 6) + 0.0).alias("gini"),
        F.greatest(F.lit(1), salt).alias("recommended_salt"),
    )


def path_ngrams(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    event_col: str,
    n: int = 3,
    top_n: int = 20,
) -> DataFrame:
    """Frequent event paths — the length-n sequential patterns users
    actually walk (the funnel-DISCOVERY tool, where `event_funnel`
    measures a funnel you already hypothesized): consecutive event
    n-grams within each key's ordered stream, counted corpus-wide,
    top_n under the total order (count DESC, path). Output: (path
    STRING 'a>b>c', n_keys BIGINT distinct keys that walked it,
    n_total BIGINT occurrences).

    Paths NEVER cross keys (lead() respects the partition — the
    windowed twin of `transition_counts`' bigram guarantee), and the
    ordering must be total per key (pass a tiebreaker in order_cols or
    ties make the path undefined). Plan: n−1 lead() columns on ONE
    key-keyed window exchange, then one path groupBy; count-distinct
    on the key is the only extra aggregate."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    ev = F.col(event_col)
    parts = [ev] + [F.lead(ev, i).over(w) for i in range(1, n)]
    path = F.concat_ws(">", *parts)
    complete = parts[-1].isNotNull()
    for p in parts[:-1]:
        complete = complete & p.isNotNull()
    grams = df.select(
        F.col(key_col).alias("__k"),
        F.when(complete, path).alias("path"),
    ).filter(F.col("path").isNotNull())
    return (
        grams.groupBy("path")
        .agg(
            F.countDistinct("__k").alias("n_keys"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy(F.desc("n_total"), "path")
        .limit(top_n)
    )


def autocorrelation(
    df: DataFrame,
    value_col: str,
    order_col: str,
    max_lag: int = 10,
) -> DataFrame:
    """Autocorrelation function of an ordered series — the seasonality
    and persistence fingerprint (a daily-seasonal traffic series spikes
    at lag 24; white noise sits inside ±2/√n): for lags 1..max_lag,

        r_k = Σ_{t} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    — the standard biased ACF estimator (denominator over the FULL
    series, which keeps |r_k| ≤ 1 and the sequence positive
    semidefinite; the "unbiased" per-lag denominator does neither).
    Output: (lag INT, n_pairs BIGINT, acf DOUBLE round 6; NULL for a
    constant series — persistence of nothing is undefined) plus the
    lag-0 row (acf exactly 1) as the conventional anchor.

    The input is usually ALREADY aggregated (an hourly count series —
    build it with one groupBy first), so every window here runs over
    the series table, not raw data. One exchange serves the mean
    broadcast, the max_lag lead() columns and the 1-row folds."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    x = F.col(value_col).cast("double")
    nn = df.filter(x.isNotNull() & F.col(order_col).isNotNull())
    mean = nn.agg(F.avg(x).alias("__mu"))
    w = Window.orderBy(order_col)
    leads = nn.crossJoin(F.broadcast(mean)).select(
        (x - F.col("__mu")).alias("__d0"),
        *[
            (F.lead(x, k).over(w) - F.col("__mu")).alias(f"__d{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.sum(F.col("__d0") * F.col("__d0")).alias("__den"),
        F.count(F.lit(1)).alias("__n"),
    ]
    for k in range(1, max_lag + 1):
        aggs += [
            F.sum(F.col("__d0") * F.col(f"__d{k}")).alias(f"__num{k}"),
            F.count(F.col(f"__d{k}")).alias(f"__np{k}"),
        ]
    row = leads.agg(*aggs)
    entries = [
        F.struct(
            F.lit(0).alias("lag"),
            F.col("__n").alias("n_pairs"),
            F.when(F.col("__den") > 0, F.lit(1.0)).alias("acf"),
        )
    ]
    for k in range(1, max_lag + 1):
        entries.append(
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"__np{k}").alias("n_pairs"),
                F.when(
                    F.col("__den") > 0,
                    F.col(f"__num{k}") / F.col("__den"),
                ).alias("acf"),
            )
        )
    return row.select(
        F.explode(F.array(*entries)).alias("e")
    ).select(
        F.col("e.lag").alias("lag"),
        F.col("e.n_pairs").alias("n_pairs"),
        (F.round(F.col("e.acf"), 6) + 0.0).alias("acf"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical labelings of the same items (two annotators, two
    classifier versions, model-vs-heuristic): with observed agreement
    p_o and the chance agreement p_e implied by each rater's marginal
    distribution,

        kappa = (p_o − p_e) / (1 − p_e)

    Output one row: (n BIGINT, po, pe, kappa DOUBLE round 6; NULL
    kappa when p_e = 1 — both raters constant with the same label,
    agreement is vacuous). Rows with a NULL on either side are
    excluded (un-labeled items carry no agreement information).

    Plan: one groupBy(a, b) collapses the items to the confusion
    cells; marginals are window sums over the cells (the
    `mutual_information` device); the final fold is 1-row. p_e is
    Σ_k P_a(k)·P_b(k) computed as a cells-table sum over the DIAGONAL
    candidates — every (k, k) pair of marginals, present or not, via
    joining the two marginal vectors, which are label-sized."""
    a, b = F.col(rater_a_col), F.col(rater_b_col)
    nn = df.filter(a.isNotNull() & b.isNotNull())
    cells = nn.groupBy(
        a.cast("string").alias("__a"), b.cast("string").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    ma = cells.groupBy("__a").agg(F.sum("__c").alias("__na"))
    mb = cells.groupBy("__b").agg(F.sum("__c").alias("__nb"))
    tot = cells.agg(F.sum("__c").alias("__n"))
    agree = cells.filter(F.col("__a") == F.col("__b")).agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__agree")
    )
    pe_cells = ma.join(
        mb, ma["__a"] == mb["__b"]
    ).agg(
        F.coalesce(
            F.sum(F.col("__na").cast("double") * F.col("__nb")),
            F.lit(0.0),
        ).alias("__pesum")
    )
    j = (
        tot.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(pe_cells))
    )
    n = F.col("__n").cast("double")
    po = F.col("__agree") / n
    pe = F.col("__pesum") / (n * n)
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return j.select(
        F.col("__n").alias("n"),
        (F.round(po, 6) + 0.0).alias("po"),
        (F.round(pe, 6) + 0.0).alias("pe"),
        (F.round(kappa, 6) + 0.0).alias("kappa"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimate with right censoring —
    the additive companion of `kaplan_meier` (H(t) estimates
    -ln S(t) but is defined and well-behaved even when a risk set
    empties): at each distinct observed EVENT time,

        H(t) = sum_{t_j <= t} d_j / n_j
        var(H(t)) = sum_{t_j <= t} d_j / n_j^2      (Poisson form)

    Censored observations (event = 0) leave the risk set after their
    time without contributing an event. Rows with NULL duration/event
    are excluded.

    Output, one row per distinct time with >= 1 event, time-ascending:
    (t DOUBLE, n_risk, n_events, n_censored BIGINT, cum_hazard DOUBLE
    round 6, var_hazard DOUBLE round 6).

    Plan: identical to kaplan_meier — one groupBy(duration) collapses
    the corpus to per-time counters (the only data-sized shuffle),
    then cumulative windows over the distinct-times table. The
    cumulative sums run over the SAME ascending order on both engines,
    so they replay bit-for-bit, not just to rounding."""
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    nn = df.filter(t.isNotNull() & ev.isNotNull())
    per_t = nn.groupBy(t.alias("t")).agg(
        F.sum(F.when(ev != 0, 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(ev == 0, 1).otherwise(0)).cast("bigint").alias("c"),
    )
    tot = per_t.agg(F.sum(F.col("d") + F.col("c")).alias("__N"))
    w_prev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    b = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("__N")
        - F.coalesce(
            F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
        ),
    )
    nr = F.col("n_risk").cast("double")
    dd = F.col("d").cast("double")
    haz = F.sum(dd / nr).over(w_cum)
    var = F.sum(dd / (nr * nr)).over(w_cum)
    return (
        b.withColumn("__h", haz)
        .withColumn("__v", var)
        .filter(F.col("d") > 0)
        .select(
            "t",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            F.round(F.col("__h"), 6).alias("cum_hazard"),
            F.round(F.col("__v"), 6).alias("var_hazard"),
        )
        .orderBy("t")
    )


def attribution_report(
    touches: DataFrame,
    conversions: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts_s",
    channel_col: str = "channel",
    conv_id_col: str = "conv_id",
    touch_id_col: str = "touch_id",
    lookback_s: int = 7 * 86400,
) -> DataFrame:
    """Multi-touch marketing attribution — credit each conversion to
    the channels that touched the user within the lookback window,
    under the three standard models at once:

        last-touch  : 1 credit to the latest prior touch
        first-touch : 1 credit to the earliest prior touch
        linear      : 1/n credit to each of the n prior touches

    A touch qualifies when conv_time - lookback_s <= touch_time <
    conv_time for the same user; ties on touch time break by touch id
    (the repo's total-order rule), so last/first are deterministic.
    Conversions with no qualifying touch contribute nothing (report
    them separately by anti-join if needed). Times are epoch-second
    BIGINTs — never raw timestamps.

    Output: one row per credited channel (channel, n_last BIGINT,
    n_first BIGINT, linear DOUBLE round 4), plus the invariant that
    sum(n_last) = sum(n_first) = round(sum(linear)) = # attributed
    conversions.

    Plan shape: ONE user-keyed equi-join with the range predicate as
    a post-join filter (the j_range_events shape — per-user event
    counts bound the pair fan-out, never corpus x corpus), then one
    window over (conversion) for ranks/counts and one channel-keyed
    final agg. At 100 TB the join key should be (user, day-bucket)
    if per-user histories are unbounded; at bounded per-user history
    the plain user key is the smaller shuffle."""
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(time_col).cast("long").alias("__tt"),
        F.col(touch_id_col).alias("__tid"),
        F.col(channel_col).alias("channel"),
    )
    c = conversions.select(
        F.col(user_col).alias("__u"),
        F.col(time_col).cast("long").alias("__ct"),
        F.col(conv_id_col).alias("__cid"),
    )
    j = t.join(c, "__u").filter(
        (F.col("__tt") < F.col("__ct"))
        & (F.col("__tt") >= F.col("__ct") - F.lit(lookback_s))
    )
    w_last = Window.partitionBy("__cid").orderBy(
        F.col("__tt").desc(), F.col("__tid").desc()
    )
    w_first = Window.partitionBy("__cid").orderBy(
        F.col("__tt").asc(), F.col("__tid").asc()
    )
    w_all = Window.partitionBy("__cid")
    r = j.select(
        "channel",
        F.row_number().over(w_last).alias("__rl"),
        F.row_number().over(w_first).alias("__rf"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    return (
        r.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("__rl") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_last"),
            F.sum(F.when(F.col("__rf") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_first"),
            F.round(
                F.sum(F.lit(1.0) / F.col("__n").cast("double")), 4
            ).alias("linear"),
        )
        .orderBy("channel")
    )


def markov_stationary(
    transitions: DataFrame,
    prev_col: str = "prev",
    next_col: str = "next",
    count_col: str = "cnt",
    iters: int = 2,
) -> DataFrame:
    """Stationary-distribution estimate of an event Markov chain by
    fixed-round power iteration over the TRANSITION TABLE — where does
    the user flow settle? The event-sequence cousin of `pagerank`
    (same fixed-budget device), consuming `transition_counts`-shaped
    input (prev, next, cnt):

        pi_0 = uniform over states;  pi ← normalize(pi · P)

    with P the row-normalized count matrix. States = every value seen
    on either side; a state with no outgoing edges drops its mass at
    each step (the renormalization absorbs it — documented, the
    standard "remove absorbing leaks" choice for flow summaries).

    Output: (state, pi DOUBLE round 6), one row per state reachable
    after `iters` steps.

    Plan: everything is vocabulary-sized — P is the count table with
    a row-total window, each round is one state-keyed join + one
    next-keyed partial agg + a 1-row normalization broadcast. No
    matrix literals, no collect: the chain can have a million states.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    t = transitions.select(
        F.col(prev_col).alias("__p"),
        F.col(next_col).alias("__nx"),
        F.col(count_col).cast("double").alias("__c"),
    ).filter(
        F.col("__p").isNotNull()
        & F.col("__nx").isNotNull()
        & (F.col("__c") > 0)
    )
    w = Window.partitionBy("__p")
    P = t.withColumn("__prob", F.col("__c") / F.sum("__c").over(w))
    states = (
        t.select(F.col("__p").alias("state"))
        .unionAll(t.select(F.col("__nx").alias("state")))
        .distinct()
    )
    k = states.count()  # model-sized driver scalar (vocab cardinality)
    if k == 0:
        raise ValueError("no transitions")
    pi = states.select("state", F.lit(1.0 / k).alias("pi"))
    for _ in range(iters):
        stepped = (
            pi.join(P, pi["state"] == P["__p"])
            .groupBy(F.col("__nx").alias("state"))
            .agg(F.sum(F.col("pi") * F.col("__prob")).alias("__m"))
        )
        tot = stepped.agg(F.sum("__m").alias("__t"))
        pi = stepped.join(F.broadcast(tot)).select(
            "state", (F.col("__m") / F.col("__t")).alias("pi")
        )
    return pi.select(
        "state", (F.round(F.col("pi"), 6) + F.lit(0.0)).alias("pi")
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    time_col: str,
    value_col: str,
    n_buckets: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic marketing rollup: per user, days since last event,
    event count, and total value; each dimension cut into
    `n_buckets` equal-population buckets (0 = best recency / highest
    frequency / highest monetary), then segments summarized.

    Bucket = floor((rank − 1) · n_buckets / n_users) from a
    row_number with the user id as tie-break — explicit integer
    arithmetic, NOT ntile() (whose remainder-distribution rule is
    engine-specific). The monetary sum is ROUNDED TO 4dp BEFORE
    ranking so accumulation-order ulps cannot flip a bucket boundary.
    `time_col` must be an epoch-day/second integer.

    Output: one row per non-empty (r_bucket, f_bucket, m_bucket)
    segment (r_bucket, f_bucket, m_bucket INT, n_users BIGINT,
    avg_monetary DOUBLE round 4).

    Plan: one user-keyed agg collapses the corpus; the user table is
    localCheckpoint-ed once (cutting lineage so the rank passes never
    re-aggregate the corpus), then each dimension ranks via the
    `bucketed_row_number` histogram device — bucket-partitioned sort
    tasks, so even a 10⁸-user panel never funnels through one
    partition (the round-8 verdict's honorable-mention fix; the old
    form ran three unpartitioned rank windows). Totals ride a 1-row
    broadcast; one segment-keyed agg closes.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    per_user = (
        df.filter(
            F.col(user_col).isNotNull()
            & F.col(time_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.max(F.col(time_col).cast("long")).alias("__last"),
            F.count(F.lit(1)).cast("long").alias("__freq"),
            F.round(F.sum(F.col(value_col).cast("double")), 4).alias(
                "__mon"
            ),
        )
    )
    tot = per_user.agg(
        F.max("__last").alias("__maxl"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    maxed = (
        per_user.join(F.broadcast(tot))
        .withColumn("__rec", F.col("__maxl") - F.col("__last"))
        .withColumn("__negf", -F.col("__freq"))
        .withColumn("__negm", -F.col("__mon"))
        .localCheckpoint()
    )
    ranked = bucketed_row_number(maxed, "__rec", ["__u"], "__rn_r")
    ranked = bucketed_row_number(ranked, "__negf", ["__u"], "__rn_f")
    ranked = bucketed_row_number(ranked, "__negm", ["__u"], "__rn_m")

    def bucket(rn_col, name):
        return (
            F.floor(
                (F.col(rn_col) - F.lit(1))
                * F.lit(n_buckets)
                / F.col("__n")
            )
            .cast("int")
            .alias(name)
        )

    b = ranked.select(
        "__mon",
        bucket("__rn_r", "r_bucket"),
        bucket("__rn_f", "f_bucket"),
        bucket("__rn_m", "m_bucket"),
    )
    return (
        b.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.avg("__mon"), 4).alias("avg_monetary"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


def longest_streaks(
    df: DataFrame,
    key_col: str,
    time_col: str,
    flag_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Longest consecutive run of flag=1 events per key — the
    gaps-and-islands classic (login streaks, consecutive passing
    runs, unbroken purchase chains): islands form where
    row_number() − flag-partitioned row_number() is constant, so the
    whole statistic is two rank windows on ONE key-ordered exchange
    plus two aggs — no joins, no iteration.

    Ordering is (time, tiebreak) — supply `tiebreak_col` when times
    can tie (the repo's total-order rule). flag must be 0/1; NULL
    key/time/flag rows drop.

    Output: (key, n_events BIGINT, n_flagged BIGINT, longest_streak
    BIGINT — 0 when the key never flags).
    """
    order_cols = [F.col(time_col).asc()]
    if tiebreak_col is not None:
        order_cols.append(F.col(tiebreak_col).asc())
    fc = F.col(flag_col).cast("int")
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(time_col).isNotNull()
        & fc.isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(time_col).alias("__t"),
        *( [F.col(tiebreak_col).alias("__tb")] if tiebreak_col else [] ),
        fc.alias("__f"),
    )
    ocols = [F.col("__t").asc()] + (
        [F.col("__tb").asc()] if tiebreak_col else []
    )
    w_all = Window.partitionBy("__k").orderBy(*ocols)
    w_flag = Window.partitionBy("__k", "__f").orderBy(*ocols)
    isl = base.select(
        "__k",
        "__f",
        (
            F.row_number().over(w_all) - F.row_number().over(w_flag)
        ).alias("__isl"),
    )
    runs = (
        isl.filter(F.col("__f") == 1)
        .groupBy("__k", "__isl")
        .agg(F.count(F.lit(1)).alias("__len"))
    )
    per_key = base.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__f").cast("long").alias("n_flagged"),
    )
    best = runs.groupBy("__k").agg(
        F.max("__len").cast("long").alias("longest_streak")
    )
    return per_key.join(best, "__k", "left").select(
        F.col("__k").alias(key_col),
        "n_events",
        "n_flagged",
        F.coalesce(F.col("longest_streak"), F.lit(0))
        .cast("long")
        .alias("longest_streak"),
    )


def ohlc_candles(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """OHLC candle aggregation — the time-series rollup every metrics /
    market pipeline ships: per (group, time bucket), the opening,
    highest, lowest and closing value plus row count and volume sum.

    Open/close need a TOTAL order inside the bucket: ties on the raw
    timestamp break by VALUE (the repo's total-order rule for top-k),
    so open = value at min (ts, value) — earliest observation, lowest
    value on a timestamp collision — deterministically on both
    engines. `time_col` must be an epoch-second BIGINT (pre-convert
    timestamps — the registry's no-raw-timestamps rule).

    Output: (*group_cols, bucket_start BIGINT, n BIGINT, open, high,
    low, close DOUBLE, volume DOUBLE round 4), bucket-ascending.

    Plan: ONE partial-aggregated groupBy — open/close are min/max over
    (ts, value) STRUCTS (Spark orders structs lexicographically, so
    the extremes carry their value along; no window, no second pass).
    """
    ts = F.col(time_col).cast("long")
    v = F.col(value_col).cast("double")
    base = df.filter(ts.isNotNull() & v.isNotNull()).select(
        *group_cols,
        (F.floor(ts / bucket_seconds) * bucket_seconds).alias(
            "bucket_start"
        ),
        ts.alias("__t"),
        v.alias("__v"),
    )
    pair = F.struct(F.col("__t"), F.col("__v"))
    g = base.groupBy(*group_cols, "bucket_start").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(pair).alias("__first"),
        F.max(pair).alias("__last"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.round(F.sum("__v"), 4).alias("volume"),
    )
    return g.select(
        *group_cols,
        "bucket_start",
        "n",
        F.col("__first.__v").alias("open"),
        "high",
        "low",
        F.col("__last.__v").alias("close"),
        "volume",
    ).orderBy(*group_cols, "bucket_start")


def twap(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average — the irregular-sampling mean a plain AVG
    gets wrong (a value held for an hour must weigh 60x one held for a
    minute): each observation weighs its holding interval to the NEXT
    observation; the last observation carries no forward interval and
    drops from the weighting (the standard last-tick convention).

        twap = sum v_t (t_next - t) / (t_max - t_min)

    Ordering ties on the timestamp break by VALUE (total-order rule:
    zero-length intervals make permutations of a timestamp collision
    sum identically once the order is fixed). `time_col` must be an
    epoch-second BIGINT.

    Output: (*group_cols, n BIGINT, span_sec BIGINT, twap DOUBLE
    round 6); NULL twap when the group has < 2 observations or zero
    span.

    Plan: one group-partitioned lead window + one agg on the same
    exchange (the durbin_watson shape).
    """
    ts = F.col(time_col).cast("long")
    v = F.col(value_col).cast("double")
    base = df.filter(ts.isNotNull() & v.isNotNull()).select(
        *group_cols, ts.alias("__t"), v.alias("__v")
    )
    w = Window.partitionBy(*group_cols).orderBy("__t", "__v")
    d = base.select(
        *group_cols,
        "__t",
        "__v",
        (F.lead("__t", 1).over(w) - F.col("__t")).alias("__dt"),
    )
    g = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.max("__t") - F.min("__t")).cast("long").alias("span_sec"),
        F.sum(
            F.col("__v") * F.col("__dt").cast("double")
        ).alias("__wsum"),
    )
    ok = (F.col("n") >= 2) & (F.col("span_sec") > 0)
    return g.select(
        *group_cols,
        "n",
        "span_sec",
        (
            F.round(
                F.when(
                    ok,
                    F.col("__wsum")
                    / F.col("span_sec").cast("double"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("twap"),
    )


def rmst(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    tau: float,
) -> DataFrame:
    """Restricted mean survival time (Royston & Parmar 2013 usage; the
    integral the KM curve carries implicitly) — the average survival
    time UP TO horizon tau, i.e. the area under the `kaplan_meier`
    step curve on [0, tau]. The clinically-honest scalar when hazards
    cross and a single hazard ratio misleads; in product terms: the
    expected retained lifetime within the first tau periods.

    Same ladder as `kaplan_meier` (per-time counters, cumulative
    at-risk window, exp(sum ln) product with the d = n zero pin), then
    one lead() segment fold: RMST = sum S(t_i) * (t_{i+1} - t_i) over
    the step segments, with the initial [0, t_first) segment at
    S = 1 and the last segment clipped at tau. A time-0 event orders
    AFTER the synthetic start row (survival DESC tie-break), so its
    segment carries the post-event survival.

    Output: ONE row (tau DOUBLE, n BIGINT, n_events BIGINT, rmst
    DOUBLE round 6).
    """
    if tau <= 0:
        raise ValueError("tau must be > 0")
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    nn = df.filter(t.isNotNull() & ev.isNotNull())
    per_t = nn.groupBy(t.alias("t")).agg(
        F.sum(F.when(ev != 0, 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(ev == 0, 1).otherwise(0)).cast("bigint").alias("c"),
    )
    tot = per_t.agg(F.sum(F.col("d") + F.col("c")).alias("__N"))
    w_prev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    b = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("__N")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev),
                     F.lit(0)),
    )
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    log_term = F.when(F.col("d") < F.col("n_risk"), F.log(1.0 - frac))
    hit_zero = F.max((F.col("d") == F.col("n_risk")).cast("int")).over(
        w_cum
    )
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(w_cum))
    )
    ladder = b.filter(
        (F.col("d") > 0) & (F.col("t") <= F.lit(float(tau)))
    ).select(
        "t",
        surv.alias("__s"),
        F.col("__N").alias("__n"),
        F.col("d").alias("__d"),
    )
    spark = df.sparkSession
    init = spark.createDataFrame(
        [(0.0, 1.0, None, None)],
        "t double, __s double, __n long, __d long",
    )
    rows = init.unionAll(
        ladder.select(
            "t", "__s", F.col("__n").cast("long"), F.col("__d")
        )
    )
    w = Window.orderBy(F.col("t").asc(), F.col("__s").desc())
    seg = rows.select(
        "__n",
        "__d",
        (
            (
                F.coalesce(
                    F.lead("t", 1).over(w), F.lit(float(tau))
                )
                - F.col("t")
            )
            * F.col("__s")
        ).alias("__area"),
    )
    # n comes from the 1-row per_t total, NOT max(__n) over ladder rows:
    # with no event time <= tau the ladder is empty (only the synthetic
    # start row survives, __n null) and a non-empty cohort would report
    # n = 0.
    g = seg.agg(
        F.coalesce(F.sum("__d"), F.lit(0)).cast("long").alias(
            "n_events"
        ),
        F.sum("__area").alias("__rmst"),
    ).crossJoin(F.broadcast(tot))
    return g.select(
        F.lit(float(tau)).alias("tau"),
        F.coalesce(F.col("__N"), F.lit(0)).cast("long").alias("n"),
        "n_events",
        (F.round(F.col("__rmst"), 6) + F.lit(0.0)).alias("rmst"),
    )


def aalen_johansen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under COMPETING RISKS — the
    estimator `kaplan_meier` users actually need when more than one
    event type ends a subject's follow-up (churned-to-competitor vs
    churned-to-cancellation; died-of-A vs died-of-B): 1 − KM per cause
    OVERSTATES each cause's incidence because it treats the other
    causes as censoring; AJ attributes each event time's hazard to its
    cause against the ALL-CAUSE survival:

        CIF_k(t) = sum_{t_j <= t} S(t_j-) * d_kj / n_j

    with S the all-cause KM (the d = n zero pin included) and S(t-)
    its value strictly before t_j. event = 0 means censored, any
    positive integer is a cause id. The estimator satisfies
    S(t) + sum_k CIF_k(t) = 1 at every event time — pinned by test.

    Output, one row per (event time, cause with d > 0),
    (t DOUBLE, cause INT, n_risk BIGINT, n_events BIGINT, cif DOUBLE
    round 6), (cause, t)-ascending.

    Plan: the kaplan_meier ladder (one groupBy(duration) collapse,
    cumulative windows over distinct times) + one (time, cause)-keyed
    count joined back + a cause-partitioned cumulative sum over the
    distinct-time cells — no raw-row window anywhere.
    """
    t = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("int")
    nn = df.filter(t.isNotNull() & ev.isNotNull())
    per_t = nn.groupBy(t.alias("t")).agg(
        F.sum(F.when(ev > 0, 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(ev == 0, 1).otherwise(0)).cast("bigint").alias("c"),
    )
    tot = per_t.agg(F.sum(F.col("d") + F.col("c")).alias("__N"))
    w_prev = (
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    )
    b = per_t.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("__N")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev),
                     F.lit(0)),
    )
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    log_term = F.when(F.col("d") < F.col("n_risk"), F.log(1.0 - frac))
    hit_zero_prev = F.coalesce(
        F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_prev),
        F.lit(0),
    )
    s_prev = F.when(hit_zero_prev == 1, F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.sum(log_term).over(w_prev), F.lit(0.0)))
    )
    ladder = b.select(
        "t", "n_risk", s_prev.alias("__sprev")
    )
    tc = (
        nn.filter(ev > 0)
        .groupBy(t.alias("t"), ev.alias("cause"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    j = tc.join(ladder, "t").withColumn(
        "__term",
        F.col("__sprev")
        * F.col("n_events").cast("double")
        / F.col("n_risk").cast("double"),
    )
    w_cif = (
        Window.partitionBy("cause")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "t",
        F.col("cause").cast("int").alias("cause"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "n_events",
        (
            F.round(F.sum("__term").over(w_cif), 6) + F.lit(0.0)
        ).alias("cif"),
    ).orderBy("cause", "t")


def geo_near_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_id: str = "id_a",
    right_id: str = "id_b",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All pairs within `radius_km` great-circle distance — the
    spatial member of the banded-join family (range_join /
    interval_overlap_join / ld_r2's position bins, on a sphere):
    NEVER a theta join. Both sides bucket into a latitude-band grid
    whose per-band longitude cell width is the EXACT chord bound
    2·asin(sin(σ/2)/cos φ) at the band window's minimum cos(lat) (wider cells near the poles — extra
    candidates, never a missed pair); the left side probes its 3x3
    neighborhood (longitude wrapped at the antimeridian), candidates
    equi-join on (lat_cell, lon_cell), and the exact haversine
    (R = 6371.0088 km) filters.

        hav = 2 R asin(sqrt(sin²(dφ/2) + cosφ1 cosφ2 sin²(dλ/2)))

    |lat| above `max_abs_lat` raises (the lon-cell width diverges at
    the poles; clamp or reproject polar data first — raise, don't
    silently mis-bucket). `left_id`/`right_id` name each side's id
    column. Output: (id_a, id_b, distance_km DOUBLE round 6), each
    qualifying cross pair once.

    Scale: shuffle = candidates within 3x3 cells, O(density x area),
    never |L| x |R|; the plan guard pins the equi-join shape.
    """
    if radius_km <= 0:
        raise ValueError("radius_km must be > 0")
    import math

    R = 6371.0088
    sigma = radius_km / R  # central angle of the radius
    # |dφ| <= σ exactly on the sphere; |dλ| <= 2 asin(sin(σ/2)/cos φ)
    # (from the haversine identity with the window's max |lat| — the
    # EXACT bound; the naive σ/cos φ undershoots by O(σ² tan²φ) and
    # loses pairs near the clamp latitude)
    dlat = math.degrees(sigma)
    sin_half = math.sin(sigma / 2.0)

    def prep(df, id_col, probe: bool):
        la = F.col(lat_col).cast("double")
        lo = F.col(lon_col).cast("double")
        d = df.select(
            F.col(id_col).alias("__id"), la.alias("__la"), lo.alias("__lo")
        ).filter(F.col("__la").isNotNull() & F.col("__lo").isNotNull())
        band = F.floor((F.col("__la") + 90.0) / F.lit(dlat)).cast("int")
        d = d.withColumn("__band", band)
        # conservative per-band lon cell width: min cos over the band
        # AND its two neighbors (a pair in adjacent bands spans that
        # 3-band window, so its longitude gap is <= this band's cell
        # width and the +-1 probe is provably complete)
        edge1 = F.abs((F.col("__band") - 1) * F.lit(dlat) - 90.0)
        edge2 = F.abs((F.col("__band") + 2) * F.lit(dlat) - 90.0)
        min_cos = F.cos(F.radians(F.greatest(edge1, edge2)))
        dlon = F.degrees(
            2 * F.asin(F.least(F.lit(sin_half) / min_cos, F.lit(1.0)))
        )
        # UNIFORM circular grid: floor (not ceil) keeps every cell at
        # least dlon wide, so a pair within dlon is never 2 cells
        # apart across the antimeridian seam (the ceil grid's partial
        # last cell breaks exactly that)
        ncells = F.greatest(
            F.floor(F.lit(360.0) / dlon).cast("int"), F.lit(1)
        )
        cell = F.pmod(
            F.floor(
                (F.col("__lo") + 180.0) / (F.lit(360.0) / ncells)
            ).cast("int"),
            ncells,
        )
        d = d.withColumn("__nc", ncells)
        if probe:
            d = d.select(
                "__id", "__la", "__lo", "__band", "__nc",
                F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias(
                    "__bi"
                ),
                cell.alias("__c0"),
            )
            # neighbor band: its OWN ncells prices the lon cell there
            nb = F.col("__band") + F.col("__bi")
            edge1n = F.abs((nb - 1) * F.lit(dlat) - 90.0)
            edge2n = F.abs((nb + 2) * F.lit(dlat) - 90.0)
            min_cos_n = F.cos(F.radians(F.greatest(edge1n, edge2n)))
            dlon_n = F.degrees(
                2
                * F.asin(
                    F.least(F.lit(sin_half) / min_cos_n, F.lit(1.0))
                )
            )
            ncells_n = F.greatest(
                F.floor(F.lit(360.0) / dlon_n).cast("int"), F.lit(1)
            )
            cell_n = F.floor(
                (F.col("__lo") + 180.0) / (F.lit(360.0) / ncells_n)
            ).cast("int")
            d = d.select(
                "__id", "__la", "__lo",
                nb.alias("__band"),
                F.explode(
                    F.array(F.lit(-1), F.lit(0), F.lit(1))
                ).alias("__ci"),
                cell_n.alias("__cn"),
                ncells_n.alias("__ncn"),
            ).select(
                "__id", "__la", "__lo", "__band",
                F.pmod(F.col("__cn") + F.col("__ci"), F.col("__ncn"))
                .alias("__cell"),
            )
        else:
            d = d.select(
                "__id", "__la", "__lo", "__band", cell.alias("__cell")
            )
        return d

    # validate the lat clamp with one cheap agg on each side
    for df, side in ((left, "left"), (right, "right")):
        mx = df.agg(
            F.max(F.abs(F.col(lat_col).cast("double"))).alias("m")
        ).collect()[0]["m"]
        if mx is not None and mx > max_abs_lat:
            raise ValueError(
                f"geo_near_join: {side} |lat| up to {mx:.3f} exceeds "
                f"max_abs_lat={max_abs_lat} — longitude cells diverge "
                "at the poles; clamp or handle polar points separately"
            )
    la = prep(left, left_id, probe=True)
    rb = prep(right, right_id, probe=False).select(
        F.col("__id").alias("__idb"),
        F.col("__la").alias("__lab"),
        F.col("__lo").alias("__lob"),
        "__band",
        "__cell",
    )
    j = la.join(rb, ["__band", "__cell"])
    dphi = F.radians(F.col("__lab") - F.col("__la")) / 2
    dlmb = F.radians(F.col("__lob") - F.col("__lo")) / 2
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.col("__la")))
        * F.cos(F.radians(F.col("__lab")))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    dist = 2 * F.lit(6371.0088) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))
    return (
        j.withColumn("__dist", dist)
        .filter(F.col("__dist") <= F.lit(float(radius_km)))
        .select(
            F.col("__id").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.round("__dist", 6).alias("distance_km"),
        )
        .distinct()
    )


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    point_id: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id: str = "poly_id",
    vertices_col: str = "vertices",
) -> DataFrame:
    """Point-in-polygon containment join — "which zone/geofence/
    census tract is each point in?", the planar-geometry member of the
    banded-join family: NEVER points × polygons. `vertices` is an
    ARRAY<STRUCT<x DOUBLE, y DOUBLE>> ring (closing edge implied from
    last back to first vertex).

    Plan: every polygon EXPLODES onto the grid cells its bounding box
    covers (a polygon touches few cells at a sane `cell_size` — size
    cells near the typical polygon diameter); points map to their one
    cell; candidates equi-join on the cell; the EXACT even-odd
    ray-cast (crossing number, rightward ray) verifies as one HOF fold
    over the vertex ring — pure column arithmetic, no Python, and the
    fold is a scalar sum (replayable in SQL without struct
    accumulators). Output: (point_id, poly_id) for every containing
    polygon (overlapping polygons emit multiple rows).

    Boundary convention: even-odd with half-open edge treatment
    ((y1 > py) != (y2 > py)) — points exactly ON an edge or vertex are
    implementation-defined, the standard ray-cast caveat; nudge or
    snap boundary data upstream if edges carry meaning."""
    if cell_size <= 0:
        raise ValueError("cell_size must be > 0")
    vx = F.col(vertices_col)
    minx = F.array_min(F.transform(vx, lambda v: v["x"]))
    maxx = F.array_max(F.transform(vx, lambda v: v["x"]))
    miny = F.array_min(F.transform(vx, lambda v: v["y"]))
    maxy = F.array_max(F.transform(vx, lambda v: v["y"]))
    cs = F.lit(float(cell_size))
    poly_cells = polygons.select(
        F.col(poly_id).alias("__pid"),
        vx.alias("__verts"),
        F.explode(
            F.sequence(
                F.floor(minx / cs).cast("long"),
                F.floor(maxx / cs).cast("long"),
            )
        ).alias("__cx"),
        (
            F.sequence(
                F.floor(miny / cs).cast("long"),
                F.floor(maxy / cs).cast("long"),
            )
        ).alias("__cys"),
    ).select(
        "__pid", "__verts", "__cx",
        F.explode("__cys").alias("__cy"),
    )
    px = F.col(x_col).cast("double")
    py = F.col(y_col).cast("double")
    pts = points.select(
        F.col(point_id).alias("__ptid"),
        px.alias("__px"),
        py.alias("__py"),
        F.floor(px / cs).cast("long").alias("__cx"),
        F.floor(py / cs).cast("long").alias("__cy"),
    )
    cand = pts.join(poly_cells, on=["__cx", "__cy"])
    # crossing number: pair each vertex with its successor (ring
    # closure via modular index), count rightward-ray crossings
    n = F.size("__verts")
    crossings = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                F.element_at("__verts", i).alias("a"),
                F.element_at(
                    "__verts", (i % F.size("__verts")) + 1
                ).alias("b"),
            ),
        ),
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            (
                (e["a"]["y"] > F.col("__py"))
                != (e["b"]["y"] > F.col("__py"))
            )
            & (
                F.col("__px")
                < (e["b"]["x"] - e["a"]["x"])
                * (F.col("__py") - e["a"]["y"])
                / (e["b"]["y"] - e["a"]["y"])
                + e["a"]["x"]
            ),
            1,
        ).otherwise(0),
    )
    return (
        cand.withColumn("__cross", crossings)
        .filter(F.col("__cross") % 2 == 1)
        .select(
            F.col("__ptid").alias(point_id),
            F.col("__pid").alias(poly_id),
        )
    )


def geo_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    radius_km: float,
    left_id: str = "id_a",
    right_id: str = "id_b",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """Radius-bounded k-nearest-neighbor geo join — "the k closest
    stores/sensors/cells within r km of each point", the per-point
    ranked refinement of `geo_near_join`: the banded candidate join
    supplies every in-radius pair (never all-pairs), then one rank
    window per left point keeps the k nearest with the deterministic
    total order (distance_km ASC, right id ASC — equal-distance ties
    never depend on partitioning). Self-pairs (same id on both sides)
    are excluded.

    BOUNDED-search contract: a point with fewer than k in-radius
    neighbors returns fewer rows — by design (the radius is the
    business rule; exact UNbounded kNN needs expanding-ring probes and
    is a different cost class). Output: (id_a, id_b,
    distance_km DOUBLE round 6, rank INT 1-based).

    Plan: geo_near_join's lat-band grid + 3x3 equi-join + haversine
    verify, then ONE window partitioned by id_a — per-point candidate
    lists, never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = geo_near_join(
        left, right, radius_km,
        left_id=left_id, right_id=right_id,
        lat_col=lat_col, lon_col=lon_col, max_abs_lat=max_abs_lat,
    ).filter(F.col("id_a") != F.col("id_b"))
    w = Window.partitionBy("id_a").orderBy(
        F.col("distance_km").asc(), F.col("id_b").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def morans_i(
    points: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    value_col: str = "value",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Moran's I spatial autocorrelation (Moran 1950) — do nearby
    points carry similar values? THE first statistic run after any
    spatial join (`geo_near_join` supplies the neighbor pairs):

        I = (n / W) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
                    / sum_i (x_i - xbar)²,      E[I] = -1/(n-1)

    with binary symmetric weights (each unordered neighbor pair
    counts twice in W, the standard convention). Output: ONE row
    (n BIGINT, w_sum BIGINT, i DOUBLE round 6, e_i DOUBLE round 6);
    NULL when n < 2, no pairs, or zero variance.

    Plan: one moment agg over points (broadcast 1-row), one broadcast
    join of values onto the pair relation + a 1-row fold — cost is
    the pair table, which the banded geo join already bounded.
    """
    vc = F.col(value_col).cast("double")
    pts = points.select(
        F.col(id_col).alias("__id"), vc.alias("__v")
    ).filter(F.col("__v").isNotNull())
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__v").alias("__m"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    sym = pairs.select(
        F.col(pair_a).alias("__a"), F.col(pair_b).alias("__b")
    ).filter(F.col("__a") != F.col("__b"))
    sym = sym.unionAll(
        sym.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    ).distinct()
    j = (
        sym.join(
            pts.select(
                F.col("__id").alias("__a"), F.col("__v").alias("__va")
            ),
            "__a",
        )
        .join(
            pts.select(
                F.col("__id").alias("__b"), F.col("__v").alias("__vb")
            ),
            "__b",
        )
        .crossJoin(F.broadcast(mom))
    )
    # n/mean/sumsq come from the broadcast moment row AFTER the pair
    # fold: an empty neighbor relation folds to w_sum=0 with NULL
    # max()s, which used to null the documented-BIGINT n column —
    # only the statistics may be NULL on empty pairs (round-10 ADVICE).
    g = j.agg(
        F.count(F.lit(1)).cast("long").alias("w_sum"),
        F.sum(
            (F.col("__va") - F.col("__m")) * (F.col("__vb") - F.col("__m"))
        ).alias("__cross"),
    ).crossJoin(F.broadcast(mom.withColumnsRenamed(
        {"__m": "__mm", "__q": "__qq"}
    )))
    nd = F.col("n").cast("double")
    ss = F.col("__qq") - nd * F.col("__mm") * F.col("__mm")
    i_stat = (
        nd / F.col("w_sum").cast("double") * F.col("__cross") / ss
    )
    ok = (F.col("n") >= 2) & (F.col("w_sum") > 0) & (ss > 0)
    return g.select(
        "n",
        "w_sum",
        (F.round(F.when(ok, i_stat), 6) + F.lit(0.0)).alias("i"),
        (
            F.round(F.when(ok, F.lit(-1.0) / (nd - 1)), 6) + F.lit(0.0)
        ).alias("e_i"),
    )


def dbscan_geo(
    points: DataFrame,
    radius_km: float,
    min_pts: int,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """DBSCAN density clustering on the sphere (Ester et al. 1996) —
    composed entirely from machinery this repo already trusts: the
    eps-neighborhood graph comes from `geo_near_join` (banded
    equi-join, never all-pairs), core points are one degree agg
    (a point counts ITSELF toward min_pts, the original definition),
    clusters are `connected_components` over the core-core edges, and
    border points attach to the MINIMUM cluster label among their
    core neighbors (a total order — DBSCAN's border assignment is
    order-dependent in the original algorithm; min-label makes it a
    pure function of the input). Noise keeps cluster NULL.

    Output: (id, role STRING in core|border|noise, cluster BIGINT,
    NULL for noise).

    Plan: the geo join's banded shuffle + one degree agg + CC's
    per-round pair-graph shuffles + two broadcast-sized joins (core
    set and labels are cluster-population-sized).
    """
    from pandasvcf_spark.operators.dedup import connected_components

    pts = points.select(
        F.col(id_col).alias("id"), F.col(lat_col), F.col(lon_col)
    )
    nbrs = geo_near_join(
        pts, pts, radius_km, "id", "id", lat_col, lon_col
    ).filter(F.col("id_a") != F.col("id_b"))
    deg = nbrs.groupBy(F.col("id_a").alias("id")).agg(
        (F.count(F.lit(1)) + 1).alias("__deg")  # self counts
    )
    core = deg.filter(F.col("__deg") >= min_pts).select("id")
    core_edges = (
        nbrs.join(core.select(F.col("id").alias("id_a")), "id_a")
        .join(core.select(F.col("id").alias("id_b")), "id_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    comp = connected_components(core_edges)
    # isolated cores (no core neighbor) form singleton clusters
    core_lbl = (
        core.join(comp.select(F.col("id"), "component"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
        )
    )
    border = (
        nbrs.join(
            core_lbl.select(
                F.col("id").alias("id_b"), F.col("cluster")
            ),
            "id_b",
        )
        .join(core.select(F.col("id").alias("id_a")), "id_a", "left_anti")
        .groupBy(F.col("id_a").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    out = (
        pts.select("id")
        .join(
            core_lbl.select("id", "cluster").withColumn(
                "role", F.lit("core")
            ),
            "id",
            "left",
        )
        .join(
            border.select(
                F.col("id"), F.col("cluster").alias("__bc")
            ).withColumn("__brole", F.lit("border")),
            "id",
            "left",
        )
    )
    return out.select(
        "id",
        F.coalesce(
            F.col("role"), F.col("__brole"), F.lit("noise")
        ).alias("role"),
        F.coalesce(F.col("cluster"), F.col("__bc"))
        .cast("long")
        .alias("cluster"),
    )


def weighted_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    weight: str = "quadratic",
) -> DataFrame:
    """Weighted Cohen's kappa (Cohen 1968) — chance-corrected
    agreement for ORDINAL ratings, where a 1-step disagreement should
    cost less than a 4-step one (the plain `cohens_kappa` treats both
    as total disagreement):

        kappa_w = 1 - sum O_ij v_ij / sum E_ij v_ij
        v_ij = (i - j)²  (quadratic, the default)  or  |i - j|

    with O the observed cell proportions and E the marginal-product
    chance table. The quadratic form equals the ICC on the ratings —
    the reason it is the reporting standard. Ratings must be numeric
    (ordinal); NULL-on-either-side rows drop. Output: ONE row
    (n BIGINT, obs_dis, exp_dis, kappa_w DOUBLE round 6; NULL when
    the expected disagreement is 0 — both raters constant).

    Plan: the `cohens_kappa` device with a label-sized marginal CROSS
    grid for E (labels x labels, broadcast) — the corpus collapses to
    confusion cells in one exchange."""
    if weight not in ("quadratic", "linear"):
        raise ValueError(f"unknown weight {weight!r}")
    a = F.col(rater_a_col).cast("double")
    b = F.col(rater_b_col).cast("double")
    nn = df.filter(a.isNotNull() & b.isNotNull())
    cells = nn.groupBy(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )

    def v(x, y):
        d = F.abs(x - y)
        return d * d if weight == "quadratic" else d

    tot = cells.agg(F.sum("__c").alias("__n"))
    obs = cells.agg(
        F.sum(F.col("__c") * v(F.col("__a"), F.col("__b"))).alias(
            "__obs"
        )
    )
    ma = cells.groupBy("__a").agg(F.sum("__c").alias("__na"))
    mb = cells.groupBy("__b").agg(F.sum("__c").alias("__nb"))
    expd = ma.crossJoin(F.broadcast(mb)).agg(
        F.sum(
            F.col("__na") * F.col("__nb") * v(F.col("__a"), F.col("__b"))
        ).alias("__exp")
    )
    j = (
        tot.crossJoin(F.broadcast(obs)).crossJoin(F.broadcast(expd))
    )
    n = F.col("__n")
    obs_p = F.col("__obs") / n
    exp_p = F.col("__exp") / (n * n)
    kw = F.when(exp_p > 0, 1.0 - obs_p / exp_p)
    return j.select(
        F.col("__n").cast("long").alias("n"),
        (F.round(obs_p, 6) + F.lit(0.0)).alias("obs_dis"),
        (F.round(exp_p, 6) + F.lit(0.0)).alias("exp_dis"),
        (F.round(kw, 6) + F.lit(0.0)).alias("kappa_w"),
    )


def gearys_c(
    points: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    value_col: str = "value",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Geary's C spatial autocorrelation (Geary 1954) — the
    local-difference companion of `morans_i` (Moran is a spatial
    covariance, C a spatial variogram; C < 1 clustered, C > 1
    dispersed, E[C] = 1):

        C = (n - 1) sum_ij w_ij (x_i - x_j)²
            / (2 W sum_i (x_i - xbar)²)

    Same binary symmetric weights and the same plan as morans_i (one
    moment agg + one pair-sized fold). Output: ONE row (n BIGINT,
    w_sum BIGINT, c DOUBLE round 6, e_c DOUBLE round 6 = 1); NULL
    when n < 2, no pairs, or zero variance."""
    vc = F.col(value_col).cast("double")
    pts = points.select(
        F.col(id_col).alias("__id"), vc.alias("__v")
    ).filter(F.col("__v").isNotNull())
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__v").alias("__m"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    sym = pairs.select(
        F.col(pair_a).alias("__a"), F.col(pair_b).alias("__b")
    ).filter(F.col("__a") != F.col("__b"))
    sym = sym.unionAll(
        sym.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    ).distinct()
    j = (
        sym.join(
            pts.select(
                F.col("__id").alias("__a"), F.col("__v").alias("__va")
            ),
            "__a",
        )
        .join(
            pts.select(
                F.col("__id").alias("__b"), F.col("__v").alias("__vb")
            ),
            "__b",
        )
    )
    # moments join AFTER the pair fold (see morans_i): an empty
    # neighbor relation must still report the documented n BIGINT
    g = j.agg(
        F.count(F.lit(1)).cast("long").alias("w_sum"),
        F.sum(
            (F.col("__va") - F.col("__vb"))
            * (F.col("__va") - F.col("__vb"))
        ).alias("__dd"),
    ).crossJoin(F.broadcast(mom.withColumnsRenamed(
        {"__m": "__mm", "__q": "__qq"}
    )))
    nd = F.col("n").cast("double")
    ss = F.col("__qq") - nd * F.col("__mm") * F.col("__mm")
    c_stat = (
        (nd - 1)
        * F.col("__dd")
        / (2 * F.col("w_sum").cast("double") * ss)
    )
    ok = (F.col("n") >= 2) & (F.col("w_sum") > 0) & (ss > 0)
    return g.select(
        "n",
        "w_sum",
        (F.round(F.when(ok, c_stat), 6) + F.lit(0.0)).alias("c"),
        (F.round(F.when(ok, F.lit(1.0)), 6) + F.lit(0.0)).alias("e_c"),
    )


def holt_winters_last(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[Column | str],
    value_col: str,
    m: int = 4,
    alpha: float = 0.4,
    beta: float = 0.3,
    gamma: float = 0.2,
    max_key_rows: int | None = 1_000_000,
) -> DataFrame:
    """Per-key additive Holt-Winters smoothing, final state (Winters
    1960) — `holt_linear_last` upgraded with the seasonal component,
    completing the forecasting ladder (EWMA → Holt → Holt-Winters):

        l_t = α (y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β (l_t − l_{t−1}) + (1−β) b_{t−1}
        s_t = γ (y_t − l_{t−1} − b_{t−1}) + (1−γ) s_{t−m}
        forecast(+1) = l_T + b_T + s_{T+1−m}

    Standard two-season init: l_m = mean(y_1..y_m), b_m =
    (mean(y_{m+1}..y_{2m}) − l_m)/m, s_j = y_j − l_m; the fold then
    consumes y_{m+1}..y_n. Keys with fewer than 2m observations emit
    NULL state (the init is under-determined) but keep their count.

    `order_cols` must be a total order (the ewma_last contract — fold
    order decides the floats). Output: (key, n_events BIGINT, level,
    trend, forecast DOUBLE round 4).

    Plan: the holt_linear_last shape — one groupBy(key) collecting the
    key's ordered values + one HOF fold whose STRUCT accumulator now
    carries (level, trend, season ARRAY[m], season index); the season
    array updates by slice surgery, so state stays m+3 doubles per key
    and the whole recursion is a pure column expression — never a
    window re-scan, never applyInPandas. The per-key array contract
    is ENFORCED via `max_key_rows` (the ewma_last tripwire)."""
    if m < 2:
        raise ValueError(f"season length m must be >= 2, got {m}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{nm} must be in (0, 1], got {v}")
    _assert_key_series_bound(
        df, key_col, value_col, "holt_winters_last", max_key_rows
    )
    ordered = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.struct(
                *[
                    (F.col(c) if isinstance(c, str) else c).alias(f"o{i}")
                    for i, c in enumerate(order_cols)
                ],
                F.col(value_col).cast("double").alias("x"),
            ).alias("e"),
        )
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("e")).alias("evs"))
    )
    xs = F.transform("evs", lambda e: e["x"])
    a, b, g = F.lit(float(alpha)), F.lit(float(beta)), F.lit(float(gamma))
    one_a = F.lit(1.0 - float(alpha))
    one_b = F.lit(1.0 - float(beta))
    one_g = F.lit(1.0 - float(gamma))
    # try_element_at: out-of-range positions NULL-poison the state for
    # short keys instead of raising under ANSI; the ok mask hides them
    mean1 = sum(
        (F.try_element_at(xs, F.lit(j)) for j in range(2, m + 1)),
        F.try_element_at(xs, F.lit(1)),
    ) / F.lit(float(m))
    mean2 = sum(
        (F.try_element_at(xs, F.lit(j)) for j in range(m + 2, 2 * m + 1)),
        F.try_element_at(xs, F.lit(m + 1)),
    ) / F.lit(float(m))
    init = F.struct(
        mean1.alias("l"),
        ((mean2 - mean1) / F.lit(float(m))).alias("b"),
        F.array(
            *[
                (F.try_element_at(xs, F.lit(j)) - mean1)
                for j in range(1, m + 1)
            ]
        ).alias("s"),
        F.lit(1).alias("i"),
    )

    def _step(acc, x):
        s_i = F.element_at(acc["s"], acc["i"])
        lnew = a * (x - s_i) + one_a * (acc["l"] + acc["b"])
        bnew = b * (lnew - acc["l"]) + one_b * acc["b"]
        snew = g * (x - acc["l"] - acc["b"]) + one_g * s_i
        sarr = F.concat(
            F.slice(acc["s"], F.lit(1), acc["i"] - 1),
            F.array(snew),
            F.slice(acc["s"], acc["i"] + 1, F.lit(m) - acc["i"]),
        )
        return F.struct(
            lnew.alias("l"), bnew.alias("b"),
            sarr.alias("s"),
            ((acc["i"] % F.lit(m)) + 1).alias("i"),
        )

    folded = F.aggregate(
        F.slice(
            xs, m + 1, F.greatest(F.size(xs) - m, F.lit(0))
        ),
        init,
        _step,
    )
    ok = F.size("evs") >= 2 * m
    fc = folded["l"] + folded["b"] + F.element_at(folded["s"], folded["i"])
    return ordered.select(
        "key",
        F.size("evs").cast("long").alias("n_events"),
        (F.round(F.when(ok, folded["l"]), 4) + F.lit(0.0)).alias("level"),
        (F.round(F.when(ok, folded["b"]), 4) + F.lit(0.0)).alias("trend"),
        (F.round(F.when(ok, fc), 4) + F.lit(0.0)).alias("forecast"),
    )


def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_cells: int | None = 10_000_000,
    ladder_cells: int = 1_000_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """2-D Pareto front (skyline), maximizing BOTH columns — the
    quality-vs-cost frontier question every corpus/model sweep asks
    ("which configurations are not strictly beaten on both axes?").
    A point is ON the front iff no other point has x' >= x and
    y' >= y with at least one strict.

    Plan (the fdr_correct envelope discipline, round-12 verdict ask
    #6's new `bucketed_running_extreme` consumer): ONE partial-agged
    groupBy(x) keeping max(y) collapses the corpus to distinct-x
    cells (dominated-within-x rows never reach the ladder; tripwire
    at `max_cells`), then the front test is one STRICT suffix-max
    envelope over descending x — a cell is on the front iff its y
    exceeds the max y over all strictly larger x (NULL envelope =
    largest x = on the front). At <= `ladder_cells` cells the
    envelope is a plain global window; above it it re-cuts through
    the shared equal-width-bucket device (per-bucket running max + a
    driver-walked <= n_buckets offset table — bit-identical, extremes
    are order-insensitive; no single-task sort). The corpus itself
    never sorts.

    Output: the front's (x_col, y_col) cells, one row per distinct x
    on the front. Ties: equal-y cells at different x keep only the
    larger x (the smaller is weakly dominated), matching the strict
    skyline convention."""
    xc = F.col(x_col).cast("double")
    yc = F.col(y_col).cast("double")
    cells = (
        df.filter(xc.isNotNull() & yc.isNotNull())
        .groupBy(xc.alias("__x"))
        .agg(F.max(yc).alias("__y"))
    )
    est = _assert_cell_bound(
        cells, ["__x"], "pareto_front", max_cells,
        plan_word="distinct-x suffix-max envelope ladder",
    )
    if est is None:
        # max_cells=None opts out of the RAISE, not of plan routing
        # (round-14 ADVICE): the >10M-cell raise tells callers to pass
        # None, and those callers need the bucketed regime MOST — so
        # still pay the one approx_count_distinct scan to pick it.
        est = cells.agg(
            F.approx_count_distinct("__x", 0.02).alias("__cells")
        ).collect()[0]["__cells"]
    env = None
    if est > ladder_cells:
        env = bucketed_running_extreme(
            cells, "__x", "__y", "__env",
            suffix=True, op="max",
            n_buckets=n_buckets, inclusive=False,
        )
    if env is None:  # small regime or degenerate x range
        w = Window.orderBy(F.col("__x").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        env = cells.withColumn("__env", F.max("__y").over(w))
    return env.filter(
        F.col("__env").isNull() | (F.col("__y") > F.col("__env"))
    ).select(F.col("__x").alias(x_col), F.col("__y").alias(y_col))
