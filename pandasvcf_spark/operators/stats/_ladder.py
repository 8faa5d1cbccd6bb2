"""Shared bucketed ECDF-ladder device (round-11 verdict ask #4;
round-12 ask #6 adds the envelope half).

`fdr_correct` proved the re-cut bit-identical for its envelope
ladders (`causal_survival._fdr_adj_bucketed`, plan-asserted in
tests/test_plan_shapes.py): equal-width value buckets + per-BUCKET
running windows + a driver-walked <= n_buckets offset table replace
the unpartitioned global window, so no single task ever sorts the
distinct-value cell table. `bucketed_running_sums` generalizes the
CUMULATIVE-SUM half of that device — the only ladder shape the ECDF
family (ks_2sample, kuiper_2sample, anderson_darling_2samp,
wasserstein_1d, cvm_2sample, roc_points) needs: every member derives
its per-cell term from counts-through-the-current-cell, then folds
to one row (or, for roc_points, emits the cells themselves).
`bucketed_running_extreme` is the ENVELOPE half (suffix-min /
prefix-max / suffix-max running extremes) that previously lived only
inside `_fdr_adj_bucketed` — shared so envelope consumers (BH/BY/Holm
adjustment, Pareto fronts, isotonic-style monotone envelopes) get the
distributed regime for free. Extremes are order-insensitive, so both
regimes are bit-identical by construction.

Exactness: the running sums are INTEGER counts (BIGINT, or
integer-valued doubles < 2^53 in the Anderson-Darling midrank form),
so per-bucket subtotal + within-bucket running sum is exactly the
global running sum regardless of addition order — the result is
bit-identical to the plain-window form, and the DuckDB oracles are
untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}


def bucketed_running_sums(
    cells: DataFrame,
    value_col: str,
    sum_cols: Sequence[str],
    out_cols: Sequence[str],
    n_buckets: int = 1024,
    descending: bool = False,
    next_col: str | None = None,
    assume_checkpointed: bool = False,
) -> DataFrame | None:
    """cells + exact running sums of `sum_cols` through the current
    `value_col` row (ascending, or descending for the roc_points
    score ladder) as `out_cols`, computed WITHOUT an unpartitioned
    window:

      1. the cell table localCheckpoints (three jobs must see one
         snapshot — the bucketed_row_number determinism
         precondition), then one (min, max) pass prices equal-width
         value buckets;
      2. per-bucket totals (<= n_buckets rows — the documented
         model-sized collect) give each bucket its exact global
         running-sum OFFSET by a driver walk in ladder order;
      3. each output is offset + the same running sum over a window
         partitioned BY BUCKET — ~1/n_buckets of the cells per sort
         task, never one task.

    `next_col` (ascending only) additionally emits the next distinct
    value up the ladder (the wasserstein_1d segment width): a
    per-bucket lead() whose bucket-final NULLs fill from the next
    non-empty bucket's min value, read off the same driver walk.

    Returns None when the value range is degenerate (empty / constant
    / NaN bounds) — the caller falls back to the plain global window,
    which is then at most a handful of cells."""
    sum_cols = list(sum_cols)
    out_cols = list(out_cols)
    assert len(sum_cols) == len(out_cols)
    if next_col is not None and descending:
        raise ValueError("next_col is an ascending-ladder feature")
    if not assume_checkpointed:
        cells = cells.localCheckpoint(eager=True)
    v = F.col(value_col)
    st = cells.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    lo, hi = st["lo"], st["hi"]
    if lo is None or lo == hi or lo != lo or hi != hi:
        return None
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("int")
    binned = cells.withColumn("__bk", bucket)
    aggs = [
        F.sum(c).alias(f"__s{i}") for i, c in enumerate(sum_cols)
    ]
    if next_col is not None:
        aggs.append(F.min(value_col).alias("__vmin"))
    per = {
        r["__bk"]: r for r in binned.groupBy("__bk").agg(*aggs).collect()
    }
    dtypes = dict(cells.dtypes)
    is_int = [dtypes[c] in _INT_TYPES for c in sum_cols]
    order = sorted(per, reverse=descending)  # ladder order
    offs = []
    run = [0 if ii else 0.0 for ii in is_int]
    for pos, bk in enumerate(order):
        row = [bk] + list(run)
        if next_col is not None:
            nxt = order[pos + 1] if pos + 1 < len(order) else None
            row.append(
                float(per[nxt]["__vmin"]) if nxt is not None else None
            )
        offs.append(tuple(row))
        for i in range(len(sum_cols)):
            run[i] = run[i] + per[bk][f"__s{i}"]
    schema_parts = ["__bk int"] + [
        f"__off{i} " + ("long" if ii else "double")
        for i, ii in enumerate(is_int)
    ]
    if next_col is not None:
        schema_parts.append("__bnxt double")
    odf = cells.sparkSession.createDataFrame(
        offs, ", ".join(schema_parts)
    )
    w_run = Window.partitionBy("__bk").orderBy(
        v.desc() if descending else v.asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    res = binned.join(F.broadcast(odf), "__bk")
    for i, (c_in, c_out) in enumerate(zip(sum_cols, out_cols)):
        res = res.withColumn(
            c_out, F.col(f"__off{i}") + F.sum(c_in).over(w_run)
        )
    drop = ["__bk"] + [f"__off{i}" for i in range(len(sum_cols))]
    if next_col is not None:
        w_lead = Window.partitionBy("__bk").orderBy(v.asc())
        res = res.withColumn(
            next_col,
            F.coalesce(
                F.lead(value_col, 1).over(w_lead), F.col("__bnxt")
            ),
        )
        drop.append("__bnxt")
    return res.drop(*drop)

def bucketed_running_extreme(
    cells: DataFrame,
    value_col: str,
    cand_col: str,
    out_col: str,
    suffix: bool,
    op: str,
    n_buckets: int = 1024,
    bucket_col: str | None = None,
    inclusive: bool = True,
    assume_checkpointed: bool = False,
) -> DataFrame | None:
    """cells + the running EXTREME of `cand_col` through the ladder
    ordered by `value_col` (prefix = through the current value
    ascending; `suffix=True` = descending — i.e. the extreme over all
    LATER values), computed WITHOUT an unpartitioned window — the
    envelope half of the `_fdr_adj_bucketed` device, lifted (round-12
    verdict ask #6):

      1. equal-width value buckets (one (min, max) pass; the cell
         table localCheckpoints first unless `assume_checkpointed` —
         the bucketed determinism precondition). Pass `bucket_col` to
         reuse a caller-computed bucket id and skip both jobs
         (fdr_correct shares one binning across its position and
         envelope ladders);
      2. per-bucket candidate extremes (<= n_buckets rows — the
         documented model-sized collect) give each bucket the extreme
         over STRICTLY-earlier buckets in fold order by a driver walk
         (NULL for the first bucket);
      3. out_col = the per-bucket running extreme merged with that
         broadcast cross-bucket offset — ~1/n_buckets of the cells
         per sort task, never one task.

    `op` is "min" or "max". `inclusive=False` excludes the current
    row (the strict envelope a Pareto front needs: a row with no
    earlier-in-fold-order cell gets NULL — "nothing dominates").
    Unlike the cumulative-sum half, min/max are order-INSENSITIVE, so
    this is bit-identical to the plain-window form — UNDER THE TIE
    PRECONDITION (round-14 ADVICE): the running frames are ROWS
    frames over `value_col` order, so rows with TIED `value_col`
    values see each other in an arbitrary (nondeterministic) order.
    Callers must feed either DISTINCT `value_col` values (pareto_front
    pre-collapses to distinct-x cells) or tied rows whose `cand_col`
    is constant within each tie (fdr_correct's rank-constant
    candidates per tied p) — otherwise the strict (`inclusive=False`)
    envelope especially is order-dependent for tied values. With that
    precondition both regimes agree for ANY doubles, not just integer
    counts.

    Returns None when the value range is degenerate (empty / constant
    / NaN bounds) and no `bucket_col` was supplied — the caller falls
    back to the plain global window, then at most a handful of
    cells."""
    if op not in ("min", "max"):
        raise ValueError(f"op must be 'min' or 'max', got {op!r}")
    agg_fn, merge_fn = (F.min, F.least) if op == "min" else (
        F.max, F.greatest
    )
    v = F.col(value_col)
    drop = []
    if bucket_col is None:
        if not assume_checkpointed:
            cells = cells.localCheckpoint(eager=True)
        st = cells.agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        lo, hi = st["lo"], st["hi"]
        if lo is None or lo == hi or lo != lo or hi != hi:
            return None
        width = (hi - lo) / n_buckets
        bucket_col = "__ebk"
        drop.append(bucket_col)
        cells = cells.withColumn(
            bucket_col,
            F.least(
                F.floor((v - F.lit(lo)) / F.lit(width)),
                F.lit(n_buckets - 1),
            ).cast("int"),
        )
    ext = {
        r[bucket_col]: r["e"]
        for r in cells.groupBy(bucket_col)
        .agg(agg_fn(cand_col).alias("e"))
        .collect()
    }
    eoffs, run = [], None
    pymerge = min if op == "min" else max
    for bk in sorted(ext, reverse=suffix):  # fold order
        eoffs.append((bk, run))
        run = ext[bk] if run is None else pymerge(run, ext[bk])
    edf = cells.sparkSession.createDataFrame(
        eoffs, f"{bucket_col} int, __eoff double"
    )
    w_run = Window.partitionBy(bucket_col).orderBy(
        v.desc() if suffix else v.asc()
    ).rowsBetween(Window.unboundedPreceding, -1 if not inclusive else 0)
    running = agg_fn(cand_col).over(w_run)
    if inclusive:
        # the exact _fdr_adj_bucketed merge expression (running is
        # never NULL here) — kept verbatim so fdr stays bit-identical
        env = F.when(
            F.col("__eoff").isNotNull(),
            merge_fn(running, F.col("__eoff")),
        ).otherwise(running)
    else:
        # strict envelope: either side may be NULL; least/greatest
        # skip NULLs on both engines, so the merge is the coalesce
        env = merge_fn(running, F.col("__eoff"))
    return (
        cells.join(F.broadcast(edf), bucket_col)
        .withColumn(out_col, env)
        .drop("__eoff", *drop)
    )
