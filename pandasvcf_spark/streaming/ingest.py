"""Streaming corpus ingest with incremental near-dedup — the composition
a continuously-crawling training-data pipeline runs: documents arrive as a
stream, each micro-batch is deduped (a) within itself and (b) against
everything already accepted, and only the survivors land in the corpus.

Built from pieces that are each already correctness-checked: the JSONL/file
stream sources, `near_dedup_documents` (intra-batch), `near_dedup_incremental`
(batch vs accumulated corpus, old×old pair term eliminated in-stage), and
the batch_id-directory idempotence of `write_stream_partitioned` — a
replayed micro-batch (failure between sink write and checkpoint commit)
overwrites its own directory instead of double-inserting, and because the
replay re-reads the SAME accumulated corpus state (its own earlier partial
write is excluded by reading only smaller batch_ids), it reproduces the
same survivor set.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _list_prior_batch_dirs(spark, corpus_path: str, batch_id: int) -> list[str]:
    """List `corpus_path/batch_id=K` directories with K < batch_id through
    the Hadoop FileSystem API — resolved from the path's own scheme, so the
    same code lists local paths, `file://` URIs, HDFS, and s3a/gs object
    stores (the deployment the 100 TB ingest story assumes). Driver-side,
    one RPC per micro-batch over ~#batches entries — metadata-sized."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(corpus_path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        m = re.fullmatch(r"batch_id=(\d+)", name)
        if st.isDirectory() and m and int(m.group(1)) < batch_id:
            out.append(st.getPath().toString())
    return out


def dedup_ingest_stream(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str,
    shingle_fn,
    seed_df: DataFrame | None = None,
    min_jaccard: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
    query_name: str = "dedup_ingest",
    trigger: dict | None = None,
):
    """Start a streaming query that appends near-dedup survivors of every
    micro-batch to `corpus_path/batch_id=N`.

    `trigger` passes through to `writeStream.trigger(...)`; the default
    ``{"availableNow": True}`` drains currently-available input and stops
    (the batch-backfill / test mode). A continuously-crawling deployment
    passes ``{"processingTime": "1 minute"}`` to keep the query live.
    Prior-batch discovery goes through the Hadoop FileSystem API resolved
    from `corpus_path`'s scheme, so local paths, `file://` URIs, HDFS and
    s3a/gs object stores all work.

    Per micro-batch (inside foreachBatch, so plain batch operators apply):
      1. intra-batch near-dedup (`near_dedup_documents`, min-id survivor);
      2. incremental dedup of the remainder against the accumulated
         corpus = `seed_df` (optional initial clean corpus) ∪ all
         batch_id < N survivor directories — strictly-smaller batch ids
         only, so a replayed batch never sees its own earlier partial
         output and replays are deterministic;
      3. overwrite `corpus_path/batch_id=N` with the survivors.

    `shingle_fn` is a zero-arg callable returning the shingle Column
    (e.g. ``lambda: word_ngrams_expr("text", 3)``) — a callable because
    the expression must be rebuilt inside each micro-batch's plan.

    Scale notes: the accumulated corpus is read per batch but never
    re-shuffled by content — `near_dedup_incremental` pays it as one
    linear signature pass (persist a `minhash_band_keys` index and swap
    it in via the base_band_keys path when the corpus outgrows that).
    Batch-local state lives in the checkpoint; the sink's idempotence is
    layout-based, same contract as `write_stream_partitioned`."""
    from pandasvcf_spark.operators.dedup import (
        near_dedup_documents,
        near_dedup_incremental,
    )

    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        shingles = shingle_fn()
        batch_clean = near_dedup_documents(
            batch_df,
            id_col,
            shingles,
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
        )
        bases = []
        if seed_df is not None:
            bases.append(seed_df)
        # read only strictly-smaller batch ids: a replayed batch must not
        # see its own earlier partial write
        prior_dirs = _list_prior_batch_dirs(spark, corpus_path, batch_id)
        if prior_dirs:
            bases.append(spark.read.parquet(*prior_dirs))
        if bases:
            base = bases[0]
            for extra in bases[1:]:
                base = base.unionByName(extra)
            survivors = near_dedup_incremental(
                base,
                batch_clean,
                id_col,
                shingle_fn(),
                num_hashes=num_hashes,
                bands=bands,
                min_jaccard=min_jaccard,
            )
        else:
            survivors = batch_clean
        survivors.write.mode("overwrite").parquet(
            f"{corpus_path}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def semdedup_ingest_stream(
    stream_df: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    seed_df: DataFrame | None = None,
    max_cluster_size: int | None = 100_000,
    query_name: str = "semdedup_ingest",
    trigger: dict | None = None,
):
    """Streaming SEMANTIC corpus ingest — `dedup_ingest_stream`'s
    contract carried to embedding space (the SemDeDup tier for a
    continuously-crawled corpus): append every micro-batch's semantic
    survivors to `corpus_path/batch_id=N`.

    Per micro-batch (inside foreachBatch, so plain batch operators
    apply):
      1. intra-batch `semantic_dedup` (keep="min_id" — the
         DETERMINISTIC policy, so a replayed batch reproduces its
         survivor set exactly; keep-far depends only on the batch
         content too, but min-id is the simplest replay argument);
      2. `semantic_dedup_incremental` of the remainder against the
         accumulated corpus = `seed_df` ∪ all batch_id < N survivor
         directories (strictly smaller ids — a replayed batch never
         sees its own earlier partial output);
      3. overwrite `corpus_path/batch_id=N` with the surviving FULL
         rows (id + embedding + everything else — later batches read
         them back as the base).

    Same scale shape as the batch operators: the accumulated corpus
    pays one linear cell-assignment pass per batch and never a
    quadratic pair term; `centroids` is the model-sized broadcast
    literal trained once at corpus-build time (re-train and re-shard
    offline when drift moves the cells). Sink idempotence is
    layout-based, the `write_stream_partitioned` contract."""
    from pandasvcf_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_incremental,
    )

    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keep = semantic_dedup(
            batch_df,
            centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            keep="min_id",
            max_cluster_size=max_cluster_size,
        ).select(id_col)
        batch_clean = batch_df.join(keep, on=id_col)
        bases = []
        if seed_df is not None:
            bases.append(seed_df)
        prior_dirs = _list_prior_batch_dirs(spark, corpus_path, batch_id)
        if prior_dirs:
            bases.append(spark.read.parquet(*prior_dirs))
        if bases:
            base = bases[0]
            for extra in bases[1:]:
                base = base.unionByName(extra)
            surv_ids = semantic_dedup_incremental(
                base,
                batch_clean,
                centroids,
                threshold=threshold,
                id_col=id_col,
                vec_col=vec_col,
                max_cluster_size=max_cluster_size,
            ).select(id_col)
            survivors = batch_clean.join(surv_ids, on=id_col)
        else:
            survivors = batch_clean
        survivors.write.mode("overwrite").parquet(
            f"{corpus_path}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
