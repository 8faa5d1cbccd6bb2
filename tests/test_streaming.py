"""Structured Streaming operators: stream(availableNow) ≡ batch equivalence.

The same operator functions (streaming/events.py) serve a streaming and a
batch DataFrame; these tests run both over identical parquet input and
assert identical results — the batch twin is what the DuckDB oracle checks
in the catalog, so this closes the loop stream ≡ batch ≡ oracle.
"""

from __future__ import annotations

import pytest

from pandasvcf_spark.queries.tables import load
from pandasvcf_spark.streaming.events import (
    dedup_events,
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events with the ns->us converted ts, rewritten as a parquet dir the
    file-source stream can watch (multiple files = multiple micro-batches
    under maxFilesPerTrigger)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, batch_events, events_dir):
    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    want = tumbling_counts(batch_events)
    assert _sorted(got) == _sorted(want)
    assert len(want.collect()) > 0


def test_sliding_stream_equals_batch(spark, batch_events, events_dir):
    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        sliding_counts(stream), "t_sliding", output_mode="complete"
    )
    want = sliding_counts(batch_events)
    assert _sorted(got) == _sorted(want)
    # sliding 2h/1h: every event lands in exactly two windows
    n_events = batch_events.count()
    assert sum(r["n"] for r in want.collect()) == 2 * n_events


def test_session_stream_equals_batch(spark, batch_events, events_dir):
    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        session_counts(stream), "t_session", output_mode="complete"
    )
    want = session_counts(batch_events)
    assert _sorted(got) == _sorted(want)


def test_session_window_matches_gaps_and_islands(spark, batch_events):
    """The native session_window operator and the catalog's lag-based
    gaps-and-islands twin (oracle-checked) agree on sessions per user."""
    from collections import Counter

    from pandasvcf_spark.queries import QUERIES

    sw = Counter()
    for r in session_counts(batch_events).collect():
        sw[r["user_id"]] += 1
    gi = {
        r["user_id"]: r["n_sessions"]
        for r in QUERIES["e_sessionize"].fn(spark, SF_DIR).collect()
    }
    assert dict(sw) == gi


def test_dedup_within_watermark_stream(spark, batch_events, events_dir):
    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        dedup_events(stream), "t_dedup", output_mode="append"
    )
    batch = dedup_events(batch_events)
    # Which physical row survives differs (stream: first-arrival within
    # watermark; batch: arbitrary) — the deduped KEY SET must match.
    got_keys = {(r["user_id"], r["event_type"]) for r in got.collect()}
    want_keys = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    assert got_keys == want_keys


def test_stateful_running_totals(spark, batch_events, events_dir):
    """applyInPandasWithState: the last emitted row per user (update mode
    across micro-batches) must equal the batch grouped totals."""
    from pandasvcf_spark.streaming.events import running_user_totals

    stream = read_events_stream(
        spark, events_dir, schema=batch_events.schema, max_files_per_trigger=1
    )
    got = run_stream_to_memory(
        running_user_totals(stream), "t_stateful", output_mode="update"
    )
    # update mode emits one row per user per micro-batch; counts are
    # monotonic, so the max-count row per user is the final state (no
    # reliance on sink row order)
    final = {}
    for r in got.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals(batch_events).collect()
    }
    assert final == want
    # multiple micro-batches actually happened (otherwise this tests nothing)
    assert len(got.collect()) > len(want)


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg: rows arriving behind the watermark for an
    already-finalized window are dropped (SURVEY §2.10 late-data handling).

    Batch 1 carries window 01:00-02:00 (n=4) plus an 03:00 event whose
    watermark (02:30 after the 30-min delay) COMMITS at the end of the
    batch; the watermark a batch observes lags one commit, so batch 2 is a
    spacer that runs under the committed 02:30 watermark and finalizes the
    01:00 window. Batch 3 then delivers 3 LATE rows for that closed window
    (dropped) plus rows for the still-open 03:00 window (accepted but never
    finalized before the stream drains). Expected appended output: exactly
    {01:00: 4}."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    def mk(ids_ts):
        return spark.createDataFrame(
            [(i, ts, 1, "click", 1.0, "{}") for i, ts in ids_ts],
            "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    d = str(tmp_path / "late_events")
    batches = [
        mk([(1, "2024-06-01 01:00:00"), (2, "2024-06-01 01:05:00"),
            (3, "2024-06-01 01:10:00"), (4, "2024-06-01 01:20:00"),
            (5, "2024-06-01 03:00:00")]),
        mk([(6, "2024-06-01 03:20:00")]),
        mk([(7, "2024-06-01 01:10:00"), (8, "2024-06-01 01:15:00"),
            (9, "2024-06-01 01:30:00"), (10, "2024-06-01 03:25:00")]),
    ]
    # one directory of files with controlled mtimes -> deterministic batch order
    os.makedirs(d + "/in")
    now = _time.time()
    for bi, bdf in enumerate(batches):
        bdf.coalesce(1).write.parquet(d + f"/b{bi}")
        for fn in os.listdir(d + f"/b{bi}"):
            if fn.endswith(".parquet"):
                dst = d + f"/in/b{bi}_{fn}"
                os.rename(d + f"/b{bi}/{fn}", dst)
                os.utime(dst, (now - 100 + 10 * bi, now - 100 + 10 * bi))
    f0 = batches[0]

    stream = read_events_stream(
        spark, d + "/in", schema=f0.schema, max_files_per_trigger=1
    )
    got = run_stream_to_memory(
        tumbling_counts(stream, watermark="30 minutes"),
        "t_late",
        output_mode="append",
    )
    rows = {(r["win_start"], r["event_type"]): r["n"] for r in got.collect()}
    assert rows == {("2024-06-01 01:00:00", "click"): 4}


def test_join_recent_stream_stream_equals_batch(spark, batch_events, events_dir):
    """Stream-stream interval join (watermarked both sides, bounded state)
    must equal the identical operator body run batch-batch."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.streaming.events import join_recent

    def clicks(df):
        return df.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )

    def views(df):
        return df.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        )

    ls = read_events_stream(spark, events_dir, schema=batch_events.schema)
    rs = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        join_recent(clicks(ls), views(rs), within="30 minutes"),
        "t_join_recent",
        output_mode="append",  # stream-stream inner join emits append-only
    )
    want = join_recent(
        clicks(batch_events), views(batch_events), within="30 minutes"
    )
    assert _sorted(got.select("event_id", "event_id_r")) == _sorted(
        want.select("event_id", "event_id_r")
    )
    assert want.count() > 0


def test_foreachbatch_sink_idempotent_layout(spark, batch_events, events_dir, tmp_path):
    """The foreachBatch parquet sink must (a) land every input row exactly
    once across batch_id directories, (b) leave nothing behind on a no-op
    restart (offsets committed in the checkpoint)."""
    from pandasvcf_spark.streaming.events import write_stream_partitioned

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(
        spark, events_dir, schema=batch_events.schema, max_files_per_trigger=2
    )
    q = write_stream_partitioned(stream, out, ckpt, query_name="t_sink")
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == batch_events.count()
    assert _sorted(got.select("event_id")) == _sorted(
        batch_events.select("event_id")
    )
    assert got.select("batch_id").distinct().count() >= 2  # multi-batch run

    # restart with the same checkpoint: no new input -> no change
    q2 = write_stream_partitioned(
        read_events_stream(spark, events_dir, schema=batch_events.schema),
        out,
        ckpt,
        query_name="t_sink2",
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == batch_events.count()


def test_foreachbatch_sink_crash_replay_no_duplicates(
    spark, batch_events, events_dir, tmp_path
):
    """Crash-replay drill for the exactly-once claim (streaming/events.py
    write_stream_partitioned): a failure BETWEEN the sink write and the
    checkpoint commit is simulated by deleting the checkpoint's last
    commits/N marker while keeping offsets/N — on restart Spark re-runs
    exactly batch N. Two crash shapes:

      (a) sink output survived the crash: the replay OVERWRITES
          out/batch_id=N — same rows, no duplicates;
      (b) sink output was lost too (batch_id=N dir deleted): the replay
          rewrites it — no missing rows.
    """
    import shutil
    from pathlib import Path

    from pandasvcf_spark.streaming.events import write_stream_partitioned

    out = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    total = batch_events.count()
    want_ids = _sorted(batch_events.select("event_id"))

    def drain():
        q = write_stream_partitioned(
            read_events_stream(
                spark,
                events_dir,
                schema=batch_events.schema,
                max_files_per_trigger=1,
            ),
            str(out),
            str(ckpt),
            query_name="t_sink_replay",
        )
        q.awaitTermination()

    def uncommit_last() -> int:
        commits = sorted(
            (p for p in (ckpt / "commits").iterdir() if p.name.isdigit()),
            key=lambda p: int(p.name),
        )
        last = commits[-1]
        last.unlink()
        # the local checksum FS keeps a .N.crc sidecar; a stale one fails
        # the commit rename on replay
        crc = last.parent / f".{last.name}.crc"
        if crc.exists():
            crc.unlink()
        return int(last.name)

    drain()
    assert spark.read.parquet(str(out)).count() == total

    # (a) replayed batch lands on its own surviving directory: idempotent
    n = uncommit_last()
    drain()
    got = spark.read.parquet(str(out))
    assert got.count() == total, "replayed batch duplicated rows"
    assert _sorted(got.select("event_id")) == want_ids

    # (b) replayed batch rebuilds its lost directory: no missing rows
    n = uncommit_last()
    shutil.rmtree(out / f"batch_id={n}")
    drain()
    got = spark.read.parquet(str(out))
    assert got.count() == total, "lost batch not rebuilt on replay"
    assert _sorted(got.select("event_id")) == want_ids


def test_hash_sample_stream_equals_batch(spark, batch_events, events_dir):
    """hash_sample is a pure deterministic predicate, so it composes with
    Structured Streaming unchanged: the sampled id set from a streamed
    scan equals the batch sample exactly (a seeded df.sample cannot make
    this promise)."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.sampling import hash_sample

    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        hash_sample(stream, F.col("event_id"), 0.2).select("event_id"),
        "t_sample_stream",
        output_mode="append",
    )
    want = hash_sample(batch_events, F.col("event_id"), 0.2).select("event_id")
    assert _sorted(got) == _sorted(want)
    assert 0 < want.count() < batch_events.count()


def test_sketch_ingest_stream_matches_batch_and_replays(spark, tmp_path):
    """Streamed Count-Min grid == one-shot batch grid over the same rows
    (cell-wise mergeability end-to-end), and a crash-replayed batch
    overwrites its own directory instead of double-counting."""
    import json
    import os
    import time

    from pandasvcf_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )
    from pandasvcf_spark.sources.jsonl import read_jsonl_stream
    from pandasvcf_spark.streaming.sketches import (
        read_sketch,
        sketch_ingest_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [("w%d" % (i % 17)) for i in range(400)]
    now = time.time()
    for b in range(2):
        p = os.path.join(str(in_dir), f"b{b}.jsonl")
        with open(p, "w") as fh:
            for i, w in enumerate(rows[b * 200:(b + 1) * 200]):
                fh.write(json.dumps({
                    "doc_id": b * 200 + i, "text": w, "lang": "en",
                    "source": "s", "n_chars": len(w),
                }) + "\n")
        os.utime(p, (now - 20 + b, now - 20 + b))
    sk_dir = str(tmp_path / "sk")
    ck = str(tmp_path / "ck")

    def drain():
        stream = read_jsonl_stream(
            spark, str(in_dir), bad_records="drop", max_files_per_trigger=1
        )
        q = sketch_ingest_stream(
            stream, sk_dir, ck, "text", depth=3, width=64,
            query_name="t_cms_ingest",
        )
        q.awaitTermination()

    drain()
    merged = {(r.d, r.cell): r.n for r in read_sketch(spark, sk_dir).collect()}
    batch_rows = spark.createDataFrame([(w,) for w in rows], "text string")
    direct = {
        (r.d, r.cell): r.n
        for r in countmin_sketch(batch_rows, "text", depth=3, width=64).collect()
    }
    assert merged == direct

    # crash replay: drop the last commit marker and re-drain
    commits = sorted(
        (p for p in (tmp_path / "ck" / "commits").iterdir()
         if p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    last = commits[-1]
    last.unlink()
    crc = last.parent / f".{last.name}.crc"
    if crc.exists():
        crc.unlink()
    drain()
    again = {(r.d, r.cell): r.n for r in read_sketch(spark, sk_dir).collect()}
    assert again == direct, "replayed batch double-counted"

    # the merged grid estimates like any countmin_sketch output
    probes = spark.createDataFrame([("w0",), ("absent",)], "term string")
    est = {
        r.term: r.est
        for r in countmin_estimate(
            read_sketch(spark, sk_dir), probes, "term", depth=3, width=64
        ).collect()
    }
    assert est["w0"] >= rows.count("w0") and est["absent"] == 0


def test_hll_ingest_stream_matches_batch_and_tolerates_overlap(
    spark, tmp_path
):
    """Streamed HLL grid == one-shot batch grid over the same rows
    (cell-wise MAX mergeability end-to-end), and OVERLAPPING batches —
    the same shard crawled twice — leave the estimate unchanged, the
    idempotence a SUM-merged sketch cannot offer."""
    import json
    import os
    import time

    from pandasvcf_spark.operators.sketches import hll_estimate, hll_sketch
    from pandasvcf_spark.sources.jsonl import read_jsonl_stream
    from pandasvcf_spark.streaming.sketches import (
        hll_ingest_stream,
        read_hll_sketch,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    words = ["item-%d" % i for i in range(300)]
    now = time.time()
    # batch 0: words[0:200]; batch 1: words[100:300] — 100-word overlap
    for b, lo, hi in ((0, 0, 200), (1, 100, 300)):
        p = os.path.join(str(in_dir), f"b{b}.jsonl")
        with open(p, "w") as fh:
            for i in range(lo, hi):
                fh.write(json.dumps({
                    "doc_id": i, "text": words[i], "lang": "en",
                    "source": "s", "n_chars": len(words[i]),
                }) + "\n")
        os.utime(p, (now - 20 + b, now - 20 + b))
    sk_dir = str(tmp_path / "sk")
    ck = str(tmp_path / "ck")
    stream = read_jsonl_stream(
        spark, str(in_dir), bad_records="drop", max_files_per_trigger=1
    )
    q = hll_ingest_stream(
        stream, sk_dir, ck, "text", m=64, query_name="t_hll_ingest"
    )
    q.awaitTermination()
    merged = sorted(
        map(tuple, read_hll_sketch(spark, sk_dir).collect())
    )
    direct = sorted(
        map(
            tuple,
            hll_sketch(
                spark.createDataFrame([(w,) for w in words], "text string"),
                "text",
                m=64,
            ).collect(),
        )
    )
    assert merged == direct  # overlap absorbed by MAX, union == whole
    est = hll_estimate(read_hll_sketch(spark, sk_dir), m=64).collect()[0]
    assert abs(est.estimate - 300) / 300 < 0.2


def test_drift_ingest_stream_js_and_replay(spark, tmp_path):
    """Streamed drift cells: merged distribution == batch groupBy; the
    JS report flags a shifted second batch against a batch-1 baseline;
    row-level js_divergence == count-level js_divergence_from_counts;
    crash replay never double-counts."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.stats import (
        js_divergence,
        js_divergence_from_counts,
    )
    from pandasvcf_spark.sources.jsonl import read_jsonl_stream
    from pandasvcf_spark.streaming.sketches import (
        drift_ingest_stream,
        drift_report,
        read_drift_cells,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    langs_b0 = ["en"] * 80 + ["fr"] * 20
    langs_b1 = ["en"] * 20 + ["fr"] * 20 + ["de"] * 60  # shifted
    now = time.time()
    for b, langs in enumerate([langs_b0, langs_b1]):
        p = os.path.join(str(in_dir), f"b{b}.jsonl")
        with open(p, "w") as fh:
            for i, lg in enumerate(langs):
                fh.write(json.dumps({
                    "doc_id": b * 1000 + i, "text": "t", "lang": lg,
                    "source": "s", "n_chars": 1,
                }) + "\n")
        os.utime(p, (now - 20 + b, now - 20 + b))
    cells = str(tmp_path / "cells")
    ck = str(tmp_path / "ck")

    def drain():
        stream = read_jsonl_stream(
            spark, str(in_dir), bad_records="drop",
            max_files_per_trigger=1,
        )
        q = drift_ingest_stream(
            stream, cells, ck, "lang", query_name="t_drift_ingest"
        )
        q.awaitTermination()

    drain()
    merged = {
        r["cat"]: r["n"] for r in read_drift_cells(spark, cells).collect()
    }
    assert merged == {"en": 100, "fr": 40, "de": 60}

    baseline = spark.createDataFrame(
        [("en", 80), ("fr", 20)], "cat string, n long"
    )
    rep = drift_report(spark, cells, baseline).collect()[0]
    assert rep["n0"] == 100 and rep["n1"] == 200
    assert rep["js"] is not None and rep["js"] > 0.05  # real shift
    assert rep["k"] == 3  # 'de' is novel and still finite

    # count-level == row-level JS on identical data
    rows_a = spark.createDataFrame(
        [(lg, 0) for lg in langs_b0], "c string, f int"
    )
    rows_b = spark.createDataFrame(
        [(lg, 1) for lg in langs_b1], "c string, f int"
    )
    row_level = js_divergence(
        rows_a.unionAll(rows_b), "c", "f"
    ).collect()[0]
    cnt_a = rows_a.groupBy(F.col("c").alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cnt_b = rows_b.groupBy(F.col("c").alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cnt_level = js_divergence_from_counts(cnt_a, cnt_b).collect()[0]
    assert row_level["js"] == cnt_level["js"]
    assert row_level["kl_pm"] == cnt_level["kl_pm"]

    # crash replay: drop the last commit marker, re-drain, no change
    commits = sorted(
        (p for p in (tmp_path / "ck" / "commits").iterdir()
         if p.name.isdigit()),
        key=lambda p: int(p.name),
    )
    last = commits[-1]
    last.unlink()
    crc = last.parent / f".{last.name}.crc"
    if crc.exists():
        crc.unlink()
    drain()
    again = {
        r["cat"]: r["n"] for r in read_drift_cells(spark, cells).collect()
    }
    assert again == merged, "replayed batch double-counted"


def test_ohlc_stream_equals_batch(spark, batch_events, events_dir):
    """Streaming OHLC candles (struct-extreme open/close as ONE
    incremental aggregation state) ≡ the batch grouped aggregate over
    the same files — and both agree with relational.ohlc_candles on
    the epoch-second equivalent input."""
    from pandasvcf_spark.streaming.events import ohlc_stream

    stream = read_events_stream(spark, events_dir, schema=batch_events.schema)
    got = run_stream_to_memory(
        ohlc_stream(stream), "t_ohlc", output_mode="complete"
    )
    want = ohlc_stream(batch_events)
    assert _sorted(got) == _sorted(want)
    assert len(want.collect()) > 0
    # cross-check open/close against the batch operator on one window
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.relational import ohlc_candles

    d = batch_events.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("et"),
        F.unix_timestamp("ts").cast("long").alias("t"),
        F.col("value").cast("double").alias("v"),
    )
    op = ohlc_candles(d, ["et"], "t", "v", bucket_seconds=3600)
    one = want.orderBy("win_start", "event_type").first()
    import datetime as _dt

    epoch = int(
        _dt.datetime.strptime(
            one["win_start"], "%Y-%m-%d %H:%M:%S"
        ).replace(tzinfo=_dt.timezone.utc).timestamp()
    )
    ref = op.filter(
        (F.col("et") == one["event_type"])
        & (F.col("bucket_start") == epoch)
    ).first()
    assert ref is not None
    assert (ref["open"], ref["close"], ref["n"]) == (
        one["open"], one["close"], one["n"],
    )


def test_ams_ingest_stream_matches_batch(spark, tmp_path):
    """Streamed AMS signed-sum grid == one-shot batch grid over the
    same rows (the signed sums are linear in counts, so cell-wise SUM
    merge is exact), and the merged grid estimates like any
    ams_f2_sketch output."""
    import json
    import os
    import time

    from pandasvcf_spark.operators.sketches import (
        ams_f2_estimate,
        ams_f2_sketch,
    )
    from pandasvcf_spark.sources.jsonl import read_jsonl_stream
    from pandasvcf_spark.streaming.sketches import (
        ams_ingest_stream,
        read_ams_sketch,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [("w%d" % ((i * 7) % 23)) for i in range(300)]
    now = time.time()
    for b in range(3):
        p = os.path.join(str(in_dir), f"b{b}.jsonl")
        with open(p, "w") as fh:
            for i, w in enumerate(rows[b * 100:(b + 1) * 100]):
                fh.write(json.dumps({
                    "doc_id": b * 100 + i, "text": w, "lang": "en",
                    "source": "s", "n_chars": len(w),
                }) + "\n")
        os.utime(p, (now - 20 + b, now - 20 + b))
    sk_dir = str(tmp_path / "sk_ams")
    ck = str(tmp_path / "ck_ams")

    stream = read_jsonl_stream(
        spark, str(in_dir), bad_records="drop", max_files_per_trigger=1
    )
    q = ams_ingest_stream(
        stream, sk_dir, ck, "text", rows=16, query_name="t_ams_ingest"
    )
    q.awaitTermination()

    merged = {r.r: r.s for r in read_ams_sketch(spark, sk_dir).collect()}
    batch_rows = spark.createDataFrame([(w,) for w in rows], "text string")
    direct = {r.r: r.s for r in
              ams_f2_sketch(batch_rows, "text", rows=16).collect()}
    assert merged == direct

    est = ams_f2_estimate(read_ams_sketch(spark, sk_dir)).collect()[0]
    from collections import Counter

    f2 = sum(c * c for c in Counter(rows).values())
    assert est["f2_est"] > 0
    assert abs(est["f2_est"] - f2) <= 3 * (2 / 16) ** 0.5 * f2
