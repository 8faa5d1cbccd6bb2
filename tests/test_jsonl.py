"""JSONL document source: schema-enforced scan, corrupt-line policies,
gzip shards, round-trip into the text operators."""

from __future__ import annotations

import gzip
import json

import pytest

from pandasvcf_spark.sources.jsonl import (
    DOCUMENTS_DDL,
    jsonl_corrupt_stats,
    read_jsonl,
)


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [
        {"doc_id": i, "text": f"doc number {i} has words", "lang": "en",
         "source": "web", "n_chars": 24}
        for i in range(20)
    ]
    # shard 0: plain, with one malformed line spliced in
    lines = [json.dumps(r) for r in rows[:10]]
    lines.insert(5, '{"doc_id": 999, "text": broken')
    (d / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    # shard 1: gzip-compressed
    with gzip.open(d / "part-1.jsonl.gz", "wt") as f:
        for r in rows[10:]:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_read_jsonl_keep_drop_fail(spark, jsonl_dir):
    kept = read_jsonl(spark, jsonl_dir)
    assert kept.columns == DOCUMENTS_DDL.replace(" BIGINT", "").replace(
        " STRING", ""
    ).split(", ") + ["corrupt"]
    rows = kept.collect()
    assert len(rows) == 21  # 20 good + 1 corrupt (gzip shard included)
    good = [r for r in rows if r["corrupt"] is None]
    assert {r["doc_id"] for r in good} == set(range(20))
    bad = [r for r in rows if r["corrupt"] is not None]
    assert len(bad) == 1 and "broken" in bad[0]["corrupt"]

    stats = jsonl_corrupt_stats(kept).first()
    assert (stats["n_rows"], stats["n_corrupt"]) == (21, 1)
    assert abs(stats["corrupt_frac"] - 1 / 21) < 1e-6
    assert stats["filled_doc_id"] == 20  # schema-drift tripwire columns
    assert stats["filled_text"] == 20

    dropped = read_jsonl(spark, jsonl_dir, bad_records="drop")
    assert "corrupt" not in dropped.columns
    assert dropped.count() == 20

    with pytest.raises(Exception):  # FAILFAST surfaces the malformed line
        read_jsonl(spark, jsonl_dir, bad_records="fail").collect()

    with pytest.raises(ValueError, match="bad_records"):
        read_jsonl(spark, jsonl_dir, bad_records="bogus")


def test_read_jsonl_feeds_text_operators(spark, jsonl_dir):
    """JSONL shards drop straight into the dedup/text surface — the whole
    point of sharing DOCUMENTS_DDL with the documents table."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.functions.text import token_count_expr
    from pandasvcf_spark.operators.dedup import dedup_exact

    docs = read_jsonl(spark, jsonl_dir, bad_records="drop")
    toks = docs.select("doc_id", token_count_expr("text").alias("t")).collect()
    assert all(r["t"] == 5 for r in toks)
    survivors = dedup_exact(
        docs, F.col("text"), order_by=[F.col("doc_id")]
    )
    assert survivors.count() == 20  # all texts distinct -> all survive


def test_read_jsonl_stream_equals_batch(spark, jsonl_dir):
    """Streamed JSONL ingest (availableNow drain) must produce the same
    rows as the batch scan, and the text expressions compose on the
    stream unchanged."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.functions.text import token_count_expr
    from pandasvcf_spark.sources.jsonl import read_jsonl_stream
    from pandasvcf_spark.streaming.events import run_stream_to_memory

    stream = read_jsonl_stream(
        spark, jsonl_dir, bad_records="drop", max_files_per_trigger=1
    ).select("doc_id", token_count_expr("text").alias("t"))
    got = run_stream_to_memory(stream, "t_jsonl_stream", output_mode="append")
    want = read_jsonl(spark, jsonl_dir, bad_records="drop").select(
        "doc_id", token_count_expr("text").alias("t")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert want.count() == 20


def test_write_jsonl_roundtrip(spark, jsonl_dir, tmp_path):
    """write_jsonl -> read_jsonl round trip: gzip shards, shard-count
    control, zero corrupt lines, exact row equality."""
    import os

    from pandasvcf_spark.sources.jsonl import jsonl_corrupt_stats, write_jsonl

    docs = read_jsonl(spark, jsonl_dir, bad_records="drop")
    out = str(tmp_path / "export")
    write_jsonl(docs, out, n_shards=3)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 3 and all(f.endswith(".gz") for f in parts)

    back = read_jsonl(spark, out)
    stats = jsonl_corrupt_stats(back).first()
    assert (stats["n_rows"], stats["n_corrupt"]) == (20, 0)
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, back.drop("corrupt").collect()), key=lambda t: t[0]) == \
           sorted(map(tuple, docs.collect()), key=lambda t: t[0])


def test_read_csv_docs(spark, tmp_path):
    """CSV/TSV ingest: schema-enforced, quoted fields, corrupt-row
    policies shared with jsonl, TSV via sep, audit composes."""
    from pandasvcf_spark.sources.csvdocs import read_csv_docs
    from pandasvcf_spark.sources.jsonl import jsonl_corrupt_stats

    d = tmp_path / "csv"
    d.mkdir()
    (d / "part-0.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"hello, quoted world",en,web,19\n'
        "2,plain text,en,web,10\n"
        "3,bad,row,with,too,many,fields,entirely\n"
    )
    kept = read_csv_docs(spark, str(d))
    rows = {r["doc_id"]: r for r in kept.collect()}
    assert rows[1]["text"] == "hello, quoted world"  # RFC 4180 quoting
    assert rows[2]["lang"] == "en"
    stats = jsonl_corrupt_stats(kept).first()
    assert (stats["n_rows"], stats["n_corrupt"]) == (3, 1)

    dropped = read_csv_docs(spark, str(d), bad_records="drop")
    assert "corrupt" not in dropped.columns
    # the documented gotcha: a bare count() prunes every column, parses
    # nothing, and sees the malformed row; a full-row read drops it
    assert dropped.count() == 3
    assert len(dropped.collect()) == 2

    t = tmp_path / "tsv"
    t.mkdir()
    (t / "part-0.tsv").write_text(
        "doc_id\ttext\tlang\tsource\tn_chars\n4\ttab text\tde\tnews\t8\n"
    )
    tsv = read_csv_docs(spark, str(t), sep="\t", bad_records="fail")
    r = tsv.first()
    assert (r["doc_id"], r["text"], r["lang"]) == (4, "tab text", "de")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad_records"):
        read_csv_docs(spark, str(d), bad_records="nope")


def test_corpus_shaping_predicates_on_stream(spark, jsonl_dir):
    """The corpus-shaping predicates (mix_sources, quality gates) are
    stateless column predicates, so they run on the JSONL STREAM
    unchanged and agree with the batch pipeline row-for-row — streaming
    corpus ingest + shaping in one plan."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.sampling import mix_sources
    from pandasvcf_spark.sources.jsonl import read_jsonl, read_jsonl_stream
    from pandasvcf_spark.streaming.events import run_stream_to_memory

    def shape(df):
        return mix_sources(
            df.filter(F.length("text") > 10),
            "source",
            {"web": 0.8, "books": 1.0},
            key="doc_id",
            default_fraction=0.5,
        ).select("doc_id", "source")

    got = run_stream_to_memory(
        shape(
            read_jsonl_stream(
                spark, jsonl_dir, bad_records="drop", max_files_per_trigger=1
            )
        ),
        "t_shape_stream",
        output_mode="append",
    )
    want = shape(read_jsonl(spark, jsonl_dir, bad_records="drop"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
