"""WARC (Common Crawl) source: member-per-record gz streaming, record
parsing, HTTP payload split, and composition into the text funnel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.sources.warc import (
    http_payload,
    iter_warc_records,
    read_warc_gz,
    write_warc_gz,
)


def _http(body: str, ctype: str = "text/html") -> bytes:
    b = body.encode()
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(b)}\r\n\r\n"
    ).encode() + b


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc") / "crawl-00000.warc.gz")
    recs = []
    for i in range(6):
        recs.append(
            dict(
                warc_type="request",
                target_uri=f"http://example.com/{i}",
                warc_date="2026-01-01T00:00:00Z",
                content_type="application/http; msgtype=request",
                payload=b"GET / HTTP/1.1\r\n\r\n",
            )
        )
        recs.append(
            dict(
                warc_type="response",
                target_uri=f"http://example.com/{i}",
                warc_date="2026-01-01T00:00:00Z",
                content_type="application/http; msgtype=response",
                payload=_http(
                    f"<html><body><h1>Doc {i}</h1>"
                    f"<p>alpha beta {i}</p></body></html>"
                ),
            )
        )
    recs.append(
        dict(warc_type="warcinfo", payload=b"software: test\r\n")
    )
    write_warc_gz(recs, out)
    return out


def test_record_walker_pure_python(warc_file):
    """iter_warc_records over the concatenated raw bytes sees every
    record with exact Content-Length-delimited payloads."""
    import gzip

    raw = gzip.open(warc_file, "rb").read()
    recs = list(iter_warc_records(raw))
    assert len(recs) == 13
    types = [r["warc_type"] for r in recs]
    assert types.count("response") == 6
    assert types.count("request") == 6
    r0 = next(r for r in recs if r["warc_type"] == "response")
    assert r0["target_uri"] == "http://example.com/0"
    assert r0["content_length"] == len(r0["payload"])
    assert b"<h1>Doc 0</h1>" in r0["payload"]


def test_read_warc_gz_type_filter_and_schema(spark, warc_file):
    """Distributed read: default type filter keeps responses only;
    record numbering is file-global; None keeps everything."""
    df = read_warc_gz(spark, warc_file)
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["warc_type"] == "response" for r in rows)
    assert sorted(r["target_uri"] for r in rows) == [
        f"http://example.com/{i}" for i in range(6)
    ]
    assert all(r["path"].endswith(".warc.gz") for r in rows)
    everything = read_warc_gz(spark, warc_file, types=None)
    assert everything.count() == 13


def test_http_payload_split_and_text_funnel(spark, warc_file):
    """http_payload strips status+headers natively; the body composes
    straight into html_text_expr — crawl bytes to clean text without
    leaving column expressions after the scan."""
    from pandasvcf_spark.functions.text import html_text_expr

    df = http_payload(read_warc_gz(spark, warc_file))
    rows = df.collect()
    assert all(r["http_status"] == 200 for r in rows)
    assert all(r["http_content_type"] == "text/html" for r in rows)
    assert all(r["body"].startswith("<html>") for r in rows)
    text = df.select(
        "target_uri", html_text_expr(F.col("body")).alias("text")
    ).collect()
    one = next(r for r in text if r["target_uri"].endswith("/3"))
    assert "Doc 3" in one["text"] and "alpha beta 3" in one["text"]
    assert "<" not in one["text"]


def test_read_warc_multiple_files_one_task_each(spark, tmp_path, warc_file):
    """The path list distributes file-granular: two files, all records,
    and the scan plan carries no shuffle of record data."""
    import shutil

    p2 = str(tmp_path / "crawl-00001.warc.gz")
    shutil.copy(warc_file, p2)
    df = read_warc_gz(spark, [warc_file, p2])
    assert df.count() == 12
    assert df.select("path").distinct().count() == 2


def test_uncompressed_warc_roundtrip(spark, tmp_path, warc_file):
    """A plain .warc (no gz) parses through the same walker."""
    import gzip

    raw = gzip.open(warc_file, "rb").read()
    p = str(tmp_path / "plain.warc")
    open(p, "wb").write(raw)
    assert read_warc_gz(spark, p).count() == 6


def test_http_payload_lf_only_headers_with_crlf_in_body(spark):
    """LF-only HTTP headers whose BODY contains CRLFCRLF must split at
    the earlier \\n\\n header terminator, not at the body's \\r\\n\\r\\n
    (the round-9 advice case: unconditionally preferring pos4 put part
    of the body into the headers)."""
    lf_only = (
        b"HTTP/1.1 200 OK\n"
        b"Content-Type: text/plain\n"
        b"\n"
        b"first line\r\n\r\nsecond paragraph"
    )
    crlf = (
        b"HTTP/1.1 404 Not Found\r\n"
        b"Content-Type: text/html\r\n"
        b"\r\n"
        b"<html>gone</html>"
    )
    df = spark.createDataFrame(
        [(1, bytearray(lf_only)), (2, bytearray(crlf))],
        "id int, payload binary",
    )
    rows = {r["id"]: r for r in http_payload(df).collect()}
    assert rows[1]["http_status"] == 200
    assert rows[1]["http_content_type"] == "text/plain"
    assert rows[1]["body"] == "first line\r\n\r\nsecond paragraph"
    assert rows[2]["http_status"] == 404
    assert rows[2]["body"] == "<html>gone</html>"


def test_warc_end_to_end_crawl_to_clean_corpus(spark, tmp_path):
    """The composition a Common-Crawl user actually runs (round-10
    verdict ask #5): read_warc_gz -> http_payload -> html_text_expr ->
    prepare_corpus, from a generated two-file snapshot to the cleaned
    corpus + per-stage survivor report. Covers: non-response records
    filtered, non-HTML responses dropped, exact-dup pages deduped
    across FILES, and the funnel report accounting every stage."""
    from pandasvcf_spark.functions.text import html_text_expr
    from pandasvcf_spark.operators.pipeline import prepare_corpus

    def page(i, extra=""):
        return _http(
            f"<html><head><title>t{i}</title></head><body>"
            f"<p>unique words {i} alpha beta gamma delta {extra}</p>"
            "</body></html>"
        )

    files = []
    for f in range(2):
        recs = [dict(warc_type="warcinfo", payload=b"software: t\r\n")]
        for i in range(8):
            doc = f * 8 + i
            recs.append(
                dict(
                    warc_type="response",
                    target_uri=f"http://ex.com/{f}/{i}",
                    content_type="application/http; msgtype=response",
                    payload=page(doc),
                )
            )
        # same page in BOTH files: must dedup across file boundaries
        recs.append(
            dict(
                warc_type="response",
                target_uri=f"http://ex.com/{f}/dup",
                content_type="application/http; msgtype=response",
                payload=page(999),
            )
        )
        # a non-HTML response: the content-type filter must drop it
        recs.append(
            dict(
                warc_type="response",
                target_uri=f"http://ex.com/{f}/img",
                content_type="application/http; msgtype=response",
                payload=_http("GIF89a...", ctype="image/gif"),
            )
        )
        path = str(tmp_path / f"crawl-{f:05d}.warc.gz")
        write_warc_gz(recs, path)
        files.append(path)

    pages = (
        http_payload(read_warc_gz(spark, files))
        .filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            F.col("target_uri").alias("doc_id"),
            html_text_expr(F.col("body")).alias("text"),
        )
    )
    cleaned, report = prepare_corpus(
        pages, near_dup=False, min_quality=None
    )
    rows = cleaned.collect()
    # 16 unique pages + 1 surviving copy of the duplicated page; the
    # 2 image responses and 2 warcinfo records never reach the funnel
    assert len(rows) == 17
    assert all("<" not in r["text"] for r in rows)
    rep = {r["name"]: r["rows"] for r in report.collect()}
    assert rep["input"] == 18
    assert rep["exact_dedup"] == 17
