"""Content-defined chunking (operators/dedup.cdc_*) — round 15.

Pins (a) bit-exact agreement between the Spark HOF expression plan and a
pure-Python reference of the gear-hash CDC walk, (b) the shift-resistance
property the operator exists for (a prefix edit moves only the boundary
inside one window; every later chunk keeps its fingerprint), (c) the
min/max chunk-length contract, (d) plan shape (no UDF, no shuffle in the
chunker; never a cartesian in the dedup join), and (e) the dedup profile
against brute force on planted duplicates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

P = (1 << 31) - 1
MULT = 2654435761
MIN_LEN, AVG_LEN, MAX_LEN, WINDOW = 32, 64, 128, 16


def ref_cuts(text, min_len=MIN_LEN, avg_len=AVG_LEN, max_len=MAX_LEN,
             window=WINDOW):
    if not text:
        return []
    g = [(ord(c) * MULT) % P for c in text]
    n = len(g)
    hs = []
    for i in range(1, n + 1):
        a = 0
        for x in g[max(0, i - window):i]:
            a = (a * 31 + x) % P
        hs.append(a)
    div = avg_len - min_len
    cuts, last = [], 0
    for i in range(1, n + 1):
        gap = i - last
        if gap >= min_len and (hs[i - 1] % div == 0 or gap >= max_len):
            cuts.append(i)
            last = i
    if last < n:
        cuts.append(n)
    return cuts


def ref_chunks(text, **kw):
    out, prev = [], 0
    for idx, c in enumerate(ref_cuts(text, **kw), 1):
        body = text[prev:c]
        h = 0
        for ch in body:
            h = (h * 31 + ord(ch)) % P
        out.append((idx, prev + 1, c - prev, h))
        prev = c
    return out


EDGE_DOCS = [
    (1, ""),                      # no chunks
    (2, None),                    # no chunks
    (3, "ab"),                    # shorter than min_len: one tail chunk
    (4, "x" * 400),               # constant content: force cuts only
    (5, "y" * MIN_LEN),           # exactly min_len
    (6, "z" * (MAX_LEN + 1)),     # one past a force boundary
    (7, "The quick brown fox jumps over the lazy dog. " * 12),
]


@pytest.fixture(scope="module")
def docs(spark):
    real = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    edge = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    return real.unionByName(edge.withColumn(
        "doc_id", F.col("doc_id") + 100000)).cache()


def test_chunks_match_reference(spark, docs):
    from pandasvcf_spark.operators.dedup import cdc_chunks

    expect = {}
    for r in docs.collect():
        for (idx, st, ln, h) in ref_chunks(r.text or ""):
            expect[(r.doc_id, idx)] = (st, ln, h)
    got = cdc_chunks(docs).collect()
    assert len(got) == len(expect)
    for r in got:
        assert expect[(r.doc_id, r.chunk_idx)] == (r.start, r.len,
                                                   r.chunk_hash)


def test_with_text_substrings(spark, docs):
    from pandasvcf_spark.operators.dedup import cdc_chunks

    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in cdc_chunks(docs, with_text=True).collect():
        t = texts[r.doc_id]
        assert r.chunk_text == t[r.start - 1:r.start - 1 + r.len]


def test_chunk_length_contract(spark, docs):
    """Every chunk is <= max_len; every NON-final chunk is >= min_len
    (the tail alone may be short); chunks tile the document exactly."""
    from pandasvcf_spark.operators.dedup import cdc_chunks

    rows = cdc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for did, ch in by_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        assert ch[0].start == 1
        for a, b in zip(ch, ch[1:]):
            assert b.start == a.start + a.len
        assert ch[-1].start + ch[-1].len - 1 == len(texts[did])
        for r in ch[:-1]:
            assert MIN_LEN <= r.len <= MAX_LEN
        assert ch[-1].len <= MAX_LEN


def test_shift_resistance(spark):
    """The CDC property: prefixing a document re-syncs boundaries within
    one window, so the shifted copy shares (almost) all chunk hashes —
    where fixed-size blocking shares none."""
    import random

    from pandasvcf_spark.operators.dedup import cdc_chunks

    # Entropy-rich deterministic text: a LOW-entropy/periodic string can
    # have no hash boundaries at all, degrading (correctly) to position-
    # based force cuts, which do NOT survive shifts — the property under
    # test needs content-defined boundaries to exist.
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randint(3, 8)))
        for _ in range(120)
    ]
    base = " ".join(words)[:700]
    assert len(ref_cuts(base)) >= 8  # boundaries are content-defined here
    d = spark.createDataFrame(
        [(1, base), (2, "INSERTED-PREFIX " + base)],
        "doc_id long, text string",
    )
    rows = cdc_chunks(d).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    assert len(h1) >= 8
    # all but the first (edited) chunk re-sync
    assert len(h1 & h2) >= len(h1) - 2
    # fixed-size blocking over the same pair shares nothing
    fixed1 = {base[i:i + 64] for i in range(0, len(base), 64)}
    fixed2 = {("INSERTED-PREFIX " + base)[i:i + 64]
              for i in range(0, len(base) + 16, 64)}
    assert not (fixed1 & fixed2)


def test_deterministic_across_partitioning(spark, docs):
    from pandasvcf_spark.operators.dedup import cdc_chunks

    a = sorted(map(tuple, cdc_chunks(docs).collect()))
    b = sorted(map(tuple, cdc_chunks(docs.repartition(7)).collect()))
    assert a == b


def test_dedup_stats_brute_force(spark):
    from pandasvcf_spark.operators.dedup import cdc_dedup_stats

    import random

    def rand_text(seed, n):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 8)))
            for _ in range(120)
        ]
        return " ".join(words)[:n]

    base = rand_text(11, 520)
    other = rand_text(12, 510)
    d = spark.createDataFrame(
        [(1, base), (2, "SHIFT " + base), (3, other)],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in cdc_dedup_stats(d).collect()}
    # brute force over the reference chunker
    from collections import Counter

    allc = []
    for did, t in [(1, base), (2, "SHIFT " + base), (3, other)]:
        for (idx, st, ln, h) in ref_chunks(t):
            allc.append((did, ln, h))
    copies = Counter(h for (_, _, h) in allc)
    owner = {}
    for (d2, _, h) in allc:
        owner[h] = min(owner.get(h, d2), d2)
    for did in (1, 2, 3):
        mine = [(ln, h) for (d2, ln, h) in allc if d2 == did]
        n_chars = sum(ln for ln, _ in mine)
        dup = [(ln, h) for ln, h in mine if copies[h] > 1]
        foreign = sum(ln for ln, h in mine if owner[h] != did)
        r = stats[did]
        assert r.n_chunks == len(mine)
        assert r.n_chars == n_chars
        assert r.dup_chunks == len(dup)
        assert r.dup_chars == sum(ln for ln, _ in dup)
        assert r.dup_frac == pytest.approx(
            round(sum(ln for ln, _ in dup) / n_chars, 6))
        assert r.foreign_chars == foreign
        assert r.foreign_frac == pytest.approx(
            round(foreign / n_chars, 6))
    # the planted shifted pair actually dedups at chunk level
    assert stats[1].dup_frac > 0.5
    assert stats[2].dup_frac > 0.5
    assert stats[3].dup_frac == 0.0
    # keep-first gate: the ORIGINAL owns every shared chunk (min id),
    # so it passes the foreign_frac drop gate; the shifted copy fails it
    assert stats[1].foreign_frac == 0.0
    assert stats[2].foreign_frac > 0.5


def test_plan_shapes(spark):
    """Chunker: single-stage per-row expression — no exchange, no Python
    eval. Dedup stats: hash-keyed joins only, never a cartesian. Plain
    parquet scan input (the module fixture's limit() would add its own
    GlobalLimit exchange and mask the property)."""
    from pandasvcf_spark.operators.dedup import cdc_chunks, cdc_dedup_stats

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    chunk_plan = cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in chunk_plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert bad not in chunk_plan
    stats_plan = (
        cdc_dedup_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in stats_plan
    assert "BroadcastNestedLoopJoin" not in stats_plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert bad not in stats_plan


def test_param_validation():
    from pandasvcf_spark.operators.dedup import cdc_cuts_expr

    with pytest.raises(ValueError, match="min_len"):
        cdc_cuts_expr("text", min_len=64, avg_len=64, max_len=128)
    with pytest.raises(ValueError, match="min_len"):
        cdc_cuts_expr("text", min_len=32, avg_len=129, max_len=128)
