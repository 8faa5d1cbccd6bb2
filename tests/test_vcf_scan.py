"""Scan layer (sources/vcf.py) vs reference S1-S5/P1-P4 semantics."""

import os

import pytest

from pandasvcf_spark.sources.vcf import read_vcf, read_vcf_header

from conftest import DATA_DIR

GOLDEN = os.path.join(DATA_DIR, "golden.vcf")
GOLDEN_GZ = os.path.join(DATA_DIR, "golden.vcf.gz")


def test_header_parse():
    h = read_vcf_header(GOLDEN)
    assert h.sample_ids == ["S1", "S2"]
    assert h.columns[:9] == [
        "CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT",
    ]
    kv = dict(h.kv_pairs())
    assert kv["fileformat"] == "VCFv4.1"
    # split on FIRST '=' only: value retains inner '='s (reference S3)
    assert kv["contig"] == "<ID=1,length=249250621,assembly=b37>"
    assert kv["SampleIDs"] == "S1,S2"


def test_header_parse_gz():
    h = read_vcf_header(GOLDEN_GZ)
    assert h.sample_ids == ["S1", "S2"]


@pytest.mark.parametrize("path", [GOLDEN, GOLDEN_GZ])
def test_wide_scan(spark, path):
    df = read_vcf(spark, path)
    rows = {r["POS"]: r for r in df.collect()}
    assert len(rows) == 6
    assert df.schema["POS"].dataType.typeName() == "long"
    assert df.schema["QUAL"].dataType.typeName() == "double"
    assert df.schema["samples"].dataType.typeName() == "map"
    assert rows[100]["QUAL"] == 50.0
    assert rows[200]["QUAL"] is None  # '.' -> NULL (fixes reference int8 bug)
    assert rows[100]["samples"] == {"S1": "0|1:12", "S2": "0|0:7"}
    assert rows[500]["CHROM"] == "X"


def test_sample_subset_and_cols(spark):
    df = read_vcf(spark, GOLDEN, samples=["S2"], cols=["CHROM", "POS", "REF", "ALT", "FORMAT"])
    assert set(df.columns) == {"CHROM", "POS", "REF", "ALT", "FORMAT", "samples"}
    r = {x["POS"]: x for x in df.collect()}
    assert r[100]["samples"] == {"S2": "0|0:7"}
    # out-of-order sample list cannot mislabel (name-based select)
    df2 = read_vcf(spark, GOLDEN, samples=["S2", "S1"])
    r2 = {x["POS"]: x for x in df2.collect()}
    assert r2[100]["samples"]["S1"] == "0|1:12"


def test_unknown_sample_raises(spark):
    with pytest.raises(ValueError):
        read_vcf(spark, GOLDEN, samples=["NOPE"])


def test_global_dedup(spark, tmp_path):
    src = open(GOLDEN).read()
    dup_line = [l for l in src.splitlines() if l.startswith("1\t100")][0]
    p = tmp_path / "dup.vcf"
    p.write_text(src + dup_line + "\n")
    # dedup is opt-in (default off: a full raw-text shuffle at scale)
    assert read_vcf(spark, str(p), dedup=True).count() == 6
    assert read_vcf(spark, str(p)).count() == 7


def _write_shards(tmp_path, n_shards=2, gz=False, mutate_header=None):
    """Split golden.vcf's body across n shards, each carrying the full
    header block."""
    import gzip as gz_mod

    lines = open(GOLDEN).read().splitlines()
    header = [ln for ln in lines if ln.startswith("#")]
    body = [ln for ln in lines if ln and not ln.startswith("#")]
    paths = []
    for i in range(n_shards):
        chunk = body[i::n_shards]
        hdr = list(header)
        if mutate_header and i == n_shards - 1:
            hdr[-1] = mutate_header
        text = "\n".join(hdr + chunk) + "\n"
        p = tmp_path / f"shard_{i}.vcf{'.gz' if gz else ''}"
        if gz:
            with gz_mod.open(p, "wt") as fh:
                fh.write(text)
        else:
            p.write_text(text)
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("gz", [False, True])
def test_multi_file_shards_equal_single(spark, tmp_path, gz):
    """A directory / glob / list of shards must parse row-for-row equal to
    the single-file read (reference is single-file only, pandasvcf.py:94-99;
    sharded ingest is the engine's parallel route around non-splittable
    .gz)."""
    shards = _write_shards(tmp_path, gz=gz)
    single = read_vcf(spark, GOLDEN).collect()

    def key(rows):
        return sorted(tuple(str(x) for x in r) for r in rows)

    want = key(single)
    assert key(read_vcf(spark, shards).collect()) == want  # explicit list
    assert key(read_vcf(spark, str(tmp_path)).collect()) == want  # directory
    assert (
        key(read_vcf(spark, str(tmp_path / "shard_*.vcf*")).collect()) == want
    )  # glob


def test_multi_file_mismatched_header_raises(spark, tmp_path):
    """Shards whose '#CHROM' lines disagree (different samples/order) must
    be rejected driver-side — indices drive the parse, so a reordered shard
    would silently mislabel calls."""
    shards = _write_shards(
        tmp_path,
        mutate_header="#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS2\tS1",
    )
    with pytest.raises(ValueError, match="different '#CHROM' header"):
        read_vcf(spark, shards)


def test_write_vcf_roundtrip(spark, tmp_path):
    """read -> write (sharded) -> read must be DataFrame-identical: every
    shard carries the full header, so the directory reads back through the
    multi-file path; QUAL text may differ ('50' vs '50.0') but re-parses to
    the same double."""
    from pandasvcf_spark.sources.vcf import read_vcf_header, write_vcf

    wide = read_vcf(spark, GOLDEN)
    header = read_vcf_header(GOLDEN)
    out = str(tmp_path / "export")
    write_vcf(wide, out, header, n_shards=2)

    import glob as _glob

    parts = sorted(_glob.glob(out + "/part-*"))
    assert len(parts) == 2
    for p in parts:
        lines = open(p).read().splitlines()
        assert lines[0].startswith("##fileformat")
        assert any(ln.startswith("#CHROM") for ln in lines)

    # text writer emits .txt-less part files; read them back as a list
    back = read_vcf(spark, parts)

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert key(back) == key(wide)
    # directory read-back also works (part-* files resolve in dir mode)
    assert key(read_vcf(spark, out)) == key(wide)


def test_write_vcf_sorted_honors_n_shards(spark, tmp_path):
    """sort=True with n_shards must produce exactly n_shards range-sorted
    shard files (an earlier revision let the orderBy's shuffle-partition
    count silently override n_shards), and concatenating the shards in
    filename order must be globally CHROM/POS sorted."""
    import glob as _glob

    from pandasvcf_spark.sources.vcf import read_vcf_header, write_vcf

    wide = read_vcf(spark, GOLDEN)
    header = read_vcf_header(GOLDEN)
    out = str(tmp_path / "sorted_export")
    write_vcf(wide, out, header, n_shards=4, sort=True)

    parts = sorted(_glob.glob(out + "/part-*"))
    assert len(parts) == 4
    body_rows = []
    for p in parts:
        for ln in open(p).read().splitlines():
            assert ln != ""  # no stray blank lines
            if not ln.startswith("#"):
                f = ln.split("\t")
                body_rows.append((f[0], int(f[1])))
    assert body_rows == sorted(body_rows)  # global order across shards
    assert len(body_rows) == wide.count()

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert key(read_vcf(spark, out)) == key(wide)


def test_write_vcf_more_shards_than_rows(spark, tmp_path):
    """n_shards > rows: empty partitions still emit the full header, so
    every shard is a valid standalone VCF and the directory reads back."""
    import glob as _glob

    from pandasvcf_spark.sources.vcf import read_vcf_header, write_vcf

    wide = read_vcf(spark, GOLDEN).limit(3)
    header = read_vcf_header(GOLDEN)
    out = str(tmp_path / "tiny_export")
    write_vcf(wide, out, header, n_shards=8)

    parts = sorted(_glob.glob(out + "/part-*"))
    assert len(parts) == 8
    for p in parts:
        lines = open(p).read().splitlines()
        assert lines[0].startswith("##fileformat")
        assert any(ln.startswith("#CHROM") for ln in lines)

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert key(read_vcf(spark, out)) == key(wide)


def test_read_vcf_bgzf_forced_multi_file(spark, tmp_path):
    """bgzf=True with a shard LIST must read every shard through the
    splittable source (an earlier revision silently read only files[0])."""
    from pandasvcf_spark.sources.bgzf import write_bgzf

    raw = open(GOLDEN, "rb").read().splitlines(keepends=True)
    header = b"".join(ln for ln in raw if ln.startswith(b"#"))
    body = [ln for ln in raw if not ln.startswith(b"#")]
    mid = len(body) // 2
    p1 = str(tmp_path / "shard_a.vcf.gz")
    p2 = str(tmp_path / "shard_b.vcf.gz")
    write_bgzf(p1, header + b"".join(body[:mid]), block_raw_bytes=128)
    write_bgzf(p2, header + b"".join(body[mid:]), block_raw_bytes=128)

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    want = key(read_vcf(spark, GOLDEN))
    assert key(read_vcf(spark, [p1, p2], bgzf=True)) == want
