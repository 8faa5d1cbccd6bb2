"""Tabix-indexed region reads (sources/tabix.py): the pruned route must
be row-identical to the full-scan route (same exact filter, different
bytes touched), and must actually touch a strict subset of the file."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.sources.tabix import (
    parse_region,
    read_tabix,
    reg2bins,
    region_chunks,
)
from pandasvcf_spark.sources.vcf import read_vcf

KG = (
    "/root/reference/test_data/"
    "ALL.chr22.phase3_shapeit2_mvncall_integrated_v4.20130502.genotypes_10k.vcf.gz"
)
TITIN = "/root/reference/test_data/SWGR_titin.vcf.gz"

needs_kg = pytest.mark.skipif(
    not os.path.exists(KG + ".tbi"), reason="1000G fixture absent"
)


def test_parse_region():
    assert parse_region("22") == ("22", None, None)
    assert parse_region("chr2:100-200") == ("chr2", 100, 200)
    assert parse_region("22:16,050,075-16,654,125") == ("22", 16050075, 16654125)
    assert parse_region("22:500") == ("22", 500, 500)
    with pytest.raises(ValueError):
        parse_region("22:200-100")


def test_reg2bins_smallest_level():
    # a 1 bp interval hits exactly one bin per level (6 levels)
    assert len(reg2bins(16050074, 16050075)) == 6
    # bin 0 always included; level-5 bin for pos p is 4681 + (p >> 14)
    assert 4681 + (16050074 >> 14) in reg2bins(16050074, 16050075)


@needs_kg
def test_tbi_parse_reference_fixture():
    idx = read_tabix(KG + ".tbi")
    assert idx.names == ["22"]
    assert idx.preset == 2  # VCF
    assert idx.ref_id("22") == 0
    assert idx.ref_id("chr22") == 0  # lenient naming
    assert idx.ref_id("21") is None
    assert len(idx.intervals[0]) > 0
    # chunk voffsets strictly within the compressed file
    size = os.path.getsize(KG)
    for chunks in idx.bins[0].values():
        for vbeg, vend in chunks:
            assert 0 <= (vbeg >> 16) < size
            assert (vend >> 16) <= size


@needs_kg
@pytest.mark.parametrize(
    "region",
    [
        "22:16050075-16060000",  # file start
        "22:16500000-16654125",  # interior window
        "chr22:16300000-16300500",  # tiny + chr-prefixed query name
        "22",  # whole contig
        "21:1-999999999",  # absent contig -> empty
    ],
)
def test_region_read_equals_full_scan_filter(spark, tmp_path, region):
    """Pruned (tabix) route vs full-scan route — IDENTICAL rows. The
    full-scan route is forced by hiding the .tbi (copy without sidecar),
    so both sides run the same exact post-parse filter and differ only
    in pruning."""
    noidx = str(tmp_path / "noidx.vcf.gz")
    if not os.path.exists(noidx):
        shutil.copyfile(KG, noidx)

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    # 2-sample subset: same scan/parse/filter code paths, ~1000x less
    # data to collect than the full 2,504-sample panel
    two = ["HG00096", "HG00097"]
    pruned = read_vcf(spark, KG, region=region, samples=two)
    full = read_vcf(spark, noidx, region=region, samples=two)
    kp, kf = key(pruned), key(full)
    assert kp == kf
    if region.startswith("21"):
        assert kp == []
    else:
        assert len(kp) > 0


@needs_kg
def test_region_pruning_touches_subset_of_blocks():
    """The merged chunk ranges for a small window must span far fewer
    compressed bytes than the file — otherwise the index isn't pruning."""
    idx = read_tabix(KG + ".tbi")
    vr = region_chunks(idx, 0, 16050074, 16060000)
    assert vr  # non-empty
    assert vr == sorted(vr)
    span = sum((ve >> 16) - (vb >> 16) + (1 << 16) for vb, ve in vr)
    assert span < os.path.getsize(KG) / 2, span
    # whole-contig query covers everything the linear index knows about
    vr_all = region_chunks(idx, 0, 0, 1 << 29)
    assert (vr_all[-1][1] >> 16) >= (vr[-1][1] >> 16)


@needs_kg
def test_region_with_sample_subset(spark):
    """Region pruning composes with sample pruning."""
    df = read_vcf(
        spark, KG, samples=["HG00096", "HG00097"], region="22:16050075-16055000"
    )
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert 16050075 <= r["POS"] <= 16055000 or r["POS"] < 16050075
        assert set(r["samples"].keys()) == {"HG00096", "HG00097"}


@pytest.mark.skipif(
    not os.path.exists(TITIN + ".tbi"), reason="titin fixture absent"
)
def test_region_titin_fixture(spark, tmp_path):
    """Second real index (different contig naming / density)."""
    idx = read_tabix(TITIN + ".tbi")
    name = idx.names[0]
    noidx = str(tmp_path / "titin_noidx.vcf.gz")
    shutil.copyfile(TITIN, noidx)
    # pick a window around the first record
    first_pos = read_vcf(spark, TITIN).agg(F.min("POS")).collect()[0][0]
    region = f"{name}:{first_pos}-{first_pos + 20000}"

    def key(df):
        return sorted(tuple(str(x) for x in r) for r in df.collect())

    assert key(read_vcf(spark, TITIN, region=region)) == key(
        read_vcf(spark, noidx, region=region)
    )


def test_annotate_vcf_region_passthrough(spark):
    """annotate_vcf(region=...) ≡ full annotate + POS filter on the 1000G
    fixture (SNV-dominated, so overlap == POS-in-range here)."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators import annotate_vcf

    kg = ("/root/reference/test_data/ALL.chr22.phase3_shapeit2_mvncall_"
          "integrated_v4.20130502.genotypes_10k.vcf.gz")
    reg = annotate_vcf(spark, kg, region="22:16050075-16104125")
    full = annotate_vcf(spark, kg).filter(
        F.col("POS").between(16050075, 16104125)
    )
    n = reg.count()
    assert n > 0
    assert n == full.count()
