"""merge_vcf_panels (operators/reshape.py): cohort-merge semantics on the
real titin fixture — a round-trip split/merge equality and the missing-fill
path when one panel lacks sites."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasvcf_spark.operators.reshape import merge_vcf_panels
from pandasvcf_spark.sources.vcf import read_vcf, read_vcf_header

TITIN = "/root/reference/test_data/SWGR_titin.vcf.gz"


def _panels(spark, n=60):
    # a 60-sample slice keeps the suite fast; panel width doesn't change
    # the merge semantics under test
    header = read_vcf_header(TITIN)
    samples = header.sample_ids[:n]
    half = n // 2
    a = read_vcf(spark, TITIN, samples=samples[:half])
    b = read_vcf(spark, TITIN, samples=samples[half:])
    return a, b, samples[:half], samples[half:]


def test_merge_panels_roundtrip_equals_original(spark):
    """Splitting a real panel in half and merging back reproduces the
    original wide table exactly (every site present in both halves, so
    no fill path fires)."""
    a, b, sa, sb = _panels(spark)
    merged = merge_vcf_panels(a, b, sa, sb)
    orig = read_vcf(spark, TITIN, samples=sa + sb)
    m = merged.select(
        "CHROM", "POS", "REF", "ALT", F.map_entries("samples").alias("e")
    )
    o = orig.select(
        "CHROM", "POS", "REF", "ALT", F.map_entries("samples").alias("e")
    )
    assert m.count() == o.count()
    # exact per-site sample-map equality via exceptAll both ways
    assert m.exceptAll(o).count() == 0
    assert o.exceptAll(m).count() == 0


def test_merge_panels_missing_fill(spark):
    """Dropping the even-POS sites from panel B: merged rows at those
    sites carry './.' for every B sample and real calls for A."""
    a, b, sa, sb = _panels(spark)
    b_holes = b.filter(F.col("POS") % 2 == 1)
    merged = merge_vcf_panels(a, b_holes, sa, sb)
    assert merged.count() == a.count()  # site universe = A's (B ⊆ A)
    even = merged.filter(F.col("POS") % 2 == 0)
    n_even = even.count()
    assert n_even > 0
    filled = even.filter(
        F.col("samples")[sb[0]].eqNullSafe("./.")
        & F.col("samples")[sb[-1]].eqNullSafe("./.")
        & ~F.col("samples")[sa[0]].isNull()
    )
    assert filled.count() == n_even
    # sample universe intact on every row
    assert (
        merged.filter(F.size("samples") != len(sa) + len(sb)).count() == 0
    )
