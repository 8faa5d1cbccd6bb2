"""End-to-end VCF parity goldens on the REAL reference fixtures — the
SURVEY §5 test-plan item ("assert the notebook goldens", SURVEY.md:385)
and the round-8 verdict's Missing #1: BASELINE.md's numbers come from
the reference's own notebook run (reference Pandas_VCF_multi_sample.ipynb
on ALL.chr22...genotypes_10k), and until pinned here a regression in the
P7/P8/F5 interplay on real multi-sample data could slip past the
micro-fixture goldens. One annotate_vcf pass per fixture; the histogram
job's sum doubles as the row-count golden (vartype2 is never null)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

KG = (
    "/root/reference/test_data/"
    "ALL.chr22.phase3_shapeit2_mvncall_integrated_v4.20130502"
    ".genotypes_10k.vcf.gz"
)
TITIN = "/root/reference/test_data/SWGR_titin.vcf.gz"


@pytest.mark.golden
@pytest.mark.skipif(not os.path.exists(KG), reason="1000G fixture absent")
def test_1000g_notebook_goldens(spark):
    """9,755 sites x 2,504 samples, drop_hom_ref=True: exactly 755,801
    output calls with the exact notebook vartype2 histogram
    (BASELINE.md goldens: snp=483,986 / ref=244,660 / del=19,604 /
    ins=7,551 — 'ref' here are non-hom-ref calls whose ALT allele is
    not carried, the reference's own labeling)."""
    from pandasvcf_spark.operators import annotate_vcf

    ann = annotate_vcf(spark, KG, drop_hom_ref=True)
    hist = {
        r["vartype2"]: r["n"]
        for r in ann.groupBy("vartype2")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert hist == {
        "snp": 483986,
        "ref": 244660,
        "del": 19604,
        "ins": 7551,
    }
    assert sum(hist.values()) == 755801


@pytest.mark.golden
@pytest.mark.skipif(
    not os.path.exists(TITIN), reason="titin fixture absent"
)
def test_titin_row_golden(spark):
    """5,717 sites x 454 samples, messy FORMAT and heavy missingness:
    57,038 calls survive drop_hom_ref=True (the verify-recipe golden)."""
    from pandasvcf_spark.operators import annotate_vcf

    ann = annotate_vcf(spark, TITIN, drop_hom_ref=True)
    assert ann.count() == 57038
