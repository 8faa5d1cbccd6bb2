"""split_multiallelic (operators/reshape.py): biallelic decomposition of
multi-ALT sites with genotype remapping — hand-built semantic cases plus
invariants on a real 1000G fixture slice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.operators.reshape import split_multiallelic


def _d(spark, rows):
    return spark.createDataFrame(rows, "site long, ALT string, GT string")


def test_split_remaps_genotypes_missing_convention(spark):
    d = _d(spark, [(1, "G,T", "1/2"), (2, "G,T", "0|2"), (3, "C", "0/1")])
    out = {
        (r.site, r.alt_index): (r.alt_allele, r.gt_split)
        for r in split_multiallelic(d).collect()
    }
    assert out == {
        (1, 1): ("G", "1/."),  # allele 2 points at the other alt -> missing
        (1, 2): ("T", "./1"),
        (2, 1): ("G", "0|."),  # phase separator preserved
        (2, 2): ("T", "0|1"),
        (3, 1): ("C", "0/1"),  # biallelic site passes through unchanged
    }


def test_split_ref_convention_haploid_and_missing(spark):
    d = _d(spark, [(1, "G,T", "2"), (2, "G,T", "./1")])
    out = {
        (r.site, r.alt_index): r.gt_split
        for r in split_multiallelic(d, others="ref").collect()
    }
    assert out == {
        (1, 1): "0",  # haploid, other alt -> ref under others='ref'
        (1, 2): "1",
        (2, 1): "./1",  # '.' stays '.', allele 1 IS this alt
        (2, 2): "./0",  # ... and becomes ref in the other record
    }


def test_split_multidigit_allele_indices(spark):
    # 11 alternates: token '10' must match alt_index 10 as a WHOLE token,
    # never via any prefix logic
    alts = ",".join(f"A{i}" for i in range(1, 12))
    d = _d(spark, [(1, alts, "10/11")])
    out = {r.alt_index: r.gt_split for r in split_multiallelic(d).collect()}
    assert len(out) == 11
    assert out[10] == "1/."
    assert out[11] == "./1"
    assert out[1] == "./."


def test_split_validates_others(spark):
    with pytest.raises(ValueError, match="others"):
        split_multiallelic(_d(spark, [(1, "G", "0/1")]), others="zero")


def test_split_real_fixture_invariants(spark):
    """On real 1000G multiallelic sites: output rows = sum of ALT counts,
    and every split genotype only references {0, 1, .}."""
    from pandasvcf_spark.operators.annotate import explode_genotypes
    from pandasvcf_spark.sources.vcf import read_vcf

    kg = "/root/reference/test_data/" \
        "ALL.chr22.phase3_shapeit2_mvncall_integrated_v4.20130502." \
        "genotypes_10k.vcf.gz"
    long = (
        explode_genotypes(read_vcf(spark, kg))
        .withColumn("GT", F.split("call", ":").getItem(0))
        .filter(F.col("ALT").contains(","))
        .limit(2000)
    )
    n_in = long.count()
    assert n_in > 0
    expected = long.select(
        F.sum(F.size(F.split("ALT", ","))).alias("s")
    ).first()["s"]
    out = split_multiallelic(long)
    assert out.count() == expected
    bad = out.filter(
        F.exists(
            F.split("gt_split", r"[/|]"),
            lambda t: ~t.isin("0", "1", "."),
        )
    ).count()
    assert bad == 0


def test_split_a_type_info_fields(spark):
    d = spark.createDataFrame(
        [
            (1, "G,T", "1/2", "AC=5,9;AF=0.1,0.2;DB"),
            (2, "G,T", "0/1", "AC=3"),  # short list -> NULL for alt 2
            (3, "C", "0/1", None),  # missing INFO -> NULLs
        ],
        "site long, ALT string, GT string, INFO string",
    )
    out = {
        (r.site, r.alt_index): (r.AC_split, r.AF_split)
        for r in split_multiallelic(
            d, info_col="INFO", a_fields=["AC", "AF"]
        ).collect()
    }
    assert out == {
        (1, 1): ("5", "0.1"),
        (1, 2): ("9", "0.2"),
        (2, 1): ("3", None),
        (2, 2): (None, None),
        (3, 1): (None, None),
    }


def test_split_a_fields_requires_info_col(spark):
    d = _d(spark, [(1, "G", "0/1")])
    with pytest.raises(ValueError, match="info_col"):
        split_multiallelic(d, a_fields=["AC"])


def test_slice_a_and_r_field_exprs(spark):
    from pandasvcf_spark.functions.genomics import (
        slice_a_field_expr,
        slice_r_field_expr,
    )

    d = spark.createDataFrame(
        [
            (1, "0.1,0.2", "10,3,2", 1),
            (2, "0.1,0.2", "10,3,2", 2),
            (3, "0.1", "10,3", 2),      # short lists -> NULL at index 2
            (4, None, None, 1),          # missing fields -> NULL
        ],
        "id long, af string, ad string, alt_index int",
    )
    out = {
        r.id: (r.af_s, r.ad_s)
        for r in d.select(
            "id",
            slice_a_field_expr("af", F.col("alt_index")).alias("af_s"),
            slice_r_field_expr("ad", F.col("alt_index")).alias("ad_s"),
        ).collect()
    }
    assert out == {
        1: ("0.1", "10,3"),
        2: ("0.2", "10,2"),
        3: (None, None),
        4: (None, None),
    }


def test_slice_fields_compose_with_split(spark):
    """End to end: split a multiallelic site and re-slice a per-call AD
    (Number=R) against each record's alt_index."""
    from pandasvcf_spark.functions.genomics import slice_r_field_expr
    from pandasvcf_spark.operators.reshape import split_multiallelic

    d = spark.createDataFrame(
        [(1, "G,T", "1/2", "12,5,7")],
        "site long, ALT string, GT string, AD string",
    )
    out = {
        r.alt_index: (r.gt_split, r.ad_split)
        for r in split_multiallelic(d)
        .withColumn(
            "ad_split", slice_r_field_expr("AD", F.col("alt_index"))
        )
        .collect()
    }
    assert out == {1: ("1/.", "12,5"), 2: ("./1", "12,7")}


def test_slice_g_field_expr_diploid(spark):
    """PL (Number=G) slicing: the biallelic triple keeps the genotype-
    indexed elements over alleles {0, k} — (0,0), (0,k), (k,k)."""
    from pandasvcf_spark.functions.genomics import slice_g_field_expr

    d = spark.createDataFrame(
        [
            # triallelic PL: indices (0,0)(0,1)(1,1)(0,2)(1,2)(2,2)
            (1, "0,30,40,45,50,60", 1),
            (2, "0,30,40,45,50,60", 2),
            (3, "0,30,40", 1),    # already biallelic: identity for k=1
            (4, "0,30,40", 2),    # too short for k=2 -> NULL
            (5, "0,30", 1),       # haploid-arity fed to diploid -> NULL
            (6, None, 1),         # missing field -> NULL
        ],
        "id long, pl string, alt_index int",
    )
    out = {
        r.id: r.pl_s
        for r in d.select(
            "id", slice_g_field_expr("pl", F.col("alt_index")).alias("pl_s")
        ).collect()
    }
    assert out == {
        1: "0,30,40",
        2: "0,45,60",
        3: "0,30,40",
        4: None,
        5: None,
        6: None,
    }


def test_slice_g_field_expr_haploid(spark):
    from pandasvcf_spark.functions.genomics import slice_g_field_expr

    d = spark.createDataFrame(
        [(1, "0,30,40", 2), (2, "0,30", 2)],
        "id long, gl string, alt_index int",
    )
    out = {
        r.id: r.s
        for r in d.select(
            "id",
            slice_g_field_expr("gl", F.col("alt_index"), ploidy=1).alias("s"),
        ).collect()
    }
    assert out == {1: "0,40", 2: None}


def test_slice_g_field_expr_validates_ploidy(spark):
    from pandasvcf_spark.functions.genomics import slice_g_field_expr

    with pytest.raises(ValueError, match="ploidy"):
        slice_g_field_expr("pl", 1, ploidy=3)


def test_split_with_pl_mixed_format_titin_style(spark):
    """End to end on a titin-shaped mixed FORMAT (GT:DP:AD:PL): split a
    triallelic site and re-slice AD (Number=R) and PL (Number=G) against
    each record's alt_index."""
    from pandasvcf_spark.functions.genomics import (
        slice_g_field_expr,
        slice_r_field_expr,
    )
    from pandasvcf_spark.operators.reshape import split_multiallelic

    d = spark.createDataFrame(
        [(1, "G,T", "1/2", "12,5,7", "90,60,50,45,20,0")],
        "site long, ALT string, GT string, AD string, PL string",
    )
    out = {
        r.alt_index: (r.gt_split, r.ad_split, r.pl_split)
        for r in split_multiallelic(d)
        .withColumn("ad_split", slice_r_field_expr("AD", F.col("alt_index")))
        .withColumn("pl_split", slice_g_field_expr("PL", F.col("alt_index")))
        .collect()
    }
    assert out == {
        1: ("1/.", "12,5", "90,60,50"),
        2: ("./1", "12,7", "90,45,0"),
    }
