"""Annotation pipeline vs the reference-verified goldens (SURVEY §8.4).

Every expected value below was produced by EXECUTING the reference
implementation on the same input during the survey — these are behavioral
goldens, not aspirational.
"""

import os

from pandasvcf_spark.operators.annotate import annotate_vcf

from conftest import DATA_DIR

GOLDEN = os.path.join(DATA_DIR, "golden.vcf")
SPLIT = os.path.join(DATA_DIR, "split_cols.vcf")

# (POS, sample) -> (GT, mult, GT1, GT2, a1, a2, phase, zyg, vt1, vt2, hrc, DP)
EXPECTED = {
    (100, "S1"): ("0|1", 0, 0, 1, "A", "G", "|", "het-ref", "ref", "snp", 1, "12"),
    (100, "S2"): ("0|0", 0, 0, 0, "A", "A", "|", "hom-ref", "ref", "ref", 1, "7"),
    (200, "S1"): ("1|2", 1, 1, 2, "G", "T", "|", "het-alt", "snp", "snp", 1, "30"),
    (200, "S2"): ("0|0", 1, 0, 0, "A", "A", "|", "hom-ref", "ref", "ref", 1, "9"),
    (300, "S1"): ("1/1", 0, 1, 1, "A", "A", "/", "hom-alt", "del", "del", 0, None),
    (500, "S1"): ("1", 0, 1, None, "A", ".", "-", "het-miss", "snp", "snp", 0, None),
    (500, "S2"): ("0", 0, 0, None, "G", ".", "-", "het-miss", "ref", "snp", 0, None),
    (600, "S1"): ("./1", 0, None, 1, ".", "CTT", "/", "het-miss", "snp", "ins", 1, None),
    (600, "S2"): ("0/0", 0, 0, 0, "C", "C", "/", "hom-ref", "ref", "ref", 1, None),
}

FIELDS = ["GT", "multiallele", "GT1", "GT2", "a1", "a2", "phase",
          "zygosity", "vartype1", "vartype2", "hom_ref_counts", "DP"]


def test_golden_full(spark):
    df = annotate_vcf(spark, GOLDEN, drop_hom_ref=False)
    got = {(r["POS"], r["sample_ids"]): tuple(r[f] for f in FIELDS)
           for r in df.collect()}
    # site 1:400 (ALT='.') dropped by P5; 1:300 S2 ('./.') dropped by P7
    assert set(got) == set(EXPECTED)
    for key in EXPECTED:
        assert got[key] == EXPECTED[key], f"mismatch at {key}: {got[key]}"


def test_golden_drop_hom_ref(spark):
    df = annotate_vcf(spark, GOLDEN)  # drop_hom_ref defaults True
    got = {(r["POS"], r["sample_ids"]): tuple(r[f] for f in FIELDS)
           for r in df.collect()}
    expected = {k: v for k, v in EXPECTED.items() if v[7] != "hom-ref"}
    assert set(got) == set(expected)
    for key in expected:  # hom_ref_counts computed pre-drop, so unchanged
        assert got[key] == expected[key]


def test_passthrough_cols(spark):
    # QUAL/FILTER/INFO kept (documented intent; reference silently drops them
    # — SURVEY §8.1)
    df = annotate_vcf(spark, GOLDEN, drop_hom_ref=False)
    r = {(x["POS"], x["sample_ids"]): x for x in df.collect()}
    assert r[(100, "S1")]["QUAL"] == 50.0
    assert r[(100, "S1")]["INFO"] == "AC=1"
    assert r[(100, "S1")]["FORMAT"] == "GT:DP"
    assert r[(300, "S1")]["QUAL"] is None


def test_split_columns(spark):
    df = annotate_vcf(
        spark, SPLIT, drop_hom_ref=False, split_columns={"AD": 2, "HQ": 2}
    )
    assert "AD" not in df.columns and "HQ" not in df.columns
    for c in ["AD_0", "AD_1", "HQ_0", "HQ_1"]:
        assert c in df.columns
    r = {(x["POS"], x["sample_ids"]): x for x in df.collect()}
    assert r[(100, "SA")]["AD_0"] == "10"
    assert r[(100, "SA")]["AD_1"] == "5"
    assert r[(100, "SA")]["HQ_0"] == "40"
    assert r[(100, "SB")]["HQ_1"] == "58"
    # chr prefix stripped (anchored F1)
    assert r[(100, "SA")]["CHROM"] == "1"


def test_split_columns_skips_n1(spark):
    df = annotate_vcf(spark, SPLIT, drop_hom_ref=False, split_columns={"AD": 1})
    assert "AD" in df.columns and "AD_0" not in df.columns


def test_row_identity_invariant(spark):
    # per site with n samples: rows_out(drop=False) + dropped_missing = n;
    # ALT='.' sites emit 0 rows (FIXTURES §4)
    df = annotate_vcf(spark, GOLDEN, drop_hom_ref=False)
    per_site = {r["POS"]: r["cnt"] for r in
                df.groupBy("POS").count().withColumnRenamed("count", "cnt").collect()}
    assert per_site == {100: 2, 200: 2, 300: 1, 500: 2, 600: 2}


def test_info_fields_extraction(spark):
    """Typed INFO parsing (str_to_map engine scope — the reference leaves
    INFO opaque, SURVEY.md:184-186)."""
    from pandasvcf_spark.operators.annotate import annotate_vcf

    ann = annotate_vcf(
        spark, GOLDEN, drop_hom_ref=False,
        info_fields={"AC": "int", "AF": "double", "MISSING_KEY": "int"},
    )
    r = {(row["POS"], row["sample_ids"]): row for row in ann.collect()}
    assert r[(100, "S1")]["AC"] == 1
    assert r[(100, "S1")]["MISSING_KEY"] is None
    # INFO='.' rows parse to empty map -> NULLs, no errors
    assert r[(200, "S1")]["AC"] is None


def test_compat_facade_matches_direct_pipeline(spark):
    """The reference-shaped VCF class produces the same annotated table as
    the direct operator pipeline (drop-in migration path)."""
    from pandasvcf_spark.compat import VCF
    from pandasvcf_spark.operators.annotate import annotate_vcf

    vcf = VCF(GOLDEN, spark=spark)
    hdr = {r["key"]: r["value"] for r in vcf.get_header_df().collect()}
    assert "SampleIDs" in hdr and hdr["SampleIDs"] == "S1,S2"

    assert not vcf.stopIteration
    wide = vcf.get_vcf_df_chunk()
    assert vcf.stopIteration  # whole file in one lazy pass
    assert wide.count() == 6

    vcf.add_variant_annotations(drop_hom_ref=True)
    got = sorted(map(tuple, vcf.df_annot.collect()))
    want = sorted(map(tuple, annotate_vcf(spark, GOLDEN, drop_hom_ref=True).collect()))
    assert got == want

    # inplace=True replaces .df, reference behavior
    vcf2 = VCF(GOLDEN, spark=spark)
    vcf2.add_variant_annotations(inplace=True, drop_hom_ref=False)
    assert "zygosity" in vcf2.df.columns

    # dedup is a façade-level opt-out: skipping the global dedup shuffle
    # must not change a duplicate-free file's row count
    vcf3 = VCF(GOLDEN, spark=spark, dedup=False)
    assert vcf3.get_vcf_df_chunk().count() == 6


def test_compat_vcf_metadata_header_parity():
    """VCFMetadata (reference vcf_metadata.py:4-25 call shape): gzip
    detection, newline-terminated raw header lines, '#CHROM'->'CHROM'
    rewrite — without the reference's tabix subprocess or index-building
    side effect."""
    from pandasvcf_spark.compat import VCFMetadata

    m = VCFMetadata(
        "/root/reference/test_data/SWGR_titin.vcf.gz"
    )
    assert m.compression == "gzip"
    assert m.header[0].startswith("##fileformat=")
    assert m.header[-1].startswith("CHROM\t")  # reference's rewrite
    assert all(line.endswith("\n") for line in m.header)
    assert not any("#CHROM" in line for line in m.header)


def test_zygosity_hemi_mode(spark):
    """haploid='hemi' (SURVEY §7.2 opt-in): true haploid calls become
    hemi-ref/hemi-alt/hemi-miss; diploid rows are byte-identical to the
    default reference-parity classification; bad mode rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandasvcf_spark.functions.genomics import zygosity_expr

    rows = [
        # a1, a2, haploid
        ("A", ".", True),   # hemi-ref
        ("G", ".", True),   # hemi-alt
        (".", ".", True),   # hemi-miss
        ("A", "G", False),  # het-ref (diploid, untouched)
        ("A", ".", False),  # het-miss (diploid missing-second, untouched)
    ]
    df = spark.createDataFrame(rows, "a1 string, a2 string, h boolean")
    hemi = [
        r[0]
        for r in df.select(
            zygosity_expr(
                F.col("a1"), F.col("a2"), F.lit("A"),
                haploid=F.col("h"), haploid_mode="hemi",
            )
        ).collect()
    ]
    assert hemi == ["hemi-ref", "hemi-alt", "hemi-miss", "het-ref", "het-miss"]
    base = [
        r[0]
        for r in df.select(
            zygosity_expr(F.col("a1"), F.col("a2"), F.lit("A"))
        ).collect()
    ]
    assert base == ["het-miss", "het-miss", "hom-miss", "het-ref", "het-miss"]
    with _pytest.raises(ValueError, match="haploid_mode"):
        zygosity_expr(
            F.col("a1"), F.col("a2"), F.lit("A"),
            haploid=F.col("h"), haploid_mode="bogus",
        )


def test_sample_qc_real_fixture(spark):
    """sample_qc over the titin callset (454 real samples): rates are
    well-formed, denominators consistent, and a hand-check of one sample
    agrees with a direct filter count."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators import annotate_vcf
    from pandasvcf_spark.operators.annotate import sample_qc

    ann = annotate_vcf(
        spark, "/root/reference/test_data/SWGR_titin.vcf.gz"
    )
    qc = sample_qc(ann).cache()
    assert qc.count() == 454
    bad = qc.filter(
        (F.col("call_rate") < 0) | (F.col("call_rate") > 1)
        | (F.col("n_called") > F.col("n_sites"))
    ).count()
    assert bad == 0
    one = qc.orderBy("sample_ids").first()
    direct_called = ann.filter(
        (F.col("sample_ids") == one["sample_ids"])
        & ~F.col("zygosity").contains("miss")
    ).count()
    assert one["n_called"] == direct_called
    qc.unpersist()


def test_is_transition_expr_cases(spark):
    from pyspark.sql import functions as F

    from pandasvcf_spark.functions.genomics import is_transition_expr

    rows = [
        ("A", "G", True), ("G", "A", True), ("C", "T", True), ("T", "C", True),
        ("A", "C", False), ("A", "T", False), ("G", "C", False),
        ("G", "T", False), ("C", "A", False), ("T", "G", False),
        ("A", "A", None),   # not a variant
        ("AT", "A", None),  # indel
        (".", "G", None), ("A", "<DEL>", None),
    ]
    d = spark.createDataFrame(
        [(r, a) for r, a, _ in rows], "ref string, alt string"
    )
    got = [
        r.ts for r in d.select(is_transition_expr("ref", "alt").alias("ts")).collect()
    ]
    assert got == [e for _, _, e in rows]


def test_genotype_concordance_hand_cases(spark):
    """Phase-insensitive matching, missing exclusion, one-sided calls."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import genotype_concordance

    def d(rows):
        return spark.createDataFrame(
            rows, "CHROM string, POS long, REF string, ALT string, "
                  "sample_ids string, GT string"
        )

    a = d([
        ("1", 1, "A", "G", "s1", "0|1"),   # matches 1/0 phase-insensitively
        ("1", 2, "A", "G", "s1", "1/1"),   # mismatch vs 0/1
        ("1", 3, "A", "G", "s1", "./1"),   # missing in a -> not comparable
        ("1", 4, "A", "G", "s1", "0/0"),   # only in a
        ("1", 1, "A", "G", "s2", "0/0"),   # s2: single comparable match
    ])
    b = d([
        ("1", 1, "A", "G", "s1", "1/0"),
        ("1", 2, "A", "G", "s1", "0/1"),
        ("1", 3, "A", "G", "s1", "0/1"),
        ("1", 5, "A", "G", "s1", "1/1"),   # only in b
        ("1", 1, "A", "G", "s2", "0|0"),
    ])
    out = {
        r.sample_ids: (r.n_a, r.n_b, r.n_comparable, r.n_match, r.concordance)
        for r in genotype_concordance(a, b).collect()
    }
    assert out["s1"] == (3, 4, 2, 1, 0.5)
    assert out["s2"] == (1, 1, 1, 1, 1.0)


def test_genotype_concordance_self_is_perfect(spark):
    """A callset against itself: concordance 1.0 for every sample on the
    real titin fixture (restricted to a slice for speed)."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators import annotate_vcf
    from pandasvcf_spark.operators.annotate import genotype_concordance

    ann = annotate_vcf(
        spark, "/root/reference/test_data/SWGR_titin.vcf.gz",
        drop_hom_ref=False,
    ).select("CHROM", "POS", "REF", "ALT", "sample_ids", "GT").limit(20000)
    out = genotype_concordance(ann, ann)
    assert out.filter(F.col("concordance") != 1.0).count() == 0
    assert out.filter(F.col("n_comparable") != F.col("n_a")).count() == 0


def test_hwe_stats_hand_cases(spark):
    """Known chi-squares: exact equilibrium scores 0, a fixed site scores
    0 (not NULL), all-het scores n, missing/haploid calls are excluded,
    zero-called sites yield NULL stats."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import hwe_stats

    rows = (
        # site 1: perfect HWE at p=0.5 over 4 calls: 1 AA, 2 het, 1 GG
        [(1, "A", "A"), (1, "A", "G"), (1, "G", "A"), (1, "G", "G")]
        # site 2: fixed ref (p=1) -> expected het/hom_alt are 0 -> chi2 0
        + [(2, "A", "A")] * 3
        # site 3: ALL het over 8 calls -> chi2 = n = 8 (classic extreme)
        + [(3, "A", "G")] * 8
        # site 4: only missing / half-calls -> excluded -> NULL row
        + [(4, ".", "."), (4, "A", "."), (4, None, "G")]
    )
    d = spark.createDataFrame(rows, "site long, a1 string, a2 string")
    d = d.withColumn("REF", F.lit("A"))
    out = {r.site: r for r in hwe_stats(d, ["site"]).collect()}
    s1 = out[1]
    assert (s1.n_hom_ref, s1.n_het, s1.n_hom_alt) == (1, 2, 1)
    assert s1.chi2 == 0.0 and s1.af_alt == 0.5
    s2 = out[2]
    assert (s2.n_hom_ref, s2.chi2, s2.af_alt) == (3, 0.0, 0.0)
    s3 = out[3]
    assert (s3.n_het, s3.n_called) == (8, 8)
    assert s3.chi2 == 8.0 and s3.af_alt == 0.5
    s4 = out[4]
    assert (s4.n_called, s4.af_alt, s4.chi2) == (0, None, None)


def test_mendel_check_hand_cases(spark):
    """Transmission rules: both-parents-contribute passes (either
    assignment), impossible child allele flags a violation, any missing
    allele or absent member is incomplete."""
    from pandasvcf_spark.operators.annotate import mendel_check

    rows = [
        # site 1: child A/G, father A/A, mother G/G -> consistent
        (1, "c", "A", "G"), (1, "f", "A", "A"), (1, "m", "G", "G"),
        # site 2: child G/G, father A/A, mother A/G -> violation
        #         (father cannot contribute a G)
        (2, "c", "G", "G"), (2, "f", "A", "A"), (2, "m", "A", "G"),
        # site 3: swapped-assignment consistency: child G/A with
        #         father G/G, mother A/A (c1 from father, c2 from mother)
        (3, "c", "G", "A"), (3, "f", "G", "G"), (3, "m", "A", "A"),
        # site 4: missing child allele -> incomplete
        (4, "c", "A", "."), (4, "f", "A", "A"), (4, "m", "A", "A"),
        # site 5: mother absent entirely -> incomplete
        (5, "c", "A", "A"), (5, "f", "A", "A"),
    ]
    d = spark.createDataFrame(rows, "site long, s string, a1 string, a2 string")
    out = {
        r.site: r.status
        for r in mendel_check(d, ["site"], "s", "c", "f", "m").collect()
    }
    assert out == {
        1: "consistent",
        2: "violation",
        3: "consistent",
        4: "incomplete",
        5: "incomplete",
    }


def test_af_spectrum_hand_case(spark):
    """SFS cells: a fully-called 3-sample locus set with known allele
    counts; an incomplete site lands in its own an stratum."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import af_spectrum

    rows = [
        # site 1: AA, AG, GG -> an 6, ac 3
        (1, "A", "A"), (1, "A", "G"), (1, "G", "G"),
        # site 2: AA, AA, AA -> an 6, ac 0
        (2, "A", "A"), (2, "A", "A"), (2, "A", "A"),
        # site 3: AG, AG, GG -> an 6, ac 4
        (3, "A", "G"), (3, "G", "A"), (3, "G", "G"),
        # site 4: one called het + one missing -> an 2, ac 1
        (4, "A", "G"), (4, ".", "."),
    ]
    d = spark.createDataFrame(rows, "site long, a1 string, a2 string")
    d = d.withColumn("REF", F.lit("A"))
    got = {(r.an, r.ac): r.n_sites for r in af_spectrum(d, ["site"]).collect()}
    assert got == {(6, 3): 1, (6, 0): 1, (6, 4): 1, (2, 1): 1}


def test_ld_r2_hand_cases_and_plan(spark):
    """Perfect LD (identical or mirrored dosages) scores 1; monomorphic
    sites NULL; out-of-window pairs absent; pairwise deletion uses only
    common samples; the plan is a banded equi-join (no theta join)."""
    from pandasvcf_spark.operators.ld import ld_r2

    dos = {
        10: [0, 1, 2, 0, 1, 2],
        15: [0, 1, 2, 0, 1, 2],      # identical -> r2 1
        20: [2, 1, 0, 2, 1, 0],      # mirrored  -> r2 1 (r = -1)
        25: [0, 0, 0, 0, 0, 0],      # monomorphic -> NULL
        200: [0, 1, 2, 0, 1, 2],     # out of window
    }
    rows = [
        (pos, pos, s, d)
        for pos, ds in dos.items()
        for s, d in enumerate(ds)
    ]
    d = spark.createDataFrame(rows, "site long, pos long, sample int, dosage int")
    out = ld_r2(d, "site", "pos", "sample", "dosage", max_dist=50)
    got = {(r.site_a, r.site_b): r.r2 for r in out.collect()}
    assert got == {
        (10, 15): 1.0, (10, 20): 1.0, (10, 25): None,
        (15, 20): 1.0, (15, 25): None, (20, 25): None,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ld_r2_pairwise_deletion_and_known_value(spark):
    """A sample missing at one site drops from that pair only; a hand
    2x2 case gives the textbook r2."""
    from pandasvcf_spark.operators.ld import ld_r2

    rows = [
        # site 1: samples 0..3 called; site 2: sample 3 missing
        (1, 1, 0, 0), (1, 1, 1, 1), (1, 1, 2, 2), (1, 1, 3, 2),
        (2, 2, 0, 0), (2, 2, 1, 2), (2, 2, 2, 2), (2, 2, 3, None),
    ]
    d = spark.createDataFrame(rows, "site long, pos long, sample int, dosage int")
    out = ld_r2(d, "site", "pos", "sample", "dosage", max_dist=10).collect()
    assert len(out) == 1 and out[0].n_samples == 3
    # common samples (0,1,2): x=[0,1,2], y=[0,2,2]
    # n=3 sx=3 sy=4 sxy=6 sxx=5 syy=8; covn=18-12=6, vx=15-9=6, vy=24-16=8
    # r2 = 36 / 48 = 0.75
    assert out[0].r2 == 0.75


def test_roh_runs_hand_case(spark):
    """Uncalled sites bridge a run (no evidence either way), het sites
    break it, min_sites drops short runs."""
    from pandasvcf_spark.operators.annotate import roh_runs

    rows = [
        ("s1", 10, "A", "A"), ("s1", 20, "G", "G"), ("s1", 25, ".", "."),
        ("s1", 30, "A", "A"), ("s1", 40, "A", "G"),
        ("s1", 50, "T", "T"), ("s1", 60, "A", "A"),
        ("s2", 5, "A", "A"), ("s2", 6, "A", "G"),
    ]
    d = spark.createDataFrame(rows, "s string, pos long, a1 string, a2 string")
    got = {
        (r.sample, r.start_pos, r.end_pos, r.n_sites)
        for r in roh_runs(d, "s", "pos", min_sites=2).collect()
    }
    assert got == {("s1", 10, 30, 3), ("s1", 50, 60, 2)}
    # min_sites=3 keeps only the bridged run
    got3 = {
        (r.sample, r.start_pos, r.end_pos)
        for r in roh_runs(d, "s", "pos", min_sites=3).collect()
    }
    assert got3 == {("s1", 10, 30)}


def test_inbreeding_stats_hand_case(spark):
    """F against a tiny python model: the all-hom sample scores F = 1,
    the het-excess sample scores F < 0, and a cohort with no polymorphic
    sites yields NULL (E(het) = 0)."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import inbreeding_stats

    rows = [
        # site 1: s1 AA, s2 AG  (p = 3/4, ehet = 0.375)
        (1, "s1", "A", "A"), (1, "s2", "A", "G"),
        # site 2: s1 GG, s2 AG  (p = 1/4, ehet = 0.375)
        (2, "s1", "G", "G"), (2, "s2", "G", "A"),
        # site 3: missing for s1, het for s2 (p = 1/2, ehet = 0.5)
        (3, "s1", ".", "."), (3, "s2", "A", "G"),
    ]
    d = spark.createDataFrame(rows, "site long, s string, a1 string, a2 string")
    d = d.withColumn("REF", F.lit("A"))
    out = {r.sample: r for r in inbreeding_stats(d, ["site"], "s").collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1.n_called, s1.obs_het, s1.exp_het, s1.f) == (2, 0, 0.75, 1.0)
    # s2: obs 3, E = 0.375 + 0.375 + 0.5 = 1.25 -> F = 1 - 2.4 = -1.4
    assert (s2.n_called, s2.obs_het, s2.exp_het, s2.f) == (3, 3, 1.25, -1.4)

    mono = spark.createDataFrame(
        [(1, "s1", "A", "A"), (1, "s2", "A", "A")],
        "site long, s string, a1 string, a2 string",
    ).withColumn("REF", F.lit("A"))
    r = inbreeding_stats(mono, ["site"], "s").collect()[0]
    assert r.exp_het == 0.0 and r.f is None


def test_king_kinship_hand_cases(spark):
    """Identical genotype vectors score phi = 0.5 (monozygotic-twin
    signature); a sample sharing too few sites yields NULL; pairs orient
    sample_a < sample_b exactly once."""
    import pytest as _pytest

    from pandasvcf_spark.operators.ld import king_kinship

    rows = []
    pattern = [0, 1, 2, 1, 0, 1, 2, 1, 1, 0, 2, 1]
    for s, dval in enumerate(pattern):
        rows += [(s, 1, dval), (s, 2, dval)]        # twins
        rows += [(s, 3, pattern[(s + 5) % len(pattern)])]  # shifted
    rows += [(0, 4, 1), (1, 4, 1)]                   # only 2 shared sites
    d = spark.createDataFrame(rows, "site long, k int, dosage int")
    out = {
        (r.sample_a, r.sample_b): (r.n_shared, r.phi)
        for r in king_kinship(d, "site", "k", "dosage", min_sites=5).collect()
    }
    assert out[(1, 2)] == (12, 0.5)
    assert out[(1, 4)][1] is None and out[(1, 4)][0] == 2  # below min_sites
    assert all(a < b for a, b in out)
    assert len(out) == 6  # C(4,2) pairs, each exactly once
    with _pytest.raises(ValueError, match="min_sites"):
        king_kinship(d, "site", "k", "dosage", min_sites=0)


def test_cohort_qc_all_missing_sample_keeps_row(spark):
    """A sample with zero called genotypes still appears: counts zeroed,
    rates/F NULL where undefined, call_rate 0."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import cohort_qc

    rows = [
        (1, "s1", "A", "G"), (2, "s1", "A", "A"),
        (1, "s2", ".", "."), (2, "s2", ".", "."),
    ]
    d = spark.createDataFrame(rows, "site long, s string, a1 string, a2 string")
    d = d.withColumn("REF", F.lit("A"))
    out = {r.sample: r for r in cohort_qc(d, ["site"], "s").collect()}
    s2 = out["s2"]
    assert (s2.n_sites, s2.n_called, s2.call_rate) == (2, 0, 0.0)
    assert s2.het_rate is None and s2.f is None
    s1 = out["s1"]
    assert (s1.n_called, s1.obs_het, s1.call_rate, s1.het_rate) == (
        2, 1, 1.0, 0.5,
    )


def test_grm_matches_numpy_model(spark):
    """GRM entries (incl. diagonal) reproduce the VanRaden formula
    computed by a dense numpy model: z = (x - 2p)/sqrt(2p(1-p)) with p
    per-site from all called dosages, pairwise-complete means; a
    monomorphic site contributes nothing."""
    import numpy as np

    from pandasvcf_spark.operators.ld import grm

    rng = [0, 1, 2, 1, 0, 2, 1, 1, 0, 1]
    rows = []
    X = {}
    for s in range(10):
        for k in range(4):
            dval = rng[(s * (k + 3) + k) % len(rng)]
            rows.append((s, k, dval))
            X[(s, k)] = dval
    rows.append((10, 0, 2))  # site 10: only sample 0 called
    rows.append((11, 0, 1))
    rows.append((11, 1, 1))  # monomorphic among called (p=0.5? no: 1,1 -> p=0.5 ok)
    rows += [(12, k, 2) for k in range(4)]  # monomorphic p=1 -> excluded
    d = spark.createDataFrame(rows, "site long, k int, dosage int")
    out = {
        (r.sample_a, r.sample_b): (r.n_shared, r.grm)
        for r in grm(d, "site", "k", "dosage").collect()
    }
    # numpy replay
    import collections

    by_site = collections.defaultdict(dict)
    for s, k, dv in rows:
        by_site[s][k] = dv
    acc = collections.defaultdict(lambda: [0, 0.0])
    for s, calls in by_site.items():
        p = sum(calls.values()) / (2.0 * len(calls))
        if p <= 0.0 or p >= 1.0:
            continue
        z = {k: (v - 2 * p) / np.sqrt(2 * p * (1 - p)) for k, v in calls.items()}
        ks = sorted(z)
        for i, ka in enumerate(ks):
            for kb in ks[i:]:
                acc[(ka, kb)][0] += 1
                acc[(ka, kb)][1] += z[ka] * z[kb]
    for pair, (n, szz) in acc.items():
        assert out[pair][0] == n
        assert abs(out[pair][1] - szz / n) < 1e-6, pair
    assert set(out) == set(acc)
    assert all(a <= b for a, b in out)
    # site 12 (p=1) excluded: pairs among the 4 samples count only
    # the 10 polymorphic shared sites (+site 11 for (0,1))
    assert out[(2, 3)][0] == 10


def test_pca_from_grm_separates_planted_clusters(spark):
    """Two planted dosage populations (alt-rich vs ref-rich on
    alternating sites) land on opposite sides of PC1; output is
    deterministic (sign-canonicalized) and one coordinate list per
    sample."""
    from pandasvcf_spark.operators.ld import grm, pca_from_grm

    rows = []
    for s in range(40):
        for k in range(6):
            pop = k < 3
            base = 2 if (s % 2 == 0) == pop else 0
            if (s + k) % 7 == 0:
                base = 1  # noise keeps sites polymorphic within pop
            rows.append((s, k, base))
    d = spark.createDataFrame(rows, "site long, k int, dosage int")
    coords = pca_from_grm(grm(d, "site", "k", "dosage"), n_components=2)
    assert [s for s, _ in coords] == list(range(6))
    pc1 = {s: c[0] for s, c in coords}
    left = {pc1[k] for k in (0, 1, 2)}
    right = {pc1[k] for k in (3, 4, 5)}
    assert max(left) < min(right) or min(left) > max(right)
    again = pca_from_grm(grm(d, "site", "k", "dosage"), n_components=2)
    assert coords == again


def test_grm_pca_power_agrees_with_driver_eigh(spark):
    """Round-10 verdict ask #4: the distributed fixed-round power-
    iteration PCA (pair table never leaves the cluster) must agree
    with pca_from_grm's driver eigh on planted structure with a well-
    separated spectrum. Two unequal blocks give eigen-ratios ~0.4, so
    15 rounds resolve both components to ~1e-5; the deflation step is
    exercised by checking PC2, and sign canonicalization by exact
    coordinate (not |coordinate|) comparison."""
    import numpy as np

    from pandasvcf_spark.operators.ld import grm_pca_power, pca_from_grm

    S = 24
    rng = np.random.RandomState(7)
    m = np.full((S, S), 0.02)
    m[:10, :10] += 0.65   # strong population block
    m[10:17, 10:17] += 0.30  # weaker, different size: separated eigs
    m += 0.01 * rng.randn(S, S)
    m = (m + m.T) / 2
    np.fill_diagonal(m, 1.0 + np.abs(np.diag(m)))
    rows = [
        (f"s{i:03d}", f"s{j:03d}", float(m[i, j]))
        for i in range(S)
        for j in range(i, S)
    ]
    grm_df = spark.createDataFrame(
        rows, "sample_a string, sample_b string, grm double"
    )
    exact = dict(pca_from_grm(grm_df, n_components=2))
    power = {
        r["sample"]: [r["pc1"], r["pc2"]]
        for r in grm_pca_power(grm_df, 2, n_iterations=15).collect()
    }
    assert set(power) == set(exact)
    err = max(
        abs(exact[s][c] - power[s][c]) for s in exact for c in range(2)
    )
    assert err < 1e-4, err


def test_burden_counts_hand_case(spark):
    """The AF gate keeps a site at exactly max_af, drops one just above;
    counters: n_sites counts called rare sites, burden sums dosage,
    n_carrier counts dosage>0; a sample uncalled at a rare site gets no
    credit for it."""
    import pytest as _pytest

    from pandasvcf_spark.operators.annotate import burden_counts

    rows = [
        # site 0 (gene 0): dosages 1,0,0,0 over 4 samples -> p=0.125 rare
        (0, 0, 1), (0, 1, 0), (0, 2, 0), (0, 3, 0),
        # site 1 (gene 0): 2,2,1,1 -> p=0.75 > 0.25 dropped
        (1, 0, 2), (1, 1, 2), (1, 2, 1), (1, 3, 1),
        # site 2 (gene 0): 1,1,0,0 -> p=0.25 == max_af kept (<=)
        (2, 0, 1), (2, 1, 1), (2, 2, 0), (2, 3, 0),
        # site 100 (gene 1): sample 3 uncalled; 1,0,0 over 3 -> p=1/6
        (100, 0, 1), (100, 1, 0), (100, 2, 0), (100, 3, None),
    ]
    d = spark.createDataFrame(rows, "site long, k int, dosage int")
    gened = d.selectExpr("site", "k", "dosage", "site div 100 as gene")
    out = {
        (r.sample, r.gene): (r.n_sites, r.burden, r.n_carrier)
        for r in burden_counts(
            gened, ["site"], "k", "dosage", "gene", max_af=0.25
        ).collect()
    }
    assert out[(0, 0)] == (2, 2, 2)   # sites 0+2, dosage 1+1
    assert out[(2, 0)] == (2, 0, 0)   # called, zero burden -> row kept
    assert out[(0, 1)] == (1, 1, 1)
    assert (3, 1) not in out          # uncalled at the only rare site
    with _pytest.raises(ValueError, match="max_af"):
        burden_counts(gened, ["site"], "k", "dosage", "gene", max_af=0.0)


def test_pi_windows_hand_case(spark):
    """A window of 4 samples all het at one site gives the textbook
    pi_site = 2*4*4/(8*7) = 4/7; a monomorphic site adds 0; a site with
    a single called allele (n<2) is guarded to 0; pi normalizes by
    window length including invariant positions."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.annotate import pi_windows

    rows = []
    for k in range(4):
        rows.append((0, k, "A", "G"))    # site 0: all het -> j=4, n=8
        rows.append((1, k, "A", "A"))    # site 1: monomorphic
    rows.append((2, 0, "G", "."))        # site 2: one called allele
    d = spark.createDataFrame(rows, "pos long, k int, a1 string, a2 string")
    d = d.withColumn("REF", F.lit("A"))
    out = {r.win: r for r in pi_windows(d, "pos", "pos", 10).collect()}
    w = out[0]
    assert w.n_sites == 3 and w.n_variant == 1
    expected = 2.0 * 4 * 4 / (8 * 7)
    assert abs(w.pi_sum - round(expected, 6)) < 1e-9
    assert abs(w.pi - round(expected / 10, 6)) < 1e-9
    with _pytest.raises(ValueError, match="window_size"):
        pi_windows(d, "pos", "pos", 0)


def test_kinship_prune_greedy_cover(spark):
    """Greedy --king-cutoff: the triangle's highest-degree (tie -> lowest
    id) goes first, the loop re-counts after each removal, sub-cutoff
    pairs never matter, and the result is deterministic."""
    from pandasvcf_spark.operators.ld import kinship_prune

    pairs = [
        (1, 2, 0.3), (1, 3, 0.3), (2, 3, 0.28),
        (7, 8, 0.26), (4, 5, 0.01),
    ]
    d = spark.createDataFrame(pairs, "sample_a long, sample_b long, phi double")
    out = kinship_prune(d, 0.177)
    assert out == [(1, 2), (2, 1), (7, 1)]
    assert kinship_prune(d, 0.177) == out  # deterministic
    assert kinship_prune(d, 0.5) == []     # nothing above cutoff
    # hub: one sample related to three others -> only the hub goes
    hub = spark.createDataFrame(
        [(9, 10, 0.3), (9, 11, 0.3), (9, 12, 0.3)],
        "sample_a long, sample_b long, phi double",
    )
    assert kinship_prune(hub, 0.2) == [(9, 3)]


def test_hudson_fst_hand_cases(spark):
    """Bhatia et al. eq. 10 on hand-computed sites: a differentiated
    site, a site fixed in both pops (den 0 -> fst NULL), an
    undersized pop (n < 2 -> NULL estimator), haploid/missing allele
    counting, and a third population that must be ignored."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.operators.ld import hudson_fst

    rows = [
        # site 1: P1 = 0/0, 0/1, 1/1 (n1=6, x1=3, p=0.5);
        #         P2 = 0/0, 0/0 (n2=4, x2=0)
        (1, "P1", "A", "A"), (1, "P1", "A", "G"), (1, "P1", "G", "G"),
        (1, "P2", "A", "A"), (1, "P2", "A", "A"),
        # site 2: fixed ref in both pops -> den = 0 -> fst NULL
        (2, "P1", "A", "A"), (2, "P1", "A", "A"),
        (2, "P2", "A", "A"), (2, "P2", "A", "A"),
        # site 3: P2 has a single called allele (haploid + half-missing)
        (3, "P1", "A", "G"), (3, "P1", "A", "A"),
        (3, "P2", "G", "."),
        # site 1 extras: a third pop and a fully-missing row, both inert
        (1, "P3", "G", "G"), (1, "P1", ".", "."),
    ]
    df = spark.createDataFrame(rows, "site int, pop string, a1 string, a2 string")
    df = df.withColumn("REF", F.lit("A"))
    out = {r["site"]: r for r in
           hudson_fst(df, ["site"], "pop", "P1", "P2").collect()}

    s1 = out[1]
    assert (s1["n1"], s1["n2"]) == (6, 4)
    assert s1["af_a"] == 0.5 and s1["af_b"] == 0.0
    # num = 0.25 - 0.5*0.5/5 - 0 = 0.2 ; den = 0.5 ; fst = 0.4
    assert abs(s1["fst_num"] - 0.2) < 1e-9
    assert abs(s1["fst_den"] - 0.5) < 1e-9
    assert abs(s1["fst"] - 0.4) < 1e-9

    s2 = out[2]
    assert s2["fst_den"] == 0.0 and s2["fst"] is None

    s3 = out[3]
    assert (s3["n1"], s3["n2"]) == (4, 1)  # haploid row = 1 allele
    assert s3["fst"] is None and s3["fst_num"] is None


def test_tdt_hand_trio(spark):
    """TDT transmission counts on hand-built trios covering every
    informative configuration: single het parent with hom partner
    (transmission identified exactly), both parents het with each
    child outcome (hom-ref, het, hom-alt), an inconsistent site
    (excluded), an incomplete site (excluded), and an uninformative
    hom×hom site (used but contributing nothing)."""
    from pandasvcf_spark.operators.annotate import tdt_test

    # rows: (site, member, a1, a2) with members 1=child 2=father
    # 3=mother, ref allele 'A'
    rows = []

    def trio(site, c, f, m):
        rows.append((site, 1, c[0], c[1]))
        rows.append((site, 2, f[0], f[1]))
        rows.append((site, 3, m[0], m[1]))

    trio(1, "AG", "AG", "AA")   # het father gave G  -> b+=1  (inf 1)
    trio(2, "AA", "AG", "AA")   # het father gave A  -> c+=1  (inf 1)
    trio(3, "GG", "AG", "AG")   # both het, both gave G -> b+=2 (inf 2)
    trio(4, "AA", "AG", "AG")   # both het, both gave A -> c+=2 (inf 2)
    trio(5, "AG", "AG", "AG")   # both het, one each -> b+=1, c+=1
    trio(6, "AG", "GG", "AA")   # hom x hom: used, uninformative
    trio(7, "GG", "AA", "AA")   # VIOLATION: excluded
    trio(8, "A.", "AG", "AA")   # incomplete: excluded
    d = spark.createDataFrame(
        [(s, m, a1, a2) for s, m, (a1, a2) in
         [(s, m, (x, y)) for s, m, x, y in rows]],
        "site int, samp int, a1 string, a2 string",
    )
    r = tdt_test(d, ["site"], "samp", 1, 2, 3, ref="A").collect()[0]
    # b = 1+2+1 = 4, c = 1+2+1 = 4, informative = 8, used sites = 6
    assert (
        r["n_sites_used"], r["n_informative"], r["b"], r["c"]
    ) == (6, 8, 4, 4)
    assert r["chi2"] == 0.0

    # skewed transmissions: chi2 = (b-c)^2/(b+c)
    rows.clear()
    for s in range(1, 10):
        trio(s, "AG", "AG", "AA")  # nine alt transmissions
    trio(10, "AA", "AG", "AA")     # one ref transmission
    d = spark.createDataFrame(
        rows, "site int, samp int, a1 string, a2 string"
    )
    r = tdt_test(d, ["site"], "samp", 1, 2, 3, ref="A").collect()[0]
    assert (r["b"], r["c"]) == (9, 1)
    assert r["chi2"] == round((9 - 1) ** 2 / 10, 6)
