"""Reference-API compatibility façade: the erscott/pandasVCF surface.

A user of the reference drives it as (pandasvcf.py:76-288):

    vcf = VCF(filename, sample_id='all', cols=[...], chunksize=5000)
    vcf.get_vcf_df_chunk()
    vcf.add_variant_annotations(split_columns={'AD': 2}, inplace=False)
    vcf.df_annot  # or vcf.df when inplace=True

This class keeps that call shape verbatim on top of the Spark engine so
migration is a one-line import change. Differences, all documented:

  * `df` / `df_annot` are lazy Spark DataFrames, not pandas (call
    `.toPandas()` for the old object — sensible only at small scale).
  * Chunking disappears: the first `get_vcf_df_chunk()` exposes the WHOLE
    file as one lazy plan and sets `stopIteration` (the reference's EOF
    flag) immediately — the driver loop `while not vcf.stopIteration: ...`
    still terminates, after one pass that covers everything.
  * `n_cores` is accepted and ignored (cluster parallelism replaces the
    multiprocessing fan-out, reference variant_annotations.py:391-453).
  * The reference's per-chunk `drop_duplicates` (pandasvcf.py:175) becomes
    a GLOBAL dedup — strictly stronger (duplicates spanning the old 5000-row
    chunk boundary are also dropped).
  * QUAL/FILTER/INFO survive into the annotated output when requested via
    `cols` (the reference silently dropped them — SURVEY §8.1; we implement
    the documented intent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandasvcf_spark.operators.annotate import annotate_genotypes, explode_genotypes
from pandasvcf_spark.sources.vcf import read_vcf, read_vcf_header


class VCF:
    """Drop-in shaped port of the reference `VCF` class (pandasvcf.py:76)."""

    def __init__(
        self,
        filename: str,
        sample_id: str | list[str] = "all",
        cols: list[str] | None = None,
        chunksize: int = 5000,  # accepted for signature parity; unused
        spark: SparkSession | None = None,
        dedup: bool = True,
    ) -> None:
        self.filename = filename
        self.sample_id = sample_id
        self.cols = cols
        self.dedup = dedup
        self.header = read_vcf_header(filename)
        self.sample_ids = (
            self.header.sample_ids
            if sample_id == "all"
            else [sample_id] if isinstance(sample_id, str) else list(sample_id)
        )
        if spark is None:
            from pandasvcf_spark import get_spark

            spark = get_spark()
        self.spark = spark
        self.df: DataFrame | None = None
        self.df_annot: DataFrame | None = None
        self.stopIteration = False  # reference EOF flag (pandasvcf.py:162-174)

    def get_header_df(self) -> DataFrame:
        """Header key/value table incl. the synthetic SampleIDs/ColumnHeader
        rows (reference pandasvcf.py:102-120)."""
        return self.header.to_df(self.spark)

    def get_vcf_df_chunk(self) -> DataFrame:
        """Expose the (whole) file as the wide variants DataFrame. The
        reference pulled one pandas chunk per call; here the lazy plan covers
        every row, so EOF is immediate.

        The constructor's `dedup` flag (default True) mirrors the
        reference's per-chunk drop_duplicates (pandasvcf.py:175) — and is
        strictly stronger: the reference deduped only within each 5000-row
        chunk, this dedups globally. COST: the global dedup is one full
        shuffle of the raw parsed rows — at scale, prefer `dedup=False`
        here (real VCFs are duplicate-free) or bypass the façade and call
        `read_vcf` directly, which defaults dedup OFF. Pass `dedup=False`
        also when you need exact reference ROW COUNTS on inputs whose
        duplicates span farther apart than the reference's old 5000-row
        chunk (e.g. concatenated VCF fragments the reference would have
        kept)."""
        self.df = read_vcf(
            self.spark,
            self.filename,
            samples=self.sample_id,
            cols=self.cols,
            dedup=self.dedup,
        )
        self.stopIteration = True
        return self.df

    def add_variant_annotations(
        self,
        split_columns: dict[str, int] | None = None,
        inplace: bool = False,
        drop_hom_ref: bool = True,
        n_cores: int = 1,  # accepted for signature parity; unused
    ) -> None:
        """Reference E3 pipeline (pandasvcf.py:186-288): wide -> annotated
        long genotype table. Results land in `df_annot` (or `df` when
        inplace=True), exactly like the reference."""
        if self.df is None:
            self.get_vcf_df_chunk()
        fields = [f for f in self.header.format_ids if f != "GT"] or "auto"
        out = annotate_genotypes(
            explode_genotypes(self.df),
            drop_hom_ref=drop_hom_ref,
            split_columns=split_columns,
            format_fields=fields,
        )
        if inplace:
            self.df = out
        else:
            self.df_annot = out


class VCFMetadata:
    """Shape-compatible port of the reference's header-metadata class
    (vcf_metadata.py:4-25): `.compression` ('gzip' | 'infer') and
    `.header` (the raw '##'/'#CHROM' lines, newline-terminated, with the
    reference's '#CHROM' → 'CHROM' rewrite).

    The reference shells out to `tabix -H` (and SIDE-EFFECTFULLY builds a
    .tbi with `tabix -p vcf`) just to read the header; here the header
    comes from the engine's own driver-side scan (sources/vcf.py
    read_vcf_header — bounded read, BGZF/gzip aware), no subprocess, no
    index mutation. Region queries that needed that .tbi go through
    `read_vcf(region=...)`, which honors an existing index instead of
    rebuilding one."""

    def __init__(self, filename: str) -> None:
        self.compression = "gzip" if filename.endswith(".gz") else "infer"
        h = read_vcf_header(filename)
        lines = list(h.meta_lines) + ["#" + "\t".join(h.columns)]
        self.header = [
            line.replace("#CHROM", "CHROM") + "\n" for line in lines
        ]
