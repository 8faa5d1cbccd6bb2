"""One-call training-corpus preparation — the composition the §2.11
operator families exist for, packaged the way `cohort_qc` packages the
genomics QC stack: ingest-ready DataFrame in, cleaned corpus + funnel
report out.

The stage order is the one large published pipelines converge on (C4,
Gopher/MassiveText, RefinedWeb): cheap row-local filters first (language,
quality — pure column expressions, no shuffle), then exact dedup (one
fingerprint groupBy), then sub-document cleanup (paragraph dedup), then
the expensive corpus-global pass (MinHash near-dedup), then benchmark
decontamination (broadcast n-gram overlap), and token-budget selection
last so the budget is spent on documents that survived everything else.

Every stage is an existing oracle-checked operator; the composition adds
lineage control (`localCheckpoint` between stages — the connected-
components lesson: an iterative/multi-stage plan silently re-executes its
whole upstream otherwise, and the funnel counts would each re-run the
pipeline) and the per-stage survivor accounting every production corpus
job is asked for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import (
    lang_id_expr,
    quality_score_expr,
    whitespace_token_count_expr,
    word_ngrams_expr,
)
from pandasvcf_spark.operators.dedup import (
    dedup_documents,
    near_dedup_documents,
    paragraph_dedup,
)
from pandasvcf_spark.operators.sampling import take_token_budget
from pandasvcf_spark.operators.text_features import contamination_overlap


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    langs: list[str] | None = None,
    min_quality: float | None = None,
    paragraph_delim: str | None = None,
    paragraph_min_chars: int = 50,
    near_dup: bool = True,
    min_jaccard: float = 0.9,
    keep_best: bool = False,
    cdc_max_foreign_frac: float | None = None,
    eval_df: DataFrame | None = None,
    max_overlap: float = 0.1,
    contamination_ngram: int = 3,
    budget_tokens: int | None = None,
    semantic_df: DataFrame | None = None,
    semantic_vec_col: str = "embedding",
    semantic_threshold: float = 0.95,
    semantic_centroids: list[list[float]] | None = None,
    semantic_max_cluster_size: int | None = 100_000,
    audio_df: DataFrame | None = None,
    audio_wav_col: str = "wav",
    audio_min_matches: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Run the standard corpus-cleaning funnel; returns
    ``(cleaned, report)`` where `cleaned` keeps the input schema (text
    possibly rewritten by the paragraph stage) and `report` is the
    per-stage survivor table (stage INT, name STRING, rows BIGINT) —
    the accounting a data card quotes.

    Stages (each optional via its parameter, skipped stages keep their
    report row with the pass-through count):

      1 input
      2 lang_quality  — `langs` whitelist + `quality_score_expr` ≥
                        `min_quality` (row-local, no shuffle)
      3 exact_dedup   — normalized-fingerprint dedup_documents
      4 paragraph_dedup — corpus-wide C4 pass when `paragraph_delim`
                        is given (short lines exempt)
      5 near_dedup    — MinHash-LSH + components; `keep_best` keeps
                        each cluster's highest quality_score instead of
                        min id
      6 cdc_dedup     — chunk-granular tier when `cdc_max_foreign_frac`
                        is given: drop docs whose shift-resistant CDC
                        `foreign_frac` (chars in chunks OWNED by a
                        lower-id survivor) exceeds the threshold — the
                        partially-re-hosted-content gate whole-document
                        Jaccard underweights when the host adds enough
                        of its own text; ownership is computed among
                        CURRENT survivors only (a dropped doc must not
                        make live content "foreign")
      7 semantic_dedup — SemDeDup paraphrase tier when `semantic_df`
                        (id_col + `semantic_vec_col` embeddings) is
                        given: survivors' embeddings dedup via
                        `semantic_dedup` against `semantic_centroids`,
                        or `semantic_dedup_fit` trains them when None;
                        docs WITHOUT an embedding row pass through
                        (missing metadata must not silently drop data)
      8 audio_dedup   — audio-modality tier when `audio_df` (id_col +
                        `audio_wav_col` PCM blobs) is given: survivors'
                        clips near-dedup via `audio_dedup` (Wang-2003
                        landmark fingerprints — same recording
                        re-encoded/re-gained); docs WITHOUT an audio
                        row pass through, like the semantic tier
      9 decontaminate — drop docs whose `contamination_ngram`-gram
                        overlap with `eval_df` exceeds `max_overlap`
     10 token_budget  — deterministic hash-ordered selection of
                        `budget_tokens` whitespace tokens

    Each stage boundary is `localCheckpoint`-ed: the funnel counts are
    then one cheap job per stage instead of re-executing the whole
    upstream per count, and the MinHash stage never recomputes the
    filters. Cost: the corpus materializes once per enabled stage —
    exactly what a checkpointed production job does on purpose. The
    checkpoint is LAZY (eager=False) so the stage's survivor count is
    the job that materializes it — one job per stage, not a
    materialize job plus a count job; and a SKIPPED stage reuses the
    previous stage's count instead of re-counting the unchanged
    checkpoint (same rows by construction — round 16, guide §5: the
    report is identical, only the driver-side job count drops)."""
    stages: list[tuple[str, int]] = []

    def _stage(name: str, d: DataFrame) -> DataFrame:
        ckpt = d.localCheckpoint(eager=False)
        stages.append((name, ckpt.count()))
        return ckpt

    def _skip(name: str) -> None:
        stages.append((name, stages[-1][1]))

    cur = _stage("input", df)

    cond: Column = F.lit(True)
    if langs is not None:
        cond = cond & lang_id_expr(F.col(text_col)).isin(list(langs))
    if min_quality is not None:
        cond = cond & (
            quality_score_expr(F.col(text_col)) >= F.lit(float(min_quality))
        )
    if langs is not None or min_quality is not None:
        cur = _stage("lang_quality", cur.filter(cond))
    else:
        _skip("lang_quality")

    cur = _stage("exact_dedup", dedup_documents(cur, text_col=text_col))

    if paragraph_delim is not None:
        kept_text = paragraph_dedup(
            cur,
            id_col,
            text_col,
            delim=paragraph_delim,
            min_chars=paragraph_min_chars,
        )
        cur = _stage(
            "paragraph_dedup",
            cur.drop(text_col).join(kept_text, on=id_col).select(*df.columns),
        )
    else:
        _skip("paragraph_dedup")

    if near_dup:
        cur = _stage(
            "near_dedup",
            near_dedup_documents(
                cur,
                id_col,
                word_ngrams_expr(F.col(text_col), 2),
                min_jaccard=min_jaccard,
                quality=(
                    quality_score_expr(F.col(text_col)) if keep_best else None
                ),
            ),
        )
    else:
        _skip("near_dedup")

    if cdc_max_foreign_frac is not None:
        from pandasvcf_spark.operators.dedup import cdc_dedup_documents

        cur = _stage(
            "cdc_dedup",
            cdc_dedup_documents(
                cur,
                max_foreign_frac=cdc_max_foreign_frac,
                text_col=text_col,
                id_col=id_col,
            ),
        )
    else:
        _skip("cdc_dedup")

    if semantic_df is not None:
        from pandasvcf_spark.operators.dedup import (
            semantic_dedup,
            semantic_dedup_fit,
        )

        # embeddings restricted to CURRENT survivors: already-dropped
        # docs must not influence which paraphrase representative wins
        emb = (
            semantic_df.select(F.col(id_col), F.col(semantic_vec_col))
            .join(cur.select(id_col), on=id_col)
            .localCheckpoint()
        )
        if semantic_centroids is not None:
            keep = semantic_dedup(
                emb,
                semantic_centroids,
                threshold=semantic_threshold,
                id_col=id_col,
                vec_col=semantic_vec_col,
                max_cluster_size=semantic_max_cluster_size,
            ).select(id_col)
        else:
            keep_df, _cents = semantic_dedup_fit(
                emb,
                threshold=semantic_threshold,
                id_col=id_col,
                vec_col=semantic_vec_col,
                max_cluster_size=semantic_max_cluster_size,
            )
            keep = keep_df.select(id_col)
        dropped = emb.select(id_col).join(keep, on=id_col, how="left_anti")
        cur = _stage(
            "semantic_dedup",
            cur.join(dropped, on=id_col, how="left_anti"),
        )
    else:
        _skip("semantic_dedup")

    if audio_df is not None:
        from pandasvcf_spark.operators.multimodal import audio_dedup

        # clips restricted to CURRENT survivors, the semantic-tier rule:
        # a dropped doc's audio must not win a dedup component
        clips = (
            audio_df.select(F.col(id_col), F.col(audio_wav_col))
            .join(cur.select(id_col), on=id_col)
            .localCheckpoint()
        )
        kept = audio_dedup(
            clips,
            wav_col=audio_wav_col,
            id_col=id_col,
            min_matches=audio_min_matches,
        ).select(id_col)
        dropped = clips.select(id_col).join(
            kept, on=id_col, how="left_anti"
        )
        cur = _stage(
            "audio_dedup",
            cur.join(dropped, on=id_col, how="left_anti"),
        )
    else:
        _skip("audio_dedup")

    if eval_df is not None:
        ov = contamination_overlap(
            cur,
            eval_df,
            n=contamination_ngram,
            id_col=id_col,
            text_col=text_col,
        ).select(id_col, "overlap")
        cur = _stage(
            "decontaminate",
            cur.join(ov, on=id_col, how="left")
            .filter(
                F.coalesce(F.col("overlap"), F.lit(0.0))
                <= F.lit(float(max_overlap))
            )
            .drop("overlap"),
        )
    else:
        _skip("decontaminate")

    if budget_tokens is not None:
        cur = _stage(
            "token_budget",
            cur.withColumn(
                "__tok", whitespace_token_count_expr(F.col(text_col))
            )
            .transform(
                lambda d: take_token_budget(
                    d, "__tok", budget_tokens, F.col(id_col)
                )
            )
            .drop("__tok"),
        )
    else:
        _skip("token_budget")

    spark = df.sparkSession
    report = spark.createDataFrame(
        [(i + 1, name, int(n)) for i, (name, n) in enumerate(stages)],
        "stage INT, name STRING, rows BIGINT",
    )
    return cur, report
