"""Declared query catalog — the oracle-checked surface of the engine.

Importing this package registers every catalog entry into
`pandasvcf_spark.queries.QUERIES` (name → QuerySpec). `__spark_entry__.py`
exposes the same catalog through the driver contract.

ORDERING MATTERS: the driver's correctness gate checks the first 50
registered queries only. `_PRIORITY` below pins the window to exactly the
entries that give every SURVEY.md §2 component (core + §2.11 extension
surface) at least one driver-green row; entries past the window are
redundant variants whose operators are already covered inside it (e.g.
`w_dense_rank_lead_lag` overlaps `w_rank_topk`/`w_running_sum`,
`agg_grouping_sets` overlaps `agg_cube`/`agg_rollup`,
`f_case_when`/`f_*_funcs` expressions are exercised by every zygosity and
date/price query inside the window). `tools/check_contract.py` still
verifies the full catalog locally. A pytest
(tests/test_catalog_window.py) asserts the window contents so a new
registration can never silently evict a required row.
"""

from pandasvcf_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401

# Each module registers its entries on import (order here is irrelevant —
# the window is fixed by _PRIORITY below).
from pandasvcf_spark.queries import (  # noqa: F401,E402
    events_q,
    genomics_q,
    relational_q,
    text_q,
    vectors_q,
)

DRIVER_WINDOW = 50

# The first DRIVER_WINDOW names, in the order the driver will see them.
# One row per §2 component; §2.11 extension surface (dedup / similarity /
# text analysis / vectors) is inside the window by construction.
# Round 6 promoted the new operator classes (multiallelic split, sample
# QC, MaxSim, KMV sketch, token budget, corpus report, MERGE upsert) over
# seven redundant variants; round 7 repeats the cut: six new classes
# (pairwise LD, Bloom runtime-filter prune, Count-Min sketch, repeated
# cross-doc spans, Hardy-Weinberg, BM25 retrieval) displace six redundant
# variants (t_bigram_jaccard, dedup_simhash, v_ann_multiprobe,
# e_dedup_first, j_left_join, t_lang_id); the round-7 continuation cuts
# again: six new classes (BPE training, PQ/ADC ANN, relatedness matrix,
# SCD2 history, HyperLogLog, C4 paragraph dedup) displace six redundant
# variants (f5_vartype, sk_kmv_distinct, t_tfidf_top_terms,
# dedup_embedding_cosine, j_inner_broadcast, set_union) — every demoted
# row's machinery stays driver-covered by another window entry
# (flagship_annotate's vartype histogram, sk_hll_distinct +
# sk_countmin's sketch grids, t_bm25_topk's idf·tf ranking, v_ann_topk's
# bucketed equi-join, j_multiway_q5's broadcast inners, m_upsert_latest's
# union) and all remain continuously exact-checked by
# tests/test_contract.py. Round 8 cuts again: four new classes (Arrow-
# batched BPE encode, IVF+PQ composition, bounded-round k-core, global
# sequence packing) displace four variants whose machinery each promoted
# entry subsumes or that stays covered in-window (udf_vartype_pandas →
# t_bpe_tokens_arrow carries the Arrow-batched pandas-UDF path;
# v_pq_topk → v_ivfpq_topk replays PQ encode + ADC as a strict subset;
# t_corpus_report → its constituent metrics stay covered by
# t_quality_score; t_token_budget → t_pack_global generalizes the same
# bucket-offset device to every boundary). The round-8 continuation
# cuts once more: three new classes (distributed grouped exact
# quantiles, deterministic Poisson-bootstrap CI, Hudson Fst) displace
# three variants whose machinery stays in-window (v_maxsim → HOF
# dot-product scoring lives in v_cosine_topk, per-pair partial agg in
# the agg family; v_ivf_topk → v_ivfpq_topk replays the same coarse
# cell equi-join before ADC; m_upsert_latest → m_scd2_history's
# current-row slice is the same latest-per-key MERGE shape) and remain
# exact-checked by tests/test_contract.py every run. The second
# round-8 continuation cuts a fourth time: four new classes
# (fixed-budget Lloyd k-means, Adamic-Adar link prediction, NDCG@k
# ranking metrics, theta-sketch set intersection) displace four
# variants whose machinery each promoted entry carries or that stays
# covered in-window (dedup_exact → its hash-groupBy keyed distinct is
# p4_distinct's full-row shape; sort_limit_topk → the tie-broken
# TakeOrdered cut is exactly g_link_pred's rounded-score top-50;
# w_rank_topk → per-group rank windows + agg are m_ndcg's plan;
# sk_countmin → the fixed-size partial-agged register grid stays
# driver-covered by sk_hll_distinct) and all remain exact-checked by
# tests/test_contract.py every run. A fifth cut promotes corpus
# BLEU-2/ROUGE-2 (the generation-evaluation class) over j_semi, whose
# left_semi machinery stays driver-covered by g_kcore (each peel round
# filters the edge set with two left_semi joins, operators/graph.py
# kcore) — j_semi stays exact-checked in the contract tail. The round-9
# cut (the sixth) promotes three new classes: m_roc_points (the
# collapse-first rework — distinct-score cells before the cumulative
# ladders, the round-9 plan-fix family's flagship), m_kruskal_wallis
# (the distinct-cell mid-rank device carrying the new nonparametric
# family: wilcoxon/friedman/kendall stay contract-checked in the
# tail), and v_sq_topk (the int8 scalar-quantization tier: trained
# bounds + midpoint-reconstruction scoring). Displaced:
# sk_theta_intersect (KMV set-algebra machinery stays driver-covered
# by sk_hll_distinct's mergeable-sketch grid and exact-checked in the
# tail), g_hwe (per-site genotype-count agg + closed-form chi² — the
# same per-site agg shape g_fst and g_sample_qc keep driver-green),
# and t_repeated_spans (shingle→rolling-hash→groupBy winnowing — the
# hash-fingerprint family stays driver-covered by dedup_minhash_lsh
# and t_paragraph_dedup). All three remain continuously exact-checked
# by tests/test_contract.py. The round-10 cut (the seventh) promotes
# two round-9 classes the driver has never hash-checked: v_two_stage
# (the COMPOSED two-tier retrieval — 1-bit BQ Hamming scan feeding an
# exact rerank join sized queries×k_coarse; the composition tier no
# single-quantizer entry exercises) and m_competing_risks (the
# Aalen-Johansen cumulative-incidence family — the km ladder with a
# cause-partitioned hazard attribution; survival analysis previously
# had NO window row). Displaced: v_sq_topk (quantized-ADC scoring
# stays driver-covered by v_ivfpq_topk's PQ/ADC and v_two_stage's BQ
# tier) and t_paragraph_dedup (explode→hash-groupBy dedup machinery
# stays driver-covered by dedup_minhash_lsh's banded hash buckets and
# p4_distinct's keyed distinct). Both remain continuously
# exact-checked by tests/test_contract.py.
# The round-11 cut (the eighth) promotes one representative per
# never-driver-checked round-10 family: m_fdr_bh (the multiple-testing
# envelope ladder — now also carrying the bucketed_row_number-routed
# distributed ladder above 1M cells), m_did (the causal 2x2 family),
# and m_morans_i (the spatial family — it consumes geo_near_join's
# banded pairs, so one row exercises both the spherical banding join
# and the autocorrelation fold). Displaced: m_roc_points (the
# distinct-cell cumulative-ladder machinery stays driver-covered by
# m_fdr_bh's position/envelope ladders and m_kruskal_wallis's mid-rank
# cells), g_fst (per-site grouped-agg + closed-form fold stays via
# g_sample_qc/g_ld), and m_ndcg (per-group rank-window + log fold
# stays via t_bm25_topk's top-k windows and m_scd2_history's ordered
# windows). All three remain continuously exact-checked by
# tests/test_contract.py.
# The round-12 cut (the ninth) promotes one representative per
# never-driver-checked round-11 family: m_cox (the survival family's
# regression flagship — km risk-set ladder + unrolled Newton),
# m_fisher_exact (the exact-test support-walk device carrying
# m_binom_exact/m_mcnemar_exact/m_sign_test in the tail), m_granger
# (the lead-lag closed-form OLS-F time-series screen), v_rq_topk (the
# residual-quantization ANN rung — full-dim two-level codebooks, a
# tier no other window entry replays), j_point_in_poly (planar
# geofence banding + scalar-HOF ray cast — the spatial-join family's
# only polygon entry), and t_exact_substring_rm (the cross-document
# verbatim-excision pipeline — shingle chain + interval-union window
# + HOF token surgery). Displaced, each with its machinery still
# driver-covered: m_competing_risks (the Aalen-Johansen distinct-time
# cumulative ladder is exactly m_cox's risk-set ladder),
# m_bootstrap_ci (deterministic hash-seeded Poisson weights = the
# portable-hash predicate family, resample agg = the window's agg
# entries), j_bloom_prune (runtime-filter hash-join machinery stays
# via j_multiway_q5 + skew_salted_join), agg_grouped_quantiles (the
# bucket-offset device stays via t_pack_global; exact ordered stats
# stay contract-checked via agg_exact_quantiles/agg_percentiles),
# v_kmeans (fixed-budget broadcast-assignment rounds stay via
# v_ivfpq_topk's trained codebooks and g_kcore's fixed-round peels),
# and g_link_pred (per-witness wedge pair expansion = g_grm's
# panel-bounded pair device; the rounded-score TakeOrdered cut stays
# contract-checked via sort_limit_topk). All six remain continuously
# exact-checked by tests/test_contract.py.
# The round-12 continuation cut (the tenth) promotes one
# representative per family built THIS round, none of which has a
# driver row yet: v_mmr_rerank (the diversified-rerank tier — fixed
# greedy rounds over a checkpointed candidate table; no other entry
# replays an iterative selection), sk_f2_moment (the AMS signed-sum
# grid — a mergeable sketch ESTIMATOR family distinct from sk_hll's
# max-register and sk_countmin's counter grids), e_holt_winters (the
# deepest sequential-recursion class: struct accumulator with an
# m-length seasonal array, carrying e_holt_linear/e_croston/e_ewma in
# the tail), m_dunn (post-hoc pairwise ranks — replays
# m_kruskal_wallis's collapse + mid-rank ladder VERBATIM and adds the
# pairwise fold, so it strictly supersedes that row's machinery),
# m_poisson (the log-link GLM — the weighted-normal-equation IRLS
# family's only window row; m_logit/m_ols stay contract-checked), and
# t_ccnet_buckets (per-group exact ntile buckets via rank-interval
# overlap over score cells — a new bucketing device, composed over
# the KN LM scorer). Displaced, each with machinery still
# driver-covered: v_cosine_topk (replayed VERBATIM as v_mmr_rerank's
# candidate stage; the separate block-matmul implementation keeps its
# own row via v_cosine_topk_manyquery), v_two_stage (quantized-ADC
# scoring stays via v_ivfpq_topk; the coarse→exact rerank-join
# composition stays via v_mmr_rerank's pair-sim stage), g_ld
# (pairwise conditional-agg machinery stays via g_grm's panel pairs;
# per-site grouped agg via g_sample_qc), m_kruskal_wallis (subsumed
# by m_dunn as above), m_did (one conditional-counter pass + 1-row
# closed-form fold — the m_fisher_exact window row keeps the 2x2
# family's driver coverage), and t_bleu_rouge (clipped n-gram overlap
# counts — the n-gram join machinery stays via t_exact_substring_rm's
# shingle chains and t_bm25_topk's term-stats joins). All six remain
# continuously exact-checked by tests/test_contract.py.
# A second round-12 continuation cut (the eleventh) promotes three
# flagships built AFTER re-cut #10: m_conformal (split conformal
# prediction — the distribution-free interval + realized-coverage
# audit; an exact order-statistic ladder no other window row
# replays), m_dml (double-ML partialling-out ATE — two shared-X'X
# closed-form nuisance fits + residual fold, the causal trio's
# residual-on-residual member), and t_dsir (DSIR hashed-bigram
# importance weights — feature hashing bounds the LM grid at
# n_buckets, the unbounded-vocabulary scale path of t_moore_lewis).
# Displaced, machinery still driver-covered: t_bpe_merges (the
# 3-rule training chain is replayed VERBATIM inside
# t_bpe_tokens_arrow's fixture, which trains before encoding — the
# training CTEs are a strict subset of that entry's oracle),
# g_sample_qc (per-sample conditional-agg QC: the per-key grouped
# conditional agg stays via flagship_annotate's histogram +
# g_grm's panel stats; exact-checked in the tail), and v_ann_topk
# (RP-LSH banded equi-join + per-bucket window: banding stays via
# dedup_minhash_lsh's bucket join, quantized ANN via
# v_rq_topk/v_ivfpq_topk, and the recall telemetry stays a bench
# headline). All three remain continuously exact-checked by
# tests/test_contract.py.
# The round-13 cut (the twelfth) promotes one representative per
# never-driver-checked round-12 contract-only family (the verdict's
# standing rotation debt): m_cox_multi (the p-covariate Cox Newton —
# the strongest never-checked entry; strictly generalizes m_cox's
# risk-set ladder, with a p=1 bit-identity pytest pinning
# equivalence), e_kpss (the banded position-lag join + series-sized
# cumulative ladder — the stationarity family's device), m_mmd_rbf
# (the broadcast kernel cell-grid fold — a device class with no
# prior window row), m_ece (the calibration-bin fold), g_communities
# (synchronous LPA — fixed unrolled rounds with a min-label struct
# argmax, the graph family's only iterative-label entry), and
# m_raking (IPF — fixed-round margin-window scalings over a cell
# table). Displaced, each with machinery still driver-covered:
# m_cox (subsumed VERBATIM by m_cox_multi at p>=1), m_granger (the
# closed-form OLS-F fold stays via m_dml's shared-X'X Cramer fits
# and m_poisson's normal equations; the time-series lag pairing now
# driver-covered by e_kpss's banded lag join), m_morans_i (spatial
# banding equi-join machinery stays via j_point_in_poly's planar
# banding; the 1-row autocorrelation fold is the window's ubiquitous
# closed-form fold shape), m_dunn (the rank collapse + mid-rank
# ladder stays via m_conformal's order-statistic ladder and
# m_fdr_bh's envelope ladders; the pairwise fold via g_grm's panel
# pairs), v_rq_topk (two-level codebook ADC scoring stays via
# v_ivfpq_topk's trained-codebook PQ/ADC replay), and sk_f2_moment
# (the mergeable fixed-size sketch-grid family stays via
# sk_hll_distinct's register grid). All six remain continuously
# exact-checked by tests/test_contract.py.
# A round-13 continuation cut (the thirteenth) promotes the two
# strongest entries BUILT this round, neither of which has a driver
# row: v_semdedup (the SemDeDup semantic-dedup composition — cell
# assignment + within-cell cosine edges + transitive closure + a
# keep-far struct-argmin; no other window entry replays an
# embedding-space dedup) and m_cox_multi3 (the p=3 Cox fit — the ONLY
# entry exercising the natural-order Gaussian-elimination solve path;
# m_cox_multi's p=2 Cramer form never runs it). Displaced, machinery
# still driver-covered: g_kcore (fixed-round iterative join+agg
# peeling stays via g_communities' LPA rounds, promoted in cut #12;
# the degree-threshold agg via flagship_annotate's grouped
# conditionals) and m_scd2_history (ordered-window change-detect +
# interval-close stays via a1_homref_window's per-site windows and
# j_asof_events' point-in-time ordering). Both remain continuously
# exact-checked by tests/test_contract.py.
# The round-14 cut (the fourteenth; machine-readable twin in
# WINDOW_HISTORY.json from this cut on) promotes the six round-13
# builds that have never had a driver row — v_semdedup_incr (the
# incremental-losslessness argument deserves the driver's hash),
# v_ivfpq_rerank (probe-bounded ADC shortlist + exact-L2 rerank),
# v_davies_bouldin and v_cell_silhouette (the cluster-quality
# telemetry pair), w_pareto_front (the strict suffix-max envelope —
# bucketed_running_extreme's only strict-mode consumer), and
# t_temperature_mix (group-sized agg + 1-row broadcast fold) — plus
# the two oldest never-driver-checked families: e_adf (the
# Dickey-Fuller lag-1 position self-join + closed-form OLS) and
# m_welch_anova (unequal-variance group-collapse + weighted
# Satterthwaite fold). Displaced, each with machinery still
# driver-covered: e_kpss (the banded position-lag join device stays
# via e_adf — the SAME lag pairing plus the regression fold; the
# series-sized cumulative ladder via m_conformal's order-statistic
# ladder), m_cox_multi (the km risk-set ladder + unrolled Newton
# stays via m_cox_multi3, which strictly generalizes it and
# additionally exercises the p>=3 elimination solve; the p=2 Cramer
# arm stays contract-checked), v_ivfpq_topk (replayed VERBATIM as
# v_ivfpq_rerank's stage one — ivfpq_rerank_topk calls ivfpq_topk,
# operators/similarity.py:1958), m_fdr_bh (the envelope-ladder device
# stays via w_pareto_front, whose big regime drives the SAME
# bucketed_running_extreme; the position ladder via m_conformal's
# order-statistic ladder), m_ece (the <=n_bins groupBy + 1-row
# unrounded-gap fold: the grouped-fold shape stays via
# t_temperature_mix's group agg + broadcast fold and m_conformal's
# coverage fold), m_poisson (the weighted-normal-equation IRLS
# rounds stay via m_dml's shared-X'X Cramer fits and m_cox_multi3's
# Newton normal equations), m_raking (fixed-round margin-window
# scalings stay via g_communities' unrolled rounds; the margin
# windows via a1_homref_window's per-key windows), and m_mmd_rbf
# (the broadcast kernel cell-grid fold stays via g_grm's panel-pair
# grid and v_davies_bouldin's literal centroid-distance fold). All
# eight remain continuously exact-checked by tests/test_contract.py.
# The round-15 cut (the fifteenth) widens the swap quota to TWELVE —
# the round-14 verdict's own ask (at net ~5 promotions/round the
# 257-entry debt never converges; tools/check_contract.py now PRINTS
# the computed debt every run). Promoted: the three round-14 builds
# with no driver row (v_imi_topk, v_imi_pq_rerank, v_semdedup_fit),
# the two round-15 builds (v_opq_adc_topk — the OPQ rotation
# composition; mm_audio_fp_pairs — the audio-fingerprint dedup join
# with its load-bearing skew prune), the survival nonparametrics
# (m_kaplan_meier — the KM product-limit ladder; m_logrank — the
# per-event-time 2×2 test), e_seasonal_mk (per-season Mann-Kendall
# cells), t_winnow_fingerprints (the winnowing window-min fingerprint
# device), and the three OLDEST never-driver-checked entries
# (j_range_events — the range-join family's only candidate;
# e_funnel — ordered stage windows; m_ols — the closed-form
# normal-equation regression the causal/GLM shelf composes).
# Demoted, each with machinery still driver-covered:
# v_ivfpq_rerank (stage two rerank_exact is replayed VERBATIM by
# v_imi_pq_rerank, whose stage one generalizes the coarse grid;
# IVF/ADC stays exact-checked in the tail), v_semdedup
# (semantic_dedup is replayed VERBATIM inside v_semdedup_fit's
# trained-centroid run; v_semdedup_incr keeps the incremental
# variant), v_cell_silhouette (cluster-quality telemetry stays via
# v_davies_bouldin; the per-cell mean-distance agg via g_grm's panel
# grid), m_conformal (the order-statistic ladder stays via
# m_kaplan_meier's distinct-time risk-set ladder — the same
# collapse-then-cumulate device — and w_pareto_front's envelope),
# m_dml (its shared-X'X Cramer fits are exactly m_ols's device,
# composed twice; Newton normal equations via m_cox_multi3),
# t_dsir (hashed-grid LM scoring stays via t_ccnet_buckets' KN
# scorer + sk_hll_distinct's hashed register grid), m_fisher_exact
# (the per-stratum 2×2 collapse is m_logrank's per-event-time
# counting; the support-walk pmf fold stays exact-checked via
# m_binom_exact/m_mcnemar_exact in the tail), e_tumbling_hourly
# (time-bucketed groupBy agg stays via e_funnel's stage windows and
# e_seasonal_mk's per-season cells; e_sessionize keeps the streaming
# family's window row and the stream≡batch twins stay pytest-pinned
# every run), r1_explode_map (the wide→long explode+map is the FIRST
# stage of flagship_annotate and f4_zygosity, both golden-pinned),
# p6p8_sentinel_homref (hom-ref filter + sentinel map stay via
# flagship_annotate's 755,801 drop_hom_ref golden +
# a1_homref_window's hom-ref counts), agg_cube (grouping-set
# expansion stays exact-checked via agg_rollup/agg_grouping_sets in
# the tail; the multi-key grouped agg via agg_tpch_q1), and
# g_communities (fixed unrolled iterative rounds with localCheckpoint
# lineage control stay via v_mmr_rerank's greedy selection rounds;
# the graph family keeps g_grm in-window). All twelve remain
# continuously exact-checked by tests/test_contract.py.
# The round-16 cut (the sixteenth) is a single-row correctness fix,
# not a rotation: cut #15 promoted t_winnow_fingerprints whose output
# carries an ARRAY<BIGINT> column (`fp`) — the driver's oracle
# canonicalizer (pandas sort_values) cannot sort list columns, so the
# row errored before comparison (CORRECTNESS_r15: "TypeError:
# unhashable type: 'list'"; the query itself is exact vs DuckDB in
# check_contract). Demoted: t_winnow_fingerprints (the winnowing
# window-min fingerprint device stays exact-checked in the tail every
# run; its portable-hash fold is driver-covered by dedup_minhash_lsh's
# signature bands and t_cdc_chunks' gear-hash fold in the tail).
# Promoted: g_hwe (per-site Hardy-Weinberg chi² — atomic BIGINT/DOUBLE
# output, never driver-checked, the verdict-named candidate; its
# grouped genotype-class agg + closed-form fold gets the driver's
# hash). tests/test_catalog_window.py now additionally pins a
# window-ELIGIBILITY guard: every _PRIORITY entry's output schema must
# be atomic/sortable so a promotion can never again put a list column
# in front of the driver's canonicalizer.
_PRIORITY = [
    # §2.2-2.7 genomics core (F/P/A/J/R series + flagship)
    "f2f3_gt_parse",
    "f4_zygosity",
    "m_kaplan_meier",
    "m_logrank",
    "g_split_multiallelic",
    "f7_format_map",
    "f8_split_columns",
    "p5p7_missing_filters",
    "a1_homref_window",
    "j1_dedup_annotate",
    "m_ols",
    "e_seasonal_mk",
    "t_bpe_tokens_arrow",
    "flagship_annotate",
    # genomics popgen + pairwise (round-7 classes): g_ld demoted in
    # re-cut #10 (pair machinery via g_grm), freeing a slot for the
    # forecasting-recursion family:
    "e_holt_winters",
    # §2.10 events: funnel stage windows + streaming sessionization
    # (stream≡batch covered by pytest)
    "e_funnel",
    "e_sessionize",
    # §2.11 text analysis + dedup family
    "t_quality_score",
    "t_ccnet_buckets",
    "t_bm25_topk",
    "t_exact_substring_rm",
    "dedup_minhash_lsh",
    # §2.11 vectors: exact (broadcast + block-matmul impls), ANN
    # (single-bucket, IVF), dedup. v_cosine_topk_manyquery is
    # NOT redundant with v_cosine_topk: it is a separate numpy/mapInPandas
    # implementation (cosine_topk_blocked) and needs its own driver row.
    "sk_hll_distinct",
    "t_temperature_mix",
    "v_cosine_topk_manyquery",
    "g_hwe",
    "mm_audio_fp_pairs",
    "v_imi_topk",
    "v_imi_pq_rerank",
    "v_mmr_rerank",
    # §2.3-2.7 relational core: scan/distinct/aggs
    "s4_scan_project_filter",
    "p4_distinct",
    "t_pack_global",
    "agg_tpch_q1",
    "v_opq_adc_topk",
    "v_semdedup_fit",
    "v_semdedup_incr",
    "j_range_events",
    "v_davies_bouldin",
    # join family + skew mitigation (j_anti sits past the window: its
    # 0-row result passes rows/schema/hash trivially, so its slot carried
    # no signal — check_contract still exact-checks it every run.
    # agg_rollup likewise moved past the window in round 5 to make room for
    # the as-of join: its grouping-sets machinery stays driver-covered by
    # agg_cube, and check_contract exact-checks it every run.)
    "j_asof_events",
    "g_grm",
    "j_point_in_poly",
    "j_multiway_q5",
    "skew_salted_join",
    # windows / sort / sets / reshape / map parsing
    "w_pareto_front",
    "m_welch_anova",
    "e_adf",
    "m_cox_multi3",
    "r2_pivot",
    "info_str_to_map",
]

assert len(_PRIORITY) == DRIVER_WINDOW, len(_PRIORITY)


def _apply_priority_order() -> None:
    """Rebuild QUERIES so iteration order = _PRIORITY, then the tail.

    dict preserves insertion order, and the driver materializes
    ``queries()`` in that order — this is the only ordering mechanism.
    """
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"priority window names unregistered queries: {missing}"
    ordered = {name: QUERIES[name] for name in _PRIORITY}
    ordered.update((k, v) for k, v in QUERIES.items() if k not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_priority_order()

__all__ = ["QUERIES", "QuerySpec", "register", "DRIVER_WINDOW"]
