"""Hand-case tests for the ranking-metric / classical-statistics family
(`operators/stats.py`) — closed-form textbook values the SQL oracles can't
probe (degenerate groups, tie handling, seed determinism, empty-cluster
drop), computed by hand in the comments."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandasvcf_spark.operators.stats import (
    anova_oneway,
    average_precision,
    kmeans_fit,
    mann_whitney_u,
    ndcg_at_k,
    spearman_corr,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


# --- ndcg_at_k -------------------------------------------------------------


def test_ndcg_perfect_and_inverted(spark):
    # q=1: score order == rel order (3,2,1) -> ndcg 1.0
    # q=2: score order inverts rel (1,2,3) ->
    #   dcg  = (2^1-1)/log2(2) + (2^2-1)/log2(3) + (2^3-1)/log2(4)
    #        = 1 + 3/1.5849625007211562 + 3.5
    #   idcg = 7/1 + 3/1.5849625007211562 + 1/2
    df = spark.createDataFrame(
        [(1, 1, 9.0, 3.0), (1, 2, 8.0, 2.0), (1, 3, 7.0, 1.0),
         (2, 4, 9.0, 1.0), (2, 5, 8.0, 2.0), (2, 6, 7.0, 3.0)],
        "q int, id int, s double, rel double",
    )
    out = {r["q"]: r for r in ndcg_at_k(df, ["q"], "s", "rel", "id", k=10).collect()}
    assert out[1]["ndcg"] == 1.0
    dcg = 1 + 3 / math.log2(3) + 7 / 2
    idcg = 7 + 3 / math.log2(3) + 0.5
    assert out[2]["dcg"] == round(dcg, 6)
    assert out[2]["idcg"] == round(idcg, 6)
    assert out[2]["ndcg"] == round(dcg / idcg, 6)


def test_ndcg_k_cutoff_and_zero_rel(spark):
    # k=1 keeps only the top-scored row; all-zero rel -> idcg 0 -> ndcg NULL
    df = spark.createDataFrame(
        [(1, 1, 2.0, 0.0), (1, 2, 1.0, 0.0)],
        "q int, id int, s double, rel double",
    )
    r = ndcg_at_k(df, ["q"], "s", "rel", "id", k=1).collect()[0]
    assert r["dcg"] == 0.0 and r["idcg"] == 0.0 and r["ndcg"] is None


# --- average_precision -----------------------------------------------------


def test_average_precision_hand(spark):
    # order by score desc: y = 1,0,1 -> AP = (1/1 + 2/3)/2 = 0.833333
    df = spark.createDataFrame(
        [(1, 1, 3.0, 1), (1, 2, 2.0, 0), (1, 3, 1.0, 1)],
        "q int, id int, s double, y int",
    )
    r = average_precision(df, ["q"], "s", "y", "id").collect()[0]
    assert r["n"] == 3 and r["n_pos"] == 2
    assert r["ap"] == round((1.0 + 2.0 / 3.0) / 2.0, 6)


def test_average_precision_no_positives_null(spark):
    df = spark.createDataFrame(
        [(1, 1, 3.0, 0), (1, 2, 2.0, 0)], "q int, id int, s double, y int"
    )
    r = average_precision(df, ["q"], "s", "y", "id").collect()[0]
    assert r["ap"] is None and r["n_pos"] == 0


# --- mann_whitney_u --------------------------------------------------------


def test_mann_whitney_hand_no_ties(spark):
    # sample1 = {1, 2}, sample0 = {3, 4}: ranks 1,2 vs 3,4
    # R1 = 3, U1 = 3 - 2*3/2 = 0, mu = 2, var = 4/12*5 = 5/3
    # z = (0-2)/sqrt(5/3) = -1.549193
    df = spark.createDataFrame(
        [(0, 1.0, 1), (0, 2.0, 1), (0, 3.0, 0), (0, 4.0, 0)],
        "g int, v double, f int",
    )
    r = mann_whitney_u(df, ["g"], "v", "f").collect()[0]
    assert r["n1"] == 2 and r["n2"] == 2
    assert r["u"] == 0.0
    assert r["z"] == round(-2.0 / math.sqrt(5.0 / 3.0), 6)


def test_mann_whitney_all_tied_null_z(spark):
    # every value equal -> sigma = 0 -> z NULL; U from average ranks
    df = spark.createDataFrame(
        [(0, 5.0, 1), (0, 5.0, 1), (0, 5.0, 0), (0, 5.0, 0)],
        "g int, v double, f int",
    )
    r = mann_whitney_u(df, ["g"], "v", "f").collect()[0]
    # all ranks 2.5 -> R1 = 5, U1 = 5 - 3 = 2
    assert r["u"] == 2.0 and r["z"] is None


def test_mann_whitney_one_empty_sample(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 1), (0, 2.0, 1)], "g int, v double, f int"
    )
    r = mann_whitney_u(df, ["g"], "v", "f").collect()[0]
    assert r["n2"] == 0 and r["u"] is None and r["z"] is None


# --- spearman_corr ---------------------------------------------------------


def test_spearman_monotone_and_reversed(spark):
    # perfectly increasing -> rho 1; reversed -> rho -1
    rows = [(1, float(i), float(i * i)) for i in range(1, 6)]
    rows += [(2, float(i), float(-i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    out = {r["g"]: r["rho"] for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert out[1] == 1.0 and out[2] == -1.0


def test_spearman_ties_hand(spark):
    # x = (1, 2, 2, 3) -> ranks (1, 2.5, 2.5, 4); y = (1, 2, 3, 4)
    # rho = cov/sd ratio over ranks: num = 4*29.5 - 10*10 = 18
    # vx = 4*27.5 - 100 = 10, vy = 4*30 - 100 = 20
    # rho = 18/sqrt(200) = 1.272792... wait sqrt(10*20)=14.142136
    # rho = 18/14.1421356 = 1.27279 > 1? recompute:
    # a = (1, 2.5, 2.5, 4), b = (1, 2, 3, 4)
    # sab = 1 + 5 + 7.5 + 16 = 29.5 ; saa = 1+6.25+6.25+16 = 29.5
    # sbb = 30 ; sa = 10 ; sb = 10
    # num = 4*29.5 - 100 = 18; vx = 4*29.5 - 100 = 18; vy = 20
    # rho = 18/sqrt(360) = 0.948683
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (0, 2.0, 2.0), (0, 2.0, 3.0), (0, 3.0, 4.0)],
        "g int, x double, y double",
    )
    r = spearman_corr(df, ["g"], "x", "y").collect()[0]
    assert r["rho"] == round(18.0 / math.sqrt(360.0), 6)


def test_spearman_constant_column_null(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (0, 1.0, 2.0)], "g int, x double, y double"
    )
    assert spearman_corr(df, ["g"], "x", "y").collect()[0]["rho"] is None


# --- anova_oneway ----------------------------------------------------------


def test_anova_hand(spark):
    # groups a=(1,2,3) b=(4,5,6): SSB = 2*3*... by hand:
    # means 2 and 5, grand 3.5; SSB = 3*(1.5^2)*2 = 13.5; SSW = 2+2 = 4
    # F = (13.5/1)/(4/4) = 13.5 ; eta = 13.5/17.5
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k"] == 2 and r["n"] == 6
    assert r["f_stat"] == 13.5
    assert r["eta_sq"] == round(13.5 / 17.5, 6)


def test_anova_single_group_null_f(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k"] == 1 and r["f_stat"] is None


# --- kmeans_fit ------------------------------------------------------------


def test_kmeans_separated_clusters(spark):
    # two tight blobs; k=2 seeded by the two smallest ids (one per blob)
    rows = [(1, 0.0, 0.0), (3, 0.1, 0.0), (5, 0.0, 0.1),
            (2, 9.0, 9.0), (4, 9.1, 9.0), (6, 9.0, 9.1)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    out = {r["cluster"]: r for r in kmeans_fit(df, "id", ["x", "y"], k=2, iters=3).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n"] == 3 and out[1]["n"] == 3
    assert out[0]["c_x"] == round((0.0 + 0.1 + 0.0) / 3, 6)
    assert out[1]["c_y"] == round((9.0 + 9.0 + 9.1) / 3, 6)


def test_kmeans_empty_cluster_drops(spark):
    # both seeds inside one blob; second centroid captures nothing after
    # the far blob pulls centroid 0 -> by construction here, centroid 1
    # (seeded at the duplicate point) ties and loses every row to the
    # smaller index, so cluster 1 vanishes from the output
    rows = [(1, 0.0), (2, 0.0), (3, 0.0), (4, 0.0)]
    df = spark.createDataFrame(rows, "id int, x double")
    out = kmeans_fit(df, "id", ["x"], k=2, iters=2).collect()
    assert [r["cluster"] for r in out] == [0]
    assert out[0]["n"] == 4


def test_kmeans_validates(spark):
    df = spark.createDataFrame([(1, 0.0)], "id int, x double")
    with pytest.raises(ValueError):
        kmeans_fit(df, "id", [], k=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, "id", ["x"], k=0)


# --- calibration_bins ------------------------------------------------------


def test_calibration_perfect_and_gap(spark):
    from pandasvcf_spark.operators.stats import calibration_bins

    # bin 0: scores 0.05 with y=0 -> frac 0, gap 0.05
    # bin 9: score 0.95/1.0-capped with y=1 -> frac 1, gap |1-avg|
    df = spark.createDataFrame(
        [(0.05, 0), (0.05, 0), (0.95, 1), (0.99, 1)], "s double, y int"
    )
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y").collect()}
    assert set(out) == {0, 9}
    assert out[0]["frac_pos"] == 0.0 and out[0]["gap"] == 0.05
    assert out[9]["avg_score"] == 0.97 and out[9]["frac_pos"] == 1.0
    assert out[9]["gap"] == round(1.0 - 0.97, 6)


def test_calibration_top_edge_capped(spark):
    from pandasvcf_spark.operators.stats import calibration_bins

    # score exactly 1.0 would index bin 10 -> capped into bin 9
    df = spark.createDataFrame([(1.0, 1)], "s double, y int")
    assert calibration_bins(df, "s", "y").collect()[0]["bin"] == 9


# --- cramers_v -------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    from pandasvcf_spark.operators.stats import cramers_v

    # 2x2 diagonal: V = 1
    rows = [("x", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["r"] == 2 and r["c"] == 2 and r["n"] == 10
    assert r["chi2"] == 10.0 and r["v"] == 1.0


def test_cramers_v_independent_zero(spark):
    from pandasvcf_spark.operators.stats import cramers_v

    # perfectly balanced 2x2: chi2 = 0, V = 0
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["v"] == 0.0


def test_cramers_v_single_level_null(spark):
    from pandasvcf_spark.operators.stats import cramers_v

    df = spark.createDataFrame(
        [("x", "p"), ("x", "q")], "a string, b string"
    )
    assert cramers_v(df, "a", "b").collect()[0]["v"] is None


# --- js_divergence ---------------------------------------------------------


def test_js_identical_zero(spark):
    from pandasvcf_spark.operators.stats import js_divergence

    rows = [("a", 0), ("b", 0), ("a", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "c string, f int")
    r = js_divergence(df, "c", "f").collect()[0]
    assert r["js"] == 0.0 and r["n0"] == 2 and r["n1"] == 2


def test_js_disjoint_is_one(spark):
    from pandasvcf_spark.operators.stats import js_divergence

    # disjoint supports -> JS = 1 bit exactly (log2)
    rows = [("a", 0), ("b", 0), ("c", 1), ("d", 1)]
    df = spark.createDataFrame(rows, "c string, f int")
    r = js_divergence(df, "c", "f").collect()[0]
    assert r["js"] == 1.0 and r["k"] == 4


# --- corpus_bleu2 ----------------------------------------------------------


def test_bleu_identity_pair(spark):
    from pandasvcf_spark.operators.text_features import corpus_bleu2

    df = spark.createDataFrame(
        [(1, "the cat sat", "the cat sat")],
        "pair_id int, cand string, ref string",
    )
    r = corpus_bleu2(df).collect()[0]
    assert r["p1"] == 1.0 and r["p2"] == 1.0
    assert r["bp"] == 1.0 and r["bleu2"] == 1.0 and r["rouge2"] == 1.0


def test_bleu_clipping_and_brevity(spark):
    from pandasvcf_spark.operators.text_features import corpus_bleu2

    import math

    # cand "the the" vs ref "the cat sat on the mat":
    # unigrams: cand 'the'x2, ref has 'the'x2 -> clipped m1=2, t1=2, p1=1
    # bigrams: cand 'the the'x1 not in ref -> m2=0 -> bleu NULL
    # bp = exp(1 - 6/2)
    df = spark.createDataFrame(
        [(1, "the the", "the cat sat on the mat")],
        "pair_id int, cand string, ref string",
    )
    r = corpus_bleu2(df).collect()[0]
    assert r["p1"] == 1.0 and r["p2"] == 0.0
    assert r["bp"] == round(math.exp(1.0 - 6.0 / 2.0), 6)
    assert r["bleu2"] is None
    assert r["rouge2"] == 0.0


def test_bleu_corpus_aggregation(spark):
    from pandasvcf_spark.operators.text_features import corpus_bleu2

    # two pairs aggregate counts BEFORE the ratio (corpus BLEU), so
    # p1 = (2 + 1) / (2 + 2), not mean(1, 0.5)
    df = spark.createDataFrame(
        [(1, "a b", "a b"), (2, "c d", "c x")],
        "pair_id int, cand string, ref string",
    )
    r = corpus_bleu2(df).collect()[0]
    assert r["n_pairs"] == 2
    assert r["p1"] == round(3.0 / 4.0, 6)


# --- graph: link_prediction / local_clustering / bfs_levels ----------------


def test_link_prediction_square(spark):
    from pandasvcf_spark.operators.graph import link_prediction

    import math

    # 4-cycle 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) each have
    # two common neighbors of degree 2 -> cn=2, aa=2/ln(2)
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    out = link_prediction(df, top_n=10).collect()
    got = {(r["u"], r["v"]): (r["cn"], r["aa"]) for r in out}
    exp_aa = round(2.0 / math.log(2.0), 6)
    assert got == {(1, 3): (2, exp_aa), (2, 4): (2, exp_aa)}


def test_link_prediction_excludes_existing_edges(spark):
    from pandasvcf_spark.operators.graph import link_prediction

    # triangle: every distance-2 pair is already an edge -> empty
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src int, dst int"
    )
    assert link_prediction(df, top_n=10).count() == 0


def test_link_prediction_hub_cap(spark):
    from pandasvcf_spark.operators.graph import link_prediction

    # star center degree 4; capping below it removes all evidence
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    assert link_prediction(df, top_n=10).count() == 6  # C(4,2) spokes
    assert link_prediction(df, top_n=10, max_degree=3).count() == 0


def test_local_clustering_k4_and_star(spark):
    from pandasvcf_spark.operators.graph import local_clustering

    # K4: every node cc = 1 (3 triangles each, deg 3)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = {r["node"]: r for r in local_clustering(
        spark.createDataFrame(k4, "src int, dst int")).collect()}
    assert all(out[n]["cc"] == 1.0 and out[n]["triangles"] == 3
               for n in range(4))
    # star: center cc = 0, leaves deg 1 -> cc NULL
    star = [(0, i) for i in range(1, 4)]
    out = {r["node"]: r for r in local_clustering(
        spark.createDataFrame(star, "src int, dst int")).collect()}
    assert out[0]["cc"] == 0.0 and out[1]["cc"] is None


def test_bfs_path_graph_levels(spark):
    from pandasvcf_spark.operators.graph import bfs_levels

    # path 1-2-3-4-5, source {1}: dist = index; depth 2 stops at 3
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    src = spark.createDataFrame([(1,)], "node int")
    out = {r["node"]: r["dist"] for r in
           bfs_levels(edges, src, max_depth=2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}
    # depth 4 == depth 5 (fixed point is a no-op)
    o4 = {r["node"]: r["dist"] for r in
          bfs_levels(edges, src, max_depth=4).collect()}
    o5 = {r["node"]: r["dist"] for r in
          bfs_levels(edges, src, max_depth=5).collect()}
    assert o4 == o5 == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_source_min(spark):
    from pandasvcf_spark.operators.graph import bfs_levels

    # sources at both ends of a path: middle node takes the MIN hop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src int, dst int"
    )
    src = spark.createDataFrame([(1,), (5,)], "node int")
    out = {r["node"]: r["dist"] for r in
           bfs_levels(edges, src, max_depth=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0}


# --- kmv_intersect / nelson_aalen / attribution_report ---------------------


def test_kmv_intersect_exhaustive_exact(spark):
    from pandasvcf_spark.operators.sketches import kmv_intersect

    # both sides under k -> exact counts: A={a..e}, B={c..g}: common 3,
    # union 7, jaccard 3/7
    a = spark.createDataFrame([(x,) for x in "abcde"], "k string")
    b = spark.createDataFrame([(x,) for x in "cdefg"], "k string")
    r = kmv_intersect(a, "k", b, "k", k=64).collect()[0]
    assert r["n_common"] == 3 and r["n_union"] == 7
    assert r["est_intersection"] == 3.0 and r["est_union"] == 7.0
    assert r["jaccard"] == round(3.0 / 7.0, 6)


def test_kmv_intersect_sketched_mode_reasonable(spark):
    from pandasvcf_spark.operators.sketches import kmv_intersect

    # 2000 vs 2000 with 1000 shared keys; k=256 sketches: estimate
    # within 20% of truth
    a = spark.range(2000).selectExpr("cast(id * 31337 as string) as k")
    b = spark.range(1000, 3000).selectExpr(
        "cast(id * 31337 as string) as k"
    )
    r = kmv_intersect(a, "k", b, "k", k=256).collect()[0]
    assert r["k_used_a"] == 256 and r["k_used_b"] == 256
    assert 800 <= r["est_intersection"] <= 1200
    assert 2400 <= r["est_union"] <= 3600


def test_nelson_aalen_textbook(spark):
    from pandasvcf_spark.operators.relational import nelson_aalen

    # times (1 event), (2 censored), (3 event): n_risk 3, 2, 1
    # H(1) = 1/3 ; H(3) = 1/3 + 1/1 ; var(3) = 1/9 + 1
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "t double, ev int"
    )
    out = {r["t"]: r for r in nelson_aalen(df, "t", "ev").collect()}
    assert set(out) == {1.0, 3.0}  # censored-only time absent
    assert out[1.0]["n_risk"] == 3
    assert out[1.0]["cum_hazard"] == round(1.0 / 3.0, 6)
    assert out[3.0]["cum_hazard"] == round(1.0 / 3.0 + 1.0, 6)
    assert out[3.0]["var_hazard"] == round(1.0 / 9.0 + 1.0, 6)


def test_attribution_credit_split(spark):
    from pandasvcf_spark.operators.relational import attribution_report

    # user 1: touches A(t=10), B(t=20), conversion at t=30 ->
    #   last=B, first=A, linear 0.5 each
    # user 2: touch C at t=5 outside the 20 s lookback of conv at t=30
    # (window is [ct - lookback, ct) = [10, 30), inclusive left edge)
    touches = spark.createDataFrame(
        [(1, 10, 100, "A"), (1, 20, 101, "B"), (2, 5, 102, "C")],
        "user_id int, ts_s long, touch_id int, channel string",
    )
    convs = spark.createDataFrame(
        [(1, 30, 900), (2, 30, 901)],
        "user_id int, ts_s long, conv_id int",
    )
    out = {r["channel"]: r for r in attribution_report(
        touches, convs, lookback_s=20).collect()}
    assert set(out) == {"A", "B"}
    assert out["B"]["n_last"] == 1 and out["B"]["n_first"] == 0
    assert out["A"]["n_first"] == 1 and out["A"]["n_last"] == 0
    assert out["A"]["linear"] == 0.5 and out["B"]["linear"] == 0.5


def test_attribution_tie_breaks_by_touch_id(spark):
    from pandasvcf_spark.operators.relational import attribution_report

    # two touches at the same second: higher touch_id wins last-touch,
    # lower wins first-touch
    touches = spark.createDataFrame(
        [(1, 10, 100, "A"), (1, 10, 101, "B")],
        "user_id int, ts_s long, touch_id int, channel string",
    )
    convs = spark.createDataFrame(
        [(1, 30, 900)], "user_id int, ts_s long, conv_id int"
    )
    out = {r["channel"]: r for r in attribution_report(
        touches, convs, lookback_s=100).collect()}
    assert out["B"]["n_last"] == 1 and out["A"]["n_first"] == 1


# --- wilson_topk / theil_sen / weighted_quantiles --------------------------


def test_wilson_small_n_penalized(spark):
    from pandasvcf_spark.operators.stats import wilson_topk

    # 1-of-1 must rank BELOW 95-of-100 despite the higher raw rate
    rows = [("a", 1)] + [("b", 1)] * 95 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "item string, y int")
    out = wilson_topk(df, ["item"], "y", k=10).collect()
    assert [r["item"] for r in out] == ["b", "a"]
    assert out[0]["rate"] == 0.95 and out[1]["rate"] == 1.0


def test_theil_sen_outlier_immune(spark):
    from pandasvcf_spark.operators.stats import theil_sen

    # y = 2x except one wild outlier; median slope stays 2
    rows = [(0, float(x), 2.0 * x) for x in range(1, 7)]
    rows[3] = (0, 4.0, 1000.0)
    df = spark.createDataFrame(rows, "g int, x double, y double")
    r = theil_sen(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 2.0
    assert r["n_points"] == 6 and r["n_pairs"] == 15


def test_theil_sen_vertical_pairs_skipped(spark):
    from pandasvcf_spark.operators.stats import theil_sen

    # duplicate x contributes no pair with itself
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (0, 1.0, 5.0), (0, 2.0, 2.0)],
        "g int, x double, y double",
    )
    r = theil_sen(df, ["g"], "x", "y").collect()[0]
    assert r["n_pairs"] == 2  # (1,?)->(2,2) twice; (1,1)-(1,5) skipped


def test_weighted_quantiles_hand(spark):
    from pandasvcf_spark.operators.stats import weighted_quantiles

    # values 1..4 with weights 1,1,1,7 (W=10):
    # p=0.5 -> first v with cumw >= 5 is 4; p=0.3 -> cumw>=3 at v=3
    df = spark.createDataFrame(
        [(0, 1.0, 1), (0, 2.0, 1), (0, 3.0, 1), (0, 4.0, 7)],
        "g int, v double, w long",
    )
    out = {r["p"]: r["q"] for r in weighted_quantiles(
        df, ["g"], "v", "w", probs=(0.3, 0.5, 1.0)).collect()}
    assert out[0.3] == 3.0 and out[0.5] == 4.0 and out[1.0] == 4.0


def test_weighted_quantiles_ties_merge(spark):
    from pandasvcf_spark.operators.stats import weighted_quantiles

    # tied values: cumulative weight at a value includes ALL its rows
    df = spark.createDataFrame(
        [(0, 1.0, 4), (0, 1.0, 4), (0, 2.0, 2)],
        "g int, v double, w long",
    )
    out = {r["p"]: r["q"] for r in weighted_quantiles(
        df, ["g"], "v", "w", probs=(0.5,)).collect()}
    assert out[0.5] == 1.0  # cumw at v=1 is 8 >= 5


# --- silhouette / cronbach / diversity -------------------------------------


def test_silhouette_separated_blobs(spark):
    from pandasvcf_spark.operators.stats import silhouette_by_centroid

    rows = [(0, 0.0, 0.1), (0, 0.1, 0.0), (0, 0.0, 0.0),
            (1, 9.0, 9.0), (1, 9.1, 9.0), (1, 9.0, 9.1)]
    df = spark.createDataFrame(rows, "l int, x double, y double")
    out = {r["l"]: r["mean_sil"] for r in
           silhouette_by_centroid(df, "l", ["x", "y"]).collect()}
    assert out[0] > 0.9 and out[1] > 0.9


def test_silhouette_single_cluster_raises(spark):
    from pandasvcf_spark.operators.stats import silhouette_by_centroid

    df = spark.createDataFrame([(0, 1.0)], "l int, x double")
    with pytest.raises(ValueError):
        silhouette_by_centroid(df, "l", ["x"])


def test_cronbach_parallel_items_is_one(spark):
    from pandasvcf_spark.operators.stats import cronbach_alpha

    # identical items: k/(k-1)*(1 - k*v/(k^2*v)) = k/(k-1)*(1-1/k) = 1
    rows = [(float(i), float(i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "i1 double, i2 double")
    assert cronbach_alpha(df, ["i1", "i2"]).collect()[0]["alpha"] == 1.0


def test_cronbach_anticorrelated_negative(spark):
    from pandasvcf_spark.operators.stats import cronbach_alpha

    # imperfectly anti-correlated items: alpha < 0 is legal and expected
    rows = [(1.0, 4.0), (2.0, 3.5), (3.0, 2.0), (4.0, 1.0)]
    df = spark.createDataFrame(rows, "i1 double, i2 double")
    a = cronbach_alpha(df, ["i1", "i2"]).collect()[0]["alpha"]
    assert a is not None and a < 0


def test_cronbach_constant_total_null(spark):
    from pandasvcf_spark.operators.stats import cronbach_alpha

    # PERFECT anti-correlation makes the total constant -> var(total)=0
    # -> alpha NULL (undefined), not an arbitrary number
    rows = [(1.0, 4.0), (2.0, 3.0), (3.0, 2.0), (4.0, 1.0)]
    df = spark.createDataFrame(rows, "i1 double, i2 double")
    assert cronbach_alpha(df, ["i1", "i2"]).collect()[0]["alpha"] is None


def test_diversity_uniform_vs_skewed(spark):
    from pandasvcf_spark.operators.stats import diversity_indices

    import math

    rows = [("u", c) for c in "abcd"] * 3
    rows += [("s", "a")] * 9 + [("s", "b")]
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in
           diversity_indices(df, ["g"], "c").collect()}
    assert out["u"]["richness"] == 4
    assert out["u"]["evenness"] == 1.0  # uniform -> Pielou 1
    assert out["u"]["shannon"] == round(math.log(4.0), 6)
    assert out["s"]["simpson"] == round(1 - (0.81 + 0.01), 6)
    assert out["s"]["evenness"] < 0.5


# --- ks_test / mad_outliers / lin_ccc / levene_bf --------------------------


def test_ks_identical_zero_and_disjoint_one(spark):
    from pandasvcf_spark.operators.stats import ks_test_2samp

    rows = [(0, float(v), 1) for v in range(5)]
    rows += [(0, float(v), 0) for v in range(5)]        # identical
    rows += [(1, float(v), 1) for v in range(5)]
    rows += [(1, float(v) + 100, 0) for v in range(5)]  # disjoint
    df = spark.createDataFrame(rows, "g int, v double, f int")
    out = {r["g"]: r for r in ks_test_2samp(df, ["g"], "v", "f").collect()}
    assert out[0]["d"] == 0.0
    assert out[1]["d"] == 1.0


def test_ks_hand_value(spark):
    from pandasvcf_spark.operators.stats import ks_test_2samp

    import math

    # sample1 = {1,2}, sample0 = {2,3}: at v=1 |1/2-0|=.5; v=2 |1-1/2|=.5;
    # v=3 |1-1|=0 -> D=0.5 ; z = 0.5*sqrt(4/4) = 0.5
    df = spark.createDataFrame(
        [(0, 1.0, 1), (0, 2.0, 1), (0, 2.0, 0), (0, 3.0, 0)],
        "g int, v double, f int",
    )
    r = ks_test_2samp(df, ["g"], "v", "f").collect()[0]
    assert r["d"] == 0.5 and r["z"] == 0.5


def test_mad_outliers_planted(spark):
    from pandasvcf_spark.operators.stats import mad_outliers

    # values 1..9 (med 5, MAD 2) + one wild 1000:
    # n=10 -> median index ceil(10/2)=5 -> med 5; dev med -> mad 2
    # threshold 3*1.4826*2 = 8.8956: only 1000 exceeds
    rows = [(0, float(v)) for v in range(1, 10)] + [(0, 1000.0)]
    df = spark.createDataFrame(rows, "g int, v double")
    r = mad_outliers(df, ["g"], "v", k=3.0).collect()[0]
    assert r["med"] == 5.0 and r["mad"] == 2.0
    assert r["n_outliers"] == 1


def test_lin_ccc_offset_judges(spark):
    from pandasvcf_spark.operators.stats import lin_ccc

    # y = x + 2: Pearson 1, CCC = 2v/(2v+4) with v = pop var of x
    rows = [(0, float(i), float(i) + 2.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    r = lin_ccc(df, ["g"], "x", "y").collect()[0]
    assert r["pearson"] == 1.0
    v = sum((i - 3.0) ** 2 for i in range(1, 6))  # n*popvar = 10
    assert r["ccc"] == round(2 * v / (2 * v + 5 * 4.0), 6)


def test_levene_equal_vs_unequal_spread(spark):
    from pandasvcf_spark.operators.stats import levene_bf

    # same spread in both groups -> F ~ 0; one wide group -> F large
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)]
    rows += [("b", float(v) + 100) for v in (1, 2, 3, 4, 5)]
    same = levene_bf(
        spark.createDataFrame(rows, "g string, v double"), "g", "v"
    ).collect()[0]
    assert same["f_stat"] == 0.0  # identical deviation profiles
    rows2 = [("a", float(v)) for v in (1, 2, 3, 4, 5)]
    rows2 += [("b", float(v) * 50) for v in (1, 2, 3, 4, 5)]
    diff = levene_bf(
        spark.createDataFrame(rows2, "g string, v double"), "g", "v"
    ).collect()[0]
    assert diff["f_stat"] > 5


# --- knn_majority_vote / pca_power_topvec ----------------------------------


def test_knn_majority_vote_and_tiebreak(spark):
    from pandasvcf_spark.operators.similarity import knn_majority_vote

    knn = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12),   # q1: labels a, a, b -> a
         (2, 10), (2, 12)],           # q2: a, b tie -> smaller label
        "query_id int, vec_id int",
    )
    labels = spark.createDataFrame(
        [(10, "a"), (11, "a"), (12, "b")], "vec_id int, label string"
    )
    out = {r["query_id"]: r for r in
           knn_majority_vote(knn, labels).collect()}
    assert out[1]["pred_label"] == "a" and out[1]["n_votes"] == 2
    assert out[2]["pred_label"] == "a" and out[2]["n_votes"] == 1


def test_pca_power_diagonal_recovery(spark):
    from pandasvcf_spark.operators.stats import pca_power_topvec

    # x dominates variance -> PC1 ~ e1, rayleigh ~ var(x)
    import random

    rng = random.Random(7)
    rows = [(rng.gauss(0, 10.0), rng.gauss(0, 0.1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = pca_power_topvec(df, ["x", "y"], iters=3).collect()[0]
    assert abs(abs(r["v_x"]) - 1.0) < 1e-3
    assert abs(r["v_y"]) < 1e-2
    assert r["rayleigh"] > 50  # ~ var(x) ~ 100


def test_pca_power_validates(spark):
    from pandasvcf_spark.operators.stats import pca_power_topvec

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError):
        pca_power_topvec(df, ["x"])
    with pytest.raises(ValueError):
        pca_power_topvec(df, ["x", "y"], iters=0)


# --- pacf / cuped / seasonal_naive / code_signals --------------------------


def test_pacf_ar1_second_partial_vanishes(spark):
    from pandasvcf_spark.operators.stats import pacf_stats

    # exact AR(1) with no noise: x_t = 0.8^t -> r_k = geometric-ish;
    # on a PURE geometric series pacf_22 = (r2 - r1^2)/(1 - r1^2)
    # with r2 == r1^2 exactly in the infinite case; finite series is
    # close -> |pacf_22| << |pacf_11|
    rows = [(t, 0.8 ** t) for t in range(60)]
    df = spark.createDataFrame(rows, "t int, x double")
    out = {r["lag"]: r for r in pacf_stats(df, "t", "x").collect()}
    assert out[1]["pacf"] == out[1]["acf"]
    assert abs(out[2]["pacf"]) < abs(out[1]["pacf"]) / 3


def test_cuped_perfect_covariate(spark):
    from pandasvcf_spark.operators.stats import cuped_adjust

    # post = 2*pre exactly: corr 1, var_reduction 1, theta 2
    rows = [(i, float(i), 2.0 * i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "u int, pre double, post double")
    r = cuped_adjust(df, "u", "pre", "post").collect()[0]
    assert r["theta"] == 2.0 and r["corr"] == 1.0
    assert r["var_reduction"] == 1.0


def test_cuped_constant_pre_null(spark):
    from pandasvcf_spark.operators.stats import cuped_adjust

    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 2.0)], "u int, pre double, post double"
    )
    assert cuped_adjust(df, "u", "pre", "post").collect()[0][
        "theta"
    ] is None


def test_seasonal_naive_exact_repeat(spark):
    from pandasvcf_spark.operators.stats import seasonal_naive_eval

    # period-3 exact repetition: MAE 0, sMAPE 0; 6 points -> 3 evals
    rows = [(0, t, float([5, 7, 9][t % 3])) for t in range(6)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = seasonal_naive_eval(df, ["g"], "t", "x", period=3).collect()[0]
    assert r["n_eval"] == 3 and r["mae"] == 0.0 and r["smape"] == 0.0


def test_seasonal_naive_known_error(spark):
    from pandasvcf_spark.operators.stats import seasonal_naive_eval

    # x = (10, 10, 14): period 1 -> errors |0|, |4| -> MAE 2
    rows = [(0, 0, 10.0), (0, 1, 10.0), (0, 2, 14.0)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = seasonal_naive_eval(df, ["g"], "t", "x", period=1).collect()[0]
    assert r["n_eval"] == 2 and r["mae"] == 2.0
    assert r["smape"] == round((0.0 + 2 * 4 / 24) / 2, 6)


def test_code_signals_planted_snippet(spark):
    from pandasvcf_spark.operators.text_features import code_signals

    df = spark.createDataFrame(
        [(1, "def f(x): return x*2 if (x)>0 else {};"),
         (2, "the plain prose sentence with words only"),
         (3, "someCamelCase otherCamelThing moreCamelHere")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in code_signals(df).collect()}
    assert out[1]["is_code"] is True      # symbol density
    assert out[2]["is_code"] is False
    assert out[3]["is_code"] is True      # camel transitions >= 3
    assert out[3]["camel_pairs"] == 6     # two per camel word


# --- markov_stationary / rfm / roc_points / powerlaw -----------------------


def test_markov_two_state_exact(spark):
    from pandasvcf_spark.operators.relational import markov_stationary

    # P = [[0, 1], [1, 0]] from uniform: pi stays (0.5, 0.5) forever
    t = spark.createDataFrame(
        [("a", "b", 10), ("b", "a", 7)], "prev string, next string, cnt int"
    )
    out = {r["state"]: r["pi"] for r in
           markov_stationary(t, iters=2).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_markov_absorbing_pull(spark):
    from pandasvcf_spark.operators.relational import markov_stationary

    # a->a 3x vs a->b 1x, b->a always: a should end up above 1/2
    t = spark.createDataFrame(
        [("a", "a", 3), ("a", "b", 1), ("b", "a", 4)],
        "prev string, next string, cnt int",
    )
    out = {r["state"]: r["pi"] for r in
           markov_stationary(t, iters=3).collect()}
    assert out["a"] > 0.7 and abs(out["a"] + out["b"] - 1.0) < 2e-6


def test_rfm_single_dimension_buckets(spark):
    from pandasvcf_spark.operators.relational import rfm_segments

    # 5 users, one event each on distinct days with distinct values:
    # each bucket dimension gets exactly one user per bucket
    rows = [(u, 100 + u, float(u * 10)) for u in range(1, 6)]
    df = spark.createDataFrame(rows, "user_id int, day long, value double")
    out = rfm_segments(df, "user_id", "day", "value", n_buckets=5).collect()
    assert sum(r["n_users"] for r in out) == 5
    assert {r["m_bucket"] for r in out} == {0, 1, 2, 3, 4}
    # newest day (user 5) -> r_bucket 0; highest value (user 5) -> m 0
    top = [r for r in out if r["m_bucket"] == 0][0]
    assert top["r_bucket"] == 0 and top["avg_monetary"] == 50.0


def test_roc_points_staircase(spark):
    from pandasvcf_spark.operators.stats import roc_points

    # scores desc: 4(y1), 3(y0), 2(y1), 1(y0) ->
    # points: (.5,0), (.5,.5), (1,.5), (1,1)
    df = spark.createDataFrame(
        [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)], "s double, y int"
    )
    out = [(r["tpr"], r["fpr"]) for r in roc_points(df, "s", "y").collect()]
    assert out == [(0.5, 0.0), (0.5, 0.5), (1.0, 0.5), (1.0, 1.0)]


def test_powerlaw_regular_graph_null(spark):
    from pandasvcf_spark.operators.graph import powerlaw_alpha

    # 4-cycle: every degree 2; with d_min=2 the log-sum is 0 -> NULL
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
    )
    r = powerlaw_alpha(df, d_min=2).collect()[0]
    assert r["alpha"] is None and r["n_nodes"] == 4
    assert r["mean_deg"] == 2.0


def test_powerlaw_star_alpha(spark):
    from pandasvcf_spark.operators.graph import powerlaw_alpha

    import math

    # star with 4 leaves: degrees (4, 1, 1, 1, 1); d_min=1:
    # alpha = 1 + 5/ln(4)
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    r = powerlaw_alpha(df, d_min=1).collect()[0]
    assert r["alpha"] == round(1 + 5 / math.log(4.0), 6)


# --- rand_index / drawdown / burstiness / lorenz ---------------------------


def test_rand_index_identical_and_permuted(spark):
    from pandasvcf_spark.operators.stats import rand_index

    # identical partitions (up to relabeling): RI = ARI = 1
    rows = [(i, i % 3, (i % 3) * 10) for i in range(12)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    r = rand_index(df, "a", "b").collect()[0]
    assert r["rand"] == 1.0 and r["ari"] == 1.0


def test_rand_index_split_partition(spark):
    from pandasvcf_spark.operators.stats import rand_index

    # a = one cluster, b = two equal halves of 4:
    # n=4 total=6; s_cells: cells (0,0)=2,(0,1)=2 -> 1+1=2; s_a=6; s_b=2
    # RI = (6 + 4 - 6 - 2)/6 = 1/3
    rows = [(1, 0, 0), (2, 0, 0), (3, 0, 1), (4, 0, 1)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    r = rand_index(df, "a", "b").collect()[0]
    assert r["s_cells"] == 2 and r["s_a"] == 6 and r["s_b"] == 2
    assert r["rand"] == round(1 / 3, 6)


def test_max_drawdown_hand(spark):
    from pandasvcf_spark.operators.stats import max_drawdown

    # increments 5, -3, 1, -4, 10: cum 5,2,3,-1,9; peaks 5,5,5,5,9
    # dd 0,3,2,6,0 -> max 6; final 9
    rows = [(0, t, x) for t, x in
            enumerate([5.0, -3.0, 1.0, -4.0, 10.0])]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = max_drawdown(df, ["g"], "t", "x").collect()[0]
    assert r["max_dd"] == 6.0 and r["final"] == 9.0 and r["n_steps"] == 5


def test_max_drawdown_monotone_zero(spark):
    from pandasvcf_spark.operators.stats import max_drawdown

    rows = [(0, t, 1.0) for t in range(5)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    assert max_drawdown(df, ["g"], "t", "x").collect()[0]["max_dd"] == 0.0


def test_burstiness_constant_series(spark):
    from pandasvcf_spark.operators.stats import burstiness_stats

    # constant counts: var 0 -> fano 0, burstiness = -1
    rows = [(0, 5.0)] * 6
    df = spark.createDataFrame(rows, "g int, x double")
    r = burstiness_stats(df, ["g"], "x").collect()[0]
    assert r["fano"] == 0.0 and r["burstiness"] == -1.0
    assert r["mean"] == 5.0


def test_lorenz_uniform_diagonal(spark):
    from pandasvcf_spark.operators.stats import lorenz_deciles

    # equal values: cum_share at bucket b = (b+1)/10
    rows = [(i, 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, v double")
    out = {r["bucket"]: r["cum_share"] for r in
           lorenz_deciles(df, "v", "id").collect()}
    assert out[0] == 0.1 and out[4] == 0.5 and out[9] == 1.0


def test_lorenz_negative_raises(spark):
    from pandasvcf_spark.operators.stats import lorenz_deciles

    df = spark.createDataFrame([(1, -1.0), (2, 3.0)], "id int, v double")
    with pytest.raises(Exception):
        lorenz_deciles(df, "v", "id").collect()


# --- logrank / gumbel / changepoint ----------------------------------------


def test_logrank_identical_groups_zero(spark):
    from pandasvcf_spark.operators.stats import logrank_test

    # mirrored samples -> O1 = E1 -> z = 0
    rows = [(float(t), 1, g) for t in (1, 2, 3, 4) for g in (0, 1)]
    df = spark.createDataFrame(rows, "t double, ev int, g int")
    r = logrank_test(df, "t", "ev", "g").collect()[0]
    assert r["z"] == 0.0 and r["o1"] == 4


def test_logrank_shifted_group_negative_z(spark):
    from pandasvcf_spark.operators.stats import logrank_test

    # group 1 dies strictly earlier -> O1 > E1 early... z sign: all
    # group-1 events happen while both groups fully at risk -> O1 - E1 > 0
    rows = [(float(t), 1, 1) for t in (1, 2, 3)]
    rows += [(float(t), 1, 0) for t in (10, 11, 12)]
    df = spark.createDataFrame(rows, "t double, ev int, g int")
    r = logrank_test(df, "t", "ev", "g").collect()[0]
    assert r["z"] is not None and r["z"] > 1.5
    assert r["chi2"] == round(r["z"] ** 2, 6) or abs(
        r["chi2"] - r["z"] ** 2) < 1e-4


def test_gumbel_hand_moments(spark):
    from pandasvcf_spark.operators.stats import (
        GUMBEL_GAMMA,
        GUMBEL_PI,
        gumbel_extremes,
    )

    import math
    import statistics

    vals = [10.0, 12.0, 15.0, 11.0, 13.0, 20.0]
    df = spark.createDataFrame([(0, v) for v in vals], "g int, x double")
    r = gumbel_extremes(df, ["g"], "x", return_period=100.0).collect()[0]
    sd = statistics.stdev(vals)
    beta = sd * math.sqrt(6.0) / GUMBEL_PI
    mu = statistics.mean(vals) - GUMBEL_GAMMA * beta
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 100.0))
    assert r["beta"] == round(beta, 4)
    assert r["mu"] == round(mu, 4)
    assert r["rl"] == round(rl, 4)
    assert r["rl"] > max(vals)  # 100-day level beyond a 6-day sample


def test_changepoint_planted_step(spark):
    from pandasvcf_spark.operators.stats import changepoint_single

    # 5 points at 10 then 5 at 50: best split after k=5
    rows = [(0, t, 10.0) for t in range(5)]
    rows += [(0, t + 5, 50.0) for t in range(5)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = changepoint_single(df, ["g"], "t", "x").collect()[0]
    assert r["k_best"] == 5 and r["t_split"] == 4
    assert r["mean_left"] == 10.0 and r["mean_right"] == 50.0
    # gain at the true split = n/4 * diff^2 = 10/4*1600 = 4000
    assert r["gain"] == 4000.0


def test_changepoint_tie_prefers_smallest_k(spark):
    from pandasvcf_spark.operators.stats import changepoint_single

    # constant series: every split gain 0 -> k_best = 1
    rows = [(0, t, 3.0) for t in range(4)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = changepoint_single(df, ["g"], "t", "x").collect()[0]
    assert r["k_best"] == 1 and r["gain"] == 0.0


# --- dominant_period / odds_ratio / capture_recapture ----------------------


def test_dominant_period_planted_sine(spark):
    from pandasvcf_spark.operators.stats import dominant_period

    import math

    # period-8 sine sampled 64 times: lag 8 wins
    rows = [(0, t, math.sin(2 * math.pi * t / 8)) for t in range(64)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    r = dominant_period(df, ["g"], "t", "x", max_lag=12).collect()[0]
    assert r["best_lag"] == 8 and r["acf"] > 0.8


def test_dominant_period_constant_drops(spark):
    from pandasvcf_spark.operators.stats import dominant_period

    rows = [(0, t, 5.0) for t in range(20)]
    df = spark.createDataFrame(rows, "g int, t int, x double")
    assert dominant_period(df, ["g"], "t", "x", max_lag=5).count() == 0


def test_odds_ratio_textbook(spark):
    from pandasvcf_spark.operators.stats import odds_ratio

    import math

    # a=10 b=90 c=5 d=95: OR = 10*95/(90*5) = 2.1111
    rows = [(1, 1)] * 10 + [(1, 0)] * 90 + [(0, 1)] * 5 + [(0, 0)] * 95
    df = spark.createDataFrame(rows, "ex int, oc int")
    r = odds_ratio(df, "ex", "oc").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (10, 90, 5, 95)
    orr = 10 * 95 / (90 * 5)
    assert r["odds_ratio"] == round(orr, 4)
    se = math.sqrt(1 / 10 + 1 / 90 + 1 / 5 + 1 / 95)
    assert r["ci_lo"] == round(math.exp(math.log(orr) - 1.96 * se), 4)
    assert r["ci_lo"] < 1.0 < r["ci_hi"]  # not significant at n=200


def test_odds_ratio_zero_cell_null(spark):
    from pandasvcf_spark.operators.stats import odds_ratio

    rows = [(1, 1), (1, 0), (0, 0)]
    df = spark.createDataFrame(rows, "ex int, oc int")
    r = odds_ratio(df, "ex", "oc").collect()[0]
    assert r["odds_ratio"] is None and r["ci_lo"] is None


def test_capture_recapture_known_overlap(spark):
    from pandasvcf_spark.operators.stats import capture_recapture

    # universe 0..99; sample A = 0..59, B = 40..99 -> overlap 20
    a = spark.range(0, 60).selectExpr("cast(id as string) as k")
    b = spark.range(40, 100).selectExpr("cast(id as string) as k")
    r = capture_recapture(a, "k", b, "k").collect()[0]
    assert (r["n1"], r["n2"], r["m"]) == (60, 60, 20)
    assert r["lincoln"] == 180.0
    assert r["chapman"] == round(61 * 61 / 21 - 1, 4)


def test_capture_recapture_disjoint(spark):
    from pandasvcf_spark.operators.stats import capture_recapture

    a = spark.range(0, 5).selectExpr("cast(id as string) as k")
    b = spark.range(10, 15).selectExpr("cast(id as string) as k")
    r = capture_recapture(a, "k", b, "k").collect()[0]
    assert r["m"] == 0 and r["lincoln"] is None
    assert r["chapman"] == 35.0  # (6*6/1) - 1


# --- skyline / sample_size / seasonal_strength -----------------------------


def test_skyline_staircase(spark):
    from pandasvcf_spark.operators.stats import skyline_2d

    # frontier (1,5), (2,3), (4,1); (3,4) dominated by (2,3);
    # (2,6) dominated by (1,5)
    rows = [(1.0, 5.0), (2.0, 3.0), (4.0, 1.0), (3.0, 4.0), (2.0, 6.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()]
    assert out == [(1.0, 5.0), (2.0, 3.0), (4.0, 1.0)]


def test_skyline_equal_x_keeps_min_y_only(spark):
    from pandasvcf_spark.operators.stats import skyline_2d

    rows = [(1.0, 5.0), (1.0, 3.0), (2.0, 4.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = [(r["x"], r["y"]) for r in skyline_2d(df, "x", "y").collect()]
    assert out == [(1.0, 3.0)]  # (1,5) dominated; (2,4) dominated


def test_sample_size_textbook(spark):
    from pandasvcf_spark.operators.stats import sample_size_2prop

    import math

    # p1 = 0.5 (10/20), p2 = 0.25 (5/20)
    rows = [(1, 1)] * 10 + [(1, 0)] * 10 + [(0, 1)] * 5 + [(0, 0)] * 15
    df = spark.createDataFrame(rows, "g int, oc int")
    r = sample_size_2prop(df, "g", "oc").collect()[0]
    zz = 1.96 + 0.8416212335729143
    n = math.ceil(zz * zz * (0.25 + 0.1875) / (0.25 * 0.25))
    assert r["p1"] == 0.5 and r["p2"] == 0.25
    assert r["n_per_arm"] == n  # = 55


def test_sample_size_no_difference_null(spark):
    from pandasvcf_spark.operators.stats import sample_size_2prop

    rows = [(1, 1), (1, 0), (0, 1), (0, 0)]
    df = spark.createDataFrame(rows, "g int, oc int")
    assert sample_size_2prop(df, "g", "oc").collect()[0][
        "n_per_arm"
    ] is None


def test_seasonal_strength_pure_and_noise(spark):
    from pandasvcf_spark.operators.stats import seasonal_strength

    # pure slot pattern -> residuals 0 -> strength 1
    rows = [(0, t % 4, float([10, 20, 30, 40][t % 4]))
            for t in range(32)]
    # slot-free arithmetic ramp -> slot means explain ~nothing much
    rows += [(1, t % 4, float(t)) for t in range(32)]
    df = spark.createDataFrame(rows, "g int, slot int, x double")
    out = {r["g"]: r["strength"] for r in
           seasonal_strength(df, ["g"], "slot", "x").collect()}
    assert out[0] == 1.0
    assert out[1] < 0.1


def test_seasonal_strength_constant_null(spark):
    from pandasvcf_spark.operators.stats import seasonal_strength

    rows = [(0, t % 4, 5.0) for t in range(16)]
    df = spark.createDataFrame(rows, "g int, slot int, x double")
    assert seasonal_strength(df, ["g"], "slot", "x").collect()[0][
        "strength"
    ] is None


# --- longest_streaks / runs_test -------------------------------------------


def test_longest_streaks_hand(spark):
    from pandasvcf_spark.operators.relational import longest_streaks

    # user 1: F S S S F S -> longest 3; user 2: never flags -> 0
    rows = [(1, t, t, f) for t, f in
            enumerate([0, 1, 1, 1, 0, 1])]
    rows += [(2, t, t + 100, 0) for t in range(3)]
    df = spark.createDataFrame(rows, "k int, t int, eid int, f int")
    out = {r["k"]: r for r in
           longest_streaks(df, "k", "t", "f", "eid").collect()}
    assert out[1]["longest_streak"] == 3 and out[1]["n_flagged"] == 4
    assert out[2]["longest_streak"] == 0 and out[2]["n_events"] == 3


def test_longest_streaks_all_flagged(spark):
    from pandasvcf_spark.operators.relational import longest_streaks

    rows = [(1, t, t, 1) for t in range(5)]
    df = spark.createDataFrame(rows, "k int, t int, eid int, f int")
    r = longest_streaks(df, "k", "t", "f", "eid").collect()[0]
    assert r["longest_streak"] == 5


def test_runs_test_alternating_vs_sorted(spark):
    from pandasvcf_spark.operators.stats import runs_test

    # strictly alternating high/low (all values distinct so only the
    # single median point drops): maximal runs -> z >> 0
    alt = [(t, float(100 + t if t % 2 else t)) for t in range(40)]
    r = runs_test(
        spark.createDataFrame(alt, "t int, x double"), "t", "x"
    ).collect()[0]
    assert r["z"] is not None and r["z"] > 4
    # sorted series: 2 runs -> z << 0
    srt = [(t, float(t)) for t in range(40)]
    r2 = runs_test(
        spark.createDataFrame(srt, "t int, x double"), "t", "x"
    ).collect()[0]
    assert r2["runs"] == 2 and r2["z"] < -4


def test_runs_test_median_values_excluded(spark):
    from pandasvcf_spark.operators.stats import runs_test

    # values equal to the (lower) median drop from the sequence
    rows = [(0, 1.0), (1, 2.0), (2, 2.0), (3, 3.0)]
    r = runs_test(
        spark.createDataFrame(rows, "t int, x double"), "t", "x"
    ).collect()[0]
    assert r["n1"] + r["n2"] == 2  # both 2.0s excluded


# --- fleiss_kappa / quantile_shift / control_chart -------------------------


def test_fleiss_unanimous_is_one(spark):
    from pandasvcf_spark.operators.stats import fleiss_kappa

    # 3 raters, every item unanimous but categories split across items
    rows = [(i, i % 2) for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "i int, c int")
    r = fleiss_kappa(df, "i", "c").collect()[0]
    assert r["p_bar"] == 1.0 and r["kappa"] == 1.0
    assert r["n_items"] == 10 and r["n_raters"] == 3


def test_fleiss_single_category_null(spark):
    from pandasvcf_spark.operators.stats import fleiss_kappa

    rows = [(i, 0) for i in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "i int, c int")
    r = fleiss_kappa(df, "i", "c").collect()[0]
    assert r["p_e"] == 1.0 and r["kappa"] is None


def test_fleiss_unequal_raters_raises(spark):
    from pandasvcf_spark.operators.stats import fleiss_kappa

    rows = [(1, 0), (1, 0), (1, 1), (2, 0), (2, 1)]
    df = spark.createDataFrame(rows, "i int, c int")
    with pytest.raises(ValueError):
        fleiss_kappa(df, "i", "c")


def test_quantile_shift_planted_tail(spark):
    from pandasvcf_spark.operators.stats import quantile_shift

    # side 1 = side 0 shifted by +100 only in the top half
    v0 = [float(v) for v in range(1, 21)]
    v1 = [v if v <= 10 else v + 100.0 for v in v0]
    rows = [(0, v) for v in v0] + [(1, v) for v in v1]
    df = spark.createDataFrame(rows, "f int, v double")
    out = {r["p"]: r for r in
           quantile_shift(df, "f", "v", probs=(0.25, 0.9)).collect()}
    assert out[0.25]["shift"] == 0.0      # lower quartile untouched
    assert out[0.9]["shift"] == 100.0     # tail moved


def test_control_chart_breaches(spark):
    from pandasvcf_spark.operators.stats import control_chart

    import math

    # 9 points at 9 + one spike 100: cl = 18.1, ucl = cl + 3*sqrt(cl)
    rows = [(0, 9.0)] * 9 + [(0, 100.0)]
    df = spark.createDataFrame(rows, "g int, x double")
    r = control_chart(df, ["g"], "x").collect()[0]
    cl = (9.0 * 9 + 100.0) / 10
    assert r["cl"] == round(cl, 4)
    assert r["ucl"] == round(cl + 3 * math.sqrt(cl), 4)
    assert r["n_above"] == 1 and r["n_below"] == 0


# --- mcnemar / overlap_coeff / term_burstiness -----------------------------


def test_mcnemar_hand(spark):
    from pandasvcf_spark.operators.stats import mcnemar_test

    import math

    # b=6, c=2: chi2 = 16/8 = 2; z = 4/sqrt(8)
    rows = ([(1, 1)] * 3 + [(1, 0)] * 6 + [(0, 1)] * 2 + [(0, 0)] * 4)
    df = spark.createDataFrame(rows, "y1 int, y2 int")
    r = mcnemar_test(df, "y1", "y2").collect()[0]
    assert (r["n11"], r["b"], r["c"], r["n00"]) == (3, 6, 2, 4)
    assert r["chi2"] == 2.0
    assert r["z"] == round(4.0 / math.sqrt(8.0), 6)


def test_mcnemar_no_discordant_null(spark):
    from pandasvcf_spark.operators.stats import mcnemar_test

    rows = [(1, 1), (0, 0)]
    df = spark.createDataFrame(rows, "y1 int, y2 int")
    r = mcnemar_test(df, "y1", "y2").collect()[0]
    assert r["chi2"] is None and r["z"] is None


def test_overlap_identical_and_disjoint(spark):
    from pandasvcf_spark.operators.stats import overlap_coeff

    same = [(f, float(v)) for f in (0, 1) for v in range(20)]
    r = overlap_coeff(
        spark.createDataFrame(same, "f int, v double"), "f", "v"
    ).collect()[0]
    assert r["ovl"] == 1.0 and r["bc"] == 1.0
    apart = [(0, float(v)) for v in range(10)]
    apart += [(1, float(v) + 1000) for v in range(10)]
    r2 = overlap_coeff(
        spark.createDataFrame(apart, "f int, v double"), "f", "v"
    ).collect()[0]
    assert r2["ovl"] == 0.0 and r2["bc"] == 0.0


def test_term_burstiness_planted(spark):
    from pandasvcf_spark.operators.text_features import term_burstiness

    # 'zzz' appears 10x in one doc (bursty); 'the' once in each of 10
    docs = [(i, "the filler words here") for i in range(10)]
    docs.append((99, " ".join(["zzz"] * 10)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = term_burstiness(df, min_df=1, top_n=5).collect()
    assert out[0]["word"] == "zzz"
    assert out[0]["cf"] == 10 and out[0]["df"] == 1
    assert out[0]["burst"] == 10.0
    the = [r for r in out if r["word"] == "the"]
    assert not the or the[0]["burst"] == 1.0


# --- classifier_report / brier_decomposition -------------------------------


def test_classifier_report_perfect_and_reversed(spark):
    from pandasvcf_spark.operators.stats import classifier_report

    # perfectly separating score: auc 1, ks 1, brier 0 at p in {0,1}
    rows = [(1.0, 1)] * 5 + [(0.0, 0)] * 5
    df = spark.createDataFrame(rows, "p double, y int")
    r = classifier_report(df, "p", "y").collect()[0]
    assert r["auc"] == 1.0 and r["ks"] == 1.0
    assert r["brier"] == 0.0 and r["ece"] == 0.0
    # reversed score: auc 0
    rows2 = [(0.0, 1)] * 5 + [(1.0, 0)] * 5
    r2 = classifier_report(
        spark.createDataFrame(rows2, "p double, y int"), "p", "y"
    ).collect()[0]
    assert r2["auc"] == 0.0 and r2["brier"] == 1.0


def test_classifier_report_ties_half_counted(spark):
    from pandasvcf_spark.operators.stats import classifier_report

    # constant score: every pos/neg pair tied -> auc exactly 0.5
    rows = [(0.5, 1)] * 4 + [(0.5, 0)] * 6
    r = classifier_report(
        spark.createDataFrame(rows, "p double, y int"), "p", "y"
    ).collect()[0]
    assert r["auc"] == 0.5


def test_brier_decomposition_identity_on_constant_bins(spark):
    from pandasvcf_spark.operators.stats import brier_decomposition

    # forecasts constant within bins (0.05 and 0.95): residual == 0
    rows = [(0.05, 0)] * 8 + [(0.05, 1)] * 2
    rows += [(0.95, 1)] * 7 + [(0.95, 0)] * 3
    df = spark.createDataFrame(rows, "p double, y int")
    r = brier_decomposition(df, "p", "y").collect()[0]
    assert r["residual"] == 0.0
    # identity: brier = rel - res + unc
    assert r["brier"] == round(r["rel"] - r["res"] + r["unc"], 6)
    assert r["unc"] == round(0.45 * 0.55, 6)  # base = 9/20


def test_classifier_report_auc_matches_group_auc(spark):
    """Cross-operator consistency: the distinct-score-curve AUC must
    equal the rank-form group_auc on the same data (they are the same
    statistic through different machinery — an orientation or tie bug
    in either shows up here)."""
    from pandasvcf_spark.operators.relational import group_auc
    from pandasvcf_spark.operators.stats import classifier_report

    rows = [((i * 37 % 100) / 100.0, 1 if (i * 53) % 7 < 3 else 0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "p double, y int")
    a1 = classifier_report(df, "p", "y").collect()[0]["auc"]
    a2 = group_auc(
        df.select(F.lit(0).alias("g"), "p", "y"), ["g"], "p", "y"
    ).collect()[0]["auc"]
    assert a1 == a2


# --- dim_truncation_recall / equivalence_test ------------------------------


def test_dim_truncation_full_dims_recall_one(spark):
    from pandasvcf_spark.operators.similarity import dim_truncation_recall

    import random

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = e.limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r = dim_truncation_recall(e, q, dims=8, k=3).collect()[0]
    assert r["mean_recall"] == 1.0 and r["min_recall"] == 1.0
    assert r["n_queries"] == 10


def test_dim_truncation_orthogonal_tail_drops(spark):
    from pandasvcf_spark.operators.similarity import dim_truncation_recall

    import random

    # signal lives in dims 3-8; first 2 dims are pure noise ->
    # truncating to 2 dims must lose most of the neighborhood
    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1)] * 2 + [rng.gauss(0, 1) for _ in range(6)])
            for i in range(60)]
    e = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = e.limit(15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r = dim_truncation_recall(e, q, dims=2, k=3).collect()[0]
    assert r["mean_recall"] < 0.7


def test_equivalence_verdicts(spark):
    from pandasvcf_spark.operators.stats import equivalence_test

    # identical rates, large n -> CI tight around 0 -> equivalent
    rows = [(g, 1 if i % 10 == 0 else 0) for g in (0, 1)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, oc int")
    r = equivalence_test(df, "g", "oc", margin=0.05).collect()[0]
    assert r["equivalent"] is True and abs(r["diff"]) < 1e-9
    # blatant difference -> not equivalent
    rows2 = [(1, 1)] * 500 + [(1, 0)] * 500 + [(0, 1)] * 100 + [(0, 0)] * 900
    r2 = equivalence_test(
        spark.createDataFrame(rows2, "g int, oc int"), "g", "oc",
        margin=0.05,
    ).collect()[0]
    assert r2["equivalent"] is False and r2["diff"] == 0.4


# --- round-9 nonparametric family ------------------------------------------


def test_kendall_tau_b_reference_with_ties(spark):
    """Exact agreement with the O(n^2) pair-walk definition on a tied
    sample, plus the perfect-concordance and reversal poles."""
    import itertools
    import math
    from collections import Counter

    from pandasvcf_spark.operators.stats import kendall_tau_b

    xs = [1, 2, 2, 3, 5, 5, 5, 7]
    ys = [2, 1, 3, 3, 4, 4, 6, 5]
    n = len(xs)
    C = D = 0
    for i, j in itertools.combinations(range(n), 2):
        a = (xs[i] - xs[j]) * (ys[i] - ys[j])
        C += a > 0
        D += a < 0
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(ys).values())
    ref = round((C - D) / math.sqrt((n0 - n1) * (n0 - n2)), 6)
    df = spark.createDataFrame(list(zip(xs, ys)), "x int, y int")
    got = kendall_tau_b(df, "x", "y").collect()[0]
    assert (got["concordant"], got["discordant"]) == (C, D)
    assert got["tau_b"] == ref
    ident = spark.createDataFrame([(i, i) for i in range(6)], "x int, y int")
    assert kendall_tau_b(ident, "x", "y").collect()[0]["tau_b"] == 1.0
    rev = spark.createDataFrame([(i, -i) for i in range(6)], "x int, y int")
    assert kendall_tau_b(rev, "x", "y").collect()[0]["tau_b"] == -1.0


def test_kruskal_wallis_reference_and_identical_groups(spark):
    """Exact agreement with the mid-rank + tie-correction definition;
    identical group distributions give h ~ 0 shape (small but defined),
    all-tied values give NULL (C = 0)."""
    from collections import Counter

    from pandasvcf_spark.operators.stats import kruskal_wallis

    g1, g2, g3 = [1, 2, 2, 5], [3, 3, 4, 4, 9], [2, 6, 6, 8]
    allv = [v for g in (g1, g2, g3) for v in g]
    cnt = Counter(allv)
    ranks, cum = {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    N = len(allv)
    H = 12 / (N * (N + 1)) * sum(
        sum(ranks[v] for v in g) ** 2 / len(g) for g in (g1, g2, g3)
    ) - 3 * (N + 1)
    Cc = 1 - sum(t**3 - t for t in cnt.values()) / (N**3 - N)
    rows = (
        [("a", v) for v in g1]
        + [("b", v) for v in g2]
        + [("c", v) for v in g3]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    got = kruskal_wallis(df, [], "k", "v").collect()[0]
    assert got["h"] == round(H / Cc, 6)
    assert (got["n"], got["k"]) == (N, 3)
    tied = spark.createDataFrame(
        [("a", 7), ("a", 7), ("b", 7), ("b", 7)], "k string, v int"
    )
    assert kruskal_wallis(tied, [], "k", "v").collect()[0]["h"] is None


def test_wilcoxon_signed_rank_reference_zero_drop(spark):
    """Exact agreement with the |d| mid-rank definition; zero
    differences drop from n (the standard convention)."""
    import math
    from collections import Counter

    from pandasvcf_spark.operators.stats import wilcoxon_signed_rank

    x = [10, 12, 9, 15, 14, 11, 8, 13]
    y = [8, 12, 11, 11, 9, 12, 8, 9]  # two zero diffs
    ds = [a - b for a, b in zip(x, y) if a != b]
    n = len(ds)
    cnt = Counter(abs(d) for d in ds)
    ranks, cum = {}, 0
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = cum + (t + 1) / 2
        cum += t
    wp = sum(ranks[abs(d)] for d in ds if d > 0)
    var = n * (n + 1) * (2 * n + 1) / 24 - sum(
        t**3 - t for t in cnt.values()
    ) / 48
    zref = round((wp - n * (n + 1) / 4) / math.sqrt(var), 6)
    df = spark.createDataFrame(list(zip(x, y)), "x int, y int")
    got = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert got["n"] == n == 6
    assert got["w_plus"] == round(wp, 4)
    assert got["z"] == zref


def test_friedman_reference_and_block_validation(spark):
    """Exact agreement with the within-block mid-rank definition on a
    tied fixture; incomplete blocks raise (the fleiss convention)."""
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import friedman_test

    blocks = [
        {"a": 1, "b": 2, "c": 2},
        {"a": 3, "b": 5, "c": 4},
        {"a": 2, "b": 2, "c": 2},
        {"a": 1, "b": 4, "c": 3},
    ]
    from collections import Counter

    treats = ["a", "b", "c"]
    K, nb = 3, 4
    R = dict.fromkeys(treats, 0.0)
    tsum = 0
    for b in blocks:
        cnt = Counter(b.values())
        ranks, cum = {}, 0
        for v in sorted(cnt):
            t = cnt[v]
            ranks[v] = cum + (t + 1) / 2
            cum += t
        for t in treats:
            R[t] += ranks[b[t]]
        tsum += sum(t**3 - t for t in cnt.values())
    Q = 12 / (nb * K * (K + 1)) * sum(r * r for r in R.values()) - 3 * nb * (
        K + 1
    )
    Cc = 1 - tsum / (nb * K * (K * K - 1))
    rows = [(i, t, v) for i, b in enumerate(blocks) for t, v in b.items()]
    df = spark.createDataFrame(rows, "b int, k string, v int")
    got = friedman_test(df, "b", "k", "v").collect()[0]
    assert got["q"] == round(Q / Cc, 6)
    assert (got["n_blocks"], got["k"]) == (nb, K)
    bad = spark.createDataFrame(
        rows + [(9, "a", 5)], "b int, k string, v int"
    )
    with _pytest.raises(ValueError, match="exactly one value"):
        friedman_test(bad, "b", "k", "v")


def test_kruskal_wilcoxon_no_raw_row_rank_window(spark):
    """Collapse-first plan shape: the mid-rank windows run over count
    cells (an aggregate sits BELOW the window in the plan tree), never
    over raw rows."""
    from pandasvcf_spark.operators.stats import (
        kruskal_wallis,
        wilcoxon_signed_rank,
    )

    d = spark.range(2000).select(
        (F.col("id") % 40).alias("v"),
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 37).alias("x"),
        (F.col("id") % 11).alias("y"),
    )
    for out in (
        kruskal_wallis(d, [], "k", "v"),
        wilcoxon_signed_rank(d, "x", "y"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        i_win = plan.index("Window")
        assert "HashAggregate" in plan[i_win:]


def test_cmh_reference_two_strata_and_simpson(spark):
    """Exact agreement with the Mantel-Haenszel fold on a 2-stratum
    fixture; a Simpson's-paradox construction shows the stratified OR
    on the correct side of 1 while the pooled 2x2 flips."""
    from pandasvcf_spark.operators.stats import cmh_test

    strata = {
        0: dict(a=10, b=20, c=5, d=40),
        1: dict(a=30, b=10, c=20, d=15),
    }
    rows = []
    for s, t in strata.items():
        rows += (
            [(s, 1, 1)] * t["a"] + [(s, 1, 0)] * t["b"]
            + [(s, 0, 1)] * t["c"] + [(s, 0, 0)] * t["d"]
        )
    df = spark.createDataFrame(rows, "s int, e int, o int")
    got = cmh_test(df, "s", "e", "o").collect()[0]
    num = den = sa = se = sv = 0.0
    for t in strata.values():
        a, b, c, d = t["a"], t["b"], t["c"], t["d"]
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert got["or_mh"] == round(num / den, 6)
    assert got["chi2"] == round((sa - se) ** 2 / sv, 6)
    assert (got["n_strata"], got["n"]) == (2, 150)
    # Simpson: within each stratum exposure is protective (OR < 1),
    # pooled OR > 1 because exposure concentrates in the high-risk
    # stratum — CMH must stay < 1
    simpson = {
        0: dict(a=1, b=19, c=10, d=70),    # OR 0.368
        1: dict(a=40, b=40, c=15, d=10),   # OR 0.667
    }
    rows = []
    for s, t in simpson.items():
        rows += (
            [(s, 1, 1)] * t["a"] + [(s, 1, 0)] * t["b"]
            + [(s, 0, 1)] * t["c"] + [(s, 0, 0)] * t["d"]
        )
    df = spark.createDataFrame(rows, "s int, e int, o int")
    a = sum(t["a"] for t in simpson.values())
    b = sum(t["b"] for t in simpson.values())
    c = sum(t["c"] for t in simpson.values())
    d = sum(t["d"] for t in simpson.values())
    assert (a * d) / (b * c) > 1  # pooled flips
    assert cmh_test(df, "s", "e", "o").collect()[0]["or_mh"] < 1


def test_durbin_watson_reference_and_poles(spark):
    """Exact agreement with the definition; an alternating series
    pushes dw toward 4, a trending one toward 0."""
    from pandasvcf_spark.operators.stats import durbin_watson

    vs = [3, 5, 4, 6, 8, 7, 9, 12, 10, 11]
    m = sum(vs) / len(vs)
    ref = sum(
        (vs[i] - vs[i - 1]) ** 2 for i in range(1, len(vs))
    ) / sum((v - m) ** 2 for v in vs)
    df = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vs)], "g int, t int, v int"
    )
    assert durbin_watson(df, ["g"], "t", "v").collect()[0]["dw"] == round(
        ref, 6
    )
    alt = spark.createDataFrame(
        [(0, i, 10 if i % 2 else 0) for i in range(20)],
        "g int, t int, v int",
    )
    assert durbin_watson(alt, ["g"], "t", "v").collect()[0]["dw"] > 3.5
    trend = spark.createDataFrame(
        [(0, i, i) for i in range(20)], "g int, t int, v int"
    )
    assert durbin_watson(trend, ["g"], "t", "v").collect()[0]["dw"] < 0.5


def test_ljung_box_reference_and_white_noise(spark):
    """Exact agreement with the r_k fold; a deterministic pseudo-random
    series yields a small Q, a strongly periodic one a large Q."""
    from pandasvcf_spark.operators.stats import ljung_box

    vs = [5, 7, 6, 9, 8, 10, 12, 11, 13, 12, 14, 16]
    n = len(vs)
    m = sum(vs) / n
    dev = [v - m for v in vs]
    den = sum(d * d for d in dev)
    Q = sum(
        (sum(dev[i] * dev[i + k] for i in range(n - k)) / den) ** 2
        / (n - k)
        for k in range(1, 4)
    ) * n * (n + 2)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "t int, v int"
    )
    got = ljung_box(df, "t", "v", max_lag=3).collect()[0]
    assert got["q"] == round(Q, 6)
    assert (got["n"], got["m"]) == (n, 3)
    # mix32 scramble (the poly-hash-banding lesson: raw modular
    # residues of consecutive ids are heavily autocorrelated — xor the
    # high bits back in before the final mod)
    noise = [
        (i, ((i * 2654435761) ^ ((i * 2654435761) >> 16)) % 97)
        for i in range(80)
    ]
    periodic = [(i, 10 if i % 2 else 0) for i in range(80)]
    qn = ljung_box(
        spark.createDataFrame(noise, "t int, v int"), "t", "v"
    ).collect()[0]["q"]
    qp = ljung_box(
        spark.createDataFrame(periodic, "t int, v int"), "t", "v"
    ).collect()[0]["q"]
    assert qp > 10 * qn


def test_jonckheere_reference_and_trend_direction(spark):
    """Exact agreement with the pairwise definition (tie halves
    included); a monotone-increasing arrangement gives positive z, its
    reversal the negated z (J is antisymmetric around mu)."""
    import itertools
    import math

    from pandasvcf_spark.operators.stats import jonckheere_terpstra

    groups = {0: [1, 2, 2, 3], 1: [2, 3, 4, 4, 5], 2: [3, 5, 6, 6]}
    J = 0.0
    for i, j in itertools.combinations(sorted(groups), 2):
        for x in groups[i]:
            for y in groups[j]:
                J += 1.0 if x < y else (0.5 if x == y else 0.0)
    N = sum(len(g) for g in groups.values())
    sq = sum(len(g) ** 2 for g in groups.values())
    sq3 = sum(len(g) ** 2 * (2 * len(g) + 3) for g in groups.values())
    mu = (N * N - sq) / 4
    var = (N * N * (2 * N + 3) - sq3) / 72
    df = spark.createDataFrame(
        [(k, v) for k, g in groups.items() for v in g], "g int, v int"
    )
    got = jonckheere_terpstra(df, "g", "v").collect()[0]
    assert got["j_stat"] == round(J, 4)
    assert got["z"] == round((J - mu) / math.sqrt(var), 6)
    rev = spark.createDataFrame(
        [(-k, v) for k, g in groups.items() for v in g], "g int, v int"
    )
    assert jonckheere_terpstra(rev, "g", "v").collect()[0]["z"] == -got["z"]


def test_cliffs_delta_reference_and_poles(spark):
    from pandasvcf_spark.operators.stats import cliffs_delta

    x0, x1 = [1, 2, 2, 4, 5], [3, 3, 5, 6]
    gt = sum(1 for a in x1 for b in x0 if a > b)
    lt = sum(1 for a in x1 for b in x0 if a < b)
    rows = [(0, v) for v in x0] + [(1, v) for v in x1]
    df = spark.createDataFrame(rows, "f int, v int")
    got = cliffs_delta(df, "f", "v").collect()[0]
    assert got["delta"] == round((gt - lt) / (len(x1) * len(x0)), 6)
    sep = spark.createDataFrame(
        [(0, v) for v in (1, 2)] + [(1, v) for v in (9, 10)],
        "f int, v int",
    )
    assert cliffs_delta(sep, "f", "v").collect()[0]["delta"] == 1.0


def test_bartlett_reference_and_zero_variance_drop(spark):
    import math

    from pandasvcf_spark.operators.stats import bartlett_test

    groups = {0: [1, 2, 3, 4, 9], 1: [2, 2, 3, 3, 4, 4], 2: [1, 5, 9, 13]}
    N = sum(len(g) for g in groups.values())
    K = len(groups)
    sw = slog = sinv = 0.0
    for g in groups.values():
        n = len(g)
        m = sum(g) / n
        s2 = sum((v - m) ** 2 for v in g) / (n - 1)
        sw += (n - 1) * s2
        slog += (n - 1) * math.log(s2)
        sinv += 1 / (n - 1)
    sp2 = sw / (N - K)
    ref = ((N - K) * math.log(sp2) - slog) / (
        1 + (sinv - 1 / (N - K)) / (3 * (K - 1))
    )
    rows = [(k, v) for k, g in groups.items() for v in g]
    df = spark.createDataFrame(rows, "g int, v int")
    got = bartlett_test(df, "g", "v").collect()[0]
    assert got["stat"] == round(ref, 6)
    assert (got["n"], got["k"]) == (N, K)
    # a constant group drops from the fold (ln(0) undefined), and the
    # remaining two groups still test
    rows += [(9, 7), (9, 7), (9, 7)]
    got2 = bartlett_test(
        spark.createDataFrame(rows, "g int, v int"), "g", "v"
    ).collect()[0]
    assert got2["k"] == K and got2["n"] == N


def test_cochrans_q_reference_and_validation(spark):
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import cochrans_q

    blocks = [
        {"a": 1, "b": 1, "c": 0}, {"a": 1, "b": 0, "c": 0},
        {"a": 0, "b": 1, "c": 0}, {"a": 1, "b": 1, "c": 1},
        {"a": 1, "b": 0, "c": 0}, {"a": 0, "b": 0, "c": 0},
        {"a": 1, "b": 1, "c": 0}, {"a": 1, "b": 1, "c": 0},
    ]
    K, nb = 3, len(blocks)
    C: dict = {}
    R = []
    for b in blocks:
        for t, v in b.items():
            C[t] = C.get(t, 0) + v
        R.append(sum(b.values()))
    T = sum(R)
    num = K * (K - 1) * (sum(c * c for c in C.values()) - T * T / K)
    den = K * T - sum(r * r for r in R)
    rows = [(i, t, v) for i, b in enumerate(blocks) for t, v in b.items()]
    df = spark.createDataFrame(rows, "b int, k string, o int")
    got = cochrans_q(df, "b", "k", "o").collect()[0]
    assert got["q"] == round(num / den, 6)
    assert (got["n_blocks"], got["k"]) == (nb, K)
    bad = spark.createDataFrame(
        rows + [(99, "a", 1)], "b int, k string, o int"
    )
    with _pytest.raises(ValueError, match="exactly one outcome"):
        cochrans_q(bad, "b", "k", "o")


def test_ohlc_struct_tie_break_and_buckets(spark):
    """Open/close pick the (ts, value)-lexicographic extremes: on a
    timestamp collision the open is the LOWER value, the close the
    HIGHER; bucket boundaries split at exact multiples."""
    from pandasvcf_spark.operators.relational import ohlc_candles

    rows = [
        (0, 10, 5.0), (0, 20, 3.0), (0, 15, 9.0),
        (0, 3605, 4.0), (0, 10, 2.0),
    ]
    df = spark.createDataFrame(rows, "g int, t long, v double")
    out = {
        r["bucket_start"]: r
        for r in ohlc_candles(df, ["g"], "t", "v").collect()
    }
    b0 = out[0]
    assert (b0["open"], b0["close"], b0["high"], b0["low"], b0["n"]) == (
        2.0, 3.0, 9.0, 2.0, 4,
    )
    assert out[3600]["open"] == out[3600]["close"] == 4.0
    assert out[3600]["n"] == 1


def test_twap_interval_weights_and_degenerates(spark):
    from pandasvcf_spark.operators.relational import twap

    rows = [(0, 0, 10.0), (0, 60, 20.0), (0, 180, 5.0), (1, 7, 3.0)]
    df = spark.createDataFrame(rows, "g int, t long, v double")
    out = {r["g"]: r for r in twap(df, ["g"], "t", "v").collect()}
    # 10 held 60s + 20 held 120s over 180s; the last tick carries no
    # forward interval
    assert out[0]["twap"] == round((10 * 60 + 20 * 120) / 180, 6)
    assert out[0]["span_sec"] == 180
    assert out[1]["twap"] is None  # single observation


def test_mood_median_reference(spark):
    import math

    from pandasvcf_spark.operators.stats import mood_median_test

    groups = {0: [1, 2, 3, 4, 5], 1: [3, 4, 5, 6, 7, 8], 2: [2, 2, 9]}
    allv = sorted(v for g in groups.values() for v in g)
    n = len(allv)
    med = allv[max(1, math.ceil(n * 0.5)) - 1]
    ta = sum(1 for g in groups.values() for v in g if v > med)
    tb = n - ta
    chi2 = 0.0
    for g in groups.values():
        a = sum(1 for v in g if v > med)
        b = len(g) - a
        ea, eb = len(g) * ta / n, len(g) * tb / n
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    df = spark.createDataFrame(
        [(k, v) for k, g in groups.items() for v in g], "g int, v int"
    )
    got = mood_median_test(df, "g", "v").collect()[0]
    assert got["median"] == med
    assert got["chi2"] == round(chi2, 6)
    assert (got["n"], got["k"]) == (n, 3)


def test_page_trend_reference_and_monotone_signal(spark):
    """Exact agreement with the ordered-L definition on a tied fixture;
    a perfectly monotone block set maxes L at n*sum(j*j)."""
    import math
    from collections import Counter

    from pandasvcf_spark.operators.stats import page_trend_test

    blocks = [
        {1: 3.0, 2: 5.0, 3: 7.0},
        {1: 2.0, 2: 4.0, 3: 4.0},
        {1: 1.0, 2: 3.0, 3: 6.0},
    ]
    K, nb = 3, 3
    R = dict.fromkeys((1, 2, 3), 0.0)
    for b in blocks:
        cnt = Counter(b.values())
        ranks, cum = {}, 0
        for v in sorted(cnt):
            t = cnt[v]
            ranks[v] = cum + (t + 1) / 2
            cum += t
        for t in (1, 2, 3):
            R[t] += ranks[b[t]]
    L = sum(j * R[t] for j, t in enumerate(sorted(R), start=1))
    mu = nb * K * (K + 1) ** 2 / 4
    var = nb * K * K * (K + 1) * (K * K - 1) / 144
    df = spark.createDataFrame(
        [(i, t, v) for i, b in enumerate(blocks) for t, v in b.items()],
        "b int, k int, v double",
    )
    got = page_trend_test(df, "b", "k", "v").collect()[0]
    assert got["l_stat"] == round(L, 4)
    assert got["z"] == round((L - mu) / math.sqrt(var), 6)
    mono = spark.createDataFrame(
        [(i, t, float(t)) for i in range(4) for t in (1, 2, 3)],
        "b int, k int, v double",
    )
    got2 = page_trend_test(mono, "b", "k", "v").collect()[0]
    assert got2["l_stat"] == 4 * (1 + 4 + 9)  # n * sum j*j


def test_theil_reference_and_equal_distribution(spark):
    import math

    from pandasvcf_spark.operators.stats import theil_index

    xs = [1, 2, 3, 10, 10, 24]
    n = len(xs)
    mu = sum(xs) / n
    T = sum((x / mu) * math.log(x / mu) for x in xs) / n
    L = math.log(mu) - sum(math.log(x) for x in xs) / n
    df = spark.createDataFrame([(x,) for x in xs] + [(0,), (-3,)], "v int")
    got = theil_index(df, "v").collect()[0]
    assert got["theil_t"] == round(T, 6)
    assert got["theil_l"] == round(L, 6)
    assert (got["n"], got["n_dropped"]) == (6, 2)
    eq = spark.createDataFrame([(7,)] * 10, "v int")
    got = theil_index(eq, "v").collect()[0]
    assert got["theil_t"] == 0.0 and got["theil_l"] == 0.0


def test_rmst_hand_curve_and_tau_clip(spark):
    """Hand-integrated KM curve: censoring shrinks the risk set without
    an event; tau clips the last segment; tau below the first event
    gives exactly tau (survival 1 throughout)."""
    from pandasvcf_spark.operators.relational import rmst

    data = [(2.0, 1), (3.0, 0), (5.0, 1), (5.0, 1), (8.0, 0), (11.0, 1)]
    df = spark.createDataFrame(data, "t double, ev int")
    got = rmst(df, "t", "ev", tau=10.0).collect()[0]
    # S: [0,2)=1, [2,5)=5/6, [5,10)=5/12
    assert got["rmst"] == round(2 + 3 * (5 / 6) + 5 * (5 / 12), 6)
    assert (got["n"], got["n_events"]) == (6, 3)
    early = rmst(df, "t", "ev", tau=1.5).collect()[0]
    assert early["rmst"] == 1.5 and early["n_events"] == 0
    # round-10 advice fix: n must come from the cohort total, not the
    # (empty-below-tau) ladder — no event <= tau used to report n=0.
    assert early["n"] == 6


def test_friedman_family_rejects_disjoint_treatment_sets(spark):
    """Per-block counts alone can't catch blocks covering DIFFERENT
    treatment sets ({a,b} vs {c,d} passes min==max on both counts but
    yields a negative Q): the global-distinct check must raise."""
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import (
        cochrans_q,
        friedman_test,
        page_trend_test,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "c", 1.0), (2, "d", 0.0)],
        "b int, k string, v double",
    )
    with _pytest.raises(ValueError, match="SAME treatment set"):
        friedman_test(df, "b", "k", "v")
    with _pytest.raises(ValueError, match="SAME treatment set"):
        cochrans_q(df, "b", "k", "v")
    dfn = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (2, 4, 0.0)],
        "b int, k int, v double",
    )
    with _pytest.raises(ValueError, match="SAME treatment set"):
        page_trend_test(dfn, "b", "k", "v")


def test_hits_reference_and_bipartite_roles(spark):
    """2-iteration L1-normalized HITS agrees with the pure-Python
    fold; on a bipartite graph sources are pure hubs (authority 0)
    and sinks pure authorities (hub 0)."""
    from pandasvcf_spark.operators.graph import hits

    E = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12)]
    nodes = sorted({a for a, _ in E} | {b for _, b in E})
    h = dict.fromkeys(nodes, 1.0)
    a: dict = {}
    for _ in range(2):
        a = dict.fromkeys(nodes, 0.0)
        for u, v in E:
            a[v] += h[u]
        s = sum(a.values())
        a = {v: x / s for v, x in a.items()}
        h2 = dict.fromkeys(nodes, 0.0)
        for u, v in E:
            h2[u] += a[v]
        s = sum(h2.values())
        h = {v: x / s for v, x in h2.items()}
    df = spark.createDataFrame(E, "src int, dst int")
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(df).collect()}
    for v in nodes:
        assert got[v] == (round(h[v], 6), round(a[v], 6))
    assert all(got[v][1] == 0.0 for v in (1, 2, 3))
    assert all(got[v][0] == 0.0 for v in (10, 11, 12))


def test_cochran_armitage_r_golden_and_direction(spark):
    """Pinned to R prop.trend.test's documented example (smokers
    83/90/129/70 of 86/93/136/82 patients, scores 1:4 -> X-squared
    8.2249); a rate rising with score gives positive slope."""
    from pandasvcf_spark.operators.stats import cochran_armitage

    rows = []
    for s, (a, n) in enumerate(
        zip([83, 90, 129, 70], [86, 93, 136, 82]), start=1
    ):
        rows += [(s, 1)] * a + [(s, 0)] * (n - a)
    df = spark.createDataFrame(rows, "s int, c int")
    got = cochran_armitage(df, "s", "c").collect()[0]
    assert abs(got["chi2"] - 8.2249) < 5e-4
    assert (got["n"], got["k"]) == (397, 4)
    rising = []
    for s, rate in ((1, 1), (2, 3), (3, 5)):
        rising += [(s, 1)] * rate + [(s, 0)] * (10 - rate)
    got2 = cochran_armitage(
        spark.createDataFrame(rising, "s int, c int"), "s", "c"
    ).collect()[0]
    assert got2["slope"] > 0


def test_cochran_armitage_grouped_matches_single(spark):
    """The grouped form computes per-group exactly what the single form
    computes on each group's slice."""
    from pandasvcf_spark.operators.stats import cochran_armitage

    rows = []
    for g in (0, 1):
        for s, rate in ((1, 1 + g), (2, 3), (3, 5 - g)):
            rows += [(g, s, 1)] * rate + [(g, s, 0)] * (10 - rate)
    df = spark.createDataFrame(rows, "g int, s int, c int")
    grouped = {
        r["g"]: (r["chi2"], r["slope"], r["n"], r["k"])
        for r in cochran_armitage(df, "s", "c", ["g"]).collect()
    }
    for g in (0, 1):
        single = cochran_armitage(
            df.filter(F.col("g") == g), "s", "c"
        ).collect()[0]
        assert grouped[g] == (
            single["chi2"], single["slope"], single["n"], single["k"]
        )


def test_welch_and_paired_t_references(spark):
    import math

    from pandasvcf_spark.operators.stats import paired_t_test, welch_t_test

    x0 = [3.1, 2.8, 4.0, 3.5, 2.9, 3.3]
    x1 = [4.2, 4.8, 3.9, 5.1]
    n0, n1 = len(x0), len(x1)
    m0, m1 = sum(x0) / n0, sum(x1) / n1
    v0 = sum((v - m0) ** 2 for v in x0) / (n0 - 1)
    v1 = sum((v - m1) ** 2 for v in x1) / (n1 - 1)
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / math.sqrt(se2)
    dof = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1))
    df = spark.createDataFrame(
        [(0, v) for v in x0] + [(1, v) for v in x1], "f int, v double"
    )
    got = welch_t_test(df, "f", "v").collect()[0]
    assert got["t"] == round(t, 6) and got["df"] == round(dof, 4)
    assert got["mean_diff"] == round(m1 - m0, 6)

    xs = [10.0, 12.5, 9.0, 15.0]
    ys = [8.0, 12.0, 11.0, 11.5]
    ds = [a - b for a, b in zip(xs, ys)]
    n = len(ds)
    m = sum(ds) / n
    var = sum((d - m) ** 2 for d in ds) / (n - 1)
    got = paired_t_test(
        spark.createDataFrame(list(zip(xs, ys)), "x double, y double"),
        "x", "y",
    ).collect()[0]
    assert got["t"] == round(m / math.sqrt(var / n), 6)
    assert got["n"] == n


def test_brunner_munzel_scipy_golden(spark):
    """Pinned to scipy.stats.brunnermunzel's documented example:
    W = 3.1374674823, p_hat = P(X0 < X1) + ties/2 = 0.7889610."""
    from pandasvcf_spark.operators.stats import brunner_munzel

    x = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
    y = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]
    rows = [(0, v) for v in x] + [(1, v) for v in y]
    df = spark.createDataFrame(rows, "f int, v int")
    got = brunner_munzel(df, "f", "v").collect()[0]
    assert got["w"] == 3.137467
    assert got["p_hat"] == 0.788961
    assert (got["n0"], got["n1"]) == (len(x), len(y))
    # brute-force p_hat on a second fixture
    x2, y2 = [1, 5, 5, 9], [2, 2, 8]
    bf = sum(
        (a < b) + 0.5 * (a == b) for a in x2 for b in y2
    ) / (len(x2) * len(y2))
    df2 = spark.createDataFrame(
        [(0, v) for v in x2] + [(1, v) for v in y2], "f int, v int"
    )
    assert brunner_munzel(df2, "f", "v").collect()[0]["p_hat"] == round(
        bf, 6
    )


def test_aalen_johansen_hand_curve_and_identity(spark):
    """Exact agreement with the hand-integrated two-cause fixture,
    and the structural identity S(t) + sum_k CIF_k(t) = 1 at the last
    event time (S = 0 there)."""
    from pandasvcf_spark.operators.relational import aalen_johansen

    data = [
        (1.0, 1), (2.0, 2), (2.0, 0), (3.0, 1),
        (3.0, 1), (4.0, 2), (5.0, 0), (6.0, 1),
    ]
    df = spark.createDataFrame(data, "t double, ev int")
    got = {
        (r["cause"], r["t"]): r["cif"]
        for r in aalen_johansen(df, "t", "ev").collect()
    }
    ref = {
        (1, 1.0): 0.125, (1, 3.0): 0.425, (1, 6.0): 0.725,
        (2, 2.0): 0.125, (2, 4.0): 0.275,
    }
    assert got == ref
    assert got[(1, 6.0)] + got[(2, 4.0)] == 1.0
    # single-cause input reduces to 1 - KM
    from pandasvcf_spark.operators.relational import kaplan_meier

    one = [(2.0, 1), (3.0, 0), (5.0, 1), (5.0, 1), (8.0, 0), (11.0, 1)]
    df1 = spark.createDataFrame(one, "t double, ev int")
    aj = {
        r["t"]: r["cif"]
        for r in aalen_johansen(df1, "t", "ev").collect()
    }
    km = {
        r["t"]: r["survival"]
        for r in kaplan_meier(df1, "t", "ev").collect()
    }
    for t in aj:
        assert abs(aj[t] - (1.0 - km[t])) < 2e-6


def test_tost_means_and_rate_ratio_references(spark):
    import math

    from pandasvcf_spark.operators.stats import rate_ratio, tost_means

    x0 = [10.0, 10.5, 9.8, 10.2, 9.9, 10.1]
    x1 = [10.1, 10.3, 9.9, 10.0, 10.4]
    n0, n1 = len(x0), len(x1)
    m0, m1 = sum(x0) / n0, sum(x1) / n1
    v0 = sum((v - m0) ** 2 for v in x0) / (n0 - 1)
    v1 = sum((v - m1) ** 2 for v in x1) / (n1 - 1)
    se = math.sqrt(v1 / n1 + v0 / n0)
    z90 = 1.6448536269514722
    lo, hi = (m1 - m0) - z90 * se, (m1 - m0) + z90 * se
    df = spark.createDataFrame(
        [(0, v) for v in x0] + [(1, v) for v in x1], "f int, v double"
    )
    got = tost_means(df, "f", "v", margin=0.5).collect()[0]
    assert (got["ci_lo"], got["ci_hi"]) == (round(lo, 6), round(hi, 6))
    assert got["equivalent"] == (lo > -0.5 and hi < 0.5)
    # a clearly-shifted pair is NOT equivalent at a tight margin
    wide = spark.createDataFrame(
        [(0, v) for v in x0] + [(1, v + 5.0) for v in x1],
        "f int, v double",
    )
    assert not tost_means(wide, "f", "v", margin=0.5).collect()[0][
        "equivalent"
    ]

    rows = [(0, 10, 100.0), (0, 5, 50.0), (1, 30, 120.0), (1, 6, 30.0)]
    got = rate_ratio(
        spark.createDataFrame(rows, "f int, e long, x double"),
        "f", "e", "x",
    ).collect()[0]
    irr = (36 / 150.0) / (15 / 150.0)
    assert got["irr"] == round(irr, 6)
    assert got["z"] == round(
        math.log(irr) / math.sqrt(1 / 36 + 1 / 15), 6
    )
    assert (got["events0"], got["events1"]) == (15, 36)


def test_cell_collapse_tripwire_dense_input_raises(spark):
    """Round-10 verdict ask (documented→enforced): a dense continuous
    column whose distinct-cell count exceeds the cap must RAISE with
    the pre-bucket instruction instead of silently degrading the
    cell-grid/ladder plan toward rows²; quantized input still runs."""
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import (
        brunner_munzel,
        cliffs_delta,
        jonckheere_terpstra,
        kendall_tau_b,
        kruskal_wallis,
        runs_test,
        theil_sen,
    )

    n = 2000
    dense = spark.range(n).select(
        (F.col("id") % 2).alias("f"),
        (F.col("id") % 5).alias("g"),
        F.col("id").alias("t"),
        # every value distinct: the anti-pattern the guard exists for
        (F.col("id") * 1.000001 + 0.123456).alias("v"),
        (F.col("id") * 0.999 + 7.0).alias("v2"),
    )
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        kendall_tau_b(dense, "v", "v2", max_cells=500)
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        jonckheere_terpstra(dense, "g", "v", max_cells=500)
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        cliffs_delta(dense, "f", "v", max_cells=500)
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        brunner_munzel(dense, "f", "v", max_cells=500)
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        kruskal_wallis(dense, [], "f", "v", max_cells=500)
    with _pytest.raises(ValueError, match="PRE-AGGREGATED"):
        runs_test(dense, "t", "v", max_rows=500)
    with _pytest.raises(ValueError, match="O\\(n²\\) PER GROUP"):
        theil_sen(dense, ["f"], "t", "v", max_group_rows=500)
    # quantized input passes the same caps and returns the statistic
    q = dense.select(
        "f", "g", "t", F.round(F.col("v") / 100).alias("vq"),
        F.round(F.col("v2") / 100).alias("vq2"),
    )
    assert kendall_tau_b(q, "vq", "vq2", max_cells=500).count() == 1
    # max_cells=None disables the guard entirely (caller override)
    assert (
        cliffs_delta(dense, "f", "v", max_cells=None).count() == 1
    )


def test_ks_wasserstein_js_binned_hand_references(spark):
    """Distribution-comparison family vs hand-computed references:
    KS d + the 100-term asymptotic p; W1 on scipy's documented pair
    examples; binned JS at the identical (0) and disjoint (ln 2)
    extremes."""
    import math

    from pandasvcf_spark.operators.stats import (
        js_divergence_binned,
        ks_2sample,
        wasserstein_1d,
    )

    two = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0),
         (1, 3.0), (1, 4.0), (1, 5.0), (1, 6.0)],
        "f int, v double",
    )
    r = ks_2sample(two, "f", "v").collect()[0]
    assert (r["n0"], r["n1"], r["d"]) == (4, 4, 0.5)
    lam = (math.sqrt(2) + 0.12 + 0.11 / math.sqrt(2)) * 0.5
    p = 2 * sum(
        (-1) ** (k - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    assert r["p_value"] == round(min(max(p, 0.0), 1.0), 6)

    w12 = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 3.0), (1, 4.0)], "f int, v double"
    )
    assert wasserstein_1d(w12, "f", "v").collect()[0]["w1"] == 2.0
    same = spark.createDataFrame(
        [(0, 3.0), (0, 4.0), (1, 3.0), (1, 4.0)], "f int, v double"
    )
    assert wasserstein_1d(same, "f", "v").collect()[0]["w1"] == 0.0

    assert js_divergence_binned(same, "f", "v").collect()[0]["js"] == 0.0
    dis = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 100.0), (1, 101.0)], "f int, v double"
    )
    assert js_divergence_binned(dis, "f", "v").collect()[0][
        "js"
    ] == round(math.log(2), 6)


def test_ordinal_assoc_harrell_mann_kendall_grubbs_hand(spark):
    """Ordinal association on a hand 2x2 (gamma/D/tau-c all closed
    form), Harrell C = 1 on a perfectly ranked cohort plus a
    half-credit tie case, Mann-Kendall on a strictly increasing
    4-series, Grubbs on a planted outlier."""
    import statistics

    from pandasvcf_spark.operators.stats import (
        grubbs_test,
        harrell_c,
        mann_kendall,
        ordinal_association,
    )

    rows = [(0, 0)] * 30 + [(1, 1)] * 30 + [(0, 1)] * 10 + [(1, 0)] * 10
    od = spark.createDataFrame(rows, "x int, y int")
    r = ordinal_association(od, "x", "y").collect()[0]
    C, D = 900, 100
    assert (r["concordant"], r["discordant"]) == (C, D)
    assert r["gamma"] == round((C - D) / (C + D), 6)  # 0.8
    # d_yx: x-tie pairs 2*(40*39) = 3120; n0*2 = 80*79 = 6320
    assert r["somers_dyx"] == round(2 * (C - D) / (6320 - 3120), 6)
    assert r["tau_c"] == round(2 * 2 * (C - D) / (80 * 80 * 1), 6)

    hc = spark.createDataFrame(
        [(1.0, 1, 4.0), (2.0, 1, 3.0), (3.0, 1, 2.0), (4.0, 1, 1.0)],
        "t double, e int, s double",
    )
    r = harrell_c(hc, "t", "e", "s").collect()[0]
    assert (r["n_pairs"], r["concordant"], r["c_index"]) == (6, 6, 1.0)
    # censored subject never the early member; tied scores half-credit
    hc2 = spark.createDataFrame(
        [(1.0, 0, 9.0), (2.0, 1, 5.0), (3.0, 0, 5.0)],
        "t double, e int, s double",
    )
    r2 = harrell_c(hc2, "t", "e", "s").collect()[0]
    assert (r2["n_pairs"], r2["tied"], r2["c_index"]) == (1, 1, 0.5)

    mk = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)],
        "t double, v double",
    )
    r = mann_kendall(mk, "t", "v").collect()[0]
    assert (r["s"], r["var_s"]) == (6, round(4 * 3 * 13 / 18, 4))
    assert r["z"] == round(5 / (4 * 3 * 13 / 18) ** 0.5, 6)

    gb = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (100.0,)], "v double"
    )
    r = grubbs_test(gb, "v").collect()[0]
    sd = statistics.stdev([1, 2, 3, 100])
    assert (r["n"], r["suspect"]) == (4, 100.0)
    assert r["g"] == round((100 - 26.5) / sd, 6)


def test_cvm_ansari_pettitt_hand_references(spark):
    """CvM on the KS fixture (hand ECDF integral 0.34375);
    Ansari-Bradley both-end scores incl. a tie run STRADDLING the
    pooled center (the case min(midrank, N+1-midrank) gets wrong);
    Pettitt step series with the closed-form p."""
    import math

    from pandasvcf_spark.operators.stats import (
        ansari_bradley,
        cvm_2sample,
        pettitt_test,
    )

    two = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0),
         (1, 3.0), (1, 4.0), (1, 5.0), (1, 6.0)],
        "f int, v double",
    )
    assert cvm_2sample(two, "f", "v").collect()[0]["t"] == 0.34375

    ab = spark.createDataFrame(
        [(0, 1.0), (0, 8.0), (1, 4.0), (1, 5.0)], "f int, v double"
    )
    r = ansari_bradley(ab, "f", "v").collect()[0]
    # scores 1,2,2,1; AB=4, E=3, Var=1/3
    assert (r["ab"], r["z"]) == (4.0, round(3 ** 0.5, 6))
    tie = spark.createDataFrame(
        [(0, 2.0), (0, 2.0), (1, 2.0), (1, 9.0)], "f int, v double"
    )
    r2 = ansari_bradley(tie, "f", "v").collect()[0]
    # run v=2 covers positions 1-3: scores 1,2,2 -> run-average 5/3
    # (min(midrank=2, N+1-2)=2 would be wrong); v=9 scores 1
    assert r2["ab"] == round(5 / 3 + 1, 4)

    pt = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0),
         (4.0, 5.0), (5.0, 5.0), (6.0, 5.0)],
        "t double, v double",
    )
    r = pettitt_test(pt, "t", "v").collect()[0]
    assert (r["n"], r["change_t"], r["k"]) == (6, 3.0, 9.0)
    assert r["p_value"] == round(2 * math.exp(-6 * 81 / (216 + 36)), 6)


def test_quade_hand_case_and_block_validation(spark):
    """Quade on a hand 3x3 (ranges 4,2,2 -> Q = 3, 1.5, 1.5; F =
    21/16.5) and the friedman-family complete-block validation incl.
    the round-10 global-treatment-set check."""
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import quade_test

    rows = [
        (1, "a", 1.0), (1, "b", 2.0), (1, "c", 5.0),
        (2, "a", 2.0), (2, "b", 3.0), (2, "c", 4.0),
        (3, "a", 3.0), (3, "b", 1.0), (3, "c", 2.0),
    ]
    df = spark.createDataFrame(rows, "b int, k string, v double")
    got = quade_test(df, "b", "k", "v").collect()[0]
    assert (got["n_blocks"], got["k"]) == (3, 3)
    assert got["f"] == round(21 / 16.5, 6)
    bad = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (2, "c", 1.0), (2, "d", 0.0)],
        "b int, k string, v double",
    )
    with _pytest.raises(ValueError, match="SAME treatment set"):
        quade_test(bad, "b", "k", "v")


def test_fligner_killeen_and_acklam_ppf(spark):
    """norm_ppf_expr matches the stdlib inverse normal to < 1e-8
    across all three Acklam regions; fligner_killeen matches a pure-
    python normal-scores replay built on NormalDist.inv_cdf."""
    import collections
    import math
    import statistics as st
    from statistics import NormalDist

    from pandasvcf_spark.operators.stats import (
        fligner_killeen,
        norm_ppf_expr,
    )

    nd = NormalDist()
    ps = [0.001, 0.024, 0.1, 0.5, 0.9, 0.976, 0.999]
    df = spark.createDataFrame([(p,) for p in ps], "p double")
    got = {
        r["p"]: r["x"]
        for r in df.select(
            "p", norm_ppf_expr(F.col("p")).alias("x")
        ).collect()
    }
    assert max(abs(got[p] - nd.inv_cdf(p)) for p in ps) < 1e-8

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 9.0),
            ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 31.0)]
    groups = collections.defaultdict(list)
    for g, v in rows:
        groups[g].append(v)

    def med(xs):
        xs = sorted(xs)
        return xs[max(1, math.ceil(len(xs) / 2)) - 1]

    z = [(g, abs(v - med(groups[g]))) for g, v in rows]
    zs = sorted(x for _, x in z)
    n = len(z)

    def midrank(x):
        lo = sum(1 for y in zs if y < x)
        c = sum(1 for y in zs if y == x)
        return lo + (c + 1) / 2

    a = [(g, nd.inv_cdf(0.5 + midrank(x) / (2 * (n + 1)))) for g, x in z]
    abar = sum(x for _, x in a) / n
    s2 = sum((x - abar) ** 2 for _, x in a) / (n - 1)
    fk = sum(
        len([1 for gg, _ in a if gg == g])
        * (st.mean([x for gg, x in a if gg == g]) - abar) ** 2
        for g in groups
    ) / s2
    df2 = spark.createDataFrame(rows, "g string, v double")
    r = fligner_killeen(df2, "g", "v").collect()[0]
    assert (r["n"], r["k"], r["fk"]) == (8, 2, round(fk, 6))


def test_van_der_waerden_matches_stdlib_replay(spark):
    """VdW normal-scores location statistic vs a pure-python
    NormalDist replay (mid-rank ties included via the duplicated
    value across groups)."""
    import collections

    from statistics import NormalDist

    from pandasvcf_spark.operators.stats import van_der_waerden

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0),
            ("b", 5.0), ("b", 6.0), ("c", 2.0), ("c", 5.0)]
    nd = NormalDist()
    vals = sorted(v for _, v in rows)
    n = len(rows)

    def midrank(x):
        lo = sum(1 for y in vals if y < x)
        c = sum(1 for y in vals if y == x)
        return lo + (c + 1) / 2

    a = [(g, nd.inv_cdf(midrank(v) / (n + 1))) for g, v in rows]
    s2 = sum(x * x for _, x in a) / (n - 1)
    groups = collections.defaultdict(list)
    for g, x in a:
        groups[g].append(x)
    t = sum(sum(xs) ** 2 / len(xs) for xs in groups.values()) / s2
    df = spark.createDataFrame(rows, "g string, v double")
    r = van_der_waerden(df, "g", "v").collect()[0]
    assert (r["n"], r["k"], r["t"]) == (8, 3, round(t, 6))


def test_jarque_bera_numpy_replay(spark):
    """JB on a skewed exponential sample vs the numpy biased-moment
    replay — exact at 6dp."""
    import numpy as np

    from pandasvcf_spark.operators.stats import jarque_bera

    rng = np.random.RandomState(0)
    x = rng.exponential(2.0, 500)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    g1 = m3 / m2 ** 1.5
    g2 = m4 / m2 ** 2 - 3
    jb = 500 / 6 * (g1 * g1 + g2 * g2 / 4)
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    r = jarque_bera(df, "v").collect()[0]
    assert (r["skew"], r["kurtosis"], r["jb"]) == (
        round(g1, 6), round(g2, 6), round(jb, 6),
    )


def test_fdr_correct_r_padjust_vectors(spark):
    """All three methods against R's p.adjust on c(.01,.02,.03,.04,.05)
    plus the tie-run and NULL-pass-through conventions."""
    from pandasvcf_spark.operators.stats import fdr_correct

    ps = [0.01, 0.02, 0.03, 0.04, 0.05]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "id int, p double"
    )
    expect = {
        "bh": [0.05] * 5,
        "holm": [0.05, 0.08, 0.09, 0.09, 0.09],
        "bonferroni": [0.05, 0.1, 0.15, 0.2, 0.25],
    }
    for m, exp in expect.items():
        got = {r["id"]: r["p_adj"] for r in fdr_correct(df, "p", m).collect()}
        assert [got[i] for i in range(5)] == [round(x, 9) for x in exp], m
    # tie run: both p=.01 share the run-END position candidate; NULL
    # does not count toward m and passes through
    df2 = spark.createDataFrame(
        [(0, 0.01), (1, 0.01), (2, 0.04), (3, None)], "id int, p double"
    )
    got = sorted(
        (r["id"], r["p_adj"]) for r in fdr_correct(df2, "p", "bh").collect()
    )
    assert got == [(0, 0.015), (1, 0.015), (2, 0.04), (3, None)]


def test_did_and_stratified_ate_hand_cases(spark):
    """DiD on a hand 2x2 (did=5, cell-variance SE); stratified ATE on
    two overlapping strata plus one no-control stratum that must be
    dropped AND counted."""
    import statistics as st

    from pandasvcf_spark.operators.stats import (
        diff_in_diff,
        stratified_ate,
    )

    data = {(0, 0): [10.0, 12.0, 11.0], (0, 1): [11.0, 13.0, 12.0],
            (1, 0): [20.0, 22.0, 21.0], (1, 1): [26.0, 28.0, 27.0]}
    rows = [(t, p, y) for (t, p), ys in data.items() for y in ys]
    df = spark.createDataFrame(rows, "t int, p int, y double")
    r = diff_in_diff(df, "t", "p", "y").collect()[0]
    m = {k: st.mean(v) for k, v in data.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se = sum(st.variance(v) / len(v) for v in data.values()) ** 0.5
    assert (r["did"], r["se"], r["t"]) == (
        round(did, 6), round(se, 6), round(did / se, 6),
    )

    rows = [
        ("a", 1, 10.0), ("a", 1, 12.0), ("a", 0, 5.0), ("a", 0, 7.0),
        ("b", 1, 20.0), ("b", 1, 22.0), ("b", 0, 10.0), ("b", 0, 14.0),
        ("c", 1, 99.0), ("c", 1, 98.0),  # no control arm: dropped
    ]
    df2 = spark.createDataFrame(rows, "s string, t int, y double")
    r2 = stratified_ate(df2, "t", "y", ["s"]).collect()[0]
    assert (r2["n_strata"], r2["n_used"], r2["n_dropped"], r2["n"]) == (
        3, 2, 1, 8,
    )
    assert r2["ate"] == 7.0
    assert r2["se"] == round(112 ** 0.5 / 8, 6)


def test_prs_and_icc_hand_cases(spark):
    """PRS: 2 sites / 3 samples with a missing call — the broadcast-
    constant imputation identity must equal the explicit grid sum in
    BOTH modes; ICC(1,1) balanced hand case."""
    import numpy as np

    from pandasvcf_spark.operators.ld import prs_score
    from pandasvcf_spark.operators.stats import icc_oneway

    rows = [
        (1, "s1", 2.0), (1, "s2", 1.0), (1, "s3", 0.0),
        (2, "s1", 1.0), (2, "s2", None),
    ]
    d = spark.createDataFrame(rows, "site int, sample string, dosage double")
    w = spark.createDataFrame([(1, 0.5), (2, -1.0)], "site int, weight double")
    got = {
        r["sample"]: (r["n_called"], r["score"])
        for r in prs_score(d, "site", "sample", "dosage", w).collect()
    }
    # p1=.5, p2=.5, const=-.5, S=2: imputed grid scores by hand
    assert got == {"s1": (2, 0.0), "s2": (1, -0.125), "s3": (1, -0.25)}
    ni = {
        r["sample"]: r["score"]
        for r in prs_score(
            d, "site", "sample", "dosage", w, mean_impute=False
        ).collect()
    }
    assert ni == {"s1": 0.0, "s2": 0.25, "s3": 0.0}

    rows = [("a", 9.0), ("a", 10.0), ("a", 11.0),
            ("b", 5.0), ("b", 6.0), ("b", 7.0),
            ("c", 1.0), ("c", 2.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    vals = {g: [v for gg, v in rows if gg == g] for g in "abc"}
    gm = np.mean([v for _, v in rows])
    ssb = sum(len(v) * (np.mean(v) - gm) ** 2 for v in vals.values())
    ssw = sum((x - np.mean(v)) ** 2 for v in vals.values() for x in v)
    msb, msw = ssb / 2, ssw / 6
    icc = (msb - msw) / (msb + 2 * msw)
    r = icc_oneway(df, "g", "v").collect()[0]
    assert (r["n"], r["groups"], r["icc"]) == (9, 3, round(icc, 6))


def test_hodges_lehmann_hand_case_and_grid_guard(spark):
    """HL shift of x0=[1,2] vs x1=[4,7,9]: pairwise diffs sorted are
    2,3,5,6,7,8 -> type-1 median 5; the dense-value grid guard raises
    with the pre-bucket instruction."""
    import pytest as _pytest

    from pandasvcf_spark.operators.stats import hodges_lehmann_shift

    df = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 4.0), (1, 7.0), (1, 9.0)],
        "f int, v double",
    )
    r = hodges_lehmann_shift(df, "f", "v").collect()[0]
    assert (r["n0"], r["n1"], r["hl_shift"]) == (2, 3, 5.0)
    dense = spark.range(4000).select(
        (F.col("id") % 2).cast("int").alias("f"),
        (F.col("id") * 1.0001).alias("v"),
    )
    with _pytest.raises(ValueError, match="PRE-BUCKET"):
        hodges_lehmann_shift(dense, "f", "v", max_grid=1000)


def test_weighted_kappa_numpy_replay(spark):
    """Quadratic-weighted kappa vs the standard confusion-matrix
    formula (sklearn's cohen_kappa_score weights='quadratic'
    definition) on a hand table; the linear variant differs."""
    import numpy as np

    from pandasvcf_spark.operators.relational import weighted_kappa

    rows = [(0, 0), (0, 0), (1, 1), (1, 2), (2, 2),
            (2, 1), (0, 1), (2, 2), (1, 1), (0, 0)]
    df = spark.createDataFrame(rows, "a int, b int")
    n, k = len(rows), 3
    O = np.zeros((k, k))
    for a, b in rows:
        O[a, b] += 1
    V = np.array([[(i - j) ** 2 for j in range(k)] for i in range(k)],
                 float)
    obs = (O * V).sum() / n
    exp = (np.outer(O.sum(1), O.sum(0)) * V).sum() / n ** 2
    r = weighted_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["obs_dis"], r["exp_dis"], r["kappa_w"]) == (
        n, round(obs, 6), round(exp, 6), round(1 - obs / exp, 6),
    )
    Vl = np.sqrt(V)
    obs_l = (O * Vl).sum() / n
    exp_l = (np.outer(O.sum(1), O.sum(0)) * Vl).sum() / n ** 2
    rl = weighted_kappa(df, "a", "b", weight="linear").collect()[0]
    assert rl["kappa_w"] == round(1 - obs_l / exp_l, 6)


def test_cohens_d_hedges_g_replay(spark):
    """d and g vs the stdlib statistics replay (pooled SD + the J
    correction) on unequal group sizes."""
    import statistics as st

    from pandasvcf_spark.operators.stats import cohens_d

    x0 = [1.0, 2.0, 3.0, 4.0]
    x1 = [4.0, 5.0, 7.0]
    rows = [(0, v) for v in x0] + [(1, v) for v in x1]
    df = spark.createDataFrame(rows, "f int, v double")
    sp2 = (3 * st.variance(x0) + 2 * st.variance(x1)) / 5
    d = (st.mean(x1) - st.mean(x0)) / sp2 ** 0.5
    g = d * (1 - 3 / (4 * 7 - 9))
    r = cohens_d(df, "f", "v").collect()[0]
    assert (r["n0"], r["n1"]) == (4, 3)
    assert (r["d"], r["g"]) == (round(d, 6), round(g, 6))


def test_kuiper_and_anderson_darling_vs_replicas(spark):
    """Kuiper V/p and Scholz-Stephens A2akN against pure-Python
    replicas on a shifted+scaled two-group fixture, plus the
    same-distribution sanity (small a2, p near 1)."""
    import bisect
    import math
    import random
    from collections import Counter

    from pandasvcf_spark.operators.stats import (
        anderson_darling_2samp,
        kuiper_2sample,
    )

    rng = random.Random(7)
    data = [
        (i % 2, round(rng.gauss(0.3 * (i % 2), 1 + 0.5 * (i % 2)), 1))
        for i in range(400)
    ]
    df = spark.createDataFrame(data, "f int, v double")

    x0 = sorted(v for f, v in data if f == 0)
    x1 = sorted(v for f, v in data if f == 1)
    vals = sorted(set(x0) | set(x1))

    def ecdf(xs, v):
        return bisect.bisect_right(xs, v) / len(xs)

    dp = max(max(0.0, ecdf(x0, v) - ecdf(x1, v)) for v in vals)
    dm = max(max(0.0, ecdf(x1, v) - ecdf(x0, v)) for v in vals)
    vstat = dp + dm
    en = len(x0) * len(x1) / (len(x0) + len(x1))
    lam = (math.sqrt(en) + 0.155 + 0.24 / math.sqrt(en)) * vstat
    p = 2 * sum(
        (4 * k * k * lam * lam - 1) * math.exp(-2 * k * k * lam * lam)
        for k in range(1, 101)
    )
    p = max(0.0, min(1.0, p))
    r = kuiper_2sample(df, "f", "v").collect()[0]
    assert (r["v"], r["p_value"]) == (round(vstat, 6), round(p, 6))

    n = len(x0) + len(x1)
    pooled = Counter(v for _, v in data)
    c0, c1 = Counter(x0), Counter(x1)
    cum = cum0 = cum1 = 0
    s = 0.0
    for z in sorted(pooled):
        lj = pooled[z]
        ba = cum + lj / 2
        ma0 = cum0 + c0[z] / 2
        ma1 = cum1 + c1[z] / 2
        denom = ba * (n - ba) - n * lj / 4
        if denom > 0:
            s += (
                lj
                / n
                * (
                    (n * ma0 - len(x0) * ba) ** 2 / len(x0)
                    + (n * ma1 - len(x1) * ba) ** 2 / len(x1)
                )
                / denom
            )
        cum += lj
        cum0 += c0[z]
        cum1 += c1[z]
    a2 = (n - 1) / n * s
    r = anderson_darling_2samp(df, "f", "v").collect()[0]
    assert r["a2"] == round(a2, 6)
    assert r["a2"] > 3.752  # clearly different at the 1% point

    same = spark.createDataFrame(
        [(i % 2, float(i % 37)) for i in range(200)], "f int, v double"
    )
    assert anderson_darling_2samp(same, "f", "v").collect()[0]["a2"] < 1.0
    assert kuiper_2sample(same, "f", "v").collect()[0]["p_value"] > 0.9


def test_cox_stuart_and_conover_vs_replicas(spark):
    """Cox-Stuart on a noisy monotone series (replica-exact, strongly
    positive z; reversed series flips the sign) and Conover squared
    ranks on a 3-group unequal-variance fixture (replica-exact)."""
    import math
    import random
    from collections import Counter

    from pandasvcf_spark.operators.stats import (
        conover_squared_ranks,
        cox_stuart,
    )

    rng = random.Random(7)
    ser = [(i, float(i) + rng.gauss(0, 2)) for i in range(101)]
    sdf = spark.createDataFrame(ser, "t int, v double")
    n = len(ser)
    m = (n + 1) // 2
    xs = [v for _, v in ser]
    sp = sum(1 for i in range(n - m) if xs[i + m] > xs[i])
    sm = sum(1 for i in range(n - m) if xs[i + m] < xs[i])
    np_ = sp + sm
    zmag = (abs(sp - np_ / 2) - 0.5) / math.sqrt(np_ / 4)
    z = max(zmag, 0.0) if sp >= sm else -max(zmag, 0.0)
    r = cox_stuart(sdf, "t", "v").collect()[0]
    assert (r["n_pairs"], r["s_plus"], r["s_minus"], r["z"]) == (
        n - m, sp, sm, round(z, 6),
    )
    assert r["z"] > 3
    rev = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(reversed(ser))],
        "t int, v double",
    )
    assert cox_stuart(rev, "t", "v").collect()[0]["z"] == round(-z, 6)

    groups = {
        0: [round(rng.gauss(0, 1), 1) for _ in range(120)],
        1: [round(rng.gauss(0, 2), 1) for _ in range(150)],
        2: [round(rng.gauss(0, 4), 1) for _ in range(130)],
    }
    rows = [(g, x) for g, v in groups.items() for x in v]
    df = spark.createDataFrame(rows, "g int, x double")
    means = {g: sum(v) / len(v) for g, v in groups.items()}
    us = [(g, abs(x - means[g])) for g, x in rows]
    cnt = Counter(u for _, u in us)
    cum = 0
    mr = {}
    for u in sorted(cnt):
        mr[u] = cum + (cnt[u] + 1) / 2
        cum += cnt[u]
    nn = len(us)
    s_i = {
        g: sum(mr[u] ** 2 for gg, u in us if gg == g) for g in groups
    }
    r4 = sum(mr[u] ** 4 for _, u in us)
    sbar = sum(s_i.values()) / nn
    d2 = (r4 - nn * sbar * sbar) / (nn - 1)
    t = (
        sum(s_i[g] ** 2 / len(groups[g]) for g in groups)
        - nn * sbar * sbar
    ) / d2
    r = conover_squared_ranks(df, "g", "x").collect()[0]
    assert (r["k"], r["n"], r["t"]) == (3, nn, round(t, 6))
    assert r["t"] > 50  # planted 1:2:4 sd spread is unmissable


def test_iv_wald_event_study_rdd_vs_replicas(spark):
    """The round-11 causal trio against pure-Python replicas on
    planted designs: IV/Wald recovers a LATE of 2 on an encouragement
    design; event_study reads ~0 pre-period and ~1.5 post-period
    effects; sharp RDD recovers a 2.5 jump with matching slopes."""
    import collections
    import math
    import random

    from pandasvcf_spark.operators.stats import (
        event_study,
        iv_wald,
        rdd_sharp,
    )

    rng = random.Random(3)

    rows = []
    for i in range(2000):
        z = i % 2
        t = 1 if (rng.random() < 0.2 + 0.5 * z) else 0
        y = 2.0 * t + rng.gauss(0, 1)
        rows.append((z, float(t), round(y, 3)))
    df = spark.createDataFrame(rows, "z int, t double, y double")
    arm = {z: [r for r in rows if r[0] == z] for z in (0, 1)}

    def mom(a):
        n = len(a)
        ys = [r[2] for r in a]
        ts = [r[1] for r in a]
        my, mt = sum(ys) / n, sum(ts) / n
        vy = sum((v - my) ** 2 for v in ys) / (n - 1)
        vt = sum((v - mt) ** 2 for v in ts) / (n - 1)
        cyt = sum((r[2] - my) * (r[1] - mt) for r in a) / (n - 1)
        return n, my, mt, vy, vt, cyt

    n0, my0, mt0, vy0, vt0, c0 = mom(arm[0])
    n1, my1, mt1, vy1, vt1, c1 = mom(arm[1])
    itt, fs = my1 - my0, mt1 - mt0
    late = itt / fs
    se = math.sqrt(
        vy1 / n1 + vy0 / n0
        + late * late * (vt1 / n1 + vt0 / n0)
        - 2 * late * (c1 / n1 + c0 / n0)
    ) / abs(fs)
    r = iv_wald(df, "z", "t", "y").collect()[0]
    assert (r["n0"], r["n1"], r["itt"], r["fs"], r["late"], r["se"]) == (
        n0, n1, round(itt, 6), round(fs, 6), round(late, 6), round(se, 6),
    )
    assert abs(r["late"] - 2.0) < 3 * r["se"]

    rows = []
    for u in range(300):
        t = u % 2
        for k in range(-3, 4):
            y = 0.5 * k + (1.5 if (t == 1 and k >= 0) else 0.0) + rng.gauss(0, 1)
            rows.append((t, k, round(y, 3)))
    df = spark.createDataFrame(rows, "t int, k int, y double")
    out = {
        r["period"]: (r["n_treat"], r["n_ctrl"], r["effect"], r["se"])
        for r in event_study(df, "t", "k", "y").collect()
    }
    cells = collections.defaultdict(list)
    for t, k, y in rows:
        cells[(t, k)].append(y)

    def m(c):
        return sum(c) / len(c)

    def v(c):
        mm = m(c)
        return sum((x - mm) ** 2 for x in c) / (len(c) - 1)

    assert -1 not in out  # the reference period never reports on itself
    for k in (-3, -2, 0, 1, 2, 3):
        eff = (m(cells[(1, k)]) - m(cells[(1, -1)])) - (
            m(cells[(0, k)]) - m(cells[(0, -1)])
        )
        sek = math.sqrt(
            v(cells[(1, k)]) / len(cells[(1, k)])
            + v(cells[(1, -1)]) / len(cells[(1, -1)])
            + v(cells[(0, k)]) / len(cells[(0, k)])
            + v(cells[(0, -1)]) / len(cells[(0, -1)])
        )
        assert out[k] == (
            len(cells[(1, k)]), len(cells[(0, k)]),
            round(eff, 6), round(sek, 6),
        )
    assert abs(out[-3][2]) < 0.5 and out[2][2] > 1.0  # flat pre, jump post

    rows = []
    for _ in range(3000):
        x = rng.uniform(-2, 2)
        y = 1.0 + 0.8 * x + (2.5 if x >= 0 else 0.0) + rng.gauss(0, 0.5)
        rows.append((round(x, 4), round(y, 4)))
    df = spark.createDataFrame(rows, "x double, y double")
    h = 1.0

    def ols(side):
        pts = (
            [(x, y) for x, y in rows if 0 <= x <= h]
            if side == "r"
            else [(x, y) for x, y in rows if -h <= x < 0]
        )
        n = len(pts)
        mx = sum(p[0] for p in pts) / n
        my = sum(p[1] for p in pts) / n
        sxx = sum(p[0] ** 2 for p in pts) - n * mx * mx
        sxy = sum(p[0] * p[1] for p in pts) - n * mx * my
        syy = sum(p[1] ** 2 for p in pts) - n * my * my
        b = sxy / sxx
        a = my - b * mx
        s2 = (syy - b * sxy) / (n - 2)
        return n, a, b, s2 * (1 / n + mx * mx / sxx)

    nl, al, bl, val_ = ols("l")
    nr, ar, br, var_ = ols("r")
    r = rdd_sharp(df, "x", "y", 0.0, h).collect()[0]
    assert (
        r["n_left"], r["n_right"], r["tau"], r["se"],
        r["slope_left"], r["slope_right"],
    ) == (
        nl, nr, round(ar - al, 6), round(math.sqrt(val_ + var_), 6),
        round(bl, 6), round(br, 6),
    )
    assert abs(r["tau"] - 2.5) < 3 * r["se"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bandwidth"):
        rdd_sharp(df, "x", "y", 0.0, 0.0)


def test_cox_ph_binary_vs_replica(spark):
    """Binary-covariate Cox (Breslow ties, 5 Newton rounds) against a
    pure-Python replica on planted exponential hazards (true hazard
    ratio 2): bit-identical beta/se/hr/z, Newton converged
    (|U(b5)| ~ 1e-14), estimate within 3 SE of ln 2; no-event and
    no-variation degeneracies report NULL."""
    import math
    import random
    from collections import defaultdict

    from pandasvcf_spark.operators.stats import cox_ph_binary

    rng = random.Random(5)
    rows = []
    for i in range(1500):
        g = i % 2
        t = rng.expovariate(2.0 if g else 1.0)
        e = 1 if rng.random() < 0.8 else 0
        rows.append((round(t, 4), e, g))
    df = spark.createDataFrame(rows, "t double, e int, g int")

    cells = defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    for t, e, g in rows:
        c = cells[t]
        c[0] += e
        c[1] += e * g
        c[2] += g == 0
        c[3] += g == 1
    r0 = r1 = 0.0
    lad = []
    for t in sorted(cells, reverse=True):
        d, s, c0, c1 = cells[t]
        r0 += c0
        r1 += c1
        if d > 0:
            lad.append((d, s, r0, r1))
    b = 0.0
    for _ in range(5):
        u = i_ = 0.0
        for d, s, rr0, rr1 in lad:
            p = rr1 * math.exp(b) / (rr0 + rr1 * math.exp(b))
            u += s - d * p
            i_ += d * p * (1 - p)
        if i_ > 0:
            b += u / i_
    i_ = sum(
        d * (rr1 * math.exp(b) / (rr0 + rr1 * math.exp(b)))
        * (1 - rr1 * math.exp(b) / (rr0 + rr1 * math.exp(b)))
        for d, s, rr0, rr1 in lad
    )
    se = 1 / math.sqrt(i_)
    r = cox_ph_binary(df, "t", "e", "g").collect()[0]
    assert (r["beta"], r["se"], r["hr"], r["z"]) == (
        round(b, 6), round(se, 6), round(math.exp(b), 6),
        round(b / se, 6),
    )
    u = sum(
        s - d * (rr1 * math.exp(b) / (rr0 + rr1 * math.exp(b)))
        for d, s, rr0, rr1 in lad
    )
    assert abs(u) < 1e-6  # converged
    assert abs(r["beta"] - math.log(2)) < 3 * r["se"]

    # degeneracies: no events; single-group cohort
    noev = spark.createDataFrame(
        [(1.0, 0, 0), (2.0, 0, 1)], "t double, e int, g int"
    )
    r = cox_ph_binary(noev, "t", "e", "g").collect()[0]
    assert r["n_events"] == 0 and r["beta"] is None
    onegrp = spark.createDataFrame(
        [(1.0, 1, 1), (2.0, 1, 1)], "t double, e int, g int"
    )
    r = cox_ph_binary(onegrp, "t", "e", "g").collect()[0]
    assert r["beta"] is None  # I = 0: unbounded MLE reported as NULL


def test_cox_ph_multi_vs_replica(spark):
    """Multi-covariate Cox PH (p = 2, Breslow ties, 5 Newton rounds
    with the Cramer closed-form solve) against a pure-Python replica
    on a doubly-planted design (true betas 0.8 and -0.4): matching
    beta/se/hr/z to 6dp, planted effects recovered within 3 SE; p = 1
    reproduces cox_ph_binary bit-identically (same ladder, same
    Newton); perfectly collinear covariates (singular information)
    report NULL."""
    import math
    import random
    from collections import defaultdict

    from pandasvcf_spark.operators.stats import cox_ph, cox_ph_binary

    rng = random.Random(11)
    rows = []
    for i in range(800):
        x1 = float(i % 2)
        x2 = float(i % 3)
        lam = 0.1 * math.exp(0.8 * x1 - 0.4 * x2)
        t = rng.expovariate(lam)
        e = 1 if rng.random() < 0.8 else 0
        rows.append((round(t, 4), e, x1, x2))
    df = spark.createDataFrame(
        rows, "t double, e int, x1 double, x2 double"
    )

    # replica: cells keyed by (t, x1, x2); risk set = all cells with
    # time >= t_j (RANGE semantics — ties share one risk set)
    cells = defaultdict(lambda: [0.0, 0.0])
    for t, e, x1, x2 in rows:
        c = cells[(t, x1, x2)]
        c[0] += 1
        c[1] += e
    keys = sorted(cells, key=lambda k: -k[0])

    def newton_stats(b1, b2):
        s0 = s1a = s1b = s2aa = s2ab = s2bb = 0.0
        lad = []
        i = 0
        while i < len(keys):
            j = i
            while j < len(keys) and keys[j][0] == keys[i][0]:
                t, x1, x2 = keys[j]
                cnt, d = cells[keys[j]]
                w = cnt * math.exp(b1 * x1 + b2 * x2)
                s0 += w
                s1a += w * x1
                s1b += w * x2
                s2aa += w * x1 * x1
                s2ab += w * x1 * x2
                s2bb += w * x2 * x2
                j += 1
            for k in range(i, j):
                t, x1, x2 = keys[k]
                cnt, d = cells[keys[k]]
                if d > 0:
                    lad.append(
                        (d, x1, x2, s0, s1a, s1b, s2aa, s2ab, s2bb)
                    )
            i = j
        u1 = u2 = i11 = i12 = i22 = 0.0
        for d, x1, x2, s0, s1a, s1b, s2aa, s2ab, s2bb in lad:
            u1 += d * x1 - d * s1a / s0
            u2 += d * x2 - d * s1b / s0
            i11 += d * (s2aa / s0 - (s1a / s0) * (s1a / s0))
            i12 += d * (s2ab / s0 - (s1a / s0) * (s1b / s0))
            i22 += d * (s2bb / s0 - (s1b / s0) * (s1b / s0))
        return u1, u2, i11, i12, i22

    b1 = b2 = 0.0
    for _ in range(5):
        u1, u2, i11, i12, i22 = newton_stats(b1, b2)
        det = i11 * i22 - i12 * i12
        if det > 0 and i11 > 0:
            b1 += (u1 * i22 - u2 * i12) / det
            b2 += (u2 * i11 - u1 * i12) / det
    u1, u2, i11, i12, i22 = newton_stats(b1, b2)
    det = i11 * i22 - i12 * i12
    se1 = math.sqrt(i22 / det)
    se2 = math.sqrt(i11 / det)
    assert abs(u1) < 1e-6 and abs(u2) < 1e-6  # converged

    got = {
        r["covariate"]: r
        for r in cox_ph(df, "t", "e", ["x1", "x2"]).collect()
    }
    assert (got["x1"]["beta"], got["x1"]["se"]) == (
        round(b1, 6), round(se1, 6)
    )
    assert (got["x2"]["beta"], got["x2"]["se"]) == (
        round(b2, 6), round(se2, 6)
    )
    assert got["x1"]["hr"] == round(math.exp(b1), 6)
    assert got["x2"]["z"] == round(b2 / se2, 6)
    # planted effects recovered
    assert abs(got["x1"]["beta"] - 0.8) < 3 * got["x1"]["se"]
    assert abs(got["x2"]["beta"] - (-0.4)) < 3 * got["x2"]["se"]

    # p = 1 reproduces the binary fit bit-identically
    m1 = cox_ph(df, "t", "e", ["x1"]).collect()[0]
    mb = cox_ph_binary(df, "t", "e", "x1").collect()[0]
    assert (m1["beta"], m1["se"], m1["hr"], m1["z"]) == (
        mb["beta"], mb["se"], mb["hr"], mb["z"]
    )

    # collinear covariates: singular information -> NULL estimates
    col = df.withColumn("x2", 2 * F.col("x1"))
    for r in cox_ph(col, "t", "e", ["x1", "x2"]).collect():
        assert r["beta"] is None and r["se"] is None


def test_cox_ph_p3_natural_order_vs_numpy(spark):
    """Round-13 (verdict task 5): the p >= 3 NATURAL-ORDER elimination
    path against a numpy Newton replica (np.linalg.solve / inv) on a
    triply-planted design (true betas 0.7, -0.5, 0.3): betas and SEs
    agree to 1e-6 — natural-order elimination on the SPD information
    matrix is the same solution partial pivoting finds, just with the
    data-independent op order the m_cox_multi3 oracle replays. Planted
    effects recovered within 3 SE; a collinear triple (x3 = x1 + x2)
    reports NULL through the natural-pivot positivity guard."""
    import math
    import random
    from collections import defaultdict

    import numpy as np

    from pandasvcf_spark.operators.stats import cox_ph

    rng = random.Random(13)
    rows = []
    for i in range(900):
        x1, x2, x3 = float(i % 2), float(i % 3), float((i // 2) % 2)
        lam = 0.1 * math.exp(0.7 * x1 - 0.5 * x2 + 0.3 * x3)
        t = rng.expovariate(lam)
        e = 1 if rng.random() < 0.8 else 0
        rows.append((round(t, 4), e, x1, x2, x3))
    df = spark.createDataFrame(
        rows, "t double, e int, x1 double, x2 double, x3 double"
    )

    # numpy replica over (t, x) cells with RANGE risk-set semantics
    cells = defaultdict(lambda: [0.0, 0.0])
    for t, e, *x in rows:
        c = cells[(t, *x)]
        c[0] += 1
        c[1] += e

    def newton_stats(beta):
        keys = sorted(cells, key=lambda k: -k[0])
        s0, s1, s2 = 0.0, np.zeros(3), np.zeros((3, 3))
        u, info = np.zeros(3), np.zeros((3, 3))
        i = 0
        while i < len(keys):
            j = i
            while j < len(keys) and keys[j][0] == keys[i][0]:
                x = np.array(keys[j][1:])
                cnt, _d = cells[keys[j]]
                w = cnt * math.exp(float(beta @ x))
                s0 += w
                s1 = s1 + w * x
                s2 = s2 + w * np.outer(x, x)
                j += 1
            for k in range(i, j):
                x = np.array(keys[k][1:])
                _cnt, d = cells[keys[k]]
                if d > 0:
                    u = u + d * (x - s1 / s0)
                    info = info + d * (
                        s2 / s0 - np.outer(s1 / s0, s1 / s0)
                    )
            i = j
        return u, info

    beta = np.zeros(3)
    for _ in range(5):
        u, info = newton_stats(beta)
        beta = beta + np.linalg.solve(info, u)
    _, info = newton_stats(beta)
    se = np.sqrt(np.diag(np.linalg.inv(info)))

    got = {
        r["covariate"]: r
        for r in cox_ph(df, "t", "e", ["x1", "x2", "x3"]).collect()
    }
    for i, nm in enumerate(["x1", "x2", "x3"]):
        assert abs(got[nm]["beta"] - beta[i]) < 1e-6, (nm, got[nm])
        assert abs(got[nm]["se"] - se[i]) < 1e-6, (nm, got[nm])
    for nm, true in (("x1", 0.7), ("x2", -0.5), ("x3", 0.3)):
        assert abs(got[nm]["beta"] - true) < 3 * got[nm]["se"]

    # collinear triple: the natural-pivot positivity guard -> NULL
    col = df.withColumn("x3", F.col("x1") + F.col("x2"))
    for r in cox_ph(col, "t", "e", ["x1", "x2", "x3"]).collect():
        assert r["beta"] is None and r["se"] is None


def test_pareto_front_semantics_and_regime_equivalence(spark):
    """Round-13 (verdict task 6): pareto_front against a brute-force
    strict-dominance skyline on a hand grid (incl. the tie rule —
    equal y at different x keeps the larger x); the big regime
    (bucketed_running_extreme, the lifted envelope half of the fdr
    ladder) is BIT-identical to the plain-window regime on 20k
    pseudo-random points."""
    from pandasvcf_spark.operators.relational import pareto_front

    pts = [
        (1.0, 5.0), (2.0, 7.0), (3.0, 7.0),   # (2,7) weakly dominated
        (4.0, 4.0), (5.0, 6.0),               # (4,4) dominated
        (6.0, 2.0), (2.0, 1.0),               # dup x: max-y collapse
    ]
    d = spark.createDataFrame(pts, "x double, y double")
    got = {(r["x"], r["y"]) for r in pareto_front(d, "x", "y").collect()}
    # brute force over collapsed cells
    cells = {}
    for x, y in pts:
        cells[x] = max(cells.get(x, float("-inf")), y)
    want = {
        (x, y)
        for x, y in cells.items()
        if not any(
            x2 > x and y2 >= y for x2, y2 in cells.items()
        )
    }
    assert got == want and (3.0, 7.0) in got and (2.0, 7.0) not in got

    big_df = spark.range(20000).select(
        ((F.col("id") * 2654435761) % 9973).cast("double").alias("x"),
        ((F.col("id") * 40503) % 8191).cast("double").alias("y"),
    )
    small = sorted(
        map(tuple, pareto_front(big_df, "x", "y").collect())
    )
    big = sorted(
        map(
            tuple,
            pareto_front(
                big_df, "x", "y", ladder_cells=500, n_buckets=32
            ).collect(),
        )
    )
    assert small == big and len(small) > 1

    # round-14 ADVICE: max_cells=None (the guard opt-out the >10M raise
    # itself recommends) must still ROUTE by cardinality — above
    # ladder_cells the plan must go through the bucketed envelope, not
    # silently fall back to the unpartitioned global window
    opted_out = sorted(
        map(
            tuple,
            pareto_front(
                big_df, "x", "y", max_cells=None,
                ladder_cells=500, n_buckets=32,
            ).collect(),
        )
    )
    assert opted_out == small
    plan = pareto_front(
        big_df, "x", "y", max_cells=None, ladder_cells=500, n_buckets=32
    )._jdf.queryExecution().executedPlan().toString()
    assert "__ebk" in plan, "opt-out path skipped the bucketed envelope"


def test_auc_delong_page_hinkley_fisher_vs_replicas(spark):
    """DeLong AUC/SE against the placement-value replica; Page-Hinkley
    against the running-mean cumulative replica (peak lands after the
    planted t=60 mean shift); Fisher exact pinned to R fisher.test
    goldens (tea-tasting 3/1/1/3 -> p=0.4857143, OR 9;
    1/9/11/3 -> p=0.0027595) plus the max_n tripwire."""
    import bisect
    import math
    import random

    import pytest as _pytest

    from pandasvcf_spark.operators.stats import (
        auc_delong,
        fisher_exact_2x2,
        page_hinkley,
    )

    rng = random.Random(13)
    rows = [
        (1 if rng.random() < 0.4 else 0, round(rng.gauss(0, 1), 1))
        for _ in range(600)
    ]
    rows = [(y, s + (0.8 if y else 0.0)) for y, s in rows]
    df = spark.createDataFrame(rows, "y int, s double")
    pos = sorted(s for y, s in rows if y == 1)
    neg = sorted(s for y, s in rows if y == 0)

    def v10(s):
        lo, hi = bisect.bisect_left(neg, s), bisect.bisect_right(neg, s)
        return (lo + 0.5 * (hi - lo)) / len(neg)

    def v01(s):
        lo, hi = bisect.bisect_left(pos, s), bisect.bisect_right(pos, s)
        return ((len(pos) - hi) + 0.5 * (hi - lo)) / len(pos)

    V10 = [v10(s) for s in pos]
    V01 = [v01(s) for s in neg]
    auc = sum(V10) / len(V10)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se = math.sqrt(var(V10) / len(pos) + var(V01) / len(neg))
    r = auc_delong(df, "y", "s").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert abs(r["auc"] - auc) < 2e-6 and abs(r["se"] - se) < 2e-6

    ser = [(i, round(rng.gauss(0, 1) + (3.0 if i >= 60 else 0.0), 4))
           for i in range(100)]
    df = spark.createDataFrame(ser, "t int, v double")
    ms, m, s_run = [], 0.0, 0.0
    for i, (_, x) in enumerate(ser, 1):
        s_run += x
        m += x - s_run / i
        ms.append(m)
    mn, ph = float("inf"), []
    for mm in ms:
        mn = min(mn, mm)
        ph.append(mm - mn)
    r = page_hinkley(df, "t", "v").collect()[0]
    assert (r["n"], r["ph"], r["t_peak"]) == (
        100, round(max(ph), 6), ph.index(max(ph)),
    )
    assert r["t_peak"] >= 60  # the shift is where the climb peaks

    tea = [(1, 1)] * 3 + [(1, 0)] * 1 + [(0, 1)] * 1 + [(0, 0)] * 3
    df = spark.createDataFrame(tea, "fa int, fb int")
    r = fisher_exact_2x2(df, "fa", "fb").collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 1, 1, 3)
    assert abs(r["p_value"] - 0.48571429) < 1e-6
    assert r["odds_ratio"] == 9.0
    t2 = [(1, 1)] * 1 + [(1, 0)] * 9 + [(0, 1)] * 11 + [(0, 0)] * 3
    df = spark.createDataFrame(t2, "fa int, fb int")
    r = fisher_exact_2x2(df, "fa", "fb").collect()[0]
    assert abs(r["p_value"] - 0.0027594561) < 1e-7
    with _pytest.raises(ValueError, match="max_n"):
        fisher_exact_2x2(df, "fa", "fb", max_n=5)


def test_granger_causality_vs_replica(spark):
    """Granger (1 lag) on a planted y_t = 0.5 y_{t-1} + 0.8 x_{t-1} +
    noise system: replica-exact F and coefficients, and the DIRECTION
    asymmetry (x→y huge F, y→x small)."""
    import random

    from pandasvcf_spark.operators.stats import granger_causality

    rng = random.Random(21)
    xs = [rng.gauss(0, 1) for _ in range(300)]
    ys = [0.0]
    for t in range(1, 300):
        ys.append(0.5 * ys[t - 1] + 0.8 * xs[t - 1] + rng.gauss(0, 0.3))
    rows = [(t, round(ys[t], 4), round(xs[t], 4)) for t in range(300)]
    df = spark.createDataFrame(rows, "t int, y double, x double")

    trip = [
        (rows[t][1], rows[t - 1][1], rows[t - 1][2])
        for t in range(1, 300)
    ]
    n = len(trip)
    sy = sum(a for a, _, _ in trip)
    su = sum(b for _, b, _ in trip)
    sv = sum(c for _, _, c in trip)
    syy = sum(a * a for a, _, _ in trip) - sy * sy / n
    suu = sum(b * b for _, b, _ in trip) - su * su / n
    svv = sum(c * c for _, _, c in trip) - sv * sv / n
    syu = sum(a * b for a, b, _ in trip) - sy * su / n
    syv = sum(a * c for a, _, c in trip) - sy * sv / n
    suv = sum(b * c for _, b, c in trip) - su * sv / n
    rss_r = syy - syu * syu / suu
    det = suu * svv - suv * suv
    b_y = (syu * svv - syv * suv) / det
    b_x = (syv * suu - syu * suv) / det
    rss_u = syy - b_y * syu - b_x * syv
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    r = granger_causality(df, "t", "y", "x").collect()[0]
    assert (r["n"], r["f"], r["b_y"], r["b_x"]) == (
        n, round(f, 6), round(b_y, 6), round(b_x, 6),
    )
    assert abs(r["b_y"] - 0.5) < 0.1 and abs(r["b_x"] - 0.8) < 0.1
    rev = granger_causality(df, "t", "x", "y").collect()[0]
    assert r["f"] > 100 and rev["f"] < 10


def test_classical_decompose_planted(spark):
    """Planted trend + zero-sum seasonal recovered EXACTLY by the
    centered MA on both parities: odd period 3 (plain MA) and even
    period 4 (2xMA half-weight ends); edges NULL; remainder ~0."""
    from pandasvcf_spark.operators.stats import classical_decompose

    seas = [4.0, -1.0, -3.0]
    rows = [(t, 0.5 * t + seas[t % 3]) for t in range(30)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {
        r["t"]: r
        for r in classical_decompose(df, "t", "v", period=3).collect()
    }
    assert len(out) == 30
    assert out[0]["trend"] is None and out[29]["trend"] is None
    for t in range(1, 29):
        assert abs(out[t]["trend"] - 0.5 * t) < 1e-9
        assert abs(out[t]["seasonal"] - seas[t % 3]) < 1e-9
        assert abs(out[t]["remainder"]) < 1e-9

    seas4 = [2.0, 0.0, -1.0, -1.0]
    rows = [(t, 1.0 * t + seas4[t % 4]) for t in range(24)]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {
        r["t"]: r
        for r in classical_decompose(df, "t", "v", period=4).collect()
    }
    for t in range(2, 22):
        assert abs(out[t]["trend"] - 1.0 * t) < 1e-9
        assert abs(out[t]["seasonal"] - seas4[t % 4]) < 1e-9
        assert abs(out[t]["remainder"]) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError, match="period"):
        classical_decompose(df, "t", "v", period=1)


def test_binom_exact_and_mcnemar_exact_vs_goldens(spark):
    """Exact binomial pinned to R's documented binom.test(682, 925,
    3/4) golden via the integer-exact math.comb replica; exact McNemar
    = two-sided binomial on the discordant counts (b=3, c=9 ->
    598/4096); max_n tripwires raise."""
    import math

    import pytest as _pytest

    from pandasvcf_spark.operators.stats import (
        binom_test_exact,
        mcnemar_exact,
    )

    def r_binom(k, n, p0):
        pmf = [
            math.comb(n, j) * p0 ** j * (1 - p0) ** (n - j)
            for j in range(n + 1)
        ]
        thresh = pmf[k] * (1 + 1e-7)
        return min(sum(q for q in pmf if q <= thresh), 1.0)

    rows = [(1,)] * 682 + [(0,)] * (925 - 682)
    df = spark.createDataFrame(rows, "s int")
    r = binom_test_exact(df, "s", p0=0.75).collect()[0]
    assert (r["n"], r["k"]) == (925, 682)
    assert abs(r["p_value"] - r_binom(682, 925, 0.75)) < 1e-7
    assert abs(r["p_value"] - 0.3824916) < 1e-6  # R's printed value

    rows = [(1,)] * 7 + [(0,)] * 13
    df = spark.createDataFrame(rows, "s int")
    r = binom_test_exact(df, "s", p0=0.5).collect()[0]
    assert abs(r["p_value"] - 0.26317596) < 1e-7
    with _pytest.raises(ValueError, match="max_n"):
        binom_test_exact(df, "s", max_n=5)

    rows = [(1, 0)] * 3 + [(0, 1)] * 9 + [(1, 1)] * 5 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, "fa int, fb int")
    r = mcnemar_exact(df, "fa", "fb").collect()[0]
    assert (r["b"], r["c"]) == (3, 9)
    assert abs(r["p_value"] - 598 / 4096) < 1e-8
    with _pytest.raises(ValueError, match="max_n"):
        mcnemar_exact(df, "fa", "fb", max_n=5)
    # no discordance: NULL p
    rows = [(1, 1)] * 4 + [(0, 0)] * 4
    df = spark.createDataFrame(rows, "fa int, fb int")
    assert mcnemar_exact(df, "fa", "fb").collect()[0]["p_value"] is None


def test_sign_test_vs_golden(spark):
    """Sign test = exact binomial on informative pairs at p0 = 1/2:
    the 7-pos/13-neg case equals binom.test(7, 20, .5) = 0.26317596;
    ties drop; no-informative-pairs -> NULL p."""
    from pandasvcf_spark.operators.stats import sign_test

    rows = (
        [(2.0, 1.0)] * 7        # positive differences
        + [(1.0, 2.0)] * 13     # negative
        + [(5.0, 5.0)] * 4      # ties: dropped
    )
    df = spark.createDataFrame(rows, "x double, y double")
    r = sign_test(df, "x", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (7, 13)
    assert abs(r["p_value"] - 0.26317596) < 1e-7

    allties = spark.createDataFrame([(1.0, 1.0)] * 3, "x double, y double")
    assert sign_test(allties, "x", "y").collect()[0]["p_value"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_n"):
        sign_test(df, "x", "y", max_n=5)


# --- poisson_fit / vif_screen / breusch_pagan / chow_test ------------------


def test_poisson_fit_vs_numpy_irls(spark):
    """poisson_fit == a numpy IRLS replica on the same data (same null-
    model warm start, same 2-round budget, same eta clamp)."""
    import numpy as np

    rows = [
        # y counts roughly exp(1 + 0.5*x1 - 0.3*x2) with deterministic
        # jitter so slopes are decidedly non-zero
        (float(max(0, int(math.exp(1.0 + 0.5 * x1 - 0.3 * x2))
                   + ((i * 7) % 3) - 1)),
         float(x1), float(x2))
        for i, (x1, x2) in enumerate(
            (a, b) for a in range(5) for b in range(4)
        )
    ]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    from pandasvcf_spark.operators.relational import poisson_fit

    got = {r["term"]: r["beta"] for r in
           poisson_fit(df, "y", ["x1", "x2"], iters=2).collect()}

    y = np.array([r[0] for r in rows])
    X = np.column_stack([np.ones(len(rows)),
                         [r[1] for r in rows], [r[2] for r in rows]])
    beta = np.array([math.log(max(y.mean(), 1e-10)), 0.0, 0.0])
    for _ in range(2):
        eta = np.clip(X @ beta, -30.0, 30.0)
        mu = np.exp(eta)
        z = eta + (y - mu) / mu
        W = mu
        XX = X.T @ (X * W[:, None])
        Xz = X.T @ (W * z)
        beta = np.linalg.solve(XX, Xz)
    assert got["(n)"] == float(len(rows))
    for nm, b in zip(["(intercept)", "x1", "x2"], beta):
        assert got[nm] == pytest.approx(round(float(b), 6), abs=2e-6)


def test_poisson_fit_rejects_negative_y(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0), (-1.0, 1.0)], "y double, x double"
    )
    from pandasvcf_spark.operators.relational import poisson_fit

    with pytest.raises(ValueError, match="y must be >= 0"):
        poisson_fit(df, "y", ["x"], iters=1)


def test_vif_screen_known_design(spark):
    """x3 = x1 + x2 exactly -> singular raise; x3 = x1 + small noise ->
    VIF matches the closed-form 3x3 inverse-diagonal identity."""
    from pandasvcf_spark.operators.stats import vif_screen

    base = [(float(i % 7), float((i * 3) % 5)) for i in range(40)]
    sing = spark.createDataFrame(
        [(a, b, a + b) for a, b in base], "x1 double, x2 double, x3 double"
    )
    with pytest.raises(ValueError, match="singular"):
        vif_screen(sing, ["x1", "x2", "x3"])

    rows = [(a, b, a + 0.25 * ((i * 11) % 4)) for i, (a, b) in
            enumerate(base)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double")
    got = {r["term"]: (r["vif"], r["r2_aux"]) for r in
           vif_screen(df, ["x1", "x2", "x3"]).collect()}

    import numpy as np

    X = np.array(rows)
    R = np.corrcoef(X, rowvar=False)
    inv = np.linalg.inv(R)
    for j, nm in enumerate(["x1", "x2", "x3"]):
        assert got[nm][0] == pytest.approx(round(float(inv[j, j]), 6),
                                           abs=2e-6)
        assert got[nm][1] == pytest.approx(
            round(1.0 - 1.0 / float(inv[j, j]), 6), abs=2e-6)
    # the collinear pair inflates, the independent column doesn't
    assert got["x1"][0] > 5.0 and got["x3"][0] > 5.0
    assert got["x2"][0] < 1.5


def test_breusch_pagan_planted_heteroscedasticity(spark):
    """Residual variance grows with x1 by construction -> LM far above
    the homoscedastic expectation (E[LM] = df = 2); a constant-variance
    twin stays small. Replica check against statsmodels' formula done
    by hand: LM = n * R2 of e^2 on X."""
    import numpy as np

    from pandasvcf_spark.operators.stats import breusch_pagan

    n = 400
    x1 = np.array([float(i % 20) for i in range(n)])
    x2 = np.array([float((i * 7) % 11) for i in range(n)])
    noise = np.array([((i * 2654435761) % 1000) / 500.0 - 1.0
                      for i in range(n)])  # deterministic ~U(-1,1)
    y_het = 2.0 + 0.5 * x1 + (0.2 + 0.3 * x1) * noise
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y_het, x1, x2)],
        "y double, x1 double, x2 double",
    )
    out = breusch_pagan(df, "y", ["x1", "x2"]).collect()[0]
    assert out["n"] == n and out["df"] == 2

    # numpy replica of the two-stage LM
    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.linalg.solve(X.T @ X, X.T @ y_het)
    u = (y_het - X @ beta) ** 2
    ba = np.linalg.solve(X.T @ X, X.T @ u)
    ssr = u @ u - ba @ (X.T @ u)
    sst = u @ u - u.sum() ** 2 / n
    lm = n * (1.0 - ssr / sst)
    assert out["lm_stat"] == pytest.approx(round(float(lm), 4), abs=2e-4)
    assert out["p_value"] == pytest.approx(
        round(math.exp(-float(lm) / 2.0), 6), abs=2e-6)
    assert out["lm_stat"] > 20.0  # planted heteroscedasticity detected


def test_chow_test_break_vs_stable(spark):
    """Regime B gets a different slope -> F large; identical regimes ->
    F ~ 0 (exactly 0 up to rounding when the halves are copies)."""
    from pandasvcf_spark.operators.stats import chow_test

    stable = [(2.0 + 0.5 * x + 0.1 * ((i * 3) % 5), float(x), g)
              for g in (0, 1) for i, x in enumerate(range(30))]
    df = spark.createDataFrame(stable, "y double, x double, g int")
    out = chow_test(df, "y", "x", "g").collect()[0]
    assert out["n_a"] == 30 and out["n_b"] == 30
    assert out["df1"] == 2 and out["df2"] == 56
    assert abs(out["f_stat"]) < 1e-6  # identical halves: no break

    broken = [(2.0 + 0.5 * x + 0.1 * ((i * 3) % 5), float(x), 0)
              for i, x in enumerate(range(30))]
    broken += [(10.0 - 0.5 * x + 0.1 * ((i * 3) % 5), float(x), 1)
               for i, x in enumerate(range(30))]
    df2 = spark.createDataFrame(broken, "y double, x double, g int")
    out2 = chow_test(df2, "y", "x", "g").collect()[0]
    assert out2["f_stat"] > 100.0

    one = spark.createDataFrame(
        [(1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 3.0, 0)],
        "y double, x double, g int",
    )
    with pytest.raises(ValueError, match="2-partition"):
        chow_test(one, "y", "x", "g")


def test_mrr_eval_hand_case(spark):
    """q=1: relevant at rank 2 (rr .5, in @10); q=2: relevant at rank 1
    via the id tie-break on equal scores (rr 1); q=3: no relevant row
    (rr 0, miss). MRR = (0.5 + 1 + 0)/3 = 0.5; hit@10 = 2/3."""
    from pandasvcf_spark.operators.stats import mrr_eval

    df = spark.createDataFrame(
        [
            (1, 10, 0.9, False), (1, 11, 0.8, True), (1, 12, 0.7, True),
            (2, 20, 0.5, True), (2, 21, 0.5, False),  # tie: id 20 wins
            (3, 30, 0.4, False), (3, 31, 0.3, False),
        ],
        "q int, id int, s double, rel boolean",
    )
    out = mrr_eval(df, "q", "id", "s", "rel", k=10).collect()[0]
    assert out["n_queries"] == 3
    assert out["mrr"] == pytest.approx(0.5)
    assert out["hit_rate_at_k"] == pytest.approx(round(2 / 3, 6))

    # k=1: only q=2's rank-1 hit survives
    out1 = mrr_eval(df, "q", "id", "s", "rel", k=1).collect()[0]
    assert out1["hit_rate_at_k"] == pytest.approx(round(1 / 3, 6))


def test_cox_ph_stratified_invariances(spark):
    """Two exact invariances pin the stratified machinery:
    (1) duplicating one cohort into two identical strata doubles both
        the score and the information, so the Newton trajectory — and
        the betas — are IDENTICAL to the single-cohort fit;
    (2) Cox is rank-based per stratum: scaling one stratum's times by
        any constant preserves its risk-set ladder, so the stratified
        fit is bit-identical — while the UNSTRATIFIED fit on the same
        scaled data moves (the baseline shift leaks into beta)."""
    from pandasvcf_spark.operators.stats import cox_ph

    cohort = [
        (float(t), e, float(x1), float(x2))
        for t, e, x1, x2 in [
            (1, 1, 0, 1), (2, 1, 1, 0), (3, 0, 0, 2), (4, 1, 1, 1),
            (5, 1, 0, 0), (6, 0, 1, 2), (7, 1, 1, 0), (9, 1, 0, 1),
            (11, 0, 1, 1), (13, 1, 0, 2),
        ]
    ]
    one = spark.createDataFrame(
        cohort, "t double, e int, x1 double, x2 double"
    )
    two = spark.createDataFrame(
        [(s,) + r for s in ("a", "b") for r in cohort],
        "s string, t double, e int, x1 double, x2 double",
    )
    fit1 = {r["covariate"]: (r["beta"], r["z"]) for r in
            cox_ph(one, "t", "e", ["x1", "x2"], iters=4).collect()}
    fit2 = {r["covariate"]: (r["beta"], r["z"]) for r in
            cox_ph(two, "t", "e", ["x1", "x2"], iters=4,
                   strata_col="s").collect()}
    assert fit1["x1"][0] == fit2["x1"][0]
    assert fit1["x2"][0] == fit2["x2"][0]
    # doubling the cohort doubles the information: z scales by sqrt(2)
    assert fit2["x1"][1] == pytest.approx(
        fit1["x1"][1] * math.sqrt(2), abs=5e-5)

    scaled = spark.createDataFrame(
        [("a",) + r for r in cohort]
        + [("b", r[0] * 10.0, r[1], r[2], r[3]) for r in cohort],
        "s string, t double, e int, x1 double, x2 double",
    )
    fit_s = {r["covariate"]: r["beta"] for r in
             cox_ph(scaled, "t", "e", ["x1", "x2"], iters=4,
                    strata_col="s").collect()}
    assert fit_s["x1"] == fit2["x1"][0]  # per-stratum ranks unchanged
    assert fit_s["x2"] == fit2["x2"][0]
    pooled = {r["covariate"]: r["beta"] for r in
              cox_ph(scaled.drop("s"), "t", "e", ["x1", "x2"],
                     iters=4).collect()}
    assert pooled["x1"] != fit_s["x1"]  # unstratified absorbs the shift


def test_pr_points_hand_case_and_ladder_equivalence(spark):
    """scores 3,3,2,1 labels 1,0,1,0: t=3 -> P=1/2 R=1/2; t=2 ->
    P=2/3 R=1; t=1 -> P=1/2 R=1. And the bucketed-ladder re-cut
    (ladder_cells=1) is bit-identical to the plain-window path."""
    from pandasvcf_spark.operators.stats import pr_points

    df = spark.createDataFrame(
        [(3.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)], "s double, y int"
    )
    got = {r["score"]: (r["precision"], r["recall"], r["f1"])
           for r in pr_points(df, "s", "y").collect()}
    assert got[3.0] == (0.5, 0.5, 0.5)
    assert got[2.0] == (round(2 / 3, 6), 1.0, 0.8)
    assert got[1.0] == (0.5, 1.0, round(2 / 3, 6))

    big = spark.createDataFrame(
        [(float((i * 13) % 97), (i * 7) % 3 == 0) for i in range(500)],
        "s double, y boolean",
    )
    plain = sorted(map(tuple, pr_points(big, "s", "y").collect()))
    recut = sorted(map(tuple,
                       pr_points(big, "s", "y", ladder_cells=1,
                                 n_buckets=8).collect()))
    assert plain == recut


def test_holt_winters_vs_replica_and_guards(spark):
    """Pure-Python replica of the additive HW recursion (same init,
    same fold order) matches to the 4dp output; a key shorter than 2m
    emits NULL state but keeps its count; a planted exact-period
    series forecasts its next seasonal value."""
    from pandasvcf_spark.operators.relational import holt_winters_last

    season = [3.0, -1.0, -4.0, 2.0]
    rows = [("k", i, 10 + 0.5 * i + season[i % 4] + ((i * 7) % 5) * 0.1)
            for i in range(14)]
    rows += [("short", i, float(i)) for i in range(7)]
    df = spark.createDataFrame(rows, "key string, o int, x double")
    got = {r["key"]: (r["n_events"], r["level"], r["trend"], r["forecast"])
           for r in holt_winters_last(df, "key", ["o"], "x", m=4).collect()}

    xs = [x for k, _, x in rows if k == "k"]
    m, a, b, g = 4, 0.4, 0.3, 0.2
    lv = sum(xs[:4]) / 4
    tr = (sum(xs[4:8]) / 4 - lv) / 4
    s = [x - lv for x in xs[:4]]
    i = 0
    for x in xs[4:]:
        ln = a * (x - s[i]) + (1 - a) * (lv + tr)
        bn = b * (ln - lv) + (1 - b) * tr
        s[i] = g * (x - lv - tr) + (1 - g) * s[i]
        lv, tr, i = ln, bn, (i + 1) % 4
    assert got["k"] == (14, round(lv, 4), round(tr, 4),
                        round(lv + tr + s[i], 4))
    assert got["short"] == (7, None, None, None)

    # exact linear+seasonal series: the +1 forecast nails the truth
    exact = [("e", i, 100.0 + 2.0 * i + season[i % 4]) for i in range(40)]
    de = spark.createDataFrame(exact, "key string, o int, x double")
    r = holt_winters_last(de, "key", ["o"], "x", m=4).collect()[0]
    truth = 100.0 + 2.0 * 40 + season[0]
    assert abs(r["forecast"] - truth) < 0.35


def test_partial_corr_removes_common_driver(spark):
    """x and y both driven by z: raw corr is strong, partial corr ~ 0;
    exact value check vs the closed form on scipy-free arithmetic."""
    from pandasvcf_spark.operators.stats import partial_corr

    rows = []
    for i in range(60):
        z = float(i % 10)
        noise_x = ((i * 7) % 5) * 0.3
        noise_y = ((i * 11) % 7) * 0.2
        rows.append((2.0 * z + noise_x, 3.0 * z + noise_y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = partial_corr(df, "x", "y", "z").collect()[0]
    assert out["n"] == 60
    assert out["r_xy"] > 0.95          # driven by the shared z
    assert abs(out["r_partial"]) < 0.3  # z partialled out

    import math as _m

    xs = [r[0] for r in rows]; ys = [r[1] for r in rows]
    zs = [r[2] for r in rows]; n = 60.0

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        num = n * sum(u * v for u, v in zip(a, b)) - sa * sb
        den = _m.sqrt(
            (n * sum(u * u for u in a) - sa * sa)
            * (n * sum(v * v for v in b) - sb * sb))
        return num / den

    rxy, rxz, rzy = corr(xs, ys), corr(xs, zs), corr(zs, ys)
    rp = (rxy - rxz * rzy) / _m.sqrt((1 - rxz**2) * (1 - rzy**2))
    assert out["r_xy"] == pytest.approx(round(rxy, 6), abs=2e-6)
    assert out["r_partial"] == pytest.approx(round(rp, 6), abs=2e-6)


def test_welch_anova_vs_replica_and_guard(spark):
    """Planted mean shift with unequal variances -> large F; replica of
    the Welch arithmetic matches to 6dp; a constant group raises."""
    from pandasvcf_spark.operators.stats import welch_anova

    rows = []
    for g, (mu, spread) in enumerate([(0.0, 1.0), (0.2, 3.0), (5.0, 0.5)]):
        for i in range(20):
            rows.append((f"g{g}", mu + spread * (((i * 7) % 9) - 4) / 4.0))
    df = spark.createDataFrame(rows, "g string, v double")
    out = welch_anova(df, "g", "v").collect()[0]
    assert out["k"] == 3 and out["df1"] == 2
    assert out["f_stat"] > 50.0

    import statistics as st

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    ns = {g: len(v) for g, v in groups.items()}
    ms = {g: sum(v) / len(v) for g, v in groups.items()}
    vs = {g: st.variance(v) for g, v in groups.items()}
    w = {g: ns[g] / vs[g] for g in groups}
    W = sum(w.values())
    xw = sum(w[g] * ms[g] for g in groups) / W
    k = 3.0
    num = sum(w[g] * (ms[g] - xw) ** 2 for g in groups) / (k - 1)
    lam = sum((1 - w[g] / W) ** 2 / (ns[g] - 1) for g in groups)
    f = num / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    assert out["f_stat"] == pytest.approx(round(f, 6), abs=2e-6)
    assert out["df2"] == pytest.approx(round((k * k - 1) / (3 * lam), 4),
                                       abs=2e-4)

    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="zero variance"):
        welch_anova(const, "g", "v")


def test_dunn_test_vs_replica(spark):
    """Three groups, planted location shift in one: its pairwise |z|
    dominates; exact check vs a pure-Python mid-rank replica with tie
    correction."""
    from pandasvcf_spark.operators.stats import dunn_test

    rows = (
        [("a", float(v)) for v in [1, 2, 2, 3, 4, 5, 5, 6]]
        + [("b", float(v)) for v in [2, 3, 3, 4, 5, 6, 6, 7]]
        + [("c", float(v)) for v in [8, 9, 9, 10, 11, 12, 12, 13]]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["treat_a"], r["treat_b"]): r for r in
           dunn_test(df, "g", "v").collect()}

    # replica
    from collections import Counter

    vals = sorted({v for _, v in rows})
    cnt = Counter(v for _, v in rows)
    mid, run = {}, 0.0
    for v in vals:
        mid[v] = run + (cnt[v] + 1.0) / 2.0
        run += cnt[v]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(mid[v])
    N = float(len(rows))
    tsum = sum(c**3 - c for c in cnt.values())
    sig2 = N * (N + 1) / 12.0 - tsum / (12.0 * (N - 1.0))

    import math as _m

    for (ga, gb), r in got.items():
        ra = sum(groups[ga]) / len(groups[ga])
        rb = sum(groups[gb]) / len(groups[gb])
        zz = (ra - rb) / _m.sqrt(
            sig2 * (1.0 / len(groups[ga]) + 1.0 / len(groups[gb])))
        assert r["mr_a"] == pytest.approx(round(ra, 4))
        assert r["z"] == pytest.approx(round(zz, 6), abs=2e-6)
    assert abs(got[("a", "c")]["z"]) > abs(got[("a", "b")]["z"])
    assert abs(got[("a", "c")]["z"]) > 2.5


def test_fdr_by_vs_r_padjust_golden(spark):
    """R: p.adjust(c(.01,.02,.03,.04,.05), 'BY') ->
    0.1141666..., 0.1141666..., 0.1141666..., 0.1141666..., 0.1141667
    (all = 5*c(5)*p_i/i folded through the suffix min; c(5) =
    1 + 1/2 + 1/3 + 1/4 + 1/5 = 2.283333...). Plus: by == bh * c(m)
    clamped, on a spread-out p set; and the bucketed regime is
    bit-identical."""
    from pandasvcf_spark.operators.stats import fdr_correct

    ps = [0.01, 0.02, 0.03, 0.04, 0.05]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(ps)],
                               "id int, p double")
    got = {r["id"]: r["p_adj"] for r in
           fdr_correct(df, "p", method="by").collect()}
    cm = sum(1.0 / i for i in range(1, 6))
    import math as _m

    expect = []
    run = _m.inf
    for i in sorted(range(5), reverse=True):
        run = min(run, 5 * cm * ps[i] / (i + 1))
        expect.append((i, min(run, 1.0)))
    for i, e in expect:
        assert got[i] == pytest.approx(round(e, 9), abs=1e-9)
    assert got[0] == pytest.approx(0.114166667, abs=1e-6)

    spread = spark.createDataFrame(
        [(i, ((i * 37) % 97) / 97.0 + 0.001) for i in range(200)],
        "id int, p double",
    )
    bh = {r["id"]: r["p_adj"] for r in
          fdr_correct(spread, "p", method="bh").collect()}
    by = {r["id"]: r["p_adj"] for r in
          fdr_correct(spread, "p", method="by").collect()}
    cm200 = sum(1.0 / i for i in range(1, 201))
    for i in bh:
        assert by[i] == pytest.approx(min(round(bh[i] * cm200, 6), 1.0),
                                      abs=1e-4)

    recut = {r["id"]: r["p_adj"] for r in
             fdr_correct(spread, "p", method="by",
                         ladder_cells=1, n_buckets=8).collect()}
    assert recut == by


def test_seasonal_mann_kendall_vs_replica_and_mk_identity(spark):
    """(a) One season == plain mann_kendall exactly; (b) a planted
    cross-season trend with an alternating cycle: seasonal MK sees the
    trend (within-season pairs all rise) while the replica confirms S
    and the summed variance."""
    from pandasvcf_spark.operators.stats import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    rows = [(0, float(t), float(v)) for t, v in
            [(1, 3), (2, 1), (3, 4), (4, 4), (5, 2)]]
    one = spark.createDataFrame(rows, "g int, t double, v double")
    smk = seasonal_mann_kendall(one, "g", "t", "v").collect()[0]
    mk = mann_kendall(one.drop("g"), "t", "v").collect()[0]
    assert (smk["s"], smk["var_s"], smk["z"]) == (
        mk["s"], mk["var_s"], mk["z"])
    assert smk["n_seasons"] == 1

    # 2 seasons x 6 periods: within each season v strictly rises ->
    # S = 2 * C(6,2) = 30; no ties -> Var = 2 * 6*5*17/18
    trend = [(g, float(t), float(10 * g + t)) for g in (0, 1)
             for t in range(6)]
    df = spark.createDataFrame(trend, "g int, t double, v double")
    out = seasonal_mann_kendall(df, "g", "t", "v").collect()[0]
    assert out["s"] == 30 and out["n"] == 12 and out["n_seasons"] == 2
    var = 2 * (6 * 5 * 17) / 18.0
    assert out["var_s"] == pytest.approx(round(var, 4))
    assert out["z"] == pytest.approx(round(29 / var ** 0.5, 6), abs=2e-6)


def test_ipw_ate_recovers_planted_effect(spark):
    """Confounded design: x drives BOTH treatment probability and the
    outcome; the naive difference-in-means is badly biased, IPW
    recovers the planted effect (+5). Deterministic assignment so the
    whole fixture replays."""
    from pandasvcf_spark.operators.stats import ipw_ate

    rows = []
    for i in range(400):
        x = float(i % 10)
        # treatment more likely at high x (deterministic "coin":
        # threshold varies with x)
        t = 1.0 if ((i * 7919) % 100) < 20 + 6 * x else 0.0
        y = 2.0 * x + 5.0 * t + ((i * 31) % 5) * 0.1  # effect = +5
        rows.append((t, y, x, float((i * 3) % 4)))
    df = spark.createDataFrame(rows, "t double, y double, x1 double, x2 double")
    out = ipw_ate(df, "t", "y", ["x1", "x2"], iters=3).collect()[0]
    assert out["n"] == 400

    naive = (
        sum(y for t, y, *_ in rows if t == 1.0)
        / sum(1 for t, *_ in rows if t == 1.0)
        - sum(y for t, y, *_ in rows if t == 0.0)
        / sum(1 for t, *_ in rows if t == 0.0)
    )
    assert naive - 5.0 > 1.5          # confounding bias is real
    assert abs(out["ate"] - 5.0) < 1.0  # IPW mostly removes it
    assert abs(out["ate"] - 5.0) < abs(naive - 5.0) / 2


def test_energy_distance_identities_and_replica(spark):
    """(a) identical samples -> D² = 0 exactly; (b) a planted location
    shift -> positive D² matching the pure-Python pairwise replica;
    (c) D² >= 0 always (Székely's theorem, spot-checked)."""
    from pandasvcf_spark.operators.stats import energy_distance_2samp

    same = spark.createDataFrame(
        [(g, float(v)) for g in (0, 1) for v in [1, 2, 2, 5, 9]],
        "g int, v double",
    )
    out = energy_distance_2samp(same, "g", "v").collect()[0]
    assert out["e_dist"] == 0.0 and out["t_stat"] == 0.0

    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0]
    ys = [4.0, 6.0, 6.0, 7.0, 9.0]
    df = spark.createDataFrame(
        [(0, v) for v in xs] + [(1, v) for v in ys], "g int, v double"
    )
    got = energy_distance_2samp(df, "g", "v").collect()[0]
    n, m = len(xs), len(ys)
    a = sum(abs(x - y) for x in xs for y in ys) / (n * m)
    bb = sum(abs(x1 - x2) for x1 in xs for x2 in xs) / (n * n)
    cc = sum(abs(y1 - y2) for y1 in ys for y2 in ys) / (m * m)
    d2 = 2 * a - bb - cc
    assert got["n1"] == n and got["n2"] == m
    assert got["e_dist"] == pytest.approx(round(d2, 6), abs=2e-6)
    assert got["t_stat"] == pytest.approx(
        round(n * m / (n + m) * d2, 6), abs=2e-6)
    assert got["e_dist"] > 0


def test_mmd_rbf_identities_and_replica(spark):
    """Identical samples -> MMD² = 0; shifted samples -> positive,
    matching the pure-Python kernel replica; sigma must be > 0."""
    import math as _m

    from pandasvcf_spark.operators.stats import mmd_rbf_2samp

    same = spark.createDataFrame(
        [(g, float(v)) for g in (0, 1) for v in [1, 2, 2, 7]],
        "g int, v double",
    )
    assert mmd_rbf_2samp(same, "g", "v", sigma=2.0).collect()[0]["mmd2"] == 0.0

    xs = [1.0, 2.0, 2.0, 3.0]
    ys = [6.0, 7.0, 9.0]
    df = spark.createDataFrame(
        [(0, v) for v in xs] + [(1, v) for v in ys], "g int, v double"
    )
    got = mmd_rbf_2samp(df, "g", "v", sigma=2.0).collect()[0]

    def k(x, y):
        return _m.exp(-((x - y) ** 2) / 8.0)

    n, m = len(xs), len(ys)
    mmd = (
        sum(k(a, b) for a in xs for b in xs) / (n * n)
        + sum(k(a, b) for a in ys for b in ys) / (m * m)
        - 2 * sum(k(a, b) for a in xs for b in ys) / (n * m)
    )
    assert got["mmd2"] == pytest.approx(round(mmd, 6), abs=2e-6)
    assert got["mmd2"] > 0.3

    with pytest.raises(ValueError, match="sigma"):
        mmd_rbf_2samp(df, "g", "v", sigma=0.0)


def test_breslow_day_vs_replica(spark):
    """Homogeneous strata (same OR) -> small X²; a flipped-OR stratum
    -> X² blows up; exact check vs a pure-Python replica of the
    quadratic + variance arithmetic."""
    import math as _m

    from pandasvcf_spark.operators.stats import breslow_day

    def mk(tables):
        rows = []
        for s, (a, b, c, d) in enumerate(tables):
            rows += [(f"s{s}", 1, 1)] * a + [(f"s{s}", 1, 0)] * b
            rows += [(f"s{s}", 0, 1)] * c + [(f"s{s}", 0, 0)] * d
        return spark.createDataFrame(rows, "st string, ex int, oc int")

    homo = [(20, 10, 10, 20), (40, 20, 20, 40), (10, 5, 5, 10)]
    het = [(20, 10, 10, 20), (10, 20, 20, 10), (10, 5, 5, 10)]
    out_h = breslow_day(mk(homo), "st", "ex", "oc").collect()[0]
    out_x = breslow_day(mk(het), "st", "ex", "oc").collect()[0]
    assert out_h["k"] == 3 and out_h["df"] == 2
    assert out_h["x2"] < 1e-6  # identical ORs: expected == observed
    assert out_x["x2"] > 10.0

    def replica(tables):
        num = sum(a * d / (a + b + c + d) for a, b, c, d in tables)
        den = sum(b * c / (a + b + c + d) for a, b, c, d in tables)
        orr = num / den
        x2 = 0.0
        for a, b, c, d in tables:
            n = a + b + c + d
            r1, c1 = a + b, a + c
            qa, qb, qc = (1 - orr), (n - r1 - c1) + orr * (r1 + c1), \
                -(orr * r1 * c1)
            if abs(qa) < 1e-12:
                ee = r1 * c1 / n
            else:
                disc = _m.sqrt(qb * qb - 4 * qa * qc)
                ee = (-qb + disc) / (2 * qa)
                if not (max(0.0, r1 + c1 - n) < ee < min(r1, c1)):
                    ee = (-qb - disc) / (2 * qa)
            v = 1 / ee + 1 / (r1 - ee) + 1 / (c1 - ee) \
                + 1 / (n - r1 - c1 + ee)
            x2 += (a - ee) ** 2 * v
        return orr, x2

    orr, x2 = replica(het)
    assert out_x["or_mh"] == pytest.approx(round(orr, 6), abs=2e-6)
    assert out_x["x2"] == pytest.approx(round(x2, 6), abs=2e-5)


def test_ece_and_fairness_hand_cases(spark):
    """ECE: perfectly calibrated bins -> 0; a fixed miscalibration ->
    the exact weighted gap. Fairness: a classifier that fires only for
    one group -> dp_gap 1; group with no positives excluded from the
    TPR extremes."""
    from pandasvcf_spark.operators.stats import ece_summary, fairness_report

    # bin 0: scores .05 x4, 1 positive -> fp .25, ms .05, gap .2
    # bin 9: scores .95 x6, 3 positives -> fp .5, ms .95, gap .45
    rows = [(0.05, 1)] + [(0.05, 0)] * 3 + [(0.95, 1)] * 3 + [(0.95, 0)] * 3
    df = spark.createDataFrame(rows, "s double, y int")
    out = ece_summary(df, "s", "y", n_bins=10).collect()[0]
    assert out["n"] == 10 and out["n_bins_used"] == 2
    ece = (4 * 0.2 + 6 * 0.45) / 10
    assert out["ece"] == pytest.approx(round(ece, 6))
    assert out["mce"] == pytest.approx(0.45)

    fair = spark.createDataFrame(
        # group a: preds fire on everything; group b: never
        [("a", 1, 1), ("a", 0, 1), ("b", 1, 0), ("b", 0, 0),
         ("c", 0, 1)],  # c has NO positives -> excluded from tpr gap
        "g string, y int, p int",
    )
    got = fairness_report(fair, "g", "y", "p").collect()[0]
    assert got["k"] == 3
    assert got["dp_gap"] == 1.0          # a fires 100%, b 0%
    assert got["tpr_gap"] == 1.0         # a tpr 1, b tpr 0, c excluded
    assert got["fpr_gap"] == 1.0


def test_kpss_vs_replica_and_regimes(spark):
    """Stationary (alternating) series -> small eta; a strong trend ->
    eta far above the 5% critical value 0.463; exact check vs a
    pure-Python replica of the Bartlett long-run variance and ladder."""
    from pandasvcf_spark.operators.stats import kpss_test

    def run(vals, lags=4):
        df = spark.createDataFrame(
            [(float(i), float(v)) for i, v in enumerate(vals)],
            "t double, v double",
        )
        return kpss_test(df, "t", "v", lags=lags).collect()[0]

    def replica(vals, lags=4):
        n = len(vals)
        m = sum(vals) / n
        e = [v - m for v in vals]
        S, run_s, ss = [], 0.0, 0.0
        for x in e:
            run_s += x
            S.append(run_s)
            ss += run_s * run_s
        s2 = 0.0
        for j in range(lags + 1):
            gj = sum(e[i] * e[i + j] for i in range(n - j)) / n
            s2 += gj if j == 0 else 2 * (1 - j / (lags + 1)) * gj
        return ss / (n * n * s2), s2

    # aperiodic hash noise (a periodic cycle's negative
    # autocovariances shrink the Bartlett s² and inflate eta — not
    # the KPSS null)
    stat = [((i * 2654435761) % 97) / 97.0 for i in range(40)]
    trend = [0.5 * i + ((i * 2654435761) % 97) / 97.0
             for i in range(40)]
    out_s, out_t = run(stat), run(trend)
    eta_s, s2_s = replica(stat)
    eta_t, _ = replica(trend)
    assert out_s["eta"] == pytest.approx(round(eta_s, 6), abs=2e-6)
    assert out_s["s2_l"] == pytest.approx(round(s2_s, 4), abs=2e-4)
    assert out_t["eta"] == pytest.approx(round(eta_t, 6), abs=2e-6)
    assert out_s["eta"] < 0.463 < out_t["eta"]


def test_adf_vs_replica_and_regimes(spark):
    """Mean-reverting noise -> strongly negative t (reject unit root);
    a random-walk-like cumulative series -> t near 0; exact check vs
    the closed-form OLS replica."""
    from pandasvcf_spark.operators.stats import adf_test

    noise = [((i * 2654435761) % 97) / 97.0 for i in range(50)]
    walk = []
    acc = 0.0
    for x in noise:
        acc += x - 0.5
        walk.append(acc)

    def run(vals):
        df = spark.createDataFrame(
            [(float(i), float(v)) for i, v in enumerate(vals)],
            "t double, v double",
        )
        return adf_test(df, "t", "v").collect()[0]

    def replica(vals):
        import math as _m

        xs = vals[:-1]
        ys = [b - a for a, b in zip(vals, vals[1:])]
        n = float(len(xs))
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        syy = sum(y * y for y in ys)
        det = n * sxx - sx * sx
        rho = (n * sxy - sx * sy) / det
        alpha = (sy - rho * sx) / n
        ssr = syy - alpha * sy - rho * sxy
        t = rho / _m.sqrt(ssr / (n - 2) * n / det)
        return rho, t

    got_n, got_w = run(noise), run(walk)
    rho_n, t_n = replica(noise)
    rho_w, t_w = replica(walk)
    assert got_n["rho"] == pytest.approx(round(rho_n, 6), abs=2e-6)
    assert got_n["t_stat"] == pytest.approx(round(t_n, 6), abs=2e-5)
    assert got_w["t_stat"] == pytest.approx(round(t_w, 6), abs=2e-5)
    assert got_n["t_stat"] < -2.86        # iid noise: no unit root
    assert got_w["t_stat"] > got_n["t_stat"]


def test_rake_weights_margins_converge(spark):
    """After 3 IPF rounds each row margin's weighted total is within
    0.1% of N/k_r and each column's of N/k_c; weights on an already-
    balanced grid are exactly 1."""
    from collections import defaultdict

    from pandasvcf_spark.operators.stats import rake_weights

    rows = (
        [("a", 0)] * 30 + [("a", 1)] * 10
        + [("b", 0)] * 5 + [("b", 1)] * 25
        + [("c", 0)] * 20 + [("c", 1)] * 10
    )
    df = spark.createDataFrame(rows, "r string, c int")
    out = rake_weights(df, "r", "c", iters=3).collect()
    n_total = len(rows)
    rm, cm = defaultdict(float), defaultdict(float)
    for row in out:
        rm[row["r"]] += row["weighted_n"]
        cm[row["c"]] += row["weighted_n"]
    # the column pass runs LAST, so its margins are exact (up to the
    # 4dp output rounding); the row margins carry one half-round of
    # residual — 3 IPF rounds land them within ~0.5% on this skew
    for v in rm.values():
        assert abs(v - n_total / 3) / (n_total / 3) < 5e-3
    for v in cm.values():
        assert abs(v - n_total / 2) / (n_total / 2) < 1e-3

    bal = spark.createDataFrame(
        [("x", 0)] * 10 + [("x", 1)] * 10 + [("y", 0)] * 10 + [("y", 1)] * 10,
        "r string, c int",
    )
    for row in rake_weights(bal, "r", "c", iters=2).collect():
        assert row["weight"] == 1.0


def test_series_guards_duplicate_times_and_ece_range(spark):
    """Round-13 ADVICE fixes: kpss_test / adf_test RAISE on duplicate
    timestamps (the docstring's claimed 'implicit raise' never
    existed — duplicates silently made positions order-dependent);
    seasonal_mann_kendall raises on duplicate (season, time) rows
    (no ties-in-time variance correction); ece_summary raises on
    scores outside [0, 1) (negative floor bins / last-bin clamp were
    silent). Valid inputs are unaffected."""
    from pandasvcf_spark.operators.stats import (
        adf_test,
        ece_summary,
        kpss_test,
        seasonal_mann_kendall,
    )

    dup = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 3.0), (2.0, 4.0), (3.0, 1.0)],
        "t double, v double",
    )
    for op in (kpss_test, adf_test):
        with pytest.raises(ValueError, match="duplicate"):
            op(dup, "t", "v")
    uniq = spark.createDataFrame(
        [(float(i), float((i * 7) % 5)) for i in range(30)],
        "t double, v double",
    )
    assert kpss_test(uniq, "t", "v").count() == 1
    assert adf_test(uniq, "t", "v").count() == 1

    smk_dup = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 1.0, 3.0), ("a", 2.0, 4.0),
         ("b", 1.0, 1.0)],
        "g string, t double, v double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        seasonal_mann_kendall(smk_dup, "g", "t", "v")
    smk_ok = spark.createDataFrame(
        [("a", float(t), float(t % 3)) for t in range(8)]
        + [("b", float(t), float((t * 2) % 5)) for t in range(8)],
        "g string, t double, v double",
    )
    assert seasonal_mann_kendall(smk_ok, "g", "t", "v").count() == 1

    bad_neg = spark.createDataFrame(
        [(-0.1, 0), (0.5, 1)], "s double, y int"
    )
    bad_hi = spark.createDataFrame(
        [(0.5, 0), (1.0001, 1)], "s double, y int"
    )
    for bad in (bad_neg, bad_hi):
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            ece_summary(bad, "s", "y")
    ok = spark.createDataFrame(
        [(0.0, 0), (0.5, 1), (0.999, 1)], "s double, y int"
    )
    assert ece_summary(ok, "s", "y").collect()[0]["n"] == 3
    # round-14 ADVICE: a score of EXACTLY 1.0 is a legitimate
    # probability endpoint (saturated sigmoid / perfect bin) — it must
    # be ACCEPTED and clamp into bin n_bins-1, not raise
    saturated = spark.createDataFrame(
        [(0.0, 0), (0.95, 1), (1.0, 1), (1.0, 1)], "s double, y int"
    )
    sat = ece_summary(saturated, "s", "y", n_bins=10).collect()[0]
    assert sat["n"] == 4
    # 1.0 scores share bin 9 with 0.95: avg_score (0.95+1+1)/3,
    # frac_pos 1.0 → bin-9 gap ≈ 0.0166667; bin-0 gap 0; weights 3/4
    assert sat["n_bins_used"] == 2
    assert abs(sat["ece"] - 0.0125) < 1e-6


def test_dml_ate_recovers_confounded_effect(spark):
    """Same confounded design as the IPW test: x drives treatment and
    outcome; naive diff-in-means is biased, the partialling-out theta
    recovers the planted +5 (linear nuisances ARE the truth here, so
    DML should nail it tighter than IPW)."""
    from pandasvcf_spark.operators.stats import dml_ate

    rows = []
    for i in range(400):
        x = float(i % 10)
        t = 1.0 if ((i * 7919) % 100) < 20 + 6 * x else 0.0
        y = 2.0 * x + 5.0 * t + ((i * 31) % 5) * 0.1
        rows.append((t, y, x, float((i * 3) % 4)))
    df = spark.createDataFrame(rows, "t double, y double, x1 double, x2 double")
    out = dml_ate(df, "t", "y", ["x1", "x2"]).collect()[0]
    assert out["n"] == 400
    assert abs(out["theta"] - 5.0) < 0.2   # linear truth: near-exact
    assert 0 < out["se"] < 0.5

    # numpy replica of the two closed-form fits + residual fold
    import numpy as np

    X = np.column_stack([np.ones(400), [r[2] for r in rows],
                         [r[3] for r in rows]])
    yv = np.array([r[1] for r in rows])
    tv = np.array([r[0] for r in rows])
    by = np.linalg.solve(X.T @ X, X.T @ yv)
    bt = np.linalg.solve(X.T @ X, X.T @ tv)
    ey, et = yv - X @ by, tv - X @ bt
    theta = (et @ ey) / (et @ et)
    # HC0 sandwich on the residualized moment (round-12 ADVICE: the
    # cross terms are included, not dropped)
    se = np.sqrt(np.sum(et * et * (ey - theta * et) ** 2)) / (et @ et)
    assert out["theta"] == pytest.approx(round(float(theta), 6), abs=2e-6)
    assert out["se"] == pytest.approx(round(float(se), 6), abs=2e-6)


def test_conformal_interval_guarantee_and_order_stat(spark):
    """Exact order-statistic check on a hand grid (n_cal = 9, α = 0.1
    -> k = 9 = max residual), plus the coverage guarantee on a larger
    exchangeable split (coverage >= 0.9 - slack) and the tiny-
    calibration infinite-interval path."""
    from pandasvcf_spark.operators.stats import conformal_interval

    # n_cal = 9, scores 1..9 (group 'a' mean = 5 over 9 symmetric ys)
    rows = [(True, "a", float(v)) for v in
            [0, 1, 2, 3, 5, 7, 8, 9, 10]]  # mean = 5
    rows += [(False, "a", 5.0 + d) for d in (0.5, 4.9, 5.1, -6.0)]
    df = spark.createDataFrame(rows, "cal boolean, g string, y double")
    out = conformal_interval(df, "cal", "g", "y", alpha=0.1).collect()[0]
    # k = ceil(10 * 0.9) = 9 -> qhat = 9th smallest |y-5| = 5.0
    assert out["n_cal"] == 9 and out["n_test"] == 4
    assert out["qhat"] == 5.0
    # test scores |y-5| = 0.5, 4.9, 5.1, 6.0 -> two of four <= 5.0
    assert out["coverage"] == 0.5

    big = spark.createDataFrame(
        [((i % 2 == 0), f"g{i % 5}",
          float((i * 2654435761) % 199) / 10.0) for i in range(600)],
        "cal boolean, g string, y double",
    )
    got = conformal_interval(big, "cal", "g", "y", alpha=0.1).collect()[0]
    assert got["coverage"] >= 0.85       # guarantee minus finite slack

    tiny = spark.createDataFrame(
        [(True, "a", 1.0), (False, "a", 99.0)],
        "cal boolean, g string, y double",
    )
    t = conformal_interval(tiny, "cal", "g", "y", alpha=0.1).collect()[0]
    assert t["qhat"] is None and t["coverage"] == 1.0


def test_best_split_finds_planted_threshold(spark):
    """Label = (score >= 7): the split at 7 is pure (gain = H(p));
    a label independent of score gives ~0 gain; ladder re-cut
    bit-identical; exact entropy replica."""
    import math as _m

    from pandasvcf_spark.operators.stats import best_split

    rows = [(float(i % 10), 1 if (i % 10) >= 7 else 0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = best_split(df, "s", "y").collect()[0]
    assert out["threshold"] == 7.0
    p = 0.3
    h = -(p * _m.log2(p) + (1 - p) * _m.log2(1 - p))
    assert out["gain"] == pytest.approx(round(h, 6), abs=2e-6)
    assert out["p_left"] == 1.0 and out["p_right"] == 0.0

    # block parity is independent of the digit (the i*7 % 2 version
    # equals i % 2 and hence the digit's parity — not independent!)
    indep = spark.createDataFrame(
        [(float(i % 10), (i // 10) % 2) for i in range(200)],
        "s double, y int",
    )
    out2 = best_split(indep, "s", "y").collect()[0]
    assert out2["gain"] < 0.02

    recut = best_split(df, "s", "y", ladder_cells=1,
                       n_buckets=4).collect()[0]
    assert tuple(recut) == tuple(out)


def test_mrr_eval_string_ids(spark):
    """The tie-break must work for NON-NUMERIC ids (review-caught: a
    negated-id struct max cast string ids to DOUBLE): equal scores ->
    the lexicographically smaller id wins rank 1."""
    from pandasvcf_spark.operators.stats import mrr_eval

    df = spark.createDataFrame(
        [
            (1, "doc-b", 0.9, True), (1, "doc-a", 0.9, False),
            (1, "doc-c", 0.1, False),
            # doc-a ties doc-b at 0.9 and sorts ahead -> rank 2
        ],
        "q int, id string, s double, rel boolean",
    )
    out = mrr_eval(df, "q", "id", "s", "rel", k=10).collect()[0]
    assert out["mrr"] == 0.5
    assert out["hit_rate_at_k"] == 1.0


def test_cooks_screen_flags_planted_outlier(spark):
    """A clean linear cloud plus one gross outlier: the outlier's D
    dominates and is flagged; the clean-only fit flags ~nothing.
    Exact check vs a numpy hat-matrix replica."""
    import numpy as np

    from pandasvcf_spark.operators.stats import cooks_screen

    clean = [(2.0 + 0.5 * (i % 20) + ((i * 7) % 5) * 0.05,
              float(i % 20), float((i * 3) % 4)) for i in range(100)]
    rows = clean + [(60.0, 19.0, 1.0)]  # gross y outlier at high x
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = cooks_screen(df, "y", ["x1", "x2"]).collect()[0]
    assert out["n"] == 101
    assert out["n_influential"] >= 1
    assert out["cut"] == pytest.approx(round(4.0 / 101, 8))

    X = np.column_stack([np.ones(101), [r[1] for r in rows],
                         [r[2] for r in rows]])
    yv = np.array([r[0] for r in rows])
    beta = np.linalg.solve(X.T @ X, X.T @ yv)
    e = yv - X @ beta
    inv = np.linalg.inv(X.T @ X)
    h = np.einsum("ij,jk,ik->i", X, inv, X)
    s2 = (e @ e) / (101 - 3)
    D = e * e * h / (3 * s2 * (1 - h) ** 2)
    assert out["max_d"] == pytest.approx(round(float(D.max()), 6),
                                         abs=2e-6)
    assert out["n_influential"] == int((D > 4.0 / 101).sum())
