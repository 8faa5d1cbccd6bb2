"""Pin tools/check_contract.py's --changed-since mapping (round-13
verdict task 7): the diff→catalog-subset heuristic must stay biased
SAFE — shared-surface changes run everything, out-of-package changes
run nothing, operator changes reach their consumers through the
module-import closure."""

import importlib.util
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "check_contract",
    Path(__file__).resolve().parent.parent / "tools" / "check_contract.py",
)
cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cc)


def test_outside_package_selects_nothing():
    assert cc.changed_queries(names=["tools/check_contract.py"]) == set()
    assert cc.changed_queries(names=["tests/test_stats.py", "README.md"]) == set()


def test_shared_surface_runs_full():
    assert cc.changed_queries(
        names=["pandasvcf_spark/queries/__init__.py"]
    ) is None
    assert cc.changed_queries(
        names=["pandasvcf_spark/plans/session.py"]
    ) is None
    assert cc.changed_queries(
        names=["pandasvcf_spark/sources/vcf.py"]
    ) is None
    assert cc.changed_queries(
        names=["pandasvcf_spark/operators/__init__.py"]
    ) is None


def test_query_module_selects_its_entries():
    sel = cc.changed_queries(names=["pandasvcf_spark/queries/vectors_q.py"])
    assert sel is not None
    assert "v_semdedup" in sel and "v_ivfpq_topk" in sel
    assert "agg_tpch_q1" not in sel


def test_operator_closure_reaches_consumers():
    # _ladder is imported by causal_survival (fdr) and relational
    # (pareto) — the closure must pull both families in
    sel = cc.changed_queries(
        names=["pandasvcf_spark/operators/stats/_ladder.py"]
    )
    assert sel is not None
    assert "m_fdr_bh" in sel and "w_pareto_front" in sel
    # a leaf operator module selects its own consumers
    sel2 = cc.changed_queries(
        names=["pandasvcf_spark/operators/similarity.py"]
    )
    assert sel2 is not None and "v_semdedup" in sel2
    assert "agg_tpch_q1" not in sel2


def test_module_scope_imports_select_consumers():
    # round-14 ADVICE: query modules import operators at MODULE scope
    # (relational_q: rank_per_group/running_agg/topk/anti_join/
    # semi_join/join_dim; events_q: rank_per_group; genomics_q:
    # dedup_annotate_join) — a function body then uses only the bare
    # name, invisible to the per-function token scan. These entries
    # MUST be selected on an operators/relational.py diff.
    sel = cc.changed_queries(
        names=["pandasvcf_spark/operators/relational.py"]
    )
    assert sel is not None
    for q in (
        "w_rank_topk", "w_row_number_first", "w_running_sum",
        "j_semi", "j_anti", "j_inner_broadcast", "j_multiway_q5",
        "r2_pivot", "j1_dedup_annotate",
    ):
        assert q in sel, q
    # and the selection stays a SUBSET — entries with no relational
    # dependency anywhere must not be dragged in
    assert "sk_hll_distinct" not in sel
    assert "f2f3_gt_parse" not in sel
