"""The bench's stdout line is the driver contract: ONE JSON line with
`queries` present, under the driver's 2,000-char capture. Round 16
pinned this after a carried watchlist_* dict inflated the inline ladder
past its last resort, which shed `queries` (caught locally before any
driver run saw it). The ladder is now a pure function; these tests feed
it adversarially fat result dicts."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import compact_stdout_line  # noqa: E402


def _base_result():
    return {
        "metric": "catalog_total_wall",
        "value": 9.5,
        "unit": "sec",
        "queries": {f"q_{i:02d}": round(0.1 * i, 3) for i in range(13)},
        "sf": 0.1,
        "master": "local[32]",
        "default_parallelism": 32,
        "cpus_env": "32",
    }


def test_plain_result_passes_through():
    line = compact_stdout_line(_base_result())
    d = json.loads(line)
    assert len(line) <= 1900
    assert d["queries"] and d["metric"] == "catalog_total_wall"


def test_fat_result_never_sheds_queries():
    r = _base_result()
    # the round-16 near-miss, exaggerated: long watchlist prose, four
    # A/B stamps with full per-query tables, probe curves, telemetry
    r["watchlist_r16"] = {"note": "x" * 2000, "k1": 1.0, "k2": 2.0}
    for i in range(4):
        r[f"ab_vs_ref{i}"] = {
            "delta_total_shared": 0.1,
            "round_spread_max": 2.0,
            "verdict": "ambient (|delta| within per-round spread)",
            "head_result": {"queries": {f"q{j}": 0.5 for j in range(12)}},
            "ref_result": {"queries": {f"q{j}": 0.5 for j in range(12)}},
        }
    r["ivfpq_mp_probe_curve"] = {str(p): {"sec": 1.0, "recall": 0.9}
                                 for p in (1, 2, 4, 8, 16, 32)}
    r["imi_opq_probe_curve"] = {str(p): {"sec": 1.0, "recall": 0.9}
                                for p in (1, 2, 4, 8, 16, 32)}
    for i in range(40):
        r[f"telemetry_key_number_{i:02d}_sec"] = round(1.234 + i, 3)
    r["ambient_load_note"] = "y" * 300
    line = compact_stdout_line(r)
    d = json.loads(line)
    assert len(line) <= 1900, len(line)
    assert d.get("queries") == _base_result()["queries"]
    # watchlist prose must never reach stdout
    assert "watchlist_r16" not in d


def test_real_committed_dict_keeps_queries():
    """The actual BENCH_LOCAL.json (when present) must compact to a
    contract-valid line — the exact shape the driver will see."""
    p = Path(__file__).resolve().parent.parent / "BENCH_LOCAL.json"
    if not p.exists():
        return
    r = json.loads(p.read_text())
    if "queries" not in r:
        return
    line = compact_stdout_line(r)
    d = json.loads(line)
    assert len(line) <= 1900, len(line)
    assert d.get("queries"), "queries shed from the real bench dict"
