"""Same-machine A/B bench of HEAD vs a git ref (round-13 verdict task 3).

Every round since r10, at least one committed bench delta has turned out
to be ambient machine state rather than code — each time adjudicated by
a judge rebuilding an interleaved A/B from scratch. This tool makes that
adjudication a COMMITTED ARTIFACT: it checks the ref out into a
throwaway worktree, runs the headline catalog roster in a FRESH PROCESS
per (tree, round) — interleaved, alternating order each round so a
load transient cannot systematically favor one tree — takes the
per-query min across rounds, and stamps both result dicts plus
per-query deltas into BENCH_LOCAL.json under ``ab_vs_<ref>``.
bench.py carries any ``ab_vs_*`` keys forward into its next full run,
so the round's BENCH_r{N}.json self-documents the A/B.

Usage: python tools/ab_bench.py <gitref> [--rounds 3] [--sf-dir DIR]

Reading the result: the queries' code is usually byte-identical between
trees — when |delta_total| is within the spread of the per-round totals
(printed per tree), the verdict field says "ambient"; a delta that
survives all rounds in one direction on changed code is real.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Executed in a FRESH python per (tree, round): times every headline
# catalog query min-of-2 in-process (sheds per-query codegen, keeps JVM
# warmup out of the min the same way bench.py does) and prints one JSON
# line. argv: <tree_root> <sf_dir>
_RUNNER = r"""
import json, sys, time
tree, sf_dir = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from pandasvcf_spark import get_spark
from pandasvcf_spark.queries import QUERIES
spark = get_spark(app_name="ab-bench")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()  # session warmup outside every timed region
per = {}
for name, spec in QUERIES.items():
    if not getattr(spec, "headline", False):
        continue
    times = []
    for _ in range(2):
        t0 = time.time()
        spec.fn(spark, sf_dir).count()
        times.append(time.time() - t0)
    per[name] = round(min(times), 3)
print(json.dumps({"queries": per, "total": round(sum(per.values()), 3)}))
"""


def _run_tree(tree: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    # check=False + explicit raise: with check=True a failing child
    # (ref tree missing a module, Spark startup error) surfaces as a
    # bare CalledProcessError with its stderr swallowed by
    # capture_output — adjudication failures must carry the child's
    # own message (round-14 ADVICE).
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, sf_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=tree,
    )
    if proc.returncode != 0:
        tail = "\n".join(proc.stderr.strip().splitlines()[-15:])
        raise RuntimeError(
            f"ab_bench runner failed in tree {tree} "
            f"(exit {proc.returncode}); child stderr tail:\n{tail}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


MIN_ROUNDS = 3  # spread from <3 rounds is too weak to gate a verdict


def ab_bench(ref: str, rounds: int = 3, sf_dir: str | None = None) -> dict:
    if rounds < MIN_ROUNDS:
        # round-14 verdict watch item: a 2-round spread estimate is too
        # weak for a committed adjudication — floor it, loudly.
        print(
            f"# ab_bench: --rounds {rounds} is below the committed-"
            f"artifact floor; running {MIN_ROUNDS} rounds instead",
            file=sys.stderr,
        )
        rounds = MIN_ROUNDS
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = tempfile.mkdtemp(prefix="ab_bench_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        trees = {"head": str(REPO), "ref": wt}
        runs: dict[str, list[dict]] = {"head": [], "ref": []}
        loads = []
        for r in range(rounds):
            # alternate order so a transient can't always hit one side
            order = ["head", "ref"] if r % 2 == 0 else ["ref", "head"]
            try:
                loads.append(round(os.getloadavg()[0], 1))
            except OSError:
                loads.append(None)
            for side in order:
                res = _run_tree(trees[side], sf_dir)
                runs[side].append(res)
                print(
                    f"# round {r + 1}/{rounds} {side}: "
                    f"total {res['total']:.2f}s",
                    file=sys.stderr,
                )
    finally:
        # never let a failed cleanup mask the original exception
        try:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=False, capture_output=True,
            )
        except OSError:
            pass

    def _agg(rs: list[dict]) -> dict:
        names = set()
        for r in rs:
            names |= set(r["queries"])
        per = {
            n: min(r["queries"][n] for r in rs if n in r["queries"])
            for n in sorted(names)
        }
        return {
            "queries": per,
            "total": round(sum(per.values()), 3),
            "round_totals": [r["total"] for r in rs],
        }

    a, b = _agg(runs["head"]), _agg(runs["ref"])
    shared = sorted(set(a["queries"]) & set(b["queries"]))
    deltas = {
        n: round(a["queries"][n] - b["queries"][n], 3) for n in shared
    }
    shared_head = sum(a["queries"][n] for n in shared)
    shared_ref = sum(b["queries"][n] for n in shared)
    delta_total = round(shared_head - shared_ref, 3)
    # noise band: the spread of each tree's own per-round totals — a
    # cross-tree delta inside the larger spread is machine, not code
    spread = max(
        max(t["round_totals"]) - min(t["round_totals"]) for t in (a, b)
    )
    verdict = (
        "ambient (|delta| within per-round spread)"
        if abs(delta_total) <= spread
        else ("head slower" if delta_total > 0 else "head faster")
    )
    result = {
        "ref": ref,
        "head": head,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "loadavg_per_round_1m": loads,
        "head_result": a,
        "ref_result": b,
        "delta_per_query": deltas,
        "delta_total_shared": delta_total,
        "shared_total_head": round(shared_head, 3),
        "shared_total_ref": round(shared_ref, 3),
        "round_spread_max": round(spread, 3),
        "verdict": verdict,
    }
    local = REPO / "BENCH_LOCAL.json"
    try:
        doc = json.loads(local.read_text()) if local.exists() else {}
    except (OSError, ValueError):
        doc = {}
    doc[f"ab_vs_{ref}"] = result
    local.write_text(json.dumps(doc, indent=1) + "\n")
    print(
        f"# ab_vs_{ref}: head {shared_head:.2f}s vs ref {shared_ref:.2f}s "
        f"(delta {delta_total:+.2f}s, spread {spread:.2f}s) -> {verdict}; "
        f"stamped into {local}",
        file=sys.stderr,
    )
    print(json.dumps({"ab_vs_" + ref: {
        "delta_total_shared": delta_total,
        "round_spread_max": round(spread, 3),
        "verdict": verdict,
    }}))
    return result


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(2)
    ref = args[0]
    rounds = 3
    sf_dir = None
    if "--rounds" in args:
        rounds = int(args[args.index("--rounds") + 1])
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    ab_bench(ref, rounds=rounds, sf_dir=sf_dir)


if __name__ == "__main__":
    main()
