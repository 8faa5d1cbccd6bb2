"""Scaling-behavior probe: run the heavy catalog operators at every
available scale factor and report per-SF wall time plus the effective
scaling exponent between adjacent SFs (time ratio / data ratio on a log
scale — 1.0 = perfectly linear in data, <1 = fixed-cost bound at this
size, >1 = super-linear and a scale risk).

This is the measured form of the 100×-scale question the plan audits
answer analytically: an operator whose exponent trends ≤1 as the data
grows is shuffle/scan bound (scales with a cluster); an exponent >1
flags quadratic term leakage (bucket blowup, inlined expression trees,
window skew).

Usage: python tools/scaling_probe.py [query ...]   (default: heavy set)
Prints one line per (query, sf) and a summary table; exits non-zero if
any adjacent-SF exponent exceeds ALERT (default 1.3 — n log n with
constants lands ~1.1).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pandasvcf_spark import get_spark  # noqa: E402
from pandasvcf_spark.queries import QUERIES  # noqa: E402

SFS = [0.001, 0.01, 0.1]
HEAVY = [
    "dedup_minhash_lsh",
    "dedup_exact",
    "flagship_annotate",
    "f4_zygosity",
    "v_ann_topk",
    "v_cosine_topk_manyquery",
    "j_asof_events",
    "t_pack_sequences",
    "t_contamination",
    "dedup_near_pipeline",
    "t_repetition_stats",
]
ALERT = 1.3


def main() -> int:
    import math

    names = sys.argv[1:] or HEAVY
    spark = get_spark(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    times: dict[str, dict[float, float]] = {}
    for name in names:
        spec = QUERIES[name]
        times[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best, rows = float("inf"), 0
            for _ in range(2):  # min-of-2: first run pays codegen
                t0 = time.time()
                rows = spec.fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            times[name][sf] = best
            print(f"{name:26s} sf{sf:<6} {best:7.2f}s  {rows} rows", flush=True)

    print(f"\n{'query':26s}" + "".join(f"  sf{a}->sf{b}" for a, b in zip(SFS, SFS[1:])))
    worst = 0.0
    for name in names:
        exps = []
        for a, b in zip(SFS, SFS[1:]):
            ta, tb = times[name][a], times[name][b]
            # guard: at fixture scale small-SF runs are fixed-cost bound;
            # an exponent only means something when both sides exceed it
            exp = math.log(tb / ta) / math.log(b / a) if ta > 0 else 0.0
            exps.append(exp)
            worst = max(worst, exp)
        print(f"{name:26s}" + "".join(f"  {e:10.2f}" for e in exps))
    print(
        f"\nworst adjacent-SF exponent: {worst:.2f} "
        f"({'OK' if worst <= ALERT else 'ALERT'} at threshold {ALERT}; "
        "1.0 = linear, <1 = fixed-cost bound)"
    )
    return 0 if worst <= ALERT else 1


if __name__ == "__main__":
    raise SystemExit(main())
