"""Optimization probe (rounds 15/16): isolated per-query timing + plan
capture.

For each named catalog query, prints min-of-N wall (bench methodology:
`df.count()`) AND a noop-sink wall (guide §1.4: computes every column of
every row without the count()-path column pruning), and writes
`.explain('formatted')` to plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt
(default r16) so plan claims in OPTIMIZATION_r*.md are checkable without
running Spark.

Usage: python tools/perf_probe.py <tag> [query ...]
       (no queries -> the headline roster)
"""

from __future__ import annotations

import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pandasvcf_spark import get_spark  # noqa: E402
from pandasvcf_spark.queries import QUERIES  # noqa: E402

PLANS = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
)


def probe(spark, name, fn, sf_dir, tag, runs=3):
    PLANS.mkdir(parents=True, exist_ok=True)
    spark.sparkContext.setJobDescription(f"probe:{name}")
    df = fn(spark, sf_dir)
    with open(PLANS / f"{name}_{tag}.txt", "w") as fh, redirect_stdout(fh):
        df.explain("formatted")
    counts, noops = [], []
    for _ in range(runs):
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        counts.append(time.time() - t0)
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noops.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    print(
        f"{name:28s} count {min(counts):6.2f}s {[round(t, 2) for t in counts]}"
        f"  noop {min(noops):6.2f}s {[round(t, 2) for t in noops]}  rows={n}"
    )
    return min(counts), min(noops)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        names = [n for n, s in QUERIES.items() if s.headline]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # session warmup
    try:
        la = os.getloadavg()
        print(f"# loadavg at start: {la[0]:.1f} {la[1]:.1f}")
    except OSError:
        pass
    for name in names:
        probe(spark, name, QUERIES[name].fn, sf_dir, tag)


if __name__ == "__main__":
    main()
