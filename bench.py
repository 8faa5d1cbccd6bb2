"""Benchmark harness (driver contract: prints ONE JSON line).

Runs the headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the VCF flagship
pipeline on the reference 1000G fixture so the genotypes/s headline is
tracked against BASELINE.md (~244k/s reference) every round.

Output: {"metric": "catalog_total_wall", "value": <sec>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": <sf>,
         "duckdb": {name: sec, ...}, "duckdb_total_wall": <sec>,
         "vcf_genotypes_per_sec": <rate>}

The DuckDB column runs the same headline queries' oracle SQL on the same
parquet — a single-node columnar anchor for the per-query numbers (the
reference has no numbers on these tables; BASELINE.md's comparable metric
is vcf_genotypes_per_sec).

Set SPARK_GRAFT_BENCH_VCF=0 to skip the VCF fixture stage,
SPARK_GRAFT_BENCH_DUCKDB=0 to skip the DuckDB anchor.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pandasvcf_spark import get_spark  # noqa: E402
from pandasvcf_spark.queries import QUERIES  # noqa: E402

KG_VCF = (
    "/root/reference/test_data/"
    "ALL.chr22.phase3_shapeit2_mvncall_integrated_v4.20130502.genotypes_10k.vcf.gz"
)
KG_GENOTYPES = 9_755 * 2_504


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    spark = get_spark(app_name="pandasvcf-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session with one tiny action so the first timed query
    # doesn't pay session startup.
    spark.range(1).count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name, spec in QUERIES.items():
        if not spec.headline:
            continue
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        per_query[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)

    result = {
        "metric": "catalog_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB", "1") != "0":
        import duckdb

        con = duckdb.connect()
        for name in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        # near-dup oracles verify with an all-pairs N^2 SQL — a correctness
        # cross-check, not a comparable engine path (DuckDB has no LSH);
        # at sf0.1 it runs for minutes, so it stays out of the anchor.
        skip_anchor = {"dedup_minhash_lsh"}
        duck: dict[str, float] = {}
        dtotal = 0.0
        for name, spec in QUERIES.items():
            if not spec.headline or spec.oracle is None or name in skip_anchor:
                continue
            t0 = time.time()
            con.sql(spec.oracle).fetchall()
            dt = time.time() - t0
            duck[name] = round(dt, 3)
            dtotal += dt
        result["duckdb"] = duck
        result["duckdb_total_wall"] = round(dtotal, 3)

    if os.environ.get("SPARK_GRAFT_BENCH_VCF", "1") != "0" and os.path.exists(KG_VCF):
        from pandasvcf_spark.operators import annotate_vcf

        t0 = time.time()
        n = annotate_vcf(spark, KG_VCF, drop_hom_ref=True).count()
        dt = time.time() - t0
        result["vcf_genotypes_per_sec"] = round(KG_GENOTYPES / dt)
        result["vcf_wall_sec"] = round(dt, 3)
        print(f"# vcf flagship: {dt:.2f}s, {n} rows", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
