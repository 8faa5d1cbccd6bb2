"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir on Spark AND
its oracle_sql() twin on DuckDB, then compares row count, sorted column
names, and exact sorted values (stricter than any hash the driver could
use — if this passes, any canonicalization matches).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from pandasvcf_spark import get_spark


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def run_contract(sf_dir, only=None, spark=None, out=print):
    """Run every catalog entry vs its DuckDB oracle; returns the list of
    failing entry names (importable — the pytest contract guard calls this
    with the suite's shared session)."""
    only = set(only or ())
    if spark is None:
        spark = get_spark(app_name="contract-check")
        spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            out(f"FAIL  {name:24s} spark error: {str(e).splitlines()[0][:160]}")
            continue
        if name not in oracles:
            out(f"weak  {name:24s} rows={len(srows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.sql(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            out(f"FAIL  {name:24s} duckdb error: {str(e).splitlines()[0][:160]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        if not problems:
            sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
            if sk != dk:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(sk, dk)) if a != b), None
                )
                problems.append(
                    f"values differ at sorted row {diff}: "
                    f"spark={sk[diff] if diff is not None else '?'} "
                    f"duck={dk[diff] if diff is not None else '?'}"
                )
        if problems:
            failures.append(name)
            out(f"FAIL  {name:24s} {'; '.join(problems)[:300]}")
        else:
            out(f"ok    {name:24s} rows={len(srows)} [{time.time()-t0:.1f}s]")

    n_run = len([n for n in qs if not only or n in only])
    out(f"\n{n_run - len(failures)}/{n_run} green" + (" (subset)" if only else ""))
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = run_contract(sf_dir, only=sys.argv[2:])
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
