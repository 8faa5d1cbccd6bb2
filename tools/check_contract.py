"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir on Spark AND
its oracle_sql() twin on DuckDB, then compares row count, sorted column
names, exact sorted values, AND result-type signatures.  The value compare
canonicalizes through Python objects (`repr(round(v, 9))`), which by
construction cannot see an integer-width divergence — a DuckDB HUGEINT and
a Spark BIGINT fetch as the same Python int.  The driver's hash IS
type-aware (round 6's `g_sample_qc` escaped exactly this way), so the type
check below enforces the repo convention from `queries/registry.py`:
DuckDB sums must be BIGINT-cast (HUGEINT never matches any Spark type) and
each column's type class (int/float/string/bool/date/timestamp/array<...>)
must agree between the oracle and the Spark schema.

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


def _duck_class(t):
    """Type class of a DuckDB logical type (str(DuckDBPyType))."""
    s = str(t).upper()
    if s == "HUGEINT":
        # Never matches: the repo convention is CAST(sum(...) AS BIGINT).
        return "hugeint(cast-to-BIGINT per registry convention)"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal(round/cast to DOUBLE per registry convention)"
    if s == "VARCHAR":
        return "string"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]"):
        return "array<%s>" % _duck_class(s[:-2])
    return s.lower()


def _spark_class(dt):
    """Type class of a Spark DataType, aligned with _duck_class."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "boolean":
        return "bool"
    if s.startswith("decimal"):
        return "decimal-spark"
    if s.startswith("array<"):
        inner = s[len("array<"):-1]
        for a, b in (("tinyint", "int"), ("smallint", "int"),
                     ("bigint", "int"), ("double", "float")):
            if inner == a:
                inner = b
        return "array<%s>" % inner
    return s


def type_problems(sdf, dcols, dtypes):
    """Compare DuckDB result types against the Spark schema by column name
    under the registry's cast conventions; returns problem strings."""
    sparkt = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    problems = []
    for col, dt in zip(dcols, dtypes):
        if col not in sparkt:
            continue  # name mismatch is reported by the column check
        dc = _duck_class(dt)
        if dc != sparkt[col]:
            problems.append(
                f"type[{col}] duckdb {str(dt)}({dc}) != spark {sparkt[col]}"
            )
    return problems


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
            dcols = list(cur.columns)
            dtypes = list(cur.types)
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            out(f"FAIL  {name:24s} duckdb error: {str(e).splitlines()[0][:160]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        problems += type_problems(sdf, dcols, dtypes)
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
