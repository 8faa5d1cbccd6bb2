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

Usage: python tools/check_contract.py [--changed-since GITREF]
       [sf_dir] [query ...]

--changed-since GITREF restricts the run to the catalog subset the
git diff against GITREF can affect (see `changed_queries` — biased
safe: shared-surface changes fall back to the full catalog), keeping
the per-commit loop fast as the catalog grows.
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
    debt = driver_debt()
    out(
        f"driver-debt: {debt['never_driver_checked']} of "
        f"{debt['catalog']} catalog entries never driver-hash-checked "
        f"({debt['driver_checked_ever']} ever green in a driver window)"
    )
    return failures


def driver_debt() -> dict:
    """The rotation-debt number, COMPUTED instead of asserted in prose
    (round-14 verdict task 7 for round 15): catalog entries that have
    never had a driver-green hash row = registered catalog minus the
    union of every CORRECTNESS_r*.json key set (plus WINDOW_HISTORY's
    pre-r14 driver_green_ever list, which summarizes rounds whose
    artifacts predate it). Returned dict carries the names so the
    window re-cut can promote oldest-first."""
    import glob  # noqa: F401  (documented dependency of the pattern)
    import json

    repo = Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    wh = repo / "WINDOW_HISTORY.json"
    if wh.exists():
        try:
            doc = json.loads(wh.read_text())
            for k, v in doc.items():
                if k.startswith("driver_green_ever") and isinstance(v, list):
                    seen |= set(v)
        except (OSError, ValueError):
            pass
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        try:
            seen |= set(json.loads(f.read_text()).keys())
        except (OSError, ValueError):
            continue
    names = list(entrymod.queries())
    never = [n for n in names if n not in seen]
    return {
        "catalog": len(names),
        "driver_checked_ever": len(names) - len(never),
        "never_driver_checked": len(never),
        "never": never,
    }


def changed_queries(
    ref: str | None = None, names: list[str] | None = None
) -> set[str] | None:
    """Map `git diff --name-only <ref>` onto the catalog subset it can
    affect (the round-12 verdict's --changed-since ask: the full
    383-entry contract is ~20 min local; the per-commit loop should
    only pay for what the diff touches). Heuristic, biased SAFE:

      * a changed `queries/<mod>.py` selects every entry whose
        function is defined in that module;
      * a changed operator/function/streaming module selects every
        entry whose function SOURCE references it (catalog entries
        import operators inside their bodies, so
        `operators.similarity` appears verbatim) — after expanding
        the changed set through module-to-module imports (relational
        imports stats._ladder, etc.) to a transitive closure;
      * any OTHER changed file under pandasvcf_spark/ (registry,
        tables, plans, sources, package __init__s) is shared surface:
        returns None = run everything;
      * changes outside pandasvcf_spark/ (tests, tools, docs) select
        nothing.

    Pass `names` (repo-relative paths) to skip the git call — the
    pytest seam.
    """
    import inspect
    import subprocess

    if names is None:
        names = subprocess.run(
            ["git", "diff", "--name-only", ref, "--", "*.py"],
            cwd=Path(__file__).resolve().parent.parent,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    pkg = "pandasvcf_spark/"
    qmods: set[str] = set()
    opmods: set[str] = set()
    for nm in names:
        if not nm.startswith(pkg):
            continue
        rel = Path(nm).with_suffix("")
        parts = rel.parts[1:]
        if len(parts) >= 2 and parts[0] == "queries":
            if parts[1] == "__init__":
                return None  # registration order is shared surface
            qmods.add(".".join(["pandasvcf_spark", *parts]))
        elif parts[0] in ("operators", "functions", "streaming"):
            stem = parts[-1]
            if stem == "__init__":
                return None
            opmods.add("/".join(parts))
        else:
            return None  # shared surface — run the full catalog
    # transitive closure over module-to-module imports: a query that
    # references operators.relational must rerun when stats/_ladder
    # changes, because relational imports it
    root = Path(__file__).resolve().parent.parent / "pandasvcf_spark"
    texts = {
        str(f.relative_to(root).with_suffix("")): f.read_text()
        for sub in ("operators", "functions", "streaming")
        if (root / sub).exists()
        for f in (root / sub).rglob("*.py")
    }
    grew = True
    while grew:
        grew = False
        for mod, text in texts.items():
            if mod in opmods:
                continue
            for changed in list(opmods):
                token = changed.replace("/", ".")
                short = ".".join(token.split(".")[-2:])
                if token in text or f"from .{Path(changed).name} " in (
                    text
                ) or short in text:
                    opmods.add(mod)
                    grew = True
                    break
    # a query importing `from ...operators.stats import fdr_correct`
    # goes through the PACKAGE re-export, never naming the submodule —
    # so a nested changed module also matches on its package path
    # (safe over-selection: any stats-importing query reruns when any
    # stats submodule changes)
    tokens: set[str] = set()
    for mod in opmods:
        parts = mod.split("/")
        tokens.add(".".join(parts))
        if len(parts) >= 3:
            tokens.add(".".join(parts[:-1]))
    # query modules also import operators at MODULE scope
    # (`from pandasvcf_spark.operators.relational import rank_per_group`
    # at the top of relational_q) — a function body then says only
    # `rank_per_group(...)`, which the per-function token scan cannot
    # see (round-14 ADVICE: --changed-since silently skipped
    # w_rank_topk et al. on an operators/relational.py diff). Parse
    # each query module's top-level ImportFrom statements and map the
    # names imported FROM a changed module; a function whose source
    # uses one of those names is selected. A module we cannot parse
    # selects all of its entries (biased safe).
    import ast
    import re

    def _changed_import_names(qmod: str) -> set[str] | None:
        """Names the query module imports at top level from changed
        operator modules; None = could not inspect (select all)."""
        m = sys.modules.get(qmod)
        if m is None:
            return None
        try:
            tree = ast.parse(inspect.getsource(m))
        except (OSError, SyntaxError, TypeError):
            return None
        hit: set[str] = set()
        for node in tree.body:
            if not isinstance(node, ast.ImportFrom) or not node.module:
                continue
            rel = node.module
            if rel.startswith("pandasvcf_spark."):
                rel = rel[len("pandasvcf_spark."):]
            if node.level:  # relative import — be safe, select all
                return None
            if any(rel == t or rel.startswith(t + ".") for t in tokens):
                hit.update(a.asname or a.name for a in node.names)
        return hit

    mod_names: dict[str, set[str] | None] = {}
    sel: set[str] = set()
    for name, fn in entrymod.queries().items():
        fmod = getattr(fn, "__module__", "")
        if fmod in qmods:
            sel.add(name)
            continue
        try:
            src = inspect.getsource(fn)
        except OSError:
            sel.add(name)  # can't inspect — be safe
            continue
        if any(tok in src for tok in tokens):
            sel.add(name)
            continue
        if fmod not in mod_names:
            mod_names[fmod] = _changed_import_names(fmod)
        names_hit = mod_names[fmod]
        if names_hit is None:
            sel.add(name)  # unparseable module — be safe
        elif any(
            re.search(rf"\b{re.escape(n)}\b", src) for n in names_hit
        ):
            sel.add(name)
    return sel


def main():
    args = list(sys.argv[1:])
    since = None
    if "--changed-since" in args:
        i = args.index("--changed-since")
        since = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]
    if since is not None:
        sel = changed_queries(since)
        if sel is None:
            print(f"# --changed-since {since}: shared surface changed — "
                  "running the FULL catalog")
            only = []
        elif not sel:
            print(f"# --changed-since {since}: no catalog-affecting "
                  "changes — nothing to run")
            return
        else:
            print(f"# --changed-since {since}: {len(sel)} affected "
                  f"entries: {' '.join(sorted(sel))}")
            only = sorted(set(only) | sel) if only else sorted(sel)
    failures = run_contract(sf_dir, only=only)
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
