"""Query catalog registry.

Every implemented operator from SURVEY.md §2 (plus the §2.11 extension
surface) declares a catalog entry: a Spark query callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables. The driver
hash-compares the two at sf0.01 — this registry IS the correctness gate.

Exactness rules every entry follows (so value-hashes match bit-for-bit):
  * every computed column is aliased identically on both sides;
  * float aggregates are rounded (sums → 2dp, ratios/avgs → 4-6dp) on BOTH
    sides — double accumulation order across engines differs at ~1e-13
    relative, rounding absorbs it;
  * timestamps never appear raw in output — epoch-second BIGINTs or
    formatted strings only (engine-native timestamp canonicalization is not
    comparable);
  * top-k / limit queries use a total order (explicit tie-break columns);
  * integer aggregates are cast to BIGINT on both sides (DuckDB SUM(int)
    returns HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    headline: bool = False  # included in bench.py


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn):
        # Duplicate names are a silent-override foot-gun: the second
        # registration would shadow the first AND inherit its driver-
        # window slot (round 13 caught a collision exactly this way —
        # a new v_silhouette silently lost to an existing one defined
        # later in import order). Fail loudly instead.
        if name in QUERIES:
            raise ValueError(
                f"catalog query {name!r} is already registered "
                f"(by {QUERIES[name].fn.__module__}."
                f"{QUERIES[name].fn.__qualname__}); pick a new name"
            )
        QUERIES[name] = QuerySpec(fn, oracle, headline)
        return fn

    return deco
