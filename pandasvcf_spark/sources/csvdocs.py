"""CSV/TSV document ingest — the third corpus wire format next to parquet
and JSONL (`sources/jsonl.py`), with the same scale rules:

  * schema REQUIRED (CSV inference is an extra full pass over the data,
    and silently types everything it guesses);
  * malformed rows never abort: PERMISSIVE corrupt-record column under
    'keep', DROPMALFORMED under 'drop', FAILFAST under 'fail' — identical
    policy surface to `read_jsonl` so pipelines switch formats without
    relearning semantics;
  * multiLine OFF by default: a quoted newline inside a field makes the
    file non-splittable (one task per file instead of per block) — the
    100 TB trap; enable it only for sources that genuinely embed
    newlines, and re-shard those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandasvcf_spark.sources.jsonl import DOCUMENTS_DDL, _CORRUPT, _MODES


def read_csv_docs(
    spark: SparkSession,
    path: str | list[str],
    schema: str = DOCUMENTS_DDL,
    sep: str = ",",
    header: bool = True,
    bad_records: str = "keep",
    multi_line: bool = False,
) -> DataFrame:
    """Distributed CSV/TSV scan with an explicit schema and the jsonl
    corrupt-line policy surface. `sep='\\t'` reads TSV. Returns the
    schema's columns (+ `corrupt` under 'keep') — the same shape
    `jsonl_corrupt_stats` audits.

    Gotcha (Spark CSV semantics, worth knowing before trusting counts):
    malformed-row detection only happens for COLUMNS THE QUERY READS —
    under 'drop', a bare `df.count()` prunes every column, parses
    nothing, and counts rows that a full-row read would have dropped.
    Gate on counts only after referencing the columns you care about
    (or use 'keep' and filter `corrupt IS NULL`, which is also the only
    mode that lets you audit what was bad)."""
    if bad_records not in _MODES:
        raise ValueError(
            f"bad_records must be one of {sorted(_MODES)}, got {bad_records!r}"
        )
    reader = (
        spark.read.schema(
            schema + (f", {_CORRUPT} STRING" if bad_records == "keep" else "")
        )
        .option("mode", _MODES[bad_records])
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("multiLine", str(multi_line).lower())
        # quoted fields (embedded separators/quotes) per RFC 4180
        .option("quote", '"')
        .option("escape", '"')
    )
    df = reader.csv(path)
    if bad_records == "keep":
        df = df.withColumnRenamed(_CORRUPT, "corrupt")
    return df
