"""JSONL (newline-delimited JSON) document ingest — the wire format LLM
training corpora actually arrive in (one JSON object per line, usually
gzip/zstd-compressed shards).

Beyond-reference extension surface: the reference reads VCF only; a
training-data pipeline's text side starts here. Built directly on Spark's
distributed json source with the scale traps closed:

  * **Schema is REQUIRED.** `spark.read.json` without a schema runs a
    full inference pass over every byte before the real scan — at 100 TB
    that silently doubles the job. Callers pass the DDL they expect;
    `DOCUMENTS_DDL` matches the engine's `documents` table so JSONL shards
    drop straight into every text/dedup operator.
  * **Malformed lines never abort the job.** PERMISSIVE mode routes bad
    lines into a `_corrupt_record` column; `bad_records` controls the
    policy — 'keep' (default: corrupt text kept for audit), 'drop'
    (DROPMALFORMED), or 'fail' (FAILFAST, for inputs that are contractually
    clean). One malformed line in a billion must be a counter, not a stack
    trace.
  * **Compression is free.** .gz/.bz2/.zst shards decompress per-file in
    the scan; since corpora ship as many shards, file-level parallelism is
    already there (a SINGLE giant .gz is the pathological case — same
    story as the VCF source, which solves it with BGZF; re-shard instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The engine's canonical documents schema (matches testdata documents).
DOCUMENTS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

_CORRUPT = "_corrupt_record"

_MODES = {"keep": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: str = DOCUMENTS_DDL,
    bad_records: str = "keep",
) -> DataFrame:
    """Distributed JSONL scan with an explicit schema.

    bad_records='keep' adds a `corrupt` STRING column holding the raw text
    of unparseable lines (NULL for good rows) — downstream quality gates
    can count/quarantine them; 'drop' silently discards; 'fail' aborts on
    the first bad line. Returns the schema's columns (+ `corrupt` under
    'keep')."""
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
    )
    df = reader.json(path)
    if bad_records == "keep":
        df = df.withColumnRenamed(_CORRUPT, "corrupt")
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    n_shards: int | None = None,
    mode: str = "error",
) -> None:
    """Export a corpus as JSONL shards — the other half of the ingest
    round trip (a cleaned/deduped corpus ships in the same wire format it
    arrived in). Thin wrapper over the distributed json sink with the
    pipeline defaults made explicit: gzip shards (splittable BY FILE,
    which is how JSONL corpora parallelize), optional `n_shards`
    repartition to control shard count/size (None keeps the upstream
    partitioning — right when the plan already repartitioned), and
    Spark's write modes ('error'/'overwrite'/'append')."""
    if n_shards is not None:
        df = df.repartition(n_shards)
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_DDL,
    bad_records: str = "keep",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of `read_jsonl` — watch a directory of
    JSONL shards and ingest them incrementally (the continuous-arrival
    shape of a live corpus feed). Same schema requirement, same
    corrupt-line policies, same output columns; every downstream text/
    dedup/sampling expression composes unchanged because they are pure
    column plans. Pair with `write_stream_partitioned` for an
    exactly-once landing zone."""
    if bad_records not in _MODES:
        raise ValueError(
            f"bad_records must be one of {sorted(_MODES)}, got {bad_records!r}"
        )
    reader = (
        spark.readStream.schema(
            schema + (f", {_CORRUPT} STRING" if bad_records == "keep" else "")
        )
        .option("mode", _MODES[bad_records])
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.json(path)
    if bad_records == "keep":
        df = df.withColumnRenamed(_CORRUPT, "corrupt")
    return df


def jsonl_corrupt_stats(df: DataFrame) -> DataFrame:
    """One-row audit for a `read_jsonl(bad_records='keep')` frame:
    (n_rows, n_corrupt, corrupt_frac, filled_<col>...) — the corrupt-line
    counter a pipeline gates on before training, plus per-column non-null
    counts (a schema-drift tripwire: a field renamed upstream parses
    "successfully" as all-NULL, which only the fill counts catch).

    The fill counts also satisfy Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
    restriction: a query against a raw JSON scan may not reference ONLY
    the corrupt column, so the audit deliberately reads the data columns
    in the same pass."""
    data_cols = [c for c in df.columns if c != "corrupt"]
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("corrupt").alias("n_corrupt"),
        F.round(
            F.count("corrupt") / F.count(F.lit(1)).cast("double"), 6
        ).alias("corrupt_frac"),
        *[F.count(c).alias(f"filled_{c}") for c in data_cols],
    )
