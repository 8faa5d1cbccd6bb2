"""Distributed BPE merge-rule training (beyond-reference extension
surface, SURVEY §2.11 family) — the tokenizer-training stage of an LLM
data pipeline (Sennrich et al. 2016; the algorithm behind GPT-2/BPE and
the `tokenizers` trainer), expressed Spark-first.

The key scale property the implementation leans on: after the first
aggregation the working set is the DISTINCT-WORD frequency table, not the
corpus — a 100 TB corpus collapses to (vocabulary × frequency) rows
before any iteration starts, which is exactly how the reference trainers
do it (count words once, merge over the word table). Each merge round is
then ONE partial-aggregated pair-count shuffle over that table plus a
1-row argmax collect (a model-sized driver action — the chosen rule IS
the model), and the merge application is a pure HOF fold, no Python.

Determinism: the winning pair is max by (count, then lexicographically
smallest pair) — a total order, so the trained rules are a pure function
of the corpus, replayable in ANSI SQL (the catalog oracle unrolls three
rounds in CTEs, folding with DuckDB's init-with-first list_reduce over a
sentinel-joined accumulator string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGES_SCHEMA = StructType(
    [
        StructField("step", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def apply_merge_expr(ss: Column, left: str, right: str) -> Column:
    """Apply one BPE merge rule (left, right) → left||right to a symbol
    array, exhaustively left-to-right (greedy non-overlapping, the
    standard BPE pass: 'aaaa' under (a,a) → [aa, aa]): an array-
    accumulator fold seeded with the first symbol."""
    merged = F.lit(left + right)
    init = F.slice(ss, 1, 1)
    rest = F.slice(ss, 2, F.greatest(F.size(ss) - 1, F.lit(0)))
    folded = F.aggregate(
        rest,
        init,
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(F.size(ss) < 2, ss).otherwise(folded)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    token_pattern: str = "[a-z]+",
) -> DataFrame:
    """Train `n_merges` BPE merge rules over a corpus: returns the rule
    table (step INT starting at 1, left_sym, right_sym, merged STRING,
    pair_count BIGINT) in training order — the artifact a tokenizer
    loads. Words are `token_pattern` matches of the lowercased text;
    symbols start as single characters.

    Per round: adjacent-pair counts over the distinct-word table (one
    partial-agged shuffle of pair×count rows), deterministic argmax by
    (count DESC, pair ASC) via TakeOrdered(1), HOF merge application.
    The word table is localCheckpoint-ed each round — the pagerank /
    connected-components lesson: an iterative plan re-executes its whole
    lineage invisibly unless each round's result is pinned. Training
    stops early when no adjacent pair remains (every word fully
    merged)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(token_pattern), F.lit(0)
                )
            ).alias("__w")
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("f"))
        .select(F.split("__w", "").alias("ss"), "f")
        .localCheckpoint()
    )
    spark = df.sparkSession
    rules: list[tuple] = []
    for step in range(1, n_merges + 1):
        n = F.size("ss")
        pairs = (
            words.filter(n >= 2)
            .select(
                "f",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("ss"), i).alias("a"),
                            F.element_at(F.col("ss"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        rules.append((step, a, b, a + b, cnt))
        words = words.select(
            apply_merge_expr(F.col("ss"), a, b).alias("ss"), "f"
        ).localCheckpoint()
    return spark.createDataFrame(rules, MERGES_SCHEMA)


def bpe_encode_expr(
    text: Column, merges: list[tuple[str, str]], token_pattern: str = "[a-z]+"
) -> Column:
    """Tokenize a text column with a trained rule list (driver-side,
    model-sized — the merges table is the model): array of token arrays,
    one per word, produced by replaying every merge rule in training
    order as pure HOF folds. The inference-side counterpart of
    `bpe_train`, enabling `token_count`-style budgeting under the real
    tokenizer instead of the whitespace proxy.

    Expression-depth boundary: each rule adds one nested transform, so
    this form suits rule lists up to the low hundreds (codegen falls
    back to interpreted evaluation beyond ~a few hundred nested HOFs);
    a production 30k-merge vocabulary should apply the rule table
    inside an Arrow-batched pandas UDF instead — the plumbing
    `functions/udf_ext.py` provides."""
    words = F.regexp_extract_all(F.lower(text), F.lit(token_pattern), F.lit(0))
    out = F.transform(words, lambda w: F.split(w, ""))

    def _rule(left: str, right: str):
        # closure factory: a default-arg lambda would present a 3-arg
        # signature to transform's lambda binder
        return lambda ss: apply_merge_expr(ss, left, right)

    for left, right in merges:
        out = F.transform(out, _rule(left, right))
    return out
