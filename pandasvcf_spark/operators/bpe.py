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
        # lazy: each step's top-pair collect is the job that
        # materializes the words table it reads — one job per merge
        # step instead of checkpoint + collect, and the LAST step's
        # re-merged words (never read) costs no job (round 16, §5)
        .localCheckpoint(eager=False)
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
        ).localCheckpoint(eager=False)
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


def _encode_word_rank(
    w: str, rank: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one word under a TRAINED rule table by the standard
    lowest-rank-first loop (the `tokenizers`/GPT-2 encode algorithm):
    repeatedly find the present adjacent pair with the smallest rank and
    merge every occurrence greedily left-to-right. For trained tables
    this is EXACTLY sequential-exhaustive rule application (the HOF
    semantics of `apply_merge_expr`): a merge at step i creates the
    symbol left_i||right_i, which no earlier rule j < i can reference
    (it did not exist at step j), so applying rule i never resurrects an
    already-exhausted earlier rule — lowest-rank-first and in-order
    replay perform the identical merge sequence. Cost O(L^2) per word,
    INDEPENDENT of vocabulary size — the property that makes 30k-merge
    production vocabularies feasible where the nested-HOF replay caps at
    ~low hundreds (bpe_encode_expr's documented ceiling)."""
    sym = list(w)
    while len(sym) >= 2:
        best_rank = None
        best = None
        for pair in zip(sym, sym[1:]):
            rk = rank.get(pair)
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best = rk, pair
        if best is None:
            break
        left, right = best
        out: list[str] = []
        i, n = 0, len(sym)
        while i < n:
            if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _encode_word_sequential(
    w: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Literal sequential-exhaustive replay (one greedy left-to-right
    pass per rule, in training order) — the semantics of
    `apply_merge_expr` in plain Python. Fallback for ad-hoc rule lists
    that violate the trained-table property (a rule referencing a symbol
    a LATER rule creates), where lowest-rank-first would diverge.
    O(rules × L) per word — fine for hand lists, not the 30k path."""
    sym = list(w)
    for left, right in merges:
        if len(sym) < 2:
            break
        out: list[str] = []
        i, n = 0, len(sym)
        while i < n:
            if i + 1 < n and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode_udf(
    merges: list[tuple[str, str]], token_pattern: str = "[a-z]+"
):
    """Production-vocabulary BPE tokenizer as an Arrow-batched pandas
    UDF (text STRING → array<array<string>>, same shape and semantics as
    `bpe_encode_expr`): the rule table — hundreds to 30k+ merges, i.e.
    the model — is captured in the closure and shipped once per
    executor, each Arrow batch is encoded in vectorized Python with an
    LRU cache over DISTINCT words (natural text repeats words heavily;
    the cache converts per-token cost to per-distinct-word cost, the
    same collapse `bpe_train` leans on). This is the named production
    path beyond `bpe_encode_expr`'s nested-HOF depth ceiling
    (~low-hundreds of merges before codegen falls back / analysis
    blows up); equivalence of the two paths on the same trained rules
    is oracle-checked by the `t_bpe_tokens_arrow` catalog entry.

    Rule tables produced by `bpe_train` use the O(L^2)-per-word
    lowest-rank-first loop (vocabulary-size-independent); an ad-hoc
    list where a rule references a symbol a LATER rule creates falls
    back to literal in-order replay so the HOF equivalence still holds.

    Returns the UDF; apply as `bpe_encode_udf(merges)(F.col("text"))`.
    NULL text → NULL (matching the HOF path's propagation)."""
    import re

    from pyspark.sql.functions import pandas_udf

    merges = [(str(a), str(b)) for a, b in merges]
    rank: dict[tuple[str, str], int] = {}
    for i, pair in enumerate(merges):
        rank.setdefault(pair, i)
    created: dict[str, int] = {}
    for i, (a, b) in enumerate(merges):
        created.setdefault(a + b, i)
    trained_order = all(
        created.get(s, -1) <= i
        for i, pair in enumerate(merges)
        for s in pair
    )
    pat = re.compile(token_pattern)
    # plain capped dict, not functools.lru_cache: lru_cache's
    # __reduce__ serializes by qualname, which breaks cloudpickle's
    # closure shipping for executor-side locals
    cache: dict[str, list[str]] = {}
    cache_cap = 1 << 20

    def _enc(w: str) -> list[str]:
        hit = cache.get(w)
        if hit is None:
            if len(cache) >= cache_cap:
                cache.clear()
            hit = (
                _encode_word_rank(w, rank)
                if trained_order
                else _encode_word_sequential(w, merges)
            )
            cache[w] = hit
        return hit

    @pandas_udf("array<array<string>>")
    def _udf(text):
        return text.map(
            lambda t: None
            if t is None
            else [_enc(w) for w in pat.findall(t.lower())]
        )

    return _udf


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    token_pattern: str = "[a-z]+",
    engine: str = "auto",
) -> DataFrame:
    """Append per-row token counts under a trained BPE rule table — the
    column `take_token_budget` consumes, computed under the REAL
    tokenizer instead of the whitespace proxy. engine='hof' replays the
    rules as nested HOFs (pure column expressions, zero Python — best
    for small rule lists), 'arrow' uses the Arrow-batched UDF (the only
    path for production vocabularies), 'auto' picks HOF up to 200 rules
    (the documented depth ceiling, `bpe_encode_expr`) and Arrow beyond.
    Empty text counts 0; NULL text counts 0 (budget semantics: a NULL
    document consumes nothing)."""
    if engine not in ("auto", "hof", "arrow"):
        raise ValueError(f"engine must be auto|hof|arrow, got {engine!r}")
    if engine == "auto":
        engine = "hof" if len(merges) <= 200 else "arrow"
    if engine == "hof":
        enc = bpe_encode_expr(F.col(text_col), list(merges), token_pattern)
    else:
        enc = bpe_encode_udf(list(merges), token_pattern)(F.col(text_col))
    return df.withColumn(
        out_col,
        F.coalesce(F.size(F.flatten(enc)), F.lit(0)).cast("long"),
    )
