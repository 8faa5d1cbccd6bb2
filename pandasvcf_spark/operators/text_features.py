"""Text feature extraction: TF-IDF term weighting (SURVEY §2.11).

Classic map-side-friendly plan: tokenize → explode → per-(doc, term) counts
→ per-term document frequency → broadcast the corpus size → weight. Two
shuffles total (both partial-aggregated); the document-frequency relation is
terms-sized (small) and broadcasts back onto the term counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import words_expr


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Per-(doc, term) smoothed TF-IDF:
    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)``.

    n_docs: corpus size. When omitted, N is computed INSIDE the plan as a
    single-row broadcast aggregate over `df` — plan construction stays
    lazy (zero Spark jobs at build time), at the cost of one extra scan of
    the id column at execution. Pass it explicitly when the caller already
    knows the corpus size.
    Output: id_col, term, tf BIGINT, tfidf DOUBLE.
    """
    toks = df.select(
        F.col(id_col), F.explode(words_expr(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__dfc"))
    scored = tf.join(F.broadcast(dfc), on="term")
    if n_docs is None:
        # Lazy scalar: one-row relation, broadcast onto every term count.
        n_df = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
        scored = scored.crossJoin(F.broadcast(n_df))
        n_expr = F.col("__n")
    else:
        n_expr = F.lit(n_docs)
    tfidf = F.col("tf") * (
        F.log((n_expr + F.lit(1.0)) / (F.col("__dfc") + F.lit(1.0)))
        + F.lit(1.0)
    )
    return scored.select(id_col, "term", "tf", tfidf.alias("tfidf"))


def contamination_overlap(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word n-grams also appear anywhere in the evaluation set —
    (id, total_grams, shared_grams, overlap DOUBLE in [0,1]). Filter on
    `overlap` to drop contaminated docs before training.

    Plan: the eval set's distinct n-grams are a small relation (benchmarks
    are tiny next to a corpus) — build it once, broadcast it, and
    equi-join the exploded doc n-grams against it; per-doc counts come
    back from one grouped aggregation. Cost is one corpus tokenize pass +
    a broadcast probe per gram; the corpus is never shuffled by content,
    only the (doc, matched-gram) hits reach the count shuffle."""
    from pandasvcf_spark.functions.text import word_ngrams_expr

    grams = F.array_distinct(word_ngrams_expr(text_col, n))
    eval_grams = (
        eval_df.select(F.explode(grams).alias("__g")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(grams).alias("__g"), F.size(grams).alias("__tot")
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), on="__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    totals = docs.select(
        F.col(id_col), F.size(grams).alias("total_grams")
    )
    shared = F.coalesce(F.col("shared_grams"), F.lit(0)).cast("long")
    overlap = F.when(F.col("total_grams") == 0, F.lit(0.0)).otherwise(
        shared / F.col("total_grams").cast("double")
    )
    return totals.join(hits, on=id_col, how="left").select(
        id_col,
        F.col("total_grams").cast("long").alias("total_grams"),
        shared.alias("shared_grams"),
        overlap.alias("overlap"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition metrics per document — the quality gate that
    catches boilerplate/spam (a page repeating one phrase) which
    length/stopword heuristics miss:

      * total_grams / distinct_grams — word n-gram occurrence counts;
      * dup_gram_frac = 1 - distinct/total (0 = no repetition);
      * top_gram, top_gram_count — the most frequent n-gram (ties break
        to the lexicographically smallest gram, so the answer is a pure
        function of the text);
      * top_gram_char_frac — characters covered by occurrences of the top
        gram over all word characters (the "fraction of characters in the
        most frequent n-gram" filter).

    Docs with fewer than n words (no grams) drop out — there is nothing
    to measure. Plan: explode n-grams → per-(doc, gram) counts → one
    window over doc (rank + totals) → join back to the per-doc word-char
    sum. Two shuffles on the doc key; the window never sees more than one
    doc's distinct grams per partition group."""
    from pyspark.sql import Window

    from pandasvcf_spark.functions.text import word_ngrams_expr, words_expr

    grams = df.select(
        F.col(id_col), F.explode(word_ngrams_expr(text_col, n)).alias("__g")
    )
    counts = grams.groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(id_col)
    ranked = (
        counts.withColumn(
            "__rn",
            F.row_number().over(w.orderBy(F.desc("__c"), F.col("__g"))),
        )
        .withColumn("total_grams", F.sum("__c").over(w))
        .withColumn("distinct_grams", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
    )
    chars = df.select(
        F.col(id_col),
        F.aggregate(
            words_expr(text_col),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
        ).alias("__wchars"),
    )
    top_chars = F.col("__c") * F.length(F.replace(F.col("__g"), F.lit(" "), F.lit("")))
    return ranked.join(chars, on=id_col).select(
        id_col,
        F.col("total_grams").cast("long").alias("total_grams"),
        F.col("distinct_grams").cast("long").alias("distinct_grams"),
        F.round(
            F.lit(1.0) - F.col("distinct_grams") / F.col("total_grams").cast("double"),
            4,
        ).alias("dup_gram_frac"),
        F.col("__g").alias("top_gram"),
        F.col("__c").cast("long").alias("top_gram_count"),
        F.when(F.col("__wchars") == 0, F.lit(0.0))
        .otherwise(F.round(top_chars / F.col("__wchars").cast("double"), 4))
        .alias("top_gram_char_frac"),
    )


def boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Inter-document boilerplate detection: for each document, the
    fraction of its distinct word n-gram chunks that also appear in at
    least `min_docs - 1` OTHER documents — (id, total_chunks,
    boiler_chunks, boiler_frac). High fractions flag templated/mirrored
    pages (navigation, license blocks, syndicated text) that per-document
    repetition metrics cannot see, because the repetition lives ACROSS
    documents.

    Plan: explode distinct chunks → per-chunk distinct-doc counts (one
    shuffle on the chunk key, map-side combined) → join the shared-chunk
    set back onto the per-doc chunk list (same chunk-key partitioning, so
    the join reuses the aggregation's exchange) → per-doc counts. Docs
    with no chunks (< n words) drop out, as in `repetition_stats`."""
    from pandasvcf_spark.functions.text import word_ngrams_expr

    ch = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_expr(text_col, n))
        ).alias("__c"),
    )
    shared = (
        ch.groupBy("__c")
        .agg(F.count(F.lit(1)).alias("__nd"))  # docs per chunk (chunks are
        # distinct WITHIN a doc, so plain count == distinct-doc count)
        .filter(F.col("__nd") >= min_docs)
        .select("__c")
    )
    flagged = ch.join(shared.withColumn("__hit", F.lit(1)), on="__c", how="left")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_chunks"),
        F.count("__hit").alias("boiler_chunks"),
        F.round(
            F.count("__hit") / F.count(F.lit(1)).cast("double"), 4
        ).alias("boiler_frac"),
    )


def word_logprob_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained unigram log-probability score per document — the
    perplexity-proxy quality signal (no external model needed): word
    frequencies come from THIS corpus, each document scores the mean
    log10 probability of its own words, and outliers (gibberish,
    wrong-language, OCR noise — full of corpus-rare words) surface as
    low scores. Output: (id, n_words, avg_logprob DOUBLE) — filter the
    left tail before training.

    Plan: explode words → corpus-level word counts (one shuffle,
    map-side combined) + the corpus total as a scalar broadcast-style
    cross join of a 1-row aggregate → join word frequencies back onto
    the per-doc word list (co-partitioned with the counting aggregation)
    → per-doc mean. Docs with no words drop out."""
    from pandasvcf_spark.functions.text import words_expr

    wd = df.select(F.col(id_col), F.explode(words_expr(text_col)).alias("__w"))
    freq = wd.groupBy("__w").agg(F.count(F.lit(1)).alias("__n"))
    total = freq.agg(F.sum("__n").alias("__tot"))
    scored = (
        wd.join(freq, on="__w")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log10(F.col("__n") / F.col("__tot").cast("double")).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
    )


def corpus_report(
    df,
    group_col: str = "source",
    text_col: str = "text",
    chars_col: str = "n_chars",
    lang_col: str = "lang",
):
    """One-pass corpus health report, per group and overall (ROLLUP): doc
    count, total/mean characters, English fraction, and the exact-dup
    rate within the group (1 - distinct normalized fingerprints / docs).

    The whole report is ONE aggregation over ONE scan — every metric is
    a partial-aggregable sum/count (the dup rate uses count_distinct of
    the 8-byte fingerprint, the only shuffle-widening term, still bytes
    per doc). The ROLLUP grand-total row has NULL group (standard SQL
    semantics). This is the table a corpus curation run prints first."""
    from pyspark.sql import functions as F

    from pandasvcf_spark.functions.text import fingerprint_expr

    return (
        df.withColumn("__fp", fingerprint_expr(text_col))
        .rollup(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(chars_col).cast("long")).alias("total_chars"),
            F.round(F.avg(chars_col), 2).alias("mean_chars"),
            F.round(
                F.avg(F.when(F.col(lang_col) == "en", 1.0).otherwise(0.0)), 4
            ).alias("en_frac"),
            F.round(
                1.0 - F.countDistinct("__fp") / F.count(F.lit(1)), 4
            ).alias("dup_rate"),
        )
    )


def repeated_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated passages — the exact-substring-dedup family
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): per document, the maximal runs of word positions whose
    n-grams each appear in at least `min_docs` DISTINCT documents. Output
    (id, start_gram INT 1-based, end_tok INT inclusive token position,
    n_grams BIGINT) — the spans a cleaning pass would excise (templated
    headers, license boilerplate, syndicated paragraphs), leaving the
    document's unique prose alone. The suffix-array construction of the
    paper finds byte-exact runs; this word-n-gram form trades sub-word
    precision for a pure relational plan.

    Plan: positional n-grams (one Generate per doc, 1-based positions) →
    per-gram distinct-doc counts (one partial-agged shuffle; counting
    doc-distinct, so a phrase repeated WITHIN one document is not
    "repeated" here) → semi-ish join of gram occurrences onto the
    repeated-gram set (shuffle equi-join on the gram string) → per-doc
    gap-and-island window (pos - row_number is constant within a
    consecutive run) → one groupBy for span bounds. No self-joins, no
    crossJoin; everything partial-aggregates.

    The grams subtree is referenced twice (the df-count aggregation and
    the occurrence probe), so the corpus tokenizes twice — deliberate:
    materializing the exploded positional-gram relation to save the
    second pass would persist tokens × positions rows, usually far more
    expensive than re-tokenizing; cache `df` upstream if the input scan
    itself is the bottleneck."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    w = words_expr(F.col(text_col))
    grams = (
        df.select(F.col(id_col).alias("id"), w.alias("__w"))
        .filter(F.size("__w") >= n)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - n + 1),
                    lambda j: F.concat_ws(" ", F.slice("__w", j, n)),
                )
            ).alias("__p0", "gram"),
        )
        .select("id", (F.col("__p0") + 1).alias("pos"), "gram")
    )
    rep = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(rep, "gram").select("id", "pos")
    win = Window.partitionBy("id").orderBy("pos")
    islands = flagged.withColumn(
        "__grp", F.col("pos") - F.row_number().over(win)
    )
    return (
        islands.groupBy("id", "__grp")
        .agg(
            F.min("pos").cast("int").alias("start_gram"),
            (F.max("pos") + n - 1).cast("int").alias("end_tok"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("__grp")
    )


def exact_substring_remove(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
    granularity: str = "word",
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" §4.1) — the rewrite
    step downstream of `repeated_ngram_spans`: excise cross-document
    verbatim spans from every document EXCEPT the first one carrying
    them (keep-first), the standard post-dedup pass a CC-scale corpus
    runs after document-level dedup (boilerplate, licenses, syndicated
    paragraphs survive MinHash because the documents differ overall).

    Keep-first at n-gram granularity: a word n-gram occurring in
    >= `min_docs` DISTINCT documents is OWNED by the document with the
    smallest id; every occurrence in a higher-id document is flagged,
    flagged gram starts merge into maximal token intervals (interval
    union, not just consecutive starts — two starts `n-1` apart still
    overlap in token space), and the covered tokens are dropped. The
    paper's suffix array finds byte-exact spans >= 50 tokens; this
    word-n-gram form trades sub-word precision for a pure relational
    plan (the `repeated_ngram_spans` precedent).

    `granularity='char'` (round-11 verdict ask #6) runs the SAME
    device over the CHARACTER stream of the normalized text (lowercase
    + whitespace collapsed — the `char_shingles_expr` convention):
    char n-shingles replace word n-grams and the interval union /
    surgery operate on character positions, approximating the paper's
    byte-exact spans without the word-boundary snap (set n ~ 20-50;
    a repeated word run always contains repeated char shingles, so
    char mode is strictly more precise at its boundaries). Cost note:
    the shingle explode shuffles ~n bytes per corpus character —
    exact and fine through moderate corpora; at CC scale detect with
    `winnowing_fingerprints_expr` (same char shingles, sampled) and
    reserve this exact mode for the flagged partition.

    Output, one row per input document with non-NULL text:
      id          (input id type)
      n_tokens    BIGINT  word tokens (chars in char mode) before
                          surgery
      n_removed   BIGINT  tokens/chars excised (0 for untouched docs
                          and for every owner)
      clean_text  STRING  surviving tokens space-joined (surviving
                          chars concatenated in char mode) over the
                          normalized stream — '' when everything was
                          removed

    Plan: positional n-grams (one Generate per doc) → per-gram
    (distinct-doc count, min-id owner) partial agg → equi-join of gram
    occurrences onto the owned repeated-gram set, keeping non-owner
    rows → per-doc running-max-end interval union window → span
    groupBy → collect_list of the per-doc spans (document-sized, few)
    → ONE left join back onto the corpus → pure HOF token surgery.
    No self-joins, no all-pairs, nothing non-equi; the only shuffles
    key on gram and id."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if granularity == "word":
        arr = words_expr(F.col(text_col))
        sep = " "
    elif granularity == "char":
        _norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
        # split('', '') yields [''] (size 1) — an empty doc must report
        # 0 tokens, not 1 (review-caught; the oracle guards identically)
        arr = F.when(
            F.length(_norm) == 0,
            F.array().cast("array<string>"),
        ).otherwise(F.split(_norm, ""))
        sep = ""
    else:
        raise ValueError(
            f"granularity must be 'word' or 'char', got {granularity!r}"
        )
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        arr.alias("__w"),
    )
    grams = (
        toks.filter(F.size("__w") >= n)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - n + 1),
                    lambda j: F.concat_ws(sep, F.slice("__w", j, n)),
                )
            ).alias("__p0", "gram"),
        )
        .select("id", (F.col("__p0") + 1).alias("pos"), "gram")
    )
    owned = (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("id").alias("__df"),
            F.min("id").alias("__owner"),
        )
        .filter(F.col("__df") >= min_docs)
        .select("gram", "__owner")
    )
    flagged = (
        grams.join(owned, "gram")
        .filter(F.col("id") != F.col("__owner"))
        .select("id", "pos")
    )
    # interval-union islands: a new island starts when this gram start
    # lies beyond the running max covered-token end + 1
    win = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n - 1).over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        flagged.withColumn(
            "__new",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
            ).otherwise(0),
        )
        .withColumn("__grp", F.sum("__new").over(win))
        .groupBy("id", "__grp")
        .agg(
            F.min("pos").cast("int").alias("start_tok"),
            (F.max("pos") + n - 1).cast("int").alias("end_tok"),
        )
        .groupBy("id")
        .agg(
            F.collect_list(
                F.struct("start_tok", "end_tok")
            ).alias("__rm")
        )
    )
    rm = F.coalesce(
        F.col("__rm"),
        F.array().cast("array<struct<start_tok:int,end_tok:int>>"),
    )
    indexed = F.transform(
        F.col("__w"),
        lambda t, i: F.struct(
            t.alias("t"), (i + 1).cast("int").alias("p")
        ),
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            rm,
            lambda sp: (s["p"] >= sp["start_tok"])
            & (s["p"] <= sp["end_tok"]),
        ),
    )
    return (
        toks.join(spans, "id", "left")
        .select(
            "id",
            F.size("__w").cast("long").alias("n_tokens"),
            (F.size("__w") - F.size(kept)).cast("long").alias(
                "n_removed"
            ),
            F.concat_ws(
                sep, F.transform(kept, lambda s: s["t"])
            ).alias("clean_text"),
        )
    )


def group_balance(
    df: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Single-row balance report of a categorical distribution — the
    "is this mixture what the recipe says" check a pretraining data
    committee reads next to `corpus_report`:

      n_groups      distinct group values (NULL is its own group)
      entropy       Shannon entropy −Σ p·ln p (nats)
      entropy_norm  entropy / ln(n_groups) ∈ [0,1] (1 = uniform;
                    NULL for a single group, where balance is undefined)
      herfindahl    Σ p² concentration (1 = one group dominates,
                    1/n_groups = uniform) — the Gini-Simpson complement

    Two partial-aggregated stages over group-count rows only: groupBy
    (groups × 8-byte counts of shuffle) then a single-row agg — the
    corpus itself is scanned once and never re-shuffled."""
    counts = df.groupBy(
        F.col(group_col).alias("__g")
    ).agg(F.count(F.lit(1)).alias("__n"))
    agg = counts.agg(
        F.count(F.lit(1)).cast("int").alias("n_groups"),
        F.sum("__n").alias("__total"),
        F.sum(F.col("__n") * F.log(F.col("__n"))).alias("__sum_nlogn"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sum_n2"),
    )
    # entropy = ln(total) - sum(n ln n)/total  (algebraic form: one agg
    # pass, no per-row p = n/total division before the total is known)
    t = F.col("__total").cast("double")
    entropy = F.log(t) - F.col("__sum_nlogn") / t
    return agg.select(
        "n_groups",
        F.round(entropy, 4).alias("entropy"),
        F.when(
            F.col("n_groups") > 1,
            F.round(entropy / F.log(F.col("n_groups").cast("double")), 4),
        ).alias("entropy_norm"),
        F.round(F.col("__sum_n2") / (t * t), 4).alias("herfindahl"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking of a corpus against a bag-of-terms query — the
    classic lexical retrieval scorer (Robertson-Spärck Jones; the
    Lucene-style idf variant ln(1 + (N − df + 0.5)/(df + 0.5)), always
    positive):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))

    Output: top-`k` (id, score DOUBLE round 4), deterministic total
    order (rounded score desc, id asc). Documents matching no query term
    score nothing and never reach the sort.

    Plan: ONE tokenize pass computes both the per-doc length and the
    per-(doc, query-term) tf (terms filtered against a literal array
    before the count shuffle, so only query-term hits leave the scan);
    df, N and avgdl are term-count-sized / single-row broadcast
    aggregates; the final top-k is TakeOrdered. The corpus shuffles only
    its (doc, matched-term) hits — never full text. The tokenize subtree
    is referenced three times (corpus stats, tf, and df-via-tf), so the
    scan runs thrice — deliberate, same trade-off as
    `repeated_ngram_spans`: the exploded token relation dwarfs the text;
    pass a cached `df` when the input scan dominates."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = [t.lower() for t in query_terms]
    w = words_expr(text_col)
    base = df.select(
        F.col(id_col).alias("id"), w.alias("__w")
    ).select("id", F.explode("__w").alias("term"), F.size("__w").alias("dl"))
    stats = base.groupBy().agg(
        F.count_distinct("id").alias("__n"),
        (F.count(F.lit(1)) / F.count_distinct("id")).alias("__avgdl"),
    )
    hits = base.filter(F.col("term").isin(terms))
    tf = hits.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        1.0 - F.lit(b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def bigram_lm_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Self-trained BIGRAM language-model score per document with
    stupid backoff (Brants et al. 2007 — the smoothing scheme built for
    corpus scale: no discounting mass to renormalize, so counts stay
    mergeable partial aggregates): the context-aware upgrade of
    `word_logprob_stats` (a doc of real words in gibberish ORDER scores
    low here and fine there — the CCNet-style fluency signal). Per
    position: P(w₁) = c(w₁)/N; P(wᵢ|wᵢ₋₁) = c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) when the
    bigram was seen, else α·c(wᵢ)/N. Output: (id, n_words BIGINT,
    avg_logprob DOUBLE round 4 — mean log10 over positions). Docs with
    no words drop out; scoring is over the SAME corpus the counts come
    from, so every unigram exists (score a foreign snapshot by training
    here and joining there, flooring OOV — not this entry's contract).

    Plan: one posexplode → bigram counts (one shuffle) + unigram counts
    (one shuffle) + 1-row total; the per-position relation LEFT-joins
    the bigram table on (prev, w) and inner-joins the unigram tables;
    per-doc mean. All count relations are vocabulary-sized — partial
    aggregation collapses the corpus before any join."""
    from pandasvcf_spark.functions.text import words_expr

    pos = df.select(
        F.col(id_col),
        F.posexplode(words_expr(text_col)).alias("__p", "__w"),
    )
    # previous token within the doc: one window over (doc, position)
    w = Window.partitionBy(id_col).orderBy("__p")
    seq = pos.withColumn("__prev", F.lag("__w").over(w))
    uni = seq.groupBy("__w").agg(F.count(F.lit(1)).alias("__cu"))
    big = (
        seq.filter(F.col("__prev").isNotNull())
        .groupBy("__prev", "__w")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    total = uni.agg(F.sum("__cu").alias("__tot"))
    prev_uni = uni.select(
        F.col("__w").alias("__prev"), F.col("__cu").alias("__cprev")
    )
    scored = (
        seq.join(uni, on="__w")
        .join(prev_uni, on="__prev", how="left")
        .join(big, on=["__prev", "__w"], how="left")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.when(
                F.col("__prev").isNull(),
                F.log10(F.col("__cu") / F.col("__tot").cast("double")),
            )
            .when(
                F.col("__cb").isNotNull(),
                F.log10(F.col("__cb") / F.col("__cprev").cast("double")),
            )
            .otherwise(
                F.log10(
                    F.lit(float(alpha))
                    * F.col("__cu")
                    / F.col("__tot").cast("double")
                )
            )
            .alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
    )


def mattr_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010) — the
    length-independent lexical-diversity score: plain TTR
    (types/tokens) collapses as documents grow (Heaps' law), so MATTR
    averages the TTR of every `window`-token sliding window instead,
    making a 100-word note and a 10k-word article comparable — the
    vocabulary-richness quality signal beside `repetition_stats` (a
    spun/templated document shows low MATTR long before its global TTR
    looks odd). Documents shorter than the window score their single
    full-length TTR (the standard fallback). Output: (id, n_tokens
    BIGINT, mattr DOUBLE round 6); docs with no words drop out.

    Plan: pure per-row HOFs — the token array binds once
    (`bound_expr`), each window position takes
    size(array_distinct(slice)) — O(L·W) work per document with NO
    shuffle at all (embarrassingly parallel over the corpus; W is a
    constant). The oracle replays the same slices with DuckDB list
    functions."""
    from pandasvcf_spark.functions.text import bound_expr, words_expr

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = words_expr(F.col(text_col))
    mattr = bound_expr(
        w,
        lambda ws: F.when(
            F.size(ws) <= window,
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws),
        ).otherwise(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - window + 1),
                    lambda i: F.size(
                        F.array_distinct(F.slice(ws, i, window))
                    ).cast("double")
                    / window,
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            / (F.size(ws) - window + 1).cast("double")
        ),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.size(w).cast("long").alias("n_tokens"),
            F.round(mattr, 6).alias("mattr"),
        )
        .filter(F.col("n_tokens") > 0)
    )


def bigram_kn_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Self-trained interpolated Kneser-Ney bigram score per document
    (Kneser & Ney 1995; Chen & Goodman 1999 found the interpolated
    form the consistently best n-gram smoother) — the proper-LM
    upgrade of `bigram_lm_stats`' stupid backoff: instead of an
    unnormalized α·unigram fallback, KN discounts every seen bigram by
    a fixed D and redistributes exactly that mass over a CONTINUATION
    distribution (how many distinct contexts a word follows — "Francisco"
    is frequent but only ever follows "San", so its continuation
    probability is tiny). Per position i >= 2:

        P(wᵢ|wᵢ₋₁) = max(c(wᵢ₋₁wᵢ) − D, 0)/s(wᵢ₋₁)
                     + (D·n1+(wᵢ₋₁·)/s(wᵢ₋₁)) · n1+(·wᵢ)/n1+(··)

    with s(prev) = Σ_w c(prev w) (the bigram-START count — NOT the
    unigram count, which over-counts doc-final words; using s makes
    every context distribution sum to exactly 1), n1+(prev·) the
    distinct continuations of prev, n1+(·w) the distinct contexts w
    follows, n1+(··) the distinct bigram types. Position 1 scores with
    the unigram MLE c(w)/N (the `bigram_lm_stats` convention).
    The fluency signal: real words in gibberish ORDER score low here
    and fine under `word_logprob_stats`.

    Output: (id, n_words BIGINT, avg_logprob DOUBLE round 4 — mean
    log10 over positions). Docs with no words drop out; scoring is
    over the SAME corpus the counts come from (the bigram_lm_stats
    contract), so every context/continuation exists.

    Plan: ONE posexplode → ONE (doc, position) window for prev → three
    partial-agged count relations (bigram types with counts; per-prev
    start-count + distinct-continuation rolled into the SAME groupBy;
    per-word distinct-context) + two 1-row totals — all vocabulary- or
    bigram-type-sized, the corpus collapses before any join; then the
    position relation takes one left join (bigram) and two inner joins
    (context, continuation) + a broadcast of the totals, and one
    per-doc mean."""
    from pandasvcf_spark.functions.text import words_expr

    d = float(discount)
    if not (0.0 < d < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    pos = df.select(
        F.col(id_col),
        F.posexplode(words_expr(text_col)).alias("__p", "__w"),
    )
    w = Window.partitionBy(id_col).orderBy("__p")
    seq = pos.withColumn("__prev", F.lag("__w").over(w))
    uni = seq.groupBy("__w").agg(F.count(F.lit(1)).alias("__cu"))
    total = uni.agg(F.sum("__cu").alias("__tot"))
    big = (
        seq.filter(F.col("__prev").isNotNull())
        .groupBy("__prev", "__w")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    ctx = big.groupBy("__prev").agg(
        F.sum("__cb").alias("__s"),          # bigram-start count
        F.count(F.lit(1)).alias("__n1fwd"),  # distinct continuations
    )
    cont = big.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__n1bwd")   # distinct contexts of w
    )
    types = big.agg(F.count(F.lit(1)).alias("__ntypes"))
    dd = F.lit(d)
    p_kn = (
        F.greatest(F.coalesce(F.col("__cb"), F.lit(0)) - dd, F.lit(0.0))
        / F.col("__s").cast("double")
        + (dd * F.col("__n1fwd") / F.col("__s").cast("double"))
        * (F.col("__n1bwd") / F.col("__ntypes").cast("double"))
    )
    scored = (
        seq.join(uni, on="__w")
        .join(big, on=["__prev", "__w"], how="left")
        .join(ctx, on="__prev", how="left")
        .join(cont, on="__w", how="left")
        .join(F.broadcast(types))
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.when(
                F.col("__prev").isNull(),
                F.log10(F.col("__cu") / F.col("__tot").cast("double")),
            )
            .otherwise(F.log10(p_kn))
            .alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
    )


def zipf_stats(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 5,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary (Zipf 1949):
    one row (n_tokens BIGINT, n_types BIGINT, fitted_types BIGINT,
    zipf_slope DOUBLE). Natural-language corpora fit
    ln f ≈ c − s·ln r with s ≈ 1; a synthetic or templated corpus
    shows up immediately as a slope far from 1 — the cheap corpus-level
    "is this distribution natural?" diagnostic next to the per-document
    quality scores.

    Ranks are row_number over (freq DESC, term ASC) — a total order, so
    the fit is deterministic. The OLS slope is the population-moment
    closed form cov(ln r, ln f)/var(ln r) over types with
    freq >= min_freq (the hapax tail is not Zipfian and would dominate
    an all-types fit).

    Plan shape: one vocab-sized groupBy (the corpus collapses to the
    type table before anything quadratic in tokens), one vocab-sized
    window sort for ranks, one 1-row moment agg. Nothing after the
    first agg scales with tokens — at 100 TB the vocabulary is millions
    of rows, executor-trivial."""
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(words_expr(text_col)).alias("__w")
    )
    types = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__f"))
    ranked = types.withColumn(
        "__r",
        F.row_number().over(Window.orderBy(F.desc("__f"), F.asc("__w"))),
    )
    fit = ranked.filter(F.col("__f") >= F.lit(int(min_freq))).select(
        F.log("__r").alias("__lr"), F.log("__f").alias("__lf")
    )
    moments = fit.agg(
        F.count(F.lit(1)).alias("fitted_types"),
        F.covar_pop("__lr", "__lf").alias("__cov"),
        F.var_pop("__lr").alias("__var"),
    )
    totals = types.agg(
        F.sum("__f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return totals.crossJoin(moments).select(
        "n_tokens",
        "n_types",
        "fitted_types",
        F.round(F.col("__cov") / F.col("__var"), 6).alias("zipf_slope"),
    )


def heaps_law(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978): one row
    (docs BIGINT, n_tokens BIGINT, n_types BIGINT, heaps_beta DOUBLE,
    heaps_k DOUBLE). V(n) ≈ K·n^β with β ≈ 0.4-0.6 for natural text;
    β near 1 means the corpus keeps minting new types (OCR noise, ids,
    boilerplate churn) — the vocabulary-side companion to `zipf_stats`.

    The growth curve is computed WITHOUT any sequential scan: order
    documents by `id_col`, then
      * N(d) = cumulative token count      — per-doc counts + one
        cumulative window over the docs-sized relation;
      * V(d) = cumulative distinct types   — each type contributes at
        its FIRST document (min doc id per type, a vocab-sized agg),
        histogram per first-doc, same cumulative window.
    OLS of ln V on ln N over all doc checkpoints gives β and
    K = exp(mean(lnV) − β·mean(lnN)). Every stage is vocab- or
    docs-sized after the token groupBys; nothing quadratic, nothing
    driver-side."""
    toks = (
        df.filter(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__d"), F.explode(words_expr(text_col)).alias("__w"))
    )
    per_doc = toks.groupBy("__d").agg(F.count(F.lit(1)).alias("__n"))
    first_doc = (
        toks.groupBy("__w")
        .agg(F.min("__d").alias("__d"))
        .groupBy("__d")
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(first_doc, "__d", "left")
        .select(
            "__d",
            F.sum("__n").over(w).alias("__N"),
            F.sum(F.coalesce(F.col("__v"), F.lit(0))).over(w).alias("__V"),
        )
        .select(F.log("__N").alias("__ln"), F.log("__V").alias("__lv"), "__N", "__V")
    )
    return curve.agg(
        F.count(F.lit(1)).alias("docs"),
        F.max("__N").cast("long").alias("n_tokens"),
        F.max("__V").cast("long").alias("n_types"),
        F.round(
            F.covar_pop("__ln", "__lv") / F.var_pop("__ln"), 6
        ).alias("heaps_beta"),
        F.round(
            F.exp(
                F.avg("__lv")
                - (F.covar_pop("__ln", "__lv") / F.var_pop("__ln"))
                * F.avg("__ln")
            ),
            4,
        ).alias("heaps_k"),
    )


def pmi_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
    max_words: int | None = None,
) -> DataFrame:
    """Top word-pair associations by document-level PMI — the collocation
    / association-mining pass (Church & Hanks 1990's pointwise mutual
    information over co-occurrence counts): which words appear in the
    SAME DOCUMENT far more often than their marginal frequencies
    predict? Output: (w1, w2, n_pair, n_w1, n_w2 BIGINT, pmi DOUBLE),
    the top_n pairs by pmi = ln(n_pair·D / (n_w1·n_w2)) under the total
    order (pmi DESC, w1, w2), pairs below min_count dropped (PMI of
    rare pairs is noise — the standard Church-Hanks caveat).

    Counting is doc-level and binary (distinct words per doc; n_w =
    doc frequency, D = docs with non-null text), the stable convention
    for corpus-scale association. Pair generation is an index-slice HOF
    over each doc's sorted distinct word array — no self-join, one
    shuffle to the (w1, w2) count; per-doc cost is O(L²) in DISTINCT
    words, so for long-document corpora set max_words (a head-slice
    cap, applied after sort for determinism) — unbounded only because
    the testdata docs are ~30 words.

    Plan: words explode once for doc frequencies (vocab-sized agg);
    pairs groupBy is the data-sized shuffle; marginal join-back is
    vocab-keyed; D broadcasts as one row; TakeOrdered keeps top_n."""
    wcol = words_expr(text_col)
    arr = F.array_sort(F.array_distinct(wcol))
    if max_words is not None:
        if max_words < 2:
            raise ValueError(f"max_words must be >= 2, got {max_words}")
        arr = F.slice(arr, 1, max_words)
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__d"), arr.alias("__ws")
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("__D"))
    words = base.select(F.explode("__ws").alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("__nw"))
    pairs = (
        base.select(
            F.explode(
                F.expr(
                    "flatten(transform(__ws, (w1, i) -> "
                    "transform(slice(__ws, i + 2, size(__ws)), "
                    "w2 -> struct(w1, w2))))"
                )
            ).alias("__p")
        )
        .select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    j = (
        pairs.join(wc.withColumnRenamed("w", "w1"), on="w1")
        .withColumnRenamed("__nw", "__n1")
        .join(wc.withColumnRenamed("w", "w2"), on="w2")
        .withColumnRenamed("__nw", "__n2")
        .crossJoin(F.broadcast(n_docs))
    )
    pmi = F.log(
        (F.col("n_pair").cast("double") * F.col("__D"))
        / (F.col("__n1").cast("double") * F.col("__n2"))
    )
    return (
        j.select(
            "w1",
            "w2",
            "n_pair",
            F.col("__n1").alias("n_w1"),
            F.col("__n2").alias("n_w2"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_n)
    )


def readability_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document readability scores — the classic Flesch reading
    ease and Flesch-Kincaid grade level (Kincaid et al. 1975), the
    interpretable complement to model-based quality scores in a corpus
    filter stack:

        FRE = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        FKG = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    with W = word count ([a-z]+ runs of the lowercased text, the
    `words_expr` convention), S = sentence count (non-blank segments
    between [.!?]+ terminator runs, floored at 1 so unpunctuated text
    is one long sentence — the conservative reading), Y = syllable
    count by the standard vowel-group heuristic ([aeiouy]+ runs, each
    vowelless word floored at 1 syllable). Output: (id, n_words,
    n_sentences, n_syllables BIGINT, flesch, fk_grade DOUBLE round 4;
    NULL scores for wordless docs).

    Pure native column expressions — no shuffle, no Python, scales as a
    projection over the scan like the rest of the quality family."""
    text = F.col(text_col)
    lower = F.lower(text)
    words = words_expr(text_col)
    n_words = F.size(words).cast("bigint")
    segs = F.split(text, r"[.!?]+")
    n_sent = F.greatest(
        F.lit(1).cast("bigint"),
        F.size(F.filter(segs, lambda s: F.trim(s) != "")).cast("bigint"),
    )
    groups = F.size(F.regexp_extract_all(lower, F.lit(r"[aeiouy]+"), 0))
    no_vowel = F.size(
        F.filter(words, lambda w: ~w.rlike("[aeiouy]"))
    )
    n_syll = (groups + no_vowel).cast("bigint")
    wps = n_words.cast("double") / n_sent
    spw = n_syll.cast("double") / n_words
    flesch = F.when(
        n_words > 0, 206.835 - 1.015 * wps - 84.6 * spw
    )
    fkg = F.when(n_words > 0, 0.39 * wps + 11.8 * spw - 15.59)
    return df.filter(text.isNotNull()).select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        F.when(n_words > 0, n_syll).otherwise(F.lit(0)).cast("bigint")
         .alias("n_syllables"),
        (F.round(flesch, 4) + 0.0).alias("flesch"),
        (F.round(fkg, 4) + 0.0).alias("fk_grade"),
    )


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources — the
    corpus-comparison matrix a mixture designer reads before weighting
    sources (two sources with Jaccard ≈ 1 are the same crawl twice;
    ≈ 0 means genuinely complementary coverage). Per unordered source
    pair (a < b): vocabulary sizes, intersection, union, Jaccard and
    both containment directions (|A∩B|/|A| — the asymmetric "is A a
    subset of B" signal Jaccard hides). Output: (src_a, src_b,
    vocab_a, vocab_b, n_common BIGINT, jaccard, contain_a_in_b,
    contain_b_in_a DOUBLE round 6). SPARSE: a pair sharing no words is
    ABSENT, not a zero row — the inner-join form is what stays bounded
    when sources number in the thousands (per-domain overlap maps).

    Plan: one groupBy(source, word) collapses the corpus to its
    source-vocabulary cells (the only data-sized shuffle); the
    intersection is a word-keyed self-join of THAT table (each word
    contributes its source-pair combinations — bounded by
    sources-per-word², never corpus rows); vocabulary sizes join back
    source-keyed. No corpus×corpus anything."""
    w = F.explode(words_expr(text_col)).alias("w")
    cells = (
        df.filter(F.col(text_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("src"), w)
        .distinct()
    )
    vocab = cells.groupBy("src").agg(F.count(F.lit(1)).alias("v"))
    a = cells.select(F.col("src").alias("src_a"), "w")
    b = cells.select(F.col("src").alias("src_b"), "w")
    inter = (
        a.join(b, on="w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    va = vocab.select(F.col("src").alias("src_a"), F.col("v").alias("vocab_a"))
    vb = vocab.select(F.col("src").alias("src_b"), F.col("v").alias("vocab_b"))
    j = inter.join(va, on="src_a").join(vb, on="src_b")
    union = F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
    r6 = lambda c: (F.round(c, 6) + 0.0)
    return j.select(
        "src_a",
        "src_b",
        "vocab_a",
        "vocab_b",
        "n_common",
        r6(F.col("n_common") / union.cast("double")).alias("jaccard"),
        r6(F.col("n_common") / F.col("vocab_a").cast("double"))
        .alias("contain_a_in_b"),
        r6(F.col("n_common") / F.col("vocab_b").cast("double"))
        .alias("contain_b_in_a"),
    )


def gini_concentration(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Gini coefficient of the corpus's word-frequency distribution —
    the single-number concentration diagnostic beside `zipf_stats`'
    slope fit (Gini ≈ 0: tokens spread evenly over the vocabulary;
    → 1: a handful of types carry all the mass; natural language sits
    high, templated/boilerplate corpora sit higher still, and a JUMP
    between snapshots means the crawl mix changed). One row:
    (vocab BIGINT types, tokens BIGINT, gini DOUBLE round 6; NULL for
    an empty corpus) using the sorted-rank identity

        G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)

    over counts ascending with the deterministic total order
    (count, word). Plan: the corpus collapses to the vocabulary count
    table first (one explode + groupBy); the rank window sorts
    VOCAB-sized rows, never tokens; the final fold is a 1-row agg."""
    w = F.explode(words_expr(text_col)).alias("w")
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .select(w)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rw = Window.orderBy("c", "w")
    ranked = counts.withColumn("i", F.row_number().over(rw))
    out = ranked.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("c").alias("tokens"),
        F.sum(F.col("i").cast("double") * F.col("c")).alias("__ic"),
    )
    n = F.col("vocab").cast("double")
    sx = F.col("tokens").cast("double")
    gini = F.when(
        (F.col("vocab") > 0) & (F.col("tokens") > 0),
        (2.0 * F.col("__ic") - (n + 1.0) * sx) / (n * sx),
    )
    return out.select(
        "vocab", "tokens", (F.round(gini, 6) + 0.0).alias("gini")
    )


def naive_bayes_train(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial Naive Bayes text classifier — the
    embarrassingly-parallel baseline every corpus-labeling pipeline
    starts from (fastText's ancestor; the lang-id/topic/quality
    bootstrap model), trained in TWO aggregations however large the
    corpus:

        log P(w|y) = ln((count(w, y) + α) / (tokens(y) + α·|V|))
        log P(y)   = ln(docs(y) / docs)

    with Laplace smoothing α over the GLOBAL vocabulary V (absent
    (word, label) pairs are implicit — score-time lookups fall back to
    the per-label default ln(α / (tokens(y) + α·|V|)), kept as the
    `log_default` column, so the model table stays SPARSE: observed
    pairs only, never |V|·|labels| rows).

    Returns (likelihoods, priors): likelihoods = (label, w,
    n_wy BIGINT, log_lik DOUBLE round 6, log_default DOUBLE round 6 —
    constant within label), priors = (label, n_docs BIGINT, log_prior
    DOUBLE round 6). Plan: explode → groupBy(label, word) is the only
    data-sized shuffle; label totals and |V| are label-sized /
    1-row broadcasts joined back."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    lab = F.col(label_col)
    nn = df.filter(lab.isNotNull() & F.col(text_col).isNotNull())
    words = nn.select(
        lab.alias("label"), F.explode(words_expr(text_col)).alias("w")
    )
    wc = words.groupBy("label", "w").agg(
        F.count(F.lit(1)).alias("n_wy")
    )
    label_tot = wc.groupBy("label").agg(F.sum("n_wy").alias("__ty"))
    vocab = wc.select("w").distinct().agg(
        F.count(F.lit(1)).alias("__V")
    )
    lik = (
        wc.join(label_tot, on="label")
        .crossJoin(F.broadcast(vocab))
    )
    denom = F.col("__ty").cast("double") + alpha * F.col("__V")
    likelihoods = lik.select(
        "label",
        "w",
        "n_wy",
        (F.round(F.log((F.col("n_wy") + alpha) / denom), 6) + 0.0)
        .alias("log_lik"),
        (F.round(F.log(F.lit(alpha) / denom), 6) + 0.0)
        .alias("log_default"),
    )
    docs = nn.groupBy(lab.alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dtot = docs.agg(F.sum("n_docs").alias("__D"))
    priors = docs.crossJoin(F.broadcast(dtot)).select(
        "label",
        "n_docs",
        (F.round(
            F.log(F.col("n_docs").cast("double") / F.col("__D")), 6
        ) + 0.0).alias("log_prior"),
    )
    return likelihoods, priors


def naive_bayes_score(
    df: DataFrame,
    likelihoods: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a trained multinomial Naive Bayes model
    (`naive_bayes_train`'s output) — the distributed predict half of
    the classifier: per (doc, label),

        score = log_prior(y) + Σ_w cnt(w)·log_lik(w|y)
                             + (tokens − matched)·log_default(y)

    i.e. every token of a word UNSEEN for that label contributes the
    label's smoothed default — exactly the dense-model math, computed
    off the SPARSE table. Output: (id, label, score DOUBLE round 6,
    is_pred BOOLEAN — the argmax under the deterministic tie order
    (score DESC, label)). Wordless documents score on priors alone.

    Plan: per-doc word counts join the model VOCAB-KEYED (the only
    data-sized join — each word row meets just the labels that saw the
    word); the (doc × label) scaffold comes from a labels-sized
    broadcast cross join; the argmax is one per-doc window. No
    |V|·|labels| densification anywhere."""
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    )
    w = F.explode(words_expr("__t")).alias("w")
    wc = (
        base.select("__id", w)
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    doc_tok = wc.groupBy("__id").agg(F.sum("__cnt").alias("__tok"))
    matched = (
        wc.join(likelihoods, on="w")
        .groupBy("__id", "label")
        .agg(
            F.sum(F.col("__cnt") * F.col("log_lik")).alias("__mscore"),
            F.sum("__cnt").alias("__mtok"),
        )
    )
    # per-label constants: default + prior (labels-sized)
    consts = (
        likelihoods.groupBy("label")
        .agg(F.max("log_default").alias("__dflt"))
        .join(priors.select("label", "log_prior"), on="label")
    )
    scaffold = (
        base.select("__id")
        .distinct()
        .join(doc_tok, on="__id", how="left")
        .na.fill({"__tok": 0})
        .crossJoin(F.broadcast(consts))
    )
    scored = scaffold.join(matched, on=["__id", "label"], how="left")
    mscore = F.coalesce(F.col("__mscore"), F.lit(0.0))
    mtok = F.coalesce(F.col("__mtok"), F.lit(0))
    score = (
        F.col("log_prior")
        + mscore
        + (F.col("__tok") - mtok).cast("double") * F.col("__dflt")
    )
    out = scored.select(
        F.col("__id").alias(id_col),
        "label",
        (F.round(score, 6) + 0.0).alias("score"),
    )
    wr = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.col("label")
    )
    return out.withColumn("is_pred", F.row_number().over(wr) == 1)


def chi2_terms(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    top_n: int = 10,
) -> DataFrame:
    """Per-label chi-square feature selection — the classic
    "which words DISTINGUISH this label" ranking (sklearn chi2 /
    Yang & Pedersen 1997's best text-feature criterion; the NB/quality-
    classifier companion that tells you WHY a label separates): for
    each (word, label), the 2×2 document-presence table

        a = docs of y containing w     b = other docs containing w
        c = docs of y without w        d = other docs without w
        chi2 = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    Output: the top_n terms per label under the total order (chi2 DESC,
    w): (label, w, n_docs_with BIGINT = a, chi2 DOUBLE round 4;
    degenerate margins — a word in every doc, a label owning all docs —
    yield chi2 NULL and rank last). Presence is binary per doc
    (`source_overlap`'s convention).

    Plan: one distinct (label, doc, word) explode collapses the corpus;
    per-(label, word) doc counts are the only data-sized shuffle;
    word doc-frequency and label doc counts are vocab-/labels-sized
    join-backs; b, c, d are ARITHMETIC from those margins — the 2×2
    never materializes its zero cells. Top-n is a per-label rank
    window over the cells table."""
    lab = F.col(label_col)
    nn = df.filter(lab.isNotNull() & F.col(text_col).isNotNull())
    cells = (
        nn.select(
            lab.alias("label"),
            F.explode(F.array_distinct(words_expr(text_col))).alias("w"),
        )
        .groupBy("label", "w")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    n_y = nn.groupBy(lab.alias("label")).agg(
        F.count(F.lit(1)).alias("__ny")
    )
    n_tot = n_y.agg(F.sum("__ny").alias("__N"))
    df_w = cells.groupBy("w").agg(F.sum("a").alias("__dfw"))
    j = (
        cells.join(df_w, on="w")
        .join(n_y, on="label")
        .crossJoin(F.broadcast(n_tot))
    )
    a = F.col("a").cast("double")
    b = (F.col("__dfw") - F.col("a")).cast("double")
    c = (F.col("__ny") - F.col("a")).cast("double")
    d = (F.col("__N") - F.col("__ny")).cast("double") - b
    n = F.col("__N").cast("double")
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = F.when(
        den > 0, n * (a * d - b * c) * (a * d - b * c) / den
    )
    scored = j.select(
        "label",
        "w",
        F.col("a").alias("n_docs_with"),
        (F.round(chi2, 4) + 0.0).alias("chi2"),
    )
    wr = Window.partitionBy("label").orderBy(
        F.desc_nulls_last("chi2"), F.col("w")
    )
    return (
        scored.withColumn("__r", F.row_number().over(wr))
        .filter(F.col("__r") <= top_n)
        .drop("__r")
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction over the corpus (Rose et al. 2010,
    Rapid Automatic Keyword Extraction) — the unsupervised "what is
    this corpus about" pass: candidate phrases are maximal runs of
    non-stopwords, each word scores degree/frequency (degree = summed
    length of phrases containing it — co-occurrence reach; frequency =
    appearances), and a phrase scores the sum of its word scores.
    Output: the corpus's top_n phrases under the total order (score
    DESC, phrase): (phrase STRING, n_occurrences BIGINT, n_words INT,
    score DOUBLE round 4).

    The phrase segmentation is STRING-LEVEL and engine-portable:
    lowercase → non-letters to spaces → stopwords (word-boundary
    anchored alternation over the fixed STOPWORDS list) to '|' →
    split — no per-row Python, and the SQL oracle replays the identical
    literals. Plan: explode (doc, phrase) rows; per-word (freq, degree)
    is a vocab-sized agg; the phrase score joins word scores back
    phrase-word-keyed; TakeOrdered keeps top_n. The only data-sized
    shuffles are the phrase and word counts."""
    from pandasvcf_spark.functions.text import STOPWORDS

    sw_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z]+", " ")
    seg = F.regexp_replace(norm, sw_pat, "|")
    phrase_arr = F.filter(
        F.transform(
            F.split(seg, r"\|"),
            lambda s: F.trim(F.regexp_replace(s, r"\s+", " ")),
        ),
        lambda s: s != "",
    )
    phrases = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(phrase_arr).alias("phrase")
    )
    pw = phrases.select(
        "phrase", F.split(F.col("phrase"), " ").alias("__ws")
    ).select("phrase", "__ws", F.size("__ws").alias("__len"))
    word_stats = (
        pw.select(F.explode("__ws").alias("w"), "__len")
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("__freq"),
            F.sum("__len").alias("__deg"),
        )
        .select(
            "w",
            (F.col("__deg").cast("double")
             / F.col("__freq").cast("double")).alias("__wscore"),
        )
    )
    pcounts = pw.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.max("__len").alias("__len"),
    )
    scored = (
        pcounts.select(
            "phrase",
            "n_occurrences",
            "__len",
            F.explode(F.split(F.col("phrase"), " ")).alias("w"),
        )
        .join(word_stats, on="w")
        .groupBy("phrase", "n_occurrences", "__len")
        .agg(F.sum("__wscore").alias("__score"))
    )
    return (
        scored.select(
            "phrase",
            "n_occurrences",
            F.col("__len").cast("int").alias("n_words"),
            (F.round(F.col("__score"), 4) + 0.0).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_n)
    )


def corpus_bleu2(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
) -> DataFrame:
    """Corpus-level BLEU-2 (Papineni et al. 2002) + ROUGE-2 recall
    (Lin 2004) of candidate texts against references — the
    generation-quality loop for model-output evaluation at corpus
    scale. Corpus (not sentence) aggregation: clipped n-gram matches
    and totals are summed over ALL pairs before the ratio, so no
    per-sentence smoothing is needed:

        p_n  = sum_pairs clipped_n / sum_pairs cand_total_n   (n = 1, 2)
        BP   = min(1, exp(1 - ref_len / cand_len))
        BLEU = BP * exp((ln p1 + ln p2) / 2)     (NULL if any p_n = 0)
        ROUGE-2 recall = sum clipped_2 / sum ref_total_2

    Tokens are the repo-standard `[a-z]+` runs of the lowercased text
    (functions/text.words_expr); clipping is per pair per gram:
    min(cand count, ref count).

    Output: ONE row (n_pairs BIGINT, cand_len BIGINT, ref_len BIGINT,
    p1, p2, bp, bleu2, rouge2 DOUBLE round 6).

    Plan shape: candidate and reference n-grams are counted by
    (pair, n, gram) — two partial-aggregated shuffles on the SAME key,
    so the clip join is co-partitioned; everything after is a 1-row
    global agg. The gram relations are pair x distinct-gram sized,
    never corpus x corpus.
    """
    from pandasvcf_spark.functions.text import words_expr

    def grams(col, tag):
        ws = words_expr(col)
        uni = ws
        big = F.zip_with(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
            F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return (
            pairs.select(
                F.col(id_col).alias("__pid"),
                F.explode(
                    F.concat(
                        F.transform(
                            uni,
                            lambda g: F.struct(
                                F.lit(1).alias("n"), g.alias("g")
                            ),
                        ),
                        F.transform(
                            big,
                            lambda g: F.struct(
                                F.lit(2).alias("n"), g.alias("g")
                            ),
                        ),
                    )
                ).alias("__ng"),
            )
            .select(
                "__pid",
                F.col("__ng.n").alias("__n"),
                F.col("__ng.g").alias("__g"),
            )
            .groupBy("__pid", "__n", "__g")
            .agg(F.count(F.lit(1)).alias(tag))
        )

    base = pairs.filter(
        F.col(id_col).isNotNull()
        & F.col(cand_col).isNotNull()
        & F.col(ref_col).isNotNull()
    )
    pairs = base  # grams() closes over the filtered frame
    c = grams(cand_col, "__cc")
    r = grams(ref_col, "__rc")
    j = c.join(r, ["__pid", "__n", "__g"], "full_outer").select(
        "__n",
        F.coalesce(F.col("__cc"), F.lit(0)).alias("__cc"),
        F.coalesce(F.col("__rc"), F.lit(0)).alias("__rc"),
    )
    agg = j.groupBy().agg(
        F.sum(F.when(F.col("__n") == 1, F.least("__cc", "__rc")))
        .cast("double")
        .alias("__m1"),
        F.sum(F.when(F.col("__n") == 2, F.least("__cc", "__rc")))
        .cast("double")
        .alias("__m2"),
        F.sum(F.when(F.col("__n") == 1, F.col("__cc")))
        .cast("long")
        .alias("cand_len"),
        F.sum(F.when(F.col("__n") == 2, F.col("__cc")))
        .cast("double")
        .alias("__t2"),
        F.sum(F.when(F.col("__n") == 1, F.col("__rc")))
        .cast("long")
        .alias("ref_len"),
        F.sum(F.when(F.col("__n") == 2, F.col("__rc")))
        .cast("double")
        .alias("__rt2"),
    )
    np = base.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    a = agg.join(F.broadcast(np))
    cl = F.col("cand_len").cast("double")
    rl = F.col("ref_len").cast("double")
    p1 = F.col("__m1") / cl
    p2 = F.col("__m2") / F.col("__t2")
    bp = F.least(F.lit(1.0), F.exp(F.lit(1.0) - rl / cl))
    ok = (
        (F.col("cand_len") > 0)
        & (F.col("__t2") > 0)
        & (F.col("__m1") > 0)
        & (F.col("__m2") > 0)
    )
    bleu = bp * F.exp((F.log(p1) + F.log(p2)) / F.lit(2.0))
    return a.select(
        "n_pairs",
        "cand_len",
        "ref_len",
        F.round(F.when(F.col("cand_len") > 0, p1), 6).alias("p1"),
        F.round(F.when(F.col("__t2") > 0, p2), 6).alias("p2"),
        F.round(F.when(F.col("cand_len") > 0, bp), 6).alias("bp"),
        F.round(F.when(ok, bleu), 6).alias("bleu2"),
        F.round(
            F.when(F.col("__rt2") > 0, F.col("__m2") / F.col("__rt2")), 6
        ).alias("rouge2"),
    )


def code_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sym_threshold: float = 0.02,
    camel_threshold: int = 3,
) -> DataFrame:
    """Code-vs-prose heuristic signals per document — the corpus-
    curation router that decides whether a document flows to the code
    or the prose pipeline (tokenizer choice, quality filters and
    dedup shingle size all differ):

        sym_ratio   = density of {}();=<> characters
        camel_pairs = count of lowercase->uppercase transitions
        is_code     = sym_ratio > sym_threshold
                      OR camel_pairs >= camel_threshold

    Pure column expressions (one regexp strip + one extract-all per
    row, zero Python); thresholds are heuristic by design — the
    operator reports the raw signals so callers can re-cut offline.

    Output: (id, n_chars BIGINT, sym_ratio DOUBLE round 6,
    camel_pairs BIGINT, is_code BOOLEAN); sym_ratio NULL on empty
    text.
    """
    base = df.filter(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.length(
            F.regexp_replace(F.col(text_col), "[^{}();=<>]", "")
        ).alias("__sym"),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit("[a-z][A-Z]"), 0
            )
        ).alias("__camel"),
    )
    ratio = F.col("__sym").cast("double") / F.col("n_chars")
    return base.select(
        id_col,
        "n_chars",
        F.round(F.when(F.col("n_chars") > 0, ratio), 6).alias(
            "sym_ratio"
        ),
        F.col("__camel").cast("long").alias("camel_pairs"),
        F.when(
            F.col("n_chars") > 0,
            (ratio > F.lit(sym_threshold))
            | (F.col("__camel") >= F.lit(camel_threshold)),
        )
        .otherwise(F.lit(False))
        .alias("is_code"),
    )


def term_burstiness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    top_n: int = 30,
) -> DataFrame:
    """Term burstiness (Church & Gale 1995): collection frequency over
    document frequency per word — content words BURST (appear many
    times in few documents: cf/df high), function words spread
    (cf/df ~ 1 per containing doc is low relative to their cf). The
    corpus-linguistics signal behind stopword induction and keyword
    weighting, complementing TF-IDF's document-level view.

    Output: top_n rows (word, cf BIGINT, df BIGINT, burst DOUBLE
    round 4 = cf/df), ordered by (burst DESC, word) over words with
    df >= min_df — the rounded-score cut (exact rational burst, so
    the order is engine-stable anyway).

    Plan: one explode → one word-keyed two-counter agg (cf = count,
    df = distinct docs via a (word, doc) pre-distinct) → TakeOrdered.
    """
    from pandasvcf_spark.functions.text import words_expr

    toks = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("__d"),
        F.explode(words_expr(text_col)).alias("word"),
    )
    cf = toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cf")
    )
    dfreq = (
        toks.distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    j = cf.join(dfreq, "word").filter(F.col("df") >= min_df)
    scored = j.select(
        "word",
        "cf",
        "df",
        F.round(
            F.col("cf").cast("double") / F.col("df").cast("double"), 4
        ).alias("burst"),
    )
    return scored.orderBy(
        F.col("burst").desc(), F.col("word").asc()
    ).limit(top_n)


def ntile_bucket_stats(
    df: DataFrame,
    group_col: str,
    score_col: str,
    n_buckets: int = 3,
    max_cells: int | None = 1_000_000,
) -> DataFrame:
    """Per-group quantile-bucket aggregates — the CCNet head/middle/
    tail device (Wenzek et al. 2020: split each language's documents
    into perplexity terciles, keep the head): for every group, rows
    are cut into `n_buckets` rank buckets with EXACT SQL ntile
    semantics (larger buckets first), and each (group, bucket) reports
    its size and score stats.

    Never sorts rows. The input collapses to (group, score) CELLS
    (tripwired via `max_cells` — scores are expected pre-rounded, the
    ECDF-cell convention); one per-group running count over the cells
    gives each cell its global rank interval [lo, hi]; ntile bucket
    boundaries are pure arithmetic from the group size (q = n div B,
    r = n mod B; bucket b holds ranks [(b-1)q + min(b-1, r) + 1, ...]),
    so each cell's contribution to each bucket is an interval-overlap
    count — no row-level tiebreak is ever materialized. Because rows
    sharing a cell are ties, every rank-consistent assignment yields
    these exact per-bucket counts and score sums: the result equals
    ntile() OVER (PARTITION BY group ORDER BY score, any_tiebreak).

    Output: (group_col, bucket INT 1-based, n_rows BIGINT, avg_score,
    min_score, max_score DOUBLE round 4). Plan: one data-sized
    groupBy; the cell window is PARTITION BY group (the per-group
    cell ladder — the stats-shelf watch item, tripwired); the bucket
    explode is x n_buckets over cells only."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    from pandasvcf_spark.operators.stats._guards import _assert_cell_bound

    g = F.col(group_col)
    s = F.col(score_col).cast("double")
    nn = df.filter(g.isNotNull() & s.isNotNull())
    base = nn.select(g.alias("__g"), s.alias("__s"))
    _assert_cell_bound(
        base, ["__g", "__s"], "ntile_bucket_stats", max_cells,
        plan_word="per-group (group, score) rank-cell ladder",
    )
    cells = base.groupBy("__g", "__s").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wp = Window.partitionBy("__g")
    w_cum = wp.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ladder = cells.select(
        "__g", "__s", "__cnt",
        F.sum("__cnt").over(w_cum).alias("__hi"),
        F.sum("__cnt").over(wp).alias("__n"),
    ).withColumn("__lo", F.col("__hi") - F.col("__cnt") + 1)
    b = F.col("__b")
    n = F.col("__n")
    q = F.floor(n / n_buckets)
    r = n % n_buckets
    start = (b - 1) * q + F.least(b - 1, r) + 1
    size = q + F.when(b <= r, 1).otherwise(0)
    end = start + size - 1
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("__hi"), end) - F.greatest(F.col("__lo"), start) + 1,
    )
    per = (
        ladder.select(
            "__g", "__s", "__hi", "__lo", "__n",
            F.explode(
                F.sequence(F.lit(1), F.lit(n_buckets))
            ).alias("__b"),
        )
        .withColumn("__ov", ov)
        .filter(F.col("__ov") > 0)
    )
    return per.groupBy(
        F.col("__g").alias(group_col), F.col("__b").cast("int").alias("bucket")
    ).agg(
        F.sum("__ov").cast("long").alias("n_rows"),
        (
            F.round(F.sum(F.col("__s") * F.col("__ov")) / F.sum("__ov"), 4)
            + F.lit(0.0)
        ).alias("avg_score"),
        (F.round(F.min("__s"), 4) + F.lit(0.0)).alias("min_score"),
        (F.round(F.max("__s"), 4) + F.lit(0.0)).alias("max_score"),
    )


def moore_lewis_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    in_domain,
) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010) — THE classical targeted-data selector for LM
    pipelines: score every document by

        ce_diff = avg over tokens of
                  [ log10 P_in(w) − log10 P_gen(w) ]

    where P_in is an add-one-smoothed unigram LM over the IN-DOMAIN
    slice (`in_domain`: boolean Column; NULL = out) and P_gen over the
    whole corpus, both sharing one vocabulary (V = distinct corpus
    words, so in-domain OOV mass is well-defined). Select the highest
    ce_diff tail to build an in-domain-like subcorpus from general
    data. Documents with no tokens drop (nothing to score).

    Plan: one token explode; ONE word-keyed groupBy builds BOTH LMs
    (c_all, conditional c_in — vocabulary-sized); totals are a 1-row
    broadcast; scoring is the token stream equi-joined to the
    vocabulary table + one per-doc agg. Two data-sized shuffles (word
    key, doc key) — the t_bm25/t_tfidf shape; no LM ever materializes
    per-doc state.

    Output: (id_col, n_words BIGINT, ce_diff DOUBLE round 4)."""
    ind = in_domain.cast("boolean")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.when(ind, 1).otherwise(0).alias("__in"),
        F.explode(words_expr(text_col)).alias("__w"),
    )
    stats = toks.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__c_all"),
        F.sum("__in").alias("__c_in"),
    )
    tot = stats.agg(
        F.sum("__c_all").alias("__na"),
        F.sum("__c_in").alias("__ni"),
        F.count(F.lit(1)).alias("__v"),
    )
    lp = F.log10(
        (F.col("__c_in") + 1)
        / (F.col("__ni") + F.col("__v")).cast("double")
    ) - F.log10(
        (F.col("__c_all") + 1)
        / (F.col("__na") + F.col("__v")).cast("double")
    )
    scored = (
        toks.join(stats, on="__w")
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), lp.alias("__lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        (F.round(F.avg("__lp"), 4) + F.lit(0.0)).alias("ce_diff"),
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    in_domain,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") — `moore_lewis_
    scores`'s scale path: features are HASHED word BIGRAMS (feature
    hashing bounds the model at `n_buckets` whatever the vocabulary —
    the device that keeps a 100 TB corpus's "vocabulary" table a
    fixed-size grid), and the weight is the per-feature log ratio of
    add-one-smoothed in-domain vs corpus bucket models:

        log w(doc) = avg over bigram buckets b of
                     [ log10 P_in(b) − log10 P_gen(b) ]

    Resample/keep the top tail to shift the corpus toward the target
    (the resampling step is the caller's cut — this operator is the
    scorer). Hash = the portable polynomial over the bigram,
    Knuth-scrambled mod n_buckets (the countmin_sketch device), so
    the whole model is ANSI-SQL-replayable. Docs with < 2 words drop
    (no bigrams).

    Output: (id_col, n_bigrams BIGINT, logw DOUBLE round 4). Plan:
    one bigram explode; ONE n_buckets-bounded conditional groupBy
    builds both models; scoring is the bigram stream equi-joined to
    the bucket grid + one per-doc agg — the t_moore_lewis shape with
    the vocabulary table swapped for a fixed grid."""
    from pandasvcf_spark.functions.text import (
        POLY_MOD,
        poly_hash_expr,
        word_ngrams_expr,
    )

    if n_buckets < 2:
        raise ValueError(f"need n_buckets >= 2, got {n_buckets}")
    ind = in_domain.cast("boolean")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.when(ind, 1).otherwise(0).alias("__in"),
        F.explode(word_ngrams_expr(text_col, 2)).alias("__g"),
    )
    h = poly_hash_expr(F.col("__g"))
    b = ((h * F.lit(2654435761)) % F.lit(POLY_MOD)) % F.lit(n_buckets)
    buck = toks.select(F.col(id_col), "__in", b.alias("__b"))
    stats = buck.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__c_all"),
        F.sum("__in").alias("__c_in"),
    )
    tot = stats.agg(
        F.sum("__c_all").alias("__na"),
        F.sum("__c_in").alias("__ni"),
    )
    lw = F.log10(
        (F.col("__c_in") + 1)
        / (F.col("__ni") + F.lit(n_buckets)).cast("double")
    ) - F.log10(
        (F.col("__c_all") + 1)
        / (F.col("__na") + F.lit(n_buckets)).cast("double")
    )
    scored = (
        buck.join(stats, on="__b")
        .crossJoin(F.broadcast(tot))
        .select(F.col(id_col), lw.alias("__lw"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (F.round(F.avg("__lw"), 4) + F.lit(0.0)).alias("logw"),
    )
