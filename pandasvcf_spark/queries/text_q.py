"""Text-analysis and dedup catalog entries over `documents` (SURVEY §2.11).

The text expressions (functions/text.py) are deterministic and
SQL-mirrorable by construction — the oracle recomputes them with DuckDB's
list/regex functions. The dedup corpus doubles every document (one exact
copy with whitespace noise under a shifted id), so dedup is non-trivial and
the expected survivors are computable on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandasvcf_spark.functions.text import (
    TOKEN_PATTERN,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
    whitespace_token_count_expr,
    word_ngrams_expr,
)
from pandasvcf_spark.operators.dedup import (
    dedup_stats,
    minhash_near_dup_pairs,
    ngram_jaccard_expr,
)
from pandasvcf_spark.queries.registry import QUERIES, register
from pandasvcf_spark.queries.tables import load


def _noisy_corpus(spark, sf_dir):
    """documents ∪ whitespace-noised exact copies under doc_id+10^7 (an offset no real doc_id reaches at any scale factor — id collisions would corrupt pair identity)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = d.select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat("text", F.lit("  ")).alias("text"),
    )
    return d.unionByName(noisy)


_CORPUS_CTE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text || '  ' FROM documents
)
"""

#: DuckDB twin of functions/text.py words_expr
_WORDS = "regexp_extract_all(lower(text), '[a-z]+')"


@register(
    "t_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN.replace("'", "''")}')) AS BIGINT) AS re_tokens
    FROM documents
    """,
)
def t_token_counts(spark, sf_dir):
    """Token counting — whitespace and BPE-ish regex (LLM budget proxies)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        whitespace_token_count_expr("text").alias("ws_tokens"),
        token_count_expr("text").alias("re_tokens"),
    )


@register(
    "t_quality_score",
    headline=True,
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, text, {_WORDS} AS words,
             regexp_replace(text, '\\s+', '', 'g') AS nospace
      FROM documents
    ), scores AS (
      SELECT doc_id,
        CASE WHEN length(text) >= 100 AND length(text) <= 20000 THEN 1.0
             WHEN length(text) >= 20 THEN 0.5 ELSE 0.0 END AS len_score,
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE list_sum(list_transform(words, w -> length(w)))
                  / CAST(len(words) AS DOUBLE) END AS mwl,
        CASE WHEN length(nospace) = 0 THEN 0.0
             ELSE length(regexp_replace(nospace, '[A-Za-z0-9]', '', 'g'))
                  / CAST(length(nospace) AS DOUBLE) END AS punct,
        CASE WHEN len(words) = 0 THEN 0.0
             ELSE len(list_filter(words, w -> list_contains(
                    ['the','a','an','and','or','of','to','in','is','it',
                     'that','for','on','with','as','was','at','by','be','this'], w)))
                  / CAST(len(words) AS DOUBLE) END AS stop_ratio
      FROM feats)
    SELECT doc_id,
           round((len_score
                  + CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.0 END
                  + CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.0 END
                  + CASE WHEN stop_ratio >= 0.05 THEN 1.0 ELSE 0.0 END) / 4.0,
                 4) AS quality
    FROM scores
    """,
)
def t_quality_score(spark, sf_dir):
    """Composite quality heuristic (length band / mean word length /
    punctuation / stopword density)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.round(quality_score_expr("text"), 4).alias("quality")
    )


@register(
    "t_lang_id",
    oracle=f"""
    WITH sc AS (
      SELECT doc_id,
        len(list_filter({_WORDS}, w -> list_contains(['the','and','of','to','is','with'], w))) AS en,
        len(list_filter({_WORDS}, w -> list_contains(['der','die','und','das','ist','nicht'], w))) AS de,
        len(list_filter({_WORDS}, w -> list_contains(['le','la','les','et','est','une'], w))) AS fr,
        len(list_filter({_WORDS}, w -> list_contains(['el','los','las','es','una','que'], w))) AS es
      FROM documents)
    SELECT doc_id,
           CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                WHEN fr >= es AND fr > 0 THEN 'fr'
                WHEN es > 0 THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM sc
    """,
)
def t_lang_id(spark, sf_dir):
    """Function-word language ID heuristic (deterministic tie precedence)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", lang_id_expr("text").alias("lang_pred")
    )


@register(
    "dedup_exact",
    headline=True,
    oracle=_CORPUS_CTE
    + """
    SELECT CAST(min(doc_id) AS BIGINT) AS kept_id, count(*) AS dup_cnt
    FROM corpus
    GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    """,
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup on the normalized-text fingerprint (SURVEY §2.11): group
    on the 8-byte xxhash64 key — the shuffle moves hashes, not documents.
    The oracle groups on the normalized text itself; identical partitioning
    assuming no 64-bit collisions (500 docs)."""
    from pandasvcf_spark.functions.text import fingerprint_expr

    corpus = _noisy_corpus(spark, sf_dir)
    return dedup_stats(corpus, fingerprint_expr("text"), "doc_id")


@register(
    "dedup_minhash_lsh",
    headline=True,
    # The oracle recomputes the TRUE near-dup pair set with exact trigram
    # Jaccard: the planted exact copies (i, i+10^7, J=1 — LSH recall is
    # guaranteed for identical shingle sets) plus the testdata's own
    # near-dup pairs in all four id variants (the offset copy has the same
    # word shingles as its original). At J >= 0.9 the per-pair LSH miss
    # probability is (1 - J^4)^16 < 1e-7 and the pipeline is deterministic;
    # equality of the two sets is verified, not assumed.
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents
    ), g AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 3 THEN []
        ELSE list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS t
      FROM d
    ), cand AS (
      -- lossless prefilter: J(A,B) >= 0.9 implies |A|,|B| within ratio 0.9
      -- of each other, so skip the expensive list_intersect elsewhere
      SELECT a.doc_id AS ia, b.doc_id AS ib,
             len(list_intersect(a.t, b.t))
               / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE) AS j
      FROM g a JOIN g b
        ON a.doc_id < b.doc_id
       AND len(a.t) * 10 >= len(b.t) * 9
       AND len(b.t) * 10 >= len(a.t) * 9
    ), keep AS (
      SELECT ia, ib, j FROM cand WHERE j >= 0.9
    )
    -- planted pairs: only docs with >= 3 words have a non-empty trigram
    -- set (mirrors the Spark side, which emits no signature rows — hence
    -- no pair — for shorter documents)
    SELECT CAST(doc_id AS BIGINT) AS id_a, CAST(doc_id + 10000000 AS BIGINT) AS id_b,
           CAST(1.0 AS DOUBLE) AS jaccard FROM d WHERE len(w) >= 3
    UNION ALL SELECT ia, ib, round(j, 4) FROM keep
    UNION ALL SELECT ia, ib + 10000000, round(j, 4) FROM keep
    UNION ALL SELECT ib, ia + 10000000, round(j, 4) FROM keep
    UNION ALL SELECT ia + 10000000, ib + 10000000, round(j, 4) FROM keep
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """Banded MinHash-LSH near-dup detection over documents ∪ exact copies.
    Candidates come from an equi-join on (band, key) — no crossJoin — and
    are verified with exact shingle Jaccard ≥ 0.9, filtering incidental band
    collisions. Finds both the planted copies and the corpus's own near-dup
    pairs (the oracle recomputes that exact set)."""
    corpus = _noisy_corpus(spark, sf_dir)
    pairs = minhash_near_dup_pairs(
        corpus,
        "doc_id",
        word_ngrams_expr("text", 3),
        num_hashes=64,
        bands=16,
        min_jaccard=0.9,
        # testdata is one small parquet file -> 2 scan partitions; spread the
        # tokenize/hash stages across the local cores (no-op at real scale)
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _simhash_oracle() -> str:
    """DuckDB twin of `simhash_near_dup_pairs` over the noisy corpus,
    generated from the SAME `_affine_coeffs` family the Spark operator
    uses — the 64 parity-vote aggregates and 4 chunk assemblies are unrolled
    into SQL, so the two engines compute bit-identical keys (the base hash
    is the portable polynomial fold, not xxhash64)."""
    from pandasvcf_spark.operators.dedup import _MERSENNE31, _affine_coeffs

    p = _MERSENNE31
    votes = ",\n             ".join(
        f"sum(CASE WHEN ((CAST({a} AS BIGINT) * h + {b}) % {p}) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{i}"
        for i, (a, b) in enumerate(_affine_coeffs(64))
    )
    chunks = ",\n             ".join(
        "CAST("
        + " + ".join(
            f"CASE WHEN v{c * 16 + j} > 0 THEN {1 << j} ELSE 0 END"
            for j in range(16)
        )
        + f" AS BIGINT) AS c{c}"
        for c in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.c{c}, b.c{c}))" for c in range(4))
    same = " OR ".join(f"a.c{c} = b.c{c}" for c in range(4))
    return (
        _CORPUS_CTE
        + f"""
    , tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
      FROM corpus
    ), th AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % {p}) AS h
      FROM tok
    ), v AS (
      SELECT doc_id, {votes}
      FROM th GROUP BY doc_id
    ), ch AS (
      SELECT doc_id, {chunks}
      FROM v
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({ham} AS INTEGER) AS hamming
    FROM ch a JOIN ch b ON a.doc_id < b.doc_id AND ({same})
    WHERE {ham} <= 3
    """
    )


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (portable polynomial/affine hash family,
    banded 16-bit chunks → one grouped bucket aggregation → streaming pair
    expansion, exact Hamming filter) over the noisy dedup corpus. The
    oracle recomputes the exact pair set in SQL — see `_simhash_oracle`."""
    from pandasvcf_spark.operators.dedup import simhash_near_dup_pairs

    corpus = _noisy_corpus(spark, sf_dir)
    return simhash_near_dup_pairs(
        corpus,
        "doc_id",
        max_hamming=3,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@register(
    "t_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dfc AS (
      SELECT term, count(*) AS dfc FROM tf GROUP BY 1
    ), scored AS (
      SELECT doc_id, term, tf,
             tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (dfc + 1.0))
                   + 1.0) AS tfidf
      FROM tf JOIN dfc USING (term)
      WHERE doc_id < 20
    )
    SELECT doc_id, term, tf, round(tfidf, 4) AS tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored) WHERE rn <= 3
    """,
)
def t_tfidf_top_terms(spark, sf_dir):
    """Smoothed TF-IDF (operators/text_features.py): top-3 weighted terms
    per document for a bounded doc subset."""
    from pandasvcf_spark.operators.relational import rank_per_group
    from pandasvcf_spark.operators.text_features import tf_idf

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    scored = tf_idf(docs, n_docs=n).filter(F.col("doc_id") < 20)
    top = rank_per_group(
        scored, ["doc_id"], [F.desc("tfidf"), F.col("term")], k=3,
        method="row_number",
    )
    return top.select("doc_id", "term", "tf", F.round("tfidf", 4).alias("tfidf"))


@register(
    "t_bigram_jaccard",
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents WHERE doc_id < 12
    ), grams AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) < 2 THEN []
               ELSE list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1]) END) AS g
      FROM d)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CASE WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
                 ELSE len(list_intersect(a.g, b.g))
                      / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)
                 END, 4) AS jaccard
    FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    """,
)
def t_bigram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard similarity on a bounded pair set (the verify
    kernel the LSH pipeline reuses; bounded here — all-pairs at corpus scale
    is exactly what the LSH path avoids)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 12)
    g = d.select("doc_id", word_ngrams_expr("text", 2).alias("g"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(ngram_jaccard_expr(F.col("ga"), F.col("gb")), 4).alias("jaccard"),
    )


@register(
    "dedup_components",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents WHERE doc_id < 200
    ), grams AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 2 THEN []
        ELSE list_transform(generate_series(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i + 1]) END) AS g
      FROM d),
    prs AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib
      FROM grams a JOIN grams b ON a.doc_id < b.doc_id
      WHERE CASE WHEN len(list_distinct(list_concat(a.g, b.g))) = 0 THEN 0.0
            ELSE len(list_intersect(a.g, b.g))
                 / CAST(len(list_distinct(list_concat(a.g, b.g))) AS DOUBLE)
            END >= 0.2),
    edges AS (SELECT ia AS a, ib AS b FROM prs
              UNION ALL SELECT ib, ia FROM prs),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id, id AS lbl FROM verts
      UNION
      SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id)
    SELECT id, CAST(min(lbl) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
)
def dedup_components(spark, sf_dir):
    """Transitive near-dup clustering (operators/dedup.connected_components,
    iterative min-label propagation) over an exact-Jaccard pair graph on a
    bounded doc subset; the DuckDB oracle recomputes the same closure with
    a recursive CTE. The bounded all-pairs here is the PAIR SOURCE for the
    check only — at corpus scale pairs come from the LSH operators and the
    component step's cost is per-ROUND shuffles on the (small) pair graph,
    not the corpus."""
    from pandasvcf_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_expr,
    )
    from pandasvcf_spark.functions.text import word_ngrams_expr

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    g = d.select("doc_id", word_ngrams_expr("text", 2).alias("g"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", ngram_jaccard_expr(F.col("ga"), F.col("gb")))
        .filter(F.col("j") >= 0.2)
        .select("id_a", "id_b")
    )
    return connected_components(pairs).select(
        "id", F.col("component").cast("long").alias("component")
    )


# Same pair graph and the same recursive-CTE oracle as dedup_components —
# the entry exists to drive the method='star' implementation (large-star/
# small-star contraction, operators/dedup._cc_star) through the driver's
# exact-value gate alongside the label-propagation default.
_COMPONENTS_ORACLE = QUERIES["dedup_components"].oracle


@register(
    "dedup_cluster_sizes",
    oracle=_COMPONENTS_ORACLE.replace(
        """    SELECT id, CAST(min(lbl) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
        """    , comp AS (SELECT id, min(lbl) AS component
             FROM reach GROUP BY id),
    sizes AS (SELECT component, count(*) AS n FROM comp GROUP BY 1)
    SELECT CAST(n AS BIGINT) AS cluster_size,
           count(*) AS n_clusters
    FROM sizes GROUP BY 1
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           (SELECT count(*) FROM d) - (SELECT count(*) FROM comp)
    """,
    ),
)
def dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram — the diagnostic a dedup run
    publishes next to its survivor count ("how much of the corpus sits
    in 2-clusters vs one giant template family"): component sizes from
    the same exact-Jaccard pair graph as `dedup_components`, plus the
    singleton row (docs in no cluster) computed arithmetically from two
    1-row aggregates — never an anti-join over the corpus. Output:
    (cluster_size BIGINT, n_clusters BIGINT)."""
    from pandasvcf_spark.functions.text import word_ngrams_expr
    from pandasvcf_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_expr,
    )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    g = d.select("doc_id", word_ngrams_expr("text", 2).alias("g"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", ngram_jaccard_expr(F.col("ga"), F.col("gb")))
        .filter(F.col("j") >= 0.2)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs)
    hist = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(F.col("n").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )
    singles = (
        d.agg(F.count(F.lit(1)).alias("__all"))
        .crossJoin(comp.agg(F.count(F.lit(1)).alias("__in")))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("__all") - F.col("__in")).alias("n_clusters"),
        )
    )
    return hist.unionByName(singles)


@register("dedup_components_star", oracle=_COMPONENTS_ORACLE)
def dedup_components_star(spark, sf_dir):
    """connected_components(method='star'): O(log n)-round large-star/
    small-star contraction over the same exact-Jaccard pair graph as
    `dedup_components` — identical labeling contract (component = min id),
    verified against the identical recursive-CTE oracle."""
    from pandasvcf_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_expr,
    )
    from pandasvcf_spark.functions.text import word_ngrams_expr

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    g = d.select("doc_id", word_ngrams_expr("text", 2).alias("g"))
    a = g.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", ngram_jaccard_expr(F.col("ga"), F.col("gb")))
        .filter(F.col("j") >= 0.2)
        .select("id_a", "id_b")
    )
    return connected_components(pairs, method="star").select(
        "id", F.col("component").cast("long").alias("component")
    )


@register(
    "t_redact_pii",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             text || ' contact u' || doc_id ||
             '@example.com or https://ex.org/p/' || doc_id ||
             ' tel +1 (555) 010-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
             AS t
      FROM documents WHERE doc_id < 300)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               'https?://[^\\s]+', '<URL>', 'g'),
             '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS redacted
    FROM d
    """,
)
def t_redact_pii(spark, sf_dir):
    """PII scrubbing (functions/text.redact_pii_expr) — the preprocessing
    step every training corpus runs first. Deterministic synthetic PII is
    appended per doc so every pattern fires; patterns live in the
    Java-regex ∩ RE2 common dialect, so the oracle runs the SAME literal
    patterns ('g' = Spark's replace-all default). Past the driver window
    (contract-guard covered)."""
    from pandasvcf_spark.functions.text import redact_pii_expr

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@example.com or https://ex.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" tel +1 (555) 010-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    return d.select("doc_id", redact_pii_expr(t).alias("redacted"))


@register(
    "t_chunk_windows",
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents WHERE doc_id < 40),
    s AS (
      SELECT doc_id, w,
             CASE WHEN len(w) <= 0 THEN []
                  ELSE generate_series(0,
                         greatest(CAST(floor((len(w) - 1) / 30.0) AS INT), 0))
             END AS starts
      FROM d)
    SELECT doc_id,
           CAST(unnest(list_transform(generate_series(1, len(starts)),
                                      i -> i - 1)) AS INT) AS chunk_idx,
           unnest(list_transform(starts,
                  st -> array_to_string(w[(st * 30 + 1):(st * 30 + 40)], ' ')))
             AS chunk
    FROM s
    """,
)
def t_chunk_windows(spark, sf_dir):
    """Token-window chunking (functions/text.chunk_windows_expr): 40-token
    windows every 30 tokens (10-token overlap) — the context-window split
    a training/embedding pipeline applies before tokenization. Pure HOF
    expression; posexplode only at the edge. Past the driver window
    (contract-guard covered)."""
    from pandasvcf_spark.functions.text import chunk_windows_expr

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    return d.select(
        "doc_id",
        F.posexplode(chunk_windows_expr("text", size=40, stride=30)).alias(
            "chunk_idx", "chunk"
        ),
    ).select("doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"), "chunk")


@register(
    "t_winnow_fingerprints",
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id < 80),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 5 THEN []
        ELSE list_transform(generate_series(1, len(t) - 4),
                            i -> substr(t, i, 5)) END AS sgl
      FROM d),
    hs AS (
      SELECT doc_id,
        list_transform(sgl, s ->
          (CAST(ord(substr(s, 1, 1)) AS BIGINT) * 923521
           + CAST(ord(substr(s, 2, 1)) AS BIGINT) * 29791
           + CAST(ord(substr(s, 3, 1)) AS BIGINT) * 961
           + CAST(ord(substr(s, 4, 1)) AS BIGINT) * 31
           + CAST(ord(substr(s, 5, 1)) AS BIGINT)) % 2147483647) AS h
      FROM sh),
    mins AS (
      SELECT doc_id,
        CASE WHEN len(h) = 0 THEN CAST([] AS BIGINT[])
             WHEN len(h) < 4 THEN [list_min(h)]
             ELSE list_transform(generate_series(1, len(h) - 3),
                                 i -> list_min(h[i:i+3])) END AS m
      FROM hs)
    SELECT doc_id, list_sort(list_distinct(m)) AS fp FROM mins
    """,
)
def t_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprint sets under EXACT oracle check via the
    portable polynomial hash family (`winnowing_fingerprints_expr(
    portable=True)`) — the oracle expands the k=5 fold to its closed
    polynomial form, exact because mod distributes and the pre-mod sum
    fits BIGINT. Closes the last no-oracle row of the text family (the
    same move that gave SimHash its oracle in round 4). Fingerprints
    sorted on both sides for a canonical array value. Past the driver
    window (contract-guard covered)."""
    from pandasvcf_spark.functions.text import winnowing_fingerprints_expr

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    return d.select(
        "doc_id",
        F.array_sort(
            winnowing_fingerprints_expr("text", k=5, window=4, portable=True)
        ).alias("fp"),
    )


_SQL_POLY_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s}, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(acc, c) -> (acc * 31 + c) % 2147483647)"
)


@register(
    "t_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")} % 10000 < 1000
    """,
)
def t_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample (operators/sampling.hash_sample):
    keyed on the portable content hash, not RAND() — identical row set on
    every run, partitioning and engine (the oracle literally recomputes
    it), and nested (the 1% sample is a subset of the 10%). The pushdown-
    friendly predicate form every reproducible-subsampling step needs."""
    from pandasvcf_spark.operators.sampling import hash_sample

    d = load(spark, sf_dir, "documents")
    return hash_sample(d, F.col("doc_id"), 0.10).select(
        "doc_id", "lang", "source"
    )


@register(
    "t_cap_per_group",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 5
    """,
)
def t_cap_per_group(spark, sf_dir):
    """Per-(lang, source) quota of 5 docs, longest first (operators/
    sampling.cap_per_group) — corpus balancing. One window shuffle on the
    group key; the order includes doc_id so the kept set is a total-order
    function of the data, and WindowGroupLimit cuts mega-groups below the
    sort."""
    from pandasvcf_spark.operators.sampling import cap_per_group

    d = load(spark, sf_dir, "documents")
    return cap_per_group(
        d,
        ["lang", "source"],
        cap=5,
        order_by=[F.desc("n_chars"), F.col("doc_id")],
    ).select("doc_id", "lang", "source")


@register(
    "t_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS tokens
      FROM documents WHERE trim(text) <> ''),
    packed AS (
      SELECT doc_id, shard, tokens,
             COALESCE(SUM(tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS excl
      FROM toks)
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, tokens,
           -- // : DuckDB's '/' is FLOAT division and CAST rounds to
           -- nearest, so CAST(excl/512 AS BIGINT) would round UP half the
           -- bins; integer floor-div matches Spark's floor()
           CAST(excl // 512 AS BIGINT) AS bin_id,
           CAST(excl % 512 AS BIGINT) AS bin_offset
    FROM packed
    """,
)
def t_pack_sequences(spark, sf_dir):
    """Sharded next-fit sequence packing (operators/sampling.
    pack_sequences): 8 shards pack independently (the window partitions
    by shard — parallel, never a global single-partition sort), docs laid
    end-to-end by doc_id into 512-token bins; each doc carries its
    (bin_id, bin_offset) layout. The oracle recomputes the identical
    prefix-sum layout in SQL."""
    from pandasvcf_spark.operators.sampling import pack_sequences

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            (F.col("doc_id") % 8).alias("shard"),
            whitespace_token_count_expr("text").cast("long").alias("tokens"),
        )
    )
    out = pack_sequences(
        d, "tokens", budget=512, order_by=[F.col("doc_id")], shard_col="shard"
    )
    return out.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        "tokens",
        F.col("bin_id").cast("long").alias("bin_id"),
        F.col("bin_offset").cast("long").alias("bin_offset"),
    )


@register(
    "t_pack_global",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS tokens FROM documents),
    packed AS (
      SELECT doc_id, tokens,
             COALESCE(SUM(tokens) OVER (
               ORDER BY {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")} % 32,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
      FROM toks)
    SELECT doc_id, tokens,
           CAST(excl // 2048 AS BIGINT) AS bin_id,
           CAST(excl % 2048 AS BIGINT) AS bin_offset
    FROM packed
    """,
)
def t_pack_global(spark, sf_dir):
    """GLOBAL one-call sequence packing (operators/sampling.
    pack_sequences_global) — closes round 7's named gap (the sharded
    form's global variant was documented single-shard-only): the whole
    corpus lays end-to-end in the canonical content-hash order
    (poly_hash(doc_id) % 32, doc_id) into 2048-token bins with
    CONTINUOUS global bin ids, computed hierarchically — per-bucket
    totals to the driver, literal start offsets back, one PARALLEL
    per-bucket window; no global sort. The ORACLE is the sequential
    model itself (one global window over the same order), so the
    driver proves the two-pass layout is layout-invariant equal to the
    sequential walk."""
    from pandasvcf_spark.operators.sampling import pack_sequences_global

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("tokens")
    )
    out = pack_sequences_global(
        d, "tokens", budget=2048, key="doc_id", buckets=32
    )
    return out.select(
        "doc_id",
        "tokens",
        F.col("bin_id").cast("long").alias("bin_id"),
        F.col("bin_offset").cast("long").alias("bin_offset"),
    )


@register(
    "t_contamination",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
      FROM documents),
    grams AS (
      SELECT doc_id, list_distinct(CASE WHEN len(ws) < 2 THEN []
        ELSE list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i + 1]) END) AS g
      FROM w),
    ev AS (
      SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id < 10),
    docs AS (SELECT doc_id, g FROM grams WHERE doc_id >= 10),
    hits AS (
      SELECT d.doc_id, count(*) AS shared
      FROM (SELECT doc_id, unnest(g) AS gram FROM docs) d
      JOIN ev ON d.gram = ev.gram GROUP BY d.doc_id)
    SELECT d.doc_id,
           CAST(len(d.g) AS BIGINT) AS total_grams,
           CAST(COALESCE(h.shared, 0) AS BIGINT) AS shared_grams,
           round(CASE WHEN len(d.g) = 0 THEN 0.0
                 ELSE COALESCE(h.shared, 0) / CAST(len(d.g) AS DOUBLE) END,
                 4) AS overlap
    FROM docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def t_contamination(spark, sf_dir):
    """Benchmark decontamination (operators/text_features.
    contamination_overlap): docs 0-9 stand in as the eval set; every
    other doc reports how many of its distinct word bigrams appear in it.
    The eval gram set is built once and BROADCAST — the corpus is never
    shuffled by content, only (doc, matched-gram) hits reach the count
    aggregation. Filter `overlap >= t` upstream of training."""
    from pandasvcf_spark.operators.text_features import contamination_overlap

    d = load(spark, sf_dir, "documents")
    out = contamination_overlap(
        d.filter(F.col("doc_id") >= 10), d.filter(F.col("doc_id") < 10), n=2
    )
    return out.select(
        "doc_id",
        "total_grams",
        "shared_grams",
        F.round("overlap", 4).alias("overlap"),
    )


#: survivors = corpus minus every non-minimum member of a near-dup
#: component; the pair relation is the (already exact-value-verified)
#: dedup_minhash_lsh oracle embedded as a CTE, closed transitively with
#: the same recursive CTE as dedup_components.
_NEAR_PIPELINE_ORACLE = f"""
WITH RECURSIVE pr AS (
  -- derived-table wrapper: under WITH RECURSIVE, a CTE body containing a
  -- top-level UNION ALL is parsed as anchor+recursive-part and its nested
  -- CTEs vanish from the recursive scope; one subquery level restores
  -- ordinary scoping
  SELECT * FROM ({QUERIES["dedup_minhash_lsh"].oracle}) AS sub
),
edges AS (SELECT id_a AS a, id_b AS b FROM pr
          UNION ALL SELECT id_b, id_a FROM pr),
verts AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS lbl FROM verts
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
losers AS (SELECT id FROM comp WHERE id <> component),
corpus AS (
  SELECT doc_id FROM documents
  UNION ALL
  SELECT doc_id + 10000000 FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM corpus
WHERE doc_id NOT IN (SELECT id FROM losers)
"""


@register("dedup_near_pipeline", oracle=_NEAR_PIPELINE_ORACLE)
def dedup_near_pipeline(spark, sf_dir):
    """The one-call corpus-cleaning pipeline (operators/dedup.
    near_dedup_documents): MinHash-LSH pairs (exact-Jaccard verified at
    0.9) → connected components → minimum-id survivor per cluster, run
    over the noisy corpus (every doc + a planted whitespace-noised copy).
    The oracle recomputes survivors from the independently-verified exact
    pair set closed with a recursive CTE — end-to-end, not per-stage."""
    from pandasvcf_spark.operators.dedup import near_dedup_documents

    corpus = _noisy_corpus(spark, sf_dir)
    out = near_dedup_documents(
        corpus,
        "doc_id",
        word_ngrams_expr("text", 3),
        num_hashes=64,
        bands=16,
        min_jaccard=0.9,
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


@register(
    "t_repetition_stats",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    g AS (
      SELECT doc_id, unnest(CASE WHEN len(ws) < 2 THEN []
        ELSE list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i + 1]) END) AS gram
      FROM w),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
    r AS (
      SELECT doc_id, gram, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, gram) AS rn,
             SUM(cnt) OVER (PARTITION BY doc_id) AS total,
             COUNT(*) OVER (PARTITION BY doc_id) AS dist
      FROM c),
    ch AS (SELECT doc_id,
                  list_sum(list_transform(ws, x -> length(x))) AS wchars
           FROM w)
    SELECT r.doc_id,
           CAST(total AS BIGINT) AS total_grams,
           CAST(dist AS BIGINT) AS distinct_grams,
           round(1.0 - dist / CAST(total AS DOUBLE), 4) AS dup_gram_frac,
           gram AS top_gram,
           CAST(cnt AS BIGINT) AS top_gram_count,
           CASE WHEN wchars = 0 THEN 0.0
                ELSE round(cnt * length(replace(gram, ' ', ''))
                           / CAST(wchars AS DOUBLE), 4) END
             AS top_gram_char_frac
    FROM r JOIN ch ON r.doc_id = ch.doc_id
    WHERE rn = 1
    """,
)
def t_repetition_stats(spark, sf_dir):
    """Gopher-style repetition metrics (operators/text_features.
    repetition_stats): duplicate-bigram fraction and the fraction of word
    characters covered by the most frequent bigram (deterministic tie to
    the lexicographically smallest gram) — the boilerplate/spam gate of a
    corpus quality pipeline."""
    from pandasvcf_spark.operators.text_features import repetition_stats

    return repetition_stats(load(spark, sf_dir, "documents"), n=2)


@register(
    "t_boilerplate",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) < 8 THEN []
        ELSE list_transform(generate_series(1, len(ws) - 7),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
               || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6]
               || ' ' || ws[i+7]) END)) AS c
      FROM w),
    shared AS (SELECT c FROM g GROUP BY c HAVING count(*) >= 2)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS total_chunks,
           CAST(count(s.c) AS BIGINT) AS boiler_chunks,
           round(count(s.c) / CAST(count(*) AS DOUBLE), 4) AS boiler_frac
    FROM g LEFT JOIN shared s ON g.c = s.c
    GROUP BY g.doc_id
    """,
)
def t_boilerplate(spark, sf_dir):
    """Inter-document boilerplate fraction (operators/text_features.
    boilerplate_stats): distinct word 8-grams appearing in >= 2 documents
    mark templated/mirrored text — the cross-document filter per-doc
    repetition metrics cannot see. Two chunk-key shuffles, join co-
    partitioned with the counting aggregation."""
    from pandasvcf_spark.operators.text_features import boilerplate_stats

    return boilerplate_stats(
        load(spark, sf_dir, "documents"), n=8, min_docs=2
    )


@register(
    "t_word_logprob",
    oracle=f"""
    WITH wd AS (SELECT doc_id, unnest({_WORDS}) AS w FROM documents),
    freq AS (SELECT w, count(*) AS n FROM wd GROUP BY w),
    tot AS (SELECT sum(n) AS t FROM freq)
    SELECT wd.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           round(avg(log10(freq.n / CAST(tot.t AS DOUBLE))), 4)
             AS avg_logprob
    FROM wd JOIN freq ON wd.w = freq.w CROSS JOIN tot
    GROUP BY wd.doc_id
    """,
)
def t_word_logprob(spark, sf_dir):
    """Corpus-trained unigram log-probability quality score (operators/
    text_features.word_logprob_stats): mean log10 word probability per
    document under the corpus's own unigram distribution — the
    perplexity proxy that flags gibberish/rare-word-heavy docs without
    an external model."""
    from pandasvcf_spark.operators.text_features import word_logprob_stats

    return word_logprob_stats(load(spark, sf_dir, "documents"))


@register(
    "t_mix_sources",
    oracle=f"""
    SELECT doc_id, source, lang FROM documents
    WHERE {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")} % 10000 <
      CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                  WHEN 'src2' THEN 2000 WHEN 'src3' THEN 0
                  ELSE 1000 END
    """,
)
def t_mix_sources(spark, sf_dir):
    """Weighted pretraining mixture (operators/sampling.mix_sources):
    keep 100% of src0, 50% of src1, 20% of src2, none of src3 and 10% of
    everything else — one pure pushdown-able predicate whose per-source
    threshold is a literal-map lookup (no join, no second scan), keyed on
    the portable content hash so the oracle recomputes the exact row set
    and re-weighting keeps nested samples."""
    from pandasvcf_spark.operators.sampling import mix_sources

    d = load(spark, sf_dir, "documents")
    out = mix_sources(
        d,
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.2, "src3": 0.0},
        key="doc_id",
        default_fraction=0.1,
    )
    return out.select("doc_id", "source", "lang")


@register(
    "t_filter_funnel",
    oracle="""
    SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS survivors
    FROM documents
    UNION ALL
    SELECT 1, 'min_length',
           CAST(sum(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 2, 'english',
           CAST(sum(CASE WHEN n_chars >= 100 AND lang = 'en'
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 3, 'has_article',
           CAST(sum(CASE WHEN n_chars >= 100 AND lang = 'en'
                     AND contains(lower(text), ' the ')
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    """,
)
def t_filter_funnel(spark, sf_dir):
    """Corpus-cleaning funnel report (operators/sampling.filter_funnel):
    per-stage survivor counts for length -> lang-id -> content gates,
    CONJOINED so the funnel is monotone, computed in ONE scan (one
    conditional partial-aggregated sum per stage — never a job per
    stage). The oracle recomputes each prefix conjunction independently."""
    from pandasvcf_spark.operators.sampling import filter_funnel

    d = load(spark, sf_dir, "documents")
    out = filter_funnel(
        d,
        [
            ("min_length", F.col("n_chars") >= 100),
            ("english", F.col("lang") == "en"),
            ("has_article", F.lower(F.col("text")).contains(" the ")),
        ],
    )
    return out.select(
        "stage_idx", "stage", F.col("survivors").cast("long").alias("survivors")
    )


@register(
    "t_token_budget",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             COALESCE(SUM(n_chars) OVER (
               ORDER BY {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")} % 32,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
      FROM documents)
    WHERE excl < 8000
    """,
)
def t_token_budget(spark, sf_dir):
    """Deterministic token-budget prefix (operators/sampling.
    take_token_budget): the first 8,000 chars' worth of documents in
    content-hash order, straddling doc included. The Spark plan never
    runs a global prefix sum — per-bucket totals (32 rows) find the one
    boundary bucket, full buckets are admitted by a pushdown-able
    predicate, and only the boundary bucket pays a window; the oracle
    IS the global prefix sum, proving the bucketed plan equals it."""
    from pandasvcf_spark.operators.sampling import take_token_budget

    d = load(spark, sf_dir, "documents")
    out = take_token_budget(d, "n_chars", budget=8000, key="doc_id", buckets=32)
    return out.select("doc_id", "source", "n_chars")


#: keep-best variant of _NEAR_PIPELINE_ORACLE: survivors maximize
#: length(text) per component (tie -> min id) instead of minimizing id —
#: on the noisy corpus the planted copy is 2 chars longer, so keep-best
#: provably selects the OPPOSITE member from keep-min, exercising the
#: quality path end to end.
_NEAR_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE pr AS (
  SELECT * FROM ({{minhash}}) AS sub
),
edges AS (SELECT id_a AS a, id_b AS b FROM pr
          UNION ALL SELECT id_b, id_a FROM pr),
verts AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS lbl FROM verts
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text || '  ' FROM documents),
members AS (
  SELECT c.id, c.component, length(co.text) AS q
  FROM comp c JOIN corpus co ON co.doc_id = c.id),
losers AS (
  SELECT id FROM (
    SELECT id, row_number() OVER (PARTITION BY component
                                  ORDER BY q DESC, id) AS rk
    FROM members) WHERE rk > 1)
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM corpus
WHERE doc_id NOT IN (SELECT id FROM losers)
"""


@register(
    "dedup_near_keep_best",
    oracle=_NEAR_KEEP_BEST_ORACLE.format(
        minhash=QUERIES["dedup_minhash_lsh"].oracle
    ),
)
def dedup_near_keep_best(spark, sf_dir):
    """near_dedup_documents with quality-based survivor selection
    (`quality=length(text)`): each near-dup cluster keeps its highest-
    quality member, tie-broken to min id. The ranking window runs over
    COMPONENT MEMBERS only (sized by duplicates, not the corpus). On the
    planted corpus this keeps the longer noisy copy where keep-min keeps
    the original — the oracle verifies the flip, not just the count."""
    from pandasvcf_spark.operators.dedup import near_dedup_documents

    corpus = _noisy_corpus(spark, sf_dir)
    out = near_dedup_documents(
        corpus,
        "doc_id",
        word_ngrams_expr("text", 3),
        num_hashes=64,
        bands=16,
        min_jaccard=0.9,
        repartition_to=spark.sparkContext.defaultParallelism,
        quality=F.length("text"),
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


@register(
    "sk_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
        ({_SQL_POLY_HASH.format(s="text")} * 2654435761) % 2147483647 AS h
      FROM documents WHERE text IS NOT NULL
      ORDER BY h LIMIT 256),
    agg AS (SELECT CAST(count(*) AS INT) AS k_used, max(h) AS kth_hash
            FROM h)
    SELECT k_used, kth_hash,
           CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
                ELSE 255.0 * 2147483647.0 / kth_hash END AS estimate
    FROM agg
    """,
)
def sk_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (operators/sketches.kmv_distinct) over
    document texts, k=256: deterministic cardinality estimation whose
    estimate — not just row counts — the oracle reproduces to the last
    bit (portable hash, k smallest distinct values). The shuffle moves
    8-byte hashes only and the top-k is TakeOrdered (per-partition k +
    k-row driver merge, no global sort) — the sketch costs the same at
    any corpus size."""
    from pandasvcf_spark.operators.sketches import kmv_distinct

    d = load(spark, sf_dir, "documents")
    return kmv_distinct(d, "text", k=256)


@register(
    "t_qnorm",
    oracle="""
    WITH nn AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rk
      FROM documents WHERE n_chars IS NOT NULL),
    m AS (SELECT rk, avg(CAST(n_chars AS DOUBLE)) AS q FROM nn GROUP BY rk)
    SELECT doc_id, source, n_chars, round(q, 4) AS qnorm
    FROM nn JOIN m USING (rk)
    """,
)
def t_qnorm(spark, sf_dir):
    """Quantile normalization (operators/relational.quantile_normalize):
    per-source document-length distributions aligned to their cross-
    source rank means — the omics-classic normalization, here as the
    per-shard feature-distribution equalizer. One window per group, one
    rank-mean aggregation, one broadcast join back; the oracle replays
    rank, mean and join."""
    from pandasvcf_spark.operators.relational import quantile_normalize

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = quantile_normalize(
        d, "source", "n_chars", tiebreak_cols=["doc_id"]
    )
    return out.select(
        "doc_id", "source", "n_chars", F.round("qnorm", 4).alias("qnorm")
    )


@register(
    "t_bm25_topk",
    oracle="""
    WITH base AS (
      SELECT doc_id AS id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term,
             len(regexp_extract_all(lower(text), '[a-z]+')) AS dl
      FROM documents WHERE text IS NOT NULL),
    stats AS (
      SELECT count(DISTINCT id) AS n,
             count(*) / CAST(count(DISTINCT id) AS DOUBLE) AS avgdl
      FROM base),
    tf AS (
      SELECT id, term, count(*) AS tf, min(dl) AS dl
      FROM base WHERE term IN ('data', 'model', 'queries')
      GROUP BY 1, 2),
    dfc AS (SELECT term, count(*) AS dfx FROM tf GROUP BY 1),
    contrib AS (
      SELECT id,
             ln(1.0 + (n - dfx + 0.5) / (dfx + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS c
      FROM tf JOIN dfc USING (term), stats)
    SELECT id, round(sum(c), 4) AS score
    FROM contrib GROUP BY id
    ORDER BY score DESC, id LIMIT 10
    """,
)
def t_bm25_topk(spark, sf_dir):
    """BM25 lexical retrieval (operators/text_features.bm25_topk,
    Lucene-style always-positive idf): top-10 documents for a fixed
    bag-of-terms query. One tokenize pass yields doc length and
    query-term tf (terms filtered before the count shuffle — only hits
    leave the scan); df / N / avgdl broadcast; TakeOrdered top-k with a
    rounded-score + id total order. The oracle replays the formula
    term-for-term."""
    from pandasvcf_spark.operators.text_features import bm25_topk

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bm25_topk(d, ["data", "model", "queries"], k=10)


@register(
    "t_source_balance",
    oracle="""
    WITH c AS (SELECT source AS g, count(*) AS n FROM documents GROUP BY 1),
    a AS (SELECT CAST(count(*) AS INT) AS n_groups,
                 CAST(sum(n) AS DOUBLE) AS t,
                 sum(n * ln(n)) AS snl,
                 CAST(sum(n * n) AS DOUBLE) AS sn2
          FROM c)
    SELECT n_groups,
           round(ln(t) - snl / t, 4) AS entropy,
           CASE WHEN n_groups > 1
                THEN round((ln(t) - snl / t)
                           / ln(CAST(n_groups AS DOUBLE)), 4)
           END AS entropy_norm,
           round(sn2 / (t * t), 4) AS herfindahl
    FROM a
    """,
)
def t_source_balance(spark, sf_dir):
    """Mixture balance report (operators/text_features.group_balance):
    Shannon entropy (raw + normalized) and Herfindahl concentration of
    the corpus's source distribution — the "is the mixture what the
    recipe says" single-row check. Two partial-agged stages over
    group-count rows only (the corpus is scanned once, never
    re-shuffled); entropy uses the one-pass algebraic form
    ln(T) − Σ n·ln n / T, replayed identically by the oracle."""
    from pandasvcf_spark.operators.text_features import group_balance

    return group_balance(load(spark, sf_dir, "documents"), "source")


@register(
    "t_k_anonymize",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang, source, n_chars // 200 AS size_bucket
      FROM documents),
    c AS (
      SELECT *, count(*) OVER (PARTITION BY lang, source, size_bucket)
                  AS q_count
      FROM b)
    SELECT doc_id, lang, source, size_bucket, q_count
    FROM c WHERE q_count >= 5
    """,
)
def t_k_anonymize(spark, sf_dir):
    """k-anonymity suppression (operators/sampling.k_anonymize): release
    only rows whose (lang, source, size-bucket) quasi-identifier combo
    occurs >= 5 times — the privacy release-gate, as one unordered window
    count (hash exchange only, no sort, no join-back). The oracle replays
    the window and the threshold."""
    from pandasvcf_spark.operators.sampling import k_anonymize

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / F.lit(200)).cast("long")
        .alias("size_bucket"),
    )
    return k_anonymize(
        d, ["lang", "source", "size_bucket"], k=5, count_col="q_count"
    )


def _sql_laplace(expr_u: str, b: str) -> str:
    """round-6 Laplace inverse-CDF replay: -b * sign(u-1/2) * ln(1-2|u-1/2|).
    `expr_u` must be a DOUBLE in (0,1)."""
    return (
        f"(-({b}) * sign(({expr_u}) - 0.5) "
        f"* ln(1.0 - 2.0 * abs(({expr_u}) - 0.5)))"
    )


def _sql_cell_u(seed: str, cell_sql: str) -> str:
    """The seeded uniform draw: portable poly hash of seed:cell -> (0,1)."""
    h = _SQL_POLY_HASH.format(s=f"'{seed}:' || {cell_sql}")
    return f"(CAST({h} AS DOUBLE) + 0.5) / 2147483647.0"


@register(
    "t_dp_counts",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
      FROM documents GROUP BY lang, source)
    SELECT lang, source,
      round(n + {_sql_laplace(
          _sql_cell_u("dp", "lang || chr(31) || source"), "1.0 / 0.5"
      )}, 6) AS n_dp
    FROM g
    """,
)
def t_dp_counts(spark, sf_dir):
    """Differentially-private histogram (operators/sampling.dp_count,
    Dwork et al. 2006 Laplace mechanism, eps=0.5): per-(lang, source)
    count + Laplace(1/eps) noise, released WITHOUT the true count. The
    noise draw is the seeded portable-hash inverse-CDF (see
    _laplace_noise_expr's honest CSPRNG boundary), which is exactly what
    lets the oracle replay the release bit-for-bit (round 6): ONE
    groupBy + one hash + one ln per output cell."""
    from pandasvcf_spark.operators.sampling import dp_count

    d = load(spark, sf_dir, "documents")
    return dp_count(d, ["lang", "source"], epsilon=0.5, seed="dp")


@register(
    "t_dp_mean",
    oracle=f"""
    WITH s AS (
      SELECT lang,
        round(sum(least(greatest(CAST(n_chars AS DOUBLE), 0.0), 1000.0))
          + {_sql_laplace(_sql_cell_u("dp:s", "lang"), "1000.0 / 0.25")},
          6) AS sum_dp
      FROM documents WHERE n_chars IS NOT NULL GROUP BY lang),
    c AS (
      SELECT lang,
        round(CAST(count(*) AS DOUBLE)
          + {_sql_laplace(_sql_cell_u("dp:c", "lang"), "1.0 / 0.25")},
          6) AS n_dp
      FROM documents WHERE n_chars IS NOT NULL GROUP BY lang)
    SELECT s.lang AS lang,
      round(least(greatest(s.sum_dp / greatest(c.n_dp, 1.0), 0.0),
                  1000.0), 6) AS mean_dp
    FROM s JOIN c ON s.lang = c.lang
    """,
)
def t_dp_mean(spark, sf_dir):
    """Differentially-private per-language mean document length
    (operators/sampling.dp_mean, eps=0.5 split half/half over the noisy
    sum and noisy count — sequential composition): contributions clamped
    to [0, 1000] (the sensitivity bound), denominator floored at 1,
    ratio clamped back into the value range (post-processing, free under
    DP). The oracle replays both seeded draws and every round/clamp in
    order."""
    from pandasvcf_spark.operators.sampling import dp_mean

    d = load(spark, sf_dir, "documents")
    return dp_mean(
        d, ["lang"], "n_chars", lower=0.0, upper=1000.0, epsilon=0.5,
        seed="dp",
    )


@register(
    "t_repeated_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents WHERE text IS NOT NULL),
    positions AS (
      SELECT doc_id, unnest(generate_series(1, len(w) - 4)) AS pos, w
      FROM toks WHERE len(w) >= 5),
    grams AS (
      SELECT doc_id, pos, array_to_string(w[pos:pos+4], ' ') AS gram
      FROM positions),
    rep AS (
      SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS dfc FROM grams GROUP BY 1)
      WHERE dfc >= 2),
    fl AS (SELECT doc_id, pos FROM grams JOIN rep USING (gram)),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
      FROM fl)
    SELECT doc_id AS id, CAST(min(pos) AS INT) AS start_gram,
           CAST(max(pos) + 4 AS INT) AS end_tok, count(*) AS n_grams
    FROM isl GROUP BY doc_id, grp
    """,
)
def t_repeated_spans(spark, sf_dir):
    """Cross-document repeated passages
    (operators/text_features.repeated_ngram_spans): maximal word-position
    runs whose 5-grams each occur in >= 2 distinct documents — the
    excise-list of the exact-substring-dedup family (Lee et al. 2022) in
    word-n-gram form. One Generate per doc, one partial-agged
    distinct-doc count, one equi-join, one gap-and-island window; the
    oracle replays the identical pipeline in SQL."""
    from pandasvcf_spark.operators.text_features import repeated_ngram_spans

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return repeated_ngram_spans(d, "doc_id", "text", n=5, min_docs=2)


@register(
    "t_exact_substring_rm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
      FROM documents WHERE text IS NOT NULL),
    positions AS (
      SELECT doc_id, unnest(generate_series(1, len(w) - 4)) AS pos, w
      FROM toks WHERE len(w) >= 5),
    grams AS (
      SELECT doc_id, pos, array_to_string(w[pos:pos+4], ' ') AS gram
      FROM positions),
    own AS (
      SELECT gram, min(doc_id) AS owner FROM grams
      GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    fl AS (
      SELECT doc_id, pos FROM grams JOIN own USING (gram)
      WHERE doc_id <> owner),
    isl AS (
      SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + 4) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             -1) + 1
        THEN 1 ELSE 0 END AS newg
      FROM fl),
    isl2 AS (
      SELECT doc_id, pos, sum(newg) OVER (
        PARTITION BY doc_id ORDER BY pos) AS grp
      FROM isl),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
      FROM isl2 GROUP BY doc_id, grp),
    tokpos AS (
      SELECT doc_id, unnest(generate_series(1, len(w))) AS p, w
      FROM toks),
    kept AS (
      SELECT t.doc_id, t.p, t.w[t.p] AS tok
      FROM tokpos t LEFT JOIN spans s
        ON t.doc_id = s.doc_id AND t.p >= s.s AND t.p <= s.e
      WHERE s.doc_id IS NULL),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id)
    SELECT toks.doc_id AS id,
      CAST(len(toks.w) AS BIGINT) AS n_tokens,
      CAST(len(toks.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
      coalesce(agg.clean_text, '') AS clean_text
    FROM toks LEFT JOIN agg USING (doc_id)
    """,
)
def t_exact_substring_rm(spark, sf_dir):
    """ExactSubstr span removal (operators/text_features.
    exact_substring_remove; Lee et al. 2022 §4.1): rewrite every
    document with cross-document verbatim word 5-gram runs excised,
    keep-first (the min-doc_id owner of each repeated gram keeps it) —
    the standard post-dedup surgery for CC-scale corpora, composed
    from the t_repeated_spans shingle chain plus an interval-union
    window and pure-HOF token surgery. The oracle replays the whole
    chain: gram ownership, non-owner flags, running-max-end interval
    islands, and the token-level anti-join rewrite."""
    from pandasvcf_spark.operators.text_features import (
        exact_substring_remove,
    )

    d = load(spark, sf_dir, "documents")
    return exact_substring_remove(d, "doc_id", "text", n=5, min_docs=2)


@register(
    "t_exact_substring_char",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
        CASE WHEN length(regexp_replace(lower(text), '\\s+', ' ',
                                        'g')) = 0
          THEN []::VARCHAR[]
          ELSE string_split(
            regexp_replace(lower(text), '\\s+', ' ', 'g'), '')
        END AS w
      FROM documents WHERE text IS NOT NULL),
    positions AS (
      SELECT doc_id, unnest(generate_series(1, len(w) - 19)) AS pos, w
      FROM toks WHERE len(w) >= 20),
    grams AS (
      SELECT doc_id, pos, array_to_string(w[pos:pos+19], '') AS gram
      FROM positions),
    own AS (
      SELECT gram, min(doc_id) AS owner FROM grams
      GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    fl AS (
      SELECT doc_id, pos FROM grams JOIN own USING (gram)
      WHERE doc_id <> owner),
    isl AS (
      SELECT doc_id, pos,
        CASE WHEN pos > coalesce(max(pos + 19) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             -1) + 1
        THEN 1 ELSE 0 END AS newg
      FROM fl),
    isl2 AS (
      SELECT doc_id, pos, sum(newg) OVER (
        PARTITION BY doc_id ORDER BY pos) AS grp
      FROM isl),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
      FROM isl2 GROUP BY doc_id, grp),
    tokpos AS (
      SELECT doc_id, unnest(generate_series(1, len(w))) AS p, w
      FROM toks),
    kept AS (
      SELECT t.doc_id, t.p, t.w[t.p] AS tok
      FROM tokpos t LEFT JOIN spans s
        ON t.doc_id = s.doc_id AND t.p >= s.s AND t.p <= s.e
      WHERE s.doc_id IS NULL),
    agg AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, '' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id)
    SELECT toks.doc_id AS id,
      CAST(len(toks.w) AS BIGINT) AS n_chars,
      CAST(len(toks.w) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed,
      coalesce(agg.clean_text, '') AS clean_text
    FROM toks LEFT JOIN agg USING (doc_id)
    """,
)
def t_exact_substring_char(spark, sf_dir):
    """ExactSubstr span removal at CHARACTER granularity
    (operators/text_features.exact_substring_remove with
    granularity='char', n=20): the same keep-first ownership,
    interval-union islands and HOF surgery as t_exact_substring_rm,
    but over char 20-shingles of the normalized (lowercase,
    whitespace-collapsed) text — approximating the Lee et al. 2022
    byte-exact spans without the word-boundary snap. The oracle
    replays the identical chain on DuckDB's character lists."""
    from pandasvcf_spark.operators.text_features import (
        exact_substring_remove,
    )

    d = load(spark, sf_dir, "documents")
    return exact_substring_remove(
        d, "doc_id", "text", n=20, min_docs=2, granularity="char"
    ).withColumnRenamed("n_tokens", "n_chars")


_CMS_HASH = _SQL_POLY_HASH.format(s="CAST(d AS VARCHAR) || ':' || w")
_CMS_PROBE_TERMS = "['the', 'data', 'model', 'queries', 'zzz_absent_term']"


@register(
    "sk_countmin",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE text IS NOT NULL),
    cells AS (
      SELECT d, (({_CMS_HASH} * 2654435761) % 2147483647) % 512 AS cell
      FROM toks, generate_series(0, 2) AS s(d)),
    grid AS (SELECT d, cell, count(*) AS n FROM cells GROUP BY d, cell),
    probes AS (SELECT unnest({_CMS_PROBE_TERMS}) AS term),
    pc AS (
      SELECT term, d,
             (({_SQL_POLY_HASH.format(s="CAST(d AS VARCHAR) || ':' || term")}
               * 2654435761) % 2147483647) % 512 AS cell
      FROM probes, generate_series(0, 2) AS s(d))
    SELECT term, CAST(min(coalesce(n, 0)) AS BIGINT) AS est
    FROM pc LEFT JOIN grid USING (d, cell)
    GROUP BY term
    """,
)
def sk_countmin(spark, sf_dir):
    """Count-Min frequency sketch (operators/sketches.countmin_sketch +
    countmin_estimate) over the corpus's word stream, probed with a fixed
    term set (including an absent term → est 0). depth=3 × width=512: the
    grid is a fixed-size partial-agged summary whatever the corpus size,
    mergeable cell-wise across batches; estimates only ever OVERCOUNT
    (collisions add, never subtract). Deterministic seeded portable
    hashes → the oracle replays the entire grid and every probe min to
    the last bit."""
    from pandasvcf_spark.functions.text import words_expr
    from pandasvcf_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    docs = load(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(words_expr("text")).alias("w")
    )
    sk = countmin_sketch(toks, "w", depth=3, width=512)
    probes = spark.createDataFrame(
        [("the",), ("data",), ("model",), ("queries",), ("zzz_absent_term",)],
        "term string",
    )
    return countmin_estimate(sk, probes, "term", depth=3, width=512)


@register(
    "t_containment_join",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS id, lower(text) AS t
      FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 20000000,
             array_to_string(
               list_slice(regexp_extract_all(lower(text), '[a-z]+'),
                          1, 25), ' ')
      FROM documents WHERE text IS NOT NULL AND doc_id < 20),
    w AS (SELECT id, regexp_extract_all(t, '[a-z]+') AS w FROM docs),
    g AS (
      SELECT id, unnest(list_distinct(
        CASE WHEN len(w) < 4 THEN []
        ELSE list_transform(generate_series(1, len(w) - 3),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
        END)) AS gr
      FROM w),
    kept AS (
      SELECT gr FROM (SELECT gr, count(*) AS c FROM g GROUP BY gr)
      WHERE c <= 50),
    idx AS (SELECT id, gr FROM g WHERE gr IN (SELECT gr FROM kept)),
    sizes AS (SELECT id, count(*) AS a_grams FROM idx GROUP BY id),
    pairs AS (
      SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
      FROM idx a JOIN idx b USING (gr)
      WHERE a.id <> b.id GROUP BY 1, 2)
    SELECT a_id, b_id, CAST(a_grams AS BIGINT) AS a_grams,
           CAST(inter AS BIGINT) AS inter,
           round(inter / CAST(a_grams AS DOUBLE), 4) AS containment
    FROM pairs JOIN sizes ON sizes.id = pairs.a_id
    WHERE round(inter / CAST(a_grams AS DOUBLE), 4) >= 0.8
    """,
)
def t_containment_join(spark, sf_dir):
    """Asymmetric shingle containment (operators/dedup.containment_join;
    Broder 1997's resemblance-vs-containment distinction): documents
    plus planted 25-word excerpts (doc_id+2*10^7 of each doc_id<20) —
    each excerpt's 4-gram set is a subset of its source, so
    containment(excerpt→source) = 1.0 while symmetric Jaccard (and
    MinHash on it) is small. Exact inverted-index plan: distinct grams,
    df-cap 50, gram-keyed equi-join (hits only), ordered-pair counts,
    divide by the SOURCE side's gram count. The oracle replays grams,
    cap, pairs and the rounded threshold."""
    from pandasvcf_spark.functions.text import words_expr
    from pandasvcf_spark.operators.dedup import containment_join

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    excerpts = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.array_join(F.slice(words_expr("text"), 1, 25), " ").alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(excerpts)
    return containment_join(
        corpus, "doc_id", "text", n=4, threshold=0.8, max_df=50
    )


@register(
    "t_stratified_sample",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id,
             ({_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")}
              * 2654435761) % 2147483647 AS h
      FROM documents WHERE doc_id IS NOT NULL),
    r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY h, CAST(doc_id AS VARCHAR)) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM base)
    SELECT source, doc_id FROM r
    WHERE rk <= greatest(CAST(ceil(n * 0.2) AS BIGINT), least(5, n))
    """,
)
def t_stratified_sample(spark, sf_dir):
    """Exact proportional stratified sample (operators/sampling.
    stratified_sample): per source, exactly max(ceil(0.2*n_h),
    min(5, n_h)) documents chosen by scrambled-portable-hash order of
    doc_id — deterministic per-stratum quotas where sampleBy's
    Bernoulli draws fluctuate and change under repartitioning. One
    strata-keyed exchange serves rank window + count window + the
    per-row cutoff expression. The oracle replays the scramble, both
    windows and the ceil/min floor; both engines compute the cutoff
    from the same IEEE product."""
    from pandasvcf_spark.operators.sampling import stratified_sample

    d = load(spark, sf_dir, "documents")
    out = stratified_sample(d, ["source"], "doc_id", 0.2, min_per_stratum=5)
    return out.select("source", "doc_id")


@register(
    "t_zipf_stats",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE text IS NOT NULL),
    types AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
    ranked AS (
      SELECT w, f, row_number() OVER (ORDER BY f DESC, w ASC) AS r
      FROM types),
    fit AS (SELECT ln(r) AS lr, ln(f) AS lf FROM ranked WHERE f >= 5),
    m AS (SELECT count(*) AS ft, covar_pop(lr, lf) AS c, var_pop(lr) AS v
          FROM fit),
    t AS (SELECT CAST(sum(f) AS BIGINT) AS n_tokens, count(*) AS n_types
          FROM types)
    SELECT n_tokens, n_types, ft AS fitted_types,
           round(c / v, 6) AS zipf_slope
    FROM t, m
    """,
)
def t_zipf_stats(spark, sf_dir):
    """Zipf rank-frequency fit (operators/text_features.zipf_stats):
    the corpus collapses to its vocabulary (one groupBy), ranks are a
    total-order row_number over the vocab-sized relation, and the OLS
    slope is the population-moment closed form over types with
    freq >= 5. A natural corpus fits slope ~ -1; this synthetic
    corpus's templated vocabulary does not — which is exactly what the
    diagnostic is for. The oracle replays ranks, the min-freq cut and
    both moments; 6dp rounding absorbs accumulation-order drift."""
    from pandasvcf_spark.operators.text_features import zipf_stats

    return zipf_stats(load(spark, sf_dir, "documents"))


@register(
    "t_heaps_law",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS d,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    per_doc AS (SELECT d, count(*) AS n FROM toks GROUP BY d),
    first_doc AS (
      SELECT d, count(*) AS v
      FROM (SELECT w, min(d) AS d FROM toks GROUP BY w) GROUP BY d),
    curve AS (
      SELECT sum(n) OVER win AS cn, sum(coalesce(v, 0)) OVER win AS cv
      FROM per_doc LEFT JOIN first_doc USING (d)
      WINDOW win AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT count(*) AS docs,
           CAST(max(cn) AS BIGINT) AS n_tokens,
           CAST(max(cv) AS BIGINT) AS n_types,
           round(covar_pop(ln(cn), ln(cv)) / var_pop(ln(cn)), 6)
             AS heaps_beta,
           round(exp(avg(ln(cv))
                     - (covar_pop(ln(cn), ln(cv)) / var_pop(ln(cn)))
                       * avg(ln(cn))), 4) AS heaps_k
    FROM curve
    """,
)
def t_heaps_law(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit (operators/text_features.
    heaps_law): V(n) ~ K*n^beta estimated with NO sequential scan —
    per-doc token counts and per-type first-document histograms feed
    one docs-sized cumulative window, then a 1-row OLS moment agg.
    beta near 0 here (templated vocab saturates instantly) is the
    honest reading; on crawl text beta ~ 0.5 and a drift toward 1
    flags type-minting noise. The oracle replays the curve and both
    regression moments; window is named win (DuckDB reserves
    `window`)."""
    from pandasvcf_spark.operators.text_features import heaps_law

    return heaps_law(load(spark, sf_dir, "documents"))


@register(
    "sk_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents WHERE text IS NOT NULL),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT w AS term, CAST(count(*) AS BIGINT) AS cnt
    FROM toks GROUP BY w
    HAVING count(*) >= ceil((SELECT n FROM tot) * 0.002)
    ORDER BY cnt DESC, term
    """,
)
def sk_heavy_hitters(spark, sf_dir):
    """Exact phi-heavy hitters (operators/sketches.heavy_hitters;
    Misra & Gries 1982 / Agarwal et al. 2013 two-pass protocol) over
    the corpus word stream at support 0.002: per-partition k-counter
    Misra-Gries summaries inside one mapInPandas pass (only <= k
    candidates per partition ever leave an executor — the long tail
    is never shuffled), then a broadcast-semi-join EXACT recount of
    the candidate union. The sketch only prunes; the output relation
    — every word with frequency >= ceil(0.002*N) and its exact count
    — is partitioning-independent, so the oracle is plain
    GROUP BY ... HAVING over the same stream, no hash replay needed.
    Both sides compute the threshold from the same IEEE-double
    product, so the ceil boundary agrees bit-for-bit."""
    from pandasvcf_spark.functions.text import words_expr
    from pandasvcf_spark.operators.sketches import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(words_expr("text")).alias("w")
    )
    out = heavy_hitters(toks, "w", support=0.002)
    return out.select(F.col("w").alias("term"), "cnt").orderBy(
        F.desc("cnt"), "term"
    )


@register(
    "t_epoch_shuffle",
    oracle=f"""
    SELECT doc_id, shuffle_key, position FROM (
      SELECT doc_id,
             {_SQL_POLY_HASH.format(s="'1:' || CAST(doc_id AS VARCHAR)")}
               AS shuffle_key,
             row_number() OVER (
               ORDER BY {_SQL_POLY_HASH.format(s="'1:' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS position
      FROM documents)
    WHERE position <= 100
    """,
)
def t_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training order (operators/sampling.
    epoch_shuffle_key): the first 100 documents of epoch 1's global
    permutation, with their positions. The full-corpus form is a plain
    orderBy on the salted hash — a range-partitioned distributed sort;
    here the head is TakeOrdered-d first so the position window runs
    over 100 rows, never the corpus. Epoch in the salt: same epoch =
    identical order on any engine, next epoch = fresh permutation."""
    from pandasvcf_spark.operators.sampling import epoch_shuffle_key

    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id", epoch_shuffle_key("doc_id", epoch=1).alias("shuffle_key")
    )
    head = keyed.orderBy("shuffle_key", "doc_id").limit(100)
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.withColumn("position", F.row_number().over(w))


@register(
    "t_weighted_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, n_chars,
        list_min(list_transform(
          generate_series(1, GREATEST(LEAST(CAST(floor(n_chars / 100) + 1
                                             AS INT), 6), 1)),
          i -> ({_SQL_POLY_HASH.format(
              s="CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}
                * 2654435761) % 2147483647)) AS r
      FROM documents)
    SELECT doc_id, n_chars FROM ranked
    ORDER BY r, doc_id LIMIT 50
    """,
)
def t_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling (operators/sampling.
    weighted_sample): 50 docs, weight = 1 + floor(n_chars/100) capped at
    6 — longer docs hold proportionally more lottery tickets. Integer
    bottom-k-of-salted-hashes ranking (no pow/ln float knife-edges), so
    the oracle reproduces the exact selected SET; the plan's top-k is
    TakeOrdered, never a global sort."""
    from pandasvcf_spark.operators.sampling import weighted_sample

    d = load(spark, sf_dir, "documents")
    w = F.least(F.floor(F.col("n_chars") / 100) + 1, F.lit(6))
    out = weighted_sample(d, "doc_id", w, k=50, max_weight=6)
    return out.select("doc_id", "n_chars")


@register(
    "t_corpus_report",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 2) AS mean_chars,
           round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4)
             AS en_frac,
           round(1.0 - count(DISTINCT
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 / CAST(count(*) AS DOUBLE), 4) AS dup_rate
    FROM documents
    GROUP BY ROLLUP(source)
    """,
)
def t_corpus_report(spark, sf_dir):
    """Per-source + grand-total corpus health report (operators/
    text_features.corpus_report): doc/char counts, English fraction,
    exact-dup rate — one aggregation over one scan, every metric
    partial-aggregable. The oracle's dup rate counts distinct normalized
    texts where Spark counts distinct 64-bit fingerprints of the same
    normalization — equal barring a 2^-64 collision."""
    from pandasvcf_spark.operators.text_features import corpus_report

    return corpus_report(load(spark, sf_dir, "documents"))


#: incremental near-dedup oracle: TRUE exact-Jaccard cross pairs (>= one
#: new side) over base + three new variants, closed transitively, then the
#: has-base-drop / all-new-keep-min survivor rule. The scramble (vowels ->
#: digits) makes the +2e7/+3e7 pair dissimilar from base without any
#: unicode-direction hazard (ASCII-only; Spark translate == chained
#: replaces here by construction).
_INCR_SCRAMBLE = (
    "replace(replace(replace(replace(replace(text,"
    " 'a', '0'), 'e', '1'), 'i', '2'), 'o', '3'), 'u', '4')"
)

_INCR_ORACLE = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text, 0 AS nw FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text || '  ', 1 FROM documents
  UNION ALL
  SELECT doc_id + 20000000, {_INCR_SCRAMBLE}, 1 FROM documents
  UNION ALL
  SELECT doc_id + 30000000, {_INCR_SCRAMBLE} || '  ', 1 FROM documents),
w AS (
  SELECT doc_id, nw, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM corpus),
g AS (
  SELECT doc_id, nw, list_distinct(CASE WHEN len(ws) < 3 THEN []
    ELSE list_transform(generate_series(1, len(ws) - 2),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END)
    AS t
  FROM w),
pr AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM g a JOIN g b
    ON a.doc_id < b.doc_id
   AND (a.nw = 1 OR b.nw = 1)
   AND len(a.t) > 0 AND len(b.t) > 0
   AND len(a.t) * 10 >= len(b.t) * 9
   AND len(b.t) * 10 >= len(a.t) * 9
  WHERE len(list_intersect(a.t, b.t))
        / CAST(len(list_distinct(list_concat(a.t, b.t))) AS DOUBLE) >= 0.9),
edges AS (SELECT ia AS a, ib AS b FROM pr
          UNION ALL SELECT ib, ia FROM pr),
verts AS (SELECT DISTINCT a AS id FROM edges),
reach AS (
  SELECT id, id AS lbl FROM verts
  UNION
  SELECT e.b AS id, r.lbl FROM reach r JOIN edges e ON e.a = r.id),
comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
members AS (
  SELECT c.id, c.component, co.nw FROM comp c
  JOIN corpus co ON co.doc_id = c.id),
stats AS (
  SELECT component,
         max(CASE WHEN nw = 0 THEN 1 ELSE 0 END) AS has_base,
         min(CASE WHEN nw = 1 THEN id END) AS min_new
  FROM members GROUP BY component),
losers AS (
  SELECT m.id FROM members m JOIN stats s USING (component)
  WHERE m.nw = 1 AND (s.has_base = 1 OR m.id <> s.min_new))
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM corpus
WHERE nw = 1 AND doc_id NOT IN (SELECT id FROM losers)
"""


@register("dedup_incremental", oracle=_INCR_ORACLE)
def dedup_incremental(spark, sf_dir):
    """Incremental near-dedup (operators/dedup.near_dedup_incremental):
    a 3x-sized "new crawl" (noisy copies of the corpus + a planted
    all-new duplicate pair per doc) deduped against the base documents.
    Copies of base docs drop (the corpus already has them), all-new
    duplicate pairs keep their min id, unpaired new docs survive. The
    old x old pair term never materializes (filtered inside the bucket
    stage); the oracle recomputes TRUE cross pairs with exact Jaccard
    and replays the survivor rule."""
    from pandasvcf_spark.operators.dedup import near_dedup_incremental

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    scr = F.translate(F.col("text"), "aeiou", "01234")
    new = (
        d.select(
            (F.col("doc_id") + 10000000).alias("doc_id"),
            F.concat("text", F.lit("  ")).alias("text"),
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 20000000).alias("doc_id"),
                scr.alias("text"),
            )
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 30000000).alias("doc_id"),
                F.concat(scr, F.lit("  ")).alias("text"),
            )
        )
    )
    out = near_dedup_incremental(
        d,
        new,
        "doc_id",
        word_ngrams_expr("text", 3),
        min_jaccard=0.9,
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"))


@register(
    "t_corpus_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")}
                     % 10000 < 9800 THEN 'train'
                WHEN {_SQL_POLY_HASH.format(s="CAST(doc_id AS VARCHAR)")}
                     % 10000 < 9900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def t_corpus_split(spark, sf_dir):
    """Deterministic 98/1/1 train/val/test assignment (operators/
    sampling.split_label_expr): disjoint, exhaustive content-hash residue
    bands — same doc, same split, every run and engine. The oracle
    recomputes the exact assignment."""
    from pandasvcf_spark.operators.sampling import split_label_expr

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        split_label_expr(
            "doc_id", {"train": 0.98, "val": 0.01, "test": 0.01}
        ).alias("split"),
    )


@register(
    "t_paragraph_dedup",
    oracle="""
    WITH sel AS (
      SELECT doc_id, string_split(text, ' the ') AS ps FROM documents),
    paras AS (
      SELECT doc_id,
             unnest(generate_series(1, len(ps))) AS pos,
             unnest(ps) AS para
      FROM sel),
    ranked AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos)
               AS rn
      FROM paras),
    kept AS (SELECT * FROM ranked WHERE rn = 1 OR len(para) < 8)
    SELECT doc_id, string_agg(para, ' the ' ORDER BY pos) AS text
    FROM kept GROUP BY doc_id
    """,
)
def t_paragraph_dedup(spark, sf_dir):
    """Corpus-wide paragraph dedup (operators/dedup.paragraph_dedup; the
    C4 cleaning step, Raffel et al. 2020) — the synthetic corpus has no
    newlines, so the catalog splits on the literal token ' the '
    (min_chars=8 exempts short fragments, C4's short-line rule). One
    content-keyed window + one reassembly groupBy; the oracle replays
    split positions, the global first-occurrence rank and the ordered
    re-join."""
    from pandasvcf_spark.operators.dedup import paragraph_dedup

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return paragraph_dedup(d, "doc_id", "text", delim=" the ", min_chars=8)


def _cdc_chunks_sql(source: str) -> str:
    """Chunk relation (doc_id, chunk_idx, start, len, chunk_hash) of the
    gear-hash CDC walk over `source` (a relation exposing doc_id, text) —
    the exact replay of operators/dedup.cdc_chunks at min=32 avg=64
    max=128 window=16: per-position windowed rolling hash via lambda
    folds (divisor = avg-min = 32), then the min/max-constrained cut walk
    as a RECURSIVE CTE whose step is 'next cut = first position >= min
    past the last cut that is a hash boundary or the max_len force'
    (min() over the candidate set == the sequential scan, because the
    force candidate is exactly last+max), tail chunk appended, chunk
    hashes via the portable polynomial. Needs WITH RECURSIVE on the
    enclosing query."""
    return f"""
    d AS (
      SELECT doc_id, text AS t, len(text) AS n
      FROM ({source}) src WHERE text IS NOT NULL AND len(text) > 0),
    g AS (
      SELECT doc_id, n, list_transform(string_split(t, ''),
        c -> (CAST(ascii(c) AS BIGINT) * 2654435761) % 2147483647) AS gs
      FROM d),
    hpos AS (
      SELECT doc_id, u.pos AS pos,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
            gs[greatest(1, u.pos - 15):u.pos]),
          (a, x) -> (a * 31 + x) % 2147483647) AS h
      FROM g, LATERAL unnest(generate_series(1, n)) AS u(pos)),
    cuts(doc_id, cut) AS (
      SELECT doc_id, 0 FROM d
      UNION ALL
      SELECT s.doc_id, s.nxt FROM (
        SELECT c.doc_id AS doc_id, (
          SELECT min(pos) FROM hpos h
          WHERE h.doc_id = c.doc_id AND h.pos - c.cut >= 32
            AND (h.h % 32 = 0 OR h.pos - c.cut >= 128)) AS nxt
        FROM cuts c) s
      WHERE s.nxt IS NOT NULL),
    allcuts AS (
      SELECT doc_id, cut FROM cuts WHERE cut > 0
      UNION ALL
      SELECT d.doc_id AS doc_id, d.n AS cut FROM d
      WHERE d.n > COALESCE((SELECT max(cut) FROM cuts c
                            WHERE c.doc_id = d.doc_id), 0)),
    chpos AS (
      SELECT doc_id,
        CAST(row_number() OVER w AS INT) AS chunk_idx,
        CAST(COALESCE(lag(cut) OVER w, 0) + 1 AS INT) AS start,
        CAST(cut - COALESCE(lag(cut) OVER w, 0) AS INT) AS len
      FROM allcuts WINDOW w AS (PARTITION BY doc_id ORDER BY cut)),
    cdc_chunks AS (
      SELECT chpos.doc_id AS doc_id, chpos.chunk_idx, chpos.start,
        chpos.len,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(substr(d.t, chpos.start, chpos.len),
                                      ''),
            c -> CAST(ascii(c) AS BIGINT))),
          (a, c) -> (a * 31 + c) % 2147483647) AS chunk_hash
      FROM chpos JOIN d ON chpos.doc_id = d.doc_id)"""


@register(
    "t_cdc_chunks",
    oracle=f"""
    WITH RECURSIVE
    {_cdc_chunks_sql("SELECT doc_id, text FROM documents WHERE doc_id < 120")}
    SELECT doc_id, chunk_idx, start, len, chunk_hash FROM cdc_chunks
    """,
)
def t_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (operators/dedup.cdc_chunks — gear-hash
    CDC, the FastCDC/LBFS family): every chunk boundary is a pure
    function of the trailing 16-char rolling hash, so boundaries — and
    therefore chunk fingerprints — survive content shifts. Pure HOF
    expression plan (no UDF, no shuffle before downstream grouping); the
    oracle replays the per-position rolling hash and the min/max cut
    walk as a recursive CTE, exact because the whole hash family is the
    portable 31-bit polynomial."""
    from pandasvcf_spark.operators.dedup import cdc_chunks

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return cdc_chunks(d, "text", "doc_id")


@register(
    "t_cdc_dedup",
    oracle=f"""
    WITH RECURSIVE
    {_cdc_chunks_sql(
        "SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 10000 AS doc_id, 'PAD-' || text AS text "
        "FROM documents WHERE doc_id < 40"
    )},
    multi AS (
      SELECT chunk_hash, count(*) AS copies, min(doc_id) AS owner
      FROM cdc_chunks GROUP BY chunk_hash)
    SELECT c.doc_id AS doc_id,
      CAST(count(*) AS INT) AS n_chunks,
      CAST(sum(c.len) AS BIGINT) AS n_chars,
      CAST(sum(CASE WHEN m.copies > 1 THEN 1 ELSE 0 END) AS INT)
        AS dup_chunks,
      CAST(sum(CASE WHEN m.copies > 1 THEN c.len ELSE 0 END) AS BIGINT)
        AS dup_chars,
      round(CAST(sum(CASE WHEN m.copies > 1 THEN c.len ELSE 0 END)
                 AS DOUBLE)
            / CAST(sum(c.len) AS DOUBLE), 6) AS dup_frac,
      CAST(sum(CASE WHEN m.owner <> c.doc_id THEN c.len ELSE 0 END)
           AS BIGINT) AS foreign_chars,
      round(CAST(sum(CASE WHEN m.owner <> c.doc_id THEN c.len ELSE 0 END)
                 AS DOUBLE)
            / CAST(sum(c.len) AS DOUBLE), 6) AS foreign_frac
    FROM cdc_chunks c JOIN multi m ON c.chunk_hash = m.chunk_hash
    GROUP BY c.doc_id
    """,
)
def t_cdc_dedup(spark, sf_dir):
    """Chunk-level duplication profile (operators/dedup.cdc_dedup_stats)
    over the corpus PLUS a 'PAD-'-shifted copy of the first 40 docs —
    the planted shift makes the CDC property itself driver-checked: the
    shifted copies share almost all chunk fingerprints with their
    originals (high dup_frac), which fixed-size blocking would miss
    entirely — and the keep-first gate is visible too: originals own
    their shared chunks (foreign_frac 0), the shifted copies carry
    foreign_frac ≈ dup_frac. Plan: one unordered window over chunk_hash
    + one per-doc rollup; document text never moves after the scan."""
    from pandasvcf_spark.operators.dedup import cdc_dedup_stats

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = d.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("PAD-"), F.col("text")).alias("text"),
    )
    return cdc_dedup_stats(d.unionByName(shifted), "text", "doc_id")


@register(
    "t_cdc_incremental",
    oracle=f"""
    WITH RECURSIVE
    {_cdc_chunks_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id < 250 "
        "UNION ALL "
        "SELECT doc_id + 10000 AS doc_id, 'NEWPREFIX-' || text AS text "
        "FROM documents WHERE doc_id < 30 "
        "UNION ALL "
        "SELECT doc_id, text FROM documents "
        "WHERE doc_id >= 280 AND doc_id < 310"
    )},
    basehash AS (
      SELECT DISTINCT chunk_hash FROM cdc_chunks WHERE doc_id < 250),
    newch AS (
      SELECT * FROM cdc_chunks WHERE doc_id >= 280),
    gated AS (
      SELECT n.doc_id AS doc_id,
        CAST(sum(n.len) AS BIGINT) AS n_chars,
        CAST(sum(CASE WHEN b.chunk_hash IS NOT NULL THEN n.len
                      ELSE 0 END) AS BIGINT) AS foreign_chars
      FROM newch n LEFT JOIN basehash b ON n.chunk_hash = b.chunk_hash
      GROUP BY n.doc_id)
    SELECT doc_id FROM gated
    WHERE CAST(foreign_chars AS DOUBLE) / CAST(n_chars AS DOUBLE) <= 0.4
    """,
)
def t_cdc_incremental(spark, sf_dir):
    """Incremental chunk-level dedup gate (operators/dedup.
    cdc_dedup_incremental): docs < 250 stand in as the accepted base
    (contributing ONLY their chunk-hash index — `cdc_chunk_hash_index`,
    the persisted relation the CDC ingest stream reads); the "new batch"
    is 'NEWPREFIX-'-shifted RE-HOSTS of base docs 0-29 (re-identified
    as 10000+id; the index must catch them THROUGH the shift — the CDC
    property under an incremental oracle) plus docs 280-309 with no
    base twin (must survive). Returns surviving doc_ids; the oracle
    replays chunking for base and batch, the membership join, and the
    0.4 gate."""
    from pandasvcf_spark.operators.dedup import (
        cdc_chunk_hash_index,
        cdc_dedup_incremental,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") < 250)
    rehosts = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("NEWPREFIX-"), F.col("text")).alias("text"),
    )
    fresh = d.filter(
        (F.col("doc_id") >= 280) & (F.col("doc_id") < 310)
    )
    out = cdc_dedup_incremental(
        cdc_chunk_hash_index(base),
        rehosts.unionByName(fresh),
        max_foreign_frac=0.4,
    )
    return out.select("doc_id")


@register(
    "sk_hll_distinct",
    oracle=f"""
    WITH ph AS (
      SELECT {_SQL_POLY_HASH.format(s="text")} AS h0
      FROM documents WHERE text IS NOT NULL),
    m1 AS (SELECT (xor(h0, h0 // 65536) * 73244475) % 4294967296 AS x
           FROM ph),
    m2 AS (SELECT (xor(x, x // 65536) * 73244475) % 4294967296 AS x
           FROM m1),
    mx AS (SELECT xor(x, x // 65536) AS h FROM m2),
    regs AS (
      SELECT CAST(h % 256 AS INT) AS bucket,
             max(CASE WHEN h // 256 > 0
                      THEN 24 - CAST(floor(log2(h // 256)) AS INT)
                      ELSE 25 END) AS rho
      FROM mx GROUP BY 1),
    agg AS (SELECT CAST(count(*) AS INT) AS hit,
                   sum(power(2.0, -rho)) AS s FROM regs)
    SELECT CAST(256 AS INT) AS m, CAST(256 - hit AS INT) AS n_zero,
           round(CASE WHEN (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) <= 640.0
                       AND hit < 256
                      THEN 256.0 * ln(256.0 / (256 - hit))
                      ELSE (0.7213 / (1.0 + 1.079 / 256)) * 65536
                           / (s + (256 - hit)) END, 4) AS estimate
    FROM agg
    """,
)
def sk_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct count (operators/sketches.hll_sketch +
    hll_estimate, m=256) over document texts — the mergeable
    (cell-wise-MAX) counterpart of sk_kmv_distinct. Every register and
    the final bias-corrected/linear-counting estimate replay in the
    oracle to the last bit: the mix32 chain is integer-exact, and the
    harmonic sum's 2^-rho terms are dyadic rationals whose ≤256-term
    sum is exact in doubles regardless of accumulation order (round 4dp
    is belt-and-braces)."""
    from pandasvcf_spark.operators.sketches import hll_estimate, hll_sketch

    d = load(spark, sf_dir, "documents")
    est = hll_estimate(hll_sketch(d, "text", m=256), m=256)
    return est.select("m", "n_zero", F.round("estimate", 4).alias("estimate"))


def _bpe_oracle(n_rounds: int = 3) -> str:
    """Unrolled BPE-training replay (the pagerank-oracle device): one
    (pair-count, argmax, fold-apply) CTE triple per round. The merge
    application folds a sentinel-joined accumulator string through
    DuckDB's init-with-first list_reduce — byte-equal to the engine's
    array fold (probed: 'aaaa' under (a,a) → [aa, aa])."""
    fold = (
        "string_split(list_reduce(list_transform(ss, s -> chr(31) || s), "
        "(acc, x) -> CASE WHEN x = chr(31) || m{k}.lb "
        "AND ends_with(acc, chr(31) || m{k}.la) "
        "THEN acc[:len(acc) - len(chr(31) || m{k}.la)] "
        "|| chr(31) || m{k}.la || m{k}.lb "
        "ELSE acc || x END), chr(31))[2:]"
    )
    parts = [
        """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents),
    wf AS (SELECT w, count(*) AS f FROM toks GROUP BY w),
    w0 AS (SELECT string_split(w, '') AS ss, f FROM wf)"""
    ]
    for k in range(1, n_rounds + 1):
        parts.append(
            f"""
    , p{k} AS (
      SELECT la, lb, CAST(sum(f) AS BIGINT) AS cnt FROM (
        SELECT f,
          unnest(list_transform(generate_series(1, len(ss) - 1),
                                i -> ss[i])) AS la,
          unnest(list_transform(generate_series(1, len(ss) - 1),
                                i -> ss[i + 1])) AS lb
        FROM w{k - 1} WHERE len(ss) >= 2)
      GROUP BY 1, 2),
    m{k} AS (SELECT la, lb, cnt FROM p{k} ORDER BY cnt DESC, la, lb LIMIT 1),
    w{k} AS (
      SELECT {fold.format(k=k)} AS ss, f
      FROM w{k - 1}, m{k})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {k} AS step, la AS left_sym, lb AS right_sym, "
        f"la || lb AS merged, cnt AS pair_count FROM m{k}"
        for k in range(1, n_rounds + 1)
    )
    return "".join(parts) + "\n    " + selects


def _bpe_cte_prefix(n_rounds: int = 3) -> str:
    """The training CTE chain alone (w0..m{n}) — reused by entries that
    compose the trained rules downstream (encode replay)."""
    full = _bpe_oracle(n_rounds)
    return full[: full.rindex("\n    SELECT 1 AS step")]


def _bpe_fold_sql(inner: str, k: int) -> str:
    """Apply merge rule m{k} to a symbol-LIST SQL expression (the
    sentinel-string fold device of _bpe_oracle, parameterized over its
    input so rules chain: fold3(fold2(fold1(chars))))."""
    pre = f"list_transform({inner}, s -> chr(31) || s)"
    return (
        f"string_split(list_reduce({pre}, "
        f"(acc, x) -> CASE WHEN x = chr(31) || m{k}.lb "
        f"AND ends_with(acc, chr(31) || m{k}.la) "
        f"THEN acc[:len(acc) - len(chr(31) || m{k}.la)] "
        f"|| chr(31) || m{k}.la || m{k}.lb "
        f"ELSE acc || x END), chr(31))[2:]"
    )


@register("t_bpe_merges", oracle=_bpe_oracle(3))
def t_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.bpe_train;
    Sennrich et al. 2016), 3 merge rounds over the corpus: the
    working set collapses to the distinct-word frequency table before
    iteration — the property that makes tokenizer training feasible at
    corpus scale — and each round is one pair-count shuffle + a 1-row
    argmax collect (the rule IS the model). Deterministic (count DESC,
    pair ASC) tie-break; the oracle unrolls the three rounds."""
    from pandasvcf_spark.operators.bpe import bpe_train

    d = load(spark, sf_dir, "documents")
    return bpe_train(d, "text", n_merges=3)


_BPE_ENC = _bpe_fold_sql(
    _bpe_fold_sql(_bpe_fold_sql("string_split(w, '')", 1), 2), 3
)


_BPE_COUNTS_ORACLE = (
    _bpe_cte_prefix(3)
    + f"""
    SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(enc, x -> len(x))), 0)
                AS BIGINT) AS bpe_tokens
    FROM (
      SELECT doc_id,
             list_transform(regexp_extract_all(lower(text), '[a-z]+'),
                            w -> {_BPE_ENC}) AS enc
      FROM documents, m1, m2, m3)
    """
)


@register("t_bpe_token_counts", oracle=_BPE_COUNTS_ORACLE)
def t_bpe_token_counts(spark, sf_dir):
    """Per-document token counts under the TRAINED BPE tokenizer
    (operators/bpe.bpe_train + bpe_encode_expr): the composition a
    token-budget pipeline actually runs — train 3 rules (driver-side
    model, 3 rows), replay them as HOF folds over every document, count
    resulting tokens. This entry puts the ENCODE path under the oracle
    (t_bpe_merges covers training): the SQL chains the same three
    sentinel-string folds inside a per-word lambda."""
    from pandasvcf_spark.operators.bpe import bpe_encode_expr, bpe_train

    d = load(spark, sf_dir, "documents")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(d, "text", n_merges=3).collect()
    ]
    enc = bpe_encode_expr(F.col("text"), merges)
    return d.select(
        "doc_id",
        F.coalesce(F.size(F.flatten(enc)), F.lit(0))
        .cast("long")
        .alias("bpe_tokens"),
    )


@register("t_bpe_tokens_arrow", oracle=_BPE_COUNTS_ORACLE)
def t_bpe_tokens_arrow(spark, sf_dir):
    """The SAME per-document BPE token counts as `t_bpe_token_counts`,
    computed through the PRODUCTION encode path (operators/bpe.
    bpe_encode_udf — Arrow-batched pandas UDF, rule table in the
    closure, LRU cache over distinct words, lowest-rank-first loop):
    sharing `t_bpe_token_counts`'s oracle makes the driver prove
    HOF-path ≡ Arrow-path ≡ ANSI-SQL replay on the same trained rules —
    the equivalence that licenses switching engines at the
    `bpe_encode_expr` depth ceiling (30k-merge vocabularies run only
    here; the ≥1k-merge case is pytest-covered where the HOF form
    cannot even be built)."""
    from pandasvcf_spark.operators.bpe import bpe_token_counts, bpe_train

    d = load(spark, sf_dir, "documents")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(d, "text", n_merges=3).collect()
    ]
    return bpe_token_counts(d, merges, "text", engine="arrow").select(
        "doc_id", "bpe_tokens"
    )


@register(
    "t_robust_scale",
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    st AS (
      SELECT source,
             quantile_cont(n_chars, 0.01) AS plo,
             quantile_cont(n_chars, 0.99) AS phi,
             quantile_cont(n_chars, 0.5) AS med
      FROM d GROUP BY source),
    wm AS (SELECT d.doc_id, d.source, d.n_chars, st.plo, st.phi, st.med
           FROM d JOIN st USING (source)),
    md AS (
      SELECT source, quantile_cont(abs(n_chars - med), 0.5) AS mad
      FROM wm GROUP BY source)
    SELECT doc_id, source, n_chars,
           round(least(greatest(CAST(n_chars AS DOUBLE), plo), phi), 6)
             AS clamped,
           CASE WHEN mad > 0
                THEN round((n_chars - med) / (1.4826 * mad), 6)
           END AS robust_z
    FROM wm JOIN md USING (source)
    """,
)
def t_robust_scale(spark, sf_dir):
    """Per-source winsorization + MAD robust z of document lengths
    (operators/relational.robust_scale) — the outlier-clipping step
    before any length/quality threshold. Two grouped exact-percentile
    aggs (the agg_percentiles exactness precedent: Spark `percentile`
    == DuckDB quantile_cont) with broadcast join-backs; group stats
    stay source-count-sized."""
    from pandasvcf_spark.operators.relational import robust_scale

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return robust_scale(d, ["source"], "n_chars")


def _psi_oracle() -> str:
    qs = ", ".join(
        f"quantile_cont(CAST(n_chars AS DOUBLE), {(i + 1) / 10}) AS q{i}"
        for i in range(9)
    )
    case = "CASE " + " ".join(
        f"WHEN CAST(n_chars AS DOUBLE) <= q.q{i} THEN {i}"
        for i in range(9)
    ) + " ELSE 9 END"
    qlist = ", ".join(f"q.q{i}" for i in range(9))
    p_b = "greatest(n_base / CAST(tb AS DOUBLE), 1e-06)"
    p_c = "greatest(n_cur / CAST(tc AS DOUBLE), 1e-06)"
    return f"""
    WITH cur AS (
      SELECT doc_id, CAST(n_chars + (doc_id % 40) AS BIGINT) AS n_chars
      FROM documents),
    q AS (SELECT {qs} FROM documents),
    bb AS (SELECT {case} AS bin FROM documents, q),
    cb AS (SELECT {case} AS bin FROM cur, q),
    hb AS (SELECT bin, count(*) AS n_base FROM bb GROUP BY 1),
    hc AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY 1),
    bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
    jj AS (
      SELECT b.bin,
             CAST(coalesce(hb.n_base, 0) AS BIGINT) AS n_base,
             CAST(coalesce(hc.n_cur, 0) AS BIGINT) AS n_cur
      FROM bins b LEFT JOIN hb USING (bin) LEFT JOIN hc USING (bin)),
    tt AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
                  CAST(sum(n_cur) AS BIGINT) AS tc FROM jj)
    SELECT jj.bin AS bin,
           list_value(CAST(NULL AS DOUBLE), {qlist})[jj.bin + 1] AS lo,
           list_value({qlist}, CAST(NULL AS DOUBLE))[jj.bin + 1] AS hi,
           n_base, n_cur,
           round(({p_c} - {p_b}) * ln({p_c} / {p_b}), 6) AS psi_term
    FROM jj, tt, q
    """


@register("t_psi_drift", oracle=_psi_oracle())
def t_psi_drift(spark, sf_dir):
    """Population Stability Index (operators/relational.psi_report; the
    standard 0.1/0.25 drift monitor) between the document-length
    distribution and a shifted snapshot (+doc_id%40 chars): base-
    quantile bin edges (exact percentiles, the agg_percentiles
    precedent), one histogram pass per snapshot, per-bin PSI terms so
    the report says WHERE the mass moved. The oracle replays edges,
    the CASE-ladder binning, eps flooring and the term arithmetic."""
    from pandasvcf_spark.operators.relational import psi_report

    base = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cur = base.select(
        "doc_id",
        (F.col("n_chars") + F.col("doc_id") % 40)
        .cast("long")
        .alias("n_chars"),
    )
    return psi_report(base, cur, "n_chars", n_bins=10)


@register(
    "t_bigram_lm",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {_WORDS} AS ws FROM documents),
    wd AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws
      FROM docs WHERE len(ws) >= 1),
    seq AS (
      SELECT doc_id, p, ws[p] AS w,
             CASE WHEN p > 1 THEN ws[p - 1] END AS prev
      FROM wd),
    uni AS (SELECT w, count(*) AS cu FROM seq GROUP BY w),
    big AS (SELECT prev, w, count(*) AS cb FROM seq
            WHERE prev IS NOT NULL GROUP BY prev, w),
    tot AS (SELECT sum(cu) AS t FROM uni),
    sc AS (
      SELECT s.doc_id,
             CASE WHEN s.prev IS NULL
                    THEN log10(u.cu / CAST(tot.t AS DOUBLE))
                  WHEN b.cb IS NOT NULL
                    THEN log10(b.cb / CAST(pu.cu AS DOUBLE))
                  ELSE log10(0.4 * u.cu / CAST(tot.t AS DOUBLE)) END AS lp
      FROM seq s
      JOIN uni u ON s.w = u.w
      LEFT JOIN uni pu ON s.prev = pu.w
      LEFT JOIN big b ON s.prev = b.prev AND s.w = b.w
      CROSS JOIN tot)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(avg(lp), 4) AS avg_logprob
    FROM sc GROUP BY doc_id
    """,
)
def t_bigram_lm(spark, sf_dir):
    """Self-trained bigram LM fluency score with stupid backoff
    (operators/text_features.bigram_lm_stats; Brants et al. 2007) —
    the context-aware upgrade of t_word_logprob: real words in
    gibberish ORDER score low here and fine there. Counts are
    vocabulary-sized partial aggregates (no discount renormalization —
    the property stupid backoff exists for at corpus scale); the
    oracle replays position extraction, both count tables, and the
    three-branch backoff CASE."""
    from pandasvcf_spark.operators.text_features import bigram_lm_stats

    return bigram_lm_stats(load(spark, sf_dir, "documents"))


#: Shared Kneser-Ney per-position logprob CTE chain (ends at `sc`:
#: one row per word position with its interpolated-KN log10 prob) —
#: used by t_bigram_logprob (per-doc fold) and t_ccnet_buckets
#: (per-language perplexity terciles).
_KN_SC_CTES = f"""docs AS (
      SELECT doc_id, {_WORDS} AS ws FROM documents),
    wd AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws
      FROM docs WHERE len(ws) >= 1),
    seq AS (
      SELECT doc_id, p, ws[p] AS w,
             CASE WHEN p > 1 THEN ws[p - 1] END AS prev
      FROM wd),
    uni AS (SELECT w, count(*) AS cu FROM seq GROUP BY w),
    big AS (SELECT prev, w, count(*) AS cb FROM seq
            WHERE prev IS NOT NULL GROUP BY prev, w),
    tot AS (SELECT sum(cu) AS t FROM uni),
    ctx AS (SELECT prev, sum(cb) AS s, count(*) AS n1fwd
            FROM big GROUP BY prev),
    cont AS (SELECT w, count(*) AS n1bwd FROM big GROUP BY w),
    types AS (SELECT count(*) AS nt FROM big),
    sc AS (
      SELECT s.doc_id,
             CASE WHEN s.prev IS NULL
                    THEN log10(u.cu / CAST(tot.t AS DOUBLE))
                  ELSE log10(
                    greatest(coalesce(b.cb, 0) - CAST(0.75 AS DOUBLE),
                             CAST(0.0 AS DOUBLE))
                      / CAST(c.s AS DOUBLE)
                    + (CAST(0.75 AS DOUBLE) * c.n1fwd
                       / CAST(c.s AS DOUBLE))
                      * (k.n1bwd / CAST(ty.nt AS DOUBLE)))
             END AS lp
      FROM seq s
      JOIN uni u ON s.w = u.w
      LEFT JOIN big b ON s.prev = b.prev AND s.w = b.w
      LEFT JOIN ctx c ON s.prev = c.prev
      LEFT JOIN cont k ON s.w = k.w
      CROSS JOIN types ty
      CROSS JOIN tot)"""


@register(
    "t_bigram_logprob",
    oracle=f"""
    WITH {_KN_SC_CTES}
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(avg(lp), 4) AS avg_logprob
    FROM sc GROUP BY doc_id
    """,
)
def t_bigram_logprob(spark, sf_dir):
    """Self-trained interpolated Kneser-Ney bigram score
    (operators/text_features.bigram_kn_stats; Kneser & Ney 1995, the
    Chen-Goodman-winning smoother) — the proper-LM upgrade of
    t_bigram_lm's stupid backoff: every seen bigram discounts by
    D = 0.75 and exactly that mass redistributes over the CONTINUATION
    distribution (distinct-context counts), so each context
    distribution sums to exactly 1 (context denominator = bigram-START
    count, pinned in tests). Counts stay vocabulary/bigram-type-sized
    partial aggregates; the oracle replays position extraction, all
    five count tables, and the discount/interpolation arithmetic
    term-for-term (0.75 CAST to DOUBLE — DECIMAL literal inference
    would drift)."""
    from pandasvcf_spark.operators.text_features import bigram_kn_stats

    return bigram_kn_stats(load(spark, sf_dir, "documents"))


@register(
    "t_mattr",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_WORDS} AS w FROM documents
      WHERE text IS NOT NULL),
    nz AS (SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0)
    SELECT doc_id AS id, CAST(n AS BIGINT) AS n_tokens,
      round(CASE WHEN n <= 50
        THEN CAST(len(list_distinct(w)) AS DOUBLE) / n
        ELSE list_sum(list_transform(generate_series(1, n - 50 + 1),
          i -> CAST(len(list_distinct(w[i:i+49])) AS DOUBLE) / 50))
          / (n - 50 + 1)
        END, 6) AS mattr
    FROM nz
    """,
)
def t_mattr(spark, sf_dir):
    """Moving-average type-token ratio (operators/text_features.
    mattr_stats; Covington & McFall 2010) at window 50 — the
    length-independent lexical-diversity quality signal: mean TTR over
    every 50-token sliding window, full-length TTR for shorter docs.
    Pure per-row HOFs, zero shuffle; the oracle replays every window
    slice with DuckDB list functions in the same fold order."""
    from pandasvcf_spark.operators.text_features import mattr_stats

    return mattr_stats(load(spark, sf_dir, "documents"), window=50)


def _textrank_oracle(iters: int = 3, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank over the undirected
    adjacent-word graph — the _pagerank_oracle device with a word-graph
    edge CTE (string node ids)."""
    parts = [
        f"""
    WITH docs AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    wd AS (
      SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws
      FROM docs WHERE len(ws) >= 1),
    seqt AS (
      SELECT ws[p] AS w, CASE WHEN p > 1 THEN ws[p - 1] END AS prev
      FROM wd),
    eb AS (SELECT prev AS a, w AS b FROM seqt WHERE prev IS NOT NULL),
    e AS (SELECT DISTINCT a, b FROM
          (SELECT a, b FROM eb UNION ALL SELECT b AS a, a AS b FROM eb)),
    nodes AS (SELECT a AS id FROM e UNION SELECT b FROM e),
    deg AS (SELECT a, count(*) AS dg FROM e GROUP BY a),
    p AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / n AS rank FROM nodes, p)"""
    ]
    for i in range(iters):
        parts.append(f""",
    d{i} AS (SELECT COALESCE(sum(rank), 0) AS m FROM r{i}
             LEFT JOIN deg ON r{i}.id = deg.a WHERE deg.a IS NULL),
    c{i} AS (SELECT e.b AS id, sum(r{i}.rank / deg.dg) AS inflow
             FROM e JOIN deg ON e.a = deg.a JOIN r{i} ON e.a = r{i}.id
             GROUP BY e.b),
    r{i + 1} AS (SELECT nodes.id,
                 (1 - {d}) / p.n + {d} * (d{i}.m / p.n
                                          + COALESCE(c{i}.inflow, 0)) AS rank
                 FROM nodes CROSS JOIN p CROSS JOIN d{i}
                 LEFT JOIN c{i} ON nodes.id = c{i}.id)""")
    parts.append(f"""
    SELECT id AS word, round(rank, 9) AS rank FROM r{iters}
    """)
    return "".join(parts)


@register("t_textrank", oracle=_textrank_oracle())
def t_textrank(spark, sf_dir):
    """TextRank keyword scores (Mihalcea & Tarau 2004): PageRank over
    the undirected adjacent-word co-occurrence graph of the corpus —
    graph-centrality keyword extraction, composed ENTIRELY from owned
    machinery: the bigram position chain (t_bigram_lm) builds the edge
    list, operators/graph.pagerank (3 fixed rounds, dangling-corrected)
    ranks it. The catalog entry verifies the FULL (word, rank) vector
    to 1e-9 (stronger than a top-k cut, and immune to float-tie
    boundary order); keyword extraction is an ORDER BY rank DESC away.
    The oracle is the unrolled PageRank definition over the same word
    graph (the g_pagerank device with string node ids)."""
    from pyspark.sql import Window

    from pandasvcf_spark.functions.text import words_expr
    from pandasvcf_spark.operators.graph import pagerank

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        F.posexplode(words_expr("text")).alias("__p", "__w"),
    )
    w = Window.partitionBy("doc_id").orderBy("__p")
    seq = d.withColumn("__prev", F.lag("__w").over(w)).filter(
        F.col("__prev").isNotNull()
    )
    eb = seq.select(
        F.col("__prev").alias("src"), F.col("__w").alias("dst")
    )
    edges = eb.unionAll(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = pagerank(edges, damping=0.85, iters=3)
    return out.select(
        F.col("id").alias("word"), F.round("rank", 9).alias("rank")
    )


@register(
    "t_pmi_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, list_sort(list_distinct({_WORDS})) AS ws
      FROM documents WHERE text IS NOT NULL),
    dd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
    w AS (SELECT doc_id, unnest(ws) AS w FROM d),
    wc AS (SELECT w, CAST(count(*) AS BIGINT) AS nw FROM w GROUP BY w),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w HAVING count(*) >= 5),
    j AS (
      SELECT w1, w2, n_pair, c1.nw AS n_w1, c2.nw AS n_w2
      FROM pairs
      JOIN wc c1 ON pairs.w1 = c1.w
      JOIN wc c2 ON pairs.w2 = c2.w)
    SELECT w1, w2, n_pair, n_w1, n_w2,
           round(ln((CAST(n_pair AS DOUBLE) * nd)
                    / (CAST(n_w1 AS DOUBLE) * n_w2)), 6) AS pmi
    FROM j, dd
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def t_pmi_pairs(spark, sf_dir):
    """Top document-level word-pair PMI collocations (operators/
    text_features.pmi_pairs; Church & Hanks 1990) over documents —
    association mining for corpus analysis. Pair generation is an
    index-slice HOF over each doc's sorted distinct word array (no
    self-join; the oracle's a.doc_id = b.doc_id self-join states the
    same pair set declaratively); marginals join back vocab-keyed, D
    broadcasts as one row, TakeOrdered under the total order
    (pmi DESC, w1, w2) keeps 50."""
    from pandasvcf_spark.operators.text_features import pmi_pairs

    d = load(spark, sf_dir, "documents")
    return pmi_pairs(d, min_count=5, top_n=50)


@register(
    "t_readability",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             {_WORDS} AS ws,
             greatest(1, len(list_filter(
               string_split_regex(text, '[.!?]+'),
               s -> trim(s) <> ''))) AS n_sent,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               + len(list_filter({_WORDS},
                   w -> NOT regexp_matches(w, '[aeiouy]'))) AS n_syll
      FROM documents WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             CAST(n_sent AS BIGINT) AS n_sentences,
             CAST(n_syll AS BIGINT) AS n_syll
      FROM base),
    f AS (
      SELECT doc_id, n_words, n_sentences,
             CASE WHEN n_words > 0 THEN n_syll ELSE 0 END AS n_syllables,
             CAST(n_words AS DOUBLE) / n_sentences AS wps,
             CAST(n_syll AS DOUBLE) / n_words AS spw
      FROM c)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(CASE WHEN n_words > 0
                 THEN 206.835 - 1.015 * wps - 84.6 * spw END, 4) + 0.0
             AS flesch,
           round(CASE WHEN n_words > 0
                 THEN 0.39 * wps + 11.8 * spw - 15.59 END, 4) + 0.0
             AS fk_grade
    FROM f
    """,
)
def t_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per document
    (operators/text_features.readability_stats; Kincaid et al. 1975) —
    the interpretable quality-filter complement to t_quality_score.
    Vowel-group syllable heuristic with vowelless words floored at one
    syllable; unpunctuated text reads as one sentence. Pure native
    column expressions, zero shuffle; the oracle replays counts and
    both formulas term-for-term."""
    from pandasvcf_spark.operators.text_features import readability_stats

    d = load(spark, sf_dir, "documents")
    return readability_stats(d)


@register(
    "t_l_diversity",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(n_chars % 7 AS BIGINT) AS sv,
             CAST(count(*) AS BIGINT) AS c
      FROM documents
      GROUP BY lang, source, n_chars % 7),
    g AS (
      SELECT lang, source,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN sv IS NOT NULL THEN c ELSE 0 END)
                  AS DOUBLE) AS ns,
             CAST(count(CASE WHEN sv IS NOT NULL THEN 1 END)
                  AS BIGINT) AS n_sensitive,
             max(CASE WHEN sv IS NOT NULL THEN c END) AS topc,
             sum(CASE WHEN sv IS NOT NULL
                 THEN CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) END)
               AS clogc
      FROM cells GROUP BY lang, source)
    SELECT lang, source, n, n_sensitive,
           round(CASE WHEN n_sensitive > 0 THEN topc / ns END, 6) + 0.0
             AS top_share,
           round(CASE WHEN n_sensitive > 0 THEN ln(ns) - clogc / ns END,
                 6) + 0.0 AS entropy,
           n_sensitive >= 3 AS distinct_l_ok,
           CASE WHEN n_sensitive > 0
                THEN (ln(ns) - clogc / ns) >= ln(3.0)
                ELSE FALSE END AS entropy_l_ok
    FROM g
    """,
)
def t_l_diversity(spark, sf_dir):
    """l-diversity audit of (lang, source) quasi-groups with
    n_chars%7 as the stand-in sensitive attribute (operators/
    sampling.l_diversity_report; Machanavajjhala et al. 2007) — the
    homogeneity-attack check that completes the t_k_anonymize privacy
    gate: group size alone doesn't protect a group holding one
    sensitive value. One groupBy(quasi, sensitive) collapses the
    corpus to value cells; rollup + entropy fold run over cells. The
    oracle replays cells, shares, the entropy identity
    ln(n) − Σ c·ln(c)/n and both pass flags at l=3."""
    from pandasvcf_spark.operators.sampling import l_diversity_report

    d = load(spark, sf_dir, "documents").withColumn(
        "sv", (F.col("n_chars") % 7).cast("bigint")
    )
    return l_diversity_report(d, ["lang", "source"], "sv", l=3)


@register(
    "t_source_overlap",
    oracle=f"""
    WITH cells AS (
      SELECT DISTINCT source AS src, unnest({_WORDS}) AS w
      FROM documents
      WHERE text IS NOT NULL AND source IS NOT NULL),
    vocab AS (
      SELECT src, CAST(count(*) AS BIGINT) AS v FROM cells GROUP BY src),
    inter AS (
      SELECT a.src AS src_a, b.src AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM cells a JOIN cells b ON a.w = b.w AND a.src < b.src
      GROUP BY a.src, b.src)
    SELECT i.src_a, i.src_b, va.v AS vocab_a, vb.v AS vocab_b,
           i.n_common,
           round(i.n_common
                 / CAST(va.v + vb.v - i.n_common AS DOUBLE), 6) + 0.0
             AS jaccard,
           round(i.n_common / CAST(va.v AS DOUBLE), 6) + 0.0
             AS contain_a_in_b,
           round(i.n_common / CAST(vb.v AS DOUBLE), 6) + 0.0
             AS contain_b_in_a
    FROM inter i
    JOIN vocab va ON i.src_a = va.src
    JOIN vocab vb ON i.src_b = vb.src
    """,
)
def t_source_overlap(spark, sf_dir):
    """Pairwise source-vocabulary overlap matrix (operators/
    text_features.source_overlap) — Jaccard + both containments per
    source pair, the mixture designer's duplication map. The corpus
    collapses to (source, word) cells in one groupBy; the intersection
    self-join is word-keyed over that table (bounded by
    sources-per-word², never corpus rows). The oracle states the same
    cells and joins declaratively."""
    from pandasvcf_spark.operators.text_features import source_overlap

    return source_overlap(load(spark, sf_dir, "documents"))


@register(
    "t_gini",
    oracle=f"""
    WITH counts AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest({_WORDS}) AS w
        FROM documents WHERE text IS NOT NULL)
      GROUP BY w),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, w) AS i FROM counts),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(c) AS BIGINT) AS tokens,
             sum(CAST(i AS DOUBLE) * c) AS ic
      FROM ranked)
    SELECT vocab, tokens,
           round(CASE WHEN vocab > 0 AND tokens > 0 THEN
             (2.0 * ic - (CAST(vocab AS DOUBLE) + 1.0) * tokens)
             / (CAST(vocab AS DOUBLE) * tokens) END, 6) + 0.0 AS gini
    FROM agg
    """,
)
def t_gini(spark, sf_dir):
    """Gini concentration of the word-frequency distribution
    (operators/text_features.gini_concentration) — the one-number
    companion to t_zipf_stats: how unequally do tokens spread over the
    vocabulary? Sorted-rank identity over the VOCAB-sized count table
    under the deterministic (count, word) order; the corpus collapses
    before anything sorts. The oracle replays counts, ranks and the
    identity."""
    from pandasvcf_spark.operators.text_features import gini_concentration

    return gini_concentration(load(spark, sf_dir, "documents"))


def _html_strip_sql(col: str) -> str:
    """DuckDB twin of functions/text.html_text_expr: the same literal
    patterns in the same order, with the 'g' flag DuckDB needs for
    replace-all (Spark's regexp_replace is always global)."""
    from pandasvcf_spark.functions.text import HTML_STRIP_STEPS

    out = col
    for _, pat, rep in HTML_STRIP_STEPS:
        # DuckDB standard strings are backslash-literal: only quotes
        # need escaping, the regex backslashes pass through verbatim
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"


@register(
    "t_html_extract",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             '<html><head><style>p {{{{color: red}}}}</style>'
             || '<script>var x = "<p>no</p>";</script></head>'
             || '<body><!-- c --><h1>' || lang || '</h1><p>'
             || text || '&nbsp;&amp; more</p></body></html>' AS html
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
    SELECT doc_id, {_html_strip_sql('html')} AS clean
    FROM synth
    """,
)
def t_html_extract(spark, sf_dir):
    """HTML→text extraction (functions/text.html_text_expr) — the
    first transformation of every web-crawl pipeline, in its
    deterministic regex-core form: each document is wrapped in a
    synthesized page (style + script bodies, a comment, entities) and
    must come back as clean visible text. Pure chained regexp_replace
    in the Java∩RE2 dialect; the oracle replays the IDENTICAL pattern
    literals (generated from the same list) with DuckDB's 'g' flag."""
    from pandasvcf_spark.functions.text import html_text_expr

    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    html = F.concat(
        F.lit('<html><head><style>p {color: red}</style>'
              '<script>var x = "<p>no</p>";</script></head>'
              '<body><!-- c --><h1>'),
        F.col("lang"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("&nbsp;&amp; more</p></body></html>"),
    )
    return d.select("doc_id", html_text_expr(html).alias("clean"))


@register(
    "t_naive_bayes",
    oracle=f"""
    WITH nn AS (
      SELECT lang AS label, text FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL),
    words AS (
      SELECT label, unnest({_WORDS}) AS w FROM nn),
    wc AS (
      SELECT label, w, CAST(count(*) AS BIGINT) AS n_wy
      FROM words GROUP BY label, w),
    lt AS (SELECT label, sum(n_wy) AS ty FROM wc GROUP BY label),
    vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS V FROM wc),
    docs AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_docs
      FROM nn GROUP BY label),
    dt AS (SELECT sum(n_docs) AS D FROM docs)
    SELECT wc.label, wc.w, wc.n_wy,
           round(ln((wc.n_wy + 1.0)
                    / (CAST(lt.ty AS DOUBLE) + 1.0 * vv.V)), 6) + 0.0
             AS log_lik,
           round(ln(1.0 / (CAST(lt.ty AS DOUBLE) + 1.0 * vv.V)), 6)
             + 0.0 AS log_default,
           round(ln(CAST(docs.n_docs AS DOUBLE) / dt.D), 6) + 0.0
             AS log_prior
    FROM wc
    JOIN lt ON wc.label = lt.label
    JOIN docs ON wc.label = docs.label, vv, dt
    """,
)
def t_naive_bayes(spark, sf_dir):
    """Multinomial Naive Bayes trained on documents with lang as the
    label (operators/text_features.naive_bayes_train, α=1 Laplace) —
    the two-aggregation distributed classifier baseline: the ONLY
    data-sized shuffle is groupBy(label, word); label totals, |V| and
    doc priors are label-sized/1-row broadcasts; the model table stays
    sparse (observed pairs + a per-label default for unseen words).
    The entry emits likelihoods joined with priors; the oracle replays
    counts, smoothing and all three log quantities."""
    from pandasvcf_spark.operators.text_features import naive_bayes_train

    d = load(spark, sf_dir, "documents")
    lik, pri = naive_bayes_train(d, "lang")
    return lik.join(pri.select("label", "log_prior"), on="label")


@register(
    "t_nb_predict",
    oracle=f"""
    WITH nn AS (
      SELECT lang AS label, text FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL),
    tw AS (SELECT label, unnest({_WORDS}) AS w FROM nn),
    wcnt AS (
      SELECT label, w, CAST(count(*) AS BIGINT) AS n_wy
      FROM tw GROUP BY label, w),
    lt AS (SELECT label, sum(n_wy) AS ty FROM wcnt GROUP BY label),
    vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS V FROM wcnt),
    docs AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_docs
      FROM nn GROUP BY label),
    dtot AS (SELECT sum(n_docs) AS D FROM docs),
    lik AS (
      SELECT wcnt.label, wcnt.w,
             round(ln((wcnt.n_wy + 1.0)
                      / (CAST(lt.ty AS DOUBLE) + 1.0 * vv.V)), 6)
               + 0.0 AS log_lik
      FROM wcnt JOIN lt ON wcnt.label = lt.label, vv),
    consts AS (
      SELECT lt.label,
             round(ln(1.0 / (CAST(lt.ty AS DOUBLE) + 1.0 * vv.V)), 6)
               + 0.0 AS dflt,
             round(ln(CAST(docs.n_docs AS DOUBLE) / dtot.D), 6) + 0.0
               AS lp
      FROM lt JOIN docs ON lt.label = docs.label, vv, dtot),
    q AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 200 AND text IS NOT NULL),
    qw AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, unnest({_WORDS}) AS w FROM q) GROUP BY doc_id, w),
    qtok AS (SELECT doc_id, sum(cnt) AS tok FROM qw GROUP BY doc_id),
    matched AS (
      SELECT qw.doc_id, lik.label,
             sum(qw.cnt * lik.log_lik) AS ms,
             sum(qw.cnt) AS mt
      FROM qw JOIN lik ON qw.w = lik.w
      GROUP BY qw.doc_id, lik.label),
    scaffold AS (
      SELECT q.doc_id, coalesce(qtok.tok, 0) AS tok,
             consts.label, consts.dflt, consts.lp
      FROM q LEFT JOIN qtok ON q.doc_id = qtok.doc_id, consts),
    scored AS (
      SELECT s.doc_id, s.label,
             round(s.lp + coalesce(m.ms, 0.0)
                   + CAST(s.tok - coalesce(m.mt, 0) AS DOUBLE)
                     * s.dflt, 6) + 0.0 AS score
      FROM scaffold s
      LEFT JOIN matched m
        ON s.doc_id = m.doc_id AND s.label = m.label)
    SELECT doc_id, label, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, label) = 1
             AS is_pred
    FROM scored
    """,
)
def t_nb_predict(spark, sf_dir):
    """Naive Bayes scoring (operators/text_features.naive_bayes_score)
    of the first 200 documents against the lang-labeled model trained
    on the full corpus — the distributed predict half completing
    t_naive_bayes: sparse-model math made dense-equivalent by the
    per-label unseen-word default, vocab-keyed model join, labels-sized
    scaffold broadcast, one per-doc argmax window (deterministic tie
    order on the ROUNDED score). The oracle replays training AND
    scoring end to end."""
    from pandasvcf_spark.operators.text_features import (
        naive_bayes_score,
        naive_bayes_train,
    )

    d = load(spark, sf_dir, "documents")
    lik, pri = naive_bayes_train(d, "lang")
    q = d.filter(F.col("doc_id") < 200)
    return naive_bayes_score(q, lik, pri)


@register(
    "t_chi2_terms",
    oracle=f"""
    WITH nn AS (
      SELECT lang AS label, text FROM documents
      WHERE lang IS NOT NULL AND text IS NOT NULL),
    cells AS (
      SELECT label, w, CAST(count(*) AS BIGINT) AS a FROM (
        SELECT label, unnest(list_distinct({_WORDS})) AS w FROM nn)
      GROUP BY label, w),
    ny AS (SELECT label, CAST(count(*) AS BIGINT) AS n_y
           FROM nn GROUP BY label),
    nt AS (SELECT sum(n_y) AS N FROM ny),
    dfw AS (SELECT w, sum(a) AS dw FROM cells GROUP BY w),
    m AS (
      SELECT c.label, c.w, c.a,
             CAST(c.a AS DOUBLE) AS ad,
             CAST(dfw.dw - c.a AS DOUBLE) AS bd,
             CAST(ny.n_y - c.a AS DOUBLE) AS cd,
             CAST(nt.N - ny.n_y AS DOUBLE)
               - CAST(dfw.dw - c.a AS DOUBLE) AS dd,
             CAST(nt.N AS DOUBLE) AS nd
      FROM cells c
      JOIN dfw ON c.w = dfw.w
      JOIN ny ON c.label = ny.label, nt),
    scored AS (
      SELECT label, w, a AS n_docs_with,
             round(CASE WHEN (ad+bd)*(cd+dd)*(ad+cd)*(bd+dd) > 0
                   THEN nd * (ad*dd - bd*cd) * (ad*dd - bd*cd)
                        / ((ad+bd)*(cd+dd)*(ad+cd)*(bd+dd)) END, 4)
               + 0.0 AS chi2
      FROM m)
    SELECT label, w, n_docs_with, chi2 FROM (
      SELECT *, row_number() OVER (
        PARTITION BY label ORDER BY chi2 DESC NULLS LAST, w) AS rn
      FROM scored) WHERE rn <= 10
    """,
)
def t_chi2_terms(spark, sf_dir):
    """Top chi-square label-distinctive terms per language
    (operators/text_features.chi2_terms; Yang & Pedersen 1997 / sklearn
    chi2) — the feature-selection readout beside t_naive_bayes. One
    distinct-presence explode + (label, word) count is the only
    data-sized shuffle; margins join back vocab-/labels-sized and the
    2×2's absent cells stay arithmetic. Expected near-flat chi2 on
    this synthetic corpus — the entry checks the statistic. The oracle
    replays cells, margins, the chi-square and the per-label rank."""
    from pandasvcf_spark.operators.text_features import chi2_terms

    return chi2_terms(load(spark, sf_dir, "documents"), "lang",
                      top_n=10)


def _rake_phrases_sql() -> str:
    """DuckDB twin of rake_keyphrases' string-level segmentation —
    generated from the SAME STOPWORDS list so the literals match."""
    from pandasvcf_spark.functions.text import STOPWORDS

    sw = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return (
        "list_filter(list_transform(string_split("
        "regexp_replace(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), "
        f"'{sw}', '|', 'g'), '|'), "
        "s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))), s -> s <> '')"
    )


@register(
    "t_rake_phrases",
    oracle=f"""
    WITH phrases AS (
      SELECT unnest({_rake_phrases_sql()}) AS phrase
      FROM documents WHERE text IS NOT NULL),
    pw AS (
      SELECT phrase, string_split(phrase, ' ') AS ws,
             len(string_split(phrase, ' ')) AS plen
      FROM phrases),
    wstat AS (
      SELECT w, CAST(sum(plen) AS DOUBLE) / count(*) AS wscore
      FROM (SELECT unnest(ws) AS w, plen FROM pw) GROUP BY w),
    pc AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
             max(plen) AS plen
      FROM pw GROUP BY phrase),
    scored AS (
      SELECT pc.phrase, pc.n_occurrences, pc.plen,
             sum(wstat.wscore) AS score
      FROM pc, unnest(string_split(pc.phrase, ' ')) AS u(w)
      JOIN wstat ON u.w = wstat.w
      GROUP BY pc.phrase, pc.n_occurrences, pc.plen)
    SELECT phrase, n_occurrences, CAST(plen AS INT) AS n_words,
           round(score, 4) + 0.0 AS score
    FROM scored
    ORDER BY score DESC, phrase LIMIT 20
    """,
)
def t_rake_phrases(spark, sf_dir):
    """Corpus RAKE keyphrases (operators/text_features.rake_keyphrases;
    Rose et al. 2010): maximal non-stopword runs scored by summed
    word degree/frequency. Engine-portable string-level segmentation
    (the oracle's patterns generate from the SAME stopword list);
    vocab-sized word-score agg, phrase-word-keyed score join,
    TakeOrdered top-20 under (score DESC, phrase)."""
    from pandasvcf_spark.operators.text_features import rake_keyphrases

    return rake_keyphrases(load(spark, sf_dir, "documents"), top_n=20)


@register(
    "t_url_normalize",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             'HTTP://WWW.' || source || '.COM:80/Docs/'
             || CAST(doc_id AS VARCHAR) || '/?utm_source=x&b='
             || lang || '&a=1#sec' AS u
      FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL),
    st AS (
      SELECT doc_id,
             regexp_extract(regexp_replace(u, '#.*$', ''),
                            '^[^?]*', 0) AS base,
             regexp_extract(regexp_replace(u, '#.*$', ''),
                            '^[^?]*\?(.*)$', 1) AS query
      FROM synth),
    sh AS (
      SELECT doc_id, base, query,
             regexp_extract(base,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', 0) AS schemehost
      FROM st),
    parts AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(schemehost), '://www\.', '://'),
                 '^(http://.*):80$', '\1'),
               '^(https://.*):443$', '\1') AS host_norm,
             regexp_replace(substr(base, length(schemehost) + 1),
                            '/+$', '') AS rest_norm,
             array_to_string(list_sort(list_filter(
               string_split(query, '&'),
               p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))), '&')
               AS q_norm
      FROM sh)
    SELECT doc_id,
           host_norm || rest_norm
           || CASE WHEN q_norm <> '' THEN '?' || q_norm ELSE '' END
             AS canonical
    FROM parts
    """,
)
def t_url_normalize(spark, sf_dir):
    """URL canonicalization (functions/text.url_normalize_expr) — the
    crawl-dedup key: each document gets a synthesized messy URL (upper
    scheme/host, www, default port, tracking params, unsorted query,
    fragment) that must normalize to its canonical form. Pure native
    regexp + array-HOF expressions in the Java∩RE2 dialect; the oracle
    replays every step with the identical literals."""
    from pandasvcf_spark.functions.text import url_normalize_expr

    d = load(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    u = F.concat(
        F.lit("HTTP://WWW."),
        F.col("source"),
        F.lit(".COM:80/Docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=x&b="),
        F.col("lang"),
        F.lit("&a=1#sec"),
    )
    return d.select("doc_id", url_normalize_expr(u).alias("canonical"))


@register(
    "t_bleu_rouge",
    oracle="""
    WITH pr AS (
      SELECT a.doc_id AS pid,
             regexp_extract_all(lower(a.text), '[a-z]+') AS cw,
             regexp_extract_all(lower(b.text), '[a-z]+') AS rw
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 2 = 0
        AND a.text IS NOT NULL AND b.text IS NOT NULL),
    cg AS (
      SELECT pid, n, g, CAST(count(*) AS BIGINT) AS cc FROM (
        SELECT pid, 1 AS n, unnest(cw) AS g FROM pr
        UNION ALL
        SELECT pid, 2 AS n, cw[p] || ' ' || cw[p + 1] AS g
        FROM (SELECT pid, cw,
                     unnest(generate_series(1, len(cw) - 1)) AS p
              FROM pr WHERE len(cw) >= 2))
      GROUP BY pid, n, g),
    rg AS (
      SELECT pid, n, g, CAST(count(*) AS BIGINT) AS rc FROM (
        SELECT pid, 1 AS n, unnest(rw) AS g FROM pr
        UNION ALL
        SELECT pid, 2 AS n, rw[p] || ' ' || rw[p + 1] AS g
        FROM (SELECT pid, rw,
                     unnest(generate_series(1, len(rw) - 1)) AS p
              FROM pr WHERE len(rw) >= 2))
      GROUP BY pid, n, g),
    j AS (
      SELECT coalesce(cg.n, rg.n) AS n,
             coalesce(cc, 0) AS cc, coalesce(rc, 0) AS rc
      FROM cg FULL OUTER JOIN rg
        ON cg.pid = rg.pid AND cg.n = rg.n AND cg.g = rg.g),
    a AS (
      SELECT CAST(sum(CASE WHEN n = 1 THEN least(cc, rc) END)
                  AS DOUBLE) AS m1,
             CAST(sum(CASE WHEN n = 2 THEN least(cc, rc) END)
                  AS DOUBLE) AS m2,
             CAST(sum(CASE WHEN n = 1 THEN cc END) AS BIGINT)
               AS cand_len,
             CAST(sum(CASE WHEN n = 2 THEN cc END) AS DOUBLE) AS t2,
             CAST(sum(CASE WHEN n = 1 THEN rc END) AS BIGINT)
               AS ref_len,
             CAST(sum(CASE WHEN n = 2 THEN rc END) AS DOUBLE) AS rt2
      FROM j),
    np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pr)
    SELECT n_pairs, cand_len, ref_len,
           round(CASE WHEN cand_len > 0
                 THEN m1 / CAST(cand_len AS DOUBLE) END, 6) AS p1,
           round(CASE WHEN t2 > 0 THEN m2 / t2 END, 6) AS p2,
           round(CASE WHEN cand_len > 0
                 THEN least(1.0, exp(1.0 - CAST(ref_len AS DOUBLE)
                                     / CAST(cand_len AS DOUBLE)))
                 END, 6) AS bp,
           round(CASE WHEN cand_len > 0 AND t2 > 0 AND m1 > 0
                      AND m2 > 0
                 THEN least(1.0, exp(1.0 - CAST(ref_len AS DOUBLE)
                                     / CAST(cand_len AS DOUBLE)))
                      * exp((ln(m1 / CAST(cand_len AS DOUBLE))
                             + ln(m2 / t2)) / 2.0) END, 6) AS bleu2,
           round(CASE WHEN rt2 > 0 THEN m2 / rt2 END, 6) AS rouge2
    FROM a, np
    """,
)
def t_bleu_rouge(spark, sf_dir):
    """Corpus BLEU-2 + ROUGE-2 recall (operators/text_features.
    corpus_bleu2; Papineni 2002, Lin 2004) of even-id documents
    against their odd-id successors — the generation-evaluation loop
    run as a distributed metric: clipped n-gram matches are corpus-
    aggregated (no sentence smoothing), the clip join is
    co-partitioned on the (pair, n, gram) count key, and the final
    statistic is a 1-row agg. High overlap expected on this shared-
    vocabulary synthetic corpus — the entry checks the metric
    arithmetic, not generation quality."""
    from pandasvcf_spark.operators.text_features import corpus_bleu2

    d = load(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("cand")
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("text").alias("ref"),
    )
    pairs = a.join(b, "pair_id")
    return corpus_bleu2(pairs, "pair_id", "cand", "ref")


@register(
    "sk_theta_intersect",
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT
        ({_SQL_POLY_HASH.format(s="c_name")} * 2654435761)
          % 2147483647 AS h
      FROM customer WHERE c_custkey <= 1200 AND c_name IS NOT NULL
      ORDER BY h LIMIT 256),
    b AS (
      SELECT DISTINCT
        ({_SQL_POLY_HASH.format(s="c_name")} * 2654435761)
          % 2147483647 AS h
      FROM customer WHERE c_custkey >= 400 AND c_name IS NOT NULL
      ORDER BY h LIMIT 256),
    ka AS (SELECT CAST(count(*) AS INT) AS k_used_a, max(h) AS kth_a
           FROM a),
    kb AS (SELECT CAST(count(*) AS INT) AS k_used_b, max(h) AS kth_b
           FROM b),
    th AS (
      SELECT k_used_a, k_used_b,
             least(CASE WHEN k_used_a < 256
                        THEN CAST(2147483647 AS BIGINT) ELSE kth_a END,
                   CASE WHEN k_used_b < 256
                        THEN CAST(2147483647 AS BIGINT) ELSE kth_b END)
               AS theta
      FROM ka, kb),
    i AS (SELECT CAST(count(*) AS BIGINT) AS n_common
          FROM a JOIN b ON a.h = b.h CROSS JOIN th
          WHERE a.h <= th.theta),
    u AS (SELECT CAST(count(*) AS BIGINT) AS n_union
          FROM (SELECT h FROM a UNION SELECT h FROM b) s
          CROSS JOIN th WHERE s.h <= th.theta)
    SELECT k_used_a, k_used_b, theta, n_common, n_union,
           round(CASE WHEN n_union > 0
                 THEN CAST(n_common AS DOUBLE) / n_union END, 6)
             AS jaccard,
           round(CAST(n_common AS DOUBLE) * 2147483647.0 / theta, 4)
             AS est_intersection,
           round(CAST(n_union AS DOUBLE) * 2147483647.0 / theta, 4)
             AS est_union
    FROM th, i, u
    """,
)
def sk_theta_intersect(spark, sf_dir):
    """Theta-sketch set-intersection estimate (operators/sketches.
    kmv_intersect, k=256) between two overlapping customer-name sets
    (custkey <= 1200 vs >= 400; true overlap = the 400..1200 band) —
    the "how much do these corpora overlap?" sketch that never
    shuffles either corpus: two 8-byte-hash TakeOrdereds, then
    sketch-sized combines under theta = min of the k-th hashes.
    Integer inputs + one multiply/divide make the ESTIMATE replay
    bit-for-bit, the sk_kmv_distinct discipline."""
    from pandasvcf_spark.operators.sketches import kmv_intersect

    cu = load(spark, sf_dir, "customer")
    a = cu.filter(F.col("c_custkey") <= 1200)
    b = cu.filter(F.col("c_custkey") >= 400)
    return kmv_intersect(a, "c_name", b, "c_name", k=256)


@register(
    "t_diversity",
    oracle=f"""
    WITH w AS (
      SELECT source, unnest({_WORDS}) AS c
      FROM documents WHERE text IS NOT NULL),
    cells AS (
      SELECT source, c, CAST(count(*) AS DOUBLE) AS cnt
      FROM w WHERE c IS NOT NULL GROUP BY source, c),
    r AS (
      SELECT source, cnt,
             sum(cnt) OVER (PARTITION BY source) AS n
      FROM cells),
    p AS (SELECT source, n, cnt / n AS p FROM r),
    agg AS (
      SELECT source, CAST(max(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS richness,
             sum(-p * ln(p)) AS sh,
             sum(p * p) AS sp
      FROM p GROUP BY source)
    SELECT source, n, richness,
           round(sh, 6) + 0.0 AS shannon,
           round(1.0 - sp, 6) AS simpson,
           round(CASE WHEN richness >= 2
                 THEN sh / ln(CAST(richness AS DOUBLE)) END, 6) + 0.0
             AS evenness
    FROM agg ORDER BY source
    """,
)
def t_diversity(spark, sf_dir):
    """Per-source token-diversity report card (operators/stats.
    diversity_indices): richness, Shannon entropy (nats), Gini-
    Simpson, Pielou evenness — the corpus-balance audit beside
    t_zipf_stats. One (source, token)-keyed vocabulary-sized count,
    then a source-keyed agg of the p-terms; evenness divides by the
    ENGINE's own ln(richness), never a Python literal (the
    t_l_diversity 1-ulp lesson). The oracle replays cells, shares
    and all four indices."""
    from pandasvcf_spark.operators.stats import diversity_indices
    from pandasvcf_spark.functions.text import words_expr

    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        "source", F.explode(words_expr("text")).alias("w")
    )
    return diversity_indices(toks, ["source"], "w").orderBy("source")


@register(
    "t_code_detect",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS n_chars FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    f AS (
      SELECT doc_id, n_chars,
             length(regexp_replace(text, '[^{}();=<>]', '', 'g'))
               AS sym,
             len(regexp_extract_all(text, '[a-z][A-Z]')) AS camel
      FROM b)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           round(CASE WHEN n_chars > 0
                 THEN CAST(sym AS DOUBLE) / n_chars END, 6)
             AS sym_ratio,
           CAST(camel AS BIGINT) AS camel_pairs,
           (CASE WHEN n_chars > 0
                 THEN CAST(sym AS DOUBLE) / n_chars > 0.02
                      OR camel >= 3
                 ELSE FALSE END) AS is_code
    FROM f ORDER BY doc_id
    """,
)
def t_code_detect(spark, sf_dir):
    """Code-vs-prose routing signals (operators/text_features.
    code_signals): symbol density + camelCase transitions + the
    routing verdict — the curation fork that sends documents to the
    code or prose pipeline (different tokenizer, filters, shingle
    size). Pure column expressions, zero Python; all-prose expected
    on this corpus (the entry checks the signal arithmetic, and the
    oracle replays the strip/extract counts and the threshold OR).
    DuckDB's regexp_replace needs the explicit 'g' flag — Spark
    replaces all matches by default."""
    from pandasvcf_spark.operators.text_features import code_signals

    d = load(spark, sf_dir, "documents")
    return code_signals(d).orderBy("doc_id")


@register(
    "t_lorenz",
    oracle="""
    WITH b AS (
      SELECT CAST(n_chars AS DOUBLE) AS v, doc_id AS id
      FROM documents
      WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
    r AS (SELECT v, row_number() OVER (ORDER BY v, id) AS rn,
                 count(*) OVER () AS n
          FROM b),
    k AS (SELECT v, CAST(floor((rn - 1) * 10 / n) AS INTEGER)
                      AS bucket
          FROM r),
    a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n, sum(v) AS bs
          FROM k GROUP BY bucket)
    SELECT bucket, n,
           round(sum(bs) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / sum(bs) OVER (), 6) AS cum_share
    FROM a ORDER BY bucket
    """,
)
def t_lorenz(spark, sf_dir):
    """Lorenz-curve deciles of document length (operators/stats.
    lorenz_deciles) — the concentration picture behind t_gini's
    scalar: how much of the corpus mass sits in the longest decile?
    Equal-population buckets by explicit floor-rank arithmetic (the
    e_rfm device, not ntile); integer lengths keep the bucket sums
    exact, and the cumulative share ladder runs over the shared
    bucket order. The oracle replays ranks, buckets and shares."""
    from pandasvcf_spark.operators.stats import lorenz_deciles

    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("doc_id").isNotNull()
    )
    return lorenz_deciles(
        d.select(F.col("n_chars").alias("v"), F.col("doc_id").alias("id")),
        "v",
        "id",
        n_buckets=10,
    )


@register(
    "sk_capture_recapture",
    oracle="""
    WITH a AS (SELECT DISTINCT c_name AS k FROM customer
               WHERE c_custkey <= 1200 AND c_name IS NOT NULL),
    b AS (SELECT DISTINCT c_name AS k FROM customer
          WHERE c_custkey >= 400 AND c_name IS NOT NULL),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM b),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m
           FROM a JOIN b ON a.k = b.k)
    SELECT n1, n2, m,
           round(CASE WHEN m > 0
                 THEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      / CAST(m AS DOUBLE) END, 4) AS lincoln,
           round((CAST(n1 AS DOUBLE) + 1.0)
                 * (CAST(n2 AS DOUBLE) + 1.0)
                 / (CAST(m AS DOUBLE) + 1.0) - 1.0, 4) AS chapman
    FROM na, nb, mm
    """,
)
def sk_capture_recapture(spark, sf_dir):
    """Lincoln-Petersen / Chapman population estimate
    (operators/stats.capture_recapture) from the sk_theta_intersect
    sample pair (custkey <= 1200 vs >= 400) — "how many distinct
    names exist in total?" from two partial crawls; the true total
    (1500) sits between the two estimators on this fixture, and the
    exact-count machinery is the ground truth the theta sketch
    approximates. Two map-side-distinct counts + one distinct-key
    join; 1-row combines. The oracle replays counts and both
    estimators."""
    from pandasvcf_spark.operators.stats import capture_recapture

    cu = load(spark, sf_dir, "customer")
    a = cu.filter(F.col("c_custkey") <= 1200)
    b = cu.filter(F.col("c_custkey") >= 400)
    return capture_recapture(a, "c_name", b, "c_name")


@register(
    "t_term_burst",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS d, unnest({_WORDS}) AS word
      FROM documents
      WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    cf AS (SELECT word, CAST(count(*) AS BIGINT) AS cf
           FROM toks GROUP BY word),
    dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT d, word FROM toks) GROUP BY word),
    j AS (SELECT cf.word AS word, cf.cf, dfq.df,
                 round(CAST(cf.cf AS DOUBLE)
                       / CAST(dfq.df AS DOUBLE), 4) AS burst
          FROM cf JOIN dfq ON cf.word = dfq.word
          WHERE dfq.df >= 5)
    SELECT word, cf, df, burst FROM j
    ORDER BY burst DESC, word LIMIT 30
    """,
)
def t_term_burst(spark, sf_dir):
    """Term burstiness (operators/text_features.term_burstiness;
    Church & Gale 1995): collection-frequency over document-frequency
    per word — content words burst into few documents, function words
    spread thin; the stopword-induction / keyword signal that
    complements TF-IDF's document view and t_zipf_stats' rank law.
    One explode + two word-keyed counts (the df side pre-distincts
    (word, doc)) + a TakeOrdered on the exact-rational rounded
    ratio."""
    from pandasvcf_spark.operators.text_features import term_burstiness

    d = load(spark, sf_dir, "documents")
    return term_burstiness(d, min_df=5, top_n=30)


@register(
    "t_theil",
    oracle="""
    WITH b AS (
      SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
      WHERE n_chars IS NOT NULL),
    g AS (SELECT
        CAST(sum(CASE WHEN v <= 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dropped,
        CAST(count(CASE WHEN v > 0 THEN 1 END) AS BIGINT) AS n,
        sum(CASE WHEN v > 0 THEN v END) AS s,
        sum(CASE WHEN v > 0 THEN v * ln(v) END) AS xlx,
        sum(CASE WHEN v > 0 THEN ln(v) END) AS lx
      FROM b)
    SELECT n, n_dropped,
           round(CASE WHEN n > 0
                 THEN xlx / (CAST(n AS DOUBLE)
                             * (s / CAST(n AS DOUBLE)))
                      - ln(s / CAST(n AS DOUBLE)) END, 6) + 0.0
             AS theil_t,
           round(CASE WHEN n > 0
                 THEN ln(s / CAST(n AS DOUBLE))
                      - lx / CAST(n AS DOUBLE) END, 6) + 0.0
             AS theil_l
    FROM g
    """,
)
def t_theil(spark, sf_dir):
    """Theil-T and Theil-L (MLD) inequality of document lengths
    (operators/stats.theil_index) — the entropy-based concentration
    pair beside t_gini's rank-based scalar and t_lorenz's curve, and
    the one that decomposes additively across subgroups. One 4-sum
    partial agg, moment ratios only; engine ln parity holds at 6dp
    (the m_js_divergence precedent). The oracle replays the sums and
    both index folds."""
    from pandasvcf_spark.operators.stats import theil_index

    d = load(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    return theil_index(d.select(F.col("n_chars").alias("v")), "v")


@register(
    "t_curriculum",
    oracle="""
    WITH b AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS score
      FROM documents
      WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
    e AS (SELECT quantile_disc(score, 0.25) AS e1,
                 quantile_disc(score, 0.5) AS e2,
                 quantile_disc(score, 0.75) AS e3 FROM b),
    h AS (SELECT doc_id, score,
            (CASE WHEN score > e1 THEN 1 ELSE 0 END
             + CASE WHEN score > e2 THEN 1 ELSE 0 END
             + CASE WHEN score > e3 THEN 1 ELSE 0 END) AS tier,
            doc_id % 4294967296 AS h0
          FROM b, e),
    m1 AS (SELECT doc_id, score, tier,
             (xor(h0, h0 // 65536) * 73244475) % 4294967296 AS x
           FROM h),
    m2 AS (SELECT doc_id, score, tier,
             (xor(x, x // 65536) * 73244475) % 4294967296 AS x
           FROM m1)
    SELECT doc_id, score, CAST(tier AS INTEGER) AS tier,
           xor(x, x // 65536) AS order_key
    FROM m2 ORDER BY doc_id
    """,
)
def t_curriculum(spark, sf_dir):
    """Curriculum tier assignment (operators/sampling.curriculum_tiers)
    over document length as the difficulty proxy: four tiers cut at
    exact type-1 quartile edges (= DuckDB's quantile_disc, the
    verified convention) + a deterministic mix32 within-tier shuffle
    key — sort by (tier, order_key) and the easy→hard schedule
    replays identically on any cluster. After the build-time edge
    walk the operator is one pure projection. The oracle replays
    edges, tier predicates and the full mix32 chain bit-for-bit."""
    from pandasvcf_spark.operators.sampling import curriculum_tiers

    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull()
    )
    return curriculum_tiers(
        d.select("doc_id", F.col("n_chars").alias("s")),
        "doc_id",
        "s",
        n_tiers=4,
    ).orderBy("doc_id")


@register(
    "t_ccnet_buckets",
    oracle=f"""
    WITH {_KN_SC_CTES},
    perdoc AS (
      SELECT doc_id, round(avg(lp), 4) AS alp
      FROM sc GROUP BY doc_id),
    wl AS (
      SELECT p.doc_id, d.lang, p.alp
      FROM perdoc p JOIN documents d USING (doc_id)
      WHERE d.lang IS NOT NULL),
    nt AS (
      SELECT lang, alp,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY alp, doc_id) AS bucket
      FROM wl)
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(alp), 4) + 0.0 AS avg_logprob,
           round(min(alp), 4) + 0.0 AS min_logprob,
           round(max(alp), 4) + 0.0 AS max_logprob
    FROM nt GROUP BY lang, bucket
    """,
)
def t_ccnet_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity terciles (Wenzek et al.
    2020 — the head/middle/tail cut LLM pipelines keep/downsample/drop
    by): every document scored by the self-trained interpolated-KN
    bigram LM (operators/text_features.bigram_kn_stats — the
    t_bigram_logprob scorer), then operators/text_features.
    ntile_bucket_stats cuts each language's docs into 3 EXACT ntile
    rank buckets WITHOUT sorting documents: (lang, rounded score)
    cells get rank intervals from a per-lang cell ladder, bucket
    boundaries are arithmetic, and each cell contributes
    interval-overlap counts. The oracle replays the LM and pins the
    tie-invariance claim by computing the same buckets through an
    explicit ntile() window."""
    from pandasvcf_spark.operators.text_features import (
        bigram_kn_stats,
        ntile_bucket_stats,
    )

    docs = load(spark, sf_dir, "documents")
    scored = bigram_kn_stats(docs).select("doc_id", "avg_logprob")
    wl = scored.join(
        docs.filter(F.col("lang").isNotNull()).select("doc_id", "lang"),
        "doc_id",
    )
    out = ntile_bucket_stats(wl, "lang", "avg_logprob", n_buckets=3)
    return out.select(
        "lang",
        "bucket",
        F.col("n_rows").alias("n_docs"),
        F.col("avg_score").alias("avg_logprob"),
        F.col("min_score").alias("min_logprob"),
        F.col("max_score").alias("max_logprob"),
    )


@register(
    "t_moore_lewis",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ind,
             unnest({_WORDS}) AS w
      FROM documents WHERE text IS NOT NULL),
    st AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c_all,
             CAST(sum(ind) AS BIGINT) AS c_in
      FROM toks GROUP BY w),
    tot AS (
      SELECT sum(c_all) AS na, sum(c_in) AS ni,
             CAST(count(*) AS BIGINT) AS v
      FROM st),
    sc AS (
      SELECT t.doc_id,
             log10((st.c_in + 1) / CAST(tot.ni + tot.v AS DOUBLE))
             - log10((st.c_all + 1) / CAST(tot.na + tot.v AS DOUBLE))
               AS lp
      FROM toks t JOIN st ON t.w = st.w CROSS JOIN tot)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           round(avg(lp), 4) + 0.0 AS ce_diff
    FROM sc GROUP BY doc_id
    """,
)
def t_moore_lewis(spark, sf_dir):
    """Moore-Lewis cross-entropy-difference selection scores
    (operators/text_features.moore_lewis_scores) with source 'src0'
    as the in-domain slice: every document scored by how much more an
    add-one unigram LM of src0 likes it than the general-corpus LM —
    the classical targeted-selection device (keep the top tail to
    synthesize in-domain training data). One vocabulary-sized
    conditional groupBy builds both LMs; the oracle replays counts,
    shared-vocabulary smoothing and the per-token log-ratio
    term-for-term."""
    from pandasvcf_spark.operators.text_features import moore_lewis_scores

    d = load(spark, sf_dir, "documents")
    return moore_lewis_scores(
        d, "doc_id", "text", F.col("source") == "src0"
    )


@register(
    "t_tokenizer_fertility",
    oracle=_bpe_cte_prefix(3)
    + f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           round(CASE WHEN sum(nw) > 0
                 THEN sum(nt) / CAST(sum(nw) AS DOUBLE) END, 4)
             + 0.0 AS fertility,
           round(CASE WHEN sum(nt) > 0
                 THEN sum(nc) / CAST(sum(nt) AS DOUBLE) END, 4)
             + 0.0 AS chars_per_token
    FROM (
      SELECT lang, len(ws) AS nw,
             coalesce(list_sum(list_transform(enc, x -> len(x))), 0)
               AS nt,
             coalesce(list_sum(list_transform(ws, w -> len(w))), 0)
               AS nc
      FROM (
        SELECT lang,
               regexp_extract_all(lower(text), '[a-z]+') AS ws,
               list_transform(regexp_extract_all(lower(text), '[a-z]+'),
                              w -> {_BPE_ENC}) AS enc
        FROM documents, m1, m2, m3
        WHERE text IS NOT NULL AND lang IS NOT NULL))
    GROUP BY lang
    """,
)
def t_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer fertility report under the trained BPE
    (operators/bpe.bpe_train + bpe_encode_expr, 3 rules — the
    t_bpe_token_counts composition aggregated the way tokenizer-equity
    audits read it): tokens-per-word (fertility — how many pieces the
    tokenizer shatters a language's words into) and chars-per-token
    (compression). A language the vocabulary under-serves shows high
    fertility — the signal for vocabulary rebalancing before training.
    One scan + one language-sized agg after the HOF encode; the
    oracle replays the trained folds and both ratios."""
    from pandasvcf_spark.functions.text import words_expr
    from pandasvcf_spark.operators.bpe import bpe_encode_expr, bpe_train

    d = load(spark, sf_dir, "documents")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(d, "text", n_merges=3).collect()
    ]
    nn = d.filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
    ws = words_expr("text")
    enc = bpe_encode_expr(F.col("text"), merges)
    per = nn.select(
        "lang",
        F.size(ws).alias("nw"),
        F.coalesce(F.size(F.flatten(enc)), F.lit(0)).alias("nt"),
        F.coalesce(
            F.aggregate(
                ws, F.lit(0).cast("long"),
                lambda acc, w: acc + F.length(w),
            ),
            F.lit(0),
        ).alias("nc"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("nt").cast("long").alias("n_tokens"),
        (
            F.round(
                F.when(
                    F.sum("nw") > 0,
                    F.sum("nt") / F.sum("nw").cast("double"),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("fertility"),
        (
            F.round(
                F.when(
                    F.sum("nt") > 0,
                    F.sum("nc") / F.sum("nt").cast("double"),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("chars_per_token"),
    )


_DSIR_HASH = _SQL_POLY_HASH.format(s="g")


@register(
    "t_dsir",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS ind,
             {_WORDS} AS ws
      FROM documents WHERE text IS NOT NULL),
    bg AS (
      SELECT doc_id, ind,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS g
      FROM toks),
    bk AS (
      SELECT doc_id, ind,
             (({_DSIR_HASH} * 2654435761) % 2147483647) % 4096 AS b
      FROM bg),
    st AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c_all,
             CAST(sum(ind) AS BIGINT) AS c_in
      FROM bk GROUP BY b),
    tot AS (SELECT sum(c_all) AS na, sum(c_in) AS ni FROM st),
    sc AS (
      SELECT k.doc_id,
             log10((st.c_in + 1) / CAST(tot.ni + 4096 AS DOUBLE))
             - log10((st.c_all + 1) / CAST(tot.na + 4096 AS DOUBLE))
               AS lw
      FROM bk k JOIN st ON k.b = st.b CROSS JOIN tot)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lw), 4) + 0.0 AS logw
    FROM sc GROUP BY doc_id
    """,
)
def t_dsir(spark, sf_dir):
    """DSIR-style hashed-bigram importance weights (operators/
    text_features.dsir_scores, 4096 buckets) with source 'src1' as the
    target distribution — t_moore_lewis's scale path: feature hashing
    bounds the model grid at n_buckets whatever the vocabulary, the
    device a 100 TB corpus needs where an exact bigram table would be
    corpus-sized. Deterministic portable hash → the bucket models,
    and every document's weight, replay exactly in SQL."""
    from pandasvcf_spark.operators.text_features import dsir_scores

    d = load(spark, sf_dir, "documents")
    return dsir_scores(
        d, "doc_id", "text", F.col("source") == "src1", n_buckets=4096
    )


@register(
    "t_temperature_mix",
    oracle="""
    WITH per AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(n_chars AS DOUBLE)) AS mass
      FROM documents WHERE lang IS NOT NULL GROUP BY lang),
    tot AS (SELECT sum(mass) AS tm, sum(pow(mass, 0.3)) AS ta FROM per)
    SELECT lang, n, round(mass, 4) AS mass,
           round(mass / tm, 9) + 0.0 AS p_natural,
           round(pow(mass, 0.3) / ta, 9) + 0.0 AS p_temp,
           round((pow(mass, 0.3) / ta) / (mass / tm), 6) + 0.0
             AS sample_factor
    FROM per CROSS JOIN tot ORDER BY lang
    """,
)
def t_temperature_mix(spark, sf_dir):
    """Temperature-based multilingual sampling weights (operators/
    sampling.temperature_weights, α = 0.3 — the mT5 default) over the
    documents table by language, sized by CHARACTER mass (n_chars):
    p_l ∝ mass_l^0.3 renormalized, the up-sample-the-tail mixture
    every multilingual pretraining run applies (Conneau et al. 2020;
    Xue et al. 2021). sample_factor is the per-language multiplier a
    loader or `weighted_sample` consumes: > 1 for low-resource
    languages, < 1 for the head. One group-sized agg + a 1-row fold;
    the oracle replays mass, pow and both normalizations."""
    from pandasvcf_spark.operators.sampling import temperature_weights

    d = load(spark, sf_dir, "documents")
    return temperature_weights(
        d, "lang", alpha=0.3, weight_col="n_chars"
    ).orderBy("lang")


@register(
    "mm_audio_fp_pairs",
    oracle="""
    WITH fps AS (
      SELECT doc_id AS id, (doc_id % 40) * 1024 + t.j AS fp
      FROM documents CROSS JOIN generate_series(0, 9) AS t(j)
      WHERE doc_id < 200
      UNION ALL
      SELECT doc_id AS id, 9999999 AS fp FROM documents WHERE doc_id < 200),
    per AS (SELECT DISTINCT id, fp FROM fps),
    hot AS (SELECT fp FROM per GROUP BY fp HAVING count(*) > 50),
    pruned AS (
      SELECT * FROM per WHERE fp NOT IN (SELECT fp FROM hot)),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(count(*) AS BIGINT) AS n_matches
      FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.id < b.id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_matches FROM pairs WHERE n_matches >= 1
    ORDER BY id_a, id_b
    """,
)
def mm_audio_fp_pairs(spark, sf_dir):
    """Audio-fingerprint near-dup PAIR machinery (operators/multimodal.
    audio_near_dup_pairs — the bucket stage of the Wang-2003 landmark
    dedup, round-15's audio tier of the corpus funnel): distinct
    per-clip hash sets, degenerate-hash skew prune (one count +
    left_anti BEFORE the self-join — a hash in > max_bucket clips
    identifies nothing and would quadratically blow the bucket), fp
    equi-join (never a crossJoin; the pytest plan guard pins it),
    match count + threshold. The landmark EXTRACTION (FFT peak
    constellation) is not SQL-expressible and is pinned by the
    numpy-replica pytest instead — the codec-shelf convention. Here
    each synthetic clip (doc_id < 200) carries 10 arithmetic hashes
    shared exactly within its doc_id%40 group plus ONE degenerate hash
    shared by every clip: without the prune the output would be all
    ~20k cross-group pairs; with it, only the 10-match group pairs —
    the prune is load-bearing in the oracle comparison."""
    from pandasvcf_spark.operators.multimodal import audio_near_dup_pairs

    base = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("audio_id"))
    )
    ten = base.select(
        "audio_id",
        F.explode(
            F.array(
                *[
                    (F.col("audio_id") % 40) * 1024 + F.lit(j).cast("long")
                    for j in range(10)
                ]
            )
        ).alias("fp"),
    )
    degen = base.select(
        "audio_id", F.lit(9999999).cast("long").alias("fp")
    )
    out = audio_near_dup_pairs(
        ten.unionByName(degen), min_matches=1, max_bucket=50
    )
    return out.select("id_a", "id_b", "n_matches").orderBy("id_a", "id_b")
