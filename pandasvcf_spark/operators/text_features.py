"""Text feature extraction: TF-IDF term weighting (SURVEY §2.11).

Classic map-side-friendly plan: tokenize → explode → per-(doc, term) counts
→ per-term document frequency → broadcast the corpus size → weight. Two
shuffles total (both partial-aggregated); the document-frequency relation is
terms-sized (small) and broadcasts back onto the term counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
