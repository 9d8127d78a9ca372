"""BM25 keyword retrieval (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond", Found. Trends IR — the Okapi BM25
in its Lucene form) — the lexical-search baseline every corpus platform
offers next to its embedding ANN, and the standard hybrid-retrieval
partner for the `similarity/` ANN paths.

Plan shape (inverted index, all declarative):
- the query-term list is a literal predicate pushed BEFORE the posting
  aggregation, so only matching postings ever aggregate — corpus tokens
  that miss the query never leave the map side;
- document frequencies for the ≤|q| query terms and the corpus stats
  (N, avgdl) are broadcast-sized frames;
- per-(doc, term) partial scores are rounded to fixed-point integers
  BEFORE the per-doc sum (the DSIR convention — FP addition order across
  a doc's matched terms would otherwise vary with partitioning), and the
  global top-k is one TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_SCALE = 10_000


def _terms(text):
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]{2,}"), F.lit(0))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25
    (idf = ln(1 + (N − df + 0.5)/(df + 0.5)), Lucene's non-negative
    form). Output: (id, score double, rnk int), rank ties broken by id.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = docs.select(
        F.col(id_col), _terms(F.col(text_col)).alias("__t")
    ).select(F.col(id_col), F.size("__t").alias("__dl"), F.col("__t"))
    stats = toks.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    postings = (
        toks.select(F.col(id_col), "__dl", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count("*").alias("df")  # one row per (doc, term) -> doc frequency
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf")
        + K1 * (1 - B + B * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        postings.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(idf * tf_part * SCORE_SCALE + F.lit(0.5))
            .cast("long")
            .alias("__s_fp"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s_fp").alias("__score_fp"))
    )
    top = (
        scored.orderBy(F.desc("__score_fp"), id_col)
        .limit(k)
        .select(
            F.col(id_col),
            (F.col("__score_fp") / SCORE_SCALE).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), id_col)  # k rows — bounded window
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))
