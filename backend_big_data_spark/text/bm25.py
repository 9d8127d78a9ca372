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


def doc_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The FULL inverted-index rows for a document frame: one row per
    (term, doc, tf) with the doc's length carried alongside —
    ``(term, id_col, tf long, dl int)``. Unfiltered (every term), so the
    frame is additive across disjoint document batches: the union of
    per-batch postings IS the corpus postings. The maintained BM25 index
    sidecar (`streaming/bm25_ingest.py`) writes exactly this."""
    toks = docs.select(
        F.col(id_col), _terms(F.col(text_col)).alias("__t")
    ).select(F.col(id_col), F.size("__t").alias("__dl"), "__t")
    return (
        toks.select(F.col(id_col), "__dl", F.explode("__t").alias("term"))
        .groupBy("term", id_col, "__dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            "term", id_col, "tf", F.col("__dl").cast("int").alias("dl")
        )
    )


def bm25_topk_from_postings(
    postings: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k scoring over pre-built index frames — the SHARED finisher
    behind the one-shot :func:`bm25_topk` (postings from a corpus scan)
    and the maintained-index path (postings from sidecars), so the two
    cannot drift (the `pca.drift_readout` discipline).

    ``postings``: (term, id_col, tf, dl) — may contain every term; the
    query-term filter here is the index LOOKUP and pushes down to the
    parquet scan on the sidecar path. ``stats``: one row (__n, __sum_dl
    long) — additive corpus stats; avgdl = __sum_dl/__n is bit-identical
    to F.avg because doc lengths are integers (double summation of
    integers below 2⁵³ is exact in any order). Per-(doc, term) partial
    scores are floor-fixed-pointed BEFORE the per-doc sum (FP addition
    order across a doc's matched terms would otherwise vary with
    partitioning), and the global top-k is one TakeOrdered."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    hits = postings.filter(F.col("term").isin(query_terms))
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")  # one row per (doc, term) -> doc freq
    )
    sstats = stats.select(
        F.col("__n"),
        (F.col("__sum_dl").cast("double") / F.col("__n")).alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf")
        + K1 * (1 - B + B * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        hits.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(sstats))
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

    One-shot form: postings and corpus stats come from a single corpus
    scan (the query-term predicate prunes postings map-side before any
    aggregation), then the shared :func:`bm25_topk_from_postings`
    finisher scores. The maintained-index form
    (`streaming/bm25_ingest.bm25_topk_from_index`) feeds the same
    finisher from at-rest sidecars without touching a document."""
    toks = docs.select(
        F.col(id_col), _terms(F.col(text_col)).alias("__t")
    ).select(F.col(id_col), F.size("__t").alias("__dl"), F.col("__t"))
    stats = toks.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").cast("long").alias("__sum_dl"),
    )
    postings = (
        toks.select(F.col(id_col), "__dl", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
        .select("term", id_col, "tf", F.col("__dl").alias("dl"))
    )
    return bm25_topk_from_postings(
        postings, stats, query_terms, k=k, id_col=id_col
    )


def tfidf_top_terms(
    tf: DataFrame,
    n_docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document from a term-frequency frame — the
    SHARED finisher behind the full-scan `plans.documents.
    doc_tfidf_top_terms` (tf from a corpus scan) and the maintained-index
    path (tf straight out of the BM25 postings sidecar, which carries
    exactly (term, doc, tf)), so the two cannot drift.

    ``tf``: (id_col, term, tf). ``n_docs``: one row (n_docs). Document
    frequency derives from ``tf`` itself (one row per (doc, term)); the
    df join back by term carries NO broadcast hint (at 100 TB the
    vocabulary is tens of GB — AQE decides); scores half-up-round BEFORE
    ranking so the cross-engine ulp difference in ``ln`` cannot flip the
    top-k ordering (term is the tie-break)."""
    from pyspark.sql.window import Window

    from backend_big_data_spark.functions.scalars import round_half_up

    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            round_half_up(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
    )
