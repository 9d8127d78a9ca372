"""Late round-4 additions: embedding-space semantic dedup (SemDeDup) and
hashed-ngram importance weighting (DSIR) — the two remaining published
building blocks of an LLM training-data curation pipeline that the engine
did not yet expose as first-class queries.

Both are oracle-gated end-to-end: SemDeDup through the fixed-centroid
trick (assignment + within-cluster cosine are deterministic), DSIR through
integer fixed-point accumulation of md5-hashed features (bit-identical on
any engine at any parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.semdedup import semdedup
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.text.dsir import LAMBDA_SCALE, importance_weights
from backend_big_data_spark.text.pii import PII_PATTERNS, pii_profile

# Deterministic anchor centroids: the first 10 corpus vectors — the same
# fixed-quantizer convention as kmeans_embedding_clusters / IVF.
_SEMDEDUP_ORACLE = """
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, v AS cv FROM vecs WHERE vec_id < 10
), assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vv.vec_id, c.cluster,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_distance(vv.v, c.cv), c.cluster) AS rn
    FROM vecs vv, cents c
  ) WHERE rn = 1
), lab AS (
  SELECT a.vec_id, a.cluster, v.v FROM assign a JOIN vecs v USING (vec_id)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM lab a JOIN lab b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) > 0.3
)
SELECT l.vec_id, l.cluster, (d.vec_id IS NULL) AS kept
FROM lab l LEFT JOIN dropped d ON l.vec_id = d.vec_id
ORDER BY l.vec_id
"""


@register("doc_semdedup_kept", oracle=_SEMDEDUP_ORACLE)
def doc_semdedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) over the embeddings table: k-means
    bucket (fixed anchor centroids, vec_id < 10), exact cosine only within
    a cluster, drop any vector with a lower-id neighbor above tau=0.3.
    The quadratic term is bounded per cluster — the LAION-scale semantic
    dedup shape. See `similarity/semdedup.py` for the plan anatomy."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    return semdedup(emb, centroids, threshold=0.3).orderBy("vec_id")


# Shared CTE chain for the DSIR scorer — one definition drives both the
# weights oracle and the resampling oracle.
_DSIR_CTES = """
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), grams AS (
  SELECT doc_id, lang, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS g
  FROM toks WHERE len(t) >= 2
), feat AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % 256 AS bucket,
         COUNT(*) AS n
  FROM grams GROUP BY 1, 2, 3
), tmodel AS (
  SELECT bucket, SUM(n) AS ct FROM feat WHERE lang = 'en' GROUP BY 1
), rmodel AS (
  SELECT bucket, SUM(n) AS cr FROM feat GROUP BY 1
), lam AS (
  SELECT b.bucket,
         CAST(floor((ln((COALESCE(ct, 0) + 0.5)
                         / ((SELECT SUM(ct) FROM tmodel) + 128.0))
                     - ln((COALESCE(cr, 0) + 0.5)
                          / ((SELECT SUM(cr) FROM rmodel) + 128.0)))
                    * 10000 + 0.5) AS BIGINT) AS lambda_fp
  FROM (SELECT unnest(range(0, 256)) AS bucket) b
  LEFT JOIN tmodel ON b.bucket = tmodel.bucket
  LEFT JOIN rmodel ON b.bucket = rmodel.bucket
), scored AS (
  SELECT f.doc_id, SUM(f.n * l.lambda_fp) AS weight_fp
  FROM feat f JOIN lam l ON f.bucket = l.bucket GROUP BY 1
), weights AS (
  SELECT d.doc_id,
         CAST(COALESCE(weight_fp, 0) AS BIGINT) AS weight_fp,
         CAST(COALESCE(weight_fp, 0) AS BIGINT) / 10000.0 AS weight
  FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
)"""

_DSIR_ORACLE = _DSIR_CTES + """
SELECT doc_id, weight_fp, weight FROM weights ORDER BY doc_id
"""


@register("doc_dsir_weights", oracle=_DSIR_ORACLE)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (arXiv:2302.03169): target = the corpus's
    English slice, raw = everything; features = md5-hashed unigrams ∪
    bigrams into 256 buckets; per-doc weight = integer fixed-point sum of
    per-bucket log-likelihood ratios (exact, order-independent — see
    `text/dsir.py`). Downstream, `doc_temperature_mix`-style samplers
    consume these weights for the resampling step."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = importance_weights(docs, target)
    assert LAMBDA_SCALE == 10_000  # oracle literal above
    return w.orderBy("doc_id")


def _pii_oracle() -> str:
    """Interpolated from PII_PATTERNS — one pattern definition drives both
    engines (the patterns avoid lookaround/backrefs so Java regex and RE2
    agree)."""
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    scrub = "text"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
WITH planted AS (
  SELECT doc_id,
         'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' or +1 555-123-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' call (555) 123-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' or 555.123.'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' at 10.0.'
         || CAST(doc_id % 256 AS VARCHAR) || '.1 ' || text AS text
  FROM documents
)
SELECT doc_id,
       {counts},
       md5({scrub}) AS redacted_md5
FROM planted ORDER BY doc_id
"""


@register("doc_pii_redacted", oracle=_pii_oracle())
def doc_pii_redacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit (`text/pii.py`): per-document match counts per PII
    class + md5 of the redacted text. The synthetic corpus carries no
    organic PII, so the query PLANTS one email, one IPv4 and all four
    supported phone shapes (intl 3-4 / intl 3-3-4 / parenthesised /
    dotted) per document
    deterministically from doc_id (both engines plant identically) — the
    planted-signal convention used by the stratified-sampling and
    blocklist oracles. Map-only; fuses into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    p4 = F.lpad((did % 10000).cast("string"), 4, "0")
    planted = docs.select(
        did,
        F.concat(
            F.lit("reach user"), did.cast("string"),
            F.lit("@example.com or +1 555-"), p4,
            F.lit(" or +1 555-123-"), p4,
            F.lit(" call (555) 123-"), p4,
            F.lit(" or 555.123."), p4,
            F.lit(" at 10.0."), (did % 256).cast("string"), F.lit(".1 "),
            F.col("text"),
        ).alias("text"),
    )
    return pii_profile(planted).orderBy("doc_id")


_BIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), uni AS (
  SELECT unnest(t) AS w1 FROM toks
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY 1
), v AS (
  SELECT COUNT(*) AS v FROM c1
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'bigram': t[i] || ' ' || t[i + 1]})) AS s
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.bigram AS bigram FROM occ0
), c2 AS (
  SELECT bigram, COUNT(*) AS c2 FROM occ GROUP BY 1
), scored AS (
  SELECT o.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         -SUM(CAST(floor((ln(c2.c2 + 0.5)
                          - ln(c1.c1 + 0.5 * (SELECT v FROM v)))
                         * 10000 + 0.5) AS BIGINT)) AS nll_fp
  FROM occ o JOIN c2 ON o.bigram = c2.bigram JOIN c1 ON o.w1 = c1.w1
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       CAST(COALESCE(nll_fp, 0) AS BIGINT) AS nll_fp,
       CASE WHEN n_bigrams > 0
            THEN (CAST(nll_fp AS BIGINT) / 10000.0) / n_bigrams END AS avg_nll
FROM documents d LEFT JOIN scored ON d.doc_id = scored.doc_id
ORDER BY d.doc_id
"""


@register("doc_bigram_perplexity", oracle=_BIGRAM_LM_ORACLE)
def doc_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (arXiv:1911.00359): per-document NLL
    under an add-k-smoothed bigram model trained BY the same plan (two
    corpus count aggregates). Per-bigram log-probs are fixed-point
    integers before the per-doc sum — the DSIR determinism convention.
    See `text/lm.py` for the model and the 100 TB notes (pinned model
    tables drop in for the self-trained counts)."""
    from backend_big_data_spark.text.lm import bigram_nll

    docs = load_table(spark, sf_dir, "documents")
    return bigram_nll(docs).orderBy("doc_id")


_UNIMAX_ORACLE = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n_rows, COUNT(*) * 2 AS cap FROM documents GROUP BY 1
), ranked AS (
  SELECT lang, n_rows, cap,
         row_number() OVER (ORDER BY cap, lang) AS i,
         SUM(cap) OVER (ORDER BY cap, lang
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         COUNT(*) OVER () AS k
  FROM counts
), t AS (
  SELECT MAX(CASE WHEN s + (k - i) * cap <= 600 THEN i END) AS t FROM ranked
), lvl AS (
  SELECT CASE
           WHEN (SELECT t FROM t) IS NULL
             THEN FLOOR(600.0 / (SELECT MAX(k) FROM ranked))
           WHEN (SELECT t FROM t) = (SELECT MAX(k) FROM ranked)
             THEN 600
           ELSE FLOOR((600 - (SELECT r.s FROM ranked r, t WHERE r.i = t.t))
                      / ((SELECT MAX(k) FROM ranked) - (SELECT t FROM t)))
         END AS level
), alloc AS (
  SELECT lang, n_rows,
         CAST(LEAST(cap, (SELECT level FROM lvl)) AS BIGINT) AS alloc
  FROM ranked
), dranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT), doc_id) AS rk
  FROM documents
)
SELECT d.doc_id, d.lang,
       CAST(FLOOR(a.alloc / a.n_rows)
            + CASE WHEN d.rk <= a.alloc % a.n_rows THEN 1 ELSE 0 END
            AS INTEGER) AS n_epochs
FROM dranked d JOIN alloc a USING (lang)
WHERE FLOOR(a.alloc / a.n_rows)
      + CASE WHEN d.rk <= a.alloc % a.n_rows THEN 1 ELSE 0 END > 0
ORDER BY d.doc_id
"""


@register("doc_unimax_mix", oracle=_UNIMAX_ORACLE)
def doc_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (arXiv:2304.09151): spread a 600-row
    training budget uniformly across languages with a 2-epoch cap per
    language — closed-form water-filling over two window cumulative sums
    (no driver loop), per-doc epoch counts assigned in the deterministic
    hash order. Completes the mixing family next to temperature sampling
    (`doc_temperature_mix`) and fixed repetition (`doc_repetition_mix`).
    See `text/mixing.py::unimax_allocation`."""
    from backend_big_data_spark.text.mixing import unimax_epochs

    docs = load_table(spark, sf_dir, "documents")
    return unimax_epochs(docs, budget=600, max_epochs=2).orderBy("doc_id")


_HARD_NEG_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
  FROM embeddings WHERE vec_id < 10
), a AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv, label AS nl
  FROM embeddings
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS sim
  FROM q, a WHERE nl != ql
), r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
"""


@register("embedding_hard_negatives", oracle=_HARD_NEG_ORACLE)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (DPR/ANCE): top-5 most-similar DIFFERENT-label
    corpus vectors per anchor (vec_id < 10) — the near-misses a bi-encoder
    trains against. Brute-force scorer + label predicate; the filter
    composes unchanged with the sub-linear ANN candidate generators. See
    `similarity/negatives.py`."""
    from backend_big_data_spark.similarity.negatives import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    ).orderBy("query_id", "rnk")


_SEMDEDUP_BLOCKED_ORACLE = """
WITH vecs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, label, v AS cv FROM (
    SELECT vec_id, label, v,
           row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM vecs
  ) WHERE rn <= 2
), assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vv.vec_id, c.cluster,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_distance(vv.v, c.cv), c.cluster) AS rn
    FROM vecs vv JOIN cents c ON vv.label = c.label
  ) WHERE rn = 1
), lab AS (
  SELECT a.vec_id, a.cluster, v.v FROM assign a JOIN vecs v USING (vec_id)
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM lab a JOIN lab b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) > 0.3
)
SELECT l.vec_id, l.cluster, (d.vec_id IS NULL) AS kept
FROM lab l LEFT JOIN dropped d ON l.vec_id = d.vec_id
ORDER BY l.vec_id
"""


@register("doc_semdedup_blocked", oracle=_SEMDEDUP_BLOCKED_ORACLE)
def doc_semdedup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with HIERARCHICAL assignment — the 100 TB form: each
    vector compares only against its coarse block's centroids (here the
    natural ``label`` key; an IVF cell or LSH bucket in production), so
    assignment is O(n·k/B) instead of O(n·k). Centroids = the two
    lowest-id vectors per block. Measured: unblocked assignment went
    23.5× superlinear at 50× corpus with k ∝ n; this path stays flat
    (PERF.md)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    cents = (
        emb.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2)
        .select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("label"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    return semdedup(
        emb, cents, threshold=0.3, block_col="label"
    ).orderBy("vec_id")


_DSIR_RESAMPLED_ORACLE = _DSIR_CTES + """
, drawn AS (
  SELECT doc_id, weight,
         weight + (-ln(-ln(
           ((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000000) + 0.5) / 1000000.0))) AS score
  FROM weights
)
SELECT doc_id, weight FROM (
  SELECT doc_id, weight FROM drawn ORDER BY score DESC, doc_id LIMIT 200
) ORDER BY doc_id
"""


@register("doc_dsir_resampled", oracle=_DSIR_RESAMPLED_ORACLE)
def doc_dsir_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's actual selection step: 200 docs drawn without replacement
    with probability ∝ exp(importance weight) via deterministic
    Gumbel-top-k (Kool et al. 2019 — the Gumbel comes from the stable id
    hash, so the draw replays bit-for-bit on any engine). One global
    TakeOrdered over the scored corpus, no sequential sampling state.
    See `text/dsir.py::gumbel_topk_sample`."""
    from backend_big_data_spark.text.dsir import (
        gumbel_topk_sample,
        importance_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    return gumbel_topk_sample(w.select("doc_id", "weight"), n=200).orderBy(
        "doc_id"
    )


# Shared BM25 CTE chain (through per-doc fixed-point scores + ranks) —
# drives both the standalone search oracle and the hybrid-fusion oracle.
_BM25_CTES = """
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), dl AS (
  SELECT doc_id, len(t) AS dl, t FROM d
), stats AS (
  SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
), postings AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
    SELECT doc_id, dl, unnest(t) AS term FROM dl
  ) WHERE term IN ('join', 'hash', 'customer')
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM postings GROUP BY 1
), scored AS (
  SELECT p.doc_id,
         SUM(CAST(floor(
           ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
           * ((p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl)))
           * 10000 + 0.5) AS BIGINT)) AS score_fp
  FROM postings p JOIN dfreq f ON p.term = f.term CROSS JOIN stats s
  GROUP BY 1
), bmranked AS (
  SELECT doc_id, score_fp,
         row_number() OVER (ORDER BY score_fp DESC, doc_id) AS rnk
  FROM scored
)"""

_BM25_ORACLE = _BM25_CTES + """
SELECT doc_id, CAST(score_fp AS BIGINT) / 10000.0 AS score,
       CAST(rnk AS INTEGER) AS rnk
FROM bmranked WHERE rnk <= 20 ORDER BY rnk
"""


@register("doc_bm25_search", oracle=_BM25_ORACLE)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (`text/bm25.py`): top-20 docs for the query
    {join, hash, customer} — Lucene-form idf, k1=1.2, b=0.75, per-term
    partial scores fixed-pointed before the per-doc sum, global top-k as
    one TakeOrdered. The lexical half of hybrid retrieval next to the
    ANN paths. NOTE the oracle multiplies in the engine's association
    order — idf * (tf_part) — so the doubles agree bit-for-bit."""
    from backend_big_data_spark.text.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["join", "hash", "customer"], k=20).orderBy("rnk")


_HYBRID_ORACLE = _BM25_CTES + """
, vq AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), anns AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           (SELECT qv FROM vq)) DESC,
                    vec_id) AS rnk
  FROM embeddings WHERE vec_id != 0
), contribs AS (
  SELECT doc_id, 1000000000 // (60 + rnk) AS c FROM bmranked WHERE rnk <= 50
  UNION ALL
  SELECT doc_id, 1000000000 // (60 + rnk) AS c FROM anns WHERE rnk <= 50
), fused AS (
  SELECT doc_id, SUM(c) AS rrf_fp FROM contribs GROUP BY 1
)
SELECT doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp, CAST(rn AS INTEGER) AS rnk
FROM (
  SELECT doc_id, rrf_fp,
         row_number() OVER (ORDER BY rrf_fp DESC, doc_id) AS rn
  FROM fused
) WHERE rn <= 10 ORDER BY rnk
"""


@register("doc_hybrid_search", oracle=_HYBRID_ORACLE)
def doc_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for {join, hash, customer} fused
    with the embedding top-50 for corpus vector 0 (vec_id ≡ doc_id in
    the synthetic tables) via Reciprocal Rank Fusion — exact integer
    SCALE DIV (60 + rank) contributions, so fusion carries zero float
    risk across engines. The production hybrid-search shape: two bounded
    top-N lists, one bounded merge. See `similarity/hybrid.py`,
    `text/bm25.py`."""
    from backend_big_data_spark.similarity.ann import brute_force_cosine_topk
    from backend_big_data_spark.similarity.hybrid import rrf_fuse
    from backend_big_data_spark.text.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lexical = bm25_topk(docs, ["join", "hash", "customer"], k=50).select(
        "doc_id", "rnk"
    )
    semantic = (
        brute_force_cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=50)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rnk"))
    )
    return rrf_fuse([lexical, semantic], top=10).orderBy("rnk")


_TOKS_CTE = (
    r"toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t "
    "FROM documents)"
)
_SHINGLES_CTE = (
    "sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
    "FOR i IN range(1, len(t)-1)]) AS shingles FROM toks WHERE len(t) >= 3)"
)

_SIMILAR_TO_DOC_ORACLE = f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
q AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id = 0),
nq AS (SELECT COUNT(*) AS nq FROM q),
e AS (
  SELECT doc_id, len(shingles) AS ca, unnest(shingles) AS shingle
  FROM sh WHERE doc_id != 0
), i AS (
  SELECT e.doc_id, e.ca, COUNT(*) AS inter
  FROM e JOIN q ON e.shingle = q.shingle GROUP BY 1, 2
)
SELECT doc_id, CAST(inter AS BIGINT) AS intersection_size,
       ROUND(inter / (ca + (SELECT nq FROM nq) - inter), 6) AS jaccard,
       CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT doc_id, ca, inter,
         row_number() OVER (
           ORDER BY inter / (ca + (SELECT nq FROM nq) - inter) DESC,
                    doc_id) AS rnk
  FROM i
) WHERE rnk <= 10 ORDER BY rnk
"""


@register("doc_similar_to_query", oracle=_SIMILAR_TO_DOC_ORACLE)
def doc_similar_to_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point near-dup lookup: the top-10 corpus documents by exact 3-gram
    Jaccard against document 0 — "show me documents like this one", the
    triage view behind any dedup or contamination hit. The query doc's
    shingles broadcast; the corpus side is one broadcast join + a
    doc-keyed count (no self-join). See `text/dedup.py::jaccard_vs_query`."""
    from backend_big_data_spark.text.dedup import doc_shingles, jaccard_vs_query

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs, persist=False)
    return jaccard_vs_query(
        sh.filter(F.col("doc_id") != 0),
        sh.filter(F.col("doc_id") == 0).select("shingles"),
        k=10,
    ).orderBy("rnk")


_TRIPLETS_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
  FROM embeddings WHERE vec_id < 10
), a AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv, label AS nl
  FROM embeddings
), s AS (
  SELECT query_id, nid, nl, ql, list_cosine_similarity(qv, nv) AS sim
  FROM q, a WHERE nid != query_id
), p AS (
  SELECT query_id, nid, sim FROM (
    SELECT query_id, nid, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, nid) AS rn
    FROM s WHERE nl = ql
  ) WHERE rn = 1
), n AS (
  SELECT query_id, nid, sim FROM (
    SELECT query_id, nid, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, nid) AS rn
    FROM s WHERE nl != ql
  ) WHERE rn = 1
)
SELECT p.query_id, p.nid AS positive_id, n.nid AS negative_id,
       ROUND(p.sim, 6) AS positive_sim, ROUND(n.sim, 6) AS negative_sim,
       ROUND(ROUND(p.sim, 6) - ROUND(n.sim, 6), 6) AS margin
FROM p JOIN n ON p.query_id = n.query_id
ORDER BY p.query_id
"""


@register("embedding_training_triplets", oracle=_TRIPLETS_ORACLE)
def embedding_training_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet construction: for each anchor
    (vec_id < 10), the nearest same-label item (positive), the nearest
    different-label item (hard negative), and their similarity margin —
    the triplet-loss input layout; negative margins flag the anchors most
    worth mining. See `similarity/negatives.py::training_triplets`."""
    from backend_big_data_spark.similarity.negatives import training_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    return training_triplets(
        emb, emb.filter(F.col("vec_id") < 10)
    ).orderBy("query_id")


def _removal_audit_oracle() -> str:
    from backend_big_data_spark.plans.curation import _pipeline_oracle

    return _pipeline_oracle() + """
SELECT d0.doc_id,
       CASE WHEN d5.doc_id IS NOT NULL THEN 'kept'
            WHEN d4.doc_id IS NOT NULL THEN 'dropped_mix'
            WHEN d3.doc_id IS NOT NULL THEN 'removed_quality'
            WHEN d2.doc_id IS NOT NULL THEN 'removed_exact_dup'
            WHEN d1.doc_id IS NOT NULL THEN 'removed_boilerplate'
            ELSE 'removed_blocklist' END AS status
FROM d0
LEFT JOIN d1 ON d0.doc_id = d1.doc_id
LEFT JOIN d2 ON d0.doc_id = d2.doc_id
LEFT JOIN d3 ON d0.doc_id = d3.doc_id
LEFT JOIN d4 ON d0.doc_id = d4.doc_id
LEFT JOIN d5 ON d0.doc_id = d5.doc_id
ORDER BY d0.doc_id
"""


@register("doc_removal_audit", oracle=_removal_audit_oracle())
def doc_removal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document provenance for the cleaning pipeline — "why was my
    doc dropped?": the FIRST stage that removed it (blocklist,
    boilerplate-emptied, exact dup, quality, mix) or 'kept'. Reuses the
    funnel's shared stage frames (`plans/curation._pipeline_stage_frames`,
    persisted boundaries included), attribution = a chain of left
    semi-markers — the audit table an ops dashboard joins against user
    reports."""
    from backend_big_data_spark.plans.curation import _pipeline_stage_frames

    stages = _pipeline_stage_frames(spark, sf_dir)
    d0 = stages[0].select("doc_id")
    statuses = [
        "removed_blocklist",  # failed stage 1
        "removed_boilerplate",
        "removed_exact_dup",
        "removed_quality",
        "dropped_mix",
    ]
    out = d0
    for i, frame in enumerate(stages[1:], start=1):
        out = out.join(
            frame.select("doc_id").withColumn(f"__s{i}", F.lit(True)),
            on="doc_id",
            how="left",
        )
    status = F.lit("kept")
    for i in range(5, 0, -1):  # first failing stage wins
        status = F.when(F.col(f"__s{i}").isNull(), F.lit(statuses[i - 1])).otherwise(status)
    return out.select("doc_id", status.alias("status")).orderBy("doc_id")


_RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS aw
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.aw) / 7 AS INTEGER) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_retention_cohorts", oracle=_RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort grid over the events table — the classic
    product-analytics report (cohort week × weeks-since-signup → active
    users). See `operators/timeseries.py::retention_cohorts` for the plan
    anatomy; offsets are exact (both sides Monday-truncated)."""
    from backend_big_data_spark.operators.timeseries import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev).orderBy("cohort_week", "week_offset")


_RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS recency,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, monetary,
         ntile(5) OVER (ORDER BY recency ASC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
  FROM rfm
)
SELECT CAST(r_score AS INTEGER) AS r_score,
       CAST(f_score AS INTEGER) AS f_score,
       CAST(m_score AS INTEGER) AS m_score,
       COUNT(*) AS n_customers,
       MIN(monetary) AS min_monetary, MAX(monetary) AS max_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


@register("customer_rfm_segments", oracle=_RFM_ORACLE)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic recency/frequency/monetary
    grid: per-customer MAX(orderdate)/COUNT/decimal-exact spend, each
    ntile(5)-scored with a unique (metric, custkey) tie-break (the
    deciles determinism convention), reported as per-cell counts and
    monetary bounds. Each score is an EXACT distributed ntile
    (`operators/windows.distributed_ntile`: range-partition on the sort
    key + broadcast prefix offsets + closed-form tile) — at 100 TB the
    customer dimension is 10⁸–10⁹ rows, and the former global ntile
    windows would funnel it through ONE task."""
    from backend_big_data_spark.operators.windows import distributed_ntile

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("recency"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    scored = rfm
    for col, key in (
        ("r_score", "recency"),
        ("f_score", "frequency"),
        ("m_score", "monetary"),
    ):
        scored = distributed_ntile(
            scored, 5, [F.asc(key), "o_custkey"], col
        )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("monetary").alias("min_monetary"),
            F.max("monetary").alias("max_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_STICKINESS_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
), dau AS (
  SELECT d AS day, COUNT(*) AS dau FROM ud GROUP BY 1
), spread AS (
  SELECT DISTINCT u, d + CAST(off AS INTEGER) AS day
  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
), wau AS (
  SELECT day, COUNT(*) AS wau FROM spread GROUP BY 1
)
SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
       CAST(floor(CAST(dau AS DOUBLE) / wau * 10000 + 0.5) AS BIGINT)
         AS stickiness_fp
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY dau.day
"""


@register("events_stickiness_daily", oracle=_STICKINESS_ORACLE)
def events_stickiness_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per observed day. Rolling
    DISTINCT counts don't window, so each (user, day) membership explodes
    into the 7 days it keeps the user weekly-active (bounded generator),
    then one distinct + keyed count — exact, no sketch. See
    `operators/timeseries.py::stickiness_daily`."""
    from backend_big_data_spark.operators.timeseries import stickiness_daily

    ev = load_table(spark, sf_dir, "events")
    return stickiness_daily(ev).orderBy("day")


_PAIR_LIFT_ORACLE = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
), item AS (
  SELECT l_partkey, COUNT(*) AS s FROM li GROUP BY 1
), pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_count
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT part_a, part_b, CAST(pair_count AS BIGINT) AS pair_count,
       CAST((pair_count * n_orders * 10000) // (sa.s * sb.s) AS BIGINT)
         AS lift_fp
FROM pair
JOIN item sa ON pair.part_a = sa.l_partkey
JOIN item sb ON pair.part_b = sb.l_partkey
CROSS JOIN n
ORDER BY lift_fp DESC, part_a, part_b
"""


@register("part_pair_lift", oracle=_PAIR_LIFT_ORACLE)
def part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair analysis — the oracle-gated association-rules
    counterpart to the rows-only FPGrowth query: part pairs co-occurring
    in >= 3 orders with their lift (= pair_count * n_orders /
    (support_a * support_b)) in EXACT integer fixed point (1e4 units,
    integer floor-division — no float anywhere). The self-join keys on
    the order, so pair expansion is bounded by order size; item supports
    join back keyed on part."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    item = li.groupBy("l_partkey").agg(F.count("*").alias("s"))
    a = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pair = (
        a.join(b, on="l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= 3)
    )
    return (
        pair.join(item.withColumnRenamed("l_partkey", "part_a")
                  .withColumnRenamed("s", "__sa"), on="part_a")
        .join(item.withColumnRenamed("l_partkey", "part_b")
              .withColumnRenamed("s", "__sb"), on="part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            F.expr("(pair_count * n_orders * 10000) DIV (__sa * __sb)")
            .alias("lift_fp"),
        )
        .orderBy(F.desc("lift_fp"), "part_a", "part_b")
    )


_TRIANGLES_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS lo, b.vec_id AS hi
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) > 0.3
), tri AS (
  SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
  FROM pairs ab
  JOIN pairs bc ON ab.hi = bc.lo
  JOIN pairs ac ON ac.lo = ab.lo AND ac.hi = bc.hi
), verts AS (
  SELECT a AS vertex FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY vertex ORDER BY vertex
"""


@register("embedding_dup_triangles", oracle=_TRIANGLES_ORACLE)
def embedding_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the embedding near-dup graph
    (label-blocked cosine > 0.3 pairs) — the cluster-density probe next
    to connected components: near-clique dup clusters are safe to
    transitively collapse, triangle-free chains need the verify pass.
    Canonical a<b<c ordering finds each triangle once via two keyed
    equi-joins. See `operators/graph.py::triangle_counts`."""
    from backend_big_data_spark.operators.graph import triangle_counts
    from backend_big_data_spark.similarity.neardup import blocked_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    edges = blocked_cosine_pairs(emb, block_col="label", threshold=0.3).select(
        F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst")
    )
    return triangle_counts(edges).orderBy("vertex")


_TOKEN_BUDGET_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]{2,}')))
              AS BIGINT) AS n_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n_tokens) AS t FROM per
)
SELECT source, n_docs, n_tokens, n_chars,
       CAST((n_tokens * 1000000) // t AS BIGINT) AS token_share_ppm
FROM per CROSS JOIN tot
ORDER BY source
"""


@register("corpus_token_budget", oracle=_TOKEN_BUDGET_ORACLE)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget accounting — the planning table every
    mixture design (temperature / UniMax / DSIR) starts from: docs,
    word-tokens, chars, and each source's share of the total token budget
    in exact integer ppm. One hash aggregate + a 1-row total broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit("[a-z]{2,}"), F.lit(0)
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = per.agg(F.sum("n_tokens").alias("__t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.expr("(n_tokens * 1000000) DIV __t").alias("token_share_ppm"),
        )
        .orderBy("source")
    )


_DEGREE_HIST_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS lo, b.vec_id AS hi
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) > 0.3
), deg AS (
  SELECT vertex, CAST(COUNT(*) AS INTEGER) AS degree FROM (
    SELECT lo AS vertex FROM pairs UNION ALL SELECT hi FROM pairs
  ) GROUP BY vertex
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY degree ORDER BY degree
"""


@register("embedding_dup_degree_hist", oracle=_DEGREE_HIST_ORACLE)
def embedding_dup_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph — the first thing to look
    at before collapsing clusters (a fat tail = hub documents gluing
    unrelated near-dups together; pairs with triangle counts to decide
    transitive vs verified removal). Two keyed aggregates."""
    from backend_big_data_spark.similarity.neardup import blocked_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    edges = blocked_cosine_pairs(emb, block_col="label", threshold=0.3)
    verts = edges.select(F.col("vec_id_a").alias("vertex")).unionAll(
        edges.select(F.col("vec_id_b").alias("vertex"))
    )
    deg = verts.groupBy("vertex").agg(F.count("*").cast("int").alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
        .orderBy("degree")
    )


def _gopher_oracle() -> str:
    from backend_big_data_spark.text.gopher import STOPWORDS

    stop = ",".join(f"'{w}'" for w in STOPWORDS)
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
         length(regexp_replace(text, '\s+', '', 'g')) AS chars_no_ws,
         CAST((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS symbols
  FROM documents
), m AS (
  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words, chars_no_ws, symbols,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
         len(list_distinct(list_filter(w, x -> x IN ({stop})))) AS stop_hits
  FROM t
)
SELECT doc_id, n_words,
       (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
       (chars_no_ws >= 3 * n_words AND chars_no_ws <= 10 * n_words)
         AS ok_mean_word_len,
       (10 * symbols < n_words) AS ok_symbol_ratio,
       (5 * alpha_words > 4 * n_words) AS ok_alpha_fraction,
       (stop_hits >= 2) AS ok_stopwords,
       ((n_words >= 50 AND n_words <= 100000)
        AND (chars_no_ws >= 3 * n_words AND chars_no_ws <= 10 * n_words)
        AND (10 * symbols < n_words)
        AND (5 * alpha_words > 4 * n_words)
        AND (stop_hits >= 2)) AS keep
FROM m ORDER BY doc_id
"""


@register("doc_gopher_quality", oracle=_gopher_oracle())
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality filter (arXiv:2112.11446 Table A1
    subset): word-count bounds, mean-word-length bounds, symbol ratio,
    alphabetic-word fraction, stop-word presence — every ratio evaluated
    by integer cross-multiplication, so the verdicts are exact on any
    engine (`text/gopher.py`). The third published filter family next to
    the C4 blocklist and the logistic scorer."""
    from backend_big_data_spark.text.gopher import gopher_profile

    docs = load_table(spark, sf_dir, "documents")
    return gopher_profile(docs).orderBy("doc_id")


_REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), g AS (
  SELECT doc_id,
         CAST(len(w) AS INTEGER) AS n_tokens,
         CAST(GREATEST(len(w) - 2, 0) AS INTEGER) AS n_shingles,
         CAST(CASE WHEN len(w) >= 3
              THEN len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                      FOR i IN range(1, len(w)-1)]))
              ELSE 0 END AS INTEGER) AS n_distinct_shingles,
         CAST((SELECT MAX(c) FROM (
            SELECT COUNT(*) AS c FROM unnest(w) AS u(tok) GROUP BY tok
         )) AS INTEGER) AS top_token_count
  FROM t
)
SELECT doc_id, n_tokens, n_shingles, n_distinct_shingles, top_token_count,
       (5 * top_token_count <= n_tokens) AS ok_top_unigram,
       (10 * (n_shingles - n_distinct_shingles) <= 3 * n_shingles)
         AS ok_dup_shingles,
       ((5 * top_token_count <= n_tokens)
        AND (10 * (n_shingles - n_distinct_shingles) <= 3 * n_shingles))
         AS keep
FROM g ORDER BY doc_id
"""


@register("doc_repetition_profile", oracle=_REPETITION_ORACLE)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MassiveText repetition rules (arXiv:2112.11446 Table A1, repetition
    block): top-unigram share <= 20% and duplicate-3-gram fraction <= 30%,
    both evaluated by integer cross-multiplication (exact verdicts). The
    in-document counterpart of the cross-document dedup family — catches
    the 'same sentence looped 500 times' page that no corpus-level dedup
    sees."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(w)
    n_shingles = F.greatest(n_tokens - 2, F.lit(0))
    shingles = F.when(
        n_tokens >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_tokens - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                    F.element_at(w, i + 3),
                ),
            )
        ),
    )
    n_distinct = F.coalesce(F.size(shingles), F.lit(0))
    # top token count via explode + two keyed aggregates — O(L) per doc
    # (an array_distinct x filter expression would be O(L^2) per doc:
    # fine on word-soup, fatal on a 100k-token document)
    top = (
        docs.select("doc_id", F.explode(w).alias("__tok"))
        .groupBy("doc_id", "__tok")
        .agg(F.count("*").alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").alias("top_token_count"))
    )
    base = docs.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        n_shingles.cast("int").alias("n_shingles"),
        n_distinct.cast("int").alias("n_distinct_shingles"),
    ).join(top, on="doc_id")
    ok_uni = (5 * F.col("top_token_count")) <= F.col("n_tokens")
    ok_dup = (10 * (F.col("n_shingles") - F.col("n_distinct_shingles"))) <= (
        3 * F.col("n_shingles")
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "n_shingles",
        "n_distinct_shingles",
        F.col("top_token_count").cast("int").alias("top_token_count"),
        ok_uni.alias("ok_top_unigram"),
        ok_dup.alias("ok_dup_shingles"),
        (ok_uni & ok_dup).alias("keep"),
    ).orderBy("doc_id")


_LTV_ORACLE = """
WITH first AS (
  SELECT o_custkey,
         CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month
  FROM orders GROUP BY o_custkey
), rev AS (
  SELECT f.cohort_month,
         CAST(date_diff('month', f.cohort_month,
                        CAST(date_trunc('month', o.o_orderdate) AS DATE))
              AS INTEGER) AS month_offset,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
)
SELECT cohort_month, month_offset,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(SUM(revenue) OVER (PARTITION BY cohort_month
                               ORDER BY month_offset) AS DOUBLE)
         AS cum_revenue
FROM rev ORDER BY cohort_month, month_offset
"""


@register("customer_ltv_cohorts", oracle=_LTV_ORACLE)
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value cohort curves — the revenue twin of the
    retention grid: cohort month (first order) × months-since-first →
    per-cell and CUMULATIVE revenue. Revenue stays DECIMAL through the
    window cumsum (exact at any order) and casts to double only at the
    edge; month offsets are exact (both sides month-truncated)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias(
            "cohort_month"
        )
    )
    rev = (
        orders.join(first, on="o_custkey")
        .select(
            "cohort_month",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")).cast("date"),
                F.col("cohort_month"),
            )
            .cast("int")
            .alias("month_offset"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("__p"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.sum("__p").alias("__rev"))
    )
    w = Window.partitionBy("cohort_month").orderBy("month_offset")
    return rev.select(
        "cohort_month",
        "month_offset",
        F.col("__rev").cast("double").alias("revenue"),
        F.sum("__rev").over(w).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_month", "month_offset")


_PARETO_ORACLE = """
WITH per AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), ranked AS (
  SELECT user_id, n,
         ntile(10) OVER (ORDER BY n DESC, user_id) AS user_decile
  FROM per
), tot AS (
  SELECT SUM(n) AS t, COUNT(*) AS u FROM per
)
SELECT CAST(user_decile AS INTEGER) AS user_decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST((SUM(n) * 1000000) // (SELECT t FROM tot) AS BIGINT)
         AS event_share_ppm
FROM ranked GROUP BY user_decile ORDER BY user_decile
"""


@register("events_power_users_pareto", oracle=_PARETO_ORACLE)
def events_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration ("do 10% of users produce 80% of events?"):
    users deciled by event count (deterministic tie-break), each decile's
    event share in exact integer ppm. The decile is an exact distributed
    ntile (`operators/windows.distributed_ntile`) — the user dimension is
    entity-cardinality (10⁸–10⁹ at 100 TB), so no global ntile window."""
    from backend_big_data_spark.operators.windows import distributed_ntile

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    ranked = distributed_ntile(
        per, 10, [F.desc("n"), "user_id"], "user_decile"
    )
    tot = per.agg(F.sum("n").alias("__t"))
    return (
        ranked.groupBy("user_decile")
        .agg(F.count("*").alias("n_users"), F.sum("n").alias("n_events"))
        .crossJoin(F.broadcast(tot))
        .select(
            "user_decile",
            "n_users",
            "n_events",
            F.expr("(n_events * 1000000) DIV __t").alias("event_share_ppm"),
        )
        .orderBy("user_decile")
    )


#: Vocabulary-growth curve resolution: the bucket COUNT is capped at this
#: constant (bucket width grows with the corpus instead), so the cumsum
#: window's input is bounded by config, never by data — the same
#: adaptive-integer-sizing discipline as the KMV prefilter floor. 256
#: points is plenty for a Heaps'-law readout; at the historical width
#: floor of 50 docs/bucket the cap only engages beyond 12,800 docs.
_HEAPS_MAX_BUCKETS = 256

_HEAPS_ORACLE = """
WITH w AS (
  SELECT GREATEST(50, (MAX(doc_id) + 1) // 256) AS width FROM documents
), toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS tok
  FROM documents
), firstseen AS (
  SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok
), buckets AS (
  SELECT CAST(first_doc // (SELECT width FROM w) AS INTEGER) AS doc_bucket,
         COUNT(*) AS new_types
  FROM firstseen GROUP BY 1
)
SELECT doc_bucket, CAST(new_types AS BIGINT) AS new_types,
       CAST(SUM(new_types) OVER (ORDER BY doc_bucket) AS BIGINT)
         AS vocab_size
FROM buckets ORDER BY doc_bucket
"""


@register("corpus_vocab_growth", oracle=_HEAPS_ORACLE)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: per doc-bucket, the count
    of word types first seen there and the cumulative vocabulary size —
    the corpus statistic behind tokenizer sizing and dedup health (a
    flattening curve = saturating corpus; a jump = a new domain
    arrived). Cumulative DISTINCT becomes first-occurrence MIN + integer
    cumsum — exact, two keyed aggregates and a window over a frame the
    bucket-width rule bounds at ``_HEAPS_MAX_BUCKETS`` rows whatever the
    corpus size: width = max(50, (max_doc_id+1) // 256), pure BIGINT
    arithmetic computed eagerly from a column-pruned doc_id scan and
    replayed bit-for-bit in the oracle's scalar subquery (Python ``//``
    == DuckDB ``//`` on BIGINT)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    # empty corpus: max() is NULL (the oracle's scalar subquery is NULL
    # too, and its GREATEST(50, NULL//256) floors at 50 in DuckDB only
    # via the same guard) — any positive width yields the same empty
    # result, so pin 50
    width = max(50, (int(max_id) + 1) // _HEAPS_MAX_BUCKETS) if max_id is not None else 50
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]{2,}"), F.lit(0))
        ).alias("tok"),
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    buckets = first.groupBy(
        F.expr(f"first_doc DIV {width}").cast("int").alias("doc_bucket")
    ).agg(F.count("*").alias("new_types"))
    w = Window.orderBy("doc_bucket")
    return buckets.select(
        "doc_bucket",
        "new_types",
        F.sum("new_types").over(w).alias("vocab_size"),
    ).orderBy("doc_bucket")


_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT CASE WHEN o_totalprice >= 600000 THEN 21
              ELSE CAST(floor(o_totalprice / 30000) AS INTEGER) + 1 END AS bucket
  FROM orders
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(bucket * 30000 - 30000 AS DOUBLE) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY bucket ORDER BY bucket
"""


@register("order_value_histogram", oracle=_HISTOGRAM_ORACLE)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order values (width_bucket semantics
    written as explicit floor arithmetic — DuckDB has no width_bucket, so
    both engines share the same expression: 20 bins over [0, 600000),
    overflow clamps to bin 21). Map-side bucket id + one keyed count."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.when(F.col("o_totalprice") >= 600000, F.lit(21)).otherwise(
        F.floor(F.col("o_totalprice") / 30000).cast("int") + 1
    )
    return (
        orders.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 30000 - 30000).cast("double").alias("bucket_lo"),
            "n_orders",
        )
        .orderBy("bucket")
    )


_HHI_ORACLE = """
WITH per AS (
  SELECT n.n_name AS nation, l.l_suppkey AS supp, COUNT(*) AS c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
), agg AS (
  SELECT nation, SUM(c) AS t, SUM(c * c) AS ss,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM per GROUP BY nation
)
SELECT nation, n_suppliers, CAST(t AS BIGINT) AS n_lineitems,
       CAST((ss * 1000000) // (t * t) AS BIGINT) AS hhi_ppm
FROM agg ORDER BY nation
"""


@register("nation_supplier_hhi", oracle=_HHI_ORACLE)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation — the Herfindahl–Hirschman index
    over lineitem share, in EXACT integer ppm (sum-of-squared-counts
    times 1e6, integer floor-divided by the squared total — no float
    division anywhere). 10000 ppm = perfectly even across 100 suppliers;
    1e6 = a single-supplier nation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    per = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("nation", "l_suppkey")
        .agg(F.count("*").alias("c"))
    )
    return (
        per.groupBy("nation")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("c").alias("__t"),
            F.sum(F.col("c") * F.col("c")).alias("__ss"),
        )
        .select(
            "nation",
            "n_suppliers",
            F.col("__t").alias("n_lineitems"),
            F.expr("(__ss * 1000000) DIV (__t * __t)").alias("hhi_ppm"),
        )
        .orderBy("nation")
    )


_INTERARRIVAL_ORACLE = """
WITH ordered AS (
  SELECT event_type, ts, event_id,
         lag(ts) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
), gaps AS (
  SELECT event_type,
         date_diff('second', prev_ts, ts) AS gap_sec
  FROM ordered WHERE prev_ts IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap_sec, 0.5), 2) AS median_gap_sec,
       ROUND(quantile_cont(gap_sec, 0.9), 2) AS p90_gap_sec,
       CAST(MAX(gap_sec) AS BIGINT) AS max_gap_sec
FROM gaps GROUP BY event_type ORDER BY event_type
"""


@register("events_interarrival_profile", oracle=_INTERARRIVAL_ORACLE)
def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type — the burstiness /
    feed-health statistic (a p90 spike = a stalled producer long before
    an alert fires on totals). One keyed lag window over (type, ts, id),
    integer-second gaps, exact percentiles (the median-order-value
    convention; percentile_approx is the documented 100 TB swap)."""
    from pyspark.sql import Window

    from backend_big_data_spark.functions.scalars import round_half_up

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("__prev", F.lag("ts").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            "event_type",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("__prev")
            ).alias("gap_sec"),
        )
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            round_half_up(
                F.expr("percentile(gap_sec, 0.5)"), 2
            ).alias("median_gap_sec"),
            round_half_up(
                F.expr("percentile(gap_sec, 0.9)"), 2
            ).alias("p90_gap_sec"),
            F.max("gap_sec").alias("max_gap_sec"),
        )
        .orderBy("event_type")
    )


_LIFECYCLE_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
), seq AS (
  SELECT user_id, wk,
         lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM uw
), mx AS (
  SELECT MAX(wk) AS max_wk FROM uw
), act AS (
  SELECT wk,
         CAST(COUNT(*) FILTER (prev_wk IS NULL) AS BIGINT) AS n_new,
         CAST(COUNT(*) FILTER (prev_wk = wk - 7) AS BIGINT) AS n_retained,
         CAST(COUNT(*) FILTER (prev_wk IS NOT NULL AND prev_wk < wk - 7)
              AS BIGINT) AS n_resurrected
  FROM seq GROUP BY wk
), churn AS (
  SELECT wk + 7 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM seq CROSS JOIN mx
  WHERE (next_wk IS NULL OR next_wk > wk + 7) AND wk + 7 <= max_wk
  GROUP BY wk + 7
)
SELECT COALESCE(act.wk, churn.wk) AS week,
       COALESCE(n_new, 0) AS n_new,
       COALESCE(n_retained, 0) AS n_retained,
       COALESCE(n_resurrected, 0) AS n_resurrected,
       COALESCE(n_churned, 0) AS n_churned
FROM act FULL OUTER JOIN churn ON act.wk = churn.wk
ORDER BY week
"""


@register("events_user_lifecycle", oracle=_LIFECYCLE_ORACLE)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, users who are NEW (first-ever week),
    RETAINED (also active the prior week), RESURRECTED (returned after a
    gap), and CHURNED (active the prior week, absent this one — only for
    weeks inside the observed range). One (user, week) distinct + one
    keyed lag/lead window + two bounded-grid aggregates; the identity
    active(w) = new + retained + resurrected holds by construction."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    seq = uw.withColumn("prev_wk", F.lag("wk").over(w)).withColumn(
        "next_wk", F.lead("wk").over(w)
    )
    act = seq.groupBy(F.col("wk")).agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0)).alias("n_new"),
        F.sum(
            F.when(F.col("prev_wk") == F.date_sub("wk", 7), 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.date_sub("wk", 7)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    mx = uw.agg(F.max("wk").alias("__max_wk"))
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.date_add("wk", 7)))
            & (F.date_add("wk", 7) <= F.col("__max_wk"))
        )
        .groupBy(F.date_add("wk", 7).alias("wk"))
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        act.join(churn, on="wk", how="full")
        .select(
            F.col("wk").alias("week"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("week")
    )


_AB_ORACLE = """
WITH assign AS (
  SELECT DISTINCT user_id,
         CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 AS INTEGER) AS variant
  FROM events
), conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT a.variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(c.user_id) AS BIGINT) AS n_converters,
       CAST((COUNT(c.user_id) * 1000000) // COUNT(*) AS BIGINT)
         AS conversion_ppm
FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
GROUP BY a.variant ORDER BY a.variant
"""


@register("events_ab_readout", oracle=_AB_ORACLE)
def events_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a DETERMINISTIC hash split: users
    assign to variants by the stable md5 hash (the text/sampling.py
    convention — same user, same variant, on every run and engine),
    conversion = any purchase event; rates in exact integer ppm. The
    analysis-side of an experimentation platform: assignment is a pure
    function of the id, so exposure logs and readouts can never
    disagree."""
    from backend_big_data_spark.text.sampling import stable_hash

    ev = load_table(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (stable_hash(F.col("user_id")) % 2).cast("int").alias("variant"),
        )
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    return (
        assign.join(conv, on="user_id", how="left")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce("__c", F.lit(0))).alias("n_converters"),
        )
        .select(
            "variant",
            "n_users",
            "n_converters",
            F.expr("(n_converters * 1000000) DIV n_users").alias(
                "conversion_ppm"
            ),
        )
        .orderBy("variant")
    )


_SEASONALITY_ORACLE = """
WITH rev AS (
  SELECT CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS month,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), tot AS (
  SELECT SUM(cents) AS t FROM rev
)
SELECT month, CAST(cents AS BIGINT) AS revenue_cents,
       CAST((cents * 12 * 1000000) // t AS BIGINT) AS seasonality_ppm
FROM rev CROSS JOIN tot ORDER BY month
"""


@register("orders_seasonality_index", oracle=_SEASONALITY_ORACLE)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each month's share of total
    revenue scaled so a flat year reads 1e6 ppm per month — computed
    entirely in integer cents (via the DECIMAL(18,2) cast convention:
    a direct double*100 BIGINT cast diverges because Spark truncates
    where DuckDB rounds) with integer floor division. One hash
    aggregate + a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy(
        F.month("o_orderdate").cast("int").alias("month")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("revenue_cents")
    )
    tot = rev.agg(F.sum("revenue_cents").alias("__t"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            "month",
            "revenue_cents",
            F.expr("(revenue_cents * 12 * 1000000) DIV __t").alias(
                "seasonality_ppm"
            ),
        )
        .orderBy("month")
    )


_COMPLETENESS_ORACLE = """
WITH t AS (SELECT COUNT(*) AS n FROM documents),
m AS (
  SELECT 'lang' AS column_name,
         CAST(COUNT(*) FILTER (lang IS NULL) AS BIGINT) AS n_null,
         CAST(COUNT(*) FILTER (lang IS NOT NULL AND trim(lang) = '')
              AS BIGINT) AS n_blank
  FROM documents
  UNION ALL
  SELECT 'source',
         CAST(COUNT(*) FILTER (source IS NULL) AS BIGINT),
         CAST(COUNT(*) FILTER (source IS NOT NULL AND trim(source) = '')
              AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'text',
         CAST(COUNT(*) FILTER (text IS NULL) AS BIGINT),
         CAST(COUNT(*) FILTER (text IS NOT NULL AND trim(text) = '')
              AS BIGINT)
  FROM documents
)
SELECT column_name, n_null, n_blank,
       CAST(((n - n_null - n_blank) * 1000000) // n AS BIGINT) AS filled_ppm
FROM m CROSS JOIN t ORDER BY column_name
"""


@register("doc_field_completeness", oracle=_COMPLETENESS_ORACLE)
def doc_field_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality completeness audit (the dbt-test analog): per string
    column, NULL and blank counts plus the filled fraction in exact
    integer ppm — ONE pass over the table (all counters are conditional
    aggregates in a single job), then a tiny unpivot."""
    docs = load_table(spark, sf_dir, "documents")

    def counters(col: str):
        return [
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(
                f"__{col}_null"
            ),
            F.sum(
                F.when(
                    F.col(col).isNotNull() & (F.trim(F.col(col)) == ""), 1
                ).otherwise(0)
            ).alias(f"__{col}_blank"),
        ]

    agg = docs.agg(
        F.count("*").alias("__n"),
        *counters("lang"),
        *counters("source"),
        *counters("text"),
    )
    rows = []
    for col in ("lang", "source", "text"):
        rows.append(
            agg.select(
                F.lit(col).alias("column_name"),
                F.col(f"__{col}_null").alias("n_null"),
                F.col(f"__{col}_blank").alias("n_blank"),
                F.expr(
                    f"((__n - __{col}_null - __{col}_blank) * 1000000) DIV __n"
                ).alias("filled_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column_name")


def _filter_overlap_oracle() -> str:
    # quality axis = the logistic scorer (the cleaning pipeline's actual
    # 4_quality stage) — one SQL definition shared with its own oracle.
    # The Gopher keep was the original axis, but with the paper-faithful
    # distinct-stopword rule (r05) the synthetic word-soup corpus fails it
    # wholesale, which collapses the crosstab to a single vacuous cell;
    # the LR keep retains corpus variance AND measures redundancy against
    # the stage the pipeline actually runs.
    from backend_big_data_spark.plans.curation import _lr_features_sql, _lr_z_sql

    return f"""
WITH canon AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS dedup_kept
  FROM documents
), f AS ({_lr_features_sql("documents")}
), q AS (
  SELECT doc_id, (FLOOR(({_lr_z_sql()}) * 1e6 + 0.5) >= 0) AS quality_kept
  FROM f
)
SELECT c.dedup_kept, q.quality_kept, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM canon c JOIN q ON c.doc_id = q.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("doc_filter_overlap", oracle=_filter_overlap_oracle())
def doc_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-overlap crosstab — the curation-design diagnostic: how much
    of what exact dedup removes would the quality filter have caught
    anyway (and vice versa)? A 2x2 of (dedup-canonical x quality-keep)
    counts; high overlap = redundant stages, low overlap = both earn
    their place. Quality axis = the logistic scorer
    (`text/filtering.quality_score_lr`) — the cleaning pipeline's actual
    4_quality stage (the Gopher keep, paper-faithful since r05's
    distinct-stopword fix, is degenerate on the synthetic word-soup
    corpus). Composes the two certified filters unchanged."""
    from pyspark.sql import Window

    from backend_big_data_spark.text.filtering import quality_score_lr

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    canon = docs.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("dedup_kept"),
    )
    quality = quality_score_lr(docs).select(
        "doc_id", F.col("keep").alias("quality_kept")
    )
    return (
        canon.join(quality, on="doc_id")
        .groupBy("dedup_kept", "quality_kept")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("dedup_kept", "quality_kept")
    )
