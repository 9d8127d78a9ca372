"""Round-5 second batch: corpus-governance diagnostics — cross-source
leakage (shingle containment matrix) and corpus drift between snapshot
halves (fixed-point log-ratio score, the DSIR determinism convention).

Additive LLM-curation scope; oracle-gated like the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

_SOURCE_OVERLAP_ORACLE = r"""
WITH toks AS (
  SELECT source, string_split_regex(trim(text), '\s+') AS t FROM documents
), sh AS (
  SELECT DISTINCT source,
         unnest(CASE WHEN len(t) >= 3
                THEN list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    FOR i IN range(1, len(t) - 1)])
                ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM toks
), sz AS (
  SELECT source, COUNT(*) AS n_shingles FROM sh GROUP BY 1
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source != b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       CAST(floor(1000000.0 * p.n_shared / s.n_shingles + 0.5) AS BIGINT)
         AS containment_ppm
FROM pairs p JOIN sz s ON p.source_a = s.source
ORDER BY source_a, source_b
"""


@register("source_overlap_matrix", oracle=_SOURCE_OVERLAP_ORACLE)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle containment matrix — the data-governance
    leakage readout: for each ordered source pair (a, b), how much of
    a's distinct 3-gram shingle set also appears in b (integer ppm).
    High off-diagonal cells mean two feeds crawl the same content and
    dedup budget is being spent re-discovering it; it is also the
    train/eval split sanity check when splits are source-keyed.

    Shape: one distinct over (source, shingle) — already bounded by the
    shingle vocabulary × source count — then a self-join on the shingle
    and a count per pair. The pair grid is |sources|² (bounded,
    dashboard-scale); the only data-scale shuffle keys on the shingle.
    At 100 TB the distinct frame is the thing to bucket by shingle."""
    from backend_big_data_spark.functions.textfns import tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(word_shingles(tokens(F.col("text")), n=3)).alias("shingle"),
    ).distinct()
    # pinned: the distinct (source, shingle) frame feeds THREE consumers
    # (per-source sizes + both sides of the overlap self-join) — without
    # the pin each branch re-ran the tokenize→shingle→explode→distinct
    # chain end to end (r12 plan audit: 7 scans, zero ReusedExchange).
    # The frame is vocabulary×sources-bounded, far under the corpus.
    sh = pin_single_evaluation(sh)
    sz = sh.groupBy("source").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs.join(sz, pairs.source_a == sz.source)
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("long"),
            F.floor(
                F.lit(1000000.0) * F.col("n_shared") / F.col("n_shingles")
                + F.lit(0.5)
            ).cast("long").alias("containment_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


_KL_DRIFT_ORACLE = r"""
WITH sp AS (
  SELECT doc_id, text,
         (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 100) < 50 AS in_a
  FROM documents
), toks AS (
  SELECT in_a, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM sp
), c AS (
  SELECT tok,
         SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
  FROM toks GROUP BY 1
), terms AS (
  SELECT tok, ca, cb,
         (2 * ca + 1)
         * CAST(floor((ln(ca + 0.5) - ln(cb + 0.5)) * 10000 + 0.5) AS BIGINT)
           AS term_fp
  FROM c
)
SELECT CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
       CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b,
       CAST(SUM(ca) AS BIGINT) AS tokens_a,
       CAST(SUM(cb) AS BIGINT) AS tokens_b,
       CAST(SUM(term_fp) AS BIGINT) AS drift_fp
FROM terms
"""


@register("corpus_kl_drift", oracle=_KL_DRIFT_ORACLE)
def corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift score between two deterministic snapshot halves (the
    stable-hash 50/50 split used by the A/B readout): an unnormalized
    KL-style sum over the token vocabulary, Σ (2·cA+1) · fp(ln(cA+0.5) −
    ln(cB+0.5)), with every log-ratio snapped to a 1e-4 fixed-point
    integer BEFORE the weighted sum — the DSIR convention that makes the
    score bit-identical at any parallelism and across engines. Identical
    halves score ≈ 0; a vocabulary or topic shift moves it sharply. Run
    between TIME snapshots in production to catch feed drift before it
    hits a training mix. One token-keyed count aggregate + one global
    sum."""
    from backend_big_data_spark.functions.textfns import tokens
    from backend_big_data_spark.text.sampling import stable_hash

    docs = load_table(spark, sf_dir, "documents")
    sp = docs.select(
        (stable_hash(F.col("doc_id")) % 100 < 50).alias("in_a"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    c = sp.groupBy("tok").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).alias("cb"),
    )
    term = (
        (F.lit(2) * F.col("ca") + 1)
        * F.floor(
            (F.log(F.col("ca") + 0.5) - F.log(F.col("cb") + 0.5))
            * F.lit(10000)
            + F.lit(0.5)
        ).cast("long")
    ).alias("term_fp")
    return c.select("ca", "cb", term).agg(
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).cast("long").alias("vocab_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).cast("long").alias("vocab_b"),
        F.sum("ca").cast("long").alias("tokens_a"),
        F.sum("cb").cast("long").alias("tokens_b"),
        F.sum("term_fp").cast("long").alias("drift_fp"),
    )


#: Chunk keep threshold: avg NLL <= 3.37 nats, evaluated as the integer
#: cross-multiplication nll_fp <= 33700 * n_bigrams (no division — the
#: Gopher verdict convention). 3.37 ~= this corpus's median chunk NLL, so
#: the gate actually splits.
CHUNK_NLL_THRESH_FP = 33_700

_CHUNK_LM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), chunks AS (
  SELECT doc_id, CAST((s - 1) / 32 AS INTEGER) AS chunk_idx,
         CAST(doc_id AS VARCHAR) || ':' || CAST(CAST((s - 1) / 32 AS BIGINT) AS VARCHAR) AS cid,
         array_to_string(t[s:s+31], ' ') AS chunk
  FROM toks, LATERAL unnest(range(1, greatest(len(t), 1) + 1, 32)) AS u(s)
), uni AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS w1 FROM documents
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY 1
), v AS (
  SELECT COUNT(*) AS v FROM c1
), docc AS (
  SELECT regexp_extract_all(lower(text), '[a-z]{2,}') AS mt FROM documents
), c2 AS (
  SELECT t2, COUNT(*) AS c2 FROM (
    SELECT unnest(list_transform(range(1, len(mt)), i -> mt[i] || ' ' || mt[i + 1])) AS t2
    FROM docc WHERE len(mt) >= 2
  ) GROUP BY 1
), cocc0 AS (
  SELECT cid, unnest(list_transform(range(1, len(ct)),
         i -> {'w1': ct[i], 'bigram': ct[i] || ' ' || ct[i + 1]})) AS s
  FROM (SELECT cid, regexp_extract_all(lower(chunk), '[a-z]{2,}') AS ct FROM chunks)
  WHERE len(ct) >= 2
), cocc AS (
  SELECT cid, s.w1 AS w1, s.bigram AS bigram FROM cocc0
), scored AS (
  SELECT o.cid, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         -SUM(CAST(floor((ln(COALESCE(c2.c2, 0) + 0.5)
                          - ln(COALESCE(c1.c1, 0) + 0.5 * (SELECT v FROM v)))
                         * 10000 + 0.5) AS BIGINT)) AS nll_fp
  FROM cocc o LEFT JOIN c2 ON o.bigram = c2.t2 LEFT JOIN c1 ON o.w1 = c1.w1
  GROUP BY 1
)
SELECT c.doc_id, c.chunk_idx,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       CAST(COALESCE(nll_fp, 0) AS BIGINT) AS nll_fp,
       (COALESCE(nll_fp, 0) <= 33700 * COALESCE(n_bigrams, 0)) AS kept
FROM chunks c LEFT JOIN scored ON c.cid = scored.cid
ORDER BY c.doc_id, c.chunk_idx
"""


@register("doc_chunk_lm_prune", oracle=_CHUNK_LM_ORACLE)
def doc_chunk_lm_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's pruning stage at SUB-document granularity (arXiv:1911.00359
    §4.4 scores paragraphs, not pages): the corpus-trained bigram LM
    (`text/lm.py`, now accepting a separate training frame) scores every
    32-token chunk (`functions/textfns.token_chunks`), and chunks whose
    average NLL exceeds the threshold are marked dropped — the "delete
    the boilerplate-y / degenerate stretch, keep the document" operation
    a page-level filter cannot express. Keep verdicts via integer
    cross-multiplication (``nll_fp <= THRESH · n_bigrams``). Model trains
    on FULL documents; chunks inherit smoothed zero counts for any
    boundary-clipped context via left joins — exact in both engines."""
    from backend_big_data_spark.functions.textfns import token_chunks, tokens
    from backend_big_data_spark.text.lm import bigram_nll

    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(token_chunks(tokens(F.col("text")), size=32, overlap=0)).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        # delimiter-joined composite key — arithmetic packing
        # (doc_id*K + chunk_idx) silently collides once a doc has >= K
        # chunks, merging NLL aggregates across documents
        F.concat_ws(":", F.col("doc_id"), F.col("c.chunk_idx")).alias("cid"),
        F.col("c.chunk").alias("chunk"),
    )
    nll = bigram_nll(
        ch.select("cid", "chunk"),
        text_col="chunk",
        id_col="cid",
        model_df=docs,
        model_text_col="text",
    )
    return (
        ch.join(nll, on="cid")
        .select(
            "doc_id",
            "chunk_idx",
            "n_bigrams",
            "nll_fp",
            (
                F.col("nll_fp")
                <= F.lit(CHUNK_NLL_THRESH_FP) * F.col("n_bigrams")
            ).alias("kept"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


#: tokens per output shard for the shard-assignment plan
SHARD_TOKEN_BUDGET = 2_000

_SHARD_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 32 AS bucket
  FROM documents
), pos AS (
  SELECT doc_id, n_tokens, bucket,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY bucket, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS token_start
  FROM d
)
SELECT doc_id, n_tokens, token_start,
       CAST(token_start // 2000 AS BIGINT) AS shard
FROM pos ORDER BY doc_id
"""


@register("doc_shard_assignment", oracle=_SHARD_ORACLE)
def doc_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted output-shard assignment — the corpus-scale layout
    step before writing training shards: every document gets a global
    token offset in a deterministic order and the shard whose budget
    window its offset falls in.

    The global running sum is computed as a DISTRIBUTED PREFIX SUM, not a
    global window: documents hash into 32 buckets; each bucket does its
    own windowed cumsum (shuffle keyed on the bucket, 1/32nd of the data
    per window partition); the 32 bucket TOTALS get their own cumsum in a
    bounded 32-row window; global offset = bucket offset + within-bucket
    offset. Identical result to a single global window, but no stage ever
    sorts more than one bucket — the classic two-level scan that keeps
    prefix sums alive at 100 TB (scale the bucket count with the data;
    the offsets table stays |buckets| rows). A doc straddling a budget
    boundary belongs to the shard its START offset falls in (documented
    semantics; pair with `doc_pack_sequences` for intra-shard packing)."""
    from pyspark.sql import Window

    from backend_big_data_spark.functions.textfns import tokens
    from backend_big_data_spark.text.sampling import stable_hash

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (stable_hash(F.col("doc_id")) % 32).alias("bucket"),
    )
    win_b = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = d.withColumn(
        "__within", F.coalesce(F.sum("n_tokens").over(win_b), F.lit(0))
    )
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("__total"))
    win_t = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("__total").over(win_t), F.lit(0)).alias("__offset"),
    )
    return (
        within.join(F.broadcast(offsets), on="bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__offset") + F.col("__within")).alias("token_start"),
            F.floor(
                (F.col("__offset") + F.col("__within"))
                / F.lit(SHARD_TOKEN_BUDGET)
            ).cast("long").alias("shard"),
        )
        .orderBy("doc_id")
    )


_SOURCE_DUP_ORACLE = r"""
WITH fp AS (
  SELECT source, md5(text) AS f FROM documents
), per AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT f) AS n_unique
  FROM fp GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_unique AS BIGINT) AS n_unique,
       CAST(floor(1000000.0 * (n_docs - n_unique) / n_docs + 0.5) AS BIGINT)
         AS dup_ppm
FROM per ORDER BY source
"""


@register("source_dup_stats", oracle=_SOURCE_DUP_ORACLE)
def source_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate (integer ppm) — the governance
    companion of `source_overlap_matrix`: WHICH feed is paying the dedup
    bill. One hash aggregate on (source, fingerprint) folded into a
    per-source count + distinct; at 100 TB the distinct rides the same
    partial-aggregation path as `doc_exact_dedup` (16-byte keys)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("source", F.md5("text").alias("f"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("f").alias("n_unique"),
        )
    )
    return per.select(
        "source",
        F.col("n_docs").cast("long"),
        F.col("n_unique").cast("long"),
        F.floor(
            F.lit(1000000.0) * (F.col("n_docs") - F.col("n_unique"))
            / F.col("n_docs")
            + F.lit(0.5)
        ).cast("long").alias("dup_ppm"),
    ).orderBy("source")


_EMB_HEALTH_ORACLE = r"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), per AS (
  SELECT vec_id, len(e) AS dim,
         list_aggregate(list_transform(e, x -> x * x), 'sum') AS sq,
         len(list_filter(e, x -> isnan(x))) AS n_nan
  FROM v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
       CAST(MIN(dim) AS BIGINT) AS min_dim,
       CAST(MAX(dim) AS BIGINT) AS max_dim,
       CAST(SUM(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
       CAST(SUM(CASE WHEN n_nan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_vectors,
       CAST(SUM(CAST(floor(sqrt(sq) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
         AS norm_sum_fp
FROM per
"""


@register("embedding_health_audit", oracle=_EMB_HEALTH_ORACLE)
def embedding_health_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-table health audit — the pre-flight every ANN /
    SemDeDup run needs: dimension consistency (a ragged dim breaks every
    zip_with), zero vectors (cosine is undefined — they silently pass any
    threshold test as 0), NaN contamination, and the fixed-point norm sum
    (a cheap whole-table checksum that flags re-embedding drift between
    snapshots). Map-side higher-order expressions + one global aggregate;
    per-vector norms snap to 1e-4 fixed point BEFORE the sum (the DSIR
    convention), so the checksum is bit-identical at any parallelism."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    sq = F.aggregate(
        F.transform(e, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    per = emb.select(
        F.size(e).alias("dim"),
        sq.alias("sq"),
        F.size(F.filter(e, lambda x: F.isnan(x))).alias("n_nan"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.countDistinct("dim").cast("long").alias("n_distinct_dims"),
        F.min("dim").cast("long").alias("min_dim"),
        F.max("dim").cast("long").alias("max_dim"),
        F.sum(F.when(F.col("sq") == 0, 1).otherwise(0)).cast("long").alias(
            "n_zero_vectors"
        ),
        F.sum(F.when(F.col("n_nan") > 0, 1).otherwise(0)).cast("long").alias(
            "n_nan_vectors"
        ),
        F.sum(
            F.floor(F.sqrt(F.col("sq")) * F.lit(10000) + F.lit(0.5)).cast("long")
        ).cast("long").alias("norm_sum_fp"),
    )
