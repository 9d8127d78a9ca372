"""Round-5 additions: the incremental (recurring-ingest) composition of
SemDeDup — the embedding-space twin of the text ingest dedup path — plus
further curation/analytics queries registered this round.

Reference scope note: the reference's own dedup surface is exact
`dropDuplicates` (`/root/reference/scripts/data_cleaner.py:84`); everything
here is additive LLM-training-pipeline scope (SURVEY.md §2 additive
operators), oracle-gated like the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

# Deterministic split/centroids, matching the conventions already proven
# green: centroids = first 10 corpus vectors (fixed-quantizer trick);
# batch = vec_id % 4 == 0 (deterministic ingest slice), corpus = the rest.
_INCR_SEMDEDUP_ORACLE = """
WITH RECURSIVE vecs AS (
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
  SELECT a.vec_id, a.cluster, v.v, (a.vec_id % 4 = 0) AS is_new
  FROM assign a JOIN vecs v USING (vec_id)
), cross_dropped AS (
  SELECT DISTINCT b.vec_id
  FROM lab a JOIN lab b ON a.cluster = b.cluster
  WHERE NOT a.is_new AND b.is_new
    AND list_cosine_similarity(a.v, b.v) > 0.3
), bedges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM lab a JOIN lab b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE a.is_new AND b.is_new AND list_cosine_similarity(a.v, b.v) > 0.3
), edges2 AS (
  SELECT a, b FROM bedges UNION SELECT b AS a, a AS b FROM bedges
), walk(node, label) AS (
  SELECT DISTINCT a, a FROM edges2
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges2 e ON e.a = w.node
), batch_near_dropped AS (
  SELECT node AS vec_id
  FROM (SELECT node, MIN(label) AS root FROM walk GROUP BY node)
  WHERE node != root
)
SELECT l.vec_id, l.cluster,
       (l.vec_id NOT IN (SELECT vec_id FROM cross_dropped
                         UNION SELECT vec_id FROM batch_near_dropped)) AS kept
FROM lab l WHERE l.is_new
ORDER BY l.vec_id
"""


@register("doc_incremental_semdedup", oracle=_INCR_SEMDEDUP_ORACLE)
def doc_incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (`similarity/semdedup.py
    ``incremental_semdedup``): the arriving embedding batch (vec_id % 4
    == 0) is assigned to the fixed anchor centroids and compared
    batch-vs-corpus and batch-vs-batch WITHIN clusters only — the at-rest
    corpus is never rescored. Within-batch near pairs resolve
    transitively (min-label CC, keep min id), mirroring
    `doc_incremental_dedup_full`'s composition rule in embedding space.
    Completes the recurring-ingest curation loop for the embedding
    modality (see `streaming/semdedup_ingest.py` for the stream wiring)."""
    from backend_big_data_spark.similarity.semdedup import incremental_semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    return incremental_semdedup(
        batch, corpus, centroids, threshold=0.3
    ).orderBy("vec_id")


_DUP_SPANS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), pk AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
), d AS (
  SELECT gram FROM pk GROUP BY gram HAVING COUNT(*) >= 2
), st AS (
  SELECT doc_id, list(pos) AS starts
  FROM pk JOIN d USING (gram) GROUP BY doc_id
), j AS (
  SELECT t.doc_id, t.t, COALESCE(s.starts, CAST([] AS BIGINT[])) AS starts
  FROM toks t LEFT JOIN st s USING (doc_id)
), cov AS (
  -- explicit covered-position list; a nested lambda referencing the
  -- comprehension variable silently fails to correlate in DuckDB, so the
  -- interval test is materialised instead of re-derived per token
  SELECT doc_id, t,
         list_distinct(flatten(list_transform(starts, p -> range(p, p + 8))))
           AS covered
  FROM j
), kk AS (
  SELECT doc_id, t,
         [t[i] FOR i IN range(1, len(t) + 1)
          IF NOT list_contains(covered, i - 1)] AS kept
  FROM cov
)
SELECT doc_id,
       CAST(len(t) AS INTEGER) AS n_tokens,
       CAST(len(t) - len(kept) AS INTEGER) AS n_removed,
       -- array_to_string of an EMPTY list is NULL in DuckDB (Spark's
       -- concat_ws gives '') — coalesce so fully-scrubbed docs agree
       md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
FROM kk ORDER BY doc_id
"""


@register("doc_duplicate_spans", oracle=_DUP_SPANS_ORACLE)
def doc_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-span removal (arXiv:2107.06499, fixed-k
    formulation, k=8): every token covered by a corpus-duplicated 8-gram
    occurrence is scrubbed; report (n_tokens, n_removed, md5 of the
    scrubbed text) per document. See `text/spans.py` for why the k-gram
    marking computes the suffix-array removal set exactly, and for the
    shuffle anatomy (gram-count aggregate + two keyed joins — no suffix
    array, no global sort)."""
    from backend_big_data_spark.text.spans import duplicate_span_profile

    docs = load_table(spark, sf_dir, "documents")
    prof = duplicate_span_profile(docs, k=8)
    return prof.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


_NORM_DEDUP_ORACLE = r"""
WITH planted AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- deterministic case/spacing twins: every doc_id % 20 == 3 document
  -- reappears upper-cased with doubled spacing under a shifted id — the
  -- planted-signal convention (PII/blocklist oracles), identical in both
  -- engines
  SELECT doc_id + 1000000 AS doc_id,
         '  ' || upper(regexp_replace(text, ' ', '  ', 'g')) || '  ' AS text
  FROM documents WHERE doc_id % 20 = 3
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS ntext
  FROM planted
), g AS (
  SELECT md5(ntext) AS fingerprint, COUNT(*) AS dup_count,
         MIN(doc_id) AS canonical_doc_id
  FROM norm GROUP BY 1
)
SELECT fingerprint, CAST(dup_count AS BIGINT) AS dup_count, canonical_doc_id
FROM g WHERE dup_count >= 2
ORDER BY fingerprint
"""


@register("doc_normalized_dedup", oracle=_NORM_DEDUP_ORACLE)
def doc_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: fingerprints computed on the
    canonical text form (`functions/textfns.normalize_text` — lowercase,
    punctuation strip, whitespace collapse), catching the
    case/spacing/punctuation duplicate class raw `doc_exact_dedup`
    misses. The synthetic corpus has no organic variants, so the query
    PLANTS one upper-cased double-spaced twin per doc_id % 20 == 3
    document (both engines plant identically). Same single
    hash-aggregate shuffle as raw exact dedup — normalization is
    map-side codegen on the scan."""
    from backend_big_data_spark.functions.textfns import normalize_text
    from backend_big_data_spark.text.dedup import exact_dedup_fingerprints

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 20 == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.lit("  "),
            F.upper(F.regexp_replace("text", " ", "  ")),
            F.lit("  "),
        ).alias("text"),
    )
    planted = docs.unionByName(twins)
    norm = planted.select("doc_id", normalize_text(F.col("text")).alias("text"))
    return (
        exact_dedup_fingerprints(norm)
        .filter(F.col("dup_count") >= 2)
        .orderBy("fingerprint")
    )


_TOKEN_SPECTRUM_ORACLE = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
), tf AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY 1
)
SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_types
FROM tf GROUP BY 1 ORDER BY freq
"""


@register("corpus_token_spectrum", oracle=_TOKEN_SPECTRUM_ORACLE)
def corpus_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency-of-frequencies spectrum (the Zipf/Heaps companion
    of `corpus_vocab_growth`): how many distinct token types occur
    exactly f times. Two keyed hash aggregates — the first shuffles on
    the token (partial aggregation collapses repeats map-side), the
    second on the bounded frequency grid. The spectrum's head (f=1
    hapaxes) is the standard OOV-rate / tokenizer-budget diagnostic."""
    docs = load_table(spark, sf_dir, "documents")
    from backend_big_data_spark.functions.textfns import tokens

    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    return (
        tf.groupBy("freq")
        .agg(F.count("*").alias("n_types"))
        .orderBy("freq")
    )


def _ann_recall_oracle() -> str:
    """Composes the already-registered per-method oracle SQLs as
    subqueries — one definition per method drives both the top-k query
    and this evaluation (the _contamination_oracle reuse pattern)."""
    from backend_big_data_spark.plans import embeddings_events  # noqa: F401
    from backend_big_data_spark.plans.registry import ORACLES

    brute = ORACLES["ann_cosine_topk"].strip()
    parts = []
    for method in ("ivf", "lsh", "sq8"):
        sub = ORACLES[f"ann_{method}_topk"].strip()
        parts.append(
            f"m_{method} AS (SELECT COUNT(*) AS h FROM brute b "
            f"JOIN ({sub}) a ON b.query_id = a.query_id "
            f"AND b.neighbor_id = a.neighbor_id)"
        )
    selects = "\nUNION ALL ".join(
        f"SELECT '{m}' AS method, CAST(h AS BIGINT) AS n_hits, "
        f"CAST(floor(1000000.0 * h / t + 0.5) AS BIGINT) AS recall_ppm "
        f"FROM m_{m}, tot"
        for m in ("ivf", "lsh", "sq8")
    )
    return f"""
WITH brute AS (SELECT query_id, neighbor_id FROM ({brute})),
tot AS (SELECT COUNT(*) AS t FROM brute),
{",".join(parts)}
SELECT * FROM (
{selects}
) ORDER BY method
"""


@register("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of each approximate ANN variant against the brute-force
    cosine baseline, pooled over the 10 fixed query vectors — the
    measurement loop every ANN deployment runs before trading exactness
    for speed (the FAISS-style eval). Composes the certified registry
    queries unchanged; recall in exact integer ppm. All joins are on the
    (query, neighbor) pairs of bounded top-k frames — driver never sees
    data."""
    from backend_big_data_spark.plans.registry import QUERIES

    brute = (
        QUERIES["ann_cosine_topk"](spark, sf_dir)
        .select("query_id", "neighbor_id")
    )
    # pinned: the brute-force baseline is a ≤ 50-row frame feeding
    # FOUR consumers (tot + one semi join per method) — without the
    # pin each consumer re-ran the full corpus cosine top-k (r12
    # plan audit: 41 scans, zero ReusedExchange)
    brute = pin_single_evaluation(brute)
    tot = brute.agg(F.count("*").alias("t"))
    outs = []
    for method in ("ivf", "lsh", "sq8"):
        ap = QUERIES[f"ann_{method}_topk"](spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        hits = brute.join(ap, ["query_id", "neighbor_id"], "semi").agg(
            F.count("*").alias("h")
        )
        outs.append(
            hits.crossJoin(tot).select(
                F.lit(method).alias("method"),
                F.col("h").cast("long").alias("n_hits"),
                F.floor(F.lit(1000000.0) * F.col("h") / F.col("t") + F.lit(0.5))
                .cast("long")
                .alias("recall_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("method")


def _lsh_banding_eval_oracle() -> str:
    """Composes the candidate-stage and exact-pairs oracles (one
    definition each, shared with their own gates) into a
    precision/recall readout."""
    from backend_big_data_spark.plans import documents  # noqa: F401 (registers)
    from backend_big_data_spark.plans.registry import ORACLES

    cand = ORACLES["doc_minhash_lsh_pairs"].strip()
    truth = ORACLES["doc_ngram_jaccard_pairs"].strip()
    return f"""
WITH cand AS (SELECT doc_a, doc_b FROM ({cand})),
truth AS (SELECT doc_a, doc_b FROM ({truth})),
n AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_true,
         (SELECT COUNT(*) FROM cand c JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_hits
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true AS BIGINT) AS n_true,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(floor(1000000.0 * n_hits / n_true + 0.5) AS BIGINT) AS recall_ppm,
       CAST(floor(1000000.0 * n_hits / n_candidates + 0.5) AS BIGINT)
         AS precision_ppm
FROM n
"""


@register("lsh_banding_eval", oracle=_lsh_banding_eval_oracle())
def lsh_banding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the MinHash-LSH candidate stage against the
    exact Jaccard pair truth (threshold 0.2) — the S-curve readout that
    justifies a (bands, rows) operating point before a corpus-scale run
    (the banding analysis of Mining of Massive Datasets §3.4, measured
    instead of assumed). Composes the two certified registry queries
    unchanged; integer-ppm rates; the joined frames are the bounded pair
    lists, so the eval costs two pair jobs plus one tiny join."""
    from backend_big_data_spark.plans.registry import QUERIES

    cand = QUERIES["doc_minhash_lsh_pairs"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    truth = QUERIES["doc_ngram_jaccard_pairs"](spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    hits = cand.join(truth, ["doc_a", "doc_b"], "semi")
    n = (
        cand.agg(F.count("*").alias("n_candidates"))
        .crossJoin(truth.agg(F.count("*").alias("n_true")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
    )
    return n.select(
        F.col("n_candidates").cast("long"),
        F.col("n_true").cast("long"),
        F.col("n_hits").cast("long"),
        F.floor(
            F.lit(1000000.0) * F.col("n_hits") / F.col("n_true") + F.lit(0.5)
        ).cast("long").alias("recall_ppm"),
        F.floor(
            F.lit(1000000.0) * F.col("n_hits") / F.col("n_candidates")
            + F.lit(0.5)
        ).cast("long").alias("precision_ppm"),
    )
