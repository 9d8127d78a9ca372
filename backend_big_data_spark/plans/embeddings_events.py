"""Embedding-similarity and event-stream query plans (additive scope)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.search import keyword_filter
from backend_big_data_spark.operators.windows import paginate
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.ann import (
    brute_force_cosine_topk,
    lsh_cosine_topk,
    sq8_cosine_topk,
)
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.streaming.events import hourly_counts_batch


@register(
    "ann_cosine_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
), a AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS sim
  FROM q, a WHERE neighbor_id != query_id
), r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for 10 query vectors — the ANN
    correctness baseline. Query side broadcast; corpus streams map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "ann_lsh_topk",
    oracle="""
WITH planes AS (
  SELECT t, b,
         list_transform(generate_series(1, 64), i ->
           ((CAST(concat('0x', substr(md5(concat(t, ':', b, ':', i - 1)), 1, 15)) AS BIGINT)
             % 2000001) - 1000000) / 1000000.0) AS pv
  FROM generate_series(0, 5) g1(t), generate_series(0, 5) g2(b)
), vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), keys AS (
  SELECT vec_id,
         concat(t, ':', string_agg(
           CASE WHEN list_inner_product(v, pv) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY b)) AS bucket
  FROM vecs, planes GROUP BY vec_id, t
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM keys q JOIN keys c USING (bucket)
  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nv.v) AS sim
  FROM cand
  JOIN vecs qv ON qv.vec_id = cand.query_id
  JOIN vecs nv ON nv.vec_id = cand.neighbor_id
), r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
""",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (the 100 TB scale path): bucket join +
    exact re-rank on candidates. Oracle-gated via the md5-derived plane
    family (``_md5_planes``): both engines derive bit-identical plane
    doubles from md5(t:b:i), so candidate generation — not just the
    re-rank — replays exactly in SQL. The seeded-Gaussian family stays the
    engine default (pytest recall/equivalence coverage)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        num_bits=6,
        num_tables=6,
        dim=64,
        plane_source="md5",
    )


@register(
    "ann_sq8_topk",
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, i, v[i] AS x FROM vecs, generate_series(1, 64) g(i)
), stats AS (
  SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY i
), d AS (
  SELECT e.vec_id, e.i,
         CASE WHEN s.mx > s.mn
              THEN s.mn + FLOOR((e.x - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                   * (s.mx - s.mn) / 255
              ELSE s.mn END AS dx
  FROM e JOIN stats s USING (i)
), dv AS (
  SELECT vec_id, list(dx ORDER BY i) AS v FROM d GROUP BY vec_id
), s AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, n.v) AS sim
  FROM (SELECT vec_id, v FROM vecs WHERE vec_id < 10) q, dv n
  WHERE n.vec_id != q.vec_id
), r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
""",
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN (similarity/ann.py ``sq8_cosine_topk``):
    per-dim uint8 codes (4× smaller at rest than float32 — the
    memory-bound scale path), asymmetric float-query × dequantized-corpus
    cosine, top-5. Quantizer is a deterministic per-dim (min, max), so the
    ENTIRE pipeline — stats, codes, dequantization, ranking — replays in
    SQL for the gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, dim=64)


@register(
    "events_hourly_by_type",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS event_count,
       FLOOR(AVG(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of the streaming plan in
    streaming/events.py — F.window start == date_trunc on hour boundaries).
    The streaming variant with watermark is exercised in tests."""
    ev = load_table(spark, sf_dir, "events")
    return hourly_counts_batch(ev)


@register(
    "events_search_page",
    oracle="""
SELECT * FROM events
WHERE event_type IN ('click', 'view')
  AND ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
  AND contains(lower(props), '"k": 4')
ORDER BY event_id LIMIT 25 OFFSET 25
""",
)
def events_search_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized search (SURVEY §3.2 /searchPhotos shape): set
    membership + date range + keyword contains, stable pagination (B6
    fixed). Plan shape is runtime-parameterized, every operator declarative."""
    ev = load_table(spark, sf_dir, "events")
    filtered = ev.filter(
        F.col("event_type").isin("click", "view")
        & F.col("ts").between(
            F.lit("2024-01-10 00:00:00").cast("timestamp"),
            F.lit("2024-01-20 00:00:00").cast("timestamp"),
        )
        & keyword_filter([F.col("props")], '"k": 4')
    )
    return paginate(filtered, ["event_id"], page=2, page_size=25)
