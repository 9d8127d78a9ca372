"""Advanced operator plans: grouping sets, set ops, temporal joins,
embedding near-dup, multimodal fingerprinting, and Structured Streaming run
through the driver's oracle gate.

These cover SURVEY.md §2 rows the reference leaves absent-but-free (rollup,
intersect/except — §2.4/§2.7), plus the additive north-star operators the
brief names first-class: as-of/range joins, embedding-cosine near-dup,
multimodal binary plumbing, and streaming with batch-twin oracles (§2.11).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.multimodal.binary_ops import (
    fingerprint_binary,
    to_media_table,
)
from backend_big_data_spark.operators.temporal import asof_join, range_join_pairs
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.neardup import blocked_cosine_pairs
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    session_windows,
    tumbling_counts,
)


# --------------------------------------------------------------------------
# Grouping sets / rollup (absent from the reference, SURVEY §2.4 — free in
# Spark and exposed here as a first-class query).
# --------------------------------------------------------------------------
@register(
    "orders_rollup",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderpriority,
       CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_year,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
ORDER BY g_year, g_priority, order_year, o_orderpriority
""",
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass: (year, priority) → year → grand
    total. One shuffle; Spark expands grouping sets map-side, so this is
    strictly cheaper than three separate groupBys at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    return (
        orders.rollup("order_year", "o_orderpriority")
        .agg(
            F.grouping("order_year").cast("int").alias("g_year"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("order_count"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "order_year",
            "o_orderpriority",
            "g_year",
            "g_priority",
            "order_count",
            "total_value",
        )
        .orderBy("g_year", "g_priority", "order_year", "o_orderpriority")
    )


@register(
    "orders_grouping_sets",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderpriority,
       CAST(GROUPING(year(o_orderdate)) AS INTEGER) AS g_year,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority))
ORDER BY g_year, g_priority, order_year, o_orderpriority
""",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two INDEPENDENT 1-D histograms (by year,
    by priority) in one scan + one shuffle, where rollup/cube would force
    a hierarchy or the full cross. At 100 TB this halves the scan cost of
    computing dashboard histograms separately; Spark expands the sets
    map-side so shuffle rows stay one-per-(task, group)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    return (
        orders.groupingSets(
            [[F.col("order_year")], [F.col("o_orderpriority")]],
            "order_year",
            "o_orderpriority",
        )
        .agg(
            F.grouping("order_year").cast("int").alias("g_year"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("order_count"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "order_year",
            "o_orderpriority",
            "g_year",
            "g_priority",
            "order_count",
            "total_value",
        )
        .orderBy("g_year", "g_priority", "order_year", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Set operations beyond union (SURVEY §2.7 "Absent: intersect / except —
# free if exposed"). Exposed.
# --------------------------------------------------------------------------
@register(
    "brand_types_intersect",
    oracle="""
SELECT p_type, p_size FROM part WHERE p_brand = 'Brand#1'
INTERSECT
SELECT p_type, p_size FROM part WHERE p_brand = 'Brand#2'
ORDER BY p_type, p_size
""",
)
def brand_types_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type, size) combos carried by BOTH brands — ``df.intersect``
    (distinct semantics, like SQL INTERSECT)."""
    part = load_table(spark, sf_dir, "part")
    t1 = part.filter(F.col("p_brand") == "Brand#1").select("p_type", "p_size")
    t2 = part.filter(F.col("p_brand") == "Brand#2").select("p_type", "p_size")
    return t1.intersect(t2).orderBy("p_type", "p_size")


@register(
    "brand_types_except",
    oracle="""
SELECT p_type, p_size FROM part WHERE p_brand = 'Brand#1'
EXCEPT
SELECT p_type, p_size FROM part WHERE p_brand = 'Brand#2'
ORDER BY p_type, p_size
""",
)
def brand_types_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(type, size) combos exclusive to Brand#1 — ``df.exceptAll`` would
    keep multiplicity; SQL EXCEPT is distinct, so ``df.subtract``."""
    part = load_table(spark, sf_dir, "part")
    t1 = part.filter(F.col("p_brand") == "Brand#1").select("p_type", "p_size")
    t2 = part.filter(F.col("p_brand") == "Brand#2").select("p_type", "p_size")
    return t1.subtract(t2).orderBy("p_type", "p_size")


# --------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) — oracled against DuckDB's native
# ASOF JOIN and a plain inequality join.
# --------------------------------------------------------------------------
@register(
    "asof_signup_before_purchase",
    oracle="""
SELECT a.event_id, a.user_id, a.ts AS purchase_ts,
       b.event_id AS signup_event_id, b.ts AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY a.event_id
""",
)
def asof_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase paired with the same user's most recent
    signup at-or-before it. Union+window formulation — one shuffle on
    user_id, no row explosion (operators/temporal.py)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="ts",
        right_cols={"event_id": "signup_event_id", "ts": "signup_ts"},
    ).orderBy("event_id")


@register(
    "purchases_prior_events_1h",
    oracle="""
SELECT a.event_id, a.user_id, COUNT(b.event_id) AS prior_event_count
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN events b
  ON b.user_id = a.user_id AND b.ts < a.ts AND b.ts >= a.ts - INTERVAL 1 HOUR
GROUP BY a.event_id, a.user_id
ORDER BY a.event_id
""",
)
def purchases_prior_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per purchase, how many same-user events in the preceding
    hour. Bucketed equi-join (operators/temporal.py) keeps the candidate set
    bounded per (user, hour-bucket); zero-match purchases are restored with
    a broadcast-size left join of the counts."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join_pairs(
        purchases,
        ev.select("event_id", "user_id", "ts"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        window_seconds=3600,
        right_cols={"event_id": "prior_event_id"},
    )
    counts = pairs.groupBy("event_id", "user_id").agg(
        F.count("prior_event_id").alias("prior_event_count")
    )
    return (
        purchases.join(counts, on=["event_id", "user_id"], how="left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("prior_event_count", F.lit(0)).alias("prior_event_count"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup + multimodal fingerprint (north-star additive).
# --------------------------------------------------------------------------
@register(
    "embedding_near_dup_pairs",
    oracle="""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) > 0.3
ORDER BY vec_id_a, vec_id_b
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-then-verify near-dup: candidates only within a blocking key
    (here ``label``; LSH buckets when no natural key exists), exact cosine
    verifies. The global O(n²) comparison never happens."""
    emb = load_table(spark, sf_dir, "embeddings")
    return blocked_cosine_pairs(emb, block_col="label", threshold=0.3).orderBy(
        "vec_id_a", "vec_id_b"
    )


@register(
    "multimodal_fingerprint",
    oracle="""
SELECT doc_id AS media_id,
       sha256(text) AS payload_sha256,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
FROM documents ORDER BY media_id
""",
)
def multimodal_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text payload → canonical binary media
    table → Arrow-batched ``mapInPandas`` fingerprint. The same path carries
    image/audio bytes; sha256-over-bytes makes it oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    media = to_media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text")
    return (
        fingerprint_binary(media)
        .select("media_id", "payload_sha256", "payload_bytes")
        .orderBy("media_id")
    )


# --------------------------------------------------------------------------
# Structured Streaming through the oracle gate: run availableNow → memory
# sink, return the sink table. The batch-twin SQL is the oracle (§2.11).
# --------------------------------------------------------------------------
_STREAM_SEQ = itertools.count()


def _run_to_table(sdf: DataFrame, prefix: str, mode: str) -> DataFrame:
    name = f"{prefix}_{next(_STREAM_SEQ)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return sdf.sparkSession.table(name)


@register(
    "streaming_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS event_count,
       FLOOR(AVG(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window plan itself (watermarked groupBy over
    ``readStream``), executed with an availableNow trigger into a memory
    sink — proving stream results == batch twin, not just testing the twin."""
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    return _run_to_table(stream, "tumbling_oracle", "complete").orderBy(
        "window_start", "event_type"
    )


@register(
    "streaming_dedup_events",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props
FROM events ORDER BY event_id
""",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup by key within a watermark: the source is read TWICE
    and unioned (every event a duplicate), ``dropDuplicatesWithinWatermark``
    restores exactly-once — oracle is simply the original table."""
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    deduped = dedup_within_watermark(doubled, watermark="31 days")
    return _run_to_table(deduped, "dedup_oracle", "append").orderBy("event_id")


@register(
    "streaming_session_windows",
    oracle="""
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT MIN(ts) AS session_start, MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       user_id, COUNT(*) AS event_count
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-based session windows over the STREAM (10-minute gap,
    availableNow → memory sink). The oracle is the classic gaps-and-islands
    batch sessionization (lag → break flag → running sum → group), proving
    the stateful streaming merge converges to exact batch semantics:
    session_end = last event + gap, new session when the gap is ≥ 10 min
    (session windows are half-open [start, end))."""
    stream = session_windows(read_events_stream(spark, sf_dir), gap="10 minutes")
    return _run_to_table(stream, "session_oracle", "complete").orderBy(
        "user_id", "session_start"
    )
