"""Corpus-curation + event-analytics plans, round 4 second batch:
segment-level boilerplate dedup, blocklist density filtering, snapshot
diffing, and ordered funnel conversion.

New module so the plan files holding standing driver certifications stay
byte-stable (window-rotation policy, see ``all_plans.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.etl.snapshot_diff import diff_summary, snapshot_diff
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.text.filtering import DEFAULT_BLOCKLIST, blocklist_profile
from backend_big_data_spark.text.segments import strip_boilerplate

_SEG_LEN = 4
_MAX_DF = 2

#: Shared oracle CTEs: tokenize → fixed 4-token segments (struct list +
#: UNNEST — DuckDB's generate_series cannot lateral-reference columns) →
#: document frequency → hot list. Mirrors text/segments.py exactly.
_SEGS_CTES = rf"""
toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
segs0 AS (
  SELECT doc_id,
         [{{'seg_idx': i,
            'segment': array_to_string(t[i*{_SEG_LEN}+1 : i*{_SEG_LEN}+{_SEG_LEN}], ' ')}}
          FOR i IN range(0, CAST(ceil(len(t)/{_SEG_LEN}.0) AS INT))] AS ss
  FROM toks WHERE len(t) > 0
),
segs AS (
  SELECT doc_id, s.seg_idx AS seg_idx, s.segment AS segment
  FROM (SELECT doc_id, unnest(ss) AS s FROM segs0)
),
hot AS (
  SELECT segment FROM segs GROUP BY segment
  HAVING COUNT(DISTINCT doc_id) > {_MAX_DF}
)"""


@register(
    "doc_segment_dedup",
    oracle=f"""
WITH {_SEGS_CTES},
kept AS (
  SELECT * FROM segs WHERE segment NOT IN (SELECT segment FROM hot)
),
dropped AS (
  SELECT doc_id, COUNT(*) AS n_dropped FROM segs
  WHERE segment IN (SELECT segment FROM hot) GROUP BY doc_id
),
re AS (
  SELECT doc_id,
         array_to_string(list(segment ORDER BY seg_idx), ' ') AS clean_text,
         CAST(COUNT(*) AS INTEGER) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT re.doc_id, clean_text, n_kept,
       CAST(COALESCE(d.n_dropped, 0) AS INTEGER) AS n_dropped
FROM re LEFT JOIN dropped d ON re.doc_id = d.doc_id
""",
)
def doc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level-analog boilerplate strip (text/segments.py): segments
    recurring in >2 distinct docs are boilerplate and removed from every
    doc; docs reassemble in segment order. One explode, one DF agg, one
    anti-join, one keyed reassembly agg — no window, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(docs, seg_len=_SEG_LEN, max_df=_MAX_DF)


@register(
    "doc_blocklist_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), hits AS (
  SELECT doc_id,
         CAST(len(t) AS INTEGER) AS n_tokens,
         CAST(len(list_filter(t,
              x -> list_contains({DEFAULT_BLOCKLIST!r}, x))) AS INTEGER)
           AS n_blocked
  FROM toks
)
SELECT doc_id, n_tokens, n_blocked,
       ROUND(CAST(n_blocked AS DOUBLE) / n_tokens, 4) AS blocked_ratio,
       (CAST(n_blocked AS DOUBLE) / n_tokens) <= 0.05 AS kept
FROM hits
""",
)
def doc_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist rule, density form (text/filtering.py): per-doc
    blocked-token counts and keep verdict at 5% density. Pure codegen'd
    higher-order exprs on the scan — zero shuffles, zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    return blocklist_profile(docs, max_ratio=0.05)


@register(
    "doc_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
), o AS (SELECT doc_id, md5(text) AS ofp FROM old),
   n AS (SELECT doc_id, md5(text) AS nfp FROM new),
   d AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN ofp IS NULL THEN 'added'
              WHEN nfp IS NULL THEN 'removed'
              WHEN ofp = nfp THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY status ORDER BY status
""",
)
def doc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-ingest corpus diff (etl/snapshot_diff.py): two deterministic
    derived snapshots of the documents table (id-hash membership; every
    5th doc's text revised) full-outer-joined on id comparing md5
    fingerprints — the shuffle moves 16-byte digests, never documents."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return diff_summary(snapshot_diff(old, new))


@register(
    "events_funnel_conversion",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT CAST(COUNT(s1.user_id) AS BIGINT) AS view_users,
       CAST(COUNT(s2.user_id) AS BIGINT) AS click_users,
       CAST(COUNT(s3.user_id) AS BIGINT) AS purchase_users,
       CAST(SUM(date_diff('second', s1.t1, s3.t3)) AS BIGINT)
         / COUNT(s3.user_id) AS avg_convert_sec
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → click after view → purchase after
    click), the standard event-analytics shape: each stage is a keyed MIN
    aggregate of the events scan semi-filtered by the previous stage, so
    the chain is three shuffles on ``user_id`` — at scale the three stages
    co-partition (same key), so AQE reuses the exchange layout. Final
    single-row rollup counts stage survivors and the mean view→purchase
    conversion time (integer-second sum / count: cross-engine exact)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
    )
    convert_sec = F.unix_timestamp("t3") - F.unix_timestamp("t1")
    return funnel.agg(
        F.count("t1").alias("view_users"),
        F.count("t2").alias("click_users"),
        F.count("t3").alias("purchase_users"),
        (F.sum(convert_sec) / F.count("t3")).alias("avg_convert_sec"),
    )
