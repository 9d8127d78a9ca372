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


# ---------------------------------------------------------------------------
# Quality-aware dup retention: keep the BEST doc per near-dup cluster
# ---------------------------------------------------------------------------


def _dedup_best_oracle() -> str:
    """Kept-corpus oracle where each near-dup cluster keeps its LONGEST
    member (tie → min doc_id) instead of the min id: recursive min-label
    flood over the verified pairs, then a per-root argmax window."""
    from backend_big_data_spark.plans.extended import _lsh_verified_oracle

    verified = _lsh_verified_oracle().strip()
    verified = verified[: verified.rindex("ORDER BY")]
    return f"""
WITH RECURSIVE near AS (
{verified}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM near
  UNION
  SELECT doc_b AS a, doc_a AS b FROM near
),
walk(node, label) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node
),
clusters AS (SELECT node, MIN(label) AS root FROM walk GROUP BY node),
scored AS (
  SELECT c.node, c.root, d.n_chars FROM clusters c
  JOIN documents d ON d.doc_id = c.node
),
winners AS (
  SELECT node FROM (
    SELECT node, row_number() OVER (
      PARTITION BY root ORDER BY n_chars DESC, node
    ) AS rn FROM scored
  ) WHERE rn = 1
),
exact_canon AS (
  SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
),
removed AS (
  SELECT node AS doc_id FROM scored
  WHERE node NOT IN (SELECT node FROM winners)
  UNION
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT keep_id FROM exact_canon)
    AND doc_id NOT IN (SELECT node FROM winners)
)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
ORDER BY d.doc_id
"""


@register("doc_corpus_dedup_best", oracle=_dedup_best_oracle())
def doc_corpus_dedup_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware retention — the production twist on
    ``doc_corpus_deduped_cc``: a near-dup cluster keeps its BEST member
    (here: longest text, tie → min id), not its min id. A min-id rule can
    keep a truncated fragment over a full article just because it crawled
    first; retention-by-quality is the policy the public cleaning
    pipelines actually use. Winner per component via ``max(struct(...))``
    (one hash aggregate — no window, no self-join); exact non-canonicals
    are removed unless they ARE a cluster winner (identical texts land in
    one cluster, whose single winner must survive both rules)."""
    from backend_big_data_spark.operators.aggregates import argmax_per_group
    from backend_big_data_spark.operators.graph import connected_components_star
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        exact_dedup_fingerprints,
        lsh_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(doc_shingles(docs), threshold=0.5, hash_fn="md5")
    labels = connected_components_star(pairs, src="doc_a", dst="doc_b")
    scored = labels.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), on="node"
    )
    winners = argmax_per_group(
        scored,
        group_by=["component"],
        order_cols=[F.col("n_chars"), -F.col("node")],
        payload={"doc_id": F.col("node")},
    ).select("doc_id")
    cluster_losers = scored.join(
        winners, scored.node == winners.doc_id, "left_anti"
    ).select(F.col("node").alias("doc_id"))
    exact_non_canon = docs.join(
        exact_dedup_fingerprints(docs).select(
            F.col("canonical_doc_id").alias("doc_id")
        ),
        on="doc_id",
        how="left_anti",
    ).select("doc_id")
    removed = cluster_losers.unionByName(
        exact_non_canon.join(winners, on="doc_id", how="left_anti")
    ).distinct()
    return (
        docs.join(removed, on="doc_id", how="left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist / ntile in one pass
# ---------------------------------------------------------------------------


@register(
    "customer_spend_distribution",
    oracle="""
WITH spend AS (
  SELECT c_custkey, c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_mktsegment
)
SELECT c_custkey, c_mktsegment, total_spend,
       CAST(rank() OVER w AS INTEGER) AS spend_rank,
       FLOOR(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
       FLOOR(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM spend
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey)
ORDER BY c_mktsegment, spend_rank
""",
)
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-function window coverage (percent_rank / cume_dist /
    ntile / rank in ONE window pass over a pre-aggregated frame). The
    window partitions by market segment — bounded per-partition row counts
    after the keyed aggregation, so no single-partition global sort; the
    unique (spend DESC, custkey) ordering makes every rank deterministic."""
    from pyspark.sql import Window

    from backend_big_data_spark.functions.scalars import round_half_up

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.col("c_custkey")
    )
    return (
        spend.select(
            "c_custkey",
            "c_mktsegment",
            "total_spend",
            F.rank().over(w).cast("int").alias("spend_rank"),
            round_half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
            round_half_up(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .orderBy("c_mktsegment", "spend_rank")
    )


# ---------------------------------------------------------------------------
# One-pass table profiling (data-quality summary)
# ---------------------------------------------------------------------------


@register(
    "orders_profile",
    oracle="""
SELECT 'o_orderkey' AS col,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_v,
       CAST(MAX(o_orderkey) AS DOUBLE) AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice',
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
FROM orders
ORDER BY col
""",
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (null/distinct/min/max per column) computed in
    ONE scan: the three per-column stat sets are aggregates of the same
    pass (Catalyst plans multi-count_distinct via a single Expand — one
    shuffle, not one job per column), then unpivoted to the long layout a
    profiling UI consumes. The DuckDB oracle spells the same result as
    three scans UNION ALL — same rows, different (worse) plan, which is
    the point of the comparison."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cnt = F.count(F.lit(1))
    agg = orders.agg(
        *[
            e
            for c in ("o_orderkey", "o_custkey", "o_totalprice")
            for e in (
                (cnt - F.count(c)).alias(f"{c}__nulls"),
                F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            )
        ]
    )
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
        )
        for c in ("o_orderkey", "o_custkey", "o_totalprice")
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.col", "r.n_nulls", "r.n_distinct", "r.min_v", "r.max_v")
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# Product-quantized ANN (similarity/pq.py)
# ---------------------------------------------------------------------------

_PQ_M = 8
_PQ_DSUB = 8
_PQ_KSUB = 16


@register(
    "ann_pq_topk",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
anch AS (
  SELECT vec_id, v,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id
  FROM vecs ORDER BY vec_id LIMIT {_PQ_KSUB}
),
subids AS (SELECT unnest(range(0, {_PQ_M})) AS sub_id),
cb AS (
  SELECT s.sub_id, a.code_id,
         a.v[s.sub_id*{_PQ_DSUB}+1 : s.sub_id*{_PQ_DSUB}+{_PQ_DSUB}] AS codevec
  FROM anch a, subids s
),
subs AS (
  SELECT vec_id, s.sub_id,
         v[s.sub_id*{_PQ_DSUB}+1 : s.sub_id*{_PQ_DSUB}+{_PQ_DSUB}] AS subvec
  FROM vecs, subids s
),
scored AS (
  SELECT subs.vec_id, subs.sub_id, cb.code_id,
         list_sum([ (subvec[i] - codevec[i]) * (subvec[i] - codevec[i])
                    FOR i IN range(1, {_PQ_DSUB} + 1) ]) AS d2
  FROM subs JOIN cb USING (sub_id)
),
best AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT vec_id, sub_id, code_id,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d2, code_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
recon AS (
  SELECT b.vec_id, flatten(list(cb.codevec ORDER BY b.sub_id)) AS rv
  FROM best b
  JOIN cb ON cb.sub_id = b.sub_id AND cb.code_id = b.code_id
  GROUP BY b.vec_id
),
q AS (SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 10),
sc AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, r.rv) AS sim
  FROM recon r, q
  WHERE r.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM sc
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
""",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (similarity/pq.py): m=8 subspaces × 16 codes
    (64× smaller at rest than float64), deterministic anchor codebooks
    (subvectors of the 16 lowest-id vectors — the oracle-gateable stand-in
    for per-subspace KMeans), asymmetric full-query × reconstructed-corpus
    cosine top-5 over the 10 lowest-id query vectors. The entire
    encode→decode→rank pipeline replays in SQL."""
    from backend_big_data_spark.similarity.pq import pq_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_cosine_topk(
        emb, queries, k=5, m=_PQ_M, ksub=_PQ_KSUB, dim=_PQ_M * _PQ_DSUB
    )


# ---------------------------------------------------------------------------
# EWMA smoothing over the daily event-value series
# ---------------------------------------------------------------------------


@register(
    "events_value_ewma",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1
),
framed AS (
  SELECT day, day_value,
         list(day_value) OVER (
           ORDER BY day ROWS BETWEEN 59 PRECEDING AND CURRENT ROW
         ) AS vals
  FROM daily
)
SELECT day, day_value,
       ROUND(list_reduce(vals, (acc, x) -> acc * 0.5 + 0.5 * x), 6) AS ewma
FROM framed
ORDER BY day
""",
)
def events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily event value (operators/timeseries.py
    ``ewma_over_days``): daily decimal-exact aggregate first (bounds the
    global-ordered window to ~2.5k rows), then a recursive α=0.5 fold over
    each row's trailing 60-row frame — Spark ``aggregate`` and DuckDB
    ``list_reduce`` execute the identical left-to-right IEEE fold, so the
    smoothed series is bit-exact across engines before the 6dp round."""
    from backend_big_data_spark.operators.timeseries import ewma_over_days

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("day_value")
    )
    return ewma_over_days(daily, lookback=60).orderBy("day")


# ---------------------------------------------------------------------------
# Z-order (Morton) curve codes — the multi-column layout key
# ---------------------------------------------------------------------------

_Z_BITS = 8


def _morton_sql(a: str, b: str, bits: int) -> str:
    """OR-chain of interleaved bit terms — the literal SQL twin of
    sources/zorder.py::morton_code (disjoint bits, so | == +)."""
    # DuckDB (like PostgreSQL) gives user-level operators |, &, << the SAME
    # precedence, left-associative — every term must be fully parenthesized
    # or the OR-chain folds into the next shift
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "events_zorder_codes",
    oracle=f"""
SELECT event_id,
       CAST({_morton_sql('user_id & 255', 'event_id & 255', _Z_BITS)} AS BIGINT)
         AS zcode
FROM events
ORDER BY zcode, event_id
""",
)
def events_zorder_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-curve codes (sources/zorder.py): interleave the low 8 bits
    of (user_id, event_id) — the clustering key a two-column-filterable
    table is laid out on so parquet min/max skipping prunes range boxes on
    BOTH columns. Pure codegen bit-twiddling; the layout write itself
    (repartitionByRange on the code) is exercised in
    tests/test_curation.py with a measured file-pruning win."""
    from backend_big_data_spark.sources.zorder import morton_code

    ev = load_table(spark, sf_dir, "events")
    code = morton_code(
        F.col("user_id").bitwiseAND(F.lit(255)),
        F.col("event_id").bitwiseAND(F.lit(255)),
        bits=_Z_BITS,
    )
    return (
        ev.select("event_id", code.alias("zcode"))
        .orderBy("zcode", "event_id")
    )


# ---------------------------------------------------------------------------
# IVF × PQ composed ANN (similarity/pq.py ivf_pq_cosine_topk)
# ---------------------------------------------------------------------------


@register(
    "ann_ivf_pq_topk",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (SELECT vec_id AS list_id, v AS cv FROM vecs WHERE vec_id < 8),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS arn
    FROM vecs vv, cents c
  ) WHERE arn = 1
),
resid AS (
  SELECT a.vec_id, a.list_id,
         [vv.v[i] - c.cv[i] FOR i IN range(1, 65)] AS r
  FROM assign a
  JOIN vecs vv ON vv.vec_id = a.vec_id
  JOIN cents c ON c.list_id = a.list_id
),
anch AS (
  SELECT vec_id, r,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id
  FROM resid ORDER BY vec_id LIMIT {_PQ_KSUB}
),
subids AS (SELECT unnest(range(0, {_PQ_M})) AS sub_id),
cb AS (
  SELECT s.sub_id, a.code_id,
         a.r[s.sub_id*{_PQ_DSUB}+1 : s.sub_id*{_PQ_DSUB}+{_PQ_DSUB}] AS codevec
  FROM anch a, subids s
),
subs AS (
  SELECT vec_id, s.sub_id,
         r[s.sub_id*{_PQ_DSUB}+1 : s.sub_id*{_PQ_DSUB}+{_PQ_DSUB}] AS subvec
  FROM resid, subids s
),
scored AS (
  SELECT subs.vec_id, subs.sub_id, cb.code_id,
         list_sum([ (subvec[i] - codevec[i]) * (subvec[i] - codevec[i])
                    FOR i IN range(1, {_PQ_DSUB} + 1) ]) AS d2
  FROM subs JOIN cb USING (sub_id)
),
best AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT vec_id, sub_id, code_id,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d2, code_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
reconr AS (
  SELECT b.vec_id, flatten(list(cb.codevec ORDER BY b.sub_id)) AS rhat
  FROM best b
  JOIN cb ON cb.sub_id = b.sub_id AND cb.code_id = b.code_id
  GROUP BY b.vec_id
),
recon AS (
  SELECT rr.vec_id, rs.list_id,
         [rr.rhat[i] + c.cv[i] FOR i IN range(1, 65)] AS nvq
  FROM reconr rr
  JOIN resid rs ON rs.vec_id = rr.vec_id
  JOIN cents c ON c.list_id = rs.list_id
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS prn
    FROM vecs vv, cents c WHERE vv.vec_id < 10
  ) WHERE prn <= 3
),
approx AS (
  SELECT p.query_id, r.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, r.nvq) AS asim
  FROM probes p
  JOIN recon r ON r.list_id = p.list_id
  JOIN vecs q ON q.vec_id = p.query_id
  WHERE r.vec_id <> p.query_id
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY asim DESC, neighbor_id) AS srn
    FROM approx
  ) WHERE srn <= 20
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         list_cosine_similarity(qv.v, nv.v) AS sim
  FROM shortlist s
  JOIN vecs qv ON qv.vec_id = s.query_id
  JOIN vecs nv ON nv.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM exact
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM ranked WHERE rnk <= 5
ORDER BY query_id, rnk
""",
)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ composed ANN (similarity/pq.py ``ivf_pq_cosine_topk``): 8
    fixed coarse centroids prune lists (nprobe=3), in-list vectors are PQ
    codes of their RESIDUALS (m=8 × 16 anchor codes — residuals cluster
    near 0, so the codebook budget concentrates where the data is), ADC
    scores probed candidates, top-20 re-ranked at full precision. The
    complete FAISS-style IVF,PQ workhorse, deterministic end-to-end —
    assignment, residual, encode, decode, probe, and both rankings replay
    in SQL."""
    from backend_big_data_spark.similarity.pq import ivf_pq_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    spark_cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    return ivf_pq_cosine_topk(
        emb,
        queries,
        k=5,
        m=_PQ_M,
        ksub=_PQ_KSUB,
        nprobe=3,
        rerank=20,
        centroids=spark_cents,
        dim=_PQ_M * _PQ_DSUB,
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals from the event log
# ---------------------------------------------------------------------------


@register(
    "events_scd2_intervals",
    oracle="""
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, event_type
""",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change log: each
    user's events become half-open validity intervals
    ``[valid_from, valid_to)`` via one ``lead`` over a user-keyed window
    (the classic CDC→dimension derivation; pairs with the AS-OF join for
    temporal fact enrichment). One shuffle on ``user_id``; the unique
    (ts, event_id) ordering pins interval edges deterministically."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_type")
    )


# ---------------------------------------------------------------------------
# Custom Python DataSource scan (sources/pyds.py)
# ---------------------------------------------------------------------------


@register(
    "pyds_catalog_scan",
    oracle="""
SELECT CAST(s.s * 100 + q.q AS BIGINT) AS event_id,
       CAST(s.s AS INTEGER) AS shard,
       ['view','click','purchase','signup','error'][((s.s + q.q) % 5) + 1]
         AS event_type,
       ROUND(((s.s * 100 + q.q) * 37 % 1000) / 10.0, 1) AS value
FROM (SELECT unnest(range(0, 4)) AS s) s,
     (SELECT unnest(range(0, 100)) AS q) q
ORDER BY event_id
""",
)
def pyds_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan through the custom Spark 4 Python DataSource
    (sources/pyds.py ``sharded_catalog``): 4 remote shards read as 4 input
    partitions. The fake service's row arithmetic is deterministic, so the
    oracle regenerates the identical table from ``range()`` — certifying
    the DataSource's schema, partitioning, and row semantics at the same
    gate as every parquet-backed query. (``sf_dir`` unused: the source IS
    the external system.)"""
    from backend_big_data_spark.sources.pyds import register as register_pyds

    register_pyds(spark)
    df = (
        spark.read.format("sharded_catalog")
        .option("shards", 4)
        .option("rowsPerShard", 100)
        .load()
    )
    return df.orderBy("event_id")


# ---------------------------------------------------------------------------
# Temperature-weighted mixture sampling (text/mixing.py)
# ---------------------------------------------------------------------------

_HID = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "doc_temperature_mix",
    oracle=f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
stats AS (
  SELECT list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                     (a, x) -> a + x) AS Z,
         CAST(SUM(n_docs) AS BIGINT) AS N
  FROM counts
),
rates AS (
  SELECT source, n_docs,
         CAST(FLOOR(LEAST(1.0,
               CAST(N AS DOUBLE) * 0.5 * sqrt(CAST(n_docs AS DOUBLE))
               / Z / n_docs) * 1e6 + 0.5) AS BIGINT) AS thresh
  FROM counts, stats
),
kept AS (
  SELECT d.source FROM documents d
  JOIN rates r ON d.source = r.source
  WHERE ({_HID} % 1000000) < r.thresh
)
SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
       r.thresh / 1e6 AS rate,
       CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept
FROM rates r
LEFT JOIN (SELECT source, COUNT(*) AS n FROM kept GROUP BY source) k
       ON r.source = k.source
ORDER BY r.source
""",
)
def doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (α=0.5) source rebalancing (text/mixing.py):
    per-source sampling rates ∝ sqrt(n_s), normalized to keep half the
    corpus, applied by deterministic hash membership — rare sources keep
    a larger fraction, dominant sources shrink. The rate computation is
    bit-exact across engines (sqrt not pow; group-ordered fold for the
    normalizer; integer millionths threshold before the hash compare).
    Per-source report: corpus size, applied rate, kept count."""
    from backend_big_data_spark.text.mixing import temperature_mix, temperature_mix_rates

    docs = load_table(spark, sf_dir, "documents")
    rates = temperature_mix_rates(docs, keep_frac=0.5)
    kept_counts = (
        temperature_mix(docs, keep_frac=0.5)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_docs",
            (F.col("thresh") / 1e6).alias("rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Custom aggregate (pandas GROUPED_AGG UDAF): geometric mean
# ---------------------------------------------------------------------------


@register(
    "order_value_geomean_by_priority",
    oracle="""
SELECT o_orderpriority,
       ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geomean_value,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_value_geomean_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-mean order value per priority via the JVM algebraic form
    (operators/udaf.py ``geometric_mean_expr`` — partial-agg friendly,
    the scale path). The pandas GROUPED_AGG UDAF twin
    (``geometric_mean``) computes the same statistic through the custom-
    aggregate extension point and is asserted equal in tests — UDAF
    coverage without putting Python on the gated hot path."""
    from backend_big_data_spark.operators.udaf import geometric_mean_expr

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(geometric_mean_expr(F.col("o_totalprice")), 4).alias(
                "geomean_value"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Statistical aggregates: stddev / variance / correlation / covariance
# ---------------------------------------------------------------------------


@register(
    "lineitem_stats_profile",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev,
       ROUND(var_samp(l_quantity), 4) AS qty_var,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def lineitem_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate coverage (stddev_samp / var_samp / corr /
    covar_samp) in one hash aggregate per return flag — all numerically
    stable single-pass merge formulas in both engines, so the 4-6 dp
    rounds sit far above the merge-order noise floor. Useful as the
    feature-stats pass a training pipeline runs before normalization."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# EWMA-baseline anomaly flags over the daily series
# ---------------------------------------------------------------------------


@register(
    "events_daily_anomalies",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1
),
framed AS (
  SELECT day, day_value,
         list(day_value) OVER (
           ORDER BY day ROWS BETWEEN 59 PRECEDING AND CURRENT ROW
         ) AS vals
  FROM daily
),
sm AS (
  SELECT day, day_value,
         list_reduce(vals, (acc, x) -> acc * 0.5 + 0.5 * x) AS ewma
  FROM framed
),
base AS (
  SELECT day, day_value, lag(ewma) OVER (ORDER BY day) AS baseline FROM sm
)
SELECT day, day_value,
       ROUND(baseline, 6) AS baseline,
       ROUND(day_value / baseline, 6) AS ratio,
       (day_value / baseline > 1.2 OR day_value / baseline < 0.8) AS is_anomaly
FROM base
WHERE baseline IS NOT NULL
ORDER BY day
""",
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring-style anomaly flags: each day compared against the PRIOR
    day's EWMA (the smoothed baseline cannot contain the day under test —
    a same-day baseline would absorb the spike it should flag). Same
    bit-exact recursive fold as ``events_value_ewma`` + one lag; both
    windows run on the bounded daily aggregate. Days outside ±20% of
    baseline are flagged."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("day_value")
    )
    # the fold is inlined (not ewma_over_days) because the BASELINE must be
    # the UNROUNDED smoothed value — that helper's 6dp output round is its
    # own gate contract, and rounding before the lag/ratio would compound
    w = Window.orderBy("day").rowsBetween(-59, Window.currentRow)
    vals = F.collect_list("day_value").over(w)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(rest, F.element_at(vals, 1), lambda a, x: a * 0.5 + 0.5 * x)
    base = daily.select(
        "day", "day_value", F.lag(ewma).over(Window.orderBy("day")).alias("baseline")
    )
    ratio = F.col("day_value") / F.col("baseline")
    return (
        base.filter(F.col("baseline").isNotNull())
        .select(
            "day",
            "day_value",
            F.round("baseline", 6).alias("baseline"),
            F.round(ratio, 6).alias("ratio"),
            ((ratio > 1.2) | (ratio < 0.8)).alias("is_anomaly"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join with prefix filtering (text/setjoin.py)
# ---------------------------------------------------------------------------


def _prefix_join_oracle() -> str:
    from backend_big_data_spark.plans.documents import _SHINGLES_CTE, _TOKS_CTE

    return f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle),
ranked AS (
  SELECT e.doc_id, e.shingle, d.df FROM ex e JOIN dfreq d USING (shingle)
),
docs AS (
  SELECT doc_id, list(shingle ORDER BY df, shingle) AS ord_toks,
         COUNT(*) AS sz
  FROM ranked GROUP BY doc_id
),
pref AS (
  SELECT doc_id,
         unnest(ord_toks[1 : CAST(sz - ceil(0.5 * sz) + 1 AS INT)]) AS shingle
  FROM docs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
ver AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(fa.shingles, fb.shingles)) AS isz,
         len(fa.shingles) AS la, len(fb.shingles) AS lb
  FROM cand c
  JOIN sh fa ON fa.doc_id = c.doc_a
  JOIN sh fb ON fb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, CAST(isz AS INTEGER) AS intersection_size,
       ROUND(CAST(isz AS DOUBLE) / (la + lb - isz), 6) AS jaccard
FROM ver
WHERE CAST(isz AS DOUBLE) / (la + lb - isz) >= 0.5
ORDER BY doc_a, doc_b
"""


@register("doc_prefix_join_pairs", oracle=_prefix_join_oracle())
def doc_prefix_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style EXACT Jaccard join (text/setjoin.py): rarest-first
    global shingle order, per-doc prefix indexing (|d| − ⌈t·|d|⌉ + 1),
    prefix-only candidate join, exact array-intersect verify. Unlike the
    max_df-capped form this is exact, and unlike the uncapped inverted
    index the hot shingles are never join keys — the scale-safe exact
    path for threshold 0.5."""
    from backend_big_data_spark.text.dedup import doc_shingles
    from backend_big_data_spark.text.setjoin import prefix_filtered_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return prefix_filtered_jaccard_pairs(
        doc_shingles(docs), threshold=0.5
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Model-based quality scoring (fixed-weight logistic classifier)
# ---------------------------------------------------------------------------


def _lr_features_sql(src: str) -> str:
    """Feature CTE body for the logistic scorer over table/CTE ``src`` —
    stopword list interpolated from the ONE definition the engine uses."""
    from backend_big_data_spark.text.quality import EN_STOPWORDS

    stop = ",".join(f"'{w}'" for w in EN_STOPWORDS)
    return rf"""
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE) AS n_distinct,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              x -> x IN ({stop}))) AS DOUBLE) AS stop_hits,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS chars_no_ws
  FROM {src}"""


def _lr_z_sql() -> str:
    """The linear score expression, interpolated from LR_WEIGHTS — one
    source of truth shared by the scorer and pipeline oracles."""
    from backend_big_data_spark.text.filtering import LR_WEIGHTS as w

    return (
        f"{w['bias']} + {w['ttr']} * (n_distinct / n_tokens) "
        f"+ {w['stopword_ratio']} * (stop_hits / n_tokens) "
        f"+ {w['avg_token_len']} * (chars_no_ws / n_tokens) "
        f"+ {w['log_tokens']} * ln(n_tokens)"
    )


def _quality_lr_oracle() -> str:
    return f"""
WITH f AS ({_lr_features_sql("documents")}
),
z AS (
  SELECT doc_id, {_lr_z_sql()} AS zv FROM f
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + exp(-zv)), 6) AS quality_score,
       (FLOOR(zv * 1e6 + 0.5) >= 0) AS keep
FROM z ORDER BY doc_id
"""


@register("doc_quality_score_lr", oracle=_quality_lr_oracle())
def doc_quality_score_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filter, scoring side (text/filtering.py
    ``quality_score_lr``): fixed published logistic weights over TTR /
    stopword density / avg token length / log token count — the trained
    artifact pinned as plan constants so the whole scorer replays in SQL
    (same pattern as fixed-centroid KMeans / anchor PQ codebooks). The
    keep verdict is the linear score's sign, never the sigmoid's libm
    tail. Pure codegen — zero shuffles before any downstream agg."""
    from backend_big_data_spark.text.filtering import quality_score_lr

    docs = load_table(spark, sf_dir, "documents")
    return quality_score_lr(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# The full cleaning pipeline as ONE declarative plan (stage funnel report)
# ---------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    return rf"""
WITH d0 AS (SELECT doc_id, text, source FROM documents),
-- stage 1: blocklist density <= 5%
t1 AS (
  SELECT doc_id, text, source,
         string_split_regex(trim(text), '\s+') AS t FROM d0
),
d1 AS (
  SELECT doc_id, text, source FROM t1
  WHERE CAST(len(list_filter(t, x -> list_contains({DEFAULT_BLOCKLIST!r}, x))) AS DOUBLE)
        / len(t) <= 0.05
),
-- stage 2: boilerplate strip (4-token segments, df > 2 within SURVIVORS)
t2 AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM d1
),
segs0 AS (
  SELECT doc_id, source,
         [{{'seg_idx': i,
            'segment': array_to_string(t[i*4+1 : i*4+4], ' ')}}
          FOR i IN range(0, CAST(ceil(len(t)/4.0) AS INT))] AS ss
  FROM t2 WHERE len(t) > 0
),
segs AS (
  SELECT doc_id, source, s.seg_idx AS seg_idx, s.segment AS segment
  FROM (SELECT doc_id, source, unnest(ss) AS s FROM segs0)
),
hot AS (
  SELECT segment FROM segs GROUP BY segment
  HAVING COUNT(DISTINCT doc_id) > 2
),
kept_segs AS (
  SELECT * FROM segs WHERE segment NOT IN (SELECT segment FROM hot)
),
d2 AS (
  SELECT doc_id, source,
         array_to_string(list(segment ORDER BY seg_idx), ' ') AS text
  FROM kept_segs GROUP BY doc_id, source
),
-- stage 3: exact dedup on the CLEANED text (min doc_id canonical)
canon AS (
  SELECT MIN(doc_id) AS keep_id FROM d2 GROUP BY md5(text)
),
d3 AS (
  SELECT * FROM d2 WHERE doc_id IN (SELECT keep_id FROM canon)
),
-- stage 4: logistic quality keep (grid-snapped linear score sign;
-- features + weights interpolated from the engine's single definition)
t4 AS ({_lr_features_sql("d3")}
),
d4 AS (
  SELECT d3.doc_id, d3.text, d3.source FROM t4 JOIN d3 USING (doc_id)
  WHERE FLOOR(({_lr_z_sql()}) * 1e6 + 0.5) >= 0
),
-- stage 5: temperature mix (alpha=0.5, keep half) over SURVIVORS
counts AS (SELECT source, COUNT(*) AS n_docs FROM d4 GROUP BY source),
stats AS (
  SELECT list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                     (a, x) -> a + x) AS Z,
         CAST(SUM(n_docs) AS BIGINT) AS N
  FROM counts
),
rates AS (
  SELECT source,
         CAST(FLOOR(LEAST(1.0,
               CAST(N AS DOUBLE) * 0.5 * sqrt(CAST(n_docs AS DOUBLE))
               / Z / n_docs) * 1e6 + 0.5) AS BIGINT) AS thresh
  FROM counts, stats
),
d5 AS (
  SELECT d.doc_id FROM d4 d JOIN rates r ON d.source = r.source
  WHERE (CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         % 1000000) < r.thresh
)"""


def _pipeline_oracle_funnel() -> str:
    return _pipeline_oracle() + """
SELECT * FROM (
  SELECT '0_raw' AS stage, CAST((SELECT COUNT(*) FROM d0) AS BIGINT) AS n_docs
  UNION ALL SELECT '1_blocklist', CAST((SELECT COUNT(*) FROM d1) AS BIGINT)
  UNION ALL SELECT '2_boilerplate', CAST((SELECT COUNT(*) FROM d2) AS BIGINT)
  UNION ALL SELECT '3_exact_dedup', CAST((SELECT COUNT(*) FROM d3) AS BIGINT)
  UNION ALL SELECT '4_quality', CAST((SELECT COUNT(*) FROM d4) AS BIGINT)
  UNION ALL SELECT '5_temperature_mix', CAST((SELECT COUNT(*) FROM d5) AS BIGINT)
) ORDER BY stage
"""


#: Stage frames persisted by `_pipeline_stage_frames`, tracked so long-lived
#: serving sessions can reclaim the cache — the curation twin of
#: `text/dedup.release_dedup_caches` (same contract, same swap-out trigger).
_PIPELINE_PERSISTED: list[DataFrame] = []


def release_pipeline_caches() -> int:
    """Unpersist every stage frame the cleaning pipeline has persisted;
    returns the number released. Call on corpus swap or at a bench/session
    family boundary."""
    n = 0
    for df in _PIPELINE_PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    _PIPELINE_PERSISTED.clear()
    return n


def _pipeline_stage_frames(spark: SparkSession, sf_dir: str) -> list:
    """The six stage frames of the cleaning pipeline, shared by the
    funnel report and the per-doc removal audit. Persists the two
    multi-consumer boundaries (see the funnel docstring), tracked for
    `release_pipeline_caches`."""
    from backend_big_data_spark.text.dedup import exact_dedup_fingerprints
    from backend_big_data_spark.text.filtering import blocklist_profile, quality_score_lr
    from backend_big_data_spark.text.mixing import temperature_mix
    from backend_big_data_spark.text.segments import strip_boilerplate

    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    bl = blocklist_profile(d0, max_ratio=0.05)
    d1 = d0.join(bl.filter(F.col("kept")).select("doc_id"), "doc_id", "semi")
    stripped = strip_boilerplate(d1, seg_len=4, max_df=2)
    # Materialization points: every later stage (and each report branch)
    # consumes d2/d4 — without a checkpoint the boilerplate-strip subtree
    # re-executes once per downstream branch (measured 13.8 s -> 3.4 s at
    # sf0.1 from these two persists). CacheManager dedupes by plan, so
    # re-invocations reuse the same entry instead of stacking copies.
    d2 = (
        stripped.select("doc_id", F.col("clean_text").alias("text"))
        .join(d0.select("doc_id", "source"), "doc_id")
        .persist()
    )
    _PIPELINE_PERSISTED.append(d2)
    canon = exact_dedup_fingerprints(d2).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    d3 = d2.join(canon, "doc_id", "semi")
    q = quality_score_lr(d3)
    d4 = d3.join(
        q.filter(F.col("keep")).select("doc_id"), "doc_id", "semi"
    ).persist()
    _PIPELINE_PERSISTED.append(d4)
    d5 = temperature_mix(d4, keep_frac=0.5)
    return [d0, d1, d2, d3, d4, d5]


@register("doc_cleaning_pipeline_funnel", oracle=_pipeline_oracle_funnel())
def doc_cleaning_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one declarative plan — blocklist
    density filter → cross-document boilerplate strip (frequencies
    computed within survivors) → exact dedup on the CLEANED text →
    logistic quality keep → temperature-weighted source rebalance — with
    a per-stage survivor count report (the funnel a pipeline dashboard
    shows). Each stage is the already-certified operator composed
    unchanged; Catalyst sees one DAG, so scans/exchanges are shared
    across stages instead of one job per stage. Stage semantics are
    data-dependent end-to-end (each stage sees the previous stage's
    output), which is exactly what the oracle replays."""
    stages = _pipeline_stage_frames(spark, sf_dir)
    names = ["0_raw", "1_blocklist", "2_boilerplate", "3_exact_dedup",
             "4_quality", "5_temperature_mix"]
    frames = [
        df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )
        for stage, df in zip(names, stages)
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("stage")
