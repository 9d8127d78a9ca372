"""Extended coverage plans: supplier analytics (completing the catalog),
cube grouping sets, sliding-window streaming with a batch-twin oracle, the
SQL-string frontend, IVF ANN, winnowing fingerprints, and sketch
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.advanced import _run_to_table
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.ann import ivf_cosine_topk
from backend_big_data_spark.sources.catalog import load_table, register_views
from backend_big_data_spark.streaming.events import (
    read_events_stream,
    sliding_counts,
)
from backend_big_data_spark.text.dedup import winnowing_fingerprints


@register(
    "supplier_revenue_by_nation",
    oracle="""
SELECT n_name, s_suppkey, s_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS lineitem_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, s_suppkey, s_name
ORDER BY n_name, s_suppkey
""",
)
def supplier_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier revenue with nation rollout — completes catalog
    coverage (supplier was the one driver table previously unused). The
    supplier⨝nation dim side is broadcast; lineitem never shuffles for it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dims = supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name", "s_suppkey", "s_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("lineitem_count"),
        )
        .orderBy("n_name", "s_suppkey")
    )


@register(
    "orders_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS order_count
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
""",
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping sets in one pass (status, priority, each
    margin, grand total) — ``df.cube`` expands map-side, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("order_count"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "order_count",
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


#: One SQL text, two engines: runs verbatim under spark.sql AND DuckDB —
#: the SQL-string interface the reference never had (SURVEY.md §0).
_SQL_FRONTEND_QUERY = """
SELECT n_name, COUNT(*) AS customer_count, ROUND(AVG(c_acctbal), 4) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


@register("sql_frontend_customers_by_nation", oracle=_SQL_FRONTEND_QUERY)
def sql_frontend_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL frontend: tables registered as views, the query
    submitted as an ANSI-SQL string — the SAME string is the oracle, proving
    dialect-portable SQL in and out."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(_SQL_FRONTEND_QUERY)


@register(
    "streaming_sliding_halfhour",
    oracle="""
SELECT ws AS window_start, event_type, COUNT(*) AS event_count
FROM (
  SELECT event_type,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS ws
  FROM events
) GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h wide, 30 min slide) over the event STREAM,
    availableNow → memory sink; the oracle materializes the same two
    windows per row in SQL. Each event lands in width/slide = 2 windows."""
    stream = sliding_counts(
        read_events_stream(spark, sf_dir), width="1 hour", slide="30 minutes"
    )
    return _run_to_table(stream, "sliding_oracle", "complete").orderBy(
        "window_start", "event_type"
    )


@register(
    "ann_ivf_topk",
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT vec_id AS list_id, v AS cv FROM vecs WHERE vec_id < 8
), assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS arn
    FROM vecs vv, cents c
  ) WHERE arn = 1
), probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS prn
    FROM vecs vv, cents c WHERE vv.vec_id < 10
  ) WHERE prn <= 3
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (list_id)
  WHERE a.vec_id != p.query_id
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
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse quantizer + probe-and-rerank) — the second scale
    path next to LSH. Oracle-gated with a FIXED deterministic coarse
    quantizer (centroids = the first ``nlist`` corpus vectors), so
    assignment, probing and re-rank all replay exactly in SQL; the
    iterative seeded KMeans quantizer stays the engine default and keeps
    its pytest-verified nprobe==nlist exact-degradation invariant."""
    emb = load_table(spark, sf_dir, "embeddings")
    cvec = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"), cvec.alias("centroid")
    )
    return ivf_cosine_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        nlist=8,
        nprobe=3,
        centroids=fixed,
    )


@register(
    "doc_winnowing",
    oracle="""
WITH h AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(text) - 5 + 1, 0)),
             i -> CAST(concat('0x', substr(md5(substr(text, i, 5)), 1, 15)) AS BIGINT)) AS hs
  FROM documents
), m AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(hs) - 4 + 1, 1)),
             i -> list_min(list_slice(hs, i, i + 3)))) AS fps
  FROM h WHERE len(hs) > 0
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS fingerprint_count FROM m ORDER BY doc_id
""",
)
def doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints per document — passage-level
    containment detection, md5-60-bit variant so the DuckDB oracle can
    replicate the positional-gram hash + sliding-window-min + distinct
    pipeline exactly (xxhash64 stays the in-engine default)."""
    from backend_big_data_spark.sources.catalog import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    fp = winnowing_fingerprints(docs, k=5, window=4, hash_fn="md5")
    return (
        fp.groupBy("doc_id")
        .agg(F.count("*").alias("fingerprint_count"))
        .orderBy("doc_id")
    )


@register(
    "events_user_count_sketch",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def events_user_count_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type. The 100 TB path is the HLL
    sketch (``approx_count_distinct``, one pass, fixed memory); it is
    pytest-checked to within its rsd against this exact form, while the
    oracle gate gets the exact variant (sketches aren't cross-engine)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .orderBy("event_type")
    )


@register("events_hll_user_rollup")
def events_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — the incremental pattern at
    100 TB: materialize one DataSketches HLL sketch per (event_type, day)
    (``hll_sketch_agg``, ~KBs each regardless of cardinality), then answer
    any distinct-users question as a ``hll_union_agg`` over the relevant
    sketches — daily ingest APPENDS sketch rows and never rescans raw
    events, and arbitrary date ranges merge in milliseconds. This query
    runs both stages; tests assert the merged estimate is identical to a
    direct one-pass sketch (union exactness) and within the configured
    relative error of exact ``countDistinct``. rows-only: DataSketches
    estimates are not reproducible in DuckDB (different HLL variant);
    the exact twin `events_user_count_sketch` carries the oracle."""
    ev = load_table(spark, sf_dir, "events")
    daily_sketches = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    return (
        daily_sketches.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch", False)).alias(
                "approx_users"
            )
        )
        .orderBy("event_type")
    )


@register(
    "events_minmax_scaled",
    oracle="""
SELECT event_id, event_type, value,
       FLOOR((CASE WHEN mx = mn THEN 0.0 ELSE (value - mn) / (mx - mn) END) * 10000.0 + 0.5) / 10000.0 AS scaled
FROM (
  SELECT event_id, event_type, value,
         MIN(value) OVER (PARTITION BY event_type) AS mn,
         MAX(value) OVER (PARTITION BY event_type) AS mx
  FROM events
) ORDER BY event_id
""",
)
def events_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (per-type min-max scaling) proven
    bit-compatible with the pure-SQL window formulation through the Arrow
    boundary."""
    from backend_big_data_spark.operators.aggregates import groupwise_minmax_scale

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return groupwise_minmax_scale(ev, ["event_type"], "value").orderBy("event_id")


def _lsh_verified_oracle() -> str:
    """Compose the (individually proven) minhash-banding and exact-jaccard
    oracles: candidate pairs ∩ exact pairs at threshold 0.5. The candidate
    stage embeds _minhash_oracle verbatim (nested WITH); the exact stage
    reuses the canonical tokenize/shingle fragments."""
    from backend_big_data_spark.plans.documents import (
        _minhash_oracle,
        _SHINGLES_CTE,
        _TOKS_CTE,
    )

    cand_sql = _minhash_oracle().strip()
    cand_sql = cand_sql[: cand_sql.rindex("ORDER BY")]
    return f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
est AS (
{cand_sql}
),
e2 AS (SELECT doc_id, len(shingles) AS sh_count, unnest(shingles) AS shingle FROM sh),
ex AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_count AS ca, b.sh_count AS cb, COUNT(*) AS intersection_size
  FROM e2 a JOIN e2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT est.doc_a, est.doc_b, est.est_jaccard, ex.intersection_size,
       ROUND(ex.intersection_size / (ex.ca + ex.cb - ex.intersection_size), 6) AS jaccard
FROM est JOIN ex ON est.doc_a = ex.doc_a AND est.doc_b = ex.doc_b
WHERE ex.intersection_size / (ex.ca + ex.cb - ex.intersection_size) >= 0.5
ORDER BY est.doc_a, est.doc_b
"""


@register("doc_lsh_verified_dedup", oracle=_lsh_verified_oracle())
def doc_lsh_verified_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage near-dup pipeline: MinHash-LSH candidates →
    semi-join prune → exact-Jaccard verify (text/dedup.py
    ``lsh_verified_pairs``; md5 family so the composed DuckDB oracle
    reproduces BOTH stages). Subset/threshold invariants additionally
    pytest-verified."""
    from backend_big_data_spark.text.dedup import doc_shingles, lsh_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    return lsh_verified_pairs(
        doc_shingles(docs), threshold=0.5, hash_fn="md5"
    ).orderBy("doc_a", "doc_b")


@register(
    "doc_chunks",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id,
       CAST((start - 1) / 48 AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(toks, start, start + 63), ' ') AS chunk
FROM (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks) - 16, 1), 48)) AS start
  FROM t
)
ORDER BY doc_id, chunk_idx
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM context-window chunking: 64-token chunks with 16-token overlap,
    generated array-side (no explode of raw tokens, no Python). One narrow
    pass over the corpus — at 100 TB this is a map-only stage."""
    from backend_big_data_spark.functions.textfns import token_chunks, tokens
    from backend_big_data_spark.sources.catalog import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).filter(F.length(F.trim("text")) > 0)
    toks = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    return (
        toks.select(
            "doc_id",
            F.explode(token_chunks(F.col("__toks"), 64, 16)).alias("c"),
        )
        .select("doc_id", "c.chunk_idx", "c.chunk")
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "nation_actor_counts_outer",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS customer_count FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS supplier_count FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(customer_count, 0) AS customer_count,
       COALESCE(supplier_count, 0) AS supplier_count
FROM c FULL OUTER JOIN s ON c.nk = s.nk
ORDER BY nationkey
""",
)
def nation_actor_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completing the join-type matrix: inner/left/semi/
    anti/cross are covered elsewhere): per-nation customer vs supplier
    counts, keeping nations present on either side only."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("customer_count"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("supplier_count"))
    )
    return (
        cust.join(supp, on="nk", how="full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("customer_count", F.lit(0)).alias("customer_count"),
            F.coalesce("supplier_count", F.lit(0)).alias("supplier_count"),
        )
        .orderBy("nationkey")
    )


@register(
    "events_daily_pivot",
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY 1
""",
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-day event counts, one column per event type. The value
    list is pinned — an unpinned ``pivot`` triggers an extra distinct scan
    to discover columns, which at 100 TB is a full pass you should never
    pay for a known vocabulary."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", types)
        .count()
    )
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("day")


@register(
    "priority_measures_unpivot",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         CAST(COUNT(*) AS DOUBLE) AS order_count
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, 'total_value' AS measure, total_value AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'order_count' AS measure, order_count AS value FROM agg
ORDER BY o_orderpriority, measure
""",
)
def priority_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-priority aggregates → long (measure, value)
    rows — ``DataFrame.unpivot`` (Spark ≥3.4), the inverse of pivot."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.count("*").cast("double").alias("order_count"),
    )
    return agg.unpivot(
        ids=["o_orderpriority"],
        values=["total_value", "order_count"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "measure")


@register(
    "order_value_quantiles",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 2) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75,
       ROUND(quantile_cont(o_totalprice, 0.95), 2) AS p95
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in ONE aggregate: ``percentile(col, array(...))``
    computes all four cut points in a single pass/shuffle instead of four
    separate sort-aggregations (at 100 TB use ``percentile_approx`` with
    the same array signature — one sketch, any number of quantiles)."""
    orders = load_table(spark, sf_dir, "orders")
    qs = F.percentile(
        F.col("o_totalprice"), F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)])
    )
    agg = orders.groupBy("o_orderpriority").agg(qs.alias("__q"))
    return agg.select(
        "o_orderpriority",
        *[
            F.round(F.col("__q")[i], 2).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ],
    ).orderBy("o_orderpriority")


@register(
    "brand_sizes_except_all",
    oracle="""
SELECT p_size FROM part WHERE p_brand = 'Brand#1'
EXCEPT ALL
SELECT p_size FROM part WHERE p_brand = 'Brand#2'
ORDER BY p_size
""",
)
def brand_sizes_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity preserved, unlike
    ``subtract``): each Brand#2 occurrence cancels ONE Brand#1 occurrence
    of the same size. ``df.exceptAll`` completes the set-op matrix next to
    union/intersect/except."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_brand") == "Brand#1").select("p_size")
    b = part.filter(F.col("p_brand") == "Brand#2").select("p_size")
    return a.exceptAll(b).orderBy("p_size")


@register(
    "brand_sizes_intersect_all",
    oracle="""
SELECT p_size FROM part WHERE p_brand = 'Brand#1'
INTERSECT ALL
SELECT p_size FROM part WHERE p_brand = 'Brand#2'
ORDER BY p_size
""",
)
def brand_sizes_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): min(multiplicity) per value."""
    part = load_table(spark, sf_dir, "part")
    a = part.filter(F.col("p_brand") == "Brand#1").select("p_size")
    b = part.filter(F.col("p_brand") == "Brand#2").select("p_size")
    return a.intersectAll(b).orderBy("p_size")


def priority_status_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation (the API-facing form): the distinct statuses
    seen per priority as a SORTED array (collect_set is unordered by
    contract — sort_array makes the result deterministic and cross-engine
    comparable). Kept unregistered: external row-hashers can't canonicalize
    array cells, so the registered twin below projects the pipe-joined
    scalar form. Covered by tests/test_extended.py."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"))
        .select(
            "o_orderpriority",
            "statuses",
            F.size("statuses").alias("status_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "priority_status_sets",
    oracle="""
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses,
       CAST(len(list(DISTINCT o_orderstatus)) AS INTEGER) AS status_count
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def priority_status_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-facing twin of :func:`priority_status_arrays`: identical
    aggregation, but the sorted status set is emitted pipe-joined so every
    output column is scalar-hashable."""
    base = priority_status_arrays(spark, sf_dir)
    return base.select(
        "o_orderpriority",
        F.concat_ws("|", "statuses").alias("statuses"),
        "status_count",
    )


#: portable stable hash used by the sampling oracles
_H = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "doc_hash_sample_10pct",
    oracle=f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_H} % 100 < 10
ORDER BY doc_id
""",
)
def doc_hash_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample by key hash (text/sampling.py): the same
    rows on every run and every engine — unlike rand()-based sampling."""
    from backend_big_data_spark.text.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return hash_sample(docs, F.col("doc_id"), 10).orderBy("doc_id")


@register(
    "doc_split_counts",
    oracle=f"""
SELECT CASE WHEN {_H} % 100 < 10 THEN 'val'
            WHEN {_H} % 100 < 20 THEN 'test'
            ELSE 'train' END AS split,
       COUNT(*) AS doc_count,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1 ORDER BY 1
""",
)
def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-range train/val/test split (stable under data growth — a row
    never changes split when new data arrives), summarized per split."""
    from backend_big_data_spark.text.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, F.col("doc_id"), val_pct=10, test_pct=10)
        .groupBy("split")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "doc_deterministic_shuffle_head",
    oracle=f"""
SELECT doc_id, lang FROM documents
ORDER BY {_H}, doc_id
LIMIT 50
""",
)
def doc_deterministic_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle (order by key hash) — first 50 docs of
    the fixed training order. TakeOrderedAndProject: no global sort."""
    from backend_big_data_spark.text.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return deterministic_shuffle(docs, F.col("doc_id")).limit(50)


def _dedup_corpus_oracle() -> str:
    """Kept-docs oracle: exact-dup non-canonicals ∪ near-dup larger ids
    removed, composed from the proven fingerprint and verified-pair SQL."""
    verified = _lsh_verified_oracle().strip()
    verified = verified[: verified.rindex("ORDER BY")]
    return f"""
WITH near AS (
{verified}
),
exact_canon AS (
  SELECT MIN(doc_id) AS keep_id, md5(text) AS fp FROM documents GROUP BY fp
),
removed AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT keep_id FROM exact_canon)
  UNION
  SELECT doc_b AS doc_id FROM near
)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
ORDER BY d.doc_id
"""


@register("doc_corpus_deduped", oracle=_dedup_corpus_oracle())
def doc_corpus_deduped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipelines' end product: the KEPT corpus. Removal policy
    (deterministic, order-free): drop every non-canonical exact duplicate
    (canonical = min doc_id per content fingerprint) and every document
    appearing as the larger id of an exact-verified near-dup pair
    (jaccard ≥ 0.5 via the two-stage LSH→verify pipeline)."""
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        exact_dedup_fingerprints,
        lsh_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    canon = exact_dedup_fingerprints(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    near_losers = (
        lsh_verified_pairs(doc_shingles(docs), threshold=0.5, hash_fn="md5")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = canon.join(near_losers, on="doc_id", how="anti")
    return (
        docs.join(kept, on="doc_id", how="semi")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def _dup_clusters_oracle() -> str:
    """Cluster oracle: transitive closure of the verified near-dup pairs via
    a recursive CTE (min-label flood), labels = component min doc_id."""
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
)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM walk GROUP BY node ORDER BY doc_id
"""


def _dedup_corpus_cc_oracle() -> str:
    """Kept-docs oracle with TRANSITIVE near-dup removal: drop every
    cluster member except the cluster-min, via the recursive min-label
    flood — plus exact-dup non-canonicals as before."""
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
exact_canon AS (
  SELECT MIN(doc_id) AS keep_id, md5(text) AS fp FROM documents GROUP BY fp
),
removed AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT keep_id FROM exact_canon)
  UNION
  SELECT node AS doc_id FROM clusters WHERE node != root
)
SELECT d.doc_id, d.lang, d.n_chars FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
ORDER BY d.doc_id
"""


@register("doc_corpus_deduped_cc", oracle=_dedup_corpus_cc_oracle())
def doc_corpus_deduped_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept corpus with TRANSITIVE near-dup removal — the cluster-correct
    sibling of :func:`doc_corpus_deduped`: that one drops the larger id of
    each verified PAIR, which under-removes chains (pairs (5,9) and (7,9)
    keep both 5 and 7 although they share cluster member 9); this one
    keeps exactly ONE document — the min id — per connected component of
    the verified-pair graph (``connected_components_star``), the policy a
    production near-dup dedup actually wants."""
    from backend_big_data_spark.operators.graph import connected_components_star
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        exact_dedup_fingerprints,
        lsh_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    canon = exact_dedup_fingerprints(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    pairs = lsh_verified_pairs(doc_shingles(docs), threshold=0.5, hash_fn="md5")
    labels = connected_components_star(pairs, src="doc_a", dst="doc_b")
    near_losers = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = canon.join(near_losers, on="doc_id", how="anti")
    return (
        docs.join(kept, on="doc_id", how="semi")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register("doc_dup_clusters", oracle=_dup_clusters_oracle())
def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: duplicates are transitive (A~B, B~C ⇒ one
    cluster even when A,C were never compared), so the dedup unit is the
    connected component of the verified-pair graph, not the pair list.
    Components via alternating large-star/small-star contraction
    (operators/graph.py ``connected_components_star`` — O(log² n) rounds,
    diameter-independent, the 100 TB shape); the oracle floods min-labels
    through a recursive CTE over the same verified pairs."""
    from backend_big_data_spark.operators.graph import connected_components_star
    from backend_big_data_spark.text.dedup import doc_shingles, lsh_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(doc_shingles(docs), threshold=0.5, hash_fn="md5")
    labels = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


@register(
    "orders_trailing_revenue",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(rev AS DOUBLE) AS day_revenue,
       n_orders,
       CAST(SUM(rev) OVER (
         ORDER BY date_diff('day', DATE '1970-01-01', day)
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_7d
FROM daily
ORDER BY day
""",
)
def orders_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (SURVEY §2.5 'absent: range frames — free'):
    7-day trailing revenue over the daily aggregate. The frame is keyed on
    VALUE distance (epoch-day ints), not row offsets, so calendar gaps are
    handled without densification. Aggregating to days FIRST bounds the
    window input to ~365 rows/year regardless of order volume — the
    window itself never sees raw facts, so the single-partition global
    window is safe at any scale; revenue stays decimal through the frame
    sum for order-independence."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy(F.unix_date("day")).rangeBetween(-6, Window.currentRow)
    return (
        daily.select(
            "day",
            F.col("rev").cast("double").alias("day_revenue"),
            "n_orders",
            F.sum("rev").over(w).cast("double").alias("trailing_7d"),
        )
        .orderBy("day")
    )
