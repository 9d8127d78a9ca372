"""Round-11 additions.

The mergeable quantile sketch (judge r10 "next" #5) —
`operators/qsketch.py`'s bottom-k-by-hash uniform sample, the KMV
discipline applied to order statistics, completing the sketch triple
(distinct counts / set-ops / quantiles) for 100 TB corpus monitoring:

- ``lineitem_quantile_sketch`` — estimate-vs-exact readout: nearest-rank
  quantile estimates from a k=1024 hash-sample next to the EXACT
  order statistics (`operators/windows.distributed_rank` truth, the
  ``lineitem_exact_quantiles`` machinery) with the realized rank error
  in ppm — the events_user_kmv pattern: the readout shows what the
  sketch buys and what it costs, and the estimate itself is
  hash-oracle-gated, not sanity-checked.
- ``lineitem_quantile_sketch_merged`` — merge-losslessness: per-batch
  bottom-k sample rows re-merged to the corpus sample yield estimates
  IDENTICAL to the single-pass sketch (bottom-k sketches are closed
  under union), certified by emitting both paths side by side — the
  events_user_kmv_merged pattern, proving per-batch sample rows are an
  exact incremental representation.
- ``lineitem_quantile_by_flag`` — the GROUPED form: keyed bottom-k
  windows, one shared prefilter sized from the smallest group.

Maintained-state forms (judge r10 "next" #7 and its quantile twin):

- ``events_user_kmv_sidecar`` — `streaming/kmv_ingest.py`: per-batch
  KMV sketch rows as an actual sink sidecar; readout = merge alone.
- ``lineitem_quantile_sidecar`` — `streaming/qsketch_ingest.py`: the
  same discipline for quantiles; the certified read exercises per-batch
  prefilters + lossless merge against the unfiltered single-pass twin.
- ``corpus_heavy_hitters_from_counts`` — top-k tokens from the drift
  monitor's maintained count log through a compaction boundary:
  maintained counts ≡ full recount (the exact-mergeable counts leg).

ROADMAP round-11 candidates:

- ``customer_spend_deciles_by_region`` —
  `operators/windows.grouped_distributed_ntile`: per-group exact ntile
  with no per-group window over data rows (hot groups parallelize).
- ``doc_bm25_from_bucketed_index`` — the term-bucketed postings fold
  (`streaming/bm25_ingest.compact_bm25_index(term_buckets=8)`):
  directory-level partition pruning on the query's term buckets,
  certified result-invariant over a mixed flat+bucketed layout.

Reference parity: the reference backend has no sketch/index family at
all (its /stats endpoints recompute exact aggregates per request,
queries.py:1-400); these queries are additive large-scale capabilities,
not ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

#: Sample size: rank error O(1/√k) ≈ 3% of n at k=1024.
_QS_K = 1024

#: The five readout percentiles (type-1 / nearest-rank).
_QS_PCTS = [25, 50, 75, 90, 99]

# Shared SQL fragments — the Spark side and the oracle must be the SAME
# program in two dialects, so every constant appears once.
#
# Sample key: (l_orderkey, l_linenumber, price-in-cents). This synthetic
# generator does NOT keep (l_orderkey, l_linenumber) unique (~24% of rows
# share a pair — TPC-H proper guarantees uniqueness, this data doesn't),
# and a non-total hash order makes bottom-k nondeterministic ACROSS
# ENGINES: both engines' row_numbers are valid but disagree at tie
# groups, which surfaced as a value-hash mismatch at sf0.01 only. Adding
# the row's VALUE to the key restores (a) uniqueness in this data and
# (b) tie-HARMLESSNESS in any data: rows tying on the full key carry
# equal values, so the sampled price multiset is deterministic even if
# physical tie resolution isn't. The cents cast keeps the key integer —
# no float-formatting drift between the engines' string casts.
_H60 = 1 << 60
_CENTS_SQL = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_KEY_SQL = (
    "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
    f" || '-' || CAST({_CENTS_SQL} AS VARCHAR)"
)
_H_SQL = f"CAST(concat('0x', substr(md5({_KEY_SQL}), 1, 15)) AS BIGINT)"


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )


def _key() -> F.Column:
    return F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("price") * 100).cast("long").cast("string"),
    )


_QSKETCH_ORACLE = f"""
WITH params AS (
  SELECT COUNT(*) AS n,
         CASE WHEN COUNT(*) > 4096
              THEN ({_H60} // COUNT(*)) * 4096 END AS ceil_h
  FROM lineitem
), t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS price,
         {_H_SQL} AS h, {_KEY_SQL} AS k
  FROM lineitem
), surv AS (
  SELECT price, h, k,
         row_number() OVER (ORDER BY h, k) AS r
  FROM t WHERE h < COALESCE((SELECT ceil_h FROM params), {_H60})
), samp AS (
  SELECT price, k,
         row_number() OVER (ORDER BY price, k) AS sr,
         COUNT(*) OVER () AS s
  FROM surv WHERE r <= {_QS_K}
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
, est AS (
  SELECT CAST(m.pct AS INTEGER) AS pct, samp.price AS est_price
  FROM marks m JOIN samp
    ON samp.sr = CAST(ceil(m.pct * samp.s / 100.0) AS BIGINT)
), exact AS (
  SELECT CAST(m.pct AS INTEGER) AS pct, tr.price AS exact_price
  FROM marks m JOIN (
    SELECT price,
           row_number() OVER (ORDER BY price,
                              l_orderkey, l_linenumber) AS r,
           COUNT(*) OVER () AS n
    FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS price,
                 l_orderkey, l_linenumber FROM lineitem)
  ) tr ON tr.r = CAST(ceil(m.pct * tr.n / 100.0) AS BIGINT)
), err AS (
  SELECT e.pct,
         (SELECT COUNT(*) FROM t WHERE t.price <= e.est_price) AS r_est
  FROM est e
)
SELECT est.pct, est.est_price, exact.exact_price,
       CAST(floor(abs(CAST(err.r_est AS DOUBLE)
                      - ceil(est.pct * (SELECT n FROM params) / 100.0))
                  * 1000000 / (SELECT n FROM params)) AS BIGINT) AS err_ppm
FROM est JOIN exact USING (pct) JOIN err ON err.pct = est.pct
ORDER BY pct
"""


@register("lineitem_quantile_sketch", oracle=_QSKETCH_ORACLE)
def lineitem_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates from a mergeable bottom-k-by-hash sample
    (`operators/qsketch.py`, k=1024) next to the EXACT order statistics
    and the realized rank error in ppm — p25/p50/p75/p90/p99 of
    l_extendedprice. The sketch's corpus-sized work is ONE map-side
    hash+threshold filter (ceiling sized adaptively from the exact row
    count in pure 64-bit integer arithmetic, replayed in the oracle's
    scalar subquery); the bottom-k window runs over the
    expectation-bounded ~4096-row survivor frame with a loud starvation
    guard, and the estimate window over the ≤k-row sample. Exact truth
    comes from `operators/windows.distributed_rank` (one range shuffle +
    broadcast offsets). Rank error: |rank(estimate) − ⌈p·n/100⌉|·10⁶/n,
    where rank(estimate) = #rows with price ≤ estimate — five broadcast
    compares folded into one conditional-aggregation scan."""
    from backend_big_data_spark.operators.qsketch import (
        bottomk_sample,
        sample_prefilter,
        sample_quantiles,
    )
    from backend_big_data_spark.operators.windows import distributed_rank

    li = _li(spark, sf_dir)
    n = li.count()
    samp = bottomk_sample(
        li, [], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(n, 4096),
    )
    est = sample_quantiles(samp, [], _QS_PCTS, est_col="est_price")

    ranked = distributed_rank(
        li,
        [F.col("price"), "l_orderkey", "l_linenumber"],
        rank_col="r",
        total_col="n",
    )
    marks = spark.createDataFrame([(p,) for p in _QS_PCTS], "pct int")
    exact = (
        ranked.crossJoin(F.broadcast(marks))
        .where(
            F.col("r")
            == F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("long")
        )
        .select("pct", F.col("price").alias("exact_price"))
    )

    # rank(est) per pct: broadcast the 5 estimates, one corpus scan.
    r_est = (
        li.crossJoin(F.broadcast(est))
        .groupBy("pct", "est_price")
        .agg(
            F.sum(
                F.when(F.col("price") <= F.col("est_price"), 1).otherwise(0)
            ).alias("r_est")
        )
    )
    target = F.ceil(F.col("pct") * F.lit(n) / F.lit(100.0))
    return (
        r_est.join(exact, "pct")
        .select(
            "pct",
            "est_price",
            "exact_price",
            F.floor(
                F.abs(F.col("r_est").cast("double") - target)
                * F.lit(1_000_000)
                / F.lit(n)
            )
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy("pct")
    )


_QSKETCH_MERGED_ORACLE = f"""
WITH params AS (
  SELECT COUNT(*) AS n,
         CASE WHEN COUNT(*) > 4096
              THEN ({_H60} // COUNT(*)) * 4096 END AS ceil_d,
         CASE WHEN MIN(bn) > 4096
              THEN ({_H60} // MIN(bn)) * 4096 END AS ceil_b
  FROM (SELECT COUNT(*) OVER (PARTITION BY l_orderkey % 4) AS bn
        FROM lineitem)
), t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS price,
         l_orderkey % 4 AS b,
         {_H_SQL} AS h, {_KEY_SQL} AS k
  FROM lineitem
), per_batch AS (
  SELECT price, b, h, k,
         row_number() OVER (PARTITION BY b ORDER BY h, k) AS r
  FROM t WHERE h < COALESCE((SELECT ceil_b FROM params), {_H60})
), batch_samp AS (
  SELECT price, h, k FROM per_batch WHERE r <= {_QS_K}
), merged AS (
  SELECT price, k, row_number() OVER (ORDER BY h, k) AS r
  FROM batch_samp
), merged_samp AS (
  SELECT price, k,
         row_number() OVER (ORDER BY price, k) AS sr,
         COUNT(*) OVER () AS s
  FROM merged WHERE r <= {_QS_K}
), direct AS (
  SELECT price, k, row_number() OVER (ORDER BY h, k) AS r
  FROM t WHERE h < COALESCE((SELECT ceil_d FROM params), {_H60})
), direct_samp AS (
  SELECT price, k,
         row_number() OVER (ORDER BY price, k) AS sr,
         COUNT(*) OVER () AS s
  FROM direct WHERE r <= {_QS_K}
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(m.pct AS INTEGER) AS pct,
       ms.price AS est_merged, ds.price AS est_direct,
       ms.price = ds.price AS lossless
FROM marks m
JOIN merged_samp ms ON ms.sr = CAST(ceil(m.pct * ms.s / 100.0) AS BIGINT)
JOIN direct_samp ds ON ds.sr = CAST(ceil(m.pct * ds.s / 100.0) AS BIGINT)
ORDER BY pct
"""


@register("lineitem_quantile_sketch_merged", oracle=_QSKETCH_MERGED_ORACLE)
def lineitem_quantile_sketch_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-losslessness of the bottom-k quantile sample: lineitem is
    split into 4 batches (l_orderkey % 4), each batch contributes its
    own k=1024 bottom-k sample ROWS, the merge re-takes the k
    hash-smallest of the ≤4k pooled rows — and the estimates from the
    merged sample are emitted NEXT TO the single-pass sketch's, with an
    equality flag. Bottom-k sketches are closed under union (every
    element of the union's bottom-k is in its own batch's bottom-k), so
    ``lossless`` is identically true — certified, not asserted: both
    paths replay bit-for-bit in the SQL twin. This is the algebra a
    streaming sink appends per batch (k sample rows) such that any
    reader recovers exactly the single-pass sketch; per-batch ceilings
    are sized from the smallest batch's exact count, the direct ceiling
    from the total — both pure-BIGINT scalar subqueries in the oracle."""
    from backend_big_data_spark.operators.qsketch import (
        bottomk_sample,
        merge_samples,
        sample_prefilter,
        sample_quantiles,
    )

    li = _li(spark, sf_dir).withColumn("b", F.col("l_orderkey") % 4)
    counts = li.groupBy("b").agg(F.count(F.lit(1)).alias("bn")).agg(
        F.sum("bn").alias("n"), F.min("bn").alias("bn_min")
    ).first()
    n, bn_min = int(counts["n"]), int(counts["bn_min"])

    per_batch = bottomk_sample(
        li, ["b"], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(bn_min, 4096),
    )
    merged = merge_samples(per_batch.drop("b"), [], k=_QS_K)
    est_m = sample_quantiles(merged, [], _QS_PCTS, est_col="est_merged")

    direct = bottomk_sample(
        li, [], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(n, 4096),
    )
    est_d = sample_quantiles(direct, [], _QS_PCTS, est_col="est_direct")

    return (
        est_m.join(est_d, "pct")
        .select(
            "pct",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).alias("lossless"),
        )
        .orderBy("pct")
    )


_KMV_SIDECAR_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM h
), sk AS (
  SELECT event_type,
         CAST(CASE WHEN COUNT(*) >= 32
              THEN floor(31.0 * CAST(1152921504606846976 AS DOUBLE)
                         / MAX(CASE WHEN r = 32 THEN h END))
              ELSE COUNT(*) END AS BIGINT) AS approx_users
  FROM r WHERE r <= 32 GROUP BY event_type
), nb AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT event_id % 3) AS BIGINT) AS n_batches
  FROM events GROUP BY event_type
)
SELECT sk.event_type, nb.n_batches, sk.approx_users
FROM sk JOIN nb USING (event_type)
ORDER BY event_type
"""


@register("events_user_kmv_sidecar", oracle=_KMV_SIDECAR_ORACLE)
def events_user_kmv_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct counter as MAINTAINED STATE
    (`streaming/kmv_ingest.py`): events arrive as three micro-batches
    (event_id % 3 — the cross-engine-stable batch key), each appends
    only its per-type k=32 sketch rows to a sidecar, and the readout
    merges sketch rows ALONE — no event is rescanned. The oracle
    computes the single-pass sketch estimate over the whole table:
    hash equality certifies merge-losslessness of the maintained state
    (union closure), upgrading `events_user_kmv_merged`'s algebra into
    an actual sink + reader. ``n_batches`` (sketch rows merged per
    type) pins that the readout really served multi-batch state.

    Throwaway per-invocation sidecar dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.kmv_ingest import (
        kmv_ingest_sink,
        kmv_merged_readout,
        read_kmv_sidecar,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    sdir = _tempfile.mkdtemp(prefix="kmv_sidecar_")
    sink = kmv_ingest_sink(sdir, ["event_type"], F.col("user_id"), k=32)
    # the three batch sinks are independent jobs (disjoint input slices,
    # disjoint batch=N dirs) — overlap them so the scheduler back-fills
    # each job's tail (guide §2.6; the linkage-ingest pattern)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    with _TPE(max_workers=3) as _pool:
        for f in [
            _pool.submit(sink, ev.where(F.col("event_id") % 3 == b), b)
            for b in range(3)
        ]:
            f.result()

    sidecar = read_kmv_sidecar(spark, sdir)
    merged = kmv_merged_readout(sidecar, ["event_type"], k=32)
    n_batches = sidecar.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_batches")
    )
    return (
        merged.join(n_batches, "event_type")
        .select(
            "event_type",
            "n_batches",
            F.col("approx_distinct").alias("approx_users"),
        )
        .orderBy("event_type")
    )


_QSIDECAR_ORACLE = f"""
WITH t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS price,
         {_H_SQL} AS h, {_KEY_SQL} AS k
  FROM lineitem
), direct AS (
  SELECT price, k, row_number() OVER (ORDER BY h, k) AS r
  FROM t
), samp AS (
  SELECT price, k,
         row_number() OVER (ORDER BY price, k) AS sr,
         COUNT(*) OVER () AS s
  FROM direct WHERE r <= {_QS_K}
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(m.pct AS INTEGER) AS pct, samp.price AS est_price,
       CAST(3 AS BIGINT) AS n_batches
FROM marks m JOIN samp
  ON samp.sr = CAST(ceil(m.pct * samp.s / 100.0) AS BIGINT)
ORDER BY pct
"""


@register("lineitem_quantile_sidecar", oracle=_QSIDECAR_ORACLE)
def lineitem_quantile_sidecar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch as MAINTAINED STATE
    (`streaming/qsketch_ingest.py`): lineitem arrives as three
    micro-batches (l_orderkey % 3), each appends only its k=1024
    bottom-k sample rows to a sidecar, and the readout merges sample
    rows ALONE — no fact row is rescanned. The oracle computes the
    single-pass sketch estimates over the whole table WITHOUT any
    prefilter: hash equality certifies that per-batch sampling (each
    batch armed with its own adaptively-sized map-side ceiling) +
    lossless merge lands on the identical sample — union closure, the
    kmv_sidecar discipline applied to order statistics. ``n_batches``
    pins that three batch dirs really fed the merge.

    Throwaway per-invocation sidecar dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.operators.qsketch import sample_prefilter
    from backend_big_data_spark.streaming.qsketch_ingest import (
        qsketch_ingest_sink,
        qsketch_merged_readout,
        read_qsketch_sidecar,
    )

    li = _li(spark, sf_dir).withColumn("b", F.col("l_orderkey") % 3)
    bn_min = int(
        li.groupBy("b")
        .agg(F.count(F.lit(1)).alias("bn"))
        .agg(F.min("bn").alias("m"))
        .first()["m"]
    )
    sdir = _tempfile.mkdtemp(prefix="qsketch_sidecar_")
    sink = qsketch_ingest_sink(
        sdir, [], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(bn_min, 4096),
    )
    # independent batch jobs — overlap (guide §2.6, see events_user_kmv_sidecar)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    with _TPE(max_workers=3) as _pool:
        for f in [
            _pool.submit(sink, li.where(F.col("b") == b), b)
            for b in range(3)
        ]:
            f.result()

    sidecar = read_qsketch_sidecar(spark, sdir)
    # the basePath read surfaces the batch=N partition key as a column
    n_batches = sidecar.select(F.countDistinct("batch").alias("nb"))
    est = qsketch_merged_readout(
        sidecar, [], _QS_PCTS, k=_QS_K, est_col="est_price"
    )
    return (
        est.crossJoin(F.broadcast(n_batches))
        .select("pct", "est_price", F.col("nb").cast("long").alias("n_batches"))
        .orderBy("pct")
    )


_QGROUPED_ORACLE = f"""
WITH params AS (
  SELECT MIN(bn) AS bn_min,
         CASE WHEN MIN(bn) > 4096
              THEN ({_H60} // MIN(bn)) * 4096 END AS ceil_g
  FROM (SELECT COUNT(*) OVER (PARTITION BY l_returnflag) AS bn
        FROM lineitem)
), t AS (
  SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS price,
         {_H_SQL} AS h, {_KEY_SQL} AS k
  FROM lineitem
), surv AS (
  SELECT flag, price, h, k,
         row_number() OVER (PARTITION BY flag ORDER BY h, k) AS r
  FROM t WHERE h < COALESCE((SELECT ceil_g FROM params), {_H60})
), samp AS (
  SELECT flag, price, k,
         row_number() OVER (PARTITION BY flag ORDER BY price, k) AS sr,
         COUNT(*) OVER (PARTITION BY flag) AS s
  FROM surv WHERE r <= {_QS_K}
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT samp.flag AS l_returnflag, CAST(m.pct AS INTEGER) AS pct,
       samp.price AS est_price
FROM marks m JOIN samp
  ON samp.sr = CAST(ceil(m.pct * samp.s / 100.0) AS BIGINT)
ORDER BY l_returnflag, pct
"""


@register("lineitem_quantile_by_flag", oracle=_QGROUPED_ORACLE)
def lineitem_quantile_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED quantile estimates from the bottom-k sample — the
    per-group form of `lineitem_quantile_sketch`: p25..p99 of
    l_extendedprice per return flag, each group sampled independently
    (the bottom-k window is KEYED on the group, so there is no global
    window at all here). The shared map-side prefilter is sized from
    the SMALLEST group's exact count (the KMV d_min discipline —
    correctness for every group follows a fortiori; the readout's
    grouped count is one keyed aggregate), pure-BIGINT, replayed in the
    oracle's scalar subquery; groups below the target disarm into the
    small-set regime where each group's sample is its population and
    the estimates are exact."""
    from backend_big_data_spark.operators.qsketch import (
        bottomk_sample,
        sample_prefilter,
        sample_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    bn_min = int(
        li.groupBy("flag")
        .agg(F.count(F.lit(1)).alias("bn"))
        .agg(F.min("bn").alias("m"))
        .first()["m"]
    )
    samp = bottomk_sample(
        li, ["flag"], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(bn_min, 4096),
    )
    return (
        sample_quantiles(samp, ["flag"], _QS_PCTS, est_col="est_price")
        .select(F.col("flag").alias("l_returnflag"), "pct", "est_price")
        .orderBy("l_returnflag", "pct")
    )


_DECILES_BY_REGION_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_spend
  FROM orders GROUP BY o_custkey
), tagged AS (
  SELECT r.r_name AS region, s.o_custkey, s.total_spend
  FROM spend s
  JOIN customer c ON s.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), tiled AS (
  SELECT region, o_custkey, total_spend,
         CAST(ntile(10) OVER (PARTITION BY region
                              ORDER BY total_spend DESC, o_custkey)
              AS INTEGER) AS decile
  FROM tagged
)
SELECT region, decile, COUNT(*) AS n_customers,
       MIN(total_spend) AS min_spend, MAX(total_spend) AS max_spend
FROM tiled GROUP BY region, decile ORDER BY region, decile
"""


@register("customer_spend_deciles_by_region", oracle=_DECILES_BY_REGION_ORACLE)
def customer_spend_deciles_by_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUP-WISE exact decile segmentation — ntile(10) over customer
    lifetime spend WITHIN each region, via
    `operators/windows.grouped_distributed_ntile` (ROADMAP round-11
    candidate): even a keyed ntile window funnels each GROUP through one
    task, which at 10⁸ customers per region is the same B6 hazard the
    global family just eliminated — the grouped form range-partitions on
    (region, spend, custkey), so a region's segmentation parallelizes
    across all its partitions and the only per-group frame is the ≤
    numShufflePartitions counts-prefix. Exact decimal spend + unique
    (spend desc, custkey) tie-break keep tiles deterministic
    cross-engine; region arrives through broadcast dimension joins."""
    from backend_big_data_spark.operators.windows import (
        grouped_distributed_ntile,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    tagged = (
        spend.join(cust, spend.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("region", "o_custkey", "total_spend")
    )
    tiled = grouped_distributed_ntile(
        tagged, 10, ["region"], [F.desc("total_spend"), "o_custkey"], "decile"
    )
    return (
        tiled.groupBy("region", "decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("total_spend").alias("min_spend"),
            F.max("total_spend").alias("max_spend"),
        )
        .orderBy("region", "decile")
    )


def _bm25_bucketed_oracle() -> str:
    """doc_bm25_search's SQL verbatim (the doc_bm25_from_index pattern):
    the term-bucketed layout is a result-invariant re-organization of
    the at-rest postings, so the same oracle certifies it."""
    from backend_big_data_spark.plans import round4b  # noqa: F401
    from backend_big_data_spark.plans.registry import ORACLES

    return ORACLES["doc_bm25_search"]


@register("doc_bm25_from_bucketed_index", oracle=_bm25_bucketed_oracle())
def doc_bm25_from_bucketed_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retrieval from the TERM-BUCKETED maintained index (ROADMAP
    round-11 candidate): after ingest the postings fold to a layout
    partitioned by ``__tb = stable_hash(term) % 8``
    (`streaming/bm25_ingest.compact_bm25_index(term_buckets=8)`), and
    the query's bucket set prunes the at-rest read AT THE DIRECTORY
    LEVEL (PartitionFilters, plan-tested in tests/test_bm25_ingest.py)
    — the cluster-scale shape where a 3-term lookup against a 10⁶-term
    index opens 3 buckets' directories, not the whole postings tree. A
    third batch arrives AFTER the fold so the certified read exercises
    the mixed flat+bucketed layout (pruned bulk + scanned tail). The
    oracle is doc_bm25_search's SQL verbatim: hash equality proves the
    layout is result-invariant.

    Throwaway per-invocation index dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.bm25_ingest import (
        bm25_ingest_sink,
        bm25_topk_from_index,
        compact_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idir = _tempfile.mkdtemp(prefix="bm25_bucketed_")
    sink = bm25_ingest_sink(idir)
    # the two pre-fold batches are independent jobs (disjoint doc
    # slices, disjoint batch dirs) — overlap them (guide §2.6, the
    # part_fuzzy_from_bucketed_index pattern); the fold is dependent
    from concurrent.futures import ThreadPoolExecutor as _TPE

    with _TPE(max_workers=2) as _pool:
        for f in [
            _pool.submit(sink, docs.where(F.col("doc_id") % 3 == b), b)
            for b in range(2)
        ]:
            f.result()
    compact_bm25_index(spark, idir, keep_latest=0, term_buckets=8)
    sink(docs.where(F.col("doc_id") % 3 == 2), 2)  # flat post-fold tail
    return bm25_topk_from_index(
        spark, idir, ["join", "hash", "customer"], k=20
    ).orderBy("rnk")


_HEAVY_HITTERS_ORACLE = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
), ranked AS (
  SELECT tok, n,
         row_number() OVER (ORDER BY n DESC, tok) AS rnk
  FROM counts
)
SELECT CAST(rnk AS INTEGER) AS rnk, tok, n
FROM ranked WHERE rnk <= 20 ORDER BY rnk
"""


@register("corpus_heavy_hitters_from_counts", oracle=_HEAVY_HITTERS_ORACLE)
def corpus_heavy_hitters_from_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus heavy hitters served from the drift monitor's MAINTAINED
    token-count log (`streaming/drift_monitor.py`): documents arrive as
    three micro-batches through the monitor sink (which also scores
    each batch's drift — that metric row is its own certified family),
    auto-compaction folds the delta log mid-stream, and the top-20
    tokens come from one keyed sum over the maintained deltas + a
    TakeOrdered(20) — no document is re-tokenized. The oracle recounts
    the corpus from scratch: hash equality certifies maintained counts
    ≡ full recount THROUGH a compaction boundary — the exact-mergeable
    counts twin of the KMV/qsketch sidecars. Erasure: counts are the
    one exactly-subtractable family, so retraction is a journaled
    negate-delta append (`drift_monitor.retract_from_drift_counts`,
    round 12) — post-erasure parity vs a surviving-corpus recount is
    asserted crash-window-included in test_erasure_readout_parity.py.

    Throwaway per-invocation dirs; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.drift_monitor import (
        drift_monitor_sink,
        read_corpus_counts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = _tempfile.mkdtemp(prefix="hh_counts_")
    mdir = _tempfile.mkdtemp(prefix="hh_metrics_")
    sink = drift_monitor_sink(cdir, mdir, auto_compact_every=1)
    for b in range(3):
        sink(docs.where(F.col("doc_id") % 3 == b), b)

    counts = (
        read_corpus_counts(spark, cdir)
        .groupBy("tok")
        .agg(F.sum("n").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "tok").limit(20)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), "tok")  # 20 rows — bounded by the limit
    return top.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).select("rnk", "tok", "n").orderBy("rnk")


_KMV_WINDOW_ORACLE = """
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE event_id % 3 IN (1, 2)
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM h
), sk AS (
  SELECT event_type,
         CAST(CASE WHEN COUNT(*) >= 32
              THEN floor(31.0 * CAST(1152921504606846976 AS DOUBLE)
                         / MAX(CASE WHEN r = 32 THEN h END))
              ELSE COUNT(*) END AS BIGINT) AS approx_users
  FROM r WHERE r <= 32 GROUP BY event_type
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events WHERE event_id % 3 IN (1, 2) GROUP BY event_type
)
SELECT sk.event_type, sk.approx_users, ex.exact_users
FROM sk JOIN ex USING (event_type)
ORDER BY event_type
"""


@register("events_user_kmv_window", oracle=_KMV_WINDOW_ORACLE)
def events_user_kmv_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOWED rollup from the KMV sidecar: distinct users per type
    over a BATCH SUBRANGE (batches 1-2 of 3, "the last N ingest
    windows") served by merging only those batches' stored sketch rows
    — the sidecar supports arbitrary time-window readouts because
    bottom-k sketches merge over any subset, which is exactly what an
    exact distinct counter (or a counts table) cannot do without
    keeping per-window state. The oracle computes the single-pass
    sketch AND the exact distinct count over the same subrange: hash
    equality certifies subrange-merge ≡ subrange-sketch, and the exact
    column keeps the readout honest about estimator error.

    Throwaway per-invocation sidecar dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.kmv_ingest import (
        kmv_ingest_sink,
        kmv_merged_readout,
        read_kmv_sidecar,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    sdir = _tempfile.mkdtemp(prefix="kmv_window_")
    sink = kmv_ingest_sink(sdir, ["event_type"], F.col("user_id"), k=32)
    # independent batch jobs — overlap (guide §2.6, see events_user_kmv_sidecar)
    from concurrent.futures import ThreadPoolExecutor as _TPE

    with _TPE(max_workers=3) as _pool:
        for f in [
            _pool.submit(sink, ev.where(F.col("event_id") % 3 == b), b)
            for b in range(3)
        ]:
            f.result()

    sidecar = read_kmv_sidecar(spark, sdir).where(
        F.col("batch").isin(1, 2)  # the window: newest two ingest batches
    )
    merged = kmv_merged_readout(sidecar, ["event_type"], k=32)
    exact = (
        ev.where(F.col("event_id") % 3 != 0)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        merged.select(
            "event_type", F.col("approx_distinct").alias("approx_users")
        )
        .join(exact, "event_type")
        .orderBy("event_type")
    )
