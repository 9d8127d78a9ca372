"""Round-10 additions: the PCA-family readouts the round-9 verdict left
un-gated.

- ``embedding_pca_project`` — projection + whitening onto a FIXED,
  published component matrix (the `text/filtering.quality_score_lr`
  published-weights pattern: training happens elsewhere / on the driver,
  the SHIPPED artifact is plan constants, and the scoring pass is pure
  Catalyst column math). Closes the one PCA-family capability without an
  external oracle row: `pca_components` (the eigensolve) is driver-side
  numpy over the dim×dim matrix and not SQL-replayable, but everything
  corpus-sized — the projection — is.
- ``embedding_drift_from_moments`` — the drift monitor's 100 TB form:
  per-dimension mean-shift/variance-ratio computed from the margin
  sink's MAINTAINED moment sidecars (no corpus rescan), certified
  against the SAME SQL oracle as the full-scan ``embedding_drift_report``
  — drift-from-sidecars ≡ drift-from-corpus, the lm_ingest incremental
  equality discipline.

- ``lineitem_price_deciles`` — exact equi-height deciles over the RAW
  fact table via `operators/windows.distributed_ntile`: the segmentation
  family with its entity-cardinality ceiling removed.
- ``doc_bm25_from_index`` — incremental lexical retrieval: BM25 top-k
  scored entirely from the maintained postings/stats sidecars
  (`streaming/bm25_ingest.py`) against the full-scan query's oracle.

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has none of these; they extend the additive curation/retrieval set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.kmv import HASH_DOMAIN
from backend_big_data_spark.plans.registry import ORACLES, register
from backend_big_data_spark.sources.catalog import load_table

# Published PCA artifact — fixed plan constants with EXACTLY-representable
# short-binary values (sixteenths / eighths / quarter-squares), so both
# engines consume bit-identical weights and all drift comes from summation
# order alone (~1e-13, far under the 1e-6 fixed-point grid). Any trainer
# that emits (components, mean, explained_variance) drops in.
PCA_DIM = 64
PCA_K = 4
PCA_COMPONENTS = np.array(
    [[((a * PCA_DIM + i) % 17 - 8) / 16.0 for i in range(PCA_DIM)] for a in range(PCA_K)]
)
PCA_MEAN = np.array([((i % 5) - 2) / 8.0 for i in range(PCA_DIM)])
PCA_EXPLAINED_VARIANCE = np.array([4.0, 2.25, 1.0, 0.25])


@register(
    "embedding_pca_project",
    oracle="""
WITH e AS (
  SELECT vec_id, g.i, CAST(embedding AS DOUBLE[])[g.i + 1] AS x
  FROM embeddings, generate_series(0, 63) g(i)
), w AS (
  SELECT aa.a, gg.i,
         ((((aa.a * 64 + gg.i) % 17) - 8) / 16.0) AS wt
  FROM generate_series(0, 3) aa(a), generate_series(0, 63) gg(i)
), mdot AS (
  SELECT a, SUM((((i % 5) - 2) / 8.0) * wt) AS md FROM w GROUP BY a
), p AS (
  SELECT e.vec_id, w.a, SUM(e.x * w.wt) AS dot
  FROM e JOIN w ON e.i = w.i GROUP BY 1, 2
), v AS (
  SELECT g.a,
         CASE g.a WHEN 0 THEN 4.0 WHEN 1 THEN 2.25
                  WHEN 2 THEN 1.0 ELSE 0.25 END AS var
  FROM generate_series(0, 3) g(a)
)
SELECT p.vec_id, CAST(p.a AS INTEGER) AS axis,
       CAST(floor((p.dot - mdot.md) * 1000000 + 0.5) AS BIGINT) AS proj_fp,
       CAST(floor((p.dot - mdot.md) / sqrt(v.var + 0.000000001) * 1000000
                  + 0.5) AS BIGINT) AS white_fp
FROM p JOIN mdot USING (a) JOIN v USING (a)
ORDER BY p.vec_id, axis
""",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project + whiten the embedding corpus onto the published component
    matrix (`similarity/pca.pca_project`, both paths): per row, k fused
    JVM dot products against literal axis arrays with centering folded
    into the constant term — whole-stage codegen, no UDF, no shuffle
    before the final keyed explode. Output is long-format
    ``(vec_id, axis, proj_fp, white_fp)`` on the BIGINT millionths grid
    (floor fixed point in BOTH engines — the covariance family's parity
    discipline)."""
    from backend_big_data_spark.similarity.pca import pca_project

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = pca_project(
        emb, PCA_COMPONENTS, PCA_MEAN, vec_col="embedding", out_col="proj"
    )
    both = pca_project(
        proj,
        PCA_COMPONENTS,
        PCA_MEAN,
        explained_variance=PCA_EXPLAINED_VARIANCE,
        vec_col="embedding",
        out_col="white",
    )

    def fp(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    return (
        both.select(
            "vec_id",
            F.posexplode(F.arrays_zip("proj", "white")).alias("axis", "pw"),
        )
        .select(
            "vec_id",
            F.col("axis").cast("int").alias("axis"),
            fp(F.col("pw.proj")).alias("proj_fp"),
            fp(F.col("pw.white")).alias("white_fp"),
        )
        .orderBy("vec_id", "axis")
    )


def _drift_oracle() -> str:
    return ORACLES["embedding_drift_report"]


@register("embedding_drift_from_moments", oracle=_drift_oracle())
def embedding_drift_from_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor's streaming certificate: the reference half
    (even vec_ids) and current half (odd vec_ids) are each ingested
    through the margin sink as TWO micro-batches (``threshold=inf``
    disarms linking, ``dedup_exact=False`` admits every row — the
    cov_incremental conventions), and the per-dimension drift report is
    computed ENTIRELY from the maintained moment sidecars
    (`pca.dim_stats_from_moments` + the shared `pca.drift_readout`) —
    no embedding is rescanned. The oracle is embedding_drift_report's
    SQL verbatim: hash equality proves drift-from-sidecars ≡
    drift-from-corpus, which is what makes the monitor free at 100 TB —
    the sidecars are already maintained by ingestion. Falls back to
    corpus-scan statistics if a sidecar fails its coverage guard
    (result-invariant, just slower).

    Throwaway per-invocation master dirs; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.similarity.pca import (
        dim_stats_from_moments,
        drift_readout,
    )
    from backend_big_data_spark.streaming.margin_ingest import (
        margin_ingest_sink,
        read_master_moments,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )

    def ingest(parity: int) -> str:
        mdir = _tempfile.mkdtemp(prefix=f"drift_moments_{parity}_")
        sink = margin_ingest_sink(
            mdir, dim=64, threshold=float("inf"), dedup_exact=False
        )
        half = emb.where(F.col("id") % 2 == parity)
        sink(half.where(F.col("id") % 4 == parity), 0)
        sink(half.where(F.col("id") % 4 != parity), 1)
        return mdir

    def stats(parity: int) -> DataFrame:
        moments = read_master_moments(spark, ingest(parity))
        if moments is None:  # coverage guard tripped — documented fallback
            return (
                emb.where(F.col("id") % 2 == parity)
                .select(
                    F.posexplode(
                        F.col("embedding").cast("array<double>")
                    ).alias("i", "x")
                )
                .groupBy("i")
                .agg(
                    F.sum("x").alias("sx"),
                    F.sum(F.col("x") * F.col("x")).alias("sxx"),
                    F.count(F.lit(1)).alias("n"),
                )
            )
        return dim_stats_from_moments(moments)

    return drift_readout(stats(0), stats(1))


@register(
    "lineitem_price_deciles",
    oracle="""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DOUBLE) AS price,
         ntile(10) OVER (ORDER BY CAST(l_extendedprice AS DOUBLE),
                         l_orderkey, l_linenumber) AS decile
  FROM lineitem
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(price) AS min_price, MAX(price) AS max_price,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS revenue_cents
FROM t GROUP BY decile ORDER BY decile
""",
)
def lineitem_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-height price deciles over the RAW lineitem fact table —
    the demonstration that `operators/windows.distributed_ntile` removes
    the entity-cardinality ceiling entirely: the frame being tiled here
    is not a pre-aggregated dimension but the fact table itself (6M rows
    at sf1, 600B at the 100 TB target), which the old
    ``ntile().over(Window.orderBy(...))`` form could never survive — a
    single task would sort the whole fact table. Cost is one range
    shuffle + a broadcast of ≤ numShufflePartitions prefix offsets;
    the tie-break (price, orderkey, linenumber) is a total order so the
    tile boundaries replay deterministically cross-engine. Revenue per
    decile sums through DECIMAL(18,2) (the money_sum discipline): a
    double sum over ~10⁵ prices carries addition-order error comparable
    to the cent grid, so only an exact decimal sum makes the cents
    column order-independent."""
    from backend_big_data_spark.operators.windows import distributed_ntile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    tiled = distributed_ntile(
        li, 10, [F.col("price"), "l_orderkey", "l_linenumber"], "decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
            (F.sum(F.col("price").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("decile")
    )


def _bm25_oracle() -> str:
    return ORACLES["doc_bm25_search"]


@register("doc_bm25_from_index", oracle=_bm25_oracle())
def doc_bm25_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental lexical retrieval certificate: the documents table is
    ingested through the BM25 index sink as two micro-batches
    (`streaming/bm25_ingest.py` — per-batch postings (term, doc, tf, dl)
    plus additive (N, Σdl) stats sidecars), and the top-20 for the query
    {join, hash, customer} is scored ENTIRELY from the maintained index —
    no document is re-read or re-tokenized. The oracle is
    doc_bm25_search's SQL verbatim: hash equality proves
    score-from-index ≡ score-from-corpus, the lm_ingest incremental
    discipline applied to retrieval. Both paths share one scoring
    finisher (`text.bm25.bm25_topk_from_postings`), so they cannot
    drift; at 100 TB the postings sidecar IS the inverted index,
    maintained by ingestion, never rebuilt.

    Throwaway per-invocation index dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.bm25_ingest import (
        bm25_ingest_sink,
        bm25_topk_from_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idir = _tempfile.mkdtemp(prefix="bm25_index_")
    sink = bm25_ingest_sink(idir)
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    return bm25_topk_from_index(
        spark, idir, ["join", "hash", "customer"], k=20
    ).orderBy("rnk")


def _tfidf_oracle() -> str:
    return ORACLES["doc_tfidf_top_terms"]


@register("doc_tfidf_from_index", oracle=_tfidf_oracle())
def doc_tfidf_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction served from the maintained BM25 postings
    sidecar — the second retrieval readout off the SAME index (the
    postings rows carry exactly the (term, doc, tf) frame TF-IDF needs,
    and the stats sidecar carries N): documents are ingested as two
    micro-batches and the per-doc top-3 terms come ENTIRELY from the
    at-rest index, no re-tokenize. Oracle is doc_tfidf_top_terms's SQL
    verbatim; both paths share `text/bm25.py::tfidf_top_terms`, so hash
    equality proves keywords-from-index ≡ keywords-from-corpus — one
    maintained sidecar family serving multiple certified readouts is the
    economics that justifies maintaining it at 100 TB.

    Throwaway per-invocation index dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.streaming.bm25_ingest import (
        bm25_ingest_sink,
        read_bm25_postings,
        read_bm25_stats,
    )
    from backend_big_data_spark.text.bm25 import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idir = _tempfile.mkdtemp(prefix="tfidf_index_")
    sink = bm25_ingest_sink(idir)
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    tf = read_bm25_postings(spark, idir).select("doc_id", "term", "tf")
    n_docs = read_bm25_stats(spark, idir).select(
        F.col("__n").alias("n_docs")
    )
    return tfidf_top_terms(tf, n_docs, k=3).orderBy("doc_id", "term_rank")


def _hybrid_oracle() -> str:
    return ORACLES["doc_hybrid_search"]


@register("doc_hybrid_from_index", oracle=_hybrid_oracle())
def doc_hybrid_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full hybrid-search serving stack off MAINTAINED state only:
    the lexical top-50 comes from the BM25 postings/stats sidecars
    (`bm25_topk_from_index`) and the semantic top-50 from an embedding
    master maintained by the margin sink (corpus-of-record mode:
    threshold=inf, dedup_exact=False — the master IS the corpus), fused
    with exact-integer RRF. Oracle is doc_hybrid_search's SQL verbatim:
    hash equality proves the production serving path — where ingestion
    maintains the indexes and queries never touch raw documents or a
    fresh embedding scan — returns exactly what the from-scratch
    computation returns. Completes the retrieval triple (BM25, TF-IDF,
    hybrid) served from one maintained sidecar family.

    Throwaway per-invocation dirs; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.similarity.ann import brute_force_cosine_topk
    from backend_big_data_spark.similarity.hybrid import rrf_fuse
    from backend_big_data_spark.streaming.bm25_ingest import (
        bm25_ingest_sink,
        bm25_topk_from_index,
    )
    from backend_big_data_spark.streaming.margin_ingest import (
        margin_ingest_sink,
        read_margin_master,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idir = _tempfile.mkdtemp(prefix="hybrid_bm25_")
    bsink = bm25_ingest_sink(idir)
    bsink(docs.where(F.col("doc_id") % 2 == 0), 0)
    bsink(docs.where(F.col("doc_id") % 2 == 1), 1)

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    mdir = _tempfile.mkdtemp(prefix="hybrid_master_")
    msink = margin_ingest_sink(
        mdir, dim=64, threshold=float("inf"), dedup_exact=False
    )
    msink(emb.where(F.col("id") % 2 == 0), 0)
    msink(emb.where(F.col("id") % 2 == 1), 1)
    master = read_margin_master(spark, mdir).select(
        F.col("id").alias("vec_id"), "embedding"
    )

    lexical = bm25_topk_from_index(
        spark, idir, ["join", "hash", "customer"], k=50
    ).select("doc_id", "rnk")
    semantic = brute_force_cosine_topk(
        master, master.filter(F.col("vec_id") == 0), k=50
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rnk"))
    return rrf_fuse([lexical, semantic], top=10).orderBy("rnk")


@register(
    "lineitem_exact_quantiles",
    oracle="""
WITH t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS price,
         row_number() OVER (ORDER BY CAST(l_extendedprice AS DOUBLE),
                            l_orderkey, l_linenumber) AS r,
         COUNT(*) OVER () AS n
  FROM lineitem
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT CAST(m.pct AS INTEGER) AS pct, t.price
FROM marks m JOIN t ON t.r = CAST(ceil(m.pct * t.n / 100.0) AS BIGINT)
ORDER BY pct
""",
)
def lineitem_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistics over the raw fact table — p25/p50/p75/p90/
    p99 of l_extendedprice as the type-1 (discrete) quantile: the value
    at rank ⌈p·n⌉ under a unique total order. approx_percentile is the
    usual scale answer, but exact tail quantiles (the p99 a data
    contract or an SLA names) are exactly what sketches blur — and with
    `operators/windows.distributed_rank` the exact form costs one range
    shuffle + a broadcast of per-partition offsets, not a single-task
    global sort. Selection is a tiny broadcast of the 5 percentile marks
    against the ranked frame; exactly one row survives per mark (the
    order is total by (price, orderkey, linenumber) tie-break)."""
    from backend_big_data_spark.operators.windows import distributed_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    ranked = distributed_rank(
        li,
        [F.col("price"), "l_orderkey", "l_linenumber"],
        rank_col="r",
        total_col="n",
    )
    marks = spark.createDataFrame([(25,), (50,), (75,), (90,), (99,)], "pct int")
    return (
        ranked.crossJoin(F.broadcast(marks))
        .where(
            F.col("r")
            == F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("long")
        )
        .select("pct", "price")
        .orderBy("pct")
    )


def _kmv_adaptive_pref(d_min: int, margin: int = 256) -> int | None:
    """The sizing rule for the KMV hash ceiling (the candidate_cap
    eager-bound discipline): aim the map-side filter at ~``margin``
    expected survivors per group (8× k=32, far above starvation noise),
    computed from an exact per-group cardinality FLOOR in pure 64-bit
    integer arithmetic — ``(2⁶⁰ // d) * margin`` — which the SQL twin
    reproduces verbatim (DuckDB ``//`` is the same floor division).
    Below the margin the filter DISARMS (returns None): tiny groups are
    the small-set regime where the sketch is their exact distinct set
    and any ceiling would only starve the guard."""
    return (HASH_DOMAIN // d_min) * margin if d_min > margin else None


@register(
    "events_user_kmv",
    oracle="""
WITH dmin AS (
  SELECT MIN(c) AS d FROM (
    SELECT COUNT(DISTINCT user_id) AS c FROM events GROUP BY event_type)
), th AS (
  SELECT CASE WHEN d > 256 THEN (1152921504606846976 // d) * 256
              ELSE 1152921504606846976 END AS t FROM dmin
), h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
  WHERE CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
             AS BIGINT) < (SELECT t FROM th)
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n_seen
  FROM h
), est AS (
  SELECT event_type,
         CAST(CASE WHEN MAX(n_seen) >= 32
              THEN floor(31.0 * CAST(1152921504606846976 AS DOUBLE)
                         / MAX(CASE WHEN r = 32 THEN h END))
              ELSE MAX(n_seen) END AS BIGINT) AS approx_users
  FROM r GROUP BY 1
), ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY 1
)
SELECT est.event_type, approx_users,
       CAST(exact_users AS BIGINT) AS exact_users,
       CAST(floor(abs(CAST(approx_users AS DOUBLE) - exact_users) * 1000000
                  / exact_users) AS BIGINT) AS err_ppm
FROM est JOIN ex USING (event_type)
ORDER BY event_type
""",
)
def events_user_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a KMV sketch
    (`operators/kmv.py`, k=32) with the map-side hash prefilter sized
    ADAPTIVELY from the exact per-type floor (which the readout computes
    anyway): armed at ~256 expected survivors per type when the floor
    exceeds 256 distinct users (sf0.1 and beyond), disarmed into the
    small-set regime below it — the oracle-gateable sketch next to the rows-only
    DataSketches HLL rollup: the k smallest md5-60bit hashes replay
    bit-for-bit in SQL, so the ESTIMATE itself is hash-certified, not
    just sanity-checked. Reports approx vs exact with the error in ppm
    (k=32 ⇒ ~18% standard error — the readout shows what the sketch
    buys and what it costs). The corpus-sized work is one map-side
    hash+filter; the k-smallest window runs over the surviving half of
    the per-type user hashes."""
    from backend_big_data_spark.operators.kmv import kmv_estimate, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    d_min = int(
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("c"))
        .agg(F.min("c").alias("m"))
        .first()["m"]
    )
    sk = kmv_sketch(
        ev,
        ["event_type"],
        F.col("user_id"),
        k=32,
        prefilter=_kmv_adaptive_pref(d_min),
    )
    est = sk.select(
        "event_type", kmv_estimate(F.col("sketch"), k=32).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.floor(
                F.abs(
                    F.col("approx_users").cast("double")
                    - F.col("exact_users")
                )
                * F.lit(1e6)
                / F.col("exact_users")
            )
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "source_vocab_kmv_overlap",
    oracle="""
WITH toks AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS tok
  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')
), h AS (
  SELECT DISTINCT source,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
), r AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r
  FROM h
), sk AS (
  SELECT source, list_sort(list(h)) AS sketch FROM r WHERE r <= 16 GROUP BY 1
), pairs AS (
  SELECT a.source AS s1, b.source AS s2, a.sketch AS sa, b.sketch AS sb
  FROM sk a JOIN sk b ON a.source < b.source
), fused AS (
  SELECT s1, s2,
         list_sort(list_distinct(list_concat(sa, sb)))[1:16] AS u, sa, sb
  FROM pairs
), estj AS (
  SELECT s1, s2,
         CAST(floor(len(list_filter(u, x -> list_contains(sa, x)
                                       AND list_contains(sb, x))) * 10000.0
                    / len(u)) AS BIGINT) AS jacc_est_fp,
         CAST(CASE WHEN len(u) >= 16
              THEN floor(15.0 * CAST(1152921504606846976 AS DOUBLE) / u[16])
              ELSE len(u) END AS BIGINT) AS union_vocab_est
  FROM fused
), v AS (SELECT source, tok FROM toks), sizes AS (
  SELECT source, COUNT(*) AS n FROM v GROUP BY 1
), inter AS (
  SELECT a.source AS s1, b.source AS s2, COUNT(*) AS i
  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
), exact AS (
  SELECT i.s1, i.s2,
         CAST(floor(i.i * 10000.0 / (x.n + y.n - i.i)) AS BIGINT)
           AS jacc_exact_fp
  FROM inter i JOIN sizes x ON x.source = i.s1
               JOIN sizes y ON y.source = i.s2
)
SELECT e.s1, e.s2, e.jacc_est_fp, e.union_vocab_est, x.jacc_exact_fp
FROM estj e JOIN exact x ON e.s1 = x.s1 AND e.s2 = x.s2
ORDER BY e.s1, e.s2
""",
)
def source_vocab_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap estimated from per-source KMV
    sketches ALONE (k=16): union sketch = k smallest of the merged
    sketches, Jaccard = fraction of the union sketch present in both —
    the set-operation algebra HLL cannot do, fully hash-oracle-gated,
    and the 100 TB shape for "how much do these sources share?"
    questions: per-source sketches are maintained rows; any pair fuses
    in O(k). The exact Jaccard rides alongside so the estimate's error
    is visible in the output. No prefilter: per-source vocabularies here
    are interactive-sized (the events_user_kmv row demonstrates the
    armed-prefilter regime)."""
    from backend_big_data_spark.operators.kmv import (
        kmv_estimate,
        kmv_jaccard_fp,
        kmv_sketch,
        kmv_union_sketch,
    )

    srcs = ["src0", "src1", "src2", "src3"]
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isin(srcs)
    )
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{2,}"), F.lit(0))
        ).alias("tok"),
    ).distinct()
    sk = kmv_sketch(toks, ["source"], F.col("tok"), k=16)
    a = sk.select(F.col("source").alias("s1"), F.col("sketch").alias("sa"))
    b = sk.select(F.col("source").alias("s2"), F.col("sketch").alias("sb"))
    est = (
        a.join(b, F.col("s1") < F.col("s2"))
        .select(
            "s1",
            "s2",
            kmv_jaccard_fp(F.col("sa"), F.col("sb"), k=16).alias(
                "jacc_est_fp"
            ),
            kmv_estimate(
                kmv_union_sketch(F.col("sa"), F.col("sb"), k=16), k=16
            ).alias("union_vocab_est"),
        )
    )
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    va = toks.select(F.col("source").alias("s1"), "tok")
    vb = toks.select(F.col("source").alias("s2"), "tok")
    inter = (
        va.join(vb, ["tok"])
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    exact = (
        inter.join(sizes.select(F.col("source").alias("s1"), F.col("n").alias("na")), "s1")
        .join(sizes.select(F.col("source").alias("s2"), F.col("n").alias("nb")), "s2")
        .select(
            "s1",
            "s2",
            F.floor(
                F.col("i") * F.lit(1e4) / (F.col("na") + F.col("nb") - F.col("i"))
            )
            .cast("long")
            .alias("jacc_exact_fp"),
        )
    )
    return (
        est.join(exact, ["s1", "s2"])
        .select("s1", "s2", "jacc_est_fp", "union_vocab_est", "jacc_exact_fp")
        .orderBy("s1", "s2")
    )


def _kmv_oracle() -> str:
    return ORACLES["events_user_kmv"]


@register("events_user_kmv_merged", oracle=_kmv_oracle())
def events_user_kmv_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV mergeability certificate — incremental distinct counting:
    events split into three batches (event_id % 3), ONE k=32 sketch per
    (event_type, batch) with the adaptively-sized prefilter (per-type
    floor ÷ 3 keeps ~85 expected survivors per batch slice when armed —
    comfortably above k), then the per-type
    answer comes from `kmv_merge` over the batch sketches alone — k
    arrays fold in O(k·batches), no event revisited. The oracle is
    events_user_kmv's SQL verbatim (a single full-scan sketch): hash
    equality IS the closure-under-union proof that per-batch sketch
    sidecars are an incremental cardinality counter — the lm_ingest
    equality discipline applied to sketches (a streaming ingest appends
    one sketch row per batch; any batch window folds without a rescan)."""
    from backend_big_data_spark.operators.kmv import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__b", F.col("event_id") % 3
    )
    d_min = int(
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("c"))
        .agg(F.min("c").alias("m"))
        .first()["m"]
    )
    per_batch = kmv_sketch(
        ev, ["event_type", "__b"], F.col("user_id"), k=32,
        prefilter=_kmv_adaptive_pref(d_min),
    )
    merged = per_batch.groupBy("event_type").agg(
        kmv_merge(F.collect_list("sketch"), k=32).alias("sketch")
    )
    est = merged.select(
        "event_type", kmv_estimate(F.col("sketch"), k=32).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.floor(
                F.abs(
                    F.col("approx_users").cast("double")
                    - F.col("exact_users")
                )
                * F.lit(1e6)
                / F.col("exact_users")
            )
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy("event_type")
    )
