"""Round-6 third batch: budget-driven quality calibration and
distance-stratified diversity sampling — two curation decisions real
pre-training pipelines make, expressed so the DECISION itself (not just
its inputs) is oracle-checkable.

Scale shapes (the point of both designs):

- ``doc_quality_calibration`` never sorts or ranks documents. The one
  data-scale operation is a ``groupBy(source, bucket)`` over a 251-bucket
  fixed-point score grid; the threshold search is a window over the
  ≤251-row GLOBAL histogram and the verdict rejoins via a broadcast
  1-row threshold. The classic formulation (global sort by score, take
  the budget prefix) is a total order over the corpus — this is the
  histogram form production systems use instead.
- ``embedding_diversity_sample`` replaces per-cluster rank windows
  (a sort over every cluster's full membership — unbounded at corpus
  scale) with a fixed absolute distance grid + ``min(struct)``
  representative per stratum: one broadcast-crossJoin scoring pass and
  one grouped aggregation with map-side partial min.

Determinism: every metric that crosses an engine boundary is an integer
before any aggregation — per-dimension fixed-point squared differences
(summed as BIGINTs, order-free) and ×10000 fixed-point ratios; the
budget test is integer cross-multiplication (10·kept ≥ 7·total), never
a float compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens

# the leakage-split oracle composes registrations from plans.documents /
# plans.extended — import them explicitly so importing THIS module alone
# (scripts, notebooks) finds them registered, not only the all_plans path
from backend_big_data_spark.plans import extended as _extended  # noqa: F401
from backend_big_data_spark.plans.registry import QUERIES, register
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.text.sampling import stable_hash

#: fixed-point quality-score bucket width (score_fp ∈ [0, 10000] → 251
#: buckets) — coarse enough that the histogram is always broadcast-tiny,
#: fine enough that the budget overshoot (≤ one bucket's token mass) is
#: ≤ ~0.4% of score range.
_QBUCKET = 40

#: keep-budget as an integer ratio: keep ≥ 7/10 of corpus tokens.
_KEEP_NUM, _KEEP_DEN = 7, 10

#: grids persisted by doc_quality_calibration — released via
#: :func:`release_calibration_caches` (same hygiene contract as
#: ``plans.curation.release_pipeline_caches``).
_CALIBRATION_PERSISTED: list = []


def release_calibration_caches() -> int:
    """Unpersist every grid doc_quality_calibration has cached; returns
    the number released. Call on corpus swap or at a bench boundary."""
    n = 0
    for df in _CALIBRATION_PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    _CALIBRATION_PERSISTED.clear()
    return n


_CALIBRATION_ORACLE = r"""
WITH t AS (
  SELECT source,
         len(string_split_regex(trim(text), '\s+')) AS n,
         len(list_distinct(string_split_regex(trim(text), '\s+'))) AS d
  FROM documents
), s AS (
  SELECT source, n AS n_tokens,
         CAST(floor(10000.0 * d / n + CAST(0.5 AS DOUBLE)) AS BIGINT) // 40
           AS bucket
  FROM t WHERE n > 0
), grid AS (
  SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS toks
  FROM s GROUP BY 1, 2
), ghist AS (
  SELECT bucket, CAST(SUM(toks) AS BIGINT) AS btoks FROM grid GROUP BY 1
), cum AS (
  SELECT bucket,
         CAST(SUM(btoks) OVER (ORDER BY bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS kept,
         CAST((SELECT SUM(btoks) FROM ghist) AS BIGINT) AS total
  FROM ghist
), thr AS (
  SELECT MAX(bucket) AS tstar FROM cum WHERE 10 * kept >= 7 * total
)
SELECT source,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN bucket >= tstar THEN n_docs ELSE 0 END) AS BIGINT)
         AS kept_docs,
       CAST(SUM(CASE WHEN bucket >= tstar THEN toks ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       MAX(tstar) AS threshold_bucket,
       CAST(floor(10000.0
                  * SUM(CASE WHEN bucket >= tstar THEN toks ELSE 0 END)
                  / SUM(toks) + CAST(0.5 AS DOUBLE)) AS BIGINT)
         AS kept_rate_fp
FROM grid, thr
GROUP BY source
ORDER BY source
"""


def score_grid(docs: DataFrame) -> DataFrame:
    """(source, text) rows → the (source, bucket, n_docs, toks)
    calibration grid: fixed-point type-token-ratio score, ``_QBUCKET``
    buckets. One data-scale shuffle; grids MERGE by keyed sum, which is
    what makes the streaming twin (`streaming/quality_monitor.py`)
    possible — the at-rest state is this grid, never the documents."""
    toks = tokens(F.col("text"))
    scored = (
        docs.select(
            "source",
            F.size(toks).alias("n"),
            F.size(F.array_distinct(toks)).alias("d"),
        )
        .filter(F.col("n") > 0)
        .select(
            "source",
            F.col("n").cast("long").alias("n_tokens"),
            F.expr(
                f"CAST(floor(10000.0 * d / n + 0.5D) AS BIGINT) div {_QBUCKET}"
            ).alias("bucket"),
        )
    )
    return scored.groupBy("source", "bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("toks")
    )


def calibration_from_grid(grid: DataFrame) -> DataFrame:
    """Grid → per-source calibration verdict (the query's output table).
    Every input is already aggregated: windows run over the ≤251-row
    global histogram, the threshold broadcasts as one row."""
    from pyspark.sql.window import Window

    glob = grid.groupBy("bucket").agg(F.sum("toks").alias("btoks"))
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # window + total over the ≤251-row histogram — bounded input by
    # construction, never the corpus
    cum = glob.select(
        "bucket",
        F.sum("btoks").over(w).alias("kept"),
        F.sum("btoks").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    thr = cum.filter(
        F.lit(_KEEP_DEN) * F.col("kept") >= F.lit(_KEEP_NUM) * F.col("total")
    ).agg(F.max("bucket").alias("tstar"))
    keep = F.col("bucket") >= F.col("tstar")
    return (
        grid.crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum(F.when(keep, F.col("n_docs")).otherwise(0)).alias(
                "kept_docs"
            ),
            F.sum(F.when(keep, F.col("toks")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.max("tstar").alias("threshold_bucket"),
            F.floor(
                F.lit(10000.0)
                * F.sum(F.when(keep, F.col("toks")).otherwise(0))
                / F.sum("toks")
                + F.lit(0.5)
            ).alias("kept_rate_fp"),
        )
        .orderBy("source")
    )


@register("doc_quality_calibration", oracle=_CALIBRATION_ORACLE)
def doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-driven quality-threshold calibration: find the single
    global score threshold that keeps ≥ 70% of corpus TOKENS (the
    highest such threshold — minimal overshoot, bounded by one bucket's
    mass), then report the per-source consequences: docs/tokens kept and
    the realized keep rate. This is the knob-setting readout you run
    before a quality-filter pass — "what cut do I make to hit my token
    budget, and which sources does it hit hardest?"

    Score: fixed-point type-token ratio (distinct/total whitespace
    tokens, ×10000) bucketed into a 251-cell histogram
    (:func:`score_grid`). No document-level sort anywhere: one
    ``groupBy(source, bucket)`` shuffle at data scale, a cumulative
    window over the ≤251-row global histogram, and a broadcast 1-row
    threshold join (:func:`calibration_from_grid`). Integer
    cross-multiplication (10·kept ≥ 7·total) decides the budget — no
    float compares. `streaming/quality_monitor.py` maintains the same
    grid incrementally."""
    docs = load_table(spark, sf_dir, "documents")
    # the grid is sources×251 rows — persist it so the threshold branch
    # and the final per-source rollup share ONE corpus scan (the plan
    # otherwise re-tokenizes the corpus once per branch)
    grid = score_grid(docs).persist()
    _CALIBRATION_PERSISTED.append(grid)
    return calibration_from_grid(grid)


#: fixed absolute stratum width over the integer squared-L2 grid
#: (per-dim fixed-point ×10000, summed): ~9 strata for unit-norm-ish
#: embeddings (d² ∈ [0, ~2.1] → d2_fp ∈ [0, ~21000]).
_STRATUM_W = 2500

#: number of fixed quantizer centroids (first _K corpus vectors — the
#: same fixed-quantizer convention as kmeans_embedding_clusters / IVF).
_K = 8

_DIVERSITY_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), c AS (
  SELECT CAST(vec_id AS INTEGER) AS cl, e AS ce FROM v WHERE vec_id < {_K}
), scored AS (
  SELECT v.vec_id, c.cl,
         CAST(list_sum(list_transform(range(1, len(v.e) + 1),
           i -> CAST(floor((v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i]) * 10000
                           + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS BIGINT)
           AS d2_fp
  FROM v, c
), assigned AS (
  SELECT vec_id, cl AS cluster, d2_fp FROM (
    SELECT vec_id, cl, d2_fp,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2_fp, cl) AS rn
    FROM scored
  ) WHERE rn = 1
), strata AS (
  SELECT vec_id, cluster, d2_fp, d2_fp // {_STRATUM_W} AS stratum,
         CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM assigned
), reps AS (
  SELECT cluster, stratum, vec_id AS rep_vec_id FROM (
    SELECT cluster, stratum, vec_id,
           row_number() OVER (PARTITION BY cluster, stratum
                              ORDER BY h, vec_id) AS rn
    FROM strata
  ) WHERE rn = 1
)
SELECT s.cluster, s.stratum,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(s.d2_fp) AS BIGINT) AS min_d2_fp,
       CAST(MAX(s.d2_fp) AS BIGINT) AS max_d2_fp,
       MAX(r.rep_vec_id) AS rep_vec_id
FROM strata s JOIN reps r
  ON s.cluster = r.cluster AND s.stratum = r.stratum
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("embedding_diversity_sample", oracle=_DIVERSITY_ORACLE)
def embedding_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-stratified diversity sampling over the embedding corpus:
    assign every vector to its nearest fixed centroid (first {_K} corpus
    vectors — the registry's fixed-quantizer convention), stratify each
    cluster by a FIXED absolute distance grid, and elect one
    hash-deterministic representative per (cluster × stratum) cell. The
    output grid is the diversity-preserving subset (plus per-cell
    membership stats): near-centroid cells capture the modes, far cells
    capture the tails — the coverage-first subsampling used to build
    eval/seed sets, as opposed to uniform sampling which oversamples
    dense modes.

    Scale: no per-cluster rank window (a membership-sized sort per
    cluster — unbounded at corpus scale). Scoring is one broadcast
    crossJoin against the {_K}-row centroid table; assignment and
    representative election are grouped ``min(struct)`` aggregations with
    map-side partial combine. Distances are per-dimension fixed-point
    integers summed as BIGINTs — order-free, so Spark's fold and the
    oracle's list_sum agree bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").cast("int").alias("cl"), v.alias("ce")
    )
    d2_fp = F.aggregate(
        F.zip_with(
            v,
            F.col("ce"),
            lambda x, y: F.floor((x - y) * (x - y) * 10000 + F.lit(0.5)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.select("vec_id", v.alias("embedding"))
        .crossJoin(F.broadcast(fixed))
        .select("vec_id", "cl", d2_fp.alias("d2_fp"))
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("d2_fp", "cl")).alias("best"))
        .select(
            "vec_id",
            F.col("best.cl").alias("cluster"),
            F.col("best.d2_fp").alias("d2_fp"),
        )
    )
    strata = assigned.select(
        "vec_id",
        "cluster",
        "d2_fp",
        F.expr(f"d2_fp div {_STRATUM_W}").alias("stratum"),
        stable_hash(F.col("vec_id")).alias("h"),
    )
    return (
        strata.groupBy("cluster", "stratum")
        .agg(
            F.count("*").alias("n_members"),
            F.min("d2_fp").alias("min_d2_fp"),
            F.max("d2_fp").alias("max_d2_fp"),
            F.min(F.struct("h", "vec_id")).alias("__rep"),
        )
        .select(
            "cluster",
            "stratum",
            "n_members",
            "min_d2_fp",
            "max_d2_fp",
            F.col("__rep.vec_id").alias("rep_vec_id"),
        )
        .orderBy("cluster", "stratum")
    )


def _leakage_split_oracle() -> str:
    """Compose the certified cluster + verified-pair oracles: units =
    near-dup components (singletons = the doc itself), split by unit
    hash, then count near pairs straddling splits (0 by construction)
    next to the naive doc-hash split's leak count."""
    from backend_big_data_spark.plans.registry import ORACLES

    return f"""
WITH clusters AS ({ORACLES["doc_dup_clusters"]}),
near AS ({ORACLES["doc_lsh_verified_dedup"]}),
units AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS unit
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
),
splits AS (
  SELECT doc_id, unit,
         CASE WHEN b < 10 THEN 'val' WHEN b < 20 THEN 'test'
              ELSE 'train' END AS split
  FROM (SELECT doc_id, unit,
               CAST(concat('0x', substr(md5(CAST(unit AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS b
        FROM units)
),
xleak AS (
  SELECT COUNT(*) AS n FROM near j
  JOIN splits a ON j.doc_a = a.doc_id
  JOIN splits b ON j.doc_b = b.doc_id
  WHERE a.split <> b.split
),
nsplit AS (
  SELECT doc_id,
         CASE WHEN h < 10 THEN 'val' WHEN h < 20 THEN 'test'
              ELSE 'train' END AS split
  FROM (SELECT doc_id,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 100 AS h
        FROM documents)
),
naive AS (
  SELECT COUNT(*) AS n FROM near j
  JOIN nsplit a ON j.doc_a = a.doc_id
  JOIN nsplit b ON j.doc_b = b.doc_id
  WHERE a.split <> b.split
)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT s.unit) AS BIGINT) AS n_units,
       CAST((SELECT n FROM xleak) AS BIGINT) AS cross_split_near_pairs,
       CAST((SELECT n FROM naive) AS BIGINT) AS naive_cross_pairs
FROM splits s GROUP BY 1 ORDER BY 1
"""


@register("doc_leakage_safe_split", oracle=_leakage_split_oracle())
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: the split UNIT is the
    connected component of the verified near-dup graph (singleton docs
    are their own unit), hashed into 10/10/80 val/test/train — so two
    near-duplicate documents can NEVER land in different splits. The
    output certifies it: ``cross_split_near_pairs`` (verified near pairs
    straddling splits) is 0 by construction and value-checked by the
    oracle, shown next to ``naive_cross_pairs`` — the leak count the
    standard per-doc hash split would have let through. Eval
    contamination via duplicates is the textbook failure this op
    prevents.

    Scale: clustering reuses the certified LSH→verify→star-CC path
    (`doc_dup_clusters`); the split itself is a map-side hash on the
    component label; both leak counters are two broadcast-able
    semi-join-sized joins over the (tiny) verified-pair set."""
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        lsh_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    labels = QUERIES["doc_dup_clusters"](spark, sf_dir)
    units = (
        docs.select("doc_id")
        .join(labels, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("unit"),
        )
    )

    def split_of(bucket):
        return (
            F.when(bucket < 10, F.lit("val"))
            .when(bucket < 20, F.lit("test"))
            .otherwise(F.lit("train"))
        )

    splits = units.withColumn(
        "split", split_of(stable_hash(F.col("unit")) % 100)
    ).persist()
    _CALIBRATION_PERSISTED.append(splits)
    pairs = lsh_verified_pairs(
        doc_shingles(docs), threshold=0.5, hash_fn="md5"
    ).select("doc_a", "doc_b")
    a = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    xleak = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count("*").alias("cross_split_near_pairs"))
    )
    nsplit = docs.select(
        "doc_id", split_of(stable_hash(F.col("doc_id")) % 100).alias("split")
    )
    na = nsplit.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    nb = nsplit.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    naive = (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count("*").alias("naive_cross_pairs"))
    )
    return (
        splits.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("unit").alias("n_units"),
        )
        .crossJoin(F.broadcast(xleak))
        .crossJoin(F.broadcast(naive))
        .orderBy("split")
    )


_DATASHEET_ORACLE = r"""
WITH d AS (
  SELECT source, lang, text,
         md5(text) AS fp,
         len(string_split_regex(trim(text), '\s+')) AS n,
         len(list_distinct(string_split_regex(trim(text), '\s+'))) AS dd
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(floor(1000000.0 * (COUNT(*) - COUNT(DISTINCT fp)) / COUNT(*)
                  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS exact_dup_ppm,
       CAST(floor(
         (SELECT SUM(CAST(floor(10000.0 * dd / n + CAST(0.5 AS DOUBLE))
                          AS BIGINT)) * 1.0 FROM d WHERE n > 0)
         / (SELECT COUNT(*) FROM d WHERE n > 0)
         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_ttr_fp,
       ROUND(quantile_cont(n, 0.5), 2) AS p50_doc_tokens,
       CAST(SUM(CASE WHEN n = 0 OR length(trim(text)) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS empty_docs
FROM d
"""


@register("corpus_datasheet", oracle=_DATASHEET_ORACLE)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet — the "describe my dataset" readout
    (datasheets-for-datasets style, from the public documentation
    literature): scale (docs/tokens/chars/sources/langs), exact-dup rate,
    mean fixed-point type-token ratio, median document length, empty-doc
    count. Composes the same deterministic primitives the per-op queries
    certify, collapsed into a single broadcastable row a catalog UI or a
    data-governance report consumes.

    Scale: one pass over the corpus — every metric is a partial-aggregable
    expression (count/sum/count-distinct over md5 fingerprints); the only
    non-sketch cardinality is COUNT(DISTINCT fp), which Spark plans as a
    two-phase expand-aggregate (swap to approx_count_distinct at true
    corpus scale; the exact form is the gate-scale certification)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    d = docs.select(
        "source",
        "lang",
        "text",
        F.md5("text").alias("fp"),
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("dd"),
    )
    score_fp = F.expr("CAST(floor(10000.0 * dd / n + 0.5D) AS BIGINT)")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.floor(
            F.lit(1000000.0)
            * (F.count("*") - F.countDistinct("fp"))
            / F.count("*")
            + F.lit(0.5)
        ).alias("exact_dup_ppm"),
        F.floor(
            F.sum(F.when(F.col("n") > 0, score_fp)) * F.lit(1.0)
            / F.sum(F.when(F.col("n") > 0, 1).otherwise(0))
            + F.lit(0.5)
        ).alias("mean_ttr_fp"),
        F.round(F.percentile(F.col("n"), F.lit(0.5)), 2).alias(
            "p50_doc_tokens"
        ),
        F.sum(
            F.when(
                (F.col("n") == 0) | (F.length(F.trim(F.col("text"))) == 0),
                1,
            ).otherwise(0)
        ).cast("long").alias("empty_docs"),
    )


#: CDC boundary modulus: a token opens a new chunk when its stable hash
#: ≡ 0 (mod 8) → expected chunk length 8 tokens.
_CDC_MOD = 8

_CDC_ORACLE = r"""
WITH tt AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), toks AS (
  SELECT doc_id, source, u.pos, t[u.pos] AS tok
  FROM tt, LATERAL unnest(range(1, len(t) + 1)) AS u(pos)
), marked AS (
  SELECT doc_id, source, tok, pos,
         CASE WHEN CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 8 = 0
              THEN 1 ELSE 0 END AS is_boundary
  FROM toks
), chunked AS (
  SELECT doc_id, source, tok, pos,
         CAST(SUM(is_boundary) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS chunk_id
  FROM marked
), chunks AS (
  SELECT doc_id, source, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp,
         CAST(COUNT(*) AS BIGINT) AS chunk_toks
  FROM chunked GROUP BY 1, 2, 3
), freq AS (
  SELECT chunk_fp, COUNT(*) AS df FROM chunks GROUP BY 1
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT c.chunk_fp) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN f.df > 1 THEN c.chunk_toks ELSE 0 END) AS BIGINT)
         AS dup_chunk_tokens,
       CAST(SUM(c.chunk_toks) AS BIGINT) AS total_tokens,
       CAST(floor(1000000.0
                  * SUM(CASE WHEN f.df > 1 THEN c.chunk_toks ELSE 0 END)
                  / SUM(c.chunk_toks) + CAST(0.5 AS DOUBLE)) AS BIGINT)
         AS dup_token_ppm
FROM chunks c JOIN freq f ON c.chunk_fp = f.chunk_fp
GROUP BY 1 ORDER BY 1
"""


@register("doc_cdc_chunk_dups", oracle=_CDC_ORACLE)
def doc_cdc_chunk_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking duplication audit: partition every
    document into variable-length chunks at content-determined
    boundaries (a token opens a chunk when its stable hash ≡ 0 mod
    ``_CDC_MOD`` — the storage-dedup CDC idea applied at token level),
    fingerprint each chunk, and report per-source duplicated-chunk token
    mass. Unlike fixed-k spans (`doc_duplicate_spans`) or line segments
    (`doc_segment_dedup`), CDC boundaries RESYNCHRONIZE after
    insertions/deletions: editing one token shifts at most its own
    chunk, so shared runs between edited copies still collide — the
    insertion-robust member of the dedup family.

    Scale: tokenize+boundary is map-side; the chunk-id cumsum is a
    per-document window (bounded by document length, the same shape as
    the span/segment ops); chunk assembly and frequency are two keyed
    shuffles on (doc, chunk) / fingerprint. Output is a bounded
    per-source grid."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    marked = toks.withColumn(
        "is_boundary",
        (stable_hash(F.col("tok")) % _CDC_MOD == 0).cast("long"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chunked = marked.withColumn("chunk_id", F.sum("is_boundary").over(w))
    chunks = (
        chunked.groupBy("doc_id", "source", "chunk_id")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda x: x["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_fp"),
            F.count("*").alias("chunk_toks"),
        )
    )
    freq = chunks.groupBy("chunk_fp").agg(F.count("*").alias("df"))
    dup_toks = F.sum(
        F.when(F.col("df") > 1, F.col("chunk_toks")).otherwise(0)
    )
    return (
        chunks.join(freq, "chunk_fp")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk_fp").alias("n_unique"),
            dup_toks.alias("dup_chunk_tokens"),
            F.sum("chunk_toks").alias("total_tokens"),
            F.floor(
                F.lit(1000000.0) * dup_toks / F.sum("chunk_toks")
                + F.lit(0.5)
            ).alias("dup_token_ppm"),
        )
        .orderBy("source")
    )


#: Greenwald-Khanna accuracy for the banded gate: rank error ≤ 1/100.
_GK_ACCURACY = 100

_QSKETCH_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(quantile_cont("value", 0.5), 2) AS exact_p50,
       ROUND(quantile_cont("value", 0.9), 2) AS exact_p90,
       TRUE AS p50_within_band,
       TRUE AS p90_within_band
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_quantile_sketch_band", oracle=_QSKETCH_ORACLE)
def events_quantile_sketch_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-error certification of the quantile-sketch path — the
    ``percentile_approx`` twin of ``events_hll_error_band``. Per event
    type: the EXACT p50/p90 (value-checked against the oracle) plus
    booleans asserting the Greenwald-Khanna sketch estimate lands inside
    a RANK band the sketch's contract guarantees: with accuracy=100 the
    returned sample's rank is within ±1% of the target, so its VALUE must
    lie between the exact p40..p60 (resp. p85..p95) cut points — a
    ~10-sigma band that never flakes on a healthy sketch and flips FALSE
    (a driver hash mismatch) on a broken one.

    Scale: exact grouped percentiles buffer each group's values — the
    gate-scale certification side only. The sketch side is the 100 TB
    path: fixed-size mergeable summaries, map-side combine, one pass."""
    ev = load_table(spark, sf_dir, "events")
    exact = F.percentile(
        F.col("value"), F.array(*[F.lit(x) for x in (0.4, 0.5, 0.6, 0.85, 0.9, 0.95)])
    )
    est = F.percentile_approx(
        F.col("value"), F.array(F.lit(0.5), F.lit(0.9)), F.lit(_GK_ACCURACY)
    )
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"), exact.alias("__ex"), est.alias("__est")
    )
    return per.select(
        "event_type",
        "n_events",
        F.round(F.col("__ex")[1], 2).alias("exact_p50"),
        F.round(F.col("__ex")[4], 2).alias("exact_p90"),
        (
            (F.col("__est")[0] >= F.col("__ex")[0])
            & (F.col("__est")[0] <= F.col("__ex")[2])
        ).alias("p50_within_band"),
        (
            (F.col("__est")[1] >= F.col("__ex")[3])
            & (F.col("__est")[1] <= F.col("__ex")[5])
        ).alias("p90_within_band"),
    ).orderBy("event_type")


__all__ = [
    "calibration_from_grid",
    "doc_cdc_chunk_dups",
    "doc_quality_calibration",
    "embedding_diversity_sample",
    "events_quantile_sketch_band",
    "release_calibration_caches",
    "score_grid",
]
