"""Round-4 additions: composed ANN (IVF lists over SQ8 codes with
full-precision re-rank) and ingest-dedup composition queries.

Kept in their own module so the plan files whose queries hold standing
driver certifications stay byte-stable (the registry window rotates per
round; un-drifted files keep their prior-round rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.ann import ivf_sq8_cosine_topk
from backend_big_data_spark.sources.catalog import load_table

#: Shared SQ8 dequantization CTEs (embeddings → per-dim stats → dequantized
#: vectors) — identical arithmetic to similarity/ann._sq8_dequant_expr.
_SQ8_CTES = """
vecs AS (
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
)"""


@register(
    "ann_ivf_sq8_topk",
    oracle=f"""
WITH {_SQ8_CTES},
cents AS (
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
), approx AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nq.v) AS asim
  FROM cand
  JOIN vecs qv ON qv.vec_id = cand.query_id
  JOIN dv nq ON nq.vec_id = cand.neighbor_id
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY asim DESC, neighbor_id) AS srn
    FROM approx
  ) WHERE srn <= 15
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nv.v) AS sim
  FROM short
  JOIN vecs qv ON qv.vec_id = short.query_id
  JOIN vecs nv ON nv.vec_id = short.neighbor_id
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
def ann_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×SQ8 composed ANN (similarity/ann.py ``ivf_sq8_cosine_topk``):
    coarse quantizer prunes lists (nprobe=3 of nlist=8), SQ8 codes make
    the in-list scan 4× smaller, top-15 shortlist re-ranks against
    full-precision vectors. Fixed centroids (first 8 corpus vectors) +
    deterministic quantizer ⇒ every stage replays in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    cvec = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"), cvec.alias("centroid")
    )
    return ivf_sq8_cosine_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        nprobe=3,
        rerank=15,
        centroids=fixed,
        dim=64,
    )


def _incremental_full_oracle() -> str:
    """Batch-vs-corpus dedup with ALL THREE removal classes: exact (vs
    corpus + within-batch non-canonical), cross near-dups, and TRANSITIVE
    within-batch near-dups (recursive min-label flood over the both-new
    pair graph, keep only each component's min id). Batch = hash bucket
    < 30 so the sf0.01 gate actually contains internal near-dup pairs."""
    from backend_big_data_spark.plans.documents import _HID
    from backend_big_data_spark.plans.extended import _lsh_verified_oracle

    verified = _lsh_verified_oracle().strip()
    verified = verified[: verified.rindex("ORDER BY")]
    return f"""
WITH RECURSIVE near AS (
{verified}
),
sp AS (SELECT doc_id, ({_HID} % 100) < 30 AS is_new FROM documents),
fp AS (SELECT doc_id, md5(text) AS f FROM documents),
exact_removed AS (
  SELECT b.doc_id FROM fp b JOIN sp sb USING (doc_id)
  WHERE sb.is_new AND (
    EXISTS (SELECT 1 FROM fp e JOIN sp se ON se.doc_id = e.doc_id
            WHERE NOT se.is_new AND e.f = b.f)
    OR b.doc_id > (SELECT MIN(b2.doc_id) FROM fp b2
                   JOIN sp s2 ON s2.doc_id = b2.doc_id
                   WHERE s2.is_new AND b2.f = b.f)
  )
),
near_removed AS (
  SELECT CASE WHEN sa.is_new THEN n.doc_a ELSE n.doc_b END AS doc_id
  FROM near n
  JOIN sp sa ON sa.doc_id = n.doc_a
  JOIN sp sb ON sb.doc_id = n.doc_b
  WHERE sa.is_new <> sb.is_new
),
bedges AS (
  SELECT n.doc_a AS a, n.doc_b AS b FROM near n
  JOIN sp sa ON sa.doc_id = n.doc_a JOIN sp sb ON sb.doc_id = n.doc_b
  WHERE sa.is_new AND sb.is_new
  UNION
  SELECT n.doc_b AS a, n.doc_a AS b FROM near n
  JOIN sp sa ON sa.doc_id = n.doc_a JOIN sp sb ON sb.doc_id = n.doc_b
  WHERE sa.is_new AND sb.is_new
),
walk(node, label) AS (
  SELECT DISTINCT a, a FROM bedges
  UNION
  SELECT e.b, w.label FROM walk w JOIN bedges e ON e.a = w.node
),
batch_near_removed AS (
  SELECT node AS doc_id FROM (SELECT node, MIN(label) AS root FROM walk GROUP BY node)
  WHERE node != root
)
SELECT d.doc_id FROM documents d JOIN sp USING (doc_id)
WHERE sp.is_new
  AND d.doc_id NOT IN (SELECT doc_id FROM exact_removed
                       UNION SELECT doc_id FROM near_removed
                       UNION SELECT doc_id FROM batch_near_removed)
ORDER BY d.doc_id
"""


@register("doc_incremental_dedup_full", oracle=_incremental_full_oracle())
def doc_incremental_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup with the within-batch near-dup composition
    wired in (text/dedup.py ``incremental_dedup_kept(within_batch_near=
    True)``): the arriving batch (30% newest-by-hash) is checked against
    the at-rest corpus AND against itself — exact dups, cross near-dups,
    and transitive within-batch near-dup components (keep min id per
    component, via min-label connected components). The complete
    recurring-ingest shape; the pct=20 sibling keeps the documented
    cross-only semantics."""
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        incremental_dedup_kept,
        lsh_verified_pairs,
    )
    from backend_big_data_spark.text.sampling import stable_hash

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(doc_shingles(docs), threshold=0.5, hash_fn="md5")
    kept = incremental_dedup_kept(
        docs,
        is_new=(stable_hash(F.col("doc_id")) % 100) < 30,
        verified_pairs=pairs,
        within_batch_near=True,
    )
    return kept.orderBy("doc_id")


def _contamination_oracle() -> str:
    """The Bloom pre-filter is result-invariant (no false negatives; false
    positives are re-checked by the exact semi-join), so the bloom twin
    shares doc_contamination's oracle verbatim."""
    from backend_big_data_spark.plans import documents  # noqa: F401 (registers)
    from backend_big_data_spark.plans.registry import ORACLES

    return ORACLES["doc_contamination"]


@register("doc_contamination_bloom", oracle=_contamination_oracle())
def doc_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_contamination with the documented 100 TB add-on enabled: a Bloom
    bitmap over the train-split shingles (text/dedup.py
    ``build_shingle_bloom``) pre-drops definite misses at the scan, before
    the semi-join exchange — only possible hits shuffle. Output is
    identical to the unfiltered twin (the gate proves it)."""
    from backend_big_data_spark.text.dedup import containment_vs_index, doc_shingles
    from backend_big_data_spark.text.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    splits = hash_split(docs.select("doc_id"), F.col("doc_id"))
    ex = (
        doc_shingles(docs)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .join(splits, "doc_id")
    )
    return containment_vs_index(
        ex.filter(F.col("split") == "val").select("doc_id", "shingle"),
        ex.filter(F.col("split") == "train"),
        bloom_bits=1 << 17,
    ).orderBy("doc_id")


@register(
    "events_user_sessions",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800 THEN 1
              ELSE 0 END AS is_new
  FROM o
), s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
  FROM f
)
SELECT user_id, session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
FROM s GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (operators/timeseries.py
    ``user_sessions``): per-user 30-minute-gap sessions via the classic
    lag → new-session flag → running-sum idiom — the batch twin of the
    streaming session windows, one keyed shuffle, no state store."""
    from backend_big_data_spark.operators.timeseries import user_sessions

    ev = load_table(spark, sf_dir, "events")
    return user_sessions(ev, gap_minutes=30).orderBy("user_id", "session_idx")


@register(
    "events_daily_gapfilled",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS event_count
  FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), keys AS (SELECT DISTINCT event_type FROM daily)
SELECT s.day, k.event_type, COALESCE(d.event_count, 0) AS event_count
FROM spine s CROSS JOIN keys k
LEFT JOIN daily d ON d.day = s.day AND d.event_type = k.event_type
ORDER BY 1, 2
""",
)
def events_daily_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily counts per event type (operators/timeseries.py
    ``fill_date_gaps``): days with zero events of a type appear explicitly
    — the engine-side form of the reference's driver-side month zero-fill
    (endpoints.py:116-120). The spine is calendar-scale, never data-scale."""
    from backend_big_data_spark.operators.timeseries import fill_date_gaps

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count("*").alias("event_count"))
    return fill_date_gaps(
        daily, "day", ["event_type"], {"event_count": 0}
    ).orderBy("day", "event_type")


@register(
    "embedding_random_projection",
    oracle="""
WITH planes AS (
  SELECT b, list_transform(generate_series(1, 64), i ->
     ((CAST(concat('0x', substr(md5(concat('0:', b, ':', i - 1)), 1, 15)) AS BIGINT)
       % 2000001) - 1000000) / 1000000.0) AS pv
  FROM generate_series(0, 7) g(b)
), vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT vec_id, CAST(b AS INTEGER) AS dim_idx,
       FLOOR(list_inner_product(v, pv) / sqrt(8.0) * 1000000 + 0.5) / 1000000 AS value
FROM vecs, planes
ORDER BY vec_id, dim_idx
""",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → 8 dims
    (similarity/projection.py ``project_embeddings``): the md5-derived
    matrix family shared with the LSH oracle makes the projection
    bit-replayable in SQL. Map-only — no shuffle, no Python; the at-rest
    precursor to width-reduced ANN search."""
    from backend_big_data_spark.similarity.projection import project_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    return project_embeddings(emb, out_dims=8, dim=64).orderBy(
        "vec_id", "dim_idx"
    )


@register(
    "doc_repetition_mix",
    oracle="""
WITH f AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 2 WHEN 'zh' THEN 3 WHEN 'fr' THEN 0
              ELSE 1 END AS fac
  FROM documents
)
SELECT doc_id, lang, CAST(u AS INTEGER) AS copy_idx
FROM f, unnest(generate_series(1, fac)) t(u)
ORDER BY doc_id, copy_idx
""",
)
def doc_repetition_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based training-mix upsampling (text/mixing.py
    ``repeat_by_factor``): en×2, zh×3, fr dropped, everything else kept
    once — the epochs-per-source curriculum weight, materialized map-side
    by explode(sequence) with a stable copy index."""
    from backend_big_data_spark.text.mixing import repeat_by_factor

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = repeat_by_factor(docs, "lang", {"en": 2, "zh": 3, "fr": 0})
    return out.withColumnRenamed("copy", "copy_idx").orderBy(
        "doc_id", "copy_idx"
    )
