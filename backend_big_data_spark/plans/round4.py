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
