"""Round-6 second batch: operational readouts over certified operators —
sequence-packing efficiency and the duplicate-cluster size spectrum.

Both follow the eval-harness composition pattern (ann_recall_eval /
minhash_bias_eval): the Spark side runs the already-registered query and
aggregates its output; the oracle WRAPS that query's own registered
oracle SQL as a CTE — the eval is certified against exactly the
artifact the production query produces, in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import ORACLES, QUERIES, register
from backend_big_data_spark.sources.catalog import load_table

#: context length used by doc_pack_sequences
_CTX = 2048


def _pack_efficiency_oracle() -> str:
    return f"""
WITH packed AS ({ORACLES["doc_pack_sequences"]})
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(SUM(seq_tokens) AS BIGINT) AS packed_tokens,
       CAST(floor(CAST(1000000 * SUM(seq_tokens) AS DOUBLE)
                  / (COUNT(*) * {_CTX}) + CAST(0.5 AS DOUBLE)) AS BIGINT)
         AS fill_ppm
FROM packed
GROUP BY lang
ORDER BY lang
"""


@register("doc_pack_efficiency", oracle=_pack_efficiency_oracle())
def doc_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency readout per language shard: sequences produced,
    tokens packed, and mean fill as integer ppm of the 2048-token budget
    — the waste metric a training-data layout job watches (fill well
    below 1e6 means the packer is leaving context-window capacity on the
    table; above 1e6 means long documents overflow their start bin).
    Aggregates the registered `doc_pack_sequences` output; |langs| rows."""
    packed = QUERIES["doc_pack_sequences"](spark, sf_dir)
    return (
        packed.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_seqs"),
            F.sum("seq_tokens").cast("long").alias("packed_tokens"),
        )
        .select(
            "lang",
            "n_seqs",
            "packed_tokens",
            F.floor(
                (F.lit(1_000_000) * F.col("packed_tokens")).cast("double")
                / (F.col("n_seqs") * F.lit(_CTX))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("fill_ppm"),
        )
        .orderBy("lang")
    )


def _cluster_spectrum_oracle() -> str:
    return f"""
WITH labeled AS ({ORACLES["doc_dup_clusters"]}),
sizes AS (
  SELECT cluster_id, COUNT(*) AS sz FROM labeled GROUP BY cluster_id
),
spec AS (
  SELECT CAST(sz AS BIGINT) AS cluster_size,
         CAST(COUNT(*) AS BIGINT) AS n_clusters
  FROM sizes GROUP BY sz
  UNION ALL
  SELECT 1, CAST(COUNT(*) AS BIGINT) FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM labeled)
)
SELECT cluster_size, n_clusters,
       CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
FROM spec ORDER BY cluster_size
"""


@register("dedup_cluster_spectrum", oracle=_cluster_spectrum_oracle())
def dedup_cluster_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the dedup-pressure readout:
    how many near-dup components exist at each size, plus the singleton
    row (documents touched by no verified pair). A corpus whose spectrum
    grows a heavy tail is re-crawling the same content; the singleton
    row's share is the effective novelty rate. Composes the registered
    `doc_dup_clusters` labels (star-contraction CC); bounded output
    (|distinct sizes| rows). The only data-scale work is the label agg —
    one keyed sum — and the anti-join for singletons."""
    labels = QUERIES["doc_dup_clusters"](spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    spec = sizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters")
    )
    singles = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(labels.select("doc_id"), on="doc_id", how="anti")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(F.lit(1).cast("long").alias("cluster_size"), "n_clusters")
    )
    return (
        spec.unionByName(singles)
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


#: stable doc-id hash, the split convention shared with doc_contamination
_HID = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

_EVAL_SPANS_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
         CASE WHEN {_HID} % 100 < 20 THEN 'eval' ELSE 'train' END AS split
  FROM documents
), pk AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8 AND split = 'train'
), eg AS (
  SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS gram
  FROM toks, LATERAL unnest(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8 AND split = 'eval'
), st AS (
  SELECT doc_id, list(pos) AS starts
  FROM pk JOIN eg USING (gram) GROUP BY doc_id
), j AS (
  SELECT t.doc_id, t.t, COALESCE(s.starts, CAST([] AS BIGINT[])) AS starts
  FROM (SELECT doc_id, t FROM toks WHERE split = 'train') t
  LEFT JOIN st s USING (doc_id)
), cov AS (
  -- materialised covered-position list (nested lambdas referencing a
  -- comprehension variable silently fail to correlate in DuckDB)
  SELECT doc_id, t,
         list_distinct(flatten(list_transform(starts, p -> range(p, p + 8))))
           AS covered
  FROM j
), kk AS (
  SELECT doc_id, t,
         [t[i] FOR i IN range(1, len(t) + 1)
          IF NOT list_contains(covered, i - 1)] AS kept
  FROM cov
)
SELECT doc_id,
       CAST(len(t) AS INTEGER) AS n_tokens,
       CAST(len(t) - len(kept) AS INTEGER) AS n_removed,
       -- array_to_string of an EMPTY list is NULL in DuckDB (Spark's
       -- concat_ws gives '') — coalesce so fully-scrubbed docs agree
       md5(COALESCE(array_to_string(kept, ' '), '')) AS clean_md5
FROM kk ORDER BY doc_id
"""


@register("doc_eval_overlap_spans", oracle=_EVAL_SPANS_ORACLE)
def doc_eval_overlap_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level eval-set decontamination over the stable-hash split
    (first 20% of the id-hash space = eval, the doc_contamination
    convention): every >= 8-token span of a TRAINING document that
    appears verbatim in the eval set is stripped, and the per-doc leak
    profile reported — `text/spans.eval_overlap_profile`. The surgical
    counterpart of doc_contamination's whole-document containment ratio.
    ``clean_md5`` carries the scrubbed text compactly for the hash gate."""
    from backend_big_data_spark.text.sampling import stable_hash
    from backend_big_data_spark.text.spans import eval_overlap_profile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = stable_hash(F.col("doc_id")) % 100
    train = docs.filter(bucket >= 20)
    eval_df = docs.filter(bucket < 20)
    prof = eval_overlap_profile(train, eval_df, k=8)
    return prof.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


__all__ = [
    "dedup_cluster_spectrum",
    "doc_eval_overlap_spans",
    "doc_pack_efficiency",
]
