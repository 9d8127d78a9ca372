"""Round-6 additions: a banded-error gate for the HLL sketch path and a
MinHash estimator-bias eval.

Both are oracle-gated. ``events_hll_error_band`` exists because
``events_hll_user_rollup`` is the registry's only rows-only entry (HLL
estimates are not SQL-reproducible): this companion query turns the
sketch's accuracy contract into an exact, hash-checkable verdict —
the oracle computes the exact cardinalities and asserts the band, so a
wildly-off HLL flips booleans and fails the gate. ``minhash_bias_eval``
is the third member of the eval-harness family (with ann_recall_eval /
lsh_banding_eval): it measures the MinHash estimator's per-pair bias
against exact Jaccard, the readout you consult before changing the
signature width at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

#: Relative-error band for the HLL gate, percent. approx_count_distinct
#: runs at rsd=0.02 here, so 15% is ~7 sigma — a real accuracy contract
#: (a broken sketch fails it) that never flakes on healthy runs.
HLL_BAND_PCT = 15


@register(
    "events_hll_error_band",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_band
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_hll_error_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-error certification of the HLL distinct-count path: per
    event type, the EXACT distinct-user count (value-checked against the
    oracle) plus a boolean asserting the HLL estimate
    (``approx_count_distinct``, rsd=0.02) lands within ``HLL_BAND_PCT`` of
    it — integer cross-multiplication, no division. The oracle expects
    every verdict TRUE, so an out-of-band sketch is a hash mismatch: this
    is the driver-checkable accuracy gate for the rows-only
    ``events_hll_user_rollup``. Cost: one grouped aggregate computing
    both counts; the exact side exists only at gate scale — production
    rollups use the sketch alone."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__est"),
    )
    return (
        per.select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__est") - F.col("exact_users")) * 100
                <= F.lit(HLL_BAND_PCT) * F.col("exact_users")
            ).alias("within_band"),
        )
        .orderBy("event_type")
    )


_BIAS_NUM_HASHES = 16
_BIAS_BANDS = 4


def _minhash_bias_oracle() -> str:
    """Mirror of plans/documents._minhash_oracle's signature simulation,
    extended with the exact-Jaccard side (list_intersect on the distinct
    shingle lists) and fixed-point est/true/error columns."""
    k = _BIAS_NUM_HASHES
    r = k // _BIAS_BANDS
    mh_exprs = ",\n       ".join(
        f"list_aggregate([md5('{s}:' || x) for x in shingles], 'min') AS mh{s}"
        for s in range(k)
    )
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * r + i}" for i in range(r)),
        )
        for b in range(_BIAS_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END" for s in range(k)
    )
    return rf"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       FOR i IN range(1, len(t)-1)]) AS shingles FROM toks WHERE len(t) >= 3),
sig AS (SELECT doc_id,
       {mh_exprs}
FROM sh),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
est AS (
  SELECT doc_a, doc_b, ({agree}) AS agree
  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
),
ex AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS isz,
         len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles)) AS usz
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT e.doc_a, e.doc_b,
       CAST(e.agree * {10000 // k} AS BIGINT) AS est_fp,
       CAST(floor(CAST(10000 * x.isz AS DOUBLE) / x.usz + CAST(0.5 AS DOUBLE))
            AS BIGINT) AS true_fp,
       CAST(e.agree * {10000 // k}
            - floor(CAST(10000 * x.isz AS DOUBLE) / x.usz + CAST(0.5 AS DOUBLE))
            AS BIGINT) AS err_fp
FROM est e JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
WHERE x.isz >= 1
ORDER BY e.doc_a, e.doc_b
"""


@register("minhash_bias_eval", oracle=_minhash_bias_oracle())
def minhash_bias_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair MinHash estimator bias vs exact Jaccard — the harness you
    re-run before changing signature width or banding at corpus scale
    (companion to lsh_banding_eval, which measures RECALL of the banding;
    this measures the ESTIMATOR's error on surfaced pairs).

    Composes the certified production shape: MinHash(16)+LSH(4×4)
    proposes, the exact verify runs only on candidate docs
    (`text/dedup.lsh_verified_pairs`, threshold=0 so nothing is masked),
    then est/true snap to 1e-4 fixed point. md5 hash family so the oracle
    reproduces every stage bit-for-bit. Scale: identical to the verified
    dedup path — the quadratic stage is candidate-bounded."""
    from backend_big_data_spark.text.dedup import doc_shingles, lsh_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    verified = lsh_verified_pairs(
        sh,
        threshold=0.0,
        num_hashes=_BIAS_NUM_HASHES,
        bands=_BIAS_BANDS,
        hash_fn="md5",
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("__cnt"))
    ca = sizes.select(F.col("doc_id").alias("doc_a"), F.col("__cnt").alias("__ca"))
    cb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("__cnt").alias("__cb"))
    usz = F.col("__ca") + F.col("__cb") - F.col("intersection_size")
    true_fp = F.floor(
        (F.lit(10000) * F.col("intersection_size")).cast("double") / usz
        + F.lit(0.5)
    ).cast("long")
    est_fp = F.floor(
        F.col("est_jaccard") * F.lit(10000) + F.lit(0.5)
    ).cast("long")
    return (
        verified.join(ca, on="doc_a")
        .join(cb, on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            est_fp.alias("est_fp"),
            true_fp.alias("true_fp"),
            (est_fp - true_fp).alias("err_fp"),
        )
        .orderBy("doc_a", "doc_b")
    )


__all__ = ["events_hll_error_band", "minhash_bias_eval"]
