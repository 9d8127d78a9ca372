"""Round-7 additions: an oracle-gated registry row for the image
near-dup path, and the banded oracle upgrade for the HLL rollup.

``image_near_dup_pairs`` makes multimodal dedup first-class alongside
``multimodal_fingerprint`` (VERDICT r06 item 4): the text ingest family
is driver-certified, but the dHash path was pytest-only. The query runs
the REAL pipeline — render deterministic PPM payloads, decode them with
the real codec, perceptual-hash with `multimodal/phash.dhash64`, find
pairs with the banded-blocking + exact-Hamming verify operator — and the
oracle replays the pooled-grid arithmetic analytically (the synthetic
rasters are constant 2×2 blocks aligned to dHash's 8×9 pooling grid, so
the pooled value equals the block value EXACTLY, integer-for-integer;
any codec, pooling, hashing, banding, or verify bug changes the emitted
pairs and hash-fails the gate).

``events_hll_user_rollup`` (re-registered over `plans/extended.py`'s
rows-only original — deliberate override, import-ordered after it; the
original file is unchanged so its sibling queries keep their
certification) now emits the banded formulation VERDICT r06 item 7
asked for: same mergeable-sketch stages (daily ``hll_sketch_agg`` →
``hll_union_agg``), but the output is the exact count plus a
band-verdict boolean the oracle can check — the registry's last
``no_oracle`` row becomes oracle-gated, 196/196.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.plans.round6 import HLL_BAND_PCT
from backend_big_data_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# image near-dup pairs (oracle-gated multimodal dedup)
# ---------------------------------------------------------------------------

#: Synthetic pooled-grid cell value, shared bit-for-bit by the Spark
#: renderer and the oracle SQL: the first 8 hex chars of
#: md5("{doc}:{r}:{c}") as an integer, mod 251 (cryptographic mixing —
#: arithmetic hashes left adjacent-cell comparisons correlated and
#: produced thousands of coincidental near pairs; md5 gives 0 across the
#: 500-doc corpus — and mod 251 keeps the +1 flip adjustment below uint8
#: saturation).

#: Gate-scale bound: the synthetic certification corpus is a FIXED set of
#: doc ids (< 500 → ≤ 700 images at every sf), because the oracle verifies
#: with an analytic all-pairs replay. The production-scale path is the
#: operator itself (`phash.hamming_near_dup_pairs`: map-side hash, 16-bit
#: band-key join, no all-pairs anywhere) — measured separately by the
#: streaming image-ingest scale tests.
_IMG_MAX_DOC = 500


def _img_oracle() -> str:
    """Analytic replay of the synthetic-raster dHash pipeline.

    The rasters are 8×9 grids of constant 2×2 blocks, so dHash's pooled
    grid equals the generator's v(doc, r, c) exactly; the oracle computes
    the same 64 comparison bits per image and keeps pairs with Hamming ≤ 3
    by direct bit disagreement counting. Banding is deliberately absent
    here: 4×16-bit blocking is LOSSLESS for Hamming ≤ 3 (pigeonhole,
    property-tested in tests/test_phash.py), so band-join output ==
    all-pairs output — the oracle checks the semantics, Spark runs the
    scalable plan."""
    def cell(c_expr: str) -> str:
        return (
            "CAST(concat('0x', substr(md5(CAST(m.doc_id AS VARCHAR) || ':' "
            f"|| CAST(rc.r AS VARCHAR) || ':' || {c_expr}), 1, 8)) AS BIGINT)"
            " % 251"
        )

    v = cell("CAST(rc.c AS VARCHAR)")
    v7 = cell("'7'")
    v8 = cell("'8'")
    return f"""
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < {_IMG_MAX_DOC}),
media AS (
  SELECT doc_id * 10 AS media_id, doc_id, 0 AS kind FROM ids
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 1 FROM ids WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 2 FROM ids WHERE doc_id % 5 = 1
),
rc AS (SELECT t.r, u.c FROM range(8) t(r), range(9) u(c)),
cells AS (
  SELECT m.media_id, rc.r, rc.c,
         CASE WHEN rc.c = 8
                   AND ((m.kind = 1 AND rc.r < m.doc_id % 4) OR m.kind = 2)
              THEN CASE WHEN {v8} > {v7} THEN {v7} ELSE {v7} + 1 END
              ELSE {v}
         END AS v
  FROM media m, rc
),
bits AS (
  SELECT a.media_id, a.r, a.c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM cells a
  JOIN cells b ON a.media_id = b.media_id AND a.r = b.r AND b.c = a.c + 1
  WHERE a.c < 8
),
ham AS (
  SELECT x.media_id AS media_id_a, y.media_id AS media_id_b,
         CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT) AS hamming
  FROM bits x
  JOIN bits y ON x.r = y.r AND x.c = y.c AND x.media_id < y.media_id
  GROUP BY 1, 2
)
SELECT media_id_a, media_id_b, hamming
FROM ham
WHERE hamming <= 3
ORDER BY media_id_a, media_id_b
"""


@register("image_near_dup_pairs", oracle=_img_oracle())
def image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated image near-duplicate detection over synthetic but
    REAL image payloads: (media_id_a, media_id_b, hamming) for every
    image pair within dHash Hamming distance 3.

    Per doc_id (< ``_IMG_MAX_DOC``) the renderer emits a 16×18 grayscale
    PPM whose 2×2 constant blocks sit exactly on dHash's 8-row × 9-column
    pooling grid; doc_id % 5 == 0 adds a NEAR variant whose last-column
    cells are adjusted to flip exactly (doc_id % 4) ≤ 3 hash bits, and
    doc_id % 5 == 1 adds a FAR variant flipping 8 bits (one per band —
    never a candidate, and over-radius regardless). The Spark side then
    runs the genuine production operators end-to-end: `ppm.encode_ppm` →
    `phash.dhash_image_batch` (decode + hash, Arrow-batched) →
    `phash.hamming_near_dup_pairs` (4×16-bit band join + bit_count
    verify, zero Python). Expected pairs: exactly the near variants,
    at their constructed Hamming distances."""
    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _IMG_MAX_DOC)
        .distinct()
    )
    d = F.col("doc_id")
    media = (
        ids.select((d * 10).alias("media_id"), "doc_id", F.lit(0).alias("kind"))
        .unionByName(
            ids.where(d % 5 == 0).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(1).alias("kind")
            )
        )
        .unionByName(
            ids.where(d % 5 == 1).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(2).alias("kind")
            )
        )
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from backend_big_data_spark.multimodal.ppm import encode_ppm

        def cell(doc, r, c):
            h = hashlib.md5(f"{doc}:{r}:{c}".encode()).hexdigest()
            return int(h[:8], 16) % 251

        for pdf in batches:
            mids, payloads = [], []
            for mid, doc, kind in zip(
                pdf["media_id"], pdf["doc_id"], pdf["kind"]
            ):
                doc = int(doc)
                v = np.array(
                    [[cell(doc, r, c) for c in range(9)] for r in range(8)],
                    dtype=np.int64,
                )
                if kind:
                    n_flips = doc % 4 if kind == 1 else 8
                    for r in range(n_flips):
                        v7, v8 = int(v[r, 7]), int(v[r, 8])
                        v[r, 8] = v7 if v8 > v7 else v7 + 1
                raster = np.repeat(np.repeat(v.astype(np.uint8), 2, 0), 2, 1)
                mids.append(int(mid))
                payloads.append(encode_ppm(np.stack([raster] * 3, axis=2)))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    from backend_big_data_spark.multimodal.phash import (
        dhash_image_batch,
        hamming_near_dup_pairs,
    )

    payloads = media.mapInPandas(render, schema="media_id long, payload binary")
    hashes = dhash_image_batch(payloads, codec="ppm")
    return hamming_near_dup_pairs(hashes).orderBy("media_id_a", "media_id_b")


# ---------------------------------------------------------------------------
# HLL rollup: banded, oracle-gated (overrides the rows-only original)
# ---------------------------------------------------------------------------


@register(
    "events_hll_user_rollup",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merged_within_band
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting, banded so the driver can gate
    it — the registry's last rows-only entry made oracle-checkable
    (VERDICT r06 item 7; deliberate re-registration over the
    `plans/extended.py` original, whose file is untouched).

    Same 100 TB pattern as before: one DataSketches HLL sketch per
    (event_type, day) (``hll_sketch_agg`` lgK=14, ~KBs each), merged per
    event type with ``hll_union_agg`` — daily ingest APPENDS sketch rows,
    never rescans raw events, and arbitrary ranges merge in milliseconds.
    The output adds the exact count and a verdict boolean asserting the
    MERGED estimate lands within ``HLL_BAND_PCT``% of it (integer
    cross-multiplication); the oracle expects every verdict TRUE, so a
    broken sketch/union is a hash mismatch, exactly like
    `events_hll_error_band` gates the one-pass sketch. The exact side
    exists only at gate scale — production rollups serve the sketch
    alone."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", False)).alias("__est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        exact.join(F.broadcast(merged), "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__est") - F.col("exact_users")) * 100
                <= F.lit(HLL_BAND_PCT) * F.col("exact_users")
            ).alias("merged_within_band"),
        )
        .orderBy("event_type")
    )
