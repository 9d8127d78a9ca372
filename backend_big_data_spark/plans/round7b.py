"""Round-7 additions: oracle-gated audio and video near-dup detection.

Completes the multimodal dedup family as first-class registry rows:
`image_near_dup_pairs` (plans/round7.py) certified the image path; these
two certify the audio energy-envelope fingerprint and the video
majority-signature fold (`multimodal/audiofp.py`) with the same
analytic-replay discipline — the synthetic payloads are REAL WAV / PPV1
containers whose constant windows/blocks make the pooled grids equal the
generator's cell values integer-for-integer, so the DuckDB oracle can
recompute every fingerprint bit analytically. Any decode, pooling,
mixdown, majority-fold, banding, or verify bug changes the emitted pairs
and hash-fails the gate.

Certification-corpus bound: a FIXED set of doc ids (< 500 → ≤ 700 media
at every sf) because the oracle replays all pairs analytically. The
production-scale path is the shared operator
(`phash.hamming_near_dup_pairs`: map-side fingerprint, 16-bit band-key
join, no all-pairs anywhere) — the same plan already scale-adjudicated
for images.

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has no audio/video surface; these rows belong to the additive
training-data-pipeline capability set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

_MAX_DOC = 500  # analytic all-pairs oracle → fixed gate-scale corpus

#: WAV synthesis constants shared by renderer and docstrings: 72 windows
#: × 25 constant samples at 8 kHz; window means equal the cell values.
_WIN_SAMPLES = 25
_RATE = 8000


def _audio_oracle() -> str:
    """Analytic replay of the envelope-hash pipeline: the WAVs are 72
    constant 25-sample windows (row-major 8×9 grid), so each window's
    mean |amplitude| equals the generator's v(doc, r, c) exactly; the
    oracle recomputes the 64 sign-of-delta bits per clip and counts bit
    disagreements directly. Banding is absent by design: the 4×16-bit
    blocking is lossless for Hamming ≤ 3 (pigeonhole, property-tested),
    so band-join output == all-pairs output."""

    def cell(c_expr: str) -> str:
        return (
            "CAST(concat('0x', substr(md5('au:' || CAST(m.doc_id AS VARCHAR)"
            f" || ':' || CAST(rc.r AS VARCHAR) || ':' || {c_expr}), 1, 8)) "
            "AS BIGINT) % 251"
        )

    v = cell("CAST(rc.c AS VARCHAR)")
    v7 = cell("'7'")
    v8 = cell("'8'")
    return f"""
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < {_MAX_DOC}),
media AS (
  SELECT doc_id * 10 AS media_id, doc_id, 0 AS kind FROM ids
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 1 FROM ids WHERE doc_id % 5 = 2
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 2 FROM ids WHERE doc_id % 5 = 3
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


@register("audio_near_dup_pairs", oracle=_audio_oracle())
def audio_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated audio near-duplicate detection over synthetic but
    REAL WAV payloads: (media_id_a, media_id_b, hamming) for every clip
    pair within envelope-hash Hamming distance 3.

    Per doc_id (< ``_MAX_DOC``) the renderer emits a 1800-sample 16-bit
    PCM WAV of 72 constant 25-sample windows laid row-major on the
    envelope hash's 8×9 pooling grid; doc_id % 5 == 2 adds a NEAR
    variant whose last-column windows are adjusted to flip exactly
    (doc_id % 4) ≤ 3 fingerprint bits, and doc_id % 5 == 3 adds a FAR
    variant flipping 8 bits (two per 16-bit band — never a band-join
    candidate, and over-radius regardless). The Spark side runs the
    genuine production operators end-to-end: `wav.encode_wav` →
    `audiofp.audio_fp_batch` (RIFF parse + integer envelope hash,
    Arrow-batched) → the shared `phash.hamming_near_dup_pairs` band
    join. Expected pairs: exactly the near variants, at their
    constructed Hamming distances."""
    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _MAX_DOC)
        .distinct()
    )
    d = F.col("doc_id")
    media = (
        ids.select((d * 10).alias("media_id"), "doc_id", F.lit(0).alias("kind"))
        .unionByName(
            ids.where(d % 5 == 2).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(1).alias("kind")
            )
        )
        .unionByName(
            ids.where(d % 5 == 3).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(2).alias("kind")
            )
        )
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from backend_big_data_spark.multimodal.wav import encode_wav

        def cell(doc, r, c):
            h = hashlib.md5(f"au:{doc}:{r}:{c}".encode()).hexdigest()
            return int(h[:8], 16) % 251

        for pdf in batches:
            mids, payloads = [], []
            for mid, doc, kind in zip(pdf["media_id"], pdf["doc_id"], pdf["kind"]):
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
                samples = np.repeat(v.reshape(-1), _WIN_SAMPLES).astype(np.int16)
                mids.append(int(mid))
                payloads.append(encode_wav(samples, _RATE))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    from backend_big_data_spark.multimodal.audiofp import (
        audio_fp_batch,
        audio_near_dup_pairs as fp_pairs,
    )

    payloads = media.mapInPandas(render, schema="media_id long, payload binary")
    fps = audio_fp_batch(payloads, codec="wav")
    return fp_pairs(fps).orderBy("media_id_a", "media_id_b")


def _video_oracle() -> str:
    """Analytic replay of the majority-signature pipeline: each PPV1
    payload holds 3 frames of 2×2-block rasters aligned to dHash's 8×9
    grid — frames 0 and 1 share the base grid (near/far flips applied to
    BOTH), frame 2 is independent noise. The oracle recomputes every
    frame's 64 dHash bits, folds them by strict majority (sum×2 > 3),
    and counts signature-bit disagreements directly — verifying the
    majority fold itself, not just the per-frame hashing."""

    def cell(salt: str, c_expr: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5('{salt}' || CAST(m.doc_id AS "
            "VARCHAR) || ':' || CAST(rc.r AS VARCHAR) || ':' || "
            f"{c_expr}), 1, 8)) AS BIGINT) % 251"
        )

    b = cell("vf:", "CAST(rc.c AS VARCHAR)")
    b7 = cell("vf:", "'7'")
    b8 = cell("vf:", "'8'")
    noise = cell("vf2:", "CAST(rc.c AS VARCHAR)")
    return f"""
WITH ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id < {_MAX_DOC}),
media AS (
  SELECT doc_id * 10 AS media_id, doc_id, 0 AS kind FROM ids
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 1 FROM ids WHERE doc_id % 5 = 4
  UNION ALL
  SELECT doc_id * 10 + 1, doc_id, 2 FROM ids WHERE doc_id % 5 = 0
),
rc AS (SELECT t.r, u.c FROM range(8) t(r), range(9) u(c)),
cells AS (
  SELECT m.media_id, fr.f, rc.r, rc.c,
         CASE WHEN fr.f < 2 THEN
                CASE WHEN rc.c = 8
                          AND ((m.kind = 1 AND rc.r < m.doc_id % 4)
                               OR m.kind = 2)
                     THEN CASE WHEN {b8} > {b7} THEN {b7} ELSE {b7} + 1 END
                     ELSE {b}
                END
              ELSE {noise}
         END AS v
  FROM media m, rc, range(3) fr(f)
),
fbits AS (
  SELECT a.media_id, a.f, a.r, a.c,
         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
  FROM cells a
  JOIN cells b ON a.media_id = b.media_id AND a.f = b.f AND a.r = b.r
              AND b.c = a.c + 1
  WHERE a.c < 8
),
bits AS (
  SELECT media_id, r, c,
         CASE WHEN SUM(bit) * 2 > 3 THEN 1 ELSE 0 END AS bit
  FROM fbits
  GROUP BY media_id, r, c
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


@register("video_near_dup_pairs", oracle=_video_oracle())
def video_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-gated video near-duplicate detection over synthetic but
    REAL PPV1 payloads: (media_id_a, media_id_b, hamming) for every
    video pair within majority-signature Hamming distance 3.

    Per doc_id (< ``_MAX_DOC``) the renderer emits a 3-frame PPV1 video
    of 16×18 PPM frames whose 2×2 constant blocks sit on dHash's 8×9
    pooling grid — frames 0 and 1 carry the base grid, frame 2 is
    independent noise (the strict-majority fold must suppress it);
    doc_id % 5 == 4 adds a NEAR variant flipping exactly (doc_id % 4)
    signature bits in both base frames, and doc_id % 5 == 0 adds a FAR
    variant flipping 8. The Spark side runs the genuine production
    operators end-to-end: `ppm.encode_ppmv` → `audiofp.video_sig_batch`
    (container parse + per-frame dHash + majority fold, Arrow-batched) →
    the shared `phash.hamming_near_dup_pairs` band join."""
    ids = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < _MAX_DOC)
        .distinct()
    )
    d = F.col("doc_id")
    media = (
        ids.select((d * 10).alias("media_id"), "doc_id", F.lit(0).alias("kind"))
        .unionByName(
            ids.where(d % 5 == 4).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(1).alias("kind")
            )
        )
        .unionByName(
            ids.where(d % 5 == 0).select(
                (d * 10 + 1).alias("media_id"), "doc_id", F.lit(2).alias("kind")
            )
        )
    )

    def render(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from backend_big_data_spark.multimodal.ppm import encode_ppmv

        def grid(salt, doc):
            return np.array(
                [
                    [
                        int(
                            hashlib.md5(f"{salt}{doc}:{r}:{c}".encode())
                            .hexdigest()[:8],
                            16,
                        )
                        % 251
                        for c in range(9)
                    ]
                    for r in range(8)
                ],
                dtype=np.int64,
            )

        def raster(v):
            g = np.repeat(np.repeat(v.astype(np.uint8), 2, 0), 2, 1)
            return np.stack([g] * 3, axis=2)

        for pdf in batches:
            mids, payloads = [], []
            for mid, doc, kind in zip(pdf["media_id"], pdf["doc_id"], pdf["kind"]):
                doc = int(doc)
                base = grid("vf:", doc)
                if kind:
                    n_flips = doc % 4 if kind == 1 else 8
                    for r in range(n_flips):
                        b7, b8 = int(base[r, 7]), int(base[r, 8])
                        base[r, 8] = b7 if b8 > b7 else b7 + 1
                frames = [raster(base), raster(base), raster(grid("vf2:", doc))]
                mids.append(int(mid))
                payloads.append(encode_ppmv(frames, fps=4))
            yield pd.DataFrame({"media_id": mids, "payload": payloads})

    from backend_big_data_spark.multimodal.audiofp import (
        video_near_dup_pairs as sig_pairs,
        video_sig_batch,
    )

    payloads = media.mapInPandas(render, schema="media_id long, payload binary")
    sigs = video_sig_batch(payloads)
    return sig_pairs(sigs).orderBy("media_id_a", "media_id_b")


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer training over the corpus)
# ---------------------------------------------------------------------------

_BPE_MERGES = 12


def _bpe_ctes(k: int = _BPE_MERGES, include_corpus: bool = True) -> str:
    """Shared WITH-prefix replaying `text/bpe.py::learn_bpe` as a k-step
    CTE chain — see `_bpe_oracle` for the semantics argument. ``it{k}``
    is the fully-merged vocabulary (one delimiter-wrapped string per
    word), reused by the stats oracle as the encoded corpus.
    ``include_corpus=False`` drops the leading ``WITH toks/wc`` prelude
    so the chain can splice into a composite oracle that already defines
    them (`round7d._fertility_oracle`)."""
    d = "chr(31)"
    dd = f"{d}||{d}"
    corpus = [
        r"WITH toks AS MATERIALIZED (SELECT"
        r" string_split_regex(trim(text), '\s+') AS t"
        " FROM documents),",
        "wc AS MATERIALIZED (SELECT u.w AS word, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM toks, LATERAL unnest(t) AS u(w) WHERE u.w <> '' GROUP BY 1),",
    ]
    parts = (corpus if include_corpus else []) + [
        f"it0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', {d} || '\\1' || {d},"
        " 'g') AS st, n FROM wc)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
s{i} AS MATERIALIZED (SELECT st, n,
         string_split(substr(st, 2, len(st) - 2), {dd}) AS syms
         FROM it{i - 1}),
p{i} AS MATERIALIZED (SELECT syms[u.pos] AS l, syms[u.pos + 1] AS r,
         CAST(SUM(n) AS BIGINT) AS cnt
         FROM s{i}, LATERAL unnest(range(1, len(syms))) AS u(pos)
         GROUP BY 1, 2),
b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
it{i} AS MATERIALIZED (SELECT replace(st, {d}||b.l||{d}||{d}||b.r||{d},
                 {d}||b.l||b.r||{d}) AS st, n FROM it{i - 1}, b{i} b)"""
        )
    return "\n".join(parts)


def _bpe_oracle(k: int = _BPE_MERGES) -> str:
    """Replay of `text/bpe.py::learn_bpe` as a k-step CTE chain.

    Iteration state is one string per word: every symbol wrapped as
    ``chr(31)||sym||chr(31)`` and concatenated, so the greedy
    left-to-right non-overlapping merge IS SQL ``replace()`` (its scan
    resumes after each replacement — 'aaaa' + (a,a) → ['aa','aa'],
    matching the Spark fold exactly). Pair counts unnest the symbol
    list positionally; the argmax uses the same deterministic
    (count DESC, left, right) tie-break as ``min_by``'s ordering
    struct. Early exhaustion agrees too: an empty b{{i}} empties every
    later iteration, emitting no further rows — the Spark loop breaks.
    Every CTE is MATERIALIZED: each ``it{i}`` is referenced twice (pair
    scan + next iteration), so inlining would re-evaluate the chain
    exponentially."""
    steps = "\nUNION ALL\n".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS step, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return _bpe_ctes(k) + f"\nSELECT * FROM (\n{steps}\n) ORDER BY step"


@register("doc_bpe_merges", oracle=_bpe_oracle())
def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: learn the first 12 BPE merges from the
    document corpus (`text/bpe.py::learn_bpe` — one corpus scan into the
    word-frequency table, then 12 vocab-table iterations of pair-count →
    deterministic argmax → greedy fold merge, all JVM higher-order
    expressions). Output: (step, left_sym, right_sym, merged,
    pair_count) in learning order."""
    from backend_big_data_spark.text.bpe import learn_bpe

    wc = _word_counts(spark, sf_dir)
    return learn_bpe(wc, num_merges=_BPE_MERGES).orderBy("step")


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n) frequency table — the one corpus scan both BPE queries
    share; everything downstream operates on the vocabulary."""
    from backend_big_data_spark.functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _bpe_stats_oracle(k: int = _BPE_MERGES) -> str:
    """Tokenization-stats oracle: ``it{k}`` from the shared chain IS the
    encoded vocabulary — token count per word is half the delimiter
    count ((len(st) − len(chars)) // 2, integer floor division), and
    stripping the delimiters recovers the original word (merges only
    concatenate symbols). Assumes the corpus yields all k merges (holds
    at every gate sf — `doc_bpe_merges` returns exactly k rows); an
    early-exhausted chain would empty ``it{k}`` while Spark still
    encodes with the shorter merge list."""
    return _bpe_ctes(k) + f""",
enc AS MATERIALIZED (SELECT replace(st, chr(31), '') AS word,
     (len(st) - len(replace(st, chr(31), ''))) // 2 AS toks, n
     FROM it{k})
SELECT CASE WHEN len(word) <= 3 THEN '1-3' WHEN len(word) <= 6 THEN '4-6'
            WHEN len(word) <= 9 THEN '7-9' ELSE '10+' END AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS distinct_words,
       CAST(SUM(n) AS BIGINT) AS occurrences,
       CAST(SUM(len(word) * n) AS BIGINT) AS chars,
       CAST(SUM(toks * n) AS BIGINT) AS bpe_tokens
FROM enc GROUP BY 1 ORDER BY 1"""


@register("doc_bpe_token_stats", oracle=_bpe_stats_oracle())
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application: learn the 12-merge BPE vocabulary, encode
    the corpus with it (`text/bpe.py::apply_bpe` — one chained JVM
    ``aggregate`` fold per merge over the VOCABULARY table, never the
    corpus; occurrence weights rejoin the stats), and report compression
    by word-length bucket: occurrence-weighted characters vs BPE tokens.
    At production vocab sizes the encode step swaps chained folds for a
    broadcast merge-rank table inside one Arrow pass; the measured
    contract (tokens-per-word by bucket) is identical."""
    from backend_big_data_spark.text.bpe import apply_bpe, learn_bpe

    wc = _word_counts(spark, sf_dir)
    merges = [
        (r.left_sym, r.right_sym)
        for r in learn_bpe(wc, num_merges=_BPE_MERGES).orderBy("step").collect()
    ]
    enc = apply_bpe(wc, merges)
    bucket = (
        F.when(F.length("word") <= 3, "1-3")
        .when(F.length("word") <= 6, "4-6")
        .when(F.length("word") <= 9, "7-9")
        .otherwise("10+")
    )
    return (
        enc.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("distinct_words"),
            F.sum("n").alias("occurrences"),
            F.sum(F.length("word").cast("long") * F.col("n")).alias("chars"),
            F.sum(F.size("syms").cast("long") * F.col("n")).alias("bpe_tokens"),
        )
        .orderBy("len_bucket")
    )
