"""Document-table query plans: text analysis + dedup (north-star additive
scope, graded alongside SURVEY.md §2).

The MinHash-LSH and exact-Jaccard plans share tokenization/shingling with
their DuckDB oracles exactly (whitespace tokens, 3-word shingles, md5 hash
family), so even the LSH pipeline is value-checked end-to-end, not just
row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.multimodal.binary_ops import (
    fingerprint_binary,
    to_media_table,
)
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import ensure_parallelism, load_table
from backend_big_data_spark.text.dedup import (
    doc_shingles,
    exact_dedup_fingerprints,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from backend_big_data_spark.text.langid import predict_lang
from backend_big_data_spark.text.quality import quality_profile

# Shared tokenize/shingle SQL fragments for the DuckDB oracles (must mirror
# functions/textfns.py exactly: trim → split on \s+ → 3-gram → distinct).
_TOKS_CTE = r"toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)"
_SHINGLES_CTE = (
    "sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] "
    "FOR i IN range(1, len(t)-1)]) AS shingles FROM toks WHERE len(t) >= 3)"
)

NUM_HASHES = 16
BANDS = 4


@register(
    "doc_exact_dedup",
    oracle="""
SELECT md5(text) AS fingerprint, COUNT(*) AS dup_count, MIN(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1 ORDER BY fingerprint
""",
)
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash — one shuffle on the fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_fingerprints(docs).orderBy("fingerprint")


@register(
    "doc_quality_profile",
    oracle=r"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS INTEGER) AS n_distinct_tokens,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INTEGER) AS chars_no_ws,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS bpe_tokens,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
              x -> x IN ('the','a','an','of','and','in','to','is','it','that'))) AS INTEGER) AS stopword_hits
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, chars_no_ws, bpe_tokens, stopword_hits,
       ROUND(chars_no_ws / n_tokens, 4) AS avg_token_len,
       ROUND(n_distinct_tokens / n_tokens, 4) AS ttr,
       ROUND(stopword_hits / n_tokens, 4) AS stopword_ratio
FROM base ORDER BY doc_id
""",
)
def doc_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring, all codegen-side column math."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return quality_profile(docs).orderBy("doc_id")


@register(
    "doc_stats_by_lang",
    oracle="""
SELECT lang, COUNT(*) AS doc_count, ROUND(AVG(n_chars), 4) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
""",
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@register(
    "doc_langid",
    oracle=r"""
WITH s AS (
  SELECT doc_id, lang AS actual_lang,
    len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x IN ('the','a','an','of','and','in','to','is'))) AS s_en,
    len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x IN ('el','la','los','de','y','que','un','una'))) AS s_es,
    len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x IN ('le','la','les','de','et','un','une','est'))) AS s_fr,
    len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x IN ('der','die','das','und','ein','eine','ist','nicht'))) AS s_de,
    len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x IN ('的','是','了','在','和','有','我','不'))) AS s_zh
  FROM documents
)
SELECT doc_id, actual_lang,
  CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'und'
       WHEN s_en >= greatest(s_es, s_fr, s_de, s_zh) THEN 'en'
       WHEN s_es >= greatest(s_fr, s_de, s_zh) THEN 'es'
       WHEN s_fr >= greatest(s_de, s_zh) THEN 'fr'
       WHEN s_de >= s_zh THEN 'de'
       ELSE 'zh' END AS predicted_lang
FROM s ORDER BY doc_id
""",
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID with deterministic priority
    tie-break (en > es > fr > de > zh)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        predict_lang(F.col("text")).alias("predicted_lang"),
    ).orderBy("doc_id")


@register(
    "doc_sha256_fingerprint",
    oracle="""
SELECT doc_id AS media_id, sha256(text) AS payload_sha256,
       CAST(strlen(text) AS BIGINT) AS payload_bytes
FROM documents ORDER BY media_id
""",
)
def doc_sha256_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing gate: documents.text → binary payload (media
    schema) → Arrow-batched mapInPandas sha256. Proves the binary-column
    pipeline end-to-end against a pure-SQL oracle."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    media = to_media_table(docs, "doc_id", F.col("text"), kind="text")
    return fingerprint_binary(media).orderBy("media_id")


@register(
    "doc_ngram_jaccard_pairs",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
e AS (SELECT doc_id, len(shingles) AS sh_count, unnest(shingles) AS shingle FROM sh),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_count AS ca, b.sh_count AS cb, COUNT(*) AS intersection_size
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, intersection_size,
       ROUND(intersection_size / (ca + cb - intersection_size), 6) AS jaccard
FROM p
WHERE intersection_size / (ca + cb - intersection_size) >= 0.2
ORDER BY doc_a, doc_b
""",
)
def doc_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs, ALL-PAIRS form — the explicit
    ``max_df=None`` opt-in exists here purely as the oracle cross-check for
    the capped form and for `text/setjoin.prefix_filtered_jaccard_pairs`
    (the exact path that scales); production callers get the capped default."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(doc_shingles(docs), threshold=0.2, max_df=None)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "doc_ngram_jaccard_capped",
    oracle=f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
e AS (SELECT doc_id, len(shingles) AS sh_count, unnest(shingles) AS shingle FROM sh),
keep AS (SELECT shingle FROM e GROUP BY shingle HAVING COUNT(*) <= 64),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_count AS ca, b.sh_count AS cb, COUNT(*) AS intersection_size
  FROM e a JOIN keep USING (shingle) JOIN e b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, intersection_size,
       ROUND(intersection_size / (ca + cb - intersection_size), 6) AS jaccard
FROM p
WHERE intersection_size / (ca + cb - intersection_size) >= 0.2
ORDER BY doc_a, doc_b
""",
)
def doc_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale form of exact Jaccard: shingles whose document
    frequency exceeds ``max_df=64`` are dropped from the inverted index
    before pair generation (they expand to O(df²) pairs while carrying no
    dedup signal — the skew guard that makes the op viable at 100 TB).
    Denominators keep the FULL per-doc shingle counts, so scores for
    surviving pairs only drop when a pair actually shared a dropped
    shingle; the oracle mirrors the cap exactly, so this stays
    value-checked rather than rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(doc_shingles(docs), threshold=0.2, max_df=64)
        .orderBy("doc_a", "doc_b")
    )


def _minhash_oracle() -> str:
    mh_exprs = ",\n       ".join(
        f"list_aggregate([md5('{s}:' || x) for x in shingles], 'min') AS mh{s}"
        for s in range(NUM_HASHES)
    )
    r = NUM_HASHES // BANDS
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key=" || '|' || ".join(f"mh{b * r + i}" for i in range(r)),
        )
        for b in range(BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END" for s in range(NUM_HASHES)
    )
    return f"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
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
)
SELECT doc_a, doc_b, ({agree}) / {NUM_HASHES}.0 AS est_jaccard
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
ORDER BY doc_a, doc_b
"""


@register("doc_minhash_lsh_pairs", oracle=_minhash_oracle())
def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) candidate pairs with estimated
    Jaccard — md5 hash family so the DuckDB oracle reproduces every stage
    bit-for-bit. Production default is hash_fn='xxhash64' (same plan, JVM
    hash, no portability constraint)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        doc_shingles(docs), num_hashes=NUM_HASHES, hash_fn="md5"
    )
    return (
        lsh_candidate_pairs(sigs, num_hashes=NUM_HASHES, bands=BANDS, hash_fn="md5")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "doc_simhash",
    oracle="""
WITH hv AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS v
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE length(trim(text)) > 0)
), bits AS (
  SELECT doc_id, p,
         SUM(CASE WHEN (v >> p) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hv, (SELECT unnest(generate_series(0, 63)) AS p) ps
  GROUP BY doc_id, p
), sig AS (
  SELECT doc_id,
         bit_or(CASE WHEN vote > 0 THEN CAST(1 AS UBIGINT) << p
                     ELSE CAST(0 AS UBIGINT) END) AS s
  FROM bits GROUP BY doc_id
), nt AS (
  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
  FROM documents WHERE length(trim(text)) > 0
)
SELECT sig.doc_id, lpad(lower(to_hex(s)), 16, '0') AS simhash_hex, nt.n_tokens
FROM sig JOIN nt ON sig.doc_id = nt.doc_id
ORDER BY sig.doc_id
""",
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures (Arrow-batched numpy bit-majority in a
    pandas UDF). The oracle reproduces the ENTIRE reduction in pure SQL —
    md5-derived 64-bit token hashes, per-bit ±1 votes via a 64-row
    generate_series cross join, sign, and bit_or reassembly — matching the
    numpy path bit-for-bit (big-endian first 8 md5 bytes, votes>0 → 1)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return simhash_signatures(docs).orderBy("doc_id")


@register(
    "doc_tfidf_top_terms",
    oracle="""
WITH terms AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / df) * 10000 + 0.5) / 10000 AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, CAST(term_rank AS INTEGER) AS term_rank
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank
""",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document — the classic corpus-relevance
    primitive a training-data pipeline uses for keyword extraction and
    quality filtering. Two hash aggregates (term frequency per doc,
    document frequency per term) + one keyed window. The DF table joins
    back by term with NO forced hint: at test scale AQE/size estimation
    broadcasts it anyway, while at a 100 TB corpus the vocabulary is tens
    of GB and a hard-coded broadcast would OOM — left as a keyed shuffle
    that AQE skew-splits. The corpus size N is a 1-row broadcast. Scores are
    half-up-rounded BEFORE ranking so the cross-engine ulp difference in
    ``ln`` cannot flip the top-3 ordering (term is the tie-break). Shares
    its scoring finisher (`text/bm25.py::tfidf_top_terms`) with the
    maintained-index twin `doc_tfidf_from_index`."""
    from backend_big_data_spark.text.bm25 import tfidf_top_terms

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    terms = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{2,}"), F.lit(0))
        ).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return tfidf_top_terms(tf, n_docs, k=3).orderBy("doc_id", "term_rank")


# -- training-data layout ops: rebalance, pack, decontaminate ---------------

#: portable stable 60-bit hash of doc_id (mirrors text/sampling.stable_hash)
_HID = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "doc_stratified_sample",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE ({_HID} % 100) < (CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 50 ELSE 100 END)
ORDER BY doc_id
""",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling (text/sampling.py
    ``stratified_hash_sample``): deflate the dominant languages (en→25%,
    zh→50%, rest kept) by stable key hash — the training-mix rebalancer.
    One codegen'd filter on the scan; no shuffle, no per-group passes,
    identical selection on every run and engine."""
    from backend_big_data_spark.text.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        docs, F.col("doc_id"), "lang", {"en": 25, "zh": 50}, default_pct=100
    ).orderBy("doc_id")


@register(
    "doc_pack_sequences",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, lang, len(string_split_regex(trim(text), '\s+')) AS n_tok
  FROM documents WHERE length(trim(text)) > 0
), o AS (
  SELECT lang, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY {_HID}, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT lang, CAST(FLOOR((cum - n_tok) / 2048.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS seq_tokens
FROM o GROUP BY 1, 2 ORDER BY lang, seq_id
""",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (text/sampling.py
    ``pack_sequences``): per-language deterministic-shuffle order, cut the
    concatenated token stream every 2048 tokens, assign each doc to the
    sequence its first token lands in, then profile the packed sequences
    (docs and tokens per sequence). Packing is inherently sequential so it
    is sharded per language — one keyed window shuffle, no global funnel."""
    from backend_big_data_spark.functions.textfns import tokens
    from backend_big_data_spark.text.sampling import pack_sequences

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ).filter(F.length(F.trim("text")) > 0)
    base = docs.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    packed = pack_sequences(
        base, "n_tok", ctx_len=2048, key=F.col("doc_id"), shard_col="lang"
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("seq_tokens"))
        .orderBy("lang", "seq_id")
    )


@register(
    "doc_contamination",
    oracle=rf"""
WITH {_TOKS_CTE},
{_SHINGLES_CTE},
sp AS (
  SELECT doc_id,
         CASE WHEN {_HID} % 100 < 10 THEN 'val'
              WHEN {_HID} % 100 < 20 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
),
ex AS (
  SELECT sh.doc_id, unnest(shingles) AS shingle, split
  FROM sh JOIN sp USING (doc_id)
),
train_idx AS (SELECT DISTINCT shingle FROM ex WHERE split = 'train'),
val AS (SELECT * FROM ex WHERE split = 'val'),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM val GROUP BY 1),
hit AS (
  SELECT doc_id, COUNT(*) AS n_contaminated FROM val
  WHERE shingle IN (SELECT shingle FROM train_idx) GROUP BY 1
)
SELECT t.doc_id, t.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       ROUND(COALESCE(h.n_contaminated, 0) / t.n_shingles, 6) AS contamination
FROM tot t LEFT JOIN hit h USING (doc_id) ORDER BY t.doc_id
""",
)
def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination check (text/dedup.py
    ``containment_vs_index``): hash-split the corpus (text/sampling.py
    ``hash_split``), then for every VAL document measure the fraction of
    its distinct 3-word shingles that occur anywhere in the TRAIN split —
    containment ≈ 1 flags eval data leaked into training. One semi-join
    keyed on the shingle (inverted-index shape)."""
    from backend_big_data_spark.text.dedup import containment_vs_index
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
    ).orderBy("doc_id")


def _incremental_dedup_oracle() -> str:
    """Batch-vs-corpus dedup oracle: reuse the composed verified-pair SQL;
    split = the same stable hash the engine uses (batch = bucket < 20)."""
    from backend_big_data_spark.plans.extended import _lsh_verified_oracle

    verified = _lsh_verified_oracle().strip()
    verified = verified[: verified.rindex("ORDER BY")]
    return f"""
WITH near AS (
{verified}
),
sp AS (SELECT doc_id, ({_HID} % 100) < 20 AS is_new FROM documents),
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
)
SELECT d.doc_id FROM documents d JOIN sp USING (doc_id)
WHERE sp.is_new
  AND d.doc_id NOT IN (SELECT doc_id FROM exact_removed
                       UNION SELECT doc_id FROM near_removed)
ORDER BY d.doc_id
"""


@register("doc_incremental_dedup", oracle=_incremental_dedup_oracle())
def doc_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (text/dedup.py ``incremental_dedup_kept``):
    treat the 20% newest-by-hash docs as the ARRIVING batch and the rest as
    the at-rest corpus; admit only batch docs that are neither exact dups
    (vs corpus, or within-batch non-canonical) nor verified near-dups of an
    existing doc. The production shape: nothing already admitted is
    re-evaluated, and key-hash split stability makes re-runs idempotent."""
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
        is_new=(stable_hash(F.col("doc_id")) % 100) < 20,
        verified_pairs=pairs,
    )
    return kept.orderBy("doc_id")
