"""Round-9 additions: streaming best-match entity resolution and
Kneser-Ney trigram LM.

- `streaming/setsim_ingest.py` gained ``link_mode="topk"`` — the
  production ER link contract (each batch record emits its k best
  master matches deterministically, ≤ |batch|·k rows per batch no
  matter how much duplicate mass the master holds). The registered
  query drives the SINK itself — masters admitted from one feed, a
  probe batch linked in top-k mode — against a pure-SQL twin of the
  whole admit→link pipeline.
- `text/kneser_ney.py` gained the trigram order with recursive
  lower-order interpolation (the standard pipeline readout); same
  exact-BIGINT-fraction discipline as the bigram model (D = 3/4 at
  every order), so the model table and the perplexity readout hash
  exactly against DuckDB.

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has none of these; they belong to the additive training-data-pipeline
capability set.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# streaming best-match (top-k) entity resolution
# ---------------------------------------------------------------------------

_REC = "p_name || ' ' || p_brand || ' ' || p_type"
_TOKS_OF = (
    "list_distinct(list_filter(string_split_regex({col}, '\\s+'),"
    " x -> x <> ''))"
)

_STREAM_BEST_ORACLE = f"""
WITH raw AS (
  SELECT CAST(p_partkey AS BIGINT) AS id, {_REC} AS s FROM part
), m0 AS (  -- batch-0 admission: empty master, exact dups resolve to min id
  SELECT min(id) AS id, s FROM raw WHERE id % 2 = 0 GROUP BY s
), ms AS (
  SELECT id, toks, len(toks) AS sz
  FROM (SELECT id, {_TOKS_OF.format(col='s')} AS toks FROM m0)
  WHERE len(toks) > 0
), ps AS (
  SELECT id, toks, len(toks) AS sz
  FROM (
    SELECT id, {_TOKS_OF.format(col='s')} AS toks
    FROM raw WHERE id % 2 = 1
  )
  WHERE len(toks) > 0
), p AS (
  SELECT a.id AS dirty_id, b.id AS master_id,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_cnt,
         CAST(a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS BIGINT)
           AS union_cnt
  FROM ps a JOIN ms b ON TRUE
  WHERE len(list_intersect(a.toks, b.toks)) * 5
        >= (a.sz + b.sz - len(list_intersect(a.toks, b.toks))) * 3
), r AS (
  SELECT dirty_id, master_id, inter_cnt, union_cnt,
         CAST(row_number() OVER (
           PARTITION BY dirty_id
           ORDER BY (inter_cnt * 4294967296) // union_cnt DESC, master_id
         ) AS INTEGER) AS rank
  FROM p
)
SELECT dirty_id, master_id, rank, inter_cnt, union_cnt
FROM r WHERE rank <= 1 ORDER BY dirty_id, master_id
"""


@register("part_token_best_match_stream", oracle=_STREAM_BEST_ORACLE)
def part_token_best_match_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming best-match entity resolution, end to end through the
    SINK (`streaming/setsim_ingest.setsim_ingest_sink` with
    ``link_mode="topk"``): batch 0 admits the even-partkey records as
    master entities (exact dups resolve to the min id — the sink's
    admission rule), batch 1 links every odd-partkey record to its
    single best master at Jaccard ≥ 3/5 via the maintained token index
    + tokfreq sidecar, emitting the deterministic winner (exact-fraction
    2^32-scaled key, master-id tie-break — the
    `setsimjoin.token_jaccard_topk` contract at |batch|·k output). The
    oracle is a pure-SQL twin of the whole admit→link pipeline, so the
    gate certifies the SINK semantics, not just the operator's.

    The sink runs against a throwaway master dir (per-invocation temp
    path; content — and therefore the result hash — is
    path-independent)."""
    from backend_big_data_spark.streaming.setsim_ingest import (
        setsim_ingest_sink,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )
    mdir = tempfile.mkdtemp(prefix="setsim_topk_stream_")
    sink = setsim_ingest_sink(mdir, t_num=3, t_den=5, link_mode="topk", k=1)
    sink(part.where(F.col("id") % 2 == 0), 0)
    sink(part.where(F.col("id") % 2 == 1), 1)
    return spark.read.parquet(os.path.join(mdir, "links", "batch=1")).orderBy(
        "dirty_id", "master_id"
    )

# ---------------------------------------------------------------------------
# interpolated Kneser-Ney trigram LM (recursive lower-order interpolation)
# ---------------------------------------------------------------------------

_KN3_CTES = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> {'w1': t[i], 'w2': t[i + 1], 'w3': t[i + 2]})) AS s
  FROM toks WHERE len(t) >= 3
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3 FROM occ0
), c123 AS (
  SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
  FROM occ GROUP BY 1, 2, 3
), ctx3 AS (
  SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12dot,
         CAST(COUNT(*) AS BIGINT) AS n3lam
  FROM c123 GROUP BY 1, 2
), c23p AS (
  SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS c23p FROM c123 GROUP BY 1, 2
), ctx2 AS (
  SELECT w2, CAST(SUM(c23p) AS BIGINT) AS c2pdot,
         CAST(COUNT(*) AS BIGINT) AS n2lam
  FROM c23p GROUP BY 1
), u3 AS (
  SELECT w3, CAST(COUNT(*) AS BIGINT) AS u3 FROM c23p GROUP BY 1
), ut AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS utot FROM c23p
), model AS (
  SELECT c123.w1, c123.w2, c123.w3, c123.c123,
         CAST(greatest(4 * c123.c123 - 3, 0)
                * (4 * ctx2.c2pdot * ut.utot)
              + 3 * ctx3.n3lam
                * (greatest(4 * c23p.c23p - 3, 0) * ut.utot
                   + 3 * ctx2.n2lam * u3.u3)
           AS BIGINT) AS kn_num,
         CAST(4 * ctx3.c12dot * 4 * ctx2.c2pdot * ut.utot AS BIGINT)
           AS kn_den
  FROM c123
  JOIN c23p USING (w2, w3)
  JOIN ctx3 USING (w1, w2)
  JOIN ctx2 USING (w2)
  JOIN u3 USING (w3)
  CROSS JOIN ut
)"""

_KN3_MODEL_ORACLE = (
    _KN3_CTES
    + """
SELECT w1, w2, w3, c123, kn_num, kn_den
FROM model ORDER BY c123 DESC, w1, w2, w3 LIMIT 25
"""
)


@register("doc_kn3_trigram_model", oracle=_KN3_MODEL_ORACLE)
def doc_kn3_trigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM model over the document corpus
    (`text/kneser_ney.py::kn_trigram_model` — recursive lower-order
    interpolation, continuation counts at every order, D = 3/4, the
    whole recursion folded into one exact BIGINT fraction per trigram).
    Output: the 25 most frequent trigrams with raw count and KN
    numerator/denominator — integer columns end to end, exact hash."""
    from backend_big_data_spark.text.kneser_ney import kn_trigram_model

    docs = load_table(spark, sf_dir, "documents")
    return (
        kn_trigram_model(docs)
        .orderBy(F.desc("c123"), "w1", "w2", "w3")
        .limit(25)
    )


_KN3_NLL_ORACLE = (
    _KN3_CTES
    + """
, scored AS (
  SELECT o.doc_id, CAST(COUNT(*) AS INTEGER) AS n_trigrams,
         -SUM(CAST(floor((ln(m.kn_num) - ln(m.kn_den)) * 10000 + 0.5)
                   AS BIGINT)) AS nll_fp
  FROM occ o
  JOIN model m ON o.w1 = m.w1 AND o.w2 = m.w2 AND o.w3 = m.w3
  GROUP BY 1
)
SELECT CASE WHEN n_trigrams <= 20 THEN 'a:1-20'
            WHEN n_trigrams <= 60 THEN 'b:21-60'
            ELSE 'c:61+' END AS size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_trigrams) AS BIGINT) AS total_trigrams,
       CAST(SUM(nll_fp) AS BIGINT) AS total_nll_fp
FROM scored GROUP BY 1 ORDER BY 1
"""
)


@register("doc_kn3_perplexity", oracle=_KN3_NLL_ORACLE)
def doc_kn3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus perplexity audit under the KN trigram model
    (`text/kneser_ney.py::kn3_doc_nll` — self-trained, so every scored
    trigram has a model row): per-document fixed-point NLL summed into
    document-size buckets. The readout that decides perplexity-filter
    thresholds, at trigram order (compare `doc_kn_perplexity`)."""
    from backend_big_data_spark.text.kneser_ney import kn3_doc_nll

    docs = load_table(spark, sf_dir, "documents")
    scored = kn3_doc_nll(docs)
    bucket = (
        F.when(F.col("n_trigrams") <= 20, "a:1-20")
        .when(F.col("n_trigrams") <= 60, "b:21-60")
        .otherwise("c:61+")
    )
    return (
        scored.groupBy(bucket.alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").cast("long").alias("total_trigrams"),
            F.sum("nll_fp").alias("total_nll_fp"),
        )
        .orderBy("size_bucket")
    )


# ---------------------------------------------------------------------------
# incremental LM training from maintained count sidecars
# ---------------------------------------------------------------------------


def _kn_incremental_oracle() -> str:
    # the SAME SQL twin as the full-retrain doc_kn_bigram_model: counts
    # are additive, so the incrementally-maintained model must hash-match
    # the full retrain exactly — that equality IS the capability claimed
    from backend_big_data_spark.plans.round8 import _KN_MODEL_ORACLE

    return _KN_MODEL_ORACLE


@register("doc_kn_incremental_model", oracle=_kn_incremental_oracle())
def doc_kn_incremental_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KN bigram training end to end through the LM-count
    sink (`streaming/lm_ingest.py`): the document corpus arrives as two
    micro-batches (split on doc_id parity), each batch appending its
    bigram counts as a maintained sidecar; the model then builds from
    the SUMMED sidecars
    (`text/kneser_ney.kn_bigram_model_from_counts`) without touching a
    single document. The oracle is doc_kn_bigram_model's full-retrain
    SQL twin — n-gram counts are additive, so incremental training must
    equal the full retrain bit for bit, and this row certifies exactly
    that equality. Same top-25 readout as the full-retrain query."""
    import tempfile

    from backend_big_data_spark.streaming.lm_ingest import (
        lm_ingest_sink,
        read_lm_bigram_counts,
    )
    from backend_big_data_spark.text.kneser_ney import (
        kn_bigram_model_from_counts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = tempfile.mkdtemp(prefix="lm_ingest_inc_")
    sink = lm_ingest_sink(cdir)
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    counts = read_lm_bigram_counts(spark, cdir)
    return (
        kn_bigram_model_from_counts(counts)
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(25)
    )


@register("doc_kn3_incremental_model", oracle=_KN3_MODEL_ORACLE)
def doc_kn3_incremental_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trigram twin of `doc_kn_incremental_model`: KN trigram model
    built from the LM sink's maintained per-batch trigram-count sidecars
    (`text/kneser_ney.kn_trigram_model_from_counts`) — every lower order
    of the KN recursion is a continuation count over the count TABLE, so
    the maintained counts determine the whole model. Shares
    `doc_kn3_trigram_model`'s full-retrain SQL twin: the hash equality
    certifies incremental ≡ retrain at order 3."""
    import tempfile

    from backend_big_data_spark.streaming.lm_ingest import (
        lm_ingest_sink,
        read_lm_trigram_counts,
    )
    from backend_big_data_spark.text.kneser_ney import (
        kn_trigram_model_from_counts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = tempfile.mkdtemp(prefix="lm_ingest_inc3_")
    sink = lm_ingest_sink(cdir)
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    counts = read_lm_trigram_counts(spark, cdir)
    return (
        kn_trigram_model_from_counts(counts)
        .orderBy(F.desc("c123"), "w1", "w2", "w3")
        .limit(25)
    )


_KN_CROSSFOLD_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'w2': t[i + 1]})) AS s
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM occ0
), c12 AS (  -- model trains on EVEN doc ids only
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM occ WHERE doc_id % 2 = 0 GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1plus_fw
  FROM c12 GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_w2 FROM c12 GROUP BY 1
), ct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cont_total FROM c12
), model AS (
  SELECT c12.w1, c12.w2,
         CAST(greatest(4 * c12.c12 - 3, 0) * ct.cont_total
              + 3 * c1.n1plus_fw * cont.cont_w2 AS BIGINT) AS kn_num,
         CAST(4 * c1.c1 * ct.cont_total AS BIGINT) AS kn_den
  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ct
), scored AS (  -- ODD doc ids score against the even-trained model
  SELECT o.doc_id,
         CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         SUM(CASE WHEN m.w1 IS NULL THEN 1 ELSE 0 END) AS oov,
         -SUM(CAST(floor((ln(m.kn_num) - ln(m.kn_den)) * 10000 + 0.5)
                   AS BIGINT)) AS nll_raw
  FROM occ o LEFT JOIN model m ON o.w1 = m.w1 AND o.w2 = m.w2
  WHERE o.doc_id % 2 = 1
  GROUP BY 1
)
SELECT CAST(CASE WHEN oov = 0 THEN 1 ELSE 0 END AS INTEGER) AS covered,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       CAST(SUM(CASE WHEN oov = 0 THEN nll_raw END) AS BIGINT)
         AS total_nll_fp
FROM scored GROUP BY 1 ORDER BY 1
"""


@register("doc_kn_crossfold_perplexity", oracle=_KN_CROSSFOLD_ORACLE)
def doc_kn_crossfold_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out KN perplexity — the EXTERNAL-model scoring path
    (`text/kneser_ney.kn_doc_nll(model_df=...)`) certified end to end:
    the model trains on even-doc_id documents, odd documents score
    against it, and any document containing a training-unseen bigram is
    NULL-POISONED rather than silently under-reported (the honest OOV
    contract — `kn_doc_nll`'s docstring). The readout splits held-out
    documents into covered vs OOV and sums fixed-point NLL over the
    covered group only (the OOV group's total is NULL by construction on
    both engines — SQL SUM over an empty CASE set)."""
    from backend_big_data_spark.text.kneser_ney import kn_doc_nll

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    score = docs.where(F.col("doc_id") % 2 == 1)
    scored = kn_doc_nll(score, model_df=train)
    covered = (
        F.when(F.col("nll_fp").isNotNull(), 1).otherwise(0).cast("int")
    )
    return (
        scored.groupBy(covered.alias("covered"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("total_bigrams"),
            F.sum("nll_fp").alias("total_nll_fp"),
        )
        .orderBy("covered")
    )


_CCNET_BUCKETS_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'w2': t[i + 1]})) AS s
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM occ0
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM occ GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1plus_fw
  FROM c12 GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_w2 FROM c12 GROUP BY 1
), ct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cont_total FROM c12
), model AS (
  SELECT c12.w1, c12.w2,
         CAST(greatest(4 * c12.c12 - 3, 0) * ct.cont_total
              + 3 * c1.n1plus_fw * cont.cont_w2 AS BIGINT) AS kn_num,
         CAST(4 * c1.c1 * ct.cont_total AS BIGINT) AS kn_den
  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ct
), scored AS (
  SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         -SUM(CAST(floor((ln(m.kn_num) - ln(m.kn_den)) * 10000 + 0.5)
                   AS BIGINT)) AS nll_fp
  FROM occ o JOIN model m ON o.w1 = m.w1 AND o.w2 = m.w2
  GROUP BY 1
), binned AS (
  SELECT doc_id, n_bigrams, nll_fp,
         nll_fp // (n_bigrams * 100) AS bin
  FROM scored
), hist AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS bn FROM binned GROUP BY 1
), cum AS (
  SELECT bin, SUM(bn) OVER (ORDER BY bin) AS cum,
         (SELECT SUM(bn) FROM hist) AS tot
  FROM hist
), th AS (
  SELECT MIN(CASE WHEN cum * 3 >= tot THEN bin END) AS t1,
         MIN(CASE WHEN cum * 3 >= tot * 2 THEN bin END) AS t2
  FROM cum
)
SELECT CASE WHEN bin <= t1 THEN 'a:head'
            WHEN bin <= t2 THEN 'b:middle'
            ELSE 'c:tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       CAST(SUM(nll_fp) AS BIGINT) AS total_nll_fp
FROM binned CROSS JOIN th
GROUP BY 1 ORDER BY 1
"""


@register("doc_ccnet_ppl_buckets", oracle=_CCNET_BUCKETS_ORACLE)
def doc_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet perplexity filter's readout (Wenzek et al. 2020: split
    the corpus into head/middle/tail by LM perplexity and keep
    head+middle) at the document level under the interpolated KN bigram
    model — WITHOUT a corpus sort: per-document fixed-point NLL-per-
    bigram quantizes into integer bins (`div`, exact on both engines,
    nested-floor identity), the bounded bin HISTOGRAM carries the only
    ordered window (the doc_quality_calibration discipline — a global
    rank over documents would be the B6 one-task hazard), and the two
    cumulative thresholds t1/t2 (first bins covering ≥1/3 and ≥2/3 of
    documents) bucket every document by comparison. Ties inside a
    threshold bin all land on the keep side — deterministic, and the
    honest behavior for a threshold filter."""
    from pyspark.sql import Window

    from backend_big_data_spark.text.kneser_ney import kn_doc_nll

    docs = load_table(spark, sf_dir, "documents")
    scored = pin_single_evaluation(
        kn_doc_nll(docs).select(
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            "nll_fp",
            F.expr("nll_fp div (n_bigrams * 100)").alias("bin"),
        )
    )
    # pinned: the per-doc frame (3 ints/doc) feeds THREE consumers (the
    # bin histogram, its total, and the final bucket aggregate) — each
    # otherwise re-ran the whole KN scoring join end to end (r12)
    hist = scored.groupBy("bin").agg(F.count(F.lit(1)).alias("bn"))
    # partition-less window over the BIN HISTOGRAM only: ≤ a few hundred
    # rows regardless of corpus size (bounded by the nll range / 0.01 nat)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("bn").over(w)).crossJoin(
        F.broadcast(hist.agg(F.sum("bn").alias("tot")))
    )
    th = cum.agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("tot"), F.col("bin"))
        ).alias("t1"),
        F.min(
            F.when(F.col("cum") * 3 >= F.col("tot") * 2, F.col("bin"))
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("bin") <= F.col("t1"), "a:head")
        .when(F.col("bin") <= F.col("t2"), "b:middle")
        .otherwise("c:tail")
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            F.sum("nll_fp").alias("total_nll_fp"),
        )
        .orderBy("bucket")
    )


_KN_STREAM_SCORED_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'w2': t[i + 1]})) AS s
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM occ0
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM occ WHERE doc_id % 2 = 0 GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1plus_fw
  FROM c12 GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_w2 FROM c12 GROUP BY 1
), ct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cont_total FROM c12
), model AS (
  SELECT c12.w1, c12.w2,
         CAST(greatest(4 * c12.c12 - 3, 0) * ct.cont_total
              + 3 * c1.n1plus_fw * cont.cont_w2 AS BIGINT) AS kn_num,
         CAST(4 * c1.c1 * ct.cont_total AS BIGINT) AS kn_den
  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ct
), scored AS (
  SELECT o.doc_id,
         CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         SUM(CASE WHEN m.w1 IS NULL THEN 1 ELSE 0 END) AS oov,
         -SUM(CAST(floor((ln(m.kn_num) - ln(m.kn_den)) * 10000 + 0.5)
                   AS BIGINT)) AS nll_raw
  FROM occ o LEFT JOIN model m ON o.w1 = m.w1 AND o.w2 = m.w2
  WHERE o.doc_id % 2 = 1
  GROUP BY 1
)
SELECT doc_id, n_bigrams,
       CAST(CASE WHEN oov = 0 THEN nll_raw END AS BIGINT) AS nll_fp
FROM scored ORDER BY doc_id
"""


@register("doc_kn_stream_scored", oracle=_KN_STREAM_SCORED_ORACLE)
def doc_kn_stream_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-at-arrival — the streaming form of the CCNet perplexity
    filter, end to end through the LM sink
    (`streaming/lm_ingest.lm_ingest_sink(score_batches=True)`): batch 0
    admits the even-doc_id documents and maintains their count sidecars;
    batch 1's documents are then scored AGAINST THE CORPUS-SO-FAR KN
    model (built from the maintained counts via
    `kn_bigram_model_from_counts` + `kn_doc_nll_from_model` — no retrain
    scan) as they arrive, into ``ppl/batch=1``. Output: the per-document
    fixed-point NLLs, with model-unseen bigrams NULL-poisoning their
    document (the honest OOV signal a downstream threshold routes). The
    oracle is a pure-SQL twin of train-on-even/score-odd — so this row
    certifies that incremental score-at-arrival EQUALS scoring against a
    full retrain."""
    import tempfile

    from backend_big_data_spark.streaming.lm_ingest import lm_ingest_sink

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = tempfile.mkdtemp(prefix="lm_ingest_scored_")
    sink = lm_ingest_sink(cdir, score_batches=True)
    sink(docs.where(F.col("doc_id") % 2 == 0), 0)
    sink(docs.where(F.col("doc_id") % 2 == 1), 1)
    return spark.read.parquet(os.path.join(cdir, "ppl", "batch=1")).orderBy(
        "doc_id"
    )


_FUZZY_BEST_STREAM_ORACLE = """
WITH e AS (
  SELECT CAST(p_partkey AS BIGINT) AS id,
         p_name || '|' || p_brand || '|' || p_type AS ent
  FROM part
), m AS (  -- batch-0 admission: exact dups resolve to the min id
  SELECT min(id) AS id, ent FROM e GROUP BY ent
),
d0 AS (SELECT id, ent, 1 + (id % len(ent)) AS pos1 FROM e),
d1 AS (SELECT id,
       substr(ent, 1, pos1 - 1) || substr(ent, pos1 + 1, 100000) AS e2
       FROM d0),
d2 AS (SELECT id, e2, 1 + ((id * 7) % len(e2)) AS pos2 FROM d1),
dirty AS (SELECT id,
          substr(e2, 1, pos2 - 1) || 'q' || substr(e2, pos2 + 1, 100000)
          AS ds FROM d2),
p AS (
  SELECT d.id AS dirty_id, m.id AS master_id,
         CAST(levenshtein(d.ds, m.ent) AS INTEGER) AS edit_dist
  FROM dirty d JOIN m ON abs(len(d.ds) - len(m.ent)) <= 2
  WHERE levenshtein(d.ds, m.ent) <= 2
), r AS (
  SELECT dirty_id, master_id, edit_dist,
         CAST(row_number() OVER (
           PARTITION BY dirty_id ORDER BY edit_dist, master_id
         ) AS INTEGER) AS rank
  FROM p
)
SELECT dirty_id, master_id, rank, edit_dist
FROM r WHERE rank <= 1 ORDER BY dirty_id, master_id
"""


@register("part_fuzzy_best_match_stream", oracle=_FUZZY_BEST_STREAM_ORACLE)
def part_fuzzy_best_match_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming best-match entity resolution on the EDIT-DISTANCE
    family, end to end through the sink
    (`streaming/linkage_ingest.linkage_ingest_sink` with
    ``link_mode="topk"`` — the `part_token_best_match_stream`
    certificate's fuzzy twin): batch 0 admits the clean part entities
    (exact dups resolve to the min id), batch 1 links every
    deterministically corrupted record to its single CLOSEST master at
    edit distance ≤ 2 via the maintained gram index + gramfreq sidecar
    (edit_dist ASC, master-id tie-break — deterministic winner). The
    oracle replays the whole admit→corrupt→link→rank pipeline in SQL."""
    import tempfile

    from backend_big_data_spark.plans.round7c import _corrupt, _entities
    from backend_big_data_spark.streaming.linkage_ingest import (
        linkage_ingest_sink,
    )

    clean = _entities(spark, sf_dir)
    dirty = _corrupt(clean)
    mdir = tempfile.mkdtemp(prefix="linkage_topk_stream_")
    sink = linkage_ingest_sink(mdir, max_dist=2, q=3, link_mode="topk", k=1)
    sink(clean, 0)
    sink(dirty, 1)
    return spark.read.parquet(os.path.join(mdir, "links", "batch=1")).orderBy(
        "dirty_id", "master_id"
    )
