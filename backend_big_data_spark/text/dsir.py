"""DSIR — data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

Given a small TARGET distribution (high-quality docs: a wiki slice, a
curated split) and the RAW crawl, DSIR scores every raw document by the
log-likelihood ratio of its hashed n-gram features under bag-of-ngram
models of target vs raw, then samples proportionally to the weights. The
feature space is hashed into a small fixed number of buckets, so both
"models" are just two B-row count vectors — the whole scorer is two
broadcast-sized aggregates plus one explode, no matter the corpus size.

Spark shape:
- one explode of (unigrams ∪ bigrams) per doc → stable md5 bucket id
  (`text/sampling.stable_hash` — the cross-engine deterministic hash);
- two tiny groupBys build the target/raw bucket-count tables (≤ B rows
  each → broadcast to the per-doc scoring join);
- per-bucket log-ratio is rounded to 1e-4 and SCALED TO INTEGER before
  the per-doc sum, so the accumulation is exact integer arithmetic —
  bit-identical on any engine at any parallelism (FP sums are
  order-dependent; integer sums are not).

At 100 TB: the explode is map-side; the only shuffle is the per-doc
(doc_id, bucket) count and the final per-doc sum — both keyed on doc_id,
so they collapse into one exchange. The two model vectors are O(B) rows
regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.text.sampling import stable_hash

#: Feature-space size. The paper uses 10k buckets; tests use the default.
NUM_BUCKETS = 256
#: Add-λ smoothing per bucket, in half-counts (keeps zero-count buckets
#: finite without drowning the signal).
SMOOTH = 0.5
#: Log-ratio fixed-point scale: λ is rounded to 1e-4 before integer
#: accumulation.
LAMBDA_SCALE = 10_000


def _word_grams(text: Column) -> Column:
    """Unigrams ∪ adjacent bigrams of the lowercase word tokens
    (``[a-z]{2,}`` runs — same tokenizer as the TF-IDF plan, chosen for
    bit-identical cross-engine extraction)."""
    toks = F.regexp_extract_all(F.lower(text), F.lit("[a-z]{2,}"), F.lit(0))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def doc_bucket_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_buckets: int = NUM_BUCKETS,
) -> DataFrame:
    """(id, bucket, n) hashed-ngram feature counts per document."""
    return (
        df.select(
            F.col(id_col),
            F.explode(_word_grams(F.col(text_col))).alias("__gram"),
        )
        .select(
            F.col(id_col),
            (stable_hash(F.col("__gram")) % num_buckets).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )


def bucket_log_ratios(
    target_counts: DataFrame, raw_counts: DataFrame,
    num_buckets: int = NUM_BUCKETS,
) -> DataFrame:
    """B-row table of fixed-point log-ratios ``lambda_fp`` =
    round(1e4 * (ln p_target(b) - ln p_raw(b))) with add-λ smoothing.
    Inputs are (bucket, n) aggregates (any id column is ignored). Buckets
    absent from a side count as 0 and take the smoothed floor
    probability — never -inf."""

    def model(counts: DataFrame, name: str) -> DataFrame:
        per_bucket = counts.groupBy("bucket").agg(F.sum("n").alias(name))
        return per_bucket

    def smoothed_log(c: Column, t: Column) -> Column:
        # totals coalesce too: an EMPTY side (no target docs yet) degrades
        # to the uniform smoothed model instead of NULLing every lambda
        return F.log(
            (F.coalesce(c, F.lit(0)) + F.lit(SMOOTH))
            / (F.coalesce(t, F.lit(0)) + F.lit(SMOOTH * num_buckets))
        )

    buckets = target_counts.sparkSession.range(num_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    t = model(target_counts, "__ct")
    r = model(raw_counts, "__cr")
    tt = t.agg(F.sum("__ct").alias("__tt"))
    rt = r.agg(F.sum("__cr").alias("__rt"))
    return (
        buckets.join(t, on="bucket", how="left")
        .join(r, on="bucket", how="left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "bucket",
            F.floor(
                (
                    smoothed_log(F.col("__ct"), F.col("__tt"))
                    - smoothed_log(F.col("__cr"), F.col("__rt"))
                )
                * LAMBDA_SCALE
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lambda_fp"),
        )
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = NUM_BUCKETS,
) -> DataFrame:
    """Per-raw-document DSIR importance weight: ``weight_fp`` (integer,
    1e-4 units — exact) and ``weight`` (double, derived). Higher = more
    target-like. Docs with no extractable grams weigh 0."""
    # pinned: the raw count table feeds THREE consumers (the raw model's
    # per-bucket sum, its total, and the per-doc scoring join) and the
    # target table TWO (model + total) — without the pins every branch
    # re-ran the gram explode + hash + per-doc aggregation end to end
    # (r12 plan audit: 13 scans, zero ReusedExchange in doc_dsir_weights).
    # Both tables are (doc, bucket≤256, n) — far under the gram stream.
    raw_counts = pin_single_evaluation(
        doc_bucket_counts(raw, text_col, id_col, num_buckets)
    )
    target_counts = pin_single_evaluation(
        doc_bucket_counts(target, text_col, id_col, num_buckets)
    )
    lam = bucket_log_ratios(target_counts, raw_counts, num_buckets)
    scored = (
        raw_counts.join(F.broadcast(lam), on="bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("lambda_fp")).alias("weight_fp"))
    )
    return (
        raw.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("weight_fp", F.lit(0)).alias("weight_fp"),
            (F.coalesce("weight_fp", F.lit(0)) / LAMBDA_SCALE).alias("weight"),
        )
    )


def gumbel_topk_sample(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
) -> DataFrame:
    """The DSIR resampling step: draw ``n`` docs WITHOUT replacement with
    probability ∝ exp(weight) via the Gumbel-top-k trick (Kool et al.
    2019, arXiv:1903.06059): add an independent Gumbel to each log-weight
    and take the global top-n — a single TakeOrdered, no sequential
    sampling state. The Gumbel is derived from the stable md5 hash of the
    id (u = (h mod 1e6 + 0.5)/1e6, g = -ln(-ln(u))), so the draw is a
    pure function of the data — reproducible on any engine, any
    parallelism, any run."""
    from backend_big_data_spark.text.sampling import stable_hash

    u = (stable_hash(F.col(id_col)) % 1_000_000 + F.lit(0.5)) / 1_000_000.0
    gumbel = -F.log(-F.log(u))
    return (
        weights.withColumn("__score", F.col(weight_col) + gumbel)
        .orderBy(F.desc("__score"), id_col)
        .limit(n)
        .select(id_col, weight_col)
    )
