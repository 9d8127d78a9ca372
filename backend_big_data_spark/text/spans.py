"""Duplicate-span removal — the ExactSubstr dedup of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499), in its scalable fixed-k formulation.

The paper removes every substring of >= 50 tokens that appears more than
once in the corpus, using a corpus-wide suffix array. The k-gram
formulation computes the SAME removal set without one: a duplicated span
of length >= k contains a duplicated k-gram starting at every offset, and
conversely every duplicated k-gram occurrence IS a duplicated k-length
span — so the tokens to remove are exactly the tokens covered by some
duplicated k-gram occurrence. Marking those positions needs only:

1. explode positional k-grams (doc_id, pos, gram) — one map-side pass;
2. total occurrence count per gram (one shuffle keyed on the gram; a
   gram is "duplicated" when the CORPUS-wide occurrence count is >= 2,
   including repeats inside one document, matching the paper);
3. join the duplicated grams back to their positions (semi shape, same
   key) and collect each doc's duplicated start positions (shuffle keyed
   on doc_id, one array per doc — bounded by document length);
4. per-doc mask/reassembly as pure higher-order array expressions: token
   i is removed iff some collected start p satisfies p <= i < p + k.

No suffix array, no sort, no window over data-scale input; every shuffle
keys on gram or doc_id. At 100 TB the gram-count aggregate is the big
stage — partial aggregation collapses repeats map-side, and a
``max_count`` cap on the posting join (hot grams are duplicated regardless)
keeps the join skew-free: the count table can drop counts above 2 since
only the >= 2 verdict matters (done below via the aggregated boolean).

Reference scope: additive LLM-curation surface (the reference's dedup is
document-level `dropDuplicates`, `/root/reference/scripts/data_cleaner.py:84`);
this is the sub-document companion of `text/segments.strip_boilerplate`
(which drops REPEATED FIXED-LENGTH SEGMENTS by document frequency, not
arbitrary-position spans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens


def positional_kgrams(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, gram) for every k-token window start (pos is 0-based).
    Docs shorter than ``k`` tokens contribute no rows."""
    t = tokens(F.col(text_col))
    windows = F.transform(
        F.sequence(F.lit(0), F.size(t) - k),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(" ", F.slice(t, i + 1, k)).alias("gram"),
        ),
    )
    # guard: sequence(0, negative) DESCENDS in Spark — short docs must map
    # to an empty window array, not [0, -1, ...]
    grams = F.when(F.size(t) >= k, windows).otherwise(
        F.array().cast("array<struct<pos:int,gram:string>>")
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )


def duplicate_span_profile(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-span removal report:
    ``(id, n_tokens int, n_removed int, clean_text string)`` where
    ``clean_text`` is the document with every token covered by a
    corpus-duplicated k-gram occurrence removed (surviving tokens
    re-joined with single spaces, in order).

    The duplicated verdict is corpus-wide occurrence count >= 2 — two
    occurrences inside one document count (the paper's self-repetition
    case), so a looping document scrubs its own repeats too.
    """
    pk = positional_kgrams(df, k, text_col, id_col)
    # gram -> duplicated? — only the >= 2 verdict survives the aggregate,
    # so the join value is 1 bit, never a hot posting list
    dup = (
        pk.groupBy("gram")
        .agg((F.count("*") >= 2).alias("__dup"))
        .filter(F.col("__dup"))
        .select("gram")
    )
    starts = (
        pk.join(dup, on="gram", how="semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__starts"))
    )
    return _apply_span_mask(df, starts, k, text_col, id_col)


def _apply_span_mask(
    df: DataFrame, starts: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, n_tokens, n_removed, clean_text) given per-doc flagged span
    start positions — step 4 of the module docstring, shared by the
    corpus-duplicate and eval-overlap profiles."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__starts"), lambda p: (p <= i) & (i < p + k)
    )
    kept = F.filter(t, lambda x, i: ~covered(i))
    out = df.join(starts, on=id_col, how="left").withColumn(
        "__starts",
        F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
    )
    return out.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        (n - F.size(kept)).cast("int").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


def eval_overlap_profile(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level eval-set decontamination (the substring form of Lee et
    al. 2021 §decontamination, arXiv:2107.06499): for every TRAINING
    document, flag and strip each span of >= ``k`` tokens that appears
    verbatim anywhere in the EVAL set — the surgical alternative to
    dropping whole documents on n-gram containment
    (`text/dedup.containment_vs_index` / doc_contamination), which wastes
    the rest of an otherwise-clean document.

    Returns ``(id, n_tokens int, n_removed int, clean_text string)`` for
    the training frame; ``n_removed`` is the leaked-token count.

    Shape: train-side positional k-grams (map-side explode) semi-joined
    against the DISTINCT eval k-gram set (shuffle keyed on the gram; the
    eval side is eval-set-sized, typically tiny vs the corpus), then the
    per-doc span mask. Same scale discipline as
    `duplicate_span_profile` — no suffix array, no global sort."""
    pk = positional_kgrams(train, k, text_col, id_col)
    eval_grams = (
        positional_kgrams(eval_df, k, text_col, id_col)
        .select("gram")
        .distinct()
    )
    starts = (
        pk.join(eval_grams, on="gram", how="semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__starts"))
    )
    return _apply_span_mask(train, starts, k, text_col, id_col)


__all__ = ["duplicate_span_profile", "eval_overlap_profile", "positional_kgrams"]
