"""Corpus snapshot diffing — added / removed / changed / unchanged.

A recurring-ingest pipeline needs to answer "what changed between
yesterday's corpus and today's?" without re-reading either corpus twice:
one full-outer join keyed on the document id, comparing a content
fingerprint, classifies every document. At 100 TB both sides are parquet
scans projecting exactly two columns (id, fingerprint) — the diff's
shuffle moves 16-byte digests, not documents — and a snapshot stored
bucketed by id makes the join co-located (zero shuffle).

The fingerprint is md5 of the raw text, matching
``text/dedup.py::exact_dedup_fingerprints``'s family, so a diff can reuse
fingerprints a dedup pass already materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff status between two corpus snapshots.

    Returns ``(id_col, status string)`` with status ∈ {'added', 'removed',
    'changed', 'unchanged'}. Full-outer join on the id; content equality by
    md5 fingerprint so document payloads never cross the shuffle.
    """
    # presence is carried explicitly — classifying on fingerprint nullness
    # would misread a NULL text (md5(NULL) = NULL) as absence
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("__old_fp").eqNullSafe(F.col("__new_fp")), "unchanged")
        .otherwise("changed")
    )
    return joined.select(F.col(id_col), status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """Counts per diff status — the report a nightly ingest job emits."""
    return (
        diff.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("status")
    )


__all__ = ["snapshot_diff", "diff_summary"]
