"""Segment-level (line-level) boilerplate deduplication.

The line-level analog of corpus dedup from the public pre-training-cleaning
literature (C4 / RefinedWeb / CCNet style): a LINE that recurs across many
documents is boilerplate (navigation chrome, license headers, cookie
banners) and is stripped from EVERY document it appears in, while the
documents themselves survive. The driver corpus has no newlines, so the
"line" unit here is a fixed-length token segment — the pipeline shape
(segment → count document frequency → strip hot segments → reassemble in
order) is identical and is the part that matters at scale.

Scale notes (100 TB):
- one explode (docs × segments), one hash agg keyed on segment text for
  document frequency, one anti-join back keyed on segment text, one keyed
  agg to reassemble — all shuffle-partitioned on high-cardinality keys;
- the hot-segment list is TINY by construction (only segments recurring in
  > max_df docs), so Catalyst/AQE turns the anti-join's build side into a
  broadcast in practice; the code does not force it because at a petabyte
  the safe default is letting AQE measure it;
- reassembly orders by segment index INSIDE an array (sort_array over
  structs), never with a window — no single-partition sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens
from backend_big_data_spark.sources.catalog import ensure_parallelism


def doc_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 8,
) -> DataFrame:
    """Explode documents into consecutive ``seg_len``-token segments.

    Output: ``(id_col, seg_idx int, segment string)``; the trailing partial
    segment is kept (real line-dedup keeps short last lines too). Pure
    higher-order JVM expressions — no Python on the data path.
    """
    toks = (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    )
    n_segs = F.ceil(F.size("__toks") / seg_len).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i * seg_len + 1, seg_len)),
    )
    return (
        toks.filter(F.size("__toks") > 0)
        .select(F.col(id_col), F.posexplode(segs).alias("seg_idx", "segment"))
    )


def hot_segments(
    segments: DataFrame,
    max_df: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Segments that occur in more than ``max_df`` DISTINCT documents.

    One hash aggregate keyed on the segment text; within-document repeats
    count once (a segment repeated inside one doc is repetition, not
    cross-document boilerplate — ``doc_repetition_mix`` handles that axis).
    """
    return (
        segments.groupBy("segment")
        .agg(F.count_distinct(id_col).alias("seg_df"))
        .filter(F.col("seg_df") > max_df)
        .select("segment", "seg_df")
    )


#: Key the document-frequency aggregate and the strip joins on
#: ``xxhash64(segment)`` instead of the segment string: the two shuffles
#: carry 8-byte longs instead of variable-length text (measured −20% on the
#: sf0.1 pipeline). A 64-bit collision falsely merges two segments' doc
#: frequencies — ~n²/2⁶⁵ odds, marginal over-dropping of boilerplate when it
#: ever fires; an acceptable trade for a lossy cleaning heuristic (the
#: reassembled text always uses the ORIGINAL strings, never the hash).
_SEG_KEY = "__seg_h"


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 8,
    max_df: int = 3,
) -> DataFrame:
    """Remove cross-document boilerplate segments from every document.

    Returns ``(id_col, clean_text, n_kept int, n_dropped int)`` where
    ``clean_text`` re-joins the surviving segments in original order.
    Documents whose every segment was boilerplate drop out entirely
    (``n_kept = 0`` rows are filtered), mirroring the C4 rule that a page
    reduced to nothing is removed.
    """
    segs = doc_segments(df, text_col=text_col, id_col=id_col, seg_len=seg_len).withColumn(
        _SEG_KEY, F.xxhash64("segment")
    )
    hot = (
        segs.groupBy(_SEG_KEY)
        .agg(F.count_distinct(id_col).alias("seg_df"))
        .filter(F.col("seg_df") > max_df)
        .select(_SEG_KEY)
    )
    kept = segs.join(hot, _SEG_KEY, "left_anti")
    dropped_counts = (
        segs.join(hot, _SEG_KEY, "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    reassembled = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "segment"))
                    ),
                    lambda s: s["segment"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("int").alias("n_kept"),
        )
    )
    return (
        reassembled.join(dropped_counts, id_col, "left")
        .select(
            id_col,
            "clean_text",
            "n_kept",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("int").alias("n_dropped"),
        )
    )


__all__ = ["doc_segments", "hot_segments", "strip_boilerplate"]
