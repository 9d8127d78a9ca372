"""Count-Min frequency sketch — the FREQUENCY cell of the mergeable
sketch matrix (distinct counts: `operators/kmv` + the HLL path;
quantiles: `operators/qsketch`; frequencies: here). Cormode &
Muthukrishnan's CM sketch, expressed as DataFrame rows.

A sketch is ``depth × width`` counters; row ``r`` hashes a key with an
independent seed and adds the key's weight at column
``h_r(key) % width``. A key's frequency estimate is the MINIMUM of its
``depth`` counters — never an underestimate (other keys only ADD to a
cell), and over-estimates are bounded: with width ``w``, each counter
carries expected collision mass ``N / w`` (N = total weight), so
``exact ≤ est ≤ exact + O(N / w)`` with probability ``1 - e^-depth``.

Why this representation, not a counts table: exact per-key counts are
O(vocabulary) state — at 100 TB a token-count log is itself a large
table that must shuffle on token. The CM sketch is ``depth·width``
cells TOTAL (4×1024 longs here) regardless of vocabulary, the map-side
combine collapses every task's contribution to ≤ depth·width rows
before the shuffle (no vocabulary-sized exchange anywhere), and the
whole at-rest sketch broadcasts for estimate joins. The trade is the
bounded overcount — use exact counts (`streaming/drift_monitor`) when
the vocabulary fits; use this when it doesn't.

Algebra (all certified by oracle parity, `plans/round12b`):

- **deterministic**: hashes are the repo's `stable_hash` (60-bit md5),
  so a sketch — and every estimate — is a pure function of the data,
  bit-identical across engines, replays, and partitionings. Unlike
  probabilistic sketch APIs, the DuckDB oracle reproduces estimates
  EXACTLY, not just within a band.
- **mergeable**: cells are additive — union per-shard sketches and sum
  per (r, c). Lossless: merged ≡ single-pass by associativity.
- **subtractable**: the one property KMV/qsketch lack — negating a
  retracted slice's cells subtracts it exactly (the drift-counts
  erasure discipline, `streaming/cms_ingest.retract_from_cms_cells`).

Reference scope note: the reference backend (CiccioRomeo/
backend-big-data) has no sketch layer; this extends its aggregation
surface (queries.py:31-516) with the summary structure a corpus-scale
frequency monitor needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.text.sampling import stable_hash

#: Default geometry: 4 rows × 1024 columns = 4096 long cells (~32 KiB).
#: Error: overcount ≤ ~2.7·N/1024 per estimate with prob 1 - e⁻⁴ ≈ 0.98.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_cell_structs(key: Column, depth: int, width: int) -> Column:
    """``array<struct<r int, c int>>`` — the ``depth`` cells a key maps
    to. Row r's hash seeds with the literal ``"{r}:"`` prefix so the
    rows are independent; `stable_hash` is non-negative (60-bit), so
    ``% width`` is already a valid column index in both engines."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                (
                    stable_hash(F.concat(F.lit(f"{r}:"), key.cast("string")))
                    % width
                )
                .cast("int")
                .alias("c"),
            )
            for r in range(depth)
        ]
    )


def cms_cells(
    df: DataFrame,
    key: Column,
    *,
    weight: Column | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the sketch: ``(group_cols..., r int, c int, n long)`` —
    one row per NON-ZERO cell (absent cell ≡ 0, readers coalesce).

    ``weight`` defaults to 1 per input row; pass a count column to fold
    pre-aggregated ``(key, n)`` frames — additive, so both routes land
    on the identical sketch. The explode is ×depth before the
    aggregate, but partial aggregation collapses each task's output to
    ≤ depth·width rows: the shuffle is bounded by the sketch geometry,
    never by the data or the vocabulary."""
    g = list(group_cols or [])
    w = (weight if weight is not None else F.lit(1)).cast("long")
    return (
        df.select(
            *g,
            F.explode(cms_cell_structs(key, depth, width)).alias("__cell"),
            w.alias("__w"),
        )
        .groupBy(*g, F.col("__cell.r").alias("r"), F.col("__cell.c").alias("c"))
        .agg(F.sum("__w").alias("n"))
    )


def cms_merge(
    cells: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge a union of per-shard/per-batch sketch frames: cells are
    additive, so the merge is one keyed sum over ≤ depth·width distinct
    (r, c) keys per group — lossless (merged ≡ single-pass)."""
    g = list(group_cols or [])
    return cells.groupBy(*g, "r", "c").agg(F.sum("n").alias("n"))


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    group_cols: list[str] | None = None,
    est_col: str = "cms_est",
) -> DataFrame:
    """Frequency estimates for ``probes`` (distinct ``group_cols... +
    key_col`` rows): per probe, MIN over its ``depth`` counters, absent
    cells counting 0. Returns the probe columns + ``est_col`` (long).

    The sketch side is ≤ depth·width rows per group — broadcast, so
    probing is a map-side join however large the probe stream is.
    Estimates are ≥ the true frequency by construction (cells only
    accumulate non-negative mass; a post-erasure sketch stays valid
    because erasure subtracts exactly the retracted slice's cells)."""
    g = list(group_cols or [])
    pc = probes.select(
        *g,
        key_col,
        F.explode(
            cms_cell_structs(F.col(key_col), depth, width)
        ).alias("__cell"),
    ).select(*g, key_col, F.col("__cell.r").alias("r"), F.col("__cell.c").alias("c"))
    return (
        pc.join(F.broadcast(cells), on=[*g, "r", "c"], how="left")
        .groupBy(*g, key_col)
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias(est_col)
        )
    )


__all__ = [
    "CMS_DEPTH",
    "CMS_WIDTH",
    "cms_cell_structs",
    "cms_cells",
    "cms_estimate",
    "cms_merge",
]
