"""Sinks (SURVEY.md §2.1 S5-S7).

The reference writes JSON — single-file exports via ``coalesce(1)``
(``data_cleaner.py:100``) and partitioned directories
(``update_dataset.py:160``). The engine default is partitioned parquet;
single-file JSON remains available for small exports only (a ``coalesce(1)``
write serializes the whole dataset through one task — never on the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Engine-default sink: partitioned parquet. At 100 TB, ``partition_by``
    on the dominant filter column enables partition pruning for readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partitioned JSON sink — reference S6 (``update_dataset.py:160``)."""
    df.write.mode(mode).json(path)


def write_json_single_file(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file JSON export — reference S5 (``data_cleaner.py:100``).
    Bounded exports only: one task writes everything."""
    df.coalesce(1).write.mode(mode).json(path)


def collect_bounded(df: DataFrame, max_rows: int = 100_000) -> list[dict]:
    """HTTP-style result sink — reference S7 (``endpoints.py:24``), with the
    unbounded-collect hazard (SURVEY.md §4.3) fixed by a hard row cap."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds collect cap ({max_rows}); paginate instead"
        )
    return [r.asDict(recursive=True) for r in rows]
