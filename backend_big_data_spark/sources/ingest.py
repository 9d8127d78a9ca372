"""Robust semi-structured ingest: corrupt-record quarantine.

The reference reads its whole JSON dataset with a clean-data assumption
(``main.py:142-148``) — one malformed line either vanishes silently
(DROPMALFORMED) or poisons a column (PERMISSIVE with no corrupt column).
At 100 TB of scraped data malformed records are a certainty, and the
operational requirement is: load everything loadable, QUARANTINE the rest
with enough context to replay it after a parser fix, and never fail the
job for one bad byte.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class QuarantinedRead:
    """Result of :func:`read_json_with_quarantine`. ``good`` and
    ``quarantine`` are filter branches over ONE shared persisted parse —
    call :meth:`release` when done with both. (Unpersisting a DERIVED
    frame would be a silent no-op on the parent's cache entry, which is
    why the parent is held here.) Supports tuple-style unpacking:
    ``good, quarantine = read_json_with_quarantine(...)``."""

    good: DataFrame
    quarantine: DataFrame
    _parsed: DataFrame

    def release(self) -> None:
        self._parsed.unpersist()

    def __iter__(self):
        return iter((self.good, self.quarantine))


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = CORRUPT_COL,
) -> QuarantinedRead:
    """PERMISSIVE JSON scan with an explicit corrupt-record column —
    ``good`` rows with the declared schema, and the raw text of every
    unparseable line in ``quarantine`` (one column, ready to be sunk to a
    quarantine location and replayed after a parser fix).

    Spark refuses filters that reference ONLY the corrupt column on a
    direct JSON scan (the parser would have to re-run per filter, an
    internal-only column guarantee) — the documented contract is to
    persist the parsed frame first, which also means the file is parsed
    once, not once per output branch.
    """
    # a NEW StructType — StructType.add() MUTATES the caller's schema, so a
    # second ingest through the same schema object would stack duplicate
    # corrupt columns
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .persist()
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = parsed.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    return QuarantinedRead(good, quarantine, parsed)


def read_evolving_parquet(
    spark: "SparkSession",
    path: str,
    expected: "StructType | str | None" = None,
) -> "DataFrame":
    """Read a parquet dataset whose files were written under DIFFERENT
    schema versions (columns added over time) as one unified frame.

    ``mergeSchema=true`` makes Spark reconcile footers across files
    (normally it trusts one random footer — new columns silently vanish
    when the sampled file predates them); rows from older files carry
    nulls in the newer columns. When ``expected`` is given, the result is
    additionally aligned to it: missing expected columns materialize as
    typed nulls and unexpected extras are dropped — the contract an
    ingest job enforces so downstream plans never break on a schema that
    ran ahead of the code.

    Scale note: footer merging reads every file's FOOTER (not data) once
    at planning — at very large file counts pin the canonical schema via
    ``expected`` and skip mergeSchema on the hot path; this helper is the
    backfill/exploration reader.
    """
    from pyspark.sql.types import StructType

    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    if isinstance(expected, str):
        expected = StructType.fromDDL(expected)
    cols = []
    for f in expected.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
