"""Late-data dead-letter routing — keep what the watermark would silently
drop.

Structured Streaming's watermark DROPS too-late rows inside stateful
operators with no side channel; at pipeline scale the operational
requirement is the same as corrupt-record handling (sources/ingest.py):
never lose input silently — route rows that arrived after the watermark
into a replayable dead-letter directory and let the on-time majority flow.

Mechanics: a ``foreachBatch`` splitter with its own tiny event-time
high-water state (a one-row parquet next to the main sink). Per batch:

- threshold = (stored max event time) − allowed delay — the same formula
  Spark's watermark uses, maintained explicitly so the split is visible
  and testable;
- rows older than the threshold → ``late_dir/batch=N`` (verbatim, for
  reprocessing/backfill through the batch pipelines);
- the rest → ``main_dir/batch=N``;
- state advances to max(stored, batch max) AFTER routing, so an entire
  batch of stragglers cannot advance the clock past itself.

Idempotent under replay: both sinks overwrite their own ``batch=N``
directory, and re-running a batch against the SAME prior state reproduces
the same split (state writes are keyed by batch id too, so a replayed
batch restores rather than double-advances).

Scale: the split is two codegen'd filters over the batch; state IO is one
1-row file per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _state_dir(main_dir: str) -> str:
    return os.path.join(main_dir, "_event_clock")


def read_event_clock(
    spark: SparkSession, main_dir: str, before_batch: int | None = None
) -> int | None:
    """Stored max event time (epoch micros), or None before any batch.

    ``before_batch``: consider only state written by batches with a
    STRICTLY SMALLER id — the replay guard: a replayed batch N must see
    the clock as it stood before N's own (possibly crash-torn) first
    attempt, or it would compute a later threshold and split differently
    than the original run."""
    from backend_big_data_spark.sources import fsutil

    path = _state_dir(main_dir)
    batches = [
        n for n in fsutil.list_subdirs(spark, path, prefix="batch=")
        if before_batch is None or int(n.split("=", 1)[1]) < before_batch
    ]
    if not batches:
        return None
    df = spark.read.parquet(*[f"{path}/{b}" for b in batches])
    row = df.agg(F.max("max_ts_us").alias("m")).collect()[0]
    return None if row["m"] is None else int(row["m"])


def late_router_sink(
    main_dir: str,
    late_dir: str,
    delay: str = "1 hour",
    ts_col: str = "ts",
):
    """``foreachBatch`` function splitting each micro-batch into on-time
    (``main_dir``) and late (``late_dir``) halves by the explicit event
    clock."""
    delay_us = _interval_micros(delay)

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        clock = read_event_clock(spark, main_dir, before_batch=batch_id)
        ts_us = F.unix_micros(F.col(ts_col))
        if clock is None:
            late = batch.limit(0)
            fresh = batch
        else:
            threshold = clock - delay_us
            late = batch.filter(ts_us < threshold)
            fresh = batch.filter(~(ts_us < threshold))
        fresh.write.mode("overwrite").parquet(f"{main_dir}/batch={batch_id}")
        late.write.mode("overwrite").parquet(f"{late_dir}/batch={batch_id}")
        batch_max = batch.agg(F.max(ts_us).alias("m")).collect()[0]["m"]
        new_clock = max(
            v for v in (clock, batch_max) if v is not None
        ) if (clock is not None or batch_max is not None) else None
        if new_clock is not None:
            spark.createDataFrame(
                [(int(new_clock),)], "max_ts_us long"
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{_state_dir(main_dir)}/batch={batch_id}"
            )

    return apply


def _interval_micros(delay: str) -> int:
    """'1 hour' / '30 minutes' / '45 seconds' → microseconds."""
    n, unit = delay.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }[unit]
    return int(n) * mult


def route_late_stream(
    stream: DataFrame,
    main_dir: str,
    late_dir: str,
    checkpoint: str,
    delay: str = "1 hour",
    ts_col: str = "ts",
):
    """Attach the late-data router to a stream (availableNow by default is
    the caller's choice of trigger via the returned writer)."""
    return (
        stream.writeStream.foreachBatch(
            late_router_sink(main_dir, late_dir, delay=delay, ts_col=ts_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "late_router_sink",
    "read_event_clock",
    "route_late_stream",
]
