"""Structured Streaming over the events table (SURVEY.md §2.11 — additive
scope; the reference has no streaming at all).

Each windowed transformation is written against a generic DataFrame so the
SAME function body serves batch and streaming inputs — the Structured
Streaming unification. Tests run them both ways: batch parquet, and
``readStream`` + ``availableNow`` into a memory sink, asserting identical
results.

Scale: streaming aggregations keep per-window per-key state in the state
store; the watermark bounds that state (late rows beyond it are dropped and
their windows finalized). Without a watermark, 100 TB of events would grow
state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.sources.catalog import table_path

#: NOT literal DDL — a format TEMPLATE: ``{ts_type}`` must be filled via
#: ``EVENTS_DDL.format(ts_type=...)`` before use (parsing it raw fails).
#: The type is probed from the parquet footer at plan build: the harness
#: has shipped ``ts`` both as TIMESTAMP(NANOS) (→ raw ``long`` nanos under
#: the legacy nanosAsLong conf) and as untagged TIMESTAMP(MICROS) (→
#: ``timestamp_ntz`` under Spark 4 NTZ inference).
EVENTS_DDL = (
    "event_id long, ts {ts_type}, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events parquet table. Parquet needs an explicit
    schema for streaming reads (no inference mid-stream) — probed from the
    file footer with a metadata-only batch read (no job), then normalized to
    session-tz TIMESTAMP exactly as ``sources.catalog.load_table`` does.

    The testdata lays each table out as ONE ``<name>.parquet`` file, but
    FileStreamSource requires its base path to be a directory — so stream
    the parent dir with a ``pathGlobFilter`` selecting just the events file.
    On a real deployment the table would be a partitioned directory and the
    glob disappears.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, "events")
    probe = spark.read.parquet(path).schema
    if "ts" not in probe.names:
        raise ValueError(
            f"events table at {path} has no 'ts' column "
            f"(found {probe.names}); cannot build the streaming schema"
        )
    ts_phys = probe["ts"].dataType.simpleString()
    reader = spark.readStream.schema(
        EVENTS_DDL.format(ts_type="long" if ts_phys == "bigint" else ts_phys)
    ).format("parquet")
    import os

    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.load(path)
    if ts_phys == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark."""
    from backend_big_data_spark.functions.scalars import round_half_up

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("event_count"),
            round_half_up(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "avg_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts — each row lands in width/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based) — state closes when the
    watermark passes a session's end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "event_count",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup by event_id bounded by the watermark — state for an
    id is dropped once the watermark passes (unbounded dedup state is the
    classic streaming OOM)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def hourly_counts_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``tumbling_counts`` (no watermark needed at rest) —
    used by the oracle gate; semantics identical by construction."""
    from backend_big_data_spark.functions.scalars import round_half_up

    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("event_count"),
            round_half_up(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def user_running_totals(events: DataFrame, timeout_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event count + value sum, emitted on every update, with
    processing-time state timeout (state for an idle user is dropped — the
    bound that keeps 100 TB of users from accumulating forever).

    This is the shape Structured Streaming's built-in aggregations cannot
    express directly (emit-per-batch running totals with custom state
    layout); the reference has no streaming at all (SURVEY.md §2.11).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, event_count long, value_sum double"
    state_schema = "event_count long, value_sum double"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((count, total))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "event_count": [count], "value_sum": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def purchases_with_recent_signup_stream(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: purchases matched to the SAME USER's
    signup within the preceding ``within`` interval.

    Both sides carry watermarks and the join has an explicit time-range
    condition — the two requirements that let Structured Streaming bound
    its join state (each side's rows are dropped once the other side's
    watermark passes the range). Without them a stream-stream join holds
    state forever.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", watermark)
    )
    return purchases.join(
        signups,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("s_ts") < F.col("p_ts"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {within}")),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "p_ts", "signup_id", "s_ts")


def enrich_stream_with_dim(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    (broadcast) static dimension — the standard pattern for attaching
    slowly-changing reference data (user profiles, geo tables) to a
    stream without any state store.

    Semantics note: the static side is re-resolved per micro-batch, so a
    dim TABLE that is overwritten between batches is picked up — but rows
    already emitted are not retracted; for bi-temporal correctness use the
    CDC upsert sink (streaming/upsert.py) and join against its output.

    Scale: broadcast join per batch — no shuffle of the stream; the dim
    must fit the broadcast budget, else drop the hint and let AQE decide.
    """
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), on=on, how="left")
