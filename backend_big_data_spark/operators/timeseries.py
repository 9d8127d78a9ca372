"""Batch time-series operators: gap-based sessionization and calendar
gap-fill.

Sessionization here is the BATCH twin of the streaming session windows
(streaming/events.py ``session_counts``): the same "events ≤ gap apart
belong together" semantics, expressed as the classic lag → new-session
flag → running-sum idiom over a keyed window — one shuffle on the entity
key, no state store. Use the streaming form for continuous ingest, this
form for backfills/reprocessing over the at-rest table.

Calendar gap-fill materializes the dense date spine a reporting layer
needs (the reference zero-fills missing months driver-side,
``endpoints.py:116-120``; the engine does it as a plan): sequence() the
min..max date range, explode, left-join the sparse aggregates, zero-fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-user session index to every event: a new session starts
    when the gap to the previous event (per user, ordered by timestamp
    with a unique tie-break) exceeds ``gap_minutes``.

    lag → boolean new-session flag → running sum, all over ONE keyed
    window — the canonical distributed sessionization. Scale: a single
    shuffle on the user key; each user's timeline sorts within its
    partition (bounded by per-user event counts, not table size). Skewed
    power users are still one partition each — for adversarial skew,
    pre-split by (user, day) and stitch sessions crossing the boundary.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    gap_sec = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_sec > gap_minutes * 60), 1
    ).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )


def user_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session summary (start, end, event count, duration seconds) —
    sessionize + one hash aggregate on (user, session_idx)."""
    s = sessionize(events, user_col, ts_col, order_tiebreak, gap_minutes)
    return (
        s.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_sec",
            (
                F.unix_timestamp("session_end")
                - F.unix_timestamp("session_start")
            ).cast("bigint"),
        )
    )


def fill_date_gaps(
    daily: DataFrame,
    date_col: str,
    key_cols: list[str],
    value_cols: dict[str, object],
    per_key: bool = False,
) -> DataFrame:
    """Densify a sparse per-(key, day) aggregate: absent days appear
    explicitly, filled with the given defaults.

    Two spine contracts — pick by key cardinality:

    - ``per_key=False`` (default, GLOBAL spine): every key × every day of
      the GLOBAL observed [min, max] range. The spine is sequence(min,
      max) on a 1-row aggregate, exploded and crossed with the distinct
      key set — |days| × |keys| rows. This is the dashboard-grid shape
      and REQUIRES a BOUNDED key set (event types, countries, status
      enums): with a data-scale key like user_id the dense grid is
      |days| × |users| and mostly default-filled — use ``per_key=True``.
    - ``per_key=True`` (SPARSE spine): each key is densified over ITS OWN
      [min, max] range only — the spine is a per-key sequence exploded
      from one keyed min/max aggregate. No crossJoin anywhere, output is
      sum_k(span_k) rows, and every shuffle keys on (key, day) — safe at
      any key cardinality (per-user series, per-document series).

    Scale: the sparse aggregate side was already reduced by its groupBy,
    so no raw-event bytes reshuffle in either mode.
    """
    if per_key:
        spans = daily.groupBy(*key_cols).agg(
            F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
        )
        dense = spans.select(
            *key_cols,
            F.explode(F.sequence("__lo", "__hi")).alias(date_col),
        )
    else:
        bounds = daily.agg(
            F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
        )
        spine = bounds.select(
            F.explode(F.sequence("__lo", "__hi")).alias(date_col)
        )
        keys = daily.select(*key_cols).distinct()
        dense = spine.crossJoin(keys)
    out = dense.join(daily, [date_col, *key_cols], "left")
    for c, default in value_cols.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return out


def ewma_over_days(
    daily: DataFrame,
    value_col: str = "day_value",
    day_col: str = "day",
    lookback: int = 60,
) -> DataFrame:
    """Exponentially-weighted moving average over an ordered daily series,
    computed as a RECURSIVE fold (``s ← 0.5·s + 0.5·x``) over each row's
    trailing ``lookback``-row frame.

    Two deliberate choices make this cross-engine bit-exact where the
    closed-form EWMA is not:

    - α = 0.5: the fold multiplies by exactly-representable 0.5, so every
      intermediate is an IEEE double both engines compute identically
      (no ``pow`` — libm ``pow`` implementations may differ in ULPs);
    - left-to-right fold over the frame (Spark ``aggregate`` ≡ DuckDB
      ``list_reduce``): identical operation order → identical bits.

    The truncated lookback bounds the frame (beyond 60 halvings the
    contribution is below double precision anyway) AND keeps the window
    input bounded. The window is global-ordered but runs on the DAILY
    aggregate — a few thousand rows regardless of event volume, the same
    pre-aggregate-then-window pattern as ``orders_trailing_revenue``.
    """
    w = (
        Window.orderBy(day_col).rowsBetween(-(lookback - 1), Window.currentRow)
    )
    vals = F.collect_list(F.col(value_col)).over(w)
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at(vals, 1),
        lambda acc, x: acc * 0.5 + 0.5 * x,
    )
    return daily.select(
        day_col, value_col, F.round(ewma, 6).alias("ewma")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts — the standard product-analytics grid:
    users bucket into the Monday-truncated week of their FIRST event
    (cohort), and each (cohort_week, week_offset) cell counts the cohort
    members active that many weeks later. Output: (cohort_week date,
    week_offset int, n_users bigint).

    Shape: one keyed MIN per user (the cohort), one (user, week) distinct,
    one broadcast-size-agnostic keyed join on user, one final count —
    everything shuffles on user_id or the bounded (cohort, offset) grid.
    Offsets are exact integers: both weeks are Monday-truncated so the
    day difference is always a multiple of 7."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = first.select(
        F.col(user_col),
        F.date_trunc("week", F.col("__first_ts")).cast("date").alias(
            "cohort_week"
        ),
    )
    active = events.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("__aw"),
    ).distinct()
    return (
        active.join(cohort, on=user_col)
        .select(
            "cohort_week",
            (F.datediff(F.col("__aw"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def stickiness_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """DAU / trailing-WAU / stickiness per observed day — the product
    health metric next to the retention grid. Distinct users per day
    (DAU) and per trailing ``window_days`` window (WAU); the returned
    ``stickiness_fp`` column is DAU/WAU as a HALF-UP FIXED-POINT long in
    1e-4 units (floor(ratio·10000 + 0.5) — 5234 means 0.5234), the
    integer-exact encoding that keeps the column bit-identical across
    engines (the DSIR/LM fixed-point convention).

    Rolling DISTINCT counts don't window: instead each (user, day)
    membership EXPLODES into the ``window_days`` future days it keeps the
    user "weekly active" for (a bounded generator, factor = window size),
    then one distinct + one keyed count — exact, no approximate sketch,
    every shuffle keyed on the bounded (user, day) / day grid. Days with
    no events report no row (observed-day semantics)."""
    ud = events.select(
        F.col(user_col).alias("__u"),
        F.to_date(ts_col).alias("__d"),
    ).distinct()
    dau = ud.groupBy(F.col("__d").alias("day")).agg(
        F.count("*").alias("dau")
    )
    spread = (
        ud.select(
            "__u",
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("__off"),
            "__d",
        )
        .select("__u", F.date_add(F.col("__d"), F.col("__off")).alias("day"))
        .distinct()
    )
    wau = spread.groupBy("day").agg(F.count("*").alias("wau"))
    return (
        dau.join(wau, on="day")
        .select(
            "day",
            "dau",
            "wau",
            F.floor(F.col("dau") / F.col("wau") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("stickiness_fp"),
        )
    )
