"""Streaming funnel tracking — per-user ordered-stage state machine via
``applyInPandasWithState`` (the streaming twin of the batch
``events_funnel_conversion`` query in plans/curation.py).

Each user's state is the earliest timestamp at which they completed each
funnel stage IN ORDER (view → click-after-view → purchase-after-click).
Built-in windowed aggregations cannot express "min ts of X after my min
ts of Y" incrementally; the custom state layout is three nullable epochs
per user, updated monotonically — a micro-batch can only fill a later
stage or improve an earlier one, and stage k only ever advances using the
CURRENT stage k−1 time, so processing order within the batch is handled
by sorting the batch slice.

Incremental-correctness caveat (documented, tested): a later batch that
IMPROVES stage k−1 (an earlier qualifying event arrives late) does not
retroactively re-open stage k decisions made with the older k−1 value —
the same trade every low-latency funnel tracker makes; the batch query is
the exact-reprocessing path.

Scale: state is 24 bytes per user; one shuffle on user_id per batch;
emit-on-update. An idle-user timeout would bound state like
``user_running_totals`` — omitted here so the funnel survives arbitrarily
long view→purchase journeys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def user_funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user funnel progress, emitted on every update:
    ``(user_id, t_view, t_click, t_purchase)`` — epoch seconds (nullable),
    each the earliest ORDERED completion of its stage."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, t_view long, t_click long, t_purchase long"
    state_schema = "t_view long, t_click long, t_purchase long"

    def update(key, pdfs, state: GroupState):
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        import pandas as pd

        # concatenate ALL Arrow chunks before sorting: a group larger than
        # arrow.maxRecordsPerBatch arrives as multiple chunks, and sorting
        # each chunk independently would process a later-chunk view after
        # an earlier-chunk click, silently missing the stage
        chunks = list(pdfs)
        if not chunks:  # state-only invocation (e.g. under a timeout conf)
            state.update((t1, t2, t3))
            yield pd.DataFrame(
                {"user_id": [key[0]], "t_view": [t1], "t_click": [t2],
                 "t_purchase": [t3]}
            )
            return
        whole = pd.concat(chunks, ignore_index=True)
        for _, row in whole.sort_values("ts").iterrows():
            ts = int(row["ts"].timestamp())
            et = row["event_type"]
            if et == "view" and (t1 is None or ts < t1):
                t1 = ts
            elif et == "click" and t1 is not None and ts > t1 and (
                t2 is None or ts < t2
            ):
                t2 = ts
            elif et == "purchase" and t2 is not None and ts > t2 and (
                t3 is None or ts < t3
            ):
                t3 = ts
        state.update((t1, t2, t3))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "t_view": [t1],
                "t_click": [t2],
                "t_purchase": [t3],
            }
        )

    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


__all__ = ["user_funnel_stages"]
