"""Event-time session closing — ``applyInPandasWithState`` with
``EventTimeTimeout``: a user's session is EMITTED (not just aggregated)
when the stream's watermark passes ``last_event + gap``, i.e. when event
time itself proves no more events can join the session.

This is the one state-API variant the engine's streaming surface did not
yet demonstrate (`events.user_running_totals` uses ProcessingTimeTimeout —
a wall-clock liveness bound; the funnel uses NoTimeout). Event-time
closure is the DETERMINISTIC form: which sessions close, and with what
contents, depends only on the data and the watermark delay, never on
wall-clock scheduling — so closed sessions can be equivalence-tested
against the BATCH sessionizer on the same events (the streaming ≡ batch
discipline every other streaming op here follows).

Semantics note (inherent to event-time closure, asserted by the tests):
a session is emitted iff some watermark advance proves it complete —
``last_event + gap < watermark``. In an ``availableNow`` replay the
engine runs a final watermark-advancing batch, so exactly the sessions
within ``gap`` of the stream's maximum event time remain open (unemitted)
in the state store; a production pipeline drains those with a heartbeat
that pushes the watermark past them, or by reading the state store.

Scale: state is one (start, last, count) triple per OPEN session per
user; event-time timeout guarantees the store only ever holds sessions
younger than (watermark - gap) — the same bound the batch sessionizer's
shuffle enjoys, maintained continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def close_user_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Emit one row per CLOSED session: (user_id, session_start,
    session_end, n_events, duration_sec). ``events`` must carry
    (user_id, ts); rows later than the watermark delay are dropped by the
    engine (late-data contract shared with the windowed aggregations)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, duration_sec long"
    )
    state_schema = "start_ms long, last_ms long, n long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        def emit(start_ms, last_ms, n):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                    "duration_sec": [(last_ms - start_ms) // 1000],
                }
            )

        if state.hasTimedOut:
            # watermark passed last + gap: the session is provably complete
            start_ms, last_ms, n = state.get
            state.remove()
            yield emit(start_ms, last_ms, n)
            return

        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        ts_ms = (ts.astype("int64") // 1_000_000).tolist()
        if state.exists:
            start_ms, last_ms, n = state.get
            # Events EARLIER than the stored start (possible whenever the
            # watermark delay exceeds the gap): the batch sessionizer's
            # per-user sort would have processed them BEFORE the stored
            # session — run the gap loop over them standalone, then either
            # emit the final early run as its own closed session (it ends
            # more than gap before the stored start) or extend the stored
            # session's start to cover it (it connects).
            early = [t for t in ts_ms if t < start_ms]
            ts_ms = ts_ms[len(early):]
            if early:
                e_start = e_last = early[0]
                e_n = 0
                for t in early:
                    if t - e_last > gap_ms:
                        yield emit(e_start, e_last, e_n)
                        e_start, e_n = t, 0
                    e_last = t
                    e_n += 1
                if start_ms - e_last > gap_ms:
                    yield emit(e_start, e_last, e_n)
                else:
                    start_ms = e_start
                    n += e_n
        else:
            start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
        for t in ts_ms:
            if t - last_ms > gap_ms:
                # gap inside the batch: the old session closed in-data
                yield emit(start_ms, last_ms, n)
                start_ms, n = t, 0
            last_ms = max(last_ms, t)
            n += 1
        state.update((start_ms, last_ms, n))
        # close when event time (the watermark) passes last + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)

    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


__all__ = ["close_user_sessions"]
