from backend_big_data_spark.streaming.events import (  # noqa: F401
    hourly_counts_batch,
    read_events_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
