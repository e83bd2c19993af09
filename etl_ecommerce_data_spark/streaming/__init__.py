from etl_ecommerce_data_spark.streaming.events import (
    read_events_stream,
    run_windowed_stream_to_memory,
    windowed_event_aggregation,
)

__all__ = [
    "read_events_stream",
    "run_windowed_stream_to_memory",
    "windowed_event_aggregation",
]
