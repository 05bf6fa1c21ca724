from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sessionized_counts",
    "streaming_dedup",
    "tumbling_counts",
]
