from memories_spark.streaming.events import (  # noqa: F401
    EVENT_SCHEMA,
    attribute_clicks_to_views,
    compact_term_stats,
    dedup_event_stream,
    incremental_term_stats_sink,
    read_event_stream,
    sessionize_stream,
    sliding_event_counts_stream,
    windowed_event_counts,
)
