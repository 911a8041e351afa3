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


def drain_stream(query, timeout_sec: int = 1800) -> None:
    """Wait for an availableNow stream to terminate, STRICTLY.

    ``awaitTermination(t)`` returns False on timeout and the caller's
    memory-sink table would silently hold PARTIAL results — a wrong
    answer that looks like a flake (seen under full-suite load when a
    drain crossed a 300 s wait). An availableNow trigger always
    terminates once every pending file is processed, so the only
    honest outcomes are "drained" or "raise"."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"stream {query.name or query.id} did not drain within {timeout_sec}s"
        )
