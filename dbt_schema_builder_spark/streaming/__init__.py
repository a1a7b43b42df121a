from .windows import (
    run_stream_to_files,
    run_stream_to_memory,
    stream_events,
    stream_text_corpus,
    streaming_click_purchase_join,
    streaming_dedup,
    streaming_funnel,
    streaming_session_window,
    streaming_dedup_against_history,
    streaming_static_enrich,
    streaming_tumbling_counts,
    streaming_user_state,
)

__all__ = [
    "stream_events",
    "stream_text_corpus",
    "streaming_tumbling_counts",
    "streaming_session_window",
    "streaming_dedup",
    "streaming_funnel",
    "streaming_user_state",
    "run_stream_to_memory",
    "run_stream_to_files",
    "streaming_click_purchase_join",
    "streaming_dedup_against_history",
    "streaming_static_enrich",
]
