"""Structured Streaming surface: streaming twins of the windowed
analytics plus a custom stateful operator."""

from qb_data_pipeline_backfill_spark.streaming.jobs import (
    dedup_exactly_once,
    enriched_segment_rollup,
    events_stream,
    interval_attribution_join,
    interval_attribution_join_outer,
    run_available_now,
    session_aggregates,
    sliding_counts,
    stateful_user_counts,
    stream_backfill,
    stream_to_jdbc_idempotent,
    tumbling_counts,
)

__all__ = [
    "dedup_exactly_once",
    "enriched_segment_rollup",
    "events_stream",
    "interval_attribution_join",
    "interval_attribution_join_outer",
    "run_available_now",
    "session_aggregates",
    "sliding_counts",
    "stateful_user_counts",
    "stream_backfill",
    "stream_to_jdbc_idempotent",
    "tumbling_counts",
]
