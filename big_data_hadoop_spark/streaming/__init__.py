"""Structured Streaming surface."""

from big_data_hadoop_spark.streaming.pipelines import (
    read_events_stream,
    read_files_stream,
    reconcile_files_stream,
    streaming_exact_dedup,
    streaming_funnel,
    streaming_upsert,
    streaming_curate,
    streaming_interval_join,
    streaming_neighbor_counts,
    streaming_pair_counts,
    streaming_ppl_score,
    streaming_sessionize,
    streaming_token_counts,
    streaming_topk_words,
    streaming_windowed_event_agg,
    write_stream_parquet,
)

__all__ = [
    "read_events_stream",
    "read_files_stream",
    "reconcile_files_stream",
    "streaming_exact_dedup",
    "streaming_funnel",
    "streaming_upsert",
    "streaming_curate",
    "streaming_interval_join",
    "streaming_neighbor_counts",
    "streaming_pair_counts",
    "streaming_ppl_score",
    "streaming_sessionize",
    "streaming_token_counts",
    "streaming_topk_words",
    "streaming_windowed_event_agg",
    "write_stream_parquet",
]
