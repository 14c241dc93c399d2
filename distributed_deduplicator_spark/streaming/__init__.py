from distributed_deduplicator_spark.streaming.guarded_sink import (
    run_guarded_stream_ledger,
)
from distributed_deduplicator_spark.streaming.dedup_stream import (
    drain_shuffle_partitions,
    events_stream,
    stream_dedup_within_watermark,
    stream_windowed_counts,
    stream_enrich_counts,
    stream_stream_attribution,
    stream_session_windows,
    stream_sliding_counts,
    run_stream_to_df,
)

__all__ = [
    "drain_shuffle_partitions",
    "events_stream",
    "stream_dedup_within_watermark",
    "stream_windowed_counts",
    "stream_enrich_counts",
    "stream_stream_attribution",
    "stream_session_windows",
    "stream_sliding_counts",
    "run_stream_to_df",
    "run_guarded_stream_ledger",
]
