"""Streaming queries (SURVEY.md Phase 4). Each runs the stream to
completion with an availableNow trigger and returns the materialized
result, so the driver's checks apply unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_deduplicator_spark import streaming as ST
from distributed_deduplicator_spark.queries.registry import query


@query("stream_dedup_watermark")  # rows-only: representative row per key
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on (user_id, event_type) — the
    streaming twin of dedup_first_wins; state bounded by a 1-day
    watermark (reference TTL semantics, R12+R13)."""
    s = ST.stream_dedup_within_watermark(spark, sf_dir, ttl="1 day")
    return ST.run_stream_to_df(s, spark, output_mode="append")


@query("stream_windowed_counts", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(value AS DECIMAL(18,2))) AS total_value
FROM events
GROUP BY 1, 2
""")
def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts per event_type, computed by the streaming
    engine in complete mode — once drained, deterministic and equal to
    the batch aggregation, so fully oracle-checked."""
    s = ST.stream_windowed_counts(spark, sf_dir)
    return ST.run_stream_to_df(s, spark, output_mode="complete")
