"""Streaming queries (SURVEY.md Phase 4). Each runs the stream to
completion with an availableNow trigger and returns the materialized
result, so the driver's checks apply unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_deduplicator_spark import streaming as ST
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.streaming.stateful import ttl_dedup_stateful


def _drain(spark: SparkSession, sf_dir: str, s: DataFrame,
           output_mode: str, floor: int = 4) -> DataFrame:
    """Shared tuned drain for this module's event-stream queries: every
    registered shape here emits independently of the watermark (inner
    join / dropDuplicates* / timeout-free stateful / complete mode — see
    run_stream_to_df, which rejects the one unsafe shape), so the
    trailing no-data micro-batch is pure state-store-commit overhead;
    partition count is sized to the events source so fixture-scale
    drains don't pay for 32-128 near-empty state stores (no-op at
    production scale — both knobs verified output-identical in
    tests/test_streaming_sinks.py). ``floor``: drains whose post-
    shuffle stage is real per-row compute pass defaultParallelism (see
    drain_shuffle_partitions)."""
    return ST.run_stream_to_df(
        s, spark, output_mode=output_mode, no_data_batch=False,
        shuffle_partitions=ST.drain_shuffle_partitions(
            spark, sf_dir, "events", floor=floor))


@query("stream_dedup_watermark")  # rows-only: representative row per key
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on (user_id, event_type) — the
    streaming twin of dedup_first_wins; state bounded by a 1-day
    watermark (reference TTL semantics, R12+R13)."""
    s = ST.stream_dedup_within_watermark(spark, sf_dir, ttl="1 day")
    return _drain(spark, sf_dir, s, "append")


@query("stream_windowed_counts", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""")
def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour counts per event_type, computed by the streaming
    engine in complete mode — once drained, deterministic and equal to
    the batch aggregation, so fully oracle-checked."""
    s = ST.stream_windowed_counts(spark, sf_dir)
    return _drain(spark, sf_dir, s, "complete")


_TTL_SECONDS = 86400

@query("stream_ttl_dedup_stateful", oracle=f"""
WITH RECURSIVE ordered AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
walk AS (
  SELECT user_id, event_type, ts, event_id, rn,
         ts AS last_accepted, TRUE AS accepted
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.ts, o.event_id, o.rn,
         CASE WHEN epoch_us(o.ts) - epoch_us(w.last_accepted)
                   >= {_TTL_SECONDS * 1_000_000}
              THEN o.ts ELSE w.last_accepted END,
         epoch_us(o.ts) - epoch_us(w.last_accepted)
           >= {_TTL_SECONDS * 1_000_000}
  FROM ordered o
  JOIN walk w ON o.user_id = w.user_id AND o.event_type = w.event_type
             AND o.rn = w.rn + 1)
SELECT user_id, event_type, ts, event_id,
       CASE WHEN accepted THEN 'SUCCESS' ELSE 'DUPLICATE' END AS verdict
FROM walk
""")
def q_stream_ttl_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT streaming TTL dedup via applyInPandasWithState — the
    custom stateful operator (one timestamp of state per live key,
    reference usingTtl semantics). Drained through availableNow, the
    output equals the batch recurrence, so it is fully oracle-checked."""
    ev = ST.events_stream(spark, sf_dir)
    # evict_state=False: a registered processing-time timeout would
    # keep the availableNow drain scheduling batches until the TTL
    # fires (hours) — state eviction is for continuous deployments.
    # floor=cores: the pandas stateful stage is per-row Python compute,
    # one worker per partition — byte-sized partitions starved it 4/32
    # cores (81 s vs ~13 s at 10× bench scale in the round-8 sweep)
    return _drain(spark, sf_dir,
                  ttl_dedup_stateful(ev, _TTL_SECONDS, evict_state=False),
                  "append",
                  floor=spark.sparkContext.defaultParallelism)


@query("stream_enrich_counts", oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       c_mktsegment,
       count(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""")
def q_stream_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (events stream × customer dimension) +
    tumbling counts per market segment, drained via availableNow —
    deterministic, so fully oracle-checked."""
    s = ST.stream_enrich_counts(spark, sf_dir)
    return _drain(spark, sf_dir, s, "complete")


_ATTR_S = 1800

@query("stream_stream_attribution", oracle=f"""
SELECT c.event_id AS conv_event_id,
       c.user_id AS conv_user,
       c.ts AS conv_ts,
       b.event_id AS base_event_id,
       b.ts AS base_ts
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') c
JOIN (SELECT event_id, user_id, ts FROM events
      WHERE event_type <> 'purchase') b
  ON b.user_id = c.user_id
 AND b.ts >= c.ts - INTERVAL {_ATTR_S} SECOND
 AND b.ts < c.ts
""")
def q_stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases × preceding events of the
    same user, both sides streaming with watermark-bounded buffer
    state), drained via availableNow — equals the batch interval join,
    so fully oracle-checked."""
    s = ST.stream_stream_attribution(spark, sf_dir, window_s=_ATTR_S)
    return _drain(spark, sf_dir, s, "append")


_SESSION_GAP_S = 1800

@query("stream_session_windows", oracle=f"""
WITH b AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {_SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS nb
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         sum(nb) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM b)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {_SESSION_GAP_S} SECOND AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_seq
""")
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via the streaming engine's
    session_window state merge. Drained with availableNow the result
    equals batch gap-sessionization ([min ts, max ts + gap) per
    session), so it is fully oracle-checked."""
    s = ST.stream_session_windows(spark, sf_dir,
                                  gap=f"{_SESSION_GAP_S} seconds")
    return _drain(spark, sf_dir, s, "complete")


@query("stream_sliding_counts", oracle="""
WITH w AS (
  SELECT event_type,
         unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts)
                   - INTERVAL '30 minutes']) AS window_start
  FROM events)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       event_type, count(*) AS n_events
FROM w GROUP BY window_start, event_type
""")
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m per-type counts through the streaming engine
    (complete mode, availableNow drain): every event belongs to exactly
    two epoch-aligned windows, so the batch SQL twin is an unnest over
    the two containing window starts — fully oracle-checked."""
    s = ST.stream_sliding_counts(spark, sf_dir)
    return _drain(spark, sf_dir, s, "complete")


@query("stream_upsert_ledger", oracle="""
SELECT user_id, event_id, ts, event_type, value, props
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""")
def q_stream_upsert_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming upsert: the events stream drains through a
    foreachBatch idempotent-merge sink (versioned parquet ledger keyed
    on batch id — streaming/sinks.py) and the query returns the
    ledger's final state: the LATEST event per user. This is the
    reference's exactly-once upsert write (R5/R6, wasApplied
    discipline) as a streaming topology, and the result is fully
    oracle-checked against the batch latest-row-per-key SQL."""
    import os
    import shutil
    import tempfile

    from distributed_deduplicator_spark.scratch import materialize
    from distributed_deduplicator_spark.streaming.sinks import (
        read_ledger, run_upsert_ledger)
    base = tempfile.mkdtemp(prefix="upsert_ledger_")
    try:
        ev = ST.events_stream(spark, sf_dir)
        state = os.path.join(base, "state")
        run_upsert_ledger(ev, ["user_id"], ["ts", "event_id"],
                          base_dir=state,
                          checkpoint_dir=os.path.join(base, "ckpt"))
        # compact the ledger's final state into session scratch with a
        # distributed write (NOT collect(): the ledger is
        # user-cardinality-sized — a driver OOM at 100 TB) so the
        # working ledger + checkpoint can be deleted now; scratch is
        # swept at interpreter exit (scratch.py)
        return materialize(read_ledger(spark, state), "upsert_ledger")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query("stream_minhash_neardup")  # rows-only: LSH banding + signature-
                                  # agreement estimate have no SQL twin
def q_stream_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-duplicate suppression with a persistent MinHash
    ledger (streaming/neardup_stream.py): the documents corpus replayed
    as a file stream, each microbatch shingled → signed → arbitrated
    first-wins against both its own near-dups and every earlier batch's
    survivors via the band-keyed signature ledger. The ledger carries
    64 longs per accepted doc — never text — so cross-batch candidate
    generation stays a fixed-width equi-join at any history size.
    Within-batch + cross-batch suppression both covered in
    tests/test_streaming_sinks.py (split-corpus replay, planted
    clones)."""
    import shutil
    import tempfile

    from distributed_deduplicator_spark.scratch import materialize
    from distributed_deduplicator_spark.streaming.neardup_stream import (
        stream_minhash_neardup)
    base = tempfile.mkdtemp(prefix="neardup_stream_")
    try:
        out = stream_minhash_neardup(
            spark, f"{sf_dir}/documents.parque[t]",
            ledger_dir=f"{base}/ledger", out_dir=f"{base}/verdicts",
            checkpoint_dir=f"{base}/ckpt")
        # compact the verdicts into session scratch with a distributed
        # write (NOT collect(): verdicts are corpus-cardinality-sized)
        # so the working ledger/checkpoint can be deleted now
        return materialize(out, "neardup_verdicts").orderBy("doc_id")
    finally:
        shutil.rmtree(base, ignore_errors=True)
