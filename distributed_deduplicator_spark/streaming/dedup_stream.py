"""Structured Streaming rendering of the reference's concurrency story.

The reference deduplicates *attempts arriving over time*, bounding its
state with per-record TTLs (usingTtl, DeduplicationProvider.kt:203,219)
and absorbing same-key bursts in-process before storage
(CachedDuplicateBurstAbsorber.kt:16-19). Structured Streaming models
both natively:

- ``withWatermark(ts, ttl)`` + ``dropDuplicatesWithinWatermark(keys)``
  = TTL-bounded dedup state (R12) with burst collapse per micro-batch
  (R13) — the state store evicts keys once the watermark passes, which
  is exactly the reference's TTL expiry;
- windowed aggregations with late-data handling generalize the
  append-only attempt log into time-bucketed audit metrics.

At 100 TB/day the same topology runs unchanged: state is partitioned by
key across executors (HDFS/RocksDB state store), watermark bounds state
size, and the per-micro-batch pre-dedup keeps shuffle volume at one row
per key per batch.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.scratch import scratch_dir
from distributed_deduplicator_spark.sources import load_table
from distributed_deduplicator_spark.sources.fixtures import table_schema


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-source stream (schema from the
    batch reader, including the nanos→micros normalization)."""
    batch = load_table(spark, sf_dir, "events")
    # cached footer schema — a fresh spark.read.parquet(...).schema here
    # would pay one needless footer job per call (8+ streaming queries
    # per drive), the exact waste the fixtures schema cache exists for
    raw_schema = table_schema(spark, sf_dir, "events")
    # file source wants a directory or glob, not a bare file path
    stream = (spark.readStream.schema(raw_schema)
              .parquet(f"{sf_dir}/events.parque[t]"))
    # apply the same normalizations the batch loader does: nanos long →
    # micros timestamp, and TIMESTAMP_NTZ → TIMESTAMP (watermarks reject
    # NTZ event time: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE; session tz is
    # UTC so the cast is value-preserving)
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(stream.dtypes)["ts"] == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert stream.schema == batch.schema
    return stream


_DRAIN_BYTES_PER_PARTITION = 16 << 20


def drain_shuffle_partitions(spark: SparkSession, sf_dir: str,
                             *tables: str, floor: int = 4) -> int | None:
    """Right-size a stateful drain's shuffle parallelism to its source.

    Every post-shuffle stage of a stateful streaming query creates one
    state-store instance per shuffle partition (a stream-stream join
    creates FOUR), and each instance pays a fixed load+commit+snapshot
    cost per micro-batch that dwarfs the per-row work on small inputs:
    measured at sf0.01, the attribution join spends ~90% of its 13 s
    wall in state-store commits across 128 instances (its
    StreamingQueryProgress reports cumulative commitTimeMs 62 s for a
    10 s batch). Scale the partition count with source bytes (~16 MiB
    of source per partition), clamped to [4, session setting]: large
    deployments keep their configured parallelism — at 100 TB the
    byte-derived count exceeds any sane session setting and this is a
    no-op — while fixture-scale drains stop paying for hundreds of
    near-empty state stores.

    ``floor`` is the minimum: 4 suits stateful stages whose post-
    shuffle work is trivial per row (joins, windowed counts, dedup —
    the scan stage parallelizes by file split regardless), but a drain
    whose post-shuffle stage does REAL per-row compute (a Python
    stateful operator: one pandas worker per partition) must floor at
    defaultParallelism or the byte-derived count starves it of cores —
    measured on the TTL-dedup drain at 10× bench scale, 4 partitions
    ran 81 s where one-per-core runs ~13 s.

    Returns None (= keep the session setting) when a source size or
    the session setting is unavailable, e.g. remote fixture dirs —
    sizing is an optimization, never a requirement.
    """
    def _source_bytes(path: str) -> int:
        # a fixture table may be a Spark-written DIRECTORY of part
        # files; getsize on a directory returns the inode size (~4 KB),
        # which would silently collapse every drain to the floor count —
        # sum the contained files instead
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path) for f in files)
        return os.path.getsize(path)

    try:
        total = sum(_source_bytes(f"{sf_dir}/{t}.parquet")
                    for t in tables)
        session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (OSError, TypeError, ValueError):
        return None
    if total <= 0:
        # an existing-but-empty directory (or one whose subtrees
        # os.walk silently skipped as unreadable) sums to 0 bytes —
        # that is "sizing unavailable", the same degradation as a
        # missing file above, NOT evidence the source is tiny; sizing
        # from it would collapse the drain to the floor count while a
        # missing file keeps the session default. Keep both paths
        # consistent: no usable size → session default.
        return None
    want = max(floor, -(-total // _DRAIN_BYTES_PER_PARTITION))
    return min(session, want)


def run_stream_to_df(stream_df: DataFrame, spark: SparkSession,
                     output_mode: str = "append", *,
                     no_data_batch: bool = True,
                     shuffle_partitions: int | None = None) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into
    session-scoped scratch parquet and return the lazy reader — the
    batch shape the driver's checks need, with NO driver
    materialization (the memory sink this replaced pinned — and a
    later collect() round-tripped — the full result on the driver; a
    drained dedup stream is attempt-cardinality-sized, a driver OOM at
    100 TB). Append mode drains straight through the parquet file
    sink; complete mode (the file sink rejects it) goes through a
    foreachBatch overwrite, whose last micro-batch IS the complete
    result. Both writes happen on executors at full parallelism; the
    scratch root is swept at interpreter exit (scratch.py). Update
    mode (the file sink rejects it too) also goes through
    foreachBatch, APPENDING each micro-batch's changed rows — the
    drained table then holds every emitted update, exactly the
    replaced memory sink's update-mode contract.

    ``no_data_batch=False`` skips the trailing watermark-only
    micro-batch (spark.sql.streaming.noDataMicroBatches.enabled) —
    that batch exists to fire watermark-driven EMISSION (append-mode
    windowed/session aggregates finalizing closed windows) and state
    eviction; eviction is irrelevant to a drained query's output. It
    is therefore safe exactly when emitted rows never wait on the
    watermark: inner stream joins, dropDuplicates(WithinWatermark),
    timeout-free (apply|transform)InPandasWithState, any complete-mode
    sink, and timeout-free update-mode sinks. The shapes that DO defer
    emission to watermark/timeout advance are rejected here (enforced,
    not just documented: a rows-only caller would otherwise get a
    silently empty/partial drain): in append mode, streaming
    aggregates, outer/anti stream joins, and stateful operators with a
    registered timeout; in update mode, the stateful-timeout shape
    alone (its timed-out groups still emit in LATER batches, while
    update-mode aggregates and joins emit every change as it happens,
    so they stay legal). Complete mode re-emits the full result each
    batch — nothing defers. Equality of the legal classes against
    their batch twins and the rejections are pinned in
    tests/test_streaming_sinks.py.

    ``shuffle_partitions`` (see drain_shuffle_partitions) bounds the
    per-micro-batch state-store fan-out for the duration of this drain;
    the session value is restored before returning. None keeps the
    session setting.
    """
    if output_mode not in ("append", "complete", "update"):
        raise ValueError(f"unsupported output_mode: {output_mode!r}")
    if not no_data_batch and output_mode in ("append", "update"):
        # Shapes that defer emission to watermark/timeout advance —
        # which under availableNow happens in the trailing no-data
        # batch — would silently drop their final rows if it is
        # skipped. In APPEND mode three shapes defer: streaming
        # aggregates (windowed/session groupBy emit a window only once
        # the watermark passes it), outer/anti stream joins
        # (null-padded / anti matches emit on state eviction), and
        # stateful operators with a registered timeout (timed-out
        # groups emit in later batches). In UPDATE mode only the
        # stateful-timeout shape defers — update-mode aggregates and
        # joins emit each change as it happens. Match the NODES in the
        # analyzed plan, each requiring the ~ streaming marker — a
        # static-side Aggregate (e.g. a pre-aggregated dimension joined
        # onto the stream) prints WITHOUT ~ and is emission-safe, and a
        # column merely NAMED "...Aggregate..." can't false-positive.
        # ~Join LeftOuter over a STATIC right side is also rejected
        # (conservative: the text form can't cheaply distinguish it
        # from stream-stream) — such callers keep the default.
        # The timeout alternation matches BOTH spellings: the classic
        # GroupStateTimeout names (ProcessingTimeTimeout /
        # EventTimeTimeout, printed by FlatMapGroupsWithState /
        # applyInPandasWithState) AND the bare TimeMode names
        # (ProcessingTime / EventTime) that Spark 4.1's
        # TransformWithState nodes print — the \b keeps NoTime and
        # column names like eventTimeCol from matching. Timeout forms
        # are listed first so the longer token wins.
        plan = stream_df._jdf.queryExecution().analyzed().toString()
        timeout_shape = (
            r"~\w*(?:FlatMapGroups|TransformWithState)\w*"
            r"[^\n]*(?:ProcessingTimeTimeout|EventTimeTimeout"
            r"|ProcessingTime\b|EventTime\b)")
        deferred = timeout_shape if output_mode == "update" else (
            r"(?m)^[\s+:\-]*~Aggregate\b"
            r"|^[\s+:\-]*~Join (LeftOuter|RightOuter|FullOuter|LeftAnti)\b"
            r"|" + timeout_shape)
        if re.search(deferred, plan):
            raise ValueError(
                "no_data_batch=False with a shape whose emission waits "
                "on the watermark or a timeout (append-mode streaming "
                "aggregate / outer or anti stream join, or a stateful "
                "timeout in append or update mode): its final rows are "
                "only emitted by the trailing watermark batch — drain "
                "with the default no_data_batch, or use complete mode")
    out = scratch_dir("stream_result")
    # pre-create: a drain that schedules ZERO micro-batches (possible
    # for an empty source in foreachBatch mode) would otherwise leave
    # no directory for the read below to point at — an empty dir plus
    # the explicit schema reads back as a valid zero-row result
    os.makedirs(out, exist_ok=True)
    # confs are captured by the streaming query at start(); restore the
    # session values once the drain finishes so one query's sizing never
    # bleeds into the next (drains are blocking, so no concurrency here)
    overrides: dict[str, str] = {}
    if not no_data_batch:
        overrides["spark.sql.streaming.noDataMicroBatches.enabled"] = "false"
    if shuffle_partitions is not None:
        overrides["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        with tempfile.TemporaryDirectory() as ckpt:
            writer = (stream_df.writeStream
                      .outputMode(output_mode)
                      .option("checkpointLocation", ckpt)
                      .trigger(availableNow=True))
            if output_mode == "complete":
                writer = writer.foreachBatch(
                    lambda bdf, _bid:
                    bdf.write.mode("overwrite").parquet(out))
            elif output_mode == "update":
                writer = writer.foreachBatch(
                    lambda bdf, _bid:
                    bdf.write.mode("append").parquet(out))
            else:
                writer = writer.format("parquet").option("path", out)
            q = writer.start()
            q.awaitTermination()
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    # explicit schema: zero-row drains have no footer to infer from
    return spark.read.schema(stream_df.schema).parquet(out)


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str,
                                  ttl: str = "1 day") -> DataFrame:
    """Streaming TTL-horizon dedup of events on (user_id, event_type).

    ``dropDuplicatesWithinWatermark`` keeps the first attempt seen per
    key and suppresses duplicates until the watermark (= max event time
    − ttl) passes the first attempt's timestamp — the reference's
    usingTtl semantics with the watermark as the expiry clock.
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", ttl)
    return ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])


def stream_windowed_counts(spark: SparkSession, sf_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-event-type counts with late-data tolerance.

    Epoch-aligned tumbling windows; counts are deterministic once the
    stream drains, so this one IS oracle-checkable (DuckDB
    time_bucket).
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (ev.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value"))
              .select(F.col("w.start").alias("window_start"),
                      "event_type", "n_events", "total_value"))


def stream_enrich_counts(spark: SparkSession, sf_dir: str,
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-static enrichment join + windowed aggregation: the
    events stream joins the static customer dimension (broadcast — a
    static side never holds streaming state), then counts per
    (window, market segment). The canonical streaming-ETL topology:
    enrich-then-aggregate with bounded state."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    cust = load_table(spark, sf_dir, "customer") \
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    enriched = ev.join(F.broadcast(cust), "user_id")
    return (enriched.groupBy(F.window("ts", window).alias("w"),
                             F.col("c_mktsegment"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"),
                    "c_mktsegment", "n_events"))


def stream_stream_attribution(spark: SparkSession, sf_dir: str,
                              window_s: int = 1800,
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: purchases joined to the same
    user's preceding non-purchase events within ``window_s`` — the
    streaming twin of the batch attribution range join.

    Both sides carry watermarks and the join condition bounds event
    time on both sides, so each side's buffered state is evicted once
    the other side's watermark passes the range — bounded state, the
    textbook stream-stream inner join. Drained with availableNow the
    result equals the batch interval join (oracle-checkable).
    """
    ev = events_stream(spark, sf_dir)
    conv = (ev.where(F.col("event_type") == "purchase")
              .select(F.col("event_id").alias("conv_event_id"),
                      F.col("user_id").alias("conv_user"),
                      F.col("ts").alias("conv_ts"))
              .withWatermark("conv_ts", watermark))
    base = (ev.where(F.col("event_type") != "purchase")
              .select(F.col("event_id").alias("base_event_id"),
                      F.col("user_id").alias("base_user"),
                      F.col("ts").alias("base_ts"))
              .withWatermark("base_ts", watermark))
    joined = conv.join(
        base,
        (F.col("conv_user") == F.col("base_user"))
        & (F.col("base_ts") >= F.col("conv_ts")
           - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("base_ts") < F.col("conv_ts")))
    return joined.select("conv_event_id", "conv_user", "conv_ts",
                         "base_event_id", "base_ts")


def stream_session_windows(spark: SparkSession, sf_dir: str,
                           gap: str = "30 minutes",
                           watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user, computed by the streaming
    engine (`session_window` merges windows while events arrive within
    the gap). Once drained, each session is [min ts, max ts + gap) with
    its event count — identical to batch gap-sessionization, so it is
    oracle-checkable.
    """
    ev = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (ev.groupBy(F.session_window("ts", gap).alias("w"),
                       F.col("user_id"))
              .agg(F.count("*").alias("n_events"))
              .select("user_id",
                      F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"),
                      "n_events"))


def stream_sliding_counts(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour", slide: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Sliding-window counts (each event lands in window/slide
    overlapping windows — Spark expands to the window list before the
    keyed aggregation; state per (window, type), evicted by the
    watermark)."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", watermark)
    return (ev.groupBy(F.window("ts", window, slide).alias("w"),
                       F.col("event_type"))
              .agg(F.count("*").alias("n_events"))
              .select(F.col("w.start").alias("window_start"),
                      F.col("w.end").alias("window_end"),
                      "event_type", "n_events"))
