"""Temporal operators: sessionization and as-of joins.

The reference's TTL horizon (provider/DeduplicationProvider.kt:203,219)
treats time as a dedup boundary; these operators generalize that into
the two temporal primitives every event pipeline needs:

- :func:`sessionize` — gap-based session assignment (a new session
  starts when the inter-event gap exceeds ``gap_seconds``). Unlike the
  TTL recurrence in ``dedup_within_ttl`` (horizon restarts only at
  ACCEPTED rows), the session gap restarts at EVERY row, which makes it
  fully window-expressible: lag + boundary flag + running sum — one
  shuffle, no custom state.
- :func:`asof_join` — for each left row, the latest right row at or
  before its timestamp (per key). Implemented as the union-sort trick:
  tag both sides, sort within key by (ts, tag), and carry the last seen
  right payload forward with last(ignorenulls) — ONE shuffle of
  left+right, linear work, no per-key blowup (the naive
  join-then-filter plan multiplies each left row by ALL earlier right
  matches before reducing — quadratic in matches per key).

Scale notes: both shuffle once on the join/session key; skewed keys
are split by AQE. State per key is O(1) in the window evaluation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from distributed_deduplicator_spark.functions.timeutil import ts_micros


def sessionize(df: DataFrame, keys: Sequence[str], ts_col: str,
               gap_seconds: int, order_by: Sequence[str] | None = None,
               session_col: str = "session_seq") -> DataFrame:
    """Assign a per-key session sequence number (1-based).

    A row starts a new session when it is the key's first row or when
    ``ts - previous ts > gap_seconds``. ``order_by`` defaults to
    ``[ts_col]``; pass an extra unique column for a deterministic total
    order under timestamp ties.
    """
    order = list(order_by) if order_by else [ts_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    prev_us = F.lag(ts_micros(ts_col)).over(w)
    boundary = F.when(
        prev_us.isNull()
        | (ts_micros(ts_col) - prev_us > gap_us), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding,
                            Window.currentRow)
    return df.withColumn("_b", boundary) \
             .withColumn(session_col, F.sum("_b").over(running)) \
             .drop("_b")


def session_stats(df: DataFrame, keys: Sequence[str], ts_col: str,
                  gap_seconds: int,
                  order_by: Sequence[str] | None = None) -> DataFrame:
    """One row per (key, session): event count, start/end, duration."""
    s = sessionize(df, keys, ts_col, gap_seconds, order_by)
    return (s.groupBy(*keys, "session_seq")
             .agg(F.count("*").alias("n_events"),
                  F.min(ts_col).alias("session_start"),
                  F.max(ts_col).alias("session_end"),
                  ((ts_micros(F.max(ts_col))
                    - ts_micros(F.min(ts_col))) / F.lit(1_000_000.0))
                  .alias("duration_s")))


def asof_join(left: DataFrame, right: DataFrame,
              left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              payload: Sequence[str],
              right_order: Sequence[str] | None = None) -> DataFrame:
    """Left as-of join: attach the latest right row with
    ``right_ts <= left_ts`` per key; payload columns are null when no
    right row precedes the left row.

    Deterministic under ties: among right rows sharing the greatest
    eligible ``right_ts``, the one greatest by ``right_order`` (defaults
    to ``payload``) wins — mirror this in any oracle.
    """
    r_order = list(right_order) if right_order else list(payload)
    lcols = left.columns
    l = (left.select(F.col(left_key).alias("_k"),
                     F.col(left_ts).alias("_ts"),
                     F.lit(1).alias("_tag"),
                     F.struct(*lcols).alias("_l"),
                     F.lit(None).cast(
                         right.select(F.struct(*r_order, *[
                             c for c in payload if c not in r_order
                         ]).alias("_r")).schema["_r"].dataType).alias("_r")))
    # NULL right_ts can never satisfy right_ts <= left_ts, but the
    # ascending sort puts NULLS FIRST, so an unfiltered NULL-ts row
    # would be carried into every left row of its key
    right = right.where(F.col(right_ts).isNotNull())
    r = (right.select(F.col(right_key).alias("_k"),
                      F.col(right_ts).alias("_ts"),
                      F.lit(0).alias("_tag"),
                      F.lit(None).cast(
                          left.select(F.struct(*lcols).alias("_l"))
                              .schema["_l"].dataType).alias("_l"),
                      F.struct(*r_order, *[
                          c for c in payload if c not in r_order
                      ]).alias("_r")))
    u = l.unionByName(r)
    # At equal ts the right row sorts first (tag 0 < 1) so `<=`
    # semantics hold; _r orders right rows under right_ts ties so
    # last() picks the maximal one deterministically.
    w = (Window.partitionBy("_k").orderBy("_ts", "_tag", "_r")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
    return (carried.where(F.col("_tag") == 1)
                   .select(*[F.col(f"_l.{c}").alias(c) for c in lcols],
                           *[F.col(f"_last_r.{c}").alias(c) for c in payload]))


def asof_join_forward(left: DataFrame, right: DataFrame,
                      left_key: str, right_key: str,
                      left_ts: str, right_ts: str,
                      payload: Sequence[str],
                      right_order: Sequence[str] | None = None
                      ) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row with
    ``right_ts >= left_ts`` per key (pandas merge_asof
    direction='forward'); payload columns are null when no right row
    follows the left row.

    Same union-sort-carry plan as the backward :func:`asof_join` —
    one shuffle, linear, no range join — with the window mirrored:
    the carry runs over [currentRow, unboundedFollowing] taking the
    FIRST right row, and at equal timestamps left rows sort before
    right rows so ``>=`` includes the simultaneous right row.

    Deterministic under ties: among right rows sharing the smallest
    eligible ``right_ts``, the one SMALLEST by ``right_order``
    (defaults to ``payload``) wins — the mirror image of backward's
    greatest-wins; mirror it in any oracle.
    """
    r_order = list(right_order) if right_order else list(payload)
    lcols = left.columns
    l = (left.select(F.col(left_key).alias("_k"),
                     F.col(left_ts).alias("_ts"),
                     F.lit(1).alias("_tag"),
                     F.struct(*lcols).alias("_l"),
                     F.lit(None).cast(
                         right.select(F.struct(*r_order, *[
                             c for c in payload if c not in r_order
                         ]).alias("_r")).schema["_r"].dataType).alias("_r")))
    # NULL right_ts can never satisfy right_ts >= left_ts; drop before
    # the sort (NULLS would sort last under asc and the forward carry
    # would otherwise surface them for trailing left rows)
    right = right.where(F.col(right_ts).isNotNull())
    r = (right.select(F.col(right_key).alias("_k"),
                      F.col(right_ts).alias("_ts"),
                      F.lit(0).alias("_tag"),
                      F.lit(None).cast(
                          left.select(F.struct(*lcols).alias("_l"))
                              .schema["_l"].dataType).alias("_l"),
                      F.struct(*r_order, *[
                          c for c in payload if c not in r_order
                      ]).alias("_r")))
    u = l.unionByName(r)
    # At equal ts the LEFT row sorts first (tag desc: 1 before 0) so a
    # simultaneous right row is inside the forward frame (`>=`); _r
    # ascending makes first() pick the minimal right row under ties.
    w = (Window.partitionBy("_k")
               .orderBy("_ts", F.col("_tag").desc(), "_r")
               .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    # NULL left_ts can satisfy no `right_ts >= left_ts` predicate, but
    # it sorts FIRST under asc, putting every right row inside its
    # forward frame — mask the carry to null for those rows (they keep
    # their left-join presence with null payload, matching the
    # backward sibling, where nulls-first means nothing precedes them)
    carried = u.withColumn(
        "_next_r",
        F.when(F.col("_ts").isNotNull(),
               F.first("_r", ignorenulls=True).over(w)))
    return (carried.where(F.col("_tag") == 1)
                   .select(*[F.col(f"_l.{c}").alias(c) for c in lcols],
                           *[F.col(f"_next_r.{c}").alias(c)
                             for c in payload]))


def asof_join_nearest(left: DataFrame, right: DataFrame,
                      left_key: str, right_key: str,
                      left_ts: str, right_ts: str,
                      payload: Sequence[str],
                      right_order: Sequence[str] | None = None
                      ) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'):
    attach the right row whose ``right_ts`` is closest to ``left_ts``
    in either direction; on an exact distance tie the PRECEDING row
    wins (pandas' tie rule). Null payload when the key has no right
    rows at all.

    One union + ONE sort serves both directions: the backward
    candidate is last(right) over [unbounded, current] and the
    forward candidate first(right) over [current, unbounded] — two
    frames over the same (ts, tag, order) sort, so Spark sorts once
    and the whole join stays one shuffle, linear, never a range join.
    A right row at exactly equal ts sorts into the BACKWARD frame
    (distance 0, and backward wins distance ties anyway, so the
    forward frame missing it is semantically invisible).

    Tie discipline among right rows sharing one timestamp: the
    backward candidate is maximal by ``right_order``, the forward
    candidate minimal — each side consistent with its directional
    sibling (:func:`asof_join` / :func:`asof_join_forward`); mirror
    all of this in any oracle.
    """
    r_order = list(right_order) if right_order else list(payload)
    lcols = left.columns
    rstruct = F.struct(
        F.col(right_ts).alias("_rts"),
        F.struct(*r_order, *[c for c in payload if c not in r_order])
         .alias("_rp"))
    l = (left.select(F.col(left_key).alias("_k"),
                     F.col(left_ts).alias("_ts"),
                     F.lit(1).alias("_tag"),
                     F.struct(*lcols).alias("_l"),
                     F.lit(None).cast(
                         right.select(rstruct.alias("_rr"))
                              .schema["_rr"].dataType).alias("_rr")))
    right = right.where(F.col(right_ts).isNotNull())
    r = (right.select(F.col(right_key).alias("_k"),
                      F.col(right_ts).alias("_ts"),
                      F.lit(0).alias("_tag"),
                      F.lit(None).cast(
                          left.select(F.struct(*lcols).alias("_l"))
                              .schema["_l"].dataType).alias("_l"),
                      rstruct.alias("_rr")))
    u = l.unionByName(r)
    order = [F.col("_ts").asc(), F.col("_tag").asc(), F.col("_rr").asc()]
    w_back = (Window.partitionBy("_k").orderBy(*order)
                    .rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow))
    w_fwd = (Window.partitionBy("_k").orderBy(*order)
                   .rowsBetween(Window.currentRow,
                                Window.unboundedFollowing))
    carried = (u.withColumn("_b", F.last("_rr", ignorenulls=True)
                                    .over(w_back))
                .withColumn("_f", F.first("_rr", ignorenulls=True)
                                    .over(w_fwd))
                .where(F.col("_tag") == 1))
    d_back = ts_micros(F.col("_ts")) - ts_micros(F.col("_b._rts"))
    d_fwd = ts_micros(F.col("_f._rts")) - ts_micros(F.col("_ts"))
    take_back = F.col("_b").isNotNull() & (
        F.col("_f").isNull() | (d_back <= d_fwd))
    # NULL left_ts has no distance to anything → both branches skipped
    # → null payload (the nulls-first sort would otherwise hand such
    # rows the key's earliest right row through the forward frame)
    chosen = (F.when(F.col("_ts").isNotNull() & take_back,
                     F.col("_b._rp"))
               .when(F.col("_ts").isNotNull(), F.col("_f._rp")))
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[chosen.getField(c).alias(c) for c in payload])


def interval_backlog(spans: DataFrame, open_col: str,
                     close_col: str) -> DataFrame:
    """Daily population count of open [open, close] date intervals —
    interval stabbing by delta-encoding + prefix sum, the scalable
    alternative to the day×interval range join.

    Each interval contributes a +1 delta on its open date and a −1 the
    day after its close; the running sum over the dense calendar spine
    is the number of intervals covering each day. Work is one
    corpus-scale combinable delta count (O(n)) plus a cumulative
    window over the ≤|days| delta table — never O(n·days). The spine
    explodes from a 1-row MIN/MAX aggregate, so construction launches
    no job.

    Returns (day, day_delta, n_open), one row per day from the first
    open to the last close. Property-tested against brute-force
    interval stabbing in tests/test_property_dedup.py.
    """
    span = spans.select(F.col(open_col).alias("_open"),
                        F.col(close_col).alias("_close"))
    # NULL-boundary or inverted spans cannot delta-encode (+1 and -1
    # would land out of order or never join the spine, silently
    # corrupting the running count) — exclude them; callers wanting
    # them counted must repair the bounds first
    span = span.where(F.col("_open").isNotNull()
                      & F.col("_close").isNotNull()
                      & (F.col("_close") >= F.col("_open")))
    deltas = (span.select(F.col("_open").alias("d"),
                          F.lit(1).alias("delta"))
                  .unionByName(
                      span.select(F.date_add("_close", 1).alias("d"),
                                  F.lit(-1).alias("delta")))
                  .groupBy("d").agg(F.sum("delta").alias("delta")))
    spine = (span.agg(F.min("_open").alias("lo"),
                      F.max("_close").alias("hi"))
                 .select(F.explode(F.sequence(
                     "lo", "hi", F.expr("interval 1 day"))).alias("day")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (spine.join(F.broadcast(deltas),
                       spine["day"] == deltas["d"], "left")
                 .select("day",
                         F.coalesce("delta", F.lit(0)).cast("bigint")
                          .alias("day_delta"))
                 .withColumn("n_open", F.sum("day_delta").over(w)))
