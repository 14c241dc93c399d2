"""Bucketed interval/range join.

Spark plans a raw ``t1.ts BETWEEN t2.start AND t2.end`` join (even with
an equi-key) as an equi-join whose range residual all lands in one
reducer pass — fine — but WITHOUT an equi-key it degenerates to a
BroadcastNestedLoopJoin/CartesianProduct: quadratic, a non-starter at
scale. The standard fix (used by every warehouse engine's range-join
optimization) is *binning*: quantize time into fixed buckets, explode
each interval to the buckets it covers, map each point row to its one
bucket, and equi-join on (key, bucket) with the exact range predicate
as a residual filter.

Cost model: interval replication = ceil(len/bucket) + 1 rows per
interval; candidate pairs per bucket ≈ points/bucket × intervals
overlapping it. Pick ``bucket_seconds`` ≈ the typical interval length:
replication stays O(1) while the residual filter discards few
candidates. Each (point, interval) match is produced exactly once —
the point lives in exactly one bucket — so no distinct is needed.

Reference tie-in: the TTL horizon (usingTtl,
provider/DeduplicationProvider.kt:203,219) is a per-key time window;
this operator generalizes "does this attempt fall inside a live
window" to arbitrary interval tables (attribution windows, maintenance
windows, session membership).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_deduplicator_spark.functions.timeutil import ts_micros


def interval_join_bucketed(points: DataFrame, intervals: DataFrame,
                           point_key: str, interval_key: str,
                           ts_col: str, start_col: str, end_col: str,
                           bucket_seconds: int) -> DataFrame:
    """Inner-join points to intervals with
    ``key match AND start <= ts < end``, via bucket equi-join.

    Non-key column sets must be disjoint; ``point_key`` and
    ``interval_key`` MAY share a name (both tables keyed ``user_id`` is
    the natural call) — every join-condition column is resolved against
    its own side, never by bare name. Returns all point columns + all
    interval columns for each match, each match exactly once.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    bucket_us = int(bucket_seconds) * 1_000_000

    def _bkt(side, c):  # floor-divide µs into bucket index
        return F.floor(ts_micros(side[c]) / F.lit(bucket_us)) \
                .cast("long")

    p = points.withColumn("_pb", _bkt(points, ts_col))
    # one row per bucket the interval [start, end) covers; covering the
    # end bucket even for boundary-aligned ends is harmless — the exact
    # residual filter discards the overcoverage
    iv = intervals.withColumn(
        "_ib", F.explode(F.sequence(_bkt(intervals, start_col),
                                    _bkt(intervals, end_col))))
    joined = p.join(
        iv,
        (p[point_key] == iv[interval_key])
        & (p["_pb"] == iv["_ib"])
        & (p[ts_col] >= iv[start_col])
        & (p[ts_col] < iv[end_col]))
    if point_key == interval_key:
        # same-name keys: keep the point side's copy only
        joined = joined.drop(iv[interval_key])
    return joined.drop("_pb", "_ib")
