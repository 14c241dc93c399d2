"""Golden dedup scenarios — the reference's integration-test contract
(DeduplicationProviderTest.kt, see FIXTURES.md §A) re-expressed as
batch DataFrames with verdict columns instead of exceptions."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deduplicator_spark.operators import (
    STATE_SUCCESS, STATE_DUPLICATE, STATE_RETRY, STATE_FAILED,
    arbitrate_ledger, dedup_first_wins, dedup_within_ttl, latest_state,
)

SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("attempt_id", T.StringType()),
    T.StructField("state", T.ShortType()),
])

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ledger(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(seconds=s), a, st) for k, s, a, st in rows],
        SCHEMA)


def _verdicts(df, key):
    return [r.verdict for r in
            df.where(F.col("key") == key)
              .orderBy("ts", "attempt_id").collect()]


def test_single_key_success(spark):
    """One attempt → [SUCCESS] (DeduplicationProviderTest.kt:78-102)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS)])
    out = arbitrate_ledger(led, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["SUCCESS"]


def test_sequential_duplicate(spark):
    """Two attempts, disjoint times → [SUCCESS, DUPLICATE]
    (DeduplicationProviderTest.kt:104-143)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS),
                          ("k1", 10, "a2", STATE_SUCCESS)])
    out = arbitrate_ledger(led, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["SUCCESS", "DUPLICATE"]


def test_parallel_contention_end_state(spark):
    """Pre-replay end state [RETRY, DUPLICATE]: RETRY rows pass through
    as audit rows and never block (DeduplicationProviderTest.kt:145-209)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_RETRY),
                          ("k1", 0, "a2", STATE_DUPLICATE)])
    out = arbitrate_ledger(led, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["RETRY", "DUPLICATE"]
    # replay: the retrying claimant claims again later and is now sole
    led2 = _ledger(spark, [("k1", 0, "a1", STATE_RETRY),
                           ("k1", 0, "a2", STATE_DUPLICATE),
                           ("k1", 5, "a1", STATE_SUCCESS)])
    out2 = arbitrate_ledger(led2, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out2, "k1") == ["RETRY", "DUPLICATE", "SUCCESS"]


def test_failed_key_reclaimable(spark):
    """Block failure → FAILED; only SUCCESS blocks future attempts
    (DeduplicationProviderTest.kt:212-241; filter at
    DeduplicationProvider.kt:132)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_FAILED),
                          ("k1", 10, "a2", STATE_SUCCESS)])
    out = arbitrate_ledger(led, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["FAILED", "SUCCESS"]


def test_compensation_write_failure_row_stays_success(spark):
    """If the compensation write is not applied the row stays SUCCESS
    and still blocks (DeduplicationProviderTest.kt:243-284)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS),
                          ("k1", 10, "a2", STATE_SUCCESS)])
    out = arbitrate_ledger(led, ["key"], ["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["SUCCESS", "DUPLICATE"]


def test_latest_state_resolution(spark):
    """State-transition log resolves to the latest row per key (R6/R11)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS),
                          ("k1", 5, "a1", STATE_FAILED),
                          ("k2", 0, "b1", STATE_SUCCESS)])
    cur = latest_state(led, pk=["key"], version_by=["ts", "attempt_id"])
    states = {r.key: r.state for r in cur.collect()}
    assert states == {"k1": STATE_FAILED, "k2": STATE_SUCCESS}


def test_ttl_expiry_horizon(spark):
    """Gap > ttl → both attempts SUCCESS (README.md:44 TTL semantics)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS),
                          ("k1", 100, "a2", STATE_SUCCESS),
                          ("k1", 3700, "a3", STATE_SUCCESS)])
    out = dedup_within_ttl(led, ["key"], "ts", ttl_seconds=3600,
                           order_by=["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["SUCCESS", "DUPLICATE", "SUCCESS"]


def test_ttl_zero_keeps_forever(spark):
    """ttl=0 → keep forever: plain first-wins (README.md:44)."""
    led = _ledger(spark, [("k1", 0, "a1", STATE_SUCCESS),
                          ("k1", 10**6, "a2", STATE_SUCCESS)])
    out = dedup_within_ttl(led, ["key"], "ts", ttl_seconds=0,
                           order_by=["ts", "attempt_id"])
    assert _verdicts(out, "k1") == ["SUCCESS", "DUPLICATE"]


def test_first_wins_deterministic_tiebreak(spark):
    """Equal timestamps: attempt_id breaks the tie (TIMEUUID total
    order analog, SURVEY.md §4 custom-work item 1)."""
    led = _ledger(spark, [("k1", 0, "b", STATE_SUCCESS),
                          ("k1", 0, "a", STATE_SUCCESS)])
    out = dedup_first_wins(led, ["key"], ["ts", "attempt_id"])
    by_attempt = {r.attempt_id: r.verdict for r in out.collect()}
    assert by_attempt == {"a": "SUCCESS", "b": "DUPLICATE"}
