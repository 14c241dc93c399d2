"""TIMESTAMP_NTZ regression guards.

Round-3 lesson: the driver regenerated the fixture parquet with
tz-naive timestamp[us] columns, which Spark 4 infers as TIMESTAMP_NTZ
— and every unix_micros() call site plus Structured Streaming
watermarks failed analysis while pytest stayed green (nothing asserted
the loaded flavor). These tests make the next silent fixture change
fail loudly here instead of in the driver's artifacts:

1. no fixture table's loaded schema may contain TimestampNTZType
   (the source-layer normalization in sources/fixtures.py);
2. the time-arithmetic operators must accept an explicitly-NTZ
   DataFrame anyway (functions/timeutil.ts_micros belt-and-braces).
"""

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deduplicator_spark.operators import dedup as D
from distributed_deduplicator_spark.operators import temporal as TP
from distributed_deduplicator_spark.operators.rangejoin import (
    interval_join_bucketed,
)
from distributed_deduplicator_spark.sources import TABLES, load_table

_SF_ROOT = "/root/testdata"


def _sf_dirs():
    return sorted(d for d in glob.glob(os.path.join(_SF_ROOT, "sf*"))
                  if os.path.isdir(d))


def test_no_ntz_in_any_loaded_fixture(spark):
    """Every table x every SF dir loads with zero TIMESTAMP_NTZ fields.
    Proven to fail if load_table's normalization is removed: events.ts,
    orders.o_orderdate and lineitem.l_shipdate are tz-naive
    timestamp[us] in the current fixtures."""
    dirs = _sf_dirs()
    assert dirs, f"no sf* dirs under {_SF_ROOT}"
    offenders = []
    for sf_dir in dirs:
        for t in TABLES:
            if not os.path.exists(f"{sf_dir}/{t}.parquet"):
                continue
            df = load_table(spark, sf_dir, t)
            for f in df.schema.fields:
                if isinstance(f.dataType, T.TimestampNTZType):
                    offenders.append(f"{sf_dir}/{t}.{f.name}")
    assert not offenders, f"TIMESTAMP_NTZ leaked through load_table: {offenders}"


def test_raw_read_would_be_ntz(spark):
    """Meta-guard: confirm the hazard still exists in the raw fixtures,
    so test_no_ntz_in_any_loaded_fixture is exercising the cast and not
    vacuously passing. If the driver regenerates fixtures with tz-aware
    timestamps this starts xfailing harmlessly."""
    prior = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", None)
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        raw = spark.read.parquet(f"{_sf_dirs()[0]}/events.parquet")
        flavors = {f.name: f.dataType for f in raw.schema.fields}
        if not isinstance(flavors.get("ts"), T.TimestampNTZType):
            pytest.xfail("fixtures no longer tz-naive; guard is moot")
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prior)


@pytest.fixture()
def ntz_events(spark):
    """A small events-shaped frame whose ts is explicitly TIMESTAMP_NTZ."""
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, "click", base),
        (2, 1, "click", base + datetime.timedelta(hours=1)),
        (3, 1, "click", base + datetime.timedelta(hours=30)),
        (4, 2, "view", base),
    ]
    df = spark.createDataFrame(rows, schema)
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    return df


def test_ttl_dedup_accepts_ntz(ntz_events):
    out = D.dedup_within_ttl(ntz_events, ["user_id", "event_type"], "ts",
                             ttl_seconds=24 * 3600,
                             order_by=["ts", "event_id"])
    verdicts = {r["event_id"]: r["verdict"] for r in out.collect()}
    # 24h TTL: e1 accepted, e2 (+1h) duplicate, e3 (+30h) accepted again
    assert verdicts == {1: "SUCCESS", 2: "DUPLICATE",
                       3: "SUCCESS", 4: "SUCCESS"}


def test_sessionize_accepts_ntz(ntz_events):
    out = TP.sessionize(ntz_events, ["user_id"], "ts", gap_seconds=2 * 3600,
                        order_by=["ts", "event_id"])
    seqs = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert seqs == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = TP.session_stats(ntz_events, ["user_id"], "ts",
                             gap_seconds=2 * 3600,
                             order_by=["ts", "event_id"])
    durs = {(r["user_id"], r["session_seq"]): r["duration_s"]
            for r in stats.collect()}
    assert durs[(1, 1)] == 3600.0 and durs[(1, 2)] == 0.0


def test_interval_join_accepts_ntz(spark, ntz_events):
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    iv_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("w_start", T.TimestampNTZType()),
        T.StructField("w_end", T.TimestampNTZType()),
        T.StructField("campaign", T.StringType()),
    ])
    intervals = spark.createDataFrame(
        [(1, base, base + datetime.timedelta(hours=2), "c1")], iv_schema)
    out = interval_join_bucketed(ntz_events, intervals,
                                 "user_id", "user_id", "ts",
                                 "w_start", "w_end", bucket_seconds=3600)
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]
