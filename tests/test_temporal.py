"""Temporal operators: sessionization boundaries, as-of join
semantics (ties, no-match nulls), and winnowing fingerprints vs a
pure-Python reference."""

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import similarity as S
from distributed_deduplicator_spark.operators import temporal as TP


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u1", _ts(0), 1),   # session 1
        ("u1", _ts(10), 2),  # gap 10m <= 15m → session 1
        ("u1", _ts(40), 3),  # gap 30m > 15m → session 2
        ("u1", _ts(41), 4),  # session 2
        ("u2", _ts(0), 5),   # separate key → its own session 1
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    out = {r.eid: r.session_seq
           for r in TP.sessionize(df, ["user"], "ts", 15 * 60,
                                  order_by=["ts", "eid"]).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_gap_restarts_at_every_row(spark):
    # chained events each 10m apart never break a 15m-gap session even
    # when the total span exceeds the gap — the property that separates
    # sessionization from the TTL dedup recurrence
    rows = [("u", _ts(10 * i), i) for i in range(6)]  # 0..50 min
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    out = TP.sessionize(df, ["user"], "ts", 15 * 60, order_by=["ts", "eid"])
    assert {r.session_seq for r in out.collect()} == {1}


def test_session_stats(spark):
    rows = [("u", _ts(0), 1), ("u", _ts(5), 2), ("u", _ts(40), 3)]
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    out = {r.session_seq: (r.n_events, r.duration_s)
           for r in TP.session_stats(df, ["user"], "ts", 15 * 60,
                                     order_by=["ts", "eid"]).collect()}
    assert out == {1: (2, 300.0), 2: (1, 0.0)}


def test_asof_join_basic_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(5)),    # after r10 (ts 0) → matches payload 10
         (2, "k", _ts(20)),   # after r20 (ts 20, equal) → `<=` matches 20
         (3, "k", _ts(1, 30)),  # between 0 and 20 → 10
         (4, "j", _ts(30)),   # key with no right rows → nulls
         (5, "k", _ts(0))],   # equal to first right ts → matches 10
        ["eid", "key", "ts"])
    right = spark.createDataFrame(
        [("k", _ts(0), 10, 1.0),
         ("k", _ts(20), 20, 2.0),
         ("k", _ts(20), 21, 2.5)],  # tie on ts: greatest rkey (21) wins
        ["key", "rts", "rkey", "rval"])
    out = {r.eid: (r.rkey, r.rval)
           for r in TP.asof_join(left, right, "key", "key", "ts", "rts",
                                 payload=["rkey", "rval"],
                                 right_order=["rkey"]).collect()}
    assert out == {1: (10, 1.0), 2: (21, 2.5), 3: (10, 1.0),
                   4: (None, None), 5: (10, 1.0)}


def test_asof_join_forward_basic_ties_and_nulls(spark):
    """Forward mirror: earliest right row with rts >= ts; equal
    timestamps match (`>=`); right-ts ties resolve to the SMALLEST
    right_order (backward resolves to the greatest); keys with no
    following right row yield nulls."""
    left = spark.createDataFrame(
        [(1, "k", _ts(5)),     # next right is ts 20 → smallest rkey 20
         (2, "k", _ts(20)),    # equal ts → `>=` matches, rkey 20 wins tie
         (3, "k", _ts(21)),    # after the last right row → nulls
         (4, "j", _ts(0)),     # key with no right rows → nulls
         (5, "k", _ts(0))],    # equal to first right ts → matches 10
        ["eid", "key", "ts"])
    right = spark.createDataFrame(
        [("k", _ts(0), 10, 1.0),
         ("k", _ts(20), 20, 2.0),
         ("k", _ts(20), 21, 2.5)],  # tie on ts: smallest rkey (20) wins
        ["key", "rts", "rkey", "rval"])
    out = {r.eid: (r.rkey, r.rval)
           for r in TP.asof_join_forward(
               left, right, "key", "key", "ts", "rts",
               payload=["rkey", "rval"],
               right_order=["rkey"]).collect()}
    assert out == {1: (20, 2.0), 2: (20, 2.0), 3: (None, None),
                   4: (None, None), 5: (10, 1.0)}


# ---------------------------------------------------------------------------
# Winnowing vs pure-Python reference
# ---------------------------------------------------------------------------

def _py_normalize_tokens(text):
    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return t.split(" ")


def _py_winnow(gram_hashes, window):
    if not gram_hashes:
        return []
    if len(gram_hashes) < window:
        return sorted({min(gram_hashes)})
    sel = {min(gram_hashes[j:j + window])
           for j in range(len(gram_hashes) - window + 1)}
    return sorted(sel)


@pytest.mark.parametrize("k,window", [(3, 2), (5, 4)])
def test_winnow_matches_python_reference(spark, k, window):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "PACK my box, with five-dozen liquor jugs; judge my vow now!"),
        (2, "tiny"),                      # fewer tokens than k → empty
        (3, "one two three four five"),   # boundary sizes
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.id: list(r.fingerprints)
           for r in S.winnow_fingerprints(df, "doc_id", "text",
                                          k=k, window=window).collect()}

    # reference: token k-grams hashed with Spark's own xxhash64 (seed
    # 42), winnowed in Python
    for doc_id, text in texts:
        toks = _py_normalize_tokens(text)
        grams = [" ".join(toks[i:i + k])
                 for i in range(len(toks) - k + 1)] if len(toks) >= k else []
        if grams:
            hdf = spark.createDataFrame([(g,) for g in grams], ["g"])
            hmap = {r.g: r.h
                    for r in hdf.select(
                        "g", F.xxhash64("g").alias("h")).collect()}
            hashes = [hmap[g] for g in grams]
        else:
            hashes = []
        assert got[doc_id] == _py_winnow(hashes, window), f"doc {doc_id}"


def test_winnow_shared_substring_guarantee(spark):
    k, window = 4, 3
    core = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [(0, f"completely different prefix {core}"),
         (1, f"{core} and an unrelated suffix here")],
        ["doc_id", "text"])
    pairs = S.winnow_near_dup(df, "doc_id", "text",
                              k=k, window=window, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0].n_shared >= 1


def test_funnel_fold_matches_bruteforce(spark):
    """Property: the single-shuffle JVM fold in funnel_conversion
    computes the same per-user stage timestamps as a brute-force
    Python scan over randomized event sequences (strict inter-stage
    ordering, first-qualifying wins)."""
    import datetime
    import itertools
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    stages = ("view", "click", "purchase")
    types_pool = stages + ("error", "signup")
    base = datetime.datetime(2026, 1, 1)

    # deterministic pseudo-random corpus: every length-4 sequence over
    # the pool with a couple of timestamp-tie patterns mixed in
    rows, eid = [], 0
    for uid, seq in enumerate(itertools.product(types_pool, repeat=4)):
        for j, et in enumerate(seq):
            # users with uid % 7 == 0 get tied timestamps (same minute)
            minute = 0 if uid % 7 == 0 else j
            rows.append((eid, uid,
                         base + datetime.timedelta(minutes=minute), et))
            eid += 1
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType())])
    df = spark.createDataFrame(rows, schema)

    # brute force per user, same strict ordering rules
    by_user = {}
    for e_id, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, e_id, et))
    expect = {1: 0, 2: 0, 3: 0}
    for uid, evs in by_user.items():
        t1 = t2 = t3 = None
        for ts, _eid, et in sorted(evs):
            if t1 is None and et == stages[0]:
                t1 = ts
            elif t2 is None and t1 is not None and et == stages[1] \
                    and ts > t1:
                t2 = ts
            elif t3 is None and t2 is not None and et == stages[2] \
                    and ts > t2:
                t3 = ts
        expect[1] += t1 is not None
        expect[2] += t2 is not None
        expect[3] += t3 is not None

    # run the registered query's fold on this frame by monkey-loading:
    # replicate its body via the same code path (import the module fn
    # would read fixtures; instead exercise the fold inline)
    from distributed_deduplicator_spark.queries.temporal_queries import (
        _FUNNEL)
    from distributed_deduplicator_spark.functions.timeutil import ts_micros
    packed = F.struct("ts", "event_id", "event_type")
    g = (df.where(F.col("event_type").isin(*_FUNNEL))
           .groupBy("user_id")
           .agg(F.sort_array(F.collect_list(packed)).alias("_evs")))
    init = F.named_struct(
        F.lit("t1"), F.lit(None).cast("long"),
        F.lit("t2"), F.lit(None).cast("long"),
        F.lit("t3"), F.lit(None).cast("long"))

    def step(acc, e):
        t = ts_micros(e["ts"])
        et = e["event_type"]
        take1 = acc["t1"].isNull() & (et == _FUNNEL[0])
        take2 = (acc["t2"].isNull() & acc["t1"].isNotNull()
                 & (et == _FUNNEL[1]) & (t > acc["t1"]))
        take3 = (acc["t3"].isNull() & acc["t2"].isNotNull()
                 & (et == _FUNNEL[2]) & (t > acc["t2"]))
        return F.named_struct(
            F.lit("t1"), F.when(take1, t).otherwise(acc["t1"]),
            F.lit("t2"), F.when(take2, t).otherwise(acc["t2"]),
            F.lit("t3"), F.when(take3, t).otherwise(acc["t3"]))

    st = g.select(F.aggregate(F.col("_evs"), init, step).alias("_st"))
    got = st.agg(
        F.count(F.col("_st")["t1"]).alias("n1"),
        F.count(F.col("_st")["t2"]).alias("n2"),
        F.count(F.col("_st")["t3"]).alias("n3")).collect()[0]
    assert (got["n1"], got["n2"], got["n3"]) == \
        (expect[1], expect[2], expect[3])


def test_asof_join_nearest_ties_and_directions(spark):
    """Nearest: closest right row either direction; exact distance tie
    → the PRECEDING row wins (pandas rule); equal-ts right row is
    distance 0 via the backward frame; no right rows → nulls."""
    left = spark.createDataFrame(
        [(1, "k", _ts(4)),    # 4 from r0, 16 from r20 → backward r0
         (2, "k", _ts(15)),   # 15 from r0, 5 from r20 → forward r20
         (3, "k", _ts(10)),   # 10 from both → tie → backward r0
         (4, "k", _ts(20)),   # exact hit → distance 0 → rkey ties → 21
         (5, "j", _ts(0))],   # no right rows → nulls
        ["eid", "key", "ts"])
    right = spark.createDataFrame(
        [("k", _ts(0), 10, 1.0),
         ("k", _ts(20), 20, 2.0),
         ("k", _ts(20), 21, 2.5)],  # same-ts pair: backward side takes max
        ["key", "rts", "rkey", "rval"])
    out = {r.eid: (r.rkey, r.rval)
           for r in TP.asof_join_nearest(
               left, right, "key", "key", "ts", "rts",
               payload=["rkey", "rval"],
               right_order=["rkey"]).collect()}
    assert out == {1: (10, 1.0), 2: (20, 2.0), 3: (10, 1.0),
                   4: (21, 2.5), 5: (None, None)}


def test_asof_forward_and_nearest_null_left_ts(spark):
    """NULL left_ts satisfies no time predicate: forward and nearest
    must yield null payload for such rows (keeping their left-join
    presence) — nulls-first sorting must not hand them the key's
    earliest right row through the forward frame."""
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("eid", T.LongType()),
                           T.StructField("key", T.StringType()),
                           T.StructField("ts", T.TimestampType())])
    left = spark.createDataFrame(
        [(1, "k", None), (2, "k", _ts(5))], schema)
    right = spark.createDataFrame(
        [("k", _ts(10), 10, 1.0)], ["key", "rts", "rkey", "rval"])
    fwd = {r.eid: r.rkey for r in TP.asof_join_forward(
        left, right, "key", "key", "ts", "rts",
        payload=["rkey", "rval"]).collect()}
    assert fwd == {1: None, 2: 10}
    near = {r.eid: r.rkey for r in TP.asof_join_nearest(
        left, right, "key", "key", "ts", "rts",
        payload=["rkey", "rval"]).collect()}
    assert near == {1: None, 2: 10}
