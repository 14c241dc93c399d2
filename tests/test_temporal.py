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
