"""Tests for round-2 extended operators: bucketed interval join,
incremental dedup, connected components, bucketed co-located tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import similarity as S
from distributed_deduplicator_spark.operators.dedup import dedup_incremental
from distributed_deduplicator_spark.operators.rangejoin import (
    interval_join_bucketed)
from distributed_deduplicator_spark.sources import load_table
from distributed_deduplicator_spark.sources.sinks import write_bucketed_table


def test_interval_join_matches_naive_range_join(spark, sf_dir):
    """The bucketed plan must produce exactly the naive range join's
    matches (each exactly once), for bucket sizes smaller, equal, and
    larger than the interval length."""
    ev = load_table(spark, sf_dir, "events")
    conv = (ev.where(F.col("event_type") == "purchase")
              .select(F.col("event_id").alias("conv_id"),
                      F.col("user_id").alias("conv_user"),
                      (F.col("ts") - F.expr("INTERVAL 1800 SECONDS"))
                      .alias("win_start"),
                      F.col("ts").alias("win_end")))
    base = (ev.where(F.col("event_type") != "purchase")
              .select(F.col("event_id").alias("base_id"),
                      "user_id", F.col("ts").alias("base_ts")))
    naive = (base.join(conv,
                       (base.user_id == conv.conv_user)
                       & (base.base_ts >= conv.win_start)
                       & (base.base_ts < conv.win_end))
             .select("base_id", "conv_id"))
    expected = sorted((r.base_id, r.conv_id) for r in naive.collect())
    assert expected, "fixture should produce at least one match"
    for bucket in (600, 1800, 7200):
        got = interval_join_bucketed(
            base, conv, point_key="user_id", interval_key="conv_user",
            ts_col="base_ts", start_col="win_start", end_col="win_end",
            bucket_seconds=bucket).select("base_id", "conv_id")
        assert sorted((r.base_id, r.conv_id) for r in got.collect()) \
            == expected, f"bucket={bucket}"


def test_interval_join_rejects_bad_bucket(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        interval_join_bucketed(ev, ev, "user_id", "user_id",
                               "ts", "ts", "ts", bucket_seconds=0)


def test_dedup_incremental_blocks_ledger_keys(spark):
    batch = spark.createDataFrame(
        [("k1", 1, 10), ("k1", 2, 11), ("k2", 1, 12), ("k3", 1, 13)],
        "key string, seq int, attempt int")
    ledger = spark.createDataFrame(
        [("k1", 0, 1), ("k9", 0, 2)], "key string, seq int, attempt int")
    out = {(r.key, r.seq): r.verdict
           for r in dedup_incremental(batch, ledger, ["key"],
                                      ["seq", "attempt"]).collect()}
    assert out == {("k1", 1): "DUPLICATE",   # blocked by ledger
                   ("k1", 2): "DUPLICATE",
                   ("k2", 1): "SUCCESS",     # fresh key, first attempt
                   ("k3", 1): "SUCCESS"}


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark, sf_dir):
    # chain 1-2-3-4 (transitivity beyond direct pairs), triangle
    # 10-11-12, isolated pair (20, 21)
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id
           for r in S.connected_components(pairs).collect()}
    S.release_persisted()
    assert got == _union_find_clusters(edges)
    assert got[4] == 1 and got[12] == 10 and got[21] == 20


def test_connected_components_on_real_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    pairs_df = S.minhash_near_dup(d, "doc_id", "text", threshold=0.35)
    edges = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    got = {r.id: r.cluster_id
           for r in S.connected_components(pairs_df).collect()}
    S.release_persisted()
    assert got == _union_find_clusters(edges)


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join with no Exchange:
    the shuffle was paid at write time (co-located join — the layout
    that amortizes repeated big-big joins at scale)."""
    # spark.sql.warehouse.dir is static; managed tables land in the
    # session default and are dropped (files included) in the finally
    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "event_type")
    cust_like = (load_table(spark, sf_dir, "events")
                 .groupBy("user_id").agg(F.count("*").alias("n")))
    write_bucketed_table(ev, "ev_bkt", ["user_id"], 8,
                         sort_by=["user_id"])
    write_bucketed_table(cust_like, "cust_bkt", ["user_id"], 8,
                         sort_by=["user_id"])
    try:
        a, b = spark.table("ev_bkt"), spark.table("cust_bkt")
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "user_id")
        plan = joined.sparkSession._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple")
        assert "Exchange" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_bkt")
        spark.sql("DROP TABLE IF EXISTS cust_bkt")
