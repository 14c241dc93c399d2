"""Gates for non-oracle relational queries."""

from distributed_deduplicator_spark import queries as Q


def test_approx_distinct_relative_error(spark, sf_dir):
    rows = Q.QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert err <= 0.1, f"{r.l_returnflag}: {err:.3f}"


def test_salted_join_equals_plain_join(spark):
    from distributed_deduplicator_spark.operators.relational import salted_join
    import pyspark.sql.functions as F
    # skewed big side: one hot key with 5k rows, long tail of 50
    big = spark.range(5000).select(F.lit("hot").alias("k"),
                                   F.col("id").alias("v")).unionByName(
        spark.range(50).select(F.concat(F.lit("t"), "id").alias("k"),
                               F.col("id").alias("v")))
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"t{i}", float(i)) for i in range(0, 50, 2)],
        ["k", "w"])
    plain = {(r.k, r.v, r.w) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.v, r.w)
              for r in salted_join(big, small, "k", n_salt=8).collect()}
    assert salted == plain
    # left join keeps unmatched big rows exactly once
    plain_l = sorted((r.k, r.v, r.w)
                     for r in big.join(small, "k", "left").collect())
    salted_l = sorted((r.k, r.v, r.w)
                      for r in salted_join(big, small, "k", how="left",
                                           n_salt=8).collect())
    assert salted_l == plain_l


def test_approx_percentile_relative_error(spark, sf_dir):
    rows = Q.QUERIES["text_length_quantiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_p50 - r.exact_p50) / max(abs(r.exact_p50), 1)
        assert err <= 0.05, f"{r.lang}: {err:.3f}"


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    """freqItems' contract: no false negatives — every token whose true
    frequency is ≥ the support threshold must be in the sketch output
    (false positives are allowed and expected)."""
    import pyspark.sql.functions as F
    from distributed_deduplicator_spark.functions import text as TXT
    from distributed_deduplicator_spark.sources import load_table
    got = {r.token for r in
           Q.QUERIES["frequent_tokens_approx"](spark, sf_dir).collect()}
    toks = (load_table(spark, sf_dir, "documents")
            .select(F.explode(TXT.tokens("text")).alias("w")))
    total = toks.count()
    exact = {r.w for r in
             toks.groupBy("w").count()
                 .where(F.col("count") >= 0.01 * total).collect()}
    assert exact <= got, f"missing heavy hitters: {exact - got}"


def test_hll_sketch_error_and_merge(spark, sf_dir):
    """DataSketches HLL per-type estimates within 5% of exact; the ALL
    row (built by MERGING the per-type sketches, never re-scanning)
    must estimate the direct whole-table sketch to the same value —
    the associativity that makes sketches the 100 TB cardinality
    path."""
    import pyspark.sql.functions as F
    from distributed_deduplicator_spark.sources import load_table
    rows = {r.event_type: r.est_users
            for r in Q.QUERIES["sketch_distinct_users"](spark, sf_dir)
                       .collect()}
    e = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r.n for r in
             e.groupBy("event_type")
              .agg(F.count_distinct("user_id").alias("n")).collect()}
    exact["ALL"] = e.select("user_id").distinct().count()
    assert set(rows) == set(exact) and "ALL" in rows
    for k, est in rows.items():
        err = abs(est - exact[k]) / max(exact[k], 1)
        assert err <= 0.05, f"{k}: est={est} exact={exact[k]}"
    direct = (e.agg(F.hll_sketch_agg("user_id").alias("sk"))
               .select(F.hll_sketch_estimate("sk").alias("n"))
               .collect()[0].n)
    assert rows["ALL"] == direct, "merged sketch != direct sketch"


def test_kll_quantiles_error_and_merge(spark, sf_dir):
    """KLL quantile estimates within rank-tolerance of exact
    percentiles; the ALL row (fold-merged per-type sketches) must equal
    the direct whole-table sketch exactly."""
    import pyspark.sql.functions as F
    from distributed_deduplicator_spark.sources import load_table
    rows = {r.event_type: (r.p25, r.p50, r.p75, r.p90)
            for r in Q.QUERIES["kll_value_quantiles"](spark, sf_dir)
                       .collect()}
    e = load_table(spark, sf_dir, "events")
    qs = [0.25, 0.5, 0.75, 0.9]
    exact = {r.event_type: r.p for r in
             e.groupBy("event_type")
              .agg(F.percentile("value", F.array(*map(F.lit, qs)))
                   .alias("p")).collect()}
    exact["ALL"] = (e.agg(F.percentile("value",
                                       F.array(*map(F.lit, qs)))
                          .alias("p")).collect()[0].p)
    assert set(rows) == set(exact)
    for k, est in rows.items():
        lo, hi = min(exact[k]), max(exact[k])
        spread = max(hi - lo, 1e-9)
        for e_val, got in zip(exact[k], est):
            assert abs(got - e_val) <= 0.15 * spread + 1e-9, \
                f"{k}: est={got} exact={e_val}"
    # NOTE: unlike HLL (register-max union ≡ one-pass sketch, asserted
    # exactly in test_hll_sketch_error_and_merge), KLL compaction is
    # merge-order dependent, so the merged ALL row is gated on accuracy
    # vs exact percentiles (loop above), not on bit-equality with a
    # one-pass sketch.


def test_table_diff_flags_null_position_swap(spark):
    """ADVICE r4: xxhash64 skips NULL inputs, so (x, NULL) vs (NULL, x)
    used to hash equal and a real change read as unchanged. The
    null-bitmap hashing must flag it."""
    from distributed_deduplicator_spark.operators.relational import table_diff
    a = spark.createDataFrame(
        [(1, "x", None), (2, "same", "same"), (3, None, None)],
        "k int, c1 string, c2 string")
    b = spark.createDataFrame(
        [(1, None, "x"), (2, "same", "same"), (3, None, None)],
        "k int, c1 string, c2 string")
    got = {r.k: r.diff_status
           for r in table_diff(a, b, ["k"], ["c1", "c2"]).collect()}
    assert got == {1: "changed"}  # 2 and 3 are genuinely unchanged


def test_merge_agg_states_min_max_strategies(spark):
    """min/max state columns merge via least/greatest (null-safe),
    never the additive default; unknown strategies are rejected."""
    import pytest
    from distributed_deduplicator_spark.operators.relational import (
        merge_agg_states)
    base = spark.createDataFrame(
        [("a", 3, 10, 1), ("b", 1, 7, 7)], "k string, n long, mx long, mn long")
    delta = spark.createDataFrame(
        [("a", 2, 4, 0), ("c", 5, 9, 9)], "k string, n long, mx long, mn long")
    got = {r.k: (r.n, r.mx, r.mn)
           for r in merge_agg_states(base, delta, ["k"], ["n", "mx", "mn"],
                                     merges={"mx": "max", "mn": "min"})
           .collect()}
    assert got == {"a": (5, 10, 0),   # sum / greatest / least
                   "b": (1, 7, 7),    # absent delta side is identity
                   "c": (5, 9, 9)}
    with pytest.raises(ValueError, match="unsupported"):
        merge_agg_states(base, delta, ["k"], ["n"], merges={"n": "avg"})
    with pytest.raises(ValueError, match="non-state"):
        merge_agg_states(base, delta, ["k"], ["n"], merges={"mx": "max"})
