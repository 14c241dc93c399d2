"""Relational breadth (SURVEY.md §7 Phase 2): filters/projections, the
join family, grouped/global aggregates, windows, sort/limit/top-k, set
ops, scalar functions. All built-in Spark expressions — Catalyst handles
pushdown/pruning/join selection; AQE handles runtime re-planning.

Float discipline per queries/__init__ docstring: sums go through
DECIMAL casts so both engines aggregate exactly; averages divide an
exact decimal sum (as double) by a count.

Terminal-type discipline (driver hash gate): every numeric output
column is DOUBLE or BIGINT on BOTH engines. DuckDB's pandas conversion
turns DECIMAL sums into float64 and integer sums (HUGEINT) into
float64, while Spark keeps Decimal objects / int64 — value-equal
results then hash-mismatch. So: aggregate exactly over DECIMAL (or
native ints), then CAST the *result* to DOUBLE (decimal sums) or
BIGINT (integer sums) on both sides. One rounding at the boundary,
exact arithmetic inside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from distributed_deduplicator_spark.functions.timeutil import ts_micros
from distributed_deduplicator_spark.operators.relational import (
    basket_pairs,
    join_dim, topk_per_group, topk_global)
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.sources import load_table


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / filter / projection (R1-R4)
# ---------------------------------------------------------------------------

@query("filter_project", oracle="""
SELECT p_partkey, p_name, p_brand, p_size,
       round(p_retailprice * 1.1, 2) AS taxed_price
FROM part
WHERE p_size BETWEEN 10 AND 40
  AND p_type LIKE '%BRASS%'
  AND p_brand <> 'Brand#45'
""")
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + LIKE + inequality predicates with a computed projection.
    Range/equality predicates push into the parquet scan (PushedFilters);
    projection prunes the read schema (reference R2-R4)."""
    p = _t(spark, sf_dir, "part")
    return (p.where((F.col("p_size").between(10, 40))
                    & F.col("p_type").like("%BRASS%")
                    & (F.col("p_brand") != "Brand#45"))
             .select("p_partkey", "p_name", "p_brand", "p_size",
                     F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price")))


@query("predicate_in_null", oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice IS NOT NULL
  AND year(o_orderdate) >= 1997
""")
def q_predicate_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, NULL test, and a derived-date predicate (reference R3
    generalized beyond single-key equality)."""
    o = _t(spark, sf_dir, "orders")
    return (o.where(F.col("o_orderstatus").isin("F", "P")
                    & F.col("o_totalprice").isNotNull()
                    & (F.year("o_orderdate") >= 1997))
             .select("o_orderkey", "o_orderstatus", "o_orderpriority"))


# ---------------------------------------------------------------------------
# Aggregation (R9 generalized)
# ---------------------------------------------------------------------------

@query("pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregate: the canonical partial-agg →
    shuffle → final-agg plan (map-side combine = the reference's burst
    absorber analog, SURVEY.md R13). Sums are exact over decimal, then
    cast DOUBLE at the boundary (terminal-type discipline)."""
    l = _t(spark, sf_dir, "lineitem")
    dec = lambda c, s: F.col(c).cast(f"decimal(18,{s})")  # noqa: E731
    return (l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
             .groupBy("l_returnflag", "l_linestatus")
             .agg(F.sum(dec("l_quantity", 2)).cast("double").alias("sum_qty"),
                  F.sum(dec("l_extendedprice", 2)).cast("double")
                  .alias("sum_base_price"),
                  F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                        .cast("decimal(18,4)")).cast("double")
                  .alias("sum_disc_price"),
                  (F.sum(dec("l_quantity", 2)).cast("double") / F.count("*"))
                  .alias("avg_qty"),
                  F.count("*").alias("count_order")))


@query("agg_distinct", oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped COUNT DISTINCT (expand + two-phase aggregate plan)."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.count_distinct("l_partkey").alias("n_parts"),
                  F.count_distinct("l_suppkey").alias("n_supps"),
                  F.count("*").alias("n_rows")))


@query("agg_global", oracle="""
SELECT count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders
""")
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregate — single-row result via partial
    aggregation; no data concentration until the final 1-partition agg."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(F.count("*").alias("n_orders"),
                 F.count_distinct("o_custkey").alias("n_customers"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_revenue"),
                 F.min("o_orderdate").alias("first_order"),
                 F.max("o_orderdate").alias("last_order"))


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

@query("join_star_revenue", oracle="""
SELECT n_name, r_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
GROUP BY n_name, r_name
""")
def q_join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join: fact lineitem⋈orders shuffles on orderkey; the
    customer/nation/region dims broadcast (no fact shuffle on their
    keys). The 100 TB plan: one big-table shuffle join + N broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.groupBy("n_name", "r_name")
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


@query("join_left_order_counts", oracle="""
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
                0.0) AS spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""")
def q_join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count=0, spend=0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .groupBy("c_custkey", "c_name")
             .agg(F.count("o_orderkey").alias("n_orders"),
                  F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                             .cast("double"), F.lit(0.0)).alias("spend")))


@query("join_semi", oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT')
""")
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order — existence test
    without multiplying rows (the set form of the reference's 'does a
    SUCCESS row exist for this key' check, DeduplicationProvider.kt:132)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_name", "c_mktsegment"))


@query("join_anti", oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


@query("join_dim_broadcast", oracle="""
SELECT n_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def q_join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast dimension join via the join_dim helper."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (join_dim(c, n, on=c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("n_customers"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("total_balance")))


# ---------------------------------------------------------------------------
# Windows (R8's ordering semantics generalized)
# ---------------------------------------------------------------------------

@query("window_topk_per_group", oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""")
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer (deterministic tie-break)."""
    o = _t(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3)


@query("window_lag_lead", oracle="""
SELECT user_id, event_type, ts, event_id,
       lag(event_id)  OVER w AS prev_event_id,
       lead(event_id) OVER w AS next_event_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS usecs_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over each user's event timeline."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (ts_micros("ts") - ts_micros(F.lag("ts").over(w)))
        .alias("usecs_since_prev"))


@query("window_running_sum", oracle="""
SELECT user_id, ts, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events
""")
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ev.select(
        "user_id", "ts", "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
        .cast("double").alias("running_value"))


@query("window_rank_dense", oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       rank()       OVER w AS bal_rank,
       dense_rank() OVER w AS bal_dense_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""")
def q_window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with gaps semantics."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_mktsegment", "c_custkey", "c_acctbal",
                    F.rank().over(w).alias("bal_rank"),
                    F.dense_rank().over(w).alias("bal_dense_rank"))


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------

@query("topk_global", oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey
LIMIT 10
""")
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — TakeOrderedAndProject (heap per partition +
    driver merge of 10), never a full sort (reference R1's clustering
    order generalized to global ordering)."""
    c = _t(spark, sf_dir, "customer")
    return topk_global(c.select("c_custkey", "c_name", "c_acctbal"),
                       [F.col("c_acctbal").desc(), F.col("c_custkey")], 10)


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query("set_ops", oracle="""
WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership
  FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
UNION ALL
SELECT nationkey, 'customer_only' AS membership
  FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
UNION ALL
SELECT nationkey, 'supplier_only' AS membership
  FROM (SELECT nationkey FROM supp_nations EXCEPT SELECT nationkey FROM cust_nations)
""")
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over nation membership sets
    (reference's audit-set algebra, SURVEY.md §2.2 'Set ops')."""
    c = (_t(spark, sf_dir, "customer")
         .select(F.col("c_nationkey").alias("nationkey")).distinct())
    s = (_t(spark, sf_dir, "supplier")
         .select(F.col("s_nationkey").alias("nationkey")).distinct())
    both = c.intersect(s).withColumn("membership", F.lit("both"))
    conly = c.exceptAll(s).withColumn("membership", F.lit("customer_only"))
    sonly = s.exceptAll(c).withColumn("membership", F.lit("supplier_only"))
    return both.unionByName(conly).unionByName(sonly)


# ---------------------------------------------------------------------------
# Scalar functions (R5/R12/R13 toolbox: strings, dates, hashing)
# ---------------------------------------------------------------------------

@query("scalar_functions", oracle="""
SELECT o_orderkey,
       upper(o_orderpriority) AS pri_upper,
       substr(o_orderpriority, 1, 1) AS pri_code,
       concat_ws(':', o_orderkey, o_custkey) AS compound_key,
       sha256(concat_ws(':', o_orderkey, o_custkey)) AS attempt_id,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       round(o_totalprice / 1000.0, 3) AS price_k
FROM orders
WHERE o_orderkey % 100 = 0
""")
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String building (the reference's compound cache key
    'ks:table:key', DeduplicationProvider.kt:44 → concat_ws), date
    arithmetic (TTL horizons, R12), and sha256-derived deterministic
    attempt ids (replacing UUIDv4, DeduplicationProvider.kt:43)."""
    o = _t(spark, sf_dir, "orders")
    ck = F.concat_ws(":", F.col("o_orderkey"), F.col("o_custkey"))
    return (o.where(F.col("o_orderkey") % 100 == 0)
             .select("o_orderkey",
                     F.upper("o_orderpriority").alias("pri_upper"),
                     F.substring("o_orderpriority", 1, 1).alias("pri_code"),
                     ck.alias("compound_key"),
                     F.sha2(ck, 256).alias("attempt_id"),
                     F.year("o_orderdate").alias("o_year"),
                     F.month("o_orderdate").alias("o_month"),
                     (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
                     .alias("due_date"),
                     F.round(F.col("o_totalprice") / 1000.0, 3).alias("price_k")))


# ---------------------------------------------------------------------------
# Multi-level aggregation (rollup / cube / pivot) and distribution stats
# ---------------------------------------------------------------------------

@query("rollup_orders", oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""")
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status×priority → grand
    total) in ONE pass: Spark plans rollup as a single Expand +
    aggregate — no per-level rescans."""
    o = _t(spark, sf_dir, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("sum_price"),
                  F.grouping_id().alias("gid")))


@query("cube_orders", oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""")
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one Expand
    + aggregate pass."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("sum_price"),
                  F.grouping_id().alias("gid")))


@query("pivot_status_counts", oracle="""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority
""")
def q_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority. Explicit pivot
    values keep the plan single-pass (no distinct-values pre-query) —
    the rule at scale; missing cells coalesce to 0 like SQL count."""
    o = _t(spark, sf_dir, "orders")
    p = (o.groupBy("o_orderpriority")
          .pivot("o_orderstatus", ["F", "O", "P"])
          .agg(F.count(F.lit(1))))
    return p.select("o_orderpriority",
                    F.coalesce("F", F.lit(0)).alias("n_f"),
                    F.coalesce("O", F.lit(0)).alias("n_o"),
                    F.coalesce("P", F.lit(0)).alias("n_p"))


@query("percentiles_by_status", oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.90), 6) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99,
       round(min(o_totalprice), 6) AS lo,
       round(max(o_totalprice), 6) AS hi
FROM orders GROUP BY o_orderstatus
""")
def q_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    `percentile` == DuckDB `quantile_cont`). At 100 TB swap to
    approx_percentile (t-digest sketch, map-side combinable) — exact
    percentile materializes per-group value multisets."""
    o = _t(spark, sf_dir, "orders")
    pct = lambda p: F.round(F.expr(f"percentile(o_totalprice, {p})"), 6)  # noqa: E731
    return (o.groupBy("o_orderstatus")
             .agg(pct(0.50).alias("p50"),
                  pct(0.90).alias("p90"),
                  pct(0.99).alias("p99"),
                  F.round(F.min("o_totalprice"), 6).alias("lo"),
                  F.round(F.max("o_totalprice"), 6).alias("hi")))


@query("json_props_stats", oracle="""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER))
         AS n_distinct_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
""")
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path into typed column, then
    grouped stats — get_json_object stays JVM-side (Jackson), no UDF.
    At scale prefer from_json with an explicit schema once per
    pipeline, then columnar ops on the struct."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.withColumn("_k", k)
             .groupBy("event_type")
             .agg(F.count("*").alias("n_events"),
                  F.count_distinct("_k").alias("n_distinct_k"),
                  F.sum("_k").alias("sum_k"),
                  F.min("_k").alias("min_k"),
                  F.max("_k").alias("max_k")))


@query("agg_approx_distinct")  # rows-only: HLL++ estimates are engine-specific
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the sketch is THE 100 TB cardinality path (fixed-size map-side
    combinable state vs the exact count's per-group value expansion).
    Relative-error gate asserted in tests/test_relational_extra.py."""
    l = _t(spark, sf_dir, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                  F.count_distinct("l_partkey").alias("exact_parts")))


@query("filtered_agg_orders", oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
       CAST(sum(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS finished_revenue,
       count(CASE WHEN year(o_orderdate) >= 2000 THEN 1 END) AS n_recent
FROM orders
GROUP BY o_orderpriority
""")
def q_filtered_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause semantics): several
    differently-predicated aggregates in ONE scan + ONE shuffle —
    the pattern that replaces N self-joined subqueries."""
    o = _t(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    return (o.groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  F.count(F.when(is_f, 1)).alias("n_finished"),
                  F.sum(F.when(is_f, F.col("o_totalprice")
                               .cast("decimal(18,2)")))
                  .cast("double").alias("finished_revenue"),
                  F.count(F.when(F.year("o_orderdate") >= 2000, 1))
                  .alias("n_recent")))


_GROUPING_SETS_SQL = """
WITH o AS (SELECT o_orderstatus, year(o_orderdate) AS o_year,
                  CAST(o_totalprice AS DECIMAL(18,2)) AS price
           FROM orders)
SELECT o_orderstatus, o_year,
       count(*) AS n_orders,
       CAST(sum(price) AS DOUBLE) AS sum_price
FROM o
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_year), ())
"""

@query("grouping_sets_orders", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube compile
    to): three aggregation levels in one Expand pass, executed as the
    SAME SQL text on both engines."""
    from distributed_deduplicator_spark.sources import register_views
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@query("window_first_last", oracle="""
SELECT user_id, ts, event_id,
       first_value(event_id) OVER w AS first_event,
       last_value(event_id)  OVER w AS last_event,
       nth_value(event_id, 2) OVER w AS second_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over a full-partition frame — the anchor
    functions of per-entity timeline analysis."""
    ev = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return ev.select(
        "user_id", "ts", "event_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"))


@query("window_distribution_funcs", oracle="""
SELECT o_orderkey, o_custkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist() OVER w, 9) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice, o_orderkey)
""")
def q_window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile deciles, percent_rank,
    cume_dist per order status: the quantile-bucketing pass behind
    quality-score binning (e.g. keep the top decile of documents per
    language). Ratios rounded to 9 dp; ties impossible (orderkey
    breaks them)."""
    o = _t(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_orderstatus")
         .orderBy("o_totalprice", "o_orderkey"))
    return o.select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"))


@query("topk_frequent_event_types", oracle="""
WITH c AS (SELECT user_id, event_type, count(*) AS n_events
           FROM events GROUP BY 1, 2)
SELECT user_id, event_type, n_events FROM (
  SELECT user_id, event_type, n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n_events DESC, event_type) AS rn
  FROM c) WHERE rn = 1
""")
def q_topk_frequent_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per entity (most frequent event_type per user):
    count-then-rank. Two exchanges — (user, type) for the combinable
    count, then (user) for the window — but only one row per distinct
    (user, type) survives the first, so the second is tiny."""
    ev = _t(spark, sf_dir, "events")
    counts = (ev.groupBy("user_id", "event_type")
                .agg(F.count("*").alias("n_events")))
    return topk_per_group(
        counts, keys=["user_id"],
        order_by=[F.col("n_events").desc(), F.col("event_type")], k=1)


@query("shipping_priority", oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → grouped
    revenue → global top-10. The segment filter prunes customer BEFORE
    it broadcasts; the only big shuffle is lineitem⋈orders on
    orderkey; the final top-10 is TakeOrderedAndProject (per-partition
    heaps), never a full sort."""
    c = (_t(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING"))
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderdate") <
                F.lit("1998-03-15 00:00:00").cast("timestamp")))
    l = (_t(spark, sf_dir, "lineitem")
         .where(F.col("l_shipdate") >
                F.lit("1995-03-15 00:00:00").cast("timestamp")))
    rev = (F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .cast("decimal(18,4)")).cast("double"))
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    agg = (joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
                 .agg(rev.alias("revenue"))
                 .select("l_orderkey", "revenue", "o_orderdate",
                         "o_orderpriority"))
    return topk_global(agg, [F.col("revenue").desc(), F.col("o_orderdate"),
                             F.col("l_orderkey")], 10)


@query("returned_items_by_nation", oracle="""
SELECT n_name,
       count(*) AS n_returned_items,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY n_name
""")
def q_returned_items_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-lineitem revenue by customer nation —
    the returnflag filter pushes into the lineitem scan, one fact
    shuffle, dims broadcast."""
    l = (_t(spark, sf_dir, "lineitem")
         .where(F.col("l_returnflag") == "R"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (joined.groupBy("n_name")
            .agg(F.count("*").alias("n_returned_items"),
                 F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).cast("double")
                 .alias("lost_revenue")))


@query("volume_shipping", oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
""")
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation-pair predicate filters BOTH dimension paths
    before they broadcast (supplier and customer shrink to two nations'
    worth before touching the fact), so the only big work is one
    lineitem⋈orders shuffle — the two-sided-dim-pruning pattern Q5/Q10
    don't exercise."""
    na, nb = "NATION_1", "NATION_2"
    n = (_t(spark, sf_dir, "nation")
         .where(F.col("n_name").isin(na, nb))
         .select("n_nationkey", "n_name"))
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    c = (_t(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", F.col("n_name").alias("cust_nation")))
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
               .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
               .where(((F.col("supp_nation") == na)
                       & (F.col("cust_nation") == nb))
                      | ((F.col("supp_nation") == nb)
                         & (F.col("cust_nation") == na))))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (joined
            .select("supp_nation", "cust_nation",
                    F.year("l_shipdate").alias("l_year"),
                    vol.alias("volume"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum(F.col("volume").cast("decimal(18,4)"))
                  .cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


@query("correlated_above_avg", oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
    SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*)
    FROM orders o2
    WHERE o2.o_custkey = o.o_custkey)
""")
def q_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above 2× their customer's
    mean), decorrelated to a window aggregate over the correlation key
    — one shuffle, zero extra scans (vs the naive plan's subquery per
    row). The mean is never emitted, but it decides row MEMBERSHIP, so
    a bare float avg would still let summation-order differences flip
    a boundary row between engines — both sides therefore compute the
    exact decimal sum divided by the count (identical IEEE division on
    identical inputs), the module's standard float discipline."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cnt = F.count("*").over(w)
    tot = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    cust_avg = tot.cast("double") / cnt
    return (o.withColumn("_avg", cust_avg)
             .where(F.col("o_totalprice") > 2 * F.col("_avg"))
             .select("o_orderkey", "o_custkey",
                     F.col("o_totalprice").cast("double")
                     .alias("o_totalprice")))


@query("price_histogram", oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 50000.0) AS BIGINT)
         * CAST(50000.0 AS DOUBLE) AS bucket_low,
       count(*) AS n_orders
FROM orders
GROUP BY 1, 2
""")
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: bucket = floor(x/w) —
    a single map-side-combinable aggregation (the distribution sketch
    every profiling pass starts with)."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
    return (o.select(bucket.alias("bucket"),
                     (bucket * 50000.0).alias("bucket_low"))
             .groupBy("bucket", "bucket_low")
             .agg(F.count("*").alias("n_orders")))


_SQL_SURFACE = """
WITH big_spenders AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
  HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000)
SELECT c.c_custkey, c.c_name, CAST(b.spend AS DOUBLE) AS spend
FROM customer c
JOIN big_spenders b ON b.o_custkey = c.c_custkey
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
  AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                        WHERE n_regionkey <= 2)
"""

@query("sql_cte_subqueries", oracle=_SQL_SURFACE)
def q_sql_cte_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry surface: CTE + HAVING + correlated EXISTS (planned
    as a left-semi join) + IN subquery, executed verbatim via
    spark.sql over catalog-registered views — identical text runs on
    DuckDB as the oracle (ANSI core)."""
    from distributed_deduplicator_spark.sources import register_views
    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE)


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")

@query("table_profile", oracle=" UNION ALL ".join(
    f"""SELECT '{c}' AS col,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_v,
       CAST(max({c}) AS VARCHAR) AS max_v
FROM documents""" for c in _PROFILE_COLS))
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: per-column null count, distinct count,
    min/max — the ingest health check every pipeline runs first. ONE
    scan computes every column's aggregates simultaneously (a single
    groupBy-less agg), then a stack() unpivot reshapes to one row per
    column — never k scans for k columns. The oracle spells the same
    result as k unions, which is exactly the shape NOT to run at
    100 TB."""
    d = _t(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max")]
    wide = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col, n_nulls, n_distinct, min_v, max_v)")


@query("order_priority_check", oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '2000-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""")
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one late lineitem (shipped
    more than 90 days after the order date — the fixture carries
    l_shipdate only), counted by priority. The correlated EXISTS
    decorrelates to a LEFT SEMI join — the probe side never expands
    (no duplicate-orderkey blowup before the aggregate), so only
    qualifying order rows reach the single count shuffle."""
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
    l = _t(spark, sf_dir, "lineitem")
    # full-timestamp interval, not date_add (which truncates to DATE
    # and would diverge from the oracle's + INTERVAL the moment orders
    # carry a time of day)
    cond = ((o["o_orderkey"] == l["l_orderkey"])
            & (l["l_shipdate"]
               > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")))
    return (o.join(l, cond, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_orders")))


@query("custdist_order_counts", oracle="""
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderstatus <> 'P'
  GROUP BY c.c_custkey)
GROUP BY c_count
""")
def q_custdist_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    (customers with 0 orders included via the outer join). Two
    aggregations, but the second runs over one-row-per-customer input
    and the final histogram is tiny — the wire cost is one fact
    shuffle plus a combinable re-count."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per = (c.join(o, o["o_custkey"] == c["c_custkey"], "left")
            .groupBy(c["c_custkey"])
            .agg(F.count(o["o_orderkey"]).alias("c_count")))
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))




def _hll_per_type_and_all(e: DataFrame, out_col: str) -> DataFrame:
    """Per-event-type HLL distinct-user estimates plus an ALL row from
    UNIONING the per-type sketches — the one sketch kernel behind both
    `sketch_distinct_users` and `hll_sketch_rollup` (they differ only
    in output column name and which accuracy gate covers them)."""
    sk = (e.select("event_type", "user_id")
           .groupBy("event_type")
           .agg(F.hll_sketch_agg("user_id").alias("sk")))
    per = sk.select(F.col("event_type").alias(out_col),
                    F.hll_sketch_estimate("sk").alias("est_users"))
    merged = (sk.agg(F.hll_union_agg("sk").alias("sk"))
                .select(F.lit("ALL").alias(out_col),
                        F.hll_sketch_estimate("sk").alias("est_users")))
    return per.unionByName(merged)


@query("sketch_distinct_users")  # rows-only: DataSketches HLL binary
def q_sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch cardinality: per-event-type distinct users via
    DataSketches HLL (hll_sketch_agg), plus an ALL row produced by
    UNIONING the per-type sketches (hll_union_agg) — never re-scanning
    the data. Mergeability is the whole point at 100 TB: shard-level
    sketches combine associatively across files/days/regions, the
    pattern exact distinct cannot follow. Error gate vs exact counts in
    tests/test_relational_extra.py."""
    return _hll_per_type_and_all(
        _t(spark, sf_dir, "events"), out_col="event_type")


@query("kll_value_quantiles")  # rows-only: DataSketches KLL binary
def q_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantiles: per-event-type p25/p50/p75/p90 of
    value via DataSketches KLL, plus an ALL row whose sketch is the
    FOLD-MERGE of the per-type sketches (kll_sketch_merge_double over
    the collected sketch array) — quantiles over the whole table
    without re-scanning it. The mergeable complement of
    text_length_quantiles' t-digest: shard-level KLL sketches combine
    associatively across files/days, which is how quantiles are
    actually computed at 100 TB. Accuracy + merge-equivalence gated in
    tests/test_relational_extra.py."""
    e = _t(spark, sf_dir, "events")
    sk = (e.groupBy("event_type")
           .agg(F.kll_sketch_agg_double("value").alias("sk")))

    def quantiles(col):
        return [F.kll_sketch_get_quantile_double(col, F.lit(q))
                 .alias(f"p{int(q * 100)}")
                for q in (0.25, 0.5, 0.75, 0.9)]

    per = sk.select("event_type", *quantiles(F.col("sk")))
    arr = sk.agg(F.collect_list("sk").alias("sks"))
    merged_sk = F.aggregate(
        F.slice("sks", 2, F.greatest(F.size("sks") - 1, F.lit(0))),
        F.element_at("sks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x))
    merged = (arr.select(merged_sk.alias("sk"))
                 .select(F.lit("ALL").alias("event_type"),
                         *quantiles(F.col("sk"))))
    return per.unionByName(merged)


@query("join_full_outer_counts", oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust
      FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey, count(*) AS n_supp
      FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
""")
def q_join_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (high-balance
    customer vs supplier counts per nation): nations present on either
    side survive with zero-filled counts. Aggregating BEFORE the outer
    join keeps the shuffle at |nations| rows per side — the
    reduce-then-join discipline that makes outer joins cheap at scale."""
    c = (_t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
         .groupBy("c_nationkey").agg(F.count("*").alias("n_cust")))
    s = (_t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 5000)
         .groupBy("s_nationkey").agg(F.count("*").alias("n_supp")))
    j = c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer")
    return j.select(
        F.coalesce(c["c_nationkey"], s["s_nationkey"]).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"))


@query("salted_skew_join_revenue", oracle="""
SELECT c_nationkey AS nationkey,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
""")
def q_salted_skew_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join under the correctness gate: events salted
    into 16 sub-keys join the customer dim replicated per salt, then
    per-nation rollup — the explicit-salting plan for the hot-key case
    where one user's rows would melt a single reducer (the burst
    analog of the reference's contention story, R13). The oracle is
    the PLAIN join: salting must be invisible in the result."""
    from distributed_deduplicator_spark.operators.relational import (
        salted_join)
    e = (_t(spark, sf_dir, "events")
         .select(F.col("user_id").alias("ukey"), "value"))
    c = (_t(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("ukey"), "c_nationkey"))
    j = salted_join(e, c, on="ukey", n_salt=16)
    return (j.groupBy(F.col("c_nationkey").alias("nationkey"))
             .agg(F.count("*").alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value")))


@query("disjunctive_predicate_revenue", oracle="""
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 40)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 50)
""")
def q_disjunctive_predicate_revenue(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three conjunctive clauses spanning
    both join sides. Catalyst distributes the common p_partkey
    equi-key out of the disjunction (the join stays a hash join, never
    a nested loop) and pushes each side's derivable residual
    (p_brand IN..., l_quantity range hull) below the join — the
    disjunction-handling edge a planner either gets right or pays a
    full-table join for."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l["l_partkey"] == p["p_partkey"])
    clause = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    cond = (clause("Brand#12", 15, 1, 30)
            | clause("Brand#23", 25, 10, 40)
            | clause("Brand#34", 35, 20, 50))
    return (j.where(cond)
             .agg(F.sum((F.col("l_extendedprice")
                         * (1 - F.col("l_discount")))
                        .cast("decimal(18,4)")).cast("double")
                  .alias("revenue"),
                  F.count("*").alias("n_items")))


# ---------------------------------------------------------------------------
# TPC-H analytic-join family, round 4 widening: Q5, Q6, Q8, Q9*, Q14,
# Q15, Q17, Q18, Q22* (* = adapted — the fixtures lack partsupp,
# commit/receipt dates, ship modes and phone numbers, so supply-cost
# and lateness terms are dropped while the join/agg SHAPE each query
# exists to exercise is kept). Together with Q1/Q3/Q4/Q7/Q10/Q13/Q19
# (pricing_summary, shipping_priority, order_priority_check,
# volume_shipping, returned_items_by_nation, custdist_order_counts,
# disjunctive_predicate_revenue) this covers every TPC-H query shape
# expressible over the fixture schema.
# ---------------------------------------------------------------------------


@query("local_supplier_volume", oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""")
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the CUSTOMER and the
    SUPPLIER of each lineitem sit in the same nation of one region —
    the join cycle (customer→orders→lineitem→supplier→customer's
    nation) that makes Q5 the classic join-order test. Spark plan: the
    region filter prunes nation before either dim path broadcasts; the
    c_nationkey = s_nationkey residual rides the supplier broadcast
    join, so the only big shuffle is lineitem⋈orders."""
    r = (_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    n = (_t(spark, sf_dir, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("n_nationkey", "n_name"))
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_nationkey", "n_name"))
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate")
                 >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate")
                   < F.lit("1997-01-01 00:00:00").cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .join(F.broadcast(s),
                     (l.l_suppkey == s.s_suppkey)
                     & (c.c_nationkey == s.s_nationkey)))
    return (joined.groupBy("n_name")
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).cast("double")
                 .alias("revenue")))


@query("forecast_revenue", oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate query — no join,
    no groupBy key. Every predicate (date range, discount band,
    quantity cap) pushes into the parquet scan; the global aggregate is
    a partial-then-final pass with a single-row shuffle. The simplest
    query in the family and the one that isolates scan + pushdown
    throughput."""
    l = _t(spark, sf_dir, "lineitem")
    f = l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return f.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount"))
              .cast("decimal(18,4)")).cast("double").alias("revenue"),
        F.count("*").alias("n_items"))


@query("market_share", oracle="""
SELECT o_year,
       CAST(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE 0 END AS DECIMAL(18,4)))
                 AS DOUBLE)
            / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)
       AS DOUBLE) AS mkt_share
FROM (SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD')
GROUP BY o_year
""")
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a regional market for one
    part type, by order year — a conditional-sum / total-sum ratio over
    an eight-table join. Both sums aggregate exactly over DECIMAL and
    cast to DOUBLE before the one IEEE division, so the ratio is
    bit-identical across engines. Plan: part-type and region filters
    prune both dim paths pre-broadcast; one lineitem⋈orders shuffle."""
    p = (_t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
         .select("p_partkey"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = (_t(spark, sf_dir, "nation")
          .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("cust_nk")))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"))
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nk"))
         .select("s_suppkey", "supp_nation"))
    c = (_t(spark, sf_dir, "customer")
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nk"))
         .select("c_custkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    joined = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
               .join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .join(F.broadcast(s), l.l_suppkey == s.s_suppkey))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = joined.select(F.year("o_orderdate").alias("o_year"),
                         vol.alias("volume"), "supp_nation")
    num = (F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                  .otherwise(F.lit(0.0)).cast("decimal(18,4)"))
           .cast("double"))
    den = F.sum(F.col("volume").cast("decimal(18,4)")).cast("double")
    return (base.groupBy("o_year")
            .agg((num / den).cast("double").alias("mkt_share")))


@query("product_profit_by_nation", oracle="""
SELECT n_name, year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY n_name, o_year DESC
""")
def q_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table in the fixtures, so
    profit omits the supply-cost term): per supplier-nation, per
    order-year profit on parts whose name matches a substring. The
    LIKE filter prunes part before broadcast; one lineitem⋈orders
    shuffle; ORDER BY inside the query exercises a deterministic
    sorted output contract."""
    p = (_t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
         .select("p_partkey"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    joined = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
               .join(o, l.l_orderkey == o.o_orderkey)
               .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
               .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey))
    return (joined
            .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).cast("double")
                 .alias("profit"))
            .orderBy("n_name", F.col("o_year").desc()))


@query("promo_revenue", oracle="""
SELECT CAST(CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) * 100.0
            / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS DOUBLE)
       AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""")
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from
    promotional parts — conditional-sum / total-sum over a single
    fact⋈dim join. The date filter pushes to the lineitem scan; part
    broadcasts; exact decimal sums on both terms, one IEEE multiply +
    divide at the boundary."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = (_t(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate")
                 >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate")
                   < F.lit("1996-10-01 00:00:00").cast("timestamp"))))
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = (F.sum(F.when(F.col("p_type") == "PROMO", vol)
                    .otherwise(F.lit(0.0)).cast("decimal(18,4)"))
             .cast("double"))
    total = F.sum(vol.cast("decimal(18,4)")).cast("double")
    return joined.agg(
        (promo * F.lit(100.0) / total).cast("double")
        .alias("promo_revenue_pct"))


@query("top_supplier_revenue", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — an aggregate feeding a scalar-max comparison against
    itself (the view + subquery construction). Spark plan: one grouped
    DECIMAL aggregate on l_suppkey, an unpartitioned window max over
    the |suppliers|-row result (tiny after the agg), filter equal, then
    broadcast-join supplier names. The max comparison happens on exact
    DECIMAL, so ties are exact, not float-fuzzy."""
    l = (_t(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate")
                 >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate")
                   < F.lit("1996-04-01 00:00:00").cast("timestamp"))))
    rev = (l.groupBy(F.col("l_suppkey").alias("supplier_no"))
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).alias("_rev")))
    w = Window.partitionBy()
    top = (rev.withColumn("_max", F.max("_rev").over(w))
              .where(F.col("_rev") == F.col("_max")))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (top.join(F.broadcast(s),
                     F.col("supplier_no") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name",
                       F.col("_rev").cast("double").alias("total_revenue")))


@query("small_qty_order_revenue", oracle="""
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS agg_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey) pq
  ON agg_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.2 * avg_qty
""")
def q_small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — each
    lineitem compared against ITS part's average quantity (a correlated
    scalar aggregate, decorrelated to a grouped aggregate + self-join).
    The per-part average is an exact decimal sum / count division, so
    the 0.2·avg threshold is bit-identical in both engines. Plan: the
    per-part agg shuffles (partkey), broadcasts back onto lineitem;
    the brand filter prunes part before broadcast."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    pq = (l.groupBy(F.col("l_partkey").alias("agg_partkey"))
           .agg((F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double") / F.count("*")).alias("avg_qty")))
    p = (_t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
         .select("p_partkey"))
    joined = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
               .join(pq, F.col("agg_partkey") == l.l_partkey)
               .where(F.col("l_quantity") < 0.2 * F.col("avg_qty")))
    return joined.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double") / F.lit(7.0)).cast("double").alias("avg_yearly"),
        F.count("*").alias("n_items"))


@query("large_order_customers", oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
""")
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed very large orders —
    group-then-HAVING on the quantity sum. The reference Q18 phrases
    it as orderkey IN (grouped subquery); both decorrelate to the same
    plan: ONE lineitem groupBy(orderkey) aggregate, filter on the
    aggregate, then join the (few) surviving orders to their customer
    — never a second pass over lineitem. HAVING compares exact
    DECIMAL."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (l.groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .alias("_qty"))
            .where(F.col("_qty") > 150))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (big.join(o, F.col("l_orderkey") == o.o_orderkey)
               .join(F.broadcast(c), o.o_custkey == c.c_custkey)
               .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice",
                       F.col("_qty").cast("double").alias("total_qty")))


@query("sales_opportunity_by_nation", oracle="""
SELECT c_nationkey,
       count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
""")
def q_sales_opportunity_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: the fixtures have no phone column, so
    the country-code digits become c_nationkey, and "never ordered"
    becomes "no order since 2000" — every fixture customer has SOME
    order): well-funded customers gone quiet, per nation. Exercises a
    scalar subquery (global avg as a literal-free cross filter) plus an
    anti-join. Plan: the avg is one tiny global agg broadcast into the
    filter; the anti-join shuffles only (custkey) pairs; acctbal sums
    are exact DECIMAL cast at the boundary."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    avg_pos = (c.where(F.col("c_acctbal") > 0.0)
                .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                      .cast("double") / F.count("*")).alias("_avg")))
    recent = (_t(spark, sf_dir, "orders")
              .where(F.col("o_orderdate")
                     >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
              .select("o_custkey"))
    rich = (c.crossJoin(F.broadcast(avg_pos))
             .where(F.col("c_acctbal") > F.col("_avg")))
    quiet = rich.join(recent, rich.c_custkey == recent.o_custkey,
                      "left_anti")
    return (quiet.groupBy("c_nationkey")
            .agg(F.count("*").alias("n_custs"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                  .cast("double").alias("total_acctbal")))


@query("incremental_rollup_merge", oracle="""
SELECT user_id, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id, event_type
""")
def q_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the corpus is split into a 'base'
    half and a 'delta' half (event_id parity), each aggregated to a
    partial state, and the states MERGED (operators/relational.py
    merge_agg_states) — the oracle is the FULL recompute over all
    events, so the driver row proves the mergeability law
    merge(agg(A), agg(B)) == agg(A ∪ B) value-for-value. Counts and
    DECIMAL sums merge exactly; the double cast happens only at the
    output boundary. At scale: base state is yesterday's table, delta
    is today's partition — merge cost is O(|keys|), never a rescan of
    history."""
    from distributed_deduplicator_spark.operators.relational import (
        merge_agg_states)
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.col("value").cast("decimal(18,2)").alias("_v"))

    def state(part):
        return (part.groupBy("user_id", "event_type")
                .agg(F.count("*").alias("n_events"),
                     F.sum("_v").alias("_sum_v")))

    # pmod, not %: Spark's % is sign-preserving, so a negative odd id
    # (-3 % 2 == -1) would match NEITHER filter and silently vanish
    # from the merged result while the full-recompute oracle keeps it
    base = state(ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 0))
    delta = state(ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 1))
    merged = merge_agg_states(base, delta,
                              ["user_id", "event_type"],
                              ["n_events", "_sum_v"])
    return merged.select(
        "user_id", "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("_sum_v").cast("double").alias("total_value"))


@query("table_diff_reconcile", oracle="""
WITH a AS (
  SELECT event_id, user_id, value FROM events WHERE event_id % 89 <> 0),
b AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 101 = 0 THEN value + 1.0 ELSE value END
           AS value
  FROM events WHERE event_id % 97 <> 0)
SELECT coalesce(a.event_id, b.event_id) AS event_id,
       CASE WHEN b.event_id IS NULL THEN 'missing_in_b'
            WHEN a.event_id IS NULL THEN 'missing_in_a'
            ELSE 'changed' END AS diff_status
FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
WHERE b.event_id IS NULL OR a.event_id IS NULL
   OR a.user_id <> b.user_id OR a.value <> b.value
""")
def q_table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two simulated versions of the events table (drops on
    each side + value drift on one) down to (key, diff_status) rows —
    the replica/migration audit. The operator ships only keys + row
    hashes through the full outer join (operators/relational.py
    table_diff); the oracle compares column values directly — hash
    reconciliation and direct comparison must agree row-for-row."""
    from distributed_deduplicator_spark.operators.relational import (
        table_diff)
    ev = _t(spark, sf_dir, "events")
    a = (ev.where(F.col("event_id") % 89 != 0)
           .select("event_id", "user_id", "value"))
    b = (ev.where(F.col("event_id") % 97 != 0)
           .select("event_id", "user_id",
                   F.when(F.col("event_id") % 101 == 0,
                          F.col("value") + F.lit(1.0))
                    .otherwise(F.col("value")).alias("value")))
    return table_diff(a, b, ["event_id"], ["user_id", "value"])


@query("parquet_roundtrip_agg", oracle="""
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""")
def q_parquet_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink round-trip under the correctness gate: events are WRITTEN
    through the append sink (R5, sources/sinks.py write_parquet, with a
    target-partitions repartition) to a fresh directory, read back, and
    aggregated — the oracle aggregates the ORIGINAL table, so the
    driver row proves the write/read path is lossless value-for-value,
    not just row-counted. Executes a job at call time by nature (the
    write), like the streaming family."""
    import hashlib

    from distributed_deduplicator_spark.scratch import scratch_path
    from distributed_deduplicator_spark.sources.sinks import write_parquet
    # per-process session scratch (scratch.py): process-scoped, so no
    # read-vs-overwrite race between concurrent drives or users on a
    # shared host, and swept at interpreter exit; STABLE per sf_dir
    # within the process, so repeated invocations in one long session
    # (bench loops, multi-round drives) overwrite one copy instead of
    # accumulating one per call
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    target = scratch_path(f"roundtrip_events_{tag}")
    ev = _t(spark, sf_dir, "events")
    write_parquet(ev, target, mode="overwrite", target_partitions=4)
    back = spark.read.parquet(target)
    return (back.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value")))


@query("late_shipment_counts", oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
""")
def q_late_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the fixtures lack ship modes and
    commit/receipt dates, so 'late' = shipped 60+ days after the order
    date and the grouping key is the return flag): per-flag counts of
    high- vs low-priority orders among late shipments — the
    cross-table date-arithmetic predicate plus two conditional counts
    in one pass. One lineitem⋈orders shuffle; both counts map-side
    combinable."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority",
                                           "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag",
                                             "l_shipdate")
    joined = (l.join(o, l.l_orderkey == o.o_orderkey)
               .where(F.col("l_shipdate")
                      >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (joined.groupBy("l_returnflag")
            .agg(F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint")
                  .alias("high_line_count"),
                 F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint")
                  .alias("low_line_count")))


@query("variant_shred_stats", oracle="""
SELECT event_type,
       CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(sum(CASE WHEN json_extract_string(props, '$.missing')
                          IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_missing,
       CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                               AS INTEGER) % 2 = 0
                     THEN CAST(json_extract_string(props, '$.k')
                               AS INTEGER) ELSE 0 END) AS BIGINT)
         AS sum_even_k
FROM events GROUP BY event_type
""")
def q_variant_shred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark 4's VARIANT type: props parse
    ONCE into the binary variant encoding (parse_json), then typed
    paths extract via variant_get / try_variant_get — the modern
    replacement for per-path string re-parsing (json_props_stats shows
    the classic get_json_object route on the same data; at 100 TB the
    variant parses each row once however many paths you read, and a
    variant-shredded parquet layout prunes paths at the scan).
    try_variant_get on an absent path yields null (counted, proving
    missing-path semantics match JSON NULL handling)."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (e.select("event_type", k.alias("_k"),
                     missing.alias("_m"))
             .groupBy("event_type")
             .agg(F.sum(F.when(F.col("_k").isNotNull(), 1).otherwise(0))
                   .cast("bigint").alias("n_with_k"),
                  F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0))
                   .cast("bigint").alias("n_with_missing"),
                  F.sum(F.when(F.col("_k") % 2 == 0, F.col("_k"))
                         .otherwise(0)).cast("bigint")
                   .alias("sum_even_k")))


# ---------------------------------------------------------------------------
# Round 5: the last five TPC-H query shapes (Q2/Q11/Q16/Q20/Q21). The
# fixtures carry no partsupp table, so the part↔supplier relation is
# derived from lineitem — per-(partkey, suppkey) aggregates stand in
# for ps_supplycost / ps_availqty. The SHAPES (correlated min, fraction
# -of-global HAVING, count-distinct with NOT-IN exclusion, semi-join on
# an aggregated subquery, exists/not-exists double correlation) are the
# point; they complete all 22 TPC-H patterns over this schema.
# ---------------------------------------------------------------------------


@query("min_cost_supplier", oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, supply_cost,
         min(supply_cost) OVER (PARTITION BY p_partkey) AS _best
  FROM part
  JOIN ps ON p_partkey = l_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size < 25 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       supply_cost AS cost
FROM cand WHERE supply_cost = _best
""")
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in one
    region offering the minimum supply cost — the correlated-scalar-min
    subquery, decorrelated to a window min + self-filter (exactly what
    Catalyst rewrites the IN-(correlated min) form into). Supply cost
    derives from lineitem as min(unit price) per (part, supplier); the
    min is order-independent and the per-row division is the same IEEE
    op in both engines, so the double equality against the window min
    is exact. Plan: ONE lineitem shuffle on (partkey, suppkey), then a
    window re-shuffle of the (much smaller) aggregate on partkey; part
    filter and the region-pruned supplier dim both broadcast."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    ps = (l.groupBy("l_partkey", "l_suppkey")
           .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("supply_cost")))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = (_t(spark, sf_dir, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("n_nationkey", "n_name"))
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    p = (_t(spark, sf_dir, "part")
         .where((F.col("p_size") < 25) & (F.col("p_type") == "LARGE"))
         .select("p_partkey", "p_name"))
    cand = (ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
              .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey))
    w = Window.partitionBy("p_partkey")
    return (cand.withColumn("_best", F.min("supply_cost").over(w))
                .where(F.col("supply_cost") == F.col("_best"))
                .select("s_acctbal", "s_name", "n_name", "p_partkey",
                        "p_name", F.col("supply_cost").alias("cost")))


@query("important_part_value", oracle="""
WITH val AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(v AS DOUBLE) AS part_value
FROM val
WHERE v * (SELECT count(*) FROM val) > (SELECT sum(v) FROM val) * 2
""")
def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supplied value (from suppliers of a
    nation group) exceeds a FRACTION of the global supplied value — the
    HAVING-against-a-scalar-subquery pattern. TPC-H scales the fraction
    by 1/SF to keep the row count stable; here the cut is 2× the
    average per-part share (v·n > total·2), which is scale-free and
    keeps the comparison in exact DECIMAL×BIGINT on both engines
    (doubles appear only at the output boundary), so it is
    bit-identical. Plan: one lineitem shuffle on partkey after the
    nation-pruned supplier broadcast; the global total is a 1-row
    re-aggregate of the grouped values cross-joined back (scalar
    broadcast, O(n·1)) — lineitem is scanned twice only in the
    unpersisted textbook form; at scale, pin `val` or let AQE reuse
    the exchange."""
    sup = (_t(spark, sf_dir, "supplier")
           .join(F.broadcast(
               _t(spark, sf_dir, "nation")
               .where(F.col("n_name").isin("NATION_1", "NATION_2",
                                           "NATION_3"))),
               F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey"))
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val = (l.join(F.broadcast(sup), l.l_suppkey == sup.s_suppkey)
            .groupBy("l_partkey")
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(18,4)")).alias("v")))
    thresh = val.agg((F.sum("v") * 2).alias("_tot2"),
                     F.count("*").alias("_n"))
    return (val.crossJoin(F.broadcast(thresh))
               .where(F.col("v") * F.col("_n") > F.col("_tot2"))
               .select(F.col("l_partkey").alias("partkey"),
                       F.col("v").cast("double").alias("part_value")))


@query("parts_supplier_counts", oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
""")
def q_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) bucket, excluding some brands/types and a
    NOT-IN supplier denylist (acctbal < 0 stands in for the complaints
    LIKE — the fixtures have no comment column). The part↔supplier
    relation derives from lineitem. Plan: denylist anti-join rides a
    broadcast (s_suppkey is non-null, so left_anti ≡ NOT IN); part
    attributes broadcast; the count-distinct is the only shuffle
    (two-phase: partial distinct on (grp, suppkey), then count)."""
    deny = (_t(spark, sf_dir, "supplier")
            .where(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    p = (_t(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#1")
                & (~F.col("p_type").isin("PROMO", "ECONOMY"))
                & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (l.join(F.broadcast(deny), l.l_suppkey == deny.s_suppkey,
                   "left_anti")
             .join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .groupBy("p_brand", "p_type", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@query("promo_part_shippers", oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
),
w AS (
  SELECT l_partkey, l_suppkey, qty,
         sum(qty) OVER (PARTITION BY l_partkey) AS part_qty
  FROM shipped
),
big AS (
  SELECT DISTINCT l_suppkey
  FROM w
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND qty > part_qty * CAST(0.5 AS DECIMAL(3,2))
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM big)
""")
def q_promo_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than half of a
    promoted part's annual volume — the semi-join against an aggregated
    correlated subquery (availqty > 0.5·sum(qty) in the reference;
    share-of-part-volume here, since there is no partsupp.availqty).
    The half-share cut compares exact DECIMALs. Plan: one lineitem
    shuffle on (partkey, suppkey) with the shipdate filter pushed to
    the scan, a window re-shuffle of the aggregate on partkey (the
    per-part total), 'red%' part broadcast, then a distinct-suppkey
    semi-join into the broadcast supplier⋈nation dim."""
    l = (_t(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate")
                 >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate")
                   < F.lit("1997-01-01 00:00:00").cast("timestamp")))
         .select("l_partkey", "l_suppkey", "l_quantity"))
    shipped = (l.groupBy("l_partkey", "l_suppkey")
                .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                      .alias("qty")))
    w = Window.partitionBy("l_partkey")
    p = (_t(spark, sf_dir, "part")
         .where(F.col("p_name").like("red%")).select("p_partkey"))
    big = (shipped.withColumn("part_qty", F.sum("qty").over(w))
                  .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
                  .where(F.col("qty")
                         > F.col("part_qty")
                         * F.lit("0.5").cast("decimal(3,2)"))
                  .select("l_suppkey").distinct())
    s = (_t(spark, sf_dir, "supplier")
         .join(F.broadcast(_t(spark, sf_dir, "nation")),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name", "n_name"))
    return (s.join(F.broadcast(big), s.s_suppkey == big.l_suppkey,
                   "left_semi")
             .select("s_name", "n_name"))


@query("suppliers_kept_waiting", oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
  FROM li GROUP BY l_orderkey
),
waits AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM li
  JOIN per_order ON li.l_orderkey = per_order.l_orderkey
  WHERE li.late = 1 AND per_order.n_supp > 1 AND per_order.n_late = 1
)
SELECT s_name, count(*) AS numwait
FROM waits JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""")
def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order — the exists / not-exists double
    correlation, decorrelated into one per-order aggregate (distinct
    suppliers, distinct LATE suppliers) joined back to the late rows:
    late=1 ∧ n_supp>1 ∧ n_late=1 is exactly "exists another supplier,
    not exists another LATE supplier". Lateness adapts to this schema
    as shipping >90 days after the order date (no commit/receipt
    columns). The top-20 order is total (s_name is unique), so LIMIT
    is deterministic. Plan: lineitem⋈orders shuffles on orderkey; the
    per-order aggregate and the join-back REUSE that orderkey
    partitioning (no extra exchange); the final per-supplier count is
    a tiny shuffle over distinct (order, supplier) pairs."""
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    li = (l.join(o, l.l_orderkey == o.o_orderkey)
           .select("l_orderkey", "l_suppkey",
                   F.when(F.col("l_shipdate")
                          > F.col("o_orderdate")
                          + F.expr("INTERVAL 90 DAYS"), 1)
                    .otherwise(0).alias("late")))
    per_order = (li.groupBy("l_orderkey")
                   .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                        F.countDistinct(
                            F.when(F.col("late") == 1,
                                   F.col("l_suppkey"))).alias("n_late")))
    waits = (li.where(F.col("late") == 1)
               .join(per_order.where((F.col("n_supp") > 1)
                                     & (F.col("n_late") == 1)),
                     "l_orderkey", "left_semi")
               .select("l_orderkey", "l_suppkey").distinct())
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (waits.join(F.broadcast(s), waits.l_suppkey == s.s_suppkey)
                 .groupBy("s_name")
                 .agg(F.count("*").alias("numwait"))
                 .orderBy(F.col("numwait").desc(), "s_name")
                 .limit(20))


@query("event_p99_exceeders", oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
cut AS (
  SELECT event_type, value AS p99 FROM ranked
  WHERE rk = CAST(ceil(0.99 * n) AS BIGINT))
SELECT r.event_type, count(*) FILTER (r.value > c.p99) AS n_above,
       max(c.p99) AS p99, count(*) AS n
FROM ranked r JOIN cut c ON r.event_type = c.event_type
GROUP BY r.event_type
""")
def q_event_p99_exceeders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type p99 tail: the discrete order statistic at rank
    ⌈0.99·n⌉ (a REAL data value, carried — never interpolated, so it
    hashes identically in both engines) and the count of rows strictly
    above it. The SLO/outlier primitive: which event types have how
    heavy a tail.

    Plan: one shuffle on event_type for the rank window, then the
    tiny |types|-row cut table joins back (broadcast). At 100 TB a
    per-type total sort skews on hot types — the documented scale path
    is a first pass with approx_percentile to get a candidate cut,
    then one exact filtered count pass (two scans, no global sort);
    the window form stays here because it is the oracle-exact shape.
    """
    e = _t(spark, sf_dir, "events").select("event_type", "value",
                                           "event_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = (e.withColumn("rk", F.row_number().over(w))
               .withColumn("n", F.count("*").over(wn)))
    cut = (ranked.where(F.col("rk") == F.ceil(F.lit(0.99) * F.col("n"))
                        .cast("bigint"))
                 .select("event_type", F.col("value").alias("p99")))
    return (ranked.join(F.broadcast(cut), "event_type")
                  .groupBy("event_type")
                  .agg(F.sum((F.col("value") > F.col("p99"))
                             .cast("bigint")).alias("n_above"),
                       F.max("p99").alias("p99"),
                       F.count("*").alias("n")))


@query("unpivot_lineitem_measures", oracle="""
SELECT l_returnflag, measure,
       CAST(round(sum(CAST(val AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS total,
       count(*) AS n_rows
FROM (UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice,
                      l_discount, l_tax FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE val)
GROUP BY 1, 2
""")
def q_unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape through the native ``DataFrame.unpivot``
    (melt) operator — the inverse of `pivot_status_counts` — then an
    exact DECIMAL sum per (returnflag, measure). Unpivot is a zero-
    shuffle Expand in the scan stage (each row emits 4); the only
    shuffle is the final 12-group aggregate, map-side combined.
    Sums go through DECIMAL(28,6) so both engines add exactly."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.unpivot(["l_returnflag"],
                   ["l_quantity", "l_extendedprice", "l_discount",
                    "l_tax"],
                   "measure", "val")
    return (m.groupBy("l_returnflag", "measure")
             .agg(F.round(F.sum(F.col("val").cast("decimal(28,6)")), 2)
                   .cast("double").alias("total"),
                  F.count("*").alias("n_rows")))


@query("hll_sketch_rollup")
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-user sketches (Apache DataSketches HLL
    via Spark 4's hll_sketch_agg): per-event-type estimates plus an
    'ALL' row whose estimate comes from MERGING the per-type sketches
    (hll_union_agg) — never from rescanning raw rows. This is the
    100 TB pattern the plain approx_count_distinct can't do: sketch
    once per partition/day/type, then answer any rollup by unioning
    fixed-size (~KB) sketches. Rows-only by contract (DataSketches
    binary layout has no DuckDB twin); the accuracy gate is
    `tests/test_pipeline.py::test_hll_rollup_accuracy` (≤5% vs
    exact, and the merged estimate consistent with the per-type ones).
    """
    return _hll_per_type_and_all(
        _t(spark, sf_dir, "events"), out_col="scope")


_BASKET_TOPK = 100

@query("basket_part_pairs_lift", oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM li),
marg AS (SELECT l_partkey, count(*) AS c_part FROM li GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b),
ranked AS (
  SELECT part_a, part_b, n_both,
         row_number() OVER (ORDER BY n_both DESC, part_a, part_b) AS rk
  FROM pairs)
SELECT r.part_a, r.part_b, r.n_both, ma.c_part AS n_a, mb.c_part AS n_b,
       CAST(r.n_both AS DOUBLE) * n.n_orders
         / (CAST(ma.c_part AS DOUBLE) * mb.c_part) AS lift
FROM ranked r
JOIN marg ma ON ma.l_partkey = r.part_a
JOIN marg mb ON mb.l_partkey = r.part_b
CROSS JOIN n
WHERE r.rk <= {_BASKET_TOPK}
""")
def q_basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-100 part pairs appearing in
    the same order, with each pair's lift over independence — the
    association-rules statistic behind recommendations and assortment
    planning (and, for a corpus pipeline, the co-citation analogue).
    The cut ranks by the EXACT integer pair count (ties by part keys),
    never by the float lift, so the top-k set cannot straddle engines;
    lift rides along as one double expression on exact counts.

    Plan: the pair generation is a self-equi-join WITHIN the order key
    — Σ|basket|² work with TPC-H-bounded baskets (≤7 items), the
    canonical market-basket shape that never goes corpus-quadratic; the
    pair count is map-side combinable; margins join onto the 100
    survivors as broadcasts and the order total is a 1-row broadcast
    (the waived scalar shape)."""
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").distinct()
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    marg = li.groupBy("l_partkey").agg(F.count("*").alias("c_part"))
    pairs = basket_pairs(li, "l_orderkey", "l_partkey",
                         assume_distinct=True) \
        .select(F.col("item_a").alias("part_a"),
                F.col("item_b").alias("part_b"), "n_both")
    top = topk_global(pairs, [F.col("n_both").desc(), F.col("part_a"),
                              F.col("part_b")], _BASKET_TOPK)
    ma = marg.select(F.col("l_partkey").alias("part_a"),
                     F.col("c_part").alias("n_a"))
    mb = marg.select(F.col("l_partkey").alias("part_b"),
                     F.col("c_part").alias("n_b"))
    # broadcast the 100-row survivor side into both margin joins —
    # the part-cardinality margin table streams, never shuffles
    j1 = ma.join(F.broadcast(top), "part_a")
    j2 = mb.join(F.broadcast(j1), "part_b")
    return (j2.crossJoin(F.broadcast(n))
              .select("part_a", "part_b", "n_both", "n_a", "n_b",
                      (F.col("n_both").cast("double") * F.col("n_orders")
                       / (F.col("n_a").cast("double") * F.col("n_b")))
                      .alias("lift")))


@query("open_orders_backlog", oracle="""
WITH span0 AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS open_d,
         CAST(max(l.l_shipdate) AS DATE) AS close_d
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate),
span AS (
  -- inverted spans (close < open) cover zero days under interval
  -- stabbing; the operator excludes them for the same reason
  SELECT * FROM span0 WHERE close_d >= open_d),
deltas AS (
  SELECT d, CAST(sum(delta) AS BIGINT) AS delta FROM (
    SELECT open_d AS d, 1 AS delta FROM span
    UNION ALL
    SELECT close_d + INTERVAL 1 DAY, -1 FROM span)
  GROUP BY d),
bounds AS (SELECT min(open_d) AS lo, max(close_d) AS hi FROM span),
spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                      AS DATE) AS day
          FROM bounds)
SELECT s.day, COALESCE(dl.delta, 0) AS day_delta,
       CAST(sum(COALESCE(dl.delta, 0)) OVER (ORDER BY s.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
FROM spine s LEFT JOIN deltas dl ON dl.d = s.day
""")
def q_open_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog: for every calendar day, how many
    orders are open (placed, not yet fully shipped) — the WIP /
    inventory-in-flight series an operations review trends, and for a
    pipeline the in-flight-work gauge (reference R12's horizon idea
    read as a population count instead of a per-key gate).

    The scale pattern is the point: instead of a day×order interval
    join (days × open-orders blowup, the classic range-join trap),
    each order contributes a +1 delta at open and a −1 the day after
    close; the daily backlog is the running sum. Interval stabbing
    becomes one corpus-scale combinable delta count plus a cumulative
    window over the ≤|days| delta table — O(n) + O(days), never
    O(n·days).

    Plan: one join ships (orderkey, shipdate) only; the delta
    groupBy is map-side combinable onto a ~2.5k-row key space; the
    calendar spine explodes from a 1-row MIN/MAX aggregate (no driver
    job); the cumsum window runs on the tiny dense series."""
    from distributed_deduplicator_spark.operators.temporal import (
        interval_backlog)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    span = (li.select("l_orderkey", "l_shipdate")
              .join(o.select("o_orderkey", "o_orderdate"),
                    li["l_orderkey"] == o["o_orderkey"])
              .groupBy("o_orderkey",
                       F.to_date("o_orderdate").alias("open_d"))
              .agg(F.to_date(F.max("l_shipdate")).alias("close_d")))
    return interval_backlog(span, "open_d", "close_d")


_SKEW_TOPK = 20

@query("join_key_skew_profile", oracle=f"""
WITH c AS (SELECT l_partkey AS key, count(*) AS cnt
           FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys FROM c),
ranked AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key) AS rk
  FROM c)
SELECT r.rk, r.key, r.cnt, t.n_rows, t.n_keys,
       CAST(r.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS frac,
       CAST(r.cnt * t.n_keys AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
         AS x_mean
FROM ranked r CROSS JOIN tot t
WHERE r.rk <= {_SKEW_TOPK}
""")
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem's part key: the 20 heaviest
    keys with each one's row share and its multiple of the mean key
    load — the diagnostic that decides HOW to join at 100 TB (a top key
    at ~1× mean → plain shuffle join is fine; at 100-1000× mean → salt
    that key or let AQE's skew-join split it, and this profile names
    exactly which keys to salt). The same one-aggregate pattern
    profiles any prospective join or groupBy key.

    Plan: ONE map-side-combinable count over the fact table (key-space
    sized state); the rank cut is TakeOrderedAndProject on that
    aggregate — ranked by the exact integer count with key tie-break,
    so the top-20 set is deterministic cross-engine; totals ride a
    1-row broadcast. x_mean = cnt·n_keys/n_rows is one double
    expression on exact BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("key")) \
          .agg(F.count("*").alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("n_rows"),
                F.count("*").alias("n_keys"))
    top = topk_global(c, [F.col("cnt").desc(), F.col("key")], _SKEW_TOPK)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return (top.withColumn("rk", F.row_number().over(w).cast("bigint"))
               .crossJoin(F.broadcast(tot))
               .select("rk", "key", "cnt", "n_rows", "n_keys",
                       (F.col("cnt").cast("double")
                        / F.col("n_rows").cast("double")).alias("frac"),
                       ((F.col("cnt") * F.col("n_keys")).cast("double")
                        / F.col("n_rows").cast("double"))
                       .alias("x_mean")))
