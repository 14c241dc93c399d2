"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a DuckDB oracle-SQL twin where SQL-expressible.

Registry contract (driver __spark_entry__.py): column names must match
between the Spark result and the oracle SQL — every computed column is
aliased identically on both sides. All queries are deterministic
(no uuid()/current_timestamp inside results; ids derive from data via
sha2 — replacing the reference's UUIDv4, DeduplicationProvider.kt:43).

Cross-engine float discipline (so the driver's value-hash matches):
- never emit a raw SUM over doubles (order-dependent); SUM through a
  DECIMAL cast (exact, associative) and cast back if a double is wanted;
- averages = exact decimal SUM cast to double, divided by COUNT — the
  same IEEE division on identical inputs is bit-identical in both
  engines;
- per-row double arithmetic (same inputs, same ops) is deterministic
  and safe; grouped stats over per-row doubles must be
  order-independent (min/max/count/percentile — never a bare mean).

Terminal-type discipline (round-2 lesson): every numeric OUTPUT column
is DOUBLE or BIGINT on both engines. DuckDB's pandas conversion floats
DECIMAL and HUGEINT aggregates while Spark keeps Decimal/int64 — a
value-equal result can still hash-mismatch on type. Aggregate exactly
over DECIMAL/ints inside, CAST the result at the boundary; the local
gate (tests/oracle.py) bans Decimal terminals outright.
"""

from distributed_deduplicator_spark.queries.registry import (  # noqa: F401
    QUERIES,
    ORACLE_SQL,
    query,
)

# Importing these modules populates the registry. ORDER MATTERS: the
# driver's correctness harness checks the FIRST 50 registry entries per
# round, so modules whose queries have never had a driver row go first
# (multimodal carries guarded_process — reference R10 — never verified
# in rounds 1-3). dedup + relational rows are banked green in
# CORRECTNESS_r01..r03 on unchanged code; they close the rotation.
# VERIFIED.md tracks the union of green rows across rounds.
from distributed_deduplicator_spark.queries import multimodal_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import pipeline_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import similarity_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import streaming_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import temporal_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import text_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import dedup_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import relational  # noqa: F401,E402

# Round-7 verification rotation (see VERIFIED.md for the cross-round
# ledger). The first 50 names are pinned (5 + 6 + 1 + 38): the FIVE
# queries that have never had a driver correctness row (round-6
# post-pin additions — landing these closes the ledger at 178/178),
# the SIX queries whose executed plans changed in round 7 (q-gram
# prefix-filtered fuzzy join ×2; tiled-GEMM exact cosine ×2 — the
# operator default also reroutes semantic_dedup_keep_one; IVF
# auto-nprobe/m=16 recall defaults ×2), ONE of the four round-6
# streaming changed-code consumers the r06 window could not fit (the
# other three stay represented by the r06-green wrappers sharing the
# same materialization path and queue for r08), and 38 of the 39
# queries whose newest driver row is still round 3 — VERDICT r6 #5's
# staleness sweep (agg_distinct yields its slot to the changed-code
# semantic_dedup_keep_one and heads the r08 queue). Everything after
# the window keeps module registration order. Update this list each
# round as the window rotates; an unknown name fails import.
_ROTATION_HEAD = [
    # never driver-verified (round-6 post-pin additions)
    "pareto_quality_front", "semantic_decontaminate",
    "ann_ivf_persisted_topk", "asof_join_forward_orders",
    "asof_join_nearest_orders",
    # code changed in round 7: ed-join prefix filter (both fuzzy
    # queries), GEMM-prefilter exact cosine (embedding_cosine_neardup
    # AND semantic_dedup_keep_one — its pair generation routes through
    # the same operator default), ANN recall defaults
    "fuzzy_name_pairs", "fuzzy_name_topk", "embedding_cosine_neardup",
    "semantic_dedup_keep_one", "ann_ivf_topk", "ann_ivfpq_topk",
    # code changed in round 6 (run_stream_to_df scratch
    # materialization), displaced from the r06 window
    "stream_stream_attribution",
    # r03-banked evidence, unchanged code — staleness refresh (38 of
    # 39; agg_distinct is the one bumped to the r08 queue to make
    # room for semantic_dedup_keep_one's changed-code slot)
    "correlated_above_avg", "cube_orders",
    "custdist_order_counts", "dedup_exact_distinct",
    "dedup_first_wins_winners", "dedup_latest_state",
    "disjunctive_predicate_revenue", "filtered_agg_orders",
    "grouping_sets_orders", "join_anti", "join_dim_broadcast",
    "join_full_outer_counts", "join_left_order_counts", "join_semi",
    "json_props_stats", "kll_value_quantiles", "order_priority_check",
    "percentiles_by_status", "pivot_status_counts", "predicate_in_null",
    "price_histogram", "returned_items_by_nation", "rollup_orders",
    "salted_skew_join_revenue", "scalar_functions", "set_ops",
    "shipping_priority", "sql_cte_subqueries", "table_profile",
    "text_stats", "topk_frequent_event_types", "topk_global",
    "volume_shipping", "window_distribution_funcs", "window_first_last",
    "window_rank_dense", "window_running_sum", "window_topk_per_group",
]


def _rotate(head: list[str]) -> None:
    missing = [n for n in head if n not in QUERIES]
    if missing:
        raise KeyError(f"rotation names not registered: {missing}")
    if len(set(head)) != len(head):
        raise ValueError("duplicate names in rotation head")
    ordered = {n: QUERIES[n] for n in head}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(_ROTATION_HEAD)
