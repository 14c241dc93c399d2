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

# Round-9 verification rotation (see VERIFIED.md for the cross-round
# ledger; the retired round-8 window is recorded there). The first 50
# names are pinned (2 + 39 + 9):
# - the TWO queries whose code changed in round 9: ann_ivfpq_topk
#   (default m 16 → 32 — 2-dim subspaces; recall@5 0.757 at sf0.1,
#   clearing the 0.7 line, executed plan differs in the codebook/
#   qtab/ADC widths) and stream_ttl_dedup_stateful (the stateful fn
#   body rewritten onto the numpy lexsort + searchsorted jump kernel
#   — same logical plan, different Python in the stateful operator,
#   re-windowed under the changed-code rule; identity property- and
#   parity-gated locally). The round's other changes touch no
#   registered query's executed path: the drain-guard extensions only
#   REJECT shapes no registered drain uses, drain sizing's directory
#   branch can't trigger on single-file fixtures, ivf_index_add's
#   error handling is API-surface (pytest-gated), and the
#   dedup_savings persist experiment was REVERTED (negative result,
#   BENCH.md).
# - the 39 queries whose newest driver row is round 5 — the entire
#   staleness tail (after this round no query's newest evidence
#   predates r6). Includes the five that yielded their r8 slots
#   (dedup_incremental, filter_project, agg_global, join_star_revenue,
#   pricing_summary).
# - 7 round-6-banked rows: the three r6 rows-only entries first
#   (weakest evidence class — decontaminate_bloom, hll_sketch_rollup,
#   stream_minhash_neardup), then the streaming/sink representatives
#   (stream_upsert_ledger, parquet_roundtrip_agg, multimodal_resize)
#   and dedup_savings_by_source (perf-investigated this round, code
#   unchanged — the green row pins that).
# - 2 LATE round-9 plan changes: cosine_topk and knn_label_vote
#   inherit cosine_topk_bruteforce's new corpus-side fanout (the
#   broadcast nested-loop join's parallelism is the corpus split
#   count; a one-split fixture file serialized |corpus|·|queries|
#   interpreted cosine folds onto one core — no-op repartition at
#   real scale, knn sf1 6.3→2.35 s, oracle-exact at sf0.01+sf0.1).
#   They take the two lowest-priority stale slots (the TPC-H tails
#   min_cost_supplier / important_part_value yield, per the
#   plan-changed-beats-stale-refresh policy) — the third consumer,
#   activity_profile_topk, already sits in the r5 tail above. The
#   remaining 36 r6-banked rows queue for r10.
# Everything after the window keeps module registration order. Update
# this list each round as the window rotates; an unknown name fails
# import.
_ROTATION_HEAD = [
    # code changed in round 9
    "ann_ivfpq_topk", "stream_ttl_dedup_stateful",
    # newest driver row r5 — the staleness tail, cleared whole
    "activity_profile_topk", "agg_approx_distinct", "agg_global",
    "bigram_lift_topk", "chunk_sliding_windows", "dedup_incremental",
    "dedup_rate_by_hour", "doc_dup_ngram_stats", "filter_project",
    "forecast_revenue", "funnel_conversion", "incremental_rollup_merge",
    "jaccard_dedup_clusters", "jaccard_keep_best", "jaccard_keep_one",
    "jaccard_ngram_pairs", "join_star_revenue", "large_order_customers",
    "late_shipment_counts", "local_supplier_volume", "market_share",
    "minhash_near_dup", "multimodal_feature_neardup",
    "multimodal_features", "pricing_summary", "product_profit_by_nation",
    "promo_revenue", "sales_opportunity_by_nation",
    "simhash_fingerprints", "sketch_distinct_users",
    "small_qty_order_revenue", "table_diff_reconcile",
    "text_fingerprint_dedup", "text_lang_id", "text_quality_filter",
    "text_winnow_fingerprints", "top_supplier_revenue",
    "user_state_history", "variant_shred_stats",
    # r6-banked refresh: rows-only trio, streaming/sink reps,
    # the perf-investigated report
    "decontaminate_bloom", "hll_sketch_rollup", "stream_minhash_neardup",
    "stream_upsert_ledger", "parquet_roundtrip_agg", "multimodal_resize",
    "dedup_savings_by_source",
    # late round-9 plan change (bruteforce corpus fanout)
    "cosine_topk", "knn_label_vote",
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
