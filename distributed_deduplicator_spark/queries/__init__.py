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

# Round-5 verification rotation (see VERIFIED.md for the cross-round
# ledger). The first 50 names are pinned: the 22 queries that have
# never had a driver correctness row in rounds 1-4 (added in round 4
# after the r04 window was pinned, or displaced by it), then the 10
# entries whose only driver evidence is round 1 (code untouched but
# stale), then the 2 multimodal queries whose code changed this round
# (r04's one red row — array-terminal ERR — flattened and given a full
# value oracle; feature_neardup upgraded from rows-only to oracle),
# then 16 oldest-evidence banked entries (r03 sketch rows-only, the
# dedup family, oldest relational). Everything after the window keeps
# module registration order. Update this list each round as the window
# rotates; an unknown name fails import.
_ROTATION_HEAD = [
    # never driver-verified: round-4 TPC-H additions
    "local_supplier_volume", "forecast_revenue", "market_share",
    "product_profit_by_nation", "promo_revenue", "top_supplier_revenue",
    "small_qty_order_revenue", "large_order_customers",
    "sales_opportunity_by_nation",
    # never driver-verified: relational
    "incremental_rollup_merge", "table_diff_reconcile",
    "parquet_roundtrip_agg", "late_shipment_counts", "variant_shred_stats",
    # never driver-verified: text / temporal / similarity / pipeline /
    # dedup / streaming
    "doc_dup_ngram_stats", "bigram_lift_topk",
    "funnel_conversion", "user_state_history",
    "jaccard_keep_best", "chunk_sliding_windows",
    "dedup_rate_by_hour", "stream_minhash_neardup",
    # r01-only evidence (stale; code unchanged since r02)
    "stream_dedup_watermark", "stream_ttl_dedup_stateful",
    "text_fingerprint_dedup", "text_lang_id", "text_quality_filter",
    "text_winnow_fingerprints", "minhash_near_dup", "simhash_fingerprints",
    "ann_lsh_topk", "ann_ivf_topk",
    # code changed in round 5: r04's red row fixed (scalar f0..f7 +
    # sha-derived value oracle) and the neardup twin's oracle upgrade
    "multimodal_features", "multimodal_feature_neardup",
    # code changed in round 5 (sf1 perf rework, parity re-verified at
    # sf0.001/0.01/0.1): hashed-shingle + positional-filter Jaccard
    # join and its two closure consumers, the norm-precomputing
    # blocked cosine, and the skinny-assignment IVF-PQ (ann_ivf_topk
    # is already windowed above)
    "jaccard_ngram_pairs", "jaccard_dedup_clusters", "jaccard_keep_one",
    "embedding_cosine_neardup", "ann_ivfpq_topk",
    # code changed in round 5: bounded-threshold levenshtein (same
    # kept rows/values; displaces the kll rows-only re-check to r06)
    "fuzzy_name_pairs",
    # oldest banked evidence: r03 sketch rows-only re-checks
    "agg_approx_distinct", "sketch_distinct_users",
    # oldest banked evidence: dedup family (reference R4/R6/R8/R21) and
    # relational core — the five swapped out for the changed-code
    # entries above (unchanged code, banked r03) head the r06 queue
    "dedup_first_wins", "dedup_arbitrate_ledger", "dedup_incremental",
    "filter_project", "pricing_summary",
    "agg_global", "join_star_revenue",
    # code changed in round 5: query-user cap added for sf1 scale
    # (output identical at driver-gate SFs, but changed code re-windows)
    "activity_profile_topk",
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
