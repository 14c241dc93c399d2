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

# Round-8 verification rotation (see VERIFIED.md for the cross-round
# ledger). The first 50 names are pinned (1 + 8 + 38 + 1 + 2): the ONE
# query that has never had a driver correctness row (exactsubstr_prune,
# added after the r07 window was pinned — its green row closes the
# ledger at 179/179), the EIGHT queries whose executed plans changed in
# round 8 (ann_lsh_topk: n-scaled table count + target_bucket=128;
# ann_ivfpq_topk: Lloyd-refined codebooks + 16·k rerank + qc-carrying
# probes; ann_ivf_persisted_topk: manifest sidecar + observed member
# write in the build, capped auto-nprobe in the query path;
# dup_span_stats: Spark side factored onto the shared
# operators/pipeline.dup_span_stats_df kernel; and the four streaming
# drains not already in the r4 tail below — stream_dedup_watermark /
# stream_windowed_counts / stream_ttl_dedup_stateful /
# stream_stream_attribution — whose availableNow drain now runs
# without the trailing no-data batch on source-sized shuffle
# partitions. ann_ivf_topk's new candidate cap does NOT bind at the
# driver SF, so its r7-green executed plan is unchanged), the 38
# queries whose newest driver row is round 3/4 — the staleness tail
# (agg_distinct r3 plus every r4-banked row; NOTE for the r09
# rotation: several tail rows are ALSO late-round-8 plan changes, not
# just staleness refreshes — the other three tuned streaming drains
# (stream_enrich_counts / stream_session_windows /
# stream_sliding_counts), the scale-defaults audit's
# simhash_near_dup_pairs / winnow_near_dup_pairs / near_dup_ensemble
# (block-combination keys, max_df anti-join) and source_cap_sample
# (salted two-phase cap) — treat their r08 rows as plan-changed
# evidence, not unchanged-code banking — plus containment_ngram_pairs
# near the window close (asymmetric prefix default), and 2 of the
# r5-banked reference-core dedup rows (oldest green evidence after
# the r4 tail clears; the other five r5 rows — dedup_incremental,
# filter_project, agg_global, join_star_revenue, pricing_summary —
# yield their slots to plan-changed queries and stay covered by the
# round's full local drives). Everything after the window keeps
# module registration order. Update this list each round as the
# window rotates; an unknown name fails import.
_ROTATION_HEAD = [
    # never driver-verified (round-7 post-pin addition)
    "exactsubstr_prune",
    # code changed in round 8 (executed plans differ at the gate SF)
    "ann_lsh_topk", "ann_ivfpq_topk", "ann_ivf_persisted_topk",
    "dup_span_stats",
    "stream_dedup_watermark", "stream_windowed_counts",
    "stream_ttl_dedup_stateful", "stream_stream_attribution",
    # newest driver row r3 (agg_distinct) / r4 — staleness refresh
    "agg_distinct",
    "asof_join_orders", "attribution_window_join",
    "benchmark_decontaminate", "chunk_dedup_stats", "corpus_mix_weights",
    "cosine_topk", "dedup_within_ttl", "embedding_norm_stats",
    "embedding_quantize_dedup", "frequent_tokens_approx",
    "guarded_process", "multimodal_audio_windows",
    "multimodal_content_hash", "multimodal_frame_sample",
    "multimodal_stats", "near_dup_clusters", "near_dup_ensemble",
    "repetition_filter", "rolling_hour_stats", "session_stats",
    "sessionize_events", "simhash_near_dup_pairs", "source_cap_sample",
    "stratified_sample_lang", "stream_enrich_counts",
    "stream_session_windows", "stream_sliding_counts",
    "text_lang_profile", "text_length_quantiles", "text_top_bigrams",
    "timeseries_gapfill", "token_budget_pack", "train_test_split_hash",
    "user_event_journey", "window_fill_forward", "window_lag_lead",
    "winnow_near_dup_pairs",
    # late round-8 plan change (containment's asymmetric prefix filter
    # became the default): takes the lowest-priority stale slot —
    # filter_project (r5-banked, code unchanged, full-drive-covered)
    # yields per the plan-changed-beats-stale-refresh policy
    "containment_ngram_pairs",
    # r5-banked reference-core dedup refresh (oldest green evidence
    # after the r4 tail clears this round)
    "dedup_first_wins", "dedup_arbitrate_ledger",
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
