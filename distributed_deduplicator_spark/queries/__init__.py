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

# Round-4 verification rotation (see VERIFIED.md for the cross-round
# ledger). The first 50 names are pinned: the 39 queries that have
# never had a driver correctness row in rounds 1-3, then the 2 queries
# that regressed to ERR in r03 (NTZ — fixed this round, re-prove), then
# the 4 r01-mismatch queries whose fixes were never driver-re-checked,
# then 5 r01-green-only entries with the oldest evidence. Everything
# after the window keeps module registration order. Update this list
# each round as the window rotates; an unknown name fails import.
_ROTATION_HEAD = [
    # never driver-verified: multimodal (incl. guarded_process = R10)
    "multimodal_stats", "multimodal_content_hash", "multimodal_features",
    "guarded_process", "embedding_quantize_dedup", "multimodal_frame_sample",
    "multimodal_resize", "multimodal_feature_neardup",
    "multimodal_audio_windows",
    # never driver-verified: pipeline curation
    "train_test_split_hash", "benchmark_decontaminate", "repetition_filter",
    "source_cap_sample", "token_budget_pack", "corpus_mix_weights",
    "chunk_dedup_stats", "stratified_sample_lang",
    # never driver-verified: similarity
    "simhash_near_dup_pairs", "winnow_near_dup_pairs", "embedding_norm_stats",
    "embedding_cosine_neardup", "near_dup_clusters", "jaccard_dedup_clusters",
    "jaccard_keep_one", "ann_ivfpq_topk", "near_dup_ensemble",
    # never driver-verified: streaming
    "stream_enrich_counts", "stream_stream_attribution", "stream_upsert_ledger",
    # never driver-verified: temporal
    "timeseries_gapfill", "attribution_window_join", "rolling_hour_stats",
    "activity_profile_topk", "window_fill_forward", "user_event_journey",
    # never driver-verified: text
    "text_top_bigrams", "text_length_quantiles", "fuzzy_name_pairs",
    "frequent_tokens_approx",
    # r03 ERR regressions, fixed this round — re-prove green
    "dedup_within_ttl", "window_lag_lead",
    # r01 mismatch, fixed in r02 code but never driver-re-checked
    "stream_windowed_counts", "sessionize_events", "session_stats",
    "text_lang_profile",
    # r01-green-only (oldest evidence; code touched in r02)
    "jaccard_ngram_pairs", "cosine_topk", "asof_join_orders",
    "stream_session_windows", "stream_sliding_counts",
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
