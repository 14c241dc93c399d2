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

# Round-6 verification rotation (see VERIFIED.md for the cross-round
# ledger). The first 50 names are pinned: the 42 queries that have
# never had a driver correctness row in rounds 1-5 (the round-5
# registry additions: TPC-H tails, the corpus-analysis block, the two
# bitmap/sketch rows-only entries), the FIRST query added in round 6
# (`fuzzy_name_topk`, the scale valve on `fuzzy_name_pairs` —
# windowed because it landed before the head was pinned), and the 7
# round-6 changed-code entries that fit (streaming wrappers moved
# from driver-side collect() to distributed scratch-parquet
# materialization; `parquet_roundtrip_agg`'s race-free scratch path;
# `multimodal_resize`'s module-level stub resizer). Changed-code
# entries that did NOT fit, plus the FIVE further queries added after
# the head was pinned (`pareto_quality_front`,
# `ann_ivf_persisted_topk`, `asof_join_forward_orders`,
# `asof_join_nearest_orders`, `semantic_decontaminate` — all
# registered after slot 50, locally verified, r07-queued), are listed
# in VERIFIED.md "Round-6 window" / its r07 queue. Everything after
# the window keeps module registration order. Update this list each
# round as the window rotates; an unknown name fails import.
_ROTATION_HEAD = [
    # never driver-verified: round-5 TPC-H tails
    "min_cost_supplier", "important_part_value", "parts_supplier_counts",
    "promo_part_shippers", "suppliers_kept_waiting",
    # never driver-verified: relational additions
    "event_p99_exceeders", "unpivot_lineitem_measures",
    "hll_sketch_rollup", "basket_part_pairs_lift", "open_orders_backlog",
    "join_key_skew_profile",
    # never driver-verified: corpus/text analysis block
    "tfidf_top_terms", "ngram_novelty_scores", "zipf_rank_freq",
    "vocab_growth", "token_simpson_diversity", "bpe_pair_counts",
    "dup_span_stats", "lang_confusion_matrix", "vocab_coverage_topk",
    "token_length_exact_quantiles",
    # never driver-verified: pipeline additions
    "cross_source_overlap", "corpus_filter_funnel", "decontaminate_bloom",
    "unigram_lm_quality", "length_outlier_mad", "dsir_importance_weights",
    "blocklist_scrub_stats", "bigram_lm_quality", "source_token_drift",
    "curriculum_quality_bins",
    # never driver-verified: similarity additions (knn_label_vote's
    # rank key gained the 6dp cross-engine rounding this round)
    "containment_ngram_pairs", "semantic_dedup_keep_one",
    "soft_dedup_weights", "knn_label_vote", "dedup_savings_by_source",
    "cluster_size_histogram", "embedding_similarity_histogram",
    # never driver-verified: temporal additions
    "value_drift_by_day", "retention_cohorts", "event_transition_matrix",
    "event_rate_anomaly",
    # NEW in round 6: per-left-row top-k valve on the fuzzy join
    "fuzzy_name_topk",
    # code changed in round 6 (collect()-free scratch materialization;
    # parity re-verified at sf0.01 in-session): the three wrappers the
    # round-5 verdict flagged, plus one append-mode and one
    # complete-mode run_stream_to_df representative
    "stream_dedup_watermark", "stream_upsert_ledger",
    "stream_minhash_neardup", "stream_ttl_dedup_stateful",
    "stream_windowed_counts",
    # code changed in round 6: scratch-dir write path / stub-resizer
    # module-level refactor
    "parquet_roundtrip_agg", "multimodal_resize",
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
