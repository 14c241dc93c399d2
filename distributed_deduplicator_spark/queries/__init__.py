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

# STANDING FRESHNESS POLICY (round 10+): each round's 50-slot window
# takes (1) every query whose code/plan changed that round — the
# changed-code rule, plan-changed beats stale-refresh — then (2) the
# remaining slots (~45 in a typical round) refresh the OLDEST-banked
# driver rows first (rows-only entries before oracle rows within the
# same age class — weakest evidence class first; ties broken
# alphabetically for determinism). With 179 registered queries and
# ~45 refresh slots/round, every query's newest driver row is at most
# 4 rounds old in steady state. VERIFIED.md carries the cross-round
# ledger and per-round histograms.
#
# Round-10 verification rotation. The first 50 names are pinned
# (4 + 35 + 11):
# - the FOUR ANN queries whose auto-sizing code changed in round 10:
#   the flat ~2048-candidate budget cap was re-curved to
#   _candidate_budget(n) = max(2048, 64√n) (operators/similarity.py —
#   total scoring work now matches the n·nlist assignment scan's
#   n^1.5 order; the flat cap was measured DOMINATED at n=20k:
#   recall 0.477 @ 12.1 s vs uncapped 0.780 @ 7.2 s, BENCH.md).
#   At the driver's gate SF (n=500) the budget floor keeps every
#   executed plan IDENTICAL; they re-window under the changed-code
#   rule anyway. Round 10's other code changes touch no registered
#   query's executed path: cosine_topk_bruteforce gained an optional
#   corpus_min_partitions escape hatch (default path plan-identical —
#   parity asserted in tests), _ivf_index_stats warns on corrupt-
#   footer fallback (API surface, pytest-gated), drain sizing treats
#   a 0-byte source sum as unavailable (can't trigger on the
#   fixtures), and bench.py gained a solo-run contamination probe
#   (tooling).
# - the 35 queries whose newest driver row is round 6 — the entire
#   r6-banked queue from VERIFIED.md (after this round no query's
#   newest evidence predates r7).
# - 11 round-7-banked rows, oldest-first per the standing policy:
#   kll_value_quantiles first (the only r7 rows-only entry), then the
#   first 10 r7 oracle rows alphabetically.
# Everything after the window keeps module registration order. Update
# this list each round as the window rotates; an unknown name fails
# import.
_ROTATION_HEAD = [
    # code changed in round 10 (ANN candidate-budget re-curve)
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_lsh_topk",
    "ann_ivf_persisted_topk",
    # newest driver row r6 — the whole r6 queue
    "basket_part_pairs_lift", "bigram_lm_quality",
    "blocklist_scrub_stats", "bpe_pair_counts",
    "cluster_size_histogram", "corpus_filter_funnel",
    "cross_source_overlap", "curriculum_quality_bins",
    "dsir_importance_weights", "embedding_similarity_histogram",
    "event_p99_exceeders", "event_rate_anomaly",
    "event_transition_matrix", "important_part_value",
    "join_key_skew_profile", "lang_confusion_matrix",
    "length_outlier_mad", "min_cost_supplier", "ngram_novelty_scores",
    "open_orders_backlog", "parts_supplier_counts",
    "promo_part_shippers", "retention_cohorts", "soft_dedup_weights",
    "source_token_drift", "suppliers_kept_waiting", "tfidf_top_terms",
    "token_length_exact_quantiles", "token_simpson_diversity",
    "unigram_lm_quality", "unpivot_lineitem_measures",
    "value_drift_by_day", "vocab_coverage_topk", "vocab_growth",
    "zipf_rank_freq",
    # r7-banked refresh, oldest-first: rows-only entry first, then
    # alphabetical
    "kll_value_quantiles",
    "asof_join_forward_orders", "asof_join_nearest_orders",
    "correlated_above_avg", "cube_orders", "custdist_order_counts",
    "dedup_exact_distinct", "dedup_first_wins_winners",
    "dedup_latest_state", "disjunctive_predicate_revenue",
    "embedding_cosine_neardup",
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
