from distributed_deduplicator_spark.operators.dedup import (
    STATE_SUCCESS,
    STATE_DUPLICATE,
    STATE_RETRY,
    STATE_FAILED,
    STATE_NAMES,
    dedup_first_wins,
    dedup_exact,
    dedup_exact_keys,
    dedup_within_ttl,
    latest_state,
    arbitrate_ledger,
)

__all__ = [
    "STATE_SUCCESS", "STATE_DUPLICATE", "STATE_RETRY", "STATE_FAILED",
    "STATE_NAMES",
    "dedup_first_wins", "dedup_exact", "dedup_exact_keys",
    "dedup_within_ttl", "latest_state", "arbitrate_ledger",
]
