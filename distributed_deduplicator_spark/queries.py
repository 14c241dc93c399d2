"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a DuckDB oracle-SQL twin where SQL-expressible.

Registry contract (driver __spark_entry__.py): column names must match
between the Spark result and the oracle SQL — every computed column is
aliased identically on both sides. All queries are deterministic
(no uuid()/current_timestamp inside results; ids derive from data via
sha2 — replacing the reference's UUIDv4, DeduplicationProvider.kt:43).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import dedup as D
from distributed_deduplicator_spark.sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle twin)."""
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship: first-writer-wins dedup (reference R8/R9/R21)
# ---------------------------------------------------------------------------

@query("dedup_first_wins", oracle="""
SELECT event_id, ts, user_id, event_type, value,
       CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) = 1
            THEN 'SUCCESS' ELSE 'DUPLICATE' END AS verdict
FROM events
""")
def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest attempt per (user_id, event_type) wins; rest DUPLICATE.

    Reference: winner pick provider/DeduplicationProvider.kt:67-94;
    ordering = TIMEUUID clustering order (:230-233) → (ts, event_id).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    return D.dedup_first_wins(ev, ["user_id", "event_type"], ["ts", "event_id"])


@query("dedup_first_wins_winners", oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
""")
def q_dedup_first_wins_winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated relation itself (winners only), via the
    map-side-combinable struct-min plan (dedup_exact_keys)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value")
    return D.dedup_exact_keys(ev, ["user_id", "event_type"], ["ts", "event_id"])
