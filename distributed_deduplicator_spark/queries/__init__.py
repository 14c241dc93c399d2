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

# Importing these modules populates the registry.
from distributed_deduplicator_spark.queries import dedup_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import relational  # noqa: F401,E402
from distributed_deduplicator_spark.queries import text_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import similarity_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import streaming_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import temporal_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import multimodal_queries  # noqa: F401,E402
from distributed_deduplicator_spark.queries import pipeline_queries  # noqa: F401,E402
