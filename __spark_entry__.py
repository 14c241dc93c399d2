"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``distributed_deduplicator_spark/``;
query definitions live in the ``distributed_deduplicator_spark.queries``
package so they are importable/testable without the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_deduplicator_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    First-writer-wins dedup of the events stream on
    (user_id, event_type) ordered by (ts, event_id) — the Spark
    rendering of the reference's core arbitration
    (provider/DeduplicationProvider.kt:67-94).
    """
    return Q.QUERIES["dedup_first_wins"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` entries."""
    return dict(Q.ORACLE_SQL)
