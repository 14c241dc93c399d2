"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, sorted schema (column names), and order-insensitive
values. The comparison is TYPE-STRICT: each cell is normalized to a
(type-name, canonical-repr) pair, so `int 98806` vs `Decimal('98806')`
or `Decimal('136991.00')` vs `float 136991.0` — value-equal under
Python `==` — are reported as mismatches, exactly like the driver's
hash gate (round-1 lesson: 13 value-equal queries failed on terminal
types only).

Additionally, Decimal terminals are BANNED outright on either side:
DuckDB's pandas conversion floats DECIMAL/HUGEINT results while Spark
keeps Decimal/int64, so any Decimal reaching the comparison boundary is
a latent driver-hash failure even when this replica happens to match.
Queries must aggregate exactly over decimal internally and CAST the
result to DOUBLE/BIGINT on both sides.

Floats are compared by exact repr: both engines compute IEEE-754 double
arithmetic over identical inputs, and every oracle-checked query is
designed to be bit-deterministic (exact decimal/integer sums cast once,
per-row double expressions, interpolated percentiles over identical
multisets). NaN compares equal to NaN.
"""

from __future__ import annotations

import decimal
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v) -> tuple[str, str]:
    """Type-strict canonical form: (type name, canonical repr)."""
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, bool):  # before int (bool subclasses int)
        return ("bool", repr(v))
    if isinstance(v, int):
        return ("int", repr(v))
    if isinstance(v, (list, tuple)):
        return ("list", repr([_norm(x) for x in v]))
    return (type(v).__name__, repr(v))


def _normalize(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    # every cell is a (str, str) pair → rows always totally ordered,
    # None/int/str mixes included (ADVICE round 1: None next to ints
    # used to raise TypeError on tie-breaking sorts)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


def _assert_no_decimals(rows: list[tuple], side: str) -> None:
    for row in rows[:1000]:
        for tname, rep in row:
            assert tname != decimal.Decimal.__name__, (
                f"{side} result contains Decimal terminal {rep}: cast "
                "to DOUBLE/BIGINT on both sides (driver-hash hazard — "
                "DuckDB pandas conversion floats DECIMAL/HUGEINT)")


def compare(spark, sf_dir: str, spark_df, sql: str,
            max_report: int = 5) -> None:
    """Assert the Spark result and oracle SQL result are identical."""
    con = duckdb_conn(sf_dir)
    oracle = con.execute(sql).fetch_arrow_table().to_pylist()
    got = [r.asDict(recursive=True) for r in spark_df.collect()]

    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle[0].keys()) if oracle else s_cols
    assert s_cols == o_cols, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    assert len(got) == len(oracle), \
        f"row count mismatch: spark={len(got)} oracle={len(oracle)}"

    ns, no = _normalize(got), _normalize(oracle)
    _assert_no_decimals(ns, "spark")
    _assert_no_decimals(no, "oracle")
    if ns != no:
        diffs = [(a, b) for a, b in zip(ns, no) if a != b][:max_report]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
