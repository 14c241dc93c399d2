"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, sorted schema (column names), and order-insensitive
values (columns sorted by name, rows sorted, floats rounded to 9 sig
places to absorb float32→float64 noise). Any mismatch here would be a
hash mismatch in CORRECTNESS_r{N}.json, so tests gate on this.
"""

from __future__ import annotations

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


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _normalize(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


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
    if ns != no:
        diffs = [(a, b) for a, b in zip(ns, no) if a != b][:max_report]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
