"""Timestamp helpers tolerant of both Spark timestamp flavors.

The fixture parquet has changed timestamp physical types across driver
regenerations (TIMESTAMP(NANOS) -> long in round 1-2, tz-naive
timestamp[us] -> TIMESTAMP_NTZ in round 3). The source layer
(sources/fixtures.py) normalizes to TIMESTAMP on load, but operators
are also used directly on caller-supplied DataFrames, so the time
arithmetic itself must not assume the flavor: ``unix_micros()`` hard-
rejects TIMESTAMP_NTZ input (DATATYPE_MISMATCH).

``ts_micros`` inserts a cast to TIMESTAMP first. For a column already
of TimestampType the cast is an identity Catalyst removes at analysis;
for TIMESTAMP_NTZ it relabels the wall-clock value using the session
time zone — this engine pins it to UTC (session.py), making the cast
value-preserving. Pure JVM expression either way: stays inside
whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
