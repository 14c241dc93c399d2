"""Custom Spark data source: deterministic synthetic documents.

The reference is a database CONNECTOR at heart (a Cassandra client
doing per-key reads, provider/DeduplicationProvider.kt:181-192); this
module supplies the connector story for our engine using Spark 4's
Python Data Source API — the public extension point for sources Spark
has no built-in reader for (databases, APIs, generators):

- ``partitions()`` splits the id space into ranges, so generation is
  PARALLEL across executors (a 10⁹-doc corpus generates as ~1000
  independent tasks — no driver bottleneck);
- ``pushFilters()`` accepts doc_id range predicates and prunes whole
  partitions before any task launches — the same partition-pruning
  contract a real database connector implements (and the reference
  gets per-key from Cassandra's partition router);
- rows derive from md5(seed, doc_id) alone: any (partition count,
  filter, executor placement) produces byte-identical content, so
  results are reproducible corpus-wide — the deterministic-id
  discipline (DeduplicationProvider.kt:43) applied to data generation.

Registered per session via ``register_synthdocs(spark)`` then read
with ``spark.read.format("synthdocs").option(...).load()``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = ("doc_id long, text string, lang string, "
               "source string, n_chars long")
_LANGS = ("en", "de", "fr", "es", "zh")
_SOURCES = ("web", "books", "code", "wiki")
_VOCAB = ("data", "table", "row", "scan", "merge", "batch", "stream",
          "key", "value", "hash", "sort", "join", "filter", "window",
          "group", "agg", "query", "spark", "fast", "slow")


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start  # inclusive
        self.end = end      # exclusive


def _doc(seed: int, doc_id: int) -> tuple:
    """One synthetic document, a pure function of (seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 80
    words = []
    for i in range(n_words):
        hw = hashlib.md5(f"{seed}:{doc_id}:{i}".encode()).digest()
        words.append(_VOCAB[hw[0] % len(_VOCAB)])
    text = " ".join(words)
    return (doc_id, text, _LANGS[h[1] % len(_LANGS)],
            _SOURCES[h[2] % len(_SOURCES)], len(text))


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 0))
        self.n_partitions = int(options.get("n_partitions", 8))
        # doc_id bounds narrowed by pushed filters: [lo, hi)
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept doc_id range predicates; everything else stays with
        Spark. Narrowing [lo, hi) here lets partitions() drop whole id
        ranges before any task launches."""
        for f in filters:
            col = getattr(f, "attribute", ("",))[0] \
                if hasattr(f, "attribute") else None
            if col == "doc_id":
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            # pushed filters pruned everything — but an EMPTY partition
            # list makes PySpark substitute [None] and call read(None)
            # (plan_data_source_read.py), crashing the job; one empty
            # range yields the correct zero-row result
            return [_IdRange(0, 0)]
        step = -(-self.n_docs // self.n_partitions)  # ceil over FULL space
        parts = []
        for s in range(0, self.n_docs, step):
            e = min(s + step, self.n_docs)
            # prune partitions wholly outside the pushed bounds
            if e <= lo or s >= hi:
                continue
            parts.append(_IdRange(max(s, lo), min(e, hi)))
        return parts

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(self.seed, doc_id)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SynthDocsReader(self.options)


def register_synthdocs(spark: SparkSession) -> None:
    # pushFilters() is gated behind this conf (runtime-settable);
    # without it Spark refuses to plan a reader that implements it.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
