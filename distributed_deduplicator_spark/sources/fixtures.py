"""Parquet sources for the driver fixture tables.

The reference reads one Cassandra partition per call
(provider/DeduplicationProvider.kt:181-192, point scan R1); our engine is
set-oriented: one columnar parquet scan per table, with Catalyst handling
column pruning (R2) and predicate pushdown (R3) automatically.

At 100 TB these loaders are unchanged: ``spark.read.parquet`` over an
object-store prefix splits into ~128 MiB tasks; the scale knobs are all
in session.py. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Legacy-format guard: earlier fixture generations stored events.ts as
# parquet TIMESTAMP(NANOS), which Spark reads as long nanoseconds
# (spark.sql.legacy.parquet.nanosAsLong). Current fixtures use tz-naive
# timestamp[us] (handled below via the NTZ conf + cast); this ns→µs
# conversion stays armed in case a future regeneration reverts. Values
# are microsecond-aligned, so the conversion is lossless.
_NANOS_TS_COLS = {"events": ("ts",)}

# Schema inference reads the parquet footer through a one-task Spark
# job; with 57 registered queries each re-loading its tables that is
# dozens of needless driver→executor round trips per session (and the
# only "work" a query build performs). Cache the raw schema per
# (sf_dir, table) so every load after the first is pure planning.
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _path_mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy — no job runs until an action
    (after the first load of a table, whose footer read caches the
    schema)."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    # Defensive: the driver may hand us a session built without our
    # defaults; these SQL confs are runtime-settable. Fixture timestamps
    # are tz-naive parquet timestamp[us]; with NTZ inference on, Spark
    # reads them as TIMESTAMP_NTZ, which unix_micros() and Structured
    # Streaming watermarks reject. The session tz is pinned UTC
    # (session.py), so reading them as plain TIMESTAMP is value-preserving
    # and matches the DuckDB oracle's naive-timestamp reading.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Same defensive posture for the one optimizer rule that cripples
    # the explode-heavy pipelines: InferFiltersFromGenerate clones the
    # generator's child (the whole tokenize/winnow expression chain)
    # into a size(...)>0 filter that pushdown drags to the scan, where
    # it runs interpreted and single-threaded. Measured on a plain
    # driver session at sf0.01: winnow_near_dup_pairs 110 s with the
    # rule, 4 s without. Merge — never clobber — any rules already
    # excluded by the caller.
    _IFG = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    current_excluded = spark.conf.get("spark.sql.optimizer.excludedRules",
                                      None)
    if not current_excluded:
        spark.conf.set("spark.sql.optimizer.excludedRules", _IFG)
    elif _IFG not in current_excluded:
        spark.conf.set("spark.sql.optimizer.excludedRules",
                       f"{current_excluded},{_IFG}")
    path = f"{sf_dir}/{name}.parquet"
    # mtime in the key: regenerating a fixture at the same path within
    # one process must not force the STALE schema onto the new files
    # (a cached nanos-long ts schema applied to regenerated us files
    # would misread or error)
    key = (sf_dir, name, _path_mtime(path))
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        # evict superseded mtimes: keeps exactly ONE entry per
        # (sf_dir, name), so the cache can't grow across fixture
        # regenerations and table_schema can rely on uniqueness
        for stale in [k for k in _SCHEMA_CACHE
                      if k[0] == sf_dir and k[1] == name]:
            del _SCHEMA_CACHE[stale]
        _SCHEMA_CACHE[key] = df.schema
    for c in _NANOS_TS_COLS.get(name, ()):
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer `div`: float /1000 loses precision at epoch-ns scale
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    # Belt-and-braces: if NTZ columns slipped through anyway (e.g. a
    # schema cached before the conf applied), cast them. UTC session tz
    # makes the cast a relabel, not a value shift.
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def table_schema(spark: SparkSession, sf_dir: str,
                 name: str) -> T.StructType:
    """Scan schema of a fixture table from the session cache — at most
    one footer read per (sf_dir, table) per session (the same cache
    load_table fills). Streaming readers need an explicit schema; this
    keeps them from paying a fresh footer job per call."""
    key = (sf_dir, name, _path_mtime(f"{sf_dir}/{name}.parquet"))
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        load_table(spark, sf_dir, name)
        # don't recompute the key: if the fixture was rewritten between
        # our mtime probe and load_table's, the keys differ and a plain
        # _SCHEMA_CACHE[key] would KeyError. load_table's eviction
        # guarantees exactly one live entry per (sf_dir, name) — use it.
        cached = next(schema for (d, n, _m), schema in _SCHEMA_CACHE.items()
                      if d == sf_dir and n == name)
    return cached


def fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow source up to cluster parallelism.

    CPU-heavy per-row stages (shingling, hashing, LSH projections) are
    bounded by the scan's split count; a single-row-group parquet file
    (the fixtures) yields ONE split, serializing the map stage onto one
    of 32 cores. A round-robin repartition of the few needed columns is
    a trivially cheap shuffle next to the compute it parallelizes.

    At real scale this is a no-op: a 100 TB table scans as thousands of
    splits, which is ≥ the target, so no shuffle is inserted.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    files = df.inputFiles()
    # A plan with NO file-backed leaves (post-shuffle/derived — e.g.
    # an aggregate handed to cosine_topk_bruteforce as its corpus)
    # already gets its parallelism from spark.sql.shuffle.partitions,
    # and probing df.rdd on it EXECUTES the upstream shuffle stages
    # under AQE — a construction-time Spark job, which the registry
    # bans plan-shape-wide (tests/test_plan_shapes.py caught exactly
    # this when the brute-force corpus fanout landed). Leave it alone.
    if not files:
        return df
    # len(inputFiles) is cheap (a file-index lookup) but it is an UPPER
    # bound on split count for many-small-files directories — Spark
    # packs small files into shared FilePartitions, so 100 tiny files
    # can scan as ~4 splits. It is exact for the single-file fixtures
    # (the hot path, where the RDD compile's 0.5-1.5 s driver cost is
    # worth avoiding); for multi-file inputs fall through to the exact
    # df.rdd.getNumPartitions() so a packed scan still fans out (the
    # callers' inputs are narrow selects over file sources, where
    # .rdd compiles without executing anything).
    if len(files) == 1:
        current = 1
    else:
        current = df.rdd.getNumPartitions()
    if current < target:
        return df.repartition(target)
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata — an O(footer) read, no
    Spark job. The local stand-in for catalog statistics (what a real
    deployment reads from the metastore/Delta log): operators that size
    an index from the corpus cardinality (ANN nlist / LSH plane count)
    take it as a parameter so query construction never scans data.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; have {TABLES}")
    import pyarrow.parquet as pq
    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use.

    The analog of the reference's lazy per-use-case table registration
    (provider/DeduplicationProvider.kt:226-236, R7): names enter the
    catalog on demand, schema comes from the data.
    """
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def plant_clone_families(docs: DataFrame, n_families: int = 100,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Augment a documents table with deterministic near-duplicate
    clone FAMILIES, for quality-gate measurement (drive + pytest).

    The synthetic fixtures carry only ~25 organic near-dup pairs at
    the sf0.01 gate scale — a precision/recall gate over a truth set
    that small can barely fail, which is weak evidence for the
    MinHash/ensemble operators. This helper plants ``n_families``
    families (a hash-sampled base doc plus two token-dropped clones:
    every 8th token and every 9th token removed), yielding ~3
    verifiable pairs per family with 3-gram Jaccard comfortably above
    the 0.35 registry threshold but well below 1.0 — the regime the
    banding S-curve is supposed to catch. Everything derives from
    xxhash64 orderings and fixed drop strides: same corpus in, same
    clones out, any partitioning.

    Clone ids are NEGATIVE: clone s of base b gets id −(2·b + s + 1).
    Fixture doc ids are non-negative at every SF (the sf1 generator
    replicates docs at +10M/+20M/… id offsets, so any positive
    additive offset can COLLIDE with a real doc id — a duplicate
    doc_id with a different text silently corrupts both the truth
    join and the operator under test; measured as a spurious ±0.8%
    P/R flip at sf1 before this scheme). Negative ids are injective
    in (b, s) and disjoint from every corpus id by sign. Truth is
    NOT returned: the caller computes it with the exact Jaccard join
    over the augmented corpus, so the gate measures the operator
    against ground truth, never against this helper's intent.
    """
    base = (docs.withColumn("_h", F.xxhash64(F.col(id_col), F.lit(17)))
                .orderBy("_h", id_col).limit(n_families)
                .select(id_col, text_col))

    def dropped(stride: int, slot: int) -> DataFrame:
        toks = F.split(F.col(text_col), r"\s+")
        kept = F.filter(toks, lambda x, i: i % stride != 0)
        return base.select(
            (-(F.col(id_col) * 2 + slot + 1)).alias(id_col),
            F.array_join(kept, " ").alias(text_col))

    clones = dropped(8, 0).unionByName(dropped(9, 1))
    # keep only the two columns the similarity operators read; callers
    # needing other columns join them back from the original table
    return docs.select(id_col, text_col).unionByName(clones)
