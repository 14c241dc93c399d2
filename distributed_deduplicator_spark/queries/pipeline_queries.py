"""Corpus-curation pipeline queries over the documents fixture: the
passes between raw ingest and training shards (deterministic split,
benchmark decontamination, repetition filter, per-source cap,
stratified sample). Operators in operators/pipeline.py; every query
here is fully SQL-expressible, so each carries a DuckDB oracle.

Oracle notes: all selection decisions derive from md5 of the doc id's
decimal string — DuckDB and Spark md5 agree byte-for-byte, so splits,
caps, and samples are exactly reproducible across engines (the same
determinism discipline as the reference's content-derived ids,
DeduplicationProvider.kt:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import pipeline as P
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.sources import load_table

# DuckDB twin of functions.text.normalize → token array
_NORM_SQL = (r"string_split_regex(trim(regexp_replace(regexp_replace("
             r"lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')")

_TRAIN_FRAC = 0.9          # → md5-prefix cut at 0xe6 (230/256)
_DECON_NGRAM = 4
_BENCH_MOD = 97            # doc_id % 97 == 0 plays the benchmark set
_CAP = 50
_SAMPLE_FRAC = 0.1


@query("train_test_split_hash", oracle="""
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
            THEN 'train' ELSE 'test' END AS split
FROM documents
""")
def q_train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/10 train/test split by md5-prefix range —
    membership never churns as the corpus grows, the property that
    makes hash splits the standard for contamination-safe held-out
    sets. Pure per-row codegen, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return P.hash_split(d.select("doc_id", "lang"), "doc_id",
                        train_frac=_TRAIN_FRAC)


@query("benchmark_decontaminate", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
           AS shingle
  FROM (SELECT doc_id, t,
               unnest(range(greatest(len(t) - {_DECON_NGRAM - 1}, 0))) AS i
        FROM toks)),
bench AS (SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} = 0),
train AS (SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} <> 0),
hits AS (SELECT t.doc_id, t.shingle, b.doc_id AS bench_id
         FROM train t JOIN bench b USING (shingle))
SELECT doc_id,
       count(DISTINCT shingle) AS n_shared_shingles,
       count(DISTINCT bench_id) AS n_bench_docs
FROM hits GROUP BY doc_id
""")
def q_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing any 4-gram with
    the (small) benchmark subset, with shared-shingle and hit-doc
    counts — the pre-training pass that keeps eval data out of the
    corpus. Benchmark shingles broadcast; the corpus side streams
    map-side and only hits shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bench_ids = (d.where(F.col("doc_id") % _BENCH_MOD == 0)
                  .select("doc_id"))
    out = P.ngram_decontaminate(d, bench_ids, "doc_id", "text",
                                n=_DECON_NGRAM)
    return out.withColumnRenamed("id", "doc_id")


@query("repetition_filter", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks WHERE len(t) > 0),
counts AS (SELECT doc_id, w, count(*) AS n FROM tok GROUP BY doc_id, w),
agg AS (SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               max(n) AS top_n
        FROM counts GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct,
       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
       round(CAST(top_n AS DOUBLE) / n_tokens, 6) AS top_token_ratio,
       (CAST(n_distinct AS DOUBLE) / n_tokens >= 0.5
        AND CAST(top_n AS DOUBLE) / n_tokens <= 0.15) AS keep
FROM agg
""")
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition profile: distinct-token ratio and
    top-token mass per doc with a keep flag — drops keyword-stuffed /
    degenerate text before dedup ever runs. Two map-side-combinable
    aggregations — only distinct (doc, token) rows, then one row per
    doc, ever cross the wire."""
    d = load_table(spark, sf_dir, "documents")
    return (P.repetition_stats(d, "doc_id", "text",
                               min_distinct_ratio=0.5,
                               max_top_token_ratio=0.15)
             .withColumnRenamed("id", "doc_id"))


@query("source_cap_sample", oracle=f"""
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents)
WHERE rk <= {_CAP}
""")
def q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap: at most 50 docs per source, chosen by
    deterministic hash order (a uniform sample of the source, not its
    head) — the anti-domination pass for crawl mixes. One window."""
    d = load_table(spark, sf_dir, "documents")
    return P.cap_per_group(d.select("doc_id", "source"),
                           "source", "doc_id", cap=_CAP)


@query("stratified_sample_lang", oracle=f"""
SELECT doc_id, lang, rk, n_stratum FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk,
         count(*) OVER (PARTITION BY lang) AS n_stratum
  FROM documents)
WHERE rk <= ceil({_SAMPLE_FRAC} * n_stratum)
""")
def q_stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10% per-language sample (ceil(frac·|stratum|) rows, hash
    order) — deterministic and exact-count per stratum, unlike
    Bernoulli sampleBy. Count and rank share one window partitioning."""
    d = load_table(spark, sf_dir, "documents")
    return P.stratified_sample(d.select("doc_id", "lang"),
                               "lang", "doc_id", frac=_SAMPLE_FRAC)
