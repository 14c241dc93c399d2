"""Corpus-curation pipeline queries over the documents fixture: the
passes between raw ingest and training shards (deterministic split,
benchmark decontamination, repetition filter, per-source cap,
stratified sample). Operators in operators/pipeline.py; every query
here except `decontaminate_bloom` (probabilistic structure, gated by
a superset/accuracy property test instead) carries a DuckDB oracle.

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
_PACK_BUDGET = 2048
_PACK_SHARDS = 16
_CHUNK_TOKENS = 20

# DuckDB twin of functions.text.token_count (len of the token array)
_NTOK_SQL = f"len({_NORM_SQL})"


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


@query("token_budget_pack", oracle=f"""
WITH base AS (
  SELECT doc_id AS id,
         CAST({_NTOK_SQL} AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
sharded AS (
  SELECT id, n_tokens, h,
         CAST(CAST(('0x' || substr(h, 1, 4)) AS BIGINT)
              % {_PACK_SHARDS} AS INTEGER) AS shard
  FROM base),
packed AS (
  SELECT id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_tokens
  FROM sharded)
SELECT id, shard, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE)
                  / {_PACK_BUDGET}) AS BIGINT) AS bin_id
FROM packed
""")
def q_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget packing into training-shard bins: docs in
    deterministic md5 order, 16 independent hash shards (no global
    serial cumsum), bin advances every 2048 tokens. The manifest pass
    between a curated corpus and packed training sequences."""
    d = load_table(spark, sf_dir, "documents")
    return P.token_budget_pack(d, "doc_id", "text",
                               budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)


@query("corpus_mix_weights", oracle=f"""
WITH per AS (
  SELECT lang AS grp, count(*) AS n_docs,
         CAST(sum({_NTOK_SQL}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang)
SELECT grp, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) /
             CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
       round(least(1.0,
             (1.0 / CAST(count(*) OVER () AS DOUBLE)) /
             (CAST(n_tokens AS DOUBLE) /
              CAST(sum(n_tokens) OVER () AS DOUBLE))), 6) AS weight
FROM per
""")
def q_corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalancing weights per language: token mass, share of
    corpus, and the per-doc sampling weight that flattens the mix to
    equal token share. One combinable corpus aggregation; the window
    math runs on |langs| rows."""
    d = load_table(spark, sf_dir, "documents")
    return P.mix_weights(d, "lang", "text")


@query("chunk_dedup_stats", oracle=f"""
WITH toks AS (SELECT doc_id AS id, {_NORM_SQL} AS t FROM documents),
tok AS (
  SELECT id, i, t[i+1] AS w,
         CAST(i // {_CHUNK_TOKENS} AS INTEGER) AS chunk_idx
  FROM (SELECT id, t, unnest(range(len(t))) AS i FROM toks
        WHERE len(t) > 0)),
chunks AS (
  SELECT id, chunk_idx,
         md5(string_agg(w, ' ' ORDER BY i)) AS h
  FROM tok GROUP BY id, chunk_idx),
flagged AS (
  SELECT id, chunk_idx,
         row_number() OVER (PARTITION BY h ORDER BY id, chunk_idx) > 1
           AS dup
  FROM chunks)
SELECT id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       round(CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_ratio
FROM flagged GROUP BY id
""")
def q_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (the line/paragraph-level CCNet pass
    over fixed 20-token chunks): chunk fingerprints, corpus-wide
    first-wins per fingerprint, per-doc duplicate-chunk profile. Only
    (doc, md5) pairs shuffle — never chunk text."""
    d = load_table(spark, sf_dir, "documents")
    return P.chunk_exact_dedup(d, "doc_id", "text",
                               chunk_tokens=_CHUNK_TOKENS)


@query("stratified_sample_lang", oracle=f"""
SELECT doc_id, lang, rk, n_stratum FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk,
         count(*) OVER (PARTITION BY lang) AS n_stratum
  FROM documents)
WHERE rk <= ceil({_SAMPLE_FRAC} * n_stratum - 1e-9)
""")
def q_stratified_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10% per-language sample (ceil(frac·|stratum|) rows, hash
    order) — deterministic and exact-count per stratum, unlike
    Bernoulli sampleBy. Count and rank share one window partitioning."""
    d = load_table(spark, sf_dir, "documents")
    return P.stratified_sample(d.select("doc_id", "lang"),
                               "lang", "doc_id", frac=_SAMPLE_FRAC)


_CHUNK_W = 32   # window tokens
_CHUNK_S = 24   # stride tokens (overlap = 8)


@query("chunk_sliding_windows", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
p AS (
  SELECT doc_id, t, len(t) AS n,
         CASE WHEN len(t) <= {_CHUNK_W} THEN 1
              ELSE 1 + CAST(ceil((len(t) - {_CHUNK_W}) / {_CHUNK_S}.0)
                            AS BIGINT) END AS n_chunks
  FROM toks)
SELECT doc_id, i AS chunk_idx,
       array_to_string(t[i*{_CHUNK_S} + 1 :
                         least(i*{_CHUNK_S} + {_CHUNK_W}, n)], ' ')
         AS chunk_text,
       CAST(least({_CHUNK_W}, n - i*{_CHUNK_S}) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, t, n, unnest(range(n_chunks)) AS i FROM p)
""")
def q_chunk_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (window 32 tokens, stride
    24) — the RAG / context-window packing splitter, complementing the
    non-overlapping dedup chunker (chunk_exact_dedup): every token
    belongs to ≥1 chunk, consecutive chunks share an 8-token overlap,
    and the final partial chunk is kept. Chunk count and boundaries
    are exact integer arithmetic, identical in both engines.

    Scale shape: ZERO shuffles — tokenize, chunk-count, slice and
    re-join are all array-local JVM expressions; output size is
    ~n_tokens/stride rows per doc, produced by one explode in the same
    stage as the scan."""
    from distributed_deduplicator_spark.functions import text as TXT
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TXT.tokens("text").alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.when(
        n <= _CHUNK_W, F.lit(1).cast("bigint")
    ).otherwise(
        (F.lit(1) + F.ceil((n - F.lit(_CHUNK_W))
                           / F.lit(float(_CHUNK_S)))).cast("bigint"))
    chunks = F.expr(
        "transform(sequence(0, n_chunks - 1), "
        "i -> struct(i AS chunk_idx, "
        f"concat_ws(' ', slice(_toks, i*{_CHUNK_S} + 1, {_CHUNK_W})) "
        "AS chunk_text, "
        f"least({_CHUNK_W}, size(_toks) - i*{_CHUNK_S}) AS n_tokens))")
    g = (t.withColumn("n_chunks", n_chunks)
          .select("doc_id", F.explode(chunks).alias("c")))
    return g.select(
        "doc_id",
        F.col("c.chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").cast("bigint").alias("n_tokens"))


@query("cross_source_overlap", oracle=rf"""
WITH toks AS (SELECT source, {_NORM_SQL} AS t FROM documents),
grams AS (
  SELECT DISTINCT source,
         t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
           AS shingle
  FROM (SELECT source, t,
               unnest(range(greatest(len(t) - {_DECON_NGRAM - 1}, 0)))
                 AS i
        FROM toks)),
per AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
pair AS (SELECT a.source AS source_a, b.source AS source_b,
                count(*) AS shared_shingles
         FROM grams a
         JOIN grams b ON a.shingle = b.shingle AND a.source < b.source
         GROUP BY 1, 2)
SELECT source_a, source_b, shared_shingles, pa.n AS n_a, pb.n AS n_b,
       round(CAST(shared_shingles AS DOUBLE)
             / (pa.n + pb.n - shared_shingles), 6) AS jaccard,
       round(CAST(shared_shingles AS DOUBLE) / least(pa.n, pb.n), 6)
         AS containment
FROM pair
JOIN per pa ON source_a = pa.source
JOIN per pb ON source_b = pb.source
""")
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: distinct shared 4-grams,
    Jaccard and containment for every source pair — tells the curation
    pipeline which crawls/dumps duplicate each other before a full
    near-dup pass runs on the union. Counts are exact integers; the
    two ratios are single IEEE divisions over identical integer inputs,
    rounded identically in both engines. Plan: one distinct shuffle on
    (source, shingle), one shingle equi-join (k sources sharing a
    shingle emit k·(k-1)/2 rows — bounded by |sources|², never
    |docs|²), then |sources|²-row joins against broadcast totals."""
    d = load_table(spark, sf_dir, "documents")
    return P.source_overlap_matrix(d, "source", "text", n=_DECON_NGRAM)


@query("corpus_filter_funnel", oracle=f"""
WITH s AS (
  SELECT n_chars, {_NORM_SQL} AS t FROM documents),
f AS (
  SELECT n_chars >= 100 AS len_ok,
         len(t) >= 20 AS tok_ok,
         len(list_distinct(t)) * 5 >= len(t) * 2 AS distinct_ok,
         list_aggregate(list_transform(t, x -> len(x)), 'sum') * 10
           BETWEEN len(t) * 40 AND len(t) * 50 AS meanlen_ok
  FROM s),
agg AS (
  SELECT count(*) AS c0,
         count(*) FILTER (len_ok) AS c1,
         count(*) FILTER (len_ok AND tok_ok) AS c2,
         count(*) FILTER (len_ok AND tok_ok AND distinct_ok) AS c3,
         count(*) FILTER (len_ok AND tok_ok AND distinct_ok
                          AND meanlen_ok) AS c4
  FROM f)
SELECT 1 AS stage_idx, 'min_chars' AS stage, c1 AS survivors,
       c0 - c1 AS dropped FROM agg
UNION ALL SELECT 2, 'min_tokens', c2, c1 - c2 FROM agg
UNION ALL SELECT 3, 'distinct_ratio', c3, c2 - c3 FROM agg
UNION ALL SELECT 4, 'mean_word_len', c4, c3 - c4 FROM agg
""")
def q_corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/FineWeb-style quality-filter funnel: cumulative survivor and
    per-stage drop counts through four heuristic gates (min chars →
    min tokens → distinct-token ratio ≥ 0.4 → mean word length in
    [4.0, 5.0]). Every gate is an integer cross-multiplication — no
    float thresholds — so the funnel is bit-identical in both engines.
    One scan + a 1-row aggregate regardless of corpus size."""
    from distributed_deduplicator_spark.functions import text as TXT
    d = load_table(spark, sf_dir, "documents")
    toks = F.col("_toks")
    # BIGINT seed: an INT accumulator overflows past 2^31 characters
    # per doc (ANSI mode aborts; the DuckDB oracle's list_sum is
    # 128-bit) — same 0L discipline as blocklist_scrub_stats
    charsum = F.aggregate(toks, F.lit(0).cast("bigint"),
                          lambda acc, x: acc + F.length(x))
    base = d.select(
        "n_chars", TXT.tokens("text").alias("_toks"))
    base = base.select(
        (F.col("n_chars") >= 100).alias("len_ok"),
        (F.size(toks) >= 20).alias("tok_ok"),
        (F.size(F.array_distinct(toks)) * 5 >= F.size(toks) * 2)
        .alias("distinct_ok"),
        ((charsum * 10 >= F.size(toks) * 40)
         & (charsum * 10 <= F.size(toks) * 50)).alias("meanlen_ok"))
    return P.quality_funnel(base, [
        ("min_chars", F.col("len_ok")),
        ("min_tokens", F.col("tok_ok")),
        ("distinct_ratio", F.col("distinct_ok")),
        ("mean_word_len", F.col("meanlen_ok")),
    ])


@query("decontaminate_bloom")
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination (rows-only by contract:
    the xxhash64 bit layout has no DuckDB twin; the gate is
    `tests/test_pipeline.py::test_bloom_decontaminate_no_false_negatives`,
    which proves the flagged set is a superset of the exact operator's
    with a bounded false-positive margin). Same semantics surface as
    `benchmark_decontaminate`, but the benchmark structure the corpus
    probes is a FIXED 512 KB bitmap however many eval suites are
    unioned in — the O(1)-memory form of the decontamination pass.
    The bitmap is built distributively (bit_or over 64-bit words), so
    query construction still launches zero jobs."""
    d = load_table(spark, sf_dir, "documents")
    bench_ids = (d.where(F.col("doc_id") % _BENCH_MOD == 0)
                  .select("doc_id"))
    out = P.bloom_ngram_decontaminate(d, bench_ids, "doc_id", "text",
                                      n=_DECON_NGRAM)
    return out.withColumnRenamed("id", "doc_id")


@query("unigram_lm_quality", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
tok AS (SELECT doc_id, u.w AS w FROM toks, unnest(toks.t) AS u(w)
        WHERE len(t) > 0),
vocab AS (SELECT w, count(*) AS cw FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_total FROM vocab)
SELECT doc_id,
       count(*) AS n_toks,
       CAST(sum(cw) AS BIGINT) AS sum_freq,
       CAST(sum(cw) AS DOUBLE)
         / (CAST(count(*) AS DOUBLE) * CAST(any_value(n_total) AS DOUBLE))
         AS avg_prob
FROM tok JOIN vocab USING (w) CROSS JOIN tot
GROUP BY doc_id
""")
def q_unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy, log-free: score each document by
    the mean corpus-unigram probability of its tokens (sum of exact
    integer corpus counts over n_toks x N_total as ONE fixed-order
    double expression — a log-perplexity would hang the cross-engine
    hash on libm ULP differences while ranking documents identically,
    monotonicity aside). Low avg_prob = rare-token-heavy doc
    (OCR noise, code, IDs); high = common-token boilerplate — the
    cheap single-pass stand-in for the KenLM filter in CCNet
    (Wenzek et al. 2020, arXiv:1911.00359).

    Plan: one combinable vocabulary count, the token->count join runs
    on the token key (auto-broadcast while the vocab fits, hash join
    beyond), the 1-row total broadcasts, and the per-doc rollup sums
    exact integers — three shuffles total, all on combinable aggs."""
    from distributed_deduplicator_spark.functions import text as TXT
    d = load_table(spark, sf_dir, "documents")
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    tok = (d.select("doc_id", TXT.tokens("text").alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("doc_id", F.explode("_toks").alias("w")))
    # Collapse the occurrence stream to per-(doc, token) counts once;
    # vocab, totals and the rollup all derive from the persisted
    # subtree (lazy persist — construction stays job-free).
    dw = _tracked_persist(
        tok.groupBy("doc_id", "w").agg(F.count("*").alias("c")))
    vocab = dw.groupBy("w").agg(F.sum("c").alias("cw"))
    tot = vocab.agg(F.sum("cw").alias("n_total"))
    c = F.col("c")
    return (dw.join(vocab, "w")
              .crossJoin(F.broadcast(tot))
              .groupBy("doc_id")
              .agg(F.sum(c).alias("n_toks"),
                   F.sum(c * F.col("cw")).alias("sum_freq"),
                   (F.sum(c * F.col("cw")).cast("double")
                    / (F.sum(c).cast("double")
                       * F.first("n_total").cast("double")))
                   .alias("avg_prob")))


_MAD_K = 3.0

@query("length_outlier_mad", oracle=f"""
WITH med AS (
  SELECT lang, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
  FROM documents GROUP BY lang),
dev AS (
  SELECT d.doc_id, d.lang, d.n_chars,
         abs(CAST(d.n_chars AS DOUBLE) - m.med) AS dev
  FROM documents d JOIN med m ON d.lang = m.lang),
mad AS (
  SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY lang)
SELECT dev.doc_id, dev.lang, dev.n_chars, dev.dev, mad.mad,
       dev.dev > {_MAD_K} * mad.mad AS is_outlier
FROM dev JOIN mad ON dev.lang = mad.lang
""")
def q_length_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length outliers via median absolute
    deviation — the outlier gate that survives the heavy tails a
    mean/stddev z-score drowns in (one 10 MB doc drags the mean; the
    median doesn't move). Flags docs whose absolute deviation exceeds
    3x the language's MAD. All arithmetic is exact interpolation on
    integers (medians of ints are dyadic rationals; abs/compare are
    exact), so the cross-engine hash holds without rounding.

    Plan: two tiny per-language exact percentiles (|langs| groups; the
    per-group value list is the documented exact-percentile cost — at
    100 TB swap in approx_percentile's t-digest like
    `text_length_quantiles`), each joined back as an auto-broadcast
    |langs|-row table; everything else is a map."""
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").alias("med"))
    dev = (d.join(F.broadcast(med), "lang")
            .select("doc_id", "lang", "n_chars",
                    F.abs(F.col("n_chars").cast("double") - F.col("med"))
                     .alias("dev")))
    mad = dev.groupBy("lang").agg(
        F.expr("percentile(dev, 0.5)").alias("mad"))
    return (dev.join(F.broadcast(mad), "lang")
               .select("doc_id", "lang", "n_chars", "dev", "mad",
                       (F.col("dev") > _MAD_K * F.col("mad"))
                       .alias("is_outlier")))


_DSIR_TARGET_LANG = "en"   # target distribution = the English slice
_DSIR_BUCKETS = 256        # hashed-feature space: md5-prefix buckets

@query("dsir_importance_weights", oracle=rf"""
WITH toks AS (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents),
tok AS (SELECT doc_id, lang, substr(md5(u.w), 1, 2) AS b
        FROM toks, unnest(toks.t) AS u(w) WHERE len(t) > 0),
stats AS (SELECT b,
                 count(*) AS raw_c,
                 count(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}')
                   AS tgt_c
          FROM tok GROUP BY b),
tot AS (SELECT CAST(sum(raw_c) AS BIGINT) AS n_raw,
               CAST(sum(tgt_c) AS BIGINT) AS n_tgt FROM stats)
SELECT doc_id,
       count(*) AS n_toks,
       CAST(sum(tgt_c + 1) AS BIGINT) AS tgt_mass,
       CAST(sum(raw_c + 1) AS BIGINT) AS raw_mass,
       (CAST(sum(tgt_c + 1) AS DOUBLE)
        * (CAST(any_value(n_raw) AS DOUBLE) + {_DSIR_BUCKETS}.0))
       / (CAST(sum(raw_c + 1) AS DOUBLE)
          * (CAST(any_value(n_tgt) AS DOUBLE) + {_DSIR_BUCKETS}.0))
         AS dsir_weight
FROM tok JOIN stats USING (b) CROSS JOIN tot
GROUP BY doc_id
""")
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    arXiv:2302.03169), log-free: score every document by how much more
    likely its hashed-unigram mass is under the TARGET distribution
    (here the `lang='en'` slice) than under the raw corpus. Features
    are md5-prefix buckets (256 of them — the hashed-ngram trick that
    makes DSIR O(1)-state however large the vocabulary); per-bucket
    add-one smoothing; the weight is the ratio of mean smoothed target
    probability to mean smoothed raw probability, computed as ONE
    fixed-order double expression over exact integer masses so the
    cross-engine value hash holds (same discipline as
    `unigram_lm_quality` — a log-sum would hang on libm ULP skew
    while ranking documents identically).

    Plan: one combinable 256-group count pair, the bucket-stats table
    auto-broadcasts to the token stream (256 rows), the 1-row totals
    broadcast, and the per-doc rollup sums exact integers — the only
    data-sized shuffles are the bucket count and the doc rollup, both
    map-side combinable. At 100 TB the bucket table is STILL 256 rows:
    the whole selection pass is two combinable aggregations."""
    from distributed_deduplicator_spark.functions import text as TXT
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    d = load_table(spark, sf_dir, "documents")
    tok = (d.select("doc_id", "lang", TXT.tokens("text").alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("doc_id", "lang", F.explode("_toks").alias("w"))
            .select("doc_id", "lang", TXT.dsir_bucket("w").alias("b")))
    # One pass over the token stream: (doc, bucket) occurrence counts.
    # Both the 256-row bucket stats AND the per-doc rollup derive from
    # this subtree, so persist it (lazy — construction stays job-free;
    # the registry hook / bench release it after the action).
    db = _tracked_persist(
        tok.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("c")))
    stats = db.groupBy("b").agg(
        F.sum("c").alias("raw_c"),
        F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("c"))
               .otherwise(F.lit(0))).alias("tgt_c"))
    tot = stats.agg(F.sum("raw_c").alias("n_raw"),
                    F.sum("tgt_c").alias("n_tgt"))
    buckets = F.lit(float(_DSIR_BUCKETS))
    c = F.col("c")
    return (db.join(F.broadcast(stats), "b")
              .crossJoin(F.broadcast(tot))
              .groupBy("doc_id")
              .agg(F.sum(c).alias("n_toks"),
                   F.sum(c * (F.col("tgt_c") + 1)).alias("tgt_mass"),
                   F.sum(c * (F.col("raw_c") + 1)).alias("raw_mass"),
                   ((F.sum(c * (F.col("tgt_c") + 1)).cast("double")
                     * (F.first("n_raw").cast("double") + buckets))
                    / (F.sum(c * (F.col("raw_c") + 1)).cast("double")
                       * (F.first("n_tgt").cast("double") + buckets)))
                   .alias("dsir_weight")))


_BLOCKLIST = ("slow", "dup", "the", "stale")
_BLOCK_MAX_PCT = 5          # keep while blocked tokens <= 5% of tokens
_BLOCK_IN = "(" + ", ".join(f"'{w}'" for w in _BLOCKLIST) + ")"

@query("blocklist_scrub_stats", oracle=rf"""
WITH toks AS (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents),
s AS (SELECT doc_id, lang,
             len(t) AS n_toks,
             len(list_filter(t, w -> w IN {_BLOCK_IN})) AS n_blocked,
             COALESCE(list_sum(list_transform(
                 list_filter(t, w -> w NOT IN {_BLOCK_IN}),
                 w -> len(w))), 0) AS kept_chars
      FROM toks)
SELECT doc_id, lang,
       CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_blocked AS BIGINT) AS n_blocked,
       CAST(n_blocked AS DOUBLE) / CAST(n_toks AS DOUBLE) AS blocked_frac,
       n_blocked * 100 <= n_toks * {_BLOCK_MAX_PCT} AS keep,
       CAST(kept_chars AS BIGINT) AS kept_chars
FROM s
""")
def q_blocklist_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style lexicon scrub (Raffel et al. 2020, arXiv:1910.10683
    §2.2 'bad words' pass): per document, how many normalized tokens
    hit the blocklist, the blocked fraction, the keep/drop verdict at
    the 5% gate, and the character mass that survives scrubbing —
    everything downstream sharding needs to budget post-scrub bytes.
    All counting is exact integers; the single double is one division.

    Plan: zero shuffles — the blocklist is a literal IN-set inside
    array higher-order functions (filter/aggregate), so the whole pass
    is per-row whole-stage codegen over the scan. A 100k-term lexicon
    version swaps the IN-set for a broadcast semi-join on the exploded
    token stream (one combinable rollup back to doc grain); the
    4-term literal here keeps the hot path UDF- and shuffle-free."""
    from distributed_deduplicator_spark.functions import text as TXT
    d = load_table(spark, sf_dir, "documents")
    kept = f"filter(_toks, w -> NOT (w IN {_BLOCK_IN}))"
    return (d.select("doc_id", "lang", TXT.tokens("text").alias("_toks"))
             .select(
                 "doc_id", "lang",
                 F.size("_toks").cast("bigint").alias("n_toks"),
                 F.size(F.expr(f"filter(_toks, w -> w IN {_BLOCK_IN})"))
                  .cast("bigint").alias("n_blocked"),
                 F.expr(f"aggregate({kept}, 0L, "
                        "(acc, w) -> acc + length(w))").alias("kept_chars"))
             .select("doc_id", "lang", "n_toks", "n_blocked",
                     (F.col("n_blocked").cast("double")
                      / F.col("n_toks").cast("double")).alias("blocked_frac"),
                     (F.col("n_blocked") * 100
                      <= F.col("n_toks") * _BLOCK_MAX_PCT).alias("keep"),
                     "kept_chars"))


@query("bigram_lm_quality", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
big AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
              FROM toks WHERE len(t) >= 2)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
v AS (SELECT count(DISTINCT w2) AS v FROM big)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(c12 + 1) AS BIGINT) AS num_mass,
       CAST(sum(c1 + v) AS BIGINT) AS den_mass,
       CAST(sum(c12 + 1) AS DOUBLE) / CAST(sum(c1 + v) AS DOUBLE)
         AS bigram_score
FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY b.doc_id
""")
def q_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score — the second-order upgrade of
    `unigram_lm_quality` and the cheap stand-in for CCNet's KenLM
    perplexity filter (Wenzek et al. 2020, arXiv:1911.00359): score
    each document by the mean add-one-smoothed conditional bigram
    probability of its token stream, p(w2|w1) = (c12+1)/(c1+V),
    computed ratio-of-sums over exact integer masses (num = sum of
    smoothed bigram counts, den = sum of smoothed left-context
    counts) with ONE double division at the boundary — order-free, so
    the cross-engine hash holds. Low score = token transitions the
    corpus has never seen (shuffled text, boilerplate keyword stuffing
    reads HIGH on unigrams but LOW here — exactly the gap the
    second-order model closes).

    Plan: two combinable count tables (bigram, left-context), each
    joined back on its token key (hash join, auto-broadcast while
    small), a 1-row distinct-vocab broadcast, and a per-doc exact
    integer rollup — four shuffles, all map-side combinable, nothing
    driver-side."""
    from distributed_deduplicator_spark.functions import text as TXT
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    d = load_table(spark, sf_dir, "documents")
    t = (d.select("doc_id", TXT.tokens("text").alias("_toks"))
          .where(F.size("_toks") >= 2))
    pairs = F.expr("transform(sequence(1, size(_toks) - 1), "
                   "i -> named_struct('w1', element_at(_toks, i), "
                   "'w2', element_at(_toks, i + 1)))")
    big = (t.select("doc_id", F.explode(pairs).alias("p"))
            .select("doc_id", F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2")))
    # One shuffle over the occurrence stream: per-(doc, bigram) counts.
    # c12 / c1 / V and the final rollup ALL derive from this subtree —
    # persist it (lazy) instead of re-tokenizing the corpus four times.
    d12 = _tracked_persist(
        big.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m")))
    c12 = d12.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = c12.agg(F.countDistinct("w2").alias("v"))
    m = F.col("m")
    return (d12.join(c12, ["w1", "w2"]).join(c1, ["w1"])
               .crossJoin(F.broadcast(v))
               .groupBy("doc_id")
               .agg(F.sum(m).alias("n_bigrams"),
                    F.sum(m * (F.col("c12") + 1)).alias("num_mass"),
                    F.sum(m * (F.col("c1") + F.col("v"))).alias("den_mass"),
                    (F.sum(m * (F.col("c12") + 1)).cast("double")
                     / F.sum(m * (F.col("c1") + F.col("v"))).cast("double"))
                    .alias("bigram_score")))


@query("source_token_drift", oracle=rf"""
WITH toks AS (SELECT source, {_NORM_SQL} AS t FROM documents),
tok AS (SELECT source, substr(md5(u.w), 1, 2) AS b
        FROM toks, unnest(toks.t) AS u(w) WHERE len(t) > 0),
sb AS (SELECT source, b, count(*) AS n_sb FROM tok GROUP BY source, b),
gb AS (SELECT b, CAST(sum(n_sb) AS BIGINT) AS n_gb FROM sb GROUP BY b),
ns AS (SELECT source, CAST(sum(n_sb) AS BIGINT) AS n_src
       FROM sb GROUP BY source),
tot AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n_total FROM gb),
j AS (SELECT sb.source, sb.n_sb, gb.n_gb, ns.n_src, tot.n_total
      FROM sb JOIN gb USING (b) JOIN ns USING (source) CROSS JOIN tot),
per AS (SELECT source, n_src, n_total,
               CAST(sum(abs(n_sb * n_total - n_gb * n_src)) AS BIGINT)
                 AS s_abs,
               CAST(sum(n_gb) AS BIGINT) AS t_glob,
               count(*) AS n_buckets
        FROM j GROUP BY source, n_src, n_total)
SELECT source, n_src, n_buckets,
       0.5 * (CAST(s_abs AS DOUBLE) / CAST(n_src * n_total AS DOUBLE)
              + 1.0 - CAST(t_glob AS DOUBLE) / CAST(n_total AS DOUBLE))
         AS tv_drift
FROM per
""")
def q_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source domain-shift profile: total-variation distance between
    each source's hashed-unigram distribution and the whole-corpus one —
    the number a data-mixing pipeline watches per ingest source (a
    source whose token distribution drifts from the corpus is a
    vocabulary shift, a language leak, or an upstream format break; the
    same role the day-histogram TV plays for event streams in
    `value_drift_by_day`, here over token content).

    Features are the DSIR md5-prefix buckets (256 of them), so the
    per-source histogram is FIXED-WIDTH at any vocabulary size — the
    whole comparison state is ≤ sources × 256 rows however large the
    corpus. TV uses the grid-free exact-integer form proved in
    `value_drift_by_day`: Σ runs only over buckets the source actually
    has, on |n_sb·N − n_gb·N_s| BIGINT cross-products, with the
    1 − Σ p_glob remainder for absent buckets; one fixed-order double
    expression at the end keeps the cross-engine value hash. (BIGINT
    products cap at ~3e9 tokens/source × 3e9 total; past that, scale
    the bucket histogram to per-source doubles and round.)

    Plan: one corpus-scale combinable (source, bucket) count; every
    later stage re-aggregates that tiny persisted table; margins
    broadcast. Nothing downstream of the first aggregate scales with
    corpus size."""
    from distributed_deduplicator_spark.functions import text as TXT
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    d = load_table(spark, sf_dir, "documents")
    from distributed_deduplicator_spark.operators.relational import (
        tv_drift_profile)
    tok = (d.select("source", TXT.tokens("text").alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("source", F.explode("_toks").alias("w"))
            .select("source", TXT.dsir_bucket("w").alias("b")))
    sb = _tracked_persist(
        tok.groupBy("source", "b").agg(F.count("*").alias("n_sb")))
    return (tv_drift_profile(sb, "source", "b", "n_sb")
            .select("source", F.col("n_group").alias("n_src"),
                    "n_buckets", "tv_drift"))


_CURRICULUM_PHASES = 10

# DuckDB twin of functions.text.quality_score (the text_quality_filter
# oracle expression, shared verbatim so both queries grade identically)
_QUALITY_SQL = rf"""(CASE WHEN length(text) BETWEEN 100 AND 20000
        THEN 1.0 ELSE 0.0 END
      + least(CAST(len({_NORM_SQL}) AS DOUBLE) / 100.0, 1.0)
      + CASE WHEN CAST(length(text) AS DOUBLE) / (len({_NORM_SQL}) + 1)
             BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END) / 3.0"""


@query("curriculum_quality_bins", oracle=rf"""
WITH q AS (
  SELECT doc_id, round({_QUALITY_SQL}, 6) AS q,
         len({_NORM_SQL}) AS n_tok
  FROM documents),
r AS (
  SELECT q, n_tok,
         row_number() OVER (ORDER BY q, doc_id) AS rnk,
         count(*) OVER () AS total
  FROM q)
SELECT CAST(((rnk - 1) * {_CURRICULUM_PHASES}) // total AS BIGINT) AS phase,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_total,
       round(min(q), 6) AS min_quality,
       round(max(q), 6) AS max_quality
FROM r GROUP BY phase
""")
def q_curriculum_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: rank every document by its quality
    score and cut the ranking into 10 equal-population phases (phase 0 =
    lowest-quality tenth … phase 9 = highest) with each phase's doc
    count, token budget, and quality band — the schedule a
    quality-curriculum training run feeds from (start on the broad
    low phases, anneal onto the high ones), and the per-phase token
    budgets are exactly what the mixture planner needs.

    The global rank is computed WITHOUT a single-partition sort of the
    corpus: quality scores are heavily discretized (two indicator terms
    plus a capped integer/100 term), so a per-score count table is tiny.
    Rank = (cumulative count of strictly-lower scores, a window over
    that tiny table) + (row_number within this doc's score group, a
    window partitioned by score — distributed across executors). The
    phase cut `((rank-1)·10) div total` is exact integer arithmetic,
    identical in both engines; ties order by doc_id, so the rank is a
    total order and the phase assignment is deterministic.

    Plan: one scan computes (score, n_tok) per doc; one combinable
    count on the score key; two windows over the ≤|distinct scores|
    table; one broadcast join back; one combinable 10-group rollup.
    Nothing after the scan shuffles the corpus more than once."""
    from distributed_deduplicator_spark.functions import text as TXT
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    q = d.select("doc_id",
                 F.round(TXT.quality_score("text"), 6).alias("q"),
                 TXT.token_count("text").cast("bigint").alias("n_tok"))
    grp = q.groupBy("q").agg(F.count("*").alias("n"))
    w_cum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    offs = grp.select("q",
                      (F.sum("n").over(w_cum) - F.col("n")).alias("offset"),
                      F.sum("n").over(w_all).alias("total"))
    w_q = Window.partitionBy("q").orderBy("doc_id")
    ranked = (q.join(F.broadcast(offs), "q")
               .withColumn("rnk",
                           F.col("offset") + F.row_number().over(w_q)))
    # integer floor-div (both operands non-negative), exact in both
    # engines — never a double divide-then-truncate
    phase = F.expr(
        f"CAST((rnk - 1) * {_CURRICULUM_PHASES} DIV total AS BIGINT)")
    return (ranked.withColumn("phase", phase)
                  .groupBy("phase")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_tok").alias("tok_total"),
                       F.round(F.min("q"), 6).alias("min_quality"),
                       F.round(F.max("q"), 6).alias("max_quality")))


@query("pareto_quality_front", oracle=rf"""
WITH toks AS (SELECT doc_id, source, {_NORM_SQL} AS t FROM documents),
m AS (SELECT doc_id, source,
             CAST(len(t) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
      FROM toks WHERE len(t) > 0),
r AS (SELECT doc_id, source, n_tok,
             n_distinct / n_tok AS distinct_ratio, n_distinct
      FROM m)
SELECT doc_id, source, n_tok, distinct_ratio
FROM r
WHERE NOT EXISTS (
  SELECT 1 FROM r s
  WHERE s.source = r.source
    AND s.n_tok >= r.n_tok
    AND s.distinct_ratio >= r.distinct_ratio
    AND (s.n_tok > r.n_tok OR s.distinct_ratio > r.distinct_ratio))
""")
def q_pareto_quality_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Pareto front of documents maximizing BOTH length
    (n_tok) and lexical quality (distinct-token ratio) — the
    dominance-based selection cut: a doc is kept iff no same-source
    doc is at least as long AND at least as diverse (strictly better
    on one). Skyline selection avoids picking a single weighted score
    for incomparable criteria — the standard move when curation
    objectives conflict (longer docs repeat more).

    The oracle is the textbook O(n²) NOT EXISTS dominance test; the
    Spark side is `operators/pipeline.pareto_front_2d` — a per-x
    max(y) aggregate plus a strict-suffix ROWS frame over it (max(y)
    among strictly greater x; a RANGE frame would be wrong for
    fractional x), run per (source, deterministic hash bucket) then
    once over the union of local fronts, so no task ever sees more
    than its bucket plus the tiny survivor set. Both criteria derive from the same integers in both
    engines (ratio = one IEEE division of two BIGINTs), so dominance
    comparisons and the emitted values are bit-identical — full value
    oracle."""
    from distributed_deduplicator_spark.functions import text as TXT
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    from distributed_deduplicator_spark.sources.fixtures import fanout
    d = load_table(spark, sf_dir, "documents")
    toks = TXT.tokens("text")
    # fanout before the regex-heavy tokenize (the single-split fixture
    # scan otherwise runs it on one task), and persist the SKINNY
    # per-doc metrics: the skyline's local pass consumes its input
    # twice (per-x aggregate + join-back), which re-ran the whole
    # tokenize chain per consumer (profiled round 11: four ~1.3 s
    # single-task stages at sf0.1). ~30 B/doc cached vs re-tokenizing
    # the corpus — released by the registry via release_persisted().
    m = (fanout(d.select("doc_id", "source", "text"))
         .select("doc_id", "source", toks.alias("_t"))
         .where(F.size("_t") > 0)
         .select("doc_id", "source",
                 F.size("_t").cast("bigint").alias("n_tok"),
                 F.size(F.array_distinct("_t")).cast("bigint")
                  .alias("_nd")))
    r = _tracked_persist(m.withColumn("distinct_ratio",
                                      F.col("_nd") / F.col("n_tok")))
    return (P.pareto_front_2d(r, "n_tok", "distinct_ratio", ["source"])
             .select("doc_id", "source", "n_tok", "distinct_ratio"))
