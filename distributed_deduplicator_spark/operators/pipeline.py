"""Training-data pipeline operators: deterministic splits, benchmark
decontamination, repetition filtering, per-group caps, stratified
sampling.

These are the corpus-curation passes a large-scale LLM data pipeline
runs between raw ingest and training shards (public recipe lineage:
C4's heuristic filters, Gopher's repetition rules, the standard
hash-based held-out split, benchmark n-gram decontamination as
described in open model reports). The reference precedent is its
content-identity discipline — deterministic ids over content
(DeduplicationProvider.kt:43-44) — generalized from attempt keys to
corpus membership decisions.

Scale design (100 TB):
- every split/sample/cap decision derives from an md5 of the row's own
  id — deterministic, reproducible across runs and engines, and
  uniformly distributed, so no repartition or global sort is needed;
- decontamination joins train docs against the (small) benchmark
  shingle set with a broadcast — the 100 TB side streams map-side,
  nothing shuffles but the hits;
- repetition stats use explode + two-level groupBy (map-side
  combinable counts keyed by (doc, token)) rather than per-row
  quadratic array scans — the same rows-not-arrays discipline as the
  similarity suite;
- caps and stratified samples are one window over the grouping key:
  a single hash-partitioned sort per stratum, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from distributed_deduplicator_spark.functions import text as TXT
from distributed_deduplicator_spark.sources.fixtures import fanout


def id_hash(id_col: Column | str) -> Column:
    """Deterministic uniform hash of a row id: md5 of its decimal
    string form. The basis for every split/sample/cap decision here —
    reproducible across engines (DuckDB md5 agrees byte-for-byte),
    runs, and cluster sizes, unlike rand() or monotonically_increasing_id.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string").cast("binary"))


def hash_split(df: DataFrame, id_col: str, train_frac: float = 0.9,
               split_col: str = "split") -> DataFrame:
    """Deterministic train/test assignment by md5-prefix range.

    The first two hex chars of md5(id) form a uniform bucket in
    0..255; rows below ``train_frac`` of the range are 'train'. A doc's
    split never changes when the corpus grows — the property that makes
    hash splits the standard over random ones (no test-set churn, no
    contamination when shards are re-run).
    """
    cut = int(round(train_frac * 256))
    if cut >= 256:      # 'train' for every bucket: format(256) is the
        split = F.lit("train")  # 3-char '100', which sorts BELOW most
    elif cut <= 0:      # 2-char prefixes and would invert the compare
        split = F.lit("test")
    else:
        cut_hex = format(cut, "02x")
        split = (F.when(F.substring(id_hash(id_col), 1, 2)
                        < F.lit(cut_hex), F.lit("train"))
                  .otherwise(F.lit("test")))
    return df.withColumn(split_col, split)


def ngram_decontaminate(docs: DataFrame, bench_ids: DataFrame,
                        id_col: str, text_col: str,
                        n: int = 5) -> DataFrame:
    """Benchmark decontamination: for every non-benchmark doc, count
    the distinct word n-grams it shares with ANY benchmark doc and how
    many benchmark docs it hits.

    ``bench_ids`` is a one-column (id) DataFrame naming the held-out /
    benchmark docs. Returns one row per CONTAMINATED train doc:
    (id, n_shared_shingles, n_bench_docs) — the pipeline drops or
    flags these before training.

    Scale: the benchmark set is small by construction (eval suites are
    thousands of docs, the corpus is billions), so its exploded shingle
    set broadcasts; the corpus side streams through one map-side hash
    join and only hits reach the aggregation. Shingle sets are distinct
    per doc (array_distinct inside shingle_array), making the counts
    multiplicity-free on both engines.
    """
    from distributed_deduplicator_spark.operators.similarity import (
        shingle_array)
    bench = bench_ids.select(F.col(bench_ids.columns[0]).alias("bid"))
    # membership split BEFORE shingling: the benchmark side shingles
    # only |bench| docs, not the corpus (the join must sit below the
    # Generate, or a 100 TB corpus gets shingled twice)
    bench_docs = docs.join(F.broadcast(bench),
                           docs[id_col] == bench["bid"], "inner") \
                     .drop("bid")
    train_docs = docs.join(F.broadcast(bench),
                           docs[id_col] == bench["bid"], "left_anti")
    bench_grams = (shingle_array(bench_docs, id_col, text_col, n=n)
                   .select(F.col("id").alias("bench_id"),
                           F.explode("shingles").alias("shingle")))
    train_grams = (shingle_array(train_docs, id_col, text_col, n=n)
                   .select("id", F.explode("shingles").alias("shingle")))
    hits = train_grams.join(F.broadcast(bench_grams), "shingle", "inner")
    return (hits.groupBy("id")
                .agg(F.countDistinct("shingle").alias("n_shared_shingles"),
                     F.countDistinct("bench_id").alias("n_bench_docs")))


def repetition_stats(docs: DataFrame, id_col: str, text_col: str,
                     min_distinct_ratio: float = 0.5,
                     max_top_token_ratio: float = 0.15) -> DataFrame:
    """Gopher-style repetition profile per document: token count,
    distinct-token ratio, top-token mass — with a keep flag.

    Repetitive text (boilerplate, keyword stuffing, degenerate
    generations) shows a low distinct ratio or one token dominating;
    published pipelines drop such docs before dedup even runs.

    Scale: explode → count by (doc, token) → re-aggregate. Two
    exchanges — (doc, token) then (doc) — but BOTH are map-side
    combinable, so the aggregation shuffles carry one row per distinct
    (doc, token) and then one per doc, never the raw token stream.
    Never a per-row O(tokens²) array scan. (Plus the fanout pre-pass —
    fixture-scale only, no-op at real scale.)
    """
    base = fanout(docs.select(F.col(id_col).alias("id"),
                              F.col(text_col).alias("_text"))) \
        .select("id", TXT.tokens("_text").alias("_toks"))
    tok = (base.where(F.size("_toks") > 0)
               .select("id", F.explode("_toks").alias("w")))
    counts = tok.groupBy("id", "w").agg(F.count("*").alias("n"))
    agg = (counts.groupBy("id")
                 .agg(F.sum("n").alias("n_tokens"),
                      F.count("*").alias("n_distinct"),
                      F.max("n").alias("top_n")))
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_ratio = F.col("top_n").cast("double") / F.col("n_tokens")
    return agg.select(
        "id", "n_tokens", "n_distinct",
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_ratio, 6).alias("top_token_ratio"),
        ((distinct_ratio >= min_distinct_ratio)
         & (top_ratio <= max_top_token_ratio)).alias("keep"))


def cap_per_group(df: DataFrame, group_col: str, id_col: str,
                  cap: int, salts: int = 16) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic
    hash order of the id — the per-domain/per-source cap that stops one
    crawl host from dominating a training mix. The md5 order makes the
    kept subset a uniform sample of the group, not its head.

    Two-phase exact top-cap, not one window: a single window partition
    per group serializes the HOTTEST group onto one task's sort.
    Phase 1 splits each group into ``salts`` deterministic hash
    buckets and keeps each bucket's ``cap`` smallest — the hottest
    task now sorts |group|/salts rows (a salts× mitigation, sized by
    the caller to the expected skew; the phase itself stays a plain
    hash shuffle, so raising salts costs nothing but bucket count);
    phase 2 ranks the ≤ cap·salts survivors per group — THAT side is
    bounded regardless of group size. Output-identical to
    the naive window: a row dropped in phase 1 has > cap smaller rows
    in its own bucket (all globally smaller too), so its true rank
    exceeds cap; and any survivor ranked ≤ cap in phase 2 has ALL its
    globally-smaller rows surviving phase 1, so its phase-2 rank IS
    its global rank (equality gated in tests/test_pipeline.py).
    ``salts=1`` degenerates to the single-window plan.
    """
    if cap <= 0 or salts <= 0:
        raise ValueError("cap and salts must be positive")
    order = [id_hash(id_col), F.col(id_col)]
    if salts == 1:
        w = Window.partitionBy(group_col).orderBy(*order)
        return (df.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= cap))
    salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(7)), F.lit(salts))
    w1 = Window.partitionBy(group_col, "_salt").orderBy(*order)
    local = (df.withColumn("_salt", salt)
               .withColumn("_lrk", F.row_number().over(w1))
               .where(F.col("_lrk") <= cap))
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (local.withColumn("rk", F.row_number().over(w2))
                 .where(F.col("rk") <= cap)
                 .drop("_salt", "_lrk"))


def token_budget_pack(docs: DataFrame, id_col: str, text_col: str,
                      budget: int = 2048,
                      n_shards: int = 16) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed token-budget
    bins in deterministic hash order — the pass that turns a curated
    corpus into training-shard manifests (each bin ≈ one packed
    training sequence / file of ``budget`` tokens).

    A single global cumulative sum would serialize on one task, so the
    corpus is first split into ``n_shards`` deterministic md5 shards;
    packing runs independently per shard (one window partition each).
    Bins are keyed (shard, bin_id) — stable across runs, engines, and
    cluster sizes. A document longer than the budget still lands in
    exactly one bin (bin boundaries advance by its full length).

    Returns (id, shard, bin_id, n_tokens, cum_tokens) where
    ``cum_tokens`` is the running total inside the shard AFTER this doc
    and ``bin_id = floor((cum_tokens - n_tokens) / budget)`` — the
    standard greedy fill rule.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    base = fanout(docs.select(F.col(id_col).alias("id"),
                              F.col(text_col).alias("_text"),
                              id_hash(id_col).alias("_h"))) \
        .select("id", TXT.token_count("_text").cast("bigint")
                .alias("n_tokens"), "_h")
    shard = (F.conv(F.substring("_h", 1, 4), 16, 10).cast("bigint")
             % n_shards).cast("int")
    w = (Window.partitionBy("shard").orderBy("_h", "id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (base.withColumn("shard", shard)
                .withColumn("cum_tokens", F.sum("n_tokens").over(w))
                .select("id", "shard", "n_tokens", "cum_tokens",
                        F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                                / budget).alias("bin_id")))


def mix_weights(docs: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Corpus-mixture rebalancing weights: per group (language, source,
    …) compute its token mass and the per-doc sampling weight that
    would flatten the mixture to equal token share per group —
    ``weight = min(1, target_share / actual_share)``.

    The heavy part is ONE map-side-combinable aggregation over the
    corpus (exact BIGINT token sums; the fanout pre-pass is
    fixture-scale only); the share/weight arithmetic runs on the tiny
    grouped result (|groups| rows), where an unpartitioned window is
    safe at any corpus scale.
    """
    per = (fanout(docs.select(F.col(group_col).alias("grp"),
                              F.col(text_col).alias("_text")))
           .groupBy("grp")
           .agg(F.count("*").alias("n_docs"),
                F.sum(TXT.token_count("_text").cast("bigint"))
                 .alias("n_tokens")))
    w_all = Window.partitionBy()
    total = F.sum("n_tokens").over(w_all)
    n_groups = F.count("*").over(w_all)
    share = F.col("n_tokens").cast("double") / total.cast("double")
    target = F.lit(1.0) / n_groups.cast("double")
    return per.select(
        "grp", "n_docs", "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(F.least(F.lit(1.0), target / share), 6).alias("weight"))


def chunk_exact_dedup(docs: DataFrame, id_col: str, text_col: str,
                      chunk_tokens: int = 20) -> DataFrame:
    """Sub-document exact dedup (the line/paragraph-level pass of
    CCNet/RefinedWeb-style pipelines, expressed over fixed token
    chunks because the fixture corpus has no line structure): split
    each document into ``chunk_tokens``-token chunks, fingerprint each
    chunk (md5), keep the FIRST occurrence corpus-wide — first-wins at
    chunk granularity, ordered by (doc_id, chunk_idx) exactly like the
    reference's per-key earliest-claim arbitration
    (DeduplicationProvider.kt:67-94) with the chunk hash as the key.

    Returns one row per doc: (id, n_chunks, n_dup_chunks, dup_ratio).
    Scale: explode → per-hash winner via struct-MIN AGGREGATE + join —
    deliberately NOT a row_number window: a ubiquitous boilerplate
    chunk puts millions of rows under one hash, and a window sort on
    that key is a single unsplittable reducer, while the MIN aggregate
    combines map-side and the winner join is AQE-skew-splittable. The
    dedup shuffles carry only (doc, hash) pairs — never chunk text.
    (The fanout pre-pass round-robins raw docs once to beat the
    fixture's single-split scan; no-op at real scale.)
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    base = fanout(docs.select(F.col(id_col).alias("id"),
                              F.col(text_col).alias("_text"))) \
        .select("id", TXT.tokens("_text").alias("_toks"))
    toks = F.col("_toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(F.concat_ws(
            " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens))))
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # (id, chunk_idx, h) feeds BOTH the winner MIN and the join-back —
    # persist it (lazy; narrow md5 rows, never chunk text) so the
    # tokenize+hash pass runs once, not twice.
    ex = _tracked_persist(
        base.where(F.size(toks) > 0)
            .select("id", F.posexplode(chunks).alias("chunk_idx", "h")))
    winners = (ex.groupBy("h")
                 .agg(F.min(F.struct("id", "chunk_idx")).alias("w")))
    flagged = (ex.join(winners, "h")
                 .select("id", ((F.col("id") != F.col("w.id"))
                                | (F.col("chunk_idx")
                                   != F.col("w.chunk_idx"))).alias("dup")))
    return (flagged.groupBy("id")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum(F.col("dup").cast("bigint")).alias("n_dup_chunks"))
            .select("id", "n_chunks", "n_dup_chunks",
                    F.round(F.col("n_dup_chunks").cast("double")
                            / F.col("n_chunks"), 6).alias("dup_ratio")))


def stratified_sample(df: DataFrame, stratum_col: str, id_col: str,
                      frac: float) -> DataFrame:
    """EXACT per-stratum fraction: rank rows inside each stratum by
    id-hash and keep the first ceil(frac·|stratum|).

    Unlike df.sampleBy (Bernoulli — only approximate counts), the kept
    count per stratum is exact and the selection is deterministic, so
    a re-run or a different cluster keeps the same rows. One window
    per stratum; count and rank share the same partitioning.

    Scale bound, stated honestly: the hottest stratum sorts on one
    window partition. Unlike cap_per_group's CONSTANT cap (which the
    salted two-phase bounds exactly), a PROPORTIONAL keep-count
    defeats that trick — per-salt survivors total frac·n·salts rows,
    more than the n the single sort already pays for any frac >
    1/salts. When one stratum dominates an extreme corpus and exact
    counts stop mattering, the scalable degeneration is the zero-
    shuffle hash-threshold filter (pmod(xxhash64(id), 10^6) <
    frac·10^6 — deterministic, ±√n per stratum), which is what
    train_test_split_hash already does for unstratified splits.
    """
    w_order = (Window.partitionBy(stratum_col)
                     .orderBy(id_hash(id_col), F.col(id_col)))
    w_all = Window.partitionBy(stratum_col)
    return (df.withColumn("rk", F.row_number().over(w_order))
              .withColumn("n_stratum", F.count("*").over(w_all))
              .where(F.col("rk")
                     <= F.ceil(F.lit(frac) * F.col("n_stratum")
                               - F.lit(1e-9))))


def source_overlap_matrix(docs: DataFrame, group_col: str,
                          text_col: str, n: int = 4) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources,
    the distinct word n-grams they share, with Jaccard and containment
    over the per-source distinct shingle sets. The corpus-level view
    of what `ngram_decontaminate` checks doc-by-doc — the pass that
    tells a curation pipeline which crawls/dumps duplicate each other
    BEFORE it spends a full near-dup pass on the union.

    Scale: per-source shingle sets come from one distinct shuffle on
    (source, shingle); the pair join is an equi-join on shingle, so a
    shingle present in k sources contributes k·(k-1)/2 rows — bounded
    by |sources|² per shingle, never |docs|². The per-pair and
    per-source aggregates are map-side combinable; only (pair, count)
    rows reach the final tiny join of |sources|² rows against the
    broadcast per-source totals. Shingles are xxhash64-hashed before
    the distinct, so the corpus-scale shuffle and self-join carry
    8-byte bigints instead of ~30-byte n-gram strings (same collision
    caveat as jaccard_similarity_join — ~1e-6 expected colliding pairs
    corpus-wide, parity-checked against the string-keyed oracle).
    """
    from distributed_deduplicator_spark.operators.similarity import (
        shingle_array)
    grams = (shingle_array(docs, group_col, text_col, n=n)
             .select(F.col("id").alias("src"),
                     F.explode("shingles").alias("_s"))
             .select("src", F.xxhash64("_s").alias("shingle"))
             .distinct())
    per = grams.groupBy("src").agg(F.count("*").alias("n"))
    a, b = grams.alias("a"), grams.alias("b")
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.src") < F.col("b.src")))
              .groupBy(F.col("a.src").alias("source_a"),
                       F.col("b.src").alias("source_b"))
              .agg(F.count("*").alias("shared_shingles")))
    pa = per.select(F.col("src").alias("_sa"), F.col("n").alias("n_a"))
    pb = per.select(F.col("src").alias("_sb"), F.col("n").alias("n_b"))
    shared = F.col("shared_shingles").cast("double")
    return (pairs.join(F.broadcast(pa), F.col("source_a") == F.col("_sa"))
                 .join(F.broadcast(pb), F.col("source_b") == F.col("_sb"))
                 .select("source_a", "source_b", "shared_shingles",
                         "n_a", "n_b",
                         F.round(shared / (F.col("n_a") + F.col("n_b")
                                           - F.col("shared_shingles")), 6)
                          .alias("jaccard"),
                         F.round(shared / F.least("n_a", "n_b"), 6)
                          .alias("containment")))


def quality_funnel(df: DataFrame,
                   stages: list[tuple[str, Column]]) -> DataFrame:
    """Per-stage survivor counts through a cascade of quality gates —
    the filter-funnel report every corpus-curation run publishes
    (C4/FineWeb lineage: how many documents each heuristic removed).
    Stage k's survivor count applies gates 1..k cumulatively, so the
    funnel is monotone by construction.

    One pass: all gate predicates evaluate in the scan stage, the
    cumulative counts are map-side-combinable conditional sums (one
    row per partition crosses the wire), and the stage table is
    unpivoted driver-free with ``stack`` over the single aggregate
    row. At 100 TB this is exactly one scan + a 1-row shuffle,
    regardless of how many gates the cascade has.
    """
    cum, counts = F.lit(True), [F.count("*").alias("c0")]
    for i, (_, pred) in enumerate(stages, start=1):
        cum = cum & pred
        counts.append(F.sum(cum.cast("bigint")).alias(f"c{i}"))
    agg = df.agg(*counts)
    # Column-literal unpivot, not a selectExpr string: a stage name
    # containing a quote must stay a NAME, never SQL text
    rows = F.array(*[
        F.struct(F.lit(i).alias("stage_idx"),
                 F.lit(name).alias("stage"),
                 F.col(f"c{i}").alias("survivors"),
                 F.col(f"c{i - 1}").alias("prev"))
        for i, (name, _) in enumerate(stages, start=1)])
    return (agg.select(F.explode(rows).alias("_r"))
               .select(F.col("_r.stage_idx").cast("bigint")
                        .alias("stage_idx"),
                       F.col("_r.stage").alias("stage"),
                       F.col("_r.survivors").cast("bigint")
                        .alias("survivors"),
                       (F.col("_r.prev") - F.col("_r.survivors"))
                       .cast("bigint").alias("dropped")))


def bloom_ngram_decontaminate(docs: DataFrame, bench_ids: DataFrame,
                              id_col: str, text_col: str, n: int = 5,
                              m_bits: int = 1 << 22,
                              seeds: tuple[int, ...] = (11, 23, 47),
                              ) -> DataFrame:
    """Bloom-filter variant of `ngram_decontaminate`: flags every
    train doc whose shingles MIGHT overlap the benchmark set (no false
    negatives; false-positive rate set by m_bits/k). Returns one row
    per flagged doc: (id, n_maybe_shingles).

    Why it exists at 100 TB: the exact path broadcasts the benchmark's
    full shingle strings — fine for one eval suite, linear in its
    size. The bloom build is a FIXED-size structure (m_bits/64 longs ≈
    512 KB at the 2²² default) no matter how many benchmarks are
    unioned in, built distributively (positions → 64-bit words via
    map-side-combinable bit_or — never a driver-side
    `df.stat.bloomFilter`, which would run a job at query
    construction). The probe is k broadcast joins on word index with a
    bit test — corpus shingle strings never shuffle, and a doc
    short-circuits out of the count as soon as any of its shingles
    passes all k bit tests.
    """
    from distributed_deduplicator_spark.operators.similarity import (
        shingle_array)
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    bench = bench_ids.select(F.col(bench_ids.columns[0]).alias("bid"))
    bench_docs = docs.join(F.broadcast(bench),
                           docs[id_col] == bench["bid"], "inner") \
                     .drop("bid")
    train_docs = docs.join(F.broadcast(bench),
                           docs[id_col] == bench["bid"], "left_anti")

    def pos(col: Column, seed: int) -> Column:
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))

    bench_grams = (shingle_array(bench_docs, id_col, text_col, n=n)
                   .select(F.explode("shingles").alias("shingle")))
    # SQL shiftleft (unlike the Python wrapper) takes a column shift
    mask_of = "shiftleft(1L, cast(p % 64 as int))"
    words = (bench_grams
             .select(F.explode(F.array(
                 *[pos(F.col("shingle"), s) for s in seeds])).alias("p"))
             .select(F.expr("cast(p div 64 as long)").alias("widx"),
                     F.expr(mask_of).alias("mask"))
             .groupBy("widx").agg(F.bit_or("mask").alias("w")))

    cur = (shingle_array(train_docs, id_col, text_col, n=n)
           .select("id", F.explode("shingles").alias("shingle")))
    maybe = F.lit(True)
    for i, s in enumerate(seeds):
        # int seed literal, matching the build side's F.lit(seed)
        # (xxhash64 folds argument TYPES into the hash)
        p_sql = f"pmod(xxhash64(shingle, {s}), {m_bits}L)"
        cur = cur.withColumn(f"_widx{i}",
                             F.expr(f"cast({p_sql} div 64 as long)")) \
                 .withColumn(f"_mask{i}",
                             F.expr(f"shiftleft(1L, "
                                    f"cast({p_sql} % 64 as int))"))
        w = words.select(F.col("widx").alias(f"_widx{i}"),
                         F.col("w").alias(f"_w{i}"))
        cur = cur.join(F.broadcast(w), f"_widx{i}", "left")
        maybe = maybe & (F.col(f"_w{i}").bitwiseAND(F.col(f"_mask{i}"))
                         == F.col(f"_mask{i}"))
    return (cur.where(F.coalesce(maybe, F.lit(False)))
               .groupBy("id")
               .agg(F.countDistinct("shingle").alias("n_maybe_shingles")))


def pareto_front_2d(df: DataFrame, x_col: str, y_col: str,
                    group_cols: list[str] | None = None) -> DataFrame:
    """Rows on the 2-D Pareto front (skyline), maximizing both
    criteria, optionally per group: a row survives iff NO other row in
    its group is ≥ on both criteria and > on at least one. The
    data-selection primitive behind "keep documents not dominated on
    (quality, length)" curation cuts.

    Dominance test without a self-join and without any n² work, exact
    for ANY ordered x type (integers, doubles, timestamps — a RANGE
    frame (1, +∞) would silently be wrong for fractional x, where
    "strictly greater" ≠ "≥ x+1"): first a per-(group, x) max(y)
    aggregate (combinable, ≤ one row per distinct x), then over that
    aggregate a strict-suffix running max ordered by x DESC — max(y)
    among strictly greater x — joined back on (group, x). A row is
    dominated iff that strict-greater max ≥ its y (something farther
    right is at least as good) or its own x-group's max > y (same-x
    domination). Exact ties on both criteria dominate nothing, so
    duplicate points all stay on the front — textbook skyline
    semantics.

    Scale shape: a windowed skyline over one global ordering would
    serialize onto one task, so this runs the standard two-phase
    distributed skyline — the SAME window pass first per (group,
    bucket), which is exact pruning (a locally dominated row is
    dominated by the same witness globally, and a global survivor has
    no dominating witness anywhere, so local passes never drop it),
    then once more over the union of local fronts. Skylines are tiny
    relative to their inputs (they grow ~log n on independent
    criteria), so the global pass sees survivors-per-bucket rows, not
    the corpus. The bucket key is a DETERMINISTIC hash of
    (group, x, y) — not spark_partition_id(), which can differ
    between the two evaluations of the scan subtree feeding the
    local pass's self-join (AQE replan, task retry after a
    round-robin repartition) and would then silently drop rows from
    the inner join. The window pass shuffles on its partition key
    either way, so the deterministic key costs nothing extra.
    """
    groups = list(group_cols or [])
    # rows with a NULL criterion are excluded up front: they cannot be
    # ordered against anything, and leaving them in would silently
    # drop NULL-x rows (the join-back key) while passing NULL-y rows
    # onto the front (max() skips them, so nothing ever dominates them)
    df = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())

    def front(rows: DataFrame, parts: list[str]) -> DataFrame:
        gx = rows.groupBy(*parts, x_col).agg(F.max(y_col).alias("_xy"))
        w_gt = (Window.partitionBy(*parts).orderBy(F.col(x_col).desc())
                .rowsBetween(Window.unboundedPreceding, -1))
        gx = gx.withColumn("_gt_y", F.max("_xy").over(w_gt))
        j = rows.join(gx, [*parts, x_col])
        dominated = ((F.col("_gt_y") >= F.col(y_col))
                     | (F.col("_xy") > F.col(y_col)))
        return (j.withColumn("_dom", F.coalesce(dominated, F.lit(False)))
                 .where(~F.col("_dom")).drop("_dom", "_xy", "_gt_y"))

    try:
        n_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_buckets = 200
    bkt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (*groups, x_col, y_col)]),
        F.lit(max(n_buckets, 1)))
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # pin the prepared input: the local pass's join-back evaluates its
    # source twice, and callers typically feed a non-trivial derivation
    # (the skyline query tokenizes every document for its criteria) —
    # without the pin that subtree runs once per join side (measured
    # 5.6 s → 2.4 s at bench SF). Linear, one row per input row;
    # released by the registry hook via release_persisted().
    local = front(_tracked_persist(df.withColumn("_bkt", bkt)),
                  groups + ["_bkt"]).drop("_bkt")
    return front(local, groups)


def _gram_expr(tok_col: str, n: int, hash_grams: bool) -> Column:
    """Array of the doc's n-token window keys, one per 0-based window
    position: the space-joined gram STRING, or (``hash_grams``) its
    xxhash64 — the 100 TB form, where every downstream shuffle keyed
    on the gram carries 8 bytes instead of an n-token string.
    Collision odds are 2⁻⁶⁴ per gram pair (union-bounded ~1e-8 even
    at 10⁹ distinct grams), the same trade `source_overlap_matrix`
    documents; the hash and string forms are parity-gated equal in
    tests/test_corpus_analysis_ops.py."""
    gram = f"concat_ws(' ', slice({tok_col}, i, {n}))"
    if hash_grams:
        gram = f"xxhash64({gram})"
    return F.expr(f"transform(sequence(1, size({tok_col}) - {n} + 1), "
                  f"i -> {gram})")


def dup_span_stats_df(docs: DataFrame, id_col: str, text_col: str,
                      n: int = 5, hash_grams: bool = False) -> DataFrame:
    """ExactSubstr-flavored duplicated-SPAN statistics (Lee et al.
    2022, arXiv:2107.06499 §4.1) — the DECIDE step of the family whose
    APPLY step is :func:`exactsubstr_prune`: a token position is
    duplicated when its n-gram occurs at ≥2 sites anywhere in the
    corpus (cross- OR intra-document, the ExactSubstr convention);
    runs of consecutive duplicated positions chain into maximal
    duplicated spans — a position run of L grams covers L + n − 1
    tokens, exactly the substring a suffix-array dedup would cut.
    Per doc: how many spans, the longest one, and the covered
    fraction — the inputs to a cut-vs-drop decision that n-gram SET
    overlap cannot see because it ignores adjacency.

    Plan: one combinable gram count, the count≥2 set semi-joins back
    onto the (doc, pos) stream on the gram key (never all-pairs),
    islands are a per-doc window over ONLY duplicated positions
    (skew-bounded: a doc's dup positions ≤ its length), and the
    rollups are exact-integer combinable aggs. ``hash_grams`` swaps
    the gram key for its xxhash64 (see :func:`_gram_expr`) so the
    count and semi-join shuffles carry 8 bytes per key at 100 TB —
    output-identical absent a 2⁻⁶⁴ collision, parity-gated in
    tests/test_corpus_analysis_ops.py. The registered query keeps
    strings so the DuckDB oracle stays value-exact.
    """
    t = (docs.select(F.col(id_col).alias("id"),
                     TXT.tokens(text_col).alias("_toks"))
             .where(F.size("_toks") >= n))
    occ = t.select("id", F.posexplode(
        _gram_expr("_toks", n, hash_grams)).alias("pos", "gram"))
    dup_grams = (occ.groupBy("gram").agg(F.count("*").alias("c"))
                    .where(F.col("c") >= 2).select("gram"))
    dup = occ.join(dup_grams, "gram").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    isl = dup.select("id", "pos",
                     (F.col("pos") - F.row_number().over(w)).alias("grp"))
    per_isl = isl.groupBy("id", "grp").agg(F.count("*").alias("len"))
    per_doc = per_isl.groupBy("id").agg(
        F.max("len").alias("max_len"),
        F.count("*").alias("n_spans"),
        F.sum("len").alias("n_dup_pos"))
    base = t.select(
        "id",
        (F.size("_toks") - n + 1).cast("bigint").alias("n_positions"))
    return (base.join(per_doc, "id", "left")
                .select(
                    "id", "n_positions",
                    F.coalesce("n_dup_pos", F.lit(0)).cast("bigint")
                     .alias("n_dup_positions"),
                    F.coalesce("n_spans", F.lit(0)).cast("bigint")
                     .alias("n_dup_spans"),
                    F.when(F.col("max_len").isNull(), F.lit(0))
                     .otherwise(F.col("max_len") + n - 1)
                     .cast("bigint").alias("max_dup_span_tokens"),
                    (F.coalesce("n_dup_pos", F.lit(0)).cast("double")
                     / F.col("n_positions").cast("double"))
                    .alias("dup_cover_frac")))


def exactsubstr_prune(docs: DataFrame, id_col: str, text_col: str,
                      n: int = 5, hash_grams: bool = False) -> DataFrame:
    """ExactSubstr dedup APPLIED (Lee et al. 2022, arXiv:2107.06499
    §4.1): cut every duplicated ≥n-token substring except its one
    canonical occurrence and report the pruned result per document —
    the action step whose decision inputs `dup_span_stats` computes.

    Contract (deterministic, oracle-exact):
    - a token position is DUPLICATED when its n-gram occurs at ≥2
      sites corpus-wide (cross- or intra-document);
    - each duplicated n-gram keeps its CANONICAL occurrence — the
      minimal (doc, position) — and every other occurrence is cut;
    - a token is removed iff ≥1 cut position covers it. This is the
      CONSERVATIVE trade: a canonical window is never cut for its own
      gram, but one of its tokens can still fall under an OVERLAPPING
      cut window of a different gram — so when duplicated regions of
      distinct grams interlock, a substring can lose every retained
      copy. Curation pipelines that must preserve one copy of
      everything should drop whole documents on `dup_span_stats`
      coverage instead of cutting;
    - rows with NULL text are excluded (there is nothing to prune,
      and NULL-poisoned counts would be indistinguishable from a
      fully-pruned document downstream);
    - output per doc: token counts, removed counts, retained
      fraction, and the md5 of the RETAINED token sequence — the
      pruned text itself, value-checkable cross-engine without
      shipping full text through the comparison harness.

    Scale shape: one combinable (count, min-struct) aggregate per
    gram — canonicality needs no per-gram window, so hot boilerplate
    grams cannot skew a partition; the cut set semi-joins back on the
    gram key (the `benchmark_decontaminate` shuffle shape, never
    all-pairs); coverage explodes ≤ n rows per cut position; the
    retained stream is a skinny (id, token-index) anti-join; the
    per-doc md5 folds a doc-bounded sorted collect. ``hash_grams``
    swaps the gram key for its xxhash64 (see :func:`_gram_expr`) so
    the canonical-occurrence aggregate and the cut-set semi-join carry
    8-byte keys instead of n-token strings at 100 TB —
    output-identical absent a 2⁻⁶⁴ collision, parity-gated in
    tests/test_corpus_analysis_ops.py. The registered query keeps
    strings so the DuckDB oracle is value-exact, same trade as
    `dup_span_stats`.
    """
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # one row per doc, three consumers (gram stream, token stream,
    # per-doc totals) — persist the linear tokenized table; released
    # by the registry hook via release_persisted(). fanout first: the
    # single-split fixture scan otherwise pins the cached table (and
    # the tokenize pass itself) to ONE partition, serializing all
    # three consumers' first stages (profiled round 11: a 1-task ~2 s
    # stage at sf0.1; no-op at real scale where scans have many
    # splits)
    toks = _tracked_persist(
        fanout(docs.where(F.col(text_col).isNotNull())
                   .select(F.col(id_col).alias("id"),
                           F.col(text_col).alias("_text")))
        .select("id", TXT.tokens("_text").alias("_t")))
    # posexplode → 0-based gram position == 0-based index of the
    # window's FIRST token in the token stream below
    occ = (toks.where(F.size("_t") >= n)
               .select("id", F.posexplode(
                   _gram_expr("_t", n, hash_grams)).alias("pos", "gram")))
    canon = (occ.groupBy("gram")
                .agg(F.count("*").alias("_c"),
                     F.min(F.struct("id", "pos")).alias("_first"))
                .where(F.col("_c") >= 2)
                .select("gram", "_first"))
    cut = (occ.join(canon, "gram")
              .where(~((F.col("id") == F.col("_first.id"))
                       & (F.col("pos") == F.col("_first.pos"))))
              .select("id", "pos"))
    covered = (cut.select("id",
                          F.explode(F.sequence(
                              F.col("pos"),
                              F.col("pos") + F.lit(n - 1)))
                           .alias("tok_idx"))
                  .distinct())
    tok_rows = toks.select("id", F.posexplode("_t").alias("tok_idx", "tok"))
    retained = tok_rows.join(covered, ["id", "tok_idx"], "left_anti")
    ragg = (retained.groupBy("id")
                    .agg(F.count("*").alias("_n_ret"),
                         F.md5(F.array_join(
                             F.transform(
                                 F.array_sort(F.collect_list(
                                     F.struct("tok_idx", "tok"))),
                                 lambda s: s["tok"]),
                             " ").cast("binary")).alias("_h")))
    empty_md5 = F.md5(F.lit("").cast("binary"))
    base = toks.select("id", F.size("_t").cast("bigint").alias("n_tokens"))
    return (base.join(ragg, "id", "left")
                .select(
                    "id", "n_tokens",
                    (F.col("n_tokens")
                     - F.coalesce("_n_ret", F.lit(0))).cast("bigint")
                     .alias("n_removed_tokens"),
                    (F.coalesce("_n_ret", F.lit(0)).cast("double")
                     / F.col("n_tokens")).alias("retained_frac"),
                    F.coalesce("_h", empty_md5).alias("retained_md5")))
