"""Text-analysis queries over the documents fixture (SURVEY.md §7
Phase 5 / the training-data-pipeline extension).

Oracle notes: Spark regexes are Java, DuckDB's are RE2 — `\\w`, `\\b`
and alternation behave identically in both; `\\s` does NOT (Java's
includes vertical tab \\x0B, RE2's doesn't), so every oracle class
that negates `\\s` over RAW text spells the \\x0b out explicitly.
Patterns applied after normalize() are safe either way (the
normalizer collapses all whitespace first). Counts and lengths are
integers; ratios are per-row double arithmetic (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.functions import text as TXT
from distributed_deduplicator_spark.operators import dedup as D
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.sources import load_table


@query("text_lang_profile", oracle=r"""
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY lang, source
""")
def q_text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by (lang, source) — integer sums, exact. Oracle
    casts the sum to BIGINT (DuckDB sums integers to HUGEINT, which its
    pandas conversion floats — the driver-hash hazard)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).alias("total_chars"),
                 (F.sum(F.length("text")).cast("double") / F.count("*"))
                 .alias("avg_chars"),
                 F.min("doc_id").alias("min_doc_id")))


_SW = TXT.LANG_STOPWORDS

# DuckDB twin of _lang_pred (scoring CTE body + arg-max CASE), shared
# by the text_lang_id and lang_confusion_matrix oracles so the kernel
# cannot drift between them
_LANG_SCORES_SQL = rf"""SELECT doc_id, lang AS labeled_lang,
         len(regexp_extract_all(lower(text), '\b({"|".join(_SW["en"])})\b')) AS hits_en,
         len(regexp_extract_all(lower(text), '\b({"|".join(_SW["de"])})\b')) AS hits_de,
         len(regexp_extract_all(lower(text), '\b({"|".join(_SW["fr"])})\b')) AS hits_fr,
         len(regexp_extract_all(lower(text), '\b({"|".join(_SW["es"])})\b')) AS hits_es,
         len(regexp_extract_all(lower(text), '\b({"|".join(_SW["zh"])})\b')) AS hits_zh
  FROM documents"""

_LANG_PRED_CASE_SQL = """CASE greatest(hits_en, hits_de, hits_fr, hits_es, hits_zh)
            WHEN 0 THEN 'und'
            WHEN hits_en THEN 'en'
            WHEN hits_de THEN 'de'
            WHEN hits_fr THEN 'fr'
            WHEN hits_es THEN 'es'
            ELSE 'zh' END"""

@query("text_lang_id", oracle=rf"""
WITH scores AS (
  {_LANG_SCORES_SQL})
SELECT doc_id, labeled_lang, hits_en, hits_de, hits_fr, hits_es, hits_zh,
       {_LANG_PRED_CASE_SQL} AS pred_lang
FROM scores
""")
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-kernel language ID (n-gram heuristic) — per-doc rows
    from the shared `_lang_pred` predictor (ties resolve in fixed lang
    order en,de,fr,es,zh; zero hits → 'und')."""
    return _lang_pred(load_table(spark, sf_dir, "documents"))


@query("text_quality_filter", oracle=r"""
WITH q AS (
  SELECT doc_id, lang,
         (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END
          + least(CAST(len(string_split_regex(trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                '\s+', ' ', 'g')), ' ')) AS DOUBLE) / 100.0, 1.0)
          + CASE WHEN CAST(length(text) AS DOUBLE)
                      / (len(string_split_regex(trim(regexp_replace(
                          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                          '\s+', ' ', 'g')), ' ')) + 1) BETWEEN 3 AND 12
                 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
  FROM documents)
SELECT doc_id, lang, round(quality, 6) AS quality
FROM q WHERE quality >= 0.5
""")
def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length band + wordiness + mean word
    length) with a keep-threshold — the C4/Gopher-style gate."""
    d = load_table(spark, sf_dir, "documents")
    q = d.select("doc_id", "lang", TXT.quality_score("text").alias("q"))
    return (q.where(F.col("q") >= 0.5)
             .select("doc_id", "lang", F.round("q", 6).alias("quality")))


@query("text_fingerprint_dedup", oracle=r"""
SELECT doc_id, fp,
       CASE WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
            THEN 'SUCCESS' ELSE 'DUPLICATE' END AS verdict
FROM (SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
      FROM documents)
""")
def q_text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup by content fingerprint (md5 of normalized text),
    arbitrated first-wins by doc_id — the reference's first-writer-wins
    (R8) applied to content identity."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", TXT.fingerprint("text").alias("fp"))
    return D.dedup_first_wins(fp, keys=["fp"], order_by=["doc_id"])


@query("text_top_bigrams", oracle=r"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')
           AS t
  FROM documents),
grams AS (
  SELECT t[i+1] || ' ' || t[i+2] AS bigram
  FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - 1, 0))) AS i
        FROM toks)),
counted AS (SELECT bigram, count(*) AS n FROM grams GROUP BY bigram)
SELECT bigram, n FROM counted
ORDER BY n DESC, bigram LIMIT 20
""")
def q_text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram frequencies — the n-gram language-model
    statistics pass. Bigrams stay as one JVM array transform per doc
    (no per-gram rows until the explode feeding the count), the count
    is map-side combinable, and the top-20 is TakeOrderedAndProject."""
    from distributed_deduplicator_spark.operators.relational import (
        topk_global)
    d = load_table(spark, sf_dir, "documents")
    base = d.select(TXT.tokens("text").alias("_toks"))
    counted = (base.select(F.explode(TXT.bigrams("_toks")).alias("bigram"))
                   .groupBy("bigram").agg(F.count("*").alias("n")))
    return topk_global(counted, [F.col("n").desc(), F.col("bigram")], 20)


@query("text_length_quantiles")  # rows-only: t-digest sketch estimates
def q_text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest) of document lengths per language —
    THE quantile path at 100 TB (fixed-size mergeable sketch vs exact
    percentile's per-group value materialization). Relative-error gate
    vs the exact quantile asserted in tests/test_relational_extra.py."""
    d = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    return (d.groupBy("lang")
             .agg(F.count("*").alias("n_docs"),
                  F.approx_percentile(ln, F.lit(0.5), F.lit(1000))
                  .alias("approx_p50"),
                  F.expr("percentile(length(text), 0.5)").alias("exact_p50")))


_LEV_MAX = 4

@query("fuzzy_name_pairs", oracle=f"""
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= {_LEV_MAX}
WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
""")
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching: part-name pairs within edit distance 4 —
    `operators/similarity.edit_distance_join` blocked on p_brand.
    The operator layers the ed-join q-gram prefix filter (Gravano et
    al.) over (brand, length-band) blocking: bands alone leave a FIXED
    block count (brand cardinality × bounded length range), so the
    Σ|block|² bounded-DP verify grew quadratically with the table
    (9.4× wall for 10× data in the round-6 sweep); the rarest-(k·q+1)
    gram prefix equi-join makes candidates track true pairs instead.
    Exact — same kept rows and values as this blocking-free oracle
    (levenshtein is JVM codegen in Spark, same definition as DuckDB).

    NOTE the full pair LIST is itself ~quadratic on this corpus
    (10.8 M pairs at sf1 ≈ 10× the input rows): the per-record
    `fuzzy_name_topk` valve below is the product shape at scale; this
    query is its uncapped oracle twin."""
    from distributed_deduplicator_spark.operators.similarity import (
        edit_distance_join)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name")
    return edit_distance_join(p, "p_partkey", "p_name", k=_LEV_MAX,
                              block_cols=["p_brand"])


_FUZZY_TOPK = 3

@query("fuzzy_name_topk", oracle=f"""
WITH cand AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
         a.p_name AS name_a, b.p_name AS name_b,
         levenshtein(a.p_name, b.p_name) AS edit_dist
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand
   AND a.p_partkey <> b.p_partkey
   AND abs(length(a.p_name) - length(b.p_name)) <= {_LEV_MAX}
  WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX})
SELECT id_a, id_b, name_a, name_b, edit_dist, match_rank
FROM (SELECT *, row_number() OVER (PARTITION BY id_a
                                   ORDER BY edit_dist, id_b) AS match_rank
      FROM cand)
WHERE match_rank <= {_FUZZY_TOPK}
""")
def q_fuzzy_name_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale valve on `fuzzy_name_pairs`: each part's ≤3 CLOSEST
    fuzzy matches (edit distance ≤ 4, same blocking) instead of the
    full pair list. The full list is the right oracle object but the
    wrong product at scale — it grows ~10× the input on this corpus
    (10.8 M pairs at sf1) when the consumer almost always wants "the
    best few matches per record". Output here is ≤ 3 rows per part,
    O(n) at any scale.

    Plan: identical candidate generation to the sibling —
    `operators/similarity.edit_distance_join` blocked on p_brand
    (banded + q-gram prefix filtered; see `fuzzy_name_pairs`), which
    runs levenshtein ONCE per unordered pair (id_a < id_b) with the
    bounded threshold overload — mirrored to both directions by a
    column swap (free — no second DP pass), then a per-id_a
    row_number cut. Ranking keys (edit_dist, id_b) are exact
    integers — no cross-engine float wobble — so the result carries
    a full value oracle.

    Names are dropped before the rank shuffle: the window moves ~2×
    |pairs| rows — at (id, id, dist) width a quarter of the
    with-names shuffle — and only the ≤ k·n winners ever need their
    names re-attached (two skinny key joins at the end)."""
    from pyspark.sql import Window

    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist, edit_distance_join)
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name")
    # persist BEFORE the self-union mirror: both union branches embed
    # this subtree, and without the pin each branch re-runs the
    # prefix join + bounded DP — the query's dominant cost — once.
    # Released by the registry hook like every similarity pin.
    pairs = _tracked_persist(
        edit_distance_join(p, "p_partkey", "p_name", k=_LEV_MAX,
                           block_cols=["p_brand"])
        .select("id_a", "id_b", "edit_dist"))
    directed = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"),
                     F.col("id_a").alias("id_b"),
                     "edit_dist"))
    w = Window.partitionBy("id_a").orderBy("edit_dist", "id_b")
    top = (directed.withColumn("match_rank",
                               F.row_number().over(w).cast("bigint"))
                   .where(F.col("match_rank") <= _FUZZY_TOPK))
    na = p.select(F.col("p_partkey").alias("id_a"),
                  F.col("p_name").alias("name_a"))
    nb = p.select(F.col("p_partkey").alias("id_b"),
                  F.col("p_name").alias("name_b"))
    return (top.join(na, "id_a").join(nb, "id_b")
               .select("id_a", "id_b", "name_a", "name_b",
                       "edit_dist", "match_rank"))


@query("text_winnow_fingerprints")  # rows-only: xxhash64 has no DuckDB twin
def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash, sliding-window minima) document
    fingerprints — substring-robust dedup evidence; verified against a
    pure-Python reference in tests/test_similarity.py."""
    from distributed_deduplicator_spark.operators import similarity as S
    d = load_table(spark, sf_dir, "documents")
    return S.winnow_fingerprints(d, "doc_id", "text", k=5, window=4) \
            .select("id", "n_fingerprints")


@query("frequent_tokens_approx")  # rows-only: sketch output is a
                                  # superset guarantee, not an exact set
def q_frequent_tokens_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters over the token stream via Spark's
    freqItems (Karp/Misra-Gries family): single pass, fixed memory,
    mergeable across partitions — the 100 TB path when token
    cardinality is too large for an exact count shuffle. Contract:
    every token with true frequency ≥ support MUST appear (false
    positives allowed, false negatives never) — asserted against the
    exact count in tests/test_relational_extra.py. Completes the
    sketch family next to HLL (agg_approx_distinct) and t-digest
    (text_length_quantiles)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(TXT.tokens("text")).alias("w"))
    freq = toks.freqItems(["w"], support=0.01)
    return (freq.select(F.explode("w_freqItems").alias("token"))
                .orderBy("token"))


# Registered last within this module (driver-green in CORRECTNESS_r03;
# registration order controls which queries occupy the driver's 50-entry
# correctness window — see queries/__init__.py).
@query("text_stats", oracle=r"""
SELECT doc_id, lang,
       length(text) AS n_chars_actual,
       len(string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS n_words,
       len(regexp_extract_all(text, '\w+|[^\w\s\x0b]')) AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[^\w\s\x0b]', '', 'g'))
            AS DOUBLE) / length(text) AS punct_ratio
FROM documents
""")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: chars, normalized word count, BPE-ish token
    count, punctuation ratio — all codegen'd built-ins, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang",
        TXT.char_count("text").alias("n_chars_actual"),
        TXT.token_count("text").alias("n_words"),
        TXT.word_regex_count("text").alias("n_tokens"),
        TXT.punct_ratio("text").alias("punct_ratio"))


@query("doc_dup_ngram_stats", oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
g AS (
  SELECT doc_id, lang,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)),
                                  i -> t[i] || ' ' || t[i+1])
              ELSE [] END AS grams
  FROM toks)
SELECT doc_id, lang,
       len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / CAST(len(grams) AS DOUBLE)
            ELSE 0.0 END AS dup_frac,
       len(grams) > 0
         AND CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
             / CAST(len(grams) AS DOUBLE) < 0.1 AS keep
FROM g
""")
def q_doc_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate n-gram fraction per document (n=2): the
    share of a doc's bigram occurrences that are repeats of an earlier
    bigram in the SAME doc — the classic intra-document repetition
    quality gate (high fraction → boilerplate/spam), complementing the
    corpus-level top-token profile in ``repetition_filter``.

    Scale shape: ZERO shuffles — the n-gram build, distinct and ratio
    are all array-local per row (JVM ``transform``/``array_distinct``
    inside whole-stage codegen), so the query is a pure map over the
    scan at any corpus size. The ratio is an exact-integer division
    done identically in both engines (bit-identical doubles)."""
    d = load_table(spark, sf_dir, "documents")
    # Materialize tokens in their own projection so CollapseProject
    # can't inline the regex chain into the per-element lambda.
    t = d.select("doc_id", "lang", TXT.tokens("text").alias("_toks"))
    g = t.select("doc_id", "lang", TXT.bigrams("_toks").alias("_grams"))
    n_grams = F.size("_grams")
    n_distinct = F.size(F.array_distinct("_grams"))
    dup_frac = F.when(
        n_grams > 0,
        (n_grams - n_distinct).cast("double") / n_grams.cast("double")
    ).otherwise(F.lit(0.0))
    return g.select(
        "doc_id", "lang",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        dup_frac.alias("dup_frac"),
        ((n_grams > 0) & (dup_frac < 0.1)).alias("keep"))


@query("bigram_lift_topk", oracle=r"""
WITH toks AS (
  SELECT string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
uni AS (
  SELECT u.w AS w, count(*) AS c
  FROM toks, unnest(toks.t) AS u(w)
  GROUP BY u.w),
bg AS (
  SELECT bigram, count(*) AS n_pair
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2)
  GROUP BY bigram),
tot AS (
  SELECT (SELECT sum(c) FROM uni) AS n_tok,
         (SELECT sum(n_pair) FROM bg) AS n_big)
SELECT bigram, n_pair, u1.c AS n_w1, u2.c AS n_w2,
       CAST(((CAST(n_pair AS DOUBLE) * CAST(n_tok AS DOUBLE))
              * CAST(n_tok AS DOUBLE))
            / ((CAST(n_big AS DOUBLE) * CAST(u1.c AS DOUBLE))
               * CAST(u2.c AS DOUBLE)) AS DOUBLE) AS lift
FROM bg
CROSS JOIN tot
JOIN uni u1 ON split_part(bigram, ' ', 1) = u1.w
JOIN uni u2 ON split_part(bigram, ' ', 2) = u2.w
WHERE n_pair >= 3
ORDER BY lift DESC, bigram
LIMIT 25
""")
def q_bigram_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-25 corpus bigrams by LIFT — observed
    pair frequency over the frequency expected if the two words were
    independent. Lift is PMI's argument without the log, computed as
    one fixed-order chain of IEEE multiplies/divides over EXACT integer
    counts, so both engines produce bit-identical doubles (a log-based
    PMI would hang the hash-match on libm ULP differences).

    Scale shape: two combinable counts (bigram, unigram) shuffled on
    their word keys; the two unigram lookups are broadcast-able until
    vocab outgrows the threshold, then hash joins on the word key; the
    1-row totals cross-join broadcasts; top-25 is TakeOrderedAndProject
    (per-partition heaps), never a global sort."""
    from distributed_deduplicator_spark.operators.relational import topk_global
    d = load_table(spark, sf_dir, "documents")
    # unigram counts over ALL documents (the oracle's uni CTE domain);
    # the size>=2 filter applies only to bigram derivation — filtering
    # uni too would diverge n_tok/n_w1/n_w2 (and every lift) the moment
    # a fixture regeneration contains a 0/1-token doc
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # Each count table feeds its own total plus one or two joins — six
    # corpus re-scans unpersisted. Persist the two VOCABULARY-sized
    # count tables (lazy): totals and joins then never re-tokenize the
    # corpus, and the cache holds (word, count) rows, not token arrays
    # (caching the token arrays themselves costs more in serialization
    # than the second scan it saves — measured at sf0.1/sf1).
    t_all = d.select(TXT.tokens("text").alias("_toks"))
    t = t_all.where(F.size("_toks") >= 2)
    uni = _tracked_persist(
        t_all.select(F.explode("_toks").alias("w"))
             .groupBy("w").agg(F.count("*").alias("c")))
    bg_all = _tracked_persist(
        t.select(F.explode(TXT.bigrams("_toks")).alias("bigram"))
         .groupBy("bigram").agg(F.count("*").alias("n_pair")))
    # totals BEFORE the min-count filter (M counts every bigram
    # occurrence, matching the oracle's denominator)
    tot = (uni.agg(F.sum("c").alias("n_tok"))
              .crossJoin(bg_all.agg(F.sum("n_pair").alias("n_big"))))
    bg = bg_all.where(F.col("n_pair") >= 3)
    u1 = uni.select(F.col("w").alias("_w1"), F.col("c").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("_w2"), F.col("c").alias("n_w2"))
    joined = (bg.crossJoin(F.broadcast(tot))
                .join(F.broadcast(u1),
                      F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
                      == F.col("_w1"))
                .join(F.broadcast(u2),
                      F.split_part(F.col("bigram"), F.lit(" "), F.lit(2))
                      == F.col("_w2")))
    lift = (((F.col("n_pair").cast("double") * F.col("n_tok").cast("double"))
             * F.col("n_tok").cast("double"))
            / ((F.col("n_big").cast("double") * F.col("n_w1").cast("double"))
               * F.col("n_w2").cast("double"))).cast("double")
    out = joined.select("bigram", "n_pair", "n_w1", "n_w2",
                        lift.alias("lift"))
    return topk_global(out, [F.col("lift").desc(), F.col("bigram")], 25)


@query("tfidf_top_terms", oracle=r"""
WITH toks AS (
  SELECT doc_id, source,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
tok AS (SELECT doc_id, source, unnest(t) AS w FROM toks WHERE len(t) > 0),
tf AS (SELECT source, w, count(*) AS tf FROM tok GROUP BY source, w),
df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w)
SELECT source, w AS token, tf, df,
       CAST(tf AS DOUBLE) / df AS score, rk
FROM (SELECT source, tf.w, tf, df,
             row_number() OVER (PARTITION BY source
                                ORDER BY CAST(tf AS DOUBLE) / df DESC,
                                         tf.w) AS rk
      FROM tf JOIN df ON tf.w = df.w)
WHERE rk <= 5
""")
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive terms: top-5 tokens by tf/df — term
    frequency in the source over corpus-wide document frequency, the
    log-free tf-idf kernel (same ranking; a libm log would hang the
    cross-engine hash on ULP differences, the `bigram_lift_topk`
    lesson). Profiles what vocabulary makes each crawl/dump different —
    the text-analysis companion to `corpus_mix_weights`.

    Plan: two map-side-combinable counts (per-(source, token) tf and
    per-token distinct-doc df — vocabulary-sized, not corpus-sized),
    one equi-join on token, then a per-source window top-5 whose
    partition count is |sources| (tiny); the ordering (score desc,
    token) is total, so the cut is deterministic in both engines."""
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    tok = (d.select("doc_id", "source", TXT.tokens("text").alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("doc_id", "source", F.explode("_toks").alias("w")))
    # Collapse occurrences to per-(doc, token) counts once (a doc has
    # ONE source, so the rows are unique on (doc, w)); tf sums the
    # counts, df counts the rows — both read the persisted subtree
    # instead of re-tokenizing the corpus.
    dw = _tracked_persist(
        tok.groupBy("doc_id", "source", "w").agg(F.count("*").alias("c")))
    tf = dw.groupBy("source", "w").agg(F.sum("c").alias("tf"))
    df = dw.groupBy("w").agg(F.count("*").alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("source").orderBy(score.desc(), "w")
    return (tf.join(df, "w")
              .withColumn("rk", F.row_number().over(w))
              .where(F.col("rk") <= 5)
              .select("source", F.col("w").alias("token"), "tf", "df",
                      score.alias("score"),
                      F.col("rk").cast("bigint").alias("rk")))


@query("ngram_novelty_scores", oracle=r"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
g AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] AS gram
  FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - 1, 0))) AS i
        FROM toks WHERE len(t) >= 2)),
firsts AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
SELECT g.doc_id,
       count(*) AS n_distinct,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*) AS novelty
FROM g JOIN firsts f ON f.gram = g.gram
GROUP BY g.doc_id
""")
def q_ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    bigrams never seen in any earlier document (first occurrence =
    min doc_id over the corpus). The memorization/contribution metric a
    curriculum or data-mixing pass ranks documents by — a doc whose
    grams all appeared before adds nothing; a high-novelty doc extends
    corpus coverage. Deterministic: ingest order is the doc_id order.

    Scale shape: per-doc distinct grams are array-local; the
    first-occurrence table is one combinable MIN agg shuffled on the
    gram key (vocabulary-sized); the join back is the same gram-keyed
    shuffle reused; the final per-doc rollup is combinable. No step
    holds more than (gram, min_id) state — the novelty twin of the
    `doc_dup_ngram_stats` zero-shuffle intra-doc gate."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TXT.tokens("text").alias("_toks")) \
         .where(F.size("_toks") >= 2)
    grams = F.array_distinct(TXT.bigrams("_toks"))
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # (doc, distinct gram) is consumed by BOTH the first-occurrence
    # MIN and the join-back — persist it (lazy) so the corpus is
    # tokenized once, not twice.
    g = _tracked_persist(
        t.select("doc_id", F.explode(grams).alias("gram")))
    firsts = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    new_flag = F.when(F.col("first_doc") == F.col("doc_id"), 1) \
                .otherwise(0)
    return (g.join(firsts, "gram")
             .groupBy("doc_id")
             .agg(F.count("*").alias("n_distinct"),
                  F.sum(new_flag).alias("n_new"),
                  (F.sum(new_flag).cast("double") / F.count("*"))
                  .alias("novelty")))


_ZIPF_TOPK = 100

@query("zipf_rank_freq", oracle=rf"""
WITH toks AS (
  SELECT string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
counted AS (
  SELECT bigram AS token, count(*) AS freq
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2)
  GROUP BY bigram),
ranked AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM counted)
SELECT token, freq, rank, rank * freq AS rank_x_freq
FROM ranked WHERE rank <= {_ZIPF_TOPK}
""")
def q_zipf_rank_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile over the BIGRAM vocabulary (the
    unigram lexicon of the fixture is ~31 types — degenerate; bigrams
    give a ~1k-type distribution with a real tail): top-100 grams with
    their rank and the rank×frequency product (≈ constant under Zipf's
    law — the sanity check that a corpus is natural-language-like
    rather than boilerplate-dominated; a flat product curve with a
    sudden cliff is the signature of template spam). Exact integer
    counts; the product stays integer so the oracle hash has no float.

    Plan: the gram build is array-local per doc; one combinable count
    shuffled on the gram key, then TakeOrderedAndProject for the global
    cut; the rank window runs on the 100 survivors (single tiny
    partition by construction — the cut and the window share the same
    total order, so rank-after-cut equals rank-before-cut)."""
    from distributed_deduplicator_spark.operators.relational import (
        topk_global)
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    t = d.select(TXT.tokens("text").alias("_toks")) \
         .where(F.size("_toks") >= 2)
    grams = TXT.bigrams("_toks")
    counted = (t.select(F.explode(grams).alias("token"))
                .groupBy("token").agg(F.count("*").alias("freq")))
    top = topk_global(counted, [F.col("freq").desc(), F.col("token")],
                      _ZIPF_TOPK)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return (top.withColumn("rank", F.row_number().over(w).cast("bigint"))
               .withColumn("rank_x_freq", F.col("rank") * F.col("freq")))


_VOCAB_BUCKETS = 10

@query("vocab_growth", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
tok AS (SELECT doc_id, bigram AS w
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i+1])) AS bigram
              FROM toks WHERE len(t) >= 2)),
firsts AS (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY w),
width AS (SELECT (max(doc_id) // {_VOCAB_BUCKETS}) + 1 AS bw
          FROM documents),
b AS (
  SELECT CAST(first_doc // bw AS BIGINT) AS bucket,
         count(*) AS n_new_tokens
  FROM firsts CROSS JOIN width
  GROUP BY 1)
SELECT bucket, n_new_tokens,
       CAST(sum(n_new_tokens) OVER (ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM b
""")
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law) over the BIGRAM vocabulary
    (the fixture's unigram lexicon saturates inside the first decile —
    degenerate): distinct grams first seen per decile of the ingest
    order, with the cumulative vocabulary size — the curve a
    tokenizer-training or dedup-effectiveness review reads (sub-linear
    growth = healthy natural corpus; linear growth = unbounded
    noise/IDs; a flat tail = the corpus has saturated and more data
    adds no new vocabulary).

    Plan: one combinable MIN per gram (vocabulary-sized state), the
    bucket width from a 1-row MAX broadcast (no driver-side count), a
    10-row rollup, and a 10-row cumulative window — nothing scales with
    corpus size past the first aggregate."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", TXT.tokens("text").alias("_toks")) \
         .where(F.size("_toks") >= 2)
    grams = TXT.bigrams("_toks")
    tok = t.select("doc_id", F.explode(grams).alias("w"))
    firsts = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    width = d.agg((F.floor(F.max("doc_id") / _VOCAB_BUCKETS) + 1)
                  .alias("bw"))
    b = (firsts.crossJoin(F.broadcast(width))
               .select(F.floor(F.col("first_doc") / F.col("bw"))
                        .cast("bigint").alias("bucket"))
               .groupBy("bucket")
               .agg(F.count("*").alias("n_new_tokens")))
    from pyspark.sql import Window
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return b.withColumn("cum_vocab", F.sum("n_new_tokens").over(w))


@query("token_simpson_diversity", oracle=r"""
WITH toks AS (
  SELECT source,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
tok AS (SELECT source, u.w AS w FROM toks, unnest(toks.t) AS u(w)),
c AS (SELECT source, w, count(*) AS cnt FROM tok GROUP BY source, w)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       count(*) AS vocab,
       CAST(sum(cnt * (cnt - 1)) AS DOUBLE)
         / (CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) - 1 AS DOUBLE))
         AS simpson
FROM c GROUP BY source
""")
def q_token_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token diversity via Simpson's index — the probability
    two random token occurrences are the same type. The log-free
    diversity metric (Shannon entropy would hang the cross-engine hash
    on libm ULP differences; Simpson is exact integer sums + one
    fixed-order double expression). High index = repetitive/templated
    source; low = diverse vocabulary — the corpus-mixing signal next to
    `corpus_mix_weights`' volume shares.

    Plan: one combinable (source, token) count, then a source-sized
    rollup of exact integer moments. The denominator multiplies as
    DOUBLE (n² overflows BIGINT once a source passes ~3e9 tokens)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(TXT.tokens("text")).alias("w"))
    c = tok.groupBy("source", "w").agg(F.count("*").alias("cnt"))
    n = F.sum("cnt")
    sum_cc = F.sum(F.col("cnt") * (F.col("cnt") - 1))
    return (c.groupBy("source")
             .agg(n.alias("n_tokens"),
                  F.count("*").alias("vocab"),
                  (sum_cc.cast("double")
                   / (n.cast("double") * (n - 1).cast("double")))
                  .alias("simpson")))


_BPE_TOPK = 50

@query("bpe_pair_counts", oracle=rf"""
WITH toks AS (
  SELECT string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
words AS (
  SELECT u.w AS word, count(*) AS freq
  FROM toks, unnest(toks.t) AS u(w)
  GROUP BY u.w),
pairs AS (
  SELECT word, freq, substr(word, i, 1) AS lft, substr(word, i + 1, 1) AS rgt
  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM words WHERE length(word) >= 2)),
agg AS (
  SELECT lft, rgt,
         CAST(sum(freq) AS BIGINT) AS pair_count,
         count(DISTINCT word) AS n_words
  FROM pairs GROUP BY lft, rgt)
SELECT lft, rgt, pair_count, n_words
FROM agg
ORDER BY pair_count DESC, lft, rgt
LIMIT {_BPE_TOPK}
""")
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts — the inner loop of BPE
    tokenizer training (Sennrich et al., ACL'16): the top-{50} character
    pairs by occurrence count, each occurrence weighted by its word's
    corpus frequency, plus how many distinct words contain the pair.
    Run iteratively with a merge step, this IS tokenizer training; one
    round of it is the corpus statistic a tokenizer-budget review reads.

    Plan — the reason BPE training is feasible at 100 TB: the ONLY
    corpus-scale operation is the word-frequency aggregate (explode →
    map-side-combinable count, vocabulary-sized result). The pair
    explosion, pair aggregate, and top-k all run on the vocabulary
    table (≪ corpus; bounded by Σ|word| over distinct words), exactly
    how production BPE trainers count on word frequencies, never raw
    text. Top-k via the rank-cut operator, total order (count desc,
    pair) fully deterministic."""
    from distributed_deduplicator_spark.operators.relational import (
        topk_global)
    d = load_table(spark, sf_dir, "documents")
    words = (d.select(F.explode(TXT.tokens("text")).alias("word"))
              .groupBy("word").agg(F.count("*").alias("freq")))
    pair_structs = F.expr(
        "transform(sequence(1, length(word) - 1), "
        "i -> struct(substring(word, i, 1) AS lft, "
        "substring(word, i + 1, 1) AS rgt))")
    pairs = (words.where(F.length("word") >= 2)
                  .select("word", "freq",
                          F.explode(pair_structs).alias("p")))
    agg = (pairs.groupBy(F.col("p.lft").alias("lft"),
                         F.col("p.rgt").alias("rgt"))
                .agg(F.sum("freq").alias("pair_count"),
                     F.countDistinct("word").alias("n_words")))
    return topk_global(agg, [F.col("pair_count").desc(),
                             F.col("lft"), F.col("rgt")], _BPE_TOPK)


_SPAN_N = 5     # token shingle width for duplicated-span detection

@query("dup_span_stats", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i:i + {_SPAN_N} - 1], ' ') AS gram
  FROM (SELECT doc_id, t,
               unnest(range(1, len(t) - {_SPAN_N} + 2)) AS i
        FROM toks WHERE len(t) >= {_SPAN_N})),
cnt AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
dup AS (SELECT o.doc_id, o.pos FROM occ o JOIN cnt USING (gram)),
isl AS (SELECT doc_id, pos,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                 AS grp
        FROM dup),
per_isl AS (SELECT doc_id, grp, count(*) AS len FROM isl
            GROUP BY doc_id, grp),
per_doc AS (SELECT doc_id, max(len) AS max_len,
                   count(*) AS n_spans,
                   CAST(sum(len) AS BIGINT) AS n_dup_pos
            FROM per_isl GROUP BY doc_id),
base AS (SELECT doc_id, len(t) - {_SPAN_N} + 1 AS n_positions
         FROM toks WHERE len(t) >= {_SPAN_N})
SELECT b.doc_id,
       CAST(b.n_positions AS BIGINT) AS n_positions,
       CAST(COALESCE(p.n_dup_pos, 0) AS BIGINT) AS n_dup_positions,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(CASE WHEN p.max_len IS NULL THEN 0
                 ELSE p.max_len + {_SPAN_N} - 1 END AS BIGINT)
         AS max_dup_span_tokens,
       CAST(COALESCE(p.n_dup_pos, 0) AS DOUBLE)
         / CAST(b.n_positions AS DOUBLE) AS dup_cover_frac
FROM base b LEFT JOIN per_doc p USING (doc_id)
""")
def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-flavored duplicated-SPAN statistics (Lee et al.
    2022, arXiv:2107.06499 §4.1): a token position is duplicated when
    its 5-gram occurs at >= 2 sites anywhere in the corpus
    (cross- OR intra-document, the ExactSubstr convention); runs of
    consecutive duplicated positions chain into maximal duplicated
    spans — a position run of L grams covers L + n - 1 tokens, exactly
    the substring a suffix-array dedup would cut. Per doc: how many
    spans, the longest one, and the covered fraction — the inputs to a
    cut-vs-drop decision that n-gram SET overlap (``doc_dup_ngram_stats``)
    cannot see because it ignores adjacency.

    Plan (`operators/pipeline.dup_span_stats_df`): one combinable gram
    count, the count>=2 set semi-joins back onto the (doc, pos) stream
    on the gram key (the same shuffle-on-gram shape as
    `benchmark_decontaminate` — never all-pairs), islands are a
    per-doc window over ONLY duplicated positions (skew-bounded: a
    doc's dup positions <= its length), and the rollups are
    exact-integer combinable aggs. The operator's `hash_grams` swaps
    gram strings for xxhash64 keys at 100 TB (8-byte shuffle keys,
    collision odds 2^-64 per pair; parity-gated hash-vs-string in
    tests/test_corpus_analysis_ops.py); kept as strings here so the
    DuckDB oracle is value-exact."""
    from distributed_deduplicator_spark.operators.pipeline import (
        dup_span_stats_df)
    d = load_table(spark, sf_dir, "documents")
    out = dup_span_stats_df(d, "doc_id", "text", n=_SPAN_N)
    return out.withColumnRenamed("id", "doc_id")


@query("exactsubstr_prune", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents WHERE text IS NOT NULL),
occ AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i:i + {_SPAN_N} - 1], ' ') AS gram
  FROM (SELECT doc_id, t,
               unnest(range(1, len(t) - {_SPAN_N} + 2)) AS i
        FROM toks WHERE len(t) >= {_SPAN_N})),
marked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY gram) AS c
  FROM occ),
cut AS (SELECT doc_id, pos FROM marked WHERE c >= 2 AND rn > 1),
covered AS (
  SELECT DISTINCT doc_id, pos + j AS tok_idx
  FROM cut, (SELECT unnest(range(0, {_SPAN_N})) AS j)),
tokrows AS (
  SELECT doc_id, i AS tok_idx, t[i] AS tok
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
ret AS (
  SELECT r.doc_id, r.tok_idx, r.tok FROM tokrows r
  WHERE NOT EXISTS (SELECT 1 FROM covered c
                    WHERE c.doc_id = r.doc_id AND c.tok_idx = r.tok_idx)),
ragg AS (
  SELECT doc_id, count(*) AS n_ret,
         md5(string_agg(tok, ' ' ORDER BY tok_idx)) AS h
  FROM ret GROUP BY doc_id),
base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_tokens - COALESCE(g.n_ret, 0) AS BIGINT)
         AS n_removed_tokens,
       CAST(COALESCE(g.n_ret, 0) AS DOUBLE) / b.n_tokens AS retained_frac,
       COALESCE(g.h, md5('')) AS retained_md5
FROM base b LEFT JOIN ragg g USING (doc_id)
""")
def q_exactsubstr_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup APPLIED (`operators/pipeline.exactsubstr_prune`
    — Lee et al. 2022 keep-one substring cutting): every duplicated
    {n}-token window loses all but its canonical (minimal (doc, pos))
    occurrence, covered tokens are removed, and the md5 of each doc's
    RETAINED token sequence rides the result — so the value oracle
    checks the pruned TEXT itself cross-engine, not just counts.
    `dup_span_stats` is this operator's decision-input sibling (same
    5-gram duplication convention); this one performs the cut. Window
    positions are 0-based in Spark and 1-based in the oracle — both
    self-consistent with their own token streams, and canonical
    selection only compares positions WITHIN a gram, so the results
    align exactly. All-integer counts, one IEEE division, md5 strings:
    full value oracle."""
    from distributed_deduplicator_spark.operators.pipeline import (
        exactsubstr_prune)
    d = load_table(spark, sf_dir, "documents")
    out = exactsubstr_prune(d, "doc_id", "text", n=_SPAN_N)
    return out.select(F.col("id").alias("doc_id"), "n_tokens",
                      "n_removed_tokens", "retained_frac",
                      "retained_md5")


_HIT_COLS = tuple(f"hits_{lg}" for lg in ("en", "de", "fr", "es", "zh"))


def _lang_pred(d: DataFrame) -> DataFrame:
    """(doc_id, labeled_lang, pred_lang) via the stopword-kernel
    heuristic — the shared predictor behind `text_lang_id` (per-doc
    rows) and `lang_confusion_matrix` (the aggregate monitor). Ties
    resolve in fixed lang order (en,de,fr,es,zh); zero hits → 'und'."""
    hits = {lg: TXT.stopword_hits("text", lg).alias(f"hits_{lg}")
            for lg in ("en", "de", "fr", "es", "zh")}
    scored = d.select(F.col("doc_id"), F.col("lang").alias("labeled_lang"),
                      *hits.values())
    best = F.greatest(*[F.col(c) for c in _HIT_COLS])
    pred = (F.when(best == 0, F.lit("und"))
             .when(F.col("hits_en") == best, F.lit("en"))
             .when(F.col("hits_de") == best, F.lit("de"))
             .when(F.col("hits_fr") == best, F.lit("fr"))
             .when(F.col("hits_es") == best, F.lit("es"))
             .otherwise(F.lit("zh")))
    return scored.withColumn("pred_lang", pred)


@query("lang_confusion_matrix", oracle=rf"""
WITH scores AS (
  {_LANG_SCORES_SQL}),
pred AS (
  SELECT labeled_lang,
         {_LANG_PRED_CASE_SQL} AS pred_lang
  FROM scores),
cm AS (SELECT labeled_lang, pred_lang, count(*) AS n_docs
       FROM pred GROUP BY labeled_lang, pred_lang),
tot AS (SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_labeled
        FROM cm GROUP BY labeled_lang)
SELECT cm.labeled_lang, cm.pred_lang, cm.n_docs, tot.n_labeled,
       CAST(cm.n_docs AS DOUBLE) / CAST(tot.n_labeled AS DOUBLE) AS share
FROM cm JOIN tot USING (labeled_lang)
""")
def q_lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-tag confusion matrix: the declared `lang` column vs the
    stopword-kernel prediction, with each cell's share of its labeled
    row — the mislabel monitor a multilingual ingest watches (an
    off-diagonal cell growing over ingests means a source started
    shipping wrongly-tagged or mixed-language documents; the 'und'
    column isolates docs the kernel cannot place at all).

    Plan: the per-doc scoring is pure scan-stage codegen (fixed literal
    regex counts, no shuffle); the matrix is one combinable groupBy on
    a ≤ |langs|·(|langs|+1) key space, and the row-margin join runs on
    that tiny aggregate — nothing after the first aggregate scales with
    corpus size. The share is one double division of exact counts, so
    the cross-engine value hash holds."""
    d = load_table(spark, sf_dir, "documents")
    cm = (_lang_pred(d).groupBy("labeled_lang", "pred_lang")
                       .agg(F.count("*").alias("n_docs")))
    tot = cm.groupBy("labeled_lang").agg(F.sum("n_docs").alias("n_labeled"))
    return (cm.join(F.broadcast(tot), "labeled_lang")
              .select("labeled_lang", "pred_lang", "n_docs", "n_labeled",
                      (F.col("n_docs").cast("double")
                       / F.col("n_labeled").cast("double")).alias("share")))


_COVERAGE_CUTS = (16, 64, 256, 1024, 4096)

@query("vocab_coverage_topk", oracle=rf"""
WITH toks AS (
  SELECT string_split_regex(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS t
  FROM documents),
counted AS (
  SELECT bigram AS token, count(*) AS freq
  FROM (SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2)
  GROUP BY bigram),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM counted),
tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total_freq,
               count(*) AS n_vocab FROM counted),
cuts(k) AS (VALUES (16), (64), (256), (1024), (4096))
SELECT CAST(k AS BIGINT) AS k,
       CAST(sum(CASE WHEN rank <= k THEN freq ELSE 0 END) AS BIGINT)
         AS cum_freq,
       total_freq, n_vocab,
       CAST(sum(CASE WHEN rank <= k THEN freq ELSE 0 END) AS DOUBLE)
         / CAST(total_freq AS DOUBLE) AS coverage
FROM ranked CROSS JOIN tot CROSS JOIN cuts
GROUP BY k, total_freq, n_vocab
""")
def q_vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage of a top-K frequency-cut vocabulary, at
    K ∈ {16,64,256,1024,4096}, over the bigram vocabulary (the fixture's
    unigram lexicon is ~31 types — every cut saturates) — the
    tokenizer-vocab-sizing curve: the smallest K whose coverage clears
    a target (say 99.5%) is the vocab size to train, and the 1−coverage
    remainder is the OOV/byte-fallback rate the model will pay.
    Complements `zipf_rank_freq` (the shape of the head) and
    `vocab_growth` (new types over ingest order) with the cumulative
    mass actually captured at a given cut.

    Plan: one combinable gram count (vocabulary-sized state), a
    TakeOrderedAndProject for the max-K head — the rank window then
    runs on the 4096 survivors, a single tiny partition by
    construction, never the corpus — and the grand totals ride in on a
    1-row broadcast (the waived scalar-subquery BNLJ shape). Coverage
    is one double division of exact BIGINT masses, so the cross-engine
    value hash holds."""
    from distributed_deduplicator_spark.operators.relational import (
        topk_global)
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    t = d.select(TXT.tokens("text").alias("_toks")) \
         .where(F.size("_toks") >= 2)
    grams = TXT.bigrams("_toks")
    from distributed_deduplicator_spark.operators.similarity import (
        _tracked_persist)
    # persisted: feeds both the top-K cut and the grand totals —
    # unpersisted, the corpus tokenizes and counts twice per run
    counted = _tracked_persist(
        t.select(F.explode(grams).alias("token"))
         .groupBy("token").agg(F.count("*").alias("freq")))
    top = topk_global(counted, [F.col("freq").desc(), F.col("token")],
                      max(_COVERAGE_CUTS))
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    wide = ranked.agg(*[
        F.sum(F.when(F.col("rank") <= k, F.col("freq")).otherwise(0))
         .alias(f"c{k}") for k in _COVERAGE_CUTS])
    stack_args = ", ".join(f"CAST({k} AS BIGINT), c{k}"
                           for k in _COVERAGE_CUTS)
    cut_rows = wide.select(F.expr(
        f"stack({len(_COVERAGE_CUTS)}, {stack_args}) AS (k, cum_freq)"))
    tot = counted.agg(F.sum("freq").alias("total_freq"),
                      F.count("*").alias("n_vocab"))
    # total_freq IS NULL ⇔ the corpus has no bigrams at all; the
    # global agg still emits one all-NULL row where the oracle's
    # CROSS JOIN over the empty vocab emits zero — drop it so both
    # engines agree on the degenerate corpus
    return (cut_rows.crossJoin(F.broadcast(tot))
                    .where(F.col("total_freq").isNotNull())
                    .select("k", "cum_freq", "total_freq", "n_vocab",
                            (F.col("cum_freq").cast("double")
                             / F.col("total_freq").cast("double"))
                            .alias("coverage")))


_TLQ_PCTS = (50, 90, 99)

@query("token_length_exact_quantiles", oracle=rf"""
WITH n AS (
  SELECT source,
         len(string_split_regex(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '))
           AS n_tok
  FROM documents),
cnt AS (SELECT source, n_tok, count(*) AS c FROM n GROUP BY source, n_tok),
cum AS (
  SELECT source, n_tok, c,
         sum(c) OVER (PARTITION BY source ORDER BY n_tok
                      ROWS UNBOUNDED PRECEDING) AS cum_c,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM cnt)
SELECT source, CAST(max(tot) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN cum_c >= (tot * 50 + 99) // 100
                THEN n_tok END) AS BIGINT) AS p50_tok,
       CAST(min(CASE WHEN cum_c >= (tot * 90 + 99) // 100
                THEN n_tok END) AS BIGINT) AS p90_tok,
       CAST(min(CASE WHEN cum_c >= (tot * 99 + 99) // 100
                THEN n_tok END) AS BIGINT) AS p99_tok
FROM cum GROUP BY source
""")
def q_token_length_exact_quantiles(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """EXACT per-source token-length percentiles (p50/p90/p99,
    percentile_disc semantics) — the oracle-checked exact twin of the
    sketch-based `text_length_quantiles`, computed WITHOUT sorting the
    corpus: token lengths are small integers, so a per-(source, length)
    count table is tiny at any corpus size; a cumulative window over
    that table finds the smallest length whose cumulative count clears
    ceil(q·n). The ceil threshold is exact integer arithmetic
    ((n·p + 99) div 100) — no float percentile-position wobble to
    disagree across engines, unlike interpolating percentile_cont.

    This count-table quantile is the 100 TB pattern for ANY
    small-cardinality measure (lengths, scores, buckets): one
    combinable count, windows over the aggregate, never a global sort
    of raw rows."""
    from distributed_deduplicator_spark.operators.relational import (
        count_table_quantiles)
    d = load_table(spark, sf_dir, "documents")
    n = d.select("source", TXT.token_count("text").alias("n_tok"))
    out = count_table_quantiles(n, ["source"], "n_tok", _TLQ_PCTS)
    return out.select(
        "source", F.col("n_rows").alias("n_docs"),
        *[F.col(f"p{p}").alias(f"p{p}_tok") for p in _TLQ_PCTS])
