"""Similarity / near-dup queries (SURVEY.md Phase 5; the north-star
LLM-pipeline suite): exact n-gram Jaccard join (oracle-checked),
MinHash-LSH near-dup (rows-only; verified against the exact join in
tests), SimHash and winnowing pairs (rows-only; exactness
property-tested), an ensemble 2-of-3 consensus of the three,
dedup clusters (recursive-CTE oracle) with cluster-level keep-one,
brute-force cosine top-k (oracle-checked), blocked exact cosine
near-dup (oracle-checked), and three ANN scale paths —
random-hyperplane LSH, IVF-flat, IVF-PQ — all recall-gated against
brute force."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import similarity as S
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.sources import load_table
from distributed_deduplicator_spark.sources.fixtures import table_row_count

# DuckDB twin of functions.text.normalize + tokens
_NORM_SQL = (r"string_split_regex(trim(regexp_replace(regexp_replace("
             r"lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')")

_JACCARD_THRESHOLD = 0.35
_NGRAM = 3

# Shared recursive-closure CTE chain for every closure-oracled query
# (expects a `toks(doc_id, t)` CTE in scope): exact 3-gram Jaccard
# pairs -> symmetric edges -> reachability -> min-label components.
# One definition so the ground-truth SQL cannot drift between the
# queries it gates.
_CLOSURE_SQL = rf"""grams AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
  FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - {_NGRAM - 1}, 0))) AS i
        FROM toks)),
sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common)
        >= {_JACCARD_THRESHOLD}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u AS id, u AS r FROM edges
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)"""

@query("jaccard_ngram_pairs", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
  FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - {_NGRAM - 1}, 0))) AS i
        FROM toks)),
sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, sa.set_size AS size_a, sb.set_size AS size_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common)
      >= {_JACCARD_THRESHOLD}
""")
def q_jaccard_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join over documents — the
    ground-truth near-dup operator (explode → shingle join → count;
    no cross join)."""
    d = load_table(spark, sf_dir, "documents")
    return S.jaccard_similarity_join(d, "doc_id", "text",
                                     n=_NGRAM, threshold=_JACCARD_THRESHOLD)


@query("minhash_near_dup")  # rows-only: LSH recall is probabilistic by design
def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) candidate generation with exact-Jaccard
    verification (precision 1.0). Deterministic seeded xxhash64; recall
    vs the exact join asserted in tests/test_similarity.py."""
    d = load_table(spark, sf_dir, "documents")
    return S.minhash_near_dup(d, "doc_id", "text", n=_NGRAM,
                              num_hashes=64, bands=16, rows=4,
                              threshold=_JACCARD_THRESHOLD)


@query("simhash_fingerprints")  # rows-only: xxhash64 has no DuckDB twin
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints (Charikar) for every document —
    one explode + 64 map-side-combinable votes, all codegen."""
    d = load_table(spark, sf_dir, "documents")
    return S.simhash64(d, "doc_id", "text")


@query("simhash_near_dup_pairs")  # rows-only: xxhash64 has no DuckDB twin
def q_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs within hamming distance 3 of each other's
    SimHash: pigeonhole block-combination equi-join (any pair within
    radius k matches exactly on ≥1 of the C(blocks, k) combinations of
    blocks−k blocks; block count auto-sized to corpus cardinality so
    candidate volume stays ~linear at any scale) + exact bit_count
    verify — the hamming analog of MinHash banding. Exactness of the
    pigeonhole candidate generation is property-tested in
    tests/test_similarity.py."""
    d = load_table(spark, sf_dir, "documents")
    return S.simhash_near_dup(d, "doc_id", "text", max_hamming=3,
                              n=table_row_count(sf_dir, "documents"))


@query("winnow_near_dup_pairs")  # rows-only: xxhash64 has no DuckDB twin
def q_winnow_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥2 winnowing fingerprints — near-dup by
    shared-substring evidence (robust to reordering/insertion, unlike
    whole-document hashes): explode fingerprints → equi-join → count,
    the same sub-quadratic shape as every bucketed join here."""
    d = load_table(spark, sf_dir, "documents")
    return S.winnow_near_dup(d, "doc_id", "text", k=5, window=4,
                             min_shared=2)


_TOPK = 5
_NQUERIES = 8

@query("cosine_topk", oracle=f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {_NQUERIES}),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, nv) AS cosine
  FROM q JOIN c ON query_id <> neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine_r
FROM ranked WHERE rank <= {_TOPK}
""")
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 8 query vectors — brute-force
    baseline: broadcast queries, scan corpus once, window top-k.
    Cosine via higher-order array functions (JVM, no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _NQUERIES)
    out = S.cosine_topk_bruteforce(emb, q, k=_TOPK)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 6).alias("cosine_r"))


@query("embedding_norm_stats", oracle="""
WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
n AS (SELECT vec_id, label,
             sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum'))
               AS nrm
      FROM d)
SELECT label, count(*) AS n_vecs,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       round(quantile_cont(nrm, 0.5), 6) AS p50_norm
FROM n GROUP BY label
""")
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile (the sanity pass before any
    similarity work — catches unnormalized or degenerate embeddings).
    The norm is a per-row array fold (fixed evaluation order, so
    bit-identical across engines); the grouped stats are min/max/
    median — all order-independent, hence exactly oracle-checkable
    unlike a floating-point mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    ed = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(ed, F.lit(0.0), lambda a, v: a + v * v))
    n = emb.select("vec_id", "label", nrm.alias("nrm"))
    return (n.groupBy("label")
             .agg(F.count("*").alias("n_vecs"),
                  F.round(F.min("nrm"), 6).alias("min_norm"),
                  F.round(F.max("nrm"), 6).alias("max_norm"),
                  F.round(F.expr("percentile(nrm, 0.5)"), 6)
                  .alias("p50_norm")))


_COS_THRESHOLD = 0.35

@query("embedding_cosine_neardup", oracle=f"""
WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS block,
       round(list_cosine_similarity(a.e, b.e), 6) AS cosine_r
FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e), 6) >= {_COS_THRESHOLD}
""")
def q_embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on label — the exact
    member of the embedding-dedup family (LSH/IVF are its approximate
    scale paths). Hash equi-join on the block key bounds the verify at
    Σ|block|², never n²; cosine is a JVM fold, no UDF. Threshold
    compares the 6-dp rounded cosine on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_neardup_blocked(emb, "label",
                                    threshold=_COS_THRESHOLD)


_SEMDECON_MOD = 97   # vec_id % 97 == 0 plays the benchmark embedding set
_SEMDECON_TAU = 0.25  # flag threshold on the 6-dp rounded cosine

@query("semantic_decontaminate", oracle=f"""
WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings),
bench AS (SELECT * FROM d WHERE vec_id % {_SEMDECON_MOD} = 0),
train AS (SELECT * FROM d WHERE vec_id % {_SEMDECON_MOD} <> 0),
hits AS (
  SELECT t.vec_id,
         round(list_cosine_similarity(t.e, b.e), 6) AS c
  FROM train t CROSS JOIN bench b)
SELECT vec_id,
       CAST(count(CASE WHEN c >= {_SEMDECON_TAU} THEN 1 END) AS BIGINT)
         AS n_bench_hits,
       max(c) AS max_cosine_r
FROM hits GROUP BY vec_id
HAVING count(CASE WHEN c >= {_SEMDECON_TAU} THEN 1 END) > 0
""")
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding-space member
    of the decontamination family (`benchmark_decontaminate` /
    `decontaminate_bloom` catch verbatim n-gram overlap; this catches
    paraphrases those miss): every train vector whose cosine to ANY
    benchmark vector reaches the threshold, with the hit count and the
    max cosine as the audit columns.

    Scale shape: the benchmark set is the SMALL side by construction
    (eval suites are thousands of rows; the corpus is the 100 TB
    side), so it broadcasts and the corpus streams map-side through
    one scan — n_train × n_bench JVM-fold cosines, no shuffle until
    the per-id aggregate, which is combinable. Threshold and max both
    operate on the 6-dp rounded cosine (repo float discipline), so
    the flag set and values are engine-exact — full value oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    bench = (emb.where(F.col("vec_id") % _SEMDECON_MOD == 0)
                .select(F.col("vec_id").alias("_bid"),
                        F.col("embedding").alias("_be")))
    from distributed_deduplicator_spark.sources.fixtures import fanout
    # fan the single-split fixture scan out so the n_train × n_bench
    # cosine stage runs at cluster parallelism (no-op at real scale,
    # where the corpus scans as thousands of splits)
    train = fanout(emb.where(F.col("vec_id") % _SEMDECON_MOD != 0)
                      .select("vec_id", F.col("embedding").alias("_te")))
    scored = (train.crossJoin(F.broadcast(bench))
                   .select("vec_id",
                           F.round(S.cosine(F.col("_te"), F.col("_be")), 6)
                            .alias("_c")))
    return (scored.groupBy("vec_id")
                  .agg(F.sum(F.when(F.col("_c") >= _SEMDECON_TAU, 1))
                        .cast("bigint").alias("n_bench_hits"),
                       F.max("_c").alias("max_cosine_r"))
                  .where(F.col("n_bench_hits") > 0))


@query("near_dup_clusters")  # rows-only: iterative — not SQL-expressible
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of MinHash near-dup pairs → dedup clusters
    (doc_id, cluster_id = min reachable id). What a pipeline keeps is
    one doc per CLUSTER, not per pair: A~B and B~C must collapse to one
    survivor even when A~C was never emitted. Iterative min-label
    propagation, O(diameter) rounds; exact-match vs a union-find
    reference in tests/test_similarity.py."""
    d = load_table(spark, sf_dir, "documents")
    pairs = S.minhash_near_dup(d, "doc_id", "text", n=_NGRAM,
                               num_hashes=64, bands=16, rows=4,
                               threshold=_JACCARD_THRESHOLD)
    return S.connected_components(pairs)


@query("jaccard_dedup_clusters", oracle=rf"""
WITH RECURSIVE
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
{_CLOSURE_SQL}
SELECT id, cluster_id FROM cc
""")
def q_jaccard_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the EXACT Jaccard near-dup pairs — the
    deterministic twin of near_dup_clusters, and the one place an
    iterative Spark algorithm gets a full value-level oracle: the
    driver-loop min-label propagation must equal DuckDB's recursive-CTE
    reachability closure, node for node. Executes O(diameter) rounds,
    one shuffle each."""
    d = load_table(spark, sf_dir, "documents")
    pairs = S.jaccard_similarity_join(d, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    return S.connected_components(pairs)


@query("jaccard_keep_one", oracle=rf"""
WITH RECURSIVE
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
{_CLOSURE_SQL}
SELECT d.doc_id,
       COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id = COALESCE(cc.cluster_id, d.doc_id) AS keep
FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
""")
def q_jaccard_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup verdict: exact-Jaccard pairs →
    connected components → FIRST doc per cluster keeps, the rest drop
    — the reference's first-wins arbitration
    (DeduplicationProvider.kt:67-94) applied per near-dup CLUSTER, with
    every doc (singletons included) getting a row. This is the full
    'dedup the corpus' pipeline a training run consumes, value-checked
    against DuckDB's recursive-CTE closure."""
    d = load_table(spark, sf_dir, "documents")
    pairs = S.jaccard_similarity_join(d, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    cc = S.connected_components(pairs)
    return (d.select("doc_id")
             .join(cc, d["doc_id"] == cc["id"], "left")
             .select(d["doc_id"],
                     F.coalesce(cc["cluster_id"], d["doc_id"])
                      .alias("cluster_id"))
             .withColumn("keep", F.col("doc_id") == F.col("cluster_id")))


@query("ann_lsh_topk")  # rows-only: approximate by construction
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-vectors approximate top-5 via multi-table random-hyperplane
    LSH — the 100 TB path (per-bucket joins, Σ|bucket|² ≪ n²). Recall
    vs brute force asserted in tests/test_similarity.py. Plane AND
    table counts auto-sized from parquet-footer row stats (no job at
    build time): a fixed table count loses recall as the corpus grows
    — 0.86 → 0.537 recall@5 across one 10× step under the old 8-table
    default; the n-scaled default holds ≥0.9 at both gate SFs under
    the same max(2048, 128√n)-candidates/query budget the IVF paths
    run (plane count round()s onto the measured recall-per-second
    knee — BENCH.md round-10 LSH knob table)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, k=_TOPK,
                          n=table_row_count(sf_dir, "embeddings"))


@query("ann_ivfpq_topk")  # rows-only: approximate by construction
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-vectors approximate top-5 via IVF-PQ two-stage retrieval:
    IVF lists prune candidates, 32×16 Lloyd-refined
    product-quantization codes score them by ADC lookup (codes travel
    through the candidate join, never vectors), exact re-rank of the
    ADC top-16k. The memory-bound ANN shape for corpora whose vectors
    don't fit executor memory. Recall vs brute force asserted in
    tests/test_similarity.py (0.778 at the gate SF — the IVF list
    ceiling itself — and 0.757 at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_ivfpq_topk(emb, k=_TOPK,
                            n=table_row_count(sf_dir, "embeddings"))


@query("ann_ivf_topk")  # rows-only: approximate by construction
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-vectors approximate top-5 via an IVF-flat index (√n lists,
    auto nprobe = ⌈nlist^0.75⌉) — the partition-pruning ANN path, complementary to the
    hyperplane-LSH one. Recall vs brute force asserted in
    tests/test_similarity.py. nlist sized from parquet-footer row
    stats — no job at build time."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ann_ivf_topk(emb, k=_TOPK,
                          n=table_row_count(sf_dir, "embeddings"))


@query("ann_ivf_persisted_topk")  # rows-only: approximate by
# construction; contract: EQUALS ann_ivf_topk row-for-row (the
# deterministic centroids parquet-round-trip exactly) — equality gated
# in tests/test_similarity.py, recall covered by ann_ivf_topk's gates
def q_ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index LIFECYCLE: build the index once into session
    scratch (centroids + member lists as parquet —
    `ivf_index_build`), then answer top-5 retrieval for the whole
    corpus AGAINST THE STORED ARTIFACT (`ann_ivf_query_index`). This
    is how IVF actually deploys at 100 TB — one indexing batch job,
    every query batch thereafter scans the index instead of
    rebuilding it. Executes the build job at call time by nature,
    like the sink round-trips."""
    import hashlib

    from distributed_deduplicator_spark.scratch import scratch_path
    emb = load_table(spark, sf_dir, "embeddings")
    # stable per-(process, sf_dir) path: the build's overwrite writes
    # replace the previous index on repeated invocations in one
    # session instead of leaking one index copy per call
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    idx = scratch_path(f"ivf_index_{tag}")
    S.ivf_index_build(emb, idx,
                      n=table_row_count(sf_dir, "embeddings"))
    return S.ann_ivf_query_index(spark, idx, emb, k=_TOPK)


@query("near_dup_ensemble")  # rows-only: consensus of approximate
# voters has no SQL twin; the deterministic voters are
# property-tested and MinHash recall is gate-tested
def q_near_dup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup consensus: MinHash-LSH (token-set evidence),
    SimHash (weighted-feature evidence), and winnowing (shared-substring
    evidence) each nominate pairs; a pair survives with >= 2 of 3
    independent votes. The production pattern for high-precision corpus
    dedup — each detector has a different blind spot, and requiring
    agreement suppresses each one's false positives. All three voters
    share the shuffle discipline (banded/pigeonhole/fingerprint
    equi-joins, never n^2); the consensus itself is one tiny groupBy
    over nominated pairs. Exactness of the two deterministic voters is
    property-tested in tests/test_similarity.py; MinHash recall is
    gate-tested."""
    d = load_table(spark, sf_dir, "documents")
    mh = (S.minhash_near_dup(d, "doc_id", "text", n=_NGRAM,
                             num_hashes=64, bands=16, rows=4,
                             threshold=_JACCARD_THRESHOLD)
          .select("id_a", "id_b", F.lit("minhash").alias("method")))
    # radius 3 with n-sized block combinations (see simhash_near_dup):
    # candidate volume stays ~linear at any corpus size — never n²
    # (module docstring contract)
    sh = (S.simhash_near_dup(d, "doc_id", "text", max_hamming=3,
                             n=table_row_count(sf_dir, "documents"))
          .select("id_a", "id_b", F.lit("simhash").alias("method")))
    wn = (S.winnow_near_dup(d, "doc_id", "text", k=5, window=4,
                            min_shared=2)
          .select(F.col("id_a"), F.col("id_b"),
                  F.lit("winnow").alias("method")))
    votes = mh.unionByName(sh).unionByName(wn)
    return (votes.groupBy("id_a", "id_b")
                 .agg(F.count("*").alias("n_votes"),
                      F.array_sort(F.collect_list("method"))
                       .alias("methods"))
                 .where(F.col("n_votes") >= 2)
                 .select("id_a", "id_b", "n_votes",
                         F.concat_ws(",", "methods").alias("methods")))


_QUALITY_SQL = rf"""
(CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END
 + least(CAST(len({_NORM_SQL}) AS DOUBLE) / 100.0, 1.0)
 + CASE WHEN CAST(length(text) AS DOUBLE)
             / (len({_NORM_SQL}) + 1) BETWEEN 3 AND 12
        THEN 1.0 ELSE 0.0 END) / 3.0
"""


@query("jaccard_keep_best", oracle=rf"""
WITH RECURSIVE
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
{_CLOSURE_SQL},
q AS (SELECT doc_id, round({_QUALITY_SQL}, 6) AS quality FROM documents),
labeled AS (
  SELECT d.doc_id,
         COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
         q.quality
  FROM documents d
  LEFT JOIN cc ON cc.id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id)
SELECT doc_id, cluster_id, quality,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY quality DESC, doc_id) = 1 AS keep
FROM labeled
""")
def q_jaccard_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware corpus dedup: exact-Jaccard near-dup clusters keep
    their HIGHEST-QUALITY member (composite quality score; ties to the
    smallest doc_id) instead of the first-seen one — the canonical-
    selection policy real training-data pipelines use (keep the
    cleanest copy, drop mirrors and truncations). Same recursive-CTE
    closure oracle as jaccard_keep_one, extended with an argmax-per-
    cluster window — the full value surface (cluster labels, scores,
    keep flags) is exact-checked."""
    from pyspark.sql import Window
    from distributed_deduplicator_spark.functions import text as TXT
    d = load_table(spark, sf_dir, "documents")
    pairs = S.jaccard_similarity_join(d, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    cc = S.connected_components(pairs)
    docs = d.select("doc_id",
                    F.round(TXT.quality_score("text"), 6).alias("quality"))
    labeled = (docs.join(cc, docs["doc_id"] == cc["id"], "left")
                   .select(docs["doc_id"],
                           F.coalesce(cc["cluster_id"], docs["doc_id"])
                            .alias("cluster_id"),
                           "quality"))
    w = Window.partitionBy("cluster_id") \
              .orderBy(F.col("quality").desc(), F.col("doc_id"))
    return labeled.withColumn("keep", F.row_number().over(w) == 1)


_CONTAINMENT_THRESHOLD = 0.6


@query("containment_ngram_pairs", oracle=rf"""
WITH toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
  FROM (SELECT doc_id, t, unnest(range(greatest(len(t) - {_NGRAM - 1}, 0))) AS i
        FROM toks)),
sizes AS (SELECT doc_id, count(*) AS set_size FROM grams GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, sa.set_size AS size_a, sb.set_size AS size_b, n_common,
       CAST(n_common AS DOUBLE) / least(sa.set_size, sb.set_size)
         AS containment
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_common AS DOUBLE) / least(sa.set_size, sb.set_size)
      >= {_CONTAINMENT_THRESHOLD}
""")
def q_containment_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram CONTAINMENT join: |A∩B| / min(|A|,|B|) ≥ 0.6 —
    the asymmetric criterion that catches a short doc quoted wholesale
    inside a long one, which Jaccard misses (the union term drowns the
    small set). Same shingle equi-join machinery as
    `jaccard_ngram_pairs`; the ratio is one IEEE division of exact
    integers, bit-identical in both engines."""
    d = load_table(spark, sf_dir, "documents")
    return S.containment_join(d, "doc_id", "text",
                              n=_NGRAM, threshold=_CONTAINMENT_THRESHOLD)


@query("semantic_dedup_keep_one", oracle=f"""
WITH RECURSIVE
d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM d a JOIN d b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= {_COS_THRESHOLD}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u AS id, u AS r FROM edges
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT emb.vec_id, emb.label,
       COALESCE(cc.cluster_id, emb.vec_id) AS cluster_id,
       emb.vec_id = COALESCE(cc.cluster_id, emb.vec_id) AS keep
FROM embeddings emb LEFT JOIN cc ON cc.id = emb.vec_id
""")
def q_semantic_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) applied to the
    embedding corpus: semantic near-dup pairs inside cluster blocks
    (cosine ≥ τ on the 6-dp rounded score), transitive closure, FIRST
    vector per semantic cluster keeps — the embedding-space twin of
    ``jaccard_keep_one``, and the second iterative Spark operator with
    a full recursive-CTE value oracle. The fixture's ``label`` column
    plays the k-means cluster-assignment role (SemDeDup's step 1);
    at 100 TB that assignment comes from the IVF centroid path already
    in :mod:`operators.similarity`, keeping the quadratic verify at
    Σ|cluster|², never n².

    Every vector gets a verdict row (singletons keep), so the output
    IS the training-set filter: ``WHERE keep`` drops semantically
    redundant examples while the cluster_id column documents why."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.cosine_neardup_blocked(emb, "label",
                                     threshold=_COS_THRESHOLD)
    cc = S.connected_components(pairs)
    return (emb.select("vec_id", "label")
               .join(cc, emb["vec_id"] == cc["id"], "left")
               .select(emb["vec_id"], emb["label"],
                       F.coalesce(cc["cluster_id"], emb["vec_id"])
                        .alias("cluster_id"))
               .withColumn("keep", F.col("vec_id") == F.col("cluster_id")))


@query("soft_dedup_weights", oracle=rf"""
WITH RECURSIVE
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
{_CLOSURE_SQL},
docs AS (
  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
csizes AS (SELECT cluster_id, count(*) AS cluster_size
           FROM docs GROUP BY cluster_id)
SELECT docs.doc_id, docs.cluster_id, csizes.cluster_size,
       CAST(1 AS DOUBLE) / csizes.cluster_size AS weight
FROM docs JOIN csizes USING (cluster_id)
""")
def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates
    (``jaccard_keep_one``), every document stays in the corpus with a
    sampling weight 1/|cluster| so each duplicate CLUSTER contributes
    one document's worth of training signal — the downweight-don't-drop
    policy modern mixing pipelines prefer when near-dups carry
    complementary context (quotes, mirrors, revisions). Singletons
    weigh 1.0; Σ weight = the deduplicated corpus size.

    Same sub-quadratic machinery as the keep-one path (exact-Jaccard
    prefix join → O(log n)-capable closure), plus one cluster-sized
    count aggregate and a weight column; value-checked node-for-node
    against DuckDB's recursive-CTE closure."""
    d = load_table(spark, sf_dir, "documents")
    pairs = S.jaccard_similarity_join(d, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    cc = S.connected_components(pairs)
    docs = (d.select("doc_id")
             .join(cc, d["doc_id"] == cc["id"], "left")
             .select(d["doc_id"],
                     F.coalesce(cc["cluster_id"], d["doc_id"])
                      .alias("cluster_id")))
    sizes = docs.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (docs.join(sizes, "cluster_id")
                .select("doc_id", "cluster_id", "cluster_size",
                        (F.lit(1.0) / F.col("cluster_size"))
                        .alias("weight")))


_KNN_K = 10
_KNN_NQUERIES = 16

@query("knn_label_vote", oracle=f"""
WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                  CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {_KNN_NQUERIES}),
c AS (SELECT vec_id AS neighbor_id, label,
             CAST(embedding AS DOUBLE[]) AS nv
      FROM embeddings WHERE vec_id >= {_KNN_NQUERIES}),
scored AS (
  SELECT query_id, true_label, neighbor_id, label,
         list_cosine_similarity(qv, nv) AS cosine
  FROM q CROSS JOIN c),
ranked AS (
  SELECT query_id, true_label, label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cosine, 6) DESC, neighbor_id)
           AS rank
  FROM scored),
votes AS (
  SELECT query_id, true_label, label, count(*) AS n_votes
  FROM ranked WHERE rank <= {_KNN_K}
  GROUP BY query_id, true_label, label),
best AS (
  SELECT query_id, true_label, label AS pred_label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label) AS vr
  FROM votes)
SELECT query_id, true_label, pred_label, n_votes,
       CASE WHEN pred_label = true_label THEN 1 ELSE 0 END AS hit
FROM best WHERE vr = 1
""")
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label vote — the similarity-search application layer: for
    each held-out query vector (vec_id < 16), the majority label among
    its 10 exact-cosine nearest neighbors in the rest of the corpus,
    with the vote count and a hit flag against the query's own label.
    This is the standard embedding-quality probe (a labeled corpus
    whose k-NN vote disagrees with its labels has an embedding,
    labeling, or contamination problem) and the shape of
    retrieval-augmented labeling jobs.

    Ties are total-ordered everywhere: neighbor rank by (round(cosine,
    6) desc, neighbor_id) — the 6dp rounding absorbs cross-engine ulp
    noise at the rank-k boundary — vote winner by (n_votes desc,
    label); deterministic in both engines, so the result carries a
    full value oracle.

    Plan: the bounded query set broadcasts against one corpus scan
    (the waived brute-force BNLJ baseline — swap in `ann_ivf_topk`'s
    probe when the query set grows); the top-k window partitions by
    query_id over nq·|corpus| scored rows ranked map-side by AQE; the
    vote is a ≤ nq·k combinable count and the winner window runs on
    that tiny aggregate. Labels join onto the nq·k candidate rows via
    a broadcast of the candidates — the corpus-sized label table is
    probed, never shuffled."""
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select(F.col("vec_id").alias("neighbor_id"),
                        F.col("label"))
    q = emb.where(F.col("vec_id") < _KNN_NQUERIES)
    corpus = emb.where(F.col("vec_id") >= _KNN_NQUERIES)
    # round_dp=6 before the rank cut (repo-wide cross-engine float
    # discipline): a last-ulp cosine difference at the rank-10 boundary
    # must not flip the vote between Spark and the DuckDB oracle
    topk = S.cosine_topk_bruteforce(corpus, q, k=_KNN_K, round_dp=6)
    true_l = q.select(F.col("vec_id").alias("query_id"),
                      F.col("label").alias("true_label"))
    cand = (labels.join(F.broadcast(topk.select("query_id", "neighbor_id")),
                        "neighbor_id")
                  .join(F.broadcast(true_l), "query_id"))
    votes = (cand.groupBy("query_id", "true_label", "label")
                 .agg(F.count("*").alias("n_votes")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(),
                                               F.col("label"))
    return (votes.withColumn("vr", F.row_number().over(w))
                 .where(F.col("vr") == 1)
                 .select("query_id", "true_label",
                         F.col("label").alias("pred_label"), "n_votes",
                         F.when(F.col("label") == F.col("true_label"), 1)
                          .otherwise(0).cast("int").alias("hit")))


_FP_SQL = (r"md5(trim(regexp_replace(regexp_replace(lower(text),"
           r" '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')))")

@query("dedup_savings_by_source", oracle=rf"""
WITH RECURSIVE
base AS (SELECT doc_id, source, text, {_FP_SQL} AS fp,
                len({_NORM_SQL}) AS n_tok
         FROM documents),
ex AS (SELECT doc_id, source, text, n_tok,
              row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       FROM base),
win AS (SELECT doc_id, source, text, n_tok FROM ex WHERE rn = 1),
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM win),
{_CLOSURE_SQL},
verdict AS (
  SELECT w.source, w.n_tok,
         CASE WHEN w.doc_id = COALESCE(cc.cluster_id, w.doc_id)
              THEN 1 ELSE 0 END AS kept
  FROM win w LEFT JOIN cc ON cc.id = w.doc_id),
exagg AS (SELECT source, count(*) AS n_docs,
                 CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact_dup,
                 CAST(sum(n_tok) AS BIGINT) AS tok_total
          FROM ex GROUP BY source),
vagg AS (SELECT source,
                CAST(sum(1 - kept) AS BIGINT) AS n_near_dup,
                CAST(sum(kept) AS BIGINT) AS n_kept,
                CAST(sum(CASE WHEN kept = 1 THEN n_tok ELSE 0 END)
                     AS BIGINT) AS tok_kept
         FROM verdict GROUP BY source)
SELECT exagg.source, n_docs, n_exact_dup,
       COALESCE(n_near_dup, 0) AS n_near_dup,
       COALESCE(n_kept, 0) AS n_kept,
       tok_total, COALESCE(tok_kept, 0) AS tok_kept,
       1.0 - CAST(COALESCE(tok_kept, 0) AS DOUBLE)
           / CAST(tok_total AS DOUBLE) AS savings_frac
FROM exagg LEFT JOIN vagg ON exagg.source = vagg.source
""")
def q_dedup_savings_by_source(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The dedup effectiveness report: per ingest source, how many
    documents (and tokens) each dedup tier removes — tier 1 exact
    content-fingerprint first-wins, tier 2 Jaccard keep-one over the
    exact survivors — and the token savings fraction. This is the
    number a curation run publishes to justify its dedup budget, and
    the per-source breakdown localizes WHICH feed ships the
    duplication. Fully value-checked: the near-dup tier rides the same
    recursive-CTE closure oracle as `jaccard_keep_one`, restricted to
    exact winners.

    Plan: tier 1 is one fp-keyed window (first-wins, reference R8);
    tier 2 reuses the prefix-filtered shingle equi-join + O(log n) CC
    driver loop on the (strictly smaller) winner set; both rollups are
    combinable integer sums on the source key. Tokens never travel —
    only counts and ids."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window
    from distributed_deduplicator_spark.functions import text as TXT
    base = d.select("doc_id", "source", "text",
                    TXT.fingerprint("text").alias("fp"),
                    TXT.token_count("text").cast("bigint").alias("n_tok"))
    rn = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ex = base.withColumn("rn", rn)
    win = ex.where(F.col("rn") == 1).select("doc_id", "source", "text",
                                            "n_tok")
    pairs = S.jaccard_similarity_join(win, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    cc = S.connected_components(pairs)
    verdict = (win.join(cc, win["doc_id"] == cc["id"], "left")
                  .select(win["source"], win["n_tok"],
                          F.when(win["doc_id"]
                                 == F.coalesce(cc["cluster_id"],
                                               win["doc_id"]), 1)
                           .otherwise(0).alias("kept")))
    exagg = (ex.groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
                     .cast("bigint").alias("n_exact_dup"),
                    F.sum("n_tok").alias("tok_total")))
    vagg = (verdict.groupBy("source")
                   .agg(F.sum(1 - F.col("kept")).cast("bigint")
                         .alias("n_near_dup"),
                        F.sum("kept").cast("bigint").alias("n_kept"),
                        F.sum(F.when(F.col("kept") == 1,
                                     F.col("n_tok")).otherwise(0))
                         .alias("tok_kept")))
    # LEFT join + zero fills: a source whose every document is an
    # exact duplicate of another source's (a pure mirror feed) has no
    # tier-2 winners and thus no vagg row — exactly the feed this
    # report exists to expose (savings_frac = 1.0), so it must not
    # drop out of the result
    return (exagg.join(vagg, "source", "left")
                 .select("source", "n_docs", "n_exact_dup",
                         F.coalesce("n_near_dup", F.lit(0))
                          .cast("bigint").alias("n_near_dup"),
                         F.coalesce("n_kept", F.lit(0)).cast("bigint")
                          .alias("n_kept"),
                         "tok_total",
                         F.coalesce("tok_kept", F.lit(0)).cast("bigint")
                          .alias("tok_kept"),
                         (F.lit(1.0)
                          - F.coalesce("tok_kept", F.lit(0))
                             .cast("double")
                          / F.col("tok_total").cast("double"))
                         .alias("savings_frac")))


@query("cluster_size_histogram", oracle=rf"""
WITH RECURSIVE
toks AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
{_CLOSURE_SQL},
membership AS (
  SELECT COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
csizes AS (SELECT cluster_id, count(*) AS cluster_size
           FROM membership GROUP BY cluster_id),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM membership)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST(cluster_size * count(*) AS DOUBLE) / CAST(n_total AS DOUBLE)
         AS doc_frac
FROM csizes CROSS JOIN tot
GROUP BY cluster_size, n_total
""")
def q_cluster_size_histogram(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution over the whole corpus
    (singletons included): how many clusters of each size exist and
    what fraction of documents they hold — the diagnostic that tells a
    dedup review whether duplication is a long tail of pairs (cheap to
    keep) or a few mega-clusters (template spam / mirrored sites, the
    thing to blocklist upstream). Same exact-Jaccard closure as
    `jaccard_dedup_clusters`, so the histogram carries its full
    recursive-CTE value oracle.

    Plan: after the closure, everything is aggregate-of-aggregate on
    cluster ids (corpus → clusters → sizes → histogram, each step
    combinable); the grand total rides a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    pairs = S.jaccard_similarity_join(d, "doc_id", "text", n=_NGRAM,
                                      threshold=_JACCARD_THRESHOLD)
    cc = S.connected_components(pairs)
    member = (d.select("doc_id")
               .join(cc, d["doc_id"] == cc["id"], "left")
               .select(F.coalesce(cc["cluster_id"], d["doc_id"])
                        .alias("cluster_id")))
    csizes = member.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    tot = member.agg(F.count("*").alias("n_total"))
    return (csizes.groupBy("cluster_size")
                  .agg(F.count("*").alias("n_clusters"))
                  .crossJoin(F.broadcast(tot))
                  .select("cluster_size", "n_clusters",
                          (F.col("cluster_size") * F.col("n_clusters"))
                          .cast("bigint").alias("n_docs"),
                          ((F.col("cluster_size") * F.col("n_clusters"))
                           .cast("double")
                           / F.col("n_total").cast("double"))
                          .alias("doc_frac")))


_SIMHIST_BUCKETS = 20
_SIMHIST_PAIR_POP = 64       # target pairing-bucket population

@query("embedding_similarity_histogram", oracle=f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings),
d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
seq AS (
  SELECT e,
         lag(e) OVER (
           PARTITION BY vec_id % ((n.n_vecs + {_SIMHIST_PAIR_POP - 1})
                                  // {_SIMHIST_PAIR_POP})
           ORDER BY vec_id) AS e_prev
  FROM d CROSS JOIN n),
pairs AS (
  SELECT round(list_cosine_similarity(e, e_prev), 6) AS cosine
  FROM seq WHERE e_prev IS NOT NULL),
b AS (
  SELECT least(greatest(CAST(floor((cosine + 1.0) * {_SIMHIST_BUCKETS}
                                   / 2.0) AS BIGINT),
                        0), {_SIMHIST_BUCKETS - 1}) AS bucket
  FROM pairs),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM b)
SELECT bucket,
       -1.0 + bucket * (2.0 / {_SIMHIST_BUCKETS}) AS bucket_lo,
       count(*) AS n_pairs_in_bucket, n_pairs,
       CAST(count(*) AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS frac
FROM b CROSS JOIN tot
GROUP BY bucket, n_pairs
""")
def q_embedding_similarity_histogram(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Distribution of cosine similarity between deterministically
    paired embeddings: a 20-bucket histogram over [-1, 1] — the
    embedding-space health profile that complements
    `embedding_norm_stats` (a healthy random-ish corpus concentrates
    near 0; a collapsed/anisotropic embedding run piles mass at the
    high end, the failure mode that silently breaks every cosine
    threshold downstream).

    Pairing: vectors land in ``vec_id mod ceil(n/64)`` buckets
    (~64-row populations at ANY corpus size) and each pairs with its
    id-predecessor inside the bucket — a deterministic stand-in for
    random pair sampling that is exactly reproducible cross-engine,
    unbiased for id-independent populations, and makes NO density
    assumption about the id space (the sf1 fixture's ids jump by 10^7
    per shard and pair just as well). Adversarial all-ids-congruent
    key sets would need a hash bucket instead; noted, not needed for
    id-keyed corpora.

    Plan: one shuffle partitions the pairing buckets (population ~64
    regardless of n — the window never sees a corpus-scale
    partition); cosine is the shared `operators.similarity.cosine`
    fold, rounded to 6 decimals before the bucket cut (the same
    ulp-absorbing discipline as every cosine threshold here); the
    rollup is a combinable 20-key count with totals on 1-row
    broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.agg(F.count("*").alias("n_vecs"))
    from pyspark.sql import Window
    npb = F.expr(
        f"(n_vecs + {_SIMHIST_PAIR_POP - 1}) DIV {_SIMHIST_PAIR_POP}")
    a = (emb.select("vec_id", "embedding")
            .crossJoin(F.broadcast(n))
            .withColumn("pb", F.col("vec_id") % npb))
    w = Window.partitionBy("pb").orderBy("vec_id")
    paired = (a.withColumn("e_prev", F.lag("embedding").over(w))
               .where(F.col("e_prev").isNotNull()))
    cos6 = F.round(S.cosine(F.col("embedding"), F.col("e_prev")), 6)
    bucket = F.least(
        F.greatest(F.floor((cos6 + 1.0)
                           * _SIMHIST_BUCKETS / 2.0).cast("bigint"),
                   F.lit(0)),
        F.lit(_SIMHIST_BUCKETS - 1)).alias("bucket")
    b = paired.select(bucket)
    tot = b.agg(F.count("*").alias("n_pairs"))
    return (b.groupBy("bucket").agg(F.count("*").alias("n_pairs_in_bucket"))
             .crossJoin(F.broadcast(tot))
             .select("bucket",
                     (F.lit(-1.0) + F.col("bucket")
                      * (2.0 / _SIMHIST_BUCKETS)).alias("bucket_lo"),
                     "n_pairs_in_bucket", "n_pairs",
                     (F.col("n_pairs_in_bucket").cast("double")
                      / F.col("n_pairs").cast("double")).alias("frac")))
