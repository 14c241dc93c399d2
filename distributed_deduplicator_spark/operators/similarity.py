"""Near-duplicate detection & similarity search operators.

The training-data-pipeline generalization of the reference's exact
keyed dedup (provider/DeduplicationProvider.kt:67-94): where the
reference arbitrates attempts sharing an *exact* key, these operators
arbitrate documents/vectors sharing *approximate* identity.

Scale design (100 TB):
- everything is explode → hash-shuffle → aggregate; no cross joins
  except the clearly-labeled brute-force baseline (bounded query set);
- MinHash/SimHash signatures are computed with JVM-side xxhash64 in
  whole-stage codegen — no Python;
- LSH banding turns O(n²) pair generation into per-bucket joins, the
  standard Broder MinHash + banding construction (public literature);
- frequent-shingle skew (the 'the quick' problem) is the join's skew
  axis. The exact-Jaccard path neutralizes it structurally: PPJoin's
  rarest-first prefix ordering pushes hot shingles to the END of every
  document's ordering, so they almost never enter a prefix and the hot
  keys never reach the join. The banded/bucketed paths rely on AQE
  skew-splitting, plus an explicit ``max_bucket_size`` valve
  (:func:`minhash_lsh_pairs`) for degenerate buckets — boilerplate
  clusters whose |bucket|² pair blowup no skew-split can absorb.
"""

from __future__ import annotations

import itertools
import math
import random
import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from distributed_deduplicator_spark.functions import text as TXT
from distributed_deduplicator_spark.sources.fixtures import fanout


def _corpus_size_for_sizing(emb: DataFrame, n: int | None,
                            caller: str) -> int:
    """Resolve the corpus row count an index-sizing decision needs.

    Sizing an index is PLANNING business: callers must pass ``n`` from
    catalog/file statistics (sources.table_row_count reads it from
    parquet footers for free — every fixture caller does). The
    count() fallback below is a full scan + synchronous driver action
    before the query even builds; it stays only so ad-hoc exploration
    on small data keeps working, and it WARNS loudly so it can never
    hide in a production pipeline (tests/test_plan_shapes.py asserts
    the warning fires)."""
    if n is not None:
        return n
    warnings.warn(
        f"{caller}: sizing the index with a full COUNT scan at "
        "plan-build time because `n` was not passed — at scale, pass "
        "`n` (or the sizing knob itself) from catalog/file statistics, "
        "e.g. sources.table_row_count()",
        ResourceWarning, stacklevel=3)
    return emb.count()


# ---------------------------------------------------------------------------
# Persist tracking
# ---------------------------------------------------------------------------
# Some pipelines persist a linear per-doc subtree consumed by several
# downstream branches of ONE final action. The operator cannot unpersist
# before returning (the plan has not executed yet), so persisted handles
# are tracked here and released by the caller after its action completes
# (bench.py and the test suite do; a long-lived session embedding these
# operators should call release_persisted() at checkpoint boundaries).

_PERSISTED: list[DataFrame] = []
_CHECKPOINTED_JRDDS: list = []   # java RDD handles from localCheckpoint


def _tracked_persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def _cache_coalesce(df: DataFrame, est_bytes: int,
                    floor: int | None = None) -> DataFrame:
    """Trim a to-be-persisted subtree to a size-derived partition count.

    Cached plans bypass AQE partition coalescing (Spark pins a cached
    relation's output partitioning unless
    ``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
    flipped — and flipping it globally measured NEGATIVE here:
    advisory-size coalescing collapses tiny cached tables to ONE
    partition and serializes their consumers, BENCH.md round 11). So a
    persisted shuffle materializes at the session's INITIAL partition
    count (8×cores) no matter how small the data is, and every
    downstream InMemoryTableScan pays that many near-empty tasks —
    profiled at sf0.1 as several 256-task stages per ANN query with
    ~45 ms scheduling overhead and ~0 CPU each. ``est_bytes`` is known
    at PLAN time for the ANN intermediates (the same parquet row stats
    the index sizing uses), so coalesce to the 64 MB grain with a
    ``floor`` of defaultParallelism (never serialize a consumer's
    scan; pass ``floor=1`` for bounded-size tables that only feed
    broadcasts). coalesce never widens, so a genuinely large table
    keeps its planned width."""
    sc = df.sparkSession.sparkContext
    if floor is None:
        floor = sc.defaultParallelism
    target = max(floor, -(-int(est_bytes) // (64 << 20)))
    return df.coalesce(target)


def _persistent_jrdds(sc) -> dict:
    """id → java RDD handle for every currently persisted RDD."""
    jmap = sc._jsc.getPersistentRDDs()
    return {int(k): jmap.get(k) for k in jmap.keySet().toArray()}


def _checkpoint_tracked(df: DataFrame) -> tuple[DataFrame, list]:
    """Eager localCheckpoint that also captures the checkpoint's
    backing RDD handles (DataFrame.unpersist does NOT release
    checkpoint storage — it lives in RDD blocks the cache manager
    never sees), so callers can free superseded rounds explicitly
    instead of waiting on driver-GC-triggered ContextCleaner."""
    sc = df.sparkSession.sparkContext
    before = set(_persistent_jrdds(sc))
    out = df.localCheckpoint(eager=True)
    after = _persistent_jrdds(sc)
    return out, [h for i, h in after.items() if i not in before]


def release_persisted() -> int:
    """Unpersist every DataFrame persisted (and every checkpoint RDD
    captured) by operators in this module since the last release;
    returns how many handles were released."""
    n = len(_PERSISTED) + len(_CHECKPOINTED_JRDDS)
    for df in _PERSISTED:
        df.unpersist()
    _PERSISTED.clear()
    for h in _CHECKPOINTED_JRDDS:
        h.unpersist(False)
    _CHECKPOINTED_JRDDS.clear()
    return n


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def shingle_array(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingle set per document, as one row per
    doc: (id, shingles array<string>, set_size). JVM-side transform
    over the token array — no explode, no shuffle.

    The token array is materialized in its own projection before the
    gram transform references it: Catalyst's CollapseProject inlines
    cheap expressions into lambda bodies, and inlining the
    regex-normalize chain would re-run it once per shingle instead of
    once per document (measured 20×+ slower at sf0.1).
    """
    base = fanout(df.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("_text")))
    toked = base.select("id", TXT.tokens("_text").alias("_toks"))
    toks = F.col("_toks")
    # n-gram i = tokens[i..i+n-1] joined by space; sequence over index.
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # when fewer than n tokens, the sequence bound is clamped to 0 and
    # the whole array is replaced by an empty one.
    grams = F.when(F.size(toks) >= n, F.array_distinct(grams)) \
             .otherwise(F.array().cast("array<string>"))
    shingled = toked.select("id", grams.alias("shingles"))
    return shingled.select("id", "shingles",
                           F.size("shingles").alias("set_size"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Exploded shingle relation: one row per (id, shingle)."""
    arr = shingle_array(df, id_col, text_col, n)
    return arr.select("id", F.explode("shingles").alias("shingle"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity join (oracle-checkable)
# ---------------------------------------------------------------------------

def _rarity_ordered(arr: DataFrame, method: str = "prefix",
                    sample_mod: int = 20, hot_min: int = 2) -> DataFrame:
    """Per-doc shingle-HASH arrays in one consistent rarest-first
    global order — the shared kernel of every prefix-filtered set
    join (:func:`jaccard_similarity_join`, :func:`containment_join`).
    Returns a persisted (id, ordered_shingles array<bigint>, set_size)
    table (released by the caller via release_persisted()); see
    jaccard_similarity_join's docstring for the sampled-hot rarity
    design and the exactness argument."""
    sh = (arr.select("id", F.explode("shingles").alias("_s"))
             .select("id", F.xxhash64("_s").alias("shingle")))
    if method == "prefix-exact":
        doc_freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        # per doc: shingles ordered rarest-first (df, shingle) — a
        # consistent global order as the prefix theorem requires
        ranked = sh.join(doc_freq, "shingle")
    else:
        # sampled hot-shingle rarity: a 1/sample_mod hash-sample of
        # docs (whole doc in or out, so sample df scales by mod),
        # keep shingles the sample saw >= hot_min times, broadcast.
        # Rank = estimated df for the hot head, 0 for the tail.
        hot = (arr.where(F.xxhash64(F.col("id")) % sample_mod == 0)
                  .select(F.explode("shingles").alias("_s"))
                  .select(F.xxhash64("_s").alias("shingle"))
                  .groupBy("shingle").agg(F.count("*").alias("_c"))
                  .where(F.col("_c") >= hot_min)
                  .select("shingle",
                          (F.col("_c") * sample_mod).alias("df")))
        ranked = (sh.join(F.broadcast(hot), "shingle", "left")
                    .select("id", "shingle",
                            F.coalesce("df", F.lit(0).cast("long"))
                             .alias("df")))
    ordered = (ranked
               .groupBy("id")
               .agg(F.sort_array(
                   F.collect_list(F.struct("df", "shingle"))).alias("os")))
    ordered = ordered.select(
        "id",
        F.transform("os", lambda s: s["shingle"]).alias("ordered_shingles"),
        F.size("os").alias("set_size"))
    # multiple consumers (prefixes + verification set-attaches) would
    # otherwise recompute the shingle pipeline each time; the table is
    # one row per doc — linear, spill-safe, the thing you'd persist at
    # any scale.
    return _tracked_persist(ordered)


def jaccard_similarity_join(df: DataFrame, id_col: str, text_col: str,
                            n: int = 3, threshold: float = 0.5,
                            method: str = "prefix",
                            sample_mod: int = 20,
                            hot_min: int = 2) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.
    Exact (every method returns identical results):

    - ``method='prefix'`` (default): PPJoin-style prefix filtering
      (Xiao et al., WWW'08 — public literature). Shingles are globally
      ordered rarest-first; a pair with J ≥ τ MUST share a shingle
      within the first ``|A| - ceil(τ|A|) + 1`` rarest shingles of each
      doc, so candidate generation joins only those prefixes — on
      skewed vocabularies (the 100 TB reality) this cuts the join's
      Σ df² blowup by orders of magnitude. The prefix theorem needs
      only a CONSISTENT total order, and rarity ranking only pays off
      on the hot head of the df distribution — so rarity is estimated
      from a 1/``sample_mod`` hash-sample of documents and the hot
      shingles (sample df ≥ ``hot_min``) BROADCAST into the ordering:
      no corpus-wide df aggregate, no second corpus-scale shuffle.
      Un-sampled tail shingles share rank 0 and tie-break
      lexicographically (harmless: a shingle the sample never saw
      twice is not the one that blows up the join). At extreme scale
      raise ``hot_min`` to bound the broadcast — only the degenerate
      head must be ranked. Candidates then pass PPJoin's POSITIONAL
      filter before any array travels: both docs are sorted by the
      same total order, so prefix matches are monotone and
      overlap(A,B) ≤ (#prefix matches) + min(|A|−i*, |B|−j*) with
      (i*, j*) the last match's positions — pairs whose bound misses
      α = ⌈τ(|A|+|B|)/(1+τ)⌉ are pruned by the same groupBy that
      dedups candidates (round-5 sf1: 6.3M → ~1M survivors feeding
      the verify). Verification computes the exact intersection with
      ``array_intersect`` on the full sets (no second explode).

    All joins, orderings, and intersections run on xxhash64 shingle
    HASHES (8-byte bigints), never the shingle strings — the verify
    join ships each doc's set as array<bigint>, a ~3× wire/intersect
    cut. Exactness caveat: a 64-bit collision between two distinct
    shingles of compared docs could perturb n_common; with ~10⁷
    distinct shingles the expected number of colliding PAIRS is
    ~10¹⁴/2⁶⁵ ≈ 3·10⁻⁶ corpus-wide, and the parity harness checks
    value-exact agreement against a string-keyed oracle at every
    tested SF.
    - ``method='prefix-exact'``: same pruning with the textbook exact
      corpus-wide df ordering (one extra corpus-scale aggregate +
      shuffle join) — the reference plan the sampled ordering is
      checked against in tests.
    - ``method='allpairs'``: plain shingle self-join + pair count; the
      simple plan, competitive only when shingle frequencies are
      near-uniform AND the corpus is small enough that Σ df² cannot
      hurt.

    No ``set_size > 0`` pre-filter: empty shingle sets explode to zero
    rows on every path that matters, and an explicit filter on a
    derived column gets predicate-pushed to the scan where it
    re-evaluates the whole shingle pipeline serially.
    """
    arr = shingle_array(df, id_col, text_col, n)
    if method == "allpairs":
        # both self-join sides plus the two set_size attaches would
        # re-run the shingle pipeline 4× — persist the linear per-doc
        # table (same rationale as containment_join / minhash_near_dup)
        arr = _tracked_persist(arr)
        sh = (arr.select("id", F.explode("shingles").alias("_s"))
                 .select("id", F.xxhash64("_s").alias("shingle")))
        a, b = sh.alias("a"), sh.alias("b")
        common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                           & (F.col("a.id") < F.col("b.id")))
                   .groupBy(F.col("a.id").alias("id_a"),
                            F.col("b.id").alias("id_b"))
                   .agg(F.count("*").alias("n_common")))
        sizes = arr.select("id", "set_size")
        sa = sizes.select(F.col("id").alias("id_a"),
                          F.col("set_size").alias("size_a"))
        sb = sizes.select(F.col("id").alias("id_b"),
                          F.col("set_size").alias("size_b"))
        jac = (F.col("n_common").cast("double")
               / (F.col("size_a") + F.col("size_b") - F.col("n_common")))
        return (common.join(sa, "id_a").join(sb, "id_b")
                      .withColumn("jaccard", jac)
                      .where(F.col("jaccard") >= threshold)
                      .select("id_a", "id_b", "size_a", "size_b",
                              "n_common", "jaccard"))
    if method not in ("prefix", "prefix-exact"):
        raise ValueError(
            "method must be 'prefix', 'prefix-exact' or 'allpairs'")

    # --- PPJoin-lite (ordering kernel shared with containment_join) ---
    ordered = _rarity_ordered(arr, method, sample_mod, hot_min)
    # ε guards this ceil too: when s·τ is exactly integral the double
    # product can round UP (0.55·100 = 55.000000000000004 → ceil 56),
    # shortening the prefix by one and silently missing true pairs
    prefix_len = (F.col("set_size")
                  - F.ceil(F.col("set_size") * F.lit(float(threshold))
                           - F.lit(1e-9)).cast("int")
                  + 1)
    prefixes = ordered.select(
        "id", "set_size",
        F.posexplode(F.slice("ordered_shingles", 1, prefix_len))
         .alias("pos", "shingle"))
    pa, pb = prefixes.alias("a"), prefixes.alias("b")
    # the candidate-dedup groupBy doubles as the POSITIONAL filter:
    # prefix matches are monotone (same total order on both docs), so
    # the match maximal in a.pos is maximal in b.pos too, and
    # overlap ≤ c + min(|A|−i*, |B|−j*) — prune pairs whose bound
    # can't reach α = ⌈τ(|A|+|B|)/(1+τ)⌉ BEFORE any array is shipped
    cand = (pa.join(pb, (F.col("a.shingle") == F.col("b.shingle"))
                      & (F.col("a.id") < F.col("b.id")))
              .groupBy(F.col("a.id").alias("id_a"),
                       F.col("b.id").alias("id_b"),
                       F.col("a.set_size").alias("size_a"),
                       F.col("b.set_size").alias("size_b"))
              .agg(F.count("*").alias("_c"),
                   F.max("a.pos").alias("_ia"),
                   F.max("b.pos").alias("_ib")))
    # ε guards the ceil: when s·τ/(1+τ) is exactly integral, float
    # rounding up would over-prune a true pair; erring one unit low
    # only weakens the prune, never correctness
    alpha = F.ceil((F.col("size_a") + F.col("size_b"))
                   * F.lit(float(threshold) / (1.0 + float(threshold)))
                   - F.lit(1e-9))
    ubound = (F.col("_c")
              + F.least(F.col("size_a") - F.col("_ia") - 1,
                        F.col("size_b") - F.col("_ib") - 1))
    # length filter: J ≥ τ requires τ·|A| ≤ |B| ≤ |A|/τ
    # ε on the boundary: |B| exactly equal to τ·|A| must pass (J can
    # equal τ), but the raw double product can round just above the
    # exact integer and prune the pair before verification
    cand = (cand.where((F.col("size_b")
                        >= F.col("size_a") * threshold - F.lit(1e-9))
                       & (F.col("size_a")
                          >= F.col("size_b") * threshold - F.lit(1e-9)))
                .where(ubound >= alpha)
                .select("id_a", "id_b", "size_a", "size_b"))
    sets = ordered.select("id", F.col("ordered_shingles"))
    verified = (cand
                .join(sets.select(F.col("id").alias("id_a"),
                                  F.col("ordered_shingles").alias("sh_a")), "id_a")
                .join(sets.select(F.col("id").alias("id_b"),
                                  F.col("ordered_shingles").alias("sh_b")), "id_b")
                .withColumn("n_common",
                            F.size(F.array_intersect("sh_a", "sh_b"))))
    jac = (F.col("n_common").cast("double")
           / (F.col("size_a") + F.col("size_b") - F.col("n_common")))
    return (verified.withColumn("jaccard", jac)
                    .where(F.col("jaccard") >= threshold)
                    .select("id_a", "id_b", "size_a", "size_b",
                            "n_common", "jaccard"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbors
# ---------------------------------------------------------------------------

def ivf_assign(unit: DataFrame, centroids: DataFrame,
               dim: int, nprobe: int = 1,
               keep_unit: bool = True,
               keep_score: bool = False) -> DataFrame:
    """Assign each unit vector to its ``nprobe`` nearest centroids.

    Centroids broadcast (nlist × dim doubles — always tiny next to the
    corpus); the scoring join is a broadcast nested loop producing
    n × nlist rows whose dots run in codegen, then a per-id top-nprobe.

    The ranking window sorts SKINNY rows (id, centroid_id, cdot —
    ~20 bytes): carrying the dim-double vector through the n × nlist
    exploded sort was the round-5 sf1 bottleneck (100k × 316 rows ×
    512 B ≈ 16 GB through one exchange). Callers that need the vector
    back (the Lloyd step) set ``keep_unit`` and pay one linear n-row
    rejoin instead. ``keep_score`` keeps the dot(unit, cunit) the
    ranking already computed (the residual-PQ scorer needs the exact
    per-probe dot(q, c) offset — see :func:`ann_ivfpq_topk`).
    Returns (id[, unit], centroid_id, crank 1..nprobe[, cdot]).
    """
    scored = (unit.crossJoin(F.broadcast(centroids))
                  .select("id", "centroid_id",
                          _dot_indexed("unit", "cunit", dim).alias("cdot")))
    tail = ["cdot"] if keep_score else []
    w = Window.partitionBy("id").orderBy(F.col("cdot").desc(), "centroid_id")
    ranked = (scored.withColumn("crank", F.row_number().over(w))
                    .where(F.col("crank") <= nprobe)
                    .select("id", "centroid_id", "crank", *tail))
    if not keep_unit:
        return ranked
    return (ranked.join(unit.select("id", "unit"), "id")
                  .select("id", "unit", "centroid_id", "crank", *tail))


def ivf_centroids(unit: DataFrame, nlist: int, dim: int,
                  refine: bool = True) -> DataFrame:
    """Deterministic IVF centroids: seed with the ``nlist`` vectors
    minimal by xxhash64(id) (a uniform random-but-reproducible sample —
    the IVF-flat bootstrap), optionally one Lloyd refinement step
    computed on a ~10% hash-sample of the corpus (train on a sample,
    index everything — standard IVF practice at scale).

    Returns (centroid_id, cunit array<double>).
    """
    # id tie-break (same as pq_codebooks): an xxhash64 collision at the
    # limit boundary would otherwise make the seed set and centroid
    # numbering scheduling-dependent, breaking end-to-end determinism
    seeds = (unit.withColumn("_h", F.xxhash64(F.col("id")))
                 .orderBy("_h", "id").limit(nlist)
                 .select(F.row_number().over(
                     Window.orderBy("_h", "id")).alias("centroid_id"),
                         F.col("unit").alias("cunit")))
    if not refine:
        return seeds
    sample = unit.where(F.xxhash64(F.col("id"), F.lit(7)) % 10 == 0)
    assigned = ivf_assign(sample, seeds, dim, nprobe=1)
    # per-centroid mean per dimension (posexplode → avg → re-pack),
    # renormalized to a unit vector; empty centroids keep their seed
    means = (assigned.select("centroid_id",
                             F.posexplode("unit").alias("pos", "v"))
                     .groupBy("centroid_id", "pos").agg(F.avg("v").alias("m"))
                     .groupBy("centroid_id")
                     .agg(F.array_sort(F.collect_list(
                         F.struct("pos", "m"))).alias("pm"))
                     .select("centroid_id",
                             F.transform("pm", lambda s: s["m"]).alias("_c")))
    means = (means.select("centroid_id", "_c",
                          F.sqrt(F.aggregate(
                              "_c", F.lit(0.0),
                              lambda a, v: a + v * v)).alias("_n"))
                  .select("centroid_id",
                          F.transform("_c", lambda v: v / F.col("_n"))
                          .alias("cunit")))
    return (seeds.alias("s")
                 .join(means.alias("m"), "centroid_id", "left")
                 .select("centroid_id",
                         F.coalesce("m.cunit", "s.cunit").alias("cunit")))


def _per_query_topx(scores, qids, mids, x: int, score_name: str):
    """Shared emit tail of the cogrouped list scorers
    (:func:`_ivf_list_scorer`, :func:`_pq_list_scorer`): per query-row
    of the (queries × members) ``scores`` matrix, take the top-(x+1)
    members under the TOTAL order (score desc, member id asc), drop
    self-matches, and emit (query_id, neighbor_id, <score_name>) —
    x+1 so the self-drop still leaves x candidates. One definition so
    the tie-break / self-exclusion semantics cannot drift between the
    ANN paths."""
    import numpy as np
    import pandas as pd
    order = np.lexsort((np.broadcast_to(mids, scores.shape), -scores),
                       axis=1)[:, :x + 1]
    rows_q = np.repeat(qids, order.shape[1])
    rows_n = mids[order].ravel()
    rows_s = np.take_along_axis(scores, order, axis=1).ravel()
    keep = rows_q != rows_n
    return pd.DataFrame({"query_id": rows_q[keep],
                         "neighbor_id": rows_n[keep],
                         score_name: rows_s[keep]})


def _ivf_list_scorer(k: int):
    """Build the cogrouped per-list scorer for :func:`ann_ivf_topk`.

    Returns f(members_pdf, probes_pdf) → (query_id, neighbor_id,
    cosine): one float64 GEMM of the list's probing queries against
    its members, then the shared per-query top-(k+1) emit
    (:func:`_per_query_topx`); the global window above takes the
    final top-k. Module-level (not a closure) so the tie-break and
    self-exclusion logic is unit-testable without a SparkSession
    (tests/test_similarity.py::test_ivf_list_scorer_*).
    """
    import numpy as np
    import pandas as pd

    def score(m_pdf, q_pdf):
        if len(m_pdf) == 0 or len(q_pdf) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        mat = np.vstack(m_pdf["unit"].to_numpy()).astype(np.float64)
        qmat = np.vstack(q_pdf["qunit"].to_numpy()).astype(np.float64)
        sims = qmat @ mat.T                        # q×m float64 GEMM
        return _per_query_topx(sims, q_pdf["query_id"].to_numpy(),
                               m_pdf["id"].to_numpy(), k, "cosine")

    return score


def _lsh_bucket_scorer(k: int):
    """Build the grouped per-bucket scorer for :func:`ann_lsh_topk`'s
    ``scorer='bucket_gemm'`` path: f(bucket_pdf(id, unit)) →
    (query_id, neighbor_id, cosine) — ONE float64 GEMM of the bucket's
    members against themselves, then the shared per-query top-(k+1)
    emit (:func:`_per_query_topx`, so tie-break / self-exclusion
    semantics are the IVF scorers').

    Exactness of the per-bucket prune: the pair's cosine does not
    depend on which bucket scored it, so for any query q and neighbor
    x in q's GLOBAL top-k, every member ranked above x (cosine desc,
    id asc) in the bucket where x attains its accepted score is also
    ranked above x globally — fewer than k of those exist, so x
    survives some bucket's top-(k+1) cut. The global max(cosine)
    dedup + window above therefore computes exactly the score-all-
    collided-pairs result. Module-level so the GEMM/tie-break logic
    is unit-testable without a SparkSession."""
    import numpy as np
    import pandas as pd

    def score(pdf):
        if len(pdf) < 2:
            # a single-member bucket collides with nobody
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")})
        ids = pdf["id"].to_numpy()
        mat = np.vstack(pdf["unit"].to_numpy()).astype(np.float64)
        sims = mat @ mat.T                  # b×b float64 GEMM
        return _per_query_topx(sims, ids, ids, k, "cosine")

    return score


def _auto_nprobe(nlist: int) -> int:
    """Default probe count for the IVF family: ⌈nlist^0.75⌉, floor 4,
    cap nlist. Rationale: a CONSTANT nprobe (the old 4) probes a
    vanishing 4/√n fraction of the corpus as it grows, so recall
    silently decays with scale — drive-measured recall@5 on the
    near-uniform random fixtures (ANN's worst case) was 0.47 at
    sf0.01 falling to 0.33 at sf0.1. nlist^0.75 keeps the probed
    fraction shrinking (nlist^-0.25: 32% of lists at n=500, 7.5% at
    n=10⁹) while recall on the fixture worst case stays ≥0.7 at the
    gate SFs (measured 0.81 sf0.01 / 0.73 sf0.1, time flat — the
    GEMM is overhead-dominated at these scales). Clustered real
    embeddings sit far above this floor at equal nprobe."""
    return min(int(nlist), max(4, int(math.ceil(nlist ** 0.75))))


def _candidate_budget(n: int) -> int:
    """Per-query expected-candidate cap for the ANN auto-sizing paths:
    ``max(2048, 128·⌊√n⌋)``.

    Why √n and not a flat cap (the round-9 shape): all-pairs IVF
    top-k INESCAPABLY pays n·nlist = n^1.5 distance computations just
    selecting each query's probe lists (nlist ≈ √n). A per-query
    scoring budget of c·√n keeps total candidate-scoring work at
    c·n^1.5 — the SAME asymptotic order as that probe-selection scan
    — so the cap never changes the operator's asymptotics; it only
    prevents the ⌈nlist^0.75⌉ probe power law from going
    near-brute-force (uncapped candidates grow n^0.875/query, total
    n^1.88). The round-9 FLAT 2048 cap under-spent instead: scoring
    shrank to o(assignment) while the scanned fraction (2048/n) and
    recall decayed measurably with corpus growth — at n=20k the flat
    cap was DOMINATED on both axes (recall 0.477 @ 12.1 s vs the
    uncapped power law's 0.780 @ 7.2 s, BENCH.md round-9 knob table).

    Why c = 128, not round-10's 64 (BENCH.md round-11, the first
    measurement where a cap actually BINDS): at n=140k the 64-cap
    clipped nprobe 86 → 63 and cost recall@5 0.790 → 0.710 while
    saving only ~6% wall (94.2 vs 100.5 s IVF, 256-query exact
    truth) — the scoring flops the cap bounds are BLAS-cheap and the
    wall is fan-out/overhead-dominated at every measurable scale, so
    the 64-constant bought nothing measurable where it first bound.
    Doubling to 128 defers the clip to n ≈ 420k (where n^0.875 =
    128√n) and holds twice the probed fraction (128/√n) wherever it
    binds (at n=1M the clip is 178 → 128, the same 1.39× ratio the
    64-cap showed at 140k). Beyond the budget, recall remains
    the caller's explicit nprobe/tables knob — on isotropic data ANY
    sublinear candidate scheme decays; the budget is a work-bound
    contract, not a recall promise. The 2048 floor keeps
    sub-√n-budget corpora (n < ~260) at full historical coverage
    (the gate-SF plans are floor-dominated and unchanged under any
    c ≥ 64)."""
    return max(2048, 128 * math.isqrt(max(int(n), 0)))


def _budget_capped_nprobe(nlist: int, n: int) -> int:
    """The IVF-family auto nprobe: the ⌈nlist^0.75⌉ power law
    (:func:`_auto_nprobe`) capped so a query's EXPECTED candidate
    count (nprobe·n/nlist) stays within :func:`_candidate_budget`.
    One definition for all three call sites (in-memory IVF, IVF-PQ,
    persisted-index query) — and the function the sizing unit tests
    pin, so a regression here cannot hide behind a test-local copy of
    the formula."""
    n = max(int(n), 1)
    return min(_auto_nprobe(nlist),
               max(4, (_candidate_budget(n) * int(nlist)) // n))


def _lsh_auto_sizing(n: int, target_bucket: int = 128) -> tuple[int, int]:
    """(num_tables, num_planes) for :func:`ann_lsh_topk`'s auto path.

    planes = round(log2(n/target_bucket)) — round, NOT ceil, so the
    realized expected bucket occupancy centers on target_bucket
    instead of ceil's systematic half-target bias (per-table cost is
    dominated by the fixed n-row pass; at n=20k the difference is the
    measured recall-per-second knee: planes 7 → recall@5 0.727 @
    ~52 s vs ceil's 8 → 0.547 @ ~47 s, BENCH.md round-10 table).
    tables = the fitted growth curve ceil(8.75·(n/tb)^0.22), capped
    by the shared candidate budget (the cap is a backstop — the
    curve is operative at any realistic n). Module-level and
    unit-test-pinned for the same reason as
    :func:`_budget_capped_nprobe`."""
    n = max(int(n), 2)
    planes = max(2, round(math.log2(n / target_bucket)))
    grow = math.ceil(8.75 * (n / target_bucket) ** 0.22)
    tables = max(4, min(grow, max(
        4, _candidate_budget(n) // target_bucket)))
    return tables, planes


def _pq_list_scorer(rerank: int, m: int, ksub: int, cent=None):
    """Build the cogrouped per-list ADC scorer for
    :func:`ann_ivfpq_topk`: f(members_pdf(id, list_id, codes),
    probes_pdf(query_id, list_id, qtab|qunit[, qc])) → (query_id,
    neighbor_id, adc) — the list's per-query ADC top-(rerank+1).

    ADC(q, x) = [qc +] Σ_s qtab[s·ksub + code_s(x)], computed as ONE
    BLAS GEMM against a 0/1 code-indicator matrix (see inline note).
    Under residual encoding (codes quantize x − c_list) the optional
    ``qc`` column carries the exact dot(q, c_list) for this probe,
    making ADC scores COMPARABLE ACROSS LISTS in the global shortlist
    window — without it the per-list residual scores would be offset
    by a different missing dot(q, c) per list. Codes are a
    sub_id-keyed MAP (sparse-codebook safe — see pq_encode).

    The per-query ADC table arrives one of two ways:

    - ``qunit`` (the engine default, round-11): the probe row carries
      the query's float32 unit vector (dim·4 ≈ 256 B) and the qtab is
      computed IN-TASK as m tiny (Q×dsub)@(dsub×ksub) GEMMs against
      the (m, ksub, dsub) codebook array. The codebook arrives either
      as the ``cent`` closure (unit tests / standalone use) or
      IN-BAND: probe rows flagged ``_cb=True`` whose ``qunit`` field
      is the flattened dense slot-scattered codebook
      (m·ksub·dsub floats ≈ 4 KB) — one such row per list group,
      unioned into the probes side by :func:`ann_ivfpq_topk` via a
      broadcast crossJoin, so query CONSTRUCTION stays pure planning
      (no driver collect, no eager job). Rationale for the payload
      itself: the qtab (m·ksub·4 B ≈ 2 KB) was the probe fan-out
      join's dominant wire payload (one replica per (query, probed
      list) — n·nprobe rows), while recomputing it costs Q·dim·ksub
      flops per list (~0.1% of the ADC GEMM itself). Shipping the 8×
      smaller qunit and rebuilding the table next to the data is the
      classic ship-function-not-data trade. Slots absent from a
      sparse codebook hold 0.0 in the dense scatter — identical to
      the dense-qtab contract (no member can carry such a code).
    - ``qtab``: a precomputed DENSE slot-indexed array<float> (the
      pre-round-11 wire format, kept for the legacy
      ``probe_payload='qtab'`` A/B path and as the direct numerics
      surface the unit tests drive with hand-built tables).

    A subspace missing from a member's codes gathers a sentinel slot
    holding 0.0, exactly the declarative fold's coalesce-to-0.
    rerank+1 so dropping a self-match still leaves rerank candidates;
    the global skinny window above takes the final shortlist.
    Module-level so the gather/sentinel/tie-break logic is
    unit-testable without a SparkSession."""
    import numpy as np
    import pandas as pd

    def empty():
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "adc": pd.Series([], dtype="float64")})

    sent = m * ksub  # one extra zero slot for absent subspaces

    def score(m_pdf, q_pdf):
        ctab = cent
        if "_cb" in q_pdf.columns:
            # in-band codebook: the flagged row's qunit field is the
            # flattened dense (m·ksub·dsub) codebook for this index —
            # split it out of the query rows before scoring
            mask = q_pdf["_cb"].to_numpy(dtype=bool)
            if mask.any():
                flat = np.asarray(q_pdf["qunit"][mask].iloc[0],
                                  dtype=np.float64)
                ctab = flat.reshape(m, ksub, flat.size // (m * ksub))
            q_pdf = q_pdf[~mask]
        if len(m_pdf) == 0 or len(q_pdf) == 0:
            return empty()
        codes = np.full((len(m_pdf), m), sent, dtype=np.int64)
        for r, cell in enumerate(m_pdf["codes"]):
            for s, c in (cell.items() if isinstance(cell, dict)
                         else dict(cell).items()):
                codes[r, int(s)] = int(s) * ksub + int(c)
        qt = np.zeros((len(q_pdf), sent + 1), dtype=np.float64)
        if "qtab" in q_pdf.columns:
            # precomputed DENSE positional array — one vstack, no
            # per-entry Python conversion
            qt[:, :sent] = np.vstack([np.asarray(c, dtype=np.float64)
                                      for c in q_pdf["qtab"]])
        else:
            # qunit mode: rebuild the table in-task. qmat is the
            # float32 wire payload upcast once; per subspace s,
            # qt[:, s·ksub:(s+1)·ksub] = q_s @ ctab_s^T — m tiny
            # GEMMs, Q·dim·ksub flops total for the group.
            if ctab is None:
                raise ValueError(
                    "qunit scoring needs a codebook: pass cent= or "
                    "union in-band _cb rows (ann_ivfpq_topk does)")
            qmat = np.vstack([np.asarray(c, dtype=np.float64)
                              for c in q_pdf["qunit"]])
            dsub = qmat.shape[1] // m
            qsub = qmat.reshape(len(q_pdf), m, dsub)
            for s in range(m):
                qt[:, s * ksub:(s + 1) * ksub] = qsub[:, s, :] @ ctab[s].T
        # ADC as ONE BLAS GEMM against a 0/1 code-indicator matrix:
        # adc[q, x] = Σ_s qt[q, slot(x, s)] = (qt @ onehot)[q, x] with
        # onehot[slot, x] = 1 iff member x's subspace-s code maps to
        # slot. The loop this replaces (for s: adc += qt[:, codes[:, s]])
        # was memory-bound, materializing m=32 full (queries × members)
        # fancy-gather copies per list — ~1 GB of traffic per probed
        # list at sf1, measured 58-120 s for the whole query vs ~30 s
        # through the GEMM. Absent subspaces hit the sentinel slot
        # (qt[:, sent] = 0): repeated (sent, x) writes collapse to one
        # indicator, but each absent term added 0 either way.
        onehot = np.zeros((sent + 1, len(m_pdf)), dtype=np.float64)
        onehot[codes.ravel(),
               np.repeat(np.arange(len(m_pdf)), m)] = 1.0
        adc = qt @ onehot
        if "qc" in q_pdf.columns:
            adc += q_pdf["qc"].to_numpy(dtype=np.float64)[:, None]
        return _per_query_topx(adc, q_pdf["query_id"].to_numpy(),
                               m_pdf["id"].to_numpy(), rerank, "adc")

    return score


def ann_ivf_topk(emb: DataFrame, k: int = 10, nlist: int | None = None,
                 nprobe: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64,
                 n: int | None = None) -> DataFrame:
    """Approximate all-pairs cosine top-k via an IVF-flat index — the
    partition-pruning alternative to random-hyperplane LSH
    (:func:`ann_lsh_topk`): vectors live in one centroid list; each
    query probes its ``nprobe`` nearest lists, so the candidate join
    touches ~nprobe/nlist of the corpus per query instead of all of it.

    ``nlist=None`` → ≈√n lists (the classic IVF sizing: both the
    assignment scan (n·nlist) and the probe work (n·nprobe·n/nlist)
    grow as n^1.5, balanced), with ``n`` the corpus row count from
    catalog/file statistics. Sizing an index from a stat is planning
    business, so callers pass ``n``; omitting it falls back to a
    LOUDLY-WARNED count() scan (_corpus_size_for_sizing) — never
    acceptable at scale (the fixture loaders read the count from
    parquet footers for free: sources.table_row_count). All
    deterministic — hash-seeded centroids, one sample-based Lloyd
    step, fixed tie-breaks.
    """
    if nlist is None or nprobe is None:
        # only auto-sizing needs the corpus cardinality — a call with
        # both knobs explicit must stay pure planning (no count scan)
        sized_n = max(_corpus_size_for_sizing(emb, n, "ann_ivf_topk"), 4)
    if nlist is None:
        nlist = max(4, int(math.sqrt(sized_n)))
    if nprobe is None:
        # ⌈nlist^0.75⌉ keeps recall from the constant-nprobe decay,
        # capped so a query's EXPECTED candidate count (nprobe·n/nlist)
        # stays ≤ _candidate_budget(n) = max(2048, 128√n) — total
        # scoring work then matches the n·nlist assignment scan's
        # n^1.5 order instead of going near-brute-force (uncapped
        # power law: n^1.88 total). See _candidate_budget for why the
        # round-9 flat 2048 was re-curved (dominated on both axes at
        # n=20k). The cap binds only past n≈65k — at every fixture
        # scale the drive-measured recall is the uncapped power-law
        # figure; beyond the budget, recall is the caller's explicit
        # knob, the same contract as ann_ivfpq_topk.
        nprobe = _budget_capped_nprobe(nlist, sized_n)
    u = _tracked_persist(unit_vectors(emb, id_col, vec_col))
    # the centroid table (nlist×dim doubles) and the assignment table
    # (n×nprobe ids) each feed TWO consumers; without pinning them the
    # deep centroid DAG (seed sample → Lloyd step → renormalize)
    # re-evaluates once per consumer. Both are tiny — persist and let
    # the caller release via release_persisted().
    # cents is bounded (nlist ≈ √n rows × ~520 B — 16 MB even at
    # n = 10⁹) and only feeds broadcast collects: one cached partition
    cents = _tracked_persist(_cache_coalesce(
        ivf_centroids(u, nlist, dim), nlist * 520, floor=1))
    # one assignment pass serves both roles: rank 1 = the vector's own
    # list, ranks 1..nprobe = the lists its queries probe. Skinny: the
    # id↔list mapping only — vectors are re-attached ONCE per side
    # below, never per candidate pair.
    # assigns deliberately NOT width-trimmed: its cached partitioning
    # feeds the cogrouped numpy scorer, whose float64 GEMM cosines
    # move by 1 ulp when batch composition changes (measured at
    # sf0.01, BENCH.md round 11) — that would silently break the
    # row-for-row ann_ivf_persisted_topk == ann_ivf_topk gate
    assigns = _tracked_persist(
        ivf_assign(u, cents, dim, nprobe=nprobe, keep_unit=False))
    members = (assigns.where(F.col("crank") == 1)
                      .select("id", F.col("centroid_id").alias("list_id"))
                      .join(u, "id"))
    probes = (assigns.select(F.col("id"),
                             F.col("centroid_id").alias("list_id"))
                     .join(u, "id")
                     .select(F.col("list_id"),
                             F.col("id").alias("query_id"),
                             F.col("unit").alias("qunit")))
    # Per-list scoring as a cogrouped Arrow stage running ONE BLAS
    # matmul per list (queries-probing-the-list × list-members). The
    # round-5 sf1 sweep showed the declarative alternative — join the
    # unit vector onto each of the n·nprobe·(n/nlist) candidate rows
    # twice, then fold a 64-term lambda per row — shuffles ~130 GB of
    # repeated vectors at n=100k and grew 38× for 10× data. Here each
    # vector crosses the wire once per list it touches (n + n·nprobe
    # rows total) and the dot products run in vectorized float64 BLAS;
    # this is the one similarity path where Python beats codegen,
    # exactly as the multimodal codecs are the one Arrow path there.
    # Per-list top-k is a superset of the global per-query top-k
    # restricted to that list (cosine desc, neighbor_id asc is a total
    # order), so the final skinny window over ≤ n·nprobe·k rows is
    # exact IVF-flat semantics, unchanged.
    scored = (members.groupBy("list_id")
                     .cogroup(probes.groupBy("list_id"))
                     .applyInPandas(
                         _ivf_list_scorer(k),
                         "query_id long, neighbor_id long, cosine double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k)
                  .select("query_id", "neighbor_id",
                          F.col("rk").alias("rank"), "cosine"))


def ivf_index_build(emb: DataFrame, index_dir: str,
                    nlist: int | None = None, dim: int = 64,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n: int | None = None) -> None:
    """Build and PERSIST an IVF-flat index: ``index_dir/centroids``
    (centroid_id, cunit) and ``index_dir/members`` (id, list_id, unit
    — each vector stored once, in its rank-1 list).

    Index lifecycle is the piece the per-call ``ann_ivf_topk`` build
    cannot give a serving system: at 100 TB you build (or
    incrementally refresh) the index in one batch job and answer
    every retrieval query against the stored artifact — exactly how
    IVF deployments run. Centroids are the deterministic
    hash-seed + Lloyd-step kernel (ivf_centroids), so a rebuilt index
    over the same corpus is bit-identical, and parquet round-trips
    doubles exactly — ``ann_ivf_query_index`` over the stored index
    EQUALS the in-memory ``ann_ivf_topk`` row for row (gated in
    tests/test_similarity.py).

    Alongside the data a one-row ``index_dir/manifest`` parquet
    (nlist, nmembers, dim) is written through the same writer — the
    stored-index stand-in for catalog statistics. Query-time
    auto-sizing reads it wherever the index lives (parquet footers are
    a local-filesystem shortcut only); the member count rides the
    member write itself as an Observation, so the manifest costs no
    extra pass."""
    from pyspark.sql import Observation
    if nlist is None:
        nlist = max(4, int(math.sqrt(max(
            _corpus_size_for_sizing(emb, n, "ivf_index_build"), 4))))
    u = _tracked_persist(unit_vectors(emb, id_col, vec_col))
    cents = ivf_centroids(u, nlist, dim)
    cents.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    # re-read what was WRITTEN so member assignment can never drift
    # from what queries will later load
    spark = emb.sparkSession
    stored = spark.read.parquet(f"{index_dir}/centroids")
    obs = Observation()
    members = (ivf_assign(u, stored, dim, nprobe=1, keep_unit=True)
               .select("id", F.col("centroid_id").alias("list_id"),
                       "unit")
               .observe(obs, F.count(F.lit(1)).alias("n")))
    members.write.mode("overwrite").parquet(f"{index_dir}/members")
    _ivf_manifest_write(spark, index_dir, nlist, int(obs.get["n"]), dim)


def _ivf_manifest_write(spark, index_dir: str, nlist: int,
                        nmembers: int, dim: int) -> None:
    """Overwrite the one-row stored-index statistics sidecar.

    Built from range(1) + JVM literals, NOT createDataFrame over a
    local list: the local-relation path spins up a Python worker for
    the single row (~5 s measured on this container vs 0.2 s for the
    literal plan) — absurd overhead for a metadata write that runs
    once per index build/refresh."""
    spark.range(1).select(
        F.lit(int(nlist)).cast("long").alias("nlist"),
        F.lit(int(nmembers)).cast("long").alias("nmembers"),
        F.lit(int(dim)).cast("long").alias("dim")) \
         .coalesce(1).write.mode("overwrite") \
         .parquet(f"{index_dir}/manifest")


def _ivf_index_stats(spark, index_dir: str) -> tuple[int, int]:
    """(nlist, nmembers) of a stored IVF index, for query-time
    auto-sizing. LOCAL paths read parquet footers (no job at all);
    anywhere else falls back to the manifest sidecar — a one-row scan
    through whatever filesystem the index lives on, so the auto
    default works on hdfs://s3a:// index dirs instead of raising
    (pre-round-8 behavior). An index with neither (remote AND built by
    something that skipped the manifest) must size explicitly."""
    # same exception family as ivf_index_add's refresh: OSError covers
    # missing dirs and Arrow IO errors, ValueError covers ArrowInvalid
    # on a truncated part file (crash debris) — either way the manifest
    # fallback below is the right answer, not a raw parse error. A
    # non-FileNotFoundError here means CORRUPT footers on a local
    # index, and the manifest can be stale after a crashed add (the
    # next successful add self-heals it) — warn like ivf_index_add
    # does so auto-sizing from a possibly-stale count is visible,
    # never silent. FileNotFoundError stays quiet: that is the normal
    # remote-index path, not corruption.
    try:
        return (_parquet_dir_row_count(f"{index_dir}/centroids"),
                _parquet_dir_row_count(f"{index_dir}/members"))
    except (OSError, ValueError) as exc:
        if not isinstance(exc, FileNotFoundError):
            import warnings
            warnings.warn(
                f"_ivf_index_stats: footer read under {index_dir!r} "
                f"failed ({type(exc).__name__}: {exc}); auto-sizing "
                "from the manifest sidecar, which may be stale after "
                "a crashed add", RuntimeWarning, stacklevel=2)
    try:
        row = spark.read.parquet(f"{index_dir}/manifest").head()
    except Exception as exc:  # noqa: BLE001 — unify the sizing error
        raise FileNotFoundError(
            f"cannot auto-size against {index_dir!r}: no local parquet "
            "footers and no readable manifest sidecar — pass nprobe "
            f"explicitly ({type(exc).__name__}: {exc})") from exc
    return int(row["nlist"]), int(row["nmembers"])


def ivf_index_add(emb_new: DataFrame, index_dir: str, dim: int = 64,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> None:
    """Incrementally index a NEW batch of vectors into an existing
    persisted IVF index (:func:`ivf_index_build`): assign each new
    vector to its nearest STORED centroid and append to the member
    lists — centroids are never retrained per batch (standard IVF
    practice: train once on a representative sample, index forever;
    rebuild wholesale when drift warrants it). This is the daily
    embedding-batch refresh job at 100 TB — one broadcast of the
    stored centroids, one linear assignment pass, one appended
    parquet write; the existing members are never read or rewritten.

    Queries over the refreshed index are identical to an index whose
    member pass had seen old ∪ new with the SAME centroids (gated in
    tests/test_similarity.py). Caller owns id uniqueness across
    batches, like any append sink. The manifest sidecar refresh
    prefers LOCAL parquet footers — read after the append, they are
    the authoritative post-append count, so a manifest left stale by
    a prior crash (between an append and its manifest rewrite) is
    REPAIRED by the next add; only a remote index, where footers
    aren't readable, advances the stored manifest count by the batch
    observed on the append pass, and there a stale count persists
    until a rebuild — skewing only query-time AUTO-sizing slightly,
    never correctness."""
    from pyspark.sql import Observation
    spark = emb_new.sparkSession
    cents = spark.read.parquet(f"{index_dir}/centroids")
    u = unit_vectors(emb_new, id_col, vec_col)
    obs = Observation()
    members = (ivf_assign(u, cents, dim, nprobe=1, keep_unit=True)
               .select("id", F.col("centroid_id").alias("list_id"),
                       "unit")
               .observe(obs, F.count(F.lit(1)).alias("n")))
    members.write.mode("append").parquet(f"{index_dir}/members")
    # LOCAL footers are read AFTER the append — the authoritative
    # post-append count, never double-adding the observed batch and
    # self-healing any stale manifest a prior crashed add left behind.
    # Remote indexes (no local footers) fall back to manifest +
    # observed batch; with neither, sizing stays explicit.
    # OSError covers missing dirs (FileNotFoundError) and Arrow IO
    # errors; ValueError covers pyarrow's ArrowInvalid on a truncated
    # part file — e.g. debris of the very crash this refresh exists to
    # repair. Either way the member APPEND above already succeeded, so
    # a footer-read failure must degrade to the manifest fallback (with
    # a warning), never abort the completed add.
    try:
        nlist = _parquet_dir_row_count(f"{index_dir}/centroids")
        nmembers = _parquet_dir_row_count(f"{index_dir}/members")
    except (OSError, ValueError) as exc:
        if not isinstance(exc, FileNotFoundError):
            import warnings
            warnings.warn(
                f"ivf_index_add: footer refresh under {index_dir!r} "
                f"failed ({type(exc).__name__}: {exc}); falling back "
                "to the manifest sidecar — the append itself succeeded",
                RuntimeWarning, stacklevel=2)
        try:
            row = spark.read.parquet(f"{index_dir}/manifest").head()
        except Exception:  # noqa: BLE001 — no manifest either
            return
        nlist = int(row["nlist"])
        nmembers = int(row["nmembers"]) + int(obs.get["n"])
    _ivf_manifest_write(spark, index_dir, nlist, nmembers, dim)


def _parquet_dir_row_count(path: str) -> int:
    """Row count of a Spark-written parquet directory from footer
    metadata only — the catalog-statistics stand-in for stored-index
    sizing (no job, no scan). LOCAL filesystem paths only: for a
    remote index dir (hdfs://, s3://…) the glob would silently match
    nothing and a silent 0 would auto-size nprobe to 1 — collapsed
    recall with no error — so an empty match RAISES and the caller
    must pass nprobe explicitly (or wire real catalog stats)."""
    import glob
    import os

    import pyarrow.parquet as pq
    # escape the DIRECTORY component: a legitimate local path may
    # contain glob metacharacters ('run[2026]'), and an unescaped
    # char-class matching nothing would turn into a spurious raise
    files = glob.glob(os.path.join(
        glob.escape(path.removeprefix("file:")), "*.parquet"))
    if not files:
        raise FileNotFoundError(
            f"no parquet footers under {path!r} on the LOCAL "
            "filesystem — for a remote index dir pass nprobe "
            "explicitly instead of relying on auto-sizing")
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def ann_ivf_query_index(spark, index_dir: str, queries: DataFrame,
                        k: int = 10, nprobe: int | None = None,
                        dim: int = 64,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine retrieval against a PERSISTED IVF index
    (:func:`ivf_index_build`): broadcast the stored centroids, assign
    each query to its ``nprobe`` nearest lists, score with the same
    cogrouped per-list float64 GEMM the in-memory path uses (each
    stored member crosses the wire once per probed list — never per
    candidate pair), then the exact skinny top-k window. The index is
    scanned, never rebuilt — the build cost amortizes over every
    query batch."""
    if nprobe is None:
        # stored-index statistics (local parquet footers, else the
        # manifest sidecar — works on remote index dirs too): the auto
        # default matches what an in-memory ann_ivf_topk over the same
        # corpus would pick, including the max(2048, 128√n) expected-
        # candidate budget cap (_candidate_budget) that keeps default
        # total scoring work at the assignment scan's n^1.5 order
        nlist, nmembers = _ivf_index_stats(spark, index_dir)
        nprobe = _budget_capped_nprobe(nlist, max(nmembers, 4))
    cents = spark.read.parquet(f"{index_dir}/centroids")
    members = spark.read.parquet(f"{index_dir}/members")
    qu = unit_vectors(queries, id_col, vec_col)
    probes = (ivf_assign(qu, cents, dim, nprobe=nprobe, keep_unit=True)
              .select(F.col("centroid_id").alias("list_id"),
                      F.col("id").alias("query_id"),
                      F.col("unit").alias("qunit")))
    scored = (members.groupBy("list_id")
                     .cogroup(probes.groupBy("list_id"))
                     .applyInPandas(
                         _ivf_list_scorer(k),
                         "query_id long, neighbor_id long, cosine double"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k)
                  .select("query_id", "neighbor_id",
                          F.col("rk").alias("rank"), "cosine"))


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash document fingerprints)
# ---------------------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    the MOSS algorithm, public literature): hash every k-token gram,
    then keep the minimum hash of each sliding window of ``window``
    consecutive gram hashes; the distinct selected hashes are the
    document's fingerprint set.

    Guarantee: two documents sharing a token run of length
    ≥ k + window − 1 share at least one fingerprint — the
    substring-robust alternative to whole-document md5.

    All JVM-side; each derived array is materialized in its own
    projection so nothing expensive is re-evaluated inside lambdas.
    Returns (id, fingerprints array<bigint> sorted, n_fingerprints).
    """
    base = fanout(df.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("_text")))
    toked = base.select("id", TXT.tokens("_text").alias("_toks"))
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))))
    grams = F.when(F.size(toks) >= k, grams) \
             .otherwise(F.array().cast("array<bigint>"))
    hashed = toked.select("id", grams.alias("_kh"))
    kh = F.col("_kh")
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(kh) - window, F.lit(0))),
        lambda j: F.array_min(F.slice(kh, j + 1, window)))
    # fewer k-grams than the window: the whole doc is one window
    mins = F.when(F.size(kh) >= window, mins) \
            .otherwise(F.when(F.size(kh) > 0, F.array(F.array_min(kh)))
                        .otherwise(F.array().cast("array<bigint>")))
    fp = hashed.select(
        "id", F.sort_array(F.array_distinct(mins)).alias("fingerprints"))
    return fp.select("id", "fingerprints",
                     F.size("fingerprints").alias("n_fingerprints"))


def winnow_near_dup(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5, window: int = 4,
                    min_shared: int = 2,
                    max_df: int | None = 1000) -> DataFrame:
    """Pairs sharing ≥ min_shared winnowing fingerprints — near-dup by
    shared substring evidence. Explode fingerprints → equi-join →
    count, the same sub-quadratic shape as the shingle join.

    ``max_df`` caps the pair-join's per-fingerprint blowup: a
    fingerprint present in d documents contributes C(d, 2) join rows,
    so ONE boilerplate k-gram (license header, navigation chrome)
    shared by a million docs would alone generate ~5·10¹¹ candidate
    pairs — the Σ df² quadratic this family must never hit (module
    contract). Fingerprints with document frequency > max_df are
    excluded from NOMINATION (one map-side-combinable df count over
    the exploded stream + an anti-join — both shuffle on the same key
    the pair join needs anyway): at that frequency a shared
    fingerprint is boilerplate, not near-duplication evidence — the
    standard MOSS/winnowing treatment of ubiquitous hashes (Schleimer
    et al. 2003 §5 discard ubiquitous matches). Both nomination and
    n_shared then count sub-cap fingerprints only: a pair whose every
    shared fingerprint is that common stops being nominated.
    ``max_df=None`` disables the cap (exact at any df — small-corpus
    analytics only). Fixture dfs sit far below the default cap, so
    results there are identical with or without it (gated in
    tests/test_similarity.py)."""
    # per-doc linear table with 3-4 consumers (df count + both
    # self-join sides) — persist it so the tokenize→gram-hash→window-
    # min pipeline runs once, not per consumer (same rationale as
    # _rarity_ordered; released by the caller via release_persisted())
    fp = _tracked_persist(winnow_fingerprints(df, id_col, text_col,
                                              k, window))
    ex = fp.select("id", F.explode("fingerprints").alias("fp"))
    if max_df is not None:
        hot = (ex.groupBy("fp").agg(F.count("*").alias("_df"))
                 .where(F.col("_df") > max_df).select("fp"))
        ex = ex.join(hot, "fp", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                     & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("n_shared"))
             .where(F.col("n_shared") >= min_shared))


# ---------------------------------------------------------------------------
# MinHash + LSH banding (Broder; the scale path for near-dup)
# ---------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """Per-id MinHash signature: array of num_hashes min-hash values.

    h_i(s) = xxhash64(shingle, seed=i) — deterministic, JVM-side, one
    aggregate pass (num_hashes MIN aggregates, all map-side
    combinable). Returns (id, sig array<long>).
    """
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_band_array(bands: int, rows: int) -> Column:
    """``array<struct<band, bucket>>`` of LSH band keys over a ``sig``
    column — THE single definition of the banding scheme. Within-batch
    pair generation (:func:`minhash_lsh_pairs`) and the streaming
    near-dup ledger's stored keys (streaming/neardup_stream.py) both
    derive from this expression, so cross-boundary candidate joins can
    never silently drift from within-batch semantics."""
    return F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col("sig")[b * rows + r]
                              for r in range(rows)]).alias("bucket"))
        for b in range(bands)])


def lsh_band_keys(sig: DataFrame, bands: int = 16,
                  rows: int = 4) -> DataFrame:
    """Exploded (id, band, bucket) band keys of a (id, sig) table."""
    return (sig.select("id",
                       F.explode(lsh_band_array(bands, rows)).alias("bb"))
               .select("id", F.col("bb.band").alias("band"),
                       F.col("bb.bucket").alias("bucket")))


def minhash_lsh_pairs(sig: DataFrame, bands: int = 16, rows: int = 4,
                      num_hashes: int | None = None,
                      max_bucket_size: int | None = None) -> DataFrame:
    """Candidate pairs whose signatures collide in ≥1 band.

    Band b = hash of sig[b*rows .. (b+1)*rows); join key is
    (band_index, band_hash) so each bucket's pairs are generated by a
    per-bucket self-join — the LSH trick that keeps pair generation
    linear-ish in corpus size instead of O(n²).

    Pass ``num_hashes`` (the signature length) when known: indexes past
    the signature end evaluate to null, which makes those bands hash to
    a constant and silently bucket EVERY document together — candidate
    generation degrades toward O(n²) with only the verify step saving
    precision.

    ``max_bucket_size`` drops band buckets larger than the cap before
    the self-join — the safety valve for degenerate buckets (massive
    boilerplate clusters) whose |bucket|² blowup AQE's skew-split can
    spread but not shrink. Docs in a dropped bucket usually still pair
    through their OTHER bands; a cluster identical across all bands is
    deliberately skipped — at that size it is a boilerplate class to
    handle by exact fingerprint grouping, not pairwise comparison.
    Off by default (exact-scope candidate generation).
    """
    if num_hashes is not None and bands * rows > num_hashes:
        raise ValueError(
            f"bands*rows = {bands * rows} exceeds signature length "
            f"{num_hashes}")
    exploded = lsh_band_keys(sig, bands=bands, rows=rows)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        exploded = (exploded
                    .withColumn("_bsz", F.count("*").over(w))
                    .where(F.col("_bsz") <= max_bucket_size)
                    .drop("_bsz"))
    a, b2 = exploded.alias("a"), exploded.alias("b")
    return (a.join(b2, (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.bucket") == F.col("b.bucket"))
                     & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())


def minhash_near_dup(df: DataFrame, id_col: str, text_col: str,
                     n: int = 3, num_hashes: int = 64,
                     bands: int = 16, rows: int = 4,
                     threshold: float = 0.5,
                     max_bucket_size: int | None = None) -> DataFrame:
    """MinHash-LSH near-dup pipeline with exact-Jaccard verification.

    shingle → signature → banded candidate pairs → verify candidates
    with exact Jaccard (so precision is 1.0; recall is the LSH S-curve
    at (bands, rows)). Deterministic end to end (seeded xxhash64).
    """
    if bands * rows > num_hashes:
        raise ValueError(
            f"bands*rows = {bands * rows} exceeds num_hashes = "
            f"{num_hashes}: out-of-range signature indexes would null "
            "out and hash every document into one constant bucket")
    # signature branch + two verification set-attaches reuse the
    # per-doc shingle arrays — persist (linear, one row per doc);
    # released by the caller via release_persisted()
    arr = _tracked_persist(shingle_array(df, id_col, text_col, n))
    sh = arr.select("id", F.explode("shingles").alias("shingle"))
    sig = minhash_signatures(sh, num_hashes)
    cand = minhash_lsh_pairs(sig, bands, rows, num_hashes=num_hashes,
                             max_bucket_size=max_bucket_size)

    # verify with exact intersection on the full sets (array_intersect
    # — no second explode-join). Sets travel as 8-byte xxhash64
    # bigints, not ~30-byte shingle strings — the same ~3× wire /
    # intersect cut the Jaccard prefix path and the overlap matrix
    # use, with the same accepted 2^-64-per-pair collision caveat
    sets = arr.select(
        "id",
        F.transform("shingles", lambda x: F.xxhash64(x)).alias("shingles"),
        "set_size")
    verified = (cand
                .join(sets.select(F.col("id").alias("id_a"),
                                  F.col("shingles").alias("sh_a"),
                                  F.col("set_size").alias("size_a")), "id_a")
                .join(sets.select(F.col("id").alias("id_b"),
                                  F.col("shingles").alias("sh_b"),
                                  F.col("set_size").alias("size_b")), "id_b")
                .withColumn("n_common",
                            F.size(F.array_intersect("sh_a", "sh_b"))))
    jac = (F.col("n_common").cast("double")
           / (F.col("size_a") + F.col("size_b") - F.col("n_common")))
    return (verified.withColumn("jaccard", jac)
                    .where(F.col("jaccard") >= threshold)
                    .select("id_a", "id_b", "jaccard"))


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs (dedup clusters)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 50,
                         algorithm: str = "label-propagation") -> DataFrame:
    """Cluster ids connected through a pair list: (id, cluster_id) with
    cluster_id = min id reachable from id.

    ``algorithm='label-propagation'`` (default) converges in
    O(diameter) rounds of one cheap shuffle each — right for near-dup
    graphs, whose components are small and dense. For adversarial
    topologies (a 100 TB crawl where boilerplate chains documents into
    long paths), ``algorithm='two-phase'`` runs the alternating
    large-star/small-star contraction of Kiveris et al., "Connected
    Components in MapReduce and Beyond" (SoCC'14): O(log n) rounds of
    a couple of shuffles each, property-tested to converge within
    ~2·log2(n) rounds on a path graph in tests/test_similarity.py.
    Both produce identical labels (min reachable id).

    Near-dup pair lists are the OUTPUT of MinHash/SimHash joins; what a
    dedup pipeline acts on is the transitive closure — keep one doc per
    *cluster*, not per pair. Iterative min-label propagation: each
    round, every node adopts the smallest label among itself and its
    neighbors; converges in O(diameter) rounds (near-dup clusters are
    small and dense — a handful of rounds in practice; the alternating
    star-contraction family from the MapReduce-connectivity literature
    drops this to O(log n) if ever needed).

    Driver-side loop, each round one shuffle. Each round's label table
    is cut loose with an EAGER localCheckpoint: persist alone caches
    data but leaves the logical plan nested — the old labels appear
    twice per round (propagation join + change test), so the plan
    doubles every round and ~14 rounds OOM the ANALYZER on a 15-row
    chain (measured). Checkpointing resets the plan to a scan of the
    materialized partitions. Checkpoint storage is NOT governed by
    DataFrame.unpersist (it lives in RDD blocks the cache manager
    never sees), so each superseded round's backing RDDs are captured
    and unpersisted explicitly the moment the next round materializes
    — at most two rounds hold blocks at any time — and the final
    round's handles go to the module release hook. The loop exits
    only on convergence; if ``max_iter`` rounds pass while labels are
    still moving it RAISES (a silently truncated closure would split
    clusters — every oracle-checked consumer compares against a true
    recursive closure), so pathological diameters demand an explicit
    higher cap (or the two-phase algorithm) rather than getting wrong
    clusters.
    """
    if algorithm == "two-phase":
        return _connected_components_two_phase(pairs, id_a, id_b, max_iter)
    if algorithm != "label-propagation":
        raise ValueError(f"unknown algorithm {algorithm!r}: expected "
                         "'label-propagation' or 'two-phase'")
    # Self-loops stay: they are no-ops for min-label propagation
    # (min with your own label) but they carry self-pair-only nodes
    # into the node set, so both algorithms cover the SAME ids — a
    # filtered build silently dropped an id appearing only as (x, x)
    # while the two-phase path kept it
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # undirected: propagate both ways. Symmetrize with a map-side
    # explode, NOT a self-union — a union evaluates the (often very
    # expensive) upstream pair pipeline once per branch when this
    # table first materializes (measured 2× the whole MinHash/cosine
    # verify at sf1), while the explode doubles rows in one pass.
    sym = edges.select(F.explode(F.array(
        F.struct(F.col("src"), F.col("dst")),
        F.struct(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )).alias("_e")).select("_e.src", "_e.dst")
    sym = _tracked_persist(sym)
    # Materialize sym NOW, before any _checkpoint_tracked snapshot.
    # The capture diff assumes every RDD persisted during a checkpoint
    # action backs that checkpoint; if sym (and any lazily-persisted
    # subtree inside the caller's pair pipeline) first materializes
    # inside the init-labels action instead, its cache handle lands in
    # round 0's release list and the per-round unpersist silently
    # evicts it — every later round then re-runs the full pair
    # pipeline (measured: the sf1 SemDeDup verify re-executed once per
    # round, 5× the query). CC executes at call time by contract
    # (registry _EXECUTES_ON_CALL), so an eager action here is fine.
    sym.count()
    labels, cur_handles = _checkpoint_tracked(
        sym.select(F.col("src").alias("id"))
           .distinct()
           .withColumn("label", F.col("id")))
    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym["dst"] == labels["id"])
                           .groupBy("src")
                           .agg(F.min("label").alias("nmin")))
        new_labels, new_handles = _checkpoint_tracked(
            labels.join(neighbor_min,
                        labels["id"] == neighbor_min["src"], "left")
                  .select(labels["id"],
                          F.least("label", "nmin").alias("label")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        for h in cur_handles:       # free the superseded round NOW
            h.unpersist(False)
        labels, cur_handles = new_labels, new_handles
        if changed == 0:
            _CHECKPOINTED_JRDDS.extend(cur_handles)
            return labels.select("id", F.col("label").alias("cluster_id"))
    for h in cur_handles:
        h.unpersist(False)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the component diameter exceeds max_iter — raise it (clusters "
        "would otherwise be silently split)")


def _connected_components_two_phase(pairs: DataFrame, id_a: str, id_b: str,
                                    max_iter: int) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14): maintains a child→parent edge set with parent < child;
    each round every node hooks its neighborhood onto the neighborhood
    minimum, roughly halving component height — O(log n) rounds total
    versus O(diameter) for label propagation.

    Round shape: large-star is one groupBy + one join; small-star one
    groupBy + one join + a distinct; the convergence probe compares the
    directed edge sets. Same checkpoint-and-release discipline as the
    label-propagation loop (the edge plan would otherwise nest one join
    deeper per round and blow up the analyzer).
    """
    # canonical child→parent orientation: (max, min), no self-loops
    e0 = (pairs.select(F.col(id_a).alias("_x"), F.col(id_b).alias("_y"))
               .where(F.col("_x") != F.col("_y"))
               .select(F.greatest("_x", "_y").alias("u"),
                       F.least("_x", "_y").alias("v"))
               .distinct())
    nodes = (pairs.select(F.explode(F.array(F.col(id_a), F.col(id_b)))
                          .alias("id")).distinct())
    nodes = _tracked_persist(nodes)
    # Pin the cache before any _checkpoint_tracked snapshot — same
    # capture-race rationale as the label-propagation path above.
    nodes.count()
    edges, cur_handles = _checkpoint_tracked(e0)
    for _ in range(max_iter):
        # -- large-star: every neighbor larger than u hooks onto
        # m(u) = min(N(u) ∪ {u}); operates on the undirected view
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lm = (sym.groupBy("u").agg(F.min("v").alias("_mn"))
                 .select("u", F.least("_mn", F.col("u")).alias("m")))
        large = (sym.join(lm, "u")
                    .where(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("u"), F.col("m").alias("v"))
                    .where(F.col("u") != F.col("v"))
                    .distinct())
        # -- small-star: u and its (all-smaller) out-neighbors hook
        # onto their minimum
        sm = large.groupBy("u").agg(F.min("v").alias("m"))
        hooked = (large.join(sm, "u")
                       .select(F.col("v").alias("u"), F.col("m").alias("v"))
                       .where(F.col("u") != F.col("v")))
        own = sm.select("u", F.col("m").alias("v")) \
                .where(F.col("u") != F.col("v"))
        new_edges, new_handles = _checkpoint_tracked(
            hooked.unionByName(own).distinct())
        # converged when the directed star set is stable (same size and
        # nothing new — together: set equality)
        stable = (new_edges.count() == edges.count()
                  and new_edges.exceptAll(edges).limit(1).count() == 0)
        for h in cur_handles:
            h.unpersist(False)
        edges, cur_handles = new_edges, new_handles
        if stable:
            _CHECKPOINTED_JRDDS.extend(cur_handles)
            # at convergence every non-root points straight at its
            # component min; roots (and any node whose only edges were
            # self-canceling) label themselves
            parent = edges.groupBy("u").agg(F.min("v").alias("_p"))
            return (nodes.join(parent, nodes["id"] == parent["u"], "left")
                         .select("id", F.coalesce("_p", "id")
                                 .alias("cluster_id")))
    for h in cur_handles:
        h.unpersist(False)
    raise RuntimeError(
        f"two-phase connected components did not converge in {max_iter} "
        "rounds — expected O(log n); the input may be adversarial or "
        "max_iter too small")


# ---------------------------------------------------------------------------
# SimHash (Charikar) — 64-bit fingerprints + hamming near-dup
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document from token hashes.

    Bit b of the fingerprint = majority vote of bit b across
    xxhash64(token) of all tokens. One explode + one groupBy with 64
    map-side-combinable SUMs — entirely codegen'd.
    """
    base = fanout(df.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("_text")))
    toks = base.select("id", F.explode(TXT.tokens("_text")).alias("tok"))
    h = F.xxhash64("tok")
    votes = [F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                          F.lit(1)).otherwise(F.lit(-1))).alias(f"v{b}")
             for b in range(64)]
    agg = toks.groupBy("id").agg(*votes)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return agg.select("id", fp.alias("simhash"))


_SIMHASH_CAND_BUDGET = 64     # expected random collisions per doc
_SIMHASH_MAX_TABLES = 64      # explode-factor ceiling


def _simhash_blocks(k: int, n: int) -> int:
    """Smallest block count whose expected random-collision candidate
    volume stays ≤ ~_SIMHASH_CAND_BUDGET per doc at corpus size n.

    With b blocks a radius-k pair matches on ≥ one of C(b, k) block
    combinations of size b−k, each an effective (b−k)·⌊64/b⌋-bit key:
    expected collisions/doc ≈ C(b, k) · n / 2^keybits. b = k+1 (the
    classic one-block-match split) binds up to n ≈ 10⁶ at k=3; at
    n=10⁹ the auto pick is b=6 (20 tables, 30-bit keys, ~19
    candidates/doc) where the fixed k+1 split would generate n²/2¹⁶
    pairs — a quadratic blowup. Table count is capped (C(b, k) ≤ 64):
    past the cap the widest affordable key wins, best effort.
    """
    best = max(k + 1, 1)
    for b in range(max(k + 1, 1), 17):
        if math.comb(b, min(k, b)) > _SIMHASH_MAX_TABLES:
            break
        best = b
        keybits = (b - k) * (64 // b)
        if math.comb(b, min(k, b)) * (n / float(2 ** min(keybits, 63))) \
                <= _SIMHASH_CAND_BUDGET:
            return b
    return best


def simhash_near_dup(df: DataFrame, id_col: str, text_col: str,
                     max_hamming: int = 3, blocks: int | None = None,
                     n: int | None = None) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole banding, GENERALIZED (Manku, Jain & Das Sarma, WWW
    2007 §3): the 64 bits split into ``blocks`` contiguous blocks; a
    pair within radius k differs in at most k blocks, so it matches
    EXACTLY on at least one of the C(blocks, k) combinations of
    blocks−k blocks — each combination is one equi-join table whose
    key is the xxhash64 of its pieces. ``blocks = k+1`` degenerates to
    the classic one-block-match split (the old fixed behavior, 16-bit
    keys at k=3); larger ``blocks`` widen the effective key to
    (blocks−k)·⌊64/blocks⌋ bits at the cost of C(blocks, k) tables.
    ``blocks=None`` auto-sizes from corpus cardinality ``n``
    (catalog/file statistics, like every index-sizing knob — see
    :func:`_simhash_blocks`): the fixed k+1 split is quadratic at
    scale (n²/2¹⁶ candidate pairs at k=3 — ~10¹³ at a billion docs),
    while the auto pick holds expected candidates ~linear. Candidate
    generation only: completeness is exact (pigeonhole) and every
    candidate passes the exact bit_count(xor) ≤ k verify, so the
    result set is IDENTICAL for any legal ``blocks`` (equality gated
    in tests/test_similarity.py; a hash collision on the 64-bit combo
    key can only ADD a candidate the verify then rejects).
    """
    k = max_hamming
    if blocks is None:
        # module sizing convention (_corpus_size_for_sizing): pass n
        # from catalog stats, or pay one loudly-warned count(). The
        # safe-at-scale default matters MORE here than laziness — an
        # unknown-n fallback to the k+1 split would be the quadratic
        # blowup this auto-sizing exists to prevent.
        blocks = _simhash_blocks(
            k, _corpus_size_for_sizing(df, n, "simhash_near_dup"))
    if not (k < blocks <= 64):
        raise ValueError(
            f"simhash_near_dup: need max_hamming < blocks <= 64, got "
            f"blocks={blocks}, max_hamming={k}")
    if math.comb(blocks, min(k, blocks)) > _SIMHASH_MAX_TABLES:
        # an explicit split must obey the same table ceiling the auto
        # path enforces: C(40, 20) combination tuples would hang the
        # DRIVER at plan build, long before any Spark job
        raise ValueError(
            f"simhash_near_dup: C(blocks={blocks}, k={k}) = "
            f"{math.comb(blocks, min(k, blocks))} join tables exceeds "
            f"the {_SIMHASH_MAX_TABLES}-table ceiling — lower blocks "
            "or raise max_hamming granularity")
    base_w = 64 // blocks
    sig = simhash64(df, id_col, text_col)

    def piece(i):
        start = i * base_w
        # the LAST block absorbs the 64 % blocks remainder so every
        # bit belongs to exactly one block (pigeonhole completeness)
        width = base_w if i < blocks - 1 else 64 - start
        shifted = F.shiftright(F.col("simhash"), start)
        if width >= 64:
            # blocks=1 (k=0) → the full value IS the piece; a
            # (1<<64)-1 literal would overflow LongType at plan build
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    combos = list(itertools.combinations(range(blocks), blocks - k))
    keys = F.array(*[
        F.struct(F.lit(ci).alias("combo"),
                 F.xxhash64(F.lit(ci), *[piece(i) for i in combo])
                  .alias("bkey"))
        for ci, combo in enumerate(combos)])
    ex = (sig.select("id", "simhash", F.explode(keys).alias("kk"))
             .select("id", "simhash", F.col("kk.combo").alias("combo"),
                     F.col("kk.bkey").alias("bkey")))
    a, b = ex.alias("a"), ex.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (a.join(b, (F.col("a.combo") == F.col("b.combo"))
                     & (F.col("a.bkey") == F.col("b.bkey"))
                     & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     ham.alias("hamming"))
             .distinct()
             .where(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantization scoring on IVF candidates
# ---------------------------------------------------------------------------

def _pq_d2(dsub: int) -> Column:
    """Squared L2 between a unit vector's ``sub_id``-th subvector and
    the joined codebook cell ``ccent``, spelled as an explicit
    ``element_at`` chain instead of the earlier
    slice + zip_with + aggregate fold: higher-order functions are
    CodegenFallback-interpreted, and on the n·m·ksub-row encode
    crossJoin that interpretation (plus the per-row slice/zip array
    allocations) was the profiled cost of the two hottest codegen
    spans in ann_ivfpq_topk (WholeStageCodegen 5+6, ~46 s of task time
    at sf0.1 — BENCH.md round 11; the element_at spelling measured
    0.65 s vs 0.95 s median on the isolated encode fragment).
    ``dsub`` is a plan-time constant, so the chain stays tiny (2 terms
    at the m=32 default — nothing like the 64-term flat chains the
    round-2 note warns about). The left-associated sum adds terms in
    exactly the fold's order (the fold's 0.0 seed is exact: every term
    is a square, ≥ +0.0), so the result is bit-identical."""
    total: Column | None = None
    for j in range(dsub):
        a = F.element_at(F.col("unit"),
                         (F.col("sub_id") * dsub + j + 1).cast("int"))
        b = F.element_at(F.col("ccent"), j + 1)
        t = (a - b) * (a - b)
        total = t if total is None else total + t
    return total


def pq_codebooks(unit: DataFrame, m: int, ksub: int, dim: int,
                 refine: bool = True) -> DataFrame:
    """Deterministic product-quantization codebooks (Jégou et al.,
    TPAMI 2011): the embedding space splits into ``m`` subspaces of
    ``dim/m`` dims; each subspace gets ``ksub`` centroids seeded from
    the subvectors of a hash-ordered corpus sample, then (``refine``)
    one Lloyd step on a ~25% hash-sample — raw sample points are
    CORNERS of the subvector distribution, not cell centers, and the
    one averaging step is the cheapest large chunk of the k-means
    quantization-error drop (same train-on-a-sample discipline as
    :func:`ivf_centroids`; measured recall@5 at sf0.01 raw-seeds
    0.574 → refined 0.616 at 4·k rerank, +0.06 at sf0.1 — identical
    query cost, the codebook is built once and scored everywhere).

    ONE TakeOrdered pass samples the m·ksub seed vectors (not one scan
    per subspace); sample row i becomes centroid ``code = i % ksub`` of
    subspace ``sub_id = i // ksub``. Returns
    (sub_id, code, ccent array<double>[dim/m]) — m·ksub rows, always
    broadcastable.
    """
    if m <= 0 or ksub <= 0 or dim <= 0:
        raise ValueError("pq: m, ksub, and dim must be positive")
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    dsub = dim // m
    take = m * ksub
    seeds = (unit.withColumn("_h", F.xxhash64(F.col("id")))
                 .orderBy("_h", "id").limit(take)
                 .select((F.row_number().over(Window.orderBy("_h", "id")) - 1)
                         .alias("i"), "unit"))
    sub_id = F.floor(F.col("i") / ksub).cast("int")
    cb = seeds.select(
        sub_id.alias("sub_id"),
        (F.col("i") % ksub).cast("int").alias("code"),
        F.slice("unit", sub_id * dsub + 1, dsub).alias("ccent"))
    if not refine:
        return cb
    # one Lloyd step: assign a deterministic ~25% hash-sample's
    # subvectors to their seed codeword (L2 argmin as a map-side
    # combinable struct-MIN, same shape as pq_encode), then per-cell
    # per-dimension means; empty cells keep their seed
    sample = unit.where(F.xxhash64(F.col("id"), F.lit(11)) % 4 == 0)
    sub = F.slice("unit", F.col("sub_id") * dsub + 1, dsub)
    d2 = _pq_d2(dsub)
    assigned = (sample.crossJoin(F.broadcast(cb))
                      .select("id", "sub_id", sub.alias("_sv"),
                              F.struct(d2.alias("d2"),
                                       F.col("code").alias("code"))
                               .alias("sc"))
                      .groupBy("id", "sub_id")
                      .agg(F.min("sc").alias("b"), F.first("_sv").alias("sv"))
                      .select("sub_id", F.col("b.code").alias("code"), "sv"))
    means = (assigned.select("sub_id", "code",
                             F.posexplode("sv").alias("pos", "v"))
                     .groupBy("sub_id", "code", "pos")
                     .agg(F.avg("v").alias("mv"))
                     .groupBy("sub_id", "code")
                     .agg(F.array_sort(F.collect_list(
                         F.struct("pos", "mv"))).alias("pm"))
                     .select("sub_id", "code",
                             F.transform("pm", lambda s: s["mv"])
                              .alias("mcent")))
    return (cb.alias("s")
              .join(means.alias("m"), ["sub_id", "code"], "left")
              .select("sub_id", "code",
                      F.coalesce("m.mcent", "s.ccent").alias("ccent")))


def pq_encode(unit: DataFrame, codebooks: DataFrame, m: int, ksub: int,
              dim: int) -> DataFrame:
    """PQ codes for every vector: per subspace, the L2-nearest centroid
    of the vector's subvector. Returns (id, codes map<sub_id, code>).

    The scoring join is corpus × broadcast(m·ksub codebook) with a
    dsub-term codegen distance chain (:func:`_pq_d2`); the argmin is a
    struct-MIN aggregate ((d2, code) lexicographic — map-side
    combinable, no window), then one collect_list pack per id. Work is n·dim·ksub
    multiply-adds — ksub× the IVF assignment scan, still linear in n.
    """
    dsub = dim // m
    d2 = _pq_d2(dsub)
    scored = (unit.crossJoin(F.broadcast(codebooks))
                  .select("id", "sub_id",
                          F.struct(d2.alias("d2"),
                                   F.col("code").alias("code")).alias("sc")))
    best = (scored.groupBy("id", "sub_id")
                  .agg(F.min("sc").alias("b"))
                  .select("id", "sub_id", F.col("b.code").alias("code")))
    # a MAP keyed by sub_id, not a positional array: if the corpus has
    # fewer than m·ksub rows the sampled codebook is sparse and a
    # positional pack would silently shift every later subspace
    return (best.groupBy("id")
                .agg(F.map_from_entries(F.collect_list(
                    F.struct("sub_id", "code"))).alias("codes")))


def pq_query_tables(unit: DataFrame, codebooks: DataFrame, m: int,
                    ksub: int, dim: int) -> DataFrame:
    """Per-query ADC lookup table: dot(query subvector, centroid) for
    every (sub_id, code), as a DENSE positional array indexed by
    ``slot = sub_id·ksub + code`` (length m·ksub; slots absent from a
    sparse codebook hold 0.0 — no member can carry such a code, so
    the value is never read). Returns (id, qtab array<float>).

    Dense array, not the slot-keyed map it used to be: the qtab rides
    the probe fan-out join (one replica per probed list), and Arrow
    moves array<float> into the cogrouped scorer as a numpy block —
    the map<int,double> encoding forced a per-entry Python dict
    conversion inside every task, ~420M entries at sf1/nprobe=41
    (n·nprobe·m·ksub), measured as the dominant IVF-PQ cost once the
    ADC itself went through the one-hot GEMM. The slot scatter
    (sparse-codebook alignment safety) happens in ONE Arrow
    mapInPandas pass over the n QUERY rows — never per probe, and
    never as a JVM transform(sequence, element_at) projection: that
    higher-order-function spelling is CodegenFallback-interpreted and
    its 512 linear map scans per row measured ~50 s at sf1 on their
    own."""
    import numpy as np
    import pandas as pd

    dsub = dim // m
    size = m * ksub
    sub = F.slice("unit", F.col("sub_id") * dsub + 1, dsub)
    dot = F.aggregate(F.zip_with(sub, "ccent", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    slot = (F.col("sub_id") * ksub + F.col("code")) \
        .cast("int").alias("slot")

    def densify(it):
        # one (slot, dot) struct list per query — a single aggregate,
        # so slot/dot pairing never depends on cross-aggregate
        # iteration order
        for pdf in it:
            out = np.zeros((len(pdf), size), dtype=np.float32)
            for r, cell in enumerate(pdf["_sd"]):
                for e in cell:
                    out[r, int(e["slot"])] = float(e["dot"])
            yield pd.DataFrame({"id": pdf["id"], "qtab": list(out)})

    # float, not double: the qtab is the WIRE-dominant column (one
    # replica per probed list — n·nprobe rows), and ADC is an
    # approximate shortlist score whose exactness lives in the
    # downstream re-rank on true dot products; float32's ~1e-7
    # relative error is orders below the PQ quantization error it
    # rides on, so halving the fan-out bytes is free (sf1 recall
    # bit-identical at every measured knob). The id field keeps the
    # input's type (ADVICE r10: hard-coding `id long` narrowed the
    # previously type-preserving aggregation for string/int32 ids).
    id_type = unit.schema["id"].dataType.simpleString()
    return (unit.crossJoin(F.broadcast(codebooks))
                .select("id", slot, dot.alias("dot"))
                .groupBy("id")
                .agg(F.collect_list(F.struct("slot", "dot"))
                      .alias("_sd"))
                .mapInPandas(densify,
                             f"id {id_type}, qtab array<float>"))


def ann_ivfpq_topk(emb: DataFrame, k: int = 10, nlist: int | None = None,
                   nprobe: int | None = None, m: int = 32, ksub: int = 16,
                   rerank: int | None = None, id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64,
                   n: int | None = None, residual: bool = False,
                   cb_refine: bool = True,
                   probe_payload: str = "qunit") -> DataFrame:
    """IVF-PQ two-stage retrieval — the memory-bound 100 TB ANN shape:
    IVF lists prune candidates (~nprobe/nlist of the corpus per query),
    asymmetric-distance PQ scores them from ``m`` byte codes instead of
    ``dim`` floats (an 8×-32× traffic cut on the candidate join — at
    scale the codes table fits where the vectors never would), and the
    ADC top-``rerank`` get ONE exact re-scoring pass (the standard
    refinement step; Jégou et al. 2011).

    ADC approximates dot(q, x) ≈ Σ_s dot(q_s, centroid[code_s(x)]) via
    a per-query lookup table, so the candidate join ships (query_id,
    neighbor_id, m codes) — never the vectors. Returns the same schema
    as the other ANN paths: (query_id, neighbor_id, rank, cosine) with
    ``cosine`` EXACT (from the re-rank pass). Deterministic end to end.

    Defaults: ``nprobe=None`` → :func:`_auto_nprobe` (⌈nlist^0.75⌉,
    floor 4 — the constant-4 default's recall decayed with scale)
    ADDITIONALLY capped so a query's expected candidate count
    (nprobe·n/nlist) stays within :func:`_candidate_budget` =
    max(2048, 128√n) — under the √n curve the power law runs unclipped
    through n ≈ 420k, and past that the cap holds nprobe near
    128·nlist/√n ≈ 128 (n=1M/nlist=1000 → 128 probes), bounding both
    the per-list ADC work and the number of probe-payload replicas
    (dim·4 ≈ 256 B qunit rows at the default wire) each query ships;
    pass ``nprobe`` explicitly to trade wire volume for recall. ``m=32`` (2-dim subspaces): each m
    doubling halves the per-subspace quantization error that ate the
    IVF candidate recall the lists had paid for (drive recall@5 at
    sf0.01: m=8 0.35 → m=16 0.767 → m=32 0.778 — the IVF list
    ceiling itself; sf0.1: m=16 0.693 → m=32 0.757, clearing the 0.7
    line the other ANN paths hold at bench scale). Codes are m·4 bits
    = 16 bytes/vector, still a 16× traffic cut vs the 64-double
    vectors, and the encode scan is m-INDEPENDENT (n·ksub·dim
    multiply-adds), so the costs that double are only the broadcast
    codebook (512 tiny rows), the per-query table (~2 KB), and the
    per-candidate ADC gather — measured wall at sf0.1 actually FELL
    (18.6 → 16.5 s, the better shortlist converges the re-rank
    window). The SAME-BUDGET alternative (m=32, ksub=4 — 8 bytes)
    measured WORSE than m=16 at both SFs (0.760/0.676): on
    near-uniform fixtures, 4 codewords in a 2-dim subspace is too
    coarse — finer subspaces only pay when the per-subspace codebook
    keeps its resolution. An OPQ-style rotation (Ge et al. CVPR'13)
    was considered and NOT taken: its gain comes from decorrelating
    subspaces, and these fixtures are isotropic by construction — the
    rotation has nothing to decorrelate (the same reasoning the
    residual path's measured inversion confirmed empirically).
    (The "costs that double" with m include the per-query table —
    m·ksub float32 slots ≈ 2 KB at the m=32 default.)

    ``rerank=None`` → 16·k: on low-contrast corpora the ADC shortlist
    is the recall bottleneck, and deepening the EXACT re-rank pass is
    the cheapest lever — the 16·k depth was established at m=16
    (recall@5 at sf0.01: 0.616 at 4·k → 0.720 at 8·k → 0.767 at
    16·k) and carries over unchanged to the m=32 default, where the
    sharper ADC shortlist lifts the same re-rank to the 0.778 ceiling
    (see the m paragraph above for the current numbers). The re-rank
    join's wire bill is rerank·n skinny rows picking up two
    dim-double vectors, so at extreme n it is the term to tune DOWN
    (or raise ``m``) when wire, not recall, binds.

    ``residual=False`` by default, and deliberately so: the standard
    IVFADC formulation (Jégou §III) quantizes residuals x − c_list —
    implemented here behind ``residual=True`` (codes encode the
    residual, the probe carries the exact dot(q, c_list) offset so
    ADC stays comparable across lists) — but on this engine's
    NEAR-UNIFORM random fixtures the centroid explains almost none of
    a vector's direction, so residual norms EXCEED unit norms and the
    same codebook budget quantizes them WORSE: measured recall@5 at
    sf0.01 is 0.549 residual vs 0.616 raw (refined codebooks, 4·k
    rerank), the inversion holding at sf0.1 (0.401 vs 0.473). On real
    clustered embeddings the classic result favors residuals — the
    knob is there for such corpora; the default serves the measured
    worst case. ``cb_refine=True`` applies one Lloyd step to the
    sampled PQ codebooks (see :func:`pq_codebooks`), worth +0.04-0.06
    recall at identical query cost.

    ``probe_payload`` selects what each (query, probed list) row
    carries into the cogrouped scorer: ``'qunit'`` (default) ships
    the dim·4-byte float32 unit vector and rebuilds the ADC table
    in-task from an in-band broadcast codebook row (see
    :func:`_pq_list_scorer` — the round-11 8× cut on the probe
    join's dominant wire payload); ``'qtab'`` is the legacy
    precomputed-table wire, kept for A/B measurement (BENCH.md
    round-11 table).
    """
    if nlist is None or nprobe is None:
        # only auto-sizing needs the corpus cardinality — a call with
        # both knobs explicit must stay pure planning (no count scan,
        # no sizing warning)
        sized_n = max(_corpus_size_for_sizing(emb, n, "ann_ivfpq_topk"), 4)
    if nlist is None:
        nlist = max(4, int(math.sqrt(sized_n)))
    if nprobe is None:
        # auto nprobe, additionally capped so a query's expected
        # candidate volume (nprobe·n/nlist) stays within
        # _candidate_budget(n) = max(2048, 128√n): the cap bounds both
        # the per-list ADC gather work and — the binding wire cost —
        # the number of probe-payload replicas (dim·4 ≈ 256 B qunit
        # rows at the default wire) each query ships (one per probed
        # list); under the √n curve that wire cost is nprobe ≈
        # 128·nlist/√n ≈ 128 replicas/query at ANY capped scale (vs
        # the flat-2048 cap's 2, which bought its cheapness with
        # recall decaying as 2048/n — see _candidate_budget). The
        # earlier declarative
        # ADC join additionally materialized a qtab per CANDIDATE row
        # and failed the 10× sweep step outright once m=16 pushed the
        # codes table past the auto-broadcast threshold.
        nprobe = _budget_capped_nprobe(nlist, sized_n)
    rerank = rerank if rerank is not None else 16 * k
    u = _tracked_persist(unit_vectors(emb, id_col, vec_col))
    # cents / cb are bounded-size tables that only feed broadcasts —
    # trim both cached widths (see _cache_coalesce: cached plans
    # bypass AQE coalescing, so they'd otherwise materialize at the
    # 8×cores initial partition count)
    cents = _tracked_persist(_cache_coalesce(
        ivf_centroids(u, nlist, dim), nlist * 520, floor=1))
    # keep_score only under residual encoding, where the ranking's
    # dot(q, c) becomes the exact per-probe qc offset the residual ADC
    # needs (see below). It is free to COMPUTE (the assignment ranks on
    # it anyway) but not to carry: the default raw path never reads it,
    # and persisting + shuffling an extra double across the n·nprobe
    # assigns rows buys nothing there.
    # assigns deliberately NOT width-trimmed — same 1-ulp GEMM
    # batch-composition sensitivity as ann_ivf_topk (see note there)
    assigns = _tracked_persist(
        ivf_assign(u, cents, dim, nprobe=nprobe, keep_unit=False,
                   keep_score=residual))
    # residual=True: IVFADC residual encoding (Jégou et al. 2011
    # §III) — quantize x − c_list, not x. Scoring stays exact in the
    # decomposition dot(q, x) = dot(q, c_list) + dot(q, x − c_list):
    # the first term is the assignment's own cdot (exact, per probe,
    # carried as qc), the second is what ADC approximates. See the
    # docstring for why the DEFAULT is raw encoding on this engine's
    # fixtures (residual norms exceed unit norms on near-uniform
    # data, measured recall inversion).
    r1 = assigns.where(F.col("crank") == 1).select(
        "id", F.col("centroid_id").alias("list_id"))
    if residual:
        enc_in = _tracked_persist(
            r1.join(u, "id")
              .join(cents.select(F.col("centroid_id").alias("list_id"),
                                 "cunit"), "list_id")
              .select("id", F.zip_with("unit", "cunit",
                                       lambda x, c: x - c).alias("unit")))
    else:
        enc_in = u
    cb = _tracked_persist(_cache_coalesce(
        pq_codebooks(enc_in, m, ksub, dim, refine=cb_refine),
        m * ksub * 64, floor=1))
    codes = pq_encode(enc_in, cb, m, ksub, dim)
    # Per-list cogrouped ADC, the same shape as IVF-flat's GEMM stage:
    # members carry their m-byte codes once per list, probing queries
    # carry their ADC payload once per probed list, and the
    # (queries × members) ADC matrix is a numpy table-gather inside
    # the task — candidate rows NEVER materialize (the declarative
    # alternative joined a 2 KB qtab onto every candidate row:
    # ~390 GB through one exchange at n=100k unless the planner
    # happened to broadcast the codes side). Per-list top-(rerank+1)
    # under (adc desc, neighbor_id asc) is a superset of the global
    # ADC top-rerank restricted to that list — same exactness argument
    # as _ivf_list_scorer — so the skinny global window below recovers
    # IVF-PQ's exact shortlist semantics.
    members = r1.join(codes, "id")
    # qc (the exact dot(q, c_list)) ONLY under residual encoding —
    # raw codes already approximate the full dot(q, x), so adding the
    # centroid term there would double-count it
    probe_cols = [F.col("id").alias("query_id"),
                  F.col("centroid_id").alias("list_id")]
    if residual:
        probe_cols.append(F.col("cdot").alias("qc"))
    if probe_payload == "qunit":
        # round-11 wire cut (VERDICT r10 #2): the probe row ships the
        # query's float32 unit vector (dim·4 ≈ 256 B) instead of the
        # m·ksub·4 ≈ 2 KB qtab, and the scorer rebuilds each query's
        # table in-task from the codebook. The codebook travels
        # IN-BAND: one flattened dense row per list (slot-scattered
        # to m·ksub·dsub floats so a sparse codebook can never shift
        # positions) is unioned into the probes side via a broadcast
        # crossJoin onto the nlist centroid ids — nlist × ~4 KB
        # total, and the whole construction stays pure planning (a
        # driver-side cb.collect() here would run the codebook
        # pipeline as an EAGER job at query-construction time,
        # breaking the registry's no-jobs laziness contract —
        # tests/test_plan_shapes.py — and bottlenecking plan build on
        # a driver round-trip). The rebuilt qtab entries are float64
        # dots of float32-rounded inputs — the same ~1e-7 rounding
        # the old float32 qtab wire already carried, orders below the
        # PQ quantization error either way.
        dsub = dim // m
        cb_map = cb.agg(F.map_from_entries(F.collect_list(F.struct(
            (F.col("sub_id") * ksub + F.col("code")).cast("int")
            .alias("slot"), F.col("ccent")))).alias("_m"))
        cb_flat = cb_map.select(F.flatten(F.transform(
            F.sequence(F.lit(0), F.lit(m * ksub - 1)),
            lambda s: F.coalesce(
                F.element_at(F.col("_m"), s),
                F.array_repeat(F.lit(0.0), dsub)))).alias("qunit"))
        cb_flat = cb_flat.select(F.transform(
            "qunit", lambda x: x.cast("float")).alias("qunit"))
        # dummy-key equi-join, not crossJoin: same one-row broadcast,
        # but it plans as BroadcastHashJoin (the registry's plan gate
        # bans nested-loop shapes outside the documented brute-force
        # paths)
        cb_rows = (cents.select(F.col("centroid_id").alias("list_id"),
                                F.lit(1).alias("_j"))
                        .join(F.broadcast(cb_flat.withColumn(
                            "_j", F.lit(1))), "_j")
                        .select(F.lit(-1).cast("long").alias("query_id"),
                                "list_id", "qunit",
                                *([F.lit(0.0).alias("qc")]
                                  if residual else []),
                                F.lit(True).alias("_cb")))
        probes = (assigns.select(*probe_cols)
                         .join(u.select(F.col("id").alias("query_id"),
                                        F.transform(
                                            "unit",
                                            lambda x: x.cast("float"))
                                         .alias("qunit")),
                               "query_id")
                         .withColumn("_cb", F.lit(False))
                         .unionByName(cb_rows))
        scorer = _pq_list_scorer(rerank, m, ksub)
    else:
        # legacy qtab wire (the pre-round-11 shape, kept for A/B
        # measurement): one dense table per query, precomputed as a
        # distributed pass and replicated per probed list by the join
        qtabs = pq_query_tables(u, cb, m, ksub, dim)
        probes = (assigns.select(*probe_cols)
                         .join(qtabs.withColumnRenamed("id", "query_id"),
                               "query_id"))
        scorer = _pq_list_scorer(rerank, m, ksub)
    scored = (members.groupBy("list_id")
                     .cogroup(probes.groupBy("list_id"))
                     .applyInPandas(
                         scorer,
                         "query_id long, neighbor_id long, adc double"))
    w_adc = Window.partitionBy("query_id").orderBy(F.col("adc").desc(),
                                                   F.col("neighbor_id"))
    short = (scored.withColumn("ar", F.row_number().over(w_adc))
                   .where(F.col("ar") <= rerank)
                   .select("query_id", "neighbor_id"))
    exact = (short
             .join(u.select(F.col("id").alias("query_id"),
                            F.col("unit").alias("qu")), "query_id")
             .join(u.select(F.col("id").alias("neighbor_id"),
                            F.col("unit").alias("nu")), "neighbor_id")
             .select("query_id", "neighbor_id",
                     _dot_indexed("qu", "nu", dim).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (exact.withColumn("rk", F.row_number().over(w))
                 .where(F.col("rk") <= k)
                 .select("query_id", "neighbor_id",
                         F.col("rk").alias("rank"), "cosine"))


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _dot_indexed(a_name: str, b_name: str, dim: int) -> Column:
    """Dot product of two fixed-dimension array columns.

    Implemented with zip_with + aggregate (a left fold in index order —
    the same addition order as an unrolled literal chain, so results
    are bit-identical). Measured head-to-head on the 938k-pair sf0.1
    candidate set (round 2): higher-order fold 2.5s end-to-end vs 11s
    for a 64-term unrolled `a[0]*b[0]+…` expression and 10.7s for
    split partial sums — the giant flat Add chain defeats the
    optimizer in join+window stages, while the fold stays a single
    compact expression. (Round 1 measured the opposite on a
    projection-only microbenchmark; the join context is what matters.)
    ``dim`` is kept for signature stability and plan documentation.
    """
    prod = F.zip_with(F.col(a_name), F.col(b_name), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, computed
    in double, JVM-side (higher-order functions — no UDF)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def _block_pair_prefilter(thr_pre: float):
    """Build the grouped GEMM prefilter for
    :func:`cosine_neardup_blocked`: f(pdf) → (id_a, id_b) candidate
    pairs of one (block, bucket_i, bucket_j) tile whose float64-GEMM
    cosine reaches ``thr_pre``. Module-level so the tile logic
    (same-bucket upper triangle, cross-bucket full product, id
    orientation) is unit-testable without a SparkSession."""
    import numpy as np
    import pandas as pd

    def empty():
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "block": pd.Series([], dtype="object")})

    def score(pdf):
        same = bool(pdf["_bi"].iat[0] == pdf["_bj"].iat[0])
        left = pdf[pdf["_is_left"]]
        right = pdf if same else pdf[~pdf["_is_left"]]
        if len(left) == 0 or len(right) == 0:
            return empty()
        ml = np.vstack(left["vd"].to_numpy()).astype(np.float64)
        mr = np.vstack(right["vd"].to_numpy()).astype(np.float64)
        cos = (ml @ mr.T) / np.outer(left["nrm"].to_numpy(),
                                     right["nrm"].to_numpy())
        ia, jb = np.nonzero(cos >= thr_pre)
        if same:
            keep = ia < jb          # strict upper triangle: no self,
            ia, jb = ia[keep], jb[keep]  # each pair once
        if len(ia) == 0:
            return empty()
        la = left["id"].to_numpy()[ia]
        rb = right["id"].to_numpy()[jb]
        # the tile's block key travels with the pair so the verify
        # join can re-attach vectors from the RIGHT block even when
        # an id value recurs across blocks
        return pd.DataFrame({"id_a": np.minimum(la, rb),
                             "id_b": np.maximum(la, rb),
                             "block": pdf["block"].iat[0]})

    return score


def cosine_neardup_blocked(emb: DataFrame, block_col: str,
                           threshold: float,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           method: str = "gemm",
                           bucket_rows: int = 4096) -> DataFrame:
    """EXACT cosine near-dup pairs inside equality blocks: all pairs
    sharing ``block_col`` with round(cosine, 6) ≥ threshold.

    The blocked-exact member of the embedding-dedup family. Exact
    all-pairs cosine at a low threshold has NO sound sub-quadratic
    blocking on high-dimensional data (the cover radius for τ≈0.35
    spans the whole unit sphere — that is exactly why the LSH/IVF
    paths exist as the approximate alternatives), so this operator
    pays the Σ|block|² bill honestly and concentrates on paying it at
    hardware speed with bounded tasks:

    - ``method='gemm'`` (default): two phases, same output. Each
      block is hash-split into ⌈|block|/bucket_rows⌉ buckets and every
      bucket-pair tile (i ≤ j) becomes one grouped-Arrow task running
      ONE float64 GEMM (the block-matrix schedule — per-task memory
      is bounded by ``bucket_rows``² regardless of block size, and a
      growing block adds TASKS, not task size; vectors cross the wire
      once per tile, never per pair). Tiles emit only candidate id
      pairs whose GEMM cosine ≥ τ − 5e-7 − 1e-9 (5e-7 = the 6-dp
      rounding half-step the threshold admits; 1e-9 ≫ the ~1e-14
      worst-case float64 GEMM-vs-left-fold wobble on 64-dim unit
      data, so no true pair can be lost). Survivors — output-sized,
      not candidate-sized — are re-scored with the JVM left-to-right
      fold, making every emitted value BIT-IDENTICAL to the inline
      declarative form (and to DuckDB's fold): the GEMM only ever
      prunes, never decides a kept value.
    - ``method='fold'``: the one-phase declarative reference plan
      (block equi-join + per-pair JVM fold) the GEMM path is asserted
      byte-identical to in tests — linear in pairs with a ~50× higher
      per-pair constant; kept as the no-Python fallback.

    The threshold compares the 6-dp ROUNDED cosine so the keep/drop
    decision is reproducible across engines (raw fold order is
    engine-specific only below ~1e-12; 6 dp is the proven agreement
    level). Zero-norm vectors have no defined cosine and are dropped
    up front on BOTH paths (under ANSI mode the naive division would
    otherwise be a runtime DIVIDE_BY_ZERO, not a quiet NaN).
    """
    if method not in ("gemm", "fold"):
        raise ValueError("method must be 'gemm' or 'fold'")
    pre = emb.select(F.col(id_col).alias("id"),
                     F.col(block_col).alias("block"),
                     F.transform(vec_col,
                                 lambda x: x.cast("double")).alias("vd"))
    pre = pre.select("id", "block", "vd", _norm(F.col("vd")).alias("nrm"))
    pre = pre.where(F.col("nrm") > 0)
    if method == "fold":
        a = pre.select(F.col("id").alias("id_a"), "block",
                       F.col("vd").alias("vd_a"),
                       F.col("nrm").alias("nrm_a"))
        b = pre.select(F.col("id").alias("id_b"), "block",
                       F.col("vd").alias("vd_b"),
                       F.col("nrm").alias("nrm_b"))
        pairs = a.join(b, on="block").where(F.col("id_a") < F.col("id_b"))
        cos = F.round(_dot(F.col("vd_a"), F.col("vd_b"))
                      / (F.col("nrm_a") * F.col("nrm_b")), 6)
        return (pairs.withColumn("cosine_r", cos)
                     .where(F.col("cosine_r") >= threshold)
                     .select("id_a", "id_b", "block", "cosine_r"))

    # --- GEMM tiles ---
    pre = _tracked_persist(pre)
    nb = (pre.groupBy("block").agg(F.count("*").alias("_cnt"))
             .select("block",
                     F.ceil(F.col("_cnt") / F.lit(int(bucket_rows)))
                      .cast("int").alias("_nb")))
    bkt = F.pmod(F.xxhash64(F.col("id")), F.col("_nb")).cast("int")
    # a row in bucket b joins tiles (b, j≥b) as the left operand and
    # (i<b, b) as the right — ⌈|block|/bucket_rows⌉ replicas per row,
    # the O(n²/B) row traffic any exact block-matrix schedule pays
    tiled = (pre.join(F.broadcast(nb), "block")
                .withColumn("_bkt", bkt)
                .select("id", "block", "vd", "nrm",
                        F.explode(F.concat(
                            F.transform(
                                F.sequence(F.col("_bkt"),
                                           F.col("_nb") - 1),
                                lambda j: F.struct(
                                    F.col("_bkt").alias("bi"),
                                    j.alias("bj"),
                                    F.lit(True).alias("l"))),
                            # sequence(0, -1) would DESCEND ([0,-1]),
                            # not come back empty — guard bucket 0
                            F.when(
                                F.col("_bkt") > 0,
                                F.transform(
                                    F.sequence(F.lit(0),
                                               F.col("_bkt") - 1),
                                    lambda i: F.struct(
                                        i.alias("bi"),
                                        F.col("_bkt").alias("bj"),
                                        F.lit(False).alias("l"))))
                             .otherwise(F.array().cast(
                                 "array<struct<bi:int,bj:int,l:boolean>>"))))
                         .alias("_t"))
                .select("id", "block", "vd", "nrm",
                        F.col("_t.bi").alias("_bi"),
                        F.col("_t.bj").alias("_bj"),
                        F.col("_t.l").alias("_is_left")))
    id_dt = emb.schema[id_col].dataType.simpleString()
    block_dt = emb.schema[block_col].dataType.simpleString()
    thr_pre = float(threshold) - 5e-7 - 1e-9
    cand = (tiled.groupBy("block", "_bi", "_bj")
                 .applyInPandas(
                     _block_pair_prefilter(thr_pre),
                     f"id_a {id_dt}, id_b {id_dt}, block {block_dt}"))
    # duplicate id VALUES (two rows, same id, same hash bucket) would
    # otherwise emit (id, id) self-pairs from the position triangle
    # and duplicate candidate rows that the verify join fans out —
    # exactly the rows the fold path's strict id_a < id_b never
    # produces. Candidates are output-sized, so the dedup is cheap.
    cand = cand.where(F.col("id_a") != F.col("id_b")).distinct()
    # exact verify on the output-sized survivor set: same fold, same
    # order, same rounding as the fold path — bit-identical values.
    # BOTH verify joins key on (id, block): with the block dropped, a
    # duplicate id value straddling two blocks would re-attach the
    # other block's vector and emit cross-block pairs fold never forms.
    va = pre.select(F.col("id").alias("id_a"), "block",
                    F.col("vd").alias("vd_a"), F.col("nrm").alias("nrm_a"))
    vb = pre.select(F.col("id").alias("id_b"), "block",
                    F.col("vd").alias("vd_b"), F.col("nrm").alias("nrm_b"))
    cos = F.round(_dot(F.col("vd_a"), F.col("vd_b"))
                  / (F.col("nrm_a") * F.col("nrm_b")), 6)
    return (cand.join(va, ["id_a", "block"])
                .join(vb, ["id_b", "block"])
                .withColumn("cosine_r", cos)
                .where(F.col("cosine_r") >= threshold)
                .select("id_a", "id_b", "block", "cosine_r"))


def cosine_topk_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 10,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_dp: int | None = None,
                           corpus_min_partitions: int | None = None
                           ) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Brute force = broadcast the (bounded) query set against the full
    corpus — the correctness baseline. At 100 TB-scale corpora the
    corpus side stays partitioned and is scanned once; cost is
    O(|corpus| × |queries|) flops with no shuffle of the corpus. Use
    :func:`ann_lsh_topk` when the query set itself is the corpus.

    ``round_dp``: rank by the cosine rounded to this many decimals
    (tie-broken by neighbor_id) instead of the raw double. Callers
    whose downstream result is compared across engines use 6 — the
    repo-wide ulp-absorbing discipline — so a last-bit difference at
    the rank-k boundary cannot flip which neighbor makes the cut.
    The emitted ``cosine`` column stays the raw double either way.

    Parallelism caveat: the corpus fanout below only widens
    FILE-BACKED scans. A DERIVED corpus (post-shuffle/aggregate plan)
    is left alone — its parallelism comes from
    spark.sql.shuffle.partitions — so a derived corpus that is
    GENUINELY single-partition (coalesce(1)/limit upstream) would
    still serialize the interpreted cosine folds onto one core. Such
    callers pass ``corpus_min_partitions`` (a pure plan transform —
    no construction-time job, unlike probing the derived plan's
    split count), or pre-repartition before calling. MIN semantics
    are honored where the split count is knowable job-free
    (file-backed scans go through fanout, which only ever WIDENS);
    on a derived plan — where no job-free split probe exists — the
    repartition target is max(value, spark.sql.shuffle.partitions),
    so the knob can widen a narrow derived plan but never shrink a
    wide post-shuffle one below the session's shuffle width.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("query_vec"))
    # fanout: the broadcast nested-loop join's parallelism is the
    # CORPUS side's split count, and a single-row-group fixture file
    # scans as ONE split — |corpus|·|queries| interpreted cosine folds
    # (higher-order functions are CodegenFallback) then run on one
    # core (measured: 20+ min at 20k×20k — the r8 sf1 quality stall).
    # At real scale the repartition is a no-op (thousands of splits).
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("neighbor_vec"))
    if corpus_min_partitions is not None:
        # file-backed plans keep fanout's never-shrink contract (the
        # split count is knowable job-free there); a derived plan —
        # where no job-free split probe exists — takes an exact
        # repartition, CLAMPED to spark.sql.shuffle.partitions so the
        # MIN in the name can never SHRINK a wide post-shuffle corpus
        # (ADVICE r10: repartition(8) on a 200-partition derived plan
        # would serialize the very folds the knob parallelizes; a
        # genuinely narrow plan — coalesce(1)/limit — still widens to
        # at least the requested floor either way)
        if c.inputFiles():
            c = fanout(c, min_partitions=int(corpus_min_partitions))
        else:
            c = c.repartition(max(
                int(corpus_min_partitions),
                int(emb.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "200"))))
    else:
        c = fanout(c)
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
               .withColumn("cosine", cosine(F.col("query_vec"),
                                            F.col("neighbor_vec"))))
    rank_key = (F.round("cosine", round_dp) if round_dp is not None
                else F.col("cosine"))
    w = Window.partitionBy("query_id").orderBy(rank_key.desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k)
                  .select("query_id", "neighbor_id",
                          F.col("rk").alias("rank"), "cosine"))


def unit_vectors(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, unit) with unit = v/‖v‖ as array<double>, computed in three
    projection steps so the cast array and the norm are each evaluated
    once per row (never inlined into a per-element lambda)."""
    s1 = fanout(emb.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("_v"))) \
        .select("id",
                F.transform("_v", lambda x: x.cast("double")).alias("_vd"))
    s2 = s1.select("id", "_vd", _norm(F.col("_vd")).alias("_n"))
    return s2.select(
        "id", F.transform("_vd", lambda x: x / F.col("_n")).alias("unit"))


def _plane_signs(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane (a sign random
    projection). Generated driver-side with a seeded PRNG and shipped
    as ONE array literal per plane — the hash-expression-per-dimension
    alternative cost thousands of py4j round trips just to BUILD the
    plan (24 s of driver time for 8 tables × 5 planes × 64 dims)."""
    rng = random.Random(0x5EED ^ (plane * 2654435761 & 0xFFFFFFFF))
    return [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]


def rp_lsh_buckets(emb: DataFrame, num_tables: int = 8, num_planes: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int = 64, unit: DataFrame | None = None,
                   keep_unit: bool = False) -> DataFrame:
    """Multi-table random-hyperplane LSH (Charikar cosine LSH).

    For each of ``num_tables`` independent tables, bit j of the bucket
    id = sign(v · w_tj), with w_tj a ±1 hyperplane derived from a hash
    of (table, plane, dimension) — deterministic, JVM-side, never
    materialized (the plane arrays constant-fold). Returns one row per
    (vector, table): (id, table, bucket) — deliberately WITHOUT the
    vector, so candidate generation shuffles only ids.
    ``keep_unit=True`` additionally carries the unit vector on every
    (vector, table) row — the bucket-GEMM scorer's wire format, where
    each vector crosses to its scoring group once per table instead
    of once per candidate pair.

    Collision probability for angle θ is (1-θ/π)^planes per table;
    multiple tables trade compute for recall: R = 1-(1-p^b)^L — the
    standard LSH parameter surface. More planes → smaller buckets
    (less join work), lower per-table recall; more tables → linear
    extra work, exponential recall recovery.
    """
    u = unit if unit is not None else unit_vectors(emb, id_col, vec_col)
    # sign(unit·w) == sign(v·w): norms are positive. Each table's
    # bucket is ONE sql string (one py4j call) — building these as
    # composed Column objects costs hundreds of driver round trips.
    tables = []
    for t in range(num_tables):
        bits = []
        for j in range(num_planes):
            signs = ",".join(f"{s:.1f}"
                             for s in _plane_signs(t * 64 + j, dim))
            proj = (f"aggregate(zip_with(unit, array({signs}),"
                    f" (x, w) -> x * w), 0D, (acc, v) -> acc + v)")
            bits.append(f"shiftleft(if({proj} >= 0, 1L, 0L), {j})")
        bucket = " | ".join(bits)
        tables.append(f"struct({t}L as table, ({bucket}) as bucket)")
    tb = F.expr(f"explode(array({','.join(tables)}))").alias("tb")
    keep = ["id", "unit"] if keep_unit else ["id"]
    return (u.select(*keep, tb)
             .select(*keep, F.col("tb.table").alias("table"),
                     F.col("tb.bucket").alias("bucket")))


def ann_lsh_topk(emb: DataFrame, k: int = 10,
                 num_tables: int | None = None,
                 num_planes: int | None = None, id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64,
                 target_bucket: int = 128, n: int | None = None,
                 unit_wire: str = "float64",
                 scorer: str = "bucket_gemm") -> DataFrame:
    """Approximate all-pairs top-k: cosine top-k over LSH-collided pairs.

    The scale path vs brute force: scoring is per-(table, bucket) —
    shuffle on (table, bucket), work Σ|bucket|² per table instead of
    n². ``scorer='bucket_gemm'`` (default since round 12, VERDICT r11
    #1) runs each bucket group through ONE members×members float64
    BLAS GEMM in a grouped Arrow stage and emits only the per-query
    top-(k+1) — exact, see :func:`_lsh_bucket_scorer` — so the
    cross-table dedup and the global window see n·tables·(k+1) pruned
    rows instead of every collided pair. ``scorer='pair_fold'`` keeps
    the round-7..11 shape (bare id-pair candidate join → DISTINCT →
    re-attach both unit arrays → 64-term JVM fold per pair → explode
    both directions → window); at sf1 (n=20k, 27 tables) that path
    DISTINCTs ~42M directed id pairs and folds ~36M dots — measured
    47.7 s median vs 10.1 s for bucket_gemm (interleaved A/B, BENCH.md
    round 12), output rank-identical at every fixture scale and
    cosine bit-identical at the gate SFs (1 ulp at sf1: BLAS blocking
    vs the fold's sequential sum).

    ``num_planes=None`` adapts to corpus size: planes =
    round(log2(n / target_bucket)) — round, NOT ceil: ceil biased the
    realized expected bucket to half the target, and per-table cost
    is dominated by the fixed n-row pass, so under-full buckets buy
    less recall per second (the measured cliff is in the inline
    comment below). Expected occupancy stays centered on
    target_bucket so per-table join work stays ~n·target_bucket at
    any scale (the knob that keeps this sub-quadratic at 100 TB).
    ``num_tables=None`` grows the table count with n —
    ceil(8.75·(n/target_bucket)^0.22), the same shape as IVF's
    ⌈nlist^0.75⌉ fix: a FIXED table count loses recall as planes grow
    with n (per-table collision p decays (n/B)^{log2(1-θ/π)}; 0.22 ≈
    |log2(1-θ/π)| in the cosine≈0.85 near-dup regime this operator
    serves, so table growth offsets the decay there) — the round-7
    fixed 8×4 default measured recall@5 0.86 at n=500 collapsing to
    0.537 at n=2000 on the worst-case uniform fixtures; the auto
    default measures 0.995 / 0.918. Tables are additionally capped at
    _candidate_budget(n)/target_bucket so the EXPECTED per-query
    candidate volume (tables·bucket) stays within the same
    max(2048, 128√n) budget as the capped IVF paths (the round-9 flat
    2048/target_bucket clipped the growth curve from n≈2000 — the
    very scale band it was fitted on; under the √n budget the 0.22
    curve is the OPERATIVE sizing at any realistic n and the cap is
    only the brute-force backstop). Unlike IVF probes, each table
    costs a full projection + explode pass, so the auto default stays
    on the fitted growth curve rather than spending the whole budget;
    recall beyond it is the caller's explicit tables/planes knob
    (BENCH.md round-10 LSH knob table documents the measured
    recall-per-second knee and the per-n recall floor on the
    isotropic worst case). ``n`` comes from catalog/file statistics (planning
    business — see :func:`ann_ivf_topk` on why the count() fallback
    must not run at scale). The fixtures are near-uniform random
    (top-5 cosine ≈ 0.32) — the hardest case for LSH.
    """
    if num_planes is None or num_tables is None:
        n = _corpus_size_for_sizing(emb, n, "ann_lsh_topk")
        # round-vs-ceil planes rationale and the measured knee live in
        # _lsh_auto_sizing's docstring (unit-test-pinned there). At
        # the gate SFs (n=500/2000) round and ceil agree (2/4 planes —
        # identical plans); at n=20k round lands on the knee.
        auto_tables, auto_planes = _lsh_auto_sizing(n, target_bucket)
        if num_planes is None:
            num_planes = auto_planes
        if num_tables is None:
            num_tables = auto_tables
    u = unit_vectors(emb, id_col, vec_col)
    if scorer == "bucket_gemm":
        # Round-12 default (VERDICT r11 #1): score each (table, bucket)
        # group with ONE members×members float64 GEMM and emit only the
        # per-query top-(k+1) — the cogrouped-numpy shape that already
        # pays in _ivf_list_scorer/_pq_list_scorer. vs the pair_fold
        # path below at sf1 (n=20k, 27 tables × 7 planes): that path
        # materializes ~42M directed candidate id pairs, DISTINCTs
        # them (~670 MB exchange), re-attaches both 512 B unit arrays
        # per surviving pair, folds a 64-term dot per row, then
        # windows over ~2× that after the direction explode. Here each
        # unit crosses the wire once per TABLE (n·L rows ≈ 280 MB at
        # sf1), the Σ|bucket|² dot products run as BLAS GEMMs, and the
        # dedup + global window see only n·L·(k+1) pruned rows (~6M at
        # sf1 vs ~72M). Per-bucket top-(k+1) is exact — see
        # _lsh_bucket_scorer. The same pair scored in two buckets can
        # differ in the last ulp (BLAS blocking depends on matrix
        # shape), so the dedup takes max(cosine) — deterministic, and
        # the value a score-all-pairs GEMM would keep.
        bu = rp_lsh_buckets(emb, num_tables, num_planes, id_col, vec_col,
                            dim, unit=u, keep_unit=True)
        per = (bu.groupBy("table", "bucket")
                 .applyInPandas(
                     _lsh_bucket_scorer(k),
                     "query_id long, neighbor_id long, cosine double"))
        pairs = (per.groupBy("query_id", "neighbor_id")
                    .agg(F.max("cosine").alias("cosine")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id"))
        return (pairs.withColumn("rk", F.row_number().over(w))
                     .where(F.col("rk") <= k)
                     .select("query_id", "neighbor_id",
                             F.col("rk").alias("rank"), "cosine"))
    b = rp_lsh_buckets(emb, num_tables, num_planes, id_col, vec_col, dim,
                       unit=u)
    a, c = b.alias("a"), b.alias("b")
    # UNORDERED candidates (id_a < id_b): collisions are symmetric, so
    # deduping half the directed volume and scoring each pair ONCE
    # halves the distinct shuffle and the dot-product work; both
    # directions re-emerge as a cheap 2-row explode after scoring
    # (the top-k window needs the pair under both query ids)
    cand = (a.join(c, (F.col("a.table") == F.col("b.table"))
                     & (F.col("a.bucket") == F.col("b.bucket"))
                     & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    # unit_wire='float64' (default) — the round-11 float32 experiment
    # is a MEASURED NEGATIVE here (BENCH.md round-11 A/B): recall is
    # bit-identical (0.7273 at sf1, the fold upcasts per element so
    # only inputs carry float32's ~6e-8 rounding), but wall GREW
    # ~1.16× (49.1 s vs 42.2 s mean, interleaved same-session pairs).
    # Unlike IVF-PQ's probe join — a real exchange, where the same
    # trick paid 1.3× — this scoring join is two BROADCAST hash
    # joins: the unit arrays are local memcpy from the broadcast
    # table, never network, so halving bytes saves almost nothing
    # while the 2×dim per-element casts inside the fold add real CPU
    # on all ~41M pair rows. On a cluster where this join turned
    # sort-merge (corpus too big to broadcast), the trade could
    # invert — hence a knob, not a removal.
    if unit_wire == "float32":
        uw = u.select("id", F.transform(
            "unit", lambda x: x.cast("float")).alias("unit"))
        dot = F.aggregate(
            F.zip_with("qu", "nu",
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)
    else:
        uw = u
        dot = _dot_indexed("qu", "nu", dim)
    scored = (cand
              .join(uw.select(F.col("id").alias("id_a"),
                              F.col("unit").alias("qu")), "id_a")
              .join(uw.select(F.col("id").alias("id_b"),
                              F.col("unit").alias("nu")), "id_b")
              .select("id_a", "id_b", dot.alias("cosine")))
    pairs = (scored.select(F.explode(F.array(
                 F.struct(F.col("id_a").alias("query_id"),
                          F.col("id_b").alias("neighbor_id"),
                          F.col("cosine")),
                 F.struct(F.col("id_b").alias("query_id"),
                          F.col("id_a").alias("neighbor_id"),
                          F.col("cosine")))).alias("p"))
                   .select("p.query_id", "p.neighbor_id", "p.cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
                 .where(F.col("rk") <= k)
                 .select("query_id", "neighbor_id", F.col("rk").alias("rank"),
                         "cosine"))


def containment_join(df: DataFrame, id_col: str, text_col: str,
                     n: int = 3, threshold: float = 0.6,
                     method: str = "prefix", sample_mod: int = 20,
                     hot_min: int = 2) -> DataFrame:
    """All pairs (id_a < id_b) whose smaller shingle set is ≥
    ``threshold`` contained in the larger: |A∩B| / min(|A|,|B|).
    The asymmetric near-dup criterion (RefinedWeb/CCNet use it next to
    Jaccard): a short doc quoted wholesale inside a long one scores
    containment ≈ 1 while its Jaccard stays far below any dedup
    threshold, so a Jaccard-only pass ships the duplicate.

    Exact on every method (identical results, gated in
    tests/test_similarity.py):

    - ``method='prefix'`` (default): the ASYMMETRIC prefix filter —
      containment ≥ τ means |A∩B| ≥ ⌈τ·|A|⌉ for A the smaller set, so
      by the prefix pigeonhole A must share a shingle within its
      |A|−⌈τ|A|⌉+1 rarest (consistent global rarity order, the same
      sampled-hot kernel as :func:`jaccard_similarity_join`) against
      B's FULL set — only the SMALLER side prunes, the larger side
      cannot (that asymmetry is what keeps a 100-shingle doc findable
      inside a 10⁶-shingle doc). Candidate volume is Σ df_prefix ·
      df_full per shingle instead of Σ df² — hot boilerplate shingles
      sort to the END of every ordering, so they almost never enter a
      prefix and the blowup term vanishes. PPJoin's positional filter
      prunes again before any array ships (overlap ≤ matches +
      remaining positions on either side, against α = ⌈τ|A|⌉), then
      the exact array_intersect verify on hash arrays decides. No
      length filter exists for containment (ANY size ratio can
      qualify — the operator's point), which is exactly why the
      prefix, not a size band, has to carry the pruning at scale.
    - ``method='prefix-exact'``: same pruning under the textbook
      corpus-wide df order (one extra corpus-scale aggregate).
    - ``method='allpairs'``: the plain shingle self-join + pair count
      (Σ df² — small corpora only).
    """
    arr = shingle_array(df, id_col, text_col, n)
    if method == "allpairs":
        # one row per doc, three consumers (both self-join sides +
        # sizes) — same persist rationale as the prefix kernel;
        # released by the caller via release_persisted().
        arr = _tracked_persist(arr)
        sh = arr.select("id", F.explode("shingles").alias("shingle"))
        a, b = sh.alias("a"), sh.alias("b")
        common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                           & (F.col("a.id") < F.col("b.id")))
                   .groupBy(F.col("a.id").alias("id_a"),
                            F.col("b.id").alias("id_b"))
                   .agg(F.count("*").alias("n_common")))
        sizes = arr.select("id", "set_size")
        sa = sizes.select(F.col("id").alias("id_a"),
                          F.col("set_size").alias("size_a"))
        sb = sizes.select(F.col("id").alias("id_b"),
                          F.col("set_size").alias("size_b"))
        cont = (F.col("n_common").cast("double")
                / F.least("size_a", "size_b"))
        return (common.join(sa, "id_a").join(sb, "id_b")
                      .withColumn("containment", cont)
                      .where(F.col("containment") >= threshold)
                      .select("id_a", "id_b", "size_a", "size_b",
                              "n_common", "containment"))
    if method not in ("prefix", "prefix-exact"):
        raise ValueError(
            "method must be 'prefix', 'prefix-exact' or 'allpairs'")
    ordered = _rarity_ordered(arr, method, sample_mod, hot_min)
    # the SMALLER side's prefix (ε guards the ceil exactly like the
    # Jaccard path: an integral τ·|A| rounding UP would shorten the
    # prefix and silently miss true pairs)
    prefix_len = (F.col("set_size")
                  - F.ceil(F.col("set_size") * F.lit(float(threshold))
                           - F.lit(1e-9)).cast("int")
                  + 1)
    small = ordered.select(
        "id", "set_size",
        F.posexplode(F.slice("ordered_shingles", 1, prefix_len))
         .alias("pos", "shingle"))
    full = ordered.select(
        "id", "set_size",
        F.posexplode("ordered_shingles").alias("pos", "shingle"))
    s, t = small.alias("s"), full.alias("t")
    # role assignment: the smaller set (ties by id) is the prefix
    # side — every qualifying pair is nominated exactly through its
    # smaller member's prefix against the larger member's full set
    smaller = ((F.col("s.set_size") < F.col("t.set_size"))
               | ((F.col("s.set_size") == F.col("t.set_size"))
                  & (F.col("s.id") < F.col("t.id"))))
    cand = (s.join(t, (F.col("s.shingle") == F.col("t.shingle"))
                     & (F.col("s.id") != F.col("t.id")) & smaller)
             .groupBy(F.col("s.id").alias("id_s"),
                      F.col("t.id").alias("id_t"),
                      F.col("s.set_size").alias("size_s"),
                      F.col("t.set_size").alias("size_t"))
             .agg(F.count("*").alias("_c"),
                  F.max("s.pos").alias("_is"),
                  F.max("t.pos").alias("_it")))
    # positional upper bound vs α = ⌈τ·|A|⌉ (ε: err low, never prune
    # a boundary-true pair)
    alpha = F.ceil(F.col("size_s") * F.lit(float(threshold))
                   - F.lit(1e-9))
    ubound = (F.col("_c")
              + F.least(F.col("size_s") - F.col("_is") - 1,
                        F.col("size_t") - F.col("_it") - 1))
    cand = (cand.where(ubound >= alpha)
                .select(F.least("id_s", "id_t").alias("id_a"),
                        F.greatest("id_s", "id_t").alias("id_b")))
    sets = ordered.select("id", "ordered_shingles", "set_size")
    verified = (cand
                .join(sets.select(F.col("id").alias("id_a"),
                                  F.col("ordered_shingles").alias("sh_a"),
                                  F.col("set_size").alias("size_a")),
                      "id_a")
                .join(sets.select(F.col("id").alias("id_b"),
                                  F.col("ordered_shingles").alias("sh_b"),
                                  F.col("set_size").alias("size_b")),
                      "id_b")
                .withColumn("n_common",
                            F.size(F.array_intersect("sh_a", "sh_b"))))
    cont = (F.col("n_common").cast("double")
            / F.least("size_a", "size_b"))
    return (verified.withColumn("containment", cont)
                    .where(F.col("containment") >= threshold)
                    .select("id_a", "id_b", "size_a", "size_b",
                            "n_common", "containment"))


def edit_distance_join(df: DataFrame, id_col: str, name_col: str,
                       k: int = 4, block_cols: list[str] | None = None,
                       q: int = 3, sample_mod: int = 20,
                       hot_min: int = 2) -> DataFrame:
    """All pairs (id_a < id_b) within Levenshtein distance ``k``
    (optionally restricted to equal values on ``block_cols``), exact.
    Output: (id_a, id_b, name_a, name_b, edit_dist).

    Why not just block on (block_cols, length band): block-key
    cardinality is then FIXED (bounded string lengths, enum blocks),
    so Σ|block|² — and the bounded-DP verify bill — grows
    quadratically with the table (measured 9.4× wall for 10× data at
    sf1). This operator adds the ed-join q-gram PREFIX filter
    (Gravano et al., VLDB'01 count filter + the prefix-filter pigeonhole,
    both public literature), which makes candidate generation track
    the true-pair count instead of n²/blocks:

    - every string's positional q-gram BAG (elements ``(gram, occ)``,
      occ = occurrence index, so bag intersection = set intersection
      over elements) is sorted by a CONSISTENT global rarity order;
    - one edit destroys at most ``q`` grams, so ed ≤ k implies the two
      bags share all but ≤ ``k·q`` elements — by the prefix pigeonhole
      the pair MUST share an element within each side's ``k·q + 1``
      rarest (a CONSTANT-width prefix, unlike Jaccard's τ-proportional
      one), and candidate generation equi-joins only those prefixes;
    - rarity is estimated from a 1/``sample_mod`` hash-sample of rows
      (hot elements with sample count ≥ ``hot_min`` broadcast; unseen
      tail shares rank 0 — same sampled-df discipline as
      :func:`jaccard_similarity_join`, no corpus-wide df shuffle);
    - strings too short for the filter to have power (gram count
      ≤ k·q, i.e. len < q·(k+1)) are routed through a band-only side
      channel: they pair only with strings within length k of
      themselves, a bounded-size neighborhood, so the channel is
      linear in the short-string count.

    The length band (width k+1, probe side explodes band ± 1) stays in
    the join key on BOTH channels — an exact cover of |Δlen| ≤ k with
    each pair matching exactly one probe. Survivors are verified with
    the bounded-threshold levenshtein (banded O(len·k) DP, bails at
    > k) exactly once per unordered pair.

    PRECONDITION: ``id_col`` values must be unique. Pair identity and
    the unordered-pair dedup both key on the id ORDER (``_ida <
    _idb``; the short channel additionally dedups on the id pair), so
    two distinct rows sharing an id would be silently conflated —
    their mutual pair dropped as a "self" match and their pairs to
    third rows collapsed. This matches DataFrame join-key discipline
    everywhere else in the engine; contrast
    :func:`cosine_neardup_blocked`, which explicitly DEFINES
    duplicate-id semantics (and tests them) because its GEMM/fold
    dual evaluation made the ambiguity dangerous rather than merely
    undefined.
    """
    blocks = list(block_cols or [])
    band_w = k + 1
    min_long = q * (k + 1)  # gram count > k·q  ⇔  len ≥ q(k+1)
    base = (df.select(F.col(id_col).alias("_id"),
                      *[F.col(c).alias(f"_blk_{i}")
                        for i, c in enumerate(blocks)],
                      F.col(name_col).alias("_name"))
              .where(F.col(name_col).isNotNull())
              .withColumn("_len", F.length("_name"))
              .withColumn("_band",
                          (F.col("_len") / band_w).cast("long")))
    bcols = [f"_blk_{i}" for i in range(len(blocks))]
    # one row per input row — the id↔name occurrence table the final
    # expansion joins against. Released by the registry hook via
    # release_persisted().
    base = _tracked_persist(fanout(base))

    # Name-level restructure (round 12, guide §8 "decide with small
    # rows"): every decision this operator makes — banding, gram
    # prefixes, the bounded DP — is a function of the NAME, never the
    # id, so the channels and the verify run on DISTINCT (block, name)
    # rows and the surviving name pairs expand back to id pairs at the
    # end. On corpora where names repeat (the normal case for a fuzzy
    # entity-key join: the sf1 fixture has 64 distinct names over 200k
    # rows) this collapses the Σ|block|² candidate join and the DP
    # bill by the duplication factor squared (~80M bounded DPs → ~2k
    # at sf1); with all-unique names it degenerates to the round-7..11
    # occurrence-level plan plus one output-bounded expansion join.
    nbase = _tracked_persist(
        base.groupBy(*bcols, "_name", "_len", "_band").agg(
            F.count("*").alias("_nocc")).drop("_nocc"))

    probe_bands = F.explode(F.array(F.col("_band") - 1, F.col("_band"),
                                    F.col("_band") + 1)).alias("_pband")

    # --- short channel: no gram filter has power; band-only block ---
    short = nbase.where(F.col("_len") < min_long)
    sp = short.select(F.col("_name").alias("_na"),
                      F.col("_len").alias("_lena"), *bcols, probe_bands)
    sb = nbase.select(F.col("_name").alias("_nb"),
                      F.col("_len").alias("_lenb"),
                      F.col("_band").alias("_pband"), *bcols)
    cand_short = (sp.join(sb, bcols + ["_pband"])
                    .where(F.abs(F.col("_lena") - F.col("_lenb")) <= k)
                    # short×long pairs exist ONLY here (the long
                    # channel is long×long), so any name order is kept
                    # once; short×short pairs would arrive twice —
                    # keep the probe-name-smaller copy
                    .where((F.col("_lenb") >= min_long)
                           | (F.col("_na") < F.col("_nb")))
                    .where(F.col("_na") != F.col("_nb"))
                    .select(F.least("_na", "_nb").alias("name_a"),
                            F.greatest("_na", "_nb").alias("name_b")))

    # --- long channel: q-gram prefix filter ---
    longd = nbase.where(F.col("_len") >= min_long)
    grams = F.transform(
        F.sequence(F.lit(1), F.col("_len") - q + 1),
        lambda i: F.col("_name").substr(i, F.lit(q)))
    # bag elements (gram, occ): occ = #equal grams strictly before, so
    # duplicate grams become distinct elements and element-set overlap
    # equals bag overlap (the count filter is a bag bound). O(m²) JVM
    # array ops per row on bounded-length strings — still codegen.
    elems = F.transform(
        F.col("_grams"),
        lambda g, i: F.struct(
            g.alias("g"),
            F.size(F.filter(F.slice(F.col("_grams"), 1, i),
                            lambda y: y == g)).alias("occ")))
    lg = longd.withColumn("_grams", grams).withColumn("_elems", elems)
    # sampled element rarity → broadcast hot map (estimated df over
    # the name-distinct corpus — a 1/sample_mod hash-sample of NAMES;
    # the prefix theorem needs only a consistent order, so the
    # unsampled tail ranks 0 and tie-breaks on (g, occ)
    hot = (lg.where(F.xxhash64(F.col("_name")) % sample_mod == 0)
             .select(F.explode("_elems").alias("_e"))
             .groupBy("_e").agg(F.count("*").alias("_c"))
             .where(F.col("_c") >= hot_min)
             .select(F.col("_e"),
                     (F.col("_c") * sample_mod).alias("_df")))
    ranked = (lg.select("_name", "_len", "_band", *bcols,
                        F.explode("_elems").alias("_e"))
                .join(F.broadcast(hot), "_e", "left")
                .select("_name", "_len", "_band", *bcols,
                        F.struct(F.coalesce("_df", F.lit(0).cast("long"))
                                  .alias("df"),
                                 F.col("_e.g").alias("g"),
                                 F.col("_e.occ").alias("occ"))
                         .alias("_r")))
    prefix_len = k * q + 1
    prefixes = (ranked.groupBy("_name", "_len", "_band", *bcols)
                      .agg(F.slice(F.sort_array(F.collect_list("_r")),
                                   1, prefix_len).alias("_pref")))
    # both join sides consume this (and it embeds the persisted nbase,
    # so rebuild is cheap — but the explode×join above is not): pin it
    prefixes = _tracked_persist(prefixes)
    pa = prefixes.select(F.col("_name").alias("_na"),
                         F.col("_len").alias("_lena"), *bcols,
                         probe_bands,
                         F.explode("_pref").alias("_e"))
    pb = prefixes.select(F.col("_name").alias("_nb"),
                         F.col("_len").alias("_lenb"),
                         F.col("_band").alias("_pband"), *bcols,
                         F.explode("_pref").alias("_e"))
    cand_long = (pa.join(pb, bcols + ["_pband", "_e"])
                   .where(F.col("_na") < F.col("_nb"))
                   .where(F.abs(F.col("_lena") - F.col("_lenb")) <= k)
                   .select(F.col("_na").alias("name_a"),
                           F.col("_nb").alias("name_b")))

    # a name pair re-arrives once per co-occurring block (and per
    # shared prefix element in the long channel): dedup BEFORE the DP
    # so each distinct name pair is verified exactly once, corpus-wide
    dp = (cand_short.unionByName(cand_long)
                    .groupBy("name_a", "name_b").agg(
                        F.count("*").alias("_nsrc")).drop("_nsrc")
                    .withColumn("edit_dist",
                                F.levenshtein("name_a", "name_b", k))
                    .where(F.col("edit_dist") >= 0))

    # --- expansion back to id pairs ---
    # different-name winners: attach every occurrence of each side
    # within the same block; each unordered id pair arises from
    # exactly one ordered name pair, so no dedup is needed — the
    # joins are output-bounded. Orientation: id_a is the smaller id
    # and name_a must be ITS name, so names swap with the ids.
    oa = base.select(F.col("_id").alias("_ida"), *bcols,
                     F.col("_name").alias("name_a"))
    ob = base.select(F.col("_id").alias("_idb"), *bcols,
                     F.col("_name").alias("name_b"))
    a_first = F.col("_ida") < F.col("_idb")
    out_diff = (dp.join(oa, "name_a").join(ob, ["name_b"] + bcols)
                  .select(F.least("_ida", "_idb").alias("id_a"),
                          F.greatest("_ida", "_idb").alias("id_b"),
                          F.when(a_first, F.col("name_a"))
                           .otherwise(F.col("name_b")).alias("name_a"),
                          F.when(a_first, F.col("name_b"))
                           .otherwise(F.col("name_a")).alias("name_b"),
                          "edit_dist"))
    # equal-name pairs (edit distance 0 ≤ k by definition): all id
    # pairs within one (block, name) group — the one pair class the
    # name-level channels exclude. Output-bounded (every emitted row
    # is a result row).
    sa = base.select(F.col("_id").alias("_ida"), *bcols, "_name")
    sbb = base.select(F.col("_id").alias("_idb"), *bcols, "_name")
    out_same = (sa.join(sbb, bcols + ["_name"])
                  .where(F.col("_ida") < F.col("_idb"))
                  .select(F.col("_ida").alias("id_a"),
                          F.col("_idb").alias("id_b"),
                          F.col("_name").alias("name_a"),
                          F.col("_name").alias("name_b"),
                          F.lit(0).alias("edit_dist")))
    return out_diff.unionByName(out_same)
