"""Semantic gates for the round-7 scale rework of the fuzzy and exact
cosine joins: `edit_distance_join` (q-gram prefix filter + band-only
short channel) against brute force, and `cosine_neardup_blocked`'s
tiled-GEMM prefilter against the declarative fold plan. The driver
oracle covers the two consuming queries on the TPC-H fixture (where
every part name is long); these tests exercise the paths the fixture
cannot — short strings, the short×long channel, multi-bucket tiles,
zero-norm vectors — which would otherwise ship untested."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import similarity as S


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(names: list[str], k: int) -> set[tuple]:
    out = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = _levenshtein(names[i], names[j])
            if d <= k:
                out.add((i, j, d))
    return out


def _run_join(spark, names: list[str], k: int) -> set[tuple]:
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    got = S.edit_distance_join(df, "id", "name", k=k).collect()
    S.release_persisted()
    return {(r.id_a, r.id_b, r.edit_dist) for r in got}


# small alphabet → dense near-matches; lengths straddle the short/long
# routing boundary q·(k+1) (15 for k=4, 9 for k=2) so short×short,
# short×long and long×long pairs all occur
_names = st.lists(st.text(alphabet="abc", min_size=0, max_size=24),
                  min_size=2, max_size=24)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(names=_names, k=st.sampled_from([1, 2, 4]))
def test_edit_distance_join_matches_bruteforce(spark, names, k):
    assert _run_join(spark, names, k) == _brute_pairs(names, k)


def test_edit_distance_join_short_long_boundary(spark):
    """Deterministic cover of the routing boundary: equal strings and
    1-edit neighbors at lengths 14/15/16 for k=4 (gram counts k·q−1,
    k·q, k·q+1) must all pair regardless of which channel they ride."""
    base = "abcabcabcabcabc"  # len 15 == q·(k+1)
    names = [base[:14], base[:14] + "x", base, base + "x",
             base + "xy", "zz", "z"]
    assert _run_join(spark, names, 4) == _brute_pairs(names, 4)


def test_edit_distance_join_respects_blocks(spark):
    """block_cols must be a hard equality wall: identical names in
    different blocks never pair (on either channel)."""
    rows = [(0, "A", "short"), (1, "B", "short"),
            (2, "A", "a long enough name for grams"),
            (3, "B", "a long enough name for grams")]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    got = S.edit_distance_join(df, "id", "name", k=4,
                               block_cols=["blk"]).collect()
    S.release_persisted()
    assert got == []  # cross-block twins excluded, same-block absent


def test_edit_distance_join_null_names_dropped(spark):
    rows = [(0, None), (1, "hello"), (2, "hello")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {(r.id_a, r.id_b, r.edit_dist)
           for r in S.edit_distance_join(df, "id", "name", k=2).collect()}
    S.release_persisted()
    assert got == {(1, 2, 0)}


def test_cosine_gemm_tiles_equal_fold_with_degenerate_vectors(spark):
    """Multi-bucket tiling (bucket_rows=2 forces same-bucket AND
    cross-bucket tiles), a zero-norm vector (must vanish on both
    plans), and exact-duplicate vectors sharing a bucket must all
    yield byte-identical results to the declarative fold plan."""
    vecs = [
        (0, "x", [1.0, 0.0, 0.0, 0.0]),
        (1, "x", [1.0, 0.0, 0.0, 0.0]),   # duplicate of 0
        (2, "x", [0.9, 0.1, 0.0, 0.0]),
        (3, "x", [0.0, 1.0, 0.0, 0.0]),
        (4, "x", [0.0, 0.0, 0.0, 0.0]),   # zero norm: never pairs
        (5, "x", [-1.0, 0.0, 0.0, 0.0]),
        (6, "y", [1.0, 0.0, 0.0, 0.0]),   # other block
        (7, "y", [0.95, 0.05, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "label", "embedding"]) \
              .withColumn("embedding",
                          F.col("embedding").cast("array<float>"))
    gemm = S.cosine_neardup_blocked(df, "label", 0.5, bucket_rows=2)
    g = sorted(map(tuple, gemm.collect()))
    S.release_persisted()
    fold = S.cosine_neardup_blocked(df, "label", 0.5, method="fold")
    f = sorted(map(tuple, fold.collect()))
    S.release_persisted()
    assert g == f
    ids = {(a, b) for a, b, *_ in g}
    assert (0, 1) in ids and (6, 7) in ids
    assert not any(4 in p for p in ids)


def test_cosine_gemm_duplicate_id_values_match_fold(spark):
    """Duplicate id VALUES (two rows sharing vec_id, which always
    share a hash bucket) must behave exactly like the fold plan: no
    (id, id) self-pairs from the tile triangle, and pairs against
    other ids appear once per underlying row, not fanned out by the
    verify join."""
    vecs = [
        (5, "x", [1.0, 0.0]),
        (5, "x", [0.98, 0.02]),   # duplicate id, near-dup vector
        (7, "x", [0.9, 0.1]),
        (9, "x", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "label", "embedding"]) \
              .withColumn("embedding",
                          F.col("embedding").cast("array<float>"))
    gemm = sorted(map(tuple, S.cosine_neardup_blocked(
        df, "label", 0.5, bucket_rows=2).collect()))
    S.release_persisted()
    fold = sorted(map(tuple, S.cosine_neardup_blocked(
        df, "label", 0.5, method="fold").collect()))
    S.release_persisted()
    assert gemm == fold
    assert not any(a == b for a, b, *_ in gemm)
    # both id-5 rows pair with 7 → (5, 7) appears twice, like fold
    assert sum(1 for a, b, *_ in gemm if (a, b) == (5, 7)) == 2


def test_cosine_gemm_duplicate_ids_across_blocks_match_fold(spark):
    """An id value recurring in DIFFERENT blocks must never leak a
    cross-block pair: the candidate and both verify joins carry the
    tile's block key, so each pair re-attaches vectors from its own
    block only — byte-identical to the fold plan."""
    vecs = [
        (1, "A", [1.0, 0.0]),
        (2, "A", [0.9, 0.1]),
        (1, "B", [0.0, 1.0]),    # same id, other block — orthogonal
        (3, "B", [1.0, 0.0]),    # close to A's id-1 vector, NOT B's
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "label", "embedding"]) \
              .withColumn("embedding",
                          F.col("embedding").cast("array<float>"))
    gemm = sorted(map(tuple, S.cosine_neardup_blocked(
        df, "label", 0.5, bucket_rows=2).collect()))
    S.release_persisted()
    fold = sorted(map(tuple, S.cosine_neardup_blocked(
        df, "label", 0.5, method="fold").collect()))
    S.release_persisted()
    assert gemm == fold
    # block A keeps (1,2); block B has no qualifying pair — a
    # block-blind verify join would have invented (1,3,'B') from
    # block A's id-1 vector
    assert [(a, b, blk) for a, b, blk, _ in gemm] == [(1, 2, "A")]


def test_cosine_gemm_rejects_unknown_method(spark):
    df = spark.createDataFrame([(0, "x", [1.0])],
                               ["vec_id", "label", "embedding"])
    with pytest.raises(ValueError, match="method"):
        S.cosine_neardup_blocked(df, "label", 0.5, method="nope")


def test_auto_nprobe_formula():
    assert S._auto_nprobe(4) == 4          # floor
    assert S._auto_nprobe(3) == 3          # capped at nlist
    assert S._auto_nprobe(22) == 11        # ceil(22^0.75)
    assert S._auto_nprobe(44) == 18        # ceil(44^0.75)
    assert S._auto_nprobe(31623) == 2372   # 7.5% of lists at n=1e9


def test_candidate_budget_curve():
    """max(2048, 128·⌊√n⌋): floor below n≈260, √n-scaled above — the
    round-10 re-curve of the flat 2048 cap (dominated at n=20k:
    recall 0.477 @ 12.1 s vs the uncapped power law's 0.780 @ 7.2 s)
    with the coefficient re-measured 64 → 128 in round 11 (at the
    64-cap's first binding scale, n=140k, it cost recall 0.790 →
    0.710 for ~6% wall — BENCH.md round-11 capped-regime table).
    Effective nprobe follows from it."""
    import math
    assert S._candidate_budget(500) == 2816    # 128·22
    assert S._candidate_budget(0) == 2048      # floor
    assert S._candidate_budget(200) == 2048    # floor
    assert S._candidate_budget(2000) == 5632   # 128·44
    assert S._candidate_budget(20000) == 18048  # 128·141 (sf1)
    assert S._candidate_budget(10**9) == 128 * 31622
    # effective auto nprobe at the measured scales — through the
    # PRODUCTION helper all three IVF call sites use
    # (_budget_capped_nprobe), so a formula regression can't hide
    # behind a test-local copy. Gate SFs and sf1 keep their
    # uncapped-power-law settings (the clip now first binds at
    # n≈420k); n=140k stays on the law (86 — the round-11 measured
    # point); n=1M clips 178 → 128 (the executed capped regime);
    # at n=1e9 the budget caps nprobe near 128 — total scoring work
    # stays at the n·nlist assignment scan's n^1.5 order
    def eff(n):
        return S._budget_capped_nprobe(max(4, int(math.sqrt(n))), n)
    assert eff(500) == 11
    assert eff(2000) == 18
    assert eff(20000) == 41
    assert eff(140_000) == 86
    assert eff(10**6) == 128
    assert 120 <= eff(10**9) <= 128


def test_lsh_auto_sizing_curves():
    """Pin the round-10 LSH auto-sizing decisions through the
    PRODUCTION helper ann_lsh_topk calls (_lsh_auto_sizing — not a
    test-local re-derivation, so reverting round() to ceil() or
    touching the 8.75/0.22 growth constants fails HERE): planes =
    round(log2(n/target_bucket)) centers expected bucket occupancy ON
    the target (ceil biased it to half — BENCH.md round-10 LSH knob
    table), and the table growth curve ceil(8.75·(n/tb)^0.22) is the
    OPERATIVE sizing under the max(2048, 128√n)/tb cap at any
    realistic n."""
    def planes(n):
        return S._lsh_auto_sizing(n)[1]

    def tables(n):
        return S._lsh_auto_sizing(n)[0]

    # gate SFs keep their historical plane counts (plans identical)
    assert planes(500) == 2
    assert planes(2000) == 4
    # sf1 lands on the measured recall-per-second knee (27 x 7)
    assert planes(20000) == 7
    assert tables(20000) == 27
    # the round-9 flat cap clipped the growth curve from n≈2000; the
    # √n budget leaves it operative (cap 5632//128 = 44 > grow 17)
    assert tables(2000) == 17
    # at extreme n the growth curve still binds, not the cap
    assert tables(10**9) == 288
    assert S._candidate_budget(10**9) // 128 > 288
