"""Recall@k + wall sweep over the ANN auto-sizing knobs — the
measurement harness behind BENCH.md's knob tables (round 9: the flat
2048 candidate cap vs explicit nprobe/tables; round 10: the
_candidate_budget re-curve).

Ground truth: exact cosine top-k for a deterministic 256-query
hash-sample (xxhash64(vec_id, 9) ascending — identical to
tools/local_drive.py's sampled tier), computed driver-side as one
numpy float64 GEMM and RANKED ON THE 6-DP-ROUNDED cosine (the repo's
ulp-absorbing discipline) so a rank-k boundary tie can't flip between
the normalize-then-GEMM truth and the JVM dot/(norm·norm) fold. For
corpora ≤ 10k vectors every query is measured (same switch as the
drive).

Wall: one timed .collect() per configuration (the recall pass IS the
timing pass — collected rows are (query, neighbor) id pairs only).
Persisted subtrees are released between configurations so no config
subsidizes the next.

Usage:
  python tools/ann_knob_sweep.py [sf_dir] [out_json]
defaults: /root/repo/.scratch/sf1  stderr-only
Configs are edited in CONFIGS below — this is a measurement tool, not
an API.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_deduplicator_spark import get_session  # noqa: E402
from distributed_deduplicator_spark.operators import (  # noqa: E402
    similarity as S)
from distributed_deduplicator_spark.sources import load_table  # noqa: E402
from distributed_deduplicator_spark.sources.fixtures import (  # noqa: E402
    table_row_count)

K = 5


def numpy_exact_truth(spark, emb, k: int, sample: int | None = 256):
    """(sample_ids, exact_edges): driver-side numpy exact cosine top-k
    ground truth for ANN recall measurement — THE shared
    truth-discipline implementation (tools/local_drive.py's sampled
    tier imports it; this sweep uses it at every size), so the
    deterministic xxhash64(vec_id, 9) sample, the self-match mask,
    and the 6-dp-rounded (cosine desc, neighbor_id asc) ranking — the
    repo's ulp-absorbing tie-break, cf. round_dp in
    cosine_topk_bruteforce — can never drift apart between the
    BENCH.md knob tables and the LOCAL_DRIVE artifacts. A one-sided
    trade documented here once: rounding also means two GENUINELY
    distinct cosines within 1e-6 at the rank-k boundary tie-break by
    id in the truth while an operator ranking raw doubles may keep
    the other one — both failure modes are rank-boundary-rare; the
    rounded form was chosen because cross-float-op-order ulp flips
    (normalize-then-GEMM vs dot/(norm·norm)) are systematic while
    1e-6-close distinct cosines on these fixtures are not.
    ``sample=None`` → every vector is a query."""
    import numpy as np
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    # a synthetic corpus with COLLIDING ids silently corrupts both
    # the truth (searchsorted on a non-unique sort) and the operators
    # (pq_encode's groupBy(id) merges codes of different vectors) —
    # the round-11 first 140k build hit exactly this (copies of an
    # ALREADY-shifted corpus re-overlap the id ranges), reading
    # recall 0.01 that had nothing to do with the knobs under test
    assert len(np.unique(ids)) == len(ids), \
        "corpus ids are not unique — rebuild from an unshifted source"
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    if sample is not None and len(ids) > sample:
        samp = (emb.select("vec_id",
                           F.xxhash64(F.col("vec_id"), F.lit(9))
                            .alias("_h"))
                   .orderBy("_h", "vec_id").limit(sample).collect())
        sample_ids = sorted(r.vec_id for r in samp)
    else:
        sample_ids = [int(i) for i in ids]
    qpos = np.searchsorted(ids, np.array(sample_ids))
    sims = mat[qpos] @ mat.T
    exact = set()
    for row_i, qid in enumerate(sample_ids):
        s = sims[row_i].copy()
        s[np.searchsorted(ids, qid)] = -np.inf
        top = np.lexsort((ids, -np.round(s, 6)))[:k]
        exact.update((int(qid), int(ids[t])) for t in top)
    return set(sample_ids), exact


def exact_truth(spark, emb, n_emb: int):
    """Sweep-local wrapper: sampled above 10k vectors (the same
    switch as the drive), all-queries numpy truth below."""
    return numpy_exact_truth(spark, emb, K,
                             sample=256 if n_emb > 10_000 else None)


def measure(name, fn, sample_ids, exact):
    t0 = time.perf_counter()
    got = {(r.query_id, r.neighbor_id)
           for r in fn().select("query_id", "neighbor_id").collect()
           if r.query_id in sample_ids}
    wall = round(time.perf_counter() - t0, 2)
    S.release_persisted()
    recall = round(len(got & exact) / len(exact), 4)
    print(f"  {name}: recall@{K}={recall} wall={wall}s", file=sys.stderr)
    return {"recall": recall, "wall_s": wall}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("ann-knob-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(sf_dir, "embeddings")
    print(f"n={n} building exact truth...", file=sys.stderr)
    sample_ids, exact = exact_truth(spark, emb, n)

    import math
    nlist = max(4, int(math.sqrt(n)))
    # the round-9 flat-2048-budget defaults, for same-session
    # old-vs-new comparisons (cold-start and box state cancel out)
    old_np = min(S._auto_nprobe(nlist), max(4, (2048 * nlist) // n))
    old_tables = max(4, min(
        math.ceil(8.75 * (max(n, 2) / 128) ** 0.22), 16))

    CONFIGS = [
        ("ivf_auto", lambda: S.ann_ivf_topk(emb, k=K, n=n)),
    ]
    if os.environ.get("ANN_SWEEP_SKIP_PQ", "0") != "1":
        CONFIGS.append(
            ("ivfpq_auto", lambda: S.ann_ivfpq_topk(emb, k=K, n=n)))
    if os.environ.get("ANN_SWEEP_SKIP_LSH", "0") != "1":
        CONFIGS.append(
            ("lsh_auto", lambda: S.ann_lsh_topk(emb, k=K, n=n)))
    if os.environ.get("ANN_SWEEP_OLD", "0") == "1":
        CONFIGS += [
            (f"ivf_old_np{old_np}",
             lambda: S.ann_ivf_topk(emb, k=K, n=n, nlist=nlist,
                                    nprobe=old_np)),
            (f"ivfpq_old_np{old_np}",
             lambda: S.ann_ivfpq_topk(emb, k=K, n=n, nlist=nlist,
                                      nprobe=old_np)),
            (f"lsh_old_t{old_tables}",
             lambda: S.ann_lsh_topk(emb, k=K, n=n,
                                    num_tables=old_tables)),
            # warm repeat of the new auto defaults — JIT/first-scan
            # drift check against the cold readings above
            ("ivf_auto_warm", lambda: S.ann_ivf_topk(emb, k=K, n=n)),
            ("ivfpq_auto_warm",
             lambda: S.ann_ivfpq_topk(emb, k=K, n=n)),
        ]
    if os.environ.get("ANN_SWEEP_EXTRA", "0") == "1":
        CONFIGS += [
            ("lsh_t27_p7",
             lambda: S.ann_lsh_topk(emb, k=K, n=n, num_tables=27,
                                    num_planes=7)),
            ("lsh_t32_p6",
             lambda: S.ann_lsh_topk(emb, k=K, n=n, num_tables=32,
                                    num_planes=6)),
        ]
    if os.environ.get("ANN_SWEEP_CAP", "0") == "1":
        # VERDICT r10 #1: the _candidate_budget cap only BINDS past
        # n ≈ 65k (where ⌈nlist^0.75⌉·n/nlist first exceeds 64√n) and
        # no artifact had ever executed that regime. On a corpus built
        # 2×+ past the clip point, measure the capped auto default
        # against (a) the UNCAPPED power law (what the cap clips) and
        # (b) a 2× explicit high-recall setting (the documented
        # recall-beyond-the-budget knob) — recall delta is what the
        # cap costs, wall delta is what it buys.
        uncapped = S._auto_nprobe(nlist)
        capped = S._budget_capped_nprobe(nlist, n)
        hi = min(nlist, 2 * uncapped)
        print(f"cap sweep: nlist={nlist} capped_np={capped} "
              f"uncapped_np={uncapped} hi_np={hi}", file=sys.stderr)
        CONFIGS += [
            (f"ivf_capped_np{capped}",
             lambda: S.ann_ivf_topk(emb, k=K, n=n)),
            (f"ivf_uncapped_np{uncapped}",
             lambda: S.ann_ivf_topk(emb, k=K, n=n, nlist=nlist,
                                    nprobe=uncapped)),
            (f"ivf_hi_np{hi}",
             lambda: S.ann_ivf_topk(emb, k=K, n=n, nlist=nlist,
                                    nprobe=hi)),
        ]
        # IVF-PQ shares _budget_capped_nprobe with IVF; at n ≥ ~500k
        # its wall makes the extra configs a poor spend — gate them
        if os.environ.get("ANN_SWEEP_CAP_IVF_ONLY", "0") != "1":
            CONFIGS += [
                (f"ivfpq_capped_np{capped}",
                 lambda: S.ann_ivfpq_topk(emb, k=K, n=n)),
                (f"ivfpq_uncapped_np{uncapped}",
                 lambda: S.ann_ivfpq_topk(emb, k=K, n=n, nlist=nlist,
                                          nprobe=uncapped)),
            ]
    if os.environ.get("ANN_SWEEP_NLIST", "0") == "1":
        # VERDICT r9 #6: recall vs nlist at the gate SFs. Two controls:
        # (a) fixed nlist·nprobe (the verdict's formula — holds the
        # assignment-rank work steady while the probed FRACTION falls
        # as 1/nlist²), and (b) fixed probed fraction nprobe/nlist = ½
        # (holds expected candidates steady — isolates pure list-
        # granularity/quantization loss). The auto point (√n lists,
        # power-law probes) anchors both.
        prod = nlist * S._auto_nprobe(nlist)

        def ivf_at(nl, np_):
            np_ = max(1, min(nl, np_))
            return (f"ivf_nl{nl}_np{np_}",
                    lambda: S.ann_ivf_topk(emb, k=K, n=n, nlist=nl,
                                           nprobe=np_))
        seen = set()
        for nl in (max(4, nlist // 2), nlist, int(nlist * 1.5),
                   nlist * 2, nlist * 3):
            for cfg in (ivf_at(nl, max(1, prod // nl)),      # (a)
                        ivf_at(nl, max(1, nl // 2))):        # (b)
                if cfg[0] not in seen:
                    seen.add(cfg[0])
                    CONFIGS.append(cfg)

    out = {"sf_dir": sf_dir, "n": n, "k": K,
           "truth": f"{len(sample_ids)} queries"}
    for name, fn in CONFIGS:
        out[name] = measure(name, fn, sample_ids, exact)
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
