"""Capped-candidate-budget evidence at n=1M via the persisted-index
query path (VERDICT r10 #1, the clipped regime of the round-11
128·√n re-curve).

Why not the all-pairs sweep (tools/ann_knob_sweep.py) at this n: the
all-pairs probe fan-out ships one float64 unit replica per
(query, probed list) — n·nprobe ≈ 128M–356M rows × ~550 B ≈
70–190 GB of local shuffle, which this box's free disk (~21 GB)
cannot hold; the first attempt died on ENOSPC mid-shuffle (the log
is .scratch/ann_sweep_1m_allpairs_enospc.log). Per-query recall is
query-count-INDEPENDENT, so the measurement moves to
ann_ivf_query_index over a persisted ivf_index_build index — the
IDENTICAL sizing code (_budget_capped_nprobe over stored-index
stats) and the identical cogrouped scorer, row-for-row parity-pinned
against the in-memory ann_ivf_topk in tests/test_similarity.py —
queried with the same deterministic 256-vector hash sample the
all-pairs truth discipline uses. Members cross the wire once per
query batch (~600 MB), probes are |queries|·nprobe rows (~91k max).
This is also how the operator would actually run at 100 TB: build
once, query batches — never all-pairs on one box.

Configs: auto (the new 128√n cap → nprobe=128 at n=1M),
np64 (what the round-10 64√n cap would have picked — the constant
under re-measurement), np178 (the uncapped ⌈nlist^0.75⌉ law),
np356 (the 2× explicit high-recall knob).

Usage: python tools/ann_cap_index_1m.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from distributed_deduplicator_spark import get_session  # noqa: E402
from distributed_deduplicator_spark.operators import (  # noqa: E402
    similarity as S)
from distributed_deduplicator_spark.sources import load_table  # noqa: E402
from distributed_deduplicator_spark.sources.fixtures import (  # noqa: E402
    table_row_count)
from ann_knob_sweep import K, numpy_exact_truth  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/emb1m"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    index_dir = os.path.join(sf_dir, "ivf_index")
    spark = get_session("ann-cap-index-1m")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(sf_dir, "embeddings")
    print(f"n={n} building exact truth...", file=sys.stderr)
    sample_ids, exact = numpy_exact_truth(spark, emb, K, sample=256)

    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    out = {"sf_dir": sf_dir, "n": n, "k": K, "path": "persisted-index",
           "truth": f"{len(sample_ids)} queries", "loadavg_start": load0}

    t0 = time.perf_counter()
    S.ivf_index_build(emb, index_dir, n=n)
    S.release_persisted()
    out["index_build_s"] = round(time.perf_counter() - t0, 2)
    nlist, nmembers = S._ivf_index_stats(spark, index_dir)
    auto_np = S._budget_capped_nprobe(nlist, nmembers)
    law_np = S._auto_nprobe(nlist)
    out["nlist"] = nlist
    out["nmembers"] = nmembers
    print(f"index built in {out['index_build_s']}s: nlist={nlist} "
          f"auto(capped) np={auto_np} law np={law_np}", file=sys.stderr)

    queries = emb.where(F.col("vec_id").isin([int(i) for i in sample_ids]))
    # what the round-10 64√n budget would have picked at this n:
    # min(law, budget_old / (n/nlist)) — at n=1M/nlist=1000 that is 64
    import math
    budget_old = max(2048, 64 * math.isqrt(nmembers))
    old_np = min(law_np, max(4, int(budget_old // (nmembers / nlist))))
    configs = [(f"auto_np{auto_np}", None),
               (f"oldcap_np{old_np}", old_np),
               (f"law_np{law_np}", law_np),
               (f"hi_np{2 * law_np}", min(nlist, 2 * law_np))]
    for name, np_ in configs:
        t0 = time.perf_counter()
        got = {(r.query_id, r.neighbor_id)
               for r in S.ann_ivf_query_index(spark, index_dir, queries,
                                              k=K, nprobe=np_)
                         .select("query_id", "neighbor_id").collect()}
        wall = round(time.perf_counter() - t0, 2)
        S.release_persisted()
        recall = round(len(got & exact) / len(exact), 4)
        print(f"  {name}: recall@{K}={recall} wall={wall}s",
              file=sys.stderr)
        out[name] = {"recall": recall, "wall_s": wall}
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
