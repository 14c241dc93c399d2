"""Round-11 in-session A/B of the two ANN wire-format changes
(VERDICT r10 #2 and #6), at sf1 (n=20k), solo:

- ann_ivfpq_topk: probe_payload='qunit' (new — float32 unit vector,
  in-task ADC table) vs 'qtab' (legacy — precomputed 2 KB table per
  probe row)
- ann_lsh_topk: unit_wire='float32' (new) vs 'float64' (legacy)

Both variants run in the SAME session, interleaved A/B/A/B, so box
state and JIT warmup cancel (the box-measurement discipline: walls
swing 1.3–5x across episodes — never compare across sessions).
Recall@5 is measured against the shared numpy exact truth so the
"keep only if recall-identical" gate is read off the same artifact.

Usage: python tools/ann_wire_ab.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from distributed_deduplicator_spark import get_session  # noqa: E402
from distributed_deduplicator_spark.operators import (  # noqa: E402
    similarity as S)
from distributed_deduplicator_spark.sources import load_table  # noqa: E402
from distributed_deduplicator_spark.sources.fixtures import (  # noqa: E402
    table_row_count)
from tools.ann_knob_sweep import K, exact_truth, measure  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session("ann-wire-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = table_row_count(sf_dir, "embeddings")
    print(f"n={n} building exact truth...", file=sys.stderr)
    sample_ids, exact = exact_truth(spark, emb, n)

    def pq(payload):
        return lambda: S.ann_ivfpq_topk(emb, k=K, n=n,
                                        probe_payload=payload)

    def lsh(wire):
        return lambda: S.ann_lsh_topk(emb, k=K, n=n, unit_wire=wire)

    # warmup (JIT/first-scan) once per operator family, then
    # interleaved pairs; two rounds each so per-run jitter is visible
    CONFIGS = [("warm_pq", pq("qunit")), ("warm_lsh", lsh("float32"))]
    for i in (1, 2):
        CONFIGS += [
            (f"ivfpq_qunit_{i}", pq("qunit")),
            (f"ivfpq_qtab_{i}", pq("qtab")),
            (f"lsh_f32_{i}", lsh("float32")),
            (f"lsh_f64_{i}", lsh("float64")),
        ]
    try:
        load0 = round(os.getloadavg()[0], 2)
    except OSError:
        load0 = None
    out = {"sf_dir": sf_dir, "n": n, "k": K,
           "truth": f"{len(sample_ids)} queries", "loadavg_start": load0}
    for name, fn in CONFIGS:
        out[name] = measure(name, fn, sample_ids, exact)
    print(json.dumps(out))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
