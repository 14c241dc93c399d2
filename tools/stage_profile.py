"""Per-stage wall/metric profile for one registered query at one SF.

Usage: python tools/stage_profile.py <query> [sf_dir] [runs]

Runs the query with the noop sink on the engine session (UI enabled on
an ephemeral port), then prints every stage of the timed run ordered
by duration, with shuffle read/write bytes and task counts — the
guide's "empirical loop" (spark_optimization_guide.md §1.1/§7.1)
without a live UI. Warm pass at sf0.001 first, same as bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_deduplicator_spark import get_session
from distributed_deduplicator_spark import queries as Q
from distributed_deduplicator_spark.operators.similarity import release_persisted


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_session("stage-profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4444",
        "spark.ui.retainedStages": "2000",
        "spark.ui.retainedJobs": "2000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    fn = Q.QUERIES[name]
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        release_persisted()
    for r in range(runs):
        spark.sparkContext.setJobDescription(f"{name} timed run {r}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_persisted()
        print(f"== {name} run {r}: {wall:.3f}s", flush=True)
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4444/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    timed_stage_ids = set()
    for j in jobs:
        if (j.get("description") or "").startswith(f"{name} timed"):
            timed_stage_ids.update(j["stageIds"])
    rows = []
    for s in stages:
        if s["stageId"] not in timed_stage_ids:
            continue
        dur = (s.get("executorRunTime") or 0) / 1000.0
        rows.append((dur, s))
    rows.sort(reverse=True, key=lambda x: x[0])
    total_run = sum(d for d, _ in rows)
    print(f"# stages in timed jobs: {len(rows)}, sum executorRunTime {total_run:.1f}s (over {runs} run(s))")
    print(f"{'exec_s':>8} {'cpu_s':>8} {'tasks':>5} {'shW_MB':>8} {'shR_MB':>8} {'in_MB':>8}  name")
    for dur, s in rows[:40]:
        cpu = (s.get("executorCpuTime") or 0) / 1e9
        shw = (s.get("shuffleWriteBytes") or 0) / 1e6
        shr = (s.get("shuffleReadBytes") or 0) / 1e6
        inp = (s.get("inputBytes") or 0) / 1e6
        nm = s["name"].split("\n")[0][:80]
        print(f"{dur:8.2f} {cpu:8.2f} {s['numCompleteTasks']:5d} {shw:8.1f} {shr:8.1f} {inp:8.1f}  id={s['stageId']} {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
