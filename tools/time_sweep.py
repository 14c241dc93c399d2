"""Time every registered query at two scale factors and flag super-linear growth.

Usage: python tools/time_sweep.py [small_dir big_dir out.json [only...]]
Defaults: /root/testdata/sf0.1  /root/repo/.scratch/sf1  SWEEP.json

Dev tool (not the driver sim): one warm session, .count() per query,
cold-ish cache (registry persist hooks released between queries the
same way bench.py does). A 10x data step should cost <= ~10x; we flag
ratio > 8 or big absolute sf1 times for investigation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "SWEEP.json"
    only = set(sys.argv[4:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .appName("time-sweep")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from distributed_deduplicator_spark.operators.similarity import (
        release_persisted)
    qs = e.queries()

    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row: dict = {}
        for key, d in (("small", small), ("big", big)):
            t0 = time.time()
            try:
                n = fn(spark, d).count()
                row[key + "_sec"] = round(time.time() - t0, 2)
                row[key + "_rows"] = n
            except Exception as ex:  # noqa: BLE001 — record and move on
                row[key + "_err"] = f"{type(ex).__name__}: {ex}"[:200]
            finally:
                release_persisted()
            spark.catalog.clearCache()
        s, b = row.get("small_sec"), row.get("big_sec")
        if s and b:
            row["ratio"] = round(b / max(s, 0.05), 1)
        results[name] = row
        print("TIMED", name, json.dumps(row), flush=True)

    with open(out, "w") as f:
        json.dump({"small": small, "big": big, "results": results}, f,
                  indent=1)
    flagged = {n: r for n, r in results.items()
               if r.get("ratio", 0) > 8 or r.get("big_sec", 0) > 30
               or "big_err" in r or "small_err" in r}
    print("FLAGGED", json.dumps(flagged, indent=1), flush=True)


if __name__ == "__main__":
    main()
