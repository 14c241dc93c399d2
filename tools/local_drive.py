"""Local replica of the driver's full correctness gate over EVERY
registered query (the driver window only covers the first 50), with
per-query wall time — the artifact behind LOCAL_DRIVE_r{N}.json.

Usage:
  python tools/local_drive.py <sf_dir> <out_json> [--engine-session]

Plain SparkSession by default (the driver's posture — catches
conf-dependence bugs); ``--engine-session`` uses the tuned factory,
for scale runs (sf1) where the perf confs are the thing under test.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

# runnable as `python tools/local_drive.py` (script sys.path[0] is
# tools/, not the repo root the entry module lives in)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    return f"{v:.9g}" if isinstance(v, float) else str(v)


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    use_engine = "--engine-session" in sys.argv[3:]
    if use_engine:
        from distributed_deduplicator_spark import get_session
        spark = get_session("local-drive")
    else:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("local-drive")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            if name not in osql:
                results[name] = {"status": "rows_only",
                                 "rows": sdf.count()}
            else:
                got = sdf.collect()
                scols = sorted(sdf.columns)
                ores = con.execute(osql[name])
                ocols = sorted(d[0] for d in ores.description)
                orows = ores.fetchall()
                oidx = sorted(range(len(ocols)),
                              key=lambda i, d=ores.description:
                              d[i][0])  # description order -> sorted
                # normalize both sides on sorted column order
                sidx = sorted(range(len(sdf.columns)),
                              key=lambda i: sdf.columns[i])
                odesc = [d[0] for d in ores.description]
                oidx = sorted(range(len(odesc)), key=lambda i: odesc[i])
                sn = sorted(tuple(norm(r[i]) for i in sidx) for r in got)
                on = sorted(tuple(norm(r[i]) for i in oidx)
                            for r in orows)
                ok = scols == ocols and sn == on
                results[name] = {
                    "status": "oracle_match" if ok else "MISMATCH",
                    "rows": len(got), "oracle_rows": len(orows)}
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {"status": "ERR",
                             "err": f"{type(exc).__name__}: {exc}"[:500]}
        results[name]["sec"] = round(time.perf_counter() - t0, 3)
        print(name, results[name]["status"], results[name]["sec"],
              file=sys.stderr)

    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    payload = {"sf_dir": sf_dir, "engine_session": use_engine,
               "summary": counts, "results": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
