"""Spot-check named queries against their DuckDB oracles (dev loop).

Usage: python tools/check_parity.py <sf_dir> name [name ...]
Mirrors tools/local_drive.py's comparison exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    return f"{v:.9g}" if isinstance(v, float) else str(v)


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("check-parity")
             .config("spark.ui.enabled", "false")
             # dev tool, not the driver sim: give the single-JVM driver
             # room for sf1 spot-checks (cached subtrees + broadcasts
             # trip the 1g default; the driver's real gate is sf0.01)
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        if name not in osql:
            print(f"{name}: rows_only rows={sdf.count()}")
            continue
        got = sdf.collect()
        ores = con.execute(osql[name])
        orows = ores.fetchall()
        scols = sorted(sdf.columns)
        ocols = sorted(d[0] for d in ores.description)
        sidx = sorted(range(len(sdf.columns)),
                      key=lambda i: sdf.columns[i])
        odesc = [d[0] for d in ores.description]
        oidx = sorted(range(len(odesc)), key=lambda i: odesc[i])
        sn = sorted(tuple(norm(r[i]) for i in sidx) for r in got)
        on = sorted(tuple(norm(r[i]) for i in oidx) for r in orows)
        ok = scols == ocols and sn == on
        print(f"{name}: cols={scols == ocols} rows={len(got)}/{len(orows)} "
              f"match={sn == on}")
        if not ok:
            fails += 1
            if scols != ocols:
                print("  spark cols:", scols, "\n  oracle cols:", ocols)
            for a, b in list(zip(sn, on))[:5]:
                if a != b:
                    print("  spark :", a, "\n  oracle:", b)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
