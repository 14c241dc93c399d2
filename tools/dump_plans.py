"""Dump .explain('formatted') for registered queries to plan files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query...]
       [--sf <sf_dir>]

Writes <out_dir>/<query>_<suffix>.txt for each query — the evidence
files the optimization rounds commit under plans/rNN/ (the judge
checks plan claims against these). Plans are built, not executed
(explain of the unexecuted DataFrame, AdaptiveSparkPlan initial form —
same convention as the earlier rounds' dumps).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from distributed_deduplicator_spark import get_session  # noqa: E402
from distributed_deduplicator_spark import queries as Q  # noqa: E402
from distributed_deduplicator_spark.operators.similarity import (  # noqa: E402
    release_persisted)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    out_dir, suffix, names = args[0], args[1], args[2:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        release_persisted()
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
