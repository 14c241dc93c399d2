"""A/B harness: declarative PQ encode (crossJoin + struct-MIN
aggregate) vs a numpy applyInPandas encode with two in-band codebook
deliveries (per-group _cb rows over a pmod(xxhash64(id), G) key, and
per-row broadcast attach). Parity-gated (full + sparse codebooks)
before timing; the numpy d2 accumulates sequentially over dsub
(bit-identical to the JVM chain) and argmin-first-occurrence over
ascending code slots reproduces the (d2, code) lexicographic MIN.

Round-11 readings (8 interleaved runs, medians): n=2000
current 1.48 / np-group 1.40 / np-row 1.18; n=20k current 1.13 /
np-group 0.91 / np-row 1.00 — np-group wins ~20% at sf1 scale with
visibly lower variance, but the absolute delta sits inside the
suite's ambient noise floor and the encode stage is ~1000x below the
IVF assignment scan's flops at any scale, so the declarative spelling
stays the shipped default. Kept for round 12 to re-evaluate at larger
n or if the encode ever dominates a profile.

Usage: python tools/pq_encode_ab.py [sf_dir]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from distributed_deduplicator_spark import get_session
from distributed_deduplicator_spark.operators import similarity as S
from distributed_deduplicator_spark.sources.fixtures import load_table

spark = get_session("encode-np")
spark.sparkContext.setLogLevel("ERROR")
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
emb = load_table(spark, sfdir, "embeddings")
u = S._tracked_persist(S.unit_vectors(emb, "vec_id", "embedding"))
n = u.count()
m, ksub, dim = 32, 16, 64
dsub = dim // m
cb = S._tracked_persist(S.pq_codebooks(u, m, ksub, dim, refine=True).coalesce(1))
cb.count()
print("n =", n)

def encode_numpy(unit, codebooks, G=None, delivery="group"):
    sess = unit.sparkSession
    dp = sess.sparkContext.defaultParallelism
    if G is None:
        G = max(dp, -(-n * 530 // (64 << 20)))
    # flat dense codebook: slot s = sub*ksub+code -> dsub floats;
    # absent slots NaN (never argmin-win)
    cb_map = codebooks.agg(F.map_from_entries(F.collect_list(F.struct(
        (F.col("sub_id") * ksub + F.col("code")).cast("int").alias("slot"),
        F.col("ccent")))).alias("_m"))
    cb_flat = cb_map.select(F.flatten(F.transform(
        F.sequence(F.lit(0), F.lit(m * ksub - 1)),
        lambda s: F.coalesce(F.element_at(F.col("_m"), s),
                             F.array_repeat(F.lit(float("nan")), dsub))))
        .alias("unit"))

    def enc(pdf):
        cbmask = pdf["_cb"].to_numpy(dtype=bool)
        if not (~cbmask).any():
            return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                 "codes": pd.Series([], dtype="object")})
        flat = np.asarray(pdf["unit"][cbmask].iloc[0], dtype=np.float64)
        C = flat.reshape(m, ksub, dsub)
        rows = pdf[~cbmask]
        U = np.vstack([np.asarray(x, dtype=np.float64) for x in rows["unit"]])
        ids = rows["id"].to_numpy()
        out_codes = []
        codes = np.empty((len(rows), m), dtype=np.int64)
        valid = np.empty(m, dtype=bool)
        sub_has = np.zeros(m, dtype=bool)
        for s_ in range(m):
            Cs = C[s_]                      # (ksub, dsub)
            pres = ~np.isnan(Cs[:, 0])      # present codes
            sub_has[s_] = pres.any()
            if not sub_has[s_]:
                continue
            acc = np.zeros((len(rows), ksub))
            for p in range(dsub):
                d = U[:, s_ * dsub + p][:, None] - Cs[None, :, p]
                acc = acc + d * d
            acc[:, ~pres] = np.inf
            codes[:, s_] = np.argmin(acc, axis=1)
        for r in range(len(rows)):
            out_codes.append({int(s_): int(codes[r, s_])
                              for s_ in range(m) if sub_has[s_]})
        return pd.DataFrame({"id": ids, "codes": out_codes})

    if delivery == "group":
        keyed = unit.withColumn("_g", F.pmod(F.xxhash64("id"), F.lit(G))) \
                    .withColumn("_cb", F.lit(False))
        cb_rows = (sess.range(G).select(F.col("id").alias("_g"))
                   .join(F.broadcast(cb_flat.withColumn("_j", F.lit(1))
                                     .alias("c")),
                         F.lit(True))
                   .select("_g", F.lit(-1).cast("long").alias("id"),
                           F.col("unit"), F.lit(True).alias("_cb")))
        both = keyed.select("_g", "id", "unit", "_cb").unionByName(cb_rows)
        return (both.groupBy("_g")
                .applyInPandas(lambda pdf: enc(pdf),
                               "id long, codes map<int,int>"))
    else:  # per-row attach
        att = (unit.join(F.broadcast(cb_flat.select(
                    F.col("unit").alias("_flat"), F.lit(1).alias("_j"))),
                    F.lit(True))
               .select("id", "unit", "_flat"))
        def enc2(it):
            first = True
            for pdf in it:
                if len(pdf) == 0: continue
                flat = np.asarray(pdf["_flat"].iloc[0], dtype=np.float64)
                C = flat.reshape(m, ksub, dsub)
                p2 = pd.DataFrame({"id": pdf["id"], "unit": pdf["unit"],
                                   "_cb": False})
                cbrow = pd.DataFrame({"id": [-1], "unit": [flat], "_cb": [True]})
                yield enc(pd.concat([cbrow, p2], ignore_index=True))
        return att.mapInPandas(enc2, "id long, codes map<int,int>")

cur = {r["id"]: dict(r["codes"]) for r in S.pq_encode(u, cb, m, ksub, dim).collect()}
for dlv in ("group", "row"):
    got = {r["id"]: dict(r["codes"]) for r in encode_numpy(u, cb, delivery=dlv).collect()}
    print(f"parity {dlv}:", cur == got)
cbs = cb.where(~((F.col("sub_id") == 3) | ((F.col("sub_id") == 5) & (F.col("code") >= 2))))
cur2 = {r["id"]: dict(r["codes"]) for r in S.pq_encode(u, cbs, m, ksub, dim).collect()}
got2 = {r["id"]: dict(r["codes"]) for r in encode_numpy(u, cbs, delivery="group").collect()}
print("parity sparse group:", cur2 == got2)

variants = [("current", lambda: S.pq_encode(u, cb, m, ksub, dim)),
            ("np-group", lambda: encode_numpy(u, cb, delivery="group")),
            ("np-row", lambda: encode_numpy(u, cb, delivery="row"))]
for _, fn in variants: fn().write.format("noop").mode("overwrite").save()
walls = {t: [] for t, _ in variants}
for r in range(8):
    for tag, fn in variants:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        walls[tag].append(time.perf_counter() - t0)
for tag, ws in walls.items():
    print(tag, " ".join(f"{w:.2f}" for w in ws), "median", f"{statistics.median(ws):.2f}")
spark.stop()
