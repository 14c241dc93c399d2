"""Local replica of the driver's full correctness gate over EVERY
registered query (the driver window only covers the first 50), with
per-query wall time — the artifact behind LOCAL_DRIVE_r{N}.json.

Usage:
  python tools/local_drive.py <sf_dir> <out_json> [--engine-session]
                              [--only name1,name2,...]

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
# tools/, not the repo root the entry module lives in); tools/ itself
# is added too so the shared truth helper (ann_knob_sweep) imports
# even when this module is imported rather than run as a script
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(v):
    return f"{v:.9g}" if isinstance(v, float) else str(v)


def quality_metrics(spark, sf_dir, qs) -> dict:
    """Quality numbers for the ANN/near-dup rows-only queries, so the
    drive artifact shows result QUALITY, not just row counts (the
    pytest recall gates exist in tests/test_similarity.py — this
    surfaces the same comparisons per drive):

    - ann_*_topk: recall@k of (query, neighbor) edges vs the exact
      brute-force cosine top-k over the same corpus;
    - minhash_near_dup / near_dup_ensemble: precision+recall vs the
      EXACT n-gram Jaccard join at the same threshold;
    - simhash/winnow pair generators: F1 vs an independently-built
      brute-force twin (expected 1.0 — these are exact-by-construction;
      the twin guards the pigeonhole/banding candidate generation);
    - near_dup_clusters: fraction of exact-Jaccard pairs landing in
      the same cluster (co-cluster recall).

    Driver-side set math on collected PAIR KEYS only (ids, never
    payloads) — diagnostic tooling, not a registered query path.
    """
    from pyspark.sql import functions as F

    from distributed_deduplicator_spark.operators import similarity as S
    from distributed_deduplicator_spark.sources import load_table

    out: dict[str, dict] = {}

    def undirected(df):
        return {(min(a, b), max(a, b))
                for a, b in df.select("id_a", "id_b").collect()}

    def pr(got: set, truth: set) -> dict:
        inter = len(got & truth)
        return {"precision": round(inter / len(got), 4) if got else None,
                "recall": round(inter / len(truth), 4) if truth else None,
                "n_got": len(got), "n_truth": len(truth)}

    # --- ANN recall@k vs exact brute force (directed edges) ---------
    # Up to ~20k vectors the ground truth is the full all-pairs exact
    # top-k (every query measured). Beyond that the n² truth outgrows
    # the drive's wall budget (the r8 sf1 drive was stopped exactly
    # here at 50k vectors), so the truth switches to a deterministic
    # hash-sample of 256 query ids — exact top-k for those queries is
    # ONE linear corpus scan, and recall over 256×k edges is a tight
    # estimate (SE ≈ 1.3% at recall 0.75). The ANN queries themselves
    # still run over ALL vectors; only the measurement is sampled.
    from distributed_deduplicator_spark.sources.fixtures import (
        table_row_count)
    emb = load_table(spark, sf_dir, "embeddings")
    k = 5  # _TOPK in queries/similarity_queries.py
    n_emb = table_row_count(sf_dir, "embeddings")  # footer, no job
    # sf0.1 (10k vectors) keeps the historical full all-pairs truth;
    # anything larger (sf1 = 20k) samples — the all-pairs cost is
    # n²/10⁸ interpreted-fold minutes and 20k was already a 20+ min
    # single-task stall
    sampled = n_emb > 10_000
    if sampled:
        # Driver-side numpy ground truth: 256 hash-sampled queries ×
        # the full corpus is one ~0.8-GFLOP float64 GEMM — milliseconds
        # in BLAS, and exactly as exact as the distributed operator.
        # The Spark brute-force path is NOT used here because a
        # 256-query broadcast join over a one-split corpus file
        # evaluates the cosine fold (ArrayAggregate, a CodegenFallback
        # expression) interpreted on a single task — measured 20+ min
        # at 50k vectors, the very stall that killed the r8 sf1
        # quality tier. Ground truth for a diagnostic is the one place
        # a driver-side compute is the right tool: |queries| is fixed
        # at 256 and the corpus matrix (50k × 64 doubles ≈ 25 MB)
        # collects once. The implementation is SHARED with the knob
        # sweep (tools/ann_knob_sweep.numpy_exact_truth — the
        # deterministic xxhash64 sample, the self-mask, and the
        # 6-dp-rounded tie-break live there, once), so BENCH.md knob
        # tables and these drive artifacts can never use divergent
        # truth disciplines.
        from ann_knob_sweep import numpy_exact_truth
        sample_ids, exact = numpy_exact_truth(spark, emb, k, sample=256)
    else:
        exact = {(r.query_id, r.neighbor_id)
                 for r in S.cosine_topk_bruteforce(emb, emb, k=k)
                           .select("query_id", "neighbor_id").collect()}
        sample_ids = {q for q, _ in exact}
        S.release_persisted()
    for name in ("ann_lsh_topk", "ann_ivf_topk", "ann_ivfpq_topk"):
        approx = {(r.query_id, r.neighbor_id)
                  for r in qs[name](spark, sf_dir)
                            .select("query_id", "neighbor_id").collect()
                  if r.query_id in sample_ids}
        out[name] = {f"recall_at_{k}":
                     round(len(approx & exact) / len(exact), 4),
                     "truth": (f"sampled_{len(sample_ids)}_queries"
                               if sampled else "all_queries")}
    S.release_persisted()

    # --- near-dup pair generators vs exact twins ---------------------
    d = load_table(spark, sf_dir, "documents")
    thr, ngram = 0.35, 3  # _JACCARD_THRESHOLD/_NGRAM in the registry
    exact_j = undirected(
        S.jaccard_similarity_join(d, "doc_id", "text", n=ngram,
                                  threshold=thr))
    S.release_persisted()
    out["minhash_near_dup"] = pr(
        undirected(qs["minhash_near_dup"](spark, sf_dir)), exact_j)
    out["near_dup_ensemble"] = pr(
        undirected(qs["near_dup_ensemble"](spark, sf_dir)), exact_j)
    S.release_persisted()

    # Planted clone families: the fixtures' ORGANIC near-dup truth is
    # thin (~25 pairs at sf0.01 — a P/R gate that can barely fail), so
    # the operators are ALSO measured on the corpus augmented with 100
    # deterministic clone families (~300 extra true pairs in the
    # 0.4-0.6 Jaccard regime the banding S-curve must catch). Truth is
    # the exact Jaccard join over the augmented corpus — the operator
    # is never graded against the planting intent.
    from distributed_deduplicator_spark.sources.fixtures import (
        plant_clone_families)
    aug = plant_clone_families(d, n_families=100)
    truth_rows = (S.jaccard_similarity_join(aug, "doc_id", "text",
                                            n=ngram, threshold=thr)
                   .select("id_a", "id_b", "jaccard").collect())
    S.release_persisted()
    jac = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.jaccard
           for r in truth_rows}
    exact_aug = set(jac)
    planted = pr(
        undirected(S.minhash_near_dup(aug, "doc_id", "text", n=ngram,
                                      num_hashes=64, bands=16, rows=4,
                                      threshold=thr)), exact_aug)
    # Recall is EXPECTED to sit on the 16x4 banding S-curve, not at
    # 1.0: record the expectation (mean collision prob 1-(1-j^4)^16
    # over the truth pairs' exact Jaccards) and the two-sided band the
    # pytest gate enforces (expected-0.10 .. expected+0.15 — an
    # undershoot is a banding regression, an overshoot means candidate
    # generation quietly went all-pairs), so cross-round drift is
    # visible in the artifact without reading test source.
    if jac:
        exp = sum(1 - (1 - j ** 4) ** 16 for j in jac.values()) / len(jac)
        planted["expected"] = round(exp, 4)
        planted["band"] = [round(exp - 0.10, 4),
                           round(min(1.0, exp + 0.15), 4)]
    out["minhash_near_dup_planted"] = planted
    S.release_persisted()

    # simhash: brute-force hamming twin over the fingerprint table
    fp = S.simhash64(d, "doc_id", "text")
    fa = fp.select(F.col("id").alias("id_a"), F.col("simhash").alias("_fa"))
    fb = fp.select(F.col("id").alias("id_b"), F.col("simhash").alias("_fb"))
    brute_sh = undirected(
        fa.join(fb, F.col("id_a") < F.col("id_b"))
          .where(F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))) <= 3))
    got_sh = undirected(qs["simhash_near_dup_pairs"](spark, sf_dir))
    out["simhash_near_dup_pairs"] = pr(got_sh, brute_sh)

    # winnow: brute-force shared-fingerprint twin via array_intersect
    wf = S.winnow_fingerprints(d, "doc_id", "text", k=5, window=4)
    wa = wf.select(F.col("id").alias("id_a"),
                   F.col("fingerprints").alias("_wa"))
    wb = wf.select(F.col("id").alias("id_b"),
                   F.col("fingerprints").alias("_wb"))
    brute_wn = undirected(
        wa.join(wb, F.col("id_a") < F.col("id_b"))
          .where(F.size(F.array_intersect("_wa", "_wb")) >= 2))
    got_wn = undirected(qs["winnow_near_dup_pairs"](spark, sf_dir))
    out["winnow_near_dup_pairs"] = pr(got_wn, brute_wn)

    # clusters: co-cluster recall of the exact-Jaccard pairs
    labels = {r.id: r.cluster_id
              for r in qs["near_dup_clusters"](spark, sf_dir).collect()}
    same = sum(1 for a, b in exact_j
               if labels.get(a) is not None and labels.get(a) == labels.get(b))
    out["near_dup_clusters"] = {
        "co_cluster_recall": round(same / len(exact_j), 4) if exact_j
        else None, "n_exact_pairs": len(exact_j)}
    S.release_persisted()

    # --- sketch family: estimate error vs exact ----------------------
    def max_rel_err(pairs):
        return round(max((abs(a - e) / e) for a, e in pairs if e), 4)

    rows = qs["agg_approx_distinct"](spark, sf_dir).collect()
    out["agg_approx_distinct"] = {"max_rel_err": max_rel_err(
        [(r.approx_parts, r.exact_parts) for r in rows])}

    ev = load_table(spark, sf_dir, "events")
    exact_users = {r.event_type: r.n for r in
                   ev.groupBy("event_type")
                     .agg(F.countDistinct("user_id").alias("n")).collect()}
    exact_users["ALL"] = ev.select("user_id").distinct().count()
    for name, key in (("sketch_distinct_users", "event_type"),
                      ("hll_sketch_rollup", "scope")):
        rows = qs[name](spark, sf_dir).collect()
        out[name] = {"max_rel_err": max_rel_err(
            [(r.est_users, exact_users[getattr(r, key)]) for r in rows])}

    # KLL quantiles vs exact percentile (per type and overall)
    pcts = (0.25, 0.5, 0.75, 0.9)
    exact_q = {r.event_type: [getattr(r, f"p{int(p*100)}") for p in pcts]
               for r in ev.groupBy("event_type").agg(
                   *[F.expr(f"percentile(value, {p})")
                      .alias(f"p{int(p*100)}") for p in pcts]).collect()}
    exact_q["ALL"] = list(ev.agg(
        *[F.expr(f"percentile(value, {p})").alias(f"p{int(p*100)}")
          for p in pcts]).collect()[0])
    kll = qs["kll_value_quantiles"](spark, sf_dir).collect()
    out["kll_value_quantiles"] = {"max_rel_err": max_rel_err(
        [(getattr(r, f"p{int(p*100)}"), exact_q[r.event_type][i])
         for r in kll for i, p in enumerate(pcts)])}

    rows = qs["text_length_quantiles"](spark, sf_dir).collect()
    out["text_length_quantiles"] = {"max_rel_err": max_rel_err(
        [(r.approx_p50, r.exact_p50) for r in rows])}

    # freqItems: superset guarantee — every true heavy hitter present
    from distributed_deduplicator_spark.functions import text as TXT
    toks = d.select(F.explode(TXT.tokens("text")).alias("w"))
    n_tok = toks.count()
    # strictly greater: freqItems' guarantee covers frequency > support·N
    heavy = {r.w for r in toks.groupBy("w").count()
                             .where(F.col("count") > 0.01 * n_tok)
                             .collect()}
    got_tokens = {r.token for r in
                  qs["frequent_tokens_approx"](spark, sf_dir).collect()}
    out["frequent_tokens_approx"] = {
        "superset_holds": heavy <= got_tokens,
        "n_true_heavy": len(heavy),
        "n_reported": len(got_tokens)}

    # bloom decontamination: no false negatives vs the exact operator,
    # bounded false-positive overhang
    exact_flagged = {r.doc_id for r in
                     qs["benchmark_decontaminate"](spark, sf_dir)
                       .select("doc_id").collect()}
    bloom_flagged = {r.doc_id for r in
                     qs["decontaminate_bloom"](spark, sf_dir)
                       .select("doc_id").collect()}
    out["decontaminate_bloom"] = {
        "false_negatives": len(exact_flagged - bloom_flagged),
        "false_positives": len(bloom_flagged - exact_flagged),
        "n_exact_flagged": len(exact_flagged)}

    # --- remaining rows-only entries: contract/invariant checks ------
    # persisted IVF index must EQUAL the in-memory path row-for-row
    # (deterministic centroids + exact parquet double round-trip)
    def topk_set(df):
        return {(r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9))
                for r in df.collect()}
    mem = topk_set(qs["ann_ivf_topk"](spark, sf_dir))
    per = topk_set(qs["ann_ivf_persisted_topk"](spark, sf_dir))
    out["ann_ivf_persisted_topk"] = {"equals_in_memory": per == mem,
                                     "n_rows": len(per)}
    S.release_persisted()

    # watermarked stream dedup: exactly one survivor per live key, and
    # the key set equals the batch key set
    kept = qs["stream_dedup_watermark"](spark, sf_dir) \
        .groupBy("user_id", "event_type").count().collect()
    batch_keys = ev.select("user_id", "event_type").distinct().count()
    out["stream_dedup_watermark"] = {
        "one_row_per_key": all(r["count"] == 1 for r in kept),
        "keyset_matches_batch": len(kept) == batch_keys}

    # single-batch streaming near-dup drain ≡ batch greedy first-wins:
    # losers are exactly the greater ids of the batch pair list
    sv = {r.doc_id: r.verdict for r in
          qs["stream_minhash_neardup"](spark, sf_dir).collect()}
    batch_pairs = S.minhash_near_dup(d, "doc_id", "text",
                                     threshold=0.35).collect()
    S.release_persisted()
    losers = {max(p.id_a, p.id_b) for p in batch_pairs}
    out["stream_minhash_neardup"] = {
        "verdicts_match_batch_first_wins": all(
            (v == "DUPLICATE") == (k in losers) for k, v in sv.items()),
        "n_docs": len(sv)}

    # deterministic fingerprint tables: exactly one row per document
    # (value-exactness is pytest-gated vs pure-Python references)
    n_docs = d.count()
    for name in ("simhash_fingerprints", "text_winnow_fingerprints"):
        out[name] = {"one_row_per_doc":
                     qs[name](spark, sf_dir).count() == n_docs}
    return out


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    use_engine = "--engine-session" in sys.argv[3:]
    only: set[str] = set()
    if "--only" in sys.argv[3:]:
        idx = sys.argv.index("--only") + 1
        if idx >= len(sys.argv):
            sys.exit("--only requires a comma-separated query list")
        only = set(sys.argv[idx].split(","))
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
    # a misspelled --only name must fail loud, not write an artifact
    # that looks like a completed re-verification of nothing
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"--only names not registered: {sorted(unknown)}")
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
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
    try:
        # --only is a targeted re-verification; the quality sweep
        # re-runs the heavy ANN/near-dup queries, so skip it there
        quality = {} if only else quality_metrics(spark, sf_dir, qs)
    except Exception as exc:  # noqa: BLE001 — quality must not kill the drive
        quality = {"ERR": f"{type(exc).__name__}: {exc}"[:500]}
    print("quality:", json.dumps(quality), file=sys.stderr)
    payload = {"sf_dir": sf_dir, "engine_session": use_engine,
               "summary": counts, "quality": quality, "results": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
