"""Streaming near-duplicate suppression with a persistent MinHash
ledger — continuous corpus ingestion with near-dup dedup, the streaming
rendering of the reference's first-writer-wins arbitration
(provider/DeduplicationProvider.kt:67-94) at CONTENT granularity
instead of key granularity.

Design (scale-first):

- Per microbatch: shingle → MinHash signatures (one combinable
  aggregate pass, operators/similarity.py) → LSH band keys.
- Within-batch near-dups: banded candidate self-join + signature-
  agreement verify, greedy first-wins by id (a doc loses if it
  matches any smaller-id doc) — one pass, no iterative closure in
  the hot path.
- Cross-batch: candidates against the LEDGER by band equi-join.
  The ledger stores (id, signature, band keys) — num_hashes longs
  plus 16 precomputed band buckets per accepted doc, NEVER text or
  shingles, so ledger size is O(accepted docs), its join ships
  fixed-width rows, the stored keys make the candidate join a pure
  read (no per-batch rehash of the whole history), and the banding
  scheme is the SAME expression within-batch joins use
  (operators/similarity.lsh_band_array), so the two sides cannot
  drift.
- Verification is signature agreement (fraction of equal minhash
  components — the unbiased Jaccard estimator). Exact-Jaccard
  verification would require storing shingle sets in the ledger
  (unbounded width); the estimator keeps the ledger fixed-width and
  its error is the standard MinHash bound at num_hashes components.
- Survivors' signatures land in a batch-id-versioned ledger directory
  (``ledger_dir/batch=N``, overwrite semantics) and verdicts in
  ``out_dir/batch=N`` — the same idempotent-sink discipline as
  streaming/sinks.py: a foreachBatch retry of epoch N overwrites its
  own partial output instead of appending duplicates, and the
  cross-batch check reads only batches < N, so retried docs can never
  band-match their own prior ledger entries.

Deterministic end to end: seeded xxhash64 signatures, greedy
arbitration by id, no randomness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators.similarity import (
    lsh_band_array,
    lsh_band_keys,
    minhash_lsh_pairs,
    minhash_signatures,
    shingles,
)

_NUM_HASHES = 64
_BANDS = 16
_ROWS = 4
_AGREE = 0.5  # signature-agreement acceptance threshold (≈ Jaccard)


def _sig_agreement(a, b):
    """Fraction of equal minhash components — E[agreement] = Jaccard."""
    return (
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y),
                        lambda v: v))
        / F.lit(float(_NUM_HASHES)))


def _earlier_ledger_paths(ledger_dir: str, batch_id: int) -> list[str]:
    """Batch-versioned ledger directories strictly BEFORE ``batch_id``
    — a retried epoch must not see its own prior (possibly partial)
    ledger write, or every retried doc would match itself at signature
    agreement 1.0 and flip to DUPLICATE."""
    if not os.path.isdir(ledger_dir):
        return []
    out = []
    for name in os.listdir(ledger_dir):
        if name.startswith("batch="):
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if bid < batch_id:
                out.append(os.path.join(ledger_dir, name))
    return sorted(out)


def process_batch(batch: DataFrame, ledger_dir: str, out_dir: str,
                  shingle_n: int = 3, batch_id: int = 0) -> None:
    """Arbitrate one microbatch of (doc_id, text) against the ledger,
    write verdicts to ``out_dir/batch=<batch_id>`` and survivors'
    signatures to ``ledger_dir/batch=<batch_id>`` (both overwrite —
    idempotent under epoch retry). Pure batch logic — callable from
    foreachBatch (pass the epoch id as ``batch_id``) or directly in
    incremental-batch pipelines with a caller-managed version number."""
    spark = batch.sparkSession
    sh = shingles(batch, "doc_id", "text", n=shingle_n)
    # every downstream branch (LSH self-join sides, band keys, both
    # verify joins, verdicts, survivors) re-derives sig — persist the
    # most expensive stage (tokenize + 64 MIN aggregates) once per
    # microbatch and release it after both writes
    sig = minhash_signatures(sh, num_hashes=_NUM_HASHES).persist()
    try:
        # -- within-batch: candidates, verify, greedy first-wins by id
        pairs = minhash_lsh_pairs(sig, bands=_BANDS, rows=_ROWS,
                                  num_hashes=_NUM_HASHES)
        sa = sig.select(F.col("id").alias("id_a"),
                        F.col("sig").alias("_sa"))
        sb = sig.select(F.col("id").alias("id_b"),
                        F.col("sig").alias("_sb"))
        intra_losers = (pairs.join(sa, "id_a").join(sb, "id_b")
                        .where(_sig_agreement(F.col("_sa"), F.col("_sb"))
                               >= _AGREE)
                        .select(F.greatest("id_a", "id_b").alias("id"))
                        .distinct())

        # -- cross-batch: band collision against EARLIER batches'
        # ledger, on the band keys STORED at accept time (immutable —
        # recomputing them over the whole history every batch would be
        # O(total history) redundant hashing per microbatch)
        bk = lsh_band_keys(sig, bands=_BANDS, rows=_ROWS)
        cross_losers = None
        earlier = _earlier_ledger_paths(ledger_dir, batch_id)
        if earlier:
            ledger = spark.read.parquet(*earlier)
            if "bks" not in ledger.columns:
                # pre-r5 ledger format stored (id, sig) without the
                # accept-time band keys; recompute them so caller-
                # managed incremental pipelines pointed at an old
                # ledger_dir keep working (one-time O(history) cost —
                # rewrite the ledger in the new format to stop paying)
                ledger = ledger.select(
                    "id", "sig",
                    lsh_band_array(_BANDS, _ROWS).alias("bks"))
            lbk = (ledger.select(F.col("id").alias("_lid"),
                                 F.explode("bks").alias("bb"))
                         .select("_lid", "bb.band", "bb.bucket"))
            cand = (bk.join(lbk, ["band", "bucket"])
                      .select("id", "_lid").distinct())
            lsig = ledger.select(F.col("id").alias("_lid"),
                                 F.col("sig").alias("_ls"))
            cross_losers = (cand.join(sig, "id").join(lsig, "_lid")
                            .where(_sig_agreement(F.col("sig"),
                                                  F.col("_ls"))
                                   >= _AGREE)
                            .select("id").distinct())

        losers = (intra_losers.unionByName(cross_losers).distinct()
                  if cross_losers is not None else intra_losers)

        # verdicts are TOTAL over the batch's doc_ids: a doc shorter
        # than the shingle width has no signature (explode drops it)
        # and can never near-dup by this metric — it must still get an
        # explicit SUCCESS row, not silently vanish from the table
        all_ids = batch.select(F.col("doc_id").alias("id")).distinct()
        verdicts = (all_ids.join(losers.withColumn("_dup", F.lit(True)),
                                 "id", "left")
                    .select(F.col("id").alias("doc_id"),
                            F.when(F.col("_dup").isNotNull(),
                                   F.lit("DUPLICATE"))
                             .otherwise(F.lit("SUCCESS"))
                             .alias("verdict")))
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

        survivors = (sig.join(losers, "id", "left_anti")
                       .select("id", "sig",
                               lsh_band_array(_BANDS, _ROWS)
                               .alias("bks")))
        survivors.write.mode("overwrite").parquet(
            os.path.join(ledger_dir, f"batch={batch_id}"))
    finally:
        sig.unpersist()


def stream_minhash_neardup(spark: SparkSession, docs_glob: str,
                           ledger_dir: str, out_dir: str,
                           checkpoint_dir: str,
                           max_files_per_trigger: int | None = None,
                           shingle_n: int = 3) -> DataFrame:
    """Run the streaming near-dup arbiter over a parquet file stream of
    documents until drained (availableNow); returns the verdict table.

    ``max_files_per_trigger=1`` replays a multi-file corpus as
    successive microbatches — each file's docs arbitrate against every
    earlier file's survivors through the ledger."""
    schema = spark.read.parquet(docs_glob).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(docs_glob).select("doc_id", "text")
    # NOT partition-sized like run_stream_to_df: process_batch has no
    # stateful operators (its state is the parquet ledger), so there is
    # no per-partition state-store tax to cut — measured A/B at the
    # gate SF, 8 vs 200 shuffle partitions is wall-identical (~4.2 s
    # warm either way; the time is shingle/minhash compute plus fixed
    # per-join planning, not task scheduling).
    q = (stream.writeStream
         .foreachBatch(lambda b, bid: process_batch(
             b, ledger_dir, out_dir, shingle_n=shingle_n, batch_id=bid))
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # drop the discovered batch=N partition column: verdict schema is
    # (doc_id, verdict) regardless of how ingestion was batched
    return spark.read.parquet(out_dir).select("doc_id", "verdict")
