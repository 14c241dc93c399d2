"""Streaming guarded execution with a compensating ledger sink.

The streaming twin of operators/guarded.py (reference R10/R11,
provider/DeduplicationProvider.kt:96-114): winning attempts flow out of
the streaming dedup; the user's block runs per row inside foreachBatch;
block failure is *compensated as data* — a FAILED ledger row — never an
exception that kills the stream. The ledger is an append-only parquet
audit log, the engine-side analog of the reference's per-key attempt
log with SUCCESS→FAILED rewrites.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_guarded_stream_ledger(winners: DataFrame, spark: SparkSession,
                              block: Callable[[dict], str],
                              ledger_dir: str | None = None) -> DataFrame:
    """Drain a streaming DF of winning attempts through foreachBatch,
    apply ``block`` per row, and append (row, verdict, result, error)
    to a parquet ledger; returns the materialized ledger.

    The per-batch body is itself a Spark job (mapInPandas would do for
    heavy blocks; rows here are winner-only and block is user logic) —
    foreachBatch is where streaming hands a consistent microbatch to
    batch code, the idiomatic place for exactly-once side effects with
    checkpoint-tracked batch ids.
    """
    out_dir = ledger_dir or (tempfile.mkdtemp(prefix="ledger_")
                             + f"/{uuid.uuid4().hex[:8]}")

    from pyspark.sql import types as T
    import pandas as pd  # noqa: F401 — imported for the Arrow batch loop
    out_schema = T.StructType(
        list(winners.schema.fields)
        + [T.StructField("verdict", T.StringType(), False),
           T.StructField("result", T.StringType(), True),
           T.StructField("error", T.StringType(), True),
           T.StructField("batch_id", T.LongType(), False)])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        def run(pdfs):
            for pdf in pdfs:
                verdicts, results, errors = [], [], []
                for d in pdf.to_dict("records"):
                    try:
                        results.append(block(d))
                        verdicts.append("SUCCESS")
                        errors.append(None)
                    except Exception as exc:  # noqa: BLE001 user boundary
                        results.append(None)
                        verdicts.append("FAILED")
                        errors.append(f"{type(exc).__name__}: {exc}")
                yield pdf.assign(verdict=verdicts, result=results,
                                 error=errors, batch_id=batch_id)

        # block runs executor-side in Arrow batches — the microbatch is
        # batch code, so the ledger write is an ordinary distributed
        # parquet write (no driver collect). Batch-id-versioned
        # OVERWRITE, not a flat append: an epoch retry after a partial
        # failure rewrites its own directory instead of appending
        # duplicate ledger rows (the idempotent-sink discipline of
        # streaming/sinks.py and neardup_stream.py)
        batch_df.mapInPandas(run, out_schema) \
                .write.mode("overwrite").parquet(
                    os.path.join(out_dir, f"batch={batch_id}"))

    with tempfile.TemporaryDirectory() as ckpt:
        q = (winners.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    # drop the discovered batch=N partition column — the ledger schema
    # carries batch_id explicitly
    return spark.read.parquet(out_dir).drop("batch")
