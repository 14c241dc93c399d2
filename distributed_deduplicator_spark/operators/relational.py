"""Relational helper operators (SURVEY.md §2.2 joins/agg/window rows).

Most relational capability is the DataFrame API itself — these helpers
exist where a composition encodes a policy worth standardizing:
broadcast discipline for dimension joins, deterministic top-k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner",
             broadcast_dim: bool = True) -> DataFrame:
    """Fact⋈dimension join. Dimensions (region/nation/supplier/part at
    any SF, and anything < the broadcast threshold at 100 TB) ship to
    every executor — no shuffle of the fact table. AQE will also convert
    shuffle joins to broadcast at runtime, but declaring intent is free
    and survives stats being missing."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def topk_per_group(df: DataFrame, keys: Sequence[str],
                   order_by: Sequence[Column | str], k: int,
                   dense: bool = False) -> DataFrame:
    """Deterministic top-k rows per key group (needs a total order in
    ``order_by``). One shuffle + per-partition sort; no global sort."""
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ocols)
    fn = F.dense_rank() if dense else F.row_number()
    return (df.withColumn("_rk", fn.over(w))
              .where(F.col("_rk") <= k).drop("_rk"))


def topk_global(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heap + driver merge of k rows, never a full sort."""
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return df.orderBy(*ocols).limit(k)


def salted_join(big: DataFrame, small: DataFrame, on: str,
                how: str = "inner", n_salt: int = 16,
                big_row_salt: Column | None = None) -> DataFrame:
    """Skew-resistant equi-join: salt the big side into ``n_salt``
    sub-keys and replicate the small side once per salt, so one hot key
    spreads over ``n_salt`` reducers instead of melting one.

    Use when a key's row count exceeds what one task should hold and
    the small side is too big to broadcast outright (else just
    broadcast). AQE's skew-join split handles sort-merge skew
    post-hoc; explicit salting is the declarative form that also works
    for aggregations layered on the join output.

    ``big_row_salt`` defaults to a deterministic per-row hash over all
    of the big side's columns (uniform, reproducible — never rand()).

    Only join types that never emit unmatched SMALL-side rows are
    supported: the small side is replicated once per salt, so a
    right/full outer join would emit each unmatched small row
    ``n_salt`` times.
    """
    supported = {"inner", "left", "leftouter", "left_outer",
                 "left_semi", "leftsemi", "left_anti", "leftanti",
                 "semi", "anti", "cross"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side "
            f"is replicated {n_salt}× so unmatched small rows would be "
            f"duplicated; supported: inner/left/semi/anti")
    salt = (big_row_salt if big_row_salt is not None
            else F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                        F.lit(n_salt)))
    b = big.withColumn("_salt", salt.cast("int"))
    s = (small.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))))
    out = b.join(s, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def merge_agg_states(base: DataFrame, delta: DataFrame,
                     keys: Sequence[str],
                     state_cols: Sequence[str],
                     merges: "dict[str, str] | None" = None) -> DataFrame:
    """Merge two partial-aggregate state tables into one — the
    incremental-view-maintenance primitive: ``merge(agg(A), agg(B)) ==
    agg(A ∪ B)`` for mergeable state columns.

    Per-column merge semantics come from ``merges`` (column →
    ``'sum' | 'min' | 'max'``); columns not listed default to null-safe
    addition, which is correct for counts and exact decimal sums ONLY —
    a min/max state column merged by the default would be silently
    summed, so pass its strategy explicitly.

    At 100 TB this is THE rollup maintenance path: a nightly base state
    plus a small delta state merge in time proportional to |keys|, not
    |raw events| — a full recompute rescans the entire history. The
    merge is a full outer join on the group keys; with DECIMAL sums and
    integer counts the merged state is BIT-IDENTICAL to the full
    recompute (decimal addition is exact and associative; a double sum
    would drift by association order). min/max merge via least/greatest,
    which skip NULLs — the absent-side identity, same as additive 0.
    """
    from pyspark.sql import functions as F
    merges = merges or {}
    unknown = {c: m for c, m in merges.items()
               if m not in ("sum", "min", "max")}
    if unknown:
        raise ValueError(f"unsupported merge strategies: {unknown}")
    if extra := set(merges) - set(state_cols):
        raise ValueError(f"merges for non-state columns: {sorted(extra)}")
    b = base.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in state_cols])
    d = delta.select(*keys, *[F.col(c).alias(f"_d_{c}") for c in state_cols])
    joined = b.join(d, list(keys), "full_outer")

    def merge_one(c):
        bc, dc = F.col(f"_b_{c}"), F.col(f"_d_{c}")
        strat = merges.get(c, "sum")
        if strat == "min":
            return F.least(bc, dc)
        if strat == "max":
            return F.greatest(bc, dc)
        # additive identity only when SOME side exists: a group whose
        # state is NULL on both sides must merge to NULL (the full
        # recompute's SUM over all-NULL values), not 0
        return F.when(bc.isNull() & dc.isNull(), F.lit(None)) \
                .otherwise(F.coalesce(bc, F.lit(0))
                           + F.coalesce(dc, F.lit(0)))

    return joined.select(*keys, *[merge_one(c).alias(c)
                                  for c in state_cols])


def table_diff(a: DataFrame, b: DataFrame, keys: Sequence[str],
               compare_cols: Sequence[str]) -> DataFrame:
    """Keyed reconciliation of two table versions: rows missing from
    either side or whose compared columns changed — the migration /
    replication / backfill audit primitive.

    Scale shape: each side is pre-projected to (keys, xxhash64 of the
    compared columns) so the full outer join shuffles FIXED-WIDTH rows
    — never payloads — and the output is keys + status only. Equal
    rows (the overwhelming majority in a healthy replica) are filtered
    out before anything wide happens. Hash equality on differing rows
    is a 2^-64 xxhash64 collision — the standard reconciliation
    tradeoff; rerun on the flagged keys with direct comparison when a
    court-grade answer is needed.

    NULL handling: xxhash64 passes its seed through unchanged for NULL
    inputs, so hashing the raw columns alone would make rows that
    differ only in WHICH same-typed column is NULL (``(x, NULL)`` vs
    ``(NULL, x)``) collide deterministically — a guaranteed miss, not
    a 2^-64 one. Appending a per-column null-flag disambiguates: the
    flags pin which positions were skipped, so equal hashes again
    require an identical null pattern AND equal non-null values.
    """
    from pyspark.sql import functions as F

    def row_hash(cols):
        return F.xxhash64(*[F.col(c) for c in cols],
                          *[F.col(c).isNull() for c in cols])

    ha = a.select(*keys, row_hash(compare_cols).alias("_ha"))
    hb = b.select(*keys, row_hash(compare_cols).alias("_hb"))
    j = ha.join(hb, list(keys), "full_outer")
    status = (F.when(F.col("_hb").isNull(), F.lit("missing_in_b"))
               .when(F.col("_ha").isNull(), F.lit("missing_in_a"))
               .when(F.col("_ha") != F.col("_hb"), F.lit("changed")))
    return (j.withColumn("diff_status", status)
             .where(F.col("diff_status").isNotNull())
             .select(*keys, "diff_status"))


def count_table_quantiles(df: DataFrame, keys: Sequence[str],
                          value_col: str,
                          pcts: Sequence[int]) -> DataFrame:
    """EXACT per-group percentile_disc over a small-cardinality integer
    measure, computed WITHOUT sorting the rows: a per-(group, value)
    count table (combinable, tiny at any corpus size), a cumulative
    window over that aggregate, and for each percentile p the smallest
    value whose cumulative count reaches ceil(p·n/100) — the threshold
    as exact integer arithmetic ((n·p + 99) div 100), so there is no
    float percentile-position wobble for a cross-engine oracle to
    disagree on.

    This is the 100 TB quantile pattern for lengths, scores, bucketed
    measures — anything with far fewer distinct values than rows.
    Returns keys + n_rows + one ``p{p}`` BIGINT column per requested
    percentile. Property-tested against sorted-list percentile_disc in
    tests/test_property_dedup.py.

    NULL measures are excluded up front (matching percentile_disc,
    which ignores NULLs): counting them into n_rows and the thresholds
    while min(when(...)) skips their values would silently shift every
    returned percentile. n_rows is therefore the NON-NULL row count.
    """
    from pyspark.sql import Window
    cnt = (df.where(F.col(value_col).isNotNull())
             .groupBy(*keys, value_col).agg(F.count("*").alias("_c")))
    w_cum = (Window.partitionBy(*keys).orderBy(value_col)
                   .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.partitionBy(*keys)
                   .rowsBetween(Window.unboundedPreceding,
                                Window.unboundedFollowing))
    cum = cnt.select(*keys, value_col,
                     F.sum("_c").over(w_cum).alias("_cum"),
                     F.sum("_c").over(w_all).alias("_tot"))
    aggs = [F.max("_tot").cast("bigint").alias("n_rows")]
    for p in pcts:
        thresh = F.expr(f"(_tot * {int(p)} + 99) DIV 100")
        aggs.append(F.min(F.when(F.col("_cum") >= thresh,
                                 F.col(value_col)))
                     .cast("bigint").alias(f"p{int(p)}"))
    return cum.groupBy(*keys).agg(*aggs)


def basket_pairs(df: DataFrame, basket_col: str,
                 item_col: str, assume_distinct: bool = False) -> DataFrame:
    """Distinct co-occurring item pairs within each basket, counted
    across baskets — the market-basket / co-citation primitive.

    The pair generation is a self-equi-join WITHIN the basket key, so
    the work is Σ|basket|² — bounded by basket size, never
    corpus-quadratic — and the pair count is map-side combinable.
    Returns (item_a, item_b, n_both) with item_a < item_b. Pass
    ``assume_distinct=True`` when (basket, item) rows are already
    deduplicated to skip the internal distinct (and let the caller's
    exchange be reused). NULL contract: rows with a NULL basket or
    item id never pair (the equi-join and the ``<`` filter both
    propagate NULL) — pre-coalesce if NULLs must participate.
    Property-tested against itertools.combinations in
    tests/test_property_dedup.py.
    """
    li = df.select(F.col(basket_col).alias("_b"),
                   F.col(item_col).alias("_i"))
    if not assume_distinct:
        li = li.distinct()
    a = li.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = li.select(F.col("_b"), F.col("_i").alias("item_b"))
    return (a.join(b, "_b")
             .where(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count("*").alias("n_both")))


def tv_drift_profile(counts: DataFrame, group_col: str,
                     bucket_col: str, count_col: str) -> DataFrame:
    """Per-group total-variation distance between each group's bucket
    histogram and the whole-corpus one, on EXACT integer moments — the
    drift monitor behind `value_drift_by_day` (groups = days) and
    `source_token_drift` (groups = ingest sources), factored once so
    the formula cannot diverge between them.

    Grid-free: the Σ runs only over buckets the group actually has,
    on |n_gb·N − n_glob·N_g| BIGINT cross-products, with the
    1 − Σ p_glob remainder covering absent buckets — proved equal to
    the textbook full-grid 0.5·Σ|p_g − p_glob| in
    tests/test_corpus_analysis_ops.py. One fixed-order double
    expression at the end keeps the cross-engine value hash. (BIGINT
    products cap at ~3e9 rows/group × 3e9 total; past that, scale the
    histogram to per-group doubles and round.)

    Expects the pre-aggregated (group, bucket, count) table — persist
    it in the caller if other consumers share it. Returns
    (group, n_group, n_buckets, tv_drift); margins are re-aggregations
    of the tiny input, totals a 1-row broadcast.
    """
    g, b, n = group_col, bucket_col, count_col
    gb = counts.groupBy(b).agg(F.sum(n).alias("_n_gb"))
    ng = counts.groupBy(g).agg(F.sum(n).alias("n_group"))
    tot = gb.agg(F.sum("_n_gb").alias("_n_total"))
    j = (counts.join(F.broadcast(gb), b)
               .join(F.broadcast(ng), g)
               .crossJoin(F.broadcast(tot)))
    per = (j.groupBy(g, "n_group", "_n_total")
            .agg(F.sum(F.abs(F.col(n) * F.col("_n_total")
                             - F.col("_n_gb") * F.col("n_group")))
                  .alias("_s_abs"),
                 F.sum("_n_gb").alias("_t_glob"),
                 F.count("*").alias("n_buckets")))
    tv = (F.lit(0.5)
          * (F.col("_s_abs").cast("double")
             / (F.col("n_group") * F.col("_n_total")).cast("double")
             + F.lit(1.0)
             - F.col("_t_glob").cast("double")
             / F.col("_n_total").cast("double")))
    return per.select(g, "n_group", "n_buckets", tv.alias("tv_drift"))
