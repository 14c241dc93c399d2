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
