"""Two-stage per-group top-k — the grouped analogue of
TakeOrderedAndProject.

A single ``row_number() OVER (PARTITION BY group ORDER BY ...)`` sends
EVERY candidate row of a group to one task — for kNN that is the whole
corpus per query, the same single-partition funnel class as a global
window (the reference's equivalent was a driver-side PriorityQueue,
``JAVA/assignment4/ExtractTopPersonalizedPageRankNodes.java:44-127``,
which is worse). Here stage 1 takes a top-k per (group, input partition)
— an even hash layout, k·P survivors per group — and stage 2 ranks only
those survivors. Selection is identical for any deterministic total
order (top-k of per-partition top-k's IS the global top-k), so oracle
results are unchanged; only the plan shape differs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group under a deterministic total order.

    ``order_cols`` must be a tiebreak-complete ordering (e.g. desc(score),
    asc(id)) or stage-1 pruning could drop a row the global rank keeps.
    """
    w_local = Window.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    w_global = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn_local", F.row_number().over(w_local))
        .where(F.col("__rn_local") <= k)
        .withColumn("__rn", F.row_number().over(w_global))
        .where(F.col("__rn") <= k)
        .drop("__pid", "__rn_local", "__rn")
    )
