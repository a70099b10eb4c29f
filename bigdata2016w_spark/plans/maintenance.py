"""Table-maintenance queries: ANALYZE-style column statistics.

Registered from a module appended last in the registry (after
plans.traversal) so the round driver's position-sensitive 50-query
correctness window is not displaced — see registry._SPEC_MODULES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

_STAT_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"]


def orders_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE equivalent: per-column row/null/exact-distinct
    counts in ONE scan — a single aggregate computes every column's
    stats, then an in-plan stack pivots them to rows. The numbers the
    cost-based optimizer (and any data-quality monitor) needs; at scale
    swap exact count(distinct) for approx_count_distinct per column."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _STAT_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _STAT_COLS
    )
    return wide.selectExpr(
        f"stack({len(_STAT_COLS)}, {stack}) AS (column, n_nulls, n_distinct)",
        "n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


_STATS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", (SELECT count(*) FROM orders) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct
FROM orders"""
    for c in _STAT_COLS
)

register(QuerySpec("orders_column_stats", orders_column_stats, _STATS_SQL,
                   doc=orders_column_stats.__doc__))
