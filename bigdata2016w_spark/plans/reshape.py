"""Pivot / exact percentiles / SQL-proper query variants.

- pivot: reshape ops the reference never had; oracle via portable
  conditional aggregation (FILTER), with pivot values pinned so the
  output schema is deterministic;
- exact percentile (Spark ``percentile`` == SQL ``percentile_cont``
  linear interpolation), rounded against libm/fma differences;
- q6_tpch_proper: SURVEY §7.1 requires both reference-parity semantics
  (prefix-equality date filter — q6_lineitem_agg) and the SQL-proper
  variant (``l_shipdate <= date``, real TPC-H Q1) where they differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

STATUSES = ("F", "O", "P")
Q6_PROPER_CUTOFF = "1998-09-02"
_DEC = "decimal(18,2)"


def orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted to one column per order status."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(STATUSES))
        .count()
        .na.fill(0, list(STATUSES))
    )
    return out.select(
        "o_orderpriority",
        *[F.col(s).alias(f"n_{s}") for s in STATUSES],
    )


def totalprice_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of o_totalprice per status (linear interpolation —
    identical definition to percentile_cont)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.count("*").alias("n"),
        )
    )


def q6_tpch_proper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 with the standard ``l_shipdate <= date`` predicate (the
    reference's prefix-equality filter is the parity variant,
    Q6.scala:43-52; this is the SQL-proper one)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit(Q6_PROPER_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PIVOT_SQL = f"""
SELECT o_orderpriority,
       {', '.join(
           f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s}"
           for s in STATUSES)}
FROM orders GROUP BY o_orderpriority
"""

_PCT_SQL = """
SELECT o_orderstatus,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
         AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4)
         AS p90,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""

_Q6P_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q6_PROPER_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the three money columns to (measure, value) rows —
    summed per measure so the oracle stays compact and exact."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_orderkey"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        melted.groupBy("measure")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("total"),
            F.count("*").alias("n"),
        )
    )


_UNPIVOT_SQL = """
SELECT measure, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       count(*) AS n
FROM (
  SELECT l_orderkey, 'l_extendedprice' AS measure, l_extendedprice AS value
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_tax', l_tax FROM lineitem
)
GROUP BY measure
"""

register(QuerySpec("orders_pivot", orders_pivot, _PIVOT_SQL,
                   doc=orders_pivot.__doc__))
register(QuerySpec("lineitem_unpivot", lineitem_unpivot, _UNPIVOT_SQL,
                   doc=lineitem_unpivot.__doc__))
register(QuerySpec("totalprice_percentiles", totalprice_percentiles, _PCT_SQL,
                   doc=totalprice_percentiles.__doc__))
register(QuerySpec("q6_tpch_proper", q6_tpch_proper, _Q6P_SQL,
                   doc=q6_tpch_proper.__doc__))
