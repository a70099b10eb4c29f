"""Registered upsert / SCD2 queries. Update batches are derived
deterministically from orders (modulo-selected keys, decimal price bump),
so the merge results are oracle-checkable with plain SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.upsert import scd2_apply, scd2_init, upsert
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

_DEC = "decimal(18,2)"


def _orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )


def _updates(snapshot: DataFrame, mod: int) -> DataFrame:
    return snapshot.where(F.col("o_orderkey") % mod == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") * F.lit(2)).cast(_DEC).alias("price"),
    )


def orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins merge of a derived updates batch (every 10th key,
    doubled price, status 'U') into the orders snapshot — the keyed-upsert
    capability SURVEY §2.1 maps the HBase sink to."""
    snap = _orders_snapshot(spark, sf_dir)
    merged = upsert(snap, _updates(snap, 10), "o_orderkey")
    return merged.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


def orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two SCD2 batches (v1: every 10th key, v2: every 20th) over the
    orders snapshot; full history with validity range + current flag."""
    snap = _orders_snapshot(spark, sf_dir)
    hist = scd2_init(snap, version=0)
    hist = scd2_apply(hist, _updates(snap, 10), "o_orderkey", version=1)
    v2 = _updates(snap, 20).withColumn(
        "price", (F.col("price") * F.lit(2)).cast(_DEC)
    )
    hist = scd2_apply(hist, v2, "o_orderkey", version=2)
    return hist.select(
        "o_orderkey", "o_orderstatus",
        F.col("price").cast("double").alias("price"),
        "valid_from", "valid_to", "is_current",
    )


_UPSERT_SQL = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
upd AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(price * 2 AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price FROM (
  SELECT * FROM snap WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL
  SELECT * FROM upd
)
"""

_SCD2_SQL = """
WITH snap AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
u1 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(price * 2 AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 10 = 0
),
u2 AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
         CAST(CAST(price * 2 AS DECIMAL(18,2)) * 2
              AS DECIMAL(18,2)) AS price
  FROM snap WHERE o_orderkey % 20 = 0
)
SELECT o_orderkey, o_orderstatus, CAST(price AS DOUBLE) AS price,
       valid_from, valid_to, is_current
FROM (
  -- v0 rows closed at v1 (keys updated in batch 1)
  SELECT o_orderkey, o_orderstatus, price, CAST(0 AS BIGINT) AS valid_from,
         CAST(1 AS BIGINT) AS valid_to, FALSE AS is_current
  FROM snap WHERE o_orderkey % 10 = 0
  UNION ALL
  -- v0 rows never updated
  SELECT o_orderkey, o_orderstatus, price, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), TRUE
  FROM snap WHERE o_orderkey % 10 <> 0
  UNION ALL
  -- v1 rows closed at v2 (keys updated again in batch 2)
  SELECT o_orderkey, o_orderstatus, price, CAST(1 AS BIGINT), CAST(2 AS BIGINT), FALSE
  FROM u1 WHERE o_orderkey % 20 = 0
  UNION ALL
  -- v1 rows still current (updated once, not twice)
  SELECT o_orderkey, o_orderstatus, price, CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
  FROM u1 WHERE o_orderkey % 20 <> 0
  UNION ALL
  -- v2 rows (current)
  SELECT o_orderkey, o_orderstatus, price, CAST(2 AS BIGINT), CAST(NULL AS BIGINT), TRUE FROM u2
)
"""

register(QuerySpec("orders_upsert", orders_upsert, _UPSERT_SQL,
                   doc=orders_upsert.__doc__))
register(QuerySpec("orders_scd2", orders_scd2, _SCD2_SQL,
                   doc=orders_scd2.__doc__))
