"""Registered temporal-join queries. The DuckDB oracle uses its *native*
ASOF JOIN — so the engine's union-and-carry composition is checked against
an independent implementation of the same semantics, not a mirror of
itself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata2016w_spark.operators.temporal import as_of_join, range_pair_join
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table
from bigdata2016w_spark.streaming.windows import attribution_join

_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
CLOSE_GAP_S = 600
ATTRIB_HORIZON_MIN = 30


def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the user's most recent view at-or-before
    it (classic as-of enrichment)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        ev.where(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    joined = as_of_join(purchases, views, key="user_id",
                        right_payload=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.date_format("right_ts", _FMT).alias("view_ts"),
        F.col("right_value").alias("view_value"),
    )


def events_close_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range self-join: pairs of error events by the same user within 10
    minutes of each other (bucketized — stays an equi-join)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    )
    return range_pair_join(ev, "user_id", "ts", "event_id", CLOSE_GAP_S)


def view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (``streaming/windows.py attribution_join``): (view, purchase) pairs
    for the same user with the purchase within 30 minutes after the view.
    The batch plan is a user_id equi-join with the time range as a
    post-join filter — per-user event counts bound the pair fan-out, so
    the shuffle keys stay balanced at scale."""
    ev = load_table(spark, sf_dir, "events")
    return attribution_join(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        ATTRIB_HORIZON_MIN,
    )


_ASOF_SQL = """
WITH views AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'view'
  ) WHERE rn = 1
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value AS purchase_value,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       v.value AS view_value
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""

_CLOSE_SQL = f"""
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       (epoch_us(b.ts) - epoch_us(a.ts)) / 1e6 AS gap_seconds
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type = 'error') b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {CLOSE_GAP_S} * 1000000
"""

_ATTRIB_SQL = f"""
SELECT p.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       (epoch_us(p.ts) - epoch_us(v.ts)) / 1e6 AS gap_seconds,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL {ATTRIB_HORIZON_MIN} MINUTES
"""

register(QuerySpec("view_purchase_attribution", view_purchase_attribution,
                   _ATTRIB_SQL, doc=view_purchase_attribution.__doc__))
register(QuerySpec("asof_purchase_view", asof_purchase_view, _ASOF_SQL,
                   doc=asof_purchase_view.__doc__))
register(QuerySpec("events_close_pairs", events_close_pairs, _CLOSE_SQL,
                   doc=events_close_pairs.__doc__))
