"""Event-table analytics: JSON props, tumbling/sliding windows, session
windows — batch twins of the streaming extension (SURVEY §2.11; the
reference's only time bucketing is Q5's ``date.substring(0,7)`` month key,
``SCALA/assignment5/Q5.scala:86-91``).

Each registered query has an exact DuckDB oracle: window starts are
epoch-aligned arithmetic, money-ish sums run in DECIMAL(18,6), and
sessionization is gap-based with a deterministic (ts, event_id) ordering.
The true ``readStream`` versions of the same aggregations live in
``bigdata2016w_spark/streaming/windows.py``; batch/stream parity is tested
in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30
_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_DEC6 = "decimal(18,6)"


def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: count + sum of the JSON ``props.k`` field
    (``get_json_object`` — the engine's from_json surface; FIXTURES §B)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("sum_k"))
    )


def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact value sum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC6)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, slide 30 min): global event counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"), "n_events"
        )
    )


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap via
    ``session_window`` — the batch twin of stateful streaming
    sessionization. Oracle: gaps-and-islands SQL (lag + running sum), which
    is the same merge rule."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC6)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT + ".SSSSSS").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


_JSON_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k
FROM events GROUP BY event_type
"""

_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""

_SLIDING_SQL = """
SELECT strftime(
         make_timestamp(CAST((floor((epoch_us(ts)/1000000 - k*1800)/3600)*3600
                              + k*1800) AS BIGINT) * 1000000),
         '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events
FROM events, unnest([0, 1]) AS p(k)
GROUP BY 1
"""

_SESSIONS_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
tagged AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM tagged GROUP BY user_id, session_id
"""

register(QuerySpec("events_json_agg", events_json_agg, _JSON_SQL,
                   doc=events_json_agg.__doc__))
register(QuerySpec("events_tumbling_hour", events_tumbling_hour, _TUMBLING_SQL,
                   doc=events_tumbling_hour.__doc__))
register(QuerySpec("events_sliding", events_sliding, _SLIDING_SQL,
                   doc=events_sliding.__doc__))
register(QuerySpec("events_sessions", events_sessions, _SESSIONS_SQL,
                   doc=events_sessions.__doc__))
