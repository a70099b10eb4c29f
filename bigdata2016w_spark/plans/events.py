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
    """Tumbling 1-hour windows per event_type: count + exact value sum.
    NULL-ts rows are filtered explicitly on BOTH engines — F.window drops
    them silently while the oracle's date_trunc would keep a NULL group
    (the divergence class fixed for trending/hourly in round 3)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
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
    """Sliding windows (1 hour, slide 30 min): global event counts.
    NULL-ts rows filtered explicitly on both engines (see tumbling)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
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
    is the same merge rule. NULL-ts rows filtered explicitly on both
    engines (session_window drops them; the lag-islands oracle would
    order them into a session)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
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
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""

_SLIDING_SQL = """
SELECT strftime(
         make_timestamp(CAST((floor((epoch_us(ts)/1000000 - k*1800)/3600)*3600
                              + k*1800) AS BIGINT) * 1000000),
         '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events
FROM events, unnest([0, 1]) AS p(k)
WHERE ts IS NOT NULL
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
  FROM events WHERE ts IS NOT NULL
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


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users counted
    at stage N only if their earliest stage-N event happens strictly
    after their earliest qualifying stage-(N−1) event. Pure
    per-user-keyed min-aggregates and equi-joins — no windows, no
    cross-stage shuffle beyond the user key — so the funnel holds its
    shape at any event volume (the classic product-analytics query a
    pipeline engine must serve)."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame | None) -> DataFrame:
        stage = ev.where(F.col("event_type") == event_type)
        if prev is not None:
            stage = stage.join(prev, "user_id").where(
                F.col("ts") > F.col("t_prev")
            )
        return stage.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    views = first_after("view", None)
    clicks = first_after("click", views)
    purchases = first_after("purchase", clicks)
    counts = [
        df.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("stage"),
            F.lit(name).alias("event_type"),
            "n_users",
        )
        for i, (name, df) in enumerate(
            [("view", views), ("click", clicks), ("purchase", purchases)]
        )
    ]
    return counts[0].union(counts[1]).union(counts[2])


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity date,
    counted on each later active day as (cohort_date, day_offset,
    n_users). Two user-keyed aggregates + one join — the standard
    retention triangle, scale-safe because nothing is windowed over the
    raw event stream."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        days.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_prev FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_prev
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_prev
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_prev
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_prev
  GROUP BY e.user_id
)
SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM v
UNION ALL
SELECT 2, 'click', count(*) FROM c
UNION ALL
SELECT 3, 'purchase', count(*) FROM p
"""

_RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
first AS (
  SELECT user_id, min(d) AS cohort FROM days GROUP BY user_id
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_date,
       CAST(date_diff('day', cohort, d) AS INTEGER) AS day_offset,
       count(DISTINCT days.user_id) AS n_users
FROM days JOIN first ON days.user_id = first.user_id
GROUP BY 1, 2
"""

register(QuerySpec("events_funnel", events_funnel, _FUNNEL_SQL,
                   doc=events_funnel.__doc__))
register(QuerySpec("user_retention_cohorts", user_retention_cohorts,
                   _RETENTION_SQL, doc=user_retention_cohorts.__doc__))


def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts with missing hours filled as zero — the
    hypertable/time-series rollup shape (a dashboard needs every bucket
    present, not just buckets with data). The hour spine is generated
    in-plan from the min/max bounds (1-row agg → sequence → explode), so
    nothing is driver-side; the left join keys on the (low-cardinality)
    hour bucket after the raw stream pre-aggregates."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    spine = (
        hourly.agg(
            F.min("h").alias("lo"), F.max("h").alias("hi")
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    return spine.join(hourly, "h", "left").select(
        F.date_format("h", _TS_FMT).alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


def orders_daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts with a 7-day trailing moving average — the
    ROWS-frame window surface. The window is global but runs over the
    pre-aggregated daily table (one row per day), whose cardinality is
    bounded by the calendar, not the order volume — the aggregate-first-
    then-window pattern that keeps frame windows viable at any scale."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.count("*").alias("n_orders"))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_orders",
        F.round(F.avg(F.col("n_orders").cast("double")).over(w), 6)
        .alias("avg_7d"),
    )


_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1
),
bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(coalesce(n, 0) AS BIGINT) AS n_events
FROM spine LEFT JOIN hourly ON spine.h = hourly.h
"""

_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day, n_orders,
       round(avg(CAST(n_orders AS DOUBLE))
               OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             6) AS avg_7d
FROM daily
"""

register(QuerySpec("events_hourly_gapfill", events_hourly_gapfill,
                   _GAPFILL_SQL, doc=events_hourly_gapfill.__doc__))
register(QuerySpec("orders_daily_moving_avg", orders_daily_moving_avg,
                   _MOVING_AVG_SQL, doc=orders_daily_moving_avg.__doc__))


def events_nation_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enriched hourly rollup: events joined to the
    customer→nation dim, then tumbling 1-hour count + exact value sum per
    nation — the batch twin of the STREAM-STATIC broadcast join in
    ``streaming/windows.nation_hourly`` (parity pinned in
    tests/test_streaming.py). The dim broadcasts (it is per-customer
    metadata, small relative to the fact stream at any scale); the only
    shuffle is the (window, nation) aggregate. NULL-ts rows are filtered
    explicitly so batch, stream, and oracle agree on dirty data."""
    from pyspark.sql.functions import broadcast

    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    dim = cust.join(
        broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("nation"))
    return (
        ev.join(broadcast(dim), F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "nation")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC6)).cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "nation", "n_events", "total_value",
        )
    )


_NATION_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       n.n_name AS nation, count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE e.ts IS NOT NULL
GROUP BY 1, 2
"""

register(QuerySpec("events_nation_hourly", events_nation_hourly,
                   _NATION_HOURLY_SQL, doc=events_nation_hourly.__doc__))


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n_transitions, p) where p is the
    row-normalized next-event probability. The behavioral-model summary
    next to events_funnel's fixed path — output cardinality is
    |event_type|², independent of event volume.

    Shape: ONE lead() window partitioned by user_id (partitions bounded
    by per-user event count, never corpus-sized) ordered by the
    deterministic (ts, event_id) key, then a hash agg with map-side
    combine; the row normalizer is a second window over the ALREADY
    AGGREGATED |event_type|²-row table (a join back onto the pair agg
    would re-execute the whole corpus subplan for the totals — measured
    as a doubled plan). NULL ts / NULL user rows are excluded up front —
    their ordering (and therefore their transitions) would be
    engine-defined."""
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
    nxt = F.lead("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", nxt)
        .where(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type", "to_type", "n_transitions",
        (F.col("n_transitions").cast("double") / tot.cast("double"))
        .alias("p"),
    )


_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
pairs AS (
  SELECT event_type AS from_type, to_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY event_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
       / CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
         AS p
FROM pairs
"""

register(QuerySpec("events_transition_matrix", events_transition_matrix,
                   _TRANSITION_SQL,
                   doc=events_transition_matrix.__doc__))


EMA_ALPHA = 0.25  # dyadic -> the fold multiplies by exact binary fractions


def events_user_value_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of ``value`` over the
    (ts, event_id)-ordered event sequence: (user_id, n_events, ema) with
    ema = α·x + (1−α)·ema seeded by the user's first value — the
    recency-weighted engagement score a sequential fold expresses and a
    plain windowed average can't.

    Shape: one hash agg collects each user's (ts, event_id, value)
    structs (bounded by per-user event count), sort_array orders them,
    and F.aggregate left-folds entirely JVM-side. The fold is seeded
    with the FIRST value and runs in IEEE doubles in sequence order, so
    DuckDB's seedless list_reduce over list(value ORDER BY ts, event_id,
    value) is bit-identical — no rounding needed. Spark's struct sort is
    (ts, event_id, value), so the oracle ORDER BY carries the same final
    ``value`` tie-break: (ts, event_id) is unique in the generated data
    today, but the fold order must not silently diverge if it ever
    isn't."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    a = float(EMA_ALPHA)
    grouped = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), vals.alias("__vals")
    )
    ema = F.aggregate(
        F.slice(F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
        F.element_at("__vals", 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return grouped.select("user_id", "n_events", ema.alias("ema"))


_EMA_SQL = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       list_reduce(list(value ORDER BY ts, event_id, value),
                   (acc, x) -> {EMA_ALPHA} * x + {1.0 - EMA_ALPHA} * acc)
         AS ema
FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY user_id
"""

register(QuerySpec("events_user_value_ema", events_user_value_ema, _EMA_SQL,
                   doc=events_user_value_ema.__doc__))


def events_user_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats computed through the SALTED two-phase
    aggregation path (operators/skew.salted_aggregate): a random salt
    spreads each user's rows over 16 partial groups, a second hash agg
    merges the partials. The oracle is the PLAIN ``GROUP BY user_id`` —
    result equality is the external proof that salting is semantically
    transparent, which is the whole contract that lets an operator
    deploy it against a hot key at 100 TB without re-validating results.
    The value sum is 2^24-int64-quantized so the partial merge is
    associative and engine-portable (the repo's standard exact-sum
    trick); count merges by sum, max by max. No reference analog — the
    reference's skew answer was hand-tuned reducer counts and memory
    bumps (JAVA/assignment1/PairsPMI.java:284-288)."""
    from bigdata2016w_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    q = F.round(F.col("value") * 16777216).cast("bigint")
    out = salted_aggregate(
        ev,
        ["user_id"],
        {
            "n_events": (F.count(F.lit(1)), "sum"),
            "value_q24": (F.sum(q), "sum"),
            "max_value": (F.max("value"), "max"),
        },
    )
    return out.select(
        "user_id", "n_events", "value_q24", "max_value"
    )


_SALTED_STATS_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 16777216) AS BIGINT)) AS BIGINT)
         AS value_q24,
       max(value) AS max_value
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""

register(QuerySpec(
    "events_user_stats_salted", events_user_stats_salted,
    _SALTED_STATS_SQL, doc=events_user_stats_salted.__doc__,
))


# ------------------------------------------------------------- OLS trend

def events_hourly_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend (closed-form OLS of value on the
    hour index): slope, intercept, and r² from the five sufficient
    statistics (n, Σx, Σx², Σy, Σxy, Σy²) — regression at 100 TB is
    ONE hash aggregate, never an iterative fit.

    Determinism discipline: x is the hour offset from the global min
    hour (exact integer), y is the value in integer CENTS (the 2-
    decimal domain recovered exactly by round(value·100)), so every
    aggregate is an order-independent BIGINT sum; the slope/intercept/
    r² then evaluate as a FIXED scalar IEEE expression tree over
    exact-integer doubles (all sums < 2^53), which both engines
    compute bit-identically — aggregation order never touches a
    float. Σxy at petabyte row counts would outgrow int64; the same
    statistics then accumulate in DECIMAL(38,0) — the shape (one
    partial-agg pass) is unchanged."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hsec"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    lo = ev.agg(F.min("hsec").alias("lo"))
    xy = ev.crossJoin(F.broadcast(lo)).select(
        "event_type",
        ((F.col("hsec") - F.col("lo")) / 3600).cast("long").alias("x"),
        "cents",
    )
    s = xy.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("x") * F.col("cents")).alias("sxy"),
        F.sum(F.col("cents") * F.col("cents")).alias("syy"),
    )
    # fixed IEEE expression tree over exact-integer doubles; /100.0
    # converts cents back to value units at the result edge
    return s.selectExpr(
        "event_type",
        "n",
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6)"
        " AS slope_per_hour",
        "round((CAST(sy AS DOUBLE)"
        "  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        "     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
        "    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0, 6)"
        " AS intercept",
        "round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        "  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2",
    ).orderBy("event_type")


_OLS_EDGE = """
round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6)
 AS slope_per_hour,
round((CAST(sy AS DOUBLE)
  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 100.0, 6)
 AS intercept,
round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
"""

_OLS_SQL = f"""
WITH ev AS (
  SELECT event_type,
         epoch(date_trunc('hour', ts))::BIGINT AS hsec,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), lo AS (SELECT min(hsec) AS lo FROM ev),
xy AS (
  SELECT event_type, (hsec - lo) // 3600 AS x, cents
  FROM ev CROSS JOIN lo
), s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(cents) AS BIGINT) AS sy,
         CAST(sum(x * cents) AS BIGINT) AS sxy,
         CAST(sum(cents * cents) AS BIGINT) AS syy
  FROM xy GROUP BY event_type
)
SELECT event_type, n, {_OLS_EDGE}
FROM s ORDER BY event_type
"""

register(QuerySpec("events_hourly_trend_ols", events_hourly_trend_ols,
                   _OLS_SQL, doc=events_hourly_trend_ols.__doc__))


# ------------------------------------------------------------ skew report

def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for the events fact table — the numbers
    that decide whether a groupBy/join on user_id needs salting
    (operators/skew.py) or AQE skew handling before it runs at 100 TB:
    key cardinality, the heaviest key's share, the top-1%-of-keys
    share, and p50/p99 of per-key row counts.

    One hash agg collapses the fact table to the per-key count table;
    everything after runs over |keys| METADATA rows (rank windows +
    sorted-index quantiles, the hash_sample_quantiles convention), so
    the report costs one scan + one shuffle regardless of data size.
    All ratios are integer basis points (exact BIGINT arithmetic) —
    bit-identical in the DuckDB oracle."""
    counts = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql.window import Window

    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_events"),
        F.max("cnt").alias("max_cnt"),
    )
    rn_desc = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("user_id")))
    rn_asc = F.row_number().over(
        Window.orderBy(F.asc("cnt"), F.asc("user_id")))
    ranked = counts.select(
        "cnt", rn_desc.alias("rd"), rn_asc.alias("ra")
    ).crossJoin(F.broadcast(stats))
    # the final row anchors on the STATS aggregate (which always yields
    # one row — n_keys = 0 on an empty table, matching the oracle), and
    # the rank-derived metrics ride in as a broadcast 1-row aggregate
    metrics = ranked.agg(
        F.expr(
            "sum(CASE WHEN rd <= (n_keys + 99) DIV 100 THEN cnt"
            " ELSE 0 END) AS top1pct_cnt"
        ),
        F.max(F.expr(
            "CASE WHEN ra = (50 * n_keys + 99) DIV 100 THEN cnt END"
        )).alias("p50_cnt"),
        F.max(F.expr(
            "CASE WHEN ra = (99 * n_keys + 99) DIV 100 THEN cnt END"
        )).alias("p99_cnt"),
    )
    return stats.crossJoin(F.broadcast(metrics)).selectExpr(
        "n_keys",
        "total_events",
        "max_cnt * 10000 DIV total_events AS max_share_bp",
        "top1pct_cnt * 10000 DIV total_events AS top1pct_share_bp",
        "max_cnt",
        "p50_cnt",
        "p99_cnt",
    )


_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
), ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rd,
         row_number() OVER (ORDER BY cnt ASC, user_id ASC) AS ra
  FROM counts
), s AS (
  SELECT count(*) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS total_events,
         max(cnt) AS max_cnt
  FROM counts
)
SELECT n_keys, total_events,
       max_cnt * 10000 // total_events AS max_share_bp,
       CAST((SELECT sum(CASE WHEN rd <= (n_keys + 99) // 100 THEN cnt
                             ELSE 0 END) FROM ranked)
            * 10000 // total_events AS BIGINT) AS top1pct_share_bp,
       max_cnt,
       (SELECT cnt FROM ranked WHERE ra = (50 * n_keys + 99) // 100)
         AS p50_cnt,
       (SELECT cnt FROM ranked WHERE ra = (99 * n_keys + 99) // 100)
         AS p99_cnt
FROM s
"""

register(QuerySpec("events_key_skew_report", events_key_skew_report,
                   _SKEW_REPORT_SQL, doc=events_key_skew_report.__doc__))


# ------------------------------------------------------ salted join

def events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-resilient fact⋈dim enrichment: events join a customer-
    derived user dimension through ``operators.skew.salted_broadcast_left``
    (dim replicated per salt bucket so one hot user spreads over 8
    tasks), then aggregate revenue-weighted event counts per nation.

    The oracle is the PLAIN join + GROUP BY — like
    events_user_stats_salted, a MATCH certifies externally that the
    salting machinery is semantically transparent: the salt exists only
    in the physical plan (pinned in tests), never in the result. Money
    math in exact integer cents."""
    from bigdata2016w_spark.operators.skew import salted_broadcast_left

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    ).select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("vc")
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_broadcast_left(ev, dim, "user_id", salt_buckets=8)
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("vc").alias("value_cents"),
        )
        .orderBy("c_nationkey")
    )


_SALTED_ENRICH_SQL = """
SELECT c_nationkey, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.user_id IS NOT NULL
GROUP BY c_nationkey
ORDER BY c_nationkey
"""

register(QuerySpec("events_salted_enrich", events_salted_enrich,
                   _SALTED_ENRICH_SQL, doc=events_salted_enrich.__doc__))


# ------------------------------------------------- funnel time-to-convert

_TTC_K = 128


def events_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for the view→purchase funnel: exact mean plus
    sketch-estimated p50/p90 of the per-user delay between the first
    view and the first strictly-later purchase.

    The per-user delay table is the funnel's min-agg join (one row per
    converted user, exact integer MICROSECONDS); the mean is a single
    IEEE division of exact int64 sums; the quantiles come from the
    SHARED k-minimum-hash sample machinery (operators/sketches
    hash_sample_rows + quantile_rows_from_sample — the
    orders_winsorized_mean convention), so nothing sorts the full user
    population at any scale."""
    from bigdata2016w_spark.operators.sketches import (
        hash_sample_rows,
        quantile_rows_from_sample,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"), F.first("t_view").alias("t_view"))
    )
    # cast("timestamp"): unix_micros takes LTZ only; the engine session
    # reads parquet as NTZ while the bare driver session reads LTZ — the
    # cast is a no-op on LTZ and a UTC reinterpretation on NTZ (session
    # tz pinned UTC), so both sessions yield the same micros
    delays = purchases.select(
        "user_id",
        (F.unix_micros(F.col("t_buy").cast("timestamp"))
         - F.unix_micros(F.col("t_view").cast("timestamp"))).alias("d_us"),
    )
    stats = delays.agg(
        F.count("*").alias("n_converted"),
        F.sum("d_us").alias("_sd"),
    )
    samp = hash_sample_rows(delays, "user_id", "d_us", _TTC_K, "TTC")
    bounds = quantile_rows_from_sample(samp, (0.5, 0.9)).agg(
        F.max(F.when(F.col("q") == 0.5, F.col("est"))).alias("p50_us"),
        F.max(F.when(F.col("q") == 0.9, F.col("est"))).alias("p90_us"),
        F.max("k_used").cast("int").alias("k_used"),
    )
    sec = 1_000_000.0
    return stats.crossJoin(F.broadcast(bounds)).select(
        "n_converted",
        F.round(F.col("_sd").cast("double")
                / (F.col("n_converted").cast("double") * sec), 6)
        .alias("mean_ttc_sec"),
        F.round(F.col("p50_us") / sec, 6).alias("p50_ttc_sec"),
        F.round(F.col("p90_us") / sec, 6).alias("p90_ttc_sec"),
        "k_used",
    )


_TTC_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, ts FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), v AS (
  SELECT user_id, min(ts) AS t_view FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_buy, any_value(v.t_view) AS t_view
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.t_view
  GROUP BY e.user_id
), d AS (
  SELECT user_id, epoch_us(t_buy) - epoch_us(t_view) AS d_us FROM p
), s AS (
  SELECT count(*) AS n_converted, CAST(sum(d_us) AS BIGINT) AS sd FROM d
), samp AS (
  SELECT d_us FROM (
    SELECT ('0x' || substr(md5('TTC:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             AS h, d_us
    FROM d
  ) ORDER BY h, d_us LIMIT {_TTC_K}
), a AS (
  SELECT list_sort(list(d_us)) AS xs, CAST(count(*) AS INTEGER) AS k_used
  FROM samp
)
SELECT n_converted,
       round(CAST(sd AS DOUBLE)
             / (CAST(n_converted AS DOUBLE) * 1000000.0), 6)
         AS mean_ttc_sec,
       round(CAST(xs[CAST(ceil(0.5 * k_used) AS INTEGER)] AS DOUBLE)
             / 1000000.0, 6) AS p50_ttc_sec,
       round(CAST(xs[CAST(ceil(0.9 * k_used) AS INTEGER)] AS DOUBLE)
             / 1000000.0, 6) AS p90_ttc_sec,
       k_used
FROM s CROSS JOIN a
"""

register(QuerySpec("events_funnel_ttc", events_funnel_ttc, _TTC_SQL,
                   doc=events_funnel_ttc.__doc__))


# ------------------------------------------------------ distribution drift

def orders_priority_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the order-priority mix of the first
    half of the date range vs the second, one row per priority with
    shares and deltas in integer basis points — the feed-health check a
    pipeline runs before trusting a new ingest window.

    The date midpoint is exact integer epoch arithmetic from a 1-row
    min/max aggregate (broadcast into the scan predicate); the split is
    a CASE over one scan, counts shuffle once on (priority, half), and
    every ratio is a BIGINT basis-point division — bit-identical in the
    oracle. Total-variation distance is half the sum of the per-class
    deltas; left per-row so the result stays one row per class."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderpriority",
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
        .alias("es"),
    )
    span = orders.agg(
        F.min("es").alias("e_lo"), F.max("es").alias("e_hi")
    )
    halves = (
        orders.crossJoin(F.broadcast(span))
        .selectExpr(
            "o_orderpriority",
            "CASE WHEN es * 2 < e_lo + e_hi THEN 0 ELSE 1 END AS half",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("CASE WHEN half = 0 THEN 1 ELSE 0 END"))
            .alias("n_a"),
            F.sum(F.expr("CASE WHEN half = 1 THEN 1 ELSE 0 END"))
            .alias("n_b"),
        )
    )
    totals = halves.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    return (
        halves.crossJoin(F.broadcast(totals))
        .selectExpr(
            "o_orderpriority",
            "n_a", "n_b",
            # nullif: a degenerate window (all rows one side — e.g. a
            # single-date table) yields NULL shares, not an ANSI
            # DIVIDE_BY_ZERO (0 DIV 0 throws under Spark 4 ANSI; the
            # oracle's // returns NULL the same way through nullif)
            "n_a * 10000 DIV nullif(t_a, 0) AS share_a_bp",
            "n_b * 10000 DIV nullif(t_b, 0) AS share_b_bp",
            "abs(n_a * 10000 DIV nullif(t_a, 0)"
            " - n_b * 10000 DIV nullif(t_b, 0)) AS delta_bp",
        )
        .orderBy("o_orderpriority")
    )


_DRIFT_SQL = """
WITH o AS (
  SELECT o_orderpriority, epoch(o_orderdate)::BIGINT AS es
  FROM orders WHERE o_orderdate IS NOT NULL
), span AS (SELECT min(es) AS e_lo, max(es) AS e_hi FROM o),
halves AS (
  SELECT o_orderpriority,
         CAST(sum(CASE WHEN es * 2 < e_lo + e_hi THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN es * 2 < e_lo + e_hi THEN 0 ELSE 1 END)
              AS BIGINT) AS n_b
  FROM o CROSS JOIN span GROUP BY o_orderpriority
), totals AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS t_a, CAST(sum(n_b) AS BIGINT) AS t_b
  FROM halves
)
SELECT o_orderpriority, n_a, n_b,
       n_a * 10000 // nullif(t_a, 0) AS share_a_bp,
       n_b * 10000 // nullif(t_b, 0) AS share_b_bp,
       abs(n_a * 10000 // nullif(t_a, 0)
           - n_b * 10000 // nullif(t_b, 0)) AS delta_bp
FROM halves CROSS JOIN totals
ORDER BY o_orderpriority
"""

register(QuerySpec("orders_priority_drift", orders_priority_drift,
                   _DRIFT_SQL, doc=orders_priority_drift.__doc__))
