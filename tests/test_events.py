"""Oracle-parity tests for event-table analytics (windows/JSON/sessions)."""

import pytest
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["events_json_agg", "events_tumbling_hour", "events_sliding",
         "events_sessions", "events_funnel", "user_retention_cohorts",
         "events_hourly_gapfill", "orders_daily_moving_avg",
         "events_transition_matrix", "events_user_value_ema",
         "events_user_stats_salted"]


@pytest.mark.parametrize("name", NAMES)
def test_events_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_funnel_is_monotone(spark, sf_dir):
    rows = {r.stage: r.n_users
            for r in all_specs()["events_funnel"].fn(spark, sf_dir).collect()}
    assert rows[1] >= rows[2] >= rows[3] >= 0


def test_retention_day0_covers_every_user(spark, sf_dir):
    """Every user is active on their own cohort day, so day_offset=0
    rows must sum to the number of distinct users."""
    import pyspark.sql.functions as F

    from bigdata2016w_spark.sources.catalog import load_table

    out = all_specs()["user_retention_cohorts"].fn(spark, sf_dir)
    day0 = (out.where(F.col("day_offset") == 0)
            .agg(F.sum("n_users")).collect()[0][0])
    n_users = (load_table(spark, sf_dir, "events")
               .select("user_id").distinct().count())
    assert day0 == n_users


def test_gapfill_spine_is_complete(spark, sf_dir):
    """Every hour between min and max must be present exactly once."""
    from datetime import datetime

    out = all_specs()["events_hourly_gapfill"].fn(spark, sf_dir).collect()
    hours = sorted(datetime.strptime(r.hour, "%Y-%m-%d %H:%M:%S")
                   for r in out)
    assert len(set(hours)) == len(hours)
    span = (hours[-1] - hours[0]).total_seconds() / 3600
    assert len(hours) == int(span) + 1


def test_transition_matrix_rows_normalize(spark, sf_dir):
    import math

    out = all_specs()["events_transition_matrix"].fn(spark, sf_dir).collect()
    by_from = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r)
    for rows in by_from.values():
        assert math.isclose(sum(r.p for r in rows), 1.0, rel_tol=1e-12)
        assert all(r.n_transitions > 0 for r in rows)


def test_user_value_ema_hand_computed(spark, tmp_path):
    """3 events for one user arriving out of ts order + a NULL-ts row
    that must be ignored: ema = fold over the (ts, event_id)-ordered
    values, seeded with the first."""
    from bigdata2016w_spark.registry import all_specs

    d = tmp_path / "ema"
    d.mkdir()
    spark.createDataFrame(
        [(3, "2024-01-01 00:02:00", 1, "view", 8.0, "{}"),
         (1, "2024-01-01 00:00:00", 1, "view", 4.0, "{}"),
         (2, "2024-01-01 00:01:00", 1, "view", 0.0, "{}"),
         (4, None, 1, "view", 99.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp_ntz) as ts", "user_id",
                 "event_type", "value", "props"
                 ).write.parquet(str(d / "events.parquet"))
    out = all_specs()["events_user_value_ema"].fn(spark, str(d)).collect()
    assert len(out) == 1
    # seed 4.0 -> 0.25*0.0 + 0.75*4.0 = 3.0 -> 0.25*8.0 + 0.75*3.0 = 4.25
    assert out[0].n_events == 3 and out[0].ema == 4.25


def test_salted_stats_plan_has_two_agg_stages(spark, sf_dir):
    """The salted path must actually BE two-phase: four HashAggregate
    nodes (partial+final per phase) and no Python eval. Result parity
    with the plain-GROUP-BY oracle is the transparency proof in
    test_events_matches_oracle; this pins that the transparent result
    really came through the salt."""
    import re

    spec = all_specs()["events_user_stats_salted"]
    plan = (spec.fn(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert len(re.findall(r"HashAggregate", plan)) >= 4
    assert "__salt" in plan
    assert "EvalPython" not in plan


def test_hourly_trend_ols_oracle(spark, duck, sf_dir):
    s = all_specs()["events_hourly_trend_ols"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_hourly_trend_ols_recovers_planted_line(spark, tmp_path):
    """A perfectly linear hourly series (2-decimal values) must come
    back with the exact planted slope/intercept and r² = 1 — the
    closed-form sufficient-statistics path, not an approximation."""
    from datetime import datetime, timedelta

    from bigdata2016w_spark.plans.events import events_hourly_trend_ols

    t0 = datetime(2024, 3, 1, 0, 30)
    rows = [
        (i, t0 + timedelta(hours=i), 7, "lin", 1.00 + 0.25 * i, "{}")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = events_hourly_trend_ols(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["slope_per_hour"], r["intercept"], r["r2"]) == (
        10, 0.25, 1.0, 1.0,
    )


def test_key_skew_report_oracle(spark, duck, sf_dir):
    s = all_specs()["events_key_skew_report"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_key_skew_report_detects_planted_hot_key(spark, tmp_path):
    """One user holding half the events must dominate the report:
    max_share_bp ~5000 and p99 >> p50."""
    from datetime import datetime, timedelta

    from bigdata2016w_spark.plans.events import events_key_skew_report

    t0 = datetime(2024, 5, 1)
    rows = []
    eid = 0
    for i in range(500):           # hot user 0: 500 events
        rows.append((eid, t0 + timedelta(minutes=i), 0, "view", 1.0, "{}"))
        eid += 1
    for u in range(1, 101):        # 100 cold users: 5 events each
        for i in range(5):
            rows.append((eid, t0 + timedelta(minutes=i), u, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = events_key_skew_report(spark, str(tmp_path)).collect()[0]
    assert r["n_keys"] == 101 and r["total_events"] == 1000
    assert r["max_share_bp"] == 5000 and r["max_cnt"] == 500
    # top 1% of 101 keys = ceil(1.01) = 2 keys = hot + one cold
    assert r["top1pct_share_bp"] == (505 * 10000) // 1000
    assert r["p50_cnt"] == 5 and r["p99_cnt"] == 5


def test_salted_enrich_oracle(spark, duck, sf_dir):
    s = all_specs()["events_salted_enrich"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_salted_enrich_salt_is_physical_only(spark, sf_dir):
    """The salt must appear in the plan (the machinery is really in use)
    and the result must have no salt column and equal the plain join."""
    import re

    from bigdata2016w_spark.plans.events import events_salted_enrich
    from bigdata2016w_spark.sources.catalog import load_table

    df = events_salted_enrich(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert "__salt" not in df.columns
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull())
    cust = load_table(spark, sf_dir, "customer")
    plain = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("long"))
             .alias("value_cents"))
    )
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_funnel_ttc_oracle(spark, duck, sf_dir):
    s = all_specs()["events_funnel_ttc"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_funnel_ttc_planted_delays(spark, tmp_path):
    """Two converters with exactly 1h and 3h delays, one non-converter,
    one purchase-before-view: mean = 2h exact, quantiles are sample
    order statistics of {1h, 3h}."""
    from datetime import datetime, timedelta

    from bigdata2016w_spark.plans.events import events_funnel_ttc

    t0 = datetime(2024, 7, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + timedelta(hours=1), 1, "purchase", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 + timedelta(hours=3), 2, "purchase", 1.0, "{}"),
        (5, t0, 3, "view", 1.0, "{}"),                      # never buys
        (6, t0, 4, "purchase", 1.0, "{}"),                  # buys first
        (7, t0 + timedelta(hours=1), 4, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = events_funnel_ttc(spark, str(tmp_path)).collect()[0]
    assert r["n_converted"] == 2 and r["k_used"] == 2
    assert r["mean_ttc_sec"] == 7200.0
    assert r["p50_ttc_sec"] in (3600.0,)   # ceil(0.5*2) = 1st of {1h,3h}
    assert r["p90_ttc_sec"] == 10800.0     # ceil(0.9*2) = 2nd


def test_priority_drift_oracle(spark, duck, sf_dir):
    s = all_specs()["orders_priority_drift"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_priority_drift_detects_planted_shift(spark, tmp_path):
    """A priority class that exists ONLY in the second half must show
    ~0 bp share in half A and a large delta."""
    from datetime import datetime

    from bigdata2016w_spark.plans.events import orders_priority_drift

    early, late = datetime(2024, 1, 1), datetime(2024, 12, 31)
    rows = [(i, 1, "O", 100.0, early, "1-URGENT") for i in range(100)]
    rows += [(100 + i, 1, "O", 100.0, late, "1-URGENT")
             for i in range(50)]
    rows += [(200 + i, 1, "O", 100.0, late, "9-NEW") for i in range(50)]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {r["o_orderpriority"]: r
           for r in orders_priority_drift(spark, str(tmp_path)).collect()}
    nine = got["9-NEW"]
    assert nine["n_a"] == 0 and nine["n_b"] == 50
    assert nine["share_a_bp"] == 0 and nine["share_b_bp"] == 5000
    assert nine["delta_bp"] == 5000
    urgent = got["1-URGENT"]
    assert urgent["share_a_bp"] == 10000 and urgent["share_b_bp"] == 5000
