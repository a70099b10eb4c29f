"""spark.sql surface over the registered catalog views + partition pruning."""

import pyspark.sql.functions as F


def test_spark_sql_over_views(spark, sf_dir):
    """The whole catalog is queryable via spark.sql; result agrees with the
    DataFrame plan for q4's join shape."""
    from bigdata2016w_spark.registry import all_specs
    from bigdata2016w_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    sql_df = spark.sql("""
        SELECT n.n_nationkey, n.n_name, count(*) AS count_lineitem
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_nationkey, n.n_name
        ORDER BY n.n_nationkey
    """)
    df = all_specs()["q4_nation_counts"].fn(spark, sf_dir)
    assert [tuple(r) for r in sql_df.collect()] == [tuple(r) for r in df.collect()]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Hive-partitioned parquet + filter → PartitionFilters in the scan
    (the 100 TB layout: partition by the hottest predicate column)."""
    from bigdata2016w_spark.sources.catalog import load_table
    from bigdata2016w_spark.sources.sinks import write_parquet

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(orders, out, partition_by=["order_year"])

    back = spark.read.parquet(out).where(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1][:200]
    want = orders.where(F.col("order_year") == 1996).count()
    assert back.count() == want


def test_stateful_spend_alerts(spark, sf_dir):
    """applyInPandasWithState custom operator: replayed stream alerts must
    equal a batch cumulative-sum computation."""
    from bigdata2016w_spark.streaming.stateful import spend_alerts
    from bigdata2016w_spark.streaming.windows import events_stream

    threshold = 500.0
    alerts = spend_alerts(events_stream(spark, sf_dir), threshold)
    q = (
        alerts.writeStream.format("memory")
        .queryName("t_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.alert_no): r.total_value
        for r in spark.table("t_alerts").collect()
    }

    # batch oracle: running totals in (ts, event_id) order
    from bigdata2016w_spark.sources.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    want = {}
    for uid, vals in by_user.items():
        total, alerts_n = 0.0, 0
        for v in vals:
            total += v
            while total >= (alerts_n + 1) * threshold:
                alerts_n += 1
                want[(uid, alerts_n)] = total
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
