"""Semi/anti joins, relational set ops, pandas-UDF and observe() coverage."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["customers_semi_join", "customers_anti_join", "segment_set_ops"]


@pytest.mark.parametrize("name", NAMES)
def test_joins_setops_match_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_scalar_pandas_udf_matches_builtin(spark, sf_dir):
    """Engine policy is builtins-first (SURVEY §2.12); when a scalar
    pandas_udf IS needed it must agree with the builtin path — checked on
    the sigmoid (TrainSpamClassifier.scala:42)."""
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid_udf(s: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-s))

    from bigdata2016w_spark.sources.catalog import load_table

    df = load_table(spark, sf_dir, "customer").select(
        (F.col("c_acctbal") / 1000.0).alias("x")
    )
    out = df.select(
        sigmoid_udf("x").alias("viaudf"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("x")))).alias("builtin"),
    )
    bad = out.where(F.abs(F.col("viaudf") - F.col("builtin")) > 1e-12)
    assert bad.count() == 0


def test_observe_counters(spark, sf_dir):
    """df.observe() — the engine twin of Hadoop counters
    (RunPersonalizedPageRankBasic.java:64-66)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from bigdata2016w_spark.sources.catalog import load_table

    obs = Observation("scan_metrics")
    li = load_table(spark, sf_dir, "lineitem").observe(
        obs, F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("l_quantity")).alias("qty_total"),
    )
    n = li.count()
    assert obs.get["rows_scanned"] == n


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    import pyspark.sql.functions as F

    from bigdata2016w_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_full_outer_reconcile_oracle(spark, sf_dir, duck):
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    spec = all_specs()["daily_orders_events_reconcile"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_full_outer_reconcile_has_both_null_sides(spark, sf_dir):
    import pyspark.sql.functions as F

    from bigdata2016w_spark.registry import all_specs

    out = all_specs()["daily_orders_events_reconcile"].fn(spark, sf_dir)
    sides = out.agg(
        F.sum(F.col("n_orders").isNull().cast("int")).alias("null_orders"),
        F.sum(F.col("n_events").isNull().cast("int")).alias("null_events"),
    ).collect()[0]
    assert sides.null_orders > 0 and sides.null_events > 0


def test_bucketed_revenue_oracle(spark, duck, sf_dir):
    s = all_specs()["lineitem_bucketed_revenue"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_bucketed_revenue_join_has_no_key_shuffle(spark, sf_dir):
    """The registered bucketed join must read both sides straight from
    bucket files: a SortMergeJoin with NO hash exchange on either join
    key anywhere in the plan (the agg/sort exchanges downstream
    partition on other columns)."""
    from bigdata2016w_spark.plans.joins_setops import (
        lineitem_bucketed_revenue,
    )

    df = lineitem_bucketed_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "hashpartitioning(l_orderkey" not in plan
    assert "hashpartitioning(o_orderkey" not in plan
