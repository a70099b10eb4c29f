"""Oracle-parity for the standard-SQL analytics surface + stripes PMI."""

import pytest
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["orders_rollup", "orders_cube", "customer_rank_window",
         "nation_distinct_counts", "pmi_stripes",
         "q17_small_quantity_revenue", "supplier_fuzzy_name_pairs",
         "auc_rank_check"]


@pytest.mark.parametrize("name", NAMES)
def test_analytics_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


@pytest.mark.parametrize("name", ["orders_grouping_sets", "totalprice_histogram"])
def test_groupingsets_histogram_match_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_column_stats_single_scan(spark, sf_dir, duck):
    """Oracle parity + the plan property: ONE scan of orders computes
    every column's stats (not one scan per column)."""
    import io
    import contextlib

    from bigdata2016w_spark.registry import all_specs

    spec = all_specs()["orders_column_stats"]
    df = spec.fn(spark, sf_dir)
    compare_spark_duckdb(df, duck, spec.oracle)
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # one scan NODE (multi-distinct runs via Expand over a single pass);
    # the node name appears once in the tree and once in the detail list
    assert len(re.findall(r"\(\d+\) Scan parquet", buf.getvalue())) == 1


def test_halfsample_ci_oracle(spark, duck, sf_dir):
    s = all_specs()["orders_halfsample_ci"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_halfsample_ci_brackets_the_mean(spark, sf_dir):
    from bigdata2016w_spark.plans.analytics import (
        R_BOOT,
        orders_halfsample_ci,
    )

    r = orders_halfsample_ci(spark, sf_dir).collect()[0]
    assert r["n_replicates"] == R_BOOT
    assert r["boot_p05"] <= r["boot_p50"] <= r["boot_p95"]
    # 32 half-sample means straddle the full-data mean
    assert r["boot_p05"] < r["mean_totalprice"] < r["boot_p95"]
    # and the spread is a sane few-percent band, not degenerate
    rel = (r["boot_p95"] - r["boot_p05"]) / r["mean_totalprice"]
    assert 0 < rel < 0.2


def test_parts_cooccurrence_oracle(spark, duck, sf_dir):
    s = all_specs()["parts_cooccurrence_topk"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_parts_cooccurrence_apriori_pruning_is_lossless(spark, sf_dir):
    """The frequent-item semi-join prunes work, never answers: the
    top-k from the pruned plan equals the naive unpruned pair count."""
    from bigdata2016w_spark.plans.analytics import (
        PAIR_MIN_SUPPORT,
        PAIR_TOP_K,
        parts_cooccurrence_topk,
    )
    from bigdata2016w_spark.sources.catalog import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    naive = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("p1"),
                 F.col("b.l_partkey").alias("p2"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= PAIR_MIN_SUPPORT)
        .orderBy(F.desc("n_orders"), "p1", "p2")
        .limit(PAIR_TOP_K)
    )
    got = [tuple(r) for r in parts_cooccurrence_topk(spark, sf_dir).collect()]
    want = [tuple(r) for r in naive.collect()]
    assert got == want
