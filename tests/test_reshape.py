"""Pivot, exact percentiles, SQL-proper Q6 variant vs oracle."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["orders_pivot", "lineitem_unpivot", "totalprice_percentiles", "q6_tpch_proper"]


@pytest.mark.parametrize("name", NAMES)
def test_reshape_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)
