"""Oracle-parity tests for the relational query library (SURVEY §2, a5)."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

REL = [
    "q1_count_shipped",
    "q2_order_status",
    "q3_part_supplier",
    "q4_nation_counts",
    "q5_monthly_nation",
    "q6_lineitem_agg",
    "q7_top_revenue",
    "q4_priority_late_exists",
    "q21_waiting_supplier",
    "q10_returned_revenue",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q16_supplier_count",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
    "q11_important_stock",
    "q15_top_supplier",
    "q20_surplus_suppliers",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q8_market_share",
    "q9_product_profit",
]


@pytest.mark.parametrize("name", REL)
def test_relational_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    assert spec.oracle is not None
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_q1_nonempty(spark, sf_dir):
    spec = all_specs()["q1_count_shipped"]
    assert spec.fn(spark, sf_dir).collect()[0][0] > 0
