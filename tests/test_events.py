"""Oracle-parity tests for event-table analytics (windows/JSON/sessions)."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["events_json_agg", "events_tumbling_hour", "events_sliding",
         "events_sessions"]


@pytest.mark.parametrize("name", NAMES)
def test_events_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)
