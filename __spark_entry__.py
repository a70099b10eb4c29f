"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``bigdata2016w_spark.registry`` — every implemented operator
from SURVEY.md §2 registers a Spark callable plus (where SQL-expressible) a
DuckDB oracle SQL string there.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdata2016w_spark.registry import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape: 2 range filters, 3-way join,
    decimal revenue agg, top-10) on /root/testdata/sf0.001."""
    from bigdata2016w_spark.plans.relational import q7

    return q7(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
