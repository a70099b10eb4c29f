"""As-of and range joins vs DuckDB's native ASOF / inequality joins."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["asof_purchase_view", "events_close_pairs"]


@pytest.mark.parametrize("name", NAMES)
def test_temporal_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_asof_semantics_tiny(spark):
    """Hand-checkable as-of: ties at equal ts match; earlier lefts get
    null; latest-not-later right wins."""
    from bigdata2016w_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", "l1"), (1, "2024-01-01 00:00:00", "l0"),
         (2, "2024-01-01 01:00:00", "l2")],
        ["k", "s", "name"],
    ).selectExpr("k", "cast(s as timestamp) ts", "name")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10.0), (1, "2024-01-01 00:05:00", 20.0),
         (1, "2024-01-01 00:30:00", 99.0)],
        ["k", "s", "price"],
    ).selectExpr("k", "cast(s as timestamp) ts", "price")

    out = {r["name"]: (r["right_price"],)
           for r in as_of_join(left, right, key="k").collect()}
    assert out["l0"] == (None,)     # nothing at or before 00:00
    assert out["l1"] == (20.0,)     # equal-ts right included
    assert out["l2"] == (None,)     # key 2 has no rights


def test_range_pair_blocking_lossless(spark):
    """Bucketized range join equals the naive inequality join."""
    import random

    import pyspark.sql.functions as F

    from bigdata2016w_spark.operators.temporal import range_pair_join

    rng = random.Random(3)
    rows = [
        (rng.randint(0, 3),
         f"2024-01-01 00:{rng.randint(0,59):02d}:{rng.randint(0,59):02d}",
         i)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["k", "s", "id"]).select(
        "k", F.col("s").cast("timestamp").alias("ts"), "id"
    )
    got = {(r.k, r.id_a, r.id_b)
           for r in range_pair_join(df, "k", "ts", "id", 90).collect()}
    data = [(k, __import__("datetime").datetime.fromisoformat(s), i)
            for k, s, i in rows]
    want = set()
    for k1, t1, i1 in data:
        for k2, t2, i2 in data:
            if k1 == k2 and i1 < i2 and abs((t1 - t2).total_seconds()) <= 90:
                want.add((k1, i1, i2))
    assert got == want
