"""Deterministic hash sampling: oracle parity + stability invariants."""

import pytest
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["doc_train_test_split", "documents_stratified_sample"]


@pytest.mark.parametrize("name", NAMES)
def test_sampling_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_split_stable_under_repartition(spark, sf_dir):
    """The whole point vs rand(): identical selection at any parallelism."""
    from bigdata2016w_spark.plans.sampling import hash_bucket
    from bigdata2016w_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in
         docs.where(hash_bucket(F.col("doc_id")) < 80).collect()}
    b = {r.doc_id for r in
         docs.repartition(17).where(hash_bucket(F.col("doc_id")) < 80).collect()}
    assert a == b


def test_split_ratio_plausible(spark, sf_dir):
    out = all_specs()["doc_train_test_split"].fn(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert 0.7 < counts.get("train", 0) / total < 0.9
