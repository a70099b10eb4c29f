"""Deterministic hash sampling: oracle parity + stability invariants."""

import pytest
from pyspark.sql import functions as F

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = ["doc_train_test_split", "documents_stratified_sample",
         "documents_token_budget_mix"]


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


def test_token_budget_mix_hits_targets(spark, sf_dir):
    """Mixing semantics: (a) every source's sampled token share moves
    toward its target weight — the five 0.10-weight sources keep a
    higher fraction of their docs than the default-weight tail; (b) the
    total sampled tokens land within Bernoulli noise of the budget
    fraction; (c) selection is stable under repartitioning."""
    from bigdata2016w_spark.plans.sampling import (
        MIX_BUDGET_FRAC,
        MIX_WEIGHTS,
        documents_token_budget_mix,
    )
    from bigdata2016w_spark.functions.tokenizer import tokenize
    from bigdata2016w_spark.sources.catalog import load_table

    out = documents_token_budget_mix(spark, sf_dir).cache()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokenize("text")).alias("n_tokens")
    )
    tot = docs.agg(F.sum("n_tokens")).collect()[0][0]
    kept = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert 0.7 * MIX_BUDGET_FRAC < kept / tot < 1.3 * MIX_BUDGET_FRAC

    base = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    samp = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    frac = {s: samp.get(s, 0) / base[s] for s in base}
    hi = [frac[s] for s in MIX_WEIGHTS if s in frac]
    lo = [frac[s] for s in frac if s not in MIX_WEIGHTS]
    assert min(hi) > max(lo)  # weighted sources kept at higher rates

    again = {tuple(r) for r in documents_token_budget_mix(
        spark, sf_dir).repartition(17).collect()}
    assert {tuple(r) for r in out.collect()} == again
    out.unpersist()
