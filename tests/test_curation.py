"""Curation-analytics tests: repetition stats, benchmark contamination,
duplicated-span fraction (C4/Gopher-style filters) vs DuckDB oracle +
hand-computed unit values."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

CURATION = ["doc_repetition_stats", "contamination_check", "dup_span_fraction"]


@pytest.mark.parametrize("name", CURATION)
def test_curation_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    out = spec.fn(spark, sf_dir)
    assert out.count() > 0
    compare_spark_duckdb(out, duck, spec.oracle)


def test_repetition_stats_known_values(spark):
    from bigdata2016w_spark.plans.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            # 6 tokens, 4 distinct; 'a' ×3; top bigram 'a a' ×2 of 5
            (1, "a a a b c d"),
            # no repetition at all
            (2, "u v w x"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 6
    assert r1.dup_token_frac == pytest.approx(1 - 4 / 6, abs=1e-6)
    assert r1.top_token_frac == pytest.approx(3 / 6, abs=1e-6)
    assert r1.top_bigram_frac == pytest.approx(2 / 5, abs=1e-6)
    r2 = rows[2]
    assert r2.dup_token_frac == 0.0 and r2.top_token_frac == 0.25


def test_contamination_flags_copied_doc(spark):
    from bigdata2016w_spark.plans.curation import contamination

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (10, "the quick brown fox jumps over the lazy dog"),  # full copy
            (11, "completely unrelated words appear in this one"),
            (12, "ends with the quick brown fox"),  # partial overlap
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in contamination(docs, bench_max_doc_id=10).collect()}
    assert rows[10].contaminated_frac == 1.0
    assert 11 not in rows
    assert 0 < rows[12].contaminated_frac < 1.0


def test_dup_span_fraction_known_values(spark):
    from bigdata2016w_spark.plans.curation import dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # shingles: abc bcd cde
            (2, "a b c x y"),   # shingles: abc bcx cxy — shares abc with 1
            (3, "p q r s t"),   # no shared shingles
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dup_spans(docs).collect()}
    assert rows[1].dup_shingles == 1
    assert rows[1].dup_span_frac == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2].dup_span_frac == pytest.approx(1 / 3, abs=1e-6)
    assert rows[3].dup_span_frac == 0.0


def test_corpus_datacard_oracle(spark, sf_dir, duck):
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    spec = all_specs()["corpus_datacard"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_corpus_datacard_covers_all_docs(spark, sf_dir):
    import pyspark.sql.functions as F

    from bigdata2016w_spark.functions.tokenizer import tokenize
    from bigdata2016w_spark.registry import all_specs
    from bigdata2016w_spark.sources.catalog import load_table

    out = all_specs()["corpus_datacard"].fn(spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    docs = load_table(spark, sf_dir, "documents")
    want = docs.where(F.size(tokenize("text")) > 0).count()
    assert total == want
