"""Oracle-parity tests for text analytics (SURVEY §2, a0/a1/a2)."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

NAMES = [
    "word_count",
    "prefix_count",
    "bigram_relfreq_pairs",
    "bigram_relfreq_stripes",
    "pmi_pairs",
]


@pytest.mark.parametrize("name", NAMES)
def test_text_matches_oracle(name, spark, sf_dir, duck):
    spec = all_specs()[name]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_tokenizer_semantics(spark):
    """Reference tokenizer parity: lowercase, strip edge non-letters, drop
    empties (Tokenizer.scala:7-13)."""
    from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_letters
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("  Hello, WORLD!! 42 it's a2b --x  ",)], ["text"]
    )
    out = df.select(tokenize(F.col("text")).alias("t")).collect()[0][0]
    assert out == ["hello", "world", "it's", "a2b", "x"]
    out2 = df.select(tokenize_letters(F.col("text")).alias("t")).collect()[0][0]
    assert out2 == ["hello", "world", "its", "ab", "x"]
