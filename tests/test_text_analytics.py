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


def test_tokenizer_matches_hof_twin_on_edge_strings(spark):
    """r13: the codegen'd regex tokenizers must produce the SAME token
    ARRAYS (order included) as the original interpreted-HOF forms —
    bigrams/shingles depend on order, not just the multiset."""
    import pyspark.sql.functions as F

    from bigdata2016w_spark.functions.tokenizer import (
        _tokenize_hof,
        _tokenize_letters_hof,
        tokenize,
        tokenize_letters,
    )

    edge = spark.createDataFrame(
        [(i, s) for i, s in enumerate([
            None, "", "   ", "abc", " abc ", "3abc4", "a", "3",
            "a3b c4d", "x..y  ..z..", "ABC dEf", "a\tb\nc",
            "..a..b.. c", "1a2 3b4 5 6c", "ü über straße",
            "a-b-c -a- -", "éclair café", "tab\t\t2tabs", "e e e",
            "zz 9z9 z9z 9", "it's o'clock", "-x-", "9-to-5",
        ])],
        "doc_id long, text string",
    )
    for new, hof in ((tokenize, _tokenize_hof),
                     (tokenize_letters, _tokenize_letters_hof)):
        rows = edge.select(
            "text", new("text").alias("a"), hof("text").alias("b")
        ).collect()
        for r in rows:
            assert r.a == r.b, (r.text, r.a, r.b)
