"""Curation-analytics tests: repetition stats, benchmark contamination,
duplicated-span fraction (C4/Gopher-style filters) vs DuckDB oracle +
hand-computed unit values."""

import pytest

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb

CURATION = ["doc_repetition_stats", "contamination_check",
            "dup_span_fraction", "documents_scrub_dup_spans"]


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


def test_pii_scrub_oracle(spark, sf_dir, duck):
    spec = all_specs()["documents_pii_scrub"]
    out = spec.fn(spark, sf_dir)
    assert out.count() > 0
    compare_spark_duckdb(out, duck, spec.oracle)


def test_pii_scrub_planted_values(spark, tmp_path):
    """Planted PII of every class: counts and redacted text must agree
    between engines AND match hand-computed expectations (the registered
    query's corpus is PII-free, so the detection branch is pinned
    here)."""
    import duckdb

    from bigdata2016w_spark.plans.curation import scrub_pii

    rows = [
        (1, "contact bob.smith+x@ex-ample.co.uk or 555-123-4567 now"),
        (2, "ssn 123-45-6789 ip 10.0.255.1 email a@b.io"),
        (3, "clean text with numbers 12345 and dots a.b but no pii"),
        (4, "two ips 1.2.3.4 5.6.7.8 and phone 800.555.1212"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert (got[1].n_email, got[1].n_phone) == (1, 1)
    assert got[1].clean_text == "contact [EMAIL] or [PHONE] now"
    assert (got[2].n_ssn, got[2].n_ipv4, got[2].n_email) == (1, 1, 1)
    assert got[2].clean_text == "ssn [ID] ip [IP] email [EMAIL]"
    assert got[3].clean_text == rows[2][1]
    assert sum([got[3].n_email, got[3].n_ssn, got[3].n_phone,
                got[3].n_ipv4]) == 0
    assert (got[4].n_ipv4, got[4].n_phone) == (2, 1)
    assert got[4].clean_text == "two ips [IP] [IP] and phone [PHONE]"

    # engine parity on the planted corpus, not just the PII-free one
    d = tmp_path / "docs.parquet"
    docs.write.parquet(str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'"
    )
    from bigdata2016w_spark.registry import all_specs as _specs
    sql = _specs()["documents_pii_scrub"].oracle
    want = {r[0]: r for r in con.execute(sql).fetchall()}
    for i in (1, 2, 4):  # doc 3 is clean and not a %97 sample row
        g = got[i]
        assert tuple(want[i]) == (
            i, g.n_email, g.n_ssn, g.n_phone, g.n_ipv4, g.clean_text
        )


def test_scrub_dup_spans_planted_semantics(spark):
    """Hand-checkable span removal: doc 1 and doc 2 share a 4-token
    passage; the OWNER (min doc_id = 1) keeps it, doc 2 loses exactly
    the covered tokens, and a doc sharing nothing is untouched. A doc
    whose text repeats a 3-gram only WITHIN itself keeps everything
    (cross-doc axis only)."""
    from bigdata2016w_spark.plans.curation import scrub_dup_spans

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, f"intro one two {shared} outro one"),
            (2, f"different start {shared} different end"),
            (3, "nothing in common with anybody at all"),
            (4, "loop loop loop loop loop"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_dup_spans(docs).collect()}

    # owner keeps the passage verbatim
    assert out[1].n_removed == 0
    assert out[1].scrubbed_text == f"intro one two {shared} outro one"
    # non-owner loses the union of covered positions: the 4 shared tokens
    # (two overlapping duplicated 3-grams) and nothing else
    assert out[2].n_removed == 4
    assert out[2].scrubbed_text == "different start different end"
    # disjoint doc untouched
    assert out[3].n_removed == 0
    # within-doc repetition untouched (ndocs == 1 for 'loop loop loop')
    assert out[4].n_removed == 0
    assert out[4].scrubbed_text == "loop loop loop loop loop"


def test_scrub_dup_spans_short_docs_survive(spark):
    """Docs below the span length (< 3 tokens, even 0) must pass through
    unscathed rather than vanish or crash the sequence() guard."""
    from bigdata2016w_spark.plans.curation import scrub_dup_spans

    docs = spark.createDataFrame(
        [(1, "one two"), (2, "solo"), (3, ""), (4, "a b c d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_dup_spans(docs).collect()}
    assert out[1] == (1, 2, 0, "one two")
    assert out[2] == (2, 1, 0, "solo")
    assert out[3] == (3, 0, 0, "")
    assert out[4].n_removed == 0
