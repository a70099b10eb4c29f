"""LM-flavored corpus scoring: oracle parity + pinned semantics on
hand-built corpora."""

import math

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_lm_score_rare_tokens_score_higher(spark):
    from bigdata2016w_spark.plans.lm_quality import unigram_lm_scores

    docs = _docs(spark, [
        "common common common common",
        "common common common common",
        "common common common rare",
    ])
    got = {r.doc_id: r.avg_nll for r in unigram_lm_scores(docs).collect()}
    assert got[0] == got[1] < got[2]
    # exact value: c(common)=11, c(rare)=1, N=12, V=2
    p_common = 12 / 14
    su = round(-math.log(p_common) * 1e6)
    assert got[0] == round(su / 1e6, 6)


def test_vocab_oov_counts(spark):
    from bigdata2016w_spark.plans.lm_quality import vocab_oov

    docs = _docs(spark, [
        "alpha alpha beta",
        "alpha gamma delta epsilon",
    ])
    # k=2 vocab = {alpha (3), plus tie beta/gamma/delta/epsilon at 1 →
    # lexicographic: beta}
    got = {r.doc_id: (r.n_tokens, r.n_oov)
           for r in vocab_oov(docs, k=2).collect()}
    assert got == {0: (3, 0), 1: (4, 3)}


def test_tfidf_distinctive_term_ranks_first(spark):
    from bigdata2016w_spark.plans.lm_quality import tfidf_top_terms

    docs = _docs(spark, [
        "shared shared distinctive distinctive distinctive",
        "shared shared other",
        "shared shared another",
    ])
    top = {
        (r.doc_id, r.rank): r.term
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    assert top[(0, 1)] == "distinctive"


def test_weighted_sample_matches_manual_priorities(spark):
    from bigdata2016w_spark.plans.lm_quality import weighted_sample

    docs = _docs(spark, [f"doc number {i}" for i in range(40)])
    got = weighted_sample(docs, k=5).collect()
    assert len(got) == 5

    def manual(doc_id, n_chars):
        h = ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648
        u = (h + 0.5) / 2147483648.0
        return round(-math.log(u) / n_chars, 9)

    texts = [f"doc number {i}" for i in range(40)]
    expect = sorted(
        (manual(i, len(t)), i) for i, t in enumerate(texts)
    )[:5]
    assert [(r.priority, r.doc_id) for r in got] == expect


def test_weighted_sample_is_deterministic(spark, sf_dir):
    spec = all_specs()["documents_weighted_sample"]
    a = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    b = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_lm_quality_oracles(spark, sf_dir, duck):
    for name in ["doc_lm_score", "vocab_coverage", "doc_tfidf_terms",
                 "documents_weighted_sample", "doc_bpe_token_stats",
                 "documents_dsir_selection"]:
        spec = all_specs()[name]
        compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_dsir_ranks_target_like_docs_first(spark):
    """DSIR semantics pinned on a crafted pool: the target sample speaks
    'alpha beta', one candidate mimics it, one shares nothing, one is
    mixed — selection must order them mimic > mixed > disjoint, never
    include target docs, and rank 1..k densely."""
    from bigdata2016w_spark.plans.lm_quality import dsir_importance_select

    rows = []
    for i in range(6):  # target: in-domain English sample
        rows.append((i, "alpha beta alpha beta gamma", "en", "t", 27))
    rows.append((10, "alpha beta alpha gamma beta", "de", "c", 27))
    rows.append((11, "alpha beta zulu yankee xray", "de", "c", 27))
    rows.append((12, "zulu yankee xray whiskey victor", "de", "c", 31))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = dsir_importance_select(docs, buckets=64, k=3).collect()
    assert [r.doc_id for r in got] == [10, 11, 12]
    assert [r.rank for r in got] == [1, 2, 3]
    # importance strictly decreases with target-likeness here
    scores = [r.logratio_per_tok for r in got]
    assert scores[0] > scores[1] > scores[2]


def test_bpe_pieces_known_values(spark):
    """Piece segmentation pinned on a hand-tokenized sample: contraction
    split, leading-space fusion, punctuation runs, number pieces."""
    from bigdata2016w_spark.plans.lm_quality import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "It's e=mc^2... ok 42")], ["doc_id", "text"]
    )
    r = bpe_token_stats(docs).collect()[0]
    # pieces: [it]['s][ e][=][mc][^][2][...][ ok][ 42] = 10
    assert r.n_bpe_pieces == 10
    # whitespace tokens after end-stripping: it's / e=mc / ok ("42" strips
    # to empty and drops)
    assert r.n_ws_tokens == 3
    assert r.pieces_per_word == round(10 / 3, 6)


def test_heavy_hitters_oracle(spark, sf_dir, duck):
    spec = all_specs()["token_heavy_hitters"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_heavy_hitters_exact_on_spread_out_key(spark):
    """A token spread thinly across partitions (never locally dominant)
    must still be found — the pigeonhole pruning is one-sided."""
    import pyspark.sql.functions as F

    from bigdata2016w_spark.plans.lm_quality import token_heavy_hitters

    # unique all-alpha rare tokens (the tokenizer strips digits);
    # 'spread' appears once per doc = 64 total
    texts = [
        "rare%s%s spread" % (chr(97 + i // 26), chr(97 + i % 26))
        for i in range(64)
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).repartition(8)
    got = {r.token: r.n_occurrences
           for r in token_heavy_hitters(docs, threshold=64).collect()}
    assert got == {"spread": 64}


def test_dsir_gumbel_replicates_python_fold(spark, sf_dir):
    """Gumbel-top-k keys pinned bitwise: recompute every selected key in
    pure Python from the shared scoring core's (doc_id, s) — the same
    LCG uniform, the same -ln(-ln(u)), the same rounding — and from the
    selection semantics (k highest keys, doc_id tiebreak, dense rank).
    Also: a fresh call returns the identical sample (deterministic),
    and the deterministic top-k and the Gumbel sample rank the same
    underlying scores (shared _dsir_scores)."""
    import math

    from bigdata2016w_spark.plans.lm_quality import (
        LM_QUANT,
        _dsir_scores,
        dsir_gumbel_sample,
    )
    from bigdata2016w_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = dsir_gumbel_sample(docs, k=15).collect()
    again = dsir_gumbel_sample(docs, k=15).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    assert [r.rank for r in got] == list(range(1, len(got) + 1))

    def key(doc_id, s):
        h = ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648
        u = (float(h) + 0.5) / 2147483648.0
        return round(s / LM_QUANT - math.log(-math.log(u)), 6)

    scores = {r.doc_id: float(r.s)
              for r in _dsir_scores(docs).collect()}
    want = sorted(((key(d, s), d) for d, s in scores.items()),
                  key=lambda t: (-t[0], t[1]))[:15]
    assert [(r.gumbel_key, r.doc_id) for r in got] == want
