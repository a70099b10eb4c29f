"""Property-based tests (hypothesis) — the test tier the reference lacked
entirely (SURVEY §5: 'no property-based, randomized, or SQL-logic-test
corpus anywhere')."""

import re
from datetime import date, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st


# --- date prefix bounds: pure function, no Spark needed ---

@given(
    st.integers(min_value=1, max_value=9998),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=31),
    st.sampled_from(["y", "ym", "ymd"]),
)
@settings(max_examples=200)
def test_prefix_bounds_cover_exactly_the_prefix(y, m, d, kind):
    from bigdata2016w_spark.functions.dates import prefix_bounds

    try:
        date(y, m, d)
    except ValueError:
        return  # not a real calendar day
    prefix = {"y": f"{y:04d}", "ym": f"{y:04d}-{m:02d}",
              "ymd": f"{y:04d}-{m:02d}-{d:02d}"}[kind]
    lo, hi = prefix_bounds(prefix)
    lo_d = date.fromisoformat(lo)
    hi_d = date.fromisoformat(hi)
    assert lo_d <= date(y, m, d) < hi_d
    # boundaries: everything in [lo, hi) startswith prefix; hi does not
    assert lo.startswith(prefix)
    assert not hi.startswith(prefix)
    # one day before hi still matches the prefix
    assert (hi_d - timedelta(days=1)).isoformat().startswith(prefix)


# --- tokenizer parity vs a direct Python reference implementation ---

def _py_tokenize(line: str) -> list[str]:
    """Literal re-expression of Tokenizer.scala:7-13 semantics."""
    out = []
    for t in re.split(r"\s+", line.lower()):
        t = re.sub(r"(^[^a-z]+|[^a-z]+$)", "", t)
        if t:
            out.append(t)
    return out


@given(st.lists(
    st.text(alphabet="abcXY z0.!'-\t", min_size=0, max_size=12),
    min_size=1, max_size=5,
))
@settings(max_examples=30, deadline=None)
def test_tokenizer_matches_python_reference(spark_lines):
    # one Spark session call per example is slow; batch all lines at once
    global _SPARK
    from bigdata2016w_spark import get_spark
    from bigdata2016w_spark.functions.tokenizer import tokenize

    spark = get_spark(master="local[2]")
    text = " ".join(spark_lines)
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(tokenize("text").alias("t")).collect()[0][0]
    assert got == _py_tokenize(text)


# --- RPN evaluator vs Python set algebra ---

@given(st.integers(min_value=0, max_value=2**31))
@settings(max_examples=25, deadline=None)
def test_rpn_random_queries_match_set_algebra(seed):
    import random

    rng = random.Random(seed)
    terms = ["cat", "dog", "bird", "fish"]
    docs_py = {
        i: set(rng.sample(terms, rng.randint(1, 3))) for i in range(8)
    }
    # random postfix expression over 2-3 operands
    n_ops = rng.randint(1, 2)
    operands = [rng.choice(terms) for _ in range(n_ops + 1)]
    ops = [rng.choice(["AND", "OR"]) for _ in range(n_ops)]
    rpn = operands[:2] + [ops[0]]
    for i in range(1, n_ops):
        rpn += [operands[i + 1], ops[i]]
    query = " ".join(rpn)

    # python oracle on the same stack semantics
    stack = []
    for tok in query.split():
        if tok == "AND":
            b, a = stack.pop(), stack.pop()
            stack.append(a & b)
        elif tok == "OR":
            b, a = stack.pop(), stack.pop()
            stack.append(a | b)
        else:
            stack.append({i for i, ts in docs_py.items() if tok in ts})
    want = stack[0]

    from bigdata2016w_spark import get_spark
    from bigdata2016w_spark.operators.retrieval import eval_rpn, postings_flat

    spark = get_spark(master="local[2]")
    docs = spark.createDataFrame(
        [(i, " ".join(sorted(ts))) for i, ts in docs_py.items()],
        ["doc_id", "text"],
    )
    got = {r[0] for r in eval_rpn(postings_flat(docs), query).collect()}
    assert got == want


# --- portable hash family: Spark expression ≡ python md5 reference ---

def test_portable_hash60_matches_python_md5(spark):
    """The SQL-portable hash family under the oracle-backed LSH tiers:
    Spark's conv(substr(md5(seed:s),1,15),16,10) must equal a pure-Python
    hashlib reimplementation on adversarial strings (unicode, quotes,
    empties collapse upstream — tokens are never empty, but the hash
    itself must not care)."""
    import hashlib

    import pyspark.sql.functions as F

    from bigdata2016w_spark.operators.dedup import (
        MH_PRIME,
        mh_affine,
        portable_hash60,
    )

    samples = ["a", "hello world", "naïve café", "日本語", "x" * 500,
               "it's \"quoted\"", "tab\tsep", "mixed123digits", "ZzZ"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {
        r.s: (r.h, r.m)
        for r in df.select(
            "s",
            portable_hash60(F.col("s"), "mh").alias("h"),
            (((portable_hash60(F.col("s"), "mh") % MH_PRIME)
              * mh_affine(3)[0] + mh_affine(3)[1]) % MH_PRIME).alias("m"),
        ).collect()
    }
    for s in samples:
        ref = int(hashlib.md5(f"mh:{s}".encode()).hexdigest()[:15], 16)
        a, b = mh_affine(3)
        assert got[s][0] == ref
        assert got[s][1] == ((ref % MH_PRIME) * a + b) % MH_PRIME


def test_mh_affine_family_is_injective_per_perm():
    """Each affine map a_p·x + b_p mod P over the 31-bit prime field is a
    bijection (a_p never 0 mod P), so the portable MinHash permutations
    are genuine permutations of the hash space."""
    import math

    from bigdata2016w_spark.operators.dedup import MH_PRIME, mh_affine

    seen = set()
    for p in range(64):
        a, b = mh_affine(p)
        assert 0 < a < MH_PRIME and 0 <= b < MH_PRIME
        assert math.gcd(a, MH_PRIME) == 1  # prime modulus: any a≠0 works
        seen.add((a, b))
    assert len(seen) == 64  # distinct permutations


# --- cross-doc span scrubbing vs a pure-Python reference ---

def _py_scrub(docs: dict, span: int = 3) -> dict:
    """Reference implementation of plans/curation.scrub_dup_spans on
    pre-tokenized docs: positions covered by any span-gram occurring in
    >=2 distinct docs are removed everywhere except the min-doc owner."""
    stats: dict = {}
    occ = []
    for d, ts in docs.items():
        for i in range(max(len(ts) - span + 1, 0)):
            sh = " ".join(ts[i:i + span])
            occ.append((d, i, sh))
            mn, mx = stats.get(sh, (d, d))
            stats[sh] = (min(mn, d), max(mx, d))
    removed: dict = {d: set() for d in docs}
    for d, i, sh in occ:
        mn, mx = stats[sh]
        if mn != mx and d != mn:
            removed[d].update(range(i, i + span))
    out = {}
    for d, ts in docs.items():
        kept = [t for j, t in enumerate(ts) if j not in removed[d]]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


_scrub_corpus = st.lists(  # one corpus: 2-5 docs over a tiny vocab
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=12),
    min_size=2, max_size=5,
)


@given(st.lists(_scrub_corpus, min_size=15, max_size=15))
@settings(max_examples=3, deadline=None)
def test_scrub_dup_spans_matches_python_reference(corpora):
    """Tiny vocab => dense shared/overlapping/self-repeating span-grams —
    the adversarial regime for the owner/overlap logic. Each corpus's
    tokens are tag-prefixed so one batched Spark job over the union is
    exactly the per-corpus scrubs (span-grams cannot match across
    corpora)."""
    from bigdata2016w_spark import get_spark
    from bigdata2016w_spark.plans.curation import scrub_dup_spans

    spark = get_spark(master="local[2]")
    rows, want = [], {}
    for c, corpus in enumerate(corpora):
        docs = {c * 1000 + i: [f"c{c}{w}" for w in words]
                for i, words in enumerate(corpus)}
        rows += [(d, " ".join(ts)) for d, ts in docs.items()]
        want.update(_py_scrub(docs))
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
        for r in scrub_dup_spans(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got == want


# --- BPE merge fold vs a pure-Python greedy merge ---

def _py_greedy_merge(sym, left, right):
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


@given(st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=10),
    min_size=30, max_size=30,
))
@settings(max_examples=3, deadline=None)
def test_merge_fold_matches_python_greedy(words):
    """Random a/b strings maximize overlapping merge sites — the regime
    where greedy-non-overlapping and other merge orders diverge. Applies
    (a,b) then (ab,ab) then (b,a), so multi-char symbols and chained
    merges are exercised; one batched Spark job checks all words."""
    from pyspark.sql import functions as F

    from bigdata2016w_spark import get_spark
    from bigdata2016w_spark.plans.corpus_ext import _merge_fold

    pairs = [("a", "b"), ("ab", "ab"), ("b", "a")]
    spark = get_spark(master="local[2]")
    df = spark.createDataFrame(
        [(i, list(w)) for i, w in enumerate(words)],
        "i long, sym array<string>",
    )
    for left, right in pairs:
        df = df.select("i", F.expr(_merge_fold(left, right)).alias("sym"))
    got = {r.i: r.sym for r in df.collect()}
    for i, w in enumerate(words):
        want = list(w)
        for left, right in pairs:
            want = _py_greedy_merge(want, left, right)
        assert got[i] == want, (w, got[i], want)
