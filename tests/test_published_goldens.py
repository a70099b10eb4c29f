"""Replay of published reference goldens (assignment1.md:31-51).

The graded Shakespeare corpus is absent from the snapshot
(.MISSING_LARGE_BLOBS), but each published PMI value is a pure function
of four integers — N lines, c(x), c(y), c(x,y) — so the counts were
recovered by inverting the reference's exact arithmetic
(PairsPMI.java:217: the PMI argument is computed in FLOAT32 —
``TOTALNUMBER * num / cx / cy`` with float operands — then widened for
``Math.log10``), searching (c(x,y), c(x), c(y)) for the count triples
whose float32 PMI bit-equals the published double at N = 38505 lines
(assignment1.md:25 "line: 38505"). A corpus slice with exactly those
line counts replays the golden: the engine's double-math PMI must match
the published value at its 6-decimal output rounding (float32-vs-double
drift is ~1e-8).

Not all published pairs are invertible under this code path — e.g.
(maine, anjou) 3.6331 exceeds log10(N/10), the maximum any ≥10-count
pair can reach at N = 38505, so it must predate the committed code —
but three Q6 values are, and those are pinned here.
"""

import pyspark.sql.functions as F
import pytest

# (x, y, c(x,y), c(x), c(y), published PMI from assignment1.md Q6)
GOLDENS = [
    ("death", "after", 22, 23, 10103, 0.5617616404704495),
    ("tears", "her", 56, 59, 12177, 0.4773128031518101),
    ("death", "life", 87, 164, 3733, 0.7381345555274458),
]

N_LINES = 38505  # assignment1.md:25


def _corpus(spark, x, y, cxy, cx, cy):
    """N_LINES single-line docs with exact containment counts: cxy lines
    hold both words, cx−cxy only x, cy−cxy only y, the rest a filler word
    (one word per line ⇒ no other pair reaches the ≥10 threshold)."""
    return spark.range(N_LINES).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < cxy, F.lit(f"{x} {y}"))
        .when(F.col("id") < cx, F.lit(x))
        .when(F.col("id") < cx + (cy - cxy), F.lit(y))
        .otherwise(F.lit("filler"))
        .alias("text"),
    )


@pytest.mark.parametrize("x,y,cxy,cx,cy,published", GOLDENS)
def test_pmi_matches_published_assignment1_values(
    spark, x, y, cxy, cx, cy, published
):
    from bigdata2016w_spark.plans.text_analytics import pmi_over_docs

    rows = {
        (r.w1, r.w2): r
        for r in pmi_over_docs(_corpus(spark, x, y, cxy, cx, cy)).collect()
    }
    # the engine emits both orientations; only the x/y pair may pass ≥10
    assert set(rows) == {(x, y), (y, x)}
    got = rows[(x, y)]
    assert got.cnt == cxy
    assert got.pmi == round(published, 6)
    assert rows[(y, x)].pmi == got.pmi


# ---------------------------------------------------------------------------
# assignment0.md prefix counts (the only other published numbers whose
# arithmetic is replayable without the missing corpora — see COVERAGE.md).
#
# The graded corpora are absent (.MISSING_LARGE_BLOBS), so the slice is
# reconstructed the same way as the PMI goldens above: a corpus whose
# token stream — under the REFERENCE's exact tokenization
# (PrefixCount.java:50-53: whitespace split, lowercase, strip
# leading/trailing non-[a-z], drop len<2) — contains exactly the published
# number of tokens per prefix. The surface forms deliberately exercise
# every rule (mixed case, punctuation wrapping, digit-prefix stripping,
# len-1 and all-symbol drops), so the test pins the tokenizer semantics,
# the len>=2 gate, and the substring/group/count pipeline end to end
# against the published figures.

# assignment0.md Q1+Q2 (Shakespeare): top-3 prefixes and the 'li' count
A0_SHAKESPEARE = {"th": 83289, "an": 32003, "to": 23826, "li": 6532}
# assignment0.md Q4+Q5 (large corpus): same queries at ~35M tokens
A0_BIG = {"th": 18487894, "in": 8165787, "an": 7399686, "li": 1303312}

# four surface forms per prefix, all tokenizing to a <prefix>-led word of
# len>=2; index by row-id % 4 so every rule is hit many times
_FORMS = {
    "th": ["The!", "tHis,", "12th", "  'THOU"],
    "an": ["and", "AN", "(answer)", "3an"],
    "to": ["to.", "TOmorrow", '"too"', "to"],
    "li": ["life", "LIght;", "li", "9lie!"],
    "in": ["in", "INto:", "(inner)", "7in"],
}
# appended to every line; contributes NOTHING after tokenization:
# len-1 token, all-digit token (strips to empty), all-symbol token
_NOISE = " a 42 !!"


def _prefix_corpus(spark, counts, chunk=20_000):
    """One row per chunk of up to ``chunk`` same-form tokens (big counts
    would be too slow one-row-per-token); forms rotate per row."""
    parts = []
    for p, total in counts.items():
        forms = _FORMS[p]
        n_rows = (total + chunk - 1) // chunk
        rows = spark.range(n_rows).select(
            F.col("id"),
            F.lit(p).alias("p"),
            F.when(F.col("id") < n_rows - 1, F.lit(chunk))
            .otherwise(F.lit(total - (n_rows - 1) * chunk))
            .alias("n"),
        )
        form = None
        for i, f in enumerate(forms):
            c = F.when(F.col("id") % 4 == i, F.lit(f))
            form = c if form is None else form.when(F.col("id") % 4 == i, F.lit(f))
        parts.append(rows.select(
            F.concat(
                F.array_join(F.array_repeat(form, F.col("n").cast("int")), " "),
                F.lit(_NOISE),
            ).alias("text")
        ))
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    )


@pytest.mark.parametrize("published", [A0_SHAKESPEARE, A0_BIG],
                         ids=["shakespeare_q1_q2", "big_corpus_q4_q5"])
def test_prefix_count_matches_published_assignment0_values(
    spark, tmp_path, published
):
    from bigdata2016w_spark.plans.text_analytics import prefix_count

    d = tmp_path / "a0"
    d.mkdir()
    _prefix_corpus(spark, published).write.parquet(
        str(d / "documents.parquet"))
    got = {r.prefix: r.cnt for r in prefix_count(spark, str(d)).collect()}
    assert got == published
    # Q1/Q4 publish the TOP-3 ordering — it must hold exactly
    top3 = sorted(got.items(), key=lambda kv: -kv[1])[:3]
    want3 = sorted(published.items(), key=lambda kv: -kv[1])[:3]
    assert top3 == want3


# ---------------------------------------------------------------------------
# assignment2.md:17-29 bigram relative frequencies — the GRADER'S expected
# values, i.e. the numbers the reference got WRONG. The deduction detail
# shows the reference emitting f(till|faithfully) = f(you|faithfully) = 1.0
# where the grader expected 0.16666667 (= 1/6 at the reference's float32
# output formatting): its pairs job computed the (w1,*) marginal per
# reducer stream, so a w1 whose bigrams straddled a partition boundary
# normalized against a partial total. The engine's marginal is a window
# sum over ALL of w1's bigrams (plans/text_analytics.py:90), correct by
# construction regardless of input partitioning — these are the published
# numbers the fix is FOR.
#
# The graded corpus is absent (.MISSING_LARGE_BLOBS), but 0.16666667 pins
# the count shape exactly: c(faithfully,till) = c(faithfully,you) = 1 with
# c(faithfully,*) = 6 (any k/6k with k>1 would have made 1.0 impossible
# for BOTH pairs simultaneously under the reference's bug, and the grader
# diff shows each pair once). The slice below replays that shape, spread
# across many input partitions so a per-partition marginal could never
# produce 1/6 — the engine must anyway.

A2_FOLLOWERS = ["till", "you", "serve", "bound", "love", "obey"]


@pytest.mark.parametrize("variant", ["pairs", "stripes"])
def test_bigram_relfreq_matches_published_assignment2_values(
    spark, tmp_path, variant
):
    from bigdata2016w_spark.registry import all_specs

    d = tmp_path / f"a2_{variant}"
    d.mkdir()
    rows = [(i, f"faithfully {w}") for i, w in enumerate(A2_FOLLOWERS)]
    # filler docs so "faithfully" is not the only w1 and the slice spans
    # every partition (the bug being replayed was a partition-boundary one)
    rows += [(100 + i, "and more and") for i in range(18)]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(24)
        .write.parquet(str(d / "documents.parquet"))
    )
    q = all_specs()[f"bigram_relfreq_{variant}"]
    got = {(r.w1, r.w2): r for r in q.fn(spark, str(d)).collect()}
    for w2 in ("till", "you"):
        r = got[("faithfully", w2)]
        assert r.cnt == 1
        assert r.rel_freq == 1 / 6  # exact double, not the buggy 1.0
        # the published grader string, at its 8-decimal formatting
        assert round(r.rel_freq, 8) == 0.16666667
