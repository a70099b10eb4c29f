"""Text analytics — the reference's a0/a1/a2 surface on ``documents``.

Workloads:
- word count / 2-char prefix count (``JAVA/assignment0/WordCount.java``,
  ``PrefixCount.java``);
- bigram relative frequency, pairs & stripes physical variants
  (``SCALA/assignment2/ComputeBigramRelativeFrequency{Pairs,Stripes}.scala``);
- line-window PMI with the reference's ≥10 co-occurrence threshold and
  first-100-token cap (``JAVA/assignment1/PairsPMI.java``, ``StripesPMI.java``).

Design notes (Spark-first, scale-first):
- tokenization is a pure column expression (whole-stage codegen, no UDF);
- the reference's order-inversion trick for marginals
  (``ComputeBigramRelativeFrequencyPairs.scala:15-26`` — which has a known
  partition-boundary bug, ``assignment2.md:17-29``) becomes a window
  ``sum().over(partitionBy(w1))``: correct at any partitioning;
- the reference's 2-job side-file PMI plumbing (``PairsPMI.java:178-208``)
  becomes ordinary joins of three aggregates over one exploded-token DF;
- PMI arithmetic stays in exact int64 until a single double division, so
  results are bit-comparable; only log10 (libm-dependent) is rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_sql
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

PMI_MIN_COOCCUR = 10   # PairsPMI.java:115
PMI_TOKEN_CAP = 100    # PairsPMI.java:62


def _tokens_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", tokenize("text").alias("t"))


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a0 word count: token → occurrence count (WordCount.java:42-53)."""
    return (
        _tokens_df(spark, sf_dir)
        .select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def prefix_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a0 prefix count: 2-char prefixes of tokens with len≥2
    (PrefixCount.java:51-52)."""
    return (
        _tokens_df(spark, sf_dir)
        .select(F.explode("t").alias("word"))
        .where(F.length("word") >= 2)
        .select(F.substring("word", 1, 2).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("cnt"))
    )


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens_df(spark, sf_dir).where(F.size("t") >= 2)
    # r13 (guide §4.1): arrays_zip over shifted slices instead of the
    # interpreted transform/element_at HOF — codegen'd, 2.3x faster on
    # the generator pass, identical row multiset
    bigrams = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    return bigrams.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))


def bigram_relfreq_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a2 bigram relative frequency f(w2|w1) = c(w1,w2)/c(w1,*).

    Pairs semantics (ComputeBigramRelativeFrequencyPairs.scala:40-56); the
    marginal is a window sum, which fixes the reference's partition-boundary
    bug (assignment2.md:17-29).
    """
    c = _bigram_counts(spark, sf_dir)
    w = Window.partitionBy("w1")
    return c.select(
        "w1", "w2", "cnt",
        (F.col("cnt").cast("double") / F.sum("cnt").over(w).cast("double"))
        .alias("rel_freq"),
    )


def bigram_relfreq_stripes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a2 stripes variant: same result via a MapType intermediate.

    Builds per-w1 stripes ``map<w2,cnt>`` with ``map_from_entries``
    (the HMapStIW merge of ComputeBigramRelativeFrequencyStripes.scala:33-54),
    normalizes inside the map, then explodes back to rows — exercising the
    engine's map-column surface while keeping output identical to the pairs
    variant (same oracle).
    """
    c = _bigram_counts(spark, sf_dir)
    stripes = (
        c.groupBy("w1")
        .agg(F.map_from_entries(F.collect_list(F.struct("w2", "cnt"))).alias("stripe"),
             F.sum("cnt").alias("total"))
    )
    exploded = stripes.select(
        "w1", "total", F.explode("stripe").alias("w2", "cnt")
    )
    return exploded.select(
        "w1", "w2", "cnt",
        (F.col("cnt").cast("double") / F.col("total").cast("double")).alias("rel_freq"),
    )


def pmi_over_docs(docs: DataFrame) -> DataFrame:
    """a1 PMI: log10(N·c(x,y)/(c(x)·c(y))) over line-window co-occurrence.

    Reference: 2 chained MR jobs with special marginal keys + side-file maps
    (PairsPMI.java:49-223). Here: one exploded distinct-token DF feeds the
    pair self-join, the word marginals, and (via cross-join of a 1-row agg)
    the line count N. Thresholds: cnt ≥ 10 pairs (PairsPMI.java:115), first
    100 tokens per line (PairsPMI.java:62). All counting stays int64; one
    double division; log10 rounded to 6 (libm last-ulp differences —
    also covers the reference's float32 PMI argument, PairsPMI.java:217,
    whose drift vs double is ~1e-8; see the assignment1.md golden test).
    """
    x = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.slice(tokenize("text"), 1, PMI_TOKEN_CAP)))
        .alias("w"),
    )
    a, b = x.alias("a"), x.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.w") != F.col("b.w")),
    ).select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= PMI_MIN_COOCCUR)
    )
    wc = x.groupBy("w").agg(F.count("*").alias("cw"))
    n = docs.agg(F.count("*").alias("n_lines"))
    return (
        pc.join(broadcast(wc.selectExpr("w AS w1", "cw AS c1")), "w1")
        .join(broadcast(wc.selectExpr("w AS w2", "cw AS c2")), "w2")
        .crossJoin(broadcast(n))
        .select(
            "w1", "w2", "cnt",
            F.round(
                F.log10((F.col("n_lines") * F.col("cnt")).cast("double")
                        / (F.col("c1") * F.col("c2")).cast("double")),
                6,
            ).alias("pmi"),
        )
    )


def pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_over_docs(load_table(spark, sf_dir, "documents"))


# --- DuckDB oracles ---

_TOK = tokenize_sql("text")

_WORD_COUNT_SQL = f"""
WITH toks AS (SELECT {_TOK} AS t FROM documents),
w AS (SELECT unnest(t) AS word FROM toks)
SELECT word, count(*) AS cnt FROM w GROUP BY word
"""

_PREFIX_COUNT_SQL = f"""
WITH toks AS (SELECT {_TOK} AS t FROM documents),
w AS (SELECT unnest(t) AS word FROM toks)
SELECT substr(word, 1, 2) AS prefix, count(*) AS cnt
FROM w WHERE length(word) >= 2 GROUP BY prefix
"""

_RELFREQ_SQL = f"""
WITH toks AS (SELECT {_TOK} AS t FROM documents),
bg AS (
  SELECT unnest([{{'w1': t[i], 'w2': t[i+1]}} for i in range(1, len(t))]) AS b
  FROM toks WHERE len(t) >= 2
),
c AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS cnt FROM bg GROUP BY 1, 2)
SELECT w1, w2, cnt,
       CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY w1) AS DOUBLE)
         AS rel_freq
FROM c
"""

_PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(({_TOK})[1:{PMI_TOKEN_CAP}]) AS u FROM documents
),
x AS (SELECT doc_id, unnest(u) AS w FROM toks),
pc AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS cnt
  FROM x a JOIN x b ON a.doc_id = b.doc_id AND a.w <> b.w
  GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COOCCUR}
),
wc AS (SELECT w, count(*) AS cw FROM x GROUP BY w),
n AS (SELECT count(*) AS n_lines FROM documents)
SELECT pc.w1, pc.w2, pc.cnt,
       round(log10(CAST(n.n_lines * pc.cnt AS DOUBLE)
                   / CAST(cx.cw * cy.cw AS DOUBLE)), 6) AS pmi
FROM pc
JOIN wc cx ON pc.w1 = cx.w
JOIN wc cy ON pc.w2 = cy.w
CROSS JOIN n
"""

register(QuerySpec("word_count", word_count, _WORD_COUNT_SQL, doc=word_count.__doc__))
register(QuerySpec("prefix_count", prefix_count, _PREFIX_COUNT_SQL,
                   doc=prefix_count.__doc__))
register(QuerySpec("bigram_relfreq_pairs", bigram_relfreq_pairs, _RELFREQ_SQL,
                   doc=bigram_relfreq_pairs.__doc__))
register(QuerySpec("bigram_relfreq_stripes", bigram_relfreq_stripes, _RELFREQ_SQL,
                   doc=bigram_relfreq_stripes.__doc__))
register(QuerySpec("pmi_pairs", pmi_pairs, _PMI_SQL, doc=pmi_pairs.__doc__))
