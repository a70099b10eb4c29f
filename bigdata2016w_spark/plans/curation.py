"""Corpus-curation analytics beyond near-dup removal — the repetition /
contamination / duplicated-span filters a large-scale training-data
pipeline runs before (or alongside) dedup. No reference counterpart (the
reference stops at tokenize/count, ``SCALA/assignment2/Tokenizer.scala``);
these are the engine's LLM-pipeline extension, modeled on the public C4 /
Gopher filtering recipes.

Every query is a composition of explode → hash aggregate → equi-join, so
each is one-or-two-shuffle scalable: no windows over raw rows, no
quadratic candidate sets, broadcast only for the (small) benchmark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bigdata2016w_spark.functions.textstats import EN_STOP, quality_sql
from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_sql
from bigdata2016w_spark.operators.dedup import shingle_sets
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

# stand-in "benchmark" set for contamination checks: in production this is
# the eval-benchmark corpus; here the first docs of the table
BENCH_MAX_DOC_ID = 10


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of tokens
    that are repeats (1 − distinct/n), the most-frequent-token fraction,
    and the most-frequent-bigram fraction. High values flag boilerplate /
    degenerate text for removal.

    Shape: explode → (doc, token) count → per-doc max/sum — two partial-
    aggregated shuffles, no per-doc window.
    """
    toks = docs.select("doc_id", tokenize("text").alias("t")).where(
        F.size("t") >= 2
    )
    tok = toks.select("doc_id", F.explode("t").alias("w"))
    tc = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    uni = tc.groupBy("doc_id").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("n"),
        F.count("*").alias("d"),
    )
    # r13 (guide §4.1): arrays_zip over shifted slices + post-explode
    # concat instead of the interpreted transform/element_at HOF —
    # codegen'd, ~1.7x faster on the generator pass, identical rows
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("x"),
                F.slice("t", 2, F.size("t") - 1).alias("y"),
            )
        ).alias("z"),
    ).select("doc_id", F.concat_ws(" ", "z.x", "z.y").alias("b"))
    bc = bigrams.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    bagg = bc.groupBy("doc_id").agg(
        F.max("c").alias("bmx"), F.sum("c").alias("bn")
    )
    return (
        uni.join(bagg, "doc_id")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(
                F.lit(1.0) - F.col("d").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("dup_token_frac"),
            F.round(
                F.col("mx").cast("double") / F.col("n").cast("double"), 6
            ).alias("top_token_frac"),
            F.round(
                F.col("bmx").cast("double") / F.col("bn").cast("double"), 6
            ).alias("top_bigram_frac"),
        )
    )


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def contamination(docs: DataFrame,
                  bench_max_doc_id: int = BENCH_MAX_DOC_ID,
                  shingled: DataFrame | None = None) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing ≥1
    3-gram shingle with the benchmark set (doc_id < bench_max_doc_id),
    with the count of distinct shared shingles and the contaminated
    fraction of the doc's shingle set.

    Shape: the benchmark shingle set is tiny → broadcast equi-join against
    the exploded corpus shingles; per-doc count-distinct aggregate. At
    100 TB the corpus side streams through one scan — cost is linear in
    corpus shingles, independent of corpus pair count.
    """
    sh = shingled if shingled is not None else shingle_sets(docs)
    bench = (
        sh.where(F.col("doc_id") < bench_max_doc_id)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corpus = sh.where(F.col("doc_id") >= bench_max_doc_id).select(
        "doc_id", F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("sh"),
    )
    return (
        corpus.join(broadcast(bench), "sh")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("shared_shingles"))
        .select(
            "doc_id",
            "shared_shingles",
            F.round(
                F.col("shared_shingles").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("contaminated_frac"),
        )
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata2016w_spark.plans.pipeline import shared_shingle_sets

    return contamination(
        load_table(spark, sf_dir, "documents"),
        shingled=shared_shingle_sets(spark, sf_dir),
    )


def dup_spans(docs: DataFrame,
              shingled: DataFrame | None = None) -> DataFrame:
    """Per-document fraction of 3-gram shingles that occur in ≥2 documents
    — the duplicated-span signal behind C4-style span-level dedup (a doc
    that is 90 % duplicated spans is boilerplate even if no single pair
    passes the Jaccard threshold).

    Shape: explode → global shingle-df count (partial agg) → join back →
    per-doc aggregate. Two shuffles, both on the shingle/doc key.
    """
    sh = shingled if shingled is not None else shingle_sets(docs)
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    sdf = ex.groupBy("sh").agg(F.countDistinct("doc_id").alias("ndocs"))
    return (
        ex.join(sdf, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias(
                "dup_shingles"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "dup_shingles",
            F.round(
                F.col("dup_shingles").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("dup_span_frac"),
        )
    )


def dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata2016w_spark.plans.pipeline import shared_shingle_sets

    return dup_spans(
        load_table(spark, sf_dir, "documents"),
        shingled=shared_shingle_sets(spark, sf_dir),
    )


_TOK = tokenize_sql("text")

_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE len({_TOK}) >= 2
),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
uni AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS n, count(*) AS d
  FROM tc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                         for i in range(1, len(t))]) AS b
  FROM toks
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
bagg AS (SELECT doc_id, max(c) AS bmx, sum(c) AS bn FROM bc GROUP BY doc_id)
SELECT uni.doc_id, CAST(n AS BIGINT) AS n_tokens,
       round(1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dup_token_frac,
       round(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top_token_frac,
       round(CAST(bmx AS DOUBLE) / CAST(bn AS DOUBLE), 6) AS top_bigram_frac
FROM uni JOIN bagg ON uni.doc_id = bagg.doc_id
"""

_SHINGLES3 = f"""
s AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS sh
  FROM (SELECT doc_id, {_TOK} AS t FROM documents)
  WHERE len(t) >= 3
)
"""

_CONTAMINATION_SQL = f"""
WITH {_SHINGLES3},
bench AS (
  SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id < {BENCH_MAX_DOC_ID}
),
corpus AS (
  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g
  FROM s WHERE doc_id >= {BENCH_MAX_DOC_ID}
)
SELECT doc_id, count(*) AS shared_shingles,
       round(CAST(count(*) AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
         AS contaminated_frac
FROM corpus JOIN bench ON corpus.g = bench.g
GROUP BY doc_id, n_shingles
"""

_DUP_SPAN_SQL = f"""
WITH {_SHINGLES3},
ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
sdf AS (SELECT g, count(DISTINCT doc_id) AS ndocs FROM ex GROUP BY g)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_shingles,
       round(CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_span_frac
FROM ex JOIN sdf ON ex.g = sdf.g
GROUP BY doc_id
"""

register(QuerySpec("doc_repetition_stats", doc_repetition_stats,
                   _REPETITION_SQL, doc=repetition_stats.__doc__))
register(QuerySpec("contamination_check", contamination_check,
                   _CONTAMINATION_SQL, doc=contamination.__doc__))
register(QuerySpec("dup_span_fraction", dup_span_fraction, _DUP_SPAN_SQL,
                   doc=dup_spans.__doc__))


SHORT_DOC_TOKENS = 20


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus report — the "data card" a curation
    pipeline publishes per slice: document count, total tokens, mean
    quality, and the short-document fraction. Per-doc quality (already
    rounded to 6 digits) is re-quantized to integer micro-units before
    the slice sum, so the mean is order-independent and engine-portable;
    everything else is exact integer math. One explode-free pass over
    per-doc stats + one hash aggregate on the (source, lang) key."""
    from bigdata2016w_spark.functions.textstats import doc_stats_cols

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.where(F.size(tokenize("text")) > 0).select(
        "source", "lang", *doc_stats_cols(F.col("text"))
    )
    q_u = F.round(F.col("quality") * 1_000_000).cast("bigint")
    return (
        stats.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(q_u).alias("q_sum"),
            F.sum(
                F.when(F.col("n_tokens") < SHORT_DOC_TOKENS, 1).otherwise(0)
            ).alias("n_short"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("q_sum").cast("double") / F.col("n_docs") / 1_000_000, 6
            ).alias("avg_quality"),
            F.round(
                F.col("n_short").cast("double") / F.col("n_docs"), 6
            ).alias("short_doc_frac"),
        )
    )


_DATACARD_SQL = f"""
WITH stats AS (
  SELECT source, lang, len({_TOK}) AS n_tokens,
         {quality_sql('text')} AS quality
  FROM documents WHERE len({_TOK}) > 0
)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(round(quality * 1000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000, 6) AS avg_quality,
       round(CAST(sum(CASE WHEN n_tokens < {SHORT_DOC_TOKENS} THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS short_doc_frac
FROM stats GROUP BY source, lang
"""

register(QuerySpec("corpus_datacard", corpus_datacard, _DATACARD_SQL,
                   doc=corpus_datacard.__doc__))


# PII patterns: a conservative subset whose semantics are identical in
# Java regex (Spark, JVM-side regexp_replace/regexp_count) and RE2
# (DuckDB) — char classes, bounded counts, \b anchors; no lookaround, no
# backrefs. Redaction order is fixed (email → ssn → phone → ip) and the
# same in both engines, so chained replacements compose identically.
PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def scrub_pii(docs: DataFrame) -> DataFrame:
    """PII detection + redaction over the text column — the scrubbing
    pass a training-data pipeline runs before anything else sees the
    corpus. Returns per-doc match counts per PII class and the redacted
    text. Pure JVM-side regexp projection: no shuffle, no UDF; at 100 TB
    this is a map-only pass that pushes column pruning to the scan."""
    counts = [
        F.regexp_count("text", F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col("text")
    for _, pat, tag in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tag)
    return docs.select("doc_id", *counts, clean.alias("clean_text"))


def documents_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: scrub the documents table, returning only docs
    that contained any PII plus a deterministic sample of clean docs
    (doc_id % 97 == 0) so the result exercises both branches at every
    scale without returning the whole corpus."""
    out = scrub_pii(load_table(spark, sf_dir, "documents"))
    any_pii = (F.col("n_email") + F.col("n_ssn")
               + F.col("n_phone") + F.col("n_ipv4")) > 0
    return out.where(any_pii | (F.col("doc_id") % 97 == 0))


def _pii_sql() -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER)"
        f" AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = "text"
    for _, pat, tag in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{tag}', 'g')"
    return f"""
SELECT doc_id, {counts}, {clean} AS clean_text
FROM documents
WHERE len(regexp_extract_all(text, '{PII_PATTERNS[0][1]}'))
      + len(regexp_extract_all(text, '{PII_PATTERNS[1][1]}'))
      + len(regexp_extract_all(text, '{PII_PATTERNS[2][1]}'))
      + len(regexp_extract_all(text, '{PII_PATTERNS[3][1]}')) > 0
   OR doc_id % 97 = 0
"""


register(QuerySpec("documents_pii_scrub", documents_pii_scrub, _pii_sql(),
                   doc=documents_pii_scrub.__doc__))


def scrub_dup_spans(docs: DataFrame, span: int = 3) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the rewrite step behind
    ``dup_spans``'s signal (the ExactSubstr dedup of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", at
    token-``span``-gram granularity): any ``span``-token window that
    occurs in ≥2 distinct documents is kept only in its OWNER (the
    min-doc_id document containing it) and its covered token positions
    are deleted everywhere else. Overlapping duplicated windows union
    their covered positions, so a long shared passage is removed whole.
    Within-document repetition (n_docs = 1) is untouched — that is
    ``doc_repetition_stats``'s axis.

    Returns (doc_id, n_tokens, n_removed, scrubbed_text) for EVERY doc —
    scrubbed_text is the kept tokens rejoined with single spaces
    (tokenized-normalized, like every text op here).

    Shape: posexplode tokens → span-gram occurrence table → global
    (count distinct docs, min doc) hash agg → equi-join back → distinct
    removed positions → anti-join → per-doc ordered reassembly via
    sort_array(collect_list(struct)). Everything keys on token/span-gram
    or doc_id: linear in corpus tokens, no pairwise candidate set, same
    two-shuffle class as ``dup_spans``. The only wide row is a doc's own
    token list — bounded by max doc length, never corpus-sized.
    """
    # widen coarse scan splits (one small parquet file = one partition)
    # so the regex tokenizer isn't single-threaded, then materialize the
    # tokenization ONCE — it feeds the occurrence table, the
    # position-token table, and the final n_tokens base; without the
    # eager cut each consumer re-runs the tokenizer over the whole corpus
    # (together measured 3.7 s → 2.9 s at sf0.1; the remainder is the
    # span-gram shuffles, inherent to the op)
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    toks = docs.select("doc_id", tokenize("text").alias("t")).localCheckpoint(
        eager=True
    )
    # occurrence table: (doc_id, pos, sh) for every span-gram.
    # r13 (guide §4.1): posexplode over arrays_zip of ``span`` shifted
    # slices replaces the interpreted transform(sequence, element_at)
    # HOF — codegen'd, same rows (pos = zip index + 1). The
    # greatest(0, ...) slice length handles the short-doc case the old
    # code guarded with when(size >= span) — zero-length slices zip to
    # an empty array and posexplode drops the row.
    glen = F.greatest(F.lit(0), F.size("t") - (span - 1))
    occ = toks.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                *[F.slice("t", k + 1, glen).alias(f"w{k}")
                  for k in range(span)]
            )
        ).alias("p0", "o"),
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("int").alias("pos"),
        F.concat_ws(
            " ", *[F.col(f"o.w{k}") for k in range(span)]
        ).alias("sh"),
    )
    # "occurs in ≥2 distinct docs" ⟺ min(doc) ≠ max(doc) per span-gram,
    # and the owner IS min(doc) — so a plain min/max aggregate replaces
    # countDistinct (no per-(sh,doc) dedup expansion). Deliberately
    # groupBy + join-back, NOT a window over the occurrence table: the
    # map-side partial min/max shrinks a boilerplate gram ("all rights
    # reserved" in half the corpus) to one row per map task, and the
    # join-back STREAMS the hot key's occurrences through its task,
    # where a window would sort-and-buffer the whole corpus-sized
    # partition frame in one task (measured 2.9 s → 1.9 s at sf0.1).
    span_stats = occ.groupBy("sh").agg(
        F.min("doc_id").alias("owner"), F.max("doc_id").alias("mx")
    )
    removed = (
        occ.join(span_stats.where(F.col("owner") != F.col("mx")), "sh")
        .where(F.col("doc_id") != F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (span - 1))
            ).alias("p"),
        )
        .distinct()
    )
    tok = toks.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = tok.join(removed, ["doc_id", "p"], "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.sort_array(F.collect_list(F.struct("p", "tok"))).tok, " "
        ).alias("scrubbed"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
        .join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("bigint").alias("n_removed"),
            F.coalesce(F.col("scrubbed"), F.lit("")).alias("scrubbed_text"),
        )
    )


def documents_scrub_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scrub_dup_spans(load_table(spark, sf_dir, "documents"))


_SCRUB_SPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents
),
occ AS (
  SELECT doc_id, o.pos AS pos, o.sh AS sh
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, len(t) - 1),
             i -> {{'pos': i,
                    'sh': t[i] || ' ' || t[i+1] || ' ' || t[i+2]}})) AS o
    FROM toks
  )
),
gstats AS (
  SELECT sh, count(DISTINCT doc_id) AS ndocs, min(doc_id) AS owner
  FROM occ GROUP BY sh
),
removed AS (
  SELECT DISTINCT doc_id, p
  FROM (
    SELECT occ.doc_id, unnest([pos, pos + 1, pos + 2]) AS p
    FROM occ JOIN gstats USING (sh)
    WHERE gstats.ndocs >= 2 AND occ.doc_id <> gstats.owner
  )
),
tok AS (
  SELECT doc_id, u.p AS p, u.tok AS tok
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> {{'p': i, 'tok': t[i]}})) AS u
    FROM toks
  )
),
kept AS (
  SELECT tok.doc_id, tok.p, tok.tok
  FROM tok ANTI JOIN removed USING (doc_id, p)
),
kept_agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS scrubbed
  FROM kept GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(toks.t) AS BIGINT) AS n_tokens,
       CAST(len(toks.t) - coalesce(kept_agg.n_kept, 0) AS BIGINT)
         AS n_removed,
       coalesce(kept_agg.scrubbed, '') AS scrubbed_text
FROM toks LEFT JOIN kept_agg USING (doc_id)
"""


register(QuerySpec("documents_scrub_dup_spans", documents_scrub_dup_spans,
                   _SCRUB_SPAN_SQL, doc=scrub_dup_spans.__doc__))
