"""Language-model-flavored corpus scoring — the statistical quality
signals a training-data pipeline computes corpus-wide (vs the per-doc
string stats in ``functions/textstats.py``). No reference counterpart
(the reference stops at tokenize/count, ``SCALA/assignment2/
Tokenizer.scala``); these extend the engine's LLM-pipeline surface with
the public KenLM/CCNet-style recipe: score documents against a language
model estimated *from the corpus itself*.

Scale notes (all four queries):
- every aggregate is a hash aggregate with map-side partial combine;
- the model tables (unigram counts, top-K vocab, per-term df) are
  corpus-global but tiny relative to the corpus (vocab ≪ tokens), so the
  score-join is broadcast-able; left un-hinted so AQE can demote if a
  100 TB corpus ever produced a vocab past the threshold;
- per-token float surprisal is quantized to integer micro-nats BEFORE the
  per-doc sum, so the sum is order-independent — bit-identical across
  partitionings and engines (a raw double sum would be neither);
- the only windows are partitioned per-doc (TF-IDF rank), never global;
- weighted sampling is one scan + TakeOrderedAndProject (bounded per-
  partition heaps), the same shape as q7's top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_sql
from bigdata2016w_spark.operators.dedup import portable_hash60
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

# per-token surprisal quantum: micro-nats. 1e6 keeps six fractional
# digits of -ln(p) exactly (p ≥ 1/(N+V) ⇒ surprisal ≤ ~ln 4e12 ≈ 29, so
# the quantized value fits comfortably in a BIGINT even summed per doc)
LM_QUANT = 1_000_000
VOCAB_K = 30
TFIDF_TOP = 3
SAMPLE_K = 25


def _tok(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", tokenize("text").alias("t"))
        .where(F.size("t") > 0)
        .select("doc_id", F.explode("t").alias("w"))
    )


def unigram_lm_scores(docs: DataFrame) -> DataFrame:
    """Per-document average surprisal (negative log-likelihood, nats)
    under an add-one-smoothed unigram LM estimated from the corpus —
    the CCNet/KenLM-style "perplexity filter" signal, self-trained.

    prob(w) = (c(w)+1) / (N+V); score(d) = mean over tokens of
    −ln prob(w), rounded to 6 digits. Low = stereotypical text, high =
    rare-token-heavy text; both tails get filtered in curation recipes.
    """
    tok = _tok(docs)
    counts = tok.groupBy("w").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v")
    )
    surprisal = counts.crossJoin(totals).select(
        "w",
        F.round(
            -F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n_total") + F.col("v")).cast("double")
            )
            * LM_QUANT
        )
        .cast("bigint")
        .alias("su"),
    )
    return (
        tok.join(surprisal, "w")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("su").alias("s"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("s").cast("double") / F.col("n_tokens") / LM_QUANT, 6
            ).alias("avg_nll"),
        )
    )


def vocab_oov(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Top-``k`` corpus vocabulary (by frequency, ties broken
    lexicographically) and each document's out-of-vocabulary token
    fraction — the vocabulary-coverage signal behind tokenizer/vocab
    sizing decisions."""
    tok = _tok(docs)
    counts = tok.groupBy("w").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("w"))
        .limit(k)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(vocab, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_frac"),
        )
    )


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms (sklearn-style smoothed idf:
    ln((1+N)/(1+df)) + 1) — a cheap distributed document-keyword /
    feature-extraction operator. The ranking window is partitioned per
    doc_id, so it scales; ranking uses the ROUNDED score plus a
    lexicographic tie-break so the cut is deterministic and
    engine-portable."""
    tok = _tok(docs)
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("w").agg(F.count("*").alias("df"))
    ndocs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = tf.join(df_, "w").crossJoin(ndocs).select(
        "doc_id",
        F.col("w").alias("term"),
        F.round(
            F.col("tf")
            * (
                F.log(
                    (1 + F.col("n_docs")).cast("double")
                    / (1 + F.col("df")).cast("double")
                )
                + 1.0
            ),
            6,
        ).alias("tfidf"),
    )
    rank = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def weighted_sample(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis–
    Spirakis exponential-key A-ES): priority = −ln(u)/w with u a
    deterministic per-key uniform and w = n_chars; the k SMALLEST
    priorities win, so P(selection) ∝ weight. One scan +
    TakeOrderedAndProject — no shuffle of the full table, reproducible
    across runs/partitionings (the same property the engine's unweighted
    ``plans/sampling.py`` split has).

    The uniform comes from a 31-bit LCG over doc_id (integer math only,
    reduced mod 2^31 first so products never overflow int64 even for
    100 TB-scale key ranges)."""
    h = (
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * 1103515245 + 12345
    ) % 2147483648
    u = (h.cast("double") + 0.5) / 2147483648.0
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round(-F.log(u) / F.col("n_chars"), 9).alias("priority"),
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_lm_scores(load_table(spark, sf_dir, "documents"))


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_oov(load_table(spark, sf_dir, "documents"))


def doc_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "documents"))


_TOK = tokenize_sql("text")

_BASE = f"""
toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE len({_TOK}) > 0
),
tok AS (SELECT doc_id, unnest(t) AS w FROM toks)
"""

_LM_SQL = f"""
WITH {_BASE},
counts AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS n_total, count(*) AS v FROM counts),
surprisal AS (
  SELECT w,
         CAST(round(-ln(CAST(c + 1 AS DOUBLE)
                        / CAST(n_total + v AS DOUBLE)) * {LM_QUANT})
              AS BIGINT) AS su
  FROM counts CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_tokens,
       round(CAST(sum(su) AS DOUBLE) / count(*) / {LM_QUANT}, 6) AS avg_nll
FROM tok JOIN surprisal USING (w)
GROUP BY doc_id
"""

_VOCAB_SQL = f"""
WITH {_BASE},
counts AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
vocab AS (SELECT w FROM counts ORDER BY c DESC, w ASC LIMIT {VOCAB_K})
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS oov_frac
FROM tok LEFT JOIN vocab ON tok.w = vocab.w
GROUP BY doc_id
"""

_TFIDF_SQL = f"""
WITH {_BASE},
tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT doc_id, w AS term,
         round(tf * (ln(CAST(1 + n_docs AS DOUBLE)
                        / CAST(1 + df AS DOUBLE)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfreq USING (w) CROSS JOIN nd
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP}
"""

_WSAMPLE_SQL = f"""
SELECT doc_id, n_chars AS weight,
       round(-ln((CAST(((doc_id % 2147483648) * 1103515245 + 12345)
                       % 2147483648 AS DOUBLE) + 0.5) / 2147483648.0)
             / n_chars, 9) AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority ASC, doc_id ASC
LIMIT {SAMPLE_K}
"""

# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (hashed n-gram models)
# ---------------------------------------------------------------------------

# hashed-feature space size. DSIR's whole point at 100 TB: the two
# n-gram models live in a FIXED B-bucket table regardless of corpus
# vocabulary, so the model join is always broadcastable and the model
# estimation never materializes an open vocabulary.
DSIR_BUCKETS = 512
DSIR_K = 40
# the in-domain "target" sample the raw pool is scored against
DSIR_TARGET_PRED = "lang = 'en'"


def _dsir_scores(docs: DataFrame, buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Shared DSIR scoring core: (doc_id, n_tokens, s) for every
    out-of-target doc, where s = Σ per-token micro-nat log-ratio under
    the hashed-unigram target/raw models. Both selection variants
    (deterministic top-k, Gumbel-top-k sampling) rank these scores."""
    tok = (
        docs.select(
            "doc_id",
            F.expr(DSIR_TARGET_PRED).alias("is_t"),
            tokenize("text").alias("t"),
        )
        .where(F.size("t") > 0)
        .select("doc_id", "is_t", F.explode("t").alias("w"))
    )
    tokb = tok.select(
        "doc_id", "is_t",
        F.pmod(portable_hash60(F.col("w"), "dsir"), F.lit(buckets))
        .alias("b"),
    )
    # r12 (guide §2.3/§2.4): raw and target bucket counts fuse into ONE
    # aggregation over one token pass (count_if(is_t) ≡ the former
    # left-joined target count with coalesce-to-0 — a bucket with no
    # target tokens contributes ct = 0 either way), and the two scalar
    # totals ride in a single 1-row broadcast. Cuts the tokenize+hash
    # token-stream derivations from 3 to 2 (model + scoring); values
    # are bit-identical.
    counts = tokb.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.count_if(F.col("is_t")).alias("ct"),
    )
    tot = counts.agg(
        F.sum("cr").alias("n_r"), F.sum("ct").alias("n_t")
    )
    model = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("ct") + 1).cast("double")
                    # nullif replays the pre-fusion edge case exactly: with
                    # zero target tokens the old per-target aggregate was
                    # empty, its sum NULL, and every du NULL-poisoned
                    / (F.nullif(F.col("n_t"), F.lit(0)) + buckets)
                    .cast("double")
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("n_r") + buckets).cast("double")
                )
            )
            * LM_QUANT
        )
        .cast("bigint")
        .alias("du"),
    )
    return (
        tokb.where(~F.col("is_t"))
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("du").alias("s"))
    )


def dsir_importance_select(
    docs: DataFrame, buckets: int = DSIR_BUCKETS, k: int = DSIR_K
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every
    out-of-domain document by how target-like its hashed-unigram
    distribution is, and keep the top ``k``.

    Both feature models are bag-of-hashed-unigrams with Laplace
    smoothing over ``buckets`` buckets: p(b) = (c_b+1)/(N+B), estimated
    once for the target sample (``DSIR_TARGET_PRED``) and once for the
    full raw pool. A document's importance is
    Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)] — per-token terms
    quantized to integer micro-nats BEFORE the per-doc sum (the
    doc_lm_score convention) so the sum is order-independent and
    bit-identical across partitionings and engines. Selection is the
    deterministic variant: top-k by length-normalized importance
    (doc_id tiebreak); the paper's Gumbel-top-k is this plus seeded
    noise on the same scores.

    100-TB shape: each model is a hash aggregate with map-side combine
    whose output is bounded by B=512 rows — never by vocabulary — over
    a scan pruned to (text, lang); the exploded token stream is never
    materialized (re-deriving it per consumer is cheaper at corpus
    scale than checkpointing tokens ≫ docs). The score join broadcasts
    the B-row model table onto the token stream; selection is
    TakeOrderedAndProject. Nothing scales with vocabulary or corpus
    size except the linear scans.
    No reference analog; extends the LLM-pipeline surface with the
    standard pretraining data-selection recipe."""
    scored = _dsir_scores(docs, buckets).select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("s").cast("double") / F.col("n_tokens") / LM_QUANT, 6
        ).alias("logratio_per_tok"),
    )
    top = scored.orderBy(
        F.desc("logratio_per_tok"), F.asc("doc_id")
    ).limit(k)
    # global window over the ALREADY-limited k rows (TakeOrderedAndProject
    # bounds it first) — the repo's bounded-frame convention, never a
    # corpus-wide single-partition sort
    w = Window.orderBy(F.desc("logratio_per_tok"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def documents_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_importance_select(load_table(spark, sf_dir, "documents"))


_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, {DSIR_TARGET_PRED} AS is_t, {_TOK} AS t
  FROM documents WHERE len({_TOK}) > 0
),
tokb AS (
  SELECT doc_id, is_t,
         ('0x' || substr(md5('dsir:' || w), 1, 15))::BIGINT
           % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, is_t, unnest(t) AS w FROM toks)
),
raw AS (SELECT b, count(*) AS cr FROM tokb GROUP BY b),
tgt AS (SELECT b, count(*) AS ct FROM tokb WHERE is_t GROUP BY b),
nr AS (SELECT sum(cr) AS n_r FROM raw),
nt AS (SELECT sum(ct) AS n_t FROM tgt),
model AS (
  SELECT b,
         CAST(round((ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE)
                        / CAST(n_t + {DSIR_BUCKETS} AS DOUBLE))
                     - ln(CAST(cr + 1 AS DOUBLE)
                          / CAST(n_r + {DSIR_BUCKETS} AS DOUBLE)))
                    * {LM_QUANT}) AS BIGINT) AS du
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN nr CROSS JOIN nt
),
scored AS (
  SELECT doc_id, count(*) AS n_tokens, sum(du) AS s
  FROM tokb JOIN model USING (b)
  WHERE NOT is_t GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, n_tokens,
         round(CAST(s AS DOUBLE) / n_tokens / {LM_QUANT}, 6)
           AS logratio_per_tok
  FROM scored
)
SELECT doc_id, n_tokens, logratio_per_tok,
       CAST(row_number() OVER (ORDER BY logratio_per_tok DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM ranked
ORDER BY logratio_per_tok DESC, doc_id ASC
LIMIT {DSIR_K}
"""

register(QuerySpec("documents_dsir_selection", documents_dsir_selection,
                   _DSIR_SQL, doc=dsir_importance_select.__doc__))


def dsir_gumbel_sample(
    docs: DataFrame, buckets: int = DSIR_BUCKETS, k: int = DSIR_K
) -> DataFrame:
    """DSIR's actual RESAMPLING step (the paper's Gumbel-top-k):
    sampling k docs without replacement with P ∝ w(x) is exactly
    top-k over [log w(x) + Gumbel noise]. The noise is the
    deterministic per-key variant of the repo's sampling convention —
    g = −ln(−ln(u)) with u from the 31-bit LCG over doc_id
    (plans/sampling.hash_bucket family) — so the "sample" is
    reproducible across runs, partitionings, and engines, and a DuckDB
    oracle can replay it; a fresh draw is a seed change, not an RNG.

    Deterministic top-k (documents_dsir_selection) is this with the
    noise term removed — highest-importance-first; the Gumbel form
    trades a little selection quality for diversity, the trade the
    paper measures. Same scale shape as the deterministic variant:
    the B-bucket model broadcast, one scored scan,
    TakeOrderedAndProject. NOT yet registered — r13 window material
    (oracle is the _WSAMPLE_SQL LCG pattern + _DSIR_SQL scoring)."""
    scored = _dsir_scores(docs, buckets)
    h = (
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * 1103515245 + 12345
    ) % 2147483648
    u = (h.cast("double") + 0.5) / 2147483648.0
    key = F.col("s").cast("double") / LM_QUANT - F.log(-F.log(u))
    top = (
        scored.select(
            "doc_id", "n_tokens", F.round(key, 6).alias("gumbel_key")
        )
        .orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(k)
    )
    # bounded-frame global window (over the already-limited k rows)
    w = Window.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


register(QuerySpec("doc_lm_score", doc_lm_score, _LM_SQL,
                   doc=unigram_lm_scores.__doc__))
register(QuerySpec("vocab_coverage", vocab_coverage, _VOCAB_SQL,
                   doc=vocab_oov.__doc__))
register(QuerySpec("doc_tfidf_terms", doc_tfidf_terms, _TFIDF_SQL,
                   doc=tfidf_top_terms.__doc__))
register(QuerySpec("documents_weighted_sample", documents_weighted_sample,
                   _WSAMPLE_SQL, doc=weighted_sample.__doc__))


# GPT-2-flavored pre-tokenization, simplified to the regex dialect Java
# (Spark) and RE2 (DuckDB) evaluate identically (no lookahead, ASCII
# classes, leftmost-first alternation — cross-engine behavior pinned in
# the oracle): contraction suffix | space?-word | space?-number |
# space?-punctuation-run. Piece counts approximate BPE token counts the
# way tiktoken-style tokenizers split before merging.
BPE_PAT = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting, both ways a training pipeline needs it:
    whitespace words (the tokenizer the corpus stats use) and BPE-ish
    regex pieces (the pre-merge subword segmentation that approximates
    LLM token billing). pieces_per_word > ~1.3 flags code/symbol-heavy
    text that tokenizes expensively."""
    pieces = F.regexp_extract_all(F.lower("text"), F.lit(BPE_PAT), 0)
    words = tokenize("text")
    return (
        docs.select(
            "doc_id",
            F.size(words).cast("bigint").alias("n_ws_tokens"),
            F.size(pieces).cast("bigint").alias("n_bpe_pieces"),
        )
        .where(F.col("n_ws_tokens") > 0)
        .withColumn(
            "pieces_per_word",
            F.round(
                F.col("n_bpe_pieces").cast("double")
                / F.col("n_ws_tokens").cast("double"),
                6,
            ),
        )
    )


def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_stats(load_table(spark, sf_dir, "documents"))


_BPE_SQL = f"""
SELECT doc_id,
       len({tokenize_sql('text')}) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_PAT.replace("'", "''")}'))
         AS n_bpe_pieces,
       round(CAST(len(regexp_extract_all(lower(text),
                                         '{BPE_PAT.replace("'", "''")}'))
                  AS DOUBLE)
             / CAST(len({tokenize_sql('text')}) AS DOUBLE), 6)
         AS pieces_per_word
FROM documents
WHERE len({tokenize_sql('text')}) > 0
"""

register(QuerySpec("doc_bpe_token_stats", doc_bpe_token_stats, _BPE_SQL,
                   doc=bpe_token_stats.__doc__))


HH_THRESHOLD = 200


def token_heavy_hitters(docs: DataFrame,
                        threshold: int = HH_THRESHOLD) -> DataFrame:
    """Exact heavy hitters (tokens with global count ≥ threshold) found
    with two-pass candidate pruning — the scale path that avoids
    shuffling the full distinct-token universe:

    pass 1: partition-local counts via Arrow-batched ``mapInPandas``
    (aggregating across the partition's batch iterator — truly no
    shuffle); by pigeonhole any global heavy hitter has local count ≥
    threshold/numPartitions in at least one partition, so locally-heavy
    tokens form a small candidate superset;
    pass 2: exact counts for candidates only, via broadcast semi-join.

    One-sided pruning ⇒ the output is exactly ``GROUP BY token HAVING
    count ≥ threshold`` (the oracle), while the only shuffles carry the
    candidate tokens alone. On a 100 TB corpus the candidate set is
    bounded by partitions × (tokens-per-partition / local-threshold),
    orders of magnitude below the distinct-token universe a plain
    group-by would shuffle. (A declarative groupBy(partition_id, token)
    would NOT do this: the local-threshold filter only runs after the
    exchange.) Pass-1 memory is one count per distinct token per
    partition — the standard SpaceSaving-style tradeoff."""
    import pandas as pd

    tok = _tok(docs)
    # The pigeonhole bound needs an UPPER bound on the partition count
    # mapInPandas executes with — the probed count alone is not one when a
    # shuffle sits upstream (AQE may re-coalesce the probe job and the
    # real job differently). Scan splits are deterministic (covered by the
    # probe) and any post-exchange count never exceeds
    # max(explicit repartition n [probed], spark.sql.shuffle.partitions),
    # so bound by the max of both, with 2× headroom: a smaller local
    # threshold only grows the candidate superset, never drops a true
    # heavy hitter.
    shuffle_conf = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_part_upper = 2 * max(1, tok.rdd.getNumPartitions(), shuffle_conf)
    local_threshold = max(1, threshold // n_part_upper)

    def _local_heavy(batches):
        counts = None
        for pdf in batches:
            vc = pdf["w"].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
        if counts is None:
            return
        heavy = counts[counts >= local_threshold]
        yield pd.DataFrame({"w": heavy.index.astype(str)})

    candidates = tok.mapInPandas(_local_heavy, "w string").distinct()
    return (
        tok.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= threshold)
        .select(F.col("w").alias("token"), F.col("n").alias("n_occurrences"))
    )


def doc_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_heavy_hitters(load_table(spark, sf_dir, "documents"))


_HH_SQL = f"""
WITH {_BASE}
SELECT w AS token, count(*) AS n_occurrences
FROM tok GROUP BY w HAVING count(*) >= {HH_THRESHOLD}
"""

register(QuerySpec("token_heavy_hitters", doc_token_heavy_hitters, _HH_SQL,
                   doc=token_heavy_hitters.__doc__))
