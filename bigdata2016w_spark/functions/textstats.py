"""Text-quality statistics for training-data pipelines — pure column
expressions with DuckDB SQL twins (pipeline extension; the reference's
closest ancestors are the tokenize/count ops of a0).

All ratios are single double divisions of exact int64 counts, so values are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_sql

# tiny fixed stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
}
EN_STOP = STOPWORDS["en"]

# BPE-ish segmentation: letter runs, digit runs, single other non-space
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def lang_scores(tokens: Column) -> dict[str, Column]:
    return {lang: _count_in(tokens, ws) for lang, ws in STOPWORDS.items()}


def lang_id(tokens: Column) -> Column:
    """Argmax stopword-hit language, deterministic tie-break en > de > es."""
    s = lang_scores(tokens)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]), "en")
        .when(s["de"] >= s["es"], "de")
        .otherwise("es")
    )


def lang_id_sql(tok_expr: str) -> str:
    def cnt(ws):
        lst = ", ".join(f"'{w}'" for w in ws)
        return f"len(list_filter({tok_expr}, x -> x IN ({lst})))"

    en, de, es = cnt(STOPWORDS["en"]), cnt(STOPWORDS["de"]), cnt(STOPWORDS["es"])
    return (
        f"CASE WHEN {en} >= {de} AND {en} >= {es} THEN 'en' "
        f"WHEN {de} >= {es} THEN 'de' ELSE 'es' END"
    )


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 fingerprint (exact-dedup key; md5 is
    engine-portable, unlike xxhash)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def fingerprint_sql(col: str) -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"


def quality_col(text: Column) -> Column:
    """The bounded [0,1] linear quality mix on its own — the ranking key
    for quality-aware survivor selection (``dedup_keep_best``) as well as
    a ``doc_stats`` output column."""
    t = tokenize(text)
    nf = F.size(t).cast("double")
    stop_ratio = _count_in(t, EN_STOP).cast("double") / nf
    ttr = F.size(F.array_distinct(t)).cast("double") / nf
    return F.round(
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * F.least(nf / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * ttr,
        6,
    )


def quality_sql(col: str) -> str:
    """DuckDB expression computing exactly ``quality_col(col)``."""
    t = tokenize_sql(col)
    stop_list = ", ".join(f"'{w}'" for w in EN_STOP)
    return (
        f"round(0.4 * (CAST(len(list_filter({t}, x -> x IN ({stop_list})))"
        f" AS DOUBLE) / CAST(len({t}) AS DOUBLE))"
        f" + 0.3 * least(CAST(len({t}) AS DOUBLE) / 100.0, 1.0)"
        f" + 0.3 * (CAST(len(list_distinct({t})) AS DOUBLE)"
        f" / CAST(len({t}) AS DOUBLE)), 6)"
    )


def doc_stats_cols(text: Column) -> list[Column]:
    """n_tokens, n_distinct, n_bpe_pieces, avg_token_len, stopword_ratio,
    type_token_ratio, quality (bounded [0,1] linear mix)."""
    t = tokenize(text)
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    stop = _count_in(t, EN_STOP)
    nf = n.cast("double")
    stop_ratio = stop.cast("double") / nf
    ttr = nd.cast("double") / nf
    quality = quality_col(text)
    return [
        # bigint: DuckDB len() yields int64 — keep schemas identical
        n.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0))
        .cast("long").alias("n_bpe_pieces"),
        (total_len.cast("double") / nf).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        quality.alias("quality"),
    ]


def doc_stats_sql(col: str) -> str:
    """SELECT-list fragment mirroring doc_stats_cols for DuckDB."""
    t = tokenize_sql(col)
    stop_list = ", ".join(f"'{w}'" for w in EN_STOP)
    return f"""
  len({t}) AS n_tokens,
  len(list_distinct({t})) AS n_distinct,
  len(regexp_extract_all(lower({col}), '{BPE_RE}')) AS n_bpe_pieces,
  CAST(list_sum(list_transform({t}, x -> length(x))) AS DOUBLE)
    / CAST(len({t}) AS DOUBLE) AS avg_token_len,
  CAST(len(list_filter({t}, x -> x IN ({stop_list}))) AS DOUBLE)
    / CAST(len({t}) AS DOUBLE) AS stopword_ratio,
  CAST(len(list_distinct({t})) AS DOUBLE)
    / CAST(len({t}) AS DOUBLE) AS type_token_ratio,
  {quality_sql(col)} AS quality
"""
