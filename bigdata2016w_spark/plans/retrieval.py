"""Registered index/retrieval queries (a3/a7) with DuckDB oracles.

Driver-facing results are flat columns (term stats, term postings rows,
retrieval hits) so value-hash comparison never depends on nested-type
normalization; the nested postings-array form is covered by pytest
(tests/test_retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.functions.tokenizer import tokenize_sql
from bigdata2016w_spark.operators.retrieval import bm25_rank, postings_flat, retrieve
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

# Fixed demo queries over the synthetic corpus vocabulary.
RPN_AND = "table part AND"
RPN_OR_AND = "query stream OR table AND"
POSTINGS_TERMS = ("table", "stream", "vector")


def index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term document frequency + collection frequency
    (the df/postings accumulation of BuildInvertedIndexCompressed.java:107-175)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        postings_flat(docs)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )


def term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat postings rows for a fixed term set — the point-lookup path that
    replaces MapFile/HBase gets (BooleanRetrievalHBase.java:124-141)."""
    docs = load_table(spark, sf_dir, "documents")
    return postings_flat(docs).where(F.col("term").isin(*POSTINGS_TERMS))


def retrieval_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RPN 'table part AND' (BooleanRetrievalCompressed.java:83-96)."""
    return retrieve(load_table(spark, sf_dir, "documents"), RPN_AND)


def retrieval_or_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RPN '(query OR stream) AND table' (BooleanRetrievalCompressed.java:58-113)."""
    return retrieve(load_table(spark, sf_dir, "documents"), RPN_OR_AND)


BM25_TERMS = ("table", "query", "stream")
BM25_K1, BM25_B = 1.2, 0.75


def retrieval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BM25-ranked docs for the fixed 3-term query."""
    return bm25_rank(load_table(spark, sf_dir, "documents"), list(BM25_TERMS))


_TOK = tokenize_sql("text")

_FLAT = f"""
flat AS (
  SELECT term, doc_id AS docid, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
  GROUP BY term, doc_id
)
"""

_INDEX_STATS_SQL = f"""
WITH {_FLAT}
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM flat GROUP BY term
"""

_TERM_POSTINGS_SQL = f"""
WITH {_FLAT}
SELECT term, docid, tf FROM flat
WHERE term IN ('{POSTINGS_TERMS[0]}', '{POSTINGS_TERMS[1]}', '{POSTINGS_TERMS[2]}')
"""

_RETRIEVAL_AND_SQL = f"""
WITH x AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS term FROM documents)
SELECT d.doc_id, d.text
FROM (
  SELECT doc_id FROM x WHERE term = 'table'
  INTERSECT
  SELECT doc_id FROM x WHERE term = 'part'
) r JOIN documents d USING (doc_id)
"""

_RETRIEVAL_OR_AND_SQL = f"""
WITH x AS (SELECT doc_id, unnest(list_distinct({_TOK})) AS term FROM documents)
SELECT d.doc_id, d.text
FROM (
  (SELECT doc_id FROM x WHERE term = 'query'
   UNION
   SELECT doc_id FROM x WHERE term = 'stream')
  INTERSECT
  SELECT doc_id FROM x WHERE term = 'table'
) r JOIN documents d USING (doc_id)
"""

register(QuerySpec("index_stats", index_stats, _INDEX_STATS_SQL,
                   doc=index_stats.__doc__))
register(QuerySpec("term_postings", term_postings, _TERM_POSTINGS_SQL,
                   doc=term_postings.__doc__))
register(QuerySpec("retrieval_and", retrieval_and, _RETRIEVAL_AND_SQL,
                   doc=retrieval_and.__doc__))
register(QuerySpec("retrieval_or_and", retrieval_or_and, _RETRIEVAL_OR_AND_SQL,
                   doc=retrieval_or_and.__doc__))

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

_BM25_SQL = f"""
WITH {_FLAT},
dl AS (SELECT docid, CAST(sum(tf) AS BIGINT) AS dl FROM flat GROUP BY docid),
avgdl AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
hits AS (SELECT * FROM flat WHERE term IN ({_BM25_TERMS_SQL})),
df_t AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.docid,
         round(sum(
           ln((n.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (h.tf * (1.0 + {BM25_K1}))
           / (h.tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * l.dl / a.avgdl))
         ), 6) AS score
  FROM hits h
  JOIN df_t d USING (term)
  JOIN dl l USING (docid)
  CROSS JOIN avgdl a CROSS JOIN n
  GROUP BY h.docid
)
SELECT docid, score FROM scored
ORDER BY score DESC, docid ASC LIMIT 10
"""

register(QuerySpec("retrieval_bm25", retrieval_bm25, _BM25_SQL,
                   doc=retrieval_bm25.__doc__))


PHRASE = ["table", "hash"]


def retrieval_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase query over positional postings (extension past the
    reference's boolean-only surface)."""
    from bigdata2016w_spark.operators.retrieval import phrase_query

    return phrase_query(
        load_table(spark, sf_dir, "documents"), PHRASE
    ).orderBy("docid")


_PHRASE_SQL = f"""
WITH t AS (
  SELECT doc_id AS docid, {tokenize_sql('text')} AS w FROM documents
),
pos AS (
  SELECT docid, unnest(w) AS term,
         unnest(range(len(w))) AS p
  FROM t
),
a AS (SELECT docid, p FROM pos WHERE term = '{PHRASE[0]}'),
b AS (SELECT docid, p - 1 AS p FROM pos WHERE term = '{PHRASE[1]}')
SELECT a.docid, count(*) AS n_matches
FROM a JOIN b ON a.docid = b.docid AND a.p = b.p
GROUP BY a.docid
ORDER BY a.docid
"""

register(QuerySpec("retrieval_phrase", retrieval_phrase, _PHRASE_SQL,
                   doc=retrieval_phrase.__doc__))


PROX_A, PROX_B, PROX_W = "merge", "sort", 3


def retrieval_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/w proximity retrieval (extension past the reference's
    boolean-only surface): docs where two terms co-occur within 3
    positions, with pair count and minimum distance."""
    from bigdata2016w_spark.operators.retrieval import proximity_query

    return proximity_query(
        load_table(spark, sf_dir, "documents"), PROX_A, PROX_B, PROX_W
    ).orderBy("docid")


_PROXIMITY_SQL = f"""
WITH t AS (
  SELECT doc_id AS docid, {tokenize_sql('text')} AS w FROM documents
),
pos AS (
  SELECT docid, unnest(w) AS term,
         unnest(range(len(w))) AS p
  FROM t
),
a AS (SELECT docid, p FROM pos WHERE term = '{PROX_A}'),
b AS (SELECT docid, p FROM pos WHERE term = '{PROX_B}'),
pairs AS (
  SELECT a.docid, abs(a.p - b.p) AS d
  FROM a JOIN b ON a.docid = b.docid
)
SELECT docid,
       CAST(sum(CASE WHEN d <= {PROX_W} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(min(d) AS INTEGER) AS min_dist
FROM pairs
GROUP BY docid
HAVING sum(CASE WHEN d <= {PROX_W} THEN 1 ELSE 0 END) > 0
ORDER BY docid
"""

register(QuerySpec("retrieval_proximity", retrieval_proximity,
                   _PROXIMITY_SQL, doc=retrieval_proximity.__doc__))
