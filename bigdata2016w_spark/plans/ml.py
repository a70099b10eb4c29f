"""Registered ML queries (a6). The sequential SGD fold is order-dependent
Python (non-SQL-expressible → rows-only driver check); pytest validates
learning behavior and ensemble algebra instead.

Instances are derived deterministically from ``documents``: features are
Murmur3-hashed tokens (JVM-side ``hash()``, the engine twin of the
reference's pre-hashed int features), label = 1.0 for even doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.functions.tokenizer import tokenize, tokenize_sql
from bigdata2016w_spark.operators.sgd import (
    ensemble_average,
    ensemble_vote,
    score,
    train_sgd,
)
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

FEATURE_SPACE = 1 << 18


def doc_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (docid, label, features array<int>).

    docid zero-padded so lexicographic order == numeric order (the trainer
    sorts by docid for determinism)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("docid"),
        F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0).alias("label"),
        F.transform(
            tokenize("text"), lambda x: F.pmod(F.hash(x), F.lit(FEATURE_SPACE))
        ).alias("features"),
    )


def sgd_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train one SGD model on the 80% split (doc_id % 5 != 0), score the
    held-out 20% — the TrainSpamClassifier → ApplySpamClassifier pipeline."""
    inst = doc_instances(spark, sf_dir)
    train = inst.where((F.col("docid").cast("long") % 5) != 0)
    test = inst.where((F.col("docid").cast("long") % 5) == 0)
    weights = train_sgd(train)
    return score(test, weights).select(
        "docid", "label", F.round("spamminess", 6).alias("spamminess"), "prediction"
    )


def sgd_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-model ensemble (trained on doc_id % 3 buckets), averaged scores +
    sign votes on the common held-out split
    (ApplyEnsembleSpamClassifier.scala:90-121)."""
    inst = doc_instances(spark, sf_dir)
    test = inst.where((F.col("docid").cast("long") % 5) == 0)
    scored = []
    for b in range(3):
        train = inst.where(
            ((F.col("docid").cast("long") % 5) != 0)
            & ((F.col("docid").cast("long") % 3) == b)
        )
        scored.append(score(test, train_sgd(train)))
    avg = ensemble_average(scored).select(
        "docid", "label",
        F.round("spamminess", 6).alias("avg_score"),
        F.col("prediction").alias("avg_prediction"),
    )
    vote = ensemble_vote(scored).select(
        "docid",
        F.col("spamminess").alias("votes"),
        F.col("prediction").alias("vote_prediction"),
    )
    return avg.join(vote, "docid")


def sgd_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out ROC-AUC of the single SGD model — the engine twin of the
    reference's 1-ROCA% quality metric (assignment6.md:7-40), computed
    distributed via the rank-sum identity (operators/evaluation.py).
    Rounded for cross-run bit stability."""
    from bigdata2016w_spark.operators.evaluation import roc_auc

    scored = sgd_scores(spark, sf_dir)
    out = roc_auc(scored, label_col="label", score_col="spamminess")
    return out.select(
        F.round("auc", 6).alias("auc"),
        F.round("one_minus_roca_pct", 4).alias("one_minus_roca_pct"),
        "n_pos", "n_neg",
    )


register(QuerySpec("sgd_scores", sgd_scores, None, doc=sgd_scores.__doc__))
register(QuerySpec("sgd_ensemble", sgd_ensemble, None, doc=sgd_ensemble.__doc__))
register(QuerySpec("sgd_auc", sgd_auc, None, doc=sgd_auc.__doc__))


def _closed_form_weights(inst: DataFrame, a: int, b: int) -> DataFrame:
    """Deterministic SQL-replayable weight table over the token vocab:
    w(tok) = (a·ascii(tok[0]) + b·length(tok)) % 19 − 9. Integer-valued
    doubles, so every downstream sum is exact in IEEE754 regardless of
    order — bit-identical across engines."""
    vocab = inst.select(F.explode("features").alias("feature")).distinct()
    return vocab.select(
        "feature",
        ((F.ascii(F.substring("feature", 1, 1)) * a
          + F.length("feature") * b) % 19 - 9)
        .cast("double").alias("weight"),
    )


def _token_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_instances with RAW TOKENS as features instead of Murmur3 hashes
    (Spark's hash() is not replayable in the DuckDB oracle; the hashing is
    orthogonal plumbing pinned by the rows-only pipelines + pytest)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("docid"),
        F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0).alias("label"),
        tokenize("text").alias("features"),
    )


def sgd_score_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED scoring machinery (operators/sgd.score: explode ⋈
    broadcast(weights) → per-doc sum → sign prediction) under a
    closed-form weight table, so it is DuckDB-oracle-verified the way
    auc_rank_check verifies roc_auc — sgd_scores itself stays rows-only
    because its weights come from the sequential fold
    (TrainSpamClassifier.scala:37-49)."""
    from bigdata2016w_spark.operators.sgd import score as sgd_score

    inst = _token_instances(spark, sf_dir)
    test = inst.where((F.col("docid").cast("long") % 5) == 0)
    weights = _closed_form_weights(inst, 7, 13)
    return (
        sgd_score(test, weights)
        .select("docid", "label", "spamminess", "prediction")
        .orderBy("docid")
    )


def sgd_ensemble_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble average + sign-vote algebra
    (ApplyEnsembleSpamClassifier.scala:90-121) over three closed-form
    scorers — oracle-verifies operators/sgd.ensemble_average /
    ensemble_vote exactly (integer-valued model scores ⇒ the mean's
    single division and the sign votes are bit-identical across
    engines)."""
    from bigdata2016w_spark.operators.sgd import (
        ensemble_average as e_avg,
        ensemble_vote as e_vote,
        score as sgd_score,
    )

    inst = _token_instances(spark, sf_dir)
    test = inst.where((F.col("docid").cast("long") % 5) == 0)
    scored = [
        sgd_score(test, _closed_form_weights(inst, a, b))
        for a, b in ((7, 13), (5, 11), (3, 17))
    ]
    avg = e_avg(scored).select(
        "docid", "label",
        F.col("spamminess").alias("avg_score"),
        F.col("prediction").alias("avg_prediction"),
    )
    vote = e_vote(scored).select(
        "docid",
        F.col("spamminess").alias("votes"),
        F.col("prediction").alias("vote_prediction"),
    )
    return avg.join(vote, "docid").orderBy("docid")


_TOKEN_INST_SQL = f"""
  SELECT lpad(CAST(doc_id AS VARCHAR), 8, '0') AS docid,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS label,
         {tokenize_sql('text')} AS features
  FROM documents
"""

_SCORE_CF_SQL_TMPL = """
  SELECT t.docid,
         COALESCE(SUM(w.weight), 0.0) AS s
  FROM test t
  LEFT JOIN (SELECT docid, unnest(features) AS feature FROM test) ex
    ON ex.docid = t.docid
  LEFT JOIN (
    SELECT feature,
           CAST((ascii(substring(feature, 1, 1)) * {a}
                 + length(feature) * {b}) % 19 - 9 AS DOUBLE) AS weight
    FROM (SELECT DISTINCT unnest(features) AS feature FROM inst)
  ) w ON w.feature = ex.feature
  GROUP BY t.docid
"""

_SCORE_CF_SQL = f"""
WITH inst AS ({_TOKEN_INST_SQL}),
test AS (SELECT * FROM inst WHERE CAST(docid AS BIGINT) % 5 = 0),
s AS ({_SCORE_CF_SQL_TMPL.format(a=7, b=13)})
SELECT t.docid, t.label, s.s AS spamminess,
       CASE WHEN s.s > 0 THEN 'spam' ELSE 'ham' END AS prediction
FROM test t JOIN s ON s.docid = t.docid
ORDER BY t.docid
"""

_ENSEMBLE_CF_SQL = f"""
WITH inst AS ({_TOKEN_INST_SQL}),
test AS (SELECT * FROM inst WHERE CAST(docid AS BIGINT) % 5 = 0),
s0 AS ({_SCORE_CF_SQL_TMPL.format(a=7, b=13)}),
s1 AS ({_SCORE_CF_SQL_TMPL.format(a=5, b=11)}),
s2 AS ({_SCORE_CF_SQL_TMPL.format(a=3, b=17)})
SELECT t.docid, t.label,
       (s0.s + s1.s + s2.s) / 3 AS avg_score,
       CASE WHEN (s0.s + s1.s + s2.s) / 3 > 0 THEN 'spam' ELSE 'ham' END
         AS avg_prediction,
       CAST(sign(s0.s) + sign(s1.s) + sign(s2.s) AS DOUBLE) AS votes,
       CASE WHEN sign(s0.s) + sign(s1.s) + sign(s2.s) > 0
            THEN 'spam' ELSE 'ham' END AS vote_prediction
FROM test t
JOIN s0 ON s0.docid = t.docid
JOIN s1 ON s1.docid = t.docid
JOIN s2 ON s2.docid = t.docid
ORDER BY t.docid
"""

register(QuerySpec("sgd_score_closed_form", sgd_score_closed_form,
                   _SCORE_CF_SQL, doc=sgd_score_closed_form.__doc__))
register(QuerySpec("sgd_ensemble_closed_form", sgd_ensemble_closed_form,
                   _ENSEMBLE_CF_SQL, doc=sgd_ensemble_closed_form.__doc__))


def auc_rank_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """roc_auc over a closed-form scorer so the rank-sum AUC machinery
    itself is DuckDB-oracle-verified (sgd_auc stays rows-only because its
    scores come from the sequential fold): label = even doc_id, score =
    (doc_id·2654435761) mod 97 — 97 buckets over the corpus guarantees
    heavy score ties, exercising the average-rank correction. All rank
    arithmetic is exact-integer (see operators/evaluation.roc_auc), so
    the oracle matches bit-for-bit."""
    from bigdata2016w_spark.operators.evaluation import roc_auc

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0).alias("label"),
        ((F.col("doc_id") * 2654435761) % 97).cast("double").alias("s"),
    )
    return roc_auc(scored, label_col="label", score_col="s")


_AUC_RANK_SQL = """
WITH scored AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS label,
         CAST((doc_id * 2654435761) % 97 AS DOUBLE) AS s
  FROM documents
),
grouped AS (
  SELECT s, count(*) AS cnt,
         sum(CASE WHEN label = 1.0 THEN 1 ELSE 0 END) AS pos,
         sum(CASE WHEN label <> 1.0 THEN 1 ELSE 0 END) AS neg
  FROM scored GROUP BY s
),
ranked AS (
  SELECT *,
         sum(cnt) OVER (ORDER BY s ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM grouped
),
agg AS (
  SELECT CAST(sum(pos * (2 * cum - cnt + 1)) AS BIGINT) AS rsum2,
         CAST(sum(pos) AS BIGINT) AS p, CAST(sum(neg) AS BIGINT) AS n
  FROM ranked
)
SELECT (rsum2 - p * (p + 1)) / (2 * p * n) AS auc,
       100.0 * (1.0 - (rsum2 - p * (p + 1)) / (2 * p * n))
         AS one_minus_roca_pct,
       p AS n_pos, n AS n_neg
FROM agg
"""

register(QuerySpec("auc_rank_check", auc_rank_check, _AUC_RANK_SQL,
                   doc=auc_rank_check.__doc__))
