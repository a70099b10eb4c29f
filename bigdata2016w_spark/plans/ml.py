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

from bigdata2016w_spark.functions.tokenizer import tokenize
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
