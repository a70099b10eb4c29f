"""SGD logistic-regression spam classifier — the reference's a6 surface.

Reference shape (``SCALA/assignment6/``): ``TrainSpamClassifier.scala``
funnels every training instance into ONE group (``groupByKey(1)``) and
folds a mutable weight map sequentially: ``w[f] += (label − σ(score))·δ``
with δ=0.002 (``:37-49``); the optional shuffle trainer random-sorts lines
first (``:70-77``). ``ApplySpamClassifier.scala`` broadcasts the weight map
and scores via sparse dot product (``:51-55``); ensembles average scores or
vote by sign (``ApplyEnsembleSpamClassifier.scala:90-121``).

Spark-first design:
- the trainer is the one genuinely sequential operator in the whole engine
  (order-dependent single-threaded updates — SURVEY §7.3), so it runs as a
  single-group ``applyInPandas`` with deterministic input order: Arrow
  batches in, one Python fold, weights DataFrame out. Everything around it
  stays declarative.
- scoring is distributed: ``explode(features) ⋈ broadcast(weights)`` +
  ``groupBy(sum)`` — no driver-side weight map;
- ensembles are column expressions over per-model score columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql import types as T

DELTA = 0.002  # learning rate, TrainSpamClassifier.scala:37

_WEIGHTS_SCHEMA = T.StructType(
    [T.StructField("feature", T.IntegerType()),
     T.StructField("weight", T.DoubleType())]
)


def train_sgd(instances: DataFrame, delta: float = DELTA,
              shuffle_seed: int | None = None) -> DataFrame:
    """Train on DataFrame[docid string, label double(1=spam/0=ham),
    features array<int>] → DataFrame[feature int, weight double].

    Deterministic: instances are processed in ascending ``docid`` order (or
    seeded-random order when ``shuffle_seed`` is set — the shuffle trainer
    of TrainSpamClassifier.scala:70-77, here ``orderBy(rand(seed))``).
    """
    import math

    # The processing order is carried as a COLUMN and applied inside the
    # fold — never rely on row order surviving the applyInPandas shuffle
    # (Spark does not contract it). Seeded-shuffle order (the shuffle
    # trainer, TrainSpamClassifier.scala:70-77) = sort by rand(seed).
    if shuffle_seed is not None:
        ordered = instances.withColumn("__ord", F.rand(shuffle_seed))
    else:
        ordered = instances.withColumn("__ord", F.lit(0.0))
    # single logical group → one applyInPandas task does the sequential fold
    # (the groupByKey(1) at TrainSpamClassifier.scala:90)
    ordered = ordered.withColumn("g", F.lit(0))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", "docid"], kind="mergesort")
        w: dict[int, float] = {}
        get = w.get
        # zip over raw columns: same sequential semantics as iterrows,
        # ~5× less per-row overhead (this fold is the one single-threaded
        # stage in the engine, so constant factors matter)
        for label, feats in zip(pdf["label"], pdf["features"]):
            score = 0.0
            for f in feats:
                score += get(f, 0.0)
            prob = 1.0 / (1.0 + math.exp(-score))
            grad = (label - prob) * delta
            for f in feats:
                w[f] = get(f, 0.0) + grad
        return pd.DataFrame(
            {"feature": list(w.keys()), "weight": list(w.values())}
        )

    return ordered.groupBy("g").applyInPandas(fold, _WEIGHTS_SCHEMA)


def score(instances: DataFrame, weights: DataFrame,
          score_col: str = "spamminess") -> DataFrame:
    """Sparse dot product per instance (ApplySpamClassifier.scala:51-55).

    Distributed: explode features, broadcast-join the weight table, sum per
    doc. Docs whose features all miss the model score 0.
    """
    exploded = instances.select(
        "docid", F.explode_outer("features").alias("feature")
    )
    partial = (
        exploded.join(broadcast(weights), "feature", "left")
        .groupBy("docid")
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias(score_col))
    )
    return instances.select("docid", "label").join(partial, "docid").select(
        "docid", "label", F.col(score_col),
        F.when(F.col(score_col) > 0, "spam").otherwise("ham").alias("prediction"),
    )


def ensemble_average(scored: list[DataFrame]) -> DataFrame:
    """Mean of per-model scores (ApplyEnsembleSpamClassifier.scala:90-98)."""
    return _ensemble(scored, lambda cols: sum(cols) / len(cols))


def ensemble_vote(scored: list[DataFrame]) -> DataFrame:
    """Sum of per-model score signs (ApplyEnsembleSpamClassifier.scala:99-121)."""
    return _ensemble(scored, lambda cols: sum(F.signum(c) for c in cols))


def _ensemble(scored: list[DataFrame], combine) -> DataFrame:
    joined = None
    for i, s in enumerate(scored):
        part = s.select("docid", "label",
                        F.col("spamminess").alias(f"s{i}"))
        joined = part if joined is None else joined.join(
            part.drop("label"), "docid")
    cols = [F.col(f"s{i}") for i in range(len(scored))]
    final = combine(cols)
    return joined.select(
        "docid", "label", final.alias("spamminess"),
        F.when(final > 0, "spam").otherwise("ham").alias("prediction"),
    )
