"""Distributed model-quality evaluation.

The reference graded its spam classifier with 1-ROCA% (area above the ROC
curve, as a percent — ``assignment6.md:7-40``) computed by an external
grader tool. Here AUC is a DataFrame computation via the rank-sum
(Mann-Whitney U) identity:

    AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)

One global sort (window rank with deterministic tiebreak), one
aggregation — no collect, scales to any score table. Ties in score are
handled by average-rank (the standard correction), so AUC matches the
trapezoidal ROC definition exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def roc_auc(scored: DataFrame, label_col: str = "label",
            score_col: str = "spamminess") -> DataFrame:
    """→ 1-row DataFrame (auc double, one_minus_roca_pct double, n_pos,
    n_neg). Average-rank tie handling."""
    w_rank = Window.orderBy(F.asc(score_col))
    ranked = scored.select(
        F.col(label_col).alias("y"),
        F.rank().over(w_rank).alias("rmin"),
        F.count("*").over(
            Window.partitionBy(score_col)
        ).alias("nties"),
    ).withColumn("r", F.col("rmin") + (F.col("nties") - 1) / 2.0)
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("r"))).alias("rsum"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("y") != 1.0, 1).otherwise(0)).alias("n"),
    )
    return agg.select(
        (
            (F.col("rsum") - F.col("p") * (F.col("p") + 1) / 2.0)
            / (F.col("p") * F.col("n"))
        ).alias("auc"),
        (
            F.lit(100.0)
            * (
                1.0
                - (F.col("rsum") - F.col("p") * (F.col("p") + 1) / 2.0)
                / (F.col("p") * F.col("n"))
            )
        ).alias("one_minus_roca_pct"),
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
    )
