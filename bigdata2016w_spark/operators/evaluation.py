"""Distributed model-quality evaluation.

The reference graded its spam classifier with 1-ROCA% (area above the ROC
curve, as a percent — ``assignment6.md:7-40``) computed by an external
grader tool. Here AUC is a DataFrame computation via the rank-sum
(Mann-Whitney U) identity:

    AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)

Scale shape: the raw score table is first reduced by a *distributed*
``groupBy(score)`` (map-side partial aggregation, one hash shuffle), and
only the distinct-score table — orders of magnitude smaller than the row
count for any real score distribution — flows through the ordered
running-total window that assigns rank sums. No window ever sees the raw
rows, so there is no single-partition funnel over the data. Ties in score
are handled by average-rank (the standard correction), so AUC matches the
trapezoidal ROC definition exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def roc_auc(scored: DataFrame, label_col: str = "label",
            score_col: str = "spamminess") -> DataFrame:
    """→ 1-row DataFrame (auc double, one_minus_roca_pct double, n_pos,
    n_neg). Average-rank tie handling.

    For a score group with ``cnt`` rows whose first (min) global rank is
    ``cum_before + 1``, every row's average rank is ``cum_before +
    (cnt + 1)/2``; positives contribute ``pos × that`` to the rank sum —
    identical to per-row ``rank() + (nties − 1)/2``, without ranking rows.

    Rank sums are kept in *doubled* integer space (2·avg_rank =
    2·cum − cnt + 1 is always integral), so every aggregate is an exact
    long sum — no float-addition order sensitivity — and only the final
    AUC ratio divides in double. That makes the whole computation
    bit-reproducible across engines (DuckDB-oracle-verifiable given a
    SQL-expressible scorer).
    """
    grouped = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col(label_col) == 1.0, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col(label_col) != 1.0, 1).otherwise(0)).alias("neg"),
    )
    w_cum = Window.orderBy(F.asc("s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = grouped.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "r2", 2 * F.col("cum") - F.col("cnt") + 1
    )
    agg = ranked.agg(
        F.sum(F.col("pos") * F.col("r2")).alias("rsum2"),
        F.sum("pos").alias("p"),
        F.sum("neg").alias("n"),
    )
    auc = (F.col("rsum2") - F.col("p") * (F.col("p") + 1)) / (
        2 * F.col("p") * F.col("n")
    )
    return agg.select(
        auc.alias("auc"),
        (F.lit(100.0) * (1.0 - auc)).alias("one_minus_roca_pct"),
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
    )
