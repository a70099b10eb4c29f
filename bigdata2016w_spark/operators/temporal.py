"""Temporal joins Spark lacks natively: as-of and bucketized range joins
(SURVEY §2.4 'theta/range/as-of/interval joins — absent' row, implemented
as compositions of existing DataFrame ops — tier (a) of the
custom-operator policy; no UDFs).

- ``as_of_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union-and-carry
  pattern: tag both sides, union, and per key take
  ``last(right_payload, ignorenulls=True)`` over an ordered
  rows-unbounded-preceding window. One shuffle on (key), no per-group
  Python, state linear in the window — survives any skew AQE can handle.
  (The alternative ``applyInPandas`` + ``pd.merge_asof`` per group is
  strictly worse: Python, and hot keys serialize.)
- ``range_pair_join``: equi-key pairs within a time distance d via
  bucket blocking (emit floor(ts/d) ± 1 — any pair within d shares a
  bucket key; exact predicate re-checked after the equi-join). Same
  lossless-blocking idea as the dedup size buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with ``right.ts <= left.ts`` (ties at equal ts include the right
    row). ``right`` must be unique per (key, ts) — pre-dedupe it if not;
    that is what makes the result deterministic in ANY engine.
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, ts)
    ]
    lt = left.withColumn("__tag", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in [ts] + right_payload
            ) + ">"
        )
    )
    rt = right.select(
        key,
        F.col(ts),
        F.lit(0).alias("__tag"),
        F.struct(F.col(ts), *[F.col(c) for c in right_payload]).alias("__r"),
    )
    lcols = [c for c in left.columns]
    unioned = lt.select(key, ts, "__tag", "__r", *[
        F.col(c) for c in lcols if c not in (key, ts)
    ]).unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__tag") == 1).select(
        key, ts,
        *[c for c in lcols if c not in (key, ts)],
        *[F.col(f"__m.{c}").alias(f"right_{c}") for c in [ts] + right_payload],
    )
    return out.withColumnRenamed(f"right_{ts}", "right_ts")


def range_pair_join(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """All pairs (a, b) with the same ``key``, ``a.id < b.id`` and
    ``|a.ts − b.ts| ≤ d``. Bucket blocking keeps the join equi
    (key, bucket) — lossless because two timestamps within d differ by
    at most one floor(ts/d) bucket."""
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    d_us = max_gap_seconds * 1_000_000
    base = df.select(
        key, F.col(id_col).alias("id"), us.alias("us"),
        F.floor(us / F.lit(d_us)).alias("b"),
    )
    a = base.select(
        key, F.col("id").alias("id_a"), F.col("us").alias("us_a"),
        F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)).alias("b"),
    )
    bdf = base.select(
        key, F.col("id").alias("id_b"), F.col("us").alias("us_b"), "b"
    )
    return (
        a.join(bdf, [key, "b"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= F.lit(d_us))
        )
        .select(key, "id_a", "id_b",
                ((F.col("us_b") - F.col("us_a")) / 1e6).alias("gap_seconds"))
        .distinct()
    )
