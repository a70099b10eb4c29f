"""Skew mitigation utilities.

AQE's skew-join splitting (on by default in the session factory) covers
sort-merge joins; these helpers cover the two shapes AQE doesn't:

- ``salted_aggregate``: two-phase aggregation for hot grouping keys — a
  random salt spreads one hot key over S reducers, then a second (cheap)
  aggregation merges the partials. Exact for any algebraic aggregate
  (sum/count/min/max); the reference's equivalent was hand-tuned reducer
  counts and memory bumps (``JAVA/assignment1/PairsPMI.java:284-288``).
- ``salted_broadcast_left``: replicate-broadcast join for a skewed fact ⋈
  small-dim shape where even hashing the dim is unbalanced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact groupBy(keys).agg for algebraic aggregates, resilient to hot
    keys. ``aggs`` maps output column name → (phase-1 aggregate
    expression, merge) where merge ∈ {'sum', 'min', 'max'} re-aggregates
    the per-salt partials (count partials merge with 'sum'). The merge is
    explicit because it is a property of the aggregate's algebra the
    caller knows, not something inferable from an expression tree.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )

    def merge(name: str, how: str) -> Column:
        if how not in _MERGE_FNS:
            raise ValueError(
                f"merge for {name!r} must be one of {sorted(_MERGE_FNS)}, "
                f"got {how!r}"
            )
        return _MERGE_FNS[how](F.col(f"__p_{name}")).alias(name)

    return phase1.groupBy(*keys).agg(
        *[merge(name, how) for name, (_, how) in aggs.items()]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """fact ⋈ dim on ``key`` with the dim replicated per salt bucket —
    spreads a hot fact key over ``salt_buckets`` tasks even when the join
    must shuffle (dim too big for plain broadcast is NOT handled here;
    this is for hot-key spreading with a broadcastable dim)."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salted_dim = dim.crossJoin(
        broadcast(
            fact.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    out = salted_fact.join(broadcast(salted_dim), [key, "__salt"])
    return out.drop("__salt")
