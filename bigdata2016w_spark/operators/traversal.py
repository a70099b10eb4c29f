"""Iterative graph traversal: BFS hop distances (single-source shortest
path on unweighted directed edges).

The reference's graph family is Pregel-style message passing (PPR,
``JAVA/assignment4/RunPersonalizedPageRankBasic.java:160-259``); BFS is
the same shape with min-combine instead of sum-combine, so the engine
expresses one frontier round as:

    dist' = groupBy(id).min( dist  ∪  (edges ⋈ dist).select(dst, d+1) )

A fixed iteration count caps the result at ``max_hops`` deterministically
(no convergence probe needed for the registered query — unreached nodes
simply stay NULL-distance and are dropped), which also lets the whole
computation unroll into chained SQL CTEs for the DuckDB oracle
(``plans/graph._sssp_sql``), the same trick as PageRank's oracle.

Scale shape: each round is one explicit shuffle of the frontier-expanded
table to ``num_partitions`` on id, so the running dist table stays
co-partitioned with the edge table's join key at a stable partition
count across rounds; ``localCheckpoint`` every few rounds truncates the
growing lineage exactly as the PageRank loop does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 8,
    num_partitions: int | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """→ (id, dist) for every node reachable from ``source`` within
    ``max_hops`` directed hops (dist = minimum hop count; source = 0)."""
    spark = edges.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    edges = edges.repartition(par, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(par, "id")
        .localCheckpoint(eager=True)
    )
    dist = nodes.select(
        "id",
        F.when(F.col("id") == F.lit(source), F.lit(0).cast("long")).alias("dist"),
    ).localCheckpoint(eager=True)

    for it in range(max_hops):
        relaxed = (
            edges.join(dist, edges.src == dist.id)
            .where(F.col("dist").isNotNull())
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        # explicit repartition(par, id) before the min-combine keeps every
        # round's output co-partitioned with the next round's join key at
        # the SAME partition count (a bare groupBy would come out at the
        # session shuffle-partition count and force re-exchanges against
        # the par-partitioned edges). Trade-off: the frontier shuffle
        # carries raw relaxed rows instead of map-side-combined ones —
        # right for small explicit par; at web scale drop the repartition
        # and let partial aggregation + AQE size the exchange.
        dist = (
            dist.unionByName(relaxed)
            .repartition(par, "id")
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if (it + 1) % checkpoint_every == 0 or it == max_hops - 1:
            dist = dist.localCheckpoint(eager=True)

    return dist.where(F.col("dist").isNotNull()).select("id", "dist")
