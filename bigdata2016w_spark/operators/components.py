"""Connected components — the clustering step a dedup pipeline needs
after pair detection (near-dup PAIRS → duplicate GROUPS → one survivor
per group). No reference counterpart; the distributed pattern is the same
driver-loop-over-joins shape as PageRank (SURVEY §2.9).

Algorithm: iterative min-label propagation. Each node's label starts as
its own id; every round each node takes the min of its label and its
neighbors' labels; stop when a round changes nothing. Rounds needed =
graph diameter — small for dedup clusters (near-dups chain shallowly).
For adversarial long-path graphs at 100 TB you'd switch to
large-star/small-star (Kiveris et al.) which converges in O(log n)
rounds; min-propagation is the right tool for the shallow-cluster shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """edges(src, dst) undirected → (id, component) with component = min
    node id reachable. Converges early when a round is a no-op."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
