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


def connected_components_star(
    edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """edges(src, dst) undirected → (id, component) via alternating
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond"). Converges in O(log n) rounds regardless of
    graph diameter — the fallback :func:`connected_components`'s
    docstring promises for adversarial long-path graphs at scale.

    Each round is two (groupBy + join) shuffles over the current edge
    set; no driver-side state beyond the one-row convergence probe (an
    order-independent hash-sum of the edge set, so "unchanged" costs one
    tiny aggregate, not a distributed set-difference)."""

    def _canon(e: DataFrame) -> DataFrame:
        return e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v")).distinct()

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient (u ≥ v); m = min over smaller-neighbors ∪ {u}
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        pairs = o.join(m, "u").select("u", "v", "m")
        return pairs.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).union(
            pairs.select("u", F.col("m").alias("v"))
        ).where(F.col("u") != F.col("v"))

    def _sig(e: DataFrame) -> tuple[int, int]:
        # hashes reduced mod 2^31 before the sum so it cannot overflow
        # int64 under ANSI mode (safe to ~4e9 edges; collision odds for a
        # convergence probe are irrelevant)
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2147483648))),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = _canon(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    ).localCheckpoint(eager=True)
    sig = _sig(e)
    for _ in range(max_rounds):
        e = _canon(_small_star(_large_star(e))).localCheckpoint(eager=True)
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        # an unconverged edge set is not a valid star forest — a node could
        # carry multiple or non-minimal labels; refuse to return it
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds (O(log n) expected); raise max_rounds"
        )
    # converged star: every child points straight at its component root
    child = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = nodes.join(
        child.select("id"), "id", "left_anti"
    ).withColumn("component", F.col("id"))
    return child.union(roots)


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
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(rounds needed = graph diameter); raise max_iters or use "
            "connected_components_star"
        )
    return labels
