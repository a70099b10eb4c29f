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

Scale shape: each round shuffles the frontier-expanded table once on id
with map-side partial min-combine; exchange sizing is left to AQE
(explicit per-round co-partitioning with the edge key was A/B-measured
slower — see the in-loop comment); ``localCheckpoint`` every few rounds
truncates the growing lineage exactly as the PageRank loop does.
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
        # bare groupBy: map-side partial min-combine + AQE-sized exchange.
        # The alternative (explicit repartition(par, id) to co-partition
        # every round with the edge join key) was A/B-measured SLOWER on
        # local[32] (1.80 s vs 1.68 s; same result for the equivalent
        # PageRank change, 4.17 s vs 3.21 s) — the extra full-row
        # exchange costs more than AQE's handling of the mismatch.
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if (it + 1) % checkpoint_every == 0 or it == max_hops - 1:
            dist = dist.localCheckpoint(eager=True)

    return dist.where(F.col("dist").isNotNull()).select("id", "dist")


def kcore_peel(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, core_degree): the subgraph surviving ``rounds`` rounds of
    k-core peeling (repeatedly remove nodes of undirected degree < k),
    with each survivor's degree inside the surviving subgraph.

    Bounded-round peel, the SSSP-hops convention: a FIXED number of
    rounds keeps the whole computation closed-form so the oracle can
    unroll it into chained CTEs; on a converged graph the result IS the
    k-core (pinned in tests by running one extra round and asserting a
    fixpoint). Each round is one hash-agg degree count plus two
    semi-joins against the ≤|V|-row survivor set — at 100 TB the edge
    table shuffles once up front (partitioned by src) and each round's
    survivor list is broadcastable long before the edge table is.
    Per-round ``localCheckpoint`` caps lineage exactly like PageRank's
    iteration (operators/pagerank.py)."""
    spark = edges.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .distinct()
        .repartition(par, "src")
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        keep = (
            und.groupBy("src").agg(F.count("*").alias("d"))
            .where(F.col("d") >= k)
            .select(F.col("src").alias("id"))
        )
        und = (
            und.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(par, "src")
            .localCheckpoint(eager=True)
        )
    return und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("core_degree")
    )


def lpa_communities(
    edges: DataFrame,
    rounds: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, label): community detection by synchronous label
    propagation (Raghavan et al. 2007, Phys. Rev. E 76) over the
    undirected graph, made fully deterministic: every node starts
    labeled with its own id, and each round every node adopts the most
    frequent label among its NEIGHBORS with ties broken toward the
    LOWEST label — the deterministic tie-break that replaces the
    paper's random choice, so the DuckDB oracle replays the identical
    result. A FIXED round count (the SSSP/k-core convention) makes the
    output well-defined even where synchronous LPA oscillates (a lone
    edge swaps labels with period 2 — pinned in tests) and lets the
    oracle unroll the rounds into chained CTEs.

    Scale shape: the symmetrized edge table shuffles once up front
    (partitioned by src, checkpointed); each round is ONE hash agg over
    (node, neighbor-label) — map-side combinable, ≤ 2|E| input rows —
    plus an argmax expressed as max(struct(count, −label)) so no window
    function touches the per-node groups (struct buffers plan as a
    partial+final SortAggregate pair — per-partition spillable sorts,
    still map-side combinable; see _lpa_round). The label table
    (≤ |V| rows) is the only per-round state and is localCheckpoint'ed
    each round, exactly like PageRank's rank table."""
    spark = edges.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    und = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .distinct()
        .repartition(par, "src")
        .localCheckpoint(eager=True)
    )
    # after symmetrization every node appears as a src
    labels = (
        und.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        labels = _lpa_round(und, labels).localCheckpoint(eager=True)
    return labels


def _lpa_round(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round, un-checkpointed: neighbor labels via
    one join on the symmetrized edges, then the most-frequent-label
    argmax as TWO partial+final agg pairs — a hash agg for the
    (id, label) counts, then max(struct(count, −label)) per id, which
    Spark plans as a SortAggregate pair (struct buffers aren't
    hash-aggregable) whose sorts are per-partition and spillable, with
    the partial max BEFORE the exchange. Deliberately NOT a window over
    the per-node groups (a hub node's full neighbor list would
    sort-buffer inside one task, and windows ship every row through the
    exchange — no map-side combine); the plan shape is pinned in
    tests/test_plan_properties.py."""
    nb = und.join(
        labels.withColumnRenamed("id", "dst"), "dst"
    ).select(F.col("src").alias("id"), "label")
    best = (
        nb.groupBy("id", "label").agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max(F.struct(
            F.col("c"), (-F.col("label")).alias("nl")
        )).alias("b"))
    )
    return best.select("id", (-F.col("b.nl")).alias("label"))


def sssp_weighted(
    edges: DataFrame,
    source: int,
    rounds: int = 8,
    num_partitions: int | None = None,
    checkpoint_every: int = 2,
) -> DataFrame:
    """→ (id, dist) minimum WEIGHTED distance from ``source`` using at
    most ``rounds`` edges per path — bounded-round Bellman-Ford, the
    weighted sibling of :func:`bfs_hops`.

    Same Pregel min-combine shape: each round relaxes every edge out of
    the current frontier (dist + w) and folds with a bare groupBy min
    (map-side partial combine; the explicit co-partition alternative
    was A/B-measured slower — see bfs_hops). All arithmetic is exact
    integer, so the unrolled-CTE oracle replays every round with no
    float caveat; ``rounds`` bounds path length exactly as the driver
    loop does, making the oracle equality total, not asymptotic.
    ``edges`` must carry an integer ``w`` column."""
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
        F.when(F.col("id") == F.lit(source), F.lit(0).cast("long"))
        .alias("dist"),
    ).localCheckpoint(eager=True)

    for it in range(rounds):
        relaxed = (
            edges.join(dist, edges.src == dist.id)
            .where(F.col("dist").isNotNull())
            .select(F.col("dst").alias("id"),
                    (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if (it + 1) % checkpoint_every == 0 or it == rounds - 1:
            dist = dist.localCheckpoint(eager=True)

    return dist.where(F.col("dist").isNotNull()).select("id", "dist")
