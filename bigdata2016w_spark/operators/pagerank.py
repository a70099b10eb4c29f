"""Multi-source personalized PageRank — the reference's a4 surface.

Reference shape: an iterative chain of paired Hadoop MR jobs
(``JAVA/assignment4/RunPersonalizedPageRankBasic.java``): phase 1
distributes ``rank/deg`` mass along adjacency lists in log space
(``:92-129``), combiners/reducers fold messages with ``sumLogProbs``
(``:146-175,196-265``), reducers write per-task mass totals to HDFS side
files the driver reads back (``:267-286,559-573``); phase 2 redistributes
the missing (dangling) mass and applies the α=0.15 jump restricted to each
personalization source (``:338-373``). State between iterations is a
SequenceFile dir per iteration; multi-source runs keep one float slot per
source (``PageRankNode.java:40``).

Spark-first design: one Python driver loop over a cached DataFrame with one
rank column per source (codegen-friendly; no array shuffling):

- mass distribution = ``ranks ⋈ edges on src`` + ``groupBy(dst).sum`` —
  Catalyst's shuffled join/agg replaces the hand-partitioned MR shuffle
  (partition alignment via ``repartition(n, 'id')`` replaces
  ``NonSplitableSequenceFileInputFormat``/``PartitionGraph``);
- dangling mass = ``1 − agg(sum).collect()`` per source in the driver —
  replaces the HDFS side files;
- linear-space ``double`` arithmetic replaces log-space ``float``
  ``sumLogProbs`` (``:636-648``) — double precision makes the log-space
  stability trick unnecessary (SURVEY §4);
- ``localCheckpoint`` per iteration truncates the growing lineage
  (SURVEY §7.3 hard part).

Semantics per iteration, per source s (α = 0.15, ``:373``):
    new_rank(v) = (1−α)·(link_mass(v) + missing·1[v=s]) + α·1[v=s]
i.e. both the random jump and the lost dangling mass return to the source
only — the personalized variant (``:338-361``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.15  # RunPersonalizedPageRankBasic.java:373


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    num_iters: int = 10,
    alpha: float = ALPHA,
    # every-2 measured fastest on local[32] (each iteration stacks a
    # join+agg+join plan segment; deeper uncheckpointed chains re-optimize
    # and re-execute superlinearly, e.g. 10 unchecked iters = ~200s vs 3.4s)
    checkpoint_every: int = 2,
    num_partitions: int | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Run personalized PageRank; returns (id, rank_0..rank_{k-1}).

    ``edges`` is DataFrame[src long, dst long]. The vertex set is the union
    of endpoints (nodes referenced only as targets are dangling — the
    missing-structure path of RunPersonalizedPageRankBasic.java:251-259).

    ``num_partitions`` sizes every per-iteration shuffle; default is the
    cluster parallelism — pass a smaller value for small graphs (empty
    tasks × iterations dominate otherwise) and a larger one at scale.

    ``tol``: optional early stop when the max L1 rank change across all
    sources drops below it (the reference only supported fixed iteration
    counts, RunPersonalizedPageRankBasic.java:466-469). Convergence checks
    piggyback on the checkpoint sync — no extra jobs between checkpoints.
    """
    spark = edges.sparkSession
    k = len(sources)
    rcols = [f"rank_{i}" for i in range(k)]
    par = num_partitions or spark.sparkContext.defaultParallelism

    # materialize the static side once: edges and out-degrees are reused by
    # every iteration (the reference pre-partitioned them into aligned
    # files once, PartitionGraph.java:107-126 — same idea, in memory)
    edges = edges.repartition(par, "src").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(par, "id")
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)

    # init: source slots get mass 1.0, everything else 0
    # (BuildPersonalizedPageRankRecords.java:100-116)
    ranks = nodes.select(
        "id",
        *[
            F.when(F.col("id") == F.lit(s), 1.0).otherwise(0.0).alias(c)
            for s, c in zip(sources, rcols)
        ],
    ).localCheckpoint(eager=True)

    ranks_prev: DataFrame | None = None
    for it in range(num_iters):
        contrib = (
            ranks.join(edges, ranks.id == edges.src)
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                *[(F.col(c) / F.col("deg")).alias(c) for c in rcols],
            )
        )
        link = contrib.groupBy("id").agg(
            *[F.sum(c).alias(c) for c in rcols]
        )
        # dangling mass per source: whatever didn't arrive anywhere.
        # Stays in the plan as a broadcast 1-row aggregate instead of a
        # per-iteration collect() — no driver round-trip per iteration
        # (the reference needed HDFS side files + driver reads here,
        # RunPersonalizedPageRankBasic.java:267-286).
        missing = link.agg(
            *[
                (F.lit(1.0) - F.coalesce(F.sum(c), F.lit(0.0))).alias(f"miss_{c}")
                for c in rcols
            ]
        )
        ranks = (
            nodes.join(link, "id", "left")
            .crossJoin(F.broadcast(missing))
            .select(
                "id",
                *[
                    (
                        F.lit(1.0 - alpha)
                        * (
                            F.coalesce(F.col(c), F.lit(0.0))
                            + F.when(
                                F.col("id") == F.lit(s), F.col(f"miss_{c}")
                            ).otherwise(0.0)
                        )
                        + F.when(F.col("id") == F.lit(s), F.lit(alpha)).otherwise(0.0)
                    ).alias(c)
                    for s, c in zip(sources, rcols)
                ],
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == num_iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
            if tol is not None:
                if ranks_prev is not None:
                    delta = (
                        ranks.alias("n")
                        .join(ranks_prev.alias("p"), "id")
                        .agg(
                            F.max(
                                sum(
                                    F.abs(F.col(f"n.{c}") - F.col(f"p.{c}"))
                                    for c in rcols
                                )
                            ).alias("d")
                        )
                        .collect()[0]["d"]
                    )
                    if delta is not None and delta < tol:
                        break
                ranks_prev = ranks
    return ranks


def top_k_per_source(
    ranks: DataFrame, sources: list[int], k: int = 10, round_to: int = 6
) -> DataFrame:
    """(source, id, rank) top-k per personalization source.

    The bounded-heap extraction of ExtractTopPersonalizedPageRankNodes.java:
    44-127 as a per-source window rank (SURVEY §2.6); linear space, so no
    exp() conversion is needed.
    """
    from bigdata2016w_spark.operators.topk import topk_per_group

    per_source = None
    for i, s in enumerate(sources):
        part = ranks.select(
            F.lit(s).alias("source"),
            "id",
            F.col(f"rank_{i}").alias("rank"),
        )
        per_source = part if per_source is None else per_source.union(part)
    return topk_per_group(
        per_source, ["source"], [F.desc("rank"), F.asc("id")], k
    ).select("source", "id", F.round("rank", round_to).alias("rank"))
