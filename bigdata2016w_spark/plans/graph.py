"""Registered graph queries (a4). Iterative → no SQL oracle (driver runs
the weaker rows-only check; the pytest suite checks against a NumPy
power-iteration oracle instead, replacing the reference's JUNG sequential
validator, ``JAVA/assignment4/SequentialPersonalizedPageRank.java:117-126``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata2016w_spark.operators.pagerank import personalized_pagerank, top_k_per_source
from bigdata2016w_spark.registry import QuerySpec, register
from bigdata2016w_spark.sources.catalog import load_table

PR_SOURCES = [0, 1]
PR_ITERS = 10
PR_MOD = 200


def order_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic directed graph derived from the orders table:
    src = o_custkey mod 200, dst = o_orderkey mod 200. ~200 nodes with
    skewed in-degree at every scale factor — a stable rows-only fixture."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            (F.col("o_custkey") % PR_MOD).alias("src"),
            (F.col("o_orderkey") % PR_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 personalized PageRank per source over the orders-derived
    graph (sources 0 and 1, 10 iterations, α=0.15)."""
    edges = order_graph_edges(spark, sf_dir)
    # ~200 nodes: small explicit partitioning — 32-way shuffles of a
    # 200-row table would be pure empty-task overhead × 10 iterations
    ranks = personalized_pagerank(
        edges, PR_SOURCES, num_iters=PR_ITERS, num_partitions=4
    )
    return top_k_per_source(ranks, PR_SOURCES, k=10)


register(QuerySpec("pagerank_top10", pagerank_top10, None,
                   doc=pagerank_top10.__doc__))
