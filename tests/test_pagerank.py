"""Personalized PageRank vs a NumPy power-iteration oracle (the engine twin
of the reference's JUNG sequential validator, SURVEY §5)."""

import numpy as np
import pytest

ALPHA = 0.15


def numpy_ppr(edges, sources, iters, alpha=ALPHA):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    ranks = {}
    for src in sources:
        r = np.zeros(n)
        r[idx[src]] = 1.0
        for _ in range(iters):
            link = np.zeros(n)
            for u, targets in out.items():
                share = r[idx[u]] / len(targets)
                for v in targets:
                    link[idx[v]] += share
            missing = 1.0 - link.sum()
            newr = (1 - alpha) * link
            newr[idx[src]] += (1 - alpha) * missing + alpha
            r = newr
        ranks[src] = {node: r[idx[node]] for node in nodes}
    return ranks


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4),  # 4 dangles partially
    (4, 0), (5, 0),  # 5 has no in-links; 6 appears only as a target
    (3, 6),
]


@pytest.mark.parametrize("iters", [1, 5, 20])
def test_matches_numpy_oracle(spark, iters):
    from bigdata2016w_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = personalized_pagerank(edges, [0, 3], num_iters=iters)
    rows = {r["id"]: (r["rank_0"], r["rank_1"]) for r in got.collect()}
    want = numpy_ppr(EDGES, [0, 3], iters)
    assert set(rows) == set(want[0])
    for node, (r0, r1) in rows.items():
        assert r0 == pytest.approx(want[0][node], abs=1e-12)
        assert r1 == pytest.approx(want[3][node], abs=1e-12)


def test_mass_conserved(spark):
    """Rank mass per source stays exactly 1 (dangling mass is recycled to
    the source, RunPersonalizedPageRankBasic.java:482-486)."""
    from bigdata2016w_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    ranks = personalized_pagerank(edges, [0], num_iters=7)
    total = ranks.groupBy().sum("rank_0").collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-12)


def test_topk_shape(spark):
    from bigdata2016w_spark.operators.pagerank import (
        personalized_pagerank,
        top_k_per_source,
    )

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    ranks = personalized_pagerank(edges, [0, 3], num_iters=3)
    top = top_k_per_source(ranks, [0, 3], k=3).collect()
    assert len(top) == 6
    by_src = {}
    for r in top:
        by_src.setdefault(r["source"], []).append(r["rank"])
    for s, vals in by_src.items():
        assert vals == sorted(vals, reverse=True)
        # personalized: the source itself should rank at/near the top
        assert s in [r["id"] for r in top if r["source"] == s]


def test_adjacency_reader(spark, tmp_path):
    """Reference adjacency format → edges (BuildPersonalizedPageRankRecords
    parsing, dangling lines produce no edges)."""
    from bigdata2016w_spark.sources.text_formats import read_adjacency

    p = tmp_path / "adj.txt"
    p.write_text("1\t2\t3\n2\t3\n3\n4 1\n")
    edges = read_adjacency(spark, str(p))
    got = sorted((r.src, r.dst) for r in edges.collect())
    assert got == [(1, 2), (1, 3), (2, 3), (4, 1)]


def test_convergence_early_stop(spark):
    """tol-based early stop returns (near-)converged ranks: running with a
    loose tol must agree with many fixed iterations within that tol."""
    from bigdata2016w_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    fixed = {
        r["id"]: r["rank_0"]
        for r in personalized_pagerank(edges, [0], num_iters=60).collect()
    }
    early = {
        r["id"]: r["rank_0"]
        for r in personalized_pagerank(
            edges, [0], num_iters=60, tol=1e-7, checkpoint_every=5
        ).collect()
    }
    assert set(early) == set(fixed)
    for k in fixed:
        assert abs(early[k] - fixed[k]) < 1e-6


def test_range_partitioned_edges_identical_ranks(spark):
    """repartitionByRange is the engine twin of the reference's
    RangePartitioner (JAVA/assignment4/RangePartitioner.java:23-25 — node
    ranges across reducers). PPR must be partition-invariant: range- and
    hash-partitioned edge layouts give bitwise-identical ranks, and the
    range layout plans a RangePartitioning exchange."""
    from pyspark.sql import functions as F

    from bigdata2016w_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    ranged = edges.repartitionByRange(4, F.col("src"))
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()

    by_hash = {
        r["id"]: r["rank_0"]
        for r in personalized_pagerank(
            edges.repartition(4, "src"), [0], num_iters=8
        ).collect()
    }
    by_range = {
        r["id"]: r["rank_0"]
        for r in personalized_pagerank(ranged, [0], num_iters=8).collect()
    }
    assert by_range == by_hash


def test_graph_triangles_matches_oracle(spark, sf_dir, duck):
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    spec = all_specs()["graph_triangles"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_graph_triangles_known_graph(spark, monkeypatch):
    """K4 minus one edge = 2 triangles; every node on ≥1."""
    import pyspark.sql.functions as F

    from bigdata2016w_spark.plans import graph as g

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)], ["src", "dst"]
    )
    monkeypatch.setattr(g, "order_graph_edges", lambda spark, sf: edges)
    got = {r.node: r.n_triangles
           for r in g.graph_triangles(spark, "unused").collect()}
    assert got == {1: 2, 2: 1, 3: 2, 4: 1}
