"""BFS hop-distance (unweighted SSSP) — DuckDB oracle parity plus an
exact pure-Python BFS check."""

from collections import deque

from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb


def test_sssp_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["graph_sssp_hops"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_sssp_matches_python_bfs(spark, sf_dir):
    from bigdata2016w_spark.plans.graph import order_graph_edges
    from bigdata2016w_spark.plans.traversal import SSSP_HOPS, SSSP_SOURCE

    edges = order_graph_edges(spark, sf_dir).collect()
    adj: dict[int, list[int]] = {}
    nodes = set()
    for r in edges:
        adj.setdefault(r.src, []).append(r.dst)
        nodes.update((r.src, r.dst))
    want = {SSSP_SOURCE: 0}
    q = deque([SSSP_SOURCE])
    while q:
        u = q.popleft()
        if want[u] >= SSSP_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)
    got = {
        r.id: r.dist
        for r in all_specs()["graph_sssp_hops"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_bfs_hops_cap_is_respected(spark):
    """A 5-node path graph capped at 3 hops must stop at distance 3."""
    from bigdata2016w_spark.operators.traversal import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    got = {r.id: r.dist for r in bfs_hops(edges, 0, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
