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


def test_graph_kcore_matches_oracle(spark, sf_dir, duck):
    from bigdata2016w_spark.registry import all_specs
    from tests.oracle import compare_spark_duckdb

    spec = all_specs()["graph_kcore"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_kcore_planted_clique_survives_tail_dissolves(spark):
    """Partial peeling on a shaped graph: a 6-clique plus a degree-1
    chain hanging off it. The 3-core is exactly the clique (each member
    keeps degree 5); the chain peels away over the bounded rounds, and
    one extra round is a fixpoint."""
    from bigdata2016w_spark.operators.traversal import kcore_peel

    clique = [(a, b) for a in range(6) for b in range(6) if a < b]
    chain = [(5, 6), (6, 7), (7, 8), (8, 9)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {(r.id, r.core_degree)
           for r in kcore_peel(edges, 3, 6, 4).collect()}
    assert got == {(i, 5) for i in range(6)}
    again = {(r.id, r.core_degree)
             for r in kcore_peel(edges, 3, 7, 4).collect()}
    assert again == got  # fixpoint: bounded rounds reached the true core


def test_kcore_cascade_to_empty(spark):
    """A pure chain has no 2-core: peeling must cascade to empty through
    several rounds (each round only exposes the next endpoint)."""
    from bigdata2016w_spark.operators.traversal import kcore_peel

    chain = [(i, i + 1) for i in range(10)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    assert kcore_peel(edges, 2, 10, 4).count() == 0


def test_lpa_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["graph_lpa_communities"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def _lpa_python(edges, rounds):
    """Reference implementation of the engine's deterministic rule:
    synchronous update, most-frequent NEIGHBOR label, ties → lowest."""
    und = set()
    for s, d in edges:
        und.add((s, d))
        und.add((d, s))
    nbrs = {}
    for s, d in und:
        nbrs.setdefault(s, []).append(d)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v, ns in nbrs.items():
            counts = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


def test_lpa_planted_cliques_converge_to_min_label(spark):
    """Two 5-cliques joined by one bridge edge: after 4 synchronous
    rounds each clique must carry a single community label, the two
    communities must differ, and every per-node label must equal the
    Python reference of the exact same deterministic rule."""
    from bigdata2016w_spark.operators.traversal import lpa_communities

    c1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    c2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    edges_py = c1 + c2 + [(0, 10)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {r.id: r.label
           for r in lpa_communities(edges, rounds=4).collect()}
    want = _lpa_python(edges_py, 4)
    assert got == want
    lab1 = {got[v] for v in range(5)}
    lab2 = {got[v] for v in range(10, 15)}
    assert len(lab1) == 1 and len(lab2) == 1 and lab1 != lab2


def test_lpa_pair_oscillation_is_deterministic(spark):
    """A single edge is the classic synchronous-LPA oscillator: each
    node's only neighbor label wins outright, so the pair swaps labels
    every round with period 2. The bounded-round semantics doesn't hide
    that — it makes the result a DETERMINISTIC function of the round
    count, which is exactly what the oracle replays; pinned here at an
    odd and an even round count against the Python reference."""
    from bigdata2016w_spark.operators.traversal import lpa_communities

    edges = spark.createDataFrame([(7, 3)], "src long, dst long")
    for rounds in (3, 4):
        got = {r.id: r.label
               for r in lpa_communities(edges, rounds=rounds).collect()}
        assert got == _lpa_python([(7, 3)], rounds)


def test_sssp_weighted_oracle(spark, duck, sf_dir):
    s = all_specs()["graph_sssp_weighted"]
    compare_spark_duckdb(s.fn(spark, sf_dir), duck, s.oracle)


def test_sssp_weighted_vs_python_bellman_ford(spark):
    """Planted weighted digraph: the operator must equal a pure-Python
    bounded-round Bellman-Ford, including a case where the cheapest
    path has MORE hops than the hop-minimal one."""
    from bigdata2016w_spark.operators.traversal import sssp_weighted

    edges = [
        (0, 1, 10),       # direct but expensive
        (0, 2, 1), (2, 3, 1), (3, 1, 1),   # 3-hop cost 3 beats 1-hop 10
        (1, 4, 2),
        (5, 0, 1),        # unreachable from 0 (wrong direction)
    ]
    rounds = 4
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.dist
           for r in sssp_weighted(df, 0, rounds, num_partitions=2).collect()}

    dist = {0: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s_, d_, w_ in edges:
            if s_ in dist and dist[s_] + w_ < nxt.get(d_, 1 << 60):
                nxt[d_] = dist[s_] + w_
        dist = nxt
    assert got == dist
    assert got[1] == 3 and got[4] == 5 and 5 not in got
