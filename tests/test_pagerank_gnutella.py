"""Personalized PageRank on the reference's own validation graph
(data/p2p-Gnutella08-adj.txt, 6,301-node Gnutella snapshot — the dataset
the reference graded a4 against, SURVEY §5) vs the NumPy oracle."""

import os

import pytest

GNUTELLA = "/root/reference/data/p2p-Gnutella08-adj.txt"


@pytest.mark.skipif(not os.path.exists(GNUTELLA), reason="reference data absent")
def test_gnutella_ppr_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from bigdata2016w_spark.operators.pagerank import (
        personalized_pagerank,
        top_k_per_source,
    )
    from bigdata2016w_spark.sources.text_formats import read_adjacency

    edges_df = read_adjacency(spark, GNUTELLA)
    edges = [(r.src, r.dst) for r in edges_df.collect()]
    assert len(edges) > 10000

    sources, iters, alpha = [0, 367], 5, 0.15
    ranks = personalized_pagerank(edges_df, sources, num_iters=iters)

    # vectorized NumPy oracle
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    src_arr = np.array([idx[s] for s, _ in edges])
    dst_arr = np.array([idx[d] for _, d in edges])
    deg = np.zeros(n)
    np.add.at(deg, src_arr, 1.0)
    for si, source in enumerate(sources):
        r = np.zeros(n)
        r[idx[source]] = 1.0
        for _ in range(iters):
            share = np.where(deg > 0, r / np.maximum(deg, 1.0), 0.0)
            link = np.zeros(n)
            np.add.at(link, dst_arr, share[src_arr])
            missing = 1.0 - link.sum()
            newr = (1 - alpha) * link
            newr[idx[source]] += (1 - alpha) * missing + alpha
            r = newr
        got = {row["id"]: row[f"rank_{si}"] for row in ranks.collect()}
        assert len(got) == n
        for node in nodes:
            assert got[node] == pytest.approx(r[idx[node]], abs=1e-9)

    top = top_k_per_source(ranks, sources, k=10).collect()
    by_src = {}
    for row in top:
        by_src.setdefault(row["source"], []).append((row["id"], row["rank"]))
    # personalized property: each source dominates its own ranking
    for source in sources:
        assert by_src[source][0][0] == source
        assert by_src[source][0][1] > 0.15  # ≥ α (jump mass returns home)
