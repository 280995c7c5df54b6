"""PageRank (operators/graph.py): exact-iteration parity with a NumPy
power-iteration reference (same damping/dangling handling), mass
conservation, early convergence, canonical-doc selection, and the
zero-leaked-checkpoint lifecycle shared with connected_components."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators.corpus import release_components
from kmeanwithmapreduce_spark.operators.graph import (
    pagerank,
    top_authority_per_component,
)


def _numpy_pagerank(edges, n_iter, damping=0.85, tol=0.0):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in edges:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dangling = r[out_deg == 0].sum()
        new = base + damping * (contrib + dangling / n)
        delta = np.abs(new - r).sum()
        r = new
        if delta < tol:
            break
    return dict(zip(nodes, r))


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (5, 1),
    (6, 5),  # 6 has in-degree 0; 7 below is a dangling sink
    (2, 7),
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "a long, b long")


def test_pagerank_matches_numpy_reference(spark):
    res = pagerank(_edges_df(spark), max_iter=15, tol=0.0)
    got = {r.node: r.rank for r in res.collect()}
    release_components(res)
    want = _numpy_pagerank(EDGES, n_iter=15)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_pagerank_mass_conserved_with_dangling_sink(spark):
    """Node 7 has no out-edges; without dangling redistribution total
    mass decays below 1."""
    res = pagerank(_edges_df(spark), max_iter=25, tol=0.0)
    total = res.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9
    release_components(res)


def test_pagerank_converges_early_and_ranks_sensibly(spark):
    """tol stops the loop; node 3 (most in-links incl. from the hub 1)
    must outrank the in-degree-0 node 6."""
    res = pagerank(_edges_df(spark), max_iter=100, tol=1e-10)
    got = {r.node: r.rank for r in res.collect()}
    release_components(res)
    want = _numpy_pagerank(EDGES, n_iter=100, tol=1e-10)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-8
    assert got[3] > got[6]


def test_pagerank_no_leaked_checkpoints(spark):
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    res = pagerank(_edges_df(spark), max_iter=8, tol=0.0)
    res.count()
    release_components(res)
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before == 0


def test_top_authority_per_component(spark):
    """Two components; the authority pick must follow rank, not min id
    (component B's hub has the larger node id)."""
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)],
        "node long, component long",
    )
    ranks = spark.createDataFrame(
        [(1, 0.1), (2, 0.3), (3, 0.2), (10, 0.05), (11, 0.06), (12, 0.29)],
        "node long, rank double",
    )
    got = {
        r.component: r.node
        for r in top_authority_per_component(ranks, comp, k=1).collect()
    }
    assert got == {1: 2, 10: 12}


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "a long, b long")
    assert pagerank(e, max_iter=3).count() == 0
