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


@pytest.mark.exhaustive  # twins: test_pagerank_matches_numpy_reference + test_pagerank_mass_conserved_with_dangling_sink
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


# --------------------------------------------------------------------------
# triangle census (g01)


def _census(spark, pairs):
    from kmeanwithmapreduce_spark.operators.corpus import release_components
    from kmeanwithmapreduce_spark.operators.graph import triangle_census

    edges = spark.createDataFrame(sorted(pairs), "p1 long, p2 long")
    df = triangle_census(edges)
    try:
        return df.collect()[0]
    finally:
        release_components(df)


def test_triangle_census_k4(spark):
    """Complete graph K4: 4 nodes, 6 edges, 12 wedges (C(3,2) per
    node), 4 triangles."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _census(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)


def test_triangle_census_whale_star(spark):
    """A star (hub 0, leaves 1..10) plus one leaf-leaf edge: exactly 1
    triangle. The hub is the whale node the degree orientation exists
    for — every hub edge points AWAY from the leaves into the hub, so
    the hub's out-degree is 0 and the wedge join never expands C(10,2)
    pairs at the hub."""
    star = [(0, leaf) for leaf in range(1, 11)] + [(1, 2)]
    r = _census(spark, star)
    # wedges: hub C(10,2)=45; leaves 1 and 2 have degree 2 -> 1 each
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (11, 11, 47, 1)


def test_triangle_census_triangle_free(spark):
    """Bipartite graphs have no triangles (C4 cycle)."""
    c4 = [(0, 1), (1, 2), (2, 3), (0, 3)]
    r = _census(spark, c4)
    assert (r.n_wedges, r.n_triangles) == (4, 0)


def test_copurchase_edges_match_self_join(spark, sf_dir):
    """The one-scan array-expansion edge generator must equal the
    textbook lineitem self-join (the oracle's form)."""
    from kmeanwithmapreduce_spark.operators.graph import copurchase_edges
    from kmeanwithmapreduce_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    got = {(r.p1, r.p2) for r in copurchase_edges(li).collect()}
    a, b = li.alias("a"), li.alias("b")
    want = {
        (r.p1, r.p2)
        for r in a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0


def test_triangle_census_scale_plan(spark, sf_dir):
    """Scale pins: (a) the fact table is scanned ONCE — the census plan
    reads the checkpointed edge/oriented-edge RDDs, never re-derives the
    per-use upstream pipeline (lineitem scan + groupBy + distinct) at
    every self-join; (b) wedge + closure joins are hash/merge equi-joins
    — the only nested-loop joins are the two 1-row stat cross-joins
    (each named twice in formatted explain: tree + details). g01 itself
    then collects the 1-row census and releases the checkpoints."""
    from kmeanwithmapreduce_spark.operators.corpus import release_components
    from kmeanwithmapreduce_spark.operators.graph import (
        copurchase_edges,
        triangle_census,
    )
    from kmeanwithmapreduce_spark.plans import explain_str
    from kmeanwithmapreduce_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    df = triangle_census(copurchase_edges(li))
    try:
        plan = explain_str(df)
        assert "Scan parquet" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 4
    finally:
        release_components(df)


def test_g01_returns_local_one_row_frame(spark, sf_dir):
    """The registry entry consumes the census eagerly and hands the
    driver a 1-row literal frame — no checkpoint blocks outlive it."""
    from kmeanwithmapreduce_spark.operators.graph import g01_copurchase_triangles

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = g01_copurchase_triangles(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].n_triangles > 0
    # the entry leaves no new persisted/checkpointed blocks behind
    assert jsc.getPersistentRDDs().size() <= before


def test_triangle_census_empty_graph(spark):
    """Review regression: sum over an empty edge list is NULL — the
    census must report 0 wedges (exact-count contract, pagerank's
    empty-graph precedent), not a NULL the clustering-coefficient
    division would propagate."""
    r = _census(spark, [])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (0, 0, 0, 0)


def test_q39_hand_computed_basket(spark):
    """3 orders over 3 parts: (A,B), (A,B), (A,C). n_ab(A,B)=2,
    support=2/3, confidence(A->B)=2/3, lift=(2*3)/(3*2)=1.0;
    (A,C): 1/3, 1/3, lift=(1*3)/(3*1)=1.0; (B,C) never co-occur."""
    from kmeanwithmapreduce_spark.operators import graph as G
    from kmeanwithmapreduce_spark.sources import readers

    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)],
        "l_orderkey long, l_partkey long",
    )
    orig = readers.load_table
    try:
        readers.load_table = lambda s, d, t: li
        # the operator imports load_table lazily from ..sources.readers
        rows = {
            (r.p1, r.p2): r
            for r in G.q39_copurchase_lift(spark, "ignored").collect()
        }
    finally:
        readers.load_table = orig
    assert set(rows) == {(10, 20), (10, 30)}
    ab = rows[(10, 20)]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.support == 2 / 3 and ab.confidence == 2 / 3 and ab.lift == 1.0
    ac = rows[(10, 30)]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (1, 3, 1)
    assert ac.lift == 1.0


def test_q39_scale_plan(spark, sf_dir):
    """Top-k via TakeOrderedAndProject (no global sort), no cartesian,
    no fact self-join (single lineitem scan feeds the pair counts)."""
    from kmeanwithmapreduce_spark.operators.graph import q39_copurchase_lift
    from kmeanwithmapreduce_spark.plans import explain_str

    plan = explain_str(q39_copurchase_lift(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
