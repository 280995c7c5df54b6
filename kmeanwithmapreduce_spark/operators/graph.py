"""PageRank over a DataFrame edge list — the ranking companion to
corpus.py's connected components on the same near-dup / citation /
link graphs (Page, Brin, Motwani, Winograd 1999; the Spark-idiomatic
join formulation follows the published GraphX/Pregel decomposition).

Use in this engine: given d03/d02 near-dup pairs or any reference
graph over documents, PageRank scores centrality — e.g. to pick the
CANONICAL doc of a dup cluster by authority instead of min-id, or to
weight quality sampling toward well-linked sources.

Scale notes (the things that decide 100 TB viability):
- per iteration: ONE shuffle keyed by edge source (contribution join)
  + ONE groupBy the destination — both partial-aggregated map-side;
  rank state is one row per node, edges stream through.
- out-degrees are computed once, joined into the edge relation once,
  and the combined frame is checkpointed BEFORE the loop: iterations
  re-read a materialized edges+degree relation, they never re-derive
  it (nor grow lineage — same per-round checkpoint-and-release
  discipline as connected_components, pluggable local/reliable).
- dangling mass (nodes with no out-edges) is folded back uniformly:
  one scalar aggregate per iteration, collected as a single double —
  without it rank mass leaks and scores of sink-heavy graphs drift.
- convergence probe is the L1 delta — one join+agg on the k-row-per-
  node rank frames, collected as one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus import _make_checkpointer, _release_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    checkpoint: str = "local",
) -> DataFrame:
    """Rank every node of the DIRECTED edge list; returns (node, rank)
    with ranks summing to ~1. Undirected graphs: pass both directions
    (e.g. ``edges.union(edges.select(dst, src))``).

    Stops when the L1 rank delta drops below ``tol`` or after
    ``max_iter`` iterations. Deterministic up to float aggregation
    order (merge-order ulps — tests compare against a NumPy reference
    within 1e-9, not bit-exact)."""
    ckpt = _make_checkpointer(edges, checkpoint)

    # emptiness check BEFORE any eager checkpoint exists — an early
    # return must not leak a persisted RDD the caller can't release
    if edges.limit(1).count() == 0:
        return edges.select(F.col(src).alias("node"), F.lit(0.0).alias("rank"))

    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # materialize ONCE, iterate many: the (src, dst, out_deg) relation,
    # the node set, and the sink set all derive from (possibly
    # expensive) upstream plans — none may re-execute per round
    ed = ckpt(
        edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).join(
            deg, "node"
        )
    )
    nodes = ckpt(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    # the per-iteration dangling-mass probe is a semi join against this
    # small frame, not a re-aggregation of the full edge relation
    dangling_nodes = ckpt(nodes.join(deg, "node", "left_anti"))
    ranks = ckpt(nodes.select("node", F.lit(1.0 / n).alias("rank")))
    old_ckpts = [ed, nodes, dangling_nodes, ranks]
    for _ in range(max_iter):
        contribs = (
            ed.join(ranks, "node")
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # dangling nodes (no out-edges) spread their mass uniformly
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        new_ranks = ckpt(
            nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "_old"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("_old"))))
            .first()[0]
        )
        _release_checkpoint(ranks)
        old_ckpts.remove(ranks)
        ranks = new_ranks
        old_ckpts.append(ranks)
        if delta is not None and delta < tol:
            break
    result = ranks
    result._spark_graft_ckpts = tuple(old_ckpts)  # noqa: SLF001
    return result


def top_authority_per_component(
    ranks: DataFrame, components: DataFrame, k: int = 1
) -> DataFrame:
    """Join PageRank scores onto connected-components output and keep
    the k highest-authority nodes per component (rank DESC, node ASC
    tie-break) — the authority-based canonical-doc selection for dup
    clusters. Plans with the WindowGroupLimit partial top-k (bounded
    per-group shuffle, q09's whale-group property)."""
    w = Window.partitionBy("component").orderBy(
        F.col("rank").desc(), F.col("node").asc()
    )
    return (
        components.join(ranks, "node")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
