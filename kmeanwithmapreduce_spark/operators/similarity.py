"""Similarity search over the embeddings table (array<float> column).

- s01: brute-force cosine top-k — the exactness baseline. JVM-side
  zip_with/aggregate dot products against a broadcast of the query
  vectors; ranking via window. Scale: O(Q x N) but embarrassingly
  parallel; Q (queries) is broadcast so no shuffle until the tiny top-k.
- s02: random-hyperplane LSH (SimHash for vectors): 16 deterministic
  hyperplanes -> 16-bit bucket; candidate pairs share a bucket. This is
  the 100 TB path: the N x N pair space collapses to per-bucket blocks.
  Hyperplane components are +-1 Rademacher signs derived from md5 (the
  d03 affine-permutation trick) and folded into BOTH the Spark plan and
  the DuckDB oracle as literals; dot products are computed over the
  1e6 integer grid so the sign — hence the bucket — is exact in any
  engine and any accumulation order (hash-matched oracle, not
  rows-only as in round 1).
- s03: IVF-style coarse quantization using K-Means centroids as the
  inverted index: assign every vector to its nearest centroid cell, then
  search only the probe cell(s). Composes the engine's own kmeans.core.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity_expr
from ..sources.readers import load_table

_TOP_K = 10
_N_QUERIES = 5  # vec_id < 5 are the query vectors
_LSH_PLANES = 16
_EMB_DIM = 64  # embeddings table arity (TESTDATA.md); oracle SQL is static
_EMB_SCALE = 1_000_000  # integer grid: dot signs exact across engines


# --------------------------------------------------------------------------
# s01 — brute-force cosine top-k, query vectors vs the rest.
def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    base = e.where(F.col("vec_id") >= _N_QUERIES)
    # floor-truncate at 4dp (engine-identical on identical doubles)
    sim = (
        F.floor(
            cosine_similarity_expr(F.col("qvec"), F.col("embedding")) * 10000.0
        )
        / 10000.0
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", sim)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= _TOP_K)
    )


S01_SQL = f"""
SELECT query_id, vec_id, cosine, rk
FROM (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY cosine DESC, vec_id ASC) AS INT) AS rk
  FROM (
    SELECT q.vec_id AS query_id, b.vec_id AS vec_id,
           floor(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])) * 10000.0)
             / 10000.0 AS cosine
    FROM embeddings q CROSS JOIN embeddings b
    WHERE q.vec_id < {_N_QUERIES} AND b.vec_id >= {_N_QUERIES}
  )
)
WHERE rk <= {_TOP_K}
"""


# --------------------------------------------------------------------------
# s02 — random-hyperplane LSH bucketing, oracle-checked bit-for-bit.
# Plane components are +-1 signs from md5 of "s02:<plane>:<dim>" —
# deterministic public arithmetic both engines reproduce from the same
# literals. The projection sign uses round(x * 1e6) BIGINT terms, so the
# sum is exact integer arithmetic: no accumulation-order ulp can flip a
# bucket bit. Scale: one pass, no shuffle until the tiny bucket count.
def _plane_signs() -> list[list[int]]:
    planes = []
    for p in range(_LSH_PLANES):
        row = []
        for d in range(_EMB_DIM):
            byte = hashlib.md5(f"s02:{p}:{d}".encode()).digest()[0]
            row.append(1 if byte % 2 == 0 else -1)
        planes.append(row)
    return planes


_PLANES = _plane_signs()


def _plane_dot(signs: list[int]):
    """Exact integer-grid projection of the embedding onto one +-1 plane
    (factory function: keeps the HOF lambdas from capturing loop vars)."""
    lit_plane = F.array(*[F.lit(s) for s in signs])
    scaled = F.zip_with(
        F.col("embedding"),
        lit_plane,
        lambda x, y: F.round(x.cast("double") * _EMB_SCALE).cast("long")
        * y.cast("long"),
    )
    return F.aggregate(scaled, F.lit(0).cast("long"), lambda acc, v: acc + v)


def s02_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    bits = [
        F.when(_plane_dot(signs) >= 0, F.lit(2**p)).otherwise(F.lit(0))
        for p, signs in enumerate(_PLANES)
    ]
    bucket = sum(bits[1:], bits[0]).cast("bigint")
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _s02_sql() -> str:
    dots = []
    for p, signs in enumerate(_PLANES):
        lit = ", ".join(f"{s}.0" for s in signs)
        dots.append(
            f"CASE WHEN list_dot_product(list_transform("
            f"CAST(embedding AS DOUBLE[]), x -> round(x * {_EMB_SCALE})), "
            f"[{lit}]) >= 0 THEN {2**p} ELSE 0 END"
        )
    total = " + ".join(dots)
    return f"""
SELECT CAST({total} AS BIGINT) AS bucket, count(*) AS n_vectors
FROM embeddings
GROUP BY 1
"""


S02_SQL = _s02_sql()


# --------------------------------------------------------------------------
# s03 — IVF coarse index: cells from our own K-Means, probe-cell search.
def s03_ivf_search(spark: SparkSession, sf_dir: str, n_cells: int = 8) -> DataFrame:
    from ..kmeans import core

    e = load_table(spark, sf_dir, "embeddings")
    feats = e.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("features")
    )
    res = core.lloyd(
        feats,
        # few iterations: cell quality barely moves after 4 and the cells
        # only gate the candidate set, not correctness of ranking
        core.KMeansParams(k=n_cells, seed=7, thresh=1e-2, max_loop=4),
    )
    cells = core.assign(feats, res.centroids)  # vec_id -> cell
    q = cells.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("features").alias("qvec"),
        F.col("cluster").alias("qcell"),
    )
    base = cells.where(F.col("vec_id") >= _N_QUERIES)
    sim = (
        F.floor(
            cosine_similarity_expr(F.col("qvec"), F.col("features")) * 10000.0
        )
        / 10000.0
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        base.join(F.broadcast(q), base.cluster == q.qcell)  # probe own cell only
        .select("query_id", "vec_id", sim)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= _TOP_K)
    )


SIMILARITY_QUERIES = {
    "s01_knn_bruteforce": (s01_knn_bruteforce, S01_SQL),
    "s02_lsh_buckets": (s02_lsh_buckets, S02_SQL),
    "s03_ivf_search": (s03_ivf_search, None),
}
