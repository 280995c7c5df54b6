"""Custom Python DataSource (kmeans_blobs): registration, schema,
determinism, distributed split structure, and end-to-end clustering
quality against the generator's ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.pysource import (
    BlobsDataSource,
    blob_centers,
    register,
)


def _blobs(spark, **opts):
    register(spark)
    r = spark.read.format("kmeans_blobs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_blobs_count_schema_and_splits(spark):
    df = _blobs(spark, n=10_000, k=4, dim=5, seed=7, partitions=16)
    assert df.count() == 10_000
    assert (
        df.schema.simpleString()
        == "struct<point_id:bigint,features:array<float>,true_cluster:int>"
    )
    # generation is split across the requested executor-side partitions
    n_parts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts == 16
    # every feature inside [0,1], correct arity
    row = df.agg(
        F.min(F.array_min("features")).alias("lo"),
        F.max(F.array_max("features")).alias("hi"),
        F.min(F.size("features")).alias("d1"),
        F.max(F.size("features")).alias("d2"),
    ).collect()[0]
    assert 0.0 <= row.lo <= row.hi <= 1.0 and row.d1 == row.d2 == 5


def test_blobs_deterministic_and_partition_invariant(spark):
    a = _blobs(spark, n=3_000, k=3, dim=4, seed=11, partitions=4)
    b = _blobs(spark, n=3_000, k=3, dim=4, seed=11, partitions=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # different seed => different data
    c = _blobs(spark, n=3_000, k=3, dim=4, seed=12, partitions=4)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_blobs_points_cluster_around_true_centers(spark):
    k, dim, seed = 4, 6, 42
    df = _blobs(spark, n=8_000, k=k, dim=dim, seed=seed, partitions=8)
    centers = blob_centers(k, dim, seed)
    got = (
        df.groupBy("true_cluster")
        .agg(*[F.avg(F.element_at("features", i + 1)).alias(f"m{i}") for i in range(dim)])
        .collect()
    )
    for r in got:
        emp = np.array([r[f"m{i}"] for i in range(dim)])
        assert np.abs(emp - centers[r.true_cluster]).max() < 0.02


def test_kmeans_on_blobs_recovers_ground_truth(spark):
    """End-to-end: the engine's own Lloyd, initialized at the true
    centers, relabels ≥99% of generated points to their ground-truth
    cluster — the separation/noise contract of the generator."""
    from kmeanwithmapreduce_spark.kmeans import core

    k, dim, seed = 3, 7, 5
    df = _blobs(spark, n=6_000, k=k, dim=dim, seed=seed, partitions=8)
    init = [list(map(float, c)) for c in blob_centers(k, dim, seed)]
    res = core.lloyd(
        df.select("point_id", "features"),
        core.KMeansParams(k=k, thresh=1e-3, max_loop=10),
        init_centroids=init,
    )
    labeled = core.assign(df.select("point_id", "features", "true_cluster"), res.centroids)
    agree = labeled.where(F.col("cluster") == F.col("true_cluster")).count()
    assert agree / 6_000 >= 0.99


def test_blobs_stream_equals_batch(spark):
    """readStream over the generator must deliver exactly the batch
    rows (same ids, same values) across micro-batches."""
    opts = dict(n=2_000, k=3, dim=4, seed=21)
    batch = _blobs(spark, **opts, partitions=4)
    register(spark)
    r = spark.readStream.format("kmeans_blobs")
    for k, v in {**opts, "rows_per_batch": 300}.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("blobs_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("blobs_stream").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want


def test_streaming_kmeans_on_blobs_stream(spark):
    """The engine's foreachBatch streaming K-Means over the generated
    stream moves its centroids toward the generator's true centers."""
    import numpy as np

    from kmeanwithmapreduce_spark.streaming.windows import (
        streaming_kmeans_foreachbatch,
    )

    k, dim, seed = 3, 5, 33
    register(spark)
    r = spark.readStream.format("kmeans_blobs")
    for kk, v in dict(n=4_000, k=k, dim=dim, seed=seed, rows_per_batch=800).items():
        r = r.option(kk, v)
    stream = r.load().select("features")
    true = blob_centers(k, dim, seed)
    # start displaced from the true centers; the incremental updates
    # must pull each centroid (most of the way) back onto its blob
    off = 0.08
    init = [[float(v) + off * (1 if j % 2 else -1) for j, v in enumerate(c)] for c in true]
    cents = streaming_kmeans_foreachbatch(
        spark, stream, k=k, dim=dim, init_centroids=init, decay=0.1
    )
    for i, c in enumerate(cents):
        d0 = np.abs(true[i] - np.asarray(init[i])).max()
        d1 = np.abs(true[i] - np.asarray(c)).max()
        assert d1 < d0 and d1 < 0.04, (i, d0, d1)


def test_blobs_partition_count_invariance(spark):
    """The corpus is a pure function of (n, k, dim, seed): changing the
    partition count must not change a single value."""
    a = _blobs(spark, n=2_000, k=3, dim=4, seed=21, partitions=4)
    b = _blobs(spark, n=2_000, k=3, dim=4, seed=21, partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
