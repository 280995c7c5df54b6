"""A custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
deterministic synthetic clustered points ("blobs") for the K-Means
surface.

The reference ships one fixed 2000-row CSV (Data/CustomerData.txt,
Main.java:39-68) as its only input; scale experiments there mean
hand-building bigger files. This source generates an arbitrarily large
clustered corpus DIRECTLY in the scan, no files anywhere:

    spark.dataSource.register(BlobsDataSource)
    df = (spark.read.format("kmeans_blobs")
          .option("n", 10_000_000).option("k", 8).option("dim", 7)
          .option("seed", 42).option("partitions", 256).load())

Scale design: each of the ``partitions`` input splits generates its own
row range on an executor from (seed, partition_id) alone — no driver
data, no shuffle, no storage; 100 TB of input is just more partitions.
Rows are emitted as Arrow RecordBatches (the vectorized fast path of
the Python source API), one batch per split. Generation is fully
deterministic: same options => identical rows, any cluster size, any
run — the reproducibility contract the engine's golden-row oracles
rely on elsewhere.

Ground truth (`true_cluster`) rides along, so clustering quality is
directly measurable (see test_pysource: compat-mode Lloyd from the true
centers relabels >99% of points correctly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_NOISE = 0.04  # stddev of the per-dimension Gaussian around each center


def blob_centers(k: int, dim: int, seed: int) -> np.ndarray:
    """The k true centers in [0.1, 0.9]^dim — deterministic in seed.
    Exposed so tests (and users) can compare fitted centroids against
    ground truth without re-deriving the generator's internals."""
    rs = np.random.RandomState(seed)
    return 0.1 + 0.8 * rs.random_sample((k, dim))


class BlobsDataSource(DataSource):
    """``format("kmeans_blobs")`` — options: n (rows, default 1000),
    k (centers, 3), dim (7), seed (42), partitions (8)."""

    @classmethod
    def name(cls) -> str:
        return "kmeans_blobs"

    def schema(self) -> str:
        return "point_id bigint, features array<float>, true_cluster int"

    def reader(self, schema) -> "BlobsReader":
        return BlobsReader(self.options)


class BlobsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.k = int(options.get("k", 3))
        self.dim = int(options.get("dim", 7))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        # row ranges, evenly split; the partition object is the only
        # state shipped to executors
        bounds = np.linspace(0, self.n, self.n_parts + 1, dtype=np.int64)
        return [
            InputPartition((int(lo), int(hi)))
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]

    def read(self, partition):
        """Executor-side: generate [lo, hi) as ONE Arrow RecordBatch.
        Noise is seeded by (seed, lo) so partitioning does not change
        values; the center assignment is point_id % k so ground truth is
        derivable without the RNG."""
        import pyarrow as pa

        lo, hi = partition.value
        m = hi - lo
        ids = np.arange(lo, hi, dtype=np.int64)
        cluster = (ids % self.k).astype(np.int32)
        centers = blob_centers(self.k, self.dim, self.seed)
        rs = np.random.RandomState((self.seed * 1_000_003 + lo) % (2**32))
        pts = centers[cluster] + _NOISE * rs.standard_normal((m, self.dim))
        pts = np.clip(pts, 0.0, 1.0).astype(np.float32)
        batch = pa.record_batch(
            {
                "point_id": pa.array(ids, pa.int64()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(pts.ravel(), pa.float32()), self.dim
                ).cast(pa.list_(pa.float32())),
                "true_cluster": pa.array(cluster, pa.int32()),
            }
        )
        yield batch


def register(spark) -> None:
    """Idempotent registration of all custom Python data sources."""
    spark.dataSource.register(BlobsDataSource)
