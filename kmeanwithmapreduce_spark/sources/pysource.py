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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_NOISE = 0.04  # stddev of the per-dimension Gaussian around each center


def blob_centers(k: int, dim: int, seed: int) -> np.ndarray:
    """The k true centers in [0.1, 0.9]^dim — deterministic in seed.
    Exposed so tests (and users) can compare fitted centroids against
    ground truth without re-deriving the generator's internals."""
    rs = np.random.RandomState(seed)
    return 0.1 + 0.8 * rs.random_sample((k, dim))


_U64 = np.uint64


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix)."""
    z = (z + _U64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _hash_normal(keys: np.ndarray) -> np.ndarray:
    """Standard-normal noise as a PURE FUNCTION of each key (counter-
    based RNG): two splitmix64 streams -> uniforms -> Box-Muller. This
    is what makes the source partition- AND batch-invariant: row i's
    value never depends on which split generated it."""
    u1 = (_splitmix64(keys) >> _U64(11)).astype(np.float64) * 2.0**-53
    u2 = (_splitmix64(keys ^ _U64(0xDEADBEEFCAFEF00D)) >> _U64(11)).astype(
        np.float64
    ) * 2.0**-53
    u1 = np.maximum(u1, 1e-300)  # log(0) guard
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def _gen_rows(lo: int, hi: int, k: int, dim: int, seed: int):
    """Deterministic row range [lo, hi): ids, float32 points, clusters.
    Noise is counter-based per (seed, point_id, dimension), so ANY
    split/batching of the id space yields bit-identical values."""
    ids = np.arange(lo, hi, dtype=np.int64)
    cluster = (ids % k).astype(np.int32)
    centers = blob_centers(k, dim, seed)
    keys = (
        ids[:, None].astype(np.uint64) * _U64(dim)
        + np.arange(dim, dtype=np.uint64)[None, :]
        + _splitmix64(np.array([seed], dtype=np.uint64))
    )
    pts = centers[cluster] + _NOISE * _hash_normal(keys)
    return ids, np.clip(pts, 0.0, 1.0).astype(np.float32), cluster


class BlobsDataSource(DataSource):
    """``format("kmeans_blobs")`` — options: n (rows, default 1000),
    k (centers, 3), dim (7), seed (42), partitions (8); streaming adds
    rows_per_batch (500)."""

    @classmethod
    def name(cls) -> str:
        return "kmeans_blobs"

    def schema(self) -> str:
        return "point_id bigint, features array<float>, true_cluster int"

    def reader(self, schema) -> "BlobsReader":
        return BlobsReader(self.options)

    def simpleStreamReader(self, schema) -> "BlobsStreamReader":
        return BlobsStreamReader(self.options)


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
        """Executor-side: generate [lo, hi) as ONE Arrow RecordBatch
        (the vectorized fast path; the center assignment is point_id % k
        so ground truth is derivable without the RNG)."""
        import pyarrow as pa

        lo, hi = partition.value
        ids, pts, cluster = _gen_rows(lo, hi, self.k, self.dim, self.seed)
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


class BlobsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same deterministic corpus: batch i is
    rows [i*rows_per_batch, (i+1)*rows_per_batch), capped at n. The
    offset is just the next row id, so `readBetweenOffsets` replay after
    a failure regenerates bit-identical rows — exactly-once by
    determinism (the property a Kafka offset gives you, here from the
    generator itself).

    Scale note: the SIMPLE stream-reader API generates on the driver by
    design (pyspark routes its reads through one process) — right for
    tests and modest rates; a firehose-scale generator would implement
    the partition-planning DataSourceStreamReader instead, reusing the
    same _gen_rows kernel on executors as the batch reader does."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.k = int(options.get("k", 3))
        self.dim = int(options.get("dim", 7))
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 500))

    def initialOffset(self) -> dict:
        return {"next_row": 0}

    def _rows(self, lo: int, hi: int):
        ids, pts, cluster = _gen_rows(lo, hi, self.k, self.dim, self.seed)
        return [
            (int(i), [float(x) for x in p], int(c))
            for i, p, c in zip(ids, pts, cluster)
        ]

    def read(self, start: dict):
        lo = start["next_row"]
        hi = min(lo + self.rows_per_batch, self.n)
        return iter(self._rows(lo, hi)), {"next_row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["next_row"], end["next_row"]))


def register(spark) -> None:
    """Idempotent registration of all custom Python data sources."""
    spark.dataSource.register(BlobsDataSource)
