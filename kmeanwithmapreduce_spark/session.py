"""SparkSession bootstrap tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the config block is written so the same settings scale to a
multi-executor cluster: AQE on (runtime coalescing, skew-join splitting),
shuffle partitions sized to parallelism, Arrow enabled for the few
Pandas-UDF operators, UTC session timezone so results hash-match a
UTC-naive DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kmeanwithmapreduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-conscious defaults.

    On a real cluster you would drop ``master`` and let spark-submit set
    executors; every other setting below is cluster-appropriate as-is.
    """
    cpus = cpu_count()
    # Spark tasks are the parallelism axis: a BLAS thread pool inside
    # every Python worker (NumPy matmul in the GEMM/pandas-UDF paths)
    # oversubscribes the cores (workers x MAX_THREADS) and collapses
    # under any co-tenant CPU pressure. Pin BLAS/OpenMP to one thread
    # per worker — set BEFORE the JVM launches so forked python workers
    # inherit it; setdefault respects an operator's explicit override.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- planner / runtime adaptivity -------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing --------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or max(cpus, DEFAULT_SHUFFLE_PARTITIONS)),
        )
        .config("spark.default.parallelism", str(cpus))
        # --- scans: keep splits big enough to amortize task overhead ----
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); read as long + convert
        # (see sources.readers.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- python<->jvm: Arrow for pandas UDFs / toPandas -------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism for the duckdb oracle (UTC-naive timestamps) ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- broadcast threshold: dims (region/nation/supplier) stay BHJ
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # on a real cluster executors do NOT inherit the driver env —
        # carry the BLAS pinning to executor python workers explicitly
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
