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

# applications whose executors already received the package zip —
# addPyFile is sticky for the app's lifetime, so once is enough
_SHIPPED_APPS: set[str] = set()


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ship_package(spark: SparkSession) -> None:
    """Ship this package's source to executors as a zip (addPyFile).

    mapInPandas / pandas-UDF closures reference package modules BY NAME
    (pickle serializes functions by module path), so executor Python
    workers must be able to ``import kmeanwithmapreduce_spark.*`` at
    task time. Nothing guarantees that: a driver launched from any cwd
    other than the repo root (``python /root/repo/bench.py`` from /tmp)
    puts the repo on the DRIVER's sys.path only, and every Python-kernel
    operator (BPE apply, codec decode, ANN LUT kernel) dies on executors
    with ModuleNotFoundError. On a real cluster the same applies to every
    executor host. ``sc.addPyFile`` distributes the zip and prepends it
    to each worker's sys.path — the standard PySpark packaging answer.

    Idempotent per application id (re-ships after an app restart, so a
    changed source tree wins). Degrades with a loud warning instead of
    raising: a failure here only loses the cwd-independence hardening,
    not the session."""
    try:
        sc = spark.sparkContext
        app = sc.applicationId
        if app in _SHIPPED_APPS:
            return
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        zpath = os.path.join(
            tempfile.gettempdir(),
            f"{os.path.basename(pkg_dir)}_pyfiles_{app}.zip",
        )
        with zipfile.ZipFile(zpath, "w") as zf:
            for d, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in d:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(d, fn)
                        zf.write(full, os.path.relpath(full, root))
        sc.addPyFile(zpath)
        _SHIPPED_APPS.add(app)
    except Exception as exc:  # pragma: no cover - env-dependent
        import warnings

        warnings.warn(
            f"ship_package: could not ship the package zip to executors "
            f"({exc!r}); Python-kernel operators require the driver cwd "
            "to be the repo root until this is resolved"
        )


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
        # --- optimizer: InferFiltersFromGenerate clones each explode's
        # generator EXPRESSION into an inferred size()>0 predicate that
        # pushes below the parallelizing exchange — for the text
        # operators (5-gram shingles, span windows) that evaluates the
        # heaviest expression in the pipeline TWICE per row, once in
        # the scan stage (round-13 measurement: c01 warm 5.2 s -> 1.4 s
        # with the rule excluded; d02/c07 similar direction). The rule
        # only short-circuits empty generator inputs — excluding it is
        # value-neutral at any scale; explode of an empty array still
        # emits zero rows.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        # --- scans: keep splits big enough to amortize task overhead ----
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); read as long + convert
        # (see sources.readers.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as INT64 micros, not legacy INT96: INT96
        # carries NO footer min/max statistics, which blinds both the
        # data-skipping sidecar harvest (sources/stats.py) and parquet
        # row-group pruning on every timestamp predicate — and it is
        # what Delta/Iceberg write
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
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
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
