"""Structured Streaming over the events table (SURVEY §7.1 M4): the
reference is strictly batch, so this is new surface — watermarked
tumbling/sliding/session window aggregations, plus an incremental
streaming K-Means via foreachBatch.

The transformations are the SAME operators as operators.windows_batch
(F.window / session_window) applied to a readStream DataFrame —
Structured Streaming's core design point, and the reason the batch
duckdb oracle meaningfully checks the streaming semantics too.

Scale: watermarks bound state (late data beyond the watermark is
dropped); tumbling/sliding state is per (window, key); session state
merges on overlap. On a cluster the source would be Kafka with the same
plan; file-source streaming here exercises identical state management.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_batch_schema(spark: SparkSession, sf_dir: str):
    """The schema the BATCH parquet reader sees for this events file —
    probed, not hardcoded. Round 3 hardcoded ``ts: LongType`` (the
    TIMESTAMP(NANOS)-as-long layout) here; when the upstream writer
    switched to TIMESTAMP(MICROS) the stream silently read micros as if
    they were nanos and produced 1970-era timestamps. Probing the footer
    once per stream start (driver-side, O(1)) makes the stream layout
    assumption identical to the batch reader's by construction."""
    from ..sources.readers import ensure_session_conf

    ensure_session_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet; ``ts`` normalized to
    session-tz TIMESTAMP by the SAME helper as the batch reader
    (sources.readers.normalize_ts), so batch and streaming can never
    disagree about the file layout."""
    from ..sources.readers import normalize_ts

    raw = (
        spark.readStream.schema(events_batch_schema(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        # file stream source requires a directory; select just events
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_ts(raw)


def streaming_tumbling_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    from ..operators.relational import _gridsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _gridsum(F.col("value"), 100, 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def streaming_sliding_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    from ..operators.relational import _gridavg

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _gridavg(F.col("value"), 100, 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


def streaming_session_agg(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def streaming_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    dropDuplicatesWithinWatermark keeps each key only until the
    watermark passes it — the unbounded-stream version of d01. Late
    re-arrivals inside the watermark are dropped as duplicates; state
    never grows past the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming aggregation to completion on bounded input via
    the memory sink (synchronous: processAllAvailable)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.table(name)


def streaming_kmeans_foreachbatch(
    spark: SparkSession,
    stream: DataFrame,
    k: int,
    dim: int,
    init_centroids: list[list[float]],
    decay: float = 0.5,
    features_col: str = "features",
) -> list[list[float]]:
    """Incremental (mini-batch) K-Means over a stream via foreachBatch:
    per micro-batch, assign to current centroids, compute batch means,
    and blend old/new with exponential decay — the streaming-k-means
    update rule (public MLlib StreamingKMeans semantics re-expressed on
    Structured Streaming). Returns the final centroids."""
    from ..kmeans import core

    state = {"centroids": [list(map(float, c)) for c in init_centroids]}

    def update(batch_df: DataFrame, _epoch: int) -> None:
        if not batch_df.head(1):
            return
        assigned = core.assign(batch_df, state["centroids"], features_col)
        stats = core._update_centroids(assigned, k, dim, features_col)
        cents = state["centroids"]
        for i, (mean, n) in stats.items():
            if n > 0:
                cents[i] = [
                    decay * old + (1.0 - decay) * new
                    for old, new in zip(cents[i], mean)
                ]

    q = stream.writeStream.outputMode("append").foreachBatch(update).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return state["centroids"]
