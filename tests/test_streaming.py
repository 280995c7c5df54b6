"""Structured Streaming: each streaming window agg must equal its batch
equivalent on the same bounded input (the streaming/batch unification
contract), plus the foreachBatch incremental K-Means."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators import windows_batch
from kmeanwithmapreduce_spark.streaming import windows as sw


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_stream_to_memory(
        sw.streaming_tumbling_agg(stream), "t_tumbling"
    )
    want = windows_batch.w01_tumbling(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_sliding_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_stream_to_memory(sw.streaming_sliding_agg(stream), "t_sliding")
    want = windows_batch.w02_sliding(spark, sf_dir)
    cols = ["window_start", "n", "avg_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    got = sw.run_stream_to_memory(sw.streaming_session_agg(stream), "t_session")
    want = windows_batch.w03_session(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_dedup_drops_replayed_batch(spark, sf_dir, tmp_path_factory):
    """Write the same rows twice as two files: the second delivery must
    be fully deduplicated by event_id within the watermark."""
    from kmeanwithmapreduce_spark.sources.readers import normalize_ts

    src = str(tmp_path_factory.mktemp("dedup_src"))
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet").limit(200)
    )
    batch.write.mode("overwrite").parquet(src)
    batch.write.mode("append").parquet(src)  # replay: every row duplicated

    raw = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = normalize_ts(raw)
    deduped = sw.streaming_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT event_id FROM sdedup")
    assert out.count() == 200
    assert out.distinct().count() == 200


def test_streaming_kmeans_converges_toward_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir).select(
        F.array(F.col("value")).cast("array<float>").alias("features")
    )
    init = [[0.0], [100.0]]
    cents = sw.streaming_kmeans_foreachbatch(
        spark, stream, k=2, dim=1, init_centroids=init, decay=0.2
    )
    c = np.sort(np.asarray(cents).ravel())
    assert c[0] != 0.0 and c[1] != 100.0  # both centroids moved
    assert 0.0 < c[0] < c[1]
