"""Stream-stream interval join vs the identical batch join on bounded
input."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources.readers import load_table
from kmeanwithmapreduce_spark.streaming import windows as sw
from kmeanwithmapreduce_spark.streaming.joins import clicks_with_recent_purchase


def test_stream_stream_join_equals_batch(spark, sf_dir):
    stream = sw.read_events_stream(spark, sf_dir)
    joined = clicks_with_recent_purchase(stream)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM ssj")

    e = load_table(spark, sf_dir, "events")  # withWatermark is a no-op on batch
    want = clicks_with_recent_purchase(e)  # same function, batch DataFrame

    cols = ["click_id", "c_user", "click_ts", "purchase_ts", "purchase_value"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == w
    assert len(g) > 0
