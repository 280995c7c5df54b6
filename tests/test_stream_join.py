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


def test_stream_static_enrichment_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment: the streamed result must
    equal the batch join, row for row, including unmatched (left) rows."""
    from pyspark.sql import functions as F

    from kmeanwithmapreduce_spark.sources.readers import load_table
    from kmeanwithmapreduce_spark.streaming.joins import enrich_stream_with_dim

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # dim misses some users -> left join must keep those events with NULLs
    dim = (
        e.select("user_id").distinct().where(F.col("user_id") % 3 != 0)
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "gold").otherwise("basic"))
    )
    src = str(tmp_path / "src")
    e.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        enrich_stream_with_dim(stream, dim, "user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(str, spark.read.parquet(out).select("event_id", "user_id", "tier").collect())
    )
    want = sorted(
        map(str, enrich_stream_with_dim(spark.read.parquet(src), dim, "user_id")
            .select("event_id", "user_id", "tier").collect())
    )
    assert got == want
    assert any("tier=None" in r for r in got)  # unmatched side survived
