"""Kafka surface. The container has no spark-sql-kafka jar, no broker,
and no network to vendor either (Maven Central unresolvable — probed),
so the surface splits into:

- a provider probe (skips here; runs plan construction for real the
  moment the jar resolves on a richer classpath), and
- ALWAYS-EXECUTED tests of everything downstream of the socket: the
  wire-schema emulation, the consumer decode, and the full streaming
  pipeline — the code a real broker would feed is all exercised.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.sources import kafka as k
from kmeanwithmapreduce_spark.sources.readers import load_table


def test_probe_self_check_parquet_resolves(spark):
    """The availability probe must be able to resolve a source that is
    definitely present. Round-4 regression class: lookupDataSource was
    handed a SparkConf instead of the session SQLConf, so EVERY name —
    parquet included — threw inside the probe and kafka/avro were
    reported unavailable forever. source_available now self-checks
    parquet and raises on a broken mechanism; this pins both sides."""
    from kmeanwithmapreduce_spark.sources.probe import source_available

    assert source_available(spark, "parquet") is True
    assert source_available(spark, "json") is True
    # an unknown name must come back False (not raise): the parquet
    # self-check distinguishes "name missing" from "probe broken"
    assert source_available(spark, "definitely-not-a-datasource") is False


def test_kafka_reader_plan_or_logged_skip(spark):
    if not k.kafka_available(spark):
        pytest.skip(
            "no Kafka connector on the JVM classpath (probed "
            "org.apache.spark.sql.kafka010.KafkaSourceProvider) and no "
            "network to vendor the jar; wire-schema emulation tests below "
            "cover everything downstream of the socket"
        )
    df = k.read_kafka_stream(spark, "localhost:9092", "events")
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)


def test_wire_schema_matches_kafka_contract(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    wire = k.to_kafka_wire(e)
    # literal columns (topic, timestampType) come out non-nullable —
    # stricter than the real source; names and types must match exactly
    assert [(f.name, f.dataType) for f in wire.schema.fields] == [
        (f.name, f.dataType) for f in k.KAFKA_WIRE_SCHEMA.fields
    ]


def test_producer_consumer_roundtrip_batch(spark, sf_dir):
    """encode -> wire -> decode must reproduce every typed event column
    exactly (JSON value path: Double.toString round-trip, ISO timestamps,
    nested props string)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    back = k.parse_events_from_kafka(k.to_kafka_wire(e)).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    a = sorted(map(tuple, e.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_partitioning_mirrors_keyed_producer(spark, sf_dir):
    """partition = hash(key) % N and all rows of one key share one
    partition — the state-distribution property downstream watermarked
    aggs rely on."""
    e = load_table(spark, sf_dir, "events")
    wire = k.to_kafka_wire(e, n_partitions=4)
    per_key = wire.groupBy("key").agg(
        F.countDistinct("partition").alias("np")
    )
    assert per_key.where("np > 1").count() == 0
    assert wire.select("partition").distinct().count() <= 4


def test_kafka_pipeline_streaming_equals_batch(spark, sf_dir):
    """Full consumer pipeline over the emulated Kafka source, run as an
    actual streaming query, must equal the batch tumbling agg — the same
    unification contract the file-source streaming tests pin."""
    from kmeanwithmapreduce_spark.operators import windows_batch
    from kmeanwithmapreduce_spark.streaming import windows as sw

    got = sw.run_stream_to_memory(
        k.kafka_events_pipeline(spark, sf_dir), "t_kafka_pipeline"
    )
    want = windows_batch.w01_tumbling(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "total_value"]
    a = sorted(tuple(r[c] for c in cols) for r in got.collect())
    b = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert a == b
