"""Kafka connector scaffold: the COVERAGE.md disclosure ("no Kafka
broker or spark-sql-kafka jar in this container") as an executable
statement, mirroring tests/test_jdbc.py. If the Kafka source provider
ever becomes resolvable, the plan-construction path runs for real and
a missing broker becomes the only skip reason."""

from __future__ import annotations

import pytest

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def _kafka_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
        return True
    except Exception:
        return False


def test_kafka_reader_plan_or_logged_skip(spark):
    if not _kafka_available(spark):
        pytest.skip(
            f"no Kafka connector on the JVM classpath (probed {_KAFKA_PROVIDER}); "
            "readStream.format('kafka') declared but unexercisable here"
        )
    # jar present (non-container environments): building the streaming
    # plan must succeed even with no broker up — failures past this
    # point would be connection-time, not plan-time
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", "events")
        .option("startingOffsets", "earliest")
    )
    df = reader.load()
    assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
