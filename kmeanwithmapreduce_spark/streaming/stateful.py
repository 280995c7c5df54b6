"""Custom stateful streaming operator via applyInPandasWithState:
per-user running statistics (event count, value sum, last-seen ts)
maintained across micro-batches — the arbitrary-state surface
(SURVEY §2 Part B 'Streaming' / §7.1 M4) the reference has no analogue
for.

Scale: state is per-key (user_id), partitioned by the groupBy hash —
adding executors shards the state store. Timeouts would evict idle keys
(ProcessingTimeTimeout); bounded input here never times out.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    max_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_ts": [max_ts],
        }
    )


def streaming_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats; emits the updated row for each user seen
    in each micro-batch (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs ``google.protobuf`` for its
    state-server protocol; this container does not ship it (and has no
    network to install it). True on any standard cluster image. The
    probe-gated test (test_extensions) stops skipping the moment the
    dependency resolves — the Kafka-jar pattern."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_user_stats_tws(events: DataFrame) -> DataFrame:
    """The SAME operator on the successor API: transformWithStateInPandas
    (Spark 4's StatefulProcessor — typed state handles, timers, state
    TTL; requires the RocksDB state store provider AND google.protobuf,
    see tws_available). Semantically identical to streaming_user_stats;
    pinned equal by test wherever the dependency exists.

    Scale: identical sharding story (state partitioned by the groupBy
    key hash), plus RocksDB spills state to local disk — the provider a
    large-state 100 TB deployment runs anyway.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            max_ts = None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_ts": [max_ts],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
