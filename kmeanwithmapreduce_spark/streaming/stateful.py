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
