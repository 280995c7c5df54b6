"""Stream-stream join: clicks joined to the same user's purchases
within a bounded time interval — the watermarked two-stream join
(Structured Streaming buffers both sides; the interval condition +
watermarks bound the buffered state, which is what makes this viable
on an unbounded source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_with_recent_purchase(
    events: DataFrame, window_minutes: int = 10, watermark: str = "30 minutes"
) -> DataFrame:
    """For each click, all purchases by the same user in the preceding
    ``window_minutes``. State: each side buffered only until the
    watermark passes the interval bound."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    ).select("click_id", "c_user", "click_ts", "purchase_ts", "purchase_value")


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-STATIC join: enrich an unbounded stream with a (small)
    dimension — the lookup-table pattern. The static side is marked
    broadcast, so every micro-batch plans a BroadcastHashJoin with
    ZERO streaming state (unlike a stream-stream join nothing is
    buffered; the dim is re-resolvable per batch, which also means a
    dim refreshed between batches — e.g. an SCD2 snapshot chain
    advancing — is picked up on the next trigger when the caller
    passes a lazily-read frame).

    Composition with the SCD2 chain: pass
    ``read_scd2_dim(spark, dim_path).where("is_current")`` to enrich
    each event with the dimension attributes CURRENT at processing
    time."""
    return stream.join(F.broadcast(dim), key, how)
