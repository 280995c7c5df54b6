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
