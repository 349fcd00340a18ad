"""Stream-stream interval join: click→purchase attribution on live events.

The streaming twin of ``operators.temporal.asof_attribute``'s candidate
generation: two event-time streams (clicks, purchases) carved from one
ingest, joined per user with a bounded look-back window. This is Spark's
watermarked stream-stream inner join — both sides buffer rows in the state
store, the event-time range condition bounds HOW LONG: a click older than
the attribution window past the watermark can never match and is evicted,
so state is O(events within window), not O(stream history).

At 100 TB/day the shape holds: state is hash-partitioned on user_id across
executors, eviction is watermark-driven (late data beyond the watermark
drops, consistent with every other windowed operator here), and the join
itself is the same keyed exchange a batch join would plan. The batch
operator keeps only the LAST click (as-of semantics); the stream emits
every in-window candidate — collapsing to the last is a downstream
aggregation the test pins against the batch operator's candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: how far back a purchase looks for its click
ATTRIBUTION_WINDOW_MIN = 60
#: how late events may arrive before they're dropped
LATENESS_MIN = 10


def click_purchase_join(
    events: DataFrame,
    window_min: int = ATTRIBUTION_WINDOW_MIN,
    lateness_min: int = LATENESS_MIN,
) -> DataFrame:
    """Input: a streaming frame with (user_id, event_id, event_type, ts).
    Output: one row per (purchase, in-window prior click) candidate pair
    with the click→purchase lag in microseconds."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", f"{lateness_min} minutes")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", f"{lateness_min} minutes")
    )
    cond = F.expr(
        "user_id = c_user "
        "AND click_ts <= purchase_ts "
        f"AND click_ts >= purchase_ts - INTERVAL {window_min} MINUTES"
    )
    return purchases.join(clicks, cond).select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (
            F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
        ).alias("lag_us"),
    )
