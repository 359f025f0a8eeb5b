"""Stream-stream interval join: click→purchase attribution within a
time horizon, same logical plan for batch and streaming.

The reference has no stream-stream join (its one stream is the
websocket candle feed, data_collector.py), but a training-data /
analytics engine needs event-to-event correlation — the canonical
shape is "purchase within N hours of a click by the same user".
Spark-first design:

- ONE join definition (`attribution_pairs`) is used by the batch
  oracle query and the streaming path; the streaming variant only
  adds watermarks.  Batch and stream are therefore byte-identical on
  replay (pytest proves it), the same contract as
  streaming/candle_window.py.
- The condition is an equi-key (user_id) plus an event-time interval
  (`click_ts < purchase_ts <= click_ts + horizon`).  Batch: Catalyst
  plans a SortMergeJoin on user_id with the range as a post-join
  predicate — the non-equi part never forces a nested loop because
  the equality conjunct carries the distribution.  Streaming: Spark
  derives per-side state watermarks FROM the interval condition, so
  join state is O(events inside horizon+lateness), evicted as event
  time advances — bounded at any scale.
- At 100 TB the same plan holds: both sides shuffle on user_id
  (skew-salting available via functions/skew.py if one user is
  viral), and state size is governed by the horizon, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HORIZON = "4 hours"


def attribution_pairs(
    clicks: DataFrame, purchases: DataFrame, horizon: str = HORIZON
) -> DataFrame:
    """All (click, purchase) pairs by the same user with the purchase
    inside ``(click_ts, click_ts + horizon]``.  Works unchanged on
    batch DataFrames and on watermarked streams."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (c["user_id"] == p["p_user_id"])
        & (p["purchase_ts"] > c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond).select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def batch_attribution(
    spark: SparkSession, sf_dir: str, horizon: str = HORIZON
) -> DataFrame:
    """Batch twin over the events table (oracle-checked as
    ``event_attribution``)."""
    from trade_data_collection_service_spark.candles import events_df

    ev = events_df(spark, sf_dir)  # handles TIMESTAMP(NANOS)
    return attribution_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon,
    )


def stream_attribution(
    events_stream: DataFrame,
    horizon: str = HORIZON,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming variant: split the event stream into the two sides,
    watermark each, and apply the SAME join.

    Inner interval joins emit a pair as soon as both rows have
    arrived; the watermark exists to let Spark drop join state once
    no counterpart can still match (purchase side keeps
    ``horizon + watermark`` of state, click side ``watermark``)."""
    clicks = events_stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    purchases = events_stream.filter(
        F.col("event_type") == "purchase"
    ).withWatermark("ts", watermark)
    return attribution_pairs(clicks, purchases, horizon)
