"""Streaming sessionization via Spark's native ``session_window``
aggregation — the built-in merging-session-windows operator run under
an event-time watermark in append mode.

This is the streaming twin of
:func:`trade_data_collection_service_spark.ext.pipeline.sessionize_native`
(identical grouping expression, identical aggregates), and the
built-in counterpart of the ``applyInPandasWithState`` sessionizer in
:mod:`trade_data_collection_service_spark.streaming.stateful` — use
this one when the per-session logic is expressible as aggregates (the
engine default), and the stateful form when it is not (custom
eviction, per-event side effects).

Reference behavior mapped: the reference emits only CLOSED windows
(data_collector.py:422 ``candle_closed_only=True``); here a session
emits exactly once, when the watermark passes its end — in-progress
sessions stay in state, exactly-once via the checkpoint.

Scale: state is one merged window per open (user, session) — bounded
by active users x watermark horizon; partial aggregation merges
windows map-side before the shuffle, and closed state is evicted by
the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_native_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode closed-session stream: (user_id, session_start,
    session_end, n_events, total_value) — byte-matching the batch
    ``sessionize_native`` output for every session the watermark has
    closed (parity pytest: tests/test_native_session_stream.py)."""
    ts = F.col("ts")
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        ts = ts.cast("timestamp")
    return (
        events.withColumn("ts_c", ts)
        .withWatermark("ts_c", watermark)
        .groupBy(
            "user_id", F.session_window("ts_c", f"{gap_minutes} minutes")
        )
        .agg(
            F.min("ts_c").alias("session_start"),
            F.max("ts_c").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )
