"""Native Structured-Streaming candle derivation: raw trade events →
closed 1-minute OHLCV candles via watermark + tumbling window
aggregation in APPEND mode.

This is the second streaming shape for T1/T2 (SURVEY.md §2.9),
complementing the foreachBatch pipeline (streaming/pipeline.py):

- pipeline.py consumes *candle* rows and maintains the whole rollup
  cascade with repair-capable tables — the reference's operational
  model (mirrors its websocket collector + MV cascade,
  data_collector.py + clickhouse_schema.py:189-206);
- this module consumes *raw events* (the websocket-feed analog) and
  lets the ENGINE hold the open candle: append mode emits a window
  only once the event-time watermark passes its end, which is
  exactly the reference's "closed candles only" contract
  (data_collector.py:59-94 discards the open candle on each update).

The per-event projection and the OHLCV aggregation expressions are
imported from candles.py — batch and stream compute byte-identical
candles (pytest replays the events table through both and compares).

State is O(open windows) = O(symbols × lateness/1m), evicted by the
watermark; no custom state management needed — the canonical case
where Spark's built-in windowed aggregation IS the right operator
(applyInPandasWithState is reserved for semantics windows can't
express, e.g. sessions — streaming/stateful.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import (
    candle_aggs,
    candle_projection,
    finalize_candles,
)


def stream_candles_windowed(
    events_stream: DataFrame, watermark: str = "2 minutes"
) -> DataFrame:
    """events readStream → closed 1m candles (append mode).

    The tumbling ``window("ts", "1 minute")`` start equals the batch
    path's ``date_trunc("minute", ts)``, so grouping keys align; the
    watermark bounds both lateness and state."""
    base = candle_projection(events_stream).withWatermark("ts", watermark)
    agg = (
        base.groupBy(
            "exchange", "symbol", F.window("ts", "1 minute").alias("w")
        )
        .agg(*candle_aggs())
        .withColumn("start", F.col("w.start"))
        .drop("w")
    )
    return finalize_candles(agg)
