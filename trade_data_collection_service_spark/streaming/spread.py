"""Live cross-exchange spread feed: the streaming twin of the batch
``exchange_spread`` per-minute pivot (operators/analytics.py::
minute_spread), as a NATIVE watermark + tumbling-window aggregation
in append mode — no custom state.

Each closed minute where a symbol is quoted on both venues emits one
(symbol, start, close_a, close_b, spread) row once the event-time
watermark passes the window end — the same "closed windows only"
contract as the windowed candle derivation
(streaming/candle_window.py).  A minute quoted on only one venue
emits nothing (matching the batch filter); a venue's candle arriving
within the watermark still folds into its minute before emission.

State is O(open windows) = O(symbols × lateness/1m), evicted by the
watermark — the canonical case where Spark's built-in windowed
aggregation IS the right operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minute_spread(
    candle_stream: DataFrame,
    watermark: str = "5 minutes",
    venue_a: str = "EXCH_A",
    venue_b: str = "EXCH_B",
) -> DataFrame:
    """candle readStream → closed per-minute venue spread (append).

    The tumbling ``window("start", "1 minute")`` start equals the
    candle's own minute-aligned start, so the streamed rows align
    key-for-key with the batch ``minute_spread``.  The venue pair is
    a parameter with the fixture-universe defaults (same contract as
    operators/analytics.py::minute_spread); the published spread is
    round(a-b, 6) normalized through DECIMAL(18,6) — the
    exchange_spread contract — so the compared value is an exact
    6-dp decimal, not a raw IEEE rounding."""
    base = candle_stream.select(
        "exchange", "symbol", "start", "close"
    ).withWatermark("start", watermark)
    agg = (
        base.groupBy(
            "symbol", F.window("start", "1 minute").alias("w")
        )
        .agg(
            F.min(
                F.when(F.col("exchange") == venue_a, F.col("close"))
            ).alias("close_a"),
            F.min(
                F.when(F.col("exchange") == venue_b, F.col("close"))
            ).alias("close_b"),
        )
        .withColumn("start", F.col("w.start"))
        .drop("w")
        .filter(F.col("close_a").isNotNull() & F.col("close_b").isNotNull())
    )
    return agg.select(
        "symbol",
        "start",
        "close_a",
        "close_b",
        F.round(F.col("close_a") - F.col("close_b"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("spread"),
    )


def start_spread_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 1,
    venue_a: str = "EXCH_A",
    venue_b: str = "EXCH_B",
):
    """File-source candle stream → closed spread rows → append sink."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream_minute_spread(stream, watermark, venue_a, venue_b)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
