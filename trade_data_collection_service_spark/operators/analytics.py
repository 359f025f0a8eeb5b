"""Financial analytics over candles — frame-spec window functions.

The reference exposes no moving-window analytics (SURVEY.md §2.5:
"No ranking, no frame-spec analytics"), but its users consume OHLCV
candles precisely to compute them; the engine therefore exposes the
two canonical ones as first-class operators:

- ``sma``: N-bucket simple moving average of close per (exchange,
  symbol), a ``rowsBetween`` frame over the ordered candle stream;
- ``vwap_daily``: volume-weighted average price per (exchange,
  symbol, day) — decimal-exact sums (docs/ARCHITECTURE.md float
  contract) so the DuckDB oracle matches bit-for-bit.

Both shuffle once on (exchange, symbol) — the table's native layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sma(candles: DataFrame, n: int = 20) -> DataFrame:
    """N-candle simple moving average of close (incomplete head frames
    average what exists, like every charting tool)."""
    w = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    return candles.select(
        "exchange",
        "symbol",
        "start",
        "close",
        F.round(F.avg("close").over(w), 6).alias(f"sma_{n}"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


def vwap_daily(candles: DataFrame) -> DataFrame:
    """Daily VWAP: sum(close × volume) / sum(volume) per (exchange,
    symbol, day).  Products are per-row rounded then decimal-summed
    for cross-engine determinism."""
    pv = F.round(F.col("close") * F.col("volume"), 6).cast("decimal(28,6)")
    v = F.round("volume", 6).cast("decimal(28,6)")
    return (
        candles.groupBy(
            "exchange", "symbol", F.date_trunc("day", "start").alias("day")
        )
        .agg(
            F.sum(pv).cast("double").alias("sum_pv"),
            F.sum(v).cast("double").alias("sum_volume"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .withColumn(
            "vwap", F.round(F.col("sum_pv") / F.col("sum_volume"), 6)
        )
        .orderBy("exchange", "symbol", "day")
    )
