"""Gap-filled time-grid reads — the read-side twin of gap detection.

The watchdog resamples candles onto a dense minute grid to FIND holes
(data_quality_check.py:248-250); consumers of the data want the same
grid with the holes made explicit (ClickHouse idiom: ``ORDER BY …
WITH FILL``; pandas: ``resample().asfreq()``/``ffill()``):

- ``gap_filled``: one row per expected minute per key; missing
  minutes carry null OHLCV and ``is_gap = true``.
- ``gap_filled_ffill``: additionally carries the last observed close
  forward into the gaps (last-observation-carried-forward) — the
  standard way to chart/join a sparse series.

Also ``rollup_tf``: rollup by timeframe string ('5m', '4h', '1d'),
wiring the reference's timeframe grammar (load_history.py:238-260)
into the rollup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trade_data_collection_service_spark.operators.gaps import KEYS, expected_grid
from trade_data_collection_service_spark.operators.rollup import rollup_raw
from trade_data_collection_service_spark.schema import parse_timeframe

OHLCV = ["open", "high", "low", "close", "volume", "trades"]


def gap_filled(candles: DataFrame, step_minutes: int = 1) -> DataFrame:
    """Dense per-key minute grid LEFT-joined with observations."""
    grid = expected_grid(candles, step_minutes)
    obs = candles.select(*KEYS, "start", *OHLCV)
    return grid.join(obs, [*KEYS, "start"], "left").withColumn(
        "is_gap", F.col("close").isNull()
    )


def gap_filled_ffill(candles: DataFrame, step_minutes: int = 1) -> DataFrame:
    """Gap-filled grid with close carried forward into gaps."""
    filled = gap_filled(candles, step_minutes)
    w = (
        Window.partitionBy(*KEYS)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.withColumn(
        "close_ffill", F.last("close", ignorenulls=True).over(w)
    )


def rollup_tf(candles: DataFrame, timeframe: str) -> DataFrame:
    """Rollup by timeframe string — '5m', '4h', '1d' (reference
    grammar ^(\\d+)([smhdw])$)."""
    seconds = parse_timeframe(timeframe)
    if seconds % 60 != 0:
        raise ValueError(f"sub-minute rollups unsupported: {timeframe!r}")
    return rollup_raw(candles, seconds // 60)
