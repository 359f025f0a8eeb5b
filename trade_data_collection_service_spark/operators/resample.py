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


def volume_bars(candles: DataFrame, bar_volume: float = 500.0) -> DataFrame:
    """Event-driven resampling: OHLCV bars that each hold ~``bar_volume``
    of traded volume instead of a fixed time span (the "volume bars"
    of the market-microstructure literature — activity-clock bars
    sample more when the market moves).

    A candle belongs to the bar containing its cumulative-volume START
    offset — the same start-offset rule as sequence packing
    (ext/pipeline.py), applied per (exchange, symbol).  The running
    volume is summed in DECIMAL(28,6): a double window fold would be
    engine/order-dependent (gotcha: DuckDB evaluates frame sums with
    segment trees), decimal is exact in both.  One shuffle+sort per
    key (the partitioned window), then a plain groupBy on the bar id;
    open/close are min/max-of-struct picks on the unique start
    ordinal — no second window, no UDF.
    """
    vol_dec = F.round("volume", 6).cast("decimal(28,6)")
    w = (
        Window.partitionBy(*KEYS)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_prev = F.coalesce(
        F.sum(vol_dec).over(w), F.lit(0).cast("decimal(28,6)")
    ).cast("double")
    bar = candles.withColumn(
        "bar_id", F.floor(cum_prev / F.lit(bar_volume)).cast("long")
    )
    first_pick = F.min(F.struct(F.col("start").alias("s"), F.col("open").alias("v")))
    last_pick = F.max(F.struct(F.col("start").alias("s"), F.col("close").alias("v")))
    return (
        bar.groupBy(*KEYS, "bar_id")
        .agg(
            F.min("start").alias("bar_start"),
            first_pick.alias("_f"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            last_pick.alias("_l"),
            F.sum(vol_dec).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .select(
            *KEYS,
            "bar_id",
            "bar_start",
            F.round(F.col("_f.v"), 6).alias("open"),
            F.round("high", 6).alias("high"),
            F.round("low", 6).alias("low"),
            F.round(F.col("_l.v"), 6).alias("close"),
            "volume",
            "n_candles",
        )
        .orderBy(*KEYS, "bar_id")
    )


def gap_filled_interp(candles: DataFrame, step_minutes: int = 1) -> DataFrame:
    """Gap-filled grid with close LINEARLY interpolated across gaps —
    the charting/feature-engineering companion to ``gap_filled_ffill``
    (pandas ``resample().interpolate()``): each missing minute gets
    prev + (next − prev) · elapsed/span between its bracketing
    observations; leading/trailing gaps (no bracket on one side)
    degrade to carry-forward/carry-backward of the side that exists.

    Two frame-spec windows over ONE (exchange, symbol) sort — last
    non-null before, first non-null after (both with the matching
    observation time via a conditional column, no struct juggling) —
    so the plan cost is identical to ffill.  The interpolation
    quotient runs in doubles over bit-identical operands (observed
    closes + integer epoch-second offsets), so no rounding contract
    is needed; observed rows pass their close through untouched."""
    filled = gap_filled(candles, step_minutes)
    known_close = F.when(~F.col("is_gap"), F.col("close"))
    known_sec = F.when(~F.col("is_gap"), F.unix_timestamp("start"))
    wp = (
        Window.partitionBy(*KEYS)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*KEYS)
        .orderBy("start")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_c = F.last(known_close, ignorenulls=True).over(wp)
    prev_t = F.last(known_sec, ignorenulls=True).over(wp)
    next_c = F.first(known_close, ignorenulls=True).over(wn)
    next_t = F.first(known_sec, ignorenulls=True).over(wn)
    frac = (F.unix_timestamp("start") - prev_t).cast("double") / (
        next_t - prev_t
    ).cast("double")
    interp = (
        F.when(~F.col("is_gap"), F.col("close"))
        .when(prev_c.isNull(), next_c)
        .when(next_c.isNull(), prev_c)
        .otherwise(prev_c + (next_c - prev_c) * frac)
    )
    return filled.select(
        *KEYS, "start", "close", "is_gap", interp.alias("close_interp")
    )
