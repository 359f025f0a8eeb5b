"""Gap detection + islands (SURVEY.md §2.3 J1, §2.5 W4).

Twin of the watchdog's pandas dataflow:
- expected time grid: ``resample(freq).asfreq()`` (data_quality_check.py:248-250)
  → here ``sequence(min, max, interval)`` + ``explode`` per key;
- missing timestamps: null-scan of the resampled frame → left ANTI join;
- islands: collapse sorted missing timestamps into inclusive contiguous
  ranges with a step tolerance (data_quality_check.py:264-288)
  → lag + flag + running-sum island id + groupBy(min, max).

Scale notes: the grid is generated per (exchange, symbol) from that
key's own min/max — one small aggregation plus a generate, not a
cross-join against a global calendar.  The anti-join shuffles on
(exchange, symbol, start), the same key layout the table is stored in.
For a 100 TB table the grid side is tiny (keys × minutes), so AQE
will broadcast it when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["exchange", "symbol"]


def expected_grid(df: DataFrame, step_minutes: int = 1, ts_col: str = "start") -> DataFrame:
    """Per (exchange, symbol): every expected bucket timestamp between
    that key's min and max observed timestamp, inclusive."""
    step = F.expr(f"INTERVAL {step_minutes} MINUTE")
    bounds = df.groupBy(*KEYS).agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    )
    return bounds.select(
        *KEYS,
        F.explode(F.sequence("lo", "hi", step)).alias(ts_col),
    )


def missing_timestamps(
    df: DataFrame, step_minutes: int = 1, ts_col: str = "start"
) -> DataFrame:
    """Expected grid MINUS observed — the gap list (J1)."""
    observed = df.select(*KEYS, ts_col).distinct()
    return expected_grid(df, step_minutes, ts_col).join(
        observed, on=[*KEYS, ts_col], how="left_anti"
    )


def islands(
    missing: DataFrame, step_minutes: int = 1, tolerance_steps: int = 1, ts_col: str = "start"
) -> DataFrame:
    """Collapse missing timestamps into inclusive contiguous ranges.

    A new island starts when the distance to the previous missing
    timestamp exceeds ``tolerance_steps * step`` (the reference's step
    tolerance, data_quality_check.py:272-280).  Returns one row per
    island: gap_start, gap_end, n_missing.
    """
    step_sec = step_minutes * 60
    w = Window.partitionBy(*KEYS).orderBy(ts_col)
    lag_ts = F.lag(ts_col).over(w)
    new_island = (
        lag_ts.isNull()
        | (
            (F.unix_timestamp(ts_col) - F.unix_timestamp(lag_ts))
            > tolerance_steps * step_sec
        )
    ).cast("long")
    return (
        missing.withColumn("__new", new_island)
        .withColumn("__island", F.sum("__new").over(w))
        .groupBy(*KEYS, "__island")
        .agg(
            F.min(ts_col).alias("gap_start"),
            F.max(ts_col).alias("gap_end"),
            F.count(F.lit(1)).alias("n_missing"),
        )
        .drop("__island")
    )


def refill_ranges(
    islands_df: DataFrame, pad_minutes: int = 5
) -> DataFrame:
    """Fetch ranges for gap refill: island bounds padded ±pad minutes
    (data_quality_check.py:151-152)."""
    pad = F.expr(f"INTERVAL {pad_minutes} MINUTE")
    return islands_df.select(
        *KEYS,
        (F.col("gap_start") - pad).alias("fetch_start"),
        (F.col("gap_end") + pad).alias("fetch_end"),
    )
