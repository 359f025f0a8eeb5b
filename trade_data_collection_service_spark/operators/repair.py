"""Rollup window repair + verification (SURVEY.md §2.9 T7, §3.3).

Twin of ``backfill_rollup_range`` (data_quality_check.py:391-485):
the reference deletes the affected window from the rollup table
(`ALTER TABLE … DELETE`), re-aggregates it from the level below
(`INSERT INTO … SELECT`, :338-390), verifies with ``uniqExact``
(:458-469), and forces merges (``OPTIMIZE FINAL``, :471-481).

Parquet has no mutations, so the delete+insert becomes a key-range
overwrite: rows outside the window are kept, the window is
recomputed from the (deduped) source level, and the table is
rewritten.  Repair windows should be month-partition-aligned at
scale so the rewrite touches only the affected partitions
(SURVEY.md §7 risk item); correctness does not depend on alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trade_data_collection_service_spark.operators.dedup import dedup_latest
from trade_data_collection_service_spark.operators.rollup import rollup_raw


def repair_window(
    rollup_df: DataFrame,
    raw_df: DataFrame,
    minutes: int,
    exchange: str,
    symbol: str,
    window_start,
    window_end,
) -> DataFrame:
    """Recompute [window_start, window_end) of one (exchange, symbol)
    in an N-minute rollup from raw candles; return the repaired table.

    delete-range + insert-select as one functional rewrite."""
    ws = F.lit(window_start).cast("timestamp")
    we = F.lit(window_end).cast("timestamp")
    in_window = (
        (F.col("exchange") == exchange)
        & (F.col("symbol") == symbol)
        & (F.col("candle_start") >= ws)
        & (F.col("candle_start") < we)
    )
    keep = rollup_df.filter(~in_window)
    source = dedup_latest(raw_df).filter(
        (F.col("exchange") == exchange)
        & (F.col("symbol") == symbol)
        & (F.col("start") >= ws)
        & (F.col("start") < we)
    )
    recomputed = rollup_raw(source, minutes)
    return keep.unionByName(recomputed.select(*rollup_df.columns))


def verify_window(
    rollup_df: DataFrame,
    raw_df: DataFrame,
    minutes: int,
    exchange: str,
    symbol: str,
    window_start,
    window_end,
) -> DataFrame:
    """A3-style verification (data_quality_check.py:458-469): the
    count of distinct rollup buckets in the window must equal the
    count of distinct source buckets — one row with both counts and
    an ``ok`` flag."""
    from trade_data_collection_service_spark.functions.timeutil import bucket_start

    ws = F.lit(window_start).cast("timestamp")
    we = F.lit(window_end).cast("timestamp")
    got = rollup_df.filter(
        (F.col("exchange") == exchange)
        & (F.col("symbol") == symbol)
        & (F.col("candle_start") >= ws)
        & (F.col("candle_start") < we)
    ).agg(F.countDistinct("candle_start").alias("n_rollup"))
    expected = (
        dedup_latest(raw_df)
        .filter(
            (F.col("exchange") == exchange)
            & (F.col("symbol") == symbol)
            & (F.col("start") >= ws)
            & (F.col("start") < we)
        )
        .agg(
            F.countDistinct(bucket_start("start", minutes)).alias("n_expected")
        )
    )
    return got.crossJoin(expected).select(
        "n_rollup",
        "n_expected",
        (F.col("n_rollup") == F.col("n_expected")).alias("ok"),
    )
