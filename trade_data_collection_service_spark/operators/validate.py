"""Row validation — Spark twin of the reference's table CHECK
constraints (clickhouse_schema.py:139-142):

    isFinite(open/high/low/close/volume)
    low <= least(open, close), high >= greatest(open, close), low <= high
    close_unixtime > 0
    exchange / symbol / interval non-empty

Plain Parquet has no enforced CHECKs, so validation is an explicit
operator: a pure Column predicate (stays in whole-stage codegen) that
splits the stream into accepted rows and a quarantine DataFrame —
the reference *rejects* bad inserts; we additionally keep them
inspectable (SURVEY.md §2.2 P6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.timeutil import is_finite

_PRICE_COLS = ["open", "high", "low", "close", "volume"]


def validity_condition() -> Column:
    cond = F.lit(True)
    for c in _PRICE_COLS:
        cond = cond & is_finite(c)
    cond = (
        cond
        & (F.col("low") <= F.least("open", "close"))
        & (F.col("high") >= F.greatest("open", "close"))
        & (F.col("low") <= F.col("high"))
        & (F.col("close_unixtime") > 0)
        & (F.col("exchange") != "")
        & (F.col("symbol") != "")
        & (F.col("interval") != "")
    )
    return cond


def validate(df: DataFrame) -> DataFrame:
    """Rows passing every constraint (the insert-accepted stream)."""
    return df.filter(validity_condition())


def quarantine(df: DataFrame) -> DataFrame:
    """Rows violating at least one constraint (reference: insert error,
    data_collector.py:277-283 logs and drops after retries)."""
    return df.filter(~validity_condition())
