"""Scalar time/validation expressions (SURVEY.md §2.8).

All pure Column expressions — they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_start(col: Column | str, minutes: int) -> Column:
    """Epoch-aligned tumbling bucket start — ClickHouse
    ``toStartOfInterval(col, INTERVAL n MINUTE)`` (clickhouse_schema.py:87-91).

    Implemented as floor-epoch arithmetic, which is exactly what
    ``F.window(col, f"{n} minutes").start`` computes, but as a plain
    scalar expression (no struct), so it is usable in selects, joins
    and groupBys alike, and survives whole-stage codegen.  Equals
    DuckDB ``time_bucket(INTERVAL 'n minutes', col)`` for every level
    in the cascade (all divide 86400, so the 2000-01-03 origin of
    time_bucket coincides with the 1970-01-01 epoch alignment).
    """
    if isinstance(col, str):
        col = F.col(col)
    sec = minutes * 60
    return F.timestamp_seconds(F.floor(F.unix_timestamp(col) / sec) * sec)


def yyyymm(col: Column | str) -> Column:
    """Month partition bucket — ClickHouse ``toYYYYMM(start)``
    (clickhouse_schema.py:144)."""
    return F.date_format(col, "yyyyMM")


def is_finite(col: Column | str) -> Column:
    """ClickHouse ``isFinite`` (clickhouse_schema.py:139): not NaN and
    not ±Inf."""
    if isinstance(col, str):
        col = F.col(col)
    return (~F.isnan(col)) & (col != F.lit(float("inf"))) & (col != F.lit(float("-inf")))
