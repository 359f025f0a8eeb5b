"""Backfill chunk planning (SURVEY.md §2.9 T12, §2.3 J3).

Twin of ``plan_chunks`` (load_history.py:355-408): per symbol, walk
backward from ``min(existing_start) - Δt`` (or a safe "now" horizon if
the symbol has no data) down to ``start_date`` in chunks of
``chunk_size`` candles.  The reference builds a Python list of
ChunkJob dataclasses consumed by asyncio workers; here the plan IS a
DataFrame — each row a (symbol, chunk_index, chunk_start, chunk_end)
task, and the fetch stage is a partitioned map over it.

The earliest-start probe is the reference's A1 query
(load_history.py:277-295); joining it to the target symbol list is a
broadcast hash join (the dictionary probe at load_history.py:364-379).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def earliest_starts(candles: DataFrame) -> DataFrame:
    """A1: earliest stored candle per symbol (load_history.py:285-295)."""
    return candles.groupBy("symbol").agg(F.min("start").alias("earliest_start"))


def backfill_plan(
    candles: DataFrame,
    start_date: datetime | str,
    chunk_minutes: int,
    safe_now: datetime | str,
) -> DataFrame:
    """Chunk plan: per symbol, [start_date, upper) split into
    chunk_minutes spans, where upper = earliest stored candle (symbols
    with no data backfill from safe_now, load_history.py:374-379).

    Chunks are generated forward and indexed backward-from-upper so the
    set of (start, end) spans matches the reference's backward walk.
    """
    symbols = candles.select("symbol").distinct()
    earliest = earliest_starts(candles)
    step = F.expr(f"INTERVAL {chunk_minutes} MINUTE")
    bounded = (
        symbols.join(broadcast(earliest), "symbol", "left")
        .select(
            "symbol",
            F.coalesce("earliest_start", F.lit(safe_now).cast("timestamp")).alias("upper"),
            F.lit(start_date).cast("timestamp").alias("lower"),
        )
        .filter(F.col("upper") > F.col("lower"))
    )
    chunks = bounded.select(
        "symbol",
        "upper",
        F.explode(
            F.sequence("lower", F.col("upper") - F.expr("INTERVAL 1 SECOND"), step)
        ).alias("chunk_start"),
    )
    return chunks.select(
        "symbol",
        "chunk_start",
        F.least(F.col("chunk_start") + step, F.col("upper")).alias("chunk_end"),
        F.row_number()
        .over(Window.partitionBy("symbol").orderBy(F.col("chunk_start").desc()))
        .cast("long")
        .alias("chunk_index"),
    )
