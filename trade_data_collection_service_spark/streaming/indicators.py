"""Realtime indicator stream: per-candle SMA + RSI maintained
incrementally with ``applyInPandasWithState`` — the streaming twin of
the batch frame-spec indicators (operators/analytics.py::sma / rsi),
turning the closed-candle stream into the live signal feed a trading
dashboard consumes.

State per (exchange, symbol) is the trailing K-candle buffer
(K = max(sma_n, rsi_n + 1)) — O(symbols × K), independent of stream
length.  Each arriving candle is inserted in event-time order within
its micro-batch, the buffer is trimmed, and the indicators are
computed over exactly the frame the batch operators would see, so an
in-order replay is value-identical to the batch output (parity
pytest).  Cross-batch late candles older than the buffer head emit
against the partial frame available — the documented approximation of
any bounded-state streaming indicator.

Determinism contract: RSI folds gains/losses as integer micro-units
(the decimal-sum twin of the batch path); SMA divides a sequential
float sum — equal to the batch value within one ulp, rounded to 6 dp
on both sides.  All 6-dp rounding goes through
``Decimal(repr(x)).quantize(HALF_UP)`` — the exact semantics of
Spark's ``F.round`` (HALF_UP over the shortest decimal repr) — so a
close diff landing on a representational 6-dp tie folds identically
to the batch decimal sum (Python's builtin ``round`` would banker's-
round the true binary value and could diverge by one micro-unit).

Duplicate/revised candles: inserting a candle whose start already
occupies a buffer slot REPLACES that slot (last-write-wins), so a
revision that slips past upstream transport dedup cannot double-fill
the frame and skew n_in_frame/n_moves against the batch operators.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

INDICATOR_SCHEMA = StructType(
    [
        StructField("exchange", StringType()),
        StructField("symbol", StringType()),
        StructField("start", TimestampType()),
        StructField("close", DoubleType()),
        StructField("sma", DoubleType()),
        StructField("n_in_frame", LongType()),
        StructField("rsi", DoubleType()),
        StructField("n_moves", LongType()),
    ]
)

# parallel arrays of the trailing buffer: starts (µs) + closes
_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", StringType()),  # csv of int64
        StructField("closes", StringType()),  # csv of repr(float)
    ]
)


_SIX_DP = Decimal("0.000001")


def _round6(x: float) -> float:
    """Twin of Spark's ``F.round(_, 6)``: HALF_UP over the shortest
    decimal repr of the double (``repr`` IS the shortest repr)."""
    return float(
        Decimal(repr(x)).quantize(_SIX_DP, rounding=ROUND_HALF_UP)
    )


def _micro6(x: float) -> int:
    """``F.round(_, 6)`` as integer micro-units (exact, no re-float)."""
    return int(
        Decimal(repr(x))
        .quantize(_SIX_DP, rounding=ROUND_HALF_UP)
        .scaleb(6)
    )


def _indicators(buf: list[tuple[int, float]], sma_n: int, rsi_n: int):
    """Compute (sma, n_in_frame, rsi, n_moves) over the buffer tail —
    the exact frames the batch window operators use."""
    closes = [c for _, c in buf]
    frame = closes[-sma_n:]
    sma = _round6(sum(frame) / len(frame))
    moves = closes[-(rsi_n + 1):]
    sg = sl = 0
    n_moves = 0
    for prev, cur in zip(moves, moves[1:]):
        micro = _micro6(cur - prev)
        if micro > 0:
            sg += micro
        else:
            sl -= micro
        n_moves += 1
    if n_moves == 0:
        rsi = None
    elif sg == 0 and sl == 0:
        rsi = 50.0
    elif sl == 0:
        rsi = 100.0
    else:
        rsi = 100.0 - 100.0 / (1.0 + sg / sl)
    return sma, len(frame), rsi, n_moves


def make_indicator_fn(sma_n: int, rsi_n: int):
    keep = max(sma_n, rsi_n + 1)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exchange, symbol = key
        if state.exists:
            starts_csv, closes_csv = state.get
            buf = [
                (int(s), float(c))
                for s, c in zip(
                    starts_csv.split(","), closes_csv.split(",")
                )
            ] if starts_csv else []
        else:
            buf = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("start", kind="mergesort")
        out = []
        starts_us = rows["start"].astype("datetime64[us]").astype("int64")
        for t, c in zip(starts_us.to_list(), rows["close"].to_list()):
            # Last-write-wins on an equal start: a revised/duplicate
            # candle replaces its slot instead of double-filling the
            # frame (buf is O(keep), so the scan is bounded).
            buf = [(bt, bc) for bt, bc in buf if bt != t]
            buf.append((t, float(c)))
            buf.sort()  # late-within-buffer candles slot in by time
            buf = buf[-keep:]
            sma, n_frame, rsi, n_moves = _indicators(buf, sma_n, rsi_n)
            out.append(
                {
                    "exchange": exchange,
                    "symbol": symbol,
                    "start": pd.Timestamp(t, unit="us"),
                    "close": float(c),
                    "sma": sma,
                    "n_in_frame": n_frame,
                    "rsi": rsi,
                    "n_moves": n_moves,
                }
            )
        state.update(
            (
                ",".join(str(t) for t, _ in buf),
                ",".join(repr(c) for _, c in buf),
            )
        )
        yield pd.DataFrame(out)

    return fn


def indicator_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    sma_n: int = 20,
    rsi_n: int = 14,
    max_files_per_trigger: int = 1,
):
    """File-source candle stream → stateful indicator feed → append
    sink.  One row out per candle in, carrying the live SMA/RSI."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    feed = (
        stream.select("exchange", "symbol", "start", "close")
        .groupBy("exchange", "symbol")
        .applyInPandasWithState(
            make_indicator_fn(sma_n, rsi_n),
            outputStructType=INDICATOR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        feed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
