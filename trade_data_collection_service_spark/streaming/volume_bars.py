"""Stateful streaming volume bars: the activity-clock resampler
(operators/resample.py::volume_bars) expressed incrementally via
``applyInPandasWithState``.

Tumbling TIME windows stream with Spark's built-in windowed
aggregation (streaming/candle_window.py) because the window of a row
is a pure function of its timestamp.  A VOLUME bar's identity depends
on the running volume of everything before it — inherently stateful,
the textbook case for a custom state operator (the same reason
sessions need one, streaming/stateful.py).

Per (exchange, symbol) the state holds ONE open bar plus the running
cumulative volume, in integer micro-volume units — the streaming twin
of the batch operator's DECIMAL(28,6) sums, so closed bars are
bit-identical to batch output (pytest replays and compares).  A bar
closes when the next candle's cumulative start offset crosses the
budget (emit), or when the event-time timeout fires after
``flush_minutes`` of event-time inactivity (the operational
force-close for idle symbols; the batch twin's trailing partial bar).

Exactness contract mirrors sessionize_stream: identical to batch when
candles arrive in event-time order per key (rows are sorted within
each micro-batch); state is O(keys), never O(history).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

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

BAR_SCHEMA = StructType(
    [
        StructField("exchange", StringType()),
        StructField("symbol", StringType()),
        StructField("bar_id", LongType()),
        StructField("bar_start", TimestampType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("n_candles", LongType()),
    ]
)

# (bar_id, bar_start_us, open, high, low, close, vol_micro, n, cum_micro, last_us)
_STATE_SCHEMA = StructType(
    [
        StructField("bar_id", LongType()),
        StructField("bar_start_us", LongType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("vol_micro", LongType()),
        StructField("n", LongType()),
        StructField("cum_micro", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _emit(key: tuple, bar) -> dict[str, Any]:
    exchange, symbol = key
    bar_id, start_us, o, h, lo, c, vol_micro, n = bar
    return {
        "exchange": exchange,
        "symbol": symbol,
        "bar_id": bar_id,
        "bar_start": pd.Timestamp(start_us, unit="us"),
        "open": o,
        "high": h,
        "low": lo,
        "close": c,
        "volume": round(vol_micro / 1_000_000.0, 6),
        "n_candles": n,
    }


def make_bar_fn(bar_volume: float, flush_minutes: int):
    bar_micro = int(round(bar_volume * 1_000_000))
    flush_us = flush_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[dict[str, Any]] = []
        if state.hasTimedOut:
            if state.exists:
                (bar_id, s_us, o, h, lo, c, vm, n, _cum, _last) = state.get
                if n > 0:
                    closed.append(
                        _emit(key, (bar_id, s_us, o, h, lo, c, vm, n))
                    )
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("start", kind="mergesort")
            ts_us = (
                rows["start"].astype("datetime64[us]").astype("int64").to_list()
            )
            vol_micro = (
                (rows["volume"].round(6) * 1_000_000).round().astype("int64")
            ).to_list()
            if state.exists:
                (bar_id, s_us, o, h, lo, c, vm, n, cum, last) = state.get
            else:
                bar_id, s_us, o, h, lo, c, vm, n, cum, last = (
                    -1, 0, 0.0, 0.0, 0.0, 0.0, 0, 0, 0, 0,
                )
            for i, (t, v) in enumerate(zip(ts_us, vol_micro)):
                my_bar = cum // bar_micro  # start-offset rule, exact ints
                if my_bar != bar_id:
                    if n > 0:
                        closed.append(
                            _emit(key, (bar_id, s_us, o, h, lo, c, vm, n))
                        )
                    bar_id, s_us = my_bar, t
                    o = float(rows["open"].iloc[i])
                    h, lo = float("-inf"), float("inf")
                    vm, n = 0, 0
                h = max(h, float(rows["high"].iloc[i]))
                lo = min(lo, float(rows["low"].iloc[i]))
                c = float(rows["close"].iloc[i])
                vm += v
                n += 1
                cum += v
                last = max(last, t)
            state.update((bar_id, s_us, o, h, lo, c, vm, n, cum, last))
            state.setTimeoutTimestamp(
                max(last // 1000 + flush_us // 1000, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(closed)

    return fn


def stream_volume_bars(
    candle_stream: DataFrame,
    bar_volume: float = 500.0,
    flush_minutes: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """candle readStream → closed volume bars (append mode).  One row
    per CLOSED bar; each key's open tail bar stays in state until the
    budget fills or the flush timeout passes."""
    return (
        candle_stream.withWatermark("start", watermark)
        .groupBy("exchange", "symbol")
        .applyInPandasWithState(
            make_bar_fn(bar_volume, flush_minutes),
            outputStructType=BAR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
