"""Live Donchian channel feed: the streaming twin of the batch
``operators/analytics.py::donchian``, maintained with
``applyInPandasWithState``.

State per (exchange, symbol) is the trailing N-candle (start, high,
low) buffer — O(symbols × N), the same bounded-buffer contract as
the SMA/RSI feed (streaming/indicators.py), including its r6
hardening: candles are folded in event-time order within a
micro-batch, and a duplicate/revised candle REPLACES its buffer slot
(last-write-wins).  The breakout flags compare the incoming close
against the channel as of the PREVIOUS emitted candle, matching the
batch lag semantics; the first candle of a series publishes
``False`` flags (the batch coalesce contract).  Channel values are
raw min/max/half-sum arithmetic — no rounding contract needed, so an
in-order replay is value-identical to the batch operator (parity
pytest, exact equality)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DONCHIAN_SCHEMA = StructType(
    [
        StructField("exchange", StringType()),
        StructField("symbol", StringType()),
        StructField("start", TimestampType()),
        StructField("close", DoubleType()),
        StructField("upper", DoubleType()),
        StructField("lower", DoubleType()),
        StructField("mid", DoubleType()),
        StructField("width", DoubleType()),
        StructField("n_in_frame", LongType()),
        StructField("breakout_up", BooleanType()),
        StructField("breakout_down", BooleanType()),
    ]
)

# parallel csv arrays of the trailing buffer + the previous channel
_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", StringType()),
        StructField("highs", StringType()),
        StructField("lows", StringType()),
        StructField("prev_upper", StringType()),  # repr or ""
        StructField("prev_lower", StringType()),
    ]
)


def make_donchian_fn(n: int = 20):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exchange, symbol = key
        if state.exists:
            starts_csv, highs_csv, lows_csv, pu_r, pl_r = state.get
            buf = [
                (int(t), float(h), float(lo))
                for t, h, lo in zip(
                    starts_csv.split(","),
                    highs_csv.split(","),
                    lows_csv.split(","),
                )
            ] if starts_csv else []
            prev_upper = float(pu_r) if pu_r else None
            prev_lower = float(pl_r) if pl_r else None
        else:
            buf, prev_upper, prev_lower = [], None, None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("start", kind="mergesort")
        out = []
        starts_us = rows["start"].astype("datetime64[us]").astype("int64")
        for t, h, lo, c in zip(
            starts_us.to_list(),
            rows["high"].to_list(),
            rows["low"].to_list(),
            rows["close"].to_list(),
        ):
            buf = [e for e in buf if e[0] != t]  # last-write-wins
            buf.append((t, float(h), float(lo)))
            buf.sort()
            buf = buf[-n:]
            upper = max(e[1] for e in buf)
            lower = min(e[2] for e in buf)
            out.append(
                {
                    "exchange": exchange,
                    "symbol": symbol,
                    "start": pd.Timestamp(t, unit="us"),
                    "close": float(c),
                    "upper": upper,
                    "lower": lower,
                    "mid": (upper + lower) / 2.0,
                    "width": upper - lower,
                    "n_in_frame": len(buf),
                    "breakout_up": (
                        prev_upper is not None and float(c) > prev_upper
                    ),
                    "breakout_down": (
                        prev_lower is not None and float(c) < prev_lower
                    ),
                }
            )
            prev_upper, prev_lower = upper, lower
        state.update(
            (
                ",".join(str(e[0]) for e in buf),
                ",".join(repr(e[1]) for e in buf),
                ",".join(repr(e[2]) for e in buf),
                repr(prev_upper) if prev_upper is not None else "",
                repr(prev_lower) if prev_lower is not None else "",
            )
        )
        yield pd.DataFrame(out)

    return fn


def donchian_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 20,
    max_files_per_trigger: int = 1,
):
    """File-source candle stream → stateful live Donchian feed →
    append sink."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    feed = (
        stream.select("exchange", "symbol", "start", "high", "low", "close")
        .groupBy("exchange", "symbol")
        .applyInPandasWithState(
            make_donchian_fn(n),
            outputStructType=DONCHIAN_SCHEMA,
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
