"""Live EMA feed: the streaming twin of the batch distributed EMA
scan (operators/ema.py), maintained incrementally with
``applyInPandasWithState``.

Where the batch operator re-expresses the recurrence as window
algebra to scan history in parallel, the streaming side IS the
recurrence: state per (exchange, symbol) is just ``(t, num)`` — the
row count and the zero-seeded numerator — because the adjusted-EMA
denominator has the closed form ``(1 - beta^t) / alpha``.  O(1)
state per key, one output row per candle; on an in-order replay the
published 4-dp values (HALF_UP through the decimal contract) equal
the batch ``ema()`` except where the batch blocked scan's ~1e-12
arithmetic drift lands exactly on a 4-dp rounding tie — at most a
single 1e-4 step, and none-to-few rows in practice (the parity
pytest bounds it).

Ordering contract: rows are folded in event-time order within each
micro-batch; a cross-batch late or duplicate candle folds in arrival
order (the recurrence cannot be rewound in O(1) state) — sit the
feed behind transport_dedup / the closed-candle stream, same caveat
as the indicator feed (streaming/indicators.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from trade_data_collection_service_spark.operators.ema import ema_params

EMA_SCHEMA = StructType(
    [
        StructField("exchange", StringType()),
        StructField("symbol", StringType()),
        StructField("start", TimestampType()),
        StructField("close", DoubleType()),
        StructField("ema", DoubleType()),
        StructField("t", LongType()),
    ]
)

# (t, num) — num carried as repr(float) so state round-trips exactly
_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("num", StringType()),
    ]
)

_FOUR_DP = Decimal("0.0001")


def _pub4_py(x: float) -> float:
    """Python twin of operators/ema.py::_pub4 (F.round HALF_UP over
    the shortest repr, normalized through 4-dp decimal)."""
    return float(Decimal(repr(x)).quantize(_FOUR_DP, rounding=ROUND_HALF_UP))


def make_ema_fn(n: int):
    alpha, beta = ema_params(n)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exchange, symbol = key
        if state.exists:
            t, num_repr = state.get
            num = float(num_repr)
        else:
            t, num = 0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("start", kind="mergesort")
        out = []
        for start, close in zip(rows["start"], rows["close"]):
            t += 1
            num = float(close) + beta * num
            den = (1.0 - beta**t) / alpha
            out.append(
                {
                    "exchange": exchange,
                    "symbol": symbol,
                    "start": start,
                    "close": float(close),
                    "ema": _pub4_py(num / den),
                    "t": t,
                }
            )
        state.update((t, repr(num)))
        yield pd.DataFrame(out)

    return fn


def ema_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 20,
    max_files_per_trigger: int = 1,
):
    """File-source candle stream → stateful live EMA feed → append
    sink.  One row per candle carrying the running adjusted EMA."""
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
            make_ema_fn(n),
            outputStructType=EMA_SCHEMA,
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


MACD_SCHEMA = StructType(
    [
        StructField("exchange", StringType()),
        StructField("symbol", StringType()),
        StructField("start", TimestampType()),
        StructField("close", DoubleType()),
        StructField("macd", DoubleType()),
        StructField("macd_signal", DoubleType()),
        StructField("macd_hist", DoubleType()),
        StructField("t", LongType()),
    ]
)

# (t, num_fast, num_slow, signal_num) — floats as repr for exactness
_MACD_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("nf", StringType()),
        StructField("ns", StringType()),
        StructField("sn", StringType()),
    ]
)


def make_macd_fn(fast: int = 12, slow: int = 26, signal: int = 9):
    """Live MACD: three zero-seeded linear recurrences per key —
    fast/slow numerators over close and the signal numerator over the
    macd line — each denominator closed-form, so state stays O(1).
    Published 4-dp values match the batch ``operators/ema.py::macd``
    on in-order replay up to exact 4-dp rounding ties of the blocked
    scan's ~1e-12 drift (parity pytest bounds the count)."""
    af, bf = ema_params(fast)
    as_, bs = ema_params(slow)
    ag, bg = ema_params(signal)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        exchange, symbol = key
        if state.exists:
            t, nf_r, ns_r, sn_r = state.get
            nf, ns, sn = float(nf_r), float(ns_r), float(sn_r)
        else:
            t, nf, ns, sn = 0, 0.0, 0.0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("start", kind="mergesort")
        out = []
        for start, close in zip(rows["start"], rows["close"]):
            t += 1
            x = float(close)
            nf = x + bf * nf
            ns = x + bs * ns
            den_f = (1.0 - bf**t) / af
            den_s = (1.0 - bs**t) / as_
            macd = nf / den_f - ns / den_s
            sn = macd + bg * sn
            den_g = (1.0 - bg**t) / ag
            sig = sn / den_g
            out.append(
                {
                    "exchange": exchange,
                    "symbol": symbol,
                    "start": start,
                    "close": x,
                    "macd": _pub4_py(macd),
                    "macd_signal": _pub4_py(sig),
                    "macd_hist": _pub4_py(macd - sig),
                    "t": t,
                }
            )
        state.update((t, repr(nf), repr(ns), repr(sn)))
        yield pd.DataFrame(out)

    return fn


def macd_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    max_files_per_trigger: int = 1,
):
    """File-source candle stream → stateful live MACD feed → append."""
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
            make_macd_fn(fast, slow, signal),
            outputStructType=MACD_SCHEMA,
            stateStructType=_MACD_STATE_SCHEMA,
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
