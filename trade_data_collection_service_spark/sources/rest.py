"""Historical-candle fetch stage (SURVEY.md §2.1 S2/S3, §3.2).

The reference fetches backfill chunks over REST with a worker pool,
rate limiter, and retry ladder (load_history.py:67-93, 585-662,
707-763).  In Spark the chunk *plan* is a DataFrame (operators/
backfill.py) and the fetch stage is a partitioned ``mapInPandas``
over it: each task owns a plan partition, calls the exchange client,
and emits candle rows — Spark's task scheduling and retries replace
the asyncio pool and the manual retry loops, and the idempotent
dedup key makes task replays safe (the reference leans on the same
property, data_quality_check.py:338-343).

No exchange client exists in this container, so the transport is
injectable: ``fetch_chunks`` takes a ``fetcher(symbol, start, end)``
returning a pandas DataFrame of candle rows.  ``deterministic_fetcher``
is the test stand-in.  Rate limiting maps to partition count (each
task is one in-flight client) plus whatever throttling the client
itself does — the T10 knobs.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator
from datetime import timedelta

import pandas as pd

from pyspark.sql import DataFrame

from trade_data_collection_service_spark.schema import CANDLE_SCHEMA

Fetcher = Callable[[str, pd.Timestamp, pd.Timestamp], pd.DataFrame]


def deterministic_fetcher(exchange: str = "EXCH_A") -> Fetcher:
    """Stand-in exchange client: emits one synthetic 1m candle per
    minute of the requested range, priced by a hash of (symbol,
    minute) — deterministic, so tests can assert exact results.
    Swap for a real REST client with the same signature."""

    def fetch(symbol: str, start: pd.Timestamp, end: pd.Timestamp) -> pd.DataFrame:
        minutes = pd.date_range(start, end, freq="1min", inclusive="left")
        if len(minutes) == 0:
            return pd.DataFrame()
        base = [
            (zlib.crc32(f"{symbol}|{int(m.timestamp())}".encode()) % 10_000) / 100.0
            + 1.0
            for m in minutes
        ]
        return pd.DataFrame(
            {
                "exchange": exchange,
                "symbol": symbol,
                "interval": "1m",
                "start": minutes,
                "stop": minutes + timedelta(minutes=1),
                "close_unixtime": [
                    int(m.timestamp()) + 60 for m in minutes
                ],
                "trades": 1,
                "open": base,
                "high": [b * 1.01 for b in base],
                "low": [b * 0.99 for b in base],
                "close": base,
                "volume": base,
                "timestamp": minutes + timedelta(seconds=59),
                "receipt_timestamp": minutes + timedelta(seconds=60),
            }
        )

    return fetch


def fetch_chunks(
    plan: DataFrame,
    fetcher: Fetcher,
    max_parallel: int | None = None,
) -> DataFrame:
    """Execute a chunk plan: one fetcher call per (symbol, chunk) row,
    distributed across tasks.  ``max_parallel`` bounds in-flight
    clients (the reference's HISTORY_MAX_REQUESTS_IN_FLIGHT ≤ 4,
    load_history.py:422-424) by bounding plan partitions."""
    if max_parallel:
        plan = plan.repartition(max_parallel)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                out = fetcher(row.symbol, row.chunk_start, row.chunk_end)
                if len(out):
                    yield out

    return plan.select("symbol", "chunk_start", "chunk_end").mapInPandas(
        run, schema=CANDLE_SCHEMA
    )
