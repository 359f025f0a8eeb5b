"""Streaming spread feed: closed-window emissions must equal the
batch minute_spread pivot key-for-key and value-for-value, including
a venue's candle landing in a LATER micro-batch than its partner
(within the watermark, the minute re-folds before emission)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.analytics import (
    minute_spread,
)
from trade_data_collection_service_spark.streaming.spread import (
    start_spread_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_spread_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_spread_matches_batch(spark, dirs):
    candles = candles_from_events(spark, SF_DIR).select(
        "exchange", "symbol", "start", "close"
    )
    src = os.path.join(dirs, "src")
    # venue split across micro-batches: EXCH_A rows arrive first,
    # EXCH_B rows for the same minutes arrive in the NEXT batch —
    # the engine must hold the window open and emit the completed
    # spread, not a one-sided null
    slices = [
        candles.filter(F.col("exchange") == "EXCH_A"),
        candles.filter(F.col("exchange") == "EXCH_B"),
    ]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "out")
    ckpt = os.path.join(dirs, "ckpt")
    q = start_spread_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert q.exception() is None

    got = {
        (r["symbol"], r["start"]): (r["close_a"], r["close_b"], r["spread"])
        for r in spark.read.parquet(out).collect()
    }
    # expected spread follows the published decimal contract:
    # HALF_UP over the shortest repr, normalized through 6-dp decimal
    from decimal import ROUND_HALF_UP, Decimal

    def _spread6(a: float, b: float) -> float:
        return float(
            Decimal(repr(a - b)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    want = {
        (r["symbol"], r["start"]): (
            r["close_a"],
            r["close_b"],
            _spread6(r["close_a"], r["close_b"]),
        )
        for r in minute_spread(candles).collect()
    }
    # append mode withholds windows the final watermark never passed;
    # availableNow over a finite replay emits everything except at
    # most the trailing watermark horizon
    assert got
    missing = set(want) - set(got)
    if missing:
        horizon = max(s for _, s in want)
        import datetime as dt

        assert all(
            s >= horizon - dt.timedelta(minutes=5) for _, s in missing
        )
    for k, v in got.items():
        assert want[k] == v
