"""Streaming indicator feed: an in-order replay must be
value-identical to the batch sma/rsi window operators over the same
candles (RSI exactly — integer micro-unit folds twin the decimal
sums; SMA to 1e-6 after both sides' 6-dp round)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.analytics import rsi, sma
from trade_data_collection_service_spark.streaming.indicators import (
    indicator_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_ind_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_indicators_match_batch(spark, dirs):
    candles = candles_from_events(spark, SF_DIR).select(
        "exchange", "symbol", "start", "close", "volume"
    )
    src = os.path.join(dirs, "src")
    # event-time-ordered micro-batches: three day slices in order
    days = sorted(
        r["d"]
        for r in candles.select(F.date_trunc("day", "start").alias("d"))
        .distinct()
        .collect()
    )
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    slices = [
        candles.filter(F.col("start") < cuts[0]),
        candles.filter(
            (F.col("start") >= cuts[0]) & (F.col("start") < cuts[1])
        ),
        candles.filter(F.col("start") >= cuts[1]),
    ]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "out")
    ckpt = os.path.join(dirs, "ckpt")
    q = indicator_stream(spark, src, out, ckpt, sma_n=5, rsi_n=3)
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        (r["exchange"], r["symbol"], r["start"]): r
        for r in spark.read.parquet(out).collect()
    }
    want_sma = {
        (r["exchange"], r["symbol"], r["start"]): r
        for r in sma(candles, 5).collect()
    }
    want_rsi = {
        (r["exchange"], r["symbol"], r["start"]): r
        for r in rsi(candles, 3).collect()
    }
    assert set(got) == set(want_sma)
    for k, g in got.items():
        assert g["n_in_frame"] == want_sma[k]["n_in_frame"]
        assert abs(g["sma"] - want_sma[k]["sma_5"]) < 1e-6
        assert g["n_moves"] == want_rsi[k]["n_moves"]
        b = want_rsi[k]["rsi_3"]
        if b is None:
            assert g["rsi"] is None
        else:
            assert abs(g["rsi"] - b) < 1e-9
