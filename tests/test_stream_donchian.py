"""Streaming Donchian feed: an in-order replay must be
value-identical (exact — no rounding in the operator) to the batch
``donchian``, including the prior-channel breakout lag semantics
across micro-batch boundaries."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.analytics import donchian
from trade_data_collection_service_spark.streaming.donchian import (
    donchian_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_donchian_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_donchian_matches_batch(spark, dirs):
    candles = candles_from_events(spark, SF_DIR)
    src = os.path.join(dirs, "src")
    days = sorted(
        r["d"]
        for r in candles.select(F.date_trunc("day", "start").alias("d"))
        .distinct()
        .collect()
    )
    cut = days[len(days) // 2]
    for s in (
        candles.filter(F.col("start") < cut),
        candles.filter(F.col("start") >= cut),
    ):
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "out")
    ckpt = os.path.join(dirs, "ckpt")
    q = donchian_stream(spark, src, out, ckpt, n=5)
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        (r["exchange"], r["symbol"], r["start"]): (
            r["upper"], r["lower"], r["mid"], r["width"],
            r["n_in_frame"], r["breakout_up"], r["breakout_down"],
        )
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["exchange"], r["symbol"], r["start"]): (
            r["donchian_upper_5"], r["donchian_lower_5"],
            r["donchian_mid_5"], r["donchian_width_5"],
            r["n_in_frame"], r["breakout_up"], r["breakout_down"],
        )
        for r in donchian(candles, 5).collect()
    }
    assert got == want and got
