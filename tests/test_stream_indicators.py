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


def test_round6_twins_spark_round(spark):
    """The micro-unit fold's 6-dp rounding must be bit-identical to
    Spark's F.round (HALF_UP over the shortest decimal repr), not
    Python's banker's round of the binary value — probed on exact
    representational 6-dp ties where the two differ."""
    from trade_data_collection_service_spark.streaming.indicators import (
        _micro6,
        _round6,
    )

    # 2.5e-06 and 0.0000035 are exactly representable-as-shortest-repr
    # ties: banker's round() gives 2e-06 / 4e-06; HALF_UP gives 3 / 4.
    probes = [
        2.5e-06,
        3.5e-06,
        -2.5e-06,
        1.0000005,
        0.1 + 0.2,
        123.4567894999,
        123.4567895,
    ]
    rows = spark.createDataFrame(
        [(x,) for x in probes], "x double"
    ).select(F.round("x", 6).alias("r"))
    want = [r["r"] for r in rows.collect()]
    for x, w in zip(probes, want):
        assert _round6(x) == w, (x, _round6(x), w)
        assert _micro6(x) == int(round(w * 1e6)), x
    # at least one probe must actually separate round() from HALF_UP
    assert any(_round6(x) != round(x, 6) for x in probes)


def test_duplicate_candle_replaces_buffer_slot():
    """A revised candle for an existing start must REPLACE its slot
    (last-write-wins), not double-fill the frame."""
    import pandas as pd

    from trade_data_collection_service_spark.streaming.indicators import (
        make_indicator_fn,
    )

    class _FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    fn = make_indicator_fn(sma_n=3, rsi_n=2)
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:01"]
    )
    pdf = pd.DataFrame(
        {
            "exchange": "E",
            "symbol": "S",
            "start": ts,
            "close": [10.0, 11.0, 12.0],  # last row revises 00:01
        }
    )
    st = _FakeState()
    out = pd.concat(list(fn(("E", "S"), iter([pdf]), st)))
    final = out.iloc[-1]
    # frame is {10, 12}: the revision displaced 11.0 entirely
    assert final["n_in_frame"] == 2
    assert abs(final["sma"] - 11.0) < 1e-9
    assert final["n_moves"] == 1
    # state holds one slot per start
    starts_csv, closes_csv = st.get
    assert len(starts_csv.split(",")) == 2
    assert closes_csv.split(",")[-1] == repr(12.0)
