"""Distributed EMA/MACD prefix scan (operators/ema.py): the blocked
window-algebra scan must equal pandas ``ewm(span=n, adjust=True)``
(the independent sequential reference) and must be invariant to the
block size that shapes the distributed execution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trade_data_collection_service_spark.operators.ema import (
    _max_block,
    ema,
    ema_params,
    macd,
    with_ema,
)


@pytest.fixture(scope="module")
def walk(spark):
    rng = np.random.default_rng(11)
    rows = []
    for sym in ["A", "B", "C"]:
        px = 100 + np.cumsum(rng.normal(0, 1.5, 1501))
        for i, p in enumerate(px):
            rows.append(
                (
                    "E",
                    sym,
                    pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    float(p),
                )
            )
    pdf = pd.DataFrame(rows, columns=["exchange", "symbol", "start", "close"])
    return pdf, spark.createDataFrame(pdf)


def test_ema_matches_pandas_ewm(walk):
    pdf, df = walk
    out = (
        with_ema(df, ["exchange", "symbol"], "start", ["close"], [20],
                 ["e"], block=37)
        .select("symbol", "start", "e")
        .toPandas()
        .sort_values(["symbol", "start"])
    )
    for sym in ["A", "B", "C"]:
        want = (
            pdf[pdf.symbol == sym]
            .sort_values("start")["close"]
            .ewm(span=20, adjust=True)
            .mean()
            .to_numpy()
        )
        got = out[out.symbol == sym]["e"].to_numpy()
        assert np.max(np.abs(got - want) / np.maximum(1, np.abs(want))) < 1e-11


def test_ema_block_size_invariant(walk):
    # the block cut is an execution detail: tiny blocks (forcing many
    # entering-state compositions) and one huge block must agree
    pdf, df = walk
    outs = []
    for b in (13, 100_000):
        o = (
            with_ema(df, ["exchange", "symbol"], "start", ["close"], [9],
                     ["e"], block=b)
            .select("symbol", "start", "e")
            .toPandas()
            .sort_values(["symbol", "start"])["e"]
            .to_numpy()
        )
        outs.append(o)
    assert np.max(np.abs(outs[0] - outs[1])) < 1e-9


def test_ema_published_shape(walk):
    _, df = walk
    out = ema(df, 20)
    assert out.columns == ["exchange", "symbol", "start", "close", "ema_20"]
    rows = out.limit(3).collect()
    # first row of a series: adjusted EMA equals the first close
    first = out.orderBy("symbol", "start").first()
    assert abs(first["ema_20"] - round(first["close"], 4)) < 1e-9
    assert rows


def test_macd_matches_pandas(walk):
    pdf, df = walk
    got = macd(df).toPandas().sort_values(["symbol", "start"])
    for sym in ["A", "B"]:
        s = pdf[pdf.symbol == sym].sort_values("start")["close"]
        ef = s.ewm(span=12, adjust=True).mean()
        es = s.ewm(span=26, adjust=True).mean()
        line = ef - es
        sig = line.ewm(span=9, adjust=True).mean()
        g = got[got.symbol == sym]
        # pandas .round is banker's vs the published HALF_UP decimal:
        # equal except on exact 4-dp ties, so allow one 1e-4 step
        tol = 1.1e-4
        assert np.max(np.abs(g["macd"].to_numpy() - line.round(4).to_numpy())) < tol
        assert np.max(np.abs(g["macd_signal"].to_numpy() - sig.round(4).to_numpy())) < tol
        assert np.max(
            np.abs(g["macd_hist"].to_numpy() - (line - sig).round(4).to_numpy())
        ) < tol


def test_exp_budget_caps_block():
    # fast-decaying spans force shorter blocks so beta^-i can't overflow
    for n in (2, 5, 9, 20, 200):
        _, beta = ema_params(n)
        b = _max_block(n)
        assert beta ** (-(b - 1)) < 1e304
        assert b >= 2
