from datetime import datetime

from trade_data_collection_service_spark.operators.analytics import sma, vwap_daily


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, ["exchange", "symbol", "start", "close", "volume"]
    )


def test_sma_hand_computed(spark):
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), float(c), 1.0)
        for m, c in enumerate([10, 20, 30, 40])
    ]
    out = {r["start"].minute: r for r in sma(_mk(spark, rows), 3).collect()}
    assert out[0]["sma_3"] == 10.0 and out[0]["n_in_frame"] == 1
    assert out[1]["sma_3"] == 15.0
    assert out[2]["sma_3"] == 20.0
    assert out[3]["sma_3"] == 30.0  # (20+30+40)/3
    assert out[3]["n_in_frame"] == 3


def test_vwap_hand_computed(spark):
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, 0), 10.0, 2.0),
        ("E", "S", datetime(2024, 1, 1, 12, 0), 20.0, 6.0),
        ("E", "S", datetime(2024, 1, 2, 0, 0), 30.0, 1.0),
    ]
    out = {r["day"].day: r for r in vwap_daily(_mk(spark, rows)).collect()}
    # day 1: (10*2 + 20*6) / (2+6) = 140/8 = 17.5
    assert out[1]["vwap"] == 17.5 and out[1]["n_candles"] == 2
    assert out[2]["vwap"] == 30.0


def test_bollinger_band_ordering(spark, sf_dir):
    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.operators.analytics import bollinger

    rows = bollinger(candles_from_events(spark, sf_dir), 20).collect()
    assert rows
    for r in rows:
        assert r["bb_lower"] <= r["bb_mid"] <= r["bb_upper"]
        assert 1 <= r["n_in_frame"] <= 20


def test_atr_positive_and_bounded_frame(spark, sf_dir):
    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.operators.analytics import atr

    rows = atr(candles_from_events(spark, sf_dir), 14).collect()
    assert rows
    for r in rows:
        assert r["true_range"] >= 0 and r["atr_14"] >= 0
        assert 1 <= r["n_in_frame"] <= 14


def test_daily_volatility_nonnegative(spark, sf_dir):
    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.operators.analytics import (
        daily_volatility,
    )

    rows = daily_volatility(candles_from_events(spark, sf_dir)).collect()
    assert rows and all(r["realized_vol"] >= 0 for r in rows)


def test_twap_weights_by_holding_time(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        twap_daily,
    )

    # close=10 held 00:00→12:00 (43200 s), close=30 held 12:00→24:00:
    # TWAP = (10*43200 + 30*43200) / 86400 = 20; a gap-free mean would
    # weight a third candle equally — plant an extra 23:59 candle so
    # mean(closes) != TWAP and the weighting is actually exercised.
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, 0), 10.0, 1.0),
        ("E", "S", datetime(2024, 1, 1, 12, 0), 30.0, 1.0),
    ]
    out = twap_daily(_mk(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["total_sec"] == 86400 and r["n_candles"] == 2
    assert abs(r["twap"] - 20.0) < 1e-9

    rows.append(("E", "S", datetime(2024, 1, 1, 23, 59), 90.0, 1.0))
    r2 = twap_daily(_mk(spark, rows)).collect()[0]
    # 10*43200 + 30*43140 + 90*60 over 86400 = 19.9708…; mean is 43.3
    assert abs(r2["twap"] - (10 * 43200 + 30 * 43140 + 90 * 60) / 86400) < 1e-9


def test_candle_patterns_hand_built(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        candle_patterns,
    )

    rows = [
        # exchange, symbol, start, open, high, low, close, volume
        ("E", "S", datetime(2024, 1, 1, 0, 0), 10.0, 11.0, 9.0, 10.05, 1.0),
        # doji: body .05 <= .1*range(2)
        ("E", "S", datetime(2024, 1, 1, 0, 1), 10.0, 10.1, 8.0, 9.9, 1.0),
        # hammer: lower wick 1.9 >= 2*.1, upper wick .1 <= .1
        ("E", "S", datetime(2024, 1, 1, 0, 2), 9.8, 10.6, 9.7, 10.5, 1.0),
        # bullish engulfing of the prior red candle (10.0 -> 9.9)
    ]
    df = spark.createDataFrame(
        rows,
        ["exchange", "symbol", "start", "open", "high", "low", "close", "volume"],
    )
    got = {r["start"].minute: r for r in candle_patterns(df).collect()}
    assert got[0]["doji"] and not got[0]["bullish_engulfing"]
    assert got[1]["hammer"]
    assert got[2]["bullish_engulfing"] and not got[2]["bearish_engulfing"]


def test_rsi_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import rsi

    # closes 10, 12, 11, 11: moves = +2, -1, 0
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), float(c), 1.0)
        for m, c in enumerate([10, 12, 11, 11])
    ]
    out = {r["start"].minute: r for r in rsi(_mk(spark, rows), 14).collect()}
    assert out[0]["rsi_14"] is None and out[0]["n_moves"] == 0
    assert out[1]["rsi_14"] == 100.0  # one gain, no loss
    # gains 2, losses 1 -> rs=2 -> rsi = 100 - 100/3
    assert abs(out[2]["rsi_14"] - (100.0 - 100.0 / 3.0)) < 1e-9
    assert out[3]["rsi_14"] == out[2]["rsi_14"]  # flat move keeps sums
    assert out[3]["n_moves"] == 3


def test_rsi_flat_series_is_50(spark):
    from trade_data_collection_service_spark.operators.analytics import rsi

    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), 5.0, 1.0) for m in range(4)
    ]
    out = rsi(_mk(spark, rows), 14).collect()
    assert all(r["rsi_14"] == 50.0 for r in out if r["n_moves"] > 0)


def test_stochastic_bounds_and_degenerate(spark, sf_dir):
    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.operators.analytics import stochastic

    rows = stochastic(candles_from_events(spark, sf_dir), 14, 3).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r["pct_k"] <= 100.0 + 1e-6
        assert -1e-6 <= r["pct_d"] <= 100.0 + 1e-6


def test_obv_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import obv

    # closes 10, 12, 12, 9 with volumes 1, 2, 3, 4:
    # steps 0, +2, 0, -4 -> obv 0, 2, 2, -2
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), float(c), float(v))
        for m, (c, v) in enumerate([(10, 1), (12, 2), (12, 3), (9, 4)])
    ]
    out = {r["start"].minute: r["obv"] for r in obv(_mk(spark, rows)).collect()}
    assert out == {0: 0.0, 1: 2.0, 2: 2.0, 3: -2.0}


def test_returns_corr_perfectly_correlated_pair(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        returns_corr,
    )

    # A and B move in lockstep (corr=1); C moves inversely to A
    # with proportional (not equal) returns -> corr=-1.
    rows = []
    closes = [10.0, 11.0, 9.0, 12.0, 8.0]
    for m, c in enumerate(closes):
        t = datetime(2024, 1, 1, 0, m)
        rows.append(("E", "A", t, c, 1.0))
        rows.append(("E", "B", t, 2 * c, 1.0))
        rows.append(("E", "C", t, 100.0 / c, 1.0))
    out = {
        (r["symbol_a"], r["symbol_b"]): r
        for r in returns_corr(_mk(spark, rows)).collect()
    }
    assert abs(out[("A", "B")]["ret_corr"] - 1.0) < 1e-9
    assert out[("A", "B")]["n_obs"] == 4
    # 1/x returns are not exactly -x returns, but monotone inverse:
    # strongly negative
    assert out[("A", "C")]["ret_corr"] < -0.95


def test_returns_corr_drops_nonpositive_prices(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        returns_corr,
    )

    rows = [
        ("E", "A", datetime(2024, 1, 1, 0, 0), 0.0, 1.0),
        ("E", "A", datetime(2024, 1, 1, 0, 1), 5.0, 1.0),
        ("E", "B", datetime(2024, 1, 1, 0, 0), 3.0, 1.0),
        ("E", "B", datetime(2024, 1, 1, 0, 1), 4.0, 1.0),
    ]
    # A's only return has prev=0 -> excluded -> no aligned pair rows
    assert returns_corr(_mk(spark, rows)).collect() == []


def test_symbol_beta_market_of_itself_is_one(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        symbol_beta,
    )

    # single listed symbol: market return == own return -> beta = 1,
    # alpha = 0
    closes = [10.0, 11.0, 9.5, 12.0, 11.0]
    rows = [
        ("E", "A", datetime(2024, 1, 1, 0, m), float(c), 1.0)
        for m, c in enumerate(closes)
    ]
    out = symbol_beta(_mk(spark, rows)).collect()
    assert len(out) == 1
    assert abs(out[0]["beta"] - 1.0) < 1e-9
    assert abs(out[0]["alpha"]) < 1e-9  # 12-dp product rounding noise


def test_symbol_beta_leveraged_clone(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        symbol_beta,
    )

    # B's returns are exactly 3x A's (price: product of (1+3r)).
    closes_a = [100.0, 101.0, 99.0, 102.0, 100.0]
    rets_a = [
        closes_a[i + 1] / closes_a[i] - 1.0 for i in range(len(closes_a) - 1)
    ]
    closes_b = [100.0]
    for r in rets_a:
        closes_b.append(closes_b[-1] * (1.0 + 3.0 * r))
    rows = []
    for m, (ca, cb) in enumerate(zip(closes_a, closes_b)):
        t = datetime(2024, 1, 1, 0, m)
        rows.append(("E", "A", t, float(ca), 1.0))
        rows.append(("E", "B", t, float(cb), 1.0))
    out = {r["symbol"]: r for r in symbol_beta(_mk(spark, rows)).collect()}
    # market m = (r + 3r)/2 = 2r -> beta_A = cov(r,2r)/var(2r) = 0.5,
    # beta_B = cov(3r,2r)/var(2r) = 1.5
    assert abs(out["A"]["beta"] - 0.5) < 1e-6
    assert abs(out["B"]["beta"] - 1.5) < 1e-6


def test_volume_profile_shares_sum_to_one(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        volume_profile,
    )

    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, 0), 3.0, 10.0),   # bucket 0
        ("E", "S", datetime(2024, 1, 1, 0, 1), 7.0, 30.0),   # bucket 1
        ("E", "S", datetime(2024, 1, 1, 0, 2), 8.0, 10.0),   # bucket 1
        ("E", "T", datetime(2024, 1, 1, 0, 0), 12.0, 5.0),   # bucket 2
    ]
    out = volume_profile(_mk(spark, rows), 5.0).collect()
    s_rows = [r for r in out if r["symbol"] == "S"]
    assert {r["price_bucket"]: r["bucket_volume"] for r in s_rows} == {
        0: 10.0,
        1: 40.0,
    }
    assert abs(sum(r["volume_share"] for r in s_rows) - 1.0) < 1e-12
    t = [r for r in out if r["symbol"] == "T"][0]
    assert t["volume_share"] == 1.0 and t["bucket_low"] == 10.0


def test_stochastic_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        stochastic,
    )

    rows = [
        # open, high, low, close
        ("E", "S", datetime(2024, 1, 1, 0, 0), 10.0, 12.0, 8.0, 11.0, 1.0),
        ("E", "S", datetime(2024, 1, 1, 0, 1), 11.0, 14.0, 10.0, 13.0, 1.0),
        ("E", "S", datetime(2024, 1, 1, 0, 2), 13.0, 13.5, 9.0, 9.5, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        ["exchange", "symbol", "start", "open", "high", "low", "close", "volume"],
    )
    out = {r["start"].minute: r for r in stochastic(df, 2, 2).collect()}
    # m0: lo=8, hi=12 -> K = 100*(11-8)/4 = 75
    assert abs(out[0]["pct_k"] - 75.0) < 1e-6
    # m1: frame {0,1}: lo=8, hi=14 -> K = 100*(13-8)/6
    assert abs(out[1]["pct_k"] - 100.0 * 5 / 6) < 1e-4
    # m2: frame {1,2}: lo=9, hi=14 -> K = 100*(9.5-9)/5 = 10
    assert abs(out[2]["pct_k"] - 10.0) < 1e-6
    # %D at m2 = mean of K(m1), K(m2)
    assert abs(out[2]["pct_d"] - (out[1]["pct_k"] + 10.0) / 2) < 1e-4


def test_donchian_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        donchian,
    )

    base = datetime(2024, 1, 1)
    # (minute, open, high, low, close)
    rows = [
        ("E", "S", base, 10.0, 12.0, 8.0, 11.0, 1.0),
        ("E", "S", datetime(2024, 1, 1, 0, 1), 11.0, 14.0, 9.0, 13.0, 1.0),
        ("E", "S", datetime(2024, 1, 1, 0, 2), 13.0, 13.5, 9.5, 15.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        ["exchange", "symbol", "start", "open", "high", "low", "close", "volume"],
    )
    out = {r["start"].minute: r for r in donchian(df, 2).collect()}
    # m0: frame {m0} -> u=12 l=8 mid=10 width=4; no prior channel
    assert out[0]["donchian_upper_2"] == 12.0 and out[0]["donchian_lower_2"] == 8.0
    assert out[0]["donchian_mid_2"] == 10.0 and out[0]["donchian_width_2"] == 4.0
    assert out[0]["breakout_up"] is False and out[0]["breakout_down"] is False
    # m1: frame {m0,m1} -> u=14 l=8; close 13 vs prior channel (12,8)
    assert out[1]["donchian_upper_2"] == 14.0
    assert out[1]["breakout_up"] is True and out[1]["breakout_down"] is False
    # m2: frame {m1,m2} -> u=14 l=9; close 15 vs prior (14,8) -> breakout
    assert out[2]["donchian_upper_2"] == 14.0 and out[2]["donchian_lower_2"] == 9.0
    assert out[2]["breakout_up"] is True
    assert out[2]["n_in_frame"] == 2


def test_exchange_spread_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        exchange_spread,
    )

    t0, t1 = datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 1)
    rows = [
        ("EXCH_A", "S", t0, 10.0, 1.0),
        ("EXCH_B", "S", t0, 9.0, 1.0),   # spread +1
        ("EXCH_A", "S", t1, 10.0, 1.0),
        ("EXCH_B", "S", t1, 13.0, 1.0),  # spread -3
        ("EXCH_A", "T", t0, 5.0, 1.0),   # only one venue: dropped
    ]
    out = {r["symbol"]: r for r in exchange_spread(_mk(spark, rows)).collect()}
    assert list(out) == ["S"]
    s = out["S"]
    assert s["n_quotes"] == 2
    assert abs(s["mean_spread"] - (-1.0)) < 1e-12   # (1 + -3)/2
    assert abs(s["mean_abs_spread"] - 2.0) < 1e-12  # (1 + 3)/2
    assert s["max_abs_spread"] == 3.0


def test_exchange_spread_non_default_venues(spark):
    """The venue pair is a parameter: on a universe with other
    exchange ids the operator must pivot the requested pair (and the
    defaults must return empty, not wrong)."""
    from trade_data_collection_service_spark.operators.analytics import (
        exchange_spread,
        minute_spread,
    )

    t0 = datetime(2024, 1, 1, 0, 0)
    rows = [
        ("BINANCE", "S", t0, 10.0, 1.0),
        ("KRAKEN", "S", t0, 8.5, 1.0),  # spread +1.5
    ]
    df = _mk(spark, rows)
    ms = minute_spread(df, "BINANCE", "KRAKEN").collect()
    assert len(ms) == 1
    assert ms[0]["close_a"] == 10.0 and ms[0]["close_b"] == 8.5
    out = exchange_spread(df, "BINANCE", "KRAKEN").collect()
    assert len(out) == 1 and abs(out[0]["mean_spread"] - 1.5) < 1e-12
    # reversed pair flips the sign
    rev = exchange_spread(df, "KRAKEN", "BINANCE").collect()
    assert abs(rev[0]["mean_spread"] + 1.5) < 1e-12
    # fixture defaults see no such venues: empty, not garbage
    assert exchange_spread(df).count() == 0


def test_intraday_profile_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        intraday_profile,
    )

    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, 0), 10.0, 4.0),
        ("E", "S", datetime(2024, 1, 1, 0, 30), 12.0, 6.0),  # ret .2
        ("E", "S", datetime(2024, 1, 1, 1, 0), 6.0, 10.0),   # ret .5
    ]
    out = {r["hour"]: r for r in intraday_profile(_mk(spark, rows)).collect()}
    assert out[0]["n_candles"] == 2 and out[0]["mean_volume"] == 5.0
    # hour 0 has one defined return (first candle has no prev)
    assert abs(out[0]["mean_abs_return"] - 0.2) < 1e-9
    assert out[1]["mean_volume"] == 10.0
    assert abs(out[1]["mean_abs_return"] - 0.5) < 1e-9


def test_rolling_beta_converges_to_static(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        rolling_beta,
        symbol_beta,
    )

    closes_a = [100.0, 101.0, 99.0, 102.0, 100.0, 103.0]
    rets_a = [
        closes_a[i + 1] / closes_a[i] - 1.0 for i in range(len(closes_a) - 1)
    ]
    closes_b = [100.0]
    for r in rets_a:
        closes_b.append(closes_b[-1] * (1.0 + 3.0 * r))
    rows = []
    for m, (ca, cb) in enumerate(zip(closes_a, closes_b)):
        t = datetime(2024, 1, 1, 0, m)
        rows.append(("E", "A", t, float(ca), 1.0))
        rows.append(("E", "B", t, float(cb), 1.0))
    df = _mk(spark, rows)
    static = {
        r["symbol"]: r["beta"] for r in symbol_beta(df).collect()
    }
    roll = rolling_beta(df, 60).collect()
    # the last row's frame spans the whole history -> equals static
    last = {
        r["symbol"]: r
        for r in roll
        if r["start"] == datetime(2024, 1, 1, 0, 5)
    }
    for sym in ("A", "B"):
        assert abs(last[sym][f"beta_60"] - static[sym]) < 1e-9
        assert last[sym]["n_in_frame"] == 5


def test_rolling_sharpe_sign_tracks_trend(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        rolling_sharpe,
    )

    up = [100.0 * (1.02 ** i) + (i % 2) * 0.5 for i in range(10)]
    down = [100.0 * (0.98 ** i) + (i % 2) * 0.5 for i in range(10)]
    rows = []
    for m, (u, d) in enumerate(zip(up, down)):
        t = datetime(2024, 1, 1, 0, m)
        rows.append(("E", "UP", t, float(u), 1.0))
        rows.append(("E", "DN", t, float(d), 1.0))
    out = rolling_sharpe(_mk(spark, rows), 60).collect()
    last = {r["symbol"]: r for r in out if r["start"].minute == 9}
    assert last["UP"]["sharpe_60"] > 0 > last["DN"]["sharpe_60"]
    assert last["UP"]["n_in_frame"] == 9


def test_drawdown_curve_hand_computed(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        drawdown_curve,
    )

    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), float(c), 1.0)
        for m, c in enumerate([10.0, 12.0, 9.0, 12.0, 15.0])
    ]
    out = {r["start"].minute: r for r in drawdown_curve(_mk(spark, rows)).collect()}
    assert out[0]["drawdown"] == 0.0
    assert out[1]["drawdown"] == 0.0 and out[1]["running_peak"] == 12.0
    assert abs(out[2]["drawdown"] - (9.0 / 12.0 - 1.0)) < 1e-12
    assert out[3]["drawdown"] == 0.0
    assert out[4]["running_peak"] == 15.0 and out[4]["drawdown"] == 0.0


def test_rolling_corr_converges_to_static(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        returns_corr,
        rolling_corr,
    )

    closes = [10.0, 11.0, 9.0, 12.0, 8.0, 10.5]
    rows = []
    for m, c in enumerate(closes):
        t = datetime(2024, 1, 1, 0, m)
        rows.append(("E", "A", t, c, 1.0))
        rows.append(("E", "B", t, 100.0 / c, 1.0))
    df = _mk(spark, rows)
    static = returns_corr(df).collect()[0]["ret_corr"]
    roll = rolling_corr(df, 60).collect()
    last = [r for r in roll if r["start"].minute == 5][0]
    assert last["n_in_frame"] == 5
    assert abs(last["corr_60"] - static) < 1e-9
    # correlations bounded
    assert all(
        r["corr_60"] is None or -1.0 - 1e-9 <= r["corr_60"] <= 1.0 + 1e-9
        for r in roll
    )


def test_returns_autocorr_alternating_and_constant(spark):
    from trade_data_collection_service_spark.operators.analytics import (
        returns_autocorr,
    )

    base = datetime(2024, 1, 1)
    rows = []
    # S: alternating closes -> strongly negative lag-1 autocorr
    for i, c in enumerate([10.0, 11.0, 10.0, 11.0, 10.0, 11.0]):
        rows.append(("E", "S", datetime(2024, 1, 1, 0, i), c, 1.0))
    # T: constant growth factor -> zero return variance -> NULL
    for i, c in enumerate([10.0, 20.0, 40.0, 80.0]):
        rows.append(("E", "T", datetime(2024, 1, 1, 0, i), c, 1.0))
    out = {
        r["symbol"]: r
        for r in returns_autocorr(_mk(spark, rows)).collect()
    }
    assert out["S"]["n_obs"] == 4 and out["S"]["autocorr_1"] < -0.9
    assert out["T"]["autocorr_1"] is None
