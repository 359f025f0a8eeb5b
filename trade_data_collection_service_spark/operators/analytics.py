"""Financial analytics over candles — frame-spec window functions.

The reference exposes no moving-window analytics (SURVEY.md §2.5:
"No ranking, no frame-spec analytics"), but its users consume OHLCV
candles precisely to compute them; the engine therefore exposes the
two canonical ones as first-class operators:

- ``sma``: N-bucket simple moving average of close per (exchange,
  symbol), a ``rowsBetween`` frame over the ordered candle stream;
- ``vwap_daily``: volume-weighted average price per (exchange,
  symbol, day) — decimal-exact sums (docs/ARCHITECTURE.md float
  contract) so the DuckDB oracle matches bit-for-bit.

Both shuffle once on (exchange, symbol) — the table's native layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sma(candles: DataFrame, n: int = 20) -> DataFrame:
    """N-candle simple moving average of close (incomplete head frames
    average what exists, like every charting tool)."""
    w = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    return candles.select(
        "exchange",
        "symbol",
        "start",
        "close",
        F.round(F.avg("close").over(w), 6).alias(f"sma_{n}"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


def vwap_daily(candles: DataFrame) -> DataFrame:
    """Daily VWAP: sum(close × volume) / sum(volume) per (exchange,
    symbol, day).  Products are per-row rounded then decimal-summed
    for cross-engine determinism."""
    pv = F.round(F.col("close") * F.col("volume"), 6).cast("decimal(28,6)")
    v = F.round("volume", 6).cast("decimal(28,6)")
    return (
        candles.groupBy(
            "exchange", "symbol", F.date_trunc("day", "start").alias("day")
        )
        .agg(
            F.sum(pv).cast("double").alias("sum_pv"),
            F.sum(v).cast("double").alias("sum_volume"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .withColumn(
            "vwap", F.round(F.col("sum_pv") / F.col("sum_volume"), 6)
        )
        .orderBy("exchange", "symbol", "day")
    )


def bollinger(candles: DataFrame, n: int = 20, k: float = 2.0) -> DataFrame:
    """Bollinger bands: N-candle moving mean ± k·stddev of close.

    Mean and variance come from decimal-exact windowed sums of
    round(close, 2) and its square — windowed FLOAT sums are
    order-dependent (DuckDB aggregates frames via segment trees,
    Spark sequentially), decimal sums are exact in both engines, so
    the derived doubles are bit-identical.  Population variance
    (÷ n) over the in-frame rows; head frames use what exists."""
    w = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    c2 = F.round("close", 2).cast("decimal(12,2)")
    cnt = F.count(F.lit(1)).over(w)
    m1 = F.sum(c2).over(w).cast("double") / cnt
    m2 = F.sum((c2 * c2).cast("decimal(24,4)")).over(w).cast("double") / cnt
    sd = F.sqrt(F.greatest(m2 - m1 * m1, F.lit(0.0)))
    return candles.select(
        "exchange",
        "symbol",
        "start",
        "close",
        F.round(m1, 6).alias("bb_mid"),
        F.round(m1 + k * sd, 6).alias("bb_upper"),
        F.round(m1 - k * sd, 6).alias("bb_lower"),
        cnt.cast("long").alias("n_in_frame"),
    )


def daily_volatility(candles: DataFrame) -> DataFrame:
    """Per-day realized volatility: sqrt(Σ r²) of 1m log returns
    r = ln(close_t / close_{t-1}) per (exchange, symbol).  The r²
    terms are per-row rounded and decimal-summed (float-sum order
    is engine-dependent; decimal addition is exact), mirroring the
    vwap_daily determinism contract."""
    w = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(w)
    # log returns are only defined for positive prices; zero closes
    # exist in the synthetic data (and halted books in real data) —
    # guard both engines identically (ANSI mode errors on x/0).
    r = F.when(
        (prev > 0) & (F.col("close") > 0), F.log(F.col("close") / prev)
    )
    r2 = F.round(r * r, 12).cast("decimal(28,14)")
    with_r = candles.select(
        "exchange", "symbol", "start", r2.alias("r2")
    ).filter(F.col("r2").isNotNull())
    return (
        with_r.groupBy(
            "exchange", "symbol", F.date_trunc("day", "start").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_returns"),
            F.round(F.sqrt(F.sum("r2").cast("double")), 8).alias("realized_vol"),
        )
        .orderBy("exchange", "symbol", "day")
    )


def atr(candles: DataFrame, n: int = 14) -> DataFrame:
    """Average True Range: TR = max(high−low, |high−prev_close|,
    |low−prev_close|); ATR = N-candle simple moving average of TR
    (decimal-exact windowed sum, same contract as bollinger)."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev_close = F.lag("close").over(ws)
    # First candle has no prev_close: TR is high−low by definition —
    # made explicit because NULL-in-greatest semantics differ across
    # engines (Spark skips NULLs; the oracle mirrors this CASE).
    tr = F.when(prev_close.isNull(), F.col("high") - F.col("low")).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        )
    )
    wf = ws.rowsBetween(-(n - 1), 0)
    tr_dec = F.round(tr, 6).cast("decimal(18,6)")
    base = candles.select("exchange", "symbol", "start", tr_dec.alias("tr_dec"))
    cnt = F.count(F.lit(1)).over(wf)
    return base.select(
        "exchange",
        "symbol",
        "start",
        F.col("tr_dec").cast("double").alias("true_range"),
        F.round(F.sum("tr_dec").over(wf).cast("double") / cnt, 6).alias(
            f"atr_{n}"
        ),
        cnt.cast("long").alias("n_in_frame"),
    )


def twap_daily(candles: DataFrame) -> DataFrame:
    """Daily TWAP (time-weighted average price) per (exchange, symbol,
    day): each candle's close is weighted by how long it was the
    latest price — from its start to the next candle's start within
    the day, the day's last candle running to midnight.  The
    execution-benchmark twin of ``vwap_daily``; with gap-free 1m
    candles it degrades to the plain mean of closes, so its value is
    exactly on gappy/irregular data.

    One shuffle on (exchange, symbol, day): the lead() window and the
    grouped sum share the same partitioning; weighted sums are
    per-row rounded then decimal-summed (the repo float contract).
    The twap quotient is emitted UNROUNDED: its operands are
    bit-identical across engines (decimal sum, integer seconds), so
    the IEEE division is too, while round(q, 6) at a half-ulp
    boundary is not (observed: DuckDB's multiply-based double round
    differs in the last digit at sf0.01)."""
    day = F.date_trunc("day", "start")
    w = Window.partitionBy("exchange", "symbol", day).orderBy("start")
    day_end = F.timestamp_add("DAY", F.lit(1), day)
    dur_sec = (
        (
            F.unix_micros(F.coalesce(F.lead("start").over(w), day_end))
            - F.unix_micros(F.col("start"))
        )
        / F.lit(1_000_000)
    ).cast("long")
    weighted = F.round(F.col("close") * dur_sec, 6).cast("decimal(28,6)")
    return (
        candles.select(
            "exchange",
            "symbol",
            day.alias("day"),
            dur_sec.alias("dur_sec"),
            weighted.alias("wp"),
        )
        .groupBy("exchange", "symbol", "day")
        .agg(
            F.sum("wp").cast("double").alias("sum_wp"),
            F.sum("dur_sec").alias("total_sec"),
            F.count(F.lit(1)).alias("n_candles"),
        )
        .withColumn("twap", F.col("sum_wp") / F.col("total_sec"))
        .orderBy("exchange", "symbol", "day")
    )


def candle_patterns(candles: DataFrame) -> DataFrame:
    """Classic candlestick pattern flags per candle — doji, hammer,
    bullish/bearish engulfing — the signal-generation layer a candle
    consumer builds on the OHLCV read path.

    Pure row arithmetic + one lag() per (exchange, symbol): every
    comparison runs on raw doubles derived identically in both
    engines (no aggregation, no rounding needed), so the oracle
    matches bit-for-bit.  Only flagged candles are returned.

    Definitions (deterministic, body = close-open, range = high-low):
    doji: |body| <= 0.1*range; hammer: lower wick >= 2|body| and
    upper wick <= |body|; engulfing: opposite-sign previous body and
    the current body spans it."""
    w = Window.partitionBy("exchange", "symbol").orderBy("start")
    body = F.col("close") - F.col("open")
    rng = F.col("high") - F.col("low")
    upper = F.col("high") - F.greatest("open", "close")
    lower = F.least("open", "close") - F.col("low")
    p_open = F.lag("open").over(w)
    p_close = F.lag("close").over(w)
    p_body = p_close - p_open
    doji = F.abs(body) <= F.lit(0.1) * rng
    hammer = (lower >= F.lit(2.0) * F.abs(body)) & (upper <= F.abs(body))
    bull_engulf = (
        (p_body < 0)
        & (body > 0)
        & (F.col("open") <= p_close)
        & (F.col("close") >= p_open)
    )
    bear_engulf = (
        (p_body > 0)
        & (body < 0)
        & (F.col("open") >= p_close)
        & (F.col("close") <= p_open)
    )
    flagged = candles.select(
        "exchange",
        "symbol",
        "start",
        doji.alias("doji"),
        hammer.alias("hammer"),
        F.coalesce(bull_engulf, F.lit(False)).alias("bullish_engulfing"),
        F.coalesce(bear_engulf, F.lit(False)).alias("bearish_engulfing"),
    )
    return flagged.filter(
        F.col("doji")
        | F.col("hammer")
        | F.col("bullish_engulfing")
        | F.col("bearish_engulfing")
    ).orderBy("exchange", "symbol", "start")
