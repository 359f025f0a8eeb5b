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


def donchian(candles: DataFrame, n: int = 20) -> DataFrame:
    """Donchian channel: trailing-N-candle highest high / lowest low
    per (exchange, symbol), with midline, width, and a breakout flag
    (close exceeding the PRIOR candle's channel) — the classic
    turtle-trading breakout signal.

    Two extrema over one rowsBetween frame plus one lag, all on the
    table's native (exchange, symbol) sort — a single shuffle, no
    arithmetic beyond min/max/half-sum, so every published value is
    an IEEE op over bit-identical operands in both engines (no
    rounding needed)."""
    w = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    upper = F.max("high").over(w)
    lower = F.min("low").over(w)
    base = candles.select(
        "exchange",
        "symbol",
        "start",
        "close",
        upper.alias(f"donchian_upper_{n}"),
        lower.alias(f"donchian_lower_{n}"),
        ((upper + lower) / 2.0).alias(f"donchian_mid_{n}"),
        (upper - lower).alias(f"donchian_width_{n}"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )
    prev_upper = F.lag(f"donchian_upper_{n}").over(ws)
    prev_lower = F.lag(f"donchian_lower_{n}").over(ws)
    # first candle has no prior channel: published as NOT a breakout
    # (coalesce also keeps the boolean non-null for cross-engine hashing)
    return base.select(
        "*",
        F.coalesce(F.col("close") > prev_upper, F.lit(False)).alias(
            "breakout_up"
        ),
        F.coalesce(F.col("close") < prev_lower, F.lit(False)).alias(
            "breakout_down"
        ),
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


def rsi(candles: DataFrame, n: int = 14) -> DataFrame:
    """Relative Strength Index (Cutler's SMA form) over close-to-close
    moves: gain = max(Δclose, 0), loss = max(−Δclose, 0) per candle;
    RSI = 100 − 100/(1 + ΣgainN/ΣlossN) over the trailing N moves.

    Cutler's SMA variant (not Wilder's recursive EMA) is chosen
    deliberately: it is a pure frame-spec window — one shuffle on
    (exchange, symbol), no sequential recursion — so it distributes,
    while Wilder smoothing is an order-1 recurrence that cannot.
    Gains/losses are per-row rounded then decimal-summed (the repo
    float contract), so the RSI quotient's operands are bit-identical
    across engines and the IEEE division is too (emitted unrounded,
    the twap_daily precedent).

    Edge conventions (mirrored verbatim in the oracle CASE): no moves
    in frame (first candle) → NULL; all-flat frame (Σgain=Σloss=0) →
    50; loss-free frame → 100."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    diff = F.col("close") - F.lag("close").over(ws)
    # first candle: explicit NULL (Spark's greatest SKIPS nulls, which
    # would silently turn the missing move into a 0-gain/0-loss row;
    # the oracle CASE mirrors this guard verbatim)
    gain = F.when(
        diff.isNotNull(),
        F.round(F.greatest(diff, F.lit(0.0)), 6).cast("decimal(18,6)"),
    )
    loss = F.when(
        diff.isNotNull(),
        F.round(F.greatest(-diff, F.lit(0.0)), 6).cast("decimal(18,6)"),
    )
    base = candles.select(
        "exchange", "symbol", "start", gain.alias("g"), loss.alias("l")
    )
    wf = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    sg = F.sum("g").over(wf)
    sl = F.sum("l").over(wf)
    n_moves = F.count("g").over(wf)
    rsi_val = (
        F.when(n_moves == 0, F.lit(None).cast("double"))
        .when((sg == 0) & (sl == 0), F.lit(50.0))
        .when(sl == 0, F.lit(100.0))
        .otherwise(
            F.lit(100.0)
            - F.lit(100.0)
            / (F.lit(1.0) + sg.cast("double") / sl.cast("double"))
        )
    )
    return base.select(
        "exchange",
        "symbol",
        "start",
        rsi_val.alias(f"rsi_{n}"),
        n_moves.cast("long").alias("n_moves"),
    )


def stochastic(candles: DataFrame, n: int = 14, d: int = 3) -> DataFrame:
    """Stochastic oscillator: %K = 100·(close − minN(low)) /
    (maxN(high) − minN(low)) over the trailing N candles; %D = the
    D-candle simple moving average of %K.

    min/max picks are exact in any engine; %K is an IEEE quotient of
    identical operands; %D re-enters the float-sum contract, so %K is
    per-row rounded then decimal-averaged.  Degenerate frame
    (max = min, a flat book) → %K = 50 by convention, mirrored in the
    oracle.  One shuffle on (exchange, symbol); both frames reuse it."""
    wn = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    lo = F.min("low").over(wn)
    hi = F.max("high").over(wn)
    k = F.when(hi == lo, F.lit(50.0)).otherwise(
        F.lit(100.0) * (F.col("close") - lo) / (hi - lo)
    )
    base = candles.select(
        "exchange",
        "symbol",
        "start",
        F.round(k, 6).cast("decimal(18,6)").alias("k_dec"),
    )
    wd = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(d - 1), 0)
    )
    return base.select(
        "exchange",
        "symbol",
        "start",
        F.col("k_dec").cast("double").alias("pct_k"),
        (
            F.sum("k_dec").over(wd).cast("double")
            / F.count("k_dec").over(wd)
        ).alias("pct_d"),
    )


def obv(candles: DataFrame) -> DataFrame:
    """On-balance volume: running total of volume signed by the
    close-to-close direction (up-candle adds volume, down-candle
    subtracts, flat contributes nothing; the first candle contributes
    nothing — the zero-baseline convention).

    A cumulative decimal sum over the ordered candle stream — exact
    in both engines regardless of accumulation order, so the running
    total matches bit-for-bit.  One shuffle on (exchange, symbol)."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    diff = F.col("close") - F.lag("close").over(ws)
    vol = F.round("volume", 6).cast("decimal(28,6)")
    step = (
        F.when(diff.isNull() | (diff == 0), F.lit(0).cast("decimal(28,6)"))
        .when(diff > 0, vol)
        .otherwise(-vol)
    )
    wc = ws.rowsBetween(Window.unboundedPreceding, 0)
    base = candles.select("exchange", "symbol", "start", step.alias("step"))
    return base.select(
        "exchange",
        "symbol",
        "start",
        F.sum("step").over(wc).cast("double").alias("obv"),
    )


def returns_corr(candles: DataFrame, max_abs_return: float = 10.0) -> DataFrame:
    """Pairwise Pearson correlation of per-candle simple returns
    between every co-listed symbol pair on the same exchange — the
    portfolio-construction primitive a candle store feeds.

    Returns r = close/prev − 1 are computed per (exchange, symbol),
    rounded to 10 dp and kept as decimals; candles with non-positive
    prices or |r| > max_abs_return (garbage ticks) are excluded —
    identically in the oracle.  Symbols are paired per timestamp via
    ONE groupBy(exchange, start) that collects the S-sized
    (symbol, ret) array and expands the S(S−1)/2 ordered pairs with a
    map-side array comprehension (sym_a < sym_b) — NOT a self-join,
    which would recompute the whole returns window subtree for each
    side (Catalyst does not CSE across self-joins).  One groupBy per
    pair then accumulates the five decimal-exact moment sums (n, Σx,
    Σy, Σx², Σy², Σxy); the closed-form Pearson quotient runs in
    doubles over those bit-identical operands, so it needs no
    rounding.  Pairs with fewer than 2 aligned candles or zero
    variance on either leg yield NULL.

    Scale shape: one window pass, one shuffle onto (exchange, start)
    — the candle table's natural time layout — with arrays bounded by
    S (co-listed symbols per exchange, a dimension-sized constant,
    not data-sized); the pair aggregate is map-side combined down to
    one row per pair."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= max_abs_return)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("ret"),
        )
    )
    # Pair co-listed symbols per timestamp WITHOUT a self-join: a
    # self-join would recompute the whole returns window subtree for
    # each side (Catalyst does not CSE across self-joins — observed as
    # two full window passes in the r5 plan audit).  Instead ONE
    # groupBy(exchange, start) collects the S-sized (symbol, ret)
    # array and a map-side array comprehension expands the
    # S(S−1)/2 pairs — S is the dimension-sized co-listed symbol
    # count, so the arrays are tiny and the expansion is codegen-side.
    by_ts = rets.groupBy("exchange", "start").agg(
        F.sort_array(
            F.collect_list(F.struct("symbol", "ret"))
        ).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda a: F.transform(
                F.filter(F.col("ps"), lambda b: b["symbol"] > a["symbol"]),
                lambda b: F.struct(
                    a["symbol"].alias("symbol_a"),
                    b["symbol"].alias("symbol_b"),
                    a["ret"].alias("x"),
                    b["ret"].alias("y"),
                ),
            ),
        )
    )
    pairs = by_ts.select(
        "exchange", F.explode(pair_arr).alias("p")
    ).select("exchange", "p.*")
    agg = pairs.groupBy("exchange", "symbol_a", "symbol_b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n_obs").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (F.col("n_obs") >= 2) & (vx > 0) & (vy > 0),
        cov / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return agg.select(
        "exchange", "symbol_a", "symbol_b", "n_obs", corr.alias("ret_corr")
    ).orderBy("exchange", "symbol_a", "symbol_b")


def symbol_beta(candles: DataFrame, max_abs_return: float = 10.0) -> DataFrame:
    """Per-symbol market beta (and alpha): the OLS slope of a
    symbol's per-candle returns against the equal-weight market
    return of its exchange — the systematic-risk figure a portfolio
    layer computes from the candle store (returns_corr's regression
    sibling).

    Market return m_t = mean of co-listed symbol returns at t, from
    an exact decimal sum divided by the symbol count (the quotient is
    IEEE-identical cross-engine); each symbol's (x_t, m_t) pairs then
    accumulate decimal moment sums — x exactly, m and the x·m / m²
    products rounded to 12 dp pre-sum (a double sum would be
    addition-order-dependent) — and beta/alpha close the OLS formula
    in doubles over bit-identical operands.

    Scale shape: returns window shuffles once on (exchange, symbol);
    the market mean is an unordered window over (exchange, start) —
    each row sees its timestamp's market return with no join back, so
    the returns subtree runs exactly once — and the final
    per-symbol aggregate is map-side combined to one row per symbol.
    Includes each symbol in its own market (standard index
    convention); pairs with < 2 observations or a flat market yield
    NULL."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= max_abs_return)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("x"),
        )
    )
    # Market mean WITHOUT a join back or a window: one hash aggregate
    # onto (exchange, start) computes the exact decimal market sum
    # AND collects the S-sized (symbol, x) array in the same pass
    # (returns_corr's shape — a groupBy + rejoin would replay the
    # whole returns subtree; an unordered-window variant and a
    # per-array decimal fold both measured ~20 s at the ×64
    # synthesized-volume rung vs ~11 s for this form).  Each element
    # re-emerges via explode carrying its timestamp's market mean.
    by_ts = rets.groupBy("exchange", "start").agg(
        F.sort_array(F.collect_list(F.struct("symbol", "x"))).alias("ps"),
        F.sum("x").alias("sum_x"),
        F.count(F.lit(1)).alias("n_sym"),
    )
    m = F.col("sum_x").cast("double") / F.col("n_sym")
    pairs = (
        by_ts.select(
            "exchange", m.alias("m"), F.explode("ps").alias("p")
        )
        .select(
            "exchange",
            F.col("p.symbol").alias("symbol"),
            F.col("p.x").alias("x"),
            F.round("m", 12).cast("decimal(20,12)").alias("m_dec"),
            F.round(F.col("p.x").cast("double") * F.col("m"), 12)
            .cast("decimal(24,12)")
            .alias("xm"),
            F.round(F.col("m") * F.col("m"), 12)
            .cast("decimal(24,12)")
            .alias("mm"),
        )
    )
    agg = pairs.groupBy("exchange", "symbol").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("m_dec").cast("double").alias("sm"),
        F.sum("xm").cast("double").alias("sxm"),
        F.sum("mm").cast("double").alias("smm"),
    )
    n = F.col("n_obs").cast("double")
    var_m = n * F.col("smm") - F.col("sm") * F.col("sm")
    beta = F.when(
        (F.col("n_obs") >= 2) & (var_m > 0),
        (n * F.col("sxm") - F.col("sx") * F.col("sm")) / var_m,
    )
    alpha = F.when(
        beta.isNotNull(),
        F.col("sx") / n - beta * (F.col("sm") / n),
    )
    return agg.select(
        "exchange",
        "symbol",
        "n_obs",
        beta.alias("beta"),
        alpha.alias("alpha"),
    ).orderBy("exchange", "symbol")


def volume_profile(candles: DataFrame, bucket_width: float = 5.0) -> DataFrame:
    """Volume-at-price profile per (exchange, symbol): traded volume
    histogrammed by price bucket — the support/resistance map a
    charting client derives from the candle store (the per-symbol
    refinement of the global price-band classification).

    One map-side-combined groupBy onto (exchange, symbol, bucket);
    each bucket's share of its symbol's total volume comes from an
    unordered window over the (already tiny) per-symbol bucket rows —
    no second scan, no scalar collect.  Volume sums stay decimal
    until the final quotient, so the share is an IEEE division of
    bit-identical operands in both engines."""
    vol = F.round("volume", 6).cast("decimal(28,6)")
    bucket = F.floor(F.col("close") / F.lit(bucket_width)).cast("long")
    per = candles.groupBy(
        "exchange", "symbol", bucket.alias("price_bucket")
    ).agg(
        F.sum(vol).alias("vol_dec"),
        F.count(F.lit(1)).alias("n_candles"),
    )
    w = Window.partitionBy("exchange", "symbol")
    total = F.sum("vol_dec").over(w)
    return per.select(
        "exchange",
        "symbol",
        "price_bucket",
        (F.col("price_bucket") * F.lit(bucket_width)).alias("bucket_low"),
        F.col("vol_dec").cast("double").alias("bucket_volume"),
        "n_candles",
        (F.col("vol_dec").cast("double") / total.cast("double")).alias(
            "volume_share"
        ),
    ).orderBy("exchange", "symbol", "price_bucket")


def minute_spread(
    candles: DataFrame,
    venue_a: str = "EXCH_A",
    venue_b: str = "EXCH_B",
) -> DataFrame:
    """(symbol, start, close_a, close_b) for minutes quoted on BOTH
    venues — the conditional-aggregate pivot shared by the batch
    summary (``exchange_spread``) and the streaming spread feed
    (streaming/spread.py), so the two can never disagree on what a
    spread observation is.

    The venue pair is a parameter (defaults match the fixture
    universe derived in candles.py); on any other exchange universe
    pass the two venue ids explicitly."""
    return (
        candles.groupBy("symbol", "start")
        .agg(
            F.min(
                F.when(F.col("exchange") == venue_a, F.col("close"))
            ).alias("close_a"),
            F.min(
                F.when(F.col("exchange") == venue_b, F.col("close"))
            ).alias("close_b"),
        )
        .filter(F.col("close_a").isNotNull() & F.col("close_b").isNotNull())
    )


def exchange_spread(
    candles: DataFrame,
    venue_a: str = "EXCH_A",
    venue_b: str = "EXCH_B",
) -> DataFrame:
    """Cross-exchange spread per symbol: for every minute a symbol
    trades on BOTH exchanges, the close-price gap EXCH_A − EXCH_B,
    summarized per symbol — the arbitrage/venue-quality monitor a
    multi-exchange candle store exists to answer.

    No join: ONE groupBy(symbol, start) with conditional min
    aggregates pivots the two venue closes side by side (a self-join
    on (symbol, start) would scan and shuffle the table twice);
    minutes quoted on only one venue drop out.  Per-symbol summary
    sums are decimal-exact; the mean quotients divide bit-identical
    operands.  Output: (symbol, n_quotes, mean_spread,
    mean_abs_spread, max_abs_spread).  The venue pair is a parameter
    with fixture-universe defaults (see ``minute_spread``)."""
    per_minute = minute_spread(candles, venue_a, venue_b)
    spread = F.round(F.col("close_a") - F.col("close_b"), 6).cast(
        "decimal(18,6)"
    )
    agg = per_minute.select("symbol", spread.alias("sp")).groupBy(
        "symbol"
    ).agg(
        F.count(F.lit(1)).alias("n_quotes"),
        F.sum("sp").alias("sum_sp"),
        F.sum(F.abs(F.col("sp"))).alias("sum_abs"),
        F.max(F.abs(F.col("sp"))).alias("max_abs"),
    )
    return agg.select(
        "symbol",
        "n_quotes",
        (F.col("sum_sp").cast("double") / F.col("n_quotes")).alias(
            "mean_spread"
        ),
        (F.col("sum_abs").cast("double") / F.col("n_quotes")).alias(
            "mean_abs_spread"
        ),
        F.col("max_abs").cast("double").alias("max_abs_spread"),
    ).orderBy("symbol")


def intraday_profile(candles: DataFrame) -> DataFrame:
    """Intraday seasonality: mean volume and mean absolute 1-candle
    return by hour-of-day per (exchange, symbol) — the
    liquidity/volatility clock that schedules backfills and sizes
    executions.

    The return needs one lag window (the table's native
    (exchange, symbol) sort); the profile is then a single
    map-side-combined groupBy onto the 24-row-per-symbol hour grid.
    Decimal sums; mean quotients over bit-identical operands."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    aret = F.when(
        (prev > 0) & (F.col("close") > 0),
        F.abs(F.col("close") / prev - F.lit(1.0)),
    )
    base = candles.select(
        "exchange",
        "symbol",
        F.hour("start").cast("long").alias("hour"),
        F.round("volume", 6).cast("decimal(28,6)").alias("vol"),
        F.round(aret, 10).cast("decimal(18,10)").alias("aret"),
    )
    agg = base.groupBy("exchange", "symbol", "hour").agg(
        F.count(F.lit(1)).alias("n_candles"),
        F.sum("vol").alias("sum_vol"),
        F.count("aret").alias("n_rets"),
        F.sum("aret").alias("sum_aret"),
    )
    return agg.select(
        "exchange",
        "symbol",
        "hour",
        "n_candles",
        (F.col("sum_vol").cast("double") / F.col("n_candles")).alias(
            "mean_volume"
        ),
        F.when(
            F.col("n_rets") > 0,
            F.col("sum_aret").cast("double") / F.col("n_rets"),
        ).alias("mean_abs_return"),
    ).orderBy("exchange", "symbol", "hour")


def rolling_beta(candles: DataFrame, n: int = 60) -> DataFrame:
    """Time-varying market beta: the OLS slope of a symbol's returns
    on the equal-weight market return over the TRAILING ``n``
    aligned observations — ``symbol_beta``'s frame-spec sibling
    (risk drifts; a portfolio layer tracks it per candle, not once
    per history).

    Same single-pass shape as symbol_beta up to the per-pair rows
    (one returns window, one (exchange, start) hash aggregate with
    the decimal market sum computed alongside the collect_list),
    then the five moment sums become decimal FRAME sums over the
    trailing n rows per (exchange, symbol) — one more window on the
    table's native sort.  The OLS quotient closes per row in doubles
    over bit-identical operands; frames with < 2 observations or a
    flat market emit NULL."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= 10.0)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("x"),
        )
    )
    by_ts = rets.groupBy("exchange", "start").agg(
        F.sort_array(F.collect_list(F.struct("symbol", "x"))).alias("ps"),
        F.sum("x").alias("sum_x"),
        F.count(F.lit(1)).alias("n_sym"),
    )
    m = F.col("sum_x").cast("double") / F.col("n_sym")
    pairs = by_ts.select(
        "exchange", "start", m.alias("m"), F.explode("ps").alias("p")
    ).select(
        "exchange",
        F.col("p.symbol").alias("symbol"),
        "start",
        F.col("p.x").alias("x"),
        F.round("m", 12).cast("decimal(20,12)").alias("m_dec"),
        F.round(F.col("p.x").cast("double") * F.col("m"), 12)
        .cast("decimal(24,12)")
        .alias("xm"),
        F.round(F.col("m") * F.col("m"), 12)
        .cast("decimal(24,12)")
        .alias("mm"),
    )
    wf = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    cnt = F.count(F.lit(1)).over(wf)
    sx = F.sum("x").over(wf).cast("double")
    sm = F.sum("m_dec").over(wf).cast("double")
    sxm = F.sum("xm").over(wf).cast("double")
    smm = F.sum("mm").over(wf).cast("double")
    nn = cnt.cast("double")
    var_m = nn * smm - sm * sm
    beta = F.when((cnt >= 2) & (var_m > 0), (nn * sxm - sx * sm) / var_m)
    return pairs.select(
        "exchange",
        "symbol",
        "start",
        cnt.cast("long").alias("n_in_frame"),
        beta.alias(f"beta_{n}"),
    )


def rolling_sharpe(candles: DataFrame, n: int = 60) -> DataFrame:
    """Trailing-window Sharpe ratio of per-candle returns (risk-free
    rate 0, no annualization — callers scale by √periods): mean/std
    over the last ``n`` returns, the risk-adjusted companion to
    ``rolling_beta``.

    Decimal frame sums of x and x² (bollinger's variance contract at
    return grain); population std; frames with < 2 returns or zero
    variance emit NULL.  One returns window + one frame window on the
    same (exchange, symbol) sort."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= 10.0)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("x"),
            # the daily_volatility r² contract: round the double
            # product, then decimal — exact to sum in both engines
            F.round(
                F.round("r", 10) * F.round("r", 10), 14
            ).cast("decimal(28,14)").alias("x2"),
        )
    )
    wf = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    cnt = F.count(F.lit(1)).over(wf)
    sx = F.sum("x").over(wf).cast("double")
    sx2 = F.sum("x2").over(wf).cast("double")
    nn = cnt.cast("double")
    var = sx2 / nn - (sx / nn) * (sx / nn)
    sharpe = F.when(
        (cnt >= 2) & (var > 0), (sx / nn) / F.sqrt(var)
    )
    return rets.select(
        "exchange",
        "symbol",
        "start",
        cnt.cast("long").alias("n_in_frame"),
        sharpe.alias(f"sharpe_{n}"),
    )


def drawdown_curve(candles: DataFrame) -> DataFrame:
    """Per-candle drawdown curve: the running peak close and the
    current drawdown fraction close/peak − 1 — the live companion of
    the scalar ``max_drawdown`` (whose minimum this curve attains).

    A single unbounded-preceding max window on the native
    (exchange, symbol) sort; the quotient divides raw doubles picked
    exactly by max, so no rounding contract is needed.  Zero/negative
    peaks (halted synthetic books) emit NULL."""
    wc = (
        Window.partitionBy("exchange", "symbol")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("close").over(wc)
    dd = F.when(peak > 0, F.col("close") / peak - F.lit(1.0))
    return candles.select(
        "exchange",
        "symbol",
        "start",
        "close",
        peak.alias("running_peak"),
        dd.alias("drawdown"),
    )


def rolling_corr(candles: DataFrame, n: int = 60) -> DataFrame:
    """Trailing-window pairwise return correlation: ``returns_corr``
    per (symbol_a, symbol_b) over the last ``n`` aligned
    observations — correlations regime-shift, so the portfolio layer
    tracks them per candle (the rolling_beta of the pair matrix).

    Same single-pass pairing as returns_corr (one collect_list
    aggregate + map-side comprehension — no self-join), keeping the
    timestamp; the five moment sums become decimal FRAME sums per
    pair on (exchange, symbol_a, symbol_b) — pair-partitioned, so no
    unpartitioned window anywhere.  Frames with < 2 pairs or zero
    variance on either leg emit NULL."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= 10.0)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("ret"),
        )
    )
    by_ts = rets.groupBy("exchange", "start").agg(
        F.sort_array(F.collect_list(F.struct("symbol", "ret"))).alias("ps")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda a: F.transform(
                F.filter(F.col("ps"), lambda b: b["symbol"] > a["symbol"]),
                lambda b: F.struct(
                    a["symbol"].alias("symbol_a"),
                    b["symbol"].alias("symbol_b"),
                    a["ret"].alias("x"),
                    b["ret"].alias("y"),
                ),
            ),
        )
    )
    pairs = by_ts.select(
        "exchange", "start", F.explode(pair_arr).alias("p")
    ).select("exchange", "start", "p.*")
    wf = (
        Window.partitionBy("exchange", "symbol_a", "symbol_b")
        .orderBy("start")
        .rowsBetween(-(n - 1), 0)
    )
    cnt = F.count(F.lit(1)).over(wf)
    sx = F.sum("x").over(wf).cast("double")
    sy = F.sum("y").over(wf).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).over(wf).cast("double")
    syy = F.sum(F.col("y") * F.col("y")).over(wf).cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).over(wf).cast("double")
    nn = cnt.cast("double")
    vx = nn * sxx - sx * sx
    vy = nn * syy - sy * sy
    corr = F.when(
        (cnt >= 2) & (vx > 0) & (vy > 0),
        (nn * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return pairs.select(
        "exchange",
        "symbol_a",
        "symbol_b",
        "start",
        cnt.cast("long").alias("n_in_frame"),
        corr.alias(f"corr_{n}"),
    )


def returns_autocorr(
    candles: DataFrame, lag: int = 1, max_abs_return: float = 10.0
) -> DataFrame:
    """Lag-k autocorrelation of per-candle simple returns per
    (exchange, symbol) — the momentum/mean-reversion diagnostic
    (significantly negative at minute grain = microstructure bounce;
    positive = trending).

    Same float contract as ``returns_corr``: returns are 10-dp
    decimals over the filtered series (positive prices, |r| bounded),
    the lag pairs come from ONE extra window over the same
    (exchange, symbol) sort — no self-join — and Pearson runs in
    doubles over five decimal-exact moment sums."""
    ws = Window.partitionBy("exchange", "symbol").orderBy("start")
    prev = F.lag("close").over(ws)
    r = F.col("close") / prev - F.lit(1.0)
    rets = (
        candles.select(
            "exchange", "symbol", "start", prev.alias("prev"), "close",
            r.alias("r"),
        )
        .filter(
            (F.col("prev") > 0)
            & (F.col("close") > 0)
            & (F.abs("r") <= max_abs_return)
        )
        .select(
            "exchange",
            "symbol",
            "start",
            F.round("r", 10).cast("decimal(18,10)").alias("ret"),
        )
    )
    # pair r_t with r_{t-lag} over the SURVIVING return series (the
    # filtered frame defines the series, identically in the oracle)
    wr = Window.partitionBy("exchange", "symbol").orderBy("start")
    pairs = rets.select(
        "exchange",
        "symbol",
        F.col("ret").alias("x"),
        F.lag("ret", lag).over(wr).alias("y"),
    ).filter(F.col("y").isNotNull())
    agg = pairs.groupBy("exchange", "symbol").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n_obs").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (F.col("n_obs") >= 2) & (vx > 0) & (vy > 0),
        cov / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return agg.select(
        "exchange",
        "symbol",
        "n_obs",
        corr.alias(f"autocorr_{lag}"),
    ).orderBy("exchange", "symbol")
