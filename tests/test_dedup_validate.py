from datetime import datetime

from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_with_invalid
from trade_data_collection_service_spark.operators import (
    dedup_latest,
    quarantine,
    validate,
)


def _mk(spark, rows):
    cols = [
        "exchange",
        "symbol",
        "interval",
        "start",
        "stop",
        "close_unixtime",
        "trades",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "timestamp",
        "receipt_timestamp",
    ]
    return spark.createDataFrame(rows, cols)


def _candle(sym="S", start_min=0, receipt_s=0, close=10.0):
    start = datetime(2024, 1, 1, 0, start_min)
    stop = datetime(2024, 1, 1, 0, start_min + 1)
    return (
        "E",
        sym,
        "1m",
        start,
        stop,
        1704067200 + 60 * (start_min + 1),
        3,
        9.0,
        11.0,
        8.0,
        close,
        100.0,
        stop,
        datetime(2024, 1, 1, 0, start_min + 1, receipt_s),
    )


def test_dedup_keeps_max_receipt(spark):
    df = _mk(
        spark,
        [
            _candle(start_min=0, receipt_s=0, close=10.0),
            _candle(start_min=0, receipt_s=30, close=20.0),  # later version wins
            _candle(start_min=0, receipt_s=15, close=15.0),
            _candle(start_min=1, receipt_s=0, close=11.0),
        ],
    )
    out = dedup_latest(df)
    assert out.count() == 2
    kept = {r["start"].minute: r["close"] for r in out.collect()}
    assert kept == {0: 20.0, 1: 11.0}


def test_dedup_idempotent(spark):
    df = _mk(spark, [_candle(start_min=m, receipt_s=s) for m in range(3) for s in (0, 5)])
    once = dedup_latest(df)
    twice = dedup_latest(once)
    assert once.count() == twice.count() == 3


def test_validate_splits_cleanly(spark, sf_dir):
    df = candles_with_invalid(spark, sf_dir)
    good, bad = validate(df), quarantine(df)
    assert good.count() + bad.count() == df.count()
    assert bad.count() > 0
    # Quarantined rows are exactly the corrupted variants (shifted starts).
    assert bad.filter(F.second("start") == 0).count() == 0
    assert good.filter(F.second("start") != 0).count() == 0


def test_validate_catches_nan_and_empty_keys(spark):
    base = _candle()
    rows = [
        base,
        ("E", "S", "1m", *base[3:6], 3, float("nan"), 11.0, 8.0, 10.0, 1.0, *base[12:]),
        ("", "S", "1m", *base[3:6], 3, 9.0, 11.0, 8.0, 10.0, 1.0, *base[12:]),
    ]
    df = _mk(spark, rows)
    assert validate(df).count() == 1
    assert quarantine(df).count() == 2
