from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import (
    candles_from_events,
    candles_with_duplicates,
    candles_with_invalid,
)


def test_candles_shape_and_invariants(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    bad = c.filter(
        (F.col("low") > F.least("open", "close"))
        | (F.col("high") < F.greatest("open", "close"))
        | (F.col("low") > F.col("high"))
        | (F.col("close_unixtime") <= 0)
    )
    assert c.count() > 0
    assert bad.count() == 0
    # stop is exactly start + 1 minute
    off = c.filter(
        F.unix_timestamp("stop") - F.unix_timestamp("start") != 60
    )
    assert off.count() == 0


def test_candles_key_unique(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    keys = ["exchange", "symbol", "start", "interval"]
    assert c.count() == c.select(*keys).distinct().count()


def test_duplicates_injected(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    d = candles_with_duplicates(spark, sf_dir)
    assert d.count() > c.count()
    keys = ["exchange", "symbol", "start", "interval"]
    assert d.select(*keys).distinct().count() == c.count()


def test_invalid_injected(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    i = candles_with_invalid(spark, sf_dir)
    assert i.count() > c.count()
