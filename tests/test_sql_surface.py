import pytest

from trade_data_collection_service_spark.sql import register_views


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    return spark, register_views(spark, sf_dir, minutes=[1, 5, 15])


def test_view_names(views):
    _, names = views
    for expected in ("candles_raw", "candles_final", "candles_1m", "candles_15m",
                     "lineitem", "events", "documents"):
        assert expected in names


def test_readme_query_via_sql(views):
    # The reference's README ad-hoc query shape (README.md:56-68).
    spark, _ = views
    rows = spark.sql(
        """
        SELECT symbol, start, close FROM candles_final
        WHERE symbol IN ('SYM0', 'SYM1')
          AND start >= (SELECT max(start) FROM candles_final) - INTERVAL 6 HOURS
        ORDER BY symbol, start
        """
    ).collect()
    assert rows
    assert all(r["symbol"] in ("SYM0", "SYM1") for r in rows)


def test_rollup_read_via_sql(views):
    # The notebook's finalized-rollup read (ohlcv_views.ipynb cell 2):
    # with finalized storage the *Merge GROUP BY collapses to SELECT.
    spark, _ = views
    rows = spark.sql(
        """
        SELECT exchange, symbol, candle_start, open, high, low, close, volume
        FROM candles_15m
        WHERE exchange = 'EXCH_A' AND symbol = 'SYM0'
        ORDER BY candle_start DESC LIMIT 200
        """
    ).collect()
    assert rows
    assert all(r["low"] <= r["high"] for r in rows)


def test_final_vs_raw_semantics(views):
    spark, _ = views
    n_raw, n_final = spark.sql(
        "SELECT (SELECT count(*) FROM candles_raw) AS a,"
        " (SELECT count(*) FROM candles_final) AS b"
    ).collect()[0]
    assert n_final <= n_raw
    dup_keys = spark.sql(
        """
        SELECT count(*) AS n FROM (
          SELECT exchange, symbol, start, interval FROM candles_final
          GROUP BY 1, 2, 3, 4 HAVING count(*) > 1
        )
        """
    ).collect()[0]["n"]
    assert dup_keys == 0
