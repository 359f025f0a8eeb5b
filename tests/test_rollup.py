"""Rollup + cascade correctness (SURVEY.md §5 item 2).

The load-bearing invariant: cascading 1m→5m→15m→...→1d gives exactly
the same result as aggregating raw 1m straight to any level — this is
what the reference's divisibility check protects
(clickhouse_schema.py:98-99), and what the open_time/close_time arg
payloads (SURVEY.md §1.4) exist to make true.
"""

from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators import cascade, rollup_raw
from trade_data_collection_service_spark.operators.dedup import dedup_latest


def _sorted_pdf(df):
    cols = sorted(df.columns)
    return (
        df.select(*cols).orderBy(*cols).toPandas()
    )


def assert_df_equal(a, b):
    pa, pb = _sorted_pdf(a), _sorted_pdf(b)
    assert pa.shape == pb.shape
    assert (pa.values == pb.values).all(), (pa.compare(pb) if pa.shape == pb.shape else "shape")


def test_cascade_equals_direct(spark, sf_dir):
    c = dedup_latest(candles_from_events(spark, sf_dir))
    levels = cascade(c, [1, 5, 15, 30, 60])
    for m in (15, 30, 60):
        assert_df_equal(levels[m], rollup_raw(c, m))


def test_rollup_brute_force(spark, sf_dir):
    """5m rollup vs an independent recompute through raw events order."""
    c = dedup_latest(candles_from_events(spark, sf_dir))
    r = rollup_raw(c, 5)
    # Independent check for one bucket picked deterministically.
    row = r.orderBy("exchange", "symbol", "candle_start").limit(1).collect()[0]
    members = c.filter(
        (F.col("exchange") == row["exchange"])
        & (F.col("symbol") == row["symbol"])
        & (F.col("start") >= row["candle_start"])
        & (F.col("start") < F.lit(row["candle_start"]) + F.expr("INTERVAL 5 MINUTES"))
    ).orderBy("start").collect()
    assert members, "bucket must have members"
    assert row["open"] == members[0]["open"]
    assert row["close"] == members[-1]["close"]
    assert row["high"] == max(m["high"] for m in members)
    assert row["low"] == min(m["low"] for m in members)
    assert row["trades"] == sum(m["trades"] for m in members)
    assert abs(row["volume"] - sum(m["volume"] for m in members)) < 1e-6
    assert row["open_time"] == members[0]["start"]
    assert row["close_time"] == members[-1]["start"]


def test_rollup_bucket_alignment(spark, sf_dir):
    """Buckets are epoch-aligned (toStartOfInterval semantics) for
    every cascade level incl. 2h/4h/1d (SURVEY.md §7 risk item)."""
    c = dedup_latest(candles_from_events(spark, sf_dir))
    levels = cascade(c)
    for m, df in levels.items():
        misaligned = df.filter(F.unix_timestamp("candle_start") % (m * 60) != 0)
        assert misaligned.count() == 0, f"level {m}m not epoch-aligned"
