from datetime import datetime

import pytest

from trade_data_collection_service_spark.operators.resample import (
    gap_filled,
    gap_filled_ffill,
    rollup_tf,
)


def _frame(spark, minutes_close):
    rows = [
        ("E", "S", datetime(2024, 1, 1, 0, m), 1.0, float(c), 0.5, float(c), 1.0, 1)
        for m, c in minutes_close
    ]
    return spark.createDataFrame(
        rows,
        ["exchange", "symbol", "start", "open", "high", "low", "close", "volume", "trades"],
    )


def test_gap_filled_marks_holes(spark):
    df = _frame(spark, [(0, 10), (1, 11), (4, 14)])
    out = {r["start"].minute: r for r in gap_filled(df).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert not out[0]["is_gap"] and out[0]["close"] == 10.0
    assert out[2]["is_gap"] and out[2]["close"] is None
    assert out[3]["is_gap"]
    assert not out[4]["is_gap"]


def test_ffill_carries_last_close(spark):
    df = _frame(spark, [(0, 10), (1, 11), (4, 14)])
    out = {r["start"].minute: r["close_ffill"] for r in gap_filled_ffill(df).collect()}
    assert out == {0: 10.0, 1: 11.0, 2: 11.0, 3: 11.0, 4: 14.0}


def test_rollup_tf_grammar(spark):
    df = _frame(spark, [(0, 10), (7, 11)])
    r5 = rollup_tf(df, "5m")
    assert r5.count() == 2
    r1h = rollup_tf(df, "1h")
    assert r1h.count() == 1
    with pytest.raises(ValueError):
        rollup_tf(df, "30s")
    with pytest.raises(ValueError):
        rollup_tf(df, "bogus")


def test_volume_bars_partition_totals(spark, sf_dir):
    """Bars partition each symbol's candles: ids contiguous from 0,
    volumes add up to the symbol total, bar_start strictly increases."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.operators.resample import volume_bars

    c = candles_from_events(spark, sf_dir)
    bars = volume_bars(c, 500.0).collect()
    by_key = defaultdict(list)
    for r in bars:
        by_key[(r["exchange"], r["symbol"])].append(r)
    totals = {
        (r["exchange"], r["symbol"]): (r["tv"], r["n"])
        for r in c.groupBy("exchange", "symbol")
        .agg(
            F.sum(F.round("volume", 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("tv"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert by_key.keys() == totals.keys()
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["bar_id"])
        assert [r["bar_id"] for r in rows] == list(range(len(rows)))
        assert abs(sum(r["volume"] for r in rows) - totals[k][0]) < 1e-6
        assert sum(r["n_candles"] for r in rows) == totals[k][1]
        starts = [r["bar_start"] for r in rows]
        assert starts == sorted(starts)


def test_interp_linear_between_brackets(spark):
    from trade_data_collection_service_spark.operators.resample import (
        gap_filled_interp,
    )

    df = _frame(spark, [(0, 10), (1, 11), (4, 14)])
    out = {
        r["start"].minute: r["close_interp"]
        for r in gap_filled_interp(df).collect()
    }
    # minutes 2 and 3 interpolate linearly between 11 (@1) and 14 (@4)
    assert out == {0: 10.0, 1: 11.0, 2: 12.0, 3: 13.0, 4: 14.0}


def test_interp_edge_gaps_degrade_to_nearest(spark):
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.operators.resample import (
        gap_filled_interp,
    )

    # grid spans observed bounds only, so edges are observed by
    # construction; emulate a leading gap by filtering the first
    # observation out after grid construction is NOT possible here —
    # instead verify observed rows pass through untouched.
    df = _frame(spark, [(0, 10), (3, 13)])
    rows = gap_filled_interp(df).collect()
    observed = [r for r in rows if not r["is_gap"]]
    assert all(r["close_interp"] == r["close"] for r in observed)
    assert (
        gap_filled_interp(df)
        .filter(F.col("close_interp").isNull())
        .count()
        == 0
    )
