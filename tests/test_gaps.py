from datetime import datetime

from trade_data_collection_service_spark.operators import (
    expected_grid,
    islands,
    missing_timestamps,
)
from trade_data_collection_service_spark.operators.gaps import refill_ranges


def _frame(spark, minutes):
    rows = [("E", "S", datetime(2024, 1, 1, 0, m)) for m in minutes]
    return spark.createDataFrame(rows, ["exchange", "symbol", "start"])


def test_expected_grid_bounds(spark):
    df = _frame(spark, [0, 5])
    grid = expected_grid(df)
    assert grid.count() == 6  # inclusive 0..5


def test_missing_single_and_runs(spark):
    # present: 0,1,4,5,9  -> missing: 2,3,6,7,8
    df = _frame(spark, [0, 1, 4, 5, 9])
    miss = sorted(r["start"].minute for r in missing_timestamps(df).collect())
    assert miss == [2, 3, 6, 7, 8]


def test_islands_edges(spark):
    # missing minutes: isolated single (2), adjacent run (6,7,8),
    # runs separated by exactly one step (11 vs 13).
    present = [0, 1, 3, 4, 5, 9, 10, 12, 14]
    df = _frame(spark, present)
    isl = islands(missing_timestamps(df))
    got = sorted(
        (r["gap_start"].minute, r["gap_end"].minute, r["n_missing"])
        for r in isl.collect()
    )
    assert got == [(2, 2, 1), (6, 8, 3), (11, 11, 1), (13, 13, 1)]


def test_islands_tolerance_merges_near_gaps(spark):
    # with tolerance 2 steps, missing 11 and 13 merge into one island
    present = [0, 1, 3, 4, 5, 9, 10, 12, 14]
    df = _frame(spark, present)
    isl = islands(missing_timestamps(df), tolerance_steps=2)
    got = sorted(
        (r["gap_start"].minute, r["gap_end"].minute, r["n_missing"])
        for r in isl.collect()
    )
    assert got == [(2, 2, 1), (6, 8, 3), (11, 13, 2)]


def test_refill_ranges_pad(spark):
    df = _frame(spark, [0, 1, 3])
    isl = islands(missing_timestamps(df))
    rr = refill_ranges(isl, pad_minutes=5).collect()
    assert len(rr) == 1
    assert rr[0]["fetch_start"] == datetime(2023, 12, 31, 23, 57)
    assert rr[0]["fetch_end"] == datetime(2024, 1, 1, 0, 7)


def test_no_gaps_no_islands(spark):
    df = _frame(spark, [0, 1, 2, 3])
    assert missing_timestamps(df).count() == 0
    assert islands(missing_timestamps(df)).count() == 0
