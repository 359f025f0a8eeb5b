from datetime import datetime

from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators import backfill_plan
from trade_data_collection_service_spark.operators.backfill import earliest_starts


def test_plan_covers_range_without_overlap(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    start_date = "2023-12-25 00:00:00"
    plan = backfill_plan(c, start_date, 720, "2024-02-01 00:00:00").cache()
    earliest = {r["symbol"]: r["earliest_start"] for r in earliest_starts(c).collect()}
    rows = plan.collect()
    assert rows
    by_symbol = {}
    for r in rows:
        by_symbol.setdefault(r["symbol"], []).append(r)
    for sym, chunks in by_symbol.items():
        chunks.sort(key=lambda r: r["chunk_start"])
        # contiguous, non-overlapping, bounded by [start_date, earliest)
        assert chunks[0]["chunk_start"] == datetime(2023, 12, 25)
        for a, b in zip(chunks, chunks[1:]):
            assert a["chunk_end"] == b["chunk_start"]
        assert chunks[-1]["chunk_end"] == earliest[sym]
        # backward indexing: newest chunk has index 1
        assert min(c_["chunk_index"] for c_ in chunks) == 1
        assert chunks[-1]["chunk_index"] == 1


def test_plan_skips_covered_symbols(spark, sf_dir):
    c = candles_from_events(spark, sf_dir)
    # start_date after every symbol's earliest start -> nothing to do
    plan = backfill_plan(c, "2024-06-01 00:00:00", 720, "2024-06-02 00:00:00")
    assert plan.count() == 0


def test_plan_uses_safe_now_for_unknown_symbols(spark):
    empty = spark.createDataFrame(
        [("NEW", datetime(2024, 1, 10),)], ["symbol", "start"]
    ).filter(F.lit(False))
    # no stored data at all -> plan from safe_now backward
    plan = backfill_plan(
        empty.unionByName(
            spark.createDataFrame([("NEW", None)], empty.schema).filter(F.lit(False))
        ),
        "2024-01-01 00:00:00",
        1440,
        "2024-01-05 00:00:00",
    )
    assert plan.count() == 0  # no symbols at all -> empty plan
