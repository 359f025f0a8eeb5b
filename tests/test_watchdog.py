"""Composed watchdog job (VERDICT r1 item 5) — the reference's main
loop (data_quality_check.py:672-697) as one Spark pass: freshness →
gap detect → refill → rollup recompute → verify.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.watchdog import (
    rest_refill,
    table_refill,
    verify_rollup,
    watchdog_cycle,
)
from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
from trade_data_collection_service_spark.sources.rest import deterministic_fetcher

def _lost():
    return (
        (F.col("symbol") == "SYM3")
        & (F.col("start") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("start") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    )


def test_watchdog_cycle_restores_injected_gap(spark, sf_dir):
    clean = candles_from_events(spark, sf_dir)
    lost = _lost()
    corrupted = clean.filter(~lost)
    n_lost = clean.filter(lost).count()
    assert n_lost > 0, "fixture must have SYM3 rows in the window"

    report = watchdog_cycle(corrupted, table_refill(clean), rollup_minutes=5)

    # refill recovered at least the deleted rows (pad may refetch
    # rows that already existed — idempotent under dedup)
    assert clean.filter(lost).exceptAll(report.refill).count() == 0
    # repaired raw table == clean table
    assert report.repaired_raw.exceptAll(clean).count() == 0
    assert clean.exceptAll(report.repaired_raw).count() == 0
    # verify: every key consistent after repair
    assert all(r["ok"] for r in report.verify.collect())
    # the freshness report covers every symbol
    assert report.freshness.count() == clean.select("symbol").distinct().count()


def test_verify_rollup_flags_inconsistency(spark, sf_dir):
    from trade_data_collection_service_spark.operators.rollup import rollup_raw

    clean = candles_from_events(spark, sf_dir)
    rollup = rollup_raw(clean, 5)
    # drop one symbol's rollup rows -> that key must flag not-ok
    broken = rollup.filter(F.col("symbol") != "SYM1")
    flags = {
        (r["exchange"], r["symbol"]): r["ok"]
        for r in verify_rollup(broken, clean, 5).collect()
    }
    assert not flags[("EXCH_A", "SYM1")]
    assert flags[("EXCH_A", "SYM0")]


def test_watchdog_rest_refill_transport(spark):
    # truth = what the mock exchange serves; our table lost an
    # interior window -> the REST transport (mapInPandas fetch stage)
    # must close it
    fetch = deterministic_fetcher()
    truth_pdf = pd.concat(
        [
            fetch("BTC-USDT", pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 02:00")),
            fetch("ETH-USDT", pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 01:00")),
        ]
    )
    truth = spark.createDataFrame(truth_pdf, CANDLE_SCHEMA)
    hole = (
        (F.col("symbol") == "BTC-USDT")
        & (F.col("start") >= F.lit("2024-01-01 00:30:00").cast("timestamp"))
        & (F.col("start") < F.lit("2024-01-01 01:10:00").cast("timestamp"))
    )
    corrupted = truth.filter(~hole)

    report = watchdog_cycle(
        corrupted, rest_refill(fetch, max_parallel=2), rollup_minutes=5
    )
    assert report.repaired_raw.exceptAll(truth).count() == 0
    assert truth.exceptAll(report.repaired_raw).count() == 0
    assert all(r["ok"] for r in report.verify.collect())
