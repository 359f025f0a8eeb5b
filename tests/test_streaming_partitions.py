"""Partition-aligned incremental rollup upsert (VERDICT r1 item 1).

A micro-batch that touches only one month must rewrite ONLY that
month's partition directories in every rollup level — untouched
months' files stay byte-identical (same paths, sizes, mtimes).  This
is the O(touched partitions) I/O contract that replaces round 1's
full-table rewrite, mirroring the reference's targeted window rewrite
(data_quality_check.py:414-431).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

from trade_data_collection_service_spark.operators import cascade, dedup_latest
from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
from trade_data_collection_service_spark.streaming.pipeline import (
    read_rollup_level,
    rollup_paths,
    table_exists,
    upsert_rollup_levels,
)

LEVELS = [1, 5, 1440]
UTC = dt.timezone.utc


def _candle(sym: str, start: dt.datetime, price: float, version: int = 0):
    return (
        "binance",
        sym,
        "1m",
        start,
        start + dt.timedelta(minutes=1),
        int((start + dt.timedelta(minutes=1)).timestamp()),
        10 + version,
        price,
        price + 1.0,
        price - 1.0,
        price + 0.5,
        100.0 + version,
        start + dt.timedelta(minutes=1),
        start + dt.timedelta(minutes=1, seconds=version),
    )


def _snapshot(base: str) -> dict[str, tuple[int, float]]:
    """{relative file path: (size, mtime)} for every data file under base."""
    out = {}
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, base)] = (st.st_size, st.st_mtime)
    return out


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_part_test_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_only_touched_month_partitions_rewritten(spark, dirs):
    raw_path = os.path.join(dirs, "candles_raw")
    jan = dt.datetime(2024, 1, 10, 12, 0, tzinfo=UTC)
    feb = dt.datetime(2024, 2, 20, 9, 30, tzinfo=UTC)

    batch1 = spark.createDataFrame(
        [
            _candle("BTC-USDT", jan + dt.timedelta(minutes=i), 100.0 + i)
            for i in range(30)
        ]
        + [
            _candle("BTC-USDT", feb + dt.timedelta(minutes=i), 200.0 + i)
            for i in range(30)
        ]
        + [
            _candle("ETH-USDT", jan + dt.timedelta(minutes=i), 50.0 + i)
            for i in range(10)
        ],
        CANDLE_SCHEMA,
    )
    batch1.write.mode("append").parquet(raw_path)
    upsert_rollup_levels(spark, raw_path, batch1, dirs, LEVELS)

    paths = rollup_paths(dirs)
    for m in LEVELS:
        listing = os.listdir(paths[m])
        assert any(d.startswith("month=") for d in listing), listing
    before = {m: _snapshot(paths[m]) for m in LEVELS}

    # Batch 2 touches ONLY February (a late revision of one Feb candle
    # plus a brand-new Feb candle).
    batch2 = spark.createDataFrame(
        [
            _candle("BTC-USDT", feb + dt.timedelta(minutes=5), 999.0, version=7),
            _candle("BTC-USDT", feb + dt.timedelta(minutes=60), 300.0),
        ],
        CANDLE_SCHEMA,
    )
    batch2.write.mode("append").parquet(raw_path)
    upsert_rollup_levels(spark, raw_path, batch2, dirs, LEVELS)

    for m in LEVELS:
        after = _snapshot(paths[m])
        jan_before = {k: v for k, v in before[m].items() if "month=202401" in k}
        jan_after = {k: v for k, v in after.items() if "month=202401" in k}
        assert jan_after == jan_before, f"level {m}: untouched month rewritten"
        feb_before = {k: v for k, v in before[m].items() if "month=202402" in k}
        feb_after = {k: v for k, v in after.items() if "month=202402" in k}
        assert feb_after != feb_before, f"level {m}: touched month not rewritten"
        # no leftover stage dirs
        assert not table_exists(spark, paths[m] + ".stage")

    # End state equals the batch cascade over the deduped raw table.
    expected = cascade(dedup_latest(spark.read.parquet(raw_path)), LEVELS)
    for m in LEVELS:
        stored = read_rollup_level(spark, paths[m])
        assert stored.count() == expected[m].count()
        assert stored.exceptAll(expected[m]).count() == 0
        assert expected[m].exceptAll(stored).count() == 0
