"""Transport-level streaming dedup: re-delivered identical rows are
dropped in flight; the appended sink holds exactly one row per candle
identity with no read-side dedup."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
from trade_data_collection_service_spark.streaming.transport_dedup import (
    start_transport_dedup_stream,
)

SF_DIR = "/root/testdata/sf0.001"
KEY = ["exchange", "symbol", "interval", "start"]


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="transport_dedup_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_redelivered_rows_dropped_in_flight(spark, dirs):
    candles = candles_from_events(spark, SF_DIR).select(
        *[f.name for f in CANDLE_SCHEMA.fields]
    )
    src = os.path.join(dirs, "src")
    # three deliveries: two disjoint slices, then a full re-delivery
    # of the first slice (the reconnect-replay scenario)
    s1 = candles.filter(F.col("trades") % 2 == 0)
    s2 = candles.filter(F.col("trades") % 2 == 1)
    for s in (s1, s2, s1):
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "out")
    ckpt = os.path.join(dirs, "ckpt")
    q = start_transport_dedup_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    assert q.exception() is None

    got = spark.read.parquet(out)
    n_expected = candles.count()
    assert got.count() == n_expected  # every duplicate dropped
    assert got.select(*KEY).distinct().count() == n_expected
    # content parity: same key set as the source's distinct identity
    assert (
        got.select(*KEY)
        .exceptAll(candles.select(*KEY))
        .count()
        == 0
    )
