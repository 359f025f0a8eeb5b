"""Streaming volume bars (applyInPandasWithState) parity with the
batch operator: replay candles as event-time-ordered micro-batches
plus a far-future flush sentinel; every real bar closes (by budget or
flush timeout) and must equal operators/resample.volume_bars row for
row — including each key's trailing partial bar."""

import shutil
import tempfile

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.resample import volume_bars
from trade_data_collection_service_spark.streaming.volume_bars import (
    stream_volume_bars,
)

BAR_VOLUME = 500.0


@pytest.fixture(scope="module")
def bar_outputs(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="stream_bars_test_")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"

    c = candles_from_events(spark, sf_dir)

    parts = c.withColumn(
        "third", F.ntile(3).over(W.orderBy("start", "exchange", "symbol"))
    )
    for b in (1, 2, 3):
        parts.filter(F.col("third") == b).drop("third").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # Far-future sentinel under a FAKE key: any sentinel in a real
    # key's group would join that key's open bar (bars are assigned by
    # cumulative START offset, so extra rows always extend the tail).
    # Under its own key it only advances the GLOBAL watermark, firing
    # every real key's flush timeout with state untouched.
    sentinel = spark.createDataFrame(
        [("__WM__", "X", "2030-01-01 00:00:00", 0.0, 0.0, 0.0, 0.0, 0.0)],
        "exchange string, symbol string, start string, open double, high double, low double, close double, volume double",
    ).withColumn("start", F.col("start").cast("timestamp"))
    for col in set(c.columns) - set(sentinel.columns):
        sentinel = sentinel.withColumn(col, F.lit(None).cast(dict(c.dtypes)[col]))
    sentinel.select(c.columns).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(c.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_volume_bars(stream, BAR_VOLUME, flush_minutes=60)
        .writeStream.format("memory")
        .queryName("closed_bars")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]
    streamed = spark.sql(
        "SELECT * FROM closed_bars WHERE exchange != '__WM__'"
    ).collect()
    batch = volume_bars(c, BAR_VOLUME).collect()
    yield streamed, batch
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_bars_match_batch(bar_outputs):
    streamed, batch = bar_outputs
    key = lambda r: (r["exchange"], r["symbol"], r["bar_id"])  # noqa: E731
    got = {key(r): r.asDict() for r in streamed}
    want = {
        key(r): {k: v for k, v in r.asDict().items()}
        for r in batch
    }
    assert len(want) > 50
    assert got.keys() == want.keys()
    for k, w in want.items():
        g = got[k]
        for col in ("bar_start", "open", "high", "low", "close", "n_candles"):
            assert g[col] == w[col], (k, col, g[col], w[col])
        assert abs(g["volume"] - w["volume"]) < 1e-9, (k, g["volume"], w["volume"])
