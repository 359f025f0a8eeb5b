"""Native windowed-aggregation candle stream (append mode) must emit
exactly the batch-derived candles once the watermark closes every
window (replay + far-future sentinel)."""

import shutil
import tempfile

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import (
    candles_from_events,
    events_df,
)
from trade_data_collection_service_spark.streaming.candle_window import (
    stream_candles_windowed,
)


@pytest.fixture(scope="module")
def windowed_outputs(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="candle_window_test_")
    src, ckpt = f"{tmp}/src", f"{tmp}/ckpt"

    ev = events_df(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    parts = ev.withColumn(
        "third", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    for b in (1, 2, 3):
        parts.filter(F.col("third") == b).drop("third").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    # Sentinel advances the watermark past every real window's end.
    spark.createDataFrame(
        [(10**12, "2030-01-01 00:00:00", 0, "zz", 0.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_candles_windowed(stream)
        .writeStream.format("memory")
        .queryName("closed_candles")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]
    streamed = spark.sql(
        "SELECT * FROM closed_candles WHERE year(start) < 2030"
    ).collect()
    batch = candles_from_events(spark, sf_dir).collect()
    yield streamed, batch
    shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_stream_equals_batch_derivation(windowed_outputs):
    streamed, batch = windowed_outputs
    key = lambda r: (r["exchange"], r["symbol"], r["start"])  # noqa: E731
    got = {key(r): r.asDict() for r in streamed}
    want = {key(r): r.asDict() for r in batch}
    assert got.keys() == want.keys()
    assert len(got) > 100
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)


def test_windowed_stream_emits_closed_only(windowed_outputs):
    streamed, _ = windowed_outputs
    # the sentinel's own window can never close (nothing after it)
    assert all(r["start"].year < 2030 for r in streamed)
