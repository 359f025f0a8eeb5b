"""Streaming sessionization (applyInPandasWithState) parity with the
batch operator: replay events as event-time-ordered micro-batches plus
a far-future flush sentinel; every real session closes (by gap or by
watermark timeout) and must equal ext/pipeline.sessionize's output."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import events_df
from trade_data_collection_service_spark.ext.pipeline import sessionize
from trade_data_collection_service_spark.streaming.stateful import (
    sessionize_stream,
)

GAP_MIN = 30
N_USERS = 4


@pytest.fixture(scope="module")
def session_outputs(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="stateful_test_")
    src = f"{tmp}/src"
    ckpt = f"{tmp}/ckpt"

    ev = (
        events_df(spark, sf_dir)
        .filter(F.col("user_id") < N_USERS)
        .select("event_id", "ts", "user_id", "value")
    )
    # Sentinel far past every real session's horizon: advances the
    # watermark so all real sessions time out and emit; its own
    # session stays open in state and is simply never emitted.
    sentinel = ev.sparkSession.createDataFrame(
        [(10**12, None, u, 0.0) for u in range(N_USERS)],
        "event_id long, ts timestamp, user_id long, value double",
    ).withColumn("ts", F.lit("2030-01-01 00:00:00").cast("timestamp"))

    # Three event-time-ordered micro-batches (file source reads files
    # in order of modification; write thirds sequentially).
    parts = ev.withColumn(
        "third",
        F.ntile(3).over(
            __import__("pyspark").sql.Window.orderBy("ts", "event_id")
        ),
    )
    for b in (1, 2, 3):
        parts.filter(F.col("third") == b).drop("third").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]

    streamed = spark.sql("SELECT * FROM closed_sessions").collect()
    batch = sessionize(ev, gap_minutes=GAP_MIN).collect()
    yield streamed, batch
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_sessions_match_batch(session_outputs):
    streamed, batch = session_outputs
    got = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["total_cents"],
        )
        for r in streamed
    }
    want = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            int(round(r["total_value"] * 100)),
        )
        for r in batch
    }
    assert got, "no sessions emitted"
    assert got == want


def test_stream_sessions_watermark_closed_tail(session_outputs):
    streamed, _ = session_outputs
    # The sentinel's own session (start year 2030) must NOT be emitted.
    assert all(r["session_start"].year < 2030 for r in streamed)
