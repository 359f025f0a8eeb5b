"""Native session_window streaming parity: replaying events as
event-time-ordered micro-batches plus a far-future flush sentinel
must reproduce ext/pipeline.sessionize_native's batch output exactly
(same aggregation operator, watermark-closed emission)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import events_df
from trade_data_collection_service_spark.ext.pipeline import sessionize_native
from trade_data_collection_service_spark.streaming.native_sessions import (
    sessionize_native_stream,
)

GAP_MIN = 30
N_USERS = 4


@pytest.fixture(scope="module")
def native_session_outputs(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="native_sess_test_")
    src = f"{tmp}/src"
    ckpt = f"{tmp}/ckpt"

    ev = (
        events_df(spark, sf_dir)
        .filter(F.col("user_id") < N_USERS)
        .select("event_id", "ts", "user_id", "value")
    )
    sentinel = ev.sparkSession.createDataFrame(
        [(10**12, None, u, 0.0) for u in range(N_USERS)],
        "event_id long, ts timestamp, user_id long, value double",
    ).withColumn("ts", F.lit("2030-01-01 00:00:00").cast("timestamp"))

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
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_native_stream(stream, gap_minutes=GAP_MIN)
        .writeStream.format("memory")
        .queryName("native_closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]

    streamed = spark.sql("SELECT * FROM native_closed_sessions").collect()
    batch = sessionize_native(ev, gap_minutes=GAP_MIN).collect()
    yield streamed, batch
    shutil.rmtree(tmp, ignore_errors=True)


def test_native_stream_sessions_match_batch(native_session_outputs):
    streamed, batch = native_session_outputs
    key = lambda r: (  # noqa: E731
        r["user_id"],
        r["session_start"],
        r["session_end"],
        r["n_events"],
        round(r["total_value"], 4),
    )
    got = {key(r) for r in streamed}
    want = {key(r) for r in batch}
    assert got, "no sessions emitted"
    assert got == want


def test_native_stream_sentinel_not_emitted(native_session_outputs):
    streamed, _ = native_session_outputs
    assert all(r["session_start"].year < 2030 for r in streamed)
