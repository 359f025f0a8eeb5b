"""Streaming funnel parity: replaying events as event-time-ordered
micro-batches must reach, per user, exactly the batch
window_funnel level — progression rows emit once per level."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import events_df
from trade_data_collection_service_spark.ext.pipeline import window_funnel
from trade_data_collection_service_spark.streaming.funnel import funnel_stream

N_USERS = 6


@pytest.fixture(scope="module")
def funnel_outputs(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="funnel_stream_test_")
    src = f"{tmp}/src"
    ckpt = f"{tmp}/ckpt"

    ev = (
        events_df(spark, sf_dir)
        .filter(F.col("user_id") < N_USERS)
        .select("event_id", "ts", "user_id", "event_type")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
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

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_progress")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, str(q.exception())[:3000]

    streamed = spark.sql("SELECT * FROM funnel_progress").collect()
    batch = window_funnel(ev).collect()
    yield streamed, batch
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_funnel_levels_match_batch(funnel_outputs):
    streamed, batch = funnel_outputs
    got = {}
    for r in streamed:
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["funnel_level"])
    want = {r["user_id"]: r["funnel_level"] for r in batch if r["funnel_level"] > 0}
    assert got, "no progression rows emitted"
    assert got == want


def test_stream_funnel_one_row_per_level(funnel_outputs):
    streamed, _ = funnel_outputs
    seen = set()
    for r in streamed:
        key = (r["user_id"], r["funnel_level"])
        assert key not in seen, "level re-emitted"
        seen.add(key)


def test_funnel_rates_hand_built(spark):
    import datetime as dt

    from trade_data_collection_service_spark.ext.pipeline import funnel_rates

    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def ev(i, u, typ, minute):
        return (i, t0 + dt.timedelta(minutes=minute), u, typ, 1.0)

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        ev(4, 2, "view", 0), ev(5, 2, "click", 5),
        ev(6, 3, "view", 0),
        ev(7, 4, "click", 0),  # no view: level 0, excluded entirely
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["level"]: r for r in funnel_rates(df).collect()}
    assert [out[k]["n_users"] for k in (1, 2, 3)] == [3, 2, 1]
    assert out[1]["conversion_from_start"] == 1.0
    assert abs(out[2]["conversion_from_start"] - 2 / 3) < 1e-12
    assert abs(out[3]["conversion_from_start"] - 1 / 3) < 1e-12
    assert out[1]["step_conversion"] is None
    assert abs(out[2]["step_conversion"] - 2 / 3) < 1e-12
    assert out[3]["step_conversion"] == 0.5
