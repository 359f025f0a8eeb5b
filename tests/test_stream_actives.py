"""Streaming active-users monitor: the register table maintained by
the foreachBatch merge must equal the batch registers over the same
delivered events — including under duplicated delivery (max-merge
idempotence needs NO raw-table recompute, unlike the counts table)
and across a restart."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.streaming.actives import (
    active_users_from_registers,
    daily_user_registers,
    fold_active_users,
    start_active_users_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_actives_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _regs_map(df):
    return {(r["day"], r["hll_idx"]): r["reg"] for r in df.collect()}


def test_stream_registers_equal_batch_under_duplicates(spark, dirs):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = os.path.join(dirs, "events_src")
    slices = [
        events.filter(F.col("event_id") % 3 == 1),
        events.filter(F.col("event_id") % 3 == 0),
        events.filter(
            (F.col("event_id") % 3 == 2) | (F.col("event_id") % 3 == 0)
        ),  # re-delivers slice 2's rows
    ]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)

    regs_path = os.path.join(dirs, "user_regs")
    ckpt = os.path.join(dirs, "ckpt")
    q = start_active_users_stream(spark, src, regs_path, ckpt)
    q.awaitTermination(120)

    # max-merge is idempotent: streamed registers equal the batch
    # registers whether or not the duplicate rows are deduped first
    delivered = spark.read.parquet(src)
    assert _regs_map(spark.read.parquet(regs_path)) == _regs_map(
        daily_user_registers(delivered)
    )
    assert _regs_map(spark.read.parquet(regs_path)) == _regs_map(
        daily_user_registers(delivered.dropDuplicates(["event_id"]))
    )

    # folded estimates match the shared batch fold bit-for-bit
    streamed = {
        r["day"]: (r["active_users_day"], r["active_users_roll"])
        for r in active_users_from_registers(spark, regs_path, 7).collect()
    }
    batch = {
        r["day"]: (r["active_users_day"], r["active_users_roll"])
        for r in fold_active_users(
            daily_user_registers(delivered), 7
        ).collect()
    }
    assert streamed == batch


def test_stream_actives_restart_appends_new_day(spark, dirs):
    # a 4th slice arrives after the first run finished: restarting
    # from the same checkpoint must fold it in without disturbing
    # already-merged registers
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    src = os.path.join(dirs, "events_src")
    events.filter(F.col("event_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    regs_path = os.path.join(dirs, "user_regs")
    ckpt = os.path.join(dirs, "ckpt")
    q = start_active_users_stream(spark, src, regs_path, ckpt)
    q.awaitTermination(120)

    assert _regs_map(spark.read.parquet(regs_path)) == _regs_map(
        daily_user_registers(spark.read.parquet(src))
    )


def test_rolling_estimate_tracks_exact_union(spark):
    # the rolling estimate must equal folding the union register set
    # (lossless HLL union): build it independently per report day
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    regs = daily_user_registers(events)
    out = fold_active_users(regs, 7).collect()
    days = sorted(r["day"] for r in out)
    by_day = {r["day"]: r for r in out}
    import datetime as dt

    for d in days[:3] + days[-3:]:
        lo = d - dt.timedelta(days=6)
        window_regs = (
            regs.filter((F.col("day") >= lo) & (F.col("day") <= d))
            .groupBy("hll_idx")
            .agg(F.max("reg").alias("reg"))
        )
        from trade_data_collection_service_spark.functions.sketch import (
            hll_fold,
        )

        expect = window_regs.withColumn("g", F.lit(1))
        got = hll_fold(expect, ["g"]).collect()[0]["hll_estimate"]
        assert by_day[d]["active_users_roll"] == got
