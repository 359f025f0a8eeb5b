"""Pluggable row sinks (VERDICT r1 item 6): the same stream +
checkpoint-restart scenario must converge on BOTH the parquet sink
(append + dedup-on-read) and the JDBC-like upsert sink — the
ClickHouse-shaped external-database writer (data_collector.py:194-283).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_with_duplicates
from trade_data_collection_service_spark.operators import cascade, dedup_latest
from trade_data_collection_service_spark.schema import CANDLE_SCHEMA
from trade_data_collection_service_spark.streaming.pipeline import (
    read_rollup_level,
    rollup_paths,
    start_candle_stream,
)
from trade_data_collection_service_spark.streaming.sinks import (
    ParquetCandleWriter,
    SqlUpsertCandleWriter,
)

LEVELS = [1, 5]


@pytest.mark.parametrize("kind", ["parquet", "sql_upsert"])
def test_stream_restart_converges_on_both_sinks(spark, sf_dir, kind):
    tmp = tempfile.mkdtemp(prefix=f"sink_{kind}_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    writer = (
        ParquetCandleWriter(out)
        if kind == "parquet"
        else SqlUpsertCandleWriter(os.path.join(tmp, "sink.db"))
    )
    try:
        candles = candles_with_duplicates(spark, sf_dir).select(
            *[f.name for f in CANDLE_SCHEMA.fields]
        )
        parts = [
            candles.filter(
                ((F.unix_timestamp("receipt_timestamp") / 3).cast("long") + F.col("trades")) % 3 == b
            )
            for b in range(3)
        ]
        # phase 1: two batches
        for p in parts[:2]:
            p.coalesce(1).write.mode("append").parquet(src)
        q = start_candle_stream(
            spark, src, out, ckpt, minutes=LEVELS, writer=writer
        )
        q.awaitTermination(300)
        assert q.exception() is None, str(q.exception())[:2000]

        # phase 2: "restart" — same checkpoint, one more file (holds
        # dup versions of rows already written -> upserts must win or
        # no-op correctly)
        parts[2].coalesce(1).write.mode("append").parquet(src)
        q = start_candle_stream(
            spark, src, out, ckpt, minutes=LEVELS, writer=writer
        )
        q.awaitTermination(300)
        assert q.exception() is None, str(q.exception())[:2000]

        stored = dedup_latest(writer.read_raw(spark))
        expected = dedup_latest(candles)
        assert stored.count() == expected.count()
        assert stored.exceptAll(expected).count() == 0
        assert expected.exceptAll(stored).count() == 0

        # phase 3: replay with no new data -> tables unchanged
        q = start_candle_stream(
            spark, src, out, ckpt, minutes=LEVELS, writer=writer
        )
        q.awaitTermination(300)
        assert q.exception() is None
        again = dedup_latest(writer.read_raw(spark))
        assert again.count() == expected.count()
        assert again.exceptAll(expected).count() == 0

        # rollups converge regardless of sink
        for level in LEVELS:
            got = read_rollup_level(spark, rollup_paths(out)[level])
            exp = cascade(expected, LEVELS)[level]
            assert got.count() == exp.count()
            assert got.exceptAll(exp).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
