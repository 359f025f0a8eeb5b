"""Streaming EMA feed: an in-order replay must publish the same 4-dp
values as the batch distributed scan (operators/ema.py::ema) — the
O(1)-state sequential recurrence vs the blocked window-algebra scan,
agreeing through the published decimal contract."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.candles import candles_from_events
from trade_data_collection_service_spark.operators.ema import ema
from trade_data_collection_service_spark.streaming.ema import ema_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    tmp = tempfile.mkdtemp(prefix="stream_ema_")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_stream_ema_matches_batch(spark, dirs):
    candles = candles_from_events(spark, SF_DIR).select(
        "exchange", "symbol", "start", "close"
    )
    src = os.path.join(dirs, "src")
    # three event-time-ordered micro-batch slices
    days = sorted(
        r["d"]
        for r in candles.select(F.date_trunc("day", "start").alias("d"))
        .distinct()
        .collect()
    )
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    slices = [
        candles.filter(F.col("start") < cuts[0]),
        candles.filter(
            (F.col("start") >= cuts[0]) & (F.col("start") < cuts[1])
        ),
        candles.filter(F.col("start") >= cuts[1]),
    ]
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "out")
    ckpt = os.path.join(dirs, "ckpt")
    q = ema_stream(spark, src, out, ckpt, n=20)
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        (r["exchange"], r["symbol"], r["start"]): (r["ema"], r["t"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["exchange"], r["symbol"], r["start"]): r["ema_20"]
        for r in ema(candles_from_events(spark, SF_DIR), 20).collect()
    }
    assert set(got) == set(want)
    # published 4-dp values agree except where the ~1e-12 blocked-scan
    # drift lands exactly on a 4-dp rounding tie (at most one step)
    off = 0
    for k, (g, _) in got.items():
        if abs(g - want[k]) > 1e-9:
            assert abs(g - want[k]) <= 1.0001e-4
            off += 1
    assert off <= 2
    # t counts are per-key dense 1..len
    by_key: dict = {}
    for (e, s, st), (_, t) in got.items():
        by_key.setdefault((e, s), []).append((st, t))
    for pairs in by_key.values():
        ts = [t for _, t in sorted(pairs)]
        assert ts == list(range(1, len(ts) + 1))


def test_stream_macd_matches_batch(spark, dirs):
    from trade_data_collection_service_spark.operators.ema import macd
    from trade_data_collection_service_spark.streaming.ema import macd_stream

    candles = candles_from_events(spark, SF_DIR).select(
        "exchange", "symbol", "start", "close"
    )
    src = os.path.join(dirs, "msrc")
    days = sorted(
        r["d"]
        for r in candles.select(F.date_trunc("day", "start").alias("d"))
        .distinct()
        .collect()
    )
    cut = days[len(days) // 2]
    for s in (
        candles.filter(F.col("start") < cut),
        candles.filter(F.col("start") >= cut),
    ):
        s.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "mout")
    ckpt = os.path.join(dirs, "mckpt")
    q = macd_stream(spark, src, out, ckpt)
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        (r["exchange"], r["symbol"], r["start"]): (
            r["macd"], r["macd_signal"], r["macd_hist"],
        )
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["exchange"], r["symbol"], r["start"]): (
            r["macd"], r["macd_signal"], r["macd_hist"],
        )
        for r in macd(candles_from_events(spark, SF_DIR)).collect()
    }
    assert set(got) == set(want)
    off = 0
    for k, g in got.items():
        for a, b in zip(g, want[k]):
            if abs(a - b) > 1e-9:
                # blocked-scan drift on an exact 4-dp tie: one step max
                assert abs(a - b) <= 1.0001e-4
                off += 1
    assert off <= 3


def test_stream_ema_drops_cross_batch_late_rows(spark, dirs):
    """r7 hardening (VERDICT r6 #4): a candle arriving in a LATER
    micro-batch with a start at or before the newest folded start is
    dropped and counted — never folded as a new observation — so the
    published series equals the batch scan over the in-order rows and
    the feed's ``dropped`` counter is nonzero."""
    from datetime import datetime

    rows = [
        ("X", "AAA", datetime(2024, 1, 1, 0, m), 100.0 + m)
        for m in range(6)
    ]
    in_order = spark.createDataFrame(
        rows, "exchange string, symbol string, start timestamp, close double"
    )
    src = os.path.join(dirs, "late_src")
    # batch 1: first four candles (in order)
    in_order.filter(F.col("close") < 104).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # batch 2: a LATE duplicate of minute 1 (revised close) + a late
    # minute-2 revision + the two genuinely new candles
    late = spark.createDataFrame(
        [
            ("X", "AAA", datetime(2024, 1, 1, 0, 1), 999.0),
            ("X", "AAA", datetime(2024, 1, 1, 0, 2), 888.0),
            rows[4],
            rows[5],
        ],
        "exchange string, symbol string, start timestamp, close double",
    )
    late.coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "late_out")
    ckpt = os.path.join(dirs, "late_ckpt")
    q = ema_stream(spark, src, out, ckpt, n=20)
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        r["start"]: (r["close"], r["ema"], r["t"], r["dropped"])
        for r in spark.read.parquet(out).collect()
    }
    # cross-batch late rows are DROPPED, never counted as revisions
    assert all(
        r["replaced"] == 0 for r in spark.read.parquet(out).collect()
    )
    # exactly the six in-order candles emitted, none folded twice
    assert len(got) == 6
    want = {
        r["start"]: r["ema_20"]
        for r in ema(in_order, 20).collect()
    }
    for st, (close, e, _, _) in got.items():
        assert close != 999.0 and close != 888.0
        assert abs(e - want[st]) <= 1.0001e-4
    # t stays dense 1..6 (late rows never incremented it)
    assert sorted(t for _, _, t, _ in got.values()) == list(range(1, 7))
    # the two late rows were counted on the rows emitted after them
    assert got[datetime(2024, 1, 1, 0, 5)][3] == 2
    assert got[datetime(2024, 1, 1, 0, 0)][3] == 0


def test_stream_ema_same_batch_revision_last_write_wins(spark, dirs):
    """A duplicate start WITHIN one micro-batch is a revision: the
    later arrival replaces the earlier one before folding (the same
    last-write-wins contract as the indicator/Donchian buffers).
    It increments ``replaced`` ONLY — ``dropped`` stays 0, so the
    queryable loss rate never counts normal revisions (VERDICT r7
    #3)."""
    from datetime import datetime

    src = os.path.join(dirs, "lww_src")
    batch = spark.createDataFrame(
        [
            ("X", "BBB", datetime(2024, 1, 1, 0, 0), 10.0),
            ("X", "BBB", datetime(2024, 1, 1, 0, 1), 11.0),
            # revision of minute 1, later in arrival order -> wins
            ("X", "BBB", datetime(2024, 1, 1, 0, 1), 20.0),
        ],
        "exchange string, symbol string, start timestamp, close double",
    )
    batch.coalesce(1).write.mode("append").parquet(src)
    out = os.path.join(dirs, "lww_out")
    ckpt = os.path.join(dirs, "lww_ckpt")
    q = ema_stream(spark, src, out, ckpt, n=20)
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        r["start"]: (r["close"], r["t"], r["dropped"], r["replaced"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 2
    assert got[datetime(2024, 1, 1, 0, 1)][0] == 20.0
    # same-batch revision: replaced=1, dropped=0 (no data loss)
    assert got[datetime(2024, 1, 1, 0, 1)] == (20.0, 2, 0, 1)


def test_stream_macd_drops_cross_batch_late_rows(spark, dirs):
    from trade_data_collection_service_spark.streaming.ema import macd_stream

    from datetime import datetime

    rows = [
        ("X", "CCC", datetime(2024, 1, 1, 0, m), 50.0 + m)
        for m in range(4)
    ]
    src = os.path.join(dirs, "mlate_src")
    spark.createDataFrame(
        rows[:3],
        "exchange string, symbol string, start timestamp, close double",
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("X", "CCC", datetime(2024, 1, 1, 0, 0), 777.0), rows[3]],
        "exchange string, symbol string, start timestamp, close double",
    ).coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "mlate_out")
    ckpt = os.path.join(dirs, "mlate_ckpt")
    q = macd_stream(spark, src, out, ckpt)
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        r["start"]: (r["close"], r["t"], r["dropped"], r["replaced"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 4
    assert all(c != 777.0 for c, _, _, _ in got.values())
    assert got[datetime(2024, 1, 1, 0, 3)] == (53.0, 4, 1, 0)


def test_stream_ema_late_duplicates_count_as_dropped_not_replaced(
    spark, dirs
):
    """Review r8: two same-batch revisions of an ALREADY-FOLDED start
    are both cross-batch loss — the late filter must run before the
    LWW dedup, else one of them is laundered into ``replaced``
    (normal operation) and the loss metric understates by half."""
    from datetime import datetime

    src = os.path.join(dirs, "latedup_src")
    base = [
        ("X", "DDD", datetime(2024, 1, 1, 0, 0), 10.0),
        ("X", "DDD", datetime(2024, 1, 1, 0, 1), 11.0),
    ]
    schema = "exchange string, symbol string, start timestamp, close double"
    spark.createDataFrame(base, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # batch 2: TWO revisions of minute 0 (both late) + one new candle
    spark.createDataFrame(
        [
            ("X", "DDD", datetime(2024, 1, 1, 0, 0), 555.0),
            ("X", "DDD", datetime(2024, 1, 1, 0, 0), 666.0),
            ("X", "DDD", datetime(2024, 1, 1, 0, 2), 12.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    out = os.path.join(dirs, "latedup_out")
    ckpt = os.path.join(dirs, "latedup_ckpt")
    q = ema_stream(spark, src, out, ckpt, n=20)
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        r["start"]: (r["close"], r["dropped"], r["replaced"])
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 3
    assert all(c not in (555.0, 666.0) for c, _, _ in got.values())
    # both late revisions are LOSS, neither is a same-batch revision
    assert got[datetime(2024, 1, 1, 0, 2)] == (12.0, 2, 0)
