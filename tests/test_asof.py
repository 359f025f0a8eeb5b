from datetime import datetime

from trade_data_collection_service_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 0, 30), 1),   # inside first bar
            ("S", datetime(2024, 1, 1, 0, 1, 0), 2),    # exactly at bar 2 -> inclusive
            ("S", datetime(2024, 1, 1, 0, 5, 0), 3),    # after last bar
            ("S", datetime(2023, 12, 31, 0, 0, 0), 4),  # before any bar -> null
            ("T", datetime(2024, 1, 1, 0, 0, 45), 5),   # other key, no bars -> null
        ],
        ["symbol", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 0), 10.0),
            ("S", datetime(2024, 1, 1, 0, 1), 11.0),
            ("S", datetime(2024, 1, 1, 0, 2), 12.0),
        ],
        ["symbol", "start", "close"],
    )
    out = {
        r["event_id"]: r["asof_close"]
        for r in asof_join(
            left, right, ["symbol"], "ts", "start", ["close"]
        ).collect()
    }
    assert out == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_duplicate_right_timestamps_deterministic(spark):
    """ADVICE r1: with duplicate right timestamps per key, the winning
    payload must be a total-order choice (largest tiebreaker), stable
    across runs and partitionings."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [
            ("A", "2024-01-01 00:00:00", 10.0, 1),
            ("A", "2024-01-01 00:00:00", 99.0, 2),  # same ts, higher version
            ("A", "2024-01-01 00:05:00", 50.0, 3),
        ],
        "sym string, ts string, price double, version long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    left = spark.createDataFrame(
        [("A", "2024-01-01 00:03:00")], "sym string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    for _ in range(3):
        # explicit version tiebreaker
        r1 = asof_join(
            left, right, ["sym"], "ts", "ts", ["price"], right_order=["version"]
        ).collect()
        assert [x["asof_price"] for x in r1] == [99.0]
        # default: payload itself is the tiebreaker -> largest price
        r2 = asof_join(left, right.repartition(3), ["sym"], "ts", "ts", ["price"]).collect()
        assert [x["asof_price"] for x in r2] == [99.0]


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 0, 30), 1),   # next bar is 0:01
            ("S", datetime(2024, 1, 1, 0, 1, 0), 2),    # exactly at bar 2 -> inclusive
            ("S", datetime(2024, 1, 1, 0, 5, 0), 3),    # after last bar -> null
            ("S", datetime(2023, 12, 31, 0, 0, 0), 4),  # before any bar -> first bar
            ("T", datetime(2024, 1, 1, 0, 0, 45), 5),   # other key, no bars -> null
        ],
        ["symbol", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 0), 10.0),
            ("S", datetime(2024, 1, 1, 0, 1), 11.0),
            ("S", datetime(2024, 1, 1, 0, 2), 12.0),
        ],
        ["symbol", "start", "close"],
    )
    out = {
        r["event_id"]: r["asof_close"]
        for r in asof_join(
            left, right, ["symbol"], "ts", "start", ["close"],
            direction="forward",
        ).collect()
    }
    assert out == {1: 11.0, 2: 11.0, 3: None, 4: 10.0, 5: None}


def test_asof_forward_duplicate_right_timestamps_deterministic(spark):
    """Forward mirror of the tiebreak rule: equal right timestamps →
    the SMALLEST right_order value wins, stable across partitionings."""
    left = spark.createDataFrame(
        [("S", datetime(2024, 1, 1, 0, 0, 30), 1)], ["symbol", "ts", "event_id"]
    )
    right = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 1), 99.0, 2),
            ("S", datetime(2024, 1, 1, 0, 1), 11.0, 1),
            ("S", datetime(2024, 1, 1, 0, 1), 55.0, 3),
        ],
        ["symbol", "start", "close", "version"],
    )
    for n_parts in (1, 3, 7):
        out = asof_join(
            left.repartition(n_parts),
            right.repartition(n_parts),
            ["symbol"],
            "ts",
            "start",
            ["close"],
            right_order=["version"],
            direction="forward",
        ).collect()
        assert [r["asof_close"] for r in out] == [11.0]


def test_asof_tolerance_backward(spark):
    """pandas merge_asof(tolerance=...) semantics: the nearest
    preceding match older than the tolerance publishes nulls; at the
    boundary the match is inclusive."""
    left = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 1, 30), 1),   # 90s stale -> ok
            ("S", datetime(2024, 1, 1, 0, 2, 0), 2),    # exactly 2m -> ok
            ("S", datetime(2024, 1, 1, 0, 2, 1), 3),    # 2m1s -> nulled
            ("S", datetime(2023, 12, 31), 4),           # no match at all
        ],
        ["symbol", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [("S", datetime(2024, 1, 1, 0, 0), 10.0)],
        ["symbol", "start", "close"],
    )
    out = {
        r["event_id"]: (r["asof_start"], r["asof_close"])
        for r in asof_join(
            left, right, ["symbol"], "ts", "start", ["start", "close"],
            tolerance="2 minutes",
        ).collect()
    }
    t0 = datetime(2024, 1, 1, 0, 0)
    assert out[1] == (t0, 10.0)
    assert out[2] == (t0, 10.0)
    assert out[3] == (None, None)
    assert out[4] == (None, None)


def test_asof_tolerance_forward(spark):
    left = spark.createDataFrame(
        [
            ("S", datetime(2024, 1, 1, 0, 0, 30), 1),   # 30s early -> ok
            ("S", datetime(2023, 12, 31, 23, 0), 2),    # 1h early -> nulled
        ],
        ["symbol", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [("S", datetime(2024, 1, 1, 0, 1), 11.0)],
        ["symbol", "start", "close"],
    )
    out = {
        r["event_id"]: r["asof_close"]
        for r in asof_join(
            left, right, ["symbol"], "ts", "start", ["close"],
            direction="forward", tolerance="5 minutes",
        ).collect()
    }
    assert out == {1: 11.0, 2: None}


def test_asof_null_payload_row_is_the_match(spark):
    """ADVICE r6: timestamp gate and payload must refer to the SAME
    right row.  When the nearest right row carries a NULL payload
    value, the published payload is that null — NOT a backfill from an
    older row (which could lie outside the tolerance the gate just
    approved).  Matches pandas merge_asof, which takes the nearest
    row's value even when it is NaN."""
    left = spark.createDataFrame(
        [("S", datetime(2024, 1, 1, 0, 5, 0), 1)],
        ["symbol", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [
            # old row, non-null payload, 65 minutes stale
            ("S", datetime(2023, 12, 31, 23, 0), 10.0, 1),
            # nearest row, NULL payload, 1 minute stale
            ("S", datetime(2024, 1, 1, 0, 4), None, 2),
        ],
        "symbol string, start timestamp, close double, version long",
    )
    # Without tolerance: the nearest row wins, null payload and all.
    no_tol = asof_join(
        left, right, ["symbol"], "ts", "start", ["close"],
        right_order=["version"],
    ).collect()
    assert [r["asof_close"] for r in no_tol] == [None]
    # With tolerance 2m: the nearest row is within tolerance; its null
    # payload must NOT be replaced by the out-of-tolerance older row.
    tol = asof_join(
        left, right, ["symbol"], "ts", "start", ["start", "close"],
        right_order=["version"], tolerance="2 minutes",
    ).collect()
    assert tol[0]["asof_start"] == datetime(2024, 1, 1, 0, 4)
    assert tol[0]["asof_close"] is None
