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
