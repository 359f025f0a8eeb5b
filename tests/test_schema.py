import pytest

from trade_data_collection_service_spark.schema import (
    ROLLUP_MINUTES,
    RollupSpec,
    cascade_specs,
    parse_timeframe,
    timeframe_label,
)


def test_parse_timeframe():
    assert parse_timeframe("1m") == 60
    assert parse_timeframe("30s") == 30
    assert parse_timeframe("4h") == 4 * 3600
    assert parse_timeframe("1d") == 86400
    assert parse_timeframe("2w") == 2 * 604800


@pytest.mark.parametrize("bad", ["", "m", "1x", "-1m", "1.5h", "h1", "0m"])
def test_parse_timeframe_rejects(bad):
    with pytest.raises(ValueError):
        parse_timeframe(bad)


def test_labels():
    assert timeframe_label(1) == "1m"
    assert timeframe_label(60) == "1h"
    assert timeframe_label(240) == "4h"
    assert timeframe_label(1440) == "1d"


def test_cascade_divisibility():
    specs = cascade_specs()
    assert [s.minutes for s in specs] == ROLLUP_MINUTES
    for prev, cur in zip(specs, specs[1:]):
        assert cur.source_minutes == prev.minutes
        assert cur.minutes % cur.source_minutes == 0


def test_cascade_rejects_indivisible():
    # The invariant the reference enforces at clickhouse_schema.py:98-99.
    with pytest.raises(ValueError):
        RollupSpec(minutes=7, source_minutes=5)
