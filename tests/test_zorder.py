"""Z-order clustering: the column interleave matches the driver-side
twin, box queries are layout-independent, and the layout actually
prunes (PartitionFilters on z_bucket + fewer cells than directories).
"""

import io
import re
import shutil
import tempfile
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.zorder import (
    _interleave,
    covering_buckets,
    read_layout,
    write_zordered,
    zorder_range_query,
    zvalue,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_zvalue_matches_python_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 100, 1999) for b in (0, 3, 42, 99)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "z", zvalue(F.col("x"), F.col("y"), 16)
    )
    for r in df.collect():
        assert r["z"] == _interleave(r["x"], r["y"], 16), (r["x"], r["y"])


@pytest.fixture(scope="module")
def zordered_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_returnflag"
    )
    tmp = tempfile.mkdtemp(prefix="zorder_")
    path = f"{tmp}/li"
    meta = write_zordered(li, path, "l_partkey", "l_suppkey")
    yield spark, li, path, meta
    shutil.rmtree(tmp, ignore_errors=True)


def test_zorder_query_is_layout_independent(zordered_lineitem):
    spark, li, path, _ = zordered_lineitem
    box = ((100, 399), (5, 30))
    got = sorted(
        (r["l_partkey"], r["l_suppkey"], r["l_quantity"])
        for r in zorder_range_query(spark, path, *box).collect()
    )
    want = sorted(
        (r["l_partkey"], r["l_suppkey"], r["l_quantity"])
        for r in li.filter(
            F.col("l_partkey").between(*box[0])
            & F.col("l_suppkey").between(*box[1])
        ).collect()
    )
    assert got == want and got


def test_zorder_query_prunes_partitions(zordered_lineitem):
    spark, _, path, meta = zordered_lineitem
    box = ((100, 399), (5, 30))
    plan = _plan(zorder_range_query(spark, path, *box))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "z_bucket" in m.group(1), plan[:2000]
    n_dirs = (
        spark.read.parquet(path).select("z_bucket").distinct().count()
    )
    cells = covering_buckets(meta, *box)
    # the covering list must be a strict subset of the layout's cells
    assert n_dirs >= 4 and len(cells) < n_dirs
    # pushed box predicate reaches the parquet scan for row-group
    # pruning inside surviving partitions
    assert "PushedFilters" in plan and "l_partkey" in plan.split(
        "PushedFilters", 1
    )[1][:300]


def test_covering_buckets_cover_every_row(zordered_lineitem):
    """No false negatives: every row inside the box lives in a
    covering cell (the IN-list may over-cover, never under)."""
    spark, _, path, meta = zordered_lineitem
    box = ((37, 512), (11, 63))
    cells = set(covering_buckets(meta, *box))
    in_box = (
        spark.read.parquet(path)
        .filter(
            F.col("l_partkey").between(*box[0])
            & F.col("l_suppkey").between(*box[1])
        )
        .select("z_bucket")
        .distinct()
        .collect()
    )
    assert {r["z_bucket"] for r in in_box} <= cells


def test_layout_sidecar_round_trips(zordered_lineitem):
    _, _, path, meta = zordered_lineitem
    assert read_layout(path) == meta


def test_negative_keys_rejected(spark):
    df = spark.createDataFrame([(-1, 2)], ["x", "y"])
    tmp = tempfile.mkdtemp(prefix="zorder_neg_")
    try:
        with pytest.raises(ValueError, match="non-negative"):
            write_zordered(df, f"{tmp}/t", "x", "y")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zvalue_31_bit_parity_and_32_rejected(spark):
    """Bit 30 of y lands at position 61 (sign-safe); bits=31 must
    stay positive and agree with the Python twin at the domain edge,
    and bits=32 (whose y bit 31 would hit the sign bit) is rejected
    (review finding)."""
    big = (1 << 31) - 1
    rows = [(big, big), (big, 0), (0, big), (1 << 30, (1 << 30) + 7)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "z", zvalue(F.col("x"), F.col("y"), 31)
    )
    for r in df.collect():
        assert r["z"] == _interleave(r["x"], r["y"], 31) >= 0
    with pytest.raises(ValueError, match="31"):
        zvalue(F.col("x"), F.col("y"), 32)
