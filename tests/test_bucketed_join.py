"""Bucketed co-located joins: two tables bucketed on the join key
must join with no shuffle exchange on either side."""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.sources.tables import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(l, "bt_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders",
        ["l_orderkey"],
        n_buckets=8,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_shuffle(bucketed_tables):
    spark = bucketed_tables
    # disable auto-broadcast so the plan demonstrates the bucketed
    # (fact⋈fact scale) path rather than a small-dim broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_lineitem").join(spark.table("bt_orders"), "l_orderkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_correct(bucketed_tables, spark, sf_dir):
    j = spark.table("bt_lineitem").join(spark.table("bt_orders"), "l_orderkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = l.join(o, l["l_orderkey"] == o["o_orderkey"]).count()
    assert j.count() == expected


def test_bucketed_agg_avoids_shuffle(bucketed_tables):
    # groupBy on the bucket key also reuses the bucketing
    spark = bucketed_tables
    g = spark.table("bt_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        g.explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 0
