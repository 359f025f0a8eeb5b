from pyspark.sql import functions as F

from trade_data_collection_service_spark.ext.similarity import ivf_topk
from trade_data_collection_service_spark.functions.skew import salted_join


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    r = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    plain = l.join(r, ["l_orderkey"])
    salted = salted_join(l, r, ["l_orderkey"], salt=4)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.columns == plain.columns


def test_salted_left_join(spark):
    l = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    r = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(l, r, ["k"], how="left", salt=3).collect()
    got = {(r["k"], r["v"], r["w"]) for r in out}
    assert got == {(1, "a", "x"), (2, "b", None)}


def test_ivf_nprobe_widens_search(spark, sf_dir):
    one = ivf_topk(spark, sf_dir, nprobe=1).collect()
    two = ivf_topk(spark, sf_dir, nprobe=2).collect()
    assert one and two
    best1 = {r["q_id"]: r["sim"] for r in one if r["rank"] == 1}
    best2 = {r["q_id"]: r["sim"] for r in two if r["rank"] == 1}
    # searching more buckets can only find equal-or-better neighbors
    for q, s in best1.items():
        assert best2[q] >= s
    # nprobe=2 may return hits from two buckets per query
    buckets2 = {}
    for r in two:
        buckets2.setdefault(r["q_id"], set()).add(r["bucket"])
    assert all(len(b) <= 2 for b in buckets2.values())
