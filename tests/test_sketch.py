from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.sketch import (
    M,
    hll_distinct,
    hll_rho_cols,
)


def test_hll_accuracy_bands(spark):
    # m=64 → standard error ~1.04/sqrt(64) = 13%; assert a loose 3-sigma.
    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    got = {r["g"]: r["hll_estimate"] for r in hll_distinct(df, ["g"], "v").collect()}
    for g, est in got.items():
        assert abs(est - 2500) / 2500 < 0.4, (g, est)


def test_hll_exact_at_small_cardinality(spark):
    # Linear-counting regime: tiny sets estimate closely.
    df = spark.range(8).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    (row,) = hll_distinct(df, ["g"], "v").collect()
    assert 5 <= row["hll_estimate"] <= 12


def test_hll_merge_is_register_max(spark):
    # Sketch union == max() of registers: estimate(A ∪ B) must equal
    # the estimate from merged per-half registers.
    df = spark.range(2000).select(
        (F.col("id") % 2).alias("half"), F.col("id").alias("v")
    )
    idx, rho = hll_rho_cols(F.col("v"))
    halves = (
        df.select("half", idx, rho)
        .groupBy("half", "hll_idx")
        .agg(F.max("hll_rho").alias("reg"))
    )
    merged = halves.groupBy("hll_idx").agg(F.max("reg").alias("reg"))
    direct = (
        df.select(idx, rho).groupBy("hll_idx").agg(F.max("hll_rho").alias("reg"))
    )
    m = {r["hll_idx"]: r["reg"] for r in merged.collect()}
    d = {r["hll_idx"]: r["reg"] for r in direct.collect()}
    assert m == d and len(d) <= M
