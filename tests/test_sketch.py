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


def test_histogram_quantiles_error_bound(spark, sf_dir):
    """Sketch estimate must sit within one bin width of the exact
    discrete quantile."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.functions.sketch import (
        histogram_quantiles,
    )

    c = candles_from_events(spark, sf_dir)
    est = {
        r["symbol"]: r
        for r in histogram_quantiles(c, ["symbol"], "close").collect()
    }
    # the sketch's contract is the DISCRETE quantile (first value with
    # cume_dist >= q, i.e. what cum-count >= q*n selects) -- interpolated
    # R-7 percentiles can sit a full value-gap away near outliers.
    exact = {
        r["symbol"]: r
        for r in c.groupBy("symbol")
        .agg(
            F.expr("percentile_disc(0.5)  WITHIN GROUP (ORDER BY close)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY close)").alias("p95"),
            F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY close)").alias("p99"),
            F.min("close").alias("vmin"),
            F.max("close").alias("vmax"),
        )
        .collect()
    }
    assert est.keys() == exact.keys() and len(est) > 0
    for sym, e in exact.items():
        width = (e["vmax"] - e["vmin"]) / 1024
        for q in ("p50", "p95", "p99"):
            assert abs(est[sym][f"{q}_est"] - e[q]) <= width + 1e-9, (
                sym,
                q,
                est[sym][f"{q}_est"],
                e[q],
                width,
            )


def test_histogram_sketch_merges_across_shards(spark, sf_dir):
    """Computing the sketch over the full table equals computing it
    over the union of two disjoint time shards — bin counts add, so
    partial sketches merge without value re-scans (given shared
    [min,max]; here the halves' union IS the full value set)."""
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.candles import candles_from_events
    from trade_data_collection_service_spark.functions.sketch import (
        histogram_quantiles,
    )

    c = candles_from_events(spark, sf_dir)
    cut = "2024-01-15 00:00:00"
    halves = c.filter(F.col("start") < cut).unionByName(
        c.filter(F.col("start") >= cut)
    )
    full = histogram_quantiles(c, ["symbol"], "close").collect()
    merged = histogram_quantiles(halves, ["symbol"], "close").collect()
    assert [r.asDict() for r in full] == [r.asDict() for r in merged]


def test_cms_overestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from trade_data_collection_service_spark.functions.sketch import (
        cms_estimate,
        cms_sketch,
    )

    words_a = [("x",)] * 5 + [("y",)] * 3 + [("z",)] * 1
    words_b = [("x",)] * 2 + [("w",)] * 4
    a = spark.createDataFrame(words_a, ["token"])
    b = spark.createDataFrame(words_b, ["token"])
    both = a.unionAll(b)

    sk_all = cms_sketch(both, "token")
    probes = spark.createDataFrame([("x",), ("y",), ("z",), ("w",), ("q",)], ["token"])
    est = {
        r["probe"]: r["est_count"]
        for r in cms_estimate(sk_all, probes, "token").collect()
    }
    true = {"x": 7, "y": 3, "z": 1, "w": 4, "q": 0}
    for t, n in true.items():
        assert est[t] >= n, (t, est[t], n)

    # mergeability: cell-wise SUM of two partial sketches == sketch of union
    merged = (
        cms_sketch(a, "token")
        .unionAll(cms_sketch(b, "token"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lhs = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    rhs = {(r["row"], r["col"]): r["cnt"] for r in sk_all.collect()}
    assert lhs == rhs
