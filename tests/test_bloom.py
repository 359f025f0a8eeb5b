"""Bloom semi-join reduction: no false negatives ever, real
selectivity on a selective dim, exact-join equivalence, and the
literal/pandas paths agree on every true key.
"""

import pytest
from pyspark.sql import functions as F

from trade_data_collection_service_spark.functions.bloom import (
    BLOOM_MAX_BITS,
    bloom_build,
    bloom_semijoin,
)


@pytest.fixture(scope="module")
def fact_dim(spark, sf_dir):
    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_nationkey") % 5 == 3)
        .select("s_suppkey", "s_name")
    )
    return fact, dim


def test_no_false_negatives_and_selective(fact_dim):
    fact, dim = fact_dim
    bloom = bloom_build(dim, "s_suppkey")
    true_keys = {r["s_suppkey"] for r in dim.collect()}
    assert true_keys, "fixture dim must be non-empty"
    kept = fact.filter(bloom.might_contain(F.col("l_suppkey")))
    kept_keys = {r["l_suppkey"] for r in kept.collect()}
    # every true match survives the pre-filter…
    matching = {
        r["l_suppkey"]
        for r in fact.filter(
            F.col("l_suppkey").isin(list(true_keys))
        ).collect()
    }
    assert matching <= kept_keys
    # …and the pre-filter genuinely reduces what would shuffle
    assert kept.count() < fact.count()


def test_semijoin_matches_plain_join(fact_dim):
    fact, dim = fact_dim
    got = (
        bloom_semijoin(fact, dim, "l_suppkey", "s_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = (
        fact.join(dim, fact["l_suppkey"] == dim["s_suppkey"])
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {(r["l_suppkey"], r["n"]) for r in got} == {
        (r["l_suppkey"], r["n"]) for r in want
    }


def test_pandas_path_identical_to_literal(fact_dim):
    """Both membership paths share the JVM xxhash64 positions, so
    their kept row sets are bit-identical (not merely overlapping)."""
    fact, dim = fact_dim
    bloom = bloom_build(dim, "s_suppkey")
    lit_keys = sorted(
        r["l_suppkey"]
        for r in fact.filter(
            bloom.might_contain(F.col("l_suppkey"))
        ).collect()
    )
    pd_keys = sorted(
        r["l_suppkey"]
        for r in fact.filter(
            bloom.might_contain_pandas(fact, "l_suppkey")
        ).collect()
    )
    assert lit_keys == pd_keys and lit_keys


def test_literal_budget_enforced(spark):
    big = spark.range(0, BLOOM_MAX_BITS).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="large_ok"):
        bloom_build(big, "k")
    # the pandas path carries any size
    bloom = bloom_build(big, "k", large_ok=True)
    assert bloom.m > BLOOM_MAX_BITS


def test_semijoin_degrades_to_pandas_path_at_scale(spark):
    # ADVICE r11: a dim past the literal-path budget must not make
    # bloom_semijoin raise — it auto-builds large_ok and probes via
    # the broadcast+pandas path, same exact result as a plain join.
    n = BLOOM_MAX_BITS  # forces m > BLOOM_MAX_BITS at 16 bits/key
    dim = spark.range(0, n, 7).withColumnRenamed("id", "k")
    fact = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    got = bloom_semijoin(fact, dim, "k", "k", how="left_semi")
    want = fact.join(dim, "k", "left_semi")
    assert got.count() == want.count() == (n + 6) // 7


def test_outer_join_rejected(fact_dim):
    fact, dim = fact_dim
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_semijoin(fact, dim, "l_suppkey", "s_suppkey", how="left")


def test_prefilter_stays_jvm_side(fact_dim):
    import io
    from contextlib import redirect_stdout

    fact, dim = fact_dim
    df = bloom_semijoin(fact, dim, "l_suppkey", "s_suppkey")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # literal path: pure codegen


def test_cross_type_keys_no_false_negatives(spark):
    """xxhash64 hashes by physical type (int 7 != bigint 7), so the
    probe must cast to the build side's type — a mismatch would drop
    TRUE matches map-side, the one failure a Bloom pre-filter must
    never have (review finding, fixed in BloomFilter.positions)."""
    dim = spark.range(0, 50).select(
        F.col("id").alias("k")  # bigint build side
    )
    fact = spark.createDataFrame(
        [(i,) for i in range(100)], "k_int int"  # int probe side
    )
    bloom = bloom_build(dim, "k")
    kept = {
        r["k_int"]
        for r in fact.filter(
            bloom.might_contain(F.col("k_int"))
        ).collect()
    }
    assert set(range(50)) <= kept
