"""General relational query surface on the TPC-H-ish driver tables.

The reference's own query surface is narrow (filters/top-N/grouped
min); these queries prove the engine inherits the full relational
algebra from Spark — multi-way joins with broadcast dimension sides,
wide aggregations, top-K — and they anchor the benchmark suite.

Cross-engine float determinism: money aggregates are computed per-row
in double (deterministic expression), rounded to their exact decimal
width, cast to decimal for EXACT summation, and cast back to double —
bit-identical between Spark and DuckDB regardless of partial-agg
ordering (see __spark_entry__ oracle twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 adapted to the driver's lineitem schema: pricing
    summary per (returnflag, linestatus) for shipments before the
    cutoff.  One scan, map-side partial aggregation, 6 result rows."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    disc_price = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    charge = F.round(
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax")),
        6,
    ).cast("decimal(18,6)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            # quantity is integer-valued -> double sum is exact; discount
            # goes through decimal so the mean is order-independent.
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted: top-10 unshipped orders by revenue for one
    market segment.  customer is a broadcast dimension; orders⋈lineitem
    shuffles on orderkey."""
    cutoff = F.lit("1996-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 adapted: revenue per nation inside one region for one
    order-date year.  nation/region/supplier are broadcast dims."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 adapted: forecast revenue change — one scan with every
    predicate pushed to parquet (shipdate year, discount band,
    quantity cap), one scalar decimal-exact sum.  The canonical
    filter-pushdown benchmark."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24)
    )
    rev = F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).cast(
        "decimal(18,4)"
    )
    return l.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted to the driver schema: top-20 customers by
    revenue lost to returns in one quarter.  customer/nation broadcast;
    the orders⋈lineitem join shuffles on orderkey; top-20 via
    TakeOrdered on the rounded revenue with custkey tie-break."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    revenue = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (no l_commitdate in the driver schema): count
    orders per priority in one quarter that have at least one returned
    lineitem.  The EXISTS correlated subquery decorrelates to a LEFT
    SEMI join — orders never duplicate no matter how many lineitems
    match, and Spark plans it as a shuffled semi hash join (the
    lineitem side is filtered before the exchange)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 essence (no l_shipmode column): for lineitems shipped
    more than 90 days after the order date, count high-priority vs
    low-priority orders per linestatus.  Join + conditional aggregation
    (CASE folded into two sums in one pass)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 adapted: share of one month's revenue from PROMO
    parts.  part is a broadcast dimension; the ratio is derived from
    two decimal-exact sums (order-independent in both engines)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    joined = l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6).alias(
            "promo_share_pct"
        ),
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 adapted: top-100 largest orders by total quantity
    (threshold 150).  The HAVING subquery becomes a pre-aggregation of
    lineitem on orderkey — map-side partial sums collapse the 60k-row
    fact before the join — then orders/customer attach via joins
    (customer broadcast).  Quantities are integer-valued doubles, so
    the sums are exact."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(100)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted: revenue from an OR-of-ANDs over brand, size,
    and quantity bands.  One broadcast equi-join on partkey with the
    disjunction evaluated post-join; Catalyst extracts the common
    partkey conjunct so the join stays equi (no nested loop)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no c_phone; every customer in this dataset
    has orders, so "no orders at all" is degenerate): per market
    segment, customers with above-average positive balance who never
    placed an URGENT order.  The scalar AVG subquery broadcasts as a
    1-row crossJoin (no collect); NOT EXISTS decorrelates to a LEFT
    ANTI join on custkey with the urgency filter pushed below the
    join.  The average is derived from a decimal-exact sum so the `>`
    cut is bit-identical across engines."""
    segs = ("BUILDING", "AUTOMOBILE", "MACHINERY")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment").isin(*segs))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted: shipping volume between two nations per ship
    year, both directions.  Five joins, but only ONE shuffles — the
    orders⋈lineitem fact join on orderkey; supplier, customer, and
    both nation dims broadcast, and the two-nation disjunction is
    applied after the cheap broadcast lookups (Catalyst pushes the
    single-nation residuals into each dim scan where it can)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    revenue = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(sn), s["s_nationkey"] == sn["s_nkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(cn), c["c_nationkey"] == cn["c_nkey"])
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's core shape (no partsupp table in the driver schema):
    suppliers whose account balance is the MINIMUM within their
    nation — a correlated scalar subquery (`WHERE s_acctbal = (SELECT
    min ... WHERE same nation)`) decorrelated into a per-nation
    aggregate joined back on the group key.  The agg output is one
    row per nation, so the join-back side broadcasts; equality on the
    min is safe (the min IS one of the column's values, no arithmetic
    drift)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    mins = s.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(broadcast(mins), "s_nationkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
        .orderBy("n_name", "s_suppkey")
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (SURVEY.md §2.8 note): parse
    the k field, aggregate per event_type."""
    from trade_data_collection_service_spark.candles import events_df

    ev = events_df(spark, sf_dir)  # handles the TIMESTAMP(NANOS) column
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted (no p_container in the driver schema — the
    part filter is brand + size): revenue from small-quantity orders
    of selected parts.  The correlated scalar subquery (per-part 20%%
    of average quantity) decorrelates to one per-part aggregate
    broadcast-joined back onto the same filtered fact — the classic
    two-pass rewrite; the selected-part dimension broadcasts so the
    fact scans once and never shuffles on partkey."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    ).select("p_partkey")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(
        broadcast(p), l["l_partkey"] == p["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thr = lp.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thr")
    )
    return (
        lp.join(broadcast(thr), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no commit/receipt dates — "late" is proxied
    by l_returnflag = 'R'): suppliers whose returned lineitem was the
    ONLY returned item in a multi-supplier order.  Keeps Q21's whole
    decorrelation structure: EXISTS → left-semi join (another supplier
    in the order), NOT EXISTS → left-anti join (no OTHER supplier's
    returned item), then a broadcast dim join + top-10."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = l.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    cand = l1.join(
        l2,
        (l1["l_orderkey"] == l2["o2"]) & (l1["l_suppkey"] != l2["s2"]),
        "left_semi",
    ).join(
        l3,
        (l1["l_orderkey"] == l3["o3"]) & (l1["l_suppkey"] != l3["s3"]),
        "left_anti",
    )
    return (
        cand.join(broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's market share of a part-type's
    volume sold into one region, per order year.  The fact joins the
    filtered part dim FIRST (the strongest selectivity), then five
    broadcast dims; share = two conditional decimal sums divided after
    the cast to double (the q1/q5 money discipline)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    base = (
        l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n2), s["s_nationkey"] == F.col("supp_nationkey"))
    )
    return (
        base.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)
            )
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            F.round(
                F.col("nation_volume") / F.col("total_volume"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 adapted (no o_comment filter in the driver schema):
    distribution of customers by order count, INCLUDING zero-order
    customers — the left outer join + double aggregation that the
    original exists to test."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarter revenue.  The
    view + scalar MAX subquery decorrelates to one revenue aggregate
    reused on both sides: the 1-row max broadcasts back over it (the
    repo's no-collect scalar idiom), so the fact scans once."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (driver schema has no partsupp, so supply cost
    is proxied by 10% of p_retailprice per unit): profit per (supplier
    nation, order year) over parts whose name contains 'gear'.  Keeps
    Q9's structure — the five-way join with part pre-filtered and all
    dimensions broadcast, fact tables shuffling once on l_orderkey —
    with the money sums decimal-exact."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)") - F.round(
        F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity"), 4
    ).cast("decimal(18,4)")
    return (
        l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: "stock value" is proxied by
    lineitem revenue per part for one nation's suppliers): parts whose
    value exceeds 3x the mean part value — Q11's GROUP BY + HAVING
    scalar-subquery shape, with the threshold decorrelated into a
    1-row broadcast (the repo's no-collect scalar idiom, same as Q15)
    so the per-part aggregate is computed once and scanned once."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    value = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    pv = (
        l.join(broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    thresh = pv.agg(
        (
            F.lit(3.0) * (F.sum("value_dec").cast("double") / F.count(F.lit(1)))
        ).alias("thresh")
    )
    return (
        pv.crossJoin(broadcast(thresh))
        .filter(F.col("value_dec").cast("double") > F.col("thresh"))
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp: the part-supplier relation is
    the distinct (l_partkey, l_suppkey) pairs of lineitem; the
    customer-complaints NOT IN is proxied by negative s_acctbal):
    distinct supplier count per (brand, type, size) for a filtered
    part family.  Keeps Q16's anti-join + count-distinct structure;
    the excluded-supplier set broadcasts."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(broadcast(bad), l["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp availqty: a supplier "holds
    excess stock" of a part when it shipped more than half of that
    part's total 1996 volume): suppliers in NATION_3 dominating a
    'red%' part.  Keeps Q20's nested-semi-join ladder — part-name
    pre-filter broadcast into the fact scan, the correlated half-of-
    total threshold decorrelated into a per-part aggregate equi-join,
    and the final supplier list resolved with a left-semi join."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    shipped = (
        l.join(broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty96"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty96").alias("qty_all")
    )
    dominating = (
        shipped.join(tot, shipped["l_partkey"] == tot["t_partkey"])
        .filter(F.col("qty96") > F.lit(0.5) * F.col("qty_all"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            dominating, s["s_suppkey"] == dominating["l_suppkey"], "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
