"""Deterministic HyperLogLog distinct-count sketch (m=64 registers).

Spark's ``approx_count_distinct`` and DuckDB's equivalent use
engine-specific sketches, so they can never hash-match — this
implementation derives every register from md5, making the sketch a
pure deterministic function of the value set: identical across
engines (oracle-checkable!), runs, partitionings, and cluster sizes.
That reproducibility is exactly what a training-data pipeline wants
from cardinality telemetry (the count a report shows is the count a
re-run shows).

Register derivation per value v:
    x   = first 32 bits of md5(salt|v)         (conv hex→long)
    idx = x & 63          (register, low 6 bits)
    w   = x >> 6          (26-bit remainder)
    rho = 27 − bitlen(w)  (leading-zero rank; w=0 → 27)

Flajolet et al.'s estimator with the small-range correction
(linear counting) below 2.5·m.  The 2^−M terms are exact powers of
two spanning ≤27 exponents over ≤64 terms, so their float sum is
EXACT and order-independent — no decimal scaffolding needed.

Scale shape: one groupBy(group, idx) with map-side max-combine (≤64
rows per group survive the shuffle), then a 64-row fold per group.
Distributed mergeability is inherent: max() of registers IS the
sketch union — the same property lets partial sketches merge across
days/shards without re-scanning values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

M = 64
# alpha_64 per the HLL paper (m=64 row of the alpha table)
ALPHA = 0.709


def hll_rho_cols(value: Column, salt: str = "hll-v1") -> tuple[Column, Column]:
    """(register index, rank) columns for one value expression."""
    x = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), value.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    idx = x.bitwiseAND(F.lit(M - 1))
    w = F.shiftright(x, 6)
    rho = F.when(w == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.conv(w, 10, 2))
    )
    return idx.alias("hll_idx"), rho.cast("long").alias("hll_rho")


def hll_fold(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a (group_cols…, hll_idx, reg) register table into the
    per-group cardinality estimate (group_cols…, hll_estimate) —
    the finalize step, shared by the one-shot ``hll_distinct`` and
    the streaming register-table reader (streaming/actives.py), so
    stream-maintained and batch-computed estimates can never drift."""
    folded = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("sum_pow"),
    )
    zeros = F.lit(M) - F.col("n_regs")
    sum_inv = F.col("sum_pow") + zeros.cast("double")
    raw = F.lit(ALPHA * M * M) / sum_inv
    est = F.when(
        (raw <= 2.5 * M) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros),
    ).otherwise(raw)
    return folded.select(
        *group_cols, F.round(est, 4).alias("hll_estimate")
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hll-v1",
) -> DataFrame:
    """Per-group HLL register table (group_cols…, hll_idx, reg) —
    the MERGEABLE partial state: registers from any row split union +
    max-combine to the registers of the whole (max is associative,
    commutative, and idempotent, so duplicate delivery is free)."""
    idx, rho = hll_rho_cols(F.col(value_col), salt)
    return (
        df.select(*group_cols, idx, rho)
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("hll_rho").alias("reg"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hll-v1",
) -> DataFrame:
    """Per-group HLL cardinality estimate: (group_cols…, hll_estimate)."""
    return hll_fold(
        hll_registers(df, group_cols, value_col, salt), group_cols
    )


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 1024,
) -> DataFrame:
    """Single-pass mergeable histogram quantile sketch — the scale
    path for percentiles.

    Exact percentiles (`price_percentiles`) need the group's values
    sorted; at 100 TB that is a full shuffle+sort of the fact table.
    This sketch needs ONE pass: per group, values hash into ``bins``
    equal-width buckets over the group's [min, max] range, map-side
    combine collapses each partition to ≤bins counters, and the
    quantile is read off the cumulative histogram with error
    ≤ range/bins.  Bucket counts ADD, so partial sketches merge
    across shards/days without re-scanning values (same mergeability
    contract as the HLL above).

    Everything is deterministic closed-form double arithmetic
    (identical IEEE expressions both engines — oracle-checkable,
    unlike t-digest/GK whose state depends on merge order).
    Two narrow jobs: a (group → min/max/count) pre-agg that
    broadcasts back, then the binned count.
    """
    v = F.col(value_col)
    rng = df.groupBy(*group_cols).agg(
        F.min(v).alias("_vmin"),
        F.max(v).alias("_vmax"),
        F.count(v).cast("long").alias("_n"),
    )
    binned = (
        df.join(F.broadcast(rng), group_cols)
        .withColumn(
            "_bin",
            F.when(F.col("_vmax") == F.col("_vmin"), F.lit(0)).otherwise(
                F.least(
                    F.floor(
                        (v - F.col("_vmin"))
                        / (F.col("_vmax") - F.col("_vmin"))
                        * bins
                    ),
                    F.lit(bins - 1),
                )
            ).cast("long"),
        )
        .groupBy(*group_cols, "_vmin", "_vmax", "_n", "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.withColumn("_cum", F.sum("_c").over(w))
    # per quantile: the upper edge of the first bin whose cumulative
    # count reaches q*n  (edge = vmin + (bin+1) * (vmax-vmin) / bins)
    aggs = []
    for q in qs:
        hit_bin = F.min(
            F.when(F.col("_cum") >= F.lit(q) * F.col("_n"), F.col("_bin"))
        )
        aggs.append(hit_bin.alias(f"_b{int(q * 100)}"))
    est = cum.groupBy(*group_cols, "_vmin", "_vmax", "_n").agg(*aggs)
    edge_cols = [
        F.round(
            F.col("_vmin")
            + (F.col(f"_b{int(q * 100)}") + F.lit(1))
            * (F.col("_vmax") - F.col("_vmin"))
            / F.lit(float(bins)),
            6,
        ).alias(f"p{int(q * 100)}_est")
        for q in qs
    ]
    return est.select(
        *group_cols, *edge_cols, F.col("_n").alias("n")
    ).orderBy(*group_cols)


# --- Count-min sketch -------------------------------------------------------

CMS_WIDTH = 64
CMS_DEPTH = 4


def cms_cells(value: Column, salt: str = "cms-v1") -> Column:
    """Array of (row, col) cells a value increments — one md5-derived
    column per sketch row, same engine-portable derivation discipline
    as the HLL registers (DuckDB computes the identical cells)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit(f"{salt}|{d}|"), value.cast("string"))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .bitwiseAND(F.lit(CMS_WIDTH - 1))
                .alias("col"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


def cms_sketch(
    df: DataFrame, value_col: str, salt: str = "cms-v1"
) -> DataFrame:
    """Build the count-min table: (row, col, cnt).  One groupBy with
    map-side partial counts; at most depth×width = 256 rows survive
    the shuffle regardless of input size, and two sketches merge by
    summing cells — the mergeability that lets per-shard/per-day
    sketches roll up without rescanning (same telemetry contract as
    ``hll_distinct`` and the histogram quantile sketch)."""
    cells = df.select(
        F.explode(cms_cells(F.col(value_col), salt)).alias("c")
    ).select("c.row", "c.col")
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, value_col: str, salt: str = "cms-v1"
) -> DataFrame:
    """Point-frequency estimates for probe values: min over the
    sketch rows of the probed cells (the count-min guarantee:
    estimate >= true count, with overestimate bounded by collisions).
    The sketch is tiny (<= depth×width rows) and broadcasts."""
    from pyspark.sql.functions import broadcast

    cells = probes.select(
        F.col(value_col).alias("probe"),
        F.explode(cms_cells(F.col(value_col), salt)).alias("c"),
    ).select("probe", "c.row", "c.col")
    return (
        cells.join(broadcast(sketch), ["row", "col"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count"))
    )
