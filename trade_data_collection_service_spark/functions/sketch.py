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

from pyspark.sql import Column, DataFrame
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


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hll-v1",
) -> DataFrame:
    """Per-group HLL cardinality estimate: (group_cols…, hll_estimate)."""
    idx, rho = hll_rho_cols(F.col(value_col), salt)
    regs = (
        df.select(*group_cols, idx, rho)
        .groupBy(*group_cols, "hll_idx")
        .agg(F.max("hll_rho").alias("reg"))
    )
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
