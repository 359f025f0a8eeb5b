"""Z-order (Morton space-filling curve) data clustering: multi-column
range locality for partition AND row-group pruning.

The problem it solves (the OPTIMIZE ZORDER BY story, built from
parts): a table laid out by ONE key prunes range queries on that key
only — a query box on (part, supplier) over a part-sorted layout
still scans every file for the supplier bound.  Interleaving the
bits of both keys (the Morton curve) makes files cover small
RECTANGLES of the key space instead of slabs, so a 2-D box touches
few files and parquet min/max stats prune the rest.

Layout contract (:func:`write_zordered`):
- directory partition on ``z_bucket`` — the interleave of each
  column's top ``prefix_bits`` bits (a quadtree cell id), so a range
  query prunes whole directories at PLAN time (PartitionFilters,
  plan-asserted in tests/test_zorder.py);
- rows sorted by the full z-value WITHIN partitions
  (``sortWithinPartitions`` — never a global sort), so row groups
  inside each file cover tight boxes and the pushed x/y min/max
  predicates prune them at READ time.

Query contract (:func:`zorder_range_query`): the covering
``z_bucket`` IN-list is derived DRIVER-side from the box corners —
pure integer arithmetic on the layout metadata, no data read — and
the exact box predicate re-applies on top, so results are identical
to scanning the raw table (oracle-checked: the DuckDB twin queries
the unclustered table).

Scale: at 100 TB you raise ``prefix_bits`` (cells shrink 4× per
bit-pair) to keep directories at healthy file counts; the covering
list grows as the box/cell ratio, stays driver-tiny, and the write
is one repartition + local sort — the same cost as any clustered
ingest.  The curve generalizes to n columns (bit round-robin); two
dimensions cover the fact-table hot path (key × key, key × time).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_META_FILE = "_zorder_layout.json"


def zvalue(x: Column, y: Column, bits: int) -> Column:
    """Morton key: interleave the low ``bits`` bits of x (even
    positions) and y (odd) — a pure codegen expression (2·bits
    shift/mask/or terms), no UDF.  ``bits`` is capped at 31: the
    y dimension's bit b lands at result position 2b+1, so bit 31
    would hit the long's SIGN bit (position 63) — z-values would go
    negative (breaking Morton order and diverging from the Python
    ``_interleave`` twin), and past 64 the JVM silently wraps shift
    counts mod 64.  Wider domains must be pre-scaled (``>> s``)
    upstream — exactly what write_zordered's bucket derivation does."""
    if bits > 31:
        raise ValueError(f"zvalue supports at most 31 bits/dim: {bits}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(x.cast("long"), i).bitwiseAND(
                    F.lit(1).cast("long")
                ),
                2 * i,
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(y.cast("long"), i).bitwiseAND(
                    F.lit(1).cast("long")
                ),
                2 * i + 1,
            )
        )
    return z


def _interleave(a: int, b: int, bits: int) -> int:
    """Python twin of :func:`zvalue` for driver-side covering-cell
    enumeration (must agree bit-for-bit with the column expression —
    property-tested in tests/test_zorder.py)."""
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    prefix_bits: int = 3,
) -> dict:
    """Write ``df`` z-order-clustered on (x_col, y_col): partitioned
    by the quadtree cell ``z_bucket``, z-sorted within partitions.

    The per-column shift (how many low bits fall inside a cell) is
    sized from the data's actual domain — one max() aggregate, two
    scalars to the driver — and recorded in a ``_zorder_layout.json``
    sidecar (underscore-prefixed: invisible to parquet directory
    readers) so later readers derive covering cells without rescanning.
    Negative keys are rejected (Morton interleave needs a
    non-negative domain; offset upstream if needed)."""
    mx, my, neg = (
        df.select(
            F.max(F.col(x_col)).alias("mx"),
            F.max(F.col(y_col)).alias("my"),
            (
                F.min(F.least(F.col(x_col), F.col(y_col))) < 0
            ).alias("neg"),
        )
        .collect()[0]
    )
    if mx is None or my is None:
        raise ValueError("cannot z-order an empty input")
    if neg:
        raise ValueError(
            f"zorder columns must be non-negative: {x_col}/{y_col}"
        )
    bits_x = max(int(mx).bit_length(), prefix_bits)
    bits_y = max(int(my).bit_length(), prefix_bits)
    if max(bits_x, bits_y) > 31:
        # zvalue's hard cap: pre-scale wider domains upstream
        raise ValueError(
            f"zorder domain too wide ({bits_x}/{bits_y} bits; max 31"
            " per dimension) — shift the keys down before clustering"
        )
    shift_x, shift_y = bits_x - prefix_bits, bits_y - prefix_bits
    meta = {
        "x_col": x_col,
        "y_col": y_col,
        "prefix_bits": prefix_bits,
        "shift_x": shift_x,
        "shift_y": shift_y,
        "bits_x": bits_x,
        "bits_y": bits_y,
    }
    bucket = zvalue(
        F.shiftrightunsigned(F.col(x_col).cast("long"), shift_x),
        F.shiftrightunsigned(F.col(y_col).cast("long"), shift_y),
        prefix_bits,
    )
    (
        df.withColumn("z_bucket", bucket)
        .repartition("z_bucket")
        .sortWithinPartitions(
            zvalue(F.col(x_col), F.col(y_col), max(bits_x, bits_y))
        )
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f)
    return meta


def read_layout(path: str) -> dict:
    with open(os.path.join(path, _META_FILE)) as f:
        return json.load(f)


def covering_buckets(
    meta: dict, x_range: tuple[int, int], y_range: tuple[int, int]
) -> list[int]:
    """The quadtree cells a query box intersects — pure driver-side
    integer arithmetic on the layout metadata (cell = top
    ``prefix_bits`` of each dimension, so the covering set is the
    cross product of the two prefix ranges, interleaved)."""
    pb, sx, sy = meta["prefix_bits"], meta["shift_x"], meta["shift_y"]
    hi = (1 << pb) - 1
    xs = range(
        max(x_range[0] >> sx, 0), min(x_range[1] >> sx, hi) + 1
    )
    ys = range(
        max(y_range[0] >> sy, 0), min(y_range[1] >> sy, hi) + 1
    )
    return sorted(
        _interleave(a, b, pb) for a in xs for b in ys
    )


def zorder_range_query(
    spark: SparkSession,
    path: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
) -> DataFrame:
    """Box query over a z-ordered layout: covering-cell IN-list
    (partition pruning at plan time) + the exact box predicate
    (row-group pruning via pushed min/max stats inside surviving
    files).  Result is layout-independent — identical to filtering
    the raw table (the oracle contract)."""
    meta = read_layout(path)
    cells = covering_buckets(meta, x_range, y_range)
    x, y = F.col(meta["x_col"]), F.col(meta["y_col"])
    return (
        spark.read.parquet(path)
        .filter(F.col("z_bucket").isin(cells))
        .filter(x.between(*x_range) & y.between(*y_range))
        .drop("z_bucket")
    )
