"""AS-OF join — match each left row to the latest right row at or
before its timestamp, per key (the canonical market-data lookup:
"price as of event time").

Spark has no native as-of join; the task brief names it as the
archetypal custom operator.  This implementation is a composition of
built-ins (option (a) of the brief's ladder — no UDF, no pandas):

    tag left/right rows → union → one window sorted by
    (key, ts, side) → last(payload, ignorenulls) carries the most
    recent right payload forward → keep left rows.

Cost: ONE shuffle+sort on (keys, ts) for both inputs together —
the same lower bound a merge-based as-of algorithm pays.  No
point-in-time explode, no per-row lookup.  Tie semantics: a right
row AT the left timestamp is visible (>=), matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` which serves as the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``{prefix}{payload}`` columns from the latest right
    row with ``right_ts <= left_ts`` on the same key (nulls when no
    right row precedes the left row)."""
    left_types = dict(left.dtypes)
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        *[F.lit(None).cast(left_types[c]).alias(f"__l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[p]).alias(f"__p_{p}") for p in payload],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal __t → inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_r.unionByName(tagged_l, allowMissingColumns=False)
    carried = unioned.select(
        *keys,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c not in keys],
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
