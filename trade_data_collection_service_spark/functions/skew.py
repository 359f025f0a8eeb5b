"""Skew mitigation utilities (task brief: "skewed keys hurt … salting
for skew, AQE for runtime re-plan").

Where skew is already handled without these helpers:
- algebraic aggregations (rollups, dedup-as-agg) get map-side partial
  aggregation — a hot symbol collapses before the shuffle;
- sort-merge/shuffled-hash joins get AQE skew-join splitting
  (enabled in session.py).

``salted_join`` covers the remaining case: a shuffle join with one
pathologically hot key where the build side is too big to broadcast
and AQE's split granularity isn't enough.  The left (big, skewed)
side gets a deterministic salt derived from its non-key columns; the
right side is replicated once per salt value — classic key-salting,
expressed declaratively so Catalyst still prunes/pushes around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join with the hot-key pressure spread across ``salt`` buckets.

    Left rows are salted by a hash of ALL their columns (deterministic
    under task retries — no rand()); right rows are exploded into all
    salt buckets.  Output columns match a plain ``left.join(right,
    on, how)``.  Cost: the right side shuffles ``salt``× its size —
    use only when the right side is modest and a key is genuinely hot.
    """
    if how.replace("_", "").lower() not in {"inner", "left", "leftouter", "leftsemi", "leftanti"}:
        # replicating the right side breaks right/full-outer semantics
        # (unmatched right rows would appear once per salt bucket)
        raise ValueError(f"salted_join supports inner/left-flavored joins, got {how!r}")
    lsalt = F.pmod(F.abs(F.hash(*[F.col(c) for c in left.columns])), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")
