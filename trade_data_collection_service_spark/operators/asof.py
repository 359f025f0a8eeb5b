"""AS-OF join — match each left row to the latest right row at or
before its timestamp, per key (the canonical market-data lookup:
"price as of event time").

Spark has no native as-of join; the task brief names it as the
archetypal custom operator.  This implementation is a composition of
built-ins (option (a) of the brief's ladder — no UDF, no pandas):

    tag left/right rows → union → one window sorted by
    (key, ts, side) → last(struct(right_ts, payload...), ignorenulls)
    carries the most recent right ROW forward → keep left rows.

Cost: ONE shuffle+sort on (keys, ts) for both inputs together —
the same lower bound a merge-based as-of algorithm pays.  No
point-in-time explode, no per-row lookup.  Tie semantics: a right
row AT the left timestamp is visible (>=), matching DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` which serves as the oracle twin.

Oracle-divergence note (ADVICE r1): this operator is LEFT-OUTER — a
left row with no preceding right row keeps null payloads — while
DuckDB's ``ASOF JOIN`` is INNER (such rows are dropped).  The
``asof_price`` oracle query hash-matches because the fixture
guarantees every event a same-minute candle; callers comparing
against an inner as-of must filter the null-payload rows.
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
    right_order: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Left rows + ``{prefix}{payload}`` columns from the latest right
    row with ``right_ts <= left_ts`` on the same key (nulls when no
    right row precedes the left row).

    ``right_order``: deterministic tiebreaker among right rows sharing
    the same (key, right_ts) — e.g. a version/receipt column; the
    LARGEST value wins for backward, the SMALLEST for forward.
    Defaults to the payload columns themselves, so the winning payload
    is always a total-order choice and results are stable across
    runs/partitionings (ADVICE r1: ``orderBy(__t, __side)`` alone is
    not a total order under duplicate right timestamps).

    ``direction``: ``"backward"`` (default — latest right row at or
    before the left timestamp) or ``"forward"`` (earliest right row at
    or after it; DuckDB twin: ``ASOF LEFT JOIN ... ON l.ts <= r.ts``).
    Same single shuffle+sort either way — only the carry window's
    frame and the equal-timestamp side order flip.

    ``tolerance``: optional max staleness as a SQL interval string
    (e.g. ``"2 minutes"`` — pandas ``merge_asof(tolerance=...)``
    semantics): when the matched right row is further than the
    tolerance from the left timestamp, the payload columns are nulled
    (the match that exists is by construction the NEAREST one in the
    chosen direction, so "no match within tolerance" and "nearest
    match outside tolerance" coincide).  Applied as a map-side
    post-predicate on the carried right timestamp — zero extra
    shuffles."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)
    order_cols = right_order if right_order is not None else payload
    tagged_r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rt"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(order_cols)],
        *[F.lit(None).cast(left_types[c]).alias(f"__l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right_types[right_ts]).alias("__rt"),
        *[F.lit(None).cast(right_types[p]).alias(f"__p_{p}") for p in payload],
        *[
            F.lit(None).cast(right_types[c]).alias(f"__o_{i}")
            for i, c in enumerate(order_cols)
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # Backward: right rows (side 0) sort before left rows at equal
    # __t → inclusive match, carry the LAST right payload from the
    # preceding frame.  Forward: mirror image — left rows first at
    # equal __t (side desc), take the FIRST right payload from the
    # following frame.  Equal right timestamps are totally ordered by
    # the tiebreaker either way.
    tiebreaks = [F.col(f"__o_{i}") for i in range(len(order_cols))]
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__t", "__side", *tiebreaks)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carry = lambda col: F.last(col, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__t", F.col("__side").desc(), *tiebreaks)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carry = lambda col: F.first(col, ignorenulls=True).over(w)  # noqa: E731
    unioned = tagged_r.unionByName(tagged_l, allowMissingColumns=False)
    # Carry the ENTIRE matched right row as ONE struct (timestamp +
    # payloads together), null on left rows, non-null on every right
    # row even when individual payload fields are null.  This pins the
    # tolerance gate and the published payload to the SAME right row:
    # with per-column ignorenulls carries (the previous shape), a
    # nearest right row holding a NULL payload value would pass the
    # staleness check on its own timestamp while the payload silently
    # came from an OLDER row possibly outside the tolerance.  Struct
    # carry also matches pandas ``merge_asof`` semantics exactly: the
    # nearest row's value is taken even when it is null.
    matched = carry(
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__rt"),
                *[F.col(f"__p_{p}") for p in payload],
            ),
        )
    )
    if tolerance is None:
        within = F.lit(True)
    elif direction == "backward":
        within = matched["__rt"] >= F.col("__t") - F.expr(
            f"INTERVAL {tolerance}"
        )
    else:
        within = matched["__rt"] <= F.col("__t") + F.expr(
            f"INTERVAL {tolerance}"
        )
    carried = unioned.select(
        *keys,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c not in keys],
        *[
            F.when(within, matched[f"__p_{p}"]).alias(f"{prefix}{p}")
            for p in payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
