"""Property-based tests for the r6 custom operators against
independent pandas references (SURVEY.md §5 item 3 style):

- ``asof_join(direction, tolerance)`` must agree with
  ``pandas.merge_asof(..., allow_exact_matches=True, tolerance=...)``
  on random (key, timestamp) layouts — pandas is the semantics the
  operator documents, and it exercises empty keys, all-late rows,
  duplicate left timestamps, and tolerance boundaries for free.
- the blocked EMA scan must agree with ``pandas.ewm(adjust=True)``
  on random series lengths / spans / block sizes, including block
  sizes that force deep entering-state composition.

Example counts stay small: each example runs Spark jobs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trade_data_collection_service_spark.operators.asof import asof_join
from trade_data_collection_service_spark.operators.ema import with_ema

BASE = datetime(2024, 1, 1)


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(min_value=1, max_value=15))
    n_right = draw(st.integers(min_value=0, max_value=10))
    keys = ["K1", "K2"]
    left = [
        (
            draw(st.sampled_from(keys)),
            BASE + timedelta(seconds=draw(st.integers(0, 600))),
            i,
        )
        for i in range(n_left)
    ]
    right = [
        (
            draw(st.sampled_from(keys)),
            BASE + timedelta(seconds=draw(st.integers(0, 600))),
            float(100 + i),
        )
        for i in range(n_right)
    ]
    tol = draw(st.sampled_from([None, 30, 120]))
    direction = draw(st.sampled_from(["backward", "forward"]))
    return left, right, tol, direction


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_case())
def test_asof_tolerance_matches_pandas_merge_asof(spark, case):
    left, right, tol, direction = case
    ldf = spark.createDataFrame(left, ["k", "ts", "event_id"])
    # deduplicate right timestamps per key: merge_asof picks the LAST
    # row among equal timestamps, our operator picks the max
    # tiebreaker — align by making (k, ts) unique
    seen = set()
    right_u = []
    for k, ts, v in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_u.append((k, ts, v))
    rdf = spark.createDataFrame(
        right_u or [("K_none", BASE, 0.0)], ["k", "rts", "close"]
    )
    got = {
        r["event_id"]: r["asof_close"]
        for r in asof_join(
            ldf,
            rdf,
            ["k"],
            "ts",
            "rts",
            ["close"],
            direction=direction,
            tolerance=f"{tol} seconds" if tol else None,
        ).collect()
    }
    lp = pd.DataFrame(left, columns=["k", "ts", "event_id"]).sort_values(
        "ts", kind="mergesort"
    )
    rp = pd.DataFrame(
        right_u or [("K_none", BASE, 0.0)], columns=["k", "rts", "close"]
    ).sort_values("rts", kind="mergesort")
    want_df = pd.merge_asof(
        lp,
        rp,
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=tol) if tol else None,
    )
    want = {
        int(r.event_id): (None if pd.isna(r.close) else float(r.close))
        for r in want_df.itertuples()
    }
    assert got == want


@st.composite
def ema_case(draw):
    n_rows = draw(st.integers(min_value=1, max_value=120))
    span = draw(st.sampled_from([2, 5, 9, 20]))
    block = draw(st.sampled_from([3, 17, 64, 100_000]))
    seed = draw(st.integers(0, 10_000))
    return n_rows, span, block, seed


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ema_case())
def test_ema_matches_pandas_on_random_series(spark, case):
    n_rows, span, block, seed = case
    rng = np.random.default_rng(seed)
    px = 50 + np.cumsum(rng.normal(0, 2, n_rows))
    rows = [
        ("E", "S", BASE + timedelta(minutes=i), float(p))
        for i, p in enumerate(px)
    ]
    df = spark.createDataFrame(
        rows, ["exchange", "symbol", "start", "close"]
    )
    got = (
        with_ema(
            df, ["exchange", "symbol"], "start", ["close"], [span], ["e"],
            block=block,
        )
        .orderBy("start")
        .select("e")
        .toPandas()["e"]
        .to_numpy()
    )
    want = (
        pd.Series(px).ewm(span=span, adjust=True).mean().to_numpy()
    )
    assert np.max(np.abs(got - want) / np.maximum(1.0, np.abs(want))) < 1e-10
