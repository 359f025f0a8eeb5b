"""Streaming windowFunnel: real-time funnel progression via
``applyInPandasWithState``.

The batch twin is ext/pipeline.window_funnel (anchor-carrying range
windows); this is the same chain acceptance expressed incrementally
for the fixed 3-step funnel: per-user state holds, for each chain
level, the accepted rows of that level still inside the trailing
window together with the level-1 anchor that pins their chain, plus
the deepest level achieved so far.  A row is emitted whenever a
user's funnel level INCREASES — the progression feed a realtime
dashboard consumes — so max(funnel_level) per user over the stream
equals the batch operator's result (parity pytest:
tests/test_stream_funnel.py).

Chain semantics (identical to batch): steps in non-strict event-time
order, every accepted chain pinned within ``window`` of its level-1
anchor; within a micro-batch rows fold in (ts, event_id) order.

State: best_level + per-level (row_time, anchor) lists pruned to the
trailing window on every event — O(user's events inside the window),
the same bound as any sliding-window operator; ``best_level`` is
O(1) forever, so progression rows are exactly-once per level.  A
production deployment would TTL-purge the window lists on an
event-time timeout while persisting best_level; kept always-on here
for replay determinism.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_level", LongType()),
        StructField("achieved_at", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("best_level", LongType()),
        StructField("l1", ArrayType(LongType())),  # level-1 anchor times
        StructField("l2_rt", ArrayType(LongType())),  # accepted level-2 rows
        StructField("l2_anchor", ArrayType(LongType())),
    ]
)


def make_funnel_fn(steps: tuple[str, str, str], window_minutes: int):
    w_us = window_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64").to_list()
        types = rows["event_type"].to_list()
        if state.exists:
            best, l1, l2_rt, l2_anchor = state.get
            l1, l2_rt, l2_anchor = list(l1), list(l2_rt), list(l2_anchor)
        else:
            best, l1, l2_rt, l2_anchor = 0, [], [], []
        out: list[dict[str, Any]] = []

        def emit(level: int, t: int) -> None:
            out.append(
                {
                    "user_id": user_id,
                    "funnel_level": level,
                    "achieved_at": pd.Timestamp(t, unit="us"),
                }
            )

        for t, et in zip(ts_us, types):
            lo = t - w_us
            l1 = [a for a in l1 if a >= lo]
            keep = [i for i, rt in enumerate(l2_rt) if rt >= lo]
            l2_rt = [l2_rt[i] for i in keep]
            l2_anchor = [l2_anchor[i] for i in keep]
            if et == steps[0]:
                l1.append(t)
                if best < 1:
                    best = 1
                    emit(1, t)
            elif et == steps[1]:
                if l1:  # anchors in window by pruning; all ≤ t by order
                    l2_rt.append(t)
                    l2_anchor.append(max(l1))
                    if best < 2:
                        best = 2
                        emit(2, t)
            elif et == steps[2]:
                ok = [a for a in l2_anchor if a >= lo]
                if ok and best < 3:
                    best = 3
                    emit(3, t)
        state.update((best, l1, l2_rt, l2_anchor))
        if out:
            yield pd.DataFrame(out)

    return fn


def funnel_stream(
    events_stream: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    window_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """events readStream → funnel progression rows (append mode): one
    row per (user, level) the first time that level is reached."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_fn(steps, window_minutes),
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
