"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (SURVEY.md §2.10's sanctioned Arrow-batch
escape hatch, applied to streaming state).

The batch twin is ext/pipeline.sessionize (gaps-and-islands over a
window); this is the same semantics expressed incrementally: per-user
state holds the ONE open session; an event inside ``gap`` extends it,
an event beyond ``gap`` closes it (emit) and opens a new one, and the
event-time timeout closes sessions the watermark has passed — so
state is O(active users), not O(history), and late events beyond the
watermark are dropped by the engine rather than corrupting closed
sessions.

Exactness contract: identical to the batch operator when events
arrive in event-time order per user (the test replays ordered
micro-batches and asserts parity with ext/pipeline.sessionize).
Out-of-order *within* a micro-batch is handled (rows are sorted
before folding); cross-batch disorder inside the gap merges into the
open session but cannot resurrect an emitted one — the documented
approximation of any streaming sessionizer with bounded state.

Money determinism: values fold as integer cents (the twin of the
batch path's DECIMAL sum), never as float accumulation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)

# (session_seq, start_us, end_us, n_events, total_cents)
_STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def _to_us(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[us]").astype("int64")


def _emit(user_id: int, seq: int, start_us: int, end_us: int, n: int, cents: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_seq": seq,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(end_us, unit="us"),
        "n_events": n,
        "total_cents": cents,
    }


def make_session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[dict[str, Any]] = []
        if state.hasTimedOut:
            if state.exists:
                seq, s_us, e_us, n, cents = state.get
                closed.append(_emit(user_id, seq, s_us, e_us, n, cents))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = _to_us(rows["ts"]).to_list()
            cents_col = (
                (rows["value"].round(2) * 100).round().astype("int64").to_list()
            )
            if state.exists:
                seq, s_us, e_us, n, cents = state.get
            else:
                seq, s_us, e_us, n, cents = 0, None, None, 0, 0
            for t, c in zip(ts_us, cents_col):
                if s_us is None:
                    seq, s_us, e_us, n, cents = seq + 1, t, t, 1, c
                elif t - e_us > gap_us:
                    closed.append(_emit(user_id, seq, s_us, e_us, n, cents))
                    seq, s_us, e_us, n, cents = seq + 1, t, t, 1, c
                else:
                    e_us, n, cents = max(e_us, t), n + 1, cents + c
            state.update((seq, s_us, e_us, n, cents))
            # Close via event-time timeout once the watermark passes
            # the open session's gap horizon (clamped above the
            # current watermark — Spark rejects timeouts in the past).
            horizon_ms = e_us // 1000 + gap_us // 1000
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(closed)

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """events readStream → closed sessions (append mode).  One row per
    CLOSED session; the open tail session per user stays in state
    until the watermark passes its horizon."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
