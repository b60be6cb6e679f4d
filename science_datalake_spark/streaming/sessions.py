"""Custom stateful streaming: sessionization via applyInPandasWithState.

The windowed aggs in events.py cover fixed windows; sessions (dynamic
inactivity-gap windows) need per-key state. Semantics: events for a user
belong to one session while gaps stay under ``gap``; a completed session
is emitted when a later event opens a new one. The in-progress session
stays in state across micro-batches (emitted only when superseded — a
production job would add an event-time timeout to flush idle sessions).

Assumes per-key event-time order ACROSS micro-batches (true for a file
stream whose files arrive in time order; FileStreamSource processes by
modification time). Out-of-order arrival needs a watermark + buffered
reordering in state — out of scope for this operator.

Scale: state is one tiny tuple per user key, partitioned by the group key;
exactly the applyInPandasWithState cost model. Arrow-batched — each group's
micro-batch rows arrive as pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

#: (session_start_us, session_end_us, n_events, total_value)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # datetime64[ns] → epoch microseconds (int64 view is NANOseconds)
    ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
    values = rows["value"].to_numpy()

    if state.exists:
        start_us, end_us, n, total = state.get
    else:
        start_us, end_us, n, total = None, None, 0, 0.0

    completed: list[tuple[int, int, int, int, float]] = []
    for t, v in zip(ts_us, values):
        t = int(t)
        if start_us is None:
            start_us, end_us, n, total = t, t, 1, float(v)
        elif t - end_us > GAP_US:
            completed.append((user_id, start_us, end_us, n, total))
            start_us, end_us, n, total = t, t, 1, float(v)
        else:
            end_us, n, total = t, n + 1, total + float(v)

    state.update((start_us, end_us, n, round(total, 6)))
    if completed:
        yield pd.DataFrame(
            completed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "total_value"],
        )


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Completed sessions per user (append mode). ``gap_minutes`` is fixed
    at module level for the state function (30 min, matching the batch
    events_sessionize query)."""
    assert gap_minutes == 30, "streaming session gap is pinned to the batch twin's 30min"
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
