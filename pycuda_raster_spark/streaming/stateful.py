"""Custom stateful streaming operator: incremental sessionization.

``applyInPandasWithState`` is the engine's escape hatch for operators
Structured Streaming lacks natively (SURVEY.md §2.8; the reference has no
event-time state at all — this is part of the engine's streaming surface
for incremental ingest pipelines). Sessionization here is the canonical
example: per-user session assembly where state (the open session) must
survive across micro-batches.

Semantics (identical to the batch lag/gap definition in
__spark_entry__.q_sessionize): events of one user belong to one session
while consecutive events are <= gap apart; a new event later than
``gap`` after the previous one closes the session and opens a new one.

Output: one row per CLOSED session (append mode); a session closes when a
later event arrives (or the state times out after the watermark passes).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

GAP = dt.timedelta(minutes=30)
_US = 1_000_000


def _ts_to_us(ts) -> int:
    if isinstance(ts, pd.Timestamp):
        return ts.value // 1000
    return int(ts.timestamp() * _US)


def sessionize_stateful(
    events: DataFrame, gap: dt.timedelta = GAP, timeout_ms: int = 0
) -> DataFrame:
    """Streaming (or batch) DataFrame of (user_id, ts, ...) -> closed
    sessions via applyInPandasWithState (streaming-only API). Each user's
    FINAL session stays open in the state store until a later event or a
    processing-time timeout closes it — so after a bounded run, emitted
    sessions == the batch lag/gap definition minus each user's last
    session (tests assert exactly that)."""
    gap_us = int(gap.total_seconds() * _US)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            })
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(_ts_to_us(v) for v in pdf["ts"])
        ts_list.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        out: dict[str, list[Any]] = {"user_id": [], "session_start": [],
                                     "session_end": [], "n_events": []}
        for t in ts_list:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us <= gap_us:
                last_us, n = t, n + 1
            else:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                out["n_events"].append(n)
                start_us, last_us, n = t, t, 1
        if start_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        if out["user_id"]:
            yield pd.DataFrame(out)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
