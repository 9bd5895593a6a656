"""Custom stateful streaming operator: per-user sessionization.

The reference has no streaming at all (SURVEY §2.2); this is the north-star
"custom stateful operator" pattern: `applyInPandasWithState` keyed by
user_id, state = (open session start, last event ts, event count), emitting
a row per CLOSED session when the gap exceeds the threshold or the state
times out.

Batch twin: queries/relational.sessionize_events (lag + cumsum) — the unit
test drives this operator synchronously over the deterministic events table
and asserts the closed sessions agree with the batch query, which is the
strongest check available for a stateful stream (the final open session per
user only closes on timeout, so the stream result is the batch result minus
each user's last session).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

GAP_SECONDS = 30 * 60


def _make_sessionize_group(use_timeout: bool):
    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, use_timeout)

    return fn


def _sessionize_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, use_timeout: bool = True
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0

    closed = []
    for t in ts_list:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > GAP_SECONDS * 1_000_000:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1

    if start is not None:
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(60_000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stream(events_stream: DataFrame, use_timeout: bool = True) -> DataFrame:
    """events stream (ts timestamp, user_id long, ...) → closed sessions.

    ``use_timeout=True`` (production streams): idle sessions are flushed via a
    processing-time timeout.  ``use_timeout=False`` (the synchronous
    `availableNow` test driver): sessions close only when a later event
    arrives — with pending timeouts an availableNow query never terminates
    (endless "cleaning up state" micro-batches), and timeout-free semantics
    are exactly reproducible against the batch twin.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_group(use_timeout),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout,
        )
    )


def run_sessionize_on_events(spark, events_path: str) -> DataFrame:
    """Drive the stateful stream synchronously over the events parquet and
    return the closed sessions as a batch DataFrame."""
    import uuid

    from vector_graph_rag_spark.streaming.ingest import _event_stream

    stream = _event_stream(spark, events_path)
    name = "sess_" + uuid.uuid4().hex[:12]
    q = (
        sessionize_stream(stream, use_timeout=False)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)
