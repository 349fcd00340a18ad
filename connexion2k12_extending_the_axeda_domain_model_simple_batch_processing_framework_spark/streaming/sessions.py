"""Streaming gap sessionization: per-user session state across micro-batches.

The streaming twin of ``operators.temporal.sessionize``. The batch operator
sees each user's full history and cuts sessions with one window pass; a
stream closes sessions incrementally: each user key holds its OPEN session
(start, last-seen, count, value sum) in the state store, an arriving event
either extends it or — when the gap since the last event exceeds the
threshold — emits the closed session and opens a new one, and a state
timeout flushes sessions for users who simply stop sending. O(1) state per
user, hash-partitioned across executors; the same
``applyInPandasWithState`` custom-stateful shape as ``streaming.anomaly``
(Arrow-batched per key, never row-at-a-time over the stream).

Semantics parity with the batch operator: same 30-minute gap constant, same
(user, session) grain, same exact DECIMAL(18,2) value sum (carried in state
as integer cents so state stays fixed-width), and sessions indexed 1..n per
user in order — a drained stream over a static file yields the same rows
as ``temporal.sessionize`` up to the open tail session, which only the
timeout can close.

**session_idx uniqueness is bounded by state retention.** After a flush
the residual state carries the incremented counter for one more
SESSION_FLUSH_MS window, so a user resuming within ~2× SESSION_FLUSH_MS
continues at next_idx+1; a user returning AFTER the residual has aged out
(state dropped — per-key state cannot live forever) restarts at
session_idx 1 and can repeat an already-emitted (user_id, session_idx)
key. Sinks that need a globally collision-free key should use
(user_id, session_start): session_start is strictly later for any
post-retention return, so it never repeats. This is the standard
retention trade — matching the batch operator's 1..n indexing exactly
would require unbounded state.
"""

from __future__ import annotations

from collections.abc import Iterable
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.temporal import SESSION_GAP_US

#: flush an open session if its user goes quiet for this long (processing
#: time) — keeps per-user state from living forever
SESSION_FLUSH_MS = 60 * 60 * 1000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_idx", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value_cents", T.LongType(), False),
    ]
)

#: open-session state: next index to assign, start/last in epoch-micros,
#: event count, exact value sum in cents
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_idx", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_cents", T.LongType(), False),
    ]
)


def _cents(v: float) -> int:
    """Exact twin of Spark's double→DECIMAL(18,2) cast: HALF_UP over the
    double's SHORTEST decimal representation (Java BigDecimal.valueOf).
    ``int(v*100 + 0.5)`` is NOT that twin: value 0.615 is 62 cents in the
    batch operator but 0.615*100 == 61.4999… in binary, so the naive form
    under-counts by a cent. ``repr(float)`` is Python's shortest-repr,
    matching what the JVM cast parses."""
    return int(
        Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        .scaleb(2)
    )


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key

    if state.hasTimedOut:
        next_idx, start_us, last_us, n_events, sum_cents = state.get
        if n_events > 0:
            # user went quiet: flush the open session, but KEEP a residual
            # state carrying the incremented index — a user resuming
            # within the residual's retention window continues at
            # next_idx+1 instead of restarting at 1 (see module docstring
            # for the bounded-uniqueness contract beyond that window)
            state.update((next_idx + 1, 0, 0, 0, 0))
            state.setTimeoutDuration(SESSION_FLUSH_MS)
            yield _emit(user_id, next_idx, start_us, last_us, n_events, sum_cents)
        else:
            # second idle period with nothing open: the residual has aged
            # out too, so the key's state can finally be dropped
            state.remove()
        return

    if state.exists:
        next_idx, start_us, last_us, n_events, sum_cents = state.get
    else:
        next_idx, start_us, last_us, n_events, sum_cents = 1, 0, 0, 0, 0

    closed = []
    # materialize the WHOLE group before sorting: applyInPandasWithState
    # splits a large group into multiple Arrow chunks (default ~10k rows
    # via arrow.maxRecordsPerBatch) in no particular event-time order, so
    # per-chunk sorting would replay chunks out of order — negative gaps,
    # wrong session cuts. One concat + one sort restores the exact
    # (ts, event_id) order the batch window uses.
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        for us, value in zip(ts_us, pdf["value"]):
            if n_events > 0 and (us - last_us) > SESSION_GAP_US:
                closed.append(
                    (user_id, next_idx, start_us, last_us, n_events, sum_cents)
                )
                next_idx += 1
                n_events, sum_cents = 0, 0
            if n_events == 0:
                start_us = int(us)
            last_us = int(us)
            n_events += 1
            sum_cents += _cents(float(value))

    state.update((next_idx, start_us, last_us, n_events, sum_cents))
    state.setTimeoutDuration(SESSION_FLUSH_MS)
    if closed:
        yield pd.concat([_emit(*c) for c in closed], ignore_index=True)


def _emit(
    user_id, idx, start_us, last_us, n_events, sum_cents
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_idx": [idx],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n_events],
            "sum_value_cents": [sum_cents],
        }
    )


def session_stream(events: DataFrame) -> DataFrame:
    """Streaming sessions. Input: a streaming frame with (user_id,
    event_id, value, ts). Emits one row per CLOSED session — closed by a
    gap-exceeding event or by the idle timeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
