"""Streaming windowed duplicate suppression — the streaming twin of
``operators.temporal.event_dedup_report`` (17az), the ingest-side shape:
an at-least-once telemetry feed wants every retry flagged AS IT ARRIVES,
not in a nightly batch sweep.

The batch operator lags over each (user, type, value) payload identity
and flags an event as duplicate when its predecessor in that identity is
within ``window_us`` — chain-collapsing (each retry is judged against its
PREDECESSOR, so a storm collapses to its head however long it runs, each
hop individually inside the window). A stream can't re-scan the identity
history, so each identity keeps exactly ONE long of state — the
microsecond timestamp of its latest event — and every arriving event is
judged against it then replaces it. O(1) state per identity, Arrow-batched
per key; the identity key space is bounded by distinct payloads, the same
cardinality the batch shuffle partitions on.

Output mode: append — each micro-batch emits one (event_type, n_events,
n_duplicates) increment row per active identity group; the counts are
additive, so the drained sum per event type (with n_kept = n_events −
n_duplicates) reconstructs the batch report EXACTLY (pytest-pinned,
including a retry storm spanning a micro-batch boundary, where the
head lives in state from the previous batch).

Ordering contract: within a micro-batch the group sorts by
(us, event_id) — the batch operator's total order; ACROSS batches each
identity's events must arrive in event-time order (the CDC-ordered-ingest
assumption the growth/transition/gapfill twins document). The gap compare
is integer microseconds — no double rounding at the window edge.

State eviction (the 100 TB part): the identity key space grows with
distinct (user, type, value) payloads ever seen, so state must NOT live
forever. An identity's single long is provably dead once the event-time
watermark passes ``last_us + window_us`` — any event admitted after that
has ``us ≥ watermark > last_us + window_us`` ⇒ non-duplicate whether or
not the state row exists — so the twin runs under ``EventTimeTimeout``
with the timeout set exactly there, and the watermark delay set to
``horizon_us`` (the cross-identity event-time skew bound: ordering is
only per identity, so a slow identity's fresh event may trail the global
max by up to the horizon). Eviction therefore NEVER changes output; it
bounds live state to identities active within the last
``horizon_us + window_us`` of event time instead of all history.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.temporal import DUP_WINDOW_US

#: how far behind the global max event time a (per-identity-ordered)
#: identity's next event may arrive; state survives horizon + window
DEDUP_STATE_HORIZON_US = 24 * 3600 * 1_000_000

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_duplicates", T.LongType(), False),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("last_us", T.LongType(), False)]
)


def _make_dedup_group(window_us: int):
    def _dedup_group(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # the watermark passed last_us + window_us: any future event
            # in this identity is non-dup with or without the state row
            state.remove()
            return
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        pdf = pd.concat(rows) if len(rows) > 1 else rows[0]
        pdf = pdf.sort_values(["us", "event_id"])  # the batch total order
        (_user_id, event_type, _value) = key
        last_us = state.get[0] if state.exists else None
        n_dup = 0
        for us in pdf["us"].tolist():
            us = int(us)
            if last_us is not None and (us - last_us) <= window_us:
                n_dup += 1
            last_us = us  # chain-collapse: the predecessor moves forward
        state.update((int(last_us),))
        # dead once watermark > last + window (ms-ceil keeps the proof
        # at ms granularity: an admitted event has us_ms >= wm_ms >
        # ceil((last+window)/1000) => us - last > window => non-dup)
        state.setTimeoutTimestamp(-(-(last_us + window_us) // 1000) + 1)
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_events": [len(pdf)],
                "n_duplicates": [n_dup],
            }
        )

    return _dedup_group


def dedup_window_stream(
    events: DataFrame,
    window_us: int = DUP_WINDOW_US,
    horizon_us: int = DEDUP_STATE_HORIZON_US,
) -> DataFrame:
    """Per-payload-identity last-timestamp state flagging in-window
    repeats as they arrive; see module docstring for the contract
    (incl. the watermark-driven state eviction ``horizon_us`` bounds).
    ``events`` needs (user_id, event_type, value, event_time, event_id)."""
    keyed = events.withWatermark(
        "event_time", f"{horizon_us} microseconds"
    ).select(
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.unix_micros(F.col("event_time")).alias("us"),
        "event_id",
        "event_time",  # carries the watermark into the stateful op
    )
    return keyed.groupBy("user_id", "event_type", "value").applyInPandasWithState(
        _make_dedup_group(window_us),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
