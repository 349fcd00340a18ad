"""Streaming event-type transition counts — the streaming twin of
``operators.temporal.event_transitions``.

The batch operator derives (prev → next) pairs with a lead() window over
each user's full history; a stream can't re-scan history, so each user
keeps exactly ONE row of state — the (timestamp, type) of their latest
event — and every arriving event completes at most one pair against it.
O(1) state per user (the cheapest possible stateful operator: the
transition matrix itself lives downstream as an ordinary additive
aggregation, never in keyed state), Arrow-batched per key.

Output mode: append — each micro-batch emits the (prev_type, next_type,
n) pair counts COMPLETED in that batch; counts are additive, so any
consumer (a streaming agg, a dashboard upsert, the drained-output sum)
reconstructs the exact batch matrix.

Ordering contract: within a micro-batch the group's rows are sorted by
(ts, event_id) — the batch operator's exact total order; ACROSS batches
the stream must deliver each user's events in event-time order (the
CDC-ordered-ingest assumption the growth twin documents). With that
contract the drained pair counts equal the batch operator's
EXACTLY (pytest-pinned, including a pair spanning a batch boundary).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("prev_type", T.StringType(), False),
        T.StructField("next_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

TRANS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType(), False),
        T.StructField("last_type", T.StringType(), False),
    ]
)


def _transition_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows) if len(rows) > 1 else rows[0]
    pdf = pdf.sort_values(["us", "event_id"])  # the batch total order
    types = pdf["event_type"].tolist()
    if state.exists:
        last_us, last_type = state.get
        chain = [last_type, *types]
    else:
        chain = types
    state.update((int(pdf["us"].iloc[-1]), types[-1]))
    if len(chain) < 2:
        return
    counts: dict[tuple[str, str], int] = {}
    for prev, nxt in zip(chain, chain[1:]):
        counts[(prev, nxt)] = counts.get((prev, nxt), 0) + 1
    yield pd.DataFrame(
        {
            "prev_type": [p for p, _n in counts],
            "next_type": [n for _p, n in counts],
            "n": list(counts.values()),
        }
    )


def transitions_stream(events: DataFrame) -> DataFrame:
    """Per-user last-event state completing (prev → next) pairs as events
    arrive; see module docstring for the contract."""
    keyed = events.select(
        "user_id",
        F.unix_micros(F.col("event_time")).alias("us"),
        "event_id",
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _transition_group,
        outputStructType=TRANS_OUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
