"""Streaming anomaly detection: per-key running z-score via keyed state.

The streaming twin of ``operators.analytics.value_anomalies``. The batch
operator scores against the user's FULL history in two passes; a stream
can't re-scan history, so each key keeps Welford running moments
(count, mean, M2) in the state store — O(1) state per user, hash-
partitioned across executors — and every arriving value is scored
against the history BEFORE it is absorbed. This is the
``applyInPandasWithState`` custom-stateful-operator shape: Arrow-batched
per key, no row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.analytics import ANOMALY_Z  # one threshold, batch + stream

MIN_HISTORY = 5  # don't flag until the baseline has this many values

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("zscore", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("m2", T.DoubleType(), False),
    ]
)


def _score_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)

    out = []
    for pdf in pdfs:
        if pdf.empty:
            continue
        # deterministic replay order within the micro-batch
        pdf = pdf.sort_values(["event_time", "event_id"])
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            v = float(value)
            if n >= MIN_HISTORY:
                var = m2 / (n - 1)
                if var > 0:
                    z = (v - mean) / var**0.5
                    if abs(z) > ANOMALY_Z:
                        out.append((user_id, int(event_id), v, round(z, 6)))
            # absorb AFTER scoring: an outlier must not mask itself
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)

    state.update((n, mean, m2))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "zscore"])


def value_anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user z-score outliers. Input: a streaming frame with
    (user_id, event_id, value, event_time). Emits one row per flagged
    event, scored against the user's running history at arrival time."""
    return events.groupBy("user_id").applyInPandasWithState(
        _score_group,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
