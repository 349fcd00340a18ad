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


# --- windowed distinct estimation (mergeable KMV sketch in state) ---------

from ..functions.hashing import hex_hash64  # noqa: E402
from ..operators.sketches import HASH_SPACE, KMV_K  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()), False)]
)

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.StringType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("distinct_estimate", T.DoubleType(), False),
    ]
)


def _kmv_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold arriving user-hashes into the window's k-minimum-values
    sketch. The state is the k smallest hashes — a few hundred longs per
    window regardless of user cardinality, and MERGEABLE: folding new
    values in is the same operation as merging two sketches, which is
    what makes KMV (like HLL) safe for out-of-order, multi-batch
    accumulation."""
    (window_start,) = key
    if state.hasTimedOut:
        # the window closed long ago — evict its sketch
        state.remove()
        return
    mins = list(state.get[0]) if state.exists else []
    n_seen = 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        # null user_id hashes to null → NaN through Arrow; a summary
        # can't count it, and int(NaN) would kill the whole query
        hs = pdf["h"].dropna()
        n_seen += len(hs)
        merged = sorted(set(mins) | set(int(h) for h in hs))
        mins = merged[:KMV_K]
    state.update((mins,))
    # windows close: evict the sketch if no event arrives for a day
    # (state would otherwise grow by one entry per window forever)
    state.setTimeoutDuration(24 * 3600 * 1000)
    if len(mins) < KMV_K:
        est = float(len(mins))
    else:
        est = round((KMV_K - 1) * HASH_SPACE / mins[-1], 4)
    yield pd.DataFrame(
        {
            "window_start": [window_start],
            "n_seen": [n_seen],
            "distinct_estimate": [est],
        }
    )


def distinct_users_stream(events: DataFrame) -> DataFrame:
    """Streaming per-window distinct-user ESTIMATE via a KMV sketch held
    in keyed state — the unbounded-cardinality version of windowed
    countDistinct, whose exact form needs state proportional to the
    distinct count. Same estimator (and same md5 hash) as the batch
    ``sketches.kmv_distinct_tokens``, so batch backfill and streaming
    dashboards agree. Output mode: update (one refreshed row per window
    per micro-batch)."""
    keyed = events.select(
        F.date_trunc("hour", F.col("event_time")).cast("string").alias("win"),
        hex_hash64(F.col("user_id").cast("string")).alias("h"),
    )
    return keyed.groupBy("win").applyInPandasWithState(
        _kmv_group,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
