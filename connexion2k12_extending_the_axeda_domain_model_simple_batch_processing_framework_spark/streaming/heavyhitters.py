"""Streaming heavy hitters: Space-Saving counters in keyed state.

The streaming twin of the batch top-k (``functions.skew.heavy_hitters`` /
the ``heavy_users_topk`` query). The batch path can afford an exact
count-all-then-TakeOrdered; a stream cannot hold one counter per distinct
key, so each window keeps a fixed ``capacity`` of Space-Saving counters
(Metwally et al. 2005) in the state store — the standard bounded-state
frequent-elements algorithm:

- a tracked user's arrival increments its counter;
- an untracked user takes over the MINIMUM counter, inheriting its count
  as that counter's ``error`` (the overestimate bound);
- guarantees: every user with true count > n/capacity is tracked, and for
  a tracked user  true ≤ est ≤ true + error.

State is ``capacity`` (user, count, error) triples per window — KBs,
independent of user cardinality — and the per-batch fold is vectorized:
arriving rows collapse to (user, batch_count) via one pandas
``value_counts`` before touching the counters, so the python loop runs
over DISTINCT users of the batch, not rows. Eviction is deterministic
(lowest count, ties to lowest user id) so drained-stream results are
reproducible. Output mode: update (one refreshed top-j per window per
micro-batch).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SS_CAPACITY = 64  # counters per window (state = 3 longs each)
SS_TOPJ = 10      # rows emitted per window per micro-batch

SS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("est_count", T.LongType(), False),
        T.StructField("max_error", T.LongType(), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)

SS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("errors", T.ArrayType(T.LongType()), False),
        T.StructField("n_seen", T.LongType(), False),
    ]
)


def _space_saving_fold(
    counters: dict, arrivals: list[tuple[int, int]], capacity: int
) -> None:
    """Fold (user, batch_count) arrivals into the counter dict
    {user: [count, error]} under the Space-Saving policy, in-place.
    Arrivals are processed in (count desc, user asc) order and eviction
    picks (count asc, user asc) — both deterministic, so replaying the
    same micro-batches reproduces identical counters."""
    for user, cnt in sorted(arrivals, key=lambda uc: (-uc[1], uc[0])):
        if user in counters:
            counters[user][0] += cnt
        elif len(counters) < capacity:
            counters[user] = [cnt, 0]
        else:
            victim = min(counters, key=lambda u: (counters[u][0], u))
            floor = counters.pop(victim)[0]
            counters[user] = [floor + cnt, floor]


def _ss_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (window_start,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        users, counts, errors, n_seen = state.get
        counters = {
            int(u): [int(c), int(e)] for u, c, e in zip(users, counts, errors)
        }
    else:
        counters, n_seen = {}, 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        vc = pdf["user_id"].dropna().astype("int64").value_counts()
        n_seen += int(vc.sum())
        _space_saving_fold(
            counters, [(int(u), int(c)) for u, c in vc.items()], SS_CAPACITY
        )
    users = sorted(counters)
    state.update(
        (
            users,
            [counters[u][0] for u in users],
            [counters[u][1] for u in users],
            n_seen,
        )
    )
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict long-closed windows
    top = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))[:SS_TOPJ]
    yield pd.DataFrame(
        {
            "window_start": [window_start] * len(top),
            "user_id": [u for u, _ in top],
            "est_count": [c for _, (c, _e) in top],
            "max_error": [e for _, (_c, e) in top],
            "n_seen": [n_seen] * len(top),
        }
    )


def heavy_users_stream(events: DataFrame, trunc: str = "hour") -> DataFrame:
    """Streaming per-window heavy hitters via Space-Saving counters in
    keyed state — bounded state at any user cardinality, with the
    tracked-above-n/capacity and est ∈ [true, true+error] guarantees.
    ``trunc`` picks the window granularity (any ``date_trunc`` unit; a
    coarse unit like "year" makes one window span the whole stream,
    which is how the drained-stream ≡ batch-top-k test pins equivalence
    with ``heavy_users_topk``). Output: (window_start, user_id,
    est_count, max_error, n_seen), top-``SS_TOPJ`` rows per window,
    refreshed every micro-batch."""
    keyed = events.select(
        F.date_trunc(trunc, F.col("event_time")).cast("string").alias("win"),
        F.col("user_id"),
    )
    return keyed.groupBy("win").applyInPandasWithState(
        _ss_group,
        outputStructType=SS_OUT_SCHEMA,
        stateStructType=SS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
