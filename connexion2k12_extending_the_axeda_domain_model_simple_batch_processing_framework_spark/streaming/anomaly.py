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


# --- robust MAD screen (bottom-k-by-hash reservoir in state) ---------------

from ..operators.analytics import MAD_K  # noqa: E402  (one threshold, batch + stream)

#: per-type reservoir size: the k smallest event-id hashes and their
#: values — a deterministic uniform sample (the KMV trick applied to
#: sampling), MERGEABLE across micro-batches (folding new pairs in is the
#: same op as merging two reservoirs) and bounded at ~4 KB per event type
#: regardless of stream length.
MAD_RESERVOIR_K = 512

MAD_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("hs", T.ArrayType(T.LongType()), False),
        T.StructField("vs", T.ArrayType(T.DoubleType()), False),
    ]
)

MAD_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("med_value", T.DoubleType(), False),
        T.StructField("mad_value", T.DoubleType(), False),
        T.StructField("n_outliers", T.LongType(), False),
        T.StructField("outlier_frac", T.DoubleType(), False),
    ]
)


def _rank_median(vals: list[float]) -> float:
    """The discrete value-at-rank median ``approx_percentile`` returns in
    its exact regime: sorted[floor(0.5 * (n - 1))] (QuantileSummaries'
    rank rule) — matching it makes the drained stream EQUAL the batch
    operator whenever the reservoir holds every value."""
    s = sorted(vals)
    return s[(len(s) - 1) // 2]


def _mad_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        n, hs, vs = state.get
        pairs = list(zip(hs, vs))
    else:
        n, pairs = 0, []
    grew = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        pairs.extend(zip((int(h) for h in pdf["h"]), (float(v) for v in pdf["value"])))
        grew = True
    if grew:
        pairs.sort()
        pairs = pairs[:MAD_RESERVOIR_K]
        state.update((n, [p[0] for p in pairs], [p[1] for p in pairs]))
    if not pairs:
        return
    vals = [p[1] for p in pairs]
    med = _rank_median(vals)
    mad = _rank_median([abs(v - med) for v in vals])
    n_out_sample = sum(1 for v in vals if abs(v - med) > MAD_K * mad)
    frac = round(n_out_sample / len(vals), 6)
    # scaled outlier count: exact whenever the reservoir holds the whole
    # history (n <= MAD_RESERVOIR_K); a sample-rate estimate beyond
    n_out = int(n * n_out_sample / len(vals) + 0.5)
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n": [n],
            "med_value": [med],
            "mad_value": [mad],
            "n_outliers": [n_out],
            "outlier_frac": [frac],
        }
    )


def mad_anomaly_stream(events: DataFrame) -> DataFrame:
    """Streaming per-type robust MAD screen — the streaming twin of
    ``analytics.mad_anomalies`` (the batch screen got its z-score twin at
    r3; this is the 50%-breakdown version). A stream cannot re-scan
    history for an exact median, so each event type keeps a
    bottom-``MAD_RESERVOIR_K``-by-hash reservoir of values in keyed
    state: deterministic (md5 of event_id — batch replays fold to the
    same sample), mergeable, O(K) per key. Every micro-batch emits the
    type's refreshed summary (update mode) with median/MAD computed by
    the exact discrete rank rule over the reservoir.

    Accuracy contract: drained ≡ batch EXACTLY while a type's history
    fits the reservoir (pinned in tests); beyond that the sample is
    uniform-by-hash, so median/MAD carry standard order-statistic
    sampling error (O(1/sqrt(K)) quantile deviation) and n_outliers
    becomes a sample-rate estimate — n itself stays exact."""
    keyed = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        hex_hash64(F.col("event_id").cast("string")).alias("h"),
        "value",
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _mad_group,
        outputStructType=MAD_OUT_SCHEMA,
        stateStructType=MAD_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming HLL distinct-user estimate (dense register array in state) ---

from ..operators.sketches import (  # noqa: E402  (one sketch, batch + stream)
    HLL_M,
    HLL_MAX_RANK,
    HLL_P,
    hll_constant,
)

HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("hll_estimate", T.DoubleType(), False),
        T.StructField("empty_buckets", T.LongType(), False),
    ]
)

HLL_STATE_SCHEMA = T.StructType(
    [T.StructField("regs", T.ArrayType(T.IntegerType()), False)]
)


def _hll_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold arriving user-hashes into the type's dense HLL register
    array. The state is exactly ``HLL_M`` small ints — CONSTANT per key
    at any user cardinality — and register-wise ``max`` is both the fold
    and the merge, so multi-batch / out-of-order accumulation lands on
    the identical sketch a single batch pass would build."""
    (event_type,) = key
    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    n_seen = 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        hs = pdf["h"].dropna()
        n_seen += len(hs)
        for h in hs:
            h = int(h)
            w = h >> HLL_P
            r = (HLL_MAX_RANK - w.bit_length()) if w else HLL_MAX_RANK
            b = h % HLL_M
            if r > regs[b]:
                regs[b] = r
    state.update((regs,))
    # same integer harmonic fold as the batch operator: each register
    # contributes 2^(53 - r), absent ones 2^53 — exact BIGINT, then one
    # double division by the shared folded constant
    s_int = sum(1 << (HLL_MAX_RANK - r) for r in regs)
    empty = sum(1 for r in regs if r == 0)
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_seen": [n_seen],
            "hll_estimate": [round(hll_constant(HLL_M) / float(s_int), 4)],
            "empty_buckets": [empty],
        }
    )


def hll_users_stream(events: DataFrame) -> DataFrame:
    """Streaming per-event-type distinct-user estimate — the streaming
    twin of ``sketches.hll_distinct_users`` (same md5-derived hash, same
    bucket/rank split, same folded estimator constant), so a streaming
    dashboard and a batch backfill agree BIT-FOR-BIT: register-wise max
    is mergeable and order-independent, so the drained stream equals the
    batch sketch EXACTLY at any cardinality (unlike the MAD reservoir,
    no fits-in-state proviso; pinned in tests). State per type is the
    dense 256-register array; output mode: update (one refreshed row per
    type per micro-batch)."""
    keyed = events.select(
        "event_type", hex_hash64(F.col("user_id").cast("string")).alias("h")
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _hll_group,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
