"""Streaming trailing-EWMA level — the streaming twin of
``operators.analytics.events_value_ewma``.

The batch operator reduces events to a (type × day) exact-cents grid,
anchors at each type's max day, and folds the trailing
``EWMA_HORIZON_DAYS`` days with exact power-of-two weights. The stream
keeps the SAME grid slice as keyed state: per event type, the per-day
integer cents buckets inside the horizon (≤ 41 (day, cents) pairs — O(1)
state per type FOREVER, regardless of event volume). Each micro-batch
merges its rows' cents into the buckets (integer addition — order-free,
so arrival order within and ACROSS batches is irrelevant), advances the
anchor when a newer day arrives, prunes buckets that aged out, and emits
one snapshot row computed by the batch operator's exact integer formula:
num = Σ cents·2^(horizon−age), den = Σ 2^(horizon−age),
ewma = ((2·num·10⁶ + den·100) // (2·den·100)) / 10⁶ — Python's floor
division on positives ≡ the JVM's ``div``, so the drained snapshot is
bit-equal to batch.

Late data: an event for a PAST day merges into that day's bucket as long
as the day is still inside the horizon of the anchor seen so far; a day
older than the horizon is dropped — exactly the rows the batch filter
excludes. NULL values follow the batch twin: a NULL row advances nothing
in the numerator (batch SUM skips NULLs) but its day still exists in the
grid (batch groupBy emits the row; its weight counts in the mass).

Output mode: append, one snapshot per type per micro-batch. Snapshots
carry ``n_folded`` (cumulative folded rows — strictly increasing per
type), so "latest" is well-defined at drain: the max-``n_folded`` row per
type ≡ batch ``events_value_ewma`` over the same data (pytest-pinned,
including out-of-order days across a micro-batch boundary and a NULL
value).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.analytics import EWMA_HORIZON_DAYS

US_PER_DAY = 86_400 * 1_000_000

EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("last_day", T.DateType(), False),
        T.StructField("n_days", T.LongType(), False),
        T.StructField("ewma_value", T.DoubleType(), False),
        T.StructField("n_folded", T.LongType(), False),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.LongType()), False),
        T.StructField("cents", T.ArrayType(T.LongType()), False),
        T.StructField("n_folded", T.LongType(), False),
    ]
)


def _epoch_date(day: int) -> _dt.date:
    return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(day))


def _ewma_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows) if len(rows) > 1 else rows[0]
    (event_type,) = key
    if state.exists:
        days, cents, n_folded = state.get
        buckets = dict(zip(days, cents))
    else:
        buckets = {}
        n_folded = 0
    n_folded += len(pdf)
    pdf["day"] = pdf["us"] // US_PER_DAY
    anchor = max(buckets) if buckets else None
    for day, sub in pdf.groupby("day", sort=True):
        day = int(day)
        if anchor is not None and day < anchor - EWMA_HORIZON_DAYS:
            continue  # aged out — the batch filter excludes it too
        valid = sub["cents"].dropna()
        # a NULL-only day still opens its bucket at 0: the batch grid has
        # the row (weight in the mass), its numerator term is skipped
        buckets[day] = buckets.get(day, 0) + (
            int(valid.sum()) if len(valid) else 0
        )
        if anchor is None or day > anchor:
            anchor = day
            buckets = {
                d: c for d, c in buckets.items() if anchor - d <= EWMA_HORIZON_DAYS
            }
    if not buckets:
        # brand-new key whose first batch(es) carried only NULL
        # event_time rows: no day bucket exists, so there is nothing to
        # report — mirror the batch twin (which omits the type) instead
        # of dividing by an empty weight mass; keep the fold count.
        state.update(([], [], int(n_folded)))
        return
    state.update(
        (list(buckets.keys()), list(buckets.values()), int(n_folded))
    )
    num = sum(
        c << (EWMA_HORIZON_DAYS - (anchor - d)) for d, c in buckets.items()
    )
    den = sum(1 << (EWMA_HORIZON_DAYS - (anchor - d)) for d in buckets)
    q = (2 * num * 1_000_000 + den * 100) // (2 * den * 100)
    yield pd.DataFrame(
        [
            (
                event_type,
                _epoch_date(anchor),
                len(buckets),
                q / 1_000_000.0,
                int(n_folded),
            )
        ],
        columns=["event_type", "last_day", "n_days", "ewma_value", "n_folded"],
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Per-type trailing-EWMA snapshots from O(horizon) keyed state; see
    module docstring. ``events`` needs (event_type, event_time, value)."""
    keyed = events.select(
        "event_type",
        F.unix_micros(F.col("event_time")).alias("us"),
        # exact integer cents: DECIMAL(18,2)·100 never leaves the JVM as
        # a float, so the Python fold is pure integer addition
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _ewma_group,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
