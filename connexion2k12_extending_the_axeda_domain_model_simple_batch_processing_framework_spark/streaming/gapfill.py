"""Streaming calendar gap-fill + LOCF — the streaming twin of
``operators.temporal.daily_gapfill``.

The batch operator grids each event type's observed day span and fills
gaps with zero counts and a carried-forward last value; a stream can't
re-scan the span, so each type keeps O(1) state — the OPEN day's partial
aggregate (count, exact cents sum, last value) — and finalizes days as
later days arrive: when an event lands on day d > open day, the open
day's row is emitted, then one gap row per missing calendar day between
them (n=0, value 0, the carried value, is_gap=1), and d opens. State is a
handful of scalars per type FOREVER, regardless of event volume.

Output mode: append — a day's row is emitted exactly once, when the
stream PROVES the day is over (a later-day event arrives for that type).
The final open day is still accumulating and is therefore NOT emitted;
drained output ≡ batch ``daily_gapfill`` restricted to each type's days
strictly before its last observed day (pytest-pinned, including gaps
that span a micro-batch boundary).

Ordering contract: within a micro-batch the group sorts by
(us, event_id) — the batch operator's total order; ACROSS batches events
must arrive per type in event-time order (the CDC-ordered-ingest
assumption the growth and transition twins document). NULL values follow
the batch twin exactly: counted in n_events (count(lit(1))), skipped by
the day sum, and a day whose LAST event has a NULL value gets a NULL
day-last, so the carried value falls back to the last non-NULL day-last
(the batch LOCF window's ignorenulls rule). Day arithmetic is
integer epoch-days (us // 86_400e6 — the UTC session timezone the batch
``to_date`` uses); the value sum rides as exact integer CENTS (the JVM
pre-casts value to DECIMAL(18,2)·100 so no float folding happens in
Python) and converts to double ONCE at emit — cents/100.0 is a correctly
rounded IEEE division, bit-equal to the batch DECIMAL→DOUBLE cast.
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

US_PER_DAY = 86_400 * 1_000_000

GAPFILL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("day", T.DateType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("day_value", T.DoubleType(), False),
        T.StructField("carried_value", T.DoubleType(), True),
        T.StructField("is_gap", T.IntegerType(), False),
    ]
)

GAPFILL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_day", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("cents", T.LongType(), False),
        # the open day's chronologically-last event value — NULL when that
        # event's value is NULL (the batch max_by keeps NULL x)
        T.StructField("open_last", T.DoubleType(), True),
        # last non-NULL finalized day-last — what the batch LOCF window
        # (last(..., ignorenulls=True)) falls back to across NULL days
        T.StructField("prev_carried", T.DoubleType(), True),
    ]
)


def _epoch_date(day: int) -> _dt.date:
    return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(day))


def _gapfill_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows) if len(rows) > 1 else rows[0]
    pdf = pdf.sort_values(["us", "event_id"])  # the batch total order
    pdf["day"] = pdf["us"] // US_PER_DAY
    (event_type,) = key
    if state.exists:
        open_day, n, cents, open_last, prev_carried = state.get
    else:
        open_day = n = cents = None
        open_last = prev_carried = None
    out: list[tuple] = []
    for day, sub in pdf.groupby("day", sort=True):
        day = int(day)
        if open_day is not None and day > open_day:
            # the arrival PROVES the open day (and every gap day up to
            # the new one) is over — finalize them in calendar order.
            # carried = the day's own last value when non-NULL, else the
            # last non-NULL day-last before it (the batch LOCF window's
            # ignorenulls fallback)
            carried = open_last if open_last is not None else prev_carried
            out.append(
                (
                    event_type,
                    _epoch_date(open_day),
                    int(n),
                    cents / 100.0,
                    carried,
                    0,
                )
            )
            for gap_day in range(open_day + 1, day):
                out.append(
                    (event_type, _epoch_date(gap_day), 0, 0.0, carried, 1)
                )
            prev_carried = carried
        if open_day is None or day > open_day:
            open_day, n, cents, open_last = day, 0, 0, None
        n += len(sub)
        # NULL values: counted in n (batch count(lit(1))), skipped in the
        # sum (batch SUM skips NULL), and a NULL last event makes the
        # day-last NULL (batch max_by keeps NULL x — verified)
        valid = sub["cents"].dropna()
        cents += int(valid.sum()) if len(valid) else 0
        v = sub["value"].iloc[-1]
        open_last = None if pd.isna(v) else float(v)
    state.update((int(open_day), int(n), int(cents), open_last, prev_carried))
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "event_type",
                "day",
                "n_events",
                "day_value",
                "carried_value",
                "is_gap",
            ],
        )


def gapfill_stream(events: DataFrame) -> DataFrame:
    """Per-type open-day state emitting finalized + gap day rows as later
    days arrive; see module docstring for the contract. ``events`` needs
    (event_type, event_time, event_id, value)."""
    keyed = events.select(
        "event_type",
        F.unix_micros(F.col("event_time")).alias("us"),
        "event_id",
        F.col("value").cast("double").alias("value"),
        # exact integer cents: DECIMAL(18,2)·100 never leaves the JVM as
        # a float, so the Python fold is pure integer addition
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _gapfill_group,
        outputStructType=GAPFILL_OUT_SCHEMA,
        stateStructType=GAPFILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
