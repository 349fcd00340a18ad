"""Streaming PSI drift monitor — the streaming twin of
``operators.analytics.value_psi``.

The batch operator splits one relation into baseline/current halves; a
production monitor instead FREEZES the baseline (training-time decile
edges + bin counts, fit once with ``fit_psi_baseline``) and scores
serving traffic against it as it arrives. State is one long per touched
bin — ≤ n_bins rows FOREVER, the cheapest drift monitor possible —
because PSI is a function of bin COUNTS, and counts are additive across
micro-batches.

Binning happens JVM-side before the stateful operator (the same
strict-less edge fold the batch operator and ``equal_frequency_bins``
use, with the frozen edges as a literal array), so the Python state
update is pure integer addition keyed by bin_id. Update mode re-emits a
bin's running count whenever a batch touches it; ``psi_snapshot`` turns
the maintained bin table + the frozen baseline into the SAME report as
the batch operator by calling the SHARED ``psi_from_cells`` — drained
counts ≡ batch current-half counts, so the snapshot PSI equals the
batch PSI bit-for-bit (pytest-pinned through real micro-batches).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.analytics import PCTL_ACCURACY, PSI_BINS, psi_from_cells

BIN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bin_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

BIN_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType(), False)])


def fit_psi_baseline(
    events: DataFrame, n_bins: int = PSI_BINS
) -> tuple[list[float], dict[int, int]]:
    """Freeze the baseline artifact from a training/reference relation:
    the ``n_bins - 1`` decile edges and the per-bin baseline counts. Both
    are BOUNDED (n_bins numbers each) — the one legitimate driver-side
    collect in the monitor, the same shape as the ANN quantizer
    artifacts."""
    probs = ", ".join(f"{i / n_bins!r}D" for i in range(1, n_bins))
    [row] = events.agg(
        F.expr(
            f"approx_percentile(CAST(value AS DOUBLE), array({probs}),"
            f" {PCTL_ACCURACY})"
        ).alias("e")
    ).collect()
    if row.e is None:
        # approx_percentile over zero rows returns NULL — surface the
        # real problem instead of an opaque TypeError downstream
        raise ValueError(
            "fit_psi_baseline: empty baseline relation (no rows to fit"
            " decile edges from)"
        )
    edges = [float(x) for x in row.e]
    counts = (
        _bin_ids(events, edges)
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    return edges, {int(r.bin_id): int(r.c) for r in counts}


def _bin_ids(events: DataFrame, edges: list[float]) -> DataFrame:
    """JVM-side strict-less edge fold over the frozen literal edge array
    (the batch operator's exact rule: ties fall to the lower bin)."""
    earr = F.array(*[F.lit(float(e)) for e in edges])
    v = F.col("value").cast("double")
    bin_id = F.aggregate(
        earr, F.lit(0), lambda acc, e: acc + F.when(e < v, 1).otherwise(0)
    ).cast("long")
    return events.select(bin_id.alias("bin_id"))


def _count_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    add = sum(len(pdf) for pdf in pdfs)
    if not add:
        return
    (bin_id,) = key
    n = (state.get[0] if state.exists else 0) + add
    state.update((int(n),))
    yield pd.DataFrame({"bin_id": [int(bin_id)], "n": [int(n)]})


def psi_bin_stream(events: DataFrame, edges: list[float]) -> DataFrame:
    """Maintain per-bin serving-traffic counts in keyed state: bin
    JVM-side against the frozen edges, then one long of state per bin;
    update mode re-emits each touched bin's running count."""
    return (
        _bin_ids(events, edges)
        .groupBy("bin_id")
        .applyInPandasWithState(
            _count_group,
            outputStructType=BIN_OUT_SCHEMA,
            stateStructType=BIN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def psi_snapshot(
    spark: SparkSession,
    current_bins: dict[int, int],
    baseline_bins: dict[int, int],
) -> DataFrame:
    """The drift report: maintained current counts + frozen baseline →
    the SAME (bin_id, c, d) cells the batch operator reduces to, pushed
    through the SHARED ``psi_from_cells`` — identical statistics by
    construction. Bins observed on only one side appear with a 0 on the
    other (and are disclosed as degenerate by the shared report)."""
    all_bins = sorted(set(baseline_bins) | set(current_bins))
    cells = spark.createDataFrame(
        [
            (b, baseline_bins.get(b, 0), current_bins.get(b, 0))
            for b in all_bins
        ],
        "bin_id long, c long, d long",
    )
    return psi_from_cells(cells)
