"""Skew-handling: salted joins and two-phase aggregation.

At 100 TB one pathological key (a million-task batch among millions of
small ones) turns a shuffle join or groupBy into a single straggler task.
AQE's skew-join splitting (enabled in session.py) handles the join case at
runtime; these helpers are the *declarative* counterpart for when you know
the skew up front or need a skew-proof aggregation:

- ``salted_join``: replicate the small side ``n_salts`` times, scatter the
  big side by a deterministic salt, join on (key, salt). Every salt slice of
  the hot key lands on a different reducer.
- ``two_phase_count``: partial aggregation on (key, salt), then final on
  key — the map-side-combine pattern made explicit for aggregations whose
  partials Spark cannot combine automatically (e.g. collect-based).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int, from_col: str | Column) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an existing
    (well-distributed) column — deterministic so retried tasks salt
    identically, unlike rand()."""
    src = F.col(from_col) if isinstance(from_col, str) else from_col
    return df.withColumn(SALT, F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the (small) side with every salt value: n_salts× rows."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT)
    return df.select("*", salts).withColumn(SALT, F.col(SALT).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small on key`` with the hot keys spread over
    ``n_salts`` reducers.

    ``salt_source`` must be a big-side column that distinguishes rows within
    a key (a line number, event id, timestamp); defaults to the join key
    itself ONLY as a fallback — salting by the key alone does not split a
    hot key, so pass a discriminator for real skew.
    """
    src = salt_source if salt_source is not None else on
    b = with_salt(big, n_salts, src)
    s = replicate_salts(small, n_salts)
    out = b.join(s, [on, SALT], how)
    return out.drop(SALT)


def two_phase_count(df: DataFrame, key: str, n_salts: int = 8, salt_source: str | Column | None = None) -> DataFrame:
    """count(*) per key, skew-proof: partial count on (key, salt), final sum
    on key. Identical result to ``df.groupBy(key).count()``; the partial
    stage caps any reducer's share of a hot key at 1/n_salts."""
    src = salt_source if salt_source is not None else key
    partial = (
        with_salt(df, n_salts, src)
        .groupBy(key, SALT)
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("count"))
