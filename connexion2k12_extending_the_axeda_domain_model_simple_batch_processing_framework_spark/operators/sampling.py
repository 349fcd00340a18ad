"""Deterministic sampling for training-data mixture construction.

A 100 TB corpus is never trained on raw — it's a *mixture*: per-stratum
sampling rates (by language, source, quality band) applied uniformly and
reproducibly. ``rand()``-based sampling is neither (task retries resample);
hashing the document id gives an exact, idempotent, cross-engine-replayable
sample: a doc is in the p% sample iff ``hash(doc_id) % 100 < p``. The
predicate is evaluated at the scan (no shuffle at all) and the same rule in
any engine selects the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hex_hash64

#: default mixture: upsample scarce languages, downsample the dominant one.
DEFAULT_LANG_RATES: dict[str, int] = {"en": 40, "de": 80, "es": 80, "fr": 80, "zh": 100}


def hash_bucket(id_col: F.Column, buckets: int = 100) -> F.Column:
    """Stable bucket in [0, buckets) from the md5-derived 60-bit id hash."""
    return F.pmod(hex_hash64(id_col.cast("string")), F.lit(buckets))


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int] | None = None,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
) -> DataFrame:
    """Per-stratum deterministic percentage sample.

    ``rates[stratum]`` is a percentage in [0, 100]; strata absent from the
    map get ``default_rate``. Output adds the stratum's rate and the doc's
    bucket so downstream audits can re-verify membership. No shuffle: a
    single scan with the predicate evaluated per row.
    """
    rates = DEFAULT_LANG_RATES if rates is None else rates
    rate = F.lit(default_rate)
    for stratum, pct in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    bucket = hash_bucket(F.col(id_col))
    return (
        documents.withColumn("sample_rate", rate.cast("long"))
        .withColumn("bucket", bucket.cast("long"))
        .filter(F.col("bucket") < F.col("sample_rate"))
    )


#: default split: 98% train / 1% validation / 1% test
DEFAULT_SPLIT_PCT: tuple[int, int] = (98, 1)


def train_val_test_split(
    documents: DataFrame,
    train_pct: int = DEFAULT_SPLIT_PCT[0],
    val_pct: int = DEFAULT_SPLIT_PCT[1],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash.

    The split every training pipeline needs, with the properties rand()
    cannot give: idempotent under retries, stable across runs and engines,
    and disjoint by construction (one bucket value per doc). The ``salt``
    decorrelates the split from every other hash-bucket decision (sampling,
    sharding) — without it, "bucket < 40" samples and "bucket < 98" splits
    would select nested row sets. Adds ``split`` ∈ {train, val, test};
    single scan, no shuffle.
    """
    bucket = F.pmod(
        hex_hash64(F.col(id_col).cast("string"), F.lit(salt)), F.lit(100)
    )
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.withColumn("split", split)
