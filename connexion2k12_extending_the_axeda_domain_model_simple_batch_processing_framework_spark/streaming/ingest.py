"""Streaming corpus ingest: the training-data front door.

The batch text/corpus operators are pure per-row projections, so the same
column math runs unchanged over an unbounded stream. This module wires them
into the ingest order every training pipeline uses — PII redaction →
quality + repetition gate → exact and near dedup-at-ingest — with
watermark-bounded state, mirroring the reference's ingest-side rejection
contract (``internal/ProcessBatch.groovy``: duplicate serials are rejected
as data arrives, first wins).

Scale story: redaction/scoring are stateless projections (scan speed, any
parallelism); both dedup stages keep one row per distinct key in the state
store, hash-partitioned across executors and evicted as the watermark
advances — state is bounded by the dedup horizon, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hex_hash64
from ..functions.textfns import punct_count, tokens, word_shingles
from ..operators.text import EMAIL_RE, LANG_PROFILES, PHONE_RE

#: minhash count for the ingest near-dup signature (full-signature match ⇒
#: near-dup). Fewer hashes than the batch LSH path (operators/dedup.py): at
#: ingest we only gate on high-confidence duplicates and leave recall to
#: the batch pass.
INGEST_MINHASHES = 8


def redact_and_score_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-redact and score each arriving document (stateless projections).

    Adds ``redacted_text``, ``quality`` (same formula as
    ``operators.text.quality_score`` — asserted equal in
    tests/test_streaming_ingest.py) and ``rep_ratio`` (as
    ``operators.corpus.repetition_score``) while keeping all input columns.
    """
    txt = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    d = docs.withColumn("redacted_text", redacted).withColumn(
        "__toks", tokens(txt)
    )
    en_words = LANG_PROFILES[0][1]
    n_tokens = F.size("__toks")
    stop_hits = F.size(F.filter(F.col("__toks"), lambda t: t.isin(*en_words)))
    # same degenerate-doc guards as operators.text.quality_score (ANSI mode
    # raises on x/0; empty docs are a fact of life at ingest)
    punct_ratio = F.when(
        F.length(txt) > 0, punct_count(txt) / F.length(txt)
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * stop_ratio
    )
    # word_shingles is distinct by contract → rep uses the raw gram stream:
    raw_gram = F.when(
        n_tokens >= 3,
        F.transform(
            F.sequence(F.lit(0), n_tokens - 3),
            lambda i: F.concat_ws(
                " ", F.col("__toks")[i], F.col("__toks")[i + 1], F.col("__toks")[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rep = F.when(
        F.size(raw_gram) > 0,
        F.round(1.0 - F.size(F.array_distinct(raw_gram)) / F.size(raw_gram), 6),
    ).otherwise(F.lit(0.0))
    return d.withColumn("quality", F.round(quality, 6)).withColumn(
        "rep_ratio", rep
    ).drop("__toks")


def minhash_ingest_signature(text_col: str = "text", k: int = INGEST_MINHASHES) -> F.Column:
    """Per-row minhash signature string — NO shuffle (higher-order min over
    the in-row shingle array), so it is legal in any streaming stage.
    Documents too short to shingle fall back to their exact md5 so nulls
    never collide in the dedup key."""
    sh = word_shingles(tokens(F.col(text_col)), 3)
    mins = [
        F.array_min(F.transform(sh, lambda s, i=i: hex_hash64(s, i)))
        for i in range(k)
    ]
    sig = F.concat_ws("-", *[m.cast("string") for m in mins])
    return F.when(F.size(sh) > 0, sig).otherwise(F.md5(F.col(text_col)))


def ingest_pipeline_stream(
    docs: DataFrame,
    min_quality: float = 0.3,
    max_rep_ratio: float = 0.5,
    watermark: str = "1 hour",
    text_col: str = "text",
    time_col: str = "event_time",
) -> DataFrame:
    """Full ingest pipeline over a streaming documents frame:

    1. PII redaction + quality/repetition scoring (stateless),
    2. gate: ``quality >= min_quality`` and ``rep_ratio <= max_rep_ratio``,
    3. exact dedup-at-ingest (md5, first wins within the watermark),
    4. near dedup-at-ingest (full-minhash-signature match, first wins).

    Output carries the scored, redacted, surviving documents.
    """
    scored = redact_and_score_stream(docs, text_col)
    gated = scored.filter(
        (F.col("quality") >= min_quality) & (F.col("rep_ratio") <= max_rep_ratio)
    )
    keyed = (
        gated.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("minhash_sig", minhash_ingest_signature(text_col))
        .withWatermark(time_col, watermark)
    )
    exact = keyed.dropDuplicatesWithinWatermark(["content_hash"])
    return exact.dropDuplicatesWithinWatermark(["minhash_sig"])
