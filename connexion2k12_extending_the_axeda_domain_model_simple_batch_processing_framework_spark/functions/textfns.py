"""Text tokenization / shingling expressions (cross-engine deterministic).

Tokenizer contract (shared with the DuckDB oracle): lowercase, split on runs
of anything outside [a-z0-9], drop empty tokens. DuckDB twin:
``list_filter(regexp_split_to_array(lower(s), '[^a-z0-9]+'), x -> x <> '')``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Word tokens of ``text`` per the shared tokenizer contract."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def token_count_col(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct space-joined word n-grams; empty array when < n tokens.

    DuckDB twin: ``list_distinct(list_transform(range(1, len - n + 2),
    i -> t[i] || ' ' || t[i+1] || ...))`` (1-based range).
    """
    gram = lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)])  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram)),
    ).otherwise(F.array().cast("array<string>"))


def punct_count(text: Column) -> Column:
    """Characters that are not [a-z0-9], space or newline, in lowercased
    text — the 'punctuation-ish' numerator of the quality score.
    DuckDB twin: ``length(regexp_replace(lower(s), '[a-z0-9 \\n]', '', 'g'))``.
    """
    return F.length(F.regexp_replace(F.lower(text), r"[a-z0-9 \n]", "")).cast("long")
