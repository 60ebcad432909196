"""Shared tokenization staging for the text operators.

One home for the CollapseProject idiom every text op needs (BENCH.md §9):
the whitespace token array MUST be bound as its own aliased projection
before any expression references it repeatedly — an aliased non-cheap
column referenced more than once survives CollapseProject un-inlined, so
the split() runs once per row; inlined, the interpreted HOFs re-evaluate
it per element_at (measured 10× slower on the sf0.1 shingle explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokens_frame(
    df: DataFrame, id_col: str, text_col: str, alias: str = "toks"
) -> DataFrame:
    """(id, <alias>): lower-cased whitespace tokens as a staged column."""
    return df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), " ").alias(alias),
    )


def kgrams_from_tokens(toks: F.Column, k: int) -> F.Column:
    """Word k-grams (with duplicates, in order) from a STAGED token-array
    column — the shared builder behind shingles, fingerprints, and
    repetition stats. Guard: Spark sequence(0, n) DESCENDS when n < 0, so
    short documents yield an empty array, not a reversed walk."""
    sh = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return sh
