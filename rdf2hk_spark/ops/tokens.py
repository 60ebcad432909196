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
    df: DataFrame,
    id_col: str,
    text_col: str,
    alias: str = "toks",
    mode: str = "simple",
) -> DataFrame:
    r"""(id, <alias>): lower-cased tokens as a staged column.

    ``mode="simple"`` (default) splits on single spaces — the engine's
    original rule, byte-cheap and exactly mirrored by the DuckDB oracles'
    ``string_split``. ``mode="ws"`` splits on whitespace RUNS (``\s+``
    after a regex whitespace-trim of BOTH edges — plain trim strips only
    spaces; tabs/newlines/multi-space collapse, whitespace-only text
    yields an empty array) — the honest rule for real web corpora, whose
    oracle twin is ``regexp_split_to_array`` over the same regex-trim. Both
    modes produce the staged aliased projection the CollapseProject rule
    above requires."""
    if mode == "simple":
        toks = F.split(F.lower(F.col(text_col)), " ")
    elif mode == "ws":
        # NOT F.trim: trim strips only 0x20 spaces (same in DuckDB) — edge
        # tabs/newlines would survive and split into empty edge tokens
        t = F.regexp_replace(
            F.lower(F.col(text_col)), r"^\s+|\s+$", ""
        )
        toks = F.when(
            F.length(t) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(t, r"\s+"))
    else:
        raise ValueError(f"unknown tokenizer mode {mode!r}")
    return df.select(F.col(id_col).alias("id"), toks.alias(alias))


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
