"""Benchmark decontamination: flag corpus documents whose text overlaps an
evaluation/benchmark set on word n-grams (the GPT-3/Llama training-data
hygiene step — e.g. "remove any training document sharing a 13-gram with a
benchmark item").

Scale shape (10^12-doc corpus vs ~10^5-item benchmark): the benchmark side
is TINY relative to the corpus, so its distinct n-gram set is broadcast —
the corpus scan never shuffles on gram content. Per-corpus-doc overlap
counting is one explode + broadcast hash join + groupBy(id) (partial
map-side combine), i.e. a single shuffle keyed by doc id whose width is
bounded by matched grams only (misses are dropped by the inner join before
the shuffle). No all-pairs doc×benchmark product ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark.ops import tokens


def eval_ngrams(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    tokenizer: str = "simple",
) -> DataFrame:
    """(gram): the DISTINCT word n-grams of the benchmark set — the
    broadcast probe side. Distinct-ness matters twice: it bounds the
    broadcast size and makes the per-doc overlap count a set-intersection
    cardinality (each corpus gram matches at most one probe row)."""
    toks = tokens.tokens_frame(eval_df, text_col, text_col, mode=tokenizer)
    return (
        toks.select(
            F.explode(
                F.array_distinct(tokens.kgrams_from_tokens(F.col("toks"), n))
            ).alias("gram")
        )
        .dropDuplicates()
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
    tokenizer: str = "simple",
) -> DataFrame:
    """Per corpus document: n-gram overlap with the benchmark set.

    Returns (id, n_grams, n_overlap, contaminated) — one row per corpus
    document (zero-overlap docs included):

    - ``n_grams``   distinct word n-grams in the document;
    - ``n_overlap`` how many of those also occur anywhere in ``eval_df``
      (set-intersection cardinality — duplicates on either side don't
      inflate it);
    - ``contaminated`` 1 when ``n_overlap >= min_overlap`` else 0 (emitted
      as BIGINT so engines hash bit-equal).

    Plan: corpus docs stage distinct grams once; the benchmark's distinct
    grams are broadcast (see module docstring); matched grams groupBy(id)
    with a map-side partial count; the left join back to the per-doc gram
    counts restores zero-overlap rows.
    """
    probe = F.broadcast(eval_ngrams(eval_df, text_col, n, tokenizer))
    staged = tokens.tokens_frame(corpus, id_col, text_col, mode=tokenizer).select(
        "id",
        F.array_distinct(tokens.kgrams_from_tokens(F.col("toks"), n)).alias(
            "_grams"
        ),
    )
    per_doc = staged.select(
        "id", F.size("_grams").cast("long").alias("n_grams")
    )
    overlap = (
        staged.select("id", F.explode("_grams").alias("gram"))
        .join(probe, "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return per_doc.join(overlap, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce("n_overlap", F.lit(0)) >= min_overlap)
        .cast("long")
        .alias("contaminated"),
    )
