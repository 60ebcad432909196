"""Entity linking: broadcast-dictionary candidate generation + batched
embedding-similarity scoring (the north_star's linking stage).

Candidate generation is a broadcast join surface→candidates (the dictionary is
tiny relative to mentions). Disambiguation scores cosine(context-embedding,
candidate-embedding) entirely JVM-side with zip_with/aggregate folds over
deterministic hash-derived embeddings:

  embed(text) = L2-normalized d-dim vector whose component j sums
  md5_int(token ‖ j) − 0.5 over the tokens — a feature-hashing embedding that
  is deterministic, engine-portable, and Arrow/JVM-vectorizable. Real models
  would swap in a pandas_udf encoder; the pipeline shape (broadcast candidates,
  batched scorer, argmax per mention) is the part that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark.ops.hashing import md5_int


def hash_embedding(text: Column, dim: int = 16) -> Column:
    """Deterministic unit-norm embedding of a string (feature hashing)."""
    toks = F.split(F.lower(text), " ")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + (
                md5_int(F.concat(t, F.lit("#"), j.cast("string"))).cast("double")
                / 1e6
                - 0.5
            ),
        ),
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x) + F.lit(1e-12)
    )
    return F.transform(raw, lambda x: x / norm)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def link_mentions(
    mention_contexts: DataFrame,
    candidates: DataFrame,
    dim: int = 16,
) -> DataFrame:
    """Disambiguate mentions.

    mention_contexts: (url, surface, context_text) — ambiguous surface spans
    with the text around them.
    candidates: (surface, entity_id, desc_text) — the broadcast dictionary,
    possibly several candidate entities per surface.

    Returns (url, surface, entity_id, score_e4) — the argmax candidate per
    (url, surface), ties broken by entity_id.
    """
    m = mention_contexts.withColumn("m_vec", hash_embedding(F.col("context_text"), dim))
    c = candidates.withColumn("c_vec", hash_embedding(F.col("desc_text"), dim))
    scored = m.join(F.broadcast(c), "surface").select(
        "url",
        "surface",
        "entity_id",
        F.round(_dot(F.col("m_vec"), F.col("c_vec")) * 1e4).cast("long").alias("score_e4"),
    )
    best = scored.groupBy("url", "surface").agg(
        F.min_by(
            F.struct("entity_id", "score_e4"),
            F.struct((-F.col("score_e4")).alias("neg"), "entity_id"),
        ).alias("b")
    )
    return best.select("url", "surface", F.col("b.entity_id").alias("entity_id"),
                       F.col("b.score_e4").alias("score_e4"))
