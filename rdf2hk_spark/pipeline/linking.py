"""Entity linking: broadcast-dictionary candidate generation + batched
embedding-similarity scoring (the north_star's linking stage).

Candidate generation is a broadcast join surface→candidates (the dictionary is
tiny relative to mentions). Disambiguation scores cosine(context-embedding,
candidate-embedding) entirely JVM-side with zip_with/aggregate folds over
deterministic hash-derived embeddings:

  embed(text) = L2-normalized d-dim vector whose component j sums
  ((a_j·md5_int(token) + b_j) mod P)/P − 0.5 over the tokens — a
  feature-hashing embedding that is deterministic, engine-portable, and
  costs ONE md5 per token (the per-dimension spread is a linear permutation
  with import-time constants). Real models would swap in a pandas_udf
  encoder; the pipeline shape (broadcast candidates, batched scorer, argmax
  per mention) is the part that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark.ops.hashing import md5_int, md5_int_py

# Per-dimension linear-permutation constants (import-time, deterministic):
# component j of a token's contribution is ((a_j·h + b_j) mod P)/P - 0.5
# where h = md5_int(token, 9) — ONE md5 per token instead of ``dim`` md5s
# (the md5+regexp was ~all of the embedding cost; the multiply-add is
# negligible). Same universal-hash trick as ops.dedup.minhash_perm_consts.
_EMB_P = 1_000_000_007


def _emb_perm_consts(dim: int) -> tuple[list[int], list[int]]:
    a = [(md5_int_py(f"ea:{j}", 9) % (_EMB_P - 1)) + 1 for j in range(dim)]
    b = [md5_int_py(f"eb:{j}", 9) % _EMB_P for j in range(dim)]
    return a, b


def token_hashes(text: Column) -> Column:
    """One 9-digit md5-derived integer per whitespace token."""
    return F.transform(
        F.split(F.lower(text), " "), lambda t: md5_int(t, digits=9)
    )


def hash_embedding_from_hashes(hs: Column, dim: int = 16) -> Column:
    """Unit-norm feature-hashing embedding from a token-hash array. Split
    from ``token_hashes`` so callers can materialize the hash array as its
    own projection — referenced ``dim`` times below, a single aliased
    non-cheap expression survives CollapseProject un-inlined, keeping the
    md5 evaluated once per token."""
    a, b = _emb_perm_consts(dim)

    def _contrib(i: int):
        # closure factory, NOT a default-arg lambda: pyspark passes one
        # Column per lambda parameter, so an extra defaulted param would
        # receive a Column instead of the python index
        return lambda acc, h: acc + (
            ((F.lit(a[i]) * h + F.lit(b[i])) % _EMB_P).cast("double")
            / _EMB_P
            - 0.5
        )

    raw = F.array(
        *[F.aggregate(hs, F.lit(0.0), _contrib(j)) for j in range(dim)]
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x) + F.lit(1e-12)
    )
    return F.transform(raw, lambda x: x / norm)


def hash_embedding(text: Column, dim: int = 16) -> Column:
    """Deterministic unit-norm embedding of a string (feature hashing)."""
    return hash_embedding_from_hashes(token_hashes(text), dim)


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
    # two-projection shape: the token-hash array materializes as its own
    # aliased column so the md5 pass runs once per token, not once per
    # (token, dimension) — hash_embedding_from_hashes references it dim times
    m = mention_contexts.withColumn(
        "_hs", token_hashes(F.col("context_text"))
    ).withColumn("m_vec", hash_embedding_from_hashes(F.col("_hs"), dim)).drop("_hs")
    c = candidates.withColumn(
        "_hs", token_hashes(F.col("desc_text"))
    ).withColumn("c_vec", hash_embedding_from_hashes(F.col("_hs"), dim)).drop("_hs")
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
