"""Deterministic training-mixture sampling: per-stratum (source/domain/
language) keep-rates applied by key hash, not RNG.

Why hash, not ``df.sample``: a training-data pipeline needs the SAME
sampling decision on every run, every retry, and every engine (the DuckDB
oracle re-derives the identical verdicts), and the decision must follow
the ROW KEY so that re-partitioning, speculative re-execution, or a
resumed checkpoint can never change the corpus. ``md5`` of the key →
decimal window → ``mod 1000`` gives a uniform per-mille draw that both
engines compute bit-identically (ops.hashing).

Scale shape: a pure map over the scan — the rate lookup is a literal
CASE chain (few strata) so there is NO join and NO shuffle; with many
strata pass a rates DataFrame to ``mixture_sample_join`` and it becomes
one broadcast hash join, still shuffle-free. At 10^12 docs both run at
scan speed and column-prune.

No reference counterpart (the reference is a KG converter); first-class
training-data ops mandated by the round brief.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark.ops.hashing import md5_int


def sample_draw(key: F.Column) -> F.Column:
    """The per-mille draw in [0, 1000): 6 decimal digits of md5(key),
    mod 1000. Deterministic, uniform enough for rate application, and
    portable to the oracle via ``md5_int_sql(...) % 1000``."""
    return md5_int(key.cast("string"), 6) % 1000


def mixture_sample(
    df: DataFrame,
    rates_x1000: Mapping[str, int],
    key_col: str = "doc_id",
    stratum_col: str = "source",
    default_x1000: int = 0,
) -> DataFrame:
    """Keep each row with probability ``rates_x1000[stratum]/1000``,
    decided by ``md5(key) % 1000 < rate`` — deterministic per key.

    ``rates_x1000`` maps stratum value → keep-rate in per-mille (e.g.
    ``{"wiki": 1000, "cc": 250}`` keeps all wiki and a quarter of cc);
    unlisted strata fall back to ``default_x1000``. The rate lookup
    compiles to a literal CASE chain — sorted for a deterministic plan —
    so the filter is a pure scan predicate Catalyst pushes down.
    """
    rate = F.lit(default_x1000)
    for stratum, r in sorted(rates_x1000.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(sample_draw(F.col(key_col)) < rate)


def mixture_sample_join(
    df: DataFrame,
    rates: DataFrame,
    key_col: str = "doc_id",
    stratum_col: str = "source",
    rate_col: str = "rate_x1000",
    default_x1000: int = 0,
) -> DataFrame:
    """Same semantics with the rates as a (stratum, rate_x1000) DataFrame —
    the many-strata form (per-domain rates from ``webstats.domain_stats``,
    say). The rates side is broadcast; rows keep their input columns."""
    r = F.broadcast(
        rates.select(
            F.col(stratum_col).alias("_stratum"),
            F.col(rate_col).alias("_rate"),
        )
    )
    joined = df.join(r, df[stratum_col] == r["_stratum"], "left")
    return joined.filter(
        sample_draw(F.col(key_col))
        < F.coalesce(F.col("_rate"), F.lit(default_x1000))
    ).drop("_stratum", "_rate")
