"""Web-corpus URL/domain analytics: host extraction and per-domain rollups
(the domain-mixing / domain-blocklist substrate every Common-Crawl-scale
pipeline needs — RefinedWeb §3.1 URL filtering, FineWeb domain mixing).

Host extraction is a portable regex (java.util.regex ∩ RE2 — no
lookaround), NOT ``parse_url``: Spark's ``parse_url`` is a Hive UDF with
engine-specific edge semantics DuckDB can't mirror, and a regex keeps the
whole map inside whole-stage codegen. The rollup is ONE groupBy(domain)
shuffle with map-side partial aggregation; domains are heavy-tailed
(wikipedia.org vs one-page hosts) but the aggregate payload is
counters-only, so AQE skew split handles the tail — the same economics as
any counters rollup at 10^12 rows.

No reference counterpart (the reference is a KG converter); first-class
training-data ops mandated by the round brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://[userinfo@]HOST[:port]/... — capture the host, stop at : / ? #
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def host_of(url: Column) -> Column:
    """Lower-cased host of a URL ('' when the URL has no scheme://host)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def domain_of(host: Column) -> Column:
    """Registrable-domain approximation: the last TWO dot-labels of the
    host (``a.b.example.com`` → ``example.com``; a bare label passes
    through). A public-suffix list would be exact (``*.co.uk``), but the
    2-label rule is deterministic, engine-portable, and the standard
    first cut; swap in a broadcast PSL join for production."""
    parts = F.split(host, r"\.")
    return F.when(F.size(parts) <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-domain corpus rollup: (domain, n_docs, n_hosts, n_langs,
    sum_chars, mean_chars_x100) — the table a domain-mixing or blocklist
    decision reads. ``mean_chars_x100`` is floor-scaled integer arithmetic
    so the DuckDB oracle hashes bit-equal. One shuffle, counters-only
    payload (see module docstring)."""
    host = host_of(F.col(url_col))
    staged = df.select(
        host.alias("_host"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.col(lang_col).alias("_lang"),
    ).select(
        domain_of(F.col("_host")).alias("domain"), "_host", "_chars", "_lang"
    )
    return staged.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("_host").cast("long").alias("n_hosts"),
        F.count_distinct("_lang").cast("long").alias("n_langs"),
        F.sum("_chars").cast("long").alias("sum_chars"),
        F.floor(F.sum("_chars") * 100.0 / F.count("*"))
        .cast("long")
        .alias("mean_chars_x100"),
    )
