"""PII detection / redaction over text columns: emails, IPv4 addresses,
phone numbers.

Pure ``regexp_count`` / ``regexp_replace`` Column expressions — JVM-side,
whole-stage-codegen, zero shuffles (a pure map over the corpus scan; at
10^12 docs this runs at scan speed and partition-prunes like any
projection). The patterns deliberately stay inside the regex subset with
identical semantics in java.util.regex (Spark) and RE2 (DuckDB oracle):
no backreferences, no lookaround, only character classes, alternation,
bounded repetition, and word boundaries.

Redaction order matters: emails first (an email's domain must not be
half-eaten by a later pass), then IPv4, then phones. Counts are computed
on the ORIGINAL text, so a phone number inside an already-redacted span
still counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# local part @ domain . tld — the pragmatic subset (no quoted locals)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# dotted quad; \b keeps version strings like 1.2.3.4000 from half-matching
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# +CC-AAA-BBB-CCCC / AAA-BBB-CCCC, '-' or ' ' separated
PHONE_RE = r"(\+[0-9]{1,2}[- ])?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b"


def pii_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones): PII match counts per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_ipv4, n_phones, redacted): counts plus the text
    with every match replaced by a typed placeholder (``<EMAIL>`` /
    ``<IP>`` / ``<PHONE>``), applied email -> ipv4 -> phone (see module
    docstring for why the order is fixed)."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        redacted.alias("redacted"),
    )
