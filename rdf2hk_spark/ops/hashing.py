"""Engine-portable deterministic hashing helpers.

Everything here must produce identical values in Spark and in the DuckDB
oracle SQL, so hashes are built exclusively from md5 hex strings (both engines
emit lowercase hex for UTF-8 input) and decimal-digit extraction (portable
without hex→int casts).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5s(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def md5_int(col: Column, digits: int = 6, offset: int = 0) -> Column:
    """Deterministic non-negative integer from a string: strip the hex letters
    out of md5, pad, take ``digits`` decimal digits starting after ``offset``
    digits. Uniform enough for salting/banding; identical in any engine with
    md5 + regexp_replace. Two disjoint windows of the SAME digest (offset 0
    and ``digits``) give an (almost) independent integer pair for one md5
    evaluation — collision of the pair needs the full digit string to
    collide."""
    # translate == regexp_replace('[a-f]', '') byte-for-byte on hex input,
    # without the per-row regex engine (this runs once per shingle/row in
    # every hash-derived operator — guide §1.2 per-task work)
    ds = F.translate(md5s(col), "abcdef", "")
    return F.substring(
        F.concat(ds, F.lit("0" * (offset + digits))), offset + 1, digits
    ).cast("long")


# DuckDB twin of md5_int, as a SQL fragment template
MD5_INT_SQL = (
    "CAST(substr(regexp_replace(md5({x}), '[a-f]', '', 'g') || '{pad}', {start}, {digits}) AS BIGINT)"
)


def md5_int_sql(x: str, digits: int = 6, offset: int = 0) -> str:
    return MD5_INT_SQL.format(
        x=x, pad="0" * (offset + digits), start=offset + 1, digits=digits
    )


def md5_int_py(s: str, digits: int = 6, offset: int = 0) -> int:
    """Pure-Python twin of md5_int — for deriving constants that must be
    identical literals in the Spark plan and the oracle SQL."""
    import hashlib
    import re

    h = hashlib.md5(s.encode()).hexdigest()
    ds = re.sub("[a-f]", "", h) + "0" * (offset + digits)
    return int(ds[offset : offset + digits])
