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


def md5_int(col: Column, digits: int = 6) -> Column:
    """Deterministic non-negative integer from a string: strip the hex letters
    out of md5, pad, take the first ``digits`` decimal digits. Uniform enough
    for salting/banding; identical in any engine with md5 + regexp_replace."""
    ds = F.regexp_replace(md5s(col), "[a-f]", "")
    return F.substring(F.concat(ds, F.lit("0" * digits)), 1, digits).cast("long")


# DuckDB twin of md5_int, as a SQL fragment template
MD5_INT_SQL = (
    "CAST(substr(regexp_replace(md5({x}), '[a-f]', '', 'g') || '{pad}', 1, {digits}) AS BIGINT)"
)


def md5_int_sql(x: str, digits: int = 6) -> str:
    return MD5_INT_SQL.format(x=x, pad="0" * digits, digits=digits)


def md5_int_py(s: str, digits: int = 6) -> int:
    """Pure-Python twin of md5_int — for deriving constants that must be
    identical literals in the Spark plan and the oracle SQL."""
    import hashlib
    import re

    h = hashlib.md5(s.encode()).hexdigest()
    return int((re.sub("[a-f]", "", h) + "0" * digits)[:digits])
