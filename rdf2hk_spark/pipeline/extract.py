"""HTML → text extraction (Arrow-vectorized, byte-identical per url).

The input_hint mandates vectorized pandas/Arrow UDFs with no per-row Python.
``extract_text`` is a Series→Series pandas UDF whose body is a chain of
*vectorized* pandas string ops (each executes in C over the whole Arrow
batch). The function is pure — same html bytes ⇒ same text bytes — which is
the per-row invariant the driver checks (BASELINE.json:15).

The extraction model (a deterministic subset of real-world boilerplate
removal):
  1. drop <head>…</head> and <script>/<style> blocks
  2. block-level tags (h1-h6, p, br, div, li, tr) become '\\n'
  3. every other tag is stripped
  4. HTML entities &amp; &lt; &gt; &quot; &#39; &nbsp; are decoded
  5. whitespace is normalized per line (collapse runs of spaces, trim),
     empty lines dropped
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as Ty
from pyspark.sql.functions import pandas_udf

_BLOCK_TAGS = r"(?i)<(?:/?(?:h[1-6]|p|div|li|tr|ul|ol|table)|br\s*/?)[^>]*>"


def _extract_series(html: pd.Series) -> pd.Series:
    s = html.str.decode("utf-8", errors="replace") if html.dtype == object and isinstance(
        html.iloc[0] if len(html) else b"", (bytes, bytearray)
    ) else html.astype("string")
    s = s.str.replace(r"(?is)<head\b.*?</head>", "", regex=True)
    s = s.str.replace(r"(?is)<(script|style)\b.*?</\1>", "", regex=True)
    s = s.str.replace(_BLOCK_TAGS, "\n", regex=True)
    s = s.str.replace(r"(?s)<[^>]*>", "", regex=True)
    s = (
        s.str.replace("&lt;", "<", regex=False)
        .str.replace("&gt;", ">", regex=False)
        .str.replace("&quot;", '"', regex=False)
        .str.replace("&#39;", "'", regex=False)
        .str.replace("&nbsp;", " ", regex=False)
        .str.replace("&amp;", "&", regex=False)
    )
    # per-line space normalization, drop empty lines
    s = s.str.replace(r"[ \t]+", " ", regex=True)
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(r"\n+", "\n", regex=True)
    s = s.str.strip()
    return s.astype(object)


@pandas_udf(Ty.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html)


def extract_text(pages: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    """Add ``out_col`` — deterministic text extracted from the html bytes."""
    return pages.withColumn(out_col, extract_text_udf(F.col(html_col)))
