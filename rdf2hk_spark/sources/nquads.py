"""N-Quads / N-Triples line-oriented source and sink (S1/S4 of SURVEY §2.1).

The reference parses Turtle-family text with the N3 library on a single
thread (graphfactory.js:123-151). At 100 TB the formats that matter are the
line-oriented ones (N-Triples/N-Quads): each line is one statement, so
``spark.read.text`` splits arbitrarily large files and the term codec is a
per-line Column expression — no Python, no single-threaded parser.

Full Turtle (prefixes, multi-line syntax) is only needed for small fixtures;
``parse_turtle_driver`` handles those on the driver with a tiny pure-Python
reader that covers the fixture subset (@prefix, semicolon/comma
continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark import constants as C

# one N-Quads statement: 3 or 4 terms, dot, optional comment/whitespace.
# terms: <iri> | _:label | "literal..."(@lang|^^<dt>)?  — literals may contain
# escaped quotes, so the literal term regex tracks backslash escapes.
_TERM = r"""(<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"""
_LINE_RE = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}(?:\s+{_TERM})?\s*\.\s*$"


# one unescape token: surrogate-pair \uXXXX\uXXXX first (must decode as one
# astral char), then single \uXXXX, \UXXXXXXXX, any 2-char escape, or a run of
# escape-free text. Single-pass tokenization keeps ordering correct (e.g.
# "\\\\n" is escaped-backslash + 'n', not backslash + newline).
_UNESCAPE_TOKEN_RE = (
    r"(\\u[Dd][89ABab][0-9A-Fa-f]{2}\\u[Dd][CcDdEeFf][0-9A-Fa-f]{2}"
    r"|\\u[0-9A-Fa-f]{4}"
    r"|\\U[0-9A-Fa-f]{8}"
    r"|\\."
    r"|[^\\]+)"
)


def _utf16be_char(hexs):
    """Hex UTF-16BE code units → the decoded string (JVM-side)."""
    return F.decode(F.unhex(hexs), "UTF-16BE")


def _codepoint_utf16_hex(cp):
    """Codepoint (long Column) → its UTF-16BE hex (surrogate pair when
    astral), so \\UXXXXXXXX decodes without a UTF-32 charset."""
    off = cp - F.lit(0x10000)
    hi = F.lit(0xD800) + F.shiftright(off, 10)
    lo = F.lit(0xDC00) + off.bitwiseAND(F.lit(0x3FF))
    pair = F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    return F.when(cp > 0xFFFF, pair).otherwise(F.lpad(F.hex(cp), 4, "0"))


def _unescape(col):
    """N-Triples string unescapes (jsongraph.js:136-195): \\" \\' \\\\ \\n
    \\r \\t \\b \\f, \\uXXXX (incl. surrogate pairs) and \\UXXXXXXXX —
    single-pass, pure Column expressions."""
    toks = F.regexp_extract_all(col, F.lit(_UNESCAPE_TOKEN_RE), 1)

    def decode_tok(t):
        cp8 = F.conv(F.substring(t, 3, 8), 16, 10).cast("long")
        return (
            F.when(
                t.rlike(r"^\\u[Dd][89ABab]") & (F.length(t) == 12),
                _utf16be_char(F.concat(F.substring(t, 3, 4), F.substring(t, 9, 4))),
            )
            .when(t.startswith("\\u"), _utf16be_char(F.substring(t, 3, 4)))
            .when(t.startswith("\\U"), _utf16be_char(_codepoint_utf16_hex(cp8)))
            .when(t == '\\"', F.lit('"'))
            .when(t == "\\'", F.lit("'"))
            .when(t == "\\\\", F.lit("\\"))
            .when(t == "\\n", F.lit("\n"))
            .when(t == "\\r", F.lit("\r"))
            .when(t == "\\t", F.lit("\t"))
            .when(t == "\\b", F.lit("\b"))
            .when(t == "\\f", F.lit("\f"))
            # unknown escape: lenient, keep the escaped char
            .when(t.startswith("\\"), F.substring(t, 2, 1))
            .otherwise(t)
        )

    return F.array_join(F.transform(toks, decode_tok), "")


def read_nquads(spark: SparkSession, path: str, default_graph: str = C.HK_NULL_URI) -> DataFrame:
    """Parse an N-Quads/N-Triples file (or directory/glob) into the quads
    schema. Malformed/comment/blank lines are dropped (W3C test-suite
    behavior: a conforming doc has none)."""
    lines = spark.read.text(path)
    m = [F.regexp_extract("value", _LINE_RE, i) for i in range(1, 5)]
    q = lines.filter(F.col("value").rlike(_LINE_RE)).select(
        F.monotonically_increasing_id().alias("stmt_idx"),
        m[0].alias("s"),
        m[1].alias("p"),
        _unescape_literal(m[2]).alias("o"),
        F.when(m[3] == "", F.lit(default_graph)).otherwise(m[3]).alias("g"),
    )
    return q


def _unescape_literal(col):
    """Unescape only the lexical part of literal terms; IRIs/bnodes pass."""
    inner = F.regexp_extract(col, r'(?s)^"((?:[^"\\]|\\.)*)"(.*)$', 1)
    rest = F.regexp_extract(col, r'(?s)^"((?:[^"\\]|\\.)*)"(.*)$', 2)
    return F.when(
        col.startswith('"'),
        F.concat(F.lit('"'), _unescape(inner), F.lit('"'), rest),
    ).otherwise(col)


def _escape(col):
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def to_nquads_lines(quads: DataFrame, default_graph: str = C.HK_NULL_URI) -> DataFrame:
    """Quads → one N-Quads text line per statement (single ``value`` column,
    ready for ``df.write.text``). The default graph is omitted per the spec."""
    o = F.col("o")
    o_enc = F.when(
        o.startswith('"'),
        _escape_literal_term(o),
    ).otherwise(o)
    g_part = F.when(
        F.col("g").isNull() | (F.col("g") == default_graph), F.lit("")
    ).otherwise(F.concat(F.lit(" "), F.col("g")))
    return quads.select(
        F.concat(
            F.col("s"), F.lit(" "), F.col("p"), F.lit(" "), o_enc, g_part,
            F.lit(" ."),
        ).alias("value")
    )


def _escape_literal_term(col):
    inner = F.regexp_extract(col, r'(?s)^"(.*)"((?:@[^"]*|\^\^<[^>]*>)?)$', 1)
    rest = F.regexp_extract(col, r'(?s)^"(.*)"((?:@[^"]*|\^\^<[^>]*>)?)$', 2)
    return F.concat(F.lit('"'), _escape(inner), F.lit('"'), rest)


def write_nquads(quads: DataFrame, path: str, default_graph: str = C.HK_NULL_URI) -> None:
    to_nquads_lines(quads, default_graph).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# driver-side Turtle reader (fixtures only)
# ---------------------------------------------------------------------------

def parse_turtle_driver(text: str, default_graph: str = C.HK_NULL_URI) -> list[tuple[int, str, str, str, str]]:
    """Tiny Turtle subset reader for test fixtures: @prefix, prefixed names,
    ';' predicate continuation, ',' object continuation, quoted literals with
    @lang. NOT a general Turtle parser — fixtures only (the reference's own
    fixture, people_from_jf.ttl, is covered)."""
    import re

    prefixes: dict[str, str] = {}
    rows: list[tuple[str, str, str]] = []

    def term(tok: str) -> str:
        tok = tok.strip()
        if tok.startswith("<") or tok.startswith("_:") or tok.startswith('"'):
            return tok
        if ":" in tok:
            pre, local = tok.split(":", 1)
            if pre in prefixes:
                return f"<{prefixes[pre]}{local}>"
        return tok

    # strip comments (outside quotes — fixtures have none inside)
    body = re.sub(r"(?m)^\s*#.*$", "", text)
    for m in re.finditer(r"@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.", body):
        prefixes[m.group(1)] = m.group(2)
    body = re.sub(r"@prefix[^.]*\.", "", body)

    token_re = r'(?:<[^>]*>|_:[^\s;,.]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+)?(?:\^\^[^\s;,.]+)?|[A-Za-z0-9_-]*:[^\s;,.]+)'
    stmt_re = re.compile(
        rf"({token_re})\s+((?:{token_re}\s+{token_re}\s*[;,]?\s*)+)\.", re.S
    )
    pair_re = re.compile(rf"({token_re})\s+({token_re})\s*([;,]?)", re.S)
    for sm in stmt_re.finditer(body):
        s = term(sm.group(1))
        rest = sm.group(2)
        pred = None
        pos = 0
        while pos < len(rest):
            pm = pair_re.search(rest, pos)
            if not pm:
                break
            a, b, sep = pm.group(1), pm.group(2), pm.group(3)
            pred = term(a)
            rows.append((s, pred, term(b)))
            pos = pm.end()
            # ',' continuation: same subject+predicate, more objects
            while sep == ",":
                nm = re.compile(rf"\s*({token_re})\s*([;,]?)", re.S).match(rest, pos)
                if not nm:
                    break
                rows.append((s, pred, term(nm.group(1))))
                sep = nm.group(2)
                pos = nm.end()
    return [(i, s, p, o, default_graph) for i, (s, p, o) in enumerate(rows)]
