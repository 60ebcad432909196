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
    r"|\\"  # lone backslash (trailing, or before a newline '\\.' can't match)
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
            # lone trailing backslash: pass through, never silently drop
            .when(t == "\\", F.lit("\\"))
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


def to_trig_lines(quads: DataFrame, default_graph: str = C.HK_NULL_URI) -> DataFrame:
    """Quads → TriG statements, one per line: default-graph rows as plain
    triples, named-graph rows as single-statement ``<g> { s p o . }``
    blocks. TriG permits repeating blocks for the same graph (the graph is
    their union), so the sink stays line-oriented and arbitrarily
    splittable — no per-graph grouping shuffle, and the output re-parses
    with the Turtle/TriG reader. More verbose than one block per graph;
    that is the price of a shuffle-free distributed writer."""
    o = F.col("o")
    o_enc = F.when(o.startswith('"'), _escape_literal_term(o)).otherwise(o)
    triple = F.concat(F.col("s"), F.lit(" "), F.col("p"), F.lit(" "), o_enc, F.lit(" ."))
    named = F.col("g").isNotNull() & (F.col("g") != default_graph)
    return quads.select(
        F.when(
            named, F.concat(F.col("g"), F.lit(" { "), triple, F.lit(" }"))
        ).otherwise(triple).alias("value")
    )


def write_trig(quads: DataFrame, path: str, default_graph: str = C.HK_NULL_URI) -> None:
    to_trig_lines(quads, default_graph).write.mode("overwrite").text(path)


def to_ntriples_lines(quads: DataFrame) -> DataFrame:
    """Quads → N-Triples lines with graphs FLATTENED (dropped) — the valid
    Turtle/N-Triples projection of a multi-graph store (the reference's
    RDF/XML sink flattens the same way, graphfactory.js:168-189). Distinct
    because two graphs may carry the same triple."""
    o = F.col("o")
    o_enc = F.when(o.startswith('"'), _escape_literal_term(o)).otherwise(o)
    return quads.select(
        F.concat(
            F.col("s"), F.lit(" "), F.col("p"), F.lit(" "), o_enc, F.lit(" .")
        ).alias("value")
    ).distinct()


# ---------------------------------------------------------------------------
# driver-side Turtle reader (fixtures only)
# ---------------------------------------------------------------------------

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


class TurtleSyntaxError(ValueError):
    """Raised on Turtle the driver reader cannot parse — never silently
    dropped (round-1 verdict: silent data loss is worse than failing)."""


class _TurtleReader:
    """Small recursive-descent Turtle/TriG reader for driver-side fixtures
    (graphfactory.js:123-151 territory; the scale path is the line-oriented
    N-Quads reader above). Supports @prefix/@base (and SPARQL PREFIX/BASE),
    prefixed names, 'a', ';' and ',' continuation, blank-node property lists
    [..], collections (..), quoted / triple-quoted / lang-tagged / typed
    literals, and TriG named-graph blocks (``GRAPH <g> { .. }`` or
    ``<g> { .. }``). Anything else raises TurtleSyntaxError."""

    def __init__(self, text: str):
        self.t = text
        self.i = 0
        self.n = len(text)
        self.prefixes: dict[str, str] = {}
        self.base = ""
        # (s, p, o, g) with g=None for the default graph
        self.rows: list[tuple[str, str, str, str | None]] = []
        self.cur_g: str | None = None
        self.bnode_n = 0

    # -- lexer helpers ------------------------------------------------------
    def _ws(self) -> None:
        while self.i < self.n:
            c = self.t[self.i]
            if c == "#":
                while self.i < self.n and self.t[self.i] != "\n":
                    self.i += 1
            elif c.isspace():
                self.i += 1
            else:
                return

    def _err(self, what: str) -> TurtleSyntaxError:
        ctx = self.t[self.i : self.i + 40].replace("\n", "\\n")
        return TurtleSyntaxError(f"{what} at offset {self.i}: {ctx!r}")

    def _expect(self, ch: str) -> None:
        self._ws()
        if self.i >= self.n or self.t[self.i] != ch:
            raise self._err(f"expected {ch!r}")
        self.i += 1

    def _peek(self) -> str:
        self._ws()
        return self.t[self.i] if self.i < self.n else ""

    def _match_re(self, pattern: str):
        import re

        m = re.compile(pattern).match(self.t, self.i)
        if m:
            self.i = m.end()
        return m

    def _new_bnode(self) -> str:
        self.bnode_n += 1
        return f"_:ttlb{self.bnode_n}"

    # -- terms ---------------------------------------------------------------
    def _string(self) -> str:
        for q in ('"""', "'''", '"', "'"):
            if self.t.startswith(q, self.i):
                self.i += len(q)
                start = self.i
                while self.i < self.n:
                    if self.t[self.i] == "\\":
                        self.i += 2
                        continue
                    if self.t.startswith(q, self.i) and (
                        len(q) == 3 or self.t[self.i] == q
                    ):
                        body = self.t[start : self.i]
                        self.i += len(q)
                        if q in ("'''", "'"):  # normalize to double-quote form
                            body = body.replace('"', '\\"')
                        return body
                    self.i += 1
                raise self._err("unterminated string")
        raise self._err("expected string")

    def _term(self, as_subject: bool = False) -> str:
        import re

        self._ws()
        if self.i >= self.n:
            raise self._err("unexpected end of input")
        c = self.t[self.i]
        if c == "<":
            m = self._match_re(r"<([^>]*)>")
            iri = m.group(1)
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri
            return f"<{iri}>"
        if c in "\"'":
            body = self._string()
            m = self._match_re(r"@([A-Za-z0-9-]+)")
            if m:
                return f'"{body}"@{m.group(1)}'
            if self.t.startswith("^^", self.i):
                self.i += 2
                dt = self._term()
                return f'"{body}"^^{dt}'
            return f'"{body}"'
        if self.t.startswith("_:", self.i):
            m = self._match_re(r"_:([A-Za-z0-9_.-]+)")
            if not m:
                raise self._err("bad blank node label")
            return f"_:{m.group(1)}"
        if c == "[":
            self.i += 1
            node = self._new_bnode()
            if self._peek() != "]":
                self._predicate_object_list(node)
            self._expect("]")
            return node
        if c == "(":
            self.i += 1
            items = []
            while self._peek() != ")":
                items.append(self._term())
            self._expect(")")
            if not items:
                return f"<{RDF_NS}nil>"
            head = self._new_bnode()
            cur = head
            for j, it in enumerate(items):
                self.rows.append((cur, f"<{RDF_NS}first>", it, self.cur_g))
                nxt = self._new_bnode() if j + 1 < len(items) else f"<{RDF_NS}nil>"
                self.rows.append((cur, f"<{RDF_NS}rest>", nxt, self.cur_g))
                cur = nxt
            return head
        # numeric / boolean shorthand
        m = self._match_re(r"(true|false)(?![A-Za-z0-9_])")
        if m:
            return (
                f'"{m.group(1)}"^^<http://www.w3.org/2001/XMLSchema#boolean>'
            )
        m = self._match_re(r"[+-]?[0-9]+\.[0-9]*(?:[eE][+-]?[0-9]+)?")
        if m:
            return f'"{m.group(0)}"^^<http://www.w3.org/2001/XMLSchema#decimal>'
        m = self._match_re(r"[+-]?[0-9]+")
        if m:
            return f'"{m.group(0)}"^^<http://www.w3.org/2001/XMLSchema#integer>'
        # prefixed name
        m = self._match_re(r"([A-Za-z][A-Za-z0-9_.-]*)?:([^\s;,.()\[\]]*)")
        if m:
            pre = m.group(1) or ""
            if pre not in self.prefixes:
                raise self._err(f"undeclared prefix {pre!r}")
            return f"<{self.prefixes[pre]}{m.group(2)}>"
        raise self._err("unparseable term")

    # -- grammar ---------------------------------------------------------------
    def _predicate_object_list(self, subject: str) -> None:
        while True:
            self._ws()
            if self._match_re(r"a(?![A-Za-z0-9_:])"):
                pred = f"<{RDF_NS}type>"
            else:
                pred = self._term()
            while True:
                obj = self._term()
                self.rows.append((subject, pred, obj, self.cur_g))
                if self._peek() == ",":
                    self.i += 1
                    continue
                break
            if self._peek() == ";":
                self.i += 1
                # ';' may be trailing before '.' or ']'
                if self._peek() in (".", "]", ";"):
                    while self._peek() == ";":
                        self.i += 1
                    return
                continue
            return

    def _graph_block(self, g: str) -> None:
        self._expect("{")
        self.cur_g = g
        while self._peek() != "}":
            subject = self._term(as_subject=True)
            self._predicate_object_list(subject)
            if self._peek() == ".":
                self.i += 1
        self._expect("}")
        self.cur_g = None

    def parse(self) -> list[tuple[str, str, str, str | None]]:
        import re

        while True:
            self._ws()
            if self.i >= self.n:
                return self.rows
            m = self._match_re(
                r"(?:@prefix|PREFIX)\s+([A-Za-z][A-Za-z0-9_.-]*)?:\s*<([^>]*)>\s*\.?"
            )
            if m:
                self.prefixes[m.group(1) or ""] = m.group(2)
                continue
            m = self._match_re(r"(?:@base|BASE)\s*<([^>]*)>\s*\.?")
            if m:
                self.base = m.group(1)
                continue
            if self._match_re(r"GRAPH(?![A-Za-z0-9_])"):
                g = self._term()
                self._graph_block(g)
                continue
            subject = self._term(as_subject=True)
            self._ws()
            if self._peek() == "{":  # TriG: <g> { ... }
                self._graph_block(subject)
                continue
            # a bare blank-node property list may omit the p-o list
            if self._peek() == ".":
                self.i += 1
                continue
            self._predicate_object_list(subject)
            self._expect(".")


def parse_turtle_driver(
    text: str, default_graph: str = C.HK_NULL_URI
) -> list[tuple[int, str, str, str, str]]:
    """Driver-side Turtle reader for fixtures (the scale path is N-Quads):
    full statement grammar incl. blank-node property lists ``[..]``,
    collections ``(..)``, triple-quoted strings, numeric/boolean shorthand.
    Raises :class:`TurtleSyntaxError` on unsupported syntax instead of
    silently dropping statements. TriG graph blocks map to the g column;
    default-graph statements get ``default_graph``."""
    rows = _TurtleReader(text).parse()
    return [
        (i, s, p, o, g if g is not None else default_graph)
        for i, (s, p, o, g) in enumerate(rows)
    ]
