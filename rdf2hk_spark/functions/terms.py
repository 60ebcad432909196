"""The term kernel: string-encoded RDF term codecs as pure Column expressions.

This is the byte-compatibility surface of the engine. Every function mirrors a
scalar function of the reference (/root/reference/utils.js) but is expressed as
a Spark Column expression so Catalyst can codegen it JVM-side — no per-row
Python anywhere on the hot path.

Term encoding (SURVEY.md §1.1): IRI = ``<iri>``, blank node = ``_:label``,
plain literal = ``"v"``, lang literal = ``"v"@lang``, typed literal =
``"v"^^<dtype>``, default graph = ``<hk://id/null>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# term-kind predicates (utils.js:46-89)
# ---------------------------------------------------------------------------

# Single-regex forms: these predicates appear (via CollapseProject inlining)
# dozens of times inside downstream CASE expressions, so expression size is a
# codegen-method-size concern — one rlike keeps whole-stage codegen compiling.

def is_uri(col: Column | str) -> Column:
    """utils.js:60-74 — trimmed, length ≥ 3, starts '<' ends '>'."""
    return _c(col).rlike("(?s)^\\s*<.+>\\s*$")


def is_blank_node(col: Column | str) -> Column:
    """utils.js:46-53."""
    return _c(col).rlike("^_:")


def is_uri_or_blank_node(col: Column | str) -> Column:
    """utils.js:55-58."""
    return _c(col).rlike("(?s)^\\s*<.+>\\s*$|^_:")


def is_literal(col: Column | str) -> Column:
    """utils.js:76-89 — starts with a double quote."""
    c = _c(col)
    return c.isNotNull() & c.startswith('"')


# ---------------------------------------------------------------------------
# encodeURIComponent / decodeURIComponent parity (JVM-side)
# ---------------------------------------------------------------------------
# JS encodeURIComponent leaves [A-Za-z0-9-_.!~*'()] unescaped and uses %XX
# uppercase-hex UTF-8 for everything else. Spark's url_encode is Java
# URLEncoder (form encoding): space→'+' and it additionally escapes !~'().
# We post-fix those six divergences to get byte-exact parity without Python.

def encode_uri_component(col: Column | str) -> Column:
    c = F.url_encode(_c(col))
    c = F.replace(c, F.lit("+"), F.lit("%20"))
    c = F.replace(c, F.lit("%21"), F.lit("!"))
    c = F.replace(c, F.lit("%7E"), F.lit("~"))
    c = F.replace(c, F.lit("%27"), F.lit("'"))
    c = F.replace(c, F.lit("%28"), F.lit("("))
    c = F.replace(c, F.lit("%29"), F.lit(")"))
    return c


def decode_uri_component(col: Column | str) -> Column:
    # url_decode treats '+' as space (form encoding); decodeURIComponent does
    # not — protect literal '+' first.
    return F.url_decode(F.replace(_c(col), F.lit("+"), F.lit("%2B")))


# ---------------------------------------------------------------------------
# IRI ↔ id codec (utils.js:91-129)
# ---------------------------------------------------------------------------

def id_from_resource(col: Column | str) -> Column:
    """utils.js:91-120 — strip <>, decode hk://id/…, map hk://b/… to _:….

    Non-hk IRIs pass through *with* angle brackets (load-bearing: entity ids
    in the reference keep them).
    """
    c = _c(col)
    hk_id_inner = F.regexp_extract(c, f"(?s)^<{C.HK_ID_PREFIX}/(.*)>$", 1)
    hk_b_inner = F.regexp_extract(c, f"(?s)^<{C.HK_BLANK_NODE_PREFIX}/(.*)>$", 1)
    return (
        F.when(~is_uri(c), c)
        .when(c == C.BODY_URI, F.lit(None).cast("string"))
        .when(
            c.startswith(f"<{C.HK_ID_PREFIX}"),
            F.when(hk_id_inner == "null", F.lit(None).cast("string")).otherwise(
                decode_uri_component(hk_id_inner)
            ),
        )
        .when(c.startswith(f"<{C.HK_BLANK_NODE_PREFIX}/"), F.concat(F.lit("_:"), hk_b_inner))
        .otherwise(c)
    )


def resource_from_id(col: Column | str) -> Column:
    """utils.js:122-129 — id → hk://id/<enc(id)>; null/empty → hk://id/null.

    Note: the reference returns the resource *without* angle brackets here.
    """
    c = _c(col)
    return F.when(
        c.isNotNull() & (c != ""), F.concat(F.lit(f"{C.HK_ID_PREFIX}/"), encode_uri_component(c))
    ).otherwise(F.lit(C.HK_NULL))


# ---------------------------------------------------------------------------
# literal codec (utils.js:143-264) — adHocGetType as regexp columns
# ---------------------------------------------------------------------------
# adHocGetType scans from the end for the *rightmost* '"^^<' (typed) or '"@'
# (lang). A greedy leading group in a regex anchors on the same rightmost
# separator, so these are exact translations. (?s) lets values span newlines.

_TYPED_RE = '(?s)^"(.*)"\\^\\^(<.*)$'   # group2 keeps '<...>' incl. brackets
_LANG_RE = '(?s)^"(.*)"@(.*)$'
_PLAIN_RE = '(?s)^"(.*)"$'


def literal_value(col: Column | str) -> Column:
    """Inner value string of a literal (no quotes); non-literals → the input
    itself when not uri/bnode, else null (utils.js:220-264 fallback)."""
    c = _c(col)
    typed = F.regexp_extract(c, _TYPED_RE, 1)
    lang = F.regexp_extract(c, _LANG_RE, 1)
    plain = F.regexp_extract(c, _PLAIN_RE, 1)
    return (
        F.when(c.startswith('"') & c.endswith(">") & c.rlike(_TYPED_RE), typed)
        .when(c.startswith('"') & ~c.endswith(">") & c.rlike(_LANG_RE), lang)
        .when(c.startswith('"') & c.rlike(_PLAIN_RE), plain)
        .when(~is_uri_or_blank_node(c), c)
        .otherwise(F.lit(None).cast("string"))
    )


def literal_datatype(col: Column | str) -> Column:
    """``<dtype>`` of a typed literal (with angle brackets), else null."""
    c = _c(col)
    return F.when(
        c.startswith('"') & c.endswith(">") & c.rlike(_TYPED_RE),
        F.regexp_extract(c, _TYPED_RE, 2),
    ).otherwise(F.lit(None).cast("string"))


def literal_lang(col: Column | str) -> Column:
    """Language tag of a lang literal, else null."""
    c = _c(col)
    return F.when(
        c.startswith('"') & ~c.endswith(">") & c.rlike(_LANG_RE),
        F.regexp_extract(c, _LANG_RE, 2),
    ).otherwise(F.lit(None).cast("string"))


def js_number_string(col: Column | str) -> Column:
    """JS ``Number(value).toString()`` for xsd-numeric literal values.

    Covers the reference's conversion surface (utils.js:235-242): decimal /
    scientific strings. Integral doubles print without '.0' (JS semantics);
    non-integral keep Spark's shortest-round-trip formatting which matches JS
    for doubles in the non-exponent range. Returns null when the value does
    not parse as a number (JS isNaN → keep original string).
    """
    c = F.trim(_c(col))
    d = c.try_cast("double")
    dec = d.try_cast("decimal(38,0)")
    # JS prints integral doubles below 1e21 in plain decimal with no '.0';
    # double→decimal goes through the shortest decimal repr, matching JS digits
    integral = dec.isNotNull() & (dec.cast("double") == d) & (F.abs(d) < 1e21)
    java = d.cast("string")
    # JS uses plain decimal notation for |v| in [1e-6, 1e21) and exponent
    # notation outside. Integral plain cases are handled above. Non-integral
    # doubles are always < 2^53, so |v|≥1 fits decimal(38,16) (≤17 significant
    # digits ⇒ ≤16 decimals) and |v|<1 fits decimal(38,24) (≤6 leading zeros +
    # 17 digits). Trailing zeros from the fixed scale are trimmed.
    def _plain(scale: int) -> Column:
        s = d.try_cast(f"decimal(38,{scale})").cast("string")
        return F.regexp_replace(F.regexp_replace(s, "0+$", ""), "\\.$", "")

    js_exp = F.regexp_replace(F.regexp_replace(java, "\\.0E", "E"), "E(-?)([0-9]+)", "e+$1$2")
    js_exp = F.regexp_replace(js_exp, "e\\+-", "e-")
    return (
        F.when(c == "", F.lit("0"))
        .when(d.isNull(), F.lit(None).cast("string"))
        .when(integral, dec.cast("string"))
        .when(F.abs(d) >= 1.0, F.when(F.abs(d) < 1e21, _plain(16)).otherwise(js_exp))
        .when(F.abs(d) >= 1e-6, _plain(24))
        .otherwise(js_exp)
    )


# ---------------------------------------------------------------------------
# literal encode (utils.js:441-494)
# ---------------------------------------------------------------------------

def create_literal(value: Column | str, lang: Column | None = None, dtype: Column | None = None) -> Column:
    v = _c(value)
    if lang is not None and dtype is not None:
        return (
            F.when(lang.isNotNull(), F.concat(F.lit('"'), v, F.lit('"@'), lang))
            .when(dtype.isNotNull(), F.concat(F.lit('"'), v, F.lit('"^^'), dtype))
            .otherwise(F.concat(F.lit('"'), v, F.lit('"')))
        )
    if lang is not None:
        return F.concat(F.lit('"'), v, F.lit('"@'), lang)
    if dtype is not None:
        return F.concat(F.lit('"'), v, F.lit('"^^'), dtype)
    return F.concat(F.lit('"'), v, F.lit('"'))


# ---------------------------------------------------------------------------
# label extraction (utils.js:266-300)
# ---------------------------------------------------------------------------

def label_from_uri(col: Column | str) -> Column:
    """Substring after the last of '#', '/', '<' (ignoring a trailing '>');
    falls back to the bracket-stripped IRI, then the input."""
    c = _c(col)
    # JS scans backwards from before a trailing '>' until '#', '/' or '<':
    # strip one trailing '>' first, then take the trailing run of other chars.
    base = F.regexp_replace(c, ">$", "")
    lab = F.regexp_extract(base, "(?s)([^#/<]*)$", 1)
    stripped = F.regexp_extract(c, "(?s)^<(.*)>$", 1)
    return (
        F.when(c.isNull(), F.lit(""))
        .when(lab != "", lab)
        .when(c.startswith("<") & c.endswith(">"), stripped)
        .otherwise(c)
    )


# ---------------------------------------------------------------------------
# deterministic id minting (utils.js:496-517, hkserializer.js:301-306)
# ---------------------------------------------------------------------------

def _js_str(col: Column | str) -> Column:
    """JS template-string coercion: null → 'null' (parser passes nulls)."""
    return F.coalesce(_c(col), F.lit("null"))


def _md5(col: Column) -> Column:
    return F.md5(F.encode(col, "UTF-8"))


def create_spo_uri(s, p, o, g) -> Column:
    """utils.js:507-511 — ``<hk://link/md5(s+p+o+g)>`` over raw encoded terms."""
    h = _md5(F.concat(_js_str(s), _js_str(p), _js_str(o), _js_str(g)))
    return F.concat(F.lit(f"<{C.HK_LINK_PREFIX}/"), h, F.lit(">"))


def create_ref_uri(entity_id, parent) -> Column:
    """utils.js:496-500 — ``<hk://ref/md5(enc(parent)/enc(id))>``."""
    h = _md5(
        F.concat(
            encode_uri_component(_js_str(parent)),
            F.lit("/"),
            encode_uri_component(_js_str(entity_id)),
        )
    )
    return F.concat(F.lit(f"<{C.HK_REFERENCE_PREFIX}/"), h, F.lit(">"))


def create_content_node_uri(content) -> Column:
    """utils.js:513-517 — ``<hk://node/md5(content)>``."""
    return F.concat(F.lit(f"<{C.HK_NODE_PREFIX}/"), _md5(_js_str(content)), F.lit(">"))


def create_anchor_uri(entity_id, key) -> Column:
    """hkserializer.js:301-306 — ``<hk://a/md5(enc(entityId)/enc(key))>``."""
    h = _md5(
        F.concat(
            encode_uri_component(_js_str(entity_id)),
            F.lit("/"),
            encode_uri_component(_js_str(key)),
        )
    )
    return F.concat(F.lit(f"<{C.HK_ANCHOR_PREFIX}/"), h, F.lit(">"))


def create_blank_node_uri(label) -> Column:
    """utils.js:502-505 — ``<hk://b/label>`` (label without the '_:')."""
    return F.concat(F.lit(f"<{C.HK_BLANK_NODE_PREFIX}/"), _c(label), F.lit(">"))


def deterministic_blank_node(label, salt) -> Column:
    """Deterministic replacement for the reference's uuidv1 blank-node remap
    (parser.js:197-208): ``_:md5(salt + '/' + label)``. Salt is typically the
    source-document id so labels never collide across documents."""
    return F.concat(F.lit("_:"), _md5(F.concat(_js_str(salt), F.lit("/"), _c(label))))
