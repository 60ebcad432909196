"""Property/fuzz tests (hypothesis) for the pure-Python surfaces: the SPARQL
parser's totality contract (parse or SparqlSyntaxError — never another
exception, never a hang) and the driver-side RDF/XML round trip."""

import string

from hypothesis import given, settings, strategies as st

from rdf2hk_spark.plans.sparql import SparqlSyntaxError, parse_sparql
from rdf2hk_spark.sources.rdfxml import (
    RdfXmlSyntaxError, parse_rdfxml_driver, to_rdfxml,
)

# ---------------------------------------------------------------------------
# SPARQL parser totality
# ---------------------------------------------------------------------------

_FRAGMENTS = [
    "SELECT", "WHERE", "ASK", "DESCRIBE", "CONSTRUCT", "FROM", "OPTIONAL",
    "UNION", "VALUES", "FILTER", "ORDER", "BY", "LIMIT", "DISTINCT", "IN",
    "REGEX", "BOUND", "a", "{", "}", "(", ")", ".", ",", "*", "||", "&&",
    "!", "=", "!=", "<", ">", "<=", ">=", "?x", "?y", "<http://a>",
    "<urn:b>", '"lit"', '"v"@en', '"5"^^<http://dt>', "_:b1", "5", "2.5",
    "-3",
]


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_parser_total_on_arbitrary_text(text):
    try:
        parse_sparql(text)
    except SparqlSyntaxError:
        pass  # the ONLY permitted failure mode


@settings(max_examples=500, deadline=None)
@given(st.lists(st.sampled_from(_FRAGMENTS), max_size=30))
def test_parser_total_on_token_soup(frags):
    try:
        parse_sparql(" ".join(frags))
    except SparqlSyntaxError:
        pass


# ---------------------------------------------------------------------------
# RDF/XML driver round trip
# ---------------------------------------------------------------------------

_NAME = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
_IRI = st.builds(lambda a, b: f"<http://x/{a}/{b}>", _NAME, _NAME)
_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po"),
        blacklist_characters="\r",
    ),
    max_size=24,
)
def _escape_lit(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"')


_OBJ = st.one_of(
    _IRI,
    st.builds(lambda v: f'"{_escape_lit(v)}"', _TEXT),
    st.builds(lambda v: f'"{_escape_lit(v)}"@en', _TEXT),
    st.builds(lambda v, d: f'"{_escape_lit(v)}"^^<http://dt/{d}>', _TEXT, _NAME),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(_IRI, _IRI, _OBJ), min_size=1, max_size=8, unique=True
    )
)
def test_rdfxml_roundtrip(triples):
    doc = to_rdfxml([(s, p, o, "<g>") for s, p, o in triples])
    back = {(s, p, o) for _, s, p, o, _ in parse_rdfxml_driver(doc)}
    assert back == set(triples)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_rdfxml_parse_total(text):
    """Arbitrary text either parses or raises RdfXmlSyntaxError."""
    try:
        parse_rdfxml_driver(text)
    except RdfXmlSyntaxError:
        pass
