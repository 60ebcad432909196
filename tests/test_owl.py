"""SimpleOwlParser (O4) semantics: ObjectProperty-family subjects become
FACTS connectors; owl-vocab statements become property-carrying References."""

import pytest

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.owl import parse_with_simple_owl
from rdf2hk_spark.operators.parse import ParseOptions

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"

OWL = "http://www.w3.org/2002/07/owl#"


@pytest.fixture(scope="module")
def entities(spark):
    g = "<http://g/onto>"
    rows = [
        # knows is an ObjectProperty → connector, not a node
        (0, "<http://v/knows>", C.RDF_TYPE_URI, f"<{OWL}ObjectProperty>", g),
        # domain/range statements → reference on knows carrying the statement
        (1, "<http://v/knows>", "<http://www.w3.org/2000/01/rdf-schema#domain>",
         "<http://v/Person>", g),
        (2, "<http://v/knows>", f"<{OWL}inverseOf>", "<http://v/knownBy>", g),
        # a plain user statement passes through the base pipeline untouched
        (3, "<http://e/a>", "<http://v/knows>", "<http://e/b>", g),
        # owl:imports is explicitly NOT consumed (simpleowlparser.js:41-44)
        (4, "<http://onto>", f"<{OWL}imports>", "<http://other>", g),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    df = parse_with_simple_owl(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    return {r["id"]: r.asDict(recursive=True) for r in df.collect()}


def test_object_property_becomes_facts_connector(entities):
    c = entities["<http://v/knows>"]
    assert c["type"] == C.CONNECTOR
    assert c["className"] == C.FACTS
    assert c["roles"] == {"subject": "s", "object": "o"}


def test_vocab_statements_become_reference_properties(entities):
    import hashlib, urllib.parse

    q = lambda x: urllib.parse.quote(x, safe="-_.!~*'()")
    rid = "<hk://ref/" + hashlib.md5(
        (q("<http://g/onto>") + "/" + q("<http://v/knows>")).encode()
    ).hexdigest() + ">"
    ref = entities[rid]
    assert ref["type"] == C.REFERENCE
    assert ref["ref"] == "<http://v/knows>"
    assert ref["properties"][
        "<http://www.w3.org/2000/01/rdf-schema#domain>"
    ] == ["<http://v/Person>"]
    assert ref["properties"][f"<{OWL}inverseOf>"] == ["<http://v/knownBy>"]


def test_user_statements_untouched_and_imports_passes(entities):
    # the user triple produced a normal link on the knows connector
    links = [e for e in entities.values() if e["type"] == C.LINK]
    assert any(e["connector"] == "<http://v/knows>" for e in links)
    # imports was NOT consumed: onto/other exist as nodes
    assert entities["<http://onto>"]["type"] == C.NODE
    assert entities["<http://other>"]["type"] == C.NODE
    # the object-property typing did NOT create Person/knownBy base nodes from
    # consumed statements... domain/range objects only live in ref properties
    assert "<http://v/Person>" not in entities


@pytest.fixture(scope="module")
def collision_entities(spark):
    """Subjects that collide across the base and OWL branches: a connector
    that also carries plain literal statements (reference pass 3 attaches
    them to the existing connector), and a ref id minted by BOTH base A6 and
    the OWL path (same (graph, subject))."""
    g1, g2 = "<http://g/one>", "<http://g/two>"
    s = "<http://v/knows>"
    rows = [
        (0, s, C.RDF_TYPE_URI, f"<{OWL}ObjectProperty>", g1),
        # non-OWL literal on the connector subject in its own parent graph →
        # base node props must survive onto the OWL connector
        (1, s, "<http://purl.org/dc/title>", '"Knows"@en', g1),
        # same (g2, s) ref minted by base A6 (literal, parent≠g2) and by the
        # OWL path (rdfs:domain) — property maps must merge deterministically
        (2, s, "<http://www.w3.org/2000/01/rdf-schema#domain>",
         "<http://v/Person>", g2),
        (3, s, "<http://purl.org/dc/creator>", '"Bob"@en', g2),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    df = parse_with_simple_owl(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    return {r["id"]: r.asDict(recursive=True) for r in df.collect()}


def test_connector_keeps_base_literal_properties(collision_entities):
    c = collision_entities["<http://v/knows>"]
    assert c["type"] == C.CONNECTOR and c["className"] == C.FACTS
    assert c["properties"]["<http://purl.org/dc/title>"] == ['"Knows"@en']


def test_colliding_ref_merges_base_and_owl_props(collision_entities):
    import hashlib, urllib.parse

    q = lambda x: urllib.parse.quote(x, safe="-_.!~*'()")
    rid = "<hk://ref/" + hashlib.md5(
        (q("<http://g/two>") + "/" + q("<http://v/knows>")).encode()
    ).hexdigest() + ">"
    ref = collision_entities[rid]
    assert ref["type"] == C.REFERENCE and ref["ref"] == "<http://v/knows>"
    # base-side literal property survives...
    assert ref["properties"]["<http://purl.org/dc/creator>"] == ['"Bob"@en']
    # ...and the OWL-side statement property rides the same entity
    assert ref["properties"][
        "<http://www.w3.org/2000/01/rdf-schema#domain>"
    ] == ["<http://v/Person>"]
