"""SimpleOwlParser (O4) semantics: ObjectProperty-family subjects become
FACTS connectors; owl-vocab statements become property-carrying References.
Plus the O6 inverse: SimpleOwlSerializer re-emits OWL-vocab properties as
resource triples so parse_with_simple_owl ∘ serialize round-trips."""

import pytest

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.owl import parse_with_simple_owl
from rdf2hk_spark.operators.parse import ENTITY_SCHEMA, ParseOptions
from rdf2hk_spark.operators.serialize import SerializeOptions, serialize_entities

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"

OWL = "http://www.w3.org/2002/07/owl#"
RDFS_DOMAIN = "<http://www.w3.org/2000/01/rdf-schema#domain>"
XSD_INT = "<http://www.w3.org/2001/XMLSchema#integer>"


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


# ---------------------------------------------------------------------------
# O6 inverse: SimpleOwlSerializer (simpleowlserializer.js:20-82)
# ---------------------------------------------------------------------------

OWL_ROUNDTRIP_ROWS = [
    (0, "<http://v/knows>", C.RDF_TYPE_URI, f"<{OWL}ObjectProperty>",
     "<http://g/onto>"),
    (1, "<http://v/knows>", RDFS_DOMAIN, "<http://v/Person>", "<http://g/onto>"),
    (2, "<http://v/knows>", f"<{OWL}inverseOf>", "<http://v/knownBy>",
     "<http://g/onto>"),
    (3, "<http://v/knows>", f"<{OWL}hasValue>", f'"5"^^{XSD_INT}',
     "<http://g/onto>"),
    (4, "<http://e/a>", "<http://v/knows>", "<http://e/b>", "<http://g/onto>"),
]


@pytest.fixture(scope="module")
def owl_roundtrip_quads(spark):
    g = "<http://g/onto>"
    quads = spark.createDataFrame(OWL_ROUNDTRIP_ROWS, QUAD_SCHEMA)
    ents = parse_with_simple_owl(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    out = serialize_entities(
        ents, SerializeOptions(convert_owl=True, default_graph=C.HK_NULL_URI)
    )
    return {(r["s"], r["p"], r["o"], r["g"]) for r in out.collect()}


def test_owl_statements_reemitted_as_resources(owl_roundtrip_quads):
    g = "<http://g/onto>"
    got = owl_roundtrip_quads
    assert ("<http://v/knows>", RDFS_DOMAIN, "<http://v/Person>", g) in got
    assert ("<http://v/knows>", f"<{OWL}inverseOf>", "<http://v/knownBy>", g) in got
    # NO quoted-URI literal artifacts (the pre-fix Z4 bug)
    assert not any(o.startswith('"<') for (_, _, o, _) in got), sorted(got)[:6]


def test_owl_literal_statement_keeps_datatype(owl_roundtrip_quads):
    g = "<http://g/onto>"
    assert (
        "<http://v/knows>", f"<{OWL}hasValue>", f'"5"^^{XSD_INT}', g
    ) in owl_roundtrip_quads


def test_owl_roundtrip_fixpoint(spark, owl_roundtrip_quads):
    """parse(serialize(parse(q))) == parse(q) on the OWL statement subset:
    the re-parsed reference entity carries identical statement properties.
    (The (s, rdf:type, owl:ObjectProperty) typing statement is absorbed into
    the FACTS connector shell by BOTH passes — the reference loses it the
    same way: createRelationships skips objprop typings,
    simpleowlparser.js:105-115.)"""
    rows2 = [
        (i, s, p, o, g) for i, (s, p, o, g) in enumerate(sorted(owl_roundtrip_quads))
    ]
    ents2 = parse_with_simple_owl(
        spark.createDataFrame(rows2, QUAD_SCHEMA),
        ParseOptions(create_context=True, set_node_context=True),
    )
    e2 = {r["id"]: r.asDict(recursive=True) for r in ents2.collect()}
    refs = [e for e in e2.values() if e["type"] == C.REFERENCE
            and e["ref"] == "<http://v/knows>"]
    assert len(refs) == 1
    props = refs[0]["properties"]
    assert props[RDFS_DOMAIN] == ["<http://v/Person>"]
    assert props[f"<{OWL}inverseOf>"] == ["<http://v/knownBy>"]
    assert props[f"<{OWL}hasValue>"] == ["5"]
    assert refs[0]["metaProperties"][f"<{OWL}hasValue>"] == [XSD_INT]
    # connector shell reconstructed identically
    c = e2["<http://v/knows>"]
    assert c["type"] == C.CONNECTOR and c["className"] == C.FACTS


def test_value_triggered_owl_conversion(spark):
    """shouldConvertProperty also fires when the VALUE (not the key) is OWL
    vocabulary (simpleowlserializer.js:27-46): a stored rdf:type property
    valued owl:Class re-emits as a resource triple."""
    ents = spark.createDataFrame(
        [(
            "<http://e/c>", C.NODE, "<http://g/1>", None, None, None, None,
            None, {C.RDF_TYPE_URI: [f"<{OWL}Class>"]}, None, None,
        )],
        ENTITY_SCHEMA,
    )
    out = serialize_entities(
        ents, SerializeOptions(convert_owl=True, default_graph=C.HK_NULL_URI)
    )
    got = {(r["s"], r["p"], r["o"], r["g"]) for r in out.collect()}
    assert (
        "<http://e/c>", C.RDF_TYPE_URI, f"<{OWL}Class>", "<http://g/1>"
    ) in got


def test_owl_predicate_set_mode(spark):
    """owlserializer.js:20-54 variant: the rdf:type/rdfs:domain/rdfs:range
    predicate set triggers; non-URI values stringify UNTYPED."""
    ents = spark.createDataFrame(
        [(
            "<http://e/c>", C.NODE, "<http://g/1>", None, None, None, None,
            None,
            {RDFS_DOMAIN: ["<http://v/Person>"], "<http://my/p>": ["plain"],
             "<http://www.w3.org/2000/01/rdf-schema#range>": ["17"]},
            {"<http://www.w3.org/2000/01/rdf-schema#range>": [XSD_INT]},
            None,
        )],
        ENTITY_SCHEMA,
    )
    out = serialize_entities(
        ents,
        SerializeOptions(owl_predicate_set=True, default_graph=C.HK_NULL_URI),
    )
    got = {(r["s"], r["p"], r["o"]) for r in out.collect()}
    assert ("<http://e/c>", RDFS_DOMAIN, "<http://v/Person>") in got
    # non-URI value under a set predicate: UNTYPED string (datatype dropped,
    # matching the reference's `${value}` stringification)
    assert (
        "<http://e/c>", "<http://www.w3.org/2000/01/rdf-schema#range>", '"17"'
    ) in got
    # non-set predicates take the default literal path
    assert ("<http://e/c>", "<http://my/p>", '"plain"') in got
