"""OWLParser (O1-O3, owlparser.js): restriction assembly, domain/range
binding, relation qualifiers, DatatypeProperty domain properties."""

import pytest

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.owlparser import (
    ALL_VALUES_FROM_LABEL, ON_PROPERTY_LABEL, RESTRICTION_URI,
    SOME_VALUES_FROM_LABEL, parse_with_owl,
)
from rdf2hk_spark.operators.parse import ParseOptions

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"
OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
G = "<http://g/onto>"


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        # O1: a restriction blank node
        (0, "_:r1", C.RDF_TYPE_URI, f"<{OWL}Restriction>", G),
        (1, "_:r1", f"<{OWL}onProperty>", "<http://v/hasPart>", G),
        (2, "_:r1", f"<{OWL}someValuesFrom>", "<http://v/Gadget>", G),
        # repeated predicate: last wins (owlparser.js:223 quirk)
        (3, "_:r1", f"<{OWL}someValuesFrom>", "<http://v/Widget>", G),
        # O2/O3: an object property with domain/range and qualifiers
        (4, "<http://v/knows>", C.RDF_TYPE_URI, f"<{OWL}ObjectProperty>", G),
        (5, "<http://v/knows>", f"<{RDFS}domain>", "<http://v/Person>", G),
        (6, "<http://v/knows>", f"<{RDFS}range>", "<http://v/Agent>", G),
        (7, "<http://v/knows>", f"<{OWL}inverseOf>", "<http://v/knownBy>", G),
        (8, "<http://v/knows>", f"<{RDFS}subPropertyOf>", "<http://v/related>", G),
        # DatatypeProperty: domain class gets {age: [range]}
        (9, "<http://v/age>", C.RDF_TYPE_URI, f"<{OWL}DatatypeProperty>", G),
        (10, "<http://v/age>", f"<{RDFS}domain>", "<http://v/Human>", G),
        (11, "<http://v/age>", f"<{RDFS}range>", C.XSD_INTEGER_URI, G),
        # base statements (not consumed): materialize Human + a normal link
        (12, "<http://e/a>", "<http://p/x>", "<http://v/Human>", G),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    df = parse_with_owl(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    return {r["id"]: r.asDict(recursive=True) for r in df.collect()}


def test_restriction_connector(entities):
    c = entities[RESTRICTION_URI]
    assert c["type"] == C.CONNECTOR and c["className"] == C.FACTS
    assert c["roles"] == {
        ON_PROPERTY_LABEL: C.ROLE_SUBJECT,
        SOME_VALUES_FROM_LABEL: C.ROLE_OBJECT,
        ALL_VALUES_FROM_LABEL: C.ROLE_OBJECT,
        "owl:hasValue": C.ROLE_OBJECT,
    }
    assert c["properties"][C.RDF_TYPE_URI] == [RESTRICTION_URI]


def test_restriction_link_last_wins(entities):
    links = [
        e for e in entities.values()
        if e["type"] == C.LINK and e["connector"] == RESTRICTION_URI
    ]
    assert len(links) == 1
    ln = links[0]
    assert ln["parent"] == G
    comps = {b["role"]: b["comp"] for b in ln["binds"]}
    assert comps[ON_PROPERTY_LABEL] == "<http://v/hasPart>"
    # stmt 3 overwrites stmt 2
    assert comps[SOME_VALUES_FROM_LABEL] == "<http://v/Widget>"
    assert ALL_VALUES_FROM_LABEL not in comps


def test_object_property_connector_props(entities):
    c = entities["<http://v/knows>"]
    assert c["type"] == C.CONNECTOR and c["className"] == C.FACTS
    p = c["properties"]
    assert p[C.RDF_TYPE_URI] == [f"<{OWL}ObjectProperty>"]
    assert p[f"<{OWL}inverseOf>"] == ["<http://v/knownBy>"]
    assert p[f"<{RDFS}subPropertyOf>"] == ["<http://v/related>"]
    assert p[f"<{RDFS}domain>"] == ["<http://v/Person>"]
    assert p[f"<{RDFS}range>"] == ["<http://v/Agent>"]


def test_domain_range_link(entities):
    links = [
        e for e in entities.values()
        if e["type"] == C.LINK and e["connector"] == "<http://v/knows>"
    ]
    assert len(links) == 1
    comps = {b["role"]: b["comp"] for b in links[0]["binds"]}
    assert comps == {
        "subject": "<http://v/Person>", "object": "<http://v/Agent>"
    }


def test_datatype_property_domain_annotation(entities):
    human = entities["<http://v/Human>"]
    assert human["type"] == C.NODE
    assert human["properties"]["<http://v/age>"] == [C.XSD_INTEGER_URI]
    # the dtprop itself is consumed: no connector, no node
    assert "<http://v/age>" not in entities


def test_base_statements_untouched(entities):
    assert entities["<http://e/a>"]["type"] == C.NODE
    assert any(
        e["type"] == C.LINK and e["connector"] == "<http://p/x>"
        for e in entities.values()
    )
    # restriction bnode fully consumed — no stray node (raw or remapped)
    assert not any("_:r1" in k or "r1" in k.split("/")[-1] for k in entities)
