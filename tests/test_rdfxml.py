"""RDF/XML source/sink (S2/S5, graphfactory.js:102-121,168-189)."""

import pytest

from rdf2hk_spark import constants as C
from rdf2hk_spark.sources import rdfxml

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex/" xmlns:foaf="http://xmlns.com/foaf/0.1/">
  <ex:Person rdf:about="http://e/alice" ex:nick="Al">
    <foaf:name xml:lang="en">Alice</foaf:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:knows rdf:resource="http://e/bob"/>
    <ex:address rdf:parseType="Resource">
      <ex:city>Lisbon</ex:city>
    </ex:address>
    <ex:pet>
      <rdf:Description rdf:nodeID="rex">
        <foaf:name>Rex</foaf:name>
      </rdf:Description>
    </ex:pet>
  </ex:Person>
</rdf:RDF>
"""


def test_parse_rdfxml_core():
    rows = rdfxml.parse_rdfxml_driver(DOC)
    triples = {(s, p, o) for _, s, p, o, _ in rows}
    a = "<http://e/alice>"
    assert (a, f"<{RDF}type>", "<http://ex/Person>") in triples
    assert (a, "<http://ex/nick>", '"Al"') in triples
    assert (a, "<http://xmlns.com/foaf/0.1/name>", '"Alice"@en') in triples
    assert (
        a, "<http://ex/age>",
        '"30"^^<http://www.w3.org/2001/XMLSchema#integer>',
    ) in triples
    assert (a, "<http://ex/knows>", "<http://e/bob>") in triples
    # parseType=Resource implicit bnode carries the nested property
    addr = [o for s, p, o in triples if p == "<http://ex/address>"]
    assert len(addr) == 1 and addr[0].startswith("_:")
    assert (addr[0], "<http://ex/city>", '"Lisbon"') in triples
    # nested node element with rdf:nodeID
    assert (a, "<http://ex/pet>", "_:rex") in triples
    assert ("_:rex", "<http://xmlns.com/foaf/0.1/name>", '"Rex"') in triples


def test_rdfxml_roundtrip():
    rows = rdfxml.parse_rdfxml_driver(DOC)
    quads = [(s, p, o, g) for _, s, p, o, g in rows]
    doc2 = rdfxml.to_rdfxml(quads)
    rows2 = rdfxml.parse_rdfxml_driver(doc2)
    a = {(s, p, o) for _, s, p, o, _ in rows}
    b = {(s, p, o) for _, s, p, o, _ in rows2}
    assert a == b


def test_rdfxml_feeds_parse_quads(spark):
    rows = rdfxml.parse_rdfxml_driver(DOC)
    from rdf2hk_spark.operators.parse import ParseOptions, parse_quads

    quads = spark.createDataFrame(
        rows, "stmt_idx long, s string, p string, o string, g string"
    )
    e = parse_quads(quads, ParseOptions(create_context=True))
    ids = {r["id"] for r in e.collect()}
    assert "<http://e/alice>" in ids and "<http://e/bob>" in ids


def test_rdfxml_rejects_garbage():
    with pytest.raises(rdfxml.RdfXmlSyntaxError):
        rdfxml.parse_rdfxml_driver("not xml at all <<<")
    with pytest.raises(rdfxml.RdfXmlSyntaxError):
        rdfxml.parse_rdfxml_driver(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<rdf:Description rdf:about="x">'
            '<p xmlns="http://ex/" rdf:parseType="Collection"/>'
            "</rdf:Description></rdf:RDF>"
        )
