"""OwlTimeParser / OwlTimeSerializer (O5/O6, owltimeparser.js /
owltimeserializer.js): temporal context anchors + re-expansion."""

import json

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.owltime import (
    parse_with_owl_time, serialize_owl_time,
)
from rdf2hk_spark.operators.parse import ParseOptions

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"
TIME = "http://www.w3.org/2006/time#"
XSD_DT = "<http://www.w3.org/2001/XMLSchema#dateTime>"
G = "<http://g/history>"


def _rows():
    return [
        (0, "<http://e/battle>", f"<{TIME}hasTime>", "<http://t/iv1>", G),
        (1, "<http://t/iv1>", C.RDF_TYPE_URI, f"<{TIME}Interval>", G),
        (2, "<http://t/iv1>", f"<{TIME}hasBeginning>", "<http://t/i1>", G),
        (3, "<http://t/iv1>", f"<{TIME}hasEnd>", "<http://t/i2>", G),
        (4, "<http://t/i1>", C.RDF_TYPE_URI, f"<{TIME}Instant>", G),
        (5, "<http://t/i1>", f"<{TIME}inXSDDateTime>",
         f'"2020-01-05T10:00:00"^^{XSD_DT}', G),
        (6, "<http://t/i2>", C.RDF_TYPE_URI, f"<{TIME}Instant>", G),
        (7, "<http://t/i2>", f"<{TIME}inXSDDateTime>",
         f'"2020-02-01T00:00:00"^^{XSD_DT}', G),
        # an interval described by a DateTimeDescription (year + month)
        (8, "<http://t/iv2>", C.RDF_TYPE_URI, f"<{TIME}DateTimeInterval>", G),
        (9, "<http://t/iv2>", f"<{TIME}hasDateTimeDescription>", "_:dtd1", G),
        (10, "_:dtd1", f"<{TIME}year>",
         '"2020"^^<http://www.w3.org/2001/XMLSchema#gYear>', G),
        (11, "_:dtd1", f"<{TIME}month>",
         '"5"^^<http://www.w3.org/2001/XMLSchema#gMonth>', G),
        # plain statement: must pass through the base pipeline untouched
        (12, "<http://e/battle>", "<http://p/loc>", "<http://e/place>", G),
    ]


@pytest.fixture(scope="module")
def parsed(spark):
    quads = spark.createDataFrame(_rows(), QUAD_SCHEMA)
    ents = parse_with_owl_time(
        quads, ParseOptions(create_context=True, set_node_context=True)
    ).localCheckpoint()  # serializer fans out over this frame
    rows = {r["id"]: r.asDict(recursive=True) for r in ents.collect()}
    return ents, rows


def test_anchors_on_time_context(parsed):
    _, e = parsed
    ifaces = e[G]["interfaces"]
    assert set(ifaces) == {"<http://t/iv1>", "<http://t/i1>",
                           "<http://t/i2>", "<http://t/iv2>"}
    i1 = ifaces["<http://t/i1>"]
    assert i1["type"] == "temporal"
    assert json.loads(i1["properties"][C.RDF_TYPE_URI]) == [f"<{TIME}Instant>"]
    assert i1["properties"]["begin"] == "2020-01-05T10:00:00"
    assert i1["properties"]["end"] == "2020-01-05T10:00:00"


def test_interval_begin_end_from_instants(parsed):
    _, e = parsed
    iv1 = e[G]["interfaces"]["<http://t/iv1>"]["properties"]
    assert iv1["begin"] == "2020-01-05T10:00:00"
    assert iv1["end"] == "2020-02-01T00:00:00"
    assert iv1[f"<{TIME}hasBeginning>"] == "<http://t/i1>"
    assert iv1[f"<{TIME}hasEnd>"] == "<http://t/i2>"


def test_datetime_description_range_math(parsed):
    _, e = parsed
    iv2 = e[G]["interfaces"]["<http://t/iv2>"]["properties"]
    # month is 1-based (documented divergence from setMonth), ISO formatting
    # (documented divergence from toLocaleString)
    assert iv2["begin"] == "2020-05-01T00:00:00.000Z"
    assert iv2["end"] == "2020-05-31T23:59:59.999Z"
    assert iv2[f"<{TIME}hasDateTimeDescription>"] == "_:dtd1"
    # the description's own anchor is deleted (finish())
    assert "_:dtd1" not in e[G]["interfaces"]


def test_anchor_entities_suppressed_and_base_untouched(parsed):
    _, e = parsed
    for aid in ("<http://t/iv1>", "<http://t/i1>", "<http://t/iv2>"):
        assert aid not in e
    assert e["<http://e/battle>"]["type"] == C.NODE
    assert e["<http://e/place>"]["type"] == C.NODE
    assert any(
        x["type"] == C.LINK and x["connector"] == "<http://p/loc>"
        for x in e.values()
    )


def test_anchor_link_binds_context_at_anchor(parsed):
    _, e = parsed
    links = [
        x for x in e.values()
        if x["type"] == C.LINK and x["connector"] == f"<{TIME}hasTime>"
    ]
    assert len(links) == 1
    binds = {b["role"]: (b["comp"], b["anchor"]) for b in links[0]["binds"]}
    assert binds["subject"] == ("<http://e/battle>", C.LAMBDA)
    assert binds["object"] == (G, "<http://t/iv1>")


def test_serializer_roundtrips_time_statements(parsed):
    ents, _ = parsed
    quads = serialize_owl_time(ents, G, default_graph=C.HK_NULL_URI)
    got = {(r["s"], r["p"], r["o"], r["g"]) for r in quads.collect()}
    # anchor link re-expansion (object-anchor case → grandparent || default)
    assert ("<http://e/battle>", f"<{TIME}hasTime>", "<http://t/iv1>",
            C.HK_NULL_URI) in got
    # instants re-emit inXSDDateTime with the dateTime datatype
    assert ("<http://t/i1>", f"<{TIME}inXSDDateTime>",
            f'"2020-01-05T10:00:00"^^{XSD_DT}', G) in got
    # type triples decoded from the JSON-encoded anchor type list
    assert ("<http://t/iv1>", C.RDF_TYPE_URI, f"<{TIME}Interval>", G) in got
    assert ("<http://t/iv1>", f"<{TIME}hasBeginning>", "<http://t/i1>", G) in got
    # DateTimeDescription re-expansion
    assert ("<http://t/iv2>", f"<{TIME}hasDateTimeDescription>", "_:dtd1", G) in got
    assert ("_:dtd1", C.RDF_TYPE_URI, f"<{TIME}DateTimeDescription>", G) in got
    assert ("_:dtd1", f"<{TIME}year>",
            '"2020"^^<http://www.w3.org/2001/XMLSchema#gYear>', G) in got
    assert ("_:dtd1", f"<{TIME}month>",
            '"5"^^<http://www.w3.org/2001/XMLSchema#gMonth>', G) in got


def test_no_time_statements_is_noop(spark):
    quads = spark.createDataFrame(
        [(0, "<http://a>", "<http://p>", "<http://b>", G)], QUAD_SCHEMA
    )
    ents = parse_with_owl_time(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    ids = {r["id"] for r in ents.collect()}
    assert "<http://a>" in ids and "<http://b>" in ids
