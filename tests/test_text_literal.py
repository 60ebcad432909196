"""A7 textLiteralAsNode (parser.js:422-516) + Z9 serializer inverse
(serializer.js:106-118,260-266)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.operators.serialize import SerializeOptions, serialize_entities

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"
G = "<http://g/ctx>"
LIT = C.DATA_LITERAL_URI


def _rows():
    return [
        (0, "<http://e/a>", "<http://p/name>", '"Alice"', G),
        (1, "<http://e/a>", "<http://p/age>", f'"30"^^{C.XSD_INTEGER_URI}', G),
        (2, "<http://e/a>", "<http://p/bio>", '"writer"@en', G),
        (3, "<http://e/a>", "<http://p/knows>", "<http://e/b>", G),
        # second doc shares the "Alice" value → same content node, one row
        (4, "<http://e/c>", "<http://p/name>", '"Alice"', G),
    ]


def _content_id(value: str) -> str:
    return f"<hk://node/{hashlib.md5(value.encode()).hexdigest()}>"


@pytest.fixture(scope="module", params=["metaproperty", "property"])
def parsed(spark, request):
    quads = spark.createDataFrame(_rows(), QUAD_SCHEMA)
    opts = ParseOptions(
        create_context=True, set_node_context=True,
        text_literal_as_node=True, text_literal_as_node_encoding=request.param,
    )
    ents = parse_quads(quads, opts)
    return request.param, {
        r["id"]: r.asDict(recursive=True) for r in ents.collect()
    }


def test_content_nodes_minted_and_shared(parsed):
    _, e = parsed
    alice = e[_content_id("Alice")]
    assert alice["type"] == C.NODE and alice["parent"] == G
    assert alice["properties"] == {
        "mimeType": ["plain/text"], "data": ["Alice"],
    }
    bio = e[_content_id('"writer"@en')]
    assert bio["properties"]["data"] == ['"writer"@en']


def test_subject_tag_is_last_predicate_overwrite(parsed):
    enc, e = parsed
    a = e["<http://e/a>"]
    # numbers stay plain properties; text props are gone from the subject
    assert a["properties"].get("<http://p/age>") == ["30"]
    assert "<http://p/name>" not in (a["properties"] or {})
    tagmap = a["properties"] if enc == "property" else a["metaProperties"]
    # stmt 2 (bio) is the last text literal on e/a → overwrite wins
    assert tagmap[LIT] == ["<http://p/bio>"]


def test_spo_links_bind_subject_to_content_node(parsed):
    enc, e = parsed
    links = [
        x for x in e.values()
        if x["type"] == C.LINK and x["connector"] == "<http://p/name>"
    ]
    assert len(links) == 2  # e/a and e/c both link to the shared content node
    for ln in links:
        comps = {b["role"]: b["comp"] for b in ln["binds"]}
        assert comps["object"] == _content_id("Alice")
        tagmap = ln["properties"] if enc == "property" else ln["metaProperties"]
        assert tagmap[LIT] == ["<http://p/name>"]


def test_type_machinery(parsed):
    _, e = parsed
    # rdf:type connector minted as HIERARCHY
    tc = e[C.RDF_TYPE_URI]
    assert tc["type"] == C.CONNECTOR and tc["className"] == C.HIERARCHY
    # data#Literal node with null parent + per-context reference
    tn = e[LIT]
    assert tn["type"] == C.NODE and tn["parent"] is None
    refs = [x for x in e.values() if x["type"] == C.REFERENCE and x["ref"] == LIT]
    assert len(refs) == 1 and refs[0]["parent"] == G
    # type links: content node → the context reference (not the raw node)
    tlinks = [
        x for x in e.values()
        if x["type"] == C.LINK and x["connector"] == C.RDF_TYPE_URI
    ]
    assert len(tlinks) == 2  # one per distinct content node
    for ln in tlinks:
        comps = {b["role"]: b["comp"] for b in ln["binds"]}
        assert comps["object"] == refs[0]["id"]


def test_serializer_reifies_original_literal_triples(spark):
    quads = spark.createDataFrame(_rows(), QUAD_SCHEMA)
    opts = ParseOptions(
        create_context=True, set_node_context=True, text_literal_as_node=True,
    )
    ents = parse_quads(quads, opts).localCheckpoint()
    rdf = serialize_entities(
        ents, SerializeOptions(convert_hk=False, default_graph=C.HK_NULL_URI)
    )
    got = {(r["s"], r["p"], r["o"], r["g"]) for r in rdf.collect()}
    # Z9: the original text-literal statements come back byte-exact
    assert ("<http://e/a>", "<http://p/name>", '"Alice"', G) in got
    assert ("<http://e/a>", "<http://p/bio>", '"writer"@en', G) in got
    assert ("<http://e/c>", "<http://p/name>", '"Alice"', G) in got
    # non-text statements serialize as before
    assert (
        "<http://e/a>", "<http://p/age>",
        f'"30"^^{C.XSD_INTEGER_URI}', G,
    ) in got
    assert ("<http://e/a>", "<http://p/knows>", "<http://e/b>", G) in got


def test_option_off_unchanged(spark):
    quads = spark.createDataFrame(_rows(), QUAD_SCHEMA)
    ents = parse_quads(
        quads, ParseOptions(create_context=True, set_node_context=True)
    )
    e = {r["id"]: r.asDict(recursive=True) for r in ents.collect()}
    a = e["<http://e/a>"]
    assert a["properties"]["<http://p/name>"] == ["Alice"]
    assert _content_id("Alice") not in e


def test_text_literal_with_convert_hk(spark):
    """A7 composes with the convertHK plugin path (the general-path merge):
    text literals still mint content nodes/links while HK-vocab statements
    reconstruct entities."""
    isa = C.ISA_URI
    rows = [
        (0, "<http://e/a>", isa, '"node"', G),
        (1, "<http://e/a>", "<http://p/bio>", '"writer"', G),
        (2, "<http://e/a>", "<http://p/knows>", "<http://e/b>", G),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    ents = parse_quads(
        quads,
        ParseOptions(
            create_context=True, set_node_context=True, convert_hk=True,
            text_literal_as_node=True,
        ),
    )
    e = {r["id"]: r.asDict(recursive=True) for r in ents.collect()}
    assert e["<http://e/a>"]["type"] == C.NODE
    cn = _content_id("writer")
    assert cn in e and e[cn]["properties"]["data"] == ["writer"]
    tagged = [
        x for x in e.values()
        if x["type"] == C.LINK and (x["metaProperties"] or {}).get(LIT)
    ]
    assert len(tagged) == 1
