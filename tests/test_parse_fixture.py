"""The reference's own conversion expectations, verified id-exactly.

Mirrors /root/reference/test/rdf2hk_test.js ("Number of" suite) but asserts
*stronger* properties: exact entity ids (hand-computed via the utils.js MD5
formulas), exact binds, and the 12 rdfs:label property values — not just
counts.
"""

import hashlib
import urllib.parse

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.fixtures import people_from_jf as FX
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


def js_encode(s: str) -> str:
    """encodeURIComponent (utils.js:498)."""
    return urllib.parse.quote(s, safe="-_.!~*'()")


def spo_uri(s, p, o, g):
    """utils.js:507-511."""
    return "<hk://link/" + hashlib.md5(f"{s}{p}{o}{g}".encode()).hexdigest() + ">"


def ref_uri(eid, parent):
    """utils.js:496-500."""
    h = hashlib.md5(f"{js_encode(parent)}/{js_encode(eid)}".encode()).hexdigest()
    return f"<hk://ref/{h}>"


# DEFAULT_OPTIONS of the reference test (test/rdf2hk_test.js:18-30)
DEFAULT_OPTS = ParseOptions(
    create_context=True, set_node_context=True, convert_hk=True
)


@pytest.fixture(scope="module")
def entities(spark):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    df = parse_quads(quads, DEFAULT_OPTS)
    rows = {r["id"]: r.asDict(recursive=True) for r in df.collect()}
    assert len(rows) == df.count()  # ids unique
    return rows


def test_entity_counts(entities):
    # test/rdf2hk_test.js:91-104
    assert len(entities) == 34
    by_type = {}
    for e in entities.values():
        by_type[e["type"]] = by_type.get(e["type"], 0) + 1
    assert by_type.get(C.NODE, 0) == 12
    assert by_type.get(C.LINK, 0) == 20
    assert by_type.get(C.CONTEXT, 0) == 0
    assert by_type.get(C.CONNECTOR, 0) == 2


def test_connector_entities(entities):
    p31 = entities[FX.P31]
    assert p31["type"] == C.CONNECTOR
    assert p31["className"] == C.HIERARCHY  # wdt:P31 ∈ default hierarchy set
    assert p31["roles"] == {"subject": "s", "object": "o"}
    p19 = entities[FX.P19]
    assert p19["className"] == C.FACTS


def test_node_ids_and_parents(entities):
    expected_nodes = {f"<{FX.WD}{qid}>" for qid, _ in FX.PEOPLE} | {FX.Q5, FX.Q193019}
    got = {i for i, e in entities.items() if e["type"] == C.NODE}
    assert got == expected_nodes
    # default graph ⇒ parent null even under setNodeContext (parser.js:231)
    assert all(e["parent"] is None for e in entities.values() if e["type"] == C.NODE)


def test_link_ids_binds(entities):
    for qid, _ in FX.PEOPLE:
        s = f"<{FX.WD}{qid}>"
        for p, o in ((FX.P31, FX.Q5), (FX.P19, FX.Q193019)):
            lid = spo_uri(s, p, o, C.HK_NULL_URI)
            link = entities[lid]
            assert link["type"] == C.LINK
            assert link["connector"] == p
            assert link["parent"] is None
            binds = {(b["role"], b["comp"], b["anchor"]) for b in link["binds"]}
            assert binds == {("subject", s, C.LAMBDA), ("object", o, C.LAMBDA)}


def test_label_properties(entities):
    for qid, label in FX.PEOPLE:
        e = entities[f"<{FX.WD}{qid}>"]
        assert e["properties"] == {FX.RDFS_LABEL: [f'"{label}"@pt']}
        assert e["metaProperties"] is None or e["metaProperties"] == {}
    assert entities[FX.Q5]["properties"] == {FX.RDFS_LABEL: ['"ser humano"@pt']}
    assert entities[FX.Q193019]["properties"] == {FX.RDFS_LABEL: ['"Juiz de Fora"@pt']}


class TestEdgeCases:
    """Term-kernel edge semantics exercised through the full pipeline
    (FIXTURES.md §1b)."""

    def _parse(self, spark, rows, opts=None):
        quads = spark.createDataFrame(
            [(i, *r) for i, r in enumerate(rows)], QUAD_SCHEMA
        )
        df = parse_quads(quads, opts or ParseOptions())
        return {r["id"]: r.asDict(recursive=True) for r in df.collect()}

    def test_typed_numeric_literals(self, spark):
        xsd_int = C.XSD_INTEGER_URI
        rows = [
            ("<http://e/a>", "<http://p/n>", f'"42"^^{xsd_int}', C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/d>", f'"1e3"^^{C.XSD_DOUBLE_URI}', C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/bad>", f'"NaN-ish"^^{xsd_int}', C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/b>", f'"true"^^{C.XSD_BOOLEAN_URI}', C.HK_NULL_URI),
        ]
        es = self._parse(spark, rows)
        a = es["<http://e/a>"]
        assert a["properties"]["<http://p/n>"] == ["42"]
        assert a["properties"]["<http://p/d>"] == ["1000"]  # JS Number("1e3")
        assert a["properties"]["<http://p/bad>"] == ["NaN-ish"]  # isNaN → string
        assert a["properties"]["<http://p/b>"] == ["true"]
        assert a["metaProperties"]["<http://p/n>"] == [
            "<http://www.w3.org/2001/XMLSchema#integer>"
        ]

    def test_repeated_property_accumulates_in_order(self, spark):
        rows = [
            ("<http://e/a>", "<http://p/t>", '"x"', C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/t>", '"y"', C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/t>", '"x"', C.HK_NULL_URI),
        ]
        es = self._parse(spark, rows)
        # parser appends duplicates; dedup only happens at serialize time
        assert es["<http://e/a>"]["properties"]["<http://p/t>"] == ["x", "y", "x"]

    def test_null_typed_literal_sets_only_metaproperty(self, spark):
        # parser.js:410-420 — the serializer's null-value encoding round-trips
        # to a metaProperty-only update
        o = f'""{C.HK_NULL_URI}"^^<http://T>"'
        # the raw literal whose *inner value* is "<hk://id/null>"^^<http://T>
        rows = [("<http://e/a>", "<http://p/m>", o, C.HK_NULL_URI)]
        es = self._parse(spark, rows)
        a = es["<http://e/a>"]
        assert a["properties"] is None or "<http://p/m>" not in (a["properties"] or {})
        assert a["metaProperties"]["<http://p/m>"] == ["<http://T>"]

    def test_reference_minted_for_cross_context_literal(self, spark):
        g1, g2 = "<http://ctx/1>", "<http://ctx/2>"
        rows = [
            ("<http://e/a>", "<http://p/r>", "<http://e/b>", g1),  # node a in ctx1
            ("<http://e/a>", "<http://p/t>", '"v"', g2),  # literal in ctx2 → ref
        ]
        es = self._parse(
            spark, rows, ParseOptions(create_context=True, set_node_context=True)
        )
        rid = ref_uri("<http://e/a>", g2)
        ref = es[rid]
        assert ref["type"] == C.REFERENCE
        assert ref["ref"] == "<http://e/a>"
        assert ref["parent"] == g2  # raw graph term, parser.js:135
        assert ref["properties"]["<http://p/t>"] == ["v"]
        # contexts got created for both graphs
        assert es[g1]["type"] == C.CONTEXT
        assert es[g2]["type"] == C.CONTEXT

    def test_blank_node_remap_deterministic(self, spark):
        rows = [
            ("_:b0", "<http://p/r>", "<http://e/b>", C.HK_NULL_URI),
            ("_:b0", "<http://p/t>", '"v"', C.HK_NULL_URI),
        ]
        es1 = self._parse(spark, rows)
        es2 = self._parse(spark, rows)
        assert set(es1) == set(es2)  # run-to-run deterministic
        bnodes = [i for i in es1 if i.startswith("_:")]
        assert len(bnodes) == 1
        # link id minted from the ORIGINAL blank label (parser.js:302)
        lid = spo_uri("_:b0", "<http://p/r>", "<http://e/b>", C.HK_NULL_URI)
        assert lid in es1
        # binds use the REMAPPED id (parser.js:288)
        assert es1[lid]["binds"][0]["comp"] == bnodes[0]

    def test_preserve_blank_nodes(self, spark):
        rows = [("_:b0", "<http://p/r>", "<http://e/b>", C.HK_NULL_URI)]
        es = self._parse(spark, rows, ParseOptions(preserve_blank_nodes=True))
        assert "_:b0" in es

    def test_same_statement_twice_one_link(self, spark):
        rows = [
            ("<http://e/a>", "<http://p/r>", "<http://e/b>", C.HK_NULL_URI),
            ("<http://e/a>", "<http://p/r>", "<http://e/b>", C.HK_NULL_URI),
        ]
        es = self._parse(spark, rows)
        links = [e for e in es.values() if e["type"] == C.LINK]
        assert len(links) == 1
