"""CustomHKParser contextualize tests — the reference's second Mocha suite
(test/rdf2hk_test.js:107-167): exactly 1 CONTEXT in both variants."""

import pytest

from rdf2hk_spark import constants as C
from rdf2hk_spark.fixtures import people_from_jf as FX
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


def _opts(allow_reference: bool) -> ParseOptions:
    return ParseOptions(
        create_context=True, set_node_context=True, convert_hk=True,
        custom_rdf_parser=True,
        contextualize=[{"p": FX.P19, "allowReference": allow_reference}],
        hierarchy_connector_ids=[FX.P31],
    )


@pytest.mark.parametrize("allow_reference", [True, False])
def test_exactly_one_context(spark, allow_reference):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    ents = parse_quads(quads, _opts(allow_reference), persist=False)
    rows = {r["id"]: r.asDict(recursive=True) for r in ents.collect()}
    ctxs = [e for e in rows.values() if e["type"] == C.CONTEXT]
    assert len(ctxs) == 1
    assert FX.Q193019 in rows and rows[FX.Q193019]["type"] == C.CONTEXT


def test_allow_reference_structure(spark):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    rows = {
        r["id"]: r.asDict(recursive=True)
        for r in parse_quads(quads, _opts(True), persist=False).collect()
    }
    by_type = {}
    for e in rows.values():
        by_type[e["type"]] = by_type.get(e["type"], 0) + 1
    # P19 consumed ⇒ 1 connector (P31, hierarchy per custom option), 10 P31
    # links, 11 nodes (10 persons + Q5), 10 refs (person→Q193019 context)
    assert by_type == {
        C.CONNECTOR: 1, C.CONTEXT: 1, C.NODE: 11, C.LINK: 10, C.REFERENCE: 10,
    }
    assert rows[FX.P31]["className"] == C.HIERARCHY
    refs = [e for e in rows.values() if e["type"] == C.REFERENCE]
    assert all(e["parent"] == FX.Q193019 for e in refs)
    # persons keep their null parent; binds stay direct
    p = rows[f"<{FX.WD}Q1131864>"]
    assert p["type"] == C.NODE and p["parent"] is None


def test_reparent_variant_moves_nodes(spark):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    rows = {
        r["id"]: r.asDict(recursive=True)
        for r in parse_quads(quads, _opts(False), persist=False).collect()
    }
    p = rows[f"<{FX.WD}Q1131864>"]
    assert p["parent"] == FX.Q193019  # re-parented into the context
    refs = [e for e in rows.values() if e["type"] == C.REFERENCE]
    assert len(refs) == 10
    assert all(e["parent"] is None for e in refs)  # left behind in old parent
