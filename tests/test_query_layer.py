"""Query-layer tests (Q1-Q9 surface) over a small parsed graph."""

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.plans import query as Q

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


@pytest.fixture(scope="module")
def graph(spark):
    g1, g2 = "<http://ctx/1>", "<http://ctx/2>"
    rows = [
        (0, "<http://e/a>", "<http://p/knows>", "<http://e/b>", g1),
        (1, "<http://e/b>", "<http://p/knows>", "<http://e/c>", g1),
        (2, "<http://e/a>", "<http://p/likes>", "<http://e/c>", g2),
        (3, "<http://e/a>", "<http://p/name>", '"alice"', g1),
        (4, "<http://e/b>", "<http://p/name>", '"bob"', g1),
        (5, "<http://e/b>", "<http://p/tag>", '"x"', g1),
        (6, "<http://e/b>", "<http://p/tag>", '"y"', g1),
    ]
    return parse_quads(
        spark.createDataFrame(rows, QUAD_SCHEMA),
        ParseOptions(create_context=True, set_node_context=True),
    ).cache()


def ids(df):
    return {r["id"] for r in df.select("id").collect()}


def test_get_entities_and_lazy(graph):
    out = Q.get_entities(graph, ["<http://e/a>", "<http://e/b>"], lazy=True)
    assert ids(out) == {"<http://e/a>", "<http://e/b>"}
    assert out.columns == Q.LAZY_COLUMNS


def test_filter_by_type_and_connector(graph):
    links = Q.filter_entities(graph, {"type": "link", "connector": "<http://p/knows>"})
    assert links.count() == 2
    assert all(r["connector"] == "<http://p/knows>" for r in links.collect())


def test_filter_or_blocks(graph):
    out = Q.filter_entities(
        graph,
        [{"type": "connector"}, {"type": "context"}],
    )
    assert out.count() == 2 + 2  # connectors: knows+likes; contexts: ctx1+ctx2


def test_filter_properties(graph):
    eq = Q.filter_entities(graph, {"properties": {"<http://p/name>": "alice"}})
    assert ids(eq) == {"<http://e/a>"}
    ex = Q.filter_entities(graph, {"properties": {"<http://p/tag>": None}})
    assert ids(ex) == {"<http://e/b>"}
    inlist = Q.filter_entities(
        graph, {"properties": {"<http://p/name>": ["alice", "bob"]}}
    )
    assert ids(inlist) == {"<http://e/a>", "<http://e/b>"}


def test_filter_binds(graph):
    out = Q.filter_entities(
        graph, {"type": "link", "binds": {"object": "<http://e/c>"}}
    )
    assert out.count() == 2  # b-knows-c and a-likes-c
    any_role = Q.filter_entities(graph, {"binds": {"*": "<http://e/a>"}})
    assert any_role.count() == 2  # a as subject in two links


def test_get_links(graph):
    out = Q.get_links(graph, ["<http://e/c>"])
    assert out.count() == 2
    by_conn = Q.get_links(graph, ["<http://p/likes>"])
    assert by_conn.count() == 1


def test_remove_entities_cascade(graph):
    surviving = Q.remove_entities(graph, ["<http://e/c>"])
    gone = ids(graph) - ids(surviving)
    # c itself + the two links binding it
    assert "<http://e/c>" in gone
    assert sum(1 for g in gone if g.startswith("<hk://link/")) == 2


def test_context_hierarchy_closure(spark):
    rows = [
        (0, "<http://r>", C.ISA_URI, C.CONTEXT_URI, C.HK_NULL_URI),
        (1, "<http://m>", C.ISA_URI, C.CONTEXT_URI, "<http://r>"),
        (2, "<http://l>", C.ISA_URI, C.CONTEXT_URI, "<http://m>"),
        (3, "<http://other>", C.ISA_URI, C.CONTEXT_URI, C.HK_NULL_URI),
    ]
    ents = parse_quads(
        spark.createDataFrame(rows, QUAD_SCHEMA),
        ParseOptions(convert_hk=True, create_context=True),
    )
    out = Q.get_context_hierarchy(ents, "<http://r>")
    assert ids(out) == {"<http://r>", "<http://m>", "<http://l>"}


def test_get_rdf_bgp_and_hk_filter(spark, graph):
    from rdf2hk_spark.operators.serialize import SerializeOptions, serialize_entities

    rdf = serialize_entities(
        graph, SerializeOptions(convert_hk=True, compress_reification=True)
    ).cache()
    user = Q.get_rdf(rdf, p="<http://p/knows>")
    assert user.count() == 2
    # FILTER_HK hides the reification vocabulary entirely
    all_user = Q.filter_hk(rdf)
    assert all_user.filter(F.col("p").startswith("<hk://role")).count() == 0
    assert all_user.filter(F.col("p") == C.ISA_URI).count() == 0
    assert {r["p"] for r in all_user.select("p").distinct().collect()} == {
        "<http://p/knows>", "<http://p/likes>", "<http://p/name>", "<http://p/tag>",
    }


def test_scope_to_context(graph):
    out = Q.scope_to_context(graph.filter(F.col("type") == "link"), "<http://ctx/2>")
    assert out.count() == 1
