"""The convertHK fixpoint: parse → serialize(convertHK) → parse(convertHK)
must reconstruct the same entities — ids, types, parents, connectors, refs,
classNames, roles, binds (the north_star's reification/blank-node handling)."""

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.fixtures import people_from_jf as FX
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.operators.serialize import SerializeOptions, serialize_entities

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"

PARSE_OPTS = ParseOptions(
    create_context=True, set_node_context=True, convert_hk=True,
    preserve_blank_nodes=True,
)
SER_OPTS = SerializeOptions(
    convert_hk=True, compress_reification=True, skip_ref_nodes=True,
    inverse_ref_node=True, default_graph=C.HK_NULL_URI,
)


def snapshot(df):
    rows = {}
    for r in df.collect():
        d = r.asDict(recursive=True)
        binds = sorted(
            (b["role"], b["comp"], b["anchor"]) for b in (d["binds"] or [])
        )
        rows[d["id"]] = (
            d["type"], d["parent"], d["connector"], d["ref"], d["className"],
            tuple(sorted((d["roles"] or {}).items())), tuple(binds),
            tuple(sorted((k, tuple(v)) for k, v in (d["properties"] or {}).items())),
        )
    return rows


@pytest.fixture(scope="module")
def first_pass(spark):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    # localCheckpoint (not cache): the serializer fans out into ~12 branches
    # over this frame — truncating the lineage here keeps the downstream
    # Catalyst analysis linear instead of re-analyzing the parse tree per
    # branch (the dominant cost of this module)
    return parse_quads(quads, PARSE_OPTS).localCheckpoint()


def test_convert_hk_roundtrip_fixture(spark, first_pass):
    a = snapshot(first_pass)
    assert len(a) == 34
    rdf = serialize_entities(first_pass, SER_OPTS)
    second = parse_quads(
        rdf.select("stmt_idx", "s", "p", "o", "g"), PARSE_OPTS
    )
    b = snapshot(second)
    missing = set(a) - set(b)
    extra = set(b) - set(a)
    assert not missing and not extra, f"missing={list(missing)[:4]} extra={list(extra)[:4]}"
    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diffs, f"{len(diffs)} diffs, e.g. {list(diffs.items())[:2]}"


def test_convert_hk_roundtrip_with_contexts_and_refs(spark):
    """Round trip with named graphs, references, blank nodes and typed/lang
    literals. preserveBlankNodes on both passes — the reference itself
    re-remaps blank labels (uuid) on every parse, so bnode ids and their link
    MD5s are only round-trip stable under that option (parser.js:197-208)."""
    g1, g2 = "<http://ctx/1>", "<http://ctx/2>"
    rows = [
        (0, "<http://e/a>", "<http://p/r>", "<http://e/b>", g1),
        (1, "<http://e/a>", "<http://p/t>", '"v"@pt', g2),
        (2, "<http://e/b>", "<http://p/n>",
         f'"7"^^{C.XSD_INTEGER_URI}', g1),
        (3, "_:x", "<http://p/r>", "<http://e/a>", g1),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    first = parse_quads(quads, PARSE_OPTS).localCheckpoint()
    a = snapshot(first)
    rdf = serialize_entities(first, SER_OPTS)
    second = parse_quads(rdf.select("stmt_idx", "s", "p", "o", "g"), PARSE_OPTS)
    b = snapshot(second)
    assert set(a) == set(b), f"ids differ: {set(a) ^ set(b)}"
    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diffs, f"{len(diffs)} diffs, e.g. {list(diffs.items())[:3]}"
