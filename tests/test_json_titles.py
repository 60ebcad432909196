"""JSON quad source/sink + entity-title selection (P8)."""

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.fixtures import people_from_jf as FX
from rdf2hk_spark.functions.titles import entity_title
from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.sources import jsongraph

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


def test_json_quads_roundtrip(spark, tmp_path):
    rows = [
        (0, "<http://a>", "<http://p>", "<http://b>", "<http://g>"),
        (1, "<http://a>", "<http://p>", '"v"@en', C.HK_NULL_URI),
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    path = str(tmp_path / "quads.json")
    jsongraph.write_json_quads(quads, path)
    back = jsongraph.read_json_quads(spark, path)
    a = {(r["s"], r["p"], r["o"], r["g"]) for r in quads.collect()}
    b = {(r["s"], r["p"], r["o"], r["g"]) for r in back.collect()}
    assert a == b


def test_quads_from_tuples_defaults_graph(spark):
    q = jsongraph.quads_from_tuples(
        spark, [("<http://a>", "<http://p>", '"x"'),
                ("<http://a>", "<http://p>", "<http://b>", "<http://g>")]
    )
    rows = {(r["o"], r["g"]) for r in q.collect()}
    assert rows == {('"x"', C.HK_NULL_URI), ("<http://b>", "<http://g>")}


def test_entity_title_language_and_property_order(spark):
    rows = [
        # prefLabel in es beats label in en? No: language rank wins first (en)
        (0, "<http://e/a>", "<http://www.w3.org/2004/02/skos/core#prefLabel>",
         '"hola"@es', C.HK_NULL_URI),
        (1, "<http://e/a>", "<http://www.w3.org/2000/01/rdf-schema#label>",
         '"hello"@en', C.HK_NULL_URI),
        # b: only an untagged foaf:name
        (2, "<http://e/b>", "<http://xmlns.com/foaf/0.1/name>",
         '"Bee"', C.HK_NULL_URI),
        # c: no title properties at all → label of id
        (3, "<http://e/c>", "<http://p/x>", '"z"', C.HK_NULL_URI),
    ]
    ents = parse_quads(spark.createDataFrame(rows, QUAD_SCHEMA), ParseOptions())
    t = {r["id"]: r["title"] for r in entity_title(ents).collect()}
    assert t["<http://e/a>"] == "hello"   # en outranks es
    assert t["<http://e/b>"] == "Bee"
    assert t["<http://e/c>"] == "c"       # label_from_uri fallback
    # language preference override flips the winner
    t2 = {r["id"]: r["title"] for r in entity_title(ents, ["es", "en"]).collect()}
    assert t2["<http://e/a>"] == "hola"


def test_entity_title_on_fixture(spark):
    quads = spark.createDataFrame(FX.quads(), QUAD_SCHEMA)
    ents = parse_quads(quads, ParseOptions(create_context=True, set_node_context=True))
    t = {r["id"]: r["title"] for r in entity_title(ents, ["pt"]).collect()}
    assert t[FX.Q5] == "ser humano"
    assert t[FX.Q193019] == "Juiz de Fora"
    assert t[f"<{FX.WD}Q1131864>"] == "Ana Carolina"
    assert t[FX.P31] == "P31"  # connector falls back to uri label
