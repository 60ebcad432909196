"""Hot-entity skew: the salted two-phase property aggregation must produce
bit-identical results to the unsalted plan, including value order, and the
plan must actually contain the extra partial-aggregate exchange."""

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.plans import query as Q

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


@pytest.fixture(scope="module")
def skewed_quads(spark):
    """One hub entity with 5000 property statements (every page 'mentions'
    it) + a long tail of normal entities."""
    hub = spark.range(5000).select(
        F.col("id").alias("stmt_idx"),
        F.lit("<http://hub/Q5>").alias("s"),
        F.lit("<http://p/mentionedBy>").alias("p"),
        F.concat(F.lit('"doc'), F.col("id").cast("string"), F.lit('"')).alias("o"),
        F.lit("<hk://id/null>").alias("g"),
    )
    tail = spark.range(500).select(
        (F.col("id") + 10_000).alias("stmt_idx"),
        F.concat(F.lit("<http://e/"), F.col("id").cast("string"), F.lit(">")).alias("s"),
        F.lit("<http://p/name>").alias("p"),
        F.concat(F.lit('"n'), F.col("id").cast("string"), F.lit('"')).alias("o"),
        F.lit("<hk://id/null>").alias("g"),
    )
    return hub.unionByName(tail)


def test_salted_equals_unsalted(spark, skewed_quads):
    plain = parse_quads(skewed_quads, ParseOptions())
    salted = parse_quads(skewed_quads, ParseOptions(property_salt=16))
    a = {r["id"]: r["properties"] for r in plain.collect()}
    b = {r["id"]: r["properties"] for r in salted.collect()}
    assert set(a) == set(b)
    # the hub's 5000 values come back in exact stmt order under salting
    hub_a = a["<http://hub/Q5>"]["<http://p/mentionedBy>"]
    hub_b = b["<http://hub/Q5>"]["<http://p/mentionedBy>"]
    assert hub_a == hub_b
    assert len(hub_b) == 5000
    assert hub_b[0] == "doc0" and hub_b[-1] == "doc4999"
    assert a == b


def test_salted_plan_has_partial_stage(spark, skewed_quads):
    salted = parse_quads(skewed_quads, ParseOptions(property_salt=16), persist=False)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # the partial-combine key survives into the plan


def test_from_uris_level1(spark):
    rows = [
        (0, "<http://e/a>", "<http://p/r>", "<http://e/b>", "<hk://id/null>"),
        (1, "<http://e/c>", "<http://p/r>", "<http://e/d>", "<hk://id/null>"),
    ]
    ents = parse_quads(spark.createDataFrame(rows, QUAD_SCHEMA), ParseOptions())
    lvl0 = Q.from_uris(ents, ["<http://e/a>"], level=0)
    assert lvl0.count() == 1
    lvl1 = Q.from_uris(ents, ["<http://e/a>"], level=1)
    got = {r["id"] for r in lvl1.collect()}
    assert "<http://e/a>" in got and "<http://e/b>" in got
    assert "<http://p/r>" in got  # the connector
    assert "<http://e/c>" not in got  # unrelated island excluded


def test_from_uris_level2_and_classname(spark):
    # chain a -r-> b -r-> c -r-> d: level 2 from a reaches c but not d
    rows = [
        (0, "<http://e/a>", "<http://p/r>", "<http://e/b>", "<hk://id/null>"),
        (1, "<http://e/b>", "<http://p/r>", "<http://e/c>", "<hk://id/null>"),
        (2, "<http://e/c>", "<http://p/r>", "<http://e/d>", "<hk://id/null>"),
    ]
    ents = parse_quads(spark.createDataFrame(rows, QUAD_SCHEMA), ParseOptions())
    got2 = {r["id"] for r in Q.from_uris(ents, ["<http://e/a>"], level=2).collect()}
    assert {"<http://e/a>", "<http://e/b>", "<http://e/c>"} <= got2
    assert "<http://e/d>" not in got2  # 3 hops away
    got3 = {r["id"] for r in Q.from_uris(ents, ["<http://e/a>"], level=3).collect()}
    assert "<http://e/d>" in got3
    # className restricts the SEED set (fixed reference bug sparqlfactory.js:371)
    none = Q.from_uris(
        ents, ["<http://e/a>"], level=1, class_name="<http://no/such>"
    )
    assert none.count() == 0
