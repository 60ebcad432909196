"""Term-kernel parity tests vs hand-computed reference (utils.js) values."""

import hashlib
import urllib.parse

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark.functions import terms as T


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(col_fn("v")).collect()]


def test_encode_uri_component_parity(spark):
    cases = [
        "<http://a/b#c>", "hk://id/null", "a b+c", "ç日本!~*'()", "%", "_:b0",
        "a&b=c?d", "näme/with spaces",
    ]
    got = _eval(spark, T.encode_uri_component, cases)
    exp = [urllib.parse.quote(c, safe="-_.!~*'()") for c in cases]  # JS-safe set
    assert got == exp


def test_id_from_resource(spark):
    cases = {
        "<http://x/y>": "<http://x/y>",
        "<hk://id/null>": None,
        "<hk://id/abc%20d>": "abc d",
        "<hk://b/b0>": "_:b0",
        "_:z": "_:z",
        '"lit"': '"lit"',
        "<http://research.ibm.com/ontologies/graph#body>": None,
    }
    got = _eval(spark, T.id_from_resource, list(cases))
    assert got == list(cases.values())


def test_literal_codec(spark):
    cases = {
        '"hello"': ("hello", None, None),
        '"ola"@pt': ("ola", "pt", None),
        '"42"^^<http://www.w3.org/2001/XMLSchema#integer>': (
            "42", None, "<http://www.w3.org/2001/XMLSchema#integer>"),
        '"a\nb"': ("a\nb", None, None),
        '"a@b"': ("a@b", None, None),
        "plain": ("plain", None, None),  # utils.js:258-262 fallback
        "<http://u>": (None, None, None),
    }
    vals = _eval(spark, T.literal_value, list(cases))
    langs = _eval(spark, T.literal_lang, list(cases))
    dts = _eval(spark, T.literal_datatype, list(cases))
    for (k, (ev, el, ed)), v, l, d in zip(cases.items(), vals, langs, dts):
        assert (v, l, d) == (ev, el, ed), k


def test_js_number_string(spark):
    cases = {
        "42": "42", "1.5": "1.5", "1e3": "1000", "0.0001": "0.0001",
        "": "0", "abc": None, "1e21": "1e+21", "1e-3": "0.001",
        "123456789.5": "123456789.5", "0.1": "0.1", "+17": "17",
        "12345678901234567890": "12345678901234567000",
        "-2.5e-7": "-2.5e-7", "2.5e20": "250000000000000000000",
        "1.2345678901234567e-6": "0.0000012345678901234567",
    }
    got = _eval(spark, T.js_number_string, list(cases))
    assert got == list(cases.values())


def test_label_from_uri(spark):
    cases = {
        "<http://a/b#c>": "c", "<http://a/b/c>": "c", "<http://a>": "a",
        "x": "x", "<http://a/>": "http://a/",
    }
    got = _eval(spark, T.label_from_uri, list(cases))
    assert got == list(cases.values())


def test_md5_minting(spark):
    s, p, o, g = "<http://a>", "<http://p>", "<http://b>", "<hk://id/null>"
    df = spark.range(1).select(
        T.create_spo_uri(F.lit(s), F.lit(p), F.lit(o), F.lit(g)).alias("l"),
        T.create_ref_uri(F.lit("<http://a>"), F.lit("<http://g>")).alias("r"),
        T.create_content_node_uri(F.lit("some content")).alias("c"),
        T.create_anchor_uri(F.lit("e1"), F.lit("k1")).alias("a"),
    )
    row = df.collect()[0]
    q = lambda x: urllib.parse.quote(x, safe="-_.!~*'()")
    md5 = lambda x: hashlib.md5(x.encode()).hexdigest()
    assert row.l == f"<hk://link/{md5(s + p + o + g)}>"
    assert row.r == f"<hk://ref/{md5(q('<http://g>') + '/' + q('<http://a>'))}>"
    assert row.c == f"<hk://node/{md5('some content')}>"
    assert row.a == f"<hk://a/{md5(q('e1') + '/' + q('k1'))}>"


def test_term_predicates(spark):
    df = spark.createDataFrame(
        [("<http://a>",), ("_:b",), ('"x"',), ("<a>",), ("<>",), ("y",)], "v string"
    )
    rows = df.select(
        T.is_uri("v").alias("u"), T.is_blank_node("v").alias("b"),
        T.is_literal("v").alias("l"),
    ).collect()
    assert [(r.u, r.b, r.l) for r in rows] == [
        (True, False, False), (False, True, False), (False, False, True),
        (True, False, False), (False, False, False), (False, False, False),
    ]


def test_encode_uri_component_bulk_parity(spark):
    """Bulk parity vs Python's quote(safe="-_.!~*'()") (the
    encodeURIComponent contract) over a seeded random corpus — breadth
    beyond the hand-computed vectors above, including multi-byte UTF-8,
    spaces, '+' and every ASCII punctuation class; also round-trips through
    decode_uri_component."""
    import random
    import urllib.parse

    rng = random.Random(20260817)
    alphabet = (
        "abcXYZ012 +/?#[]@!$&'()*,;=%<>\"\\^`{}|~-_.\u00e9\u4e2d\U0001f600"
    )
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "v string")
    got = (
        df.select("v", T.encode_uri_component(F.col("v")).alias("e"))
        .withColumn("d", T.decode_uri_component(F.col("e")))
        .collect()
    )
    for r in got:
        assert r["e"] == urllib.parse.quote(r["v"], safe="-_.!~*'()"), r["v"]
        assert r["d"] == r["v"], r["v"]
