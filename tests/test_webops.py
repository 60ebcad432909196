"""Unit tests for the round-5 web-corpus ops: substring-window dedup,
C4 heuristic filters, URL/domain rollups, deterministic mixture sampling."""

import pytest
from pyspark.sql import Row, functions as F

from rdf2hk_spark.ops import c4, dedup, sampling, webstats
from rdf2hk_spark.ops.hashing import md5_int_py


def _df(spark, rows):
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------- window dedup


def test_window_dedup_cross_doc_only(spark):
    # doc 1 and 2 share an 8-token passage; doc 3 repeats ITS OWN 8-gram
    # twice (within-doc repeat must NOT count); doc 4 is too short.
    shared = "a b c d e f g h"
    rows = [
        Row(doc_id=1, text=f"x1 y1 {shared} z1"),
        Row(doc_id=2, text=f"{shared} q2 r2"),
        Row(doc_id=3, text=f"m n o p q r s t u m n o p q r s t u"),
        Row(doc_id=4, text="too short"),
    ]
    out = {
        r["id"]: r
        for r in dedup.window_dedup(_df(spark, rows), k=8).collect()
    }
    # doc1: tokens = 11 -> 4 windows; exactly one (the aligned shared) dup
    assert out[1]["n_windows"] == 4
    assert out[1]["n_dup_windows"] == 1
    assert out[1]["dup_ratio_x1000"] == 250
    # doc2: 10 tokens -> 3 windows, one dup
    assert out[2]["n_windows"] == 3
    assert out[2]["n_dup_windows"] == 1
    # doc3: 18 tokens -> 11 windows; all repeats are within-doc -> 0 dups
    assert out[3]["n_windows"] == 11
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_ratio_x1000"] == 0
    # doc4: < k tokens -> present with zeros
    assert out[4]["n_windows"] == 0
    assert out[4]["dup_ratio_x1000"] == 0


def test_window_dedup_min_docs_threshold(spark):
    shared = "a b c d e f g h"
    rows = [Row(doc_id=i, text=shared) for i in (1, 2, 3)]
    strict = dedup.window_dedup(_df(spark, rows), k=8, min_docs=4).collect()
    assert all(r["n_dup_windows"] == 0 for r in strict)
    loose = dedup.window_dedup(_df(spark, rows), k=8, min_docs=3).collect()
    assert all(r["n_dup_windows"] == 1 for r in loose)


# ------------------------------------------------------------------ C4 filters


def test_c4_line_filter_rules(spark):
    text = "\n".join(
        [
            "this line has enough words to survive.",  # keep
            "short line.",  # too few words
            "this line has enough words but no terminal punct",  # no punct
            "please enable javascript and accept the cookies.",  # badword
            "does a question mark count as terminal punctuation?",  # keep
            'he said "it ends with a quote."',  # keep (quote after .)
        ]
    )
    out = c4.c4_line_filter(
        _df(spark, [Row(doc_id=1, text=text)]), min_words=5
    ).collect()[0]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 3
    kept = out["text_kept"].split("\n")
    assert kept[0].startswith("this line has enough")
    assert kept[1].startswith("does a question")
    assert kept[2].endswith('quote."')


def test_c4_line_filter_empty_survivors(spark):
    out = c4.c4_line_filter(
        _df(spark, [Row(doc_id=1, text="no punct here\nok.")]), min_words=5
    ).collect()[0]
    assert out["n_kept"] == 0 and out["text_kept"] == ""


def test_c4_doc_filter_rules(spark):
    rows = [
        Row(doc_id=1, text="one two three four five. six seven. eight nine?"),
        Row(doc_id=2, text="code sample { return 1; } done. ok. fine."),
        Row(doc_id=3, text="Lorem Ipsum dolor sit amet. more. words here."),
        Row(doc_id=4, text="only two sentences. here they are."),
        Row(doc_id=5, text="tiny. a. b."),  # 3 sentences but 3 words
    ]
    out = {r["id"]: r for r in c4.c4_doc_filter(_df(spark, rows)).collect()}
    assert out[1]["keep"] == 1 and out[1]["n_sentences"] == 3
    assert out[2]["keep"] == 0 and out[2]["has_brace"] == 1
    assert out[3]["keep"] == 0 and out[3]["has_lorem"] == 1
    assert out[4]["keep"] == 0 and out[4]["n_sentences"] == 2
    assert out[5]["keep"] == 0 and out[5]["n_words"] == 3


# -------------------------------------------------------------- URL / domains


@pytest.mark.parametrize(
    "url,host,domain",
    [
        ("https://www.example.com/p/1", "www.example.com", "example.com"),
        ("http://user:pw@a.b.site.org:8080/x?q=1", "a.b.site.org", "site.org"),
        ("https://LOCALHOST/x", "localhost", "localhost"),
        ("ftp+ssh://files.example.co.uk/f", "files.example.co.uk", "co.uk"),
        ("not a url", "", ""),
        ("https://example.com?q=1", "example.com", "example.com"),
    ],
)
def test_host_and_domain_extraction(spark, url, host, domain):
    row = (
        _df(spark, [Row(url=url)])
        .select(
            webstats.host_of(F.col("url")).alias("h"),
        )
        .select("h", webstats.domain_of(F.col("h")).alias("d"))
        .collect()[0]
    )
    assert row["h"] == host
    assert row["d"] == domain


def test_domain_stats_rollup(spark):
    rows = [
        Row(url="https://a.x.com/1", text="aaaa", lang="en"),
        Row(url="https://b.x.com/2", text="bb", lang="fr"),
        Row(url="https://a.x.com/3", text="c", lang="en"),
        Row(url="https://y.org/1", text="ddd", lang="en"),
    ]
    out = {r["domain"]: r for r in webstats.domain_stats(_df(spark, rows)).collect()}
    assert out["x.com"]["n_docs"] == 3
    assert out["x.com"]["n_hosts"] == 2
    assert out["x.com"]["n_langs"] == 2
    assert out["x.com"]["sum_chars"] == 7
    assert out["x.com"]["mean_chars_x100"] == 233  # floor(7*100/3)
    assert out["y.org"]["n_docs"] == 1


# ------------------------------------------------------------ mixture sampling


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    rows = [
        Row(doc_id=i, source="keep_all" if i % 2 == 0 else "drop_all")
        for i in range(200)
    ]
    rates = {"keep_all": 1000, "drop_all": 0}
    out = sampling.mixture_sample(
        _df(spark, rows), rates, key_col="doc_id", stratum_col="source"
    )
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == list(range(0, 200, 2))  # all even kept, all odd dropped
    # rerun -> byte-identical decision set (hash, not RNG)
    again = sorted(r["doc_id"] for r in out.collect())
    assert again == got


def test_mixture_sample_matches_python_twin(spark):
    rows = [Row(doc_id=i, source="half") for i in range(500)]
    out = sampling.mixture_sample(
        _df(spark, rows), {"half": 500}, key_col="doc_id", stratum_col="source"
    )
    got = sorted(r["doc_id"] for r in out.collect())
    expect = [i for i in range(500) if md5_int_py(str(i), 6) % 1000 < 500]
    assert got == expect
    # a fair-ish split (the draw is uniform-ish): between 35% and 65%
    assert 175 <= len(got) <= 325


def test_mixture_sample_join_variant_equivalent(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 3}", payload=i * 2) for i in range(300)
    ]
    rates = {"s0": 1000, "s1": 300}
    df = _df(spark, rows)
    a = sampling.mixture_sample(
        df, rates, key_col="doc_id", stratum_col="source", default_x1000=50
    )
    rdf = _df(
        spark,
        [Row(source="s0", rate_x1000=1000), Row(source="s1", rate_x1000=300)],
    )
    b = sampling.mixture_sample_join(
        df, rdf, key_col="doc_id", stratum_col="source", default_x1000=50
    )
    ra = sorted((r["doc_id"], r["payload"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["payload"]) for r in b.collect())
    assert ra == rb and len(ra) > 0
    # input columns survive the join variant untouched
    assert set(b.columns) == {"doc_id", "source", "payload"}


# ------------------------------------------------------------- plan shapes
# The 100-TB argument as assertions: the scan-speed ops must compile to
# zero-Exchange plans, the broadcast variant must not shuffle the corpus,
# and the rollups must not degenerate into cartesian products.


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_c4_filters_compile_shuffle_free(spark):
    df = _df(spark, [Row(doc_id=1, text="a b c d e.\nf g")])
    assert "Exchange" not in _plan(c4.c4_doc_filter(df))
    assert "Exchange" not in _plan(c4.c4_line_filter(df))


def test_mixture_sample_is_a_pure_scan_predicate(spark):
    df = _df(spark, [Row(doc_id=i, source="s") for i in range(10)])
    p = _plan(sampling.mixture_sample(df, {"s": 500}))
    assert "Exchange" not in p


def test_mixture_sample_join_broadcasts_rates_only(spark):
    df = _df(spark, [Row(doc_id=i, source="s") for i in range(10)])
    rates = _df(spark, [Row(source="s", rate_x1000=500)])
    p = _plan(sampling.mixture_sample_join(df, rates))
    assert "BroadcastExchange" in p  # the tiny rates side
    assert "Exchange hashpartitioning" not in p  # never the corpus


def test_domain_stats_single_keyed_shuffle_family(spark):
    df = _df(
        spark,
        [Row(url="https://a.x.com/1", text="aa", lang="en") for _ in range(4)],
    )
    p = _plan(webstats.domain_stats(df))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # count_distinct compiles to expand + two-phase agg: at most two keyed
    # exchanges (partial by (domain, expand-key), final by domain)
    assert p.count("Exchange hashpartitioning") <= 2


def test_window_dedup_no_product_joins(spark):
    df = _df(spark, [Row(doc_id=i, text="a b c d e f g h i") for i in range(3)])
    p = _plan(dedup.window_dedup(df, k=8))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
