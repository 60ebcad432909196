"""Hand-computed unit tests for the round-5 training-data ops:
decontamination, line-level dedup, PII redaction, corpus top-k n-grams."""

import pytest

from rdf2hk_spark.ops import dedup, pii, textstats
from rdf2hk_spark.ops.decontam import decontaminate


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestDecontaminate:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        corpus = spark.createDataFrame(
            [
                # exact copy of eval doc e1 → every gram overlaps
                (1, "a b c d e f"),
                # shares the single 4-gram "c d e f" with e1's tail
                (2, "x y c d e f"),
                # no overlap
                (3, "p q r s t u"),
                # shorter than n → zero grams, never contaminated
                (4, "a b c"),
            ],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(100, "a b c d e f")], "doc_id long, text string"
        )
        return corpus, ev

    def test_overlap_counts(self, frames):
        corpus, ev = frames
        out = decontaminate(corpus, ev, n=4, min_overlap=1)
        assert _rows(out, "id", "n_grams", "n_overlap", "contaminated") == [
            (1, 3, 3, 1),
            (2, 3, 1, 1),
            (3, 3, 0, 0),
            (4, 0, 0, 0),
        ]

    def test_min_overlap_threshold(self, frames):
        corpus, ev = frames
        out = decontaminate(corpus, ev, n=4, min_overlap=2)
        flagged = {r["id"] for r in out.filter("contaminated = 1").collect()}
        assert flagged == {1}

    def test_duplicate_grams_count_once(self, spark):
        # the same 2-gram repeated in BOTH corpus doc and eval set still
        # counts once: overlap is set-intersection cardinality
        corpus = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(9, "a b a b")], "doc_id long, text string"
        )
        r = decontaminate(corpus, ev, n=2).collect()[0]
        # corpus distinct 2-grams: {a b, b a}; eval: {a b, b a} → overlap 2
        assert (r["n_grams"], r["n_overlap"]) == (2, 2)


class TestLineDedup:
    @pytest.fixture(scope="class")
    def out(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "keep one\nBOILER\nkeep two"),
                (2, "BOILER\nunique line"),
                (3, "BOILER"),  # every line boilerplate → empty text_kept
                (4, "solo doc"),
                # a line repeated WITHIN one doc only is NOT boilerplate
                (5, "twice\ntwice\nend"),
            ],
            "doc_id long, text string",
        )
        return {r["id"]: r for r in dedup.line_dedup(docs).collect()}

    def test_counts_and_reassembly(self, out):
        assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
        assert out[1]["text_kept"] == "keep one\nkeep two"
        assert out[2]["text_kept"] == "unique line"

    def test_all_boiler_doc_keeps_row_with_empty_text(self, out):
        assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 0)
        assert out[3]["text_kept"] == ""

    def test_untouched_doc(self, out):
        assert out[4]["text_kept"] == "solo doc"

    def test_within_doc_repeat_not_boiler(self, out):
        # min_docs counts DISTINCT documents, not occurrences
        assert out[5]["text_kept"] == "twice\ntwice\nend"

    def test_min_docs_threshold(self, spark):
        docs = spark.createDataFrame(
            [(1, "x\na"), (2, "x\nb"), (3, "x\nc")],
            "doc_id long, text string",
        )
        out3 = {
            r["id"]: r["text_kept"]
            for r in dedup.line_dedup(docs, min_docs=3).collect()
        }
        assert out3 == {1: "a", 2: "b", 3: "c"}
        out4 = {
            r["id"]: r["text_kept"]
            for r in dedup.line_dedup(docs, min_docs=4).collect()
        }
        assert out4[1] == "x\na"  # threshold not reached → kept


class TestPii:
    def test_counts_and_redaction(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "mail a.b-c_d@ex-ample.co.uk and x@y.io end"),
                (2, "ips 10.0.0.1 and 255.255.255.255 ok"),
                (3, "call +1 555-123-4567 or 555-000-1111 now"),
                (4, "clean text with no pii at all"),
                (5, "mixed u@v.com 1.2.3.4 +44-201-555-0000"),
            ],
            "doc_id long, text string",
        )
        out = {r["id"]: r for r in pii.pii_redact(docs).collect()}
        assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
        assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> end"
        assert out[2]["n_ipv4"] == 2
        assert out[2]["redacted"] == "ips <IP> and <IP> ok"
        assert out[3]["n_phones"] == 2
        assert out[3]["redacted"] == "call <PHONE> or <PHONE> now"
        assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (0, 0, 0)
        assert out[4]["redacted"] == "clean text with no pii at all"
        assert out[5]["redacted"] == "mixed <EMAIL> <IP> <PHONE>"

    def test_version_string_not_an_ip(self, spark):
        # \b guards: 1.2.3.4000 must not half-match as an IPv4
        docs = spark.createDataFrame(
            [(1, "version 1.2.3.4000 shipped")], "doc_id long, text string"
        )
        r = pii.pii_stats(docs).collect()[0]
        assert r["n_ipv4"] == 0


class TestTopNgrams:
    def test_counts_and_tiebreak(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c a b c"),   # "a b c" x2, "b c a" x1, "c a b" x1
                (2, "a b c"),          # "a b c" x1
                (3, "z z z z"),        # "z z z" x2
            ],
            "doc_id long, text string",
        )
        out = textstats.top_ngrams(docs, n=3, k=3).collect()
        got = [(r["gram"], r["n_occurrences"], r["n_docs"]) for r in out]
        # order: count desc, gram asc — "a b c"(3) > "z z z"(2) > "b c a"(1)
        assert got == [("a b c", 3, 2), ("z z z", 2, 1), ("b c a", 1, 1)]

    def test_k_cut_is_deterministic_under_ties(self, spark):
        docs = spark.createDataFrame(
            [(1, "q w e"), (2, "a s d")], "doc_id long, text string"
        )
        out = textstats.top_ngrams(docs, n=3, k=1).collect()
        assert [r["gram"] for r in out] == ["a s d"]  # tie → gram asc


def test_tfidf_top_terms(spark):
    from pyspark.sql import Row

    from rdf2hk_spark.ops.textstats import tfidf_top_terms

    rows = [
        Row(doc_id=1, text="apple apple banana common"),
        Row(doc_id=2, text="banana cherry common"),
        Row(doc_id=3, text="cherry cherry cherry common"),
    ]
    out = tfidf_top_terms(spark.createDataFrame(rows), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r["rank"])
    # N=3; idf_x1000: df=1 -> 3000, df=2 -> 1500, df=3 -> 1000
    d1 = by_doc[1]
    assert (d1[0]["term"], d1[0]["tf"], d1[0]["df"], d1[0]["score"]) == (
        "apple", 2, 1, 6000
    )
    assert d1[1]["term"] == "banana" and d1[1]["score"] == 1500
    # doc 3: cherry tf=3 df=2 -> 4500 beats common 1000
    d3 = by_doc[3]
    assert d3[0]["term"] == "cherry" and d3[0]["score"] == 4500
    assert d3[1]["term"] == "common" and d3[1]["score"] == 1000
    # ties break term-ascending: doc 2 banana vs cherry both tf=1 df=2
    d2 = by_doc[2]
    assert [r["term"] for r in d2] == ["banana", "cherry"]
    # every doc contributes exactly k rows (corpus bigger than k terms)
    assert all(len(v) == 2 for v in by_doc.values())


def test_tfidf_builds_without_driver_action(spark, monkeypatch):
    """r6 optimization guard: corpus size N is computed IN-PLAN (broadcast
    scalar aggregate), so building the query must trigger no eager action
    (the previous implementation ran staged.count() at build time — a whole
    extra pass over the token projection per call)."""
    from pyspark.sql import Row
    from pyspark.sql import classic as _classic

    from rdf2hk_spark.ops.textstats import tfidf_top_terms

    df = spark.createDataFrame([Row(doc_id=1, text="a b a")])

    def boom(self):
        raise AssertionError("tfidf_top_terms ran an eager action at build")

    monkeypatch.setattr(_classic.dataframe.DataFrame, "count", boom)
    out = tfidf_top_terms(df, k=2)  # must not raise
    monkeypatch.undo()
    assert {(r["term"], r["score"]) for r in out.collect()} == {
        ("a", 2000), ("b", 1000)
    }


def test_md5_int_translate_matches_python_twin(spark):
    """r6 optimization guard: the translate()-based hex-letter strip in
    md5_int must stay byte-identical to the Python twin (and so to the
    regexp_replace-based DuckDB oracle fragment) for every digit window."""
    from pyspark.sql import functions as F

    from rdf2hk_spark.ops.hashing import md5_int, md5_int_py

    samples = ["", "a", "Ana Silva", "héllo wörld", "x" * 100, "123", "_:b0"]
    for digits, offset in ((6, 0), (9, 0), (9, 9), (15, 0), (3, 5)):
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        got = {
            r["s"]: r["h"]
            for r in df.select(
                "s", md5_int(F.col("s"), digits, offset).alias("h")
            ).collect()
        }
        for s in samples:
            assert got[s] == md5_int_py(s, digits, offset), (s, digits, offset)


class TestCappedMemberLists:
    """Focused tests for the skew-bounded salted member-list aggregation
    (r6): identical group/pair results to a naive groupBy+collect_list,
    with per-key buffers hard-bounded at salt*(cap+1)."""

    def test_matches_naive_groupby(self, spark):
        from pyspark.sql import functions as F

        rows = (
            # viral key: 12 members, far over cap -> dropped
            [("hot", f"d{i}") for i in range(12)]
            # surviving keys: must come back COMPLETE (no truncation)
            + [("k3", "a"), ("k3", "b"), ("k3", "c")]
            + [("k2", "x"), ("k2", "y")]
            # singleton: below min_n
            + [("k1", "solo")]
        )
        df = spark.createDataFrame(rows, "bkey string, id string")
        out = {
            r["bkey"]: (r["n"], sorted(r["ids"]))
            for r in dedup.capped_member_lists(
                df, ["bkey"], "id", cap=5, min_n=2, salt=4
            ).collect()
        }
        assert set(out) == {"k3", "k2"}
        assert out["k3"] == (3, ["a", "b", "c"])
        assert out["k2"] == (2, ["x", "y"])

    def test_true_size_seen_by_filter_despite_partial_slicing(self, spark):
        # a key whose every salt-partial is under cap+1 but whose TOTAL is
        # over cap must still be dropped: n sums the un-sliced counts
        rows = [("k", f"d{i}") for i in range(7)]
        df = spark.createDataFrame(rows, "bkey string, id string")
        out = dedup.capped_member_lists(
            df, ["bkey"], "id", cap=6, min_n=2, salt=16
        ).collect()
        assert out == []

    def test_pairs_from_keys_unchanged_under_skew(self, spark):
        from pyspark.sql import functions as F

        # band keys with one flooded bucket (skipped) and two shared ones
        rows = (
            [(0, "flood", f"d{i}") for i in range(60)]
            + [(0, "b1", "a"), (0, "b1", "b"), (0, "b1", "c")]
            + [(1, "b2", "a"), (1, "b2", "b")]
        )
        keys = spark.createDataFrame(rows, "band int, bkey string, id string")
        got = sorted(
            (r["a"], r["b"])
            for r in dedup.lsh_candidate_pairs_from_keys(
                keys, max_bucket=50
            ).collect()
        )
        assert got == [("a", "b"), ("a", "c"), ("b", "c")]
