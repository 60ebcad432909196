"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Pure Column expressions (JVM-side); all ratio-like
outputs are emitted as exact integer arithmetic (floor of integer-scaled
rationals) so the DuckDB oracle compares bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark.ops.hashing import md5s
from rdf2hk_spark.ops.tokens import kgrams_from_tokens, tokens_frame

# tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "in"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
    "pt": ["o", "a", "de", "e", "que"],
}


def token_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "simple",
) -> DataFrame:
    r"""(id, n_chars, n_ws_tokens, n_re_tokens): whitespace tokens + a
    BPE-ish lexer count (letter runs / digit runs / single other chars).
    ``tokenizer="ws"`` counts whitespace-RUN tokens (trim + \s+ split,
    whitespace-only text counts 0) — the production rule for corpora with
    tabs/newlines/multi-space runs."""
    t = F.col(text_col)
    if tokenizer == "simple":
        n_ws = F.size(F.split(t, " "))
    elif tokenizer == "ws":
        # regex trim: F.trim strips spaces only, not tabs/newlines
        tt = F.regexp_replace(t, r"^\s+|\s+$", "")
        n_ws = F.when(F.length(tt) == 0, F.lit(0)).otherwise(
            F.size(F.split(tt, r"\s+"))
        )
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(t).cast("long").alias("n_chars"),
        n_ws.cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long").alias(
            "n_re_tokens"
        ),
    )


# token staging shared with the dedup pipeline: ops.tokens.tokens_frame
# (the split must bind as its own projection — BENCH.md §9)
_tokens_frame = tokens_frame


def quality_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality signals per doc, integer-exact:
    n_tokens, n_distinct, mean_tok_len_x100, stop_ratio_x1000, distinct_ratio_x1000."""
    toks = F.col("toks")
    stops = LANG_MARKERS["en"]
    n_tok = F.size(toks).cast("long")
    n_dis = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(stops))).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return _tokens_frame(df, id_col, text_col).select(
        "id",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        F.floor(sum_len * 100.0 / n_tok).cast("long").alias("mean_tok_len_x100"),
        F.floor(n_stop * 1000.0 / n_tok).cast("long").alias("stop_ratio_x1000"),
        F.floor(n_dis * 1000.0 / n_tok).cast("long").alias("distinct_ratio_x1000"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language scores + argmax prediction ('unknown' when no
    marker hits). Deterministic tie-break: language name ascending."""
    toks = F.col("toks")
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))).cast("long")
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return _tokens_frame(df, id_col, text_col).select(
        "id",
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        pred.alias("pred_lang"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Document fingerprint: the minimum md5 over word k-grams (winnowing's
    global window). (id, fp, n_grams)."""
    grams = kgrams_from_tokens(F.col("toks"), k)
    # grams itself is referenced twice (min-hash + size) — stage it too
    return (
        _tokens_frame(df, id_col, text_col)
        .select("id", grams.alias("_grams"))
        .select(
            "id",
            F.array_min(F.transform(F.col("_grams"), lambda g: md5s(g))).alias("fp"),
            F.size(F.col("_grams")).cast("long").alias("n_grams"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb-style
    repetitive-content filters), integer-exact for oracle parity:
    (id, n_grams, top_gram_n, n_words, n_distinct_words).

    - ``top_gram_n / n_grams`` = fraction of the document occupied by its
      single most-frequent word n-gram (boilerplate/listicle detector);
    - ``1 - n_distinct_words / n_words`` = duplicate-word mass.

    Plan: explode n-grams → count per (id, gram) → max per id; partial
    map-side combines keep the shuffle at one row per (id, gram). Ties on
    the max count are irrelevant (only the count is emitted)."""
    # two-step select: grams references the tokenized COLUMN, so the
    # split/lower runs once per row (ops.tokens staging rule)
    tok_frame = _tokens_frame(df, id_col, text_col)
    grams = kgrams_from_tokens(F.col("toks"), n)
    base = tok_frame.select("id", "toks", grams.alias("grams"))
    word_stats = base.select(
        "id",
        F.size("toks").cast("long").alias("n_words"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_words"),
        F.size("grams").cast("long").alias("n_grams"),
    )
    gram_counts = (
        base.select("id", F.explode("grams").alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_gram_n"))
    )
    return word_stats.join(gram_counts, "id", "left").select(
        "id", "n_grams",
        F.coalesce("top_gram_n", F.lit(0)).cast("long").alias("top_gram_n"),
        "n_words", "n_distinct_words",
    )


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 20,
    tokenizer: str = "simple",
) -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams: (gram, n_occurrences,
    n_docs), ordered by occurrences desc then gram asc (a TOTAL order, so
    the k-cut is deterministic and oracle-matchable).

    Plan: explode n-grams -> ONE groupBy(gram) computing both the
    occurrence count and the distinct-doc count (count distinct rewrites
    to a two-phase expand+partial aggregate — still a single shuffle key)
    -> global top-k. The final sort-limit is a TakeOrderedAndProject:
    each partition keeps only its local top k, so the driver sees
    k * numPartitions rows, never the gram dictionary."""
    staged = tokens_frame(df, id_col, text_col, mode=tokenizer)
    grams = staged.select(
        "id", F.explode(kgrams_from_tokens(F.col("toks"), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.count_distinct("id").cast("long").alias("n_docs"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("gram").asc()
    ).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the corpus-analytics op behind
    keyword extraction / topic sampling at training scale.

    Integer-exact scoring so the DuckDB oracle hashes bit-equal: the IDF
    factor is ``N * 1000 // df`` (integer floor division — no engine ever
    evaluates a float log) and ``score = tf * (N * 1000 // df)``. Rank
    is ``row_number`` over (score desc, term asc) — a total order, so the
    k-cut is deterministic at any partitioning.

    Returns (id, term, tf, df, score, rank), rank 1..k per document.

    Scale shape (10^12 docs): tf is one groupBy(id, term) with map-side
    partial counts; df re-aggregates the SAME (id, term) rows by term
    (count of rows = count of distinct docs, since the tf stage already
    collapsed duplicates) — so the document-frequency pass shuffles one
    row per (doc, term), never one per occurrence. The df side joins back
    term-keyed (hot terms skew it: AQE skew-join split applies; payload
    is one long; at test scale AQE broadcasts the small vocabulary side
    instead — measured plan: 1 BroadcastExchange). The final top-k is a
    row_number window keyed by near-uniform doc id. Four keyed shuffles
    worst-case (tf, df, term join, id window), no driver hop, no product
    join.
    """
    from pyspark.sql.window import Window

    staged = _tokens_frame(df, id_col, text_col)
    # Corpus size N stays IN-PLAN: a 1-row count aggregate broadcast-joined
    # onto the scored rows, instead of the previous staged.count() action
    # that cost a whole extra pass over the token projection per call just
    # to fetch one scalar into a plan literal (guide §5: the driver should
    # do no data work; at 100 TB that pass is a full corpus scan).
    n_df = staged.agg(F.count("*").cast("long").alias("_n"))
    tf = (
        staged.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(dfreq, "term").crossJoin(F.broadcast(n_df)).select(
        "id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.floor(F.col("_n") * 1000 / F.col("df")))
        .cast("long")
        .alias("score"),
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
