"""C4-style heuristic quality filtering (Raffel et al., "Exploring the
Limits of Transfer Learning" §2.2 — the cleaning pass behind the C4 corpus,
also the template for RefinedWeb/FineWeb rule filters).

Two granularities, both pure Column expressions — JVM-side, whole-stage
codegen, ZERO shuffles (per-row maps over the corpus scan; at 10^12 docs
they run at scan speed, column-prune, and partition-prune like any
projection):

- ``c4_line_filter``: the famous line rules — keep a line only if it ends
  in terminal punctuation AND has at least ``min_words`` words AND does
  not mention javascript/cookies; reassemble the survivors in order.
- ``c4_doc_filter``: the page rules — sentence count, word-count band,
  curly-brace / "lorem ipsum" / bad-word tripwires — emitted as BIGINT
  flags plus the final keep verdict.

No reference counterpart (the reference is a KG converter); these are
first-class training-data ops mandated by the round brief. Regexes stay in
the java.util.regex ∩ RE2 subset so the DuckDB oracles run them verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# a sentence terminator: ./!/? optionally followed by a closing quote
TERMINAL_RE = r'[.!?]["’\']?$'
SENTENCE_RE = r'[.!?]'
LINE_BAD_RE = r"(?i)javascript|cookie"
DOC_BAD_RE = r"(?i)lorem ipsum|\{"


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """(id, n_lines, n_kept, text_kept): per-document line filtering.

    A line survives iff it (a) ends with terminal punctuation (``.``,
    ``!`` or ``?``, optionally followed by a closing quote), (b) carries
    at least ``min_words`` single-space-separated words, and (c) does not
    mention "javascript" or "cookie" (case-insensitive). Survivors rejoin
    with ``sep`` in original order; ``text_kept = ''`` when nothing
    survives. All of it is one ``split`` + array HOFs per row — unlike
    ``line_dedup`` there is no cross-document state, hence no shuffle.
    """
    lines = F.split(F.col(text_col), sep, -1)

    def keep(l):  # noqa: E741
        return (
            (l.rlike(TERMINAL_RE))
            & (F.size(F.split(l, " ")) >= min_words)
            & (~l.rlike(LINE_BAD_RE))
        )

    return df.select(F.col(id_col).alias("id"), lines.alias("_ls")).select(
        "id",
        F.size("_ls").cast("long").alias("n_lines"),
        F.size(F.filter(F.col("_ls"), keep)).cast("long").alias("n_kept"),
        F.array_join(F.filter(F.col("_ls"), keep), sep).alias("text_kept"),
    )


def c4_doc_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = 3,
    min_words: int = 5,
    max_words: int = 50_000,
) -> DataFrame:
    """(id, n_words, n_sentences, has_brace, has_lorem, keep): page-level
    C4 verdicts, integer-exact.

    - ``n_words``      single-space word count;
    - ``n_sentences``  terminal-punctuation occurrences (``[.!?]``);
    - ``has_brace``    1 if the page contains ``{`` (code, not prose);
    - ``has_lorem``    1 if it contains "lorem ipsum" (case-insensitive);
    - ``keep``         1 iff n_sentences >= ``min_sentences`` AND
      ``min_words`` <= n_words <= ``max_words`` AND no tripwire fired.
    """
    t = F.col(text_col)
    n_words = F.size(F.split(t, " ")).cast("long")
    n_sent = F.regexp_count(t, F.lit(SENTENCE_RE)).cast("long")
    has_brace = t.contains("{").cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum").cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (
            (n_sent >= min_sentences)
            & (n_words >= min_words)
            & (n_words <= max_words)
            & (has_brace == 0)
            & (has_lorem == 0)
        )
        .cast("long")
        .alias("keep"),
    )
