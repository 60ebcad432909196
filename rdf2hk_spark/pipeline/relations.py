"""Mention detection + pattern-based relation extraction over extracted text.

Both stages are pure column expressions (JVM regex, whole-stage codegen) —
the dictionary side is a broadcast join, so at 10^12 documents the only wide
operation is the final quad shuffle into the canonicalizer.

- ``detect_mentions``: regexp_extract_all with a capitalized-name grammar →
  surface strings → broadcast-join the surface→entity dictionary.
- ``extract_relations``: three biography patterns ("X was born in Y",
  "X works for Z", "X knows W") → (s_surface, predicate, o_surface) →
  two broadcast dictionary joins resolve surfaces to KB ids.
- ``relation_quads``: ground the relations as RDF quads in a per-page context
  graph (g = <ctx:url>) + one rdfs:label literal per mentioned entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark.pipeline import corpus

# a capitalized multi-word proper-name span (letters only, 1-4 words)
_NAME = "[A-Z][a-z]+(?: [A-Z][a-z]+){0,3}"

_INFIXES = [
    (" was born in ", corpus.P_BORN_IN),
    (" works for ", corpus.P_WORKS_FOR),
    (" knows ", corpus.P_KNOWS),
]
_PATTERNS = [
    (f"({_NAME}){infix}({_NAME})", predicate) for infix, predicate in _INFIXES
]


def detect_mentions(pages: DataFrame, catalog: DataFrame,
                    text_col: str = "extracted_text") -> DataFrame:
    """(url, surface, entity_id, kind) for every dictionary surface found."""
    spans = pages.select(
        "url",
        F.explode_outer(
            F.array_distinct(
                F.regexp_extract_all(F.col(text_col), F.lit(f"({_NAME})"))
            )
        ).alias("surface"),
    )
    return spans.join(F.broadcast(catalog), "surface").select(
        "url", "surface", "entity_id", "kind"
    )


def extract_relations(pages: DataFrame, catalog: DataFrame,
                      text_col: str = "extracted_text") -> DataFrame:
    """(url, s_id, predicate, o_id, s_surface, o_surface) per matched pattern.

    All three patterns are evaluated in ONE projection over one corpus scan
    (previously a 3-branch union, each branch re-scanning the corpus for
    its own regexp_extract — 3 full passes; guide §2.4). Per pattern it is
    still the first match (group 0), split on the fixed infix phrase — the
    NAME grammar admits no lowercase words, so the phrase occurs exactly
    once in a match, and extracting groups 1 and 2 separately would scan
    the page twice. Row multiset identical to the union form."""
    matches = pages.select(
        "url",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.regexp_extract(F.col(text_col), pattern, 0).alias(
                            "m"
                        ),
                        F.lit(infix).alias("infix"),
                        F.lit(predicate).alias("predicate"),
                    )
                    for (infix, predicate), (pattern, _) in zip(
                        _INFIXES, _PATTERNS
                    )
                ]
            )
        ).alias("x"),
    ).filter(F.col("x.m") != "")
    rels = matches.select(
        "url",
        F.split_part(F.col("x.m"), F.col("x.infix"), F.lit(1)).alias(
            "s_surface"
        ),
        F.split_part(F.col("x.m"), F.col("x.infix"), F.lit(2)).alias(
            "o_surface"
        ),
        F.col("x.predicate").alias("predicate"),
    )
    s_cat = catalog.select(
        F.col("surface").alias("s_surface"), F.col("entity_id").alias("s_id")
    )
    o_cat = catalog.select(
        F.col("surface").alias("o_surface"), F.col("entity_id").alias("o_id")
    )
    return (
        rels.join(F.broadcast(s_cat), "s_surface")
        .join(F.broadcast(o_cat), "o_surface")
        .select("url", "s_id", "predicate", "o_id", "s_surface", "o_surface")
    )


def relation_quads(
    relations: DataFrame, mentions: DataFrame, distinct: bool = True
) -> DataFrame:
    """Quads for the canonicalizer: relation triples + label literals, each in
    the page's context graph; stmt_idx is derived from a hash of the quad so
    it is deterministic and order-independent of the extraction plan.

    ``distinct=False`` skips the (s,p,o,g) dedup shuffle. THIS extractor
    provably emits distinct quads already — per page each pattern matches at
    most once with a distinct predicate, the surface→entity dictionary is
    unique-keyed (no join fan-out), mentions are array_distinct per page, and
    label literals can never collide with relation IRIs — so callers that
    also pass ``assume_distinct_statements`` to parse_quads should disable
    the dedup here for the same reason (one full-corpus shuffle saved)."""
    g = F.concat(F.lit("<ctx:"), F.col("url"), F.lit(">"))
    rel_q = relations.select(
        F.col("s_id").alias("s"),
        F.col("predicate").alias("p"),
        F.col("o_id").alias("o"),
        g.alias("g"),
    )
    label_q = mentions.select(
        F.col("entity_id").alias("s"),
        F.lit(corpus.RDFS_LABEL).alias("p"),
        F.concat(F.lit('"'), F.col("surface"), F.lit('"')).alias("o"),
        g.alias("g"),
    )
    quads = rel_q.unionByName(label_q)
    if distinct:
        quads = quads.dropDuplicates(["s", "p", "o", "g"])
    # deterministic order: labels cannot collide with relations per (s,p,o,g)
    from rdf2hk_spark.ops.hashing import md5_int

    return quads.withColumn(
        "stmt_idx", md5_int(F.concat_ws("", "s", "p", "o", "g"), digits=15)
    )
