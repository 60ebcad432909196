"""Entity title selection (P8, utils.js:302-425): the first non-URI title
across the well-known title properties, in language-preference order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark import vocab
from rdf2hk_spark.functions import terms as T

# utils.js:34-44 LIST_OF_PROPERTIES, in priority order. The DCTERMS slot is
# vocab.DC_TITLE_URI = <http://purl.org/dc/elements/1.1/title>: the
# reference's dcterms.js:8 module is NAMED dcterms but holds the dc/elements
# IRI — matching the constant, not the module name, is the parity that counts.
TITLE_PROPERTIES = [
    vocab.SKOS_PREF_LABEL_URI,
    vocab.SKOS_ALT_LABEL_URI,
    "<http://www.w3.org/2000/01/rdf-schema#label>",
    vocab.FOAF_NAME_URI,
    vocab.FOAF_NICK_URI,
    vocab.DC_TITLE_URI,
    "title",
    "rdfs:label",
]


def entity_title(
    entities: DataFrame, language_preference: list[str] | None = None
) -> DataFrame:
    """Adds a ``title`` column: first valid title by (language rank, property
    rank, value order); falls back to the label of ref (references) or id."""
    langs = language_preference or ["en", "es"]

    def lang_rank_of(v) -> Column:
        lg_col = F.coalesce(T.literal_lang(v), F.lit("unknown"))
        rank = F.lit(len(langs))
        for i, lg in enumerate(langs):
            rank = F.when(lg_col == lg, F.lit(i)).otherwise(rank)
        return rank

    # candidates: for each title property (in order), its values (in order)
    def _tagger(pi: int):
        return lambda v, j: F.struct(
            F.lit(pi).alias("p_rank"), j.alias("v_rank"), v.alias("v")
        )

    cands = F.flatten(
        F.array(
            *[
                F.transform(
                    F.coalesce(
                        F.col("properties").getItem(k),
                        F.array().cast("array<string>"),
                    ),
                    _tagger(pi),
                )
                for pi, k in enumerate(TITLE_PROPERTIES)
            ]
        )
    )
    e = entities.withColumn("_cands", cands)
    # rank each candidate; JS checks isUriOrBlankNode on the DECODED value
    ranked = F.transform(
        F.col("_cands"),
        lambda c: F.struct(
            lang_rank_of(c["v"]).alias("l_rank"),
            c["p_rank"].alias("p_rank"),
            c["v_rank"].alias("v_rank"),
            F.coalesce(T.literal_value(c["v"]), c["v"]).alias("value"),
        ),
    )
    valid = F.filter(
        F.sort_array(ranked),
        lambda r: ~T.is_uri_or_blank_node(r["value"]) & r["value"].isNotNull(),
    )
    fallback = F.when(
        F.col("type") == C.REFERENCE, T.label_from_uri(F.col("ref"))
    ).otherwise(T.label_from_uri(F.col("id")))
    return e.withColumn(
        "title", F.coalesce(F.get(valid, 0)["value"], fallback)
    ).drop("_cands")
