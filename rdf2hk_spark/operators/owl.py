"""SimpleOwlParser (O4, /root/reference/simpleowlparser.js): OWL-vocabulary
statements become FACTS connectors (ObjectProperty-family subjects) and
per-context References carrying the statement as a property.

Composition wrapper over parse_quads: OWL statements are filtered out of the
base pipeline and re-introduced as connector shells / property-carrying
references. One documented divergence: the reference lets
(s, rdf:type, owl:ObjectProperty-family) statements fall through to base link
creation in pass 3 (its lastLoopCallback only consumes relationship
statements); this wrapper treats them as fully consumed — such a link only
materializes in the reference when an rdf:type connector was minted by OTHER
statements, a corner we accept losing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T
from rdf2hk_spark.operators.parse import ENTITY_COLUMNS, ParseOptions, parse_quads

OWL = "http://www.w3.org/2002/07/owl#"
OBJECT_PROPERTY_URIS = [
    f"<{OWL}ObjectProperty>", f"<{OWL}topObjectProperty>",
    f"<{OWL}SymmetricProperty>", f"<{OWL}AsymmetricProperty>",
    f"<{OWL}ReflexiveProperty>", f"<{OWL}IrreflexiveProperty>",
    f"<{OWL}FunctionalProperty>", f"<{OWL}InverseFunctionalProperty>",
    f"<{OWL}TransitiveProperty>",
]
# owlVocabulary = all owl.js URIs + rdfs domain/range/subPropertyOf +
# equivalentProperty (simpleowlparser.js:17-21)
OWL_VOCABULARY = OBJECT_PROPERTY_URIS + [
    f"<{OWL}Class>", f"<{OWL}Thing>", f"<{OWL}NamedIndividual>",
    f"<{OWL}DatatypeProperty>", f"<{OWL}topDataProperty>",
    f"<{OWL}imports>", f"<{OWL}Ontology>", f"<{OWL}inverseOf>",
    f"<{OWL}Restriction>", f"<{OWL}onProperty>", f"<{OWL}someValuesFrom>",
    f"<{OWL}allValuesFrom>", f"<{OWL}hasValue>", f"<{OWL}AnnotationProperty>",
    f"<{OWL}topAnnotationProperty>", f"<{OWL}equivalentProperty>",
    "<http://www.w3.org/2000/01/rdf-schema#domain>",
    "<http://www.w3.org/2000/01/rdf-schema#range>",
    "<http://www.w3.org/2000/01/rdf-schema#subPropertyOf>",
]
IMPORTS_URI = f"<{OWL}imports>"


def owl_mask() -> F.Column:
    """simpleowlparser.js:36-64 — statements the plugin consumes."""
    is_objprop_typing = (F.col("p") == C.RDF_TYPE_URI) & F.col("o").isin(
        OBJECT_PROPERTY_URIS
    )
    return (F.col("p") != IMPORTS_URI) & (
        is_objprop_typing | F.col("p").isin(OWL_VOCABULARY)
    )


def parse_with_simple_owl(
    quads: DataFrame, opts: ParseOptions | None = None
) -> DataFrame:
    """parse_quads with convertOwl semantics."""
    opts = opts or ParseOptions()
    from rdf2hk_spark.operators.parse import _get_parent

    parent = _get_parent(opts, F.col("s"), F.col("g"))
    mask = owl_mask()
    owl_q = quads.filter(mask).withColumn("parent", parent)
    base = parse_quads(quads.filter(~mask), opts)

    # connectors: non-bnode subjects (simpleowlparser.js:81-104)
    conns = (
        owl_q.filter(~T.is_blank_node("s"))
        .select(F.col("s").alias("id"))
        .distinct()
        .select(
            "id", F.lit(C.CONNECTOR).alias("type"),
            F.lit(None).cast("string").alias("parent"),
            F.lit(None).cast("string").alias("connector"),
            F.lit(None).cast("string").alias("ref"),
            F.lit(C.FACTS).alias("className"),
            F.create_map(
                F.lit(opts.subject_label), F.lit(C.ROLE_SUBJECT),
                F.lit(opts.object_label), F.lit(C.ROLE_OBJECT),
            ).alias("roles"),
        )
    )

    # references with statement properties (simpleowlparser.js:106-147):
    # key = RAW predicate; literal values keep the inner string with the RAW
    # datatype as metaProperty (no lang re-encode, no number conversion)
    rel = owl_q.filter(~T.is_blank_node("s") & F.col("p").isin(OWL_VOCABULARY))
    rel = rel.withColumn("ref_id", T.create_ref_uri(F.col("s"), F.col("parent")))
    rel = rel.withColumn(
        "pval",
        F.when(T.is_literal("o"), T.literal_value("o")).otherwise(F.col("o")),
    ).withColumn("mval", F.when(T.is_literal("o"), T.literal_datatype("o")))

    def _vals(col: str) -> F.Column:
        return F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col(col).isNotNull(), F.struct("stmt_idx", F.col(col)))
                )
            ),
            lambda x: x[col],
        )

    per_key = rel.groupBy("ref_id", "s", "parent", "p").agg(
        _vals("pval").alias("pvals"), _vals("mval").alias("mvals")
    )

    def _map_of(col: str) -> F.Column:
        entries = F.collect_list(
            F.when(F.size(F.col(col)) > 0, F.struct("p", F.col(col)))
        )
        return F.when(F.size(entries) > 0, F.map_from_entries(entries))

    refs = per_key.groupBy("ref_id", "s", "parent").agg(
        _map_of("pvals").alias("properties"), _map_of("mvals").alias("metaProperties")
    ).select(
        F.col("ref_id").alias("id"), F.lit(C.REFERENCE).alias("type"),
        F.col("parent"),
        F.lit(None).cast("string").alias("connector"),
        F.col("s").alias("ref"),
        F.lit(None).cast("string").alias("className"),
        F.lit(None).cast("map<string,string>").alias("roles"),
        "properties", "metaProperties",
    )

    # merge: OWL connectors outrank base NODES with the same id (pass-1 vs
    # pass-2) but lose to base connectors/contexts; refs merge maps with any
    # base-minted ref of the same id. The base row is NOT dropped on an id
    # collision — its aggregated properties/metaProperties ride onto the
    # surviving OWL row (reference pass 3 attaches literal statements to the
    # connector already present in entities, e.g. rdfs:label on an
    # owl:ObjectProperty).
    base_non_node_ids = base.filter(F.col("type") != C.NODE).select("id")
    conns = conns.join(base_non_node_ids, "id", "left_anti")

    for col, typ in [
        ("binds", "array<struct<role:string, comp:string, anchor:string>>"),
        ("properties", "map<string,array<string>>"),
        ("metaProperties", "map<string,array<string>>"),
        ("interfaces",
         "map<string,struct<type:string, key:string, properties:map<string,string>>>"),
    ]:
        if col not in conns.columns:
            conns = conns.withColumn(col, F.lit(None).cast(typ))
        if col not in refs.columns:
            refs = refs.withColumn(col, F.lit(None).cast(typ))

    # explicit branch priority (parse_quads' _prio ladder pattern): OWL rows
    # (0) define the entity shape; base rows (1) contribute properties that
    # OWL keys override. Deterministic under any shuffle arrival order.
    merged = (
        conns.select(*ENTITY_COLUMNS).withColumn("_prio", F.lit(0))
        .unionByName(refs.select(*ENTITY_COLUMNS).withColumn("_prio", F.lit(0)))
        .unionByName(base.select(*ENTITY_COLUMNS).withColumn("_prio", F.lit(1)))
    )

    def merge_va(base_m: F.Column, upd_m: F.Column) -> F.Column:
        empty = F.from_json(F.lit("{}"), "map<string,array<string>>")
        b = F.coalesce(base_m, empty)
        u = F.coalesce(upd_m, empty)
        kept = F.map_filter(b, lambda k, v: ~F.map_contains_key(u, k))
        out = F.map_concat(kept, u)
        return F.when(F.size(F.map_keys(out)) > 0, out)

    shape_cols = [
        c for c in ENTITY_COLUMNS if c not in ("id", "properties", "metaProperties")
    ]
    dup = merged.groupBy("id").agg(
        F.min_by(F.struct(*shape_cols), F.col("_prio")).alias("shape"),
        # per-id there is at most one row per priority (base emits one row per
        # id; conns/refs are grouped); min_by/max_by on _prio are therefore
        # exact selectors, and when only one row exists lo == hi (merge is a
        # no-op).
        F.max_by("properties", F.col("_prio")).alias("lo_props"),
        F.min_by("properties", F.col("_prio")).alias("hi_props"),
        F.max_by("metaProperties", F.col("_prio")).alias("lo_metas"),
        F.min_by("metaProperties", F.col("_prio")).alias("hi_metas"),
    )
    out = dup.select(
        "id",
        *[F.col(f"shape.{c}").alias(c) for c in shape_cols],
        merge_va(F.col("lo_props"), F.col("hi_props")).alias("properties"),
        merge_va(F.col("lo_metas"), F.col("hi_metas")).alias("metaProperties"),
    )
    return out.select(*ENTITY_COLUMNS)
