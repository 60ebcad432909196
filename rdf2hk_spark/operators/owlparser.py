"""OWLParser (O1-O3, /root/reference/owlparser.js): owl:Restriction blank
nodes become n-ary links on a 4-role FACTS connector; object-property
subjects become connectors carrying rdf:type / domain / range / qualifier
properties plus a domain→range link; DatatypeProperty domains receive the
property ``{dtprop: [range]}``.

Documented divergences from the reference (all deliberate):

- link ids: the reference mints uuidv1 (non-deterministic); we mint
  ``<hk://link/md5(...)>`` over the defining terms so re-runs and the two
  engines agree (same substitution the base pipeline made for blank nodes).
- owlparser.js:153-173,254-281 (object-property connector minting and the
  relationship-link loop) are commented out in the reference, which leaves
  ``objectPropertyMap`` forever empty and makes the domain/range link loop
  (owlparser.js:319-342) and qualifier attachment (299-316) dead code. We
  implement the evident intent: subjects typed with RELATION_TYPES become
  FACTS connectors, so O2/O3 actually fire.
- owlparser.js:223 checks ``restriction.hasOwnProperty(s)`` (always false;
  clearly meant ``p``), so repeated restriction predicates keep only the LAST
  object. We reproduce that active behavior (last-wins per predicate).
- hasValue targets are collected but never bound (finish() calls
  bindRestriction only for onProperty/someValuesFrom/allValuesFrom) — kept.
- the " owl:allValuesFrom" role label keeps the reference's leading space
  (owlparser.js:58).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T
from rdf2hk_spark.operators.parse import ENTITY_COLUMNS, ParseOptions, parse_quads

OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"

RESTRICTION_URI = f"<{OWL}Restriction>"
ON_PROPERTY_URI = f"<{OWL}onProperty>"
SOME_VALUES_FROM_URI = f"<{OWL}someValuesFrom>"
ALL_VALUES_FROM_URI = f"<{OWL}allValuesFrom>"
HAS_VALUE_URI = f"<{OWL}hasValue>"
DATATYPE_PROPERTY_URI = f"<{OWL}DatatypeProperty>"
INVERSE_OF_URI = f"<{OWL}inverseOf>"
IMPORTS_URI = f"<{OWL}imports>"
DOMAIN_URI = f"<{RDFS}domain>"
RANGE_URI = f"<{RDFS}range>"
SUBPROPERTYOF_URI = f"<{RDFS}subPropertyOf>"
SUBCLASSOF_URI = f"<{RDFS}subClassOf>"

ON_PROPERTY_LABEL = "owl:onProperty"
SOME_VALUES_FROM_LABEL = "owl:someValuesFrom"
ALL_VALUES_FROM_LABEL = " owl:allValuesFrom"  # sic — owlparser.js:58
HAS_VALUE_LABEL = "owl:hasValue"

# owlparser.js:33-39 (the ACTIVE set, narrower than simpleowlparser's)
RELATION_TYPES_URIS = [
    f"<{OWL}ObjectProperty>", f"<{OWL}FunctionalProperty>",
    f"<{OWL}InverseFunctionalProperty>", f"<{OWL}TransitiveProperty>",
    f"<{OWL}SymmetricProperty>",
]
RELATION_QUALIFIER_URIS = [INVERSE_OF_URI, SUBPROPERTYOF_URI]

# owlVocabulary = every owl.js string constant + rdfs domain/range
# (owlparser.js:52-54)
OWL_VOCABULARY = [
    f"<{OWL}Class>", f"<{OWL}Thing>", f"<{OWL}ObjectProperty>",
    f"<{OWL}topObjectProperty>", f"<{OWL}NamedIndividual>", IMPORTS_URI,
    f"<{OWL}Ontology>", f"<{OWL}FunctionalProperty>",
    f"<{OWL}InverseFunctionalProperty>", DATATYPE_PROPERTY_URI,
    f"<{OWL}topDataProperty>", INVERSE_OF_URI, f"<{OWL}TransitiveProperty>",
    f"<{OWL}AsymmetricProperty>", f"<{OWL}SymmetricProperty>",
    f"<{OWL}IrreflexiveProperty>", f"<{OWL}ReflexiveProperty>",
    RESTRICTION_URI, ON_PROPERTY_URI, SOME_VALUES_FROM_URI,
    ALL_VALUES_FROM_URI, HAS_VALUE_URI, f"<{OWL}AnnotationProperty>",
    f"<{OWL}topAnnotationProperty>", f"<{OWL}equivalentProperty>",
    DOMAIN_URI, RANGE_URI,
]


def _last_by(val: Column, cond: Column) -> Column:
    """Aggregate: value of the last (by stmt_idx) row satisfying cond."""
    return F.max_by(F.when(cond, val), F.when(cond, F.col("stmt_idx")))


def _ordered_vals(col: str) -> Column:
    return F.transform(
        F.sort_array(
            F.collect_list(
                F.when(F.col(col).isNotNull(), F.struct("stmt_idx", F.col(col)))
            )
        ),
        lambda x: x[col],
    )


def parse_with_owl(quads: DataFrame, opts: ParseOptions | None = None) -> DataFrame:
    """parse_quads with convertOwl semantics (the full OWLParser plugin)."""
    opts = opts or ParseOptions()

    # subjects with data-dependent plugin membership (_shouldConvert,
    # owlparser.js:97-100): object properties and datatype properties
    objprops = (
        quads.filter(
            (F.col("p") == C.RDF_TYPE_URI) & F.col("o").isin(RELATION_TYPES_URIS)
        ).select("s").distinct()
    )
    dtprops = (
        quads.filter(
            (F.col("p") == C.RDF_TYPE_URI) & (F.col("o") == DATATYPE_PROPERTY_URI)
        ).select("s").distinct()
    )
    special = objprops.unionByName(dtprops).distinct().withColumn(
        "_sp", F.lit(True)
    )
    q2 = quads.join(special, "s", "left")
    vocab_hit = (
        F.col("s").isin(OWL_VOCABULARY)
        | F.col("p").isin(OWL_VOCABULARY)
        | F.col("o").isin(OWL_VOCABULARY)
        | F.col("g").isin(OWL_VOCABULARY)
    )
    consume = (F.col("p") != IMPORTS_URI) & (
        vocab_hit | F.col("_sp").eqNullSafe(True)
    )
    base = parse_quads(q2.filter(~consume).drop("_sp"), opts)
    owl_q = q2.filter(consume).drop("_sp")

    roles_so = F.create_map(
        F.lit(opts.subject_label), F.lit(C.ROLE_SUBJECT),
        F.lit(opts.object_label), F.lit(C.ROLE_OBJECT),
    )
    no_ctx = F.col("g").isNull() | (F.col("g") == C.HK_NULL_URI)

    # ---- pass-1 state --------------------------------------------------
    # rangeDomainMap (owlparser.js:174-189): last domain / range per subject
    rd = (
        owl_q.filter(F.col("p").isin(DOMAIN_URI, RANGE_URI))
        .groupBy("s")
        .agg(
            _last_by(F.col("o"), F.col("p") == DOMAIN_URI).alias("domain"),
            _last_by(F.col("o"), F.col("p") == RANGE_URI).alias("range"),
        )
    )
    # relationQualifierMap (owlparser.js:194-205): (p, o) per subject in order
    quals = (
        owl_q.filter(F.col("p").isin(RELATION_QUALIFIER_URIS))
        .groupBy("s", "p")
        .agg(_ordered_vals("o").alias("vals"))
        .groupBy("s")
        .agg(F.map_from_entries(F.collect_list(F.struct("p", "vals"))).alias("qmap"))
    )

    # ---- object-property connectors (intended 153-173) ------------------
    op_conns = (
        owl_q.filter(
            (F.col("p") == C.RDF_TYPE_URI) & F.col("o").isin(RELATION_TYPES_URIS)
        )
        .groupBy("s")
        .agg(_ordered_vals("o").alias("type_vals"))
        .join(rd, "s", "left")
        .join(quals, "s", "left")
    )
    both_dr = F.col("domain").isNotNull() & F.col("range").isNotNull()
    dr_map = F.when(
        both_dr,
        F.create_map(
            F.lit(DOMAIN_URI), F.array(F.col("domain")),
            F.lit(RANGE_URI), F.array(F.col("range")),
        ),
    ).otherwise(F.from_json(F.lit("{}"), "map<string,array<string>>"))
    qmap_n = F.coalesce(
        F.col("qmap"), F.from_json(F.lit("{}"), "map<string,array<string>>")
    )
    op_conn_e = op_conns.select(
        F.col("s").alias("id"),
        F.lit(C.CONNECTOR).alias("type"),
        F.lit(C.FACTS).alias("className"),
        roles_so.alias("roles"),
        F.map_concat(
            F.create_map(F.lit(C.RDF_TYPE_URI), F.col("type_vals")), qmap_n, dr_map
        ).alias("properties"),
    )

    # ---- domain→range links (intended TBOX loop, owlparser.js:319-342) --
    dr_links = op_conns.filter(both_dr).select(
        T.create_spo_uri(
            F.col("domain"), F.col("s"), F.col("range"), F.lit("owl:domainRange")
        ).alias("id"),
        F.lit(C.LINK).alias("type"),
        F.col("s").alias("connector"),
        F.array(
            F.struct(
                F.lit(opts.subject_label).alias("role"),
                F.col("domain").alias("comp"), F.lit(C.LAMBDA).alias("anchor"),
            ),
            F.struct(
                F.lit(opts.object_label).alias("role"),
                F.col("range").alias("comp"), F.lit(C.LAMBDA).alias("anchor"),
            ),
        ).alias("binds"),
    )

    # ---- restrictions (O1, owlparser.js:123-151,218-235,344-365) --------
    r_subj = (
        owl_q.filter(
            (F.col("p") == C.RDF_TYPE_URI) & (F.col("o") == RESTRICTION_URI)
        ).select("s").distinct()
    )
    r_stmts = owl_q.join(r_subj, "s", "left_semi").filter(
        F.col("p").isin(
            ON_PROPERTY_URI, RESTRICTION_URI, SOME_VALUES_FROM_URI,
            ALL_VALUES_FROM_URI,
        )
    )
    per_r = r_stmts.groupBy("s").agg(
        _last_by(F.col("o"), F.col("p") == ON_PROPERTY_URI).alias("on_prop"),
        _last_by(F.col("o"), F.col("p") == SOME_VALUES_FROM_URI).alias("some_v"),
        _last_by(F.col("o"), F.col("p") == ALL_VALUES_FROM_URI).alias("all_v"),
        _last_by(F.col("g"), ~no_ctx).alias("context"),
    )

    def rbind(label: str, comp: Column) -> Column:
        return F.struct(
            F.lit(label).alias("role"), comp.alias("comp"),
            F.lit(C.LAMBDA).alias("anchor"),
        )

    r_links = per_r.select(
        T.create_spo_uri(
            F.col("s"), F.lit(RESTRICTION_URI), F.lit("owl:restriction"),
            F.col("context"),
        ).alias("id"),
        F.lit(C.LINK).alias("type"),
        F.lit(RESTRICTION_URI).alias("connector"),
        F.col("context").alias("parent"),
        F.filter(
            F.array(
                rbind(ON_PROPERTY_LABEL, F.col("on_prop")),
                rbind(SOME_VALUES_FROM_LABEL, F.col("some_v")),
                rbind(ALL_VALUES_FROM_LABEL, F.col("all_v")),
            ),
            lambda b: b["comp"].isNotNull(),
        ).alias("binds"),
    )
    rest_conn = r_subj.select(
        F.lit(RESTRICTION_URI).alias("id"),
        F.lit(C.CONNECTOR).alias("type"),
        F.lit(C.FACTS).alias("className"),
        F.create_map(
            F.lit(ON_PROPERTY_LABEL), F.lit(C.ROLE_SUBJECT),
            F.lit(SOME_VALUES_FROM_LABEL), F.lit(C.ROLE_OBJECT),
            F.lit(ALL_VALUES_FROM_LABEL), F.lit(C.ROLE_OBJECT),
            F.lit(HAS_VALUE_LABEL), F.lit(C.ROLE_OBJECT),
        ).alias("roles"),
        F.create_map(
            F.lit(C.RDF_TYPE_URI), F.array(F.lit(RESTRICTION_URI))
        ).alias("properties"),
    ).limit(1)

    # ---- merge: finish() writes entities[id] unconditionally -------------
    owl_parts = [op_conn_e, dr_links, r_links, rest_conn]
    merged = None
    for df in owl_parts:
        e = df
        for name, typ in [
            ("parent", "string"), ("connector", "string"), ("ref", "string"),
            ("className", "string"), ("roles", "map<string,string>"),
            ("binds", "array<struct<role:string, comp:string, anchor:string>>"),
            ("properties", "map<string,array<string>>"),
            ("metaProperties", "map<string,array<string>>"),
            ("interfaces",
             "map<string,struct<type:string, key:string, properties:map<string,string>>>"),
        ]:
            if name not in e.columns:
                e = e.withColumn(name, F.lit(None).cast(typ))
        e = e.select(*ENTITY_COLUMNS)
        merged = e if merged is None else merged.unionByName(e)

    u = merged.withColumn("_prio", F.lit(0)).unionByName(
        base.select(*ENTITY_COLUMNS).withColumn("_prio", F.lit(1))
    )
    fields = [c for c in ENTITY_COLUMNS if c != "id"]
    out = (
        u.groupBy("id")
        .agg(F.min_by(F.struct(*fields), F.col("_prio")).alias("e"))
        .select("id", *[F.col(f"e.{f}").alias(f) for f in fields])
    )

    # ---- DatatypeProperty domain property (ACTIVE code, js:237-252) ------
    # each (dtprop, rdfs:domain, D) statement appends {dtprop: [range]} to the
    # EXISTING entity D (skipped when D was never materialized)
    dt_dom = (
        owl_q.join(dtprops, "s", "left_semi")
        .filter(F.col("p") == DOMAIN_URI)
        .join(rd.filter(F.col("range").isNotNull()), "s")
        .select(
            T.id_from_resource("o").alias("id"),
            F.col("s").alias("key"), F.col("range").alias("val"), "stmt_idx",
        )
        .groupBy("id", "key")
        .agg(_ordered_vals("val").alias("vals"))
        .groupBy("id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("key", "vals"))).alias(
                "add_props"
            )
        )
    )
    out = out.join(dt_dom, "id", "left").withColumn(
        "properties",
        F.when(
            F.col("add_props").isNotNull(),
            F.map_zip_with(
                F.coalesce(
                    F.col("properties"),
                    F.from_json(F.lit("{}"), "map<string,array<string>>"),
                ),
                F.col("add_props"),
                lambda k, v1, v2: F.when(v1.isNull(), v2)
                .when(v2.isNull(), v1)
                .otherwise(F.concat(v1, v2)),
            ),
        ).otherwise(F.col("properties")),
    ).drop("add_props")

    # ---- finish: HIERARCHY override for rdf:type / rdfs:subClassOf -------
    out = out.withColumn(
        "className",
        F.when(
            F.col("id").isin(C.RDF_TYPE_URI, SUBCLASSOF_URI)
            & F.col("className").isNotNull(),
            F.lit(C.HIERARCHY),
        ).otherwise(F.col("className")),
    )
    return out.select(*ENTITY_COLUMNS)
