"""RDF quads DataFrame → Hyperknowledge entities DataFrame.

Distributed re-expression of the reference's three-pass, single-threaded parse
pipeline (/root/reference/parser.js:55-397, operators A1-A7 in SURVEY.md §2.3).
The reference mutates shared dicts in stream order; we reproduce its
insertion-order ("first occurrence wins") semantics with an explicit
``stmt_idx`` column + ``min_by`` discipline, so the result is identical on any
partitioning / any degree of parallelism.

Input quads schema::

    stmt_idx: long   — 0-based source order (dense per input graph)
    s, p, o, g: string — string-encoded terms (SURVEY.md §1.1)

Output entities schema (ENTITY_SCHEMA below) — one row per HK entity.

Scale notes (100 TB design):
- every join against ``connectors``/``contexts`` is broadcast (they are
  O(#predicates) / O(#graphs), tiny relative to quads);
- the only wide shuffles are the A3 node groupBy and the A5 property groupBy,
  both keyed on entity id; hot-entity skew there is handled by AQE skew
  splitting plus the two-phase salted aggregate in ``properties`` (partial
  map-side combine happens automatically for min_by; collect_list order is
  restored by sort_array so partial aggregation stays safe);
- no driver-side loops, no row-at-a-time Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T

# Entities DataFrame columns (FIXTURES.md §2)
ENTITY_COLUMNS = [
    "id",
    "type",
    "parent",
    "connector",
    "ref",
    "className",
    "roles",
    "binds",
    "properties",
    "metaProperties",
    "interfaces",
]

ENTITY_SCHEMA = (
    "id string, type string, parent string, connector string, ref string,"
    " className string, roles map<string,string>,"
    " binds array<struct<role:string, comp:string, anchor:string>>,"
    " properties map<string,array<string>>,"
    " metaProperties map<string,array<string>>,"
    " interfaces map<string,struct<type:string, key:string,"
    " properties:map<string,string>>>"
)


@dataclass
class ParseOptions:
    """Mirrors parser.js option normalization (parser.js:57-97)."""

    create_context: bool = False
    namespace_context: bool = False
    set_node_context: bool = False
    root_context: str | None = None  # options.context
    strategy: str | None = None
    preserve_blank_nodes: bool = False
    only_hk: bool = False
    convert_hk: bool = False
    text_literal_as_node: bool = False
    text_literal_as_node_encoding: str = "metaproperty"
    subject_label: str = C.DEFAULT_SUBJECT_ROLE
    object_label: str = C.DEFAULT_OBJECT_ROLE
    hierarchy_connector_ids: list[str] = field(
        default_factory=lambda: list(C.DEFAULT_HIERARCHY_CONNECTOR_IDS)
    )
    # deterministic replacement for parser.js:197-208 uuid blank-node remap:
    # name of a column used as per-document salt; None = global constant salt
    blank_node_salt_col: str | None = None
    # CustomHKParser (customhkparser.js): contextualize = [{p, o?, allowReference}]
    custom_rdf_parser: bool = False
    contextualize: list[dict] | None = None
    # set when the input has no duplicate (s,p,o,g) statements (e.g. the
    # extraction pipeline dedups upstream): skips the link-dedup shuffle
    assume_distinct_statements: bool = False
    # hot-entity skew (north_rule): >0 enables two-phase salted property
    # aggregation — partial per-(entity, prop, salt) combines run on
    # ``property_salt`` reducers before the final per-key merge, so a hub
    # entity referenced by a large fraction of documents cannot pin one task
    property_salt: int = 0

    def __post_init__(self) -> None:
        if self.namespace_context:
            self.create_context = True


def _get_parent(opts: ParseOptions, s: Column, g: Column) -> Column:
    """parser.js:119-127 — the parent (named graph) of a statement."""
    base = g
    if opts.root_context is not None:
        base = F.when(
            (g == C.HK_NULL_URI) | g.isNull(), F.lit(opts.root_context)
        ).otherwise(g)
    if opts.namespace_context:
        ns = F.concat(
            F.lit("<"),
            F.regexp_replace(F.split_part(s, F.lit("#"), F.lit(1)), "^<", ""),
            F.lit(">"),
        )
        return F.when(s.contains("#"), ns).otherwise(base)
    return base


def _with_parse_columns(quads: DataFrame, opts: ParseOptions) -> DataFrame:
    """Annotate quads with parent / mapped terms / term-kind flags.

    Batched into THREE ``withColumns`` calls (one per dependency layer)
    instead of twelve chained ``withColumn``s: every classic-DataFrame API
    call analyzes the growing plan through py4j, and the chained form was
    measured as a visible slice of the ~2 s Python-side plan-construction
    cost per parse_quads invocation (driver-side time, guide §7.3)."""
    parent = _get_parent(opts, F.col("s"), F.col("g"))
    if opts.preserve_blank_nodes:
        s_m, o_m = F.col("s"), F.col("o")
    else:
        salt = (
            F.col(opts.blank_node_salt_col)
            if opts.blank_node_salt_col
            else F.lit("hkbn")
        )
        # deterministic blank-node remap (P10); link ids keep the ORIGINAL
        # terms (parser.js:302 uses un-remapped s/o) while binds/properties
        # use the remapped ones (parser.js:288,295,319-322)
        s_m = F.when(
            T.is_blank_node("s"), T.deterministic_blank_node(F.col("s"), salt)
        ).otherwise(F.col("s"))
        o_m = F.when(
            T.is_blank_node("o"), T.deterministic_blank_node(F.col("o"), salt)
        ).otherwise(F.col("o"))
    q = quads.withColumns({"parent": parent, "s_m": s_m, "o_m": o_m})
    # literal decode, done ONCE here (before the persist boundary) so the
    # term-kernel regexes appear in exactly one projection — downstream
    # operators see plain columns (codegen-size + recompute win)
    q = q.withColumns(
        {
            "parent_id": T.id_from_resource("parent"),
            "o_is_res": T.is_uri_or_blank_node("o"),
            "subject_id": T.id_from_resource("s_m"),
            "object_id": T.id_from_resource("o_m"),
            "p_id": T.id_from_resource("p"),
            "lit_value": T.literal_value("o"),
            "lit_dtype": T.literal_datatype("o"),
            "lit_lang": T.literal_lang("o"),
        }
    )
    return q.withColumn("num_str", T.js_number_string("lit_value"))


def collect_connectors(q: DataFrame, opts: ParseOptions) -> DataFrame:
    """A1 (parser.js:160-174): one Connector per distinct predicate id of
    resource-object statements; className from the *first* predicate string
    that minted the id (dict first-wins ⇒ min_by stmt_idx)."""
    cand = (
        q.filter(T.is_uri("p") & F.col("o_is_res"))
        .select(T.id_from_resource("p").alias("id"), "p", "stmt_idx")
        .groupBy("id")
        .agg(F.min_by("p", "stmt_idx").alias("p0"))
    )
    return cand.select(
        "id",
        F.when(F.col("p0").isin(opts.hierarchy_connector_ids), C.HIERARCHY)
        .otherwise(C.FACTS)
        .alias("className"),
    )


def collect_contexts(q: DataFrame, opts: ParseOptions) -> DataFrame:
    """A2 (parser.js:176-186): distinct non-null, non-default parents."""
    if not opts.create_context:
        return q.sparkSession.createDataFrame([], "id string")
    cond = F.col("parent").isNotNull() & (F.col("parent") != C.HK_NULL_URI)
    if opts.strategy == "pre-existing-context" and opts.root_context is not None:
        cond = cond & (F.col("parent") != opts.root_context)
    return q.filter(cond).select(F.col("parent").alias("id")).distinct()


def collect_nodes(q: DataFrame, opts: ParseOptions) -> DataFrame:
    """A3 (parser.js:191-251): distinct subjects ∪ resource objects → Node,
    first occurrence wins (subject position before object within a statement);
    parent = graph id only under setNodeContext (object occurrences null the
    parent when it would equal the node's own id, parser.js:247)."""
    subj = q.filter(T.is_uri_or_blank_node("s")).select(
        F.col("subject_id").alias("id"),
        "parent_id",
        "stmt_idx",
        F.lit(0).alias("pos"),
    )
    obj = q.filter(F.col("o_is_res")).select(
        F.col("object_id").alias("id"),
        F.when(F.col("parent_id") != F.col("object_id"), F.col("parent_id")).alias(
            "parent_id"
        ),
        "stmt_idx",
        F.lit(1).alias("pos"),
    )
    occ = subj.unionByName(obj)
    if opts.set_node_context:
        parent_expr = F.col("first.parent_id")
    else:
        parent_expr = F.lit(None).cast("string")
    # ids already claimed in pass 1 (parser.js:221,236) are excluded later by
    # the caller's priority merge (pass-1 shells outrank pass-2 nodes);
    # min_ord (first-occurrence order) feeds the CustomHKParser's
    # "does the entity already exist" check
    return (
        occ.groupBy("id")
        .agg(
            F.min_by(
                F.struct("parent_id"), F.struct("stmt_idx", "pos")
            ).alias("first"),
            F.min(F.col("stmt_idx") * 2 + F.col("pos")).alias("min_ord"),
        )
        .select("id", parent_expr.alias("parent"), "min_ord")
    )


def create_links(q: DataFrame, opts: ParseOptions, connectors: DataFrame) -> DataFrame:
    """A4 (parser.js:270-311): one Link per resource-object statement whose
    predicate minted a connector; id = md5(s+p+o+parent) over raw terms."""
    res = q.filter(F.col("o_is_res")).withColumn(
        "connector_id", T.id_from_resource("p")
    )
    res = res.join(
        F.broadcast(connectors.select(F.col("id").alias("connector_id"))),
        "connector_id",
        "left_semi",
    )
    links = res.select(
        T.create_spo_uri(F.col("s"), F.col("p"), F.col("o"), F.col("parent")).alias(
            "id"
        ),
        F.col("connector_id").alias("connector"),
        F.col("parent_id").alias("parent"),
        F.array(
            F.struct(
                F.lit(opts.subject_label).alias("role"),
                F.col("subject_id").alias("comp"),
                F.lit(C.LAMBDA).alias("anchor"),
            ),
            F.struct(
                F.lit(opts.object_label).alias("role"),
                F.col("object_id").alias("comp"),
                F.lit(C.LAMBDA).alias("anchor"),
            ),
        ).alias("binds"),
        "stmt_idx",
    )
    if opts.assume_distinct_statements:
        return links.drop("stmt_idx")
    # duplicate statements mint the same id; dict overwrite keeps one
    return links.groupBy("id").agg(
        F.min_by(F.struct("connector", "parent", "binds"), "stmt_idx").alias("e")
    ).select("id", "e.connector", "e.parent", "e.binds")


def resolve_property_targets(
    q: DataFrame, opts: ParseOptions, directory: DataFrame
) -> DataFrame:
    """A5/A6 target resolution (parser.js:312-364): a literal statement
    attaches to its subject entity unless the subject lives in a different
    context — then to a minted Reference in this context.

    ``directory`` = (id, type, parent) of all entities that exist before pass 3
    (connectors ∪ contexts ∪ nodes). Returns the literal quads annotated with
    ``target_id`` and ``needs_ref``.
    """
    lits = q.filter(~F.col("o_is_res"))
    d = directory.select(
        F.col("id").alias("subject_id"),
        F.col("type").alias("e_type"),
        F.col("parent").alias("e_parent"),
    )
    j = lits.join(d, "subject_id", "left")
    ref_id = T.create_ref_uri(F.col("s_m"), F.col("parent"))
    same_ctx = (
        (F.col("e_type") == C.CONNECTOR)
        | F.col("e_parent").eqNullSafe(F.col("parent_id"))
    ) & F.col("e_type").isNotNull()
    direct = F.col("parent_id").isNull() | same_ctx
    return j.withColumn("needs_ref", ~direct).withColumn(
        "target_id", F.when(direct, F.col("subject_id")).otherwise(ref_id)
    )


def _with_value_cols(l: DataFrame) -> DataFrame:
    """Annotate resolved literal rows with the decoded property value and the
    classification flags shared by A5 aggregation and A7 text-literal nodes.

    ``value`` encoding parity (parser.js:399-421 + utils.js:220-264); see
    aggregate_properties. ``is_text`` = the JS ``typeof value === 'string'``
    test at parser.js:411/423: true unless the value converted to a number or
    boolean (lang re-encoding always yields a string) or is the meta-only
    hk-null escape."""
    value = (
        F.when(
            F.col("lit_lang").isNotNull() & (F.col("lit_lang") != ""),
            F.concat(F.lit('"'), F.col("lit_value"), F.lit('"@'), F.col("lit_lang")),
        )
        .when(
            F.col("lit_dtype").isin(C.NUMBER_DATATYPES) & F.col("num_str").isNotNull(),
            F.col("num_str"),
        )
        .when(
            (F.col("lit_dtype") == C.XSD_BOOLEAN_URI)
            & F.col("lit_value").isin("true", "false"),
            F.col("lit_value"),
        )
        .otherwise(F.col("lit_value"))
    )
    l = l.withColumn("value", value).withColumn("prop", F.col("p_id"))
    # the meta-only escape: value.split('^^')[0] === '"<hk://id/null>"'
    meta_only = F.split_part(F.col("value"), F.lit("^^"), F.lit(1)) == F.lit(
        f'"{C.HK_NULL_URI}"'
    )
    meta_only_type = T.id_from_resource(
        F.split_part(F.col("value"), F.lit("^^"), F.lit(2))
    )
    # one pass: pval = property value (null when meta-only), mval = meta value
    l = l.withColumn("is_meta_only", meta_only)
    l = l.withColumn(
        "pval", F.when(~F.col("is_meta_only"), F.col("value"))
    ).withColumn(
        "mval",
        F.when(
            F.col("is_meta_only") & F.col("value").contains("^^"), meta_only_type
        ).when(
            ~F.col("is_meta_only") & F.col("lit_dtype").isNotNull(),
            T.id_from_resource("lit_dtype"),
        ),
    )
    is_lang = F.col("lit_lang").isNotNull() & (F.col("lit_lang") != "")
    converted = (
        F.col("lit_dtype").isin(C.NUMBER_DATATYPES) & F.col("num_str").isNotNull()
    ) | (
        (F.col("lit_dtype") == C.XSD_BOOLEAN_URI)
        & F.col("lit_value").isin("true", "false")
    )
    return l.withColumn(
        "is_text", ~F.col("is_meta_only") & (is_lang | ~converted)
    )


def _annotated_property_rows(l: DataFrame, opts: ParseOptions) -> DataFrame:
    """Value/flag annotation + the A7 text-literal remap (when enabled):
    text rows become a single data#Literal tag keyed on the target, whose
    value is the predicate id (property or metaProperty by encoding)."""
    l = _with_value_cols(l)
    if opts.text_literal_as_node:
        lit_key = T.id_from_resource(F.lit(C.DATA_LITERAL_URI))
        as_prop = opts.text_literal_as_node_encoding == "property"
        tag = F.col("p_id")
        none = F.lit(None).cast("string")
        l = (
            l.withColumn(
                "prop", F.when(F.col("is_text"), lit_key).otherwise(F.col("prop"))
            )
            .withColumn(
                "pval",
                F.when(F.col("is_text"), tag if as_prop else none).otherwise(
                    F.col("pval")
                ),
            )
            .withColumn(
                "mval",
                F.when(F.col("is_text"), none if as_prop else tag).otherwise(
                    F.col("mval")
                ),
            )
        )
    return l


def aggregate_properties_fused(
    lits_resolved: DataFrame, opts: ParseOptions
) -> DataFrame:
    """A5+A6 in ONE aggregation tree keyed on target_id (the fused-path
    variant): the per-prop ordered value arrays, the property/metaProperty
    maps AND the Reference mint (first-statement ref/parent) are all computed
    inside a single groupBy(target_id) — or groupBy(target_id, salt) →
    groupBy(target_id) when ``property_salt`` bounds hot-entity skew —
    instead of the separate per-(target, prop) shuffle + per-target shuffle +
    per-ref shuffle of the general path. Identical output values (the same
    statement-order sorting happens inside the aggregation expression).

    Returns (id, properties, metaProperties, needs_ref, ref, ref_parent).
    """
    if opts.only_hk:
        lits_resolved = lits_resolved.filter(~F.col("needs_ref"))
    l = _annotated_property_rows(lits_resolved, opts)
    item = F.struct("prop", "stmt_idx", "pval", "mval")
    rstmt_c = F.when(F.col("needs_ref"), F.col("stmt_idx"))
    rinfo_c = F.struct(F.col("s_m").alias("ref"), F.col("parent"))

    if opts.property_salt and opts.property_salt > 1:
        salted = l.withColumn(
            "_salt", (F.col("stmt_idx") % opts.property_salt).cast("int")
        )
        partial = salted.groupBy("target_id", "_salt").agg(
            F.collect_list(item).alias("items"),
            F.min(rstmt_c).alias("rstmt"),
            F.min_by(rinfo_c, rstmt_c).alias("rinfo"),
        )
        per_t = partial.groupBy("target_id").agg(
            F.flatten(F.collect_list("items")).alias("items"),
            F.min("rstmt").alias("rstmt"),
            F.min_by("rinfo", "rstmt").alias("rinfo"),
        )
    else:
        per_t = l.groupBy("target_id").agg(
            F.collect_list(item).alias("items"),
            F.min(rstmt_c).alias("rstmt"),
            F.min_by(rinfo_c, rstmt_c).alias("rinfo"),
        )

    # struct sort = (prop, stmt_idx) lexicographic — statement order per prop.
    # The whole map assembly is ONE F.expr per output map: the nested
    # transform/filter lambda builders were ~0.4 s of py4j round trips per
    # parse_quads invocation (Python-side plan construction, guide §7.3);
    # a SQL string parses in a single JVM call and produces the same
    # expression tree (sort_array / key-distinct / per-key value collection
    # duplicated exactly where the Column form duplicated it).
    def vals_of(field: str) -> str:
        vs = (
            f"transform(filter(sort_array(items),"
            f" x -> x.prop = k AND x.{field} IS NOT NULL), x -> x.{field})"
        )
        if opts.text_literal_as_node:
            # setProperty overwrite: the data#Literal tag keeps the LAST
            # value; the data#Literal id is its (non-hk) URI verbatim
            vs = (
                f"CASE WHEN k = '{C.DATA_LITERAL_URI}' THEN slice({vs}, -1, 1)"
                f" ELSE {vs} END"
            )
        return vs

    def map_of(field: str) -> Column:
        entries = (
            "filter(transform("
            "array_distinct(transform(sort_array(items), x -> x.prop)),"
            f" k -> struct(k AS k, {vals_of(field)} AS v)),"
            " e -> size(e.v) > 0)"
        )
        return F.expr(
            f"CASE WHEN size({entries}) > 0"
            f" THEN map_from_entries({entries}) END"
        )

    return per_t.select(
        F.col("target_id").alias("id"),
        map_of("pval").alias("properties"),
        map_of("mval").alias("metaProperties"),
        F.col("rstmt").isNotNull().alias("needs_ref"),
        F.col("rinfo.ref").alias("ref"),
        F.col("rinfo.parent").alias("ref_parent"),
    )


def text_literal_entities(lits_resolved: DataFrame, opts: ParseOptions) -> DataFrame:
    """A7 textLiteralAsNode (parser.js:422-516): every text-literal statement
    (s, p, "v", g) resolved to target entity E (node/ref/connector) mints:

      - a content Node ``<hk://node/md5(v)>`` (parent = E.parent, properties
        mimeType/data) — first creator wins, existing ids win over it;
      - a FACTS connector for p (loses to pass-1 connectors, overwrites
        nodes/contexts — JS ``entities[id] = connector``);
      - an spo Link ``md5(E.id + p + v + E.parent)`` binding E → content node,
        tagged data#Literal → p (property or metaProperty by encoding);
      - the rdf:type HIERARCHY connector, the data#Literal type Node (parent
        null), a per-context Reference to it, and a type Link content-node →
        data#Literal (object bind = the context Reference when E.parent is a
        real context).

    Returns ENTITY_COLUMNS + ``_prio`` for the caller's overwrite merge:
    10 = JS unconditional ``entities[id] =`` writes (links, pred connector),
    15 = type connector ("if absent in connectors", must lose to the pred
    connector when p IS rdf:type), 80 = "if absent in entities" creations.
    """
    l = _with_value_cols(lits_resolved).filter(F.col("is_text"))
    if opts.only_hk:
        l = l.filter(~F.col("needs_ref"))
    lit_key = T.id_from_resource(F.lit(C.DATA_LITERAL_URI))
    as_prop = opts.text_literal_as_node_encoding == "property"
    l = l.withColumn(
        "entity_parent",
        F.when(F.col("needs_ref"), F.col("parent")).otherwise(F.col("e_parent")),
    ).withColumn("content_id", T.create_content_node_uri(F.col("value")))
    ctx_ok = (
        F.col("entity_parent").isNotNull()
        & (F.col("entity_parent") != "null")
        & (F.col("entity_parent") != C.HK_NULL_URI)
    )
    type_ref_id = T.create_ref_uri(lit_key, F.col("entity_parent"))
    tag_map = F.create_map(lit_key, F.array(F.col("p_id")))
    no_map = F.lit(None).cast("map<string,array<string>>")
    roles_map = F.create_map(
        F.lit(opts.subject_label), F.lit(C.ROLE_SUBJECT),
        F.lit(opts.object_label), F.lit(C.ROLE_OBJECT),
    )

    def bind(role: str, comp: Column) -> Column:
        return F.struct(
            F.lit(role).alias("role"), comp.alias("comp"),
            F.lit(C.LAMBDA).alias("anchor"),
        )

    content = (
        l.groupBy("content_id")
        .agg(F.min_by(F.struct("entity_parent", "value"), "stmt_idx").alias("e"))
        .select(
            F.col("content_id").alias("id"),
            F.col("e.entity_parent").alias("parent"),
            F.create_map(
                F.lit("mimeType"), F.array(F.lit("plain/text")),
                F.lit("data"), F.array(F.col("e.value")),
            ).alias("properties"),
        )
    )
    pred_conn = l.select(F.col("p_id").alias("id")).distinct().select(
        "id", F.lit(C.FACTS).alias("className"), roles_map.alias("roles")
    )
    type_conn = l.select(
        T.id_from_resource(F.lit(C.RDF_TYPE_URI)).alias("id"),
        F.lit(C.HIERARCHY).alias("className"), roles_map.alias("roles"),
    ).limit(1)
    type_node = l.select(lit_key.alias("id")).limit(1)
    type_refs = (
        l.filter(ctx_ok)
        .select("entity_parent").distinct()
        .select(
            T.create_ref_uri(lit_key, F.col("entity_parent")).alias("id"),
            lit_key.alias("ref"), F.col("entity_parent").alias("parent"),
        )
    )
    spo_links = (
        l.select(
            T.create_spo_uri(
                F.col("target_id"), F.col("p"), F.col("value"),
                F.col("entity_parent"),
            ).alias("id"),
            F.col("p_id").alias("connector"),
            F.col("entity_parent").alias("parent"),
            F.array(
                bind(opts.subject_label, F.col("target_id")),
                bind(opts.object_label, F.col("content_id")),
            ).alias("binds"),
            (tag_map if as_prop else no_map).alias("properties"),
            (no_map if as_prop else tag_map).alias("metaProperties"),
            "stmt_idx",
        )
        .groupBy("id")
        .agg(
            F.min_by(
                F.struct("connector", "parent", "binds", "properties", "metaProperties"),
                "stmt_idx",
            ).alias("e")
        )
        .select("id", "e.connector", "e.parent", "e.binds", "e.properties",
                "e.metaProperties")
    )
    type_links = (
        l.select(
            T.create_spo_uri(
                F.col("content_id"), F.lit(C.RDF_TYPE_URI),
                F.lit(C.DATA_LITERAL_URI), F.col("entity_parent"),
            ).alias("id"),
            T.id_from_resource(F.lit(C.RDF_TYPE_URI)).alias("connector"),
            F.col("entity_parent").alias("parent"),
            F.array(
                bind(opts.subject_label, F.col("content_id")),
                bind(opts.object_label, F.when(ctx_ok, type_ref_id).otherwise(lit_key)),
            ).alias("binds"),
            "stmt_idx",
        )
        .groupBy("id")
        .agg(F.min_by(F.struct("connector", "parent", "binds"), "stmt_idx").alias("e"))
        .select("id", "e.connector", "e.parent", "e.binds")
    )

    parts = [
        (_as_entities(spo_links, C.LINK), 10),
        (_as_entities(type_links, C.LINK), 10),
        (_as_entities(pred_conn, C.CONNECTOR), 10),
        (_as_entities(type_conn, C.CONNECTOR), 15),
        (_as_entities(content, C.NODE), 80),
        (_as_entities(type_node, C.NODE), 80),
        (_as_entities(type_refs, C.REFERENCE), 80),
    ]
    out = None
    for df, pr in parts:
        for name, typ in [
            ("properties", "map<string,array<string>>"),
            ("metaProperties", "map<string,array<string>>"),
        ]:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(typ))
        df = df.select(*ENTITY_COLUMNS).withColumn("_prio", F.lit(pr))
        out = df if out is None else out.unionByName(df)
    return out


def merge_text_literal_extras(out: DataFrame, extras: DataFrame) -> DataFrame:
    """Overwrite-merge A7 extras into the finished entity set. Base rows get
    priority 0 (connectors — pass-1 connectors beat everything, parser.js:
    376-379) or 20 (everything else); extras carry their own _prio (10/15/80),
    so JS dict-overwrite order is reproduced deterministically."""
    base = out.withColumn(
        "_prio",
        F.when(F.col("type") == C.CONNECTOR, F.lit(0)).otherwise(F.lit(20)),
    )
    u = base.unionByName(extras)
    fields = [c for c in ENTITY_COLUMNS if c != "id"]
    return (
        u.groupBy("id")
        .agg(F.min_by(F.struct(*fields), F.col("_prio")).alias("e"))
        .select("id", *[F.col(f"e.{f}").alias(f) for f in fields])
        .select(*ENTITY_COLUMNS)
    )


def _as_entities(df: DataFrame, etype: str, **cols: Column) -> DataFrame:
    """Project a per-type DataFrame onto the full entity schema."""
    out = df.withColumn("type", F.lit(etype))
    defaults: dict[str, Column] = {
        "parent": F.lit(None).cast("string"),
        "connector": F.lit(None).cast("string"),
        "ref": F.lit(None).cast("string"),
        "className": F.lit(None).cast("string"),
        "roles": F.lit(None).cast("map<string,string>"),
        "binds": F.lit(None).cast(
            "array<struct<role:string, comp:string, anchor:string>>"
        ),
        "interfaces": F.lit(None).cast(
            "map<string,struct<type:string, key:string, properties:map<string,string>>>"
        ),
    }
    for name, expr in {**defaults, **cols}.items():
        if name not in df.columns:
            out = out.withColumn(name, expr)
    keep = [c for c in ENTITY_COLUMNS if c in out.columns]
    return out.select(*keep)


def collect_shells_fused(q: DataFrame, opts: ParseOptions) -> DataFrame:
    """Fused A1+A2+A3 + priority resolution: ONE shuffle instead of four.

    Emits one candidate row per potential entity occurrence, tagged with the
    priority kind (0 connector, 3 context, 5 node — the same ladder the
    general path uses), then resolves everything in a single groupBy(id):
    the winning kind is the minimum kind, the connector's className comes from
    the first predicate occurrence, the node's parent from the first
    subject/object occurrence. Semantically identical to the sequential
    dict-insertion of parser.js for the base (no-plugin) pipeline.
    """
    # ONE scan of the (corpus-sized, checkpointed) annotated quads emitting
    # all candidate kinds as an exploded array of optional structs, instead
    # of a 4-branch union whose every branch re-read the full input — the
    # same candidate rows, 1 read instead of 4 (r6; with persist=True the
    # input is a materialized checkpoint, so the union cost 4 cache sweeps
    # of the corpus per downstream aggregation stage).
    def _cand(cond: Column, id_c: Column, kind: int, ord_c: Column,
              payload: Column, parent_cand: Column) -> Column:
        return F.when(
            cond,
            F.struct(
                id_c.alias("id"), F.lit(kind).alias("kind"),
                ord_c.alias("ord"), payload.alias("payload"),
                parent_cand.alias("parent_cand"),
            ),
        )
    _none = F.lit(None).cast("string")
    cands = [
        _cand(
            T.is_uri("p") & F.col("o_is_res"), F.col("p_id"), 0,
            F.col("stmt_idx") * 2, F.col("p"), _none,
        )
    ]
    if opts.create_context:
        cond = F.col("parent").isNotNull() & (F.col("parent") != C.HK_NULL_URI)
        if opts.strategy == "pre-existing-context" and opts.root_context is not None:
            cond = cond & (F.col("parent") != opts.root_context)
        cands.append(
            _cand(cond, F.col("parent"), 3, F.col("stmt_idx") * 2, _none, _none)
        )
    cands.append(
        _cand(
            T.is_uri_or_blank_node("s"), F.col("subject_id"), 5,
            F.col("stmt_idx") * 2, _none, F.col("parent_id"),
        )
    )
    cands.append(
        _cand(
            F.col("o_is_res"), F.col("object_id"), 5,
            F.col("stmt_idx") * 2 + 1, _none,
            F.when(
                F.col("parent_id") != F.col("object_id"), F.col("parent_id")
            ),
        )
    )
    # explode the raw array and drop the null elements as a row filter —
    # array_compact would do it in-array, but it rewrites to a higher-order
    # filter(lambda) which is CodegenFallback (interpreted per row); an
    # exploded-row IS NOT NULL filter stays inside whole-stage codegen
    cand = (
        q.select(F.explode(F.array(*cands)).alias("_c"))
        .filter(F.col("_c").isNotNull())
        .select("_c.id", "_c.kind", "_c.ord", "_c.payload", "_c.parent_cand")
    )

    node_parent = (
        F.min_by(
            F.when(F.col("kind") == 5, F.struct("parent_cand")),
            F.when(F.col("kind") == 5, F.col("ord")),
        )
        if opts.set_node_context
        else None
    )
    aggs = [
        F.min("kind").alias("kind"),
        F.min_by(
            F.when(F.col("kind") == 0, F.col("payload")),
            F.when(F.col("kind") == 0, F.col("ord")),
        ).alias("p0"),
    ]
    if node_parent is not None:
        aggs.append(node_parent.alias("np"))
    res = cand.groupBy("id").agg(*aggs)
    parent = (
        F.when(F.col("kind") == 5, F.col("np.parent_cand"))
        if opts.set_node_context
        else F.lit(None).cast("string")
    )
    return res.select(
        "id",
        F.when(F.col("kind") == 0, C.CONNECTOR)
        .when(F.col("kind") == 3, C.CONTEXT)
        .otherwise(C.NODE)
        .alias("type"),
        parent.alias("parent"),
        F.when(
            F.col("kind") == 0,
            F.when(
                F.col("p0").isin(opts.hierarchy_connector_ids), C.HIERARCHY
            ).otherwise(C.FACTS),
        ).alias("className"),
        ((F.col("kind") == 5) & F.lit(bool(opts.set_node_context))).alias(
            "parent_defined"
        ),
    )


def parse_quads(
    quads: DataFrame, opts: ParseOptions | None = None, persist: bool = True
) -> DataFrame:
    """The full RDF→HK conversion (parser.js parseGraph), as one DataFrame plan.

    Returns the entities DataFrame (ENTITY_SCHEMA). The input is read by three
    independent sub-DAGs (the reference's three loops); ``persist=True``
    (default) persists the annotated quads so the term-kernel decode runs once
    instead of once per downstream branch — at cluster scale this is a
    MEMORY_AND_DISK cache of the (already materialized) input, the same
    tradeoff the reference makes by holding the quad store in memory.
    """
    opts = opts or ParseOptions()
    q = _with_parse_columns(quads, opts)
    if persist:
        # The annotated quads feed ~15 downstream aggregations. An EAGER
        # localCheckpoint (not a lazy persist) for two measured reasons:
        # - laziness: AQE submits the downstream branches' leaf shuffle
        #   stages concurrently, and every stage that reaches an
        #   UNPOPULATED cache recomputes the full upstream pipeline instead
        #   of waiting (cache population is per-partition, non-blocking) —
        #   measured 14 concurrent ~10 s stages on the web pipeline at
        #   sf0.1, each duplicating the extract+quads derivation;
        # - lineage: persist keeps the whole upstream tree in the logical
        #   plan, so each of the ~15 consumers re-analyzes it (for deep
        #   inputs — serialize→parse chains — Catalyst planning blew up
        #   superlinearly, 17 min observed; for the web pipeline it was a
        #   ~3 s per-build driver-side gap). The checkpoint truncates the
        #   plan to a leaf. Blocks are MEMORY_AND_DISK; the fault-tolerance
        #   trade (blocks die with the executor) is the standard
        #   localCheckpoint contract and acceptable for an intra-query
        #   intermediate.
        # Populate any caller-persisted upstream cache FIRST: the checkpoint
        # job's own leaf stages fan out concurrently under AQE, and each
        # branch that reaches an unpopulated cache re-runs the cached
        # subtree (the web pipeline's lazy ext.persist() measured 4
        # concurrent full extract-UDF passes).
        from rdf2hk_spark.session import materialize_pending_caches

        materialize_pending_caches(quads)
        q = q.localCheckpoint(eager=True)

    convert_hk = opts.convert_hk or opts.only_hk
    if convert_hk:
        from rdf2hk_spark.operators import hkvocab

        mask = hkvocab.should_convert(opts.only_hk)
        hkq = q.filter(mask)
        uq = q.filter(~mask)
    else:
        hkq = None
        uq = q

    custom = bool(opts.custom_rdf_parser and opts.contextualize)

    if not custom and not convert_hk:
        # hot path: one fused shuffle resolves connectors/contexts/nodes
        resolved = collect_shells_fused(uq, opts)
        connectors = resolved.filter(F.col("type") == C.CONNECTOR).select(
            "id", "className"
        )
        links = create_links(uq, opts, connectors)
        roles_map = F.create_map(
            F.lit(opts.subject_label), F.lit(C.ROLE_SUBJECT),
            F.lit(opts.object_label), F.lit(C.ROLE_OBJECT),
        )
        resolved = resolved.withColumns(
            {
                "roles": F.when(F.col("type") == C.CONNECTOR, roles_map),
                "connector": F.lit(None).cast("string"),
                "ref": F.lit(None).cast("string"),
                "binds": F.lit(None).cast(
                    "array<struct<role:string, comp:string, anchor:string>>"
                ),
                "interfaces": F.lit(None).cast(
                    "map<string,struct<type:string, key:string,"
                    " properties:map<string,string>>>"
                ),
            }
        )
        directory = resolved.select("id", "type", "parent")
        lits_resolved = resolve_property_targets(uq, opts, directory)
        # ONE aggregation tree produces properties, metaProperties AND the
        # Reference mint — no separate per-(target,prop) / per-ref shuffles
        pr = aggregate_properties_fused(lits_resolved, opts)
        link_e = links.select(
            "id", F.lit(C.LINK).alias("type"), "parent", "connector",
            F.lit(None).cast("string").alias("ref"),
            F.lit(None).cast("string").alias("className"),
            F.lit(None).cast("map<string,string>").alias("roles"), "binds",
            F.lit(None).cast(
                "map<string,struct<type:string, key:string,"
                " properties:map<string,string>>>"
            ).alias("interfaces"),
            F.lit(True).alias("parent_defined"),
        )
        cols = ["id", "type", "parent", "connector", "ref", "className",
                "roles", "binds", "interfaces", "parent_defined"]
        base_e = resolved.select(*cols).unionByName(link_e.select(*cols))
        out = base_e.join(
            pr.select("id", "properties", "metaProperties"), "id", "left"
        )
        # Reference rows ride the aggregation output directly (their property
        # maps are already on the row) — <hk://ref/md5> ids are disjoint from
        # every other entity id space, so a plain union suffices
        ref_e = pr.filter(F.col("needs_ref")).select(
            "id", F.lit(C.REFERENCE).alias("type"),
            F.col("ref_parent").alias("parent"),
            F.lit(None).cast("string").alias("connector"), "ref",
            F.lit(None).cast("string").alias("className"),
            F.lit(None).cast("map<string,string>").alias("roles"),
            F.lit(None).cast(
                "array<struct<role:string, comp:string, anchor:string>>"
            ).alias("binds"),
            F.lit(None).cast(
                "map<string,struct<type:string, key:string,"
                " properties:map<string,string>>>"
            ).alias("interfaces"),
            F.lit(True).alias("parent_defined"),
            "properties", "metaProperties",
        )
        out = out.unionByName(ref_e.select(*out.columns))
        for name, typ in [
            ("properties", "map<string,array<string>>"),
            ("metaProperties", "map<string,array<string>>"),
        ]:
            out = out.withColumn(name, F.col(name).cast(typ))
        out = out.select(*ENTITY_COLUMNS)
        if opts.text_literal_as_node:
            out = merge_text_literal_extras(
                out, text_literal_entities(lits_resolved, opts)
            )
        return out

    if custom:
        from rdf2hk_spark.operators import customparse

        cmask = customparse.matching_mask(opts.contextualize)
        uq12 = uq.filter(~cmask)  # loops 1-2 consume matching statements
    else:
        uq12 = uq

    connectors = collect_connectors(uq12, opts)
    contexts = collect_contexts(uq12, opts)
    nodes_all = collect_nodes(uq12, opts)

    custom_ctx = custom_new_nodes = custom_refs = None
    if custom:
        custom_ctx = customparse.custom_contexts(uq, opts.contextualize)
        custom_new_nodes, overrides, custom_refs = customparse.custom_nodes_and_refs(
            uq, opts.contextualize, nodes_all
        )
        nodes_all = (
            nodes_all.join(overrides, "id", "left")
            .withColumn("parent", F.coalesce("new_parent", "parent"))
            .drop("new_parent")
        )
        node_parents = nodes_all.select("id", "parent").unionByName(
            custom_new_nodes.select("id", "parent")
        )
        links = customparse.custom_links(uq, opts, connectors, node_parents)
    else:
        links = create_links(uq, opts, connectors)
    nodes_all = nodes_all.drop("min_ord")

    roles_map = F.create_map(
        F.lit(opts.subject_label),
        F.lit(C.ROLE_SUBJECT),
        F.lit(opts.object_label),
        F.lit(C.ROLE_OBJECT),
    )

    # shell priority: the reference's dict insertion order — pass-1 entries
    # (base connectors overwrite everything at finish, parser.js:376-379; HK
    # isa/usesConnector shells beat pass-2 nodes), then nodes, links, refs
    def prio(df: DataFrame, p: int, defined, etype: str | None = None, **cols) -> DataFrame:
        out = _as_entities(df, etype, **cols) if etype else df
        return out.withColumn("_prio", F.lit(p)).withColumn(
            "parent_defined",
            defined if isinstance(defined, Column) else F.lit(defined),
        )

    # priority ladder (lower wins): 0 base connectors (overwrite-all at
    # finish), 1 HK shells, 2 custom contexts, 3 base contexts, 4 custom
    # nodes, 5 base nodes, 6 links, 7 refs
    shells = [
        prio(connectors, 0, False, C.CONNECTOR, roles=roles_map),
        prio(contexts, 3, False, C.CONTEXT),
        prio(nodes_all, 5, bool(opts.set_node_context), C.NODE),
        prio(links, 6, True, C.LINK),
    ]
    if custom:
        shells.append(prio(custom_ctx, 2, True, C.CONTEXT))
        shells.append(prio(custom_new_nodes, 4, True, C.NODE))
        shells.append(prio(custom_refs, 7, True, C.REFERENCE))
    if convert_hk:
        hk_shells = (
            hkvocab.isa_shells(hkq).drop("stmt_idx")
            .unionByName(
                hkvocab.compressed_link_shells(hkq).drop("stmt_idx"),
                allowMissingColumns=True,
            )
        )
        hk_e = hk_shells.select(
            "id", "type", "parent", "parent_defined",
            *[c for c in ["connector"] if c in hk_shells.columns],
        )
        for name, typ in [
            ("connector", "string"), ("ref", "string"), ("className", "string"),
            ("roles", "map<string,string>"),
            ("binds", "array<struct<role:string, comp:string, anchor:string>>"),
            ("properties", "map<string,array<string>>"),
            ("metaProperties", "map<string,array<string>>"),
            ("interfaces",
             "map<string,struct<type:string, key:string, properties:map<string,string>>>"),
        ]:
            if name not in hk_e.columns:
                hk_e = hk_e.withColumn(name, F.lit(None).cast(typ))
        hk_e = hk_e.select(*ENTITY_COLUMNS, "parent_defined").withColumn("_prio", F.lit(1))
        shells.append(hk_e)

    merged = shells[0]
    for s_df in shells[1:]:
        merged = merged.unionByName(s_df, allowMissingColumns=True)
    fields = [c for c in merged.columns if c not in ("id", "_prio")]
    resolved = merged.groupBy("id").agg(
        F.min_by(F.struct(*fields), F.col("_prio")).alias("e")
    ).select("id", *[F.col(f"e.{f}").alias(f) for f in fields])

    if convert_hk:
        upd = hkvocab.intrinsic_updates(hkq)
        resolved = resolved.join(upd, "id", "left")
        resolved = (
            resolved.withColumn(
                "parent",
                F.when(F.col("u_parent_set").eqNullSafe(True), F.col("u_parent"))
                .otherwise(F.col("parent")),
            )
            .withColumn(
                "parent_defined",
                F.col("parent_defined") | F.col("u_parent_set").eqNullSafe(True),
            )
            .withColumn("ref", F.coalesce("u_ref", "ref"))
            .withColumn("connector", F.coalesce("u_connector", "connector"))
            .withColumn("className", F.coalesce("u_className", "className"))
            .drop("u_parent", "u_parent_set", "u_ref", "u_connector", "u_className")
        )
        roles_upd = hkvocab.connector_roles(hkq)
        resolved = resolved.join(roles_upd, "id", "left").withColumn(
            "roles",
            F.when(
                (F.col("type") == C.CONNECTOR) & F.col("u_roles").isNotNull(),
                _merge_maps(F.col("roles"), F.col("u_roles")),
            ).otherwise(F.col("roles")),
        ).drop("u_roles")

    # property/reference resolution over user statements only (HK statements
    # were consumed by the plugin, hkparser.js shouldConvert)
    directory = resolved.filter(~F.col("type").isin(C.LINK, C.REFERENCE)).select(
        "id", "type", "parent"
    )
    lits_resolved = resolve_property_targets(uq, opts, directory)
    # one aggregation tree yields both the property maps and the Reference
    # mint; Catalyst prunes the map assembly out of the refs branch and the
    # shuffle is reused, so this replaces two keyed shuffles with one
    pr = aggregate_properties_fused(lits_resolved, opts)
    refs = pr.filter(F.col("needs_ref")).select(
        "id", "ref", F.col("ref_parent").alias("parent")
    )
    props = pr.select("id", "properties", "metaProperties")

    ref_e = prio(refs, 7, True, C.REFERENCE)
    if convert_hk or custom:
        # ref ids can collide with HK/custom shells → resolve by priority
        resolved = resolved.withColumn("_prio", F.lit(0)).unionByName(
            ref_e, allowMissingColumns=True
        )
        fields = [c for c in resolved.columns if c not in ("id", "_prio")]
        resolved = resolved.groupBy("id").agg(
            F.min_by(F.struct(*fields), F.col("_prio")).alias("e")
        ).select("id", *[F.col(f"e.{f}").alias(f) for f in fields])
    else:
        # base pipeline: <hk://ref/md5> ids are disjoint from every other
        # entity id space — plain union, no shuffle
        resolved = resolved.unionByName(
            ref_e.drop("_prio"), allowMissingColumns=True
        )

    if convert_hk:
        resolved = (
            resolved.join(hkvocab.compressed_binds(hkq), "id", "left")
            .join(hkvocab.reified_binds(hkq), "id", "left")
        )
        resolved = hkvocab.finalize_binds(resolved)
        resolved = resolved.join(hkvocab.interfaces_map(hkq), "id", "left").withColumn(
            "interfaces", F.coalesce("u_interfaces", "interfaces")
        ).drop("u_interfaces")
        # ref-target suppression (hkparser.js:417-425): drop referenced
        # entities that never received a parent
        ref_targets = resolved.filter(
            (F.col("type") == C.REFERENCE) & F.col("ref").isNotNull()
        ).select(F.col("ref").alias("id")).distinct()
        doomed = resolved.join(ref_targets, "id", "left_semi").filter(
            (~F.col("parent_defined")) & (F.col("type") != C.CONNECTOR)
        ).select("id")
        # doomed is an unbounded ref-target set — let AQE choose the strategy
        resolved = resolved.join(doomed, "id", "left_anti")

    out = resolved.drop("properties", "metaProperties").join(props, "id", "left")
    for name, typ in [
        ("properties", "map<string,array<string>>"),
        ("metaProperties", "map<string,array<string>>"),
    ]:
        out = out.withColumn(name, F.col(name).cast(typ))
    if convert_hk and not opts.text_literal_as_node:
        from rdf2hk_spark.operators import hkvocab as _hv

        out = _hv.strip_literal_markers(out)
    out = out.select(*ENTITY_COLUMNS)
    if opts.text_literal_as_node:
        out = merge_text_literal_extras(
            out, text_literal_entities(lits_resolved, opts)
        )
    return out


def _merge_maps(base: Column, upd: Column) -> Column:
    """Merge two maps, update-side wins on key conflicts (JS addRole)."""
    b = F.coalesce(base, F.from_json(F.lit("{}"), "map<string,string>"))
    kept = F.map_filter(b, lambda k, v: ~F.map_contains_key(upd, k))
    return F.map_concat(kept, upd)
