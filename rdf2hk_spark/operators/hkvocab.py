"""HK-vocabulary reconstruction (round-trip parse): operators H1-H8.

Distributed re-expression of /root/reference/hkparser.js. Under ``convertHK``
the reference registers an HKParser plugin whose shouldConvert filter CONSUMES
every HK-vocabulary statement (isa/usesConnector/hasBind/bound*/className/
hasParent/references/hk://role/… predicates, hk://a/… anchor subjects,
data#list literals) so they never reach the base pipeline; the plugin then
rebuilds typed entities, intrinsic fields, binds and anchors from them.

Here the same split is a Column predicate over the quads, the shells and
intrinsic updates are aggregations over the consumed statements, and the
``finish`` fix-ups (compressed-bind λ defaulting + parent-anchor rewrite,
bnode-bind attachment, ref-target suppression, data#Literal cleanup) are
join-updates and array transforms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T

HK_URIS = [
    C.HAS_PARENT_URI,
    C.REFERENCES_URI,
    C.REFERENCED_BY_URI,
    C.USES_CONNECTOR_URI,
    C.HAS_BIND_URI,
    C.BOUND_ROLE_URI,
    C.BOUND_ANCHOR_URI,
    C.BOUND_COMPONENT_URI,
    C.CLASSNAME_URI,
    C.ISA_URI,
    f"<{C.HK_GRAPH_NS}listCurrent>",
    f"<{C.HK_GRAPH_NS}listNext>",
    C.HAS_ANCHOR_URI,
    C.ANCHOR_KEY_URI,
    C.ANCHOR_TYPE_URI,
]

ISA_TYPE_MAP = {
    C.NODE_URI: C.NODE,
    C.CONTEXT_URI: C.CONTEXT,
    C.VIRTUAL_CONTEXT_URI: C.VIRTUAL_CONTEXT,
    C.VIRTUAL_NODE_URI: C.VIRTUAL_NODE,
    C.VIRTUAL_LINK_URI: C.VIRTUAL_LINK,
    C.CONNECTOR_URI: C.CONNECTOR,
    C.REF_URI: C.REFERENCE,
    C.LINK_URI: C.LINK,
    C.TRAIL_URI: C.TRAIL,
}


def should_convert(only_hk: bool = False) -> Column:
    """hkparser.js:74-111 — which statements the HK plugin consumes.

    The stateful `interfaces.hasOwnProperty(s)` branch (preserved anchor ids,
    only reachable with convertOwlTime) is approximated by the hk://a/ prefix
    test, which covers every anchor id this engine mints."""
    cond = (
        F.col("p").isin(HK_URIS)
        | F.col("o").isin(HK_URIS)
        | F.col("p").startswith(f"<{C.HK_ROLE_PREFIX}")
        | F.col("o").startswith(f"<{C.HK_ROLE_PREFIX}")
        | F.col("s").startswith(f"<{C.HK_ANCHOR_PREFIX}")
        | F.col("lit_dtype").eqNullSafe(C.DATA_LIST_URI)
    )
    if only_hk:
        cond = cond | F.col("o_is_res")
    return cond


def isa_shells(hkq: DataFrame) -> DataFrame:
    """H1 (hkparser.js:493-571): first ISA statement per subject wins;
    parent = graph id (connectors get none). Returns
    (id, type, parent, parent_defined, stmt_idx)."""
    type_col = F.lit(None).cast("string")
    for uri, t in ISA_TYPE_MAP.items():
        type_col = F.when(F.col("o") == uri, t).otherwise(type_col)
    rows = (
        hkq.filter(F.col("p") == C.ISA_URI)
        .withColumn("etype", type_col)
        .filter(F.col("etype").isNotNull())
        .select(
            F.col("subject_id").alias("id"), "etype", "parent_id", "stmt_idx"
        )
    )
    first = rows.groupBy("id").agg(
        F.min_by(F.struct("etype", "parent_id"), "stmt_idx").alias("e"),
        F.min("stmt_idx").alias("stmt_idx"),
    )
    return first.select(
        "id",
        F.col("e.etype").alias("type"),
        F.when(F.col("e.etype") != C.CONNECTOR, F.col("e.parent_id")).alias("parent"),
        (F.col("e.etype") != C.CONNECTOR).alias("parent_defined"),
        "stmt_idx",
    )


def compressed_link_shells(hkq: DataFrame) -> DataFrame:
    """H2 (hkparser.js:475-491): usesConnector mints a Link shell."""
    rows = hkq.filter(F.col("p") == C.USES_CONNECTOR_URI).select(
        F.col("subject_id").alias("id"),
        T.id_from_resource("o").alias("connector"),
        F.col("parent_id").alias("parent"),
        "stmt_idx",
    )
    return rows.groupBy("id").agg(
        F.min_by(F.struct("connector", "parent"), "stmt_idx").alias("e"),
        F.min("stmt_idx").alias("stmt_idx"),
    ).select(
        "id", F.lit(C.LINK).alias("type"), F.col("e.connector").alias("connector"),
        F.col("e.parent").alias("parent"), F.lit(True).alias("parent_defined"),
        "stmt_idx",
    )


def intrinsic_updates(hkq: DataFrame) -> DataFrame:
    """H3 (hkparser.js:213-257): last-wins scalar field updates per entity:
    parent (hasParent → graph id!), ref, connector, className, plus connector
    roles from compressed role statements with literal objects."""
    lit_val = F.col("lit_value")
    upd = hkq.select(
        F.col("subject_id").alias("id"),
        "stmt_idx",
        F.when(F.col("p") == C.HAS_PARENT_URI, F.col("parent_id")).alias("u_parent"),
        F.when(F.col("p") == C.HAS_PARENT_URI, F.lit(True)).alias("u_parent_set"),
        F.when(F.col("p") == C.REFERENCES_URI, T.id_from_resource("o")).alias("u_ref"),
        F.when(F.col("p") == C.USES_CONNECTOR_URI, T.id_from_resource("o")).alias("u_connector"),
        F.when(F.col("p") == C.CLASSNAME_URI, lit_val).alias("u_className"),
    ).filter(
        F.col("u_parent_set").isNotNull() | F.col("u_ref").isNotNull()
        | F.col("u_connector").isNotNull() | F.col("u_className").isNotNull()
    )

    def last(col: str) -> Column:
        return F.max_by(F.col(col), F.when(F.col(col).isNotNull(), F.col("stmt_idx"))).alias(col)

    return upd.groupBy("id").agg(
        last("u_parent"), F.max("u_parent_set").alias("u_parent_set"),
        last("u_ref"), last("u_connector"), last("u_className"),
    )


def connector_roles(hkq: DataFrame) -> DataFrame:
    """Compressed role statements with literal objects → connector roles map
    (hkparser.js:205-209). (id, u_roles)."""
    rows = hkq.filter(
        F.col("p").startswith(f"<{C.HK_ROLE_PREFIX}") & ~F.col("o_is_res")
    ).select(
        F.col("subject_id").alias("id"),
        T.decode_uri_component(
            F.regexp_extract("p", f"^<{C.HK_ROLE_PREFIX}/(.*)>$", 1)
        ).alias("role"),
        F.col("lit_value").alias("rtype"),
        "stmt_idx",
    )
    per_role = rows.groupBy("id", "role").agg(F.max_by("rtype", "stmt_idx").alias("rtype"))
    return per_role.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("role", "rtype"))).alias("u_roles")
    )


def compressed_binds(hkq: DataFrame) -> DataFrame:
    """H5 (hkparser.js:162-203,354-395): hk://role/X statements on LINK
    subjects → binds. Resource objects bind the whole component (λ); literal
    objects 'comp#anchor' split at the LAST '#'. The parent-anchor rewrite of
    finish() is applied later (needs the link's final parent).

    Returns (id, c_binds: array<struct<role, comp, anchor>>) where anchor is
    null for λ-pending entries (λ is substituted during the rewrite step)."""
    role = T.decode_uri_component(
        F.regexp_extract("p", f"^<{C.HK_ROLE_PREFIX}/(.*)>$", 1)
    )
    rows = hkq.filter(F.col("p").startswith(f"<{C.HK_ROLE_PREFIX}")).select(
        F.col("subject_id").alias("id"),
        role.alias("role"),
        F.col("o"), F.col("o_is_res"), F.col("lit_value"), "stmt_idx",
    )
    res = rows.filter(F.col("o_is_res")).select(
        "id", "role", T.id_from_resource("o").alias("comp"),
        F.lit(None).cast("string").alias("anchor"), "stmt_idx",
    )
    lit = rows.filter(~F.col("o_is_res")).select(
        "id", "role",
        F.substring_index("lit_value", "#", -1).alias("anchor_raw"),
        F.expr("substring(lit_value, 1, length(lit_value) - length(substring_index(lit_value, '#', -1)) - 1)").alias("comp"),
        "stmt_idx",
    ).select("id", "role", "comp", F.col("anchor_raw").alias("anchor"), "stmt_idx")
    both = res.unionByName(lit)
    # group anchors per (id, role, comp): null-anchor rows mark λ-membership,
    # literal rows append anchor keys (reference accumulates in a list)
    per_comp = both.groupBy("id", "role", "comp").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("anchor").isNotNull(), F.struct("stmt_idx", "anchor"))
                )
            ),
            lambda x: x["anchor"],
        ).alias("anchors")
    )
    entry = F.struct(
        F.col("role").alias("role"), F.col("comp").alias("comp"),
        F.col("anchors").alias("anchors"),
    )
    return per_comp.groupBy("id").agg(F.collect_list(entry).alias("c_binds"))


def reified_binds(hkq: DataFrame) -> DataFrame:
    """H4 (hkparser.js:258-305,397-415): hasBind bnodes + boundRole/
    boundComponent/boundAnchor → binds on the owning link.
    Returns (id, r_binds)."""
    owner = hkq.filter(F.col("p") == C.HAS_BIND_URI).select(
        F.col("subject_id").alias("id"), F.col("o").alias("bnode"),
        F.col("stmt_idx").alias("link_stmt"),
    ).groupBy("bnode").agg(
        F.min_by("id", "link_stmt").alias("id"), F.min("link_stmt").alias("link_stmt")
    )
    fields = hkq.filter(
        F.col("p").isin(C.BOUND_ROLE_URI, C.BOUND_COMPONENT_URI, C.BOUND_ANCHOR_URI)
    ).select(
        F.col("s_m").alias("bnode"),
        F.when(F.col("p") == C.BOUND_ROLE_URI, F.col("lit_value")).alias("role"),
        F.when(F.col("p") == C.BOUND_COMPONENT_URI,
               F.when(F.col("o_is_res"), T.id_from_resource("o_m")).otherwise(F.col("lit_value"))
               ).alias("comp"),
        F.when(F.col("p") == C.BOUND_ANCHOR_URI, F.col("lit_value")).alias("anchor"),
        "stmt_idx",
    )
    agg = fields.groupBy("bnode").agg(
        F.max_by("role", F.when(F.col("role").isNotNull(), F.col("stmt_idx"))).alias("role"),
        F.max_by("comp", F.when(F.col("comp").isNotNull(), F.col("stmt_idx"))).alias("comp"),
        F.max_by("anchor", F.when(F.col("anchor").isNotNull(), F.col("stmt_idx"))).alias("anchor"),
    )
    joined = owner.join(agg, "bnode").filter(
        F.col("role").isNotNull() & F.col("comp").isNotNull()
    )
    # addBind(role, getIdFromResource(comp), anchor) (hkparser.js:410-411)
    entry = F.struct(
        F.col("role").alias("role"),
        T.id_from_resource("comp").alias("comp"),
        F.coalesce(F.col("anchor"), F.lit(C.LAMBDA)).alias("anchor"),
    )
    return joined.groupBy("id").agg(F.collect_list(entry).alias("r_binds"))


def interfaces_map(hkq: DataFrame) -> DataFrame:
    """H6 (hkparser.js:138-140,218-237,306-323): hasAnchor registry →
    per-entity interfaces map keyed by anchorKey."""
    reg = hkq.filter(F.col("p") == C.HAS_ANCHOR_URI).select(
        F.col("subject_id").alias("owner_id"), F.col("o").alias("anchor_term"),
        "stmt_idx",
    ).groupBy("anchor_term").agg(
        F.max_by("owner_id", "stmt_idx").alias("owner_id")
    )
    # fills: statements whose SUBJECT is the anchor term
    fills = hkq.select(
        F.col("s_m").alias("anchor_term"), "p", "o", "o_is_res",
        "lit_value", "lit_dtype", "lit_lang", "num_str", "stmt_idx",
    ).join(reg, "anchor_term")
    key = fills.filter(F.col("p") == C.ANCHOR_KEY_URI).groupBy("anchor_term").agg(
        F.max_by("lit_value", "stmt_idx").alias("key")
    )
    typ = fills.filter(F.col("p") == C.ANCHOR_TYPE_URI).groupBy("anchor_term").agg(
        F.max_by("lit_value", "stmt_idx").alias("itype")
    )
    # free properties: any other non-HK predicate on the anchor subject
    # (value: uri → raw term, literal → converted value, hkparser.js:316)
    conv = F.when(
        F.col("lit_dtype").isin(C.NUMBER_DATATYPES) & F.col("num_str").isNotNull(),
        F.col("num_str"),
    ).otherwise(F.col("lit_value"))
    props = fills.filter(
        ~F.col("p").isin(HK_URIS) & ~F.col("p").startswith(f"<{C.HK_ROLE_PREFIX}")
    ).select(
        "anchor_term",
        T.id_from_resource("p").alias("pk"),
        F.when(T.is_uri("o"), F.col("o")).otherwise(conv).alias("pv"),
        "stmt_idx",
    ).groupBy("anchor_term", "pk").agg(
        F.max_by("pv", "stmt_idx").alias("pv")
    ).groupBy("anchor_term").agg(
        F.map_from_entries(F.collect_list(F.struct("pk", "pv"))).alias("iprops")
    )
    reg2 = (
        reg.join(key, "anchor_term", "left")
        .join(typ, "anchor_term", "left")
        .join(props, "anchor_term", "left")
        .filter(F.col("key").isNotNull())
    )
    intf = F.struct(
        F.col("itype").alias("type"), F.col("key").alias("key"),
        F.coalesce(
            F.col("iprops"), F.from_json(F.lit("{}"), "map<string,string>")
        ).alias("properties"),
    )
    return reg2.groupBy(F.col("owner_id").alias("id")).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("key"), intf))
        ).alias("u_interfaces")
    )


def finalize_binds(entities: DataFrame) -> DataFrame:
    """finish() bind fix-ups on the joined entity rows: λ-default compressed
    binds, apply the parent-anchor rewrite (hkparser.js:354-395), then append
    reified binds."""
    e = entities
    # compressed entries: anchors null/empty → [λ]
    norm = F.transform(
        F.col("c_binds"),
        lambda b: F.struct(
            b["role"].alias("role"), b["comp"].alias("comp"),
            F.when(
                F.size(b["anchors"]) > 0, b["anchors"]
            ).otherwise(F.array(F.lit(C.LAMBDA))).alias("anchors"),
        ),
    )
    e = e.withColumn("c_norm", norm)
    # parent-anchor rewrite per role: if the link binds its own parent with λ
    # and exactly one other λ component in the same role, collapse to
    # {parent: [other]}
    parent = F.col("parent")
    same_role_stats = lambda role: None  # documented inline below

    def rewrite(binds: Column) -> Column:
        # counts per role computed via filters inside the transform
        def per_entry(b):
            role_entries = F.filter(F.col("c_norm"), lambda x: x["role"] == b["role"])
            parent_entry = F.filter(
                role_entries,
                lambda x: x["comp"].eqNullSafe(parent)
                & (F.size(x["anchors"]) == 1) & (x["anchors"][0] == C.LAMBDA),
            )
            others = F.filter(role_entries, lambda x: ~x["comp"].eqNullSafe(parent))
            other_l = F.filter(
                others,
                lambda x: (F.size(x["anchors"]) == 1) & (x["anchors"][0] == C.LAMBDA),
            )
            rewrite_on = (
                parent.isNotNull() & (F.size(parent_entry) == 1)
                & (F.size(others) == 1) & (F.size(other_l) == 1)
            )
            is_parent = b["comp"].eqNullSafe(parent)
            new_anchors = F.when(
                rewrite_on & is_parent, F.array(other_l[0]["comp"])
            ).otherwise(b["anchors"])
            drop = rewrite_on & ~is_parent
            return F.struct(
                b["role"].alias("role"), b["comp"].alias("comp"),
                new_anchors.alias("anchors"), drop.alias("drop"),
            )

        stage = F.transform(binds, per_entry)
        kept = F.filter(stage, lambda x: ~x["drop"])
        return F.flatten(
            F.transform(
                kept,
                lambda x: F.transform(
                    x["anchors"],
                    lambda a: F.struct(
                        x["role"].alias("role"), x["comp"].alias("comp"),
                        a.alias("anchor"),
                    ),
                ),
            )
        )

    c_final = F.when(F.col("c_norm").isNotNull(), rewrite(F.col("c_norm")))
    merged = F.when(
        c_final.isNotNull() & F.col("r_binds").isNotNull(),
        F.concat(c_final, F.col("r_binds")),
    ).otherwise(F.coalesce(c_final, F.col("r_binds")))
    return e.withColumn(
        "binds",
        F.when(F.col("type").isin(C.LINK, C.VIRTUAL_LINK),
               F.coalesce(merged, F.col("binds"))).otherwise(F.col("binds")),
    ).drop("c_binds", "r_binds", "c_norm")


def strip_literal_markers(entities: DataFrame) -> DataFrame:
    """H8 (hkparser.js:436-452): when textLiteralAsNode is off, drop the
    data#Literal marker property/metaProperty (and the property it names)
    from nodes and links."""
    lit_key = C.DATA_LITERAL_URI
    is_nl = F.col("type").isin(C.NODE, C.LINK)
    marker_p = F.col("properties").getItem(lit_key)
    marker_m = F.col("metaProperties").getItem(lit_key)
    named = F.coalesce(marker_p[0], marker_m[0])
    clean_p = F.map_filter(
        F.col("properties"),
        lambda k, v: (k != lit_key) & ~k.eqNullSafe(named),
    )
    clean_m = F.map_filter(
        F.col("metaProperties"), lambda k, v: k != lit_key
    )
    out = entities.withColumn(
        "properties",
        F.when(is_nl & named.isNotNull(), clean_p).otherwise(F.col("properties")),
    ).withColumn(
        "metaProperties",
        F.when(is_nl & named.isNotNull(), clean_m).otherwise(F.col("metaProperties")),
    )
    return out
