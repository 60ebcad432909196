"""CustomHKParser — the reference's pluggable contextualization parser.

Re-expression of /root/reference/customhkparser.js: configured predicates
("contextualize": [{p, o?, allowReference}]) promote their objects to Context
entities, re-home their subjects (either via Reference minting or by
re-parenting the node and leaving a Reference behind), and rebuild pass-3
links with reference-substituted binds.

Consumption semantics (customhkparser.js:35-64): statements whose predicate
matches a contextualize selector are consumed in loops 1-2 (so they mint no
base connector and their objects no base node); in loop 3 the plugin consumes
EVERY resource-object statement and re-implements link creation with the
ref-substituted binds (customhkparser.js:170-236).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T


def matching_mask(contextualize: list[dict]) -> Column:
    return F.col("p").isin([sel["p"] for sel in contextualize])


def custom_contexts(uq: DataFrame, contextualize: list[dict]) -> DataFrame:
    """createContext (customhkparser.js:65-93): matching objects (optionally
    constrained to a specific o) become Contexts with parent = RAW g."""
    cond = F.lit(False)
    for sel in contextualize:
        c = F.col("p") == sel["p"]
        if sel.get("o") is not None:
            c = c & (F.col("o") == sel["o"])
        cond = cond | c
    rows = uq.filter(cond & ~T.is_blank_node("o") & F.col("o_is_res")).select(
        F.col("object_id").alias("id"), F.col("g").alias("parent"), "stmt_idx"
    )
    return rows.groupBy("id").agg(
        F.min_by("parent", "stmt_idx").alias("parent")  # created on first visit
    )


def custom_nodes_and_refs(
    uq: DataFrame, contextualize: list[dict], base_node_parents: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """createNode (customhkparser.js:95-141). Returns (new_nodes,
    parent_overrides, refs):

    - subject unseen before the matching statement → Node(subject, ctx)
    - subject exists with parent ≠ ctx:
        allowReference → Reference(refUri(s, ctx), ref=s RAW, parent=ctx)
        else → re-parent the node to ctx + Reference(refUri(s, oldParent),
               ref=subject id, parent=oldParent)
    """
    m = uq.filter(matching_mask(contextualize) & ~T.is_literal("o"))
    allow = {sel["p"]: bool(sel.get("allowReference")) for sel in contextualize}
    allow_col = F.lit(False)
    for p, a in allow.items():
        allow_col = F.when(F.col("p") == p, F.lit(a)).otherwise(allow_col)
    m = m.select(
        "subject_id", "s_m", F.col("object_id").alias("ctx_id"),
        allow_col.alias("allow_ref"), (F.col("stmt_idx") * 2).alias("ord"),
    )
    # first base occurrence order per subject (statements NOT consumed by the
    # custom parser — i.e. what the base second loop would have seen)
    occ = base_node_parents.select(
        F.col("id").alias("subject_id"), F.col("parent").alias("base_parent"),
        F.col("min_ord").alias("base_ord"),
    )
    j = m.join(occ, "subject_id", "left")
    exists = F.col("base_ord").isNotNull() & (F.col("base_ord") < F.col("ord"))

    new_nodes = (
        j.filter(~exists)
        .groupBy("subject_id")
        .agg(F.min_by("ctx_id", "ord").alias("ctx_id"))
        .select(F.col("subject_id").alias("id"), F.col("ctx_id").alias("parent"))
    )

    mismatch = j.filter(exists & ~F.col("base_parent").eqNullSafe(F.col("ctx_id")))
    refs_allow = mismatch.filter(F.col("allow_ref")).select(
        T.create_ref_uri(F.col("s_m"), F.col("ctx_id")).alias("id"),
        F.col("s_m").alias("ref"),  # RAW term (customhkparser.js:115)
        F.col("ctx_id").alias("parent"),
    )
    reparent = mismatch.filter(~F.col("allow_ref"))
    overrides = reparent.groupBy("subject_id").agg(
        F.max_by("ctx_id", "ord").alias("new_parent"),
        F.min_by("base_parent", "ord").alias("old_parent"),
    )
    refs_move = overrides.join(
        reparent.select("subject_id", "s_m").distinct(), "subject_id"
    ).select(
        T.create_ref_uri(F.col("s_m"), F.col("old_parent")).alias("id"),
        F.col("subject_id").alias("ref"),  # decoded id (customhkparser.js:128)
        F.col("old_parent").alias("parent"),
    )
    refs = refs_allow.unionByName(refs_move).dropDuplicates(["id"])
    return new_nodes, overrides.select(
        F.col("subject_id").alias("id"), "new_parent"
    ), refs


def custom_links(
    uq: DataFrame, opts, connectors: DataFrame, node_parents: DataFrame
) -> DataFrame:
    """lastLoopCallback (customhkparser.js:170-236): link creation with
    reference-substituted binds — a bound component whose node parent differs
    from the statement's graph binds the refUri(term, graph) instead."""
    res = uq.filter(F.col("o_is_res")).withColumn(
        "connector_id", T.id_from_resource("p")
    )
    res = res.join(
        F.broadcast(connectors.select(F.col("id").alias("connector_id"))),
        "connector_id",
        "left_semi",
    )
    np_s = node_parents.select(
        F.col("id").alias("subject_id"), F.col("parent").alias("s_parent")
    )
    np_o = node_parents.select(
        F.col("id").alias("object_id"), F.col("parent").alias("o_parent")
    )
    res = res.join(np_s, "subject_id", "left").join(np_o, "object_id", "left")
    s_comp = F.when(
        F.col("s_parent").eqNullSafe(F.col("parent_id")), F.col("subject_id")
    ).otherwise(T.create_ref_uri(F.col("s_m"), F.col("parent_id")))
    o_comp = F.when(
        F.col("o_parent").eqNullSafe(F.col("parent_id")), F.col("object_id")
    ).otherwise(T.create_ref_uri(F.col("o_m"), F.col("parent_id")))
    links = res.select(
        T.create_spo_uri(F.col("s"), F.col("p"), F.col("o"), F.col("parent")).alias("id"),
        F.col("connector_id").alias("connector"),
        F.col("parent_id").alias("parent"),
        F.array(
            F.struct(
                F.lit(opts.subject_label).alias("role"), s_comp.alias("comp"),
                F.lit(C.LAMBDA).alias("anchor"),
            ),
            F.struct(
                F.lit(opts.object_label).alias("role"), o_comp.alias("comp"),
                F.lit(C.LAMBDA).alias("anchor"),
            ),
        ).alias("binds"),
        "stmt_idx",
    )
    return links.groupBy("id").agg(
        F.min_by(F.struct("connector", "parent", "binds"), "stmt_idx").alias("e")
    ).select("id", "e.connector", "e.parent", "e.binds")
