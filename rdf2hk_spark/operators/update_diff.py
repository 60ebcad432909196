"""Update-diff serialization (Z10/Q6): old entities × new entities → the
minimal delete/insert quad sets.

The reference walks changed properties/interfaces/parents per entity and
assembles a SPARQL DELETE+INSERT string shipped to a triplestore
(updatehelper.js:17-211, sparqlfactory.js:442-673). Here the store is a table
of quads, so the update IS a DataFrame delta: serialize the changed entities
on both sides and set-subtract — the result feeds an Iceberg/Delta
``MERGE INTO`` (or an anti-join rewrite on plain parquet). Reparenting falls
out for free: a moved entity's old quads (old graph) land in the delete set
and its new quads (new graph) in the insert set, which is exactly the
reference's "move all triples to the new graph" rule (sparqlfactory.js:442+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdf2hk_spark.operators.serialize import SerializeOptions, serialize_entities

_CMP_COLS = [
    "type", "parent", "connector", "ref", "className", "roles", "binds",
    "properties", "metaProperties", "interfaces",
]


def changed_entity_ids(old: DataFrame, new: DataFrame) -> DataFrame:
    """Entity ids whose serialized state differs (added, removed, or
    modified) — one symmetric set difference over a canonical projection."""
    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            "id", F.to_json(F.struct(*[F.col(c) for c in _CMP_COLS])).alias("state")
        )
    a, b = canon(old), canon(new)
    return (
        a.exceptAll(b).select("id")
        .unionByName(b.exceptAll(a).select("id"))
        .distinct()
    )


def update_quads(
    old: DataFrame, new: DataFrame, opts: SerializeOptions | None = None
) -> DataFrame:
    """(op, s, p, o, g) with op ∈ {'delete','insert'} — the minimal quad
    delta that turns serialize(old) into serialize(new), restricted to
    changed entities so unchanged regions never serialize."""
    opts = opts or SerializeOptions()
    # changed-id set is unbounded (a full reload changes everything) — no
    # forced broadcast, AQE picks the join strategy
    ids = changed_entity_ids(old, new)
    old_c = old.join(ids, "id", "left_semi")
    new_c = new.join(ids, "id", "left_semi")
    # localCheckpoint: the serialize plans are deep union trees over the
    # (often already deep) entity lineage — exceptAll over both sides
    # otherwise multiplies the analyzed-plan size (heap blowup observed)
    oq = serialize_entities(old_c, opts).select("s", "p", "o", "g").localCheckpoint()
    nq = serialize_entities(new_c, opts).select("s", "p", "o", "g").localCheckpoint()
    dels = oq.exceptAll(nq).withColumn("op", F.lit("delete"))
    ins = nq.exceptAll(oq).withColumn("op", F.lit("insert"))
    return dels.unionByName(ins).select("op", "s", "p", "o", "g")


def apply_update(quad_store: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply a delta to a quads table (the plain-parquet stand-in for MERGE
    INTO: anti-join the deletes, union the inserts)."""
    dels = delta.filter(F.col("op") == "delete").select("s", "p", "o", "g")
    ins = delta.filter(F.col("op") == "insert").select("s", "p", "o", "g")
    kept = quad_store.select("s", "p", "o", "g").exceptAll(dels)
    return kept.unionByName(ins)
