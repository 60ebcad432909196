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

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

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


# ---------------------------------------------------------------------------
# Engine-executed MERGE on a graph-partitioned parquet store
# ---------------------------------------------------------------------------
# The reference's update path mutates a triplestore graph by graph
# (sparqlfactory.js:442-673 — every DELETE/INSERT is scoped `GRAPH <g>`).
# The distributed analog is a quad store physically partitioned by graph:
# a merge then only ever reads AND rewrites the partitions its delta
# touches — the partition-pruned MERGE SURVEY §1.5 promises (Iceberg's
# MERGE INTO does the same via manifest pruning; this is the no-extra-jars
# parquet realization with the same I/O shape).
#
# Partition key: md5(g) — deterministic, filesystem-safe (graph URIs carry
# '/', ':' and '#'), uniform (no hot directories when one tenant owns many
# graphs... the skew moves inside the partition, where AQE handles it).

_GPART = "gpart"

# Spark writes rows whose partition value is NULL (null graph ⇒ null md5)
# into this directory; the key needs isNull() handling, not string equality
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# A merge/upsert collects the delta's distinct partition keys to the driver
# to plan a literal partition-pruned read — bounded by the graphs touched
# per delta. Past this many touched graphs the collect (and the literal
# IN-predicate it feeds) stops being metadata-scale: the merge switches to
# the BIG-DELTA path — store read scoped by a SEMI-JOIN against the delta's
# key frame (no driver key list on the data path), swap keys derived from
# the staging directory listing, emptied partitions found by a distributed
# anti-join. Driver work stays O(#touched partitions) METADATA (the
# per-partition rename commit — the same scale Iceberg manifests pay),
# never O(keys) through a query-result collect.
COLLECT_KEYS_MAX = 10_000

# Orphan-staging grace for the IN-BAND recover_store call at the start of
# every merge/upsert/compact: a manifest-less staging dir younger than this
# is spared (ADVICE r4: an accidental second writer — or an out-of-band
# maintenance call racing a live merge — must not silently delete an
# in-flight staging write; manifest-backed roll-forward/back is unaffected,
# and a crashed writer's stale staging is still swept one grace later).
# Standalone recover_store keeps grace 0 (explicit single-writer context).
INBAND_ORPHAN_GRACE_SECONDS = 300.0

# explicit read schema: partition-column TYPE INFERENCE would parse an
# all-digit (or digits+'e') md5 hex key as a number, breaking the string
# isin() pruning filter — zero rows read, merge silently drops the
# partition's existing quads (possible for any single-graph store,
# ~1 in 3.5M keys)
_STORE_SCHEMA = (
    "s string, p string, o string, g string, " + _GPART + " string"
)


def _gpart(col="g") -> F.Column:
    return F.md5(F.encode(F.col(col), "UTF-8"))


def gpart_key(g: str) -> str:
    """Python twin of ``_gpart``: the partition directory key for a graph.
    Lets plan-builders (e.g. SPARQL FROM <g>) turn a graph IRI into a
    literal partition-column predicate that prunes at PLANNING time."""
    import hashlib

    return hashlib.md5(g.encode("utf-8")).hexdigest()


def write_quad_store(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write quads as a graph-partitioned parquet store (dir per md5(g))."""
    (
        quads.select("s", "p", "o", "g", _gpart().alias(_GPART))
        .write.mode(mode).partitionBy(_GPART).parquet(path)
    )


def read_quad_store(
    spark: SparkSession, path: str, with_partition_key: bool = False
) -> DataFrame:
    """Read the store as (s, p, o, g). ``with_partition_key=True`` keeps the
    ``gpart`` partition column so graph-scoped consumers (SPARQL ``FROM
    <g>``, Q11 scope_to_context) can attach a partition-column predicate the
    scan prunes on — a plain ``g = <iri>`` filter alone reads every
    partition's files."""
    cols = ["s", "p", "o", "g"] + ([_GPART] if with_partition_key else [])
    return spark.read.schema(_STORE_SCHEMA).parquet(path).select(*cols)


def merge_into_store(spark: SparkSession, path: str, delta: DataFrame) -> list[str]:
    """Engine-executed MERGE: apply an (op, s, p, o, g) delta to the store at
    ``path``, reading and rewriting ONLY the graph partitions the delta
    touches. Untouched partition files are never opened, never rewritten.

    Commit protocol (Hive-style insert-overwrite): the merged result for the
    touched partitions is first written to a staging directory, then swapped
    in with per-partition directory renames — a crash before the swap leaves
    the store intact. Driver-side work is bounded by the NUMBER of touched
    partitions (metadata scale, exactly like Iceberg manifest planning), not
    by data volume. Fully-emptied partitions are deleted, partitions for
    graphs new to the store are created.

    Returns the touched partition keys (md5(g)) for lineage/metrics.

    Reference parity: sparqlfactory.js:442-673 GRAPH-scoped DELETE/INSERT,
    including reparenting — a moved entity deletes from its old graph's
    partition and inserts into the new one, both of which are in the delta's
    touched set by construction (update_quads emits both sides)."""
    # complete/roll back any crashed prior merge; fresh orphan staging is
    # spared (could be a concurrent writer violating the single-writer
    # contract — losing ITS data silently would be worse than leaving a
    # stale dir for the next grace-expired sweep)
    recover_store(spark, path, orphan_grace_seconds=INBAND_ORPHAN_GRACE_SECONDS)
    key_frame = delta.select(_gpart().alias(_GPART)).distinct()
    keys = _collect_keys_bounded(key_frame)
    if keys is not None:
        if not keys:
            return []
        merged = apply_update(_read_partitions(spark, path, keys), delta)
        _staged_swap(spark, path, keys, merged)
        return keys
    # big-delta path (> COLLECT_KEYS_MAX touched graphs)
    merged = apply_update(
        _read_partitions_semi(spark, path, key_frame), delta
    )
    return _staged_swap_frame(spark, path, key_frame, merged)


def upsert_into_store(
    spark: SparkSession, path: str, quads: DataFrame
) -> list[str]:
    """Insert-only idempotent MERGE: set-union ``quads`` (s,p,o,g) into
    their graph partitions — rows already present are NOT duplicated
    (exceptAll against the partition's existing rows), so replaying the
    same batch converges to identical store content. With the
    ``recover_store`` commit protocol this is the exactly-once foundation
    of the streaming sink (streaming.ingest.start_quad_merge_stream):
    at-least-once micro-batch replay × idempotent upsert = exactly-once
    store state. Touched partitions only, same staged-swap commit as
    ``merge_into_store``."""
    recover_store(spark, path, orphan_grace_seconds=INBAND_ORPHAN_GRACE_SECONDS)
    q = quads.select("s", "p", "o", "g").distinct()
    key_frame = q.select(_gpart().alias(_GPART)).distinct()
    keys = _collect_keys_bounded(key_frame)
    if keys is not None and not keys:
        return []
    # lazy store read is crash-safe here (the staging write consumes it
    # BEFORE the swap deletes/renames any store directory), but it feeds
    # BOTH the union leg and the exceptAll leg — persist so each touched
    # partition is scanned once per micro-batch, not twice
    existing = (
        _read_partitions(spark, path, keys)
        if keys is not None
        else _read_partitions_semi(spark, path, key_frame)
    ).persist()
    try:
        merged = existing.unionByName(q.exceptAll(existing))
        if keys is not None:
            _staged_swap(spark, path, keys, merged)
        else:
            keys = _staged_swap_frame(spark, path, key_frame, merged)
    finally:
        existing.unpersist()
    return keys


def compact_store(
    spark: SparkSession, path: str, keys: list[str] | None = None
) -> list[str]:
    """Rewrite each listed (default: every) graph partition into ONE file.
    A merge writes one file per (task, graph), so merge churn leaves many
    small files per partition; compaction restores scan efficiency with
    byte-identical content, using the same partition-pruned read and
    staged-swap commit as the merge itself. Returns the compacted keys."""
    fs, HPath = _store_fs(spark, path)
    if not fs.exists(HPath(path)):
        return []  # nothing to compact (maintenance job before first merge)
    recover_store(spark, path, orphan_grace_seconds=INBAND_ORPHAN_GRACE_SECONDS)
    if keys is None:
        keys = [
            st.getPath().getName().split("=", 1)[1]
            for st in fs.listStatus(HPath(path))
            if st.isDirectory() and st.getPath().getName().startswith(f"{_GPART}=")
        ]
        assume_exists = True  # just listed — skip the per-key fs round-trips
    else:
        assume_exists = False
    if not keys:
        return []
    frame = _read_partitions(
        spark, path, keys, assume_exists=assume_exists
    ).repartition(max(len(keys), 1), F.col("g"))
    _staged_swap(spark, path, keys, frame)
    return keys


def _store_fs(spark: SparkSession, path: str):
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    fs = HPath(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, HPath


def _collect_keys_bounded(key_frame: DataFrame) -> list[str] | None:
    """Collect the delta's distinct partition keys IF there are at most
    ``COLLECT_KEYS_MAX`` of them — one job whose driver result is bounded
    by the limit, never an unbounded collect. Returns None when the delta
    exceeds the bound (callers switch to the big-delta semi-join path)."""
    rows = key_frame.limit(COLLECT_KEYS_MAX + 1).collect()
    if len(rows) > COLLECT_KEYS_MAX:
        return None
    return [
        r[_GPART] if r[_GPART] is not None else _HIVE_NULL for r in rows
    ]


def _read_partitions_semi(
    spark: SparkSession, path: str, key_frame: DataFrame
) -> DataFrame:
    """Big-delta read scoping: the whole store scan LEFT-SEMI-joined to the
    delta's key frame (null-safe on the partition column, so the null-graph
    partition participates). No literal IN-predicate, no driver key list —
    file pruning is traded for a distributed hash semi-join, the right
    trade once the delta touches most of the store's partitions anyway."""
    fs, HPath = _store_fs(spark, path)
    if not fs.exists(HPath(path)):
        return spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
    store = spark.read.schema(_STORE_SCHEMA).parquet(path)
    kf = key_frame.select(F.col(_GPART).alias("_k"))
    return store.join(
        kf, F.col(_GPART).eqNullSafe(F.col("_k")), "left_semi"
    ).select("s", "p", "o", "g")


def _read_partitions(
    spark: SparkSession, path: str, keys: list[str], assume_exists: bool = False
) -> DataFrame:
    """Read ONLY the listed partitions: a literal IN-filter on the partition
    column prunes at planning time (PartitionFilters in the scan node).
    The ``_HIVE_NULL`` key selects the null-graph partition via isNull()
    (a string equality would NULL out and silently read zero rows).
    ``assume_exists`` skips the per-key fs.exists probes when the caller
    just listed the directories (one py4j round-trip per key otherwise)."""
    fs, HPath = _store_fs(spark, path)
    existing = (
        list(keys)
        if assume_exists
        else [k for k in keys if fs.exists(HPath(f"{path}/{_GPART}={k}"))]
    )
    if not existing:
        return spark.createDataFrame(
            [], "s string, p string, o string, g string"
        )
    cond = F.col(_GPART).isin([k for k in existing if k != _HIVE_NULL])
    if _HIVE_NULL in existing:
        cond = cond | F.col(_GPART).isNull()
    return (
        spark.read.schema(_STORE_SCHEMA).parquet(path)
        .filter(cond)
        .select("s", "p", "o", "g")
    )


def recover_store(
    spark: SparkSession, path: str, orphan_grace_seconds: float = 0.0
) -> list[str]:
    """Crash recovery + garbage collection, run at the start of every merge/
    compaction (callable standalone as a maintenance job):

    SINGLE-WRITER CONTRACT: the store assumes one writer at a time
    (merge/upsert/compact/recover) — the same contract a Hive-style
    insert-overwrite table has. A concurrent writer's in-flight staging dir
    (no manifest yet) is indistinguishable from pre-commit crash garbage
    and would be swept. When invoking recover_store OUT-OF-BAND (a cron
    maintenance job that cannot exclude a live writer), pass
    ``orphan_grace_seconds`` > the longest plausible staging write so only
    stale orphans are collected; manifest-backed recovery is unaffected
    (a sealed manifest means the writer is gone or crashed mid-swap).

    - a ``.merge-commit-<id>`` manifest WITHOUT its ``_COMMITTED`` marker
      (crash while staging) is rolled back: manifest and staging deleted,
      store untouched;
    - a manifest WITH ``_COMMITTED`` (crash mid-swap) is rolled FORWARD: the
      per-partition swap replays idempotently from the manifest's
      ``staged_<key>`` / ``empty_<key>`` markers (staged dir present →
      delete-old + rename; absent → already renamed; ``empty`` → delete the
      partition), then staging + manifest are removed;
    - orphan ``.merge-staging-*`` dirs with no manifest (pre-commit crash,
      or a completed swap that crashed on its final cleanup delete) are
      swept.

    Returns the recovered/rolled-back commit ids."""
    fs, HPath = _store_fs(spark, path)
    if not fs.exists(HPath(path)):
        return []
    names = [st.getPath().getName() for st in fs.listStatus(HPath(path))]
    handled: list[str] = []
    for n in names:
        if not n.startswith(".merge-commit-"):
            continue
        mid = n[len(".merge-commit-"):]
        mdir = f"{path}/{n}"
        staging = f"{path}/.merge-staging-{mid}"
        entries = [st.getPath().getName() for st in fs.listStatus(HPath(mdir))]
        if "_COMMITTED" not in entries:
            fs.delete(HPath(mdir), True)
            fs.delete(HPath(staging), True)
            handled.append(mid)
            continue
        for e in entries:
            if e.startswith("staged_"):
                k = e[len("staged_"):]
                src = HPath(f"{staging}/{_GPART}={k}")
                dst = HPath(f"{path}/{_GPART}={k}")
                if fs.exists(src):  # not yet renamed by the crashed merge
                    if fs.exists(dst):
                        fs.delete(dst, True)
                    fs.rename(src, dst)
            elif e.startswith("empty_"):
                k = e[len("empty_"):]
                dst = HPath(f"{path}/{_GPART}={k}")
                if fs.exists(dst):  # merge emptied this partition
                    fs.delete(dst, True)
        fs.delete(HPath(staging), True)
        fs.delete(HPath(mdir), True)
        handled.append(mid)
    import time as _time

    now_ms = _time.time() * 1000
    for st in fs.listStatus(HPath(path)):
        n = st.getPath().getName()
        if n.startswith(".merge-staging-"):
            mid = n[len(".merge-staging-"):]
            if fs.exists(HPath(f"{path}/.merge-commit-{mid}")):
                continue  # handled (or will be) by manifest recovery
            if now_ms - st.getModificationTime() < orphan_grace_seconds * 1000:
                continue  # possibly a live writer's in-flight staging
            fs.delete(HPath(f"{path}/{n}"), True)
    return handled


def _staged_swap(
    spark: SparkSession, path: str, keys: list[str], frame: DataFrame
) -> None:
    """Write ``frame`` (s,p,o,g) gpart-partitioned into a staging dir,
    record a commit manifest, then swap the listed partition dirs in
    (delete old, rename staged; absent staged dir = every row of that
    partition was deleted).

    Commit protocol (closes the partial-swap window): the manifest dir
    ``.merge-commit-<id>`` lists each key's disposition (``staged_<key>`` /
    ``empty_<key>``) and is sealed by a ``_COMMITTED`` marker AFTER the
    staged data is fully written. A crash before ``_COMMITTED`` rolls back
    (store intact); a crash after it — mid-swap, previously a window where
    some partitions were merged and others not — rolls FORWARD on the next
    ``recover_store`` (idempotent replay of the remaining renames). The
    swap itself never mutates a partition it has already completed, so
    replay converges to exactly the merged state."""
    mid, staging, staged = _write_staging(spark, path, frame)
    _commit_and_swap(spark, path, mid, staging, staged, keys)


def _write_staging(
    spark: SparkSession, path: str, frame: DataFrame
) -> tuple[str, str, set[str]]:
    """Write the merged frame gpart-partitioned into a fresh staging dir;
    return (merge id, staging path, staged partition keys from listing)."""
    fs, HPath = _store_fs(spark, path)
    mid = uuid.uuid4().hex
    staging = f"{path}/.merge-staging-{mid}"
    (
        frame.select("s", "p", "o", "g", _gpart().alias(_GPART))
        .write.mode("overwrite").partitionBy(_GPART).parquet(staging)
    )
    staged = {
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(HPath(staging))
        if st.getPath().getName().startswith(f"{_GPART}=")
    }
    return mid, staging, staged


def _commit_and_swap(
    spark: SparkSession,
    path: str,
    mid: str,
    staging: str,
    staged: set[str],
    keys: list[str],
) -> None:
    """Seal the manifest and replay-safely swap the listed partitions (see
    ``_staged_swap``'s protocol docstring)."""
    fs, HPath = _store_fs(spark, path)
    mdir = f"{path}/.merge-commit-{mid}"
    fs.mkdirs(HPath(mdir))
    for k in keys:
        marker = "staged_" if k in staged else "empty_"
        fs.create(HPath(f"{mdir}/{marker}{k}"), True).close()
    fs.create(HPath(f"{mdir}/_COMMITTED"), True).close()
    for k in keys:
        dst = HPath(f"{path}/{_GPART}={k}")
        src = HPath(f"{staging}/{_GPART}={k}")
        if fs.exists(dst):
            fs.delete(dst, True)
        if fs.exists(src):
            fs.rename(src, dst)
    fs.delete(HPath(staging), True)
    fs.delete(HPath(mdir), True)


def _staged_swap_frame(
    spark: SparkSession, path: str, key_frame: DataFrame, frame: DataFrame
) -> list[str]:
    """Big-delta variant of ``_staged_swap``: the touched-key set never
    materializes as a driver list on the DATA path. Swap keys come from
    the staging directory listing (metadata, post-write); partitions the
    delta touched but fully EMPTIED (in ``key_frame`` yet absent from
    staging) are found by a distributed anti-join — only those few land on
    the driver, where they become ``empty_`` manifest markers exactly as
    in the small path. Same manifest/commit/rename protocol, so
    ``recover_store`` replays both paths identically."""
    mid, staging, staged = _write_staging(spark, path, frame)
    spark_keys = key_frame.select(
        F.coalesce(F.col(_GPART), F.lit(_HIVE_NULL)).alias(_GPART)
    )
    staged_df = spark.createDataFrame(
        [(k,) for k in sorted(staged)], f"{_GPART} string"
    )
    empties = [
        r[_GPART]
        for r in spark_keys.join(staged_df, _GPART, "left_anti").collect()
    ]
    keys = sorted(staged) + empties
    _commit_and_swap(spark, path, mid, staging, staged, keys)
    return keys
