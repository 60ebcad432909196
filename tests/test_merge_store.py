"""Engine-executed MERGE on the graph-partitioned parquet store: only the
partitions a delta touches are read or rewritten (sparqlfactory.js:442-673
GRAPH-scoped DELETE/INSERT, realized as a partition-pruned rewrite)."""

import hashlib
import os
import time

import pytest
from pyspark.sql import functions as F

from rdf2hk_spark.operators import update_diff as U

QUAD_SCHEMA = "s string, p string, o string, g string"
DELTA_SCHEMA = "op string, s string, p string, o string, g string"

G1, G2, G3 = "<http://g/1>", "<http://g/2>", "<http://g/3>"


def gpart(g: str) -> str:
    return hashlib.md5(g.encode()).hexdigest()


def part_files(path: str, g: str) -> dict[str, float]:
    d = os.path.join(path, f"gpart={gpart(g)}")
    if not os.path.isdir(d):
        return {}
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    }


@pytest.fixture()
def store(spark, tmp_path):
    path = str(tmp_path / "store")
    rows = [
        ("<http://a>", "<http://p>", "<http://b>", G1),
        ("<http://c>", "<http://p>", "<http://d>", G2),
        ("<http://c>", "<http://q>", '"x"', G2),
        ("<http://e>", "<http://p>", "<http://f>", G3),
    ]
    U.write_quad_store(spark.createDataFrame(rows, QUAD_SCHEMA), path)
    return path


def quadset(df):
    return {(r["s"], r["p"], r["o"], r["g"]) for r in df.collect()}


def test_merge_rewrites_only_touched_partitions(spark, store):
    before_g1 = part_files(store, G1)
    before_g3 = part_files(store, G3)
    assert before_g1 and before_g3

    delta = spark.createDataFrame(
        [
            ("delete", "<http://c>", "<http://q>", '"x"', G2),
            ("insert", "<http://c>", "<http://q>", '"y"', G2),
        ],
        DELTA_SCHEMA,
    )
    keys = U.merge_into_store(spark, store, delta)
    assert keys == [gpart(G2)]

    # untouched partitions: identical files, identical mtimes
    assert part_files(store, G1) == before_g1
    assert part_files(store, G3) == before_g3

    got = quadset(U.read_quad_store(spark, store))
    assert ("<http://c>", "<http://q>", '"y"', G2) in got
    assert ("<http://c>", "<http://q>", '"x"', G2) not in got
    assert ("<http://a>", "<http://p>", "<http://b>", G1) in got
    assert len(got) == 4


def test_merge_scan_is_partition_pruned(spark, store):
    """The touched-partition read carries a PartitionFilters IN-clause —
    untouched directories are pruned at planning time, not filtered at
    runtime."""
    pruned = spark.read.parquet(store).filter(
        F.col("gpart").isin([gpart(G2)])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and gpart(G2) in plan
    files = [
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"gpart={gpart(G2)}" in f for f in files)


def test_sparql_from_prunes_store_partitions(spark, store):
    """Q11 end-to-end THROUGH the SPARQL text surface: run_sparql over
    read_quad_store(with_partition_key=True) turns ``FROM <g>`` into a
    literal gpart predicate — the physical scan prunes to that single
    partition directory and the result matches the graph's rows."""
    from rdf2hk_spark.plans.sparql import run_sparql

    quads = U.read_quad_store(spark, store, with_partition_key=True)
    out = run_sparql(
        quads, f"SELECT ?s ?o FROM {G2} WHERE {{ ?s <http://p> ?o }}"
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("<http://c>", "<http://d>")
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and gpart(G2) in plan
    # the other graphs' keys are nowhere in the plan — their directories
    # are never opened
    assert gpart(G1) not in plan and gpart(G3) not in plan
    # and the files actually read are confined to the FROM graph's dir
    scan = quads.filter(F.col("g") == G2).filter(
        F.col("gpart").isin([gpart(G2)])
    )
    files = [
        r[0] for r in scan.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"gpart={gpart(G2)}" in f for f in files)


def test_sparql_predicate_pushdown_reaches_parquet_scan(spark, store):
    """A ground predicate in a SPARQL pattern over the parquet-backed store
    compiles to a filter Catalyst pushes into the scan (PushedFilters on
    the p column) — the declarative-plan promise, asserted on the physical
    plan rather than taken on faith."""
    from rdf2hk_spark.plans.sparql import run_sparql

    quads = U.read_quad_store(spark, store)
    out = run_sparql(quads, "SELECT ?s ?o WHERE { ?s <http://q> ?o }")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the equality literal must appear inside the pushed-filter list
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(p," in ln and "http://q" in ln for ln in pushed), pushed
    assert sorted(tuple(r) for r in out.collect()) == [("<http://c>", '"x"')]


def test_scope_to_context_prunes_store_partitions(spark, store):
    """Q11 via the filter-dict surface: scope_to_context over the keyed
    store read adds the gpart literal predicate (same pruning as FROM)."""
    from rdf2hk_spark.plans import query as plans_query

    quads = U.read_quad_store(spark, store, with_partition_key=True)
    out = plans_query.scope_to_context(quads, G2)
    assert out.filter(F.col("p") == "<http://p>").count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and gpart(G2) in plan
    assert gpart(G1) not in plan


def test_merge_empties_and_creates_partitions(spark, store):
    delta = spark.createDataFrame(
        [
            # delete EVERY row of g3 → its partition directory must vanish
            ("delete", "<http://e>", "<http://p>", "<http://f>", G3),
            # insert into a graph new to the store → new partition appears
            ("insert", "<http://n>", "<http://p>", "<http://m>", "<http://g/new>"),
        ],
        DELTA_SCHEMA,
    )
    keys = U.merge_into_store(spark, store, delta)
    assert set(keys) == {gpart(G3), gpart("<http://g/new>")}
    assert part_files(store, G3) == {}
    assert part_files(store, "<http://g/new>")
    got = quadset(U.read_quad_store(spark, store))
    assert ("<http://e>", "<http://p>", "<http://f>", G3) not in got
    assert ("<http://n>", "<http://p>", "<http://m>", "<http://g/new>") in got


def test_merge_reparenting_moves_across_partitions(spark, store):
    """update_quads' reparenting rule: a moved entity's quads delete from the
    old graph partition and insert into the new one in ONE merge."""
    delta = spark.createDataFrame(
        [
            ("delete", "<http://a>", "<http://p>", "<http://b>", G1),
            ("insert", "<http://a>", "<http://p>", "<http://b>", G2),
        ],
        DELTA_SCHEMA,
    )
    keys = U.merge_into_store(spark, store, delta)
    assert set(keys) == {gpart(G1), gpart(G2)}
    got = quadset(U.read_quad_store(spark, store))
    assert ("<http://a>", "<http://p>", "<http://b>", G1) not in got
    assert ("<http://a>", "<http://p>", "<http://b>", G2) in got
    # g1 now empty → partition dropped
    assert part_files(store, G1) == {}


def test_empty_delta_is_noop(spark, store):
    before = {g: part_files(store, g) for g in (G1, G2, G3)}
    keys = U.merge_into_store(
        spark, store, spark.createDataFrame([], DELTA_SCHEMA)
    )
    assert keys == []
    assert {g: part_files(store, g) for g in (G1, G2, G3)} == before


def test_compact_store_single_file_per_partition(spark, store):
    # merges/writes leave one file per (task, graph); force a fragmented
    # partition by merging extra rows into g2
    delta = spark.createDataFrame(
        [("insert", f"<http://n/{i}>", "<http://p>", f"<http://m/{i}>", G2)
         for i in range(6)],
        DELTA_SCHEMA,
    )
    U.merge_into_store(spark, store, delta.repartition(4))
    before = quadset(U.read_quad_store(spark, store))
    g1_files = part_files(store, G1)

    keys = U.compact_store(spark, store, keys=[gpart(G2)])
    assert keys == [gpart(G2)]
    # exactly one data file remains in the compacted partition
    assert len(part_files(store, G2)) == 1
    # untouched partition intact, content byte-identical
    assert part_files(store, G1) == g1_files
    assert quadset(U.read_quad_store(spark, store)) == before

    # compact-all discovers every partition
    all_keys = U.compact_store(spark, store)
    assert set(all_keys) >= {gpart(G1), gpart(G2), gpart(G3)}
    assert quadset(U.read_quad_store(spark, store)) == before


def _fake_crashed_merge(spark, store, committed: bool):
    """Stage a modified G2 partition + manifest as a merge that crashed
    right after (committed=True) or before (False) its _COMMITTED marker."""
    mid = "deadbeef"
    staging = os.path.join(store, f".merge-staging-{mid}")
    staged = spark.createDataFrame(
        [("<http://c>", "<http://p>", "<http://NEW>", G2)], QUAD_SCHEMA
    )
    U.write_quad_store(staged, staging)
    mdir = os.path.join(store, f".merge-commit-{mid}")
    os.makedirs(mdir)
    open(os.path.join(mdir, f"staged_{gpart(G2)}"), "w").close()
    open(os.path.join(mdir, f"empty_{gpart(G3)}"), "w").close()
    if committed:
        open(os.path.join(mdir, "_COMMITTED"), "w").close()
    return mid


def test_recover_rolls_forward_committed_swap(spark, store):
    """Crash AFTER the _COMMITTED marker, before any rename: the next
    recover_store completes the swap — G2 gets the staged content, the
    manifest's empty_G3 partition is dropped, staging+manifest are gone."""
    mid = _fake_crashed_merge(spark, store, committed=True)
    assert U.recover_store(spark, store) == [mid]
    got = quadset(U.read_quad_store(spark, store))
    assert ("<http://c>", "<http://p>", "<http://NEW>", G2) in got
    assert not any(g == G2 and o != "<http://NEW>" for _, _, o, g in got)
    assert not any(g == G3 for *_, g in got)  # emptied partition deleted
    assert ("<http://a>", "<http://p>", "<http://b>", G1) in got  # untouched
    leftovers = [n for n in os.listdir(store) if n.startswith(".merge-")]
    assert leftovers == []
    # second recovery is a no-op (idempotent replay)
    assert U.recover_store(spark, store) == []


def test_recover_rolls_back_uncommitted_staging(spark, store):
    """Crash BEFORE _COMMITTED: staging + manifest are swept, the store is
    byte-untouched (same files, same mtimes)."""
    before = {g: part_files(store, g) for g in (G1, G2, G3)}
    _fake_crashed_merge(spark, store, committed=False)
    # orphan staging with no manifest at all is swept too
    os.makedirs(os.path.join(store, ".merge-staging-0rphan"))
    U.recover_store(spark, store)
    assert {g: part_files(store, g) for g in (G1, G2, G3)} == before
    leftovers = [n for n in os.listdir(store) if n.startswith(".merge-")]
    assert leftovers == []


def test_recover_orphan_grace_spares_fresh_staging(spark, store):
    """An out-of-band maintenance recover with a grace window must NOT sweep
    a freshly-written manifest-less staging dir (possibly a live writer);
    with no grace it is collected as crash garbage."""
    staging = os.path.join(store, ".merge-staging-fresh1")
    os.makedirs(staging)
    U.recover_store(spark, store, orphan_grace_seconds=3600)
    assert os.path.isdir(staging)  # spared: younger than the grace window
    U.recover_store(spark, store)  # single-writer context: swept
    assert not os.path.isdir(staging)


def test_merge_runs_recovery_first(spark, store):
    """A crashed committed merge is completed by the NEXT merge before it
    applies its own delta — no lost update, no duplicate."""
    _fake_crashed_merge(spark, store, committed=True)
    delta = spark.createDataFrame(
        [("insert", "<http://new>", "<http://p>", "<http://x>", G1)],
        DELTA_SCHEMA,
    )
    U.merge_into_store(spark, store, delta)
    got = quadset(U.read_quad_store(spark, store))
    assert ("<http://c>", "<http://p>", "<http://NEW>", G2) in got
    assert ("<http://new>", "<http://p>", "<http://x>", G1) in got


def test_null_graph_partition_survives_merge_and_compaction(spark, tmp_path):
    """g=NULL rows land in the __HIVE_DEFAULT_PARTITION__ directory; the
    pruning filter must select them via isNull(), not string equality —
    otherwise a routine compaction or merge silently deletes them."""
    path = str(tmp_path / "nstore")
    rows = [
        ("<http://a>", "<http://p>", "<http://b>", None),
        ("<http://c>", "<http://p>", "<http://d>", G1),
    ]
    U.write_quad_store(spark.createDataFrame(rows, QUAD_SCHEMA), path)
    before = quadset(U.read_quad_store(spark, path))
    assert ("<http://a>", "<http://p>", "<http://b>", None) in before

    # compaction across all partitions keeps the null-graph rows
    U.compact_store(spark, path)
    assert quadset(U.read_quad_store(spark, path)) == before

    # a merge touching the null graph reads and rewrites it correctly
    delta = spark.createDataFrame(
        [("insert", "<http://e>", "<http://p>", "<http://f>", None)],
        DELTA_SCHEMA,
    )
    keys = U.merge_into_store(spark, path, delta)
    assert keys == [U._HIVE_NULL]
    got = quadset(U.read_quad_store(spark, path))
    assert ("<http://a>", "<http://p>", "<http://b>", None) in got
    assert ("<http://e>", "<http://p>", "<http://f>", None) in got

    # compaction of a path that does not exist is a no-op
    assert U.compact_store(spark, str(tmp_path / "missing")) == []


def test_inband_merge_spares_fresh_orphan_staging(spark, store):
    """ADVICE r4: the recover_store call at the start of a merge must NOT
    sweep a freshly-written manifest-less staging dir (possibly a second
    writer's in-flight write) — only stale orphans older than the in-band
    grace window are crash garbage."""
    staging = os.path.join(store, ".merge-staging-live-writer")
    os.makedirs(staging)
    delta = spark.createDataFrame(
        [("insert", "<http://new>", "<http://p>", "<http://x>", G1)],
        DELTA_SCHEMA,
    )
    U.merge_into_store(spark, store, delta)
    assert os.path.isdir(staging)  # spared by INBAND_ORPHAN_GRACE_SECONDS
    # the merge itself still applied
    got = U.read_quad_store(spark, store).filter(
        F.col("s") == "<http://new>"
    ).count()
    assert got == 1
    # an aged-out orphan IS swept by the next in-band call: backdate it
    old = time.time() - 2 * U.INBAND_ORPHAN_GRACE_SECONDS
    os.utime(staging, (old, old))
    U.merge_into_store(spark, store, delta)
    assert not os.path.isdir(staging)


def test_big_delta_semi_join_path_matches_small_path(spark, store, monkeypatch):
    """Round-5 ask: past COLLECT_KEYS_MAX touched graphs the merge must not
    collect the key list for the data path — it semi-joins the store read
    against the delta's key frame and derives swap keys from the staging
    listing. Forced low threshold; results must be identical to the
    literal-pruned small path, including an EMPTIED partition (all-delete
    delta for one graph) and a brand-new graph."""
    monkeypatch.setattr(U, "COLLECT_KEYS_MAX", 10)
    graphs = [f"<http://many/g{i}>" for i in range(40)]
    base = spark.createDataFrame(
        [(f"<http://s/{i}>", "<http://p>", f"<http://o/{i}>", g)
         for i, g in enumerate(graphs)],
        "s string, p string, o string, g string",
    )
    U.write_quad_store(base, store + "-big", mode="overwrite")
    delta_rows = (
        # update half the graphs
        [("delete", f"<http://s/{i}>", "<http://p>", f"<http://o/{i}>",
          graphs[i]) for i in range(0, 40, 2)]
        + [("insert", f"<http://s/{i}>", "<http://p>", f"<http://o/{i}-v2>",
            graphs[i]) for i in range(0, 40, 2)]
        # EMPTY one graph entirely
        + [("delete", "<http://s/1>", "<http://p>", "<http://o/1>",
            graphs[1])]
        # and create a brand-new graph
        + [("insert", "<http://s/new>", "<http://p>", "<http://o/new>",
            "<http://many/new>")]
    )
    delta = spark.createDataFrame(delta_rows, DELTA_SCHEMA)
    keys = U.merge_into_store(spark, store + "-big", delta)
    assert len(keys) == 22  # 20 updated + 1 emptied + 1 new
    got = {
        (r["s"], r["o"], r["g"])
        for r in U.read_quad_store(spark, store + "-big").collect()
    }
    expect = set()
    for i, g in enumerate(graphs):
        if i == 1:
            continue  # emptied
        o = f"<http://o/{i}-v2>" if i % 2 == 0 else f"<http://o/{i}>"
        expect.add((f"<http://s/{i}>", o, g))
    expect.add(("<http://s/new>", "<http://o/new>", "<http://many/new>"))
    assert got == expect
    # the emptied graph's partition directory is gone
    assert not os.path.isdir(
        os.path.join(store + "-big", f"gpart={U.gpart_key(graphs[1])}")
    )
    # upsert over the same threshold also takes the big path and stays
    # idempotent
    up = spark.createDataFrame(
        [(f"<http://s/{i}>", "<http://p>", f"<http://o/{i}-v2>", graphs[i])
         for i in range(0, 40, 2)],
        "s string, p string, o string, g string",
    )
    k1 = U.upsert_into_store(spark, store + "-big", up)
    assert sorted(k1) == sorted({U.gpart_key(graphs[i]) for i in range(0, 40, 2)})
    got2 = {
        (r["s"], r["o"], r["g"])
        for r in U.read_quad_store(spark, store + "-big").collect()
    }
    assert got2 == expect  # set-union idempotent, nothing duplicated
