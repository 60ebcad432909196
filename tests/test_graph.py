"""ops/graph.py PageRank: fixed-point semantics on known tiny graphs (the
oracle-parity test covers the corpus-scale derivation; these pin the rules)."""

from pyspark.sql import functions as F

from rdf2hk_spark.ops.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def rank_map(df):
    return {r["node"]: r["rank_e4"] for r in df.collect()}


def test_chain_ranks_and_no_inlink_floor(spark):
    # a -> b: a has no in-links -> settles at (1-d)*scale = 1500;
    # b receives a's (shrinking) rank. Hand-computed 3 iterations:
    # r1(b) = round(1500 + .85*10000) = 10000, r2(b) = round(1500+.85*1500)
    # = 2775 (a already at 1500 after iter 1), r3(b) = 2775.
    got = rank_map(pagerank(_edges(spark, [("a", "b")]), iters=3))
    assert got == {"a": 1500, "b": 2775}


def test_cycle_conserves_rank(spark):
    # a <-> b: symmetric 2-cycle is a fixpoint at the initial mass
    got = rank_map(pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=3))
    assert got == {"a": 10000, "b": 10000}


def test_duplicate_edges_collapse_and_outdeg_splits(spark):
    # duplicate statements collapse to one edge (simple graph); a's rank
    # splits across its TWO distinct successors
    pairs = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    got = rank_map(pagerank(_edges(spark, pairs), iters=1))
    # iter 1: c(b) = c(c) = 10000/2; c(a) = 10000 + 10000
    assert got["b"] == got["c"] == round(1500 + 0.85 * 5000)
    assert got["a"] == round(1500 + 0.85 * 20000)


def test_partitioning_invariance(spark):
    # fixed-point re-rounding per iteration makes the result independent of
    # partition count / summation order
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    e1 = _edges(spark, pairs).repartition(1)
    e2 = _edges(spark, pairs).repartition(13)
    assert rank_map(pagerank(e1, iters=3)) == rank_map(pagerank(e2, iters=3))
