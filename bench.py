"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports derived throughputs (quads/sec for the KG-construction pipeline,
docs/sec for the corpus operators) under "throughput" — these are the numbers
the N-vs-4N scaling-efficiency comparison in BENCH.md uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Load guard: a busy host contaminates the measurement (round-2 driver
    # bench recorded 102.7s under co-running load vs 71.3s clean — VERDICT.md
    # round 2). Record load before/after; flag the run when the host was
    # already busy at start. SPARK_GRAFT_LOAD_MAX overrides the threshold.
    load_before = os.getloadavg()[0]
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", str(max(cpus * 0.25, 4))))
    contended = load_before > load_max
    if contended:
        print(
            f"WARNING: host 1-min loadavg {load_before:.1f} > {load_max:.1f} "
            "at bench start — measurement likely contaminated; rerun on an "
            "idle host (set SPARK_GRAFT_LOAD_MAX to override).",
            file=sys.stderr,
        )

    from rdf2hk_spark.session import get_spark

    spark = get_spark(app="rdf2hk_spark_bench", cpus=cpus)

    import __spark_entry__ as entry

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name: str, fn) -> None:
        t0 = time.perf_counter()
        counts[name] = fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # PRIMARY metric: the full web→KG pipeline (north_star pages/sec) —
    # synthetic page corpus → Arrow HTML→text → mention/relation extraction →
    # quads → HK entities. Page count scales with sf so the job is compute-
    # bound (not overhead-bound) at bench scale.
    from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
    from rdf2hk_spark.pipeline import corpus, extract, relations
    from rdf2hk_spark.sources import tpch_kg

    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES",
                                 str(max(int(float(sf) * 600_000), 2000))))
    # 2 waves per core: measured cold-run optimum (128 partitions at 32 cores
    # paid ~7 s extra python-worker/codegen spin-up on the first execution;
    # warm runs are partition-count-insensitive between 32 and 128)
    pages = corpus.pages(spark, n_pages).repartition(max(cpus * 2, 32)).cache()
    pages.count()

    def web_pipeline():
        # extraction feeds two consumers → persist once (production shape)
        ext = extract.extract_text(pages).select("url", "extracted_text").persist()
        cat = corpus.catalog(spark)
        rels = relations.extract_relations(ext, cat)
        ments = relations.detect_mentions(ext, cat)
        # extractor provably emits distinct quads -> skip the dedup shuffle;
        # coalesce (narrow) to one task wave per core: without the dedup
        # exchange the 15 downstream aggregations would each launch the full
        # 128-partition pipeline (measured: task-wave overhead ate the win)
        quads = relations.relation_quads(rels, ments, distinct=False).coalesce(
            max(cpus, n_pages // 25_000)
        )
        ents = parse_quads(
            quads,
            ParseOptions(
                create_context=True, set_node_context=True,
                assume_distinct_statements=True,  # extractor emits distinct
                property_salt=16,  # hot-entity skew guard
            ),
        )
        n = ents.count()
        ext.unpersist()
        return n

    run("web_kg_pipeline", web_pipeline)

    # KG construction from the TPC-H-derived quad corpus
    quads = tpch_kg.quads_df(spark, sf_dir)
    n_quads = quads.count()

    def kg_full():
        ents = parse_quads(quads, entry.KG_OPTS)
        n = ents.count()
        ents.unpersist()
        return n

    run("kg_construct", kg_full)

    # per-operator headline queries (each self-contained, as the driver runs them)
    for name in (
        "kg_properties",
        "kg_links",
        "doc_minhash",
        "doc_lsh_pairs",
        "doc_simhash",
        "doc_jaccard",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "embed_neardup",
        "doc_dup_clusters",
        "doc_chain_clusters",
        "kg_sparql_path_agg",
        "kg_pagerank",
        "evt_sessions",
        "doc_quality",
        "doc_fingerprint",
        "doc_window_dedup",
        "doc_decontam",
        "doc_line_dedup",
        "doc_tfidf_terms",
    ):
        q = entry.queries()[name]
        run(name, lambda q=q: q(spark, sf_dir).count())

    # throughputs
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    throughput = {
        "pages_per_sec": round(n_pages / timings["web_kg_pipeline"], 1),
        "quads_per_sec": round(n_quads / timings["kg_construct"], 1),
        "docs_per_sec_minhash": round(n_docs / timings["doc_minhash"], 1),
        "cpus": cpus,
        "n_pages": n_pages,
        "n_quads": n_quads,
        "n_docs": n_docs,
    }

    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "counts": counts,
                "throughput": throughput,
                "sf": sf,
                "load": {
                    "loadavg_before": round(load_before, 2),
                    "loadavg_after": round(os.getloadavg()[0], 2),
                    "threshold": load_max,
                    "contended_at_start": contended,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
