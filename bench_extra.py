"""Per-query isolation bench (guide §1.4): times each bench query with BOTH
the frozen bench methodology (.count()) and a noop sink (full-column
materialization), twice each (cold-in-process / warm), and dumps
``.explain("formatted")`` for every query to plans/r06/<name>_<tag>.txt.

Usage:
    SPARK_GRAFT_SF_DIR=... python bench_extra.py [tag] [query ...]

``tag`` defaults to "before". Extra args restrict to those query names.
This file is NOT the driver's bench — bench.py stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

BENCH_QUERIES = [
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from rdf2hk_spark.session import get_spark

    spark = get_spark(app="rdf2hk_spark_bench_extra", cpus=cpus)

    import __spark_entry__ as entry

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    names = [n for n in BENCH_QUERIES if not only or n in only]
    for name in names:
        q = entry.queries()[name]
        spark.sparkContext.setJobDescription(f"{name}: count cold")
        t0 = time.perf_counter()
        df = q(spark, sf_dir)
        n = df.count()
        t_count1 = time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"{name}: count warm")
        t0 = time.perf_counter()
        df2 = q(spark, sf_dir)
        df2.count()
        t_count2 = time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"{name}: noop sink")
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df2._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        out[name] = {
            "rows": n,
            "count_cold": round(t_count1, 3),
            "count_warm": round(t_count2, 3),
            "noop": round(t_noop, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
