"""Scaling-efficiency sweep (north_rule evidence): run the FULL web->KG
pipeline on the same input at two parallelism levels and several input sizes,
so eff(size) = tput(4N) / (4 * tput(N)) can be read as a function of scale.

Usage: python scripts/scaling_sweep.py <n_pages> <cpus> [runs]
Prints one JSON line: {"pages": N, "cpus": C, "sec": S, "pages_per_sec": T}.
Run in a fresh process per configuration (one SparkSession per master).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1])
    cpus = int(sys.argv[2])
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from rdf2hk_spark.session import get_spark
    from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
    from rdf2hk_spark.pipeline import corpus, extract, relations

    spark = get_spark(app="scaling_sweep", cpus=cpus)
    pages = corpus.pages(spark, n_pages).repartition(max(cpus * 4, 64)).cache()
    pages.count()  # input materialized outside the timed region

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        ext = extract.extract_text(pages).select("url", "extracted_text").persist()
        cat = corpus.catalog(spark)
        rels = relations.extract_relations(ext, cat)
        ments = relations.detect_mentions(ext, cat)
        # partition target sized by DATA (≈25k pages ≈ 170k quads per
        # partition), floored at one wave per core: coalesce(cpus) alone
        # creates multi-million-row partitions at sweep sizes (spill)
        quads = relations.relation_quads(rels, ments, distinct=False).coalesce(
            max(cpus, n_pages // 25_000)
        )
        ents = parse_quads(
            quads,
            ParseOptions(
                create_context=True, set_node_context=True,
                assume_distinct_statements=True, property_salt=16,
            ),
        )
        n = ents.count()
        sec = time.perf_counter() - t0
        ents.unpersist()
        ext.unpersist()
        if best is None or sec < best:
            best = sec

    print(json.dumps({
        "pages": n_pages, "cpus": cpus, "sec": round(best, 2),
        "pages_per_sec": round(n_pages / best, 1), "entities": n,
    }))


if __name__ == "__main__":
    main()
