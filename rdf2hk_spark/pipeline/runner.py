"""End-to-end KG-construction run: pages → text → mentions/relations → quads →
HK entities → bucketed materialization, with per-stage checkpoints,
per-partition lineage, and metrics (the north_rule's resumability contract).

Each stage writes its output as a parquet snapshot under
``<out>/stage=<name>/`` plus a ``_LINEAGE.json`` sidecar:

  {"stage": ..., "rows": N, "wall_sec": s, "partitions": [{"pid": i, "rows": n}, ...],
   "input_stages": [...], "complete": true}

A re-run with the same ``out`` directory skips every stage whose sidecar says
``complete`` — resume-from-checkpoint is "start at the first incomplete
stage". Materialization is keyed by a salt bucket of the canonical entity id
(md5-derived), so hot entities spread across files and downstream consumers
get a stable bucketing column to co-partition on.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.pipeline import corpus as corpus_mod
from rdf2hk_spark.pipeline import extract, relations
from rdf2hk_spark.ops.hashing import md5_int

STAGES = ["pages", "text", "mentions", "relations", "quads", "entities"]


def _sidecar(out: str, stage: str) -> str:
    return os.path.join(out, f"stage={stage}", "_LINEAGE.json")


def _is_complete(out: str, stage: str) -> bool:
    p = _sidecar(out, stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return bool(json.load(f).get("complete"))
    except (json.JSONDecodeError, OSError):
        return False


def _write_stage(
    df: DataFrame, out: str, stage: str, inputs: list[str],
    partition_cols: list[str] | None = None,
) -> None:
    path = os.path.join(out, f"stage={stage}")
    t0 = time.perf_counter()
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    wall = time.perf_counter() - t0
    back = df.sparkSession.read.parquet(path)
    per_part = (
        back.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    lineage = {
        "stage": stage,
        "rows": sum(r["count"] for r in per_part),
        "wall_sec": round(wall, 3),
        "partitions": [{"pid": r["pid"], "rows": r["count"]} for r in per_part],
        "input_stages": inputs,
        "complete": True,
    }
    with open(_sidecar(out, stage), "w") as f:
        json.dump(lineage, f)


def _read_stage(spark: SparkSession, out: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out, f"stage={stage}"))


def run(
    spark: SparkSession,
    out: str,
    n_pages: int = 1000,
    buckets: int = 32,
    resume: bool = True,
) -> dict:
    """Run (or resume) the full pipeline; returns the stage metrics dict."""
    os.makedirs(out, exist_ok=True)
    metrics: dict[str, float] = {}

    def stage(name: str, build, inputs: list[str], partition_cols=None) -> None:
        if resume and _is_complete(out, name):
            metrics[name] = 0.0  # skipped (checkpoint hit)
            return
        t0 = time.perf_counter()
        _write_stage(build(), out, name, inputs, partition_cols)
        metrics[name] = round(time.perf_counter() - t0, 3)

    stage("pages", lambda: corpus_mod.pages(spark, n_pages), [])

    stage(
        "text",
        lambda: extract.extract_text(_read_stage(spark, out, "pages")).select(
            "url", "warc_ts", "lang", "extracted_text"
        ),
        ["pages"],
    )

    cat = corpus_mod.catalog(spark)

    stage(
        "mentions",
        lambda: relations.detect_mentions(_read_stage(spark, out, "text"), cat),
        ["text"],
    )
    stage(
        "relations",
        lambda: relations.extract_relations(_read_stage(spark, out, "text"), cat),
        ["text"],
    )
    stage(
        "quads",
        lambda: relations.relation_quads(
            _read_stage(spark, out, "relations"),
            _read_stage(spark, out, "mentions"),
        ),
        ["mentions", "relations"],
    )

    def build_entities() -> DataFrame:
        quads = _read_stage(spark, out, "quads")
        ents = parse_quads(
            quads, ParseOptions(create_context=True, set_node_context=True,
                          assume_distinct_statements=True, property_salt=16)
        )
        # salted bucketing on canonical entity id: hot hubs spread over files
        return ents.withColumn("id_bucket", (md5_int(F.col("id")) % buckets).cast("int"))

    stage("entities", build_entities, ["quads"], partition_cols=["id_bucket"])

    return metrics
