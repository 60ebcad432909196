"""JSON graph source/sink (S3/S6): the reference's JSONGraph is an array of
[s, p, o, g] string 4-tuples (jsongraph.js:40-45); serializeGraph is its
JSON.stringify (graphfactory.js:83-85)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark import constants as C


def read_json_quads(spark: SparkSession, path: str,
                    default_graph: str = C.HK_NULL_URI) -> DataFrame:
    """Read a JSON file of [s,p,o,g] arrays (one array per line, or a
    top-level JSON array) into the quads schema."""
    df = spark.read.json(path, schema="value array<string>")
    if "value" not in df.columns or df.filter(F.col("value").isNotNull()).isEmpty():
        # jsonlines of raw arrays: each line IS the array
        df = spark.read.text(path).select(
            F.from_json("value", "array<string>").alias("value")
        )
    # F.get is null-safe on short arrays (ANSI mode: [i] throws)
    q = df.filter(F.size("value") >= 3).select(
        F.monotonically_increasing_id().alias("stmt_idx"),
        F.get("value", 0).alias("s"),
        F.get("value", 1).alias("p"),
        F.get("value", 2).alias("o"),
        F.coalesce(F.get("value", 3), F.lit(default_graph)).alias("g"),
    )
    return q


def quads_from_tuples(spark: SparkSession, triples: list,
                      default_graph: str = C.HK_NULL_URI) -> DataFrame:
    """new JSONGraph(triples) equivalent: in-memory [s,p,o,g?] tuples."""
    rows = [
        (i, t[0], t[1], t[2], t[3] if len(t) > 3 and t[3] else default_graph)
        for i, t in enumerate(triples)
    ]
    return spark.createDataFrame(
        rows, "stmt_idx long, s string, p string, o string, g string"
    )


def write_json_quads(quads: DataFrame, path: str) -> None:
    """One JSON array per line: ["s","p","o","g"]."""
    quads.select(
        F.to_json(F.array("s", "p", "o", "g")).alias("value")
    ).write.mode("overwrite").text(path)
