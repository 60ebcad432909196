"""S7/S8 CLI entries (reference rdf2hk.js:19-63, hk2rdf.js:30-91):

  python -m rdf2hk_spark.cli rdf2hk  <input> <output> [--mime TYPE] [opts]
  python -m rdf2hk_spark.cli hk2rdf  <entities-parquet> <output> [--mime TYPE] [opts]

``rdf2hk`` parses an RDF document into HK entities: the reference prints the
entity JSON or writes it to a file; here the output is a parquet entities
table (the distributed-native form) unless the output path ends in ``.json``,
in which case the entities are collected and dumped as a JSON array —
fixture-scale only, exactly like the reference's single-process CLI.

``hk2rdf`` serializes an entities parquet back to RDF. N-Quads writes
distributed (``write_nquads``); TriG writes named graphs as
single-statement blocks (``write_trig`` — splittable, shuffle-free);
Turtle/N-Triples output FLATTENS graphs (valid Turtle; the reference's
RDF/XML sink flattens the same way); RDF/XML is a driver-side sink (the
format is not splittable — mirrored restriction from sources/rdfxml.py);
``application/json`` writes [s,p,o,g] JSON lines.

Mime-type names follow the reference's SUPPORTED_MIME_TYPES sets.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession

QUAD_SCHEMA = "stmt_idx long, s string, p string, o string, g string"

PARSE_MIMES = {
    "application/n-quads": "nquads",
    "application/n-triples": "nquads",
    "text/turtle": "turtle",
    "application/turtle": "turtle",
    "application/trig": "turtle",
    "application/rdf+xml": "rdfxml",
    "application/json": "json",
}
SERIALIZE_MIMES = {
    "application/n-quads": "nquads",
    "application/n-triples": "ntriples",  # graphs flattened (valid Turtle too)
    "text/turtle": "ntriples",
    "application/turtle": "ntriples",
    "application/trig": "trig",  # named graphs as single-statement blocks
    "application/rdf+xml": "rdfxml",
    "application/json": "json",
}


def _read_quads(spark: SparkSession, path: str, mime: str) -> DataFrame:
    from rdf2hk_spark.sources import jsongraph, nquads, rdfxml

    kind = PARSE_MIMES.get(mime)
    if kind is None:
        raise SystemExit(
            f'Mimetype "{mime}" not supported for parsing '
            f"(supported: {sorted(PARSE_MIMES)})"
        )
    if kind == "nquads":
        return nquads.read_nquads(spark, path)
    if kind == "turtle":
        with open(path, encoding="utf-8") as f:
            rows = nquads.parse_turtle_driver(f.read())
        return spark.createDataFrame(rows, QUAD_SCHEMA)
    if kind == "rdfxml":
        with open(path, encoding="utf-8") as f:
            rows = rdfxml.parse_rdfxml_driver(f.read())
        return spark.createDataFrame(rows, QUAD_SCHEMA)
    return jsongraph.read_json_quads(spark, path)


def _parse(quads: DataFrame, args: argparse.Namespace) -> DataFrame:
    from rdf2hk_spark.operators.parse import ParseOptions, parse_quads

    opts = ParseOptions(
        create_context=args.create_context,
        set_node_context=args.set_node_context,
        convert_hk=args.convert_hk,
        text_literal_as_node=args.text_literal_as_node,
    )
    if args.convert_owl and args.convert_time:
        # the reference CLIs wire exactly one parser plugin per invocation
        # (rdf2hk.js options are mutually exclusive); silently preferring one
        # flag would ignore the other with no diagnostic
        raise SystemExit(
            "--convert-owl and --convert-time are mutually exclusive; "
            "pass at most one parser plugin"
        )
    if args.convert_owl:
        from rdf2hk_spark.operators.owl import parse_with_simple_owl

        return parse_with_simple_owl(quads, opts)
    if args.convert_time:
        from rdf2hk_spark.operators.owltime import parse_with_owl_time

        return parse_with_owl_time(quads, opts)
    return parse_quads(quads, opts)


def cmd_rdf2hk(args: argparse.Namespace, spark: SparkSession) -> None:
    quads = _read_quads(spark, args.input, args.mime)
    ents = _parse(quads, args)
    if args.output == "-" or args.output.endswith(".json"):
        rows = [r.asDict(recursive=True) for r in ents.collect()]
        text = json.dumps(rows, indent=1, sort_keys=True)
        if args.output == "-":
            print(text)
        else:
            with open(args.output, "w", encoding="utf-8") as f:
                f.write(text)
    else:
        ents.write.mode("overwrite").parquet(args.output)


def cmd_hk2rdf(args: argparse.Namespace, spark: SparkSession) -> None:
    from rdf2hk_spark.operators.serialize import (
        SerializeOptions, serialize_entities,
    )
    from rdf2hk_spark.sources import jsongraph, nquads, rdfxml

    kind = SERIALIZE_MIMES.get(args.mime)
    if kind is None:
        raise SystemExit(
            f'Mimetype "{args.mime}" not supported for serialization '
            f"(supported: {sorted(SERIALIZE_MIMES)})"
        )
    ents = spark.read.parquet(args.input)
    opts = SerializeOptions(
        convert_hk=args.convert_hk,
        compress_reification=args.compress_reification,
        convert_owl=args.convert_owl,
        convert_number=args.convert_number,
    )
    rdf = serialize_entities(ents, opts)
    if kind == "nquads":
        nquads.write_nquads(rdf, args.output)
    elif kind == "ntriples":
        nquads.to_ntriples_lines(rdf).write.mode("overwrite").text(args.output)
    elif kind == "trig":
        nquads.write_trig(rdf, args.output)
    elif kind == "json":
        jsongraph.write_json_quads(rdf, args.output)
    else:  # rdfxml — driver-side sink, fixture-scale (format not splittable)
        quads = [
            (r["s"], r["p"], r["o"], r["g"])
            for r in rdf.select("s", "p", "o", "g").collect()
        ]
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(rdfxml.to_rdfxml(quads))


def cmd_pure(args: argparse.Namespace, spark: SparkSession) -> None:
    """S9 (purerdf2hkrdf.js:36-89): parse → serialize in one run using the
    reference's DefaultConversionOptions (purerdf2hkrdf.js:21-34) — the
    canonical round-trip option set (createContext, setNodeContext,
    convertHK, convertNumber, compressReification, skipRefNodes,
    inverseRefNode, reifyArray=false)."""
    from rdf2hk_spark import constants as C
    from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
    from rdf2hk_spark.operators.serialize import (
        SerializeOptions, serialize_entities,
    )
    from rdf2hk_spark.sources import nquads

    quads = _read_quads(spark, args.input, args.mime)
    ents = parse_quads(
        quads,
        ParseOptions(create_context=True, set_node_context=True, convert_hk=True),
    )
    rdf = serialize_entities(
        ents,
        SerializeOptions(
            convert_hk=True, convert_number=True, compress_reification=True,
            skip_ref_nodes=True, inverse_ref_node=True, reify_array=False,
            default_graph=C.HK_NULL_URI,
        ),
    )
    # the reference's pure CLI emits application/trig (purerdf2hkrdf.js:73)
    nquads.write_trig(rdf, args.output)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rdf2hk_spark")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("rdf2hk", help="RDF document -> HK entities")
    r.add_argument("input")
    r.add_argument("output", help="parquet dir, *.json file, or - for stdout")
    r.add_argument("--mime", default="text/turtle")
    r.add_argument("--create-context", action="store_true")
    r.add_argument("--set-node-context", action="store_true")
    r.add_argument("--convert-hk", action="store_true")
    r.add_argument("--convert-owl", action="store_true")
    r.add_argument("--convert-time", action="store_true")
    r.add_argument("--text-literal-as-node", action="store_true")
    r.set_defaults(fn=cmd_rdf2hk)

    h = sub.add_parser("hk2rdf", help="HK entities parquet -> RDF document")
    h.add_argument("input")
    h.add_argument("output")
    h.add_argument("--mime", default="application/n-quads")
    h.add_argument("--convert-hk", action="store_true")
    h.add_argument("--compress-reification", action="store_true")
    h.add_argument("--convert-owl", action="store_true")
    h.add_argument("--convert-number", action="store_true")
    h.set_defaults(fn=cmd_hk2rdf)

    u = sub.add_parser(
        "pure",
        help="RDF -> HK -> RDF round-trip with DefaultConversionOptions",
    )
    u.add_argument("input")
    u.add_argument("output", help="output directory (TriG lines)")
    u.add_argument("--mime", default="application/trig")
    u.set_defaults(fn=cmd_pure)
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> None:
    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    if spark is None:
        from rdf2hk_spark.session import get_spark

        spark = get_spark(app="rdf2hk_spark_cli")
    args.fn(args, spark)


if __name__ == "__main__":
    main()
