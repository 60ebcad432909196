"""S7/S8 CLI (cli.py vs reference rdf2hk.js / hk2rdf.js): file-to-file
conversions driven through the argparse entry with an injected session."""

import json
import os

import pytest

from rdf2hk_spark import cli

NQ = """\
<http://e/a> <http://p/r> <http://e/b> .
<http://e/a> <http://p/name> "Alpha"@en .
"""

TTL = """\
@prefix ex: <http://e/> .
ex:a ex:knows ex:b .
"""


def read_text_dir(path):
    out = []
    for f in sorted(os.listdir(path)):
        if f.startswith(("_", ".")):
            continue
        with open(os.path.join(path, f), encoding="utf-8") as fh:
            out.extend(line.rstrip("\n") for line in fh if line.strip())
    return out


def test_rdf2hk_nquads_to_parquet_and_back(spark, tmp_path):
    src = tmp_path / "in.nq"
    src.write_text(NQ)
    ents = str(tmp_path / "ents")
    cli.main(
        ["rdf2hk", str(src), ents, "--mime", "application/n-quads",
         "--create-context", "--set-node-context"],
        spark=spark,
    )
    e = spark.read.parquet(ents)
    ids = {r["id"] for r in e.collect()}
    assert "<http://e/a>" in ids and "<http://e/b>" in ids

    out = str(tmp_path / "out.nq")
    cli.main(
        ["hk2rdf", ents, out, "--mime", "application/n-quads"], spark=spark
    )
    lines = set(read_text_dir(out))
    assert "<http://e/a> <http://p/r> <http://e/b> ." in lines
    assert '<http://e/a> <http://p/name> "Alpha"@en .' in lines


def test_rdf2hk_turtle_to_json(spark, tmp_path):
    src = tmp_path / "in.ttl"
    src.write_text(TTL)
    out = tmp_path / "ents.json"
    cli.main(
        ["rdf2hk", str(src), str(out), "--mime", "text/turtle"], spark=spark
    )
    ents = json.loads(out.read_text())
    ids = {e["id"] for e in ents}
    assert "<http://e/a>" in ids and "<http://e/b>" in ids
    assert any(e["type"] == "link" for e in ents)


def test_hk2rdf_rdfxml_sink(spark, tmp_path):
    src = tmp_path / "in.nq"
    src.write_text("<http://e/a> <http://p/r> <http://e/b> .\n")
    ents = str(tmp_path / "ents")
    cli.main(
        ["rdf2hk", str(src), ents, "--mime", "application/n-triples"],
        spark=spark,
    )
    out = tmp_path / "out.rdf"
    cli.main(
        ["hk2rdf", ents, str(out), "--mime", "application/rdf+xml"],
        spark=spark,
    )
    text = out.read_text()
    assert "rdf:RDF" in text and "http://e/a" in text

    # round-trip the XML back through the parser
    from rdf2hk_spark.sources.rdfxml import parse_rdfxml_driver

    rows = parse_rdfxml_driver(text)
    assert ("<http://e/a>", "<http://p/r>", "<http://e/b>") in {
        (s, p, o) for _, s, p, o, _ in rows
    }


def test_unsupported_mime_exits(spark, tmp_path):
    with pytest.raises(SystemExit):
        cli.main(
            ["rdf2hk", "x", "y", "--mime", "application/pdf"], spark=spark
        )


def test_conflicting_parser_plugins_exit(spark, tmp_path):
    # --convert-owl + --convert-time: at most one parser plugin per run —
    # silently preferring one flag would ignore the other with no diagnostic
    src = tmp_path / "in.nq"
    src.write_text("<http://e/a> <http://p/r> <http://e/b> .\n")
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(
            [
                "rdf2hk", str(src), str(tmp_path / "out.json"),
                "--mime", "application/n-quads",
                "--convert-owl", "--convert-time",
            ],
            spark=spark,
        )


def test_pure_roundtrip_cli(spark, tmp_path):
    """S9 purerdf2hkrdf.js: parse -> serialize with DefaultConversionOptions;
    convertHK+compressReification output re-parses to the same entities."""
    src = tmp_path / "in.trig"
    src.write_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:knows ex:b .\n"
        'ex:a ex:name "Alice"@en .\n'
    )
    out = str(tmp_path / "out")
    cli.main(["pure", str(src), out, "--mime", "application/trig"], spark=spark)
    lines = read_text_dir(out)
    assert any("<http://e/a> <http://e/knows> <http://e/b>" in l for l in lines)
    # convertHK reification present (isa typing of the knows connector)
    assert any("hasType" in l or "isa" in l.lower() for l in lines)


def test_hk2rdf_trig_and_turtle_sinks(spark, tmp_path):
    """TriG keeps named graphs as blocks (re-parses with the Turtle reader);
    Turtle flattens graphs into plain triples."""
    src = tmp_path / "in.nq"
    src.write_text(
        "<http://e/a> <http://p/r> <http://e/b> <http://g/1> .\n"
        "<http://e/c> <http://p/r> <http://e/d> .\n"
    )
    ents = str(tmp_path / "ents")
    cli.main(
        ["rdf2hk", str(src), ents, "--mime", "application/n-quads",
         "--create-context", "--set-node-context"],
        spark=spark,
    )
    trig = str(tmp_path / "out.trig")
    cli.main(["hk2rdf", ents, trig, "--mime", "application/trig"], spark=spark)
    text = "\n".join(read_text_dir(trig))
    from rdf2hk_spark.sources.nquads import parse_turtle_driver

    back = {(s, p, o, g) for _, s, p, o, g in parse_turtle_driver(text)}
    assert ("<http://e/a>", "<http://p/r>", "<http://e/b>", "<http://g/1>") in back
    assert any(s == "<http://e/c>" and g == "<hk://id/null>" for s, _, _, g in back)

    ttl = str(tmp_path / "out.ttl")
    cli.main(["hk2rdf", ents, ttl, "--mime", "text/turtle"], spark=spark)
    lines = read_text_dir(ttl)
    assert "<http://e/a> <http://p/r> <http://e/b> ." in lines  # graph dropped
    assert all("{" not in l and l.count(" ") == 3 for l in lines)
