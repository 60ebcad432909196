"""``python -m rdf2hk_spark`` — S7/S8 CLI (see cli.py)."""

from rdf2hk_spark.cli import main

main()
