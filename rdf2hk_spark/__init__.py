"""rdf2hk_spark — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the conversion semantics of ibm-hyperknowledge/rdf2hk (a
single-process Node.js RDF↔Hyperknowledge converter, reference at
/root/reference) as distributed Spark DataFrame dataflow:

- ``functions.terms``   — the term kernel: string-encoded RDF term codecs and
  deterministic id minting as pure Column expressions (reference utils.js).
- ``operators.parse``   — RDF quads DataFrame → HK entities DataFrame
  (reference parser.js three-pass pipeline).
- ``operators.serialize`` — HK entities DataFrame → RDF quads DataFrame
  (reference serializer.js / hkserializer.js).
- ``pipeline``          — the web-scale upstream: HTML→text extraction,
  mention detection, relation extraction, entity linking (Arrow-vectorized).
- ``ops``               — training-data-pipeline operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), similarity search, text analysis.
- ``sources``           — N-Quads/JSON quad codecs and the synthetic
  Common-Crawl-style page-corpus generator.

Everything is DataFrame-first: ids are ``F.md5`` column expressions, ordering
semantics ride on an explicit ``stmt_idx`` column, and the only Python that
touches row data is Arrow-batched (pandas UDFs / mapInPandas).
"""

__version__ = "0.1.0"
