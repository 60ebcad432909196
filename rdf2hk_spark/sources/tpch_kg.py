"""Deterministic RDF quad corpus derived from the driver's TPC-H-ish testdata.

Purpose: give every KG-construction operator a DuckDB-checkable oracle. The
same quads are constructible in Spark (here) and in portable SQL (the oracle
strings in __spark_entry__), so parse-pipeline outputs (connectors, contexts,
nodes, links, properties, references) can be compared value-exactly against an
independent SQL re-derivation at sf=0.01.

Layout (stmt_idx blocks are deterministic arithmetic on the table keys, so the
corpus is order-independent of how parquet happens to be read):

  block 0      — nation:   inRegion (facts), rdf:type (hierarchy),
                           rdfs:label "name"@en, key "k"^^xsd:integer;  g=default
  block 10k    — region:   rdf:type, rdfs:label "name" (plain);        g=default
  block 20k    — supplier: fromNation + name in graph <urn:hk:g/suppliers>
  block 100k   — customer: inNation in per-segment graph
                           + name literal in graph <urn:hk:g/names>
                           (a DIFFERENT graph ⇒ exercises Reference minting, A6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark import constants as C

G_DEFAULT = C.HK_NULL_URI
G_SUPPLIERS = "<urn:hk:g/suppliers>"
G_NAMES = "<urn:hk:g/names>"
P_IN_REGION = "<urn:hk:p/inRegion>"
P_FROM_NATION = "<urn:hk:p/fromNation>"
P_IN_NATION = "<urn:hk:p/inNation>"
P_NAME = "<urn:hk:p/name>"
P_KEY = "<urn:hk:p/key>"
RDF_TYPE = C.RDF_TYPE_URI
RDFS_LABEL = C.RDFS_LABEL_URI
CLASS_NATION = "<urn:hk:class/Nation>"
CLASS_REGION = "<urn:hk:class/Region>"
XSD_INT = C.XSD_INTEGER_URI


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def quads_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus as a quads DataFrame (stmt_idx, s, p, o, g).

    One parquet scan per table; each row explodes into its statements (no
    union-of-scans — a single narrow pass, the shape a 100 TB extractor
    emits)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")

    def uri(prefix: str, key) -> F.Column:
        return F.concat(F.lit(f"<urn:hk:{prefix}/"), key.cast("string"), F.lit(">"))

    def stmt(idx, p: str, o, g) -> F.Column:
        return F.struct(
            idx.cast("long").alias("stmt_idx"), F.lit(p).alias("p"),
            o.alias("o"), (g if not isinstance(g, str) else F.lit(g)).alias("g"),
        )

    def explode_stmts(df: DataFrame, s, stmts: list[F.Column]) -> DataFrame:
        return df.select(s.alias("s"), F.explode(F.array(*stmts)).alias("x")).select(
            "x.stmt_idx", "s", "x.p", "x.o", "x.g"
        )

    nb = F.col("n_nationkey").cast("long") * 4
    nation_quads = explode_stmts(
        nation, uri("nation", F.col("n_nationkey")),
        [
            stmt(nb, P_IN_REGION, uri("region", F.col("n_regionkey")), G_DEFAULT),
            stmt(nb + 1, RDF_TYPE, F.lit(CLASS_NATION), G_DEFAULT),
            stmt(nb + 2, RDFS_LABEL,
                 F.concat(F.lit('"'), F.col("n_name"), F.lit('"@en')), G_DEFAULT),
            stmt(nb + 3, P_KEY,
                 F.concat(F.lit('"'), F.col("n_nationkey").cast("string"),
                          F.lit('"^^'), F.lit(XSD_INT)), G_DEFAULT),
        ],
    )

    rb = F.col("r_regionkey").cast("long") * 2 + 10_000
    region_quads = explode_stmts(
        region, uri("region", F.col("r_regionkey")),
        [
            stmt(rb, RDF_TYPE, F.lit(CLASS_REGION), G_DEFAULT),
            stmt(rb + 1, RDFS_LABEL,
                 F.concat(F.lit('"'), F.col("r_name"), F.lit('"')), G_DEFAULT),
        ],
    )

    sb = F.col("s_suppkey").cast("long") * 2 + 20_000
    supplier_quads = explode_stmts(
        supplier, uri("supplier", F.col("s_suppkey")),
        [
            stmt(sb, P_FROM_NATION, uri("nation", F.col("s_nationkey")), G_SUPPLIERS),
            stmt(sb + 1, P_NAME,
                 F.concat(F.lit('"'), F.col("s_name"), F.lit('"')), G_SUPPLIERS),
        ],
    )

    cb = F.col("c_custkey").cast("long") * 2 + 100_000
    customer_quads = explode_stmts(
        customer, uri("customer", F.col("c_custkey")),
        [
            stmt(cb, P_IN_NATION, uri("nation", F.col("c_nationkey")),
                 F.concat(F.lit("<urn:hk:g/seg/"), F.col("c_mktsegment"), F.lit(">"))),
            stmt(cb + 1, P_NAME,
                 F.concat(F.lit('"'), F.col("c_name"), F.lit('"')), G_NAMES),
        ],
    )

    return (
        nation_quads.unionByName(region_quads)
        .unionByName(supplier_quads)
        .unionByName(customer_quads)
    )


# The same corpus in portable SQL (runs on DuckDB; parquet views pre-registered
# by the driver as region/nation/customer/supplier). Kept as one CTE string so
# every oracle query below shares it.
QUADS_CTE = """
quads AS (
  SELECT n_nationkey::BIGINT * 4 AS stmt_idx,
         '<urn:hk:nation/' || n_nationkey || '>' AS s,
         '<urn:hk:p/inRegion>' AS p,
         '<urn:hk:region/' || n_regionkey || '>' AS o,
         '<hk://id/null>' AS g
  FROM nation
  UNION ALL
  SELECT n_nationkey::BIGINT * 4 + 1,
         '<urn:hk:nation/' || n_nationkey || '>',
         '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>',
         '<urn:hk:class/Nation>', '<hk://id/null>'
  FROM nation
  UNION ALL
  SELECT n_nationkey::BIGINT * 4 + 2,
         '<urn:hk:nation/' || n_nationkey || '>',
         '<http://www.w3.org/2000/01/rdf-schema#label>',
         '"' || n_name || '"@en', '<hk://id/null>'
  FROM nation
  UNION ALL
  SELECT n_nationkey::BIGINT * 4 + 3,
         '<urn:hk:nation/' || n_nationkey || '>',
         '<urn:hk:p/key>',
         '"' || n_nationkey || '"^^<http://www.w3.org/2001/XMLSchema#integer>',
         '<hk://id/null>'
  FROM nation
  UNION ALL
  SELECT r_regionkey::BIGINT * 2 + 10000,
         '<urn:hk:region/' || r_regionkey || '>',
         '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>',
         '<urn:hk:class/Region>', '<hk://id/null>'
  FROM region
  UNION ALL
  SELECT r_regionkey::BIGINT * 2 + 10001,
         '<urn:hk:region/' || r_regionkey || '>',
         '<http://www.w3.org/2000/01/rdf-schema#label>',
         '"' || r_name || '"', '<hk://id/null>'
  FROM region
  UNION ALL
  SELECT s_suppkey::BIGINT * 2 + 20000,
         '<urn:hk:supplier/' || s_suppkey || '>',
         '<urn:hk:p/fromNation>',
         '<urn:hk:nation/' || s_nationkey || '>', '<urn:hk:g/suppliers>'
  FROM supplier
  UNION ALL
  SELECT s_suppkey::BIGINT * 2 + 20001,
         '<urn:hk:supplier/' || s_suppkey || '>',
         '<urn:hk:p/name>',
         '"' || s_name || '"', '<urn:hk:g/suppliers>'
  FROM supplier
  UNION ALL
  SELECT c_custkey::BIGINT * 2 + 100000,
         '<urn:hk:customer/' || c_custkey || '>',
         '<urn:hk:p/inNation>',
         '<urn:hk:nation/' || c_nationkey || '>',
         '<urn:hk:g/seg/' || c_mktsegment || '>'
  FROM customer
  UNION ALL
  SELECT c_custkey::BIGINT * 2 + 100001,
         '<urn:hk:customer/' || c_custkey || '>',
         '<urn:hk:p/name>',
         '"' || c_name || '"', '<urn:hk:g/names>'
  FROM customer
)
"""

# encodeURIComponent over the corpus's character set ('<','>',':','/', alnum):
# nested replaces, identical bytes to the engine's url_encode-based codec.
ESC = (
    "replace(replace(replace(replace({x}, '<', '%3C'), '>', '%3E'),"
    " ':', '%3A'), '/', '%2F')"
)
