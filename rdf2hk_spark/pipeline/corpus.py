"""Deterministic synthetic Common-Crawl-style web corpus.

Matches BASELINE.json's input_hint table shape exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).

Built entirely with column expressions over ``spark.range`` — no Python row
loops, no external data, seed-stable across runs and parallelism levels. Every
page embeds KNOWN entity mentions and relation patterns so the extraction
stages have computable ground truth, and a configurable set of HUB entities
appears in a large fraction of pages (the skew the north_rule requires salted
aggregation / AQE skew handling for).

Page text layout (the byte-identical extraction target)::

    {Person} Biography\n{Person} was born in {City}. {Person} works for
    {Org}. {Person} knows {OtherPerson}. {filler sentence}

HTML wraps it in <html><head><title>…</title></head><body><h1>…</h1>
<p>…</p></body></html> with entity names additionally wrapped in <b> tags —
so extraction genuinely has to strip markup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark.ops.hashing import md5_int

# deterministic entity catalog (ids are Wikidata-style; names synthetic)
FIRST = ["Ana", "Bruno", "Carla", "Diego", "Elisa", "Fabio", "Gina", "Hugo",
         "Iris", "Jonas", "Karla", "Liam", "Marta", "Nuno", "Olga", "Paulo"]
LAST = ["Silva", "Souza", "Costa", "Oliveira", "Pereira", "Almeida", "Rocha",
        "Santos", "Lima", "Gomes", "Ribeiro", "Martins"]
CITIES = ["Juiz de Fora", "Porto Alegre", "Belo Horizonte", "Sao Paulo",
          "Recife", "Salvador", "Curitiba", "Manaus"]
ORGS = ["Acme Corp", "Globex", "Initech", "Umbrella Group", "Stark Labs",
        "Wayne Industries", "Hooli", "Pied Piper"]
FILLERS = [
    "The weather was pleasant that season.",
    "Local records confirm these details.",
    "Archives from the period are extensive.",
    "Historians continue to study this era.",
]

N_PEOPLE = len(FIRST) * len(LAST)  # 192


def person_name(i: int) -> str:
    return f"{FIRST[i % len(FIRST)]} {LAST[(i // len(FIRST)) % len(LAST)]}"


def person_id(i: int) -> str:
    return f"<http://kb.example/person/P{i}>"


def city_id(i: int) -> str:
    return f"<http://kb.example/city/C{i}>"


def org_id(i: int) -> str:
    return f"<http://kb.example/org/O{i}>"


# relation predicates emitted by the extractor
P_BORN_IN = "<http://kb.example/p/bornIn>"
P_WORKS_FOR = "<http://kb.example/p/worksFor>"
P_KNOWS = "<http://kb.example/p/knows>"
RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"


def catalog(spark: SparkSession) -> DataFrame:
    """(surface, entity_id, kind) dictionary for mention detection/linking."""
    rows = (
        [(person_name(i), person_id(i), "person") for i in range(N_PEOPLE)]
        + [(c, city_id(i), "city") for i, c in enumerate(CITIES)]
        + [(o, org_id(i), "org") for i, o in enumerate(ORGS)]
    )
    return spark.createDataFrame(rows, "surface string, entity_id string, kind string")


def pages(spark: SparkSession, n_pages: int, n_sites: int = 20,
          hub_fraction: int = 4) -> DataFrame:
    """The corpus: 1 biography page per i ∈ [0, n_pages).

    Deterministic choices are md5-hash functions of i (portable, seed-stable).
    Every ``hub_fraction``-th page's KNOWS target is person 0 and its org is
    org 0 — the hot entities.
    """
    df = spark.range(n_pages).withColumnRenamed("id", "i")
    h = lambda tag: md5_int(F.concat(F.lit(tag + ":"), F.col("i").cast("string")))

    pid = (h("p") % N_PEOPLE).alias("pid")
    df = df.withColumn("pid", pid)
    df = df.withColumn("cid", (h("c") % len(CITIES)))
    df = df.withColumn(
        "oid",
        F.when(F.col("i") % hub_fraction == 0, F.lit(0)).otherwise(h("o") % len(ORGS)),
    )
    df = df.withColumn(
        "kid",
        F.when(F.col("i") % hub_fraction == 0, F.lit(0)).otherwise(h("k") % N_PEOPLE),
    )
    df = df.withColumn("fid", h("f") % len(FILLERS))
    df = df.withColumn(
        "lang", F.when(F.col("i") % 11 == 0, F.lit("pt")).otherwise(F.lit("en"))
    )

    def pick(arr: list[str], idx) -> F.Column:
        return F.element_at(F.array(*[F.lit(x) for x in arr]), idx.cast("int") + 1)

    first = pick(FIRST, F.col("pid") % len(FIRST))
    last = pick(LAST, (F.col("pid") / len(FIRST)).cast("int") % len(LAST))
    person = F.concat(first, F.lit(" "), last)
    kfirst = pick(FIRST, F.col("kid") % len(FIRST))
    klast = pick(LAST, (F.col("kid") / len(FIRST)).cast("int") % len(LAST))
    knows = F.concat(kfirst, F.lit(" "), klast)
    city = pick(CITIES, F.col("cid"))
    org = pick(ORGS, F.col("oid"))
    filler = pick(FILLERS, F.col("fid"))

    title = F.concat(person, F.lit(" Biography"))
    text = F.concat(
        title, F.lit("\n"),
        person, F.lit(" was born in "), city, F.lit(". "),
        person, F.lit(" works for "), org, F.lit(". "),
        person, F.lit(" knows "), knows, F.lit(". "),
        filler,
    )
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title><meta charset=\"utf-8\"></head><body><h1>"), title,
        F.lit("</h1><p><b>"), person, F.lit("</b> was born in <b>"), city,
        F.lit("</b>. <b>"), person, F.lit("</b> works for <b>"), org,
        F.lit("</b>. <b>"), person, F.lit("</b> knows <b>"), knows,
        F.lit("</b>. "), filler, F.lit("</p></body></html>"),
    )

    return df.select(
        F.concat(
            F.lit("https://site"), (F.col("i") % n_sites).cast("string"),
            F.lit(".example/page/"), F.col("i").cast("string"),
        ).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("i").cast("double"))).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
        "lang",
        F.col("i").alias("page_id"),
        F.col("pid"), F.col("cid"), F.col("oid"), F.col("kid"),
    )


def ground_truth_triples(pages_df: DataFrame) -> DataFrame:
    """The relations each page provably contains: (s, p, o, g=url-context) —
    what a perfect extractor emits; used for P/R scoring."""
    g = F.concat(F.lit("<ctx:"), F.col("url"), F.lit(">"))

    def ent(prefix: str, col: str) -> F.Column:
        return F.concat(F.lit(f"<http://kb.example/{prefix}/"), F.col(col).cast("string"), F.lit(">"))

    person = F.concat(F.lit("<http://kb.example/person/P"), F.col("pid").cast("string"), F.lit(">"))
    knows = F.concat(F.lit("<http://kb.example/person/P"), F.col("kid").cast("string"), F.lit(">"))
    city = F.concat(F.lit("<http://kb.example/city/C"), F.col("cid").cast("string"), F.lit(">"))
    org = F.concat(F.lit("<http://kb.example/org/O"), F.col("oid").cast("string"), F.lit(">"))
    born = pages_df.select(person.alias("s"), F.lit(P_BORN_IN).alias("p"), city.alias("o"), g.alias("g"))
    works = pages_df.select(person.alias("s"), F.lit(P_WORKS_FOR).alias("p"), org.alias("o"), g.alias("g"))
    kn = pages_df.select(person.alias("s"), F.lit(P_KNOWS).alias("p"), knows.alias("o"), g.alias("g"))
    return born.unionByName(works).unionByName(kn)
