"""The reference's conversion fixture, hand-encoded as (stmt_idx, s, p, o, g).

Ported from /root/reference/test/data/people_from_jf.ttl (32 statements, N3
store order = file order). The reference's Mocha test asserts 34 entities:
12 NODE + 20 LINK + 2 CONNECTOR + 0 CONTEXT under DEFAULT_OPTIONS
(/root/reference/test/rdf2hk_test.js:18-30,91-104).
"""

from rdf2hk_spark import constants as C

WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"
RDFS_LABEL = C.RDFS_LABEL_URI
P31 = f"<{WDT}P31>"
P19 = f"<{WDT}P19>"
Q5 = f"<{WD}Q5>"
Q193019 = f"<{WD}Q193019>"
G = C.HK_NULL_URI

PEOPLE = [
    ("Q1131864", "Ana Carolina"),
    ("Q9588381", "Agostinho Pestana"),
    ("Q4678543", "Adalberto Hilário Ferreira Neto"),
    ("Q26256189", "Alacir Frederico Werner"),
    ("Q16488350", "Alfredo Ferreira Lage"),
    ("Q16501259", "Alberto Chimelli"),
    ("Q9602818", "Alfredinho Flautim"),
    ("Q9610675", "Amilcar Campos Padovani"),
    ("Q64848172", "Alfredo da Silva Ramalho"),
    ("Q16486937", "Alberto Delpino"),
]


def quads() -> list[tuple[int, str, str, str, str]]:
    """The 32 statements in TTL file order (Q1131864's block, the two class
    labels, then the remaining nine person blocks)."""
    rows: list[tuple[str, str, str]] = []

    def person_block(qid: str, label: str) -> list[tuple[str, str, str]]:
        s = f"<{WD}{qid}>"
        return [
            (s, P31, Q5),
            (s, P19, Q193019),
            (s, RDFS_LABEL, f'"{label}"@pt'),
        ]

    rows += person_block(*PEOPLE[0])
    rows.append((Q5, RDFS_LABEL, '"ser humano"@pt'))
    rows.append((Q193019, RDFS_LABEL, '"Juiz de Fora"@pt'))
    for qid, label in PEOPLE[1:]:
        rows += person_block(qid, label)
    return [(i, s, p, o, G) for i, (s, p, o) in enumerate(rows)]
