"""RDF/XML source and sink (S2/S5 of SURVEY §2.1; reference
graphfactory.js:102-121 parse via the `rdfxml` npm lib, 168-189 serialize).

RDF/XML is not line-splittable, so — exactly like the reference, which runs
a single-threaded JS parser — the reader is a driver-side routine meant for
fixture/ontology-sized documents. At scale, convert once to N-Quads
(`read_nquads` splits arbitrarily large files); this module exists for format
parity, not as a 100 TB ingest path.

Supported subset (covers the W3C primer patterns the reference lib handles):
rdf:RDF roots, rdf:Description and typed node elements, rdf:about / rdf:ID /
rdf:nodeID subjects, property elements with rdf:resource / rdf:nodeID /
rdf:datatype / xml:lang / nested node elements / rdf:parseType="Resource",
property attributes, and xml:base resolution. Anything else raises
``RdfXmlSyntaxError`` — never silent data loss.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from rdf2hk_spark import constants as C

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF = "{" + RDF_NS + "}"
_XML = "{http://www.w3.org/XML/1998/namespace}"

# Same absolute-IRI test the Turtle reader uses: any scheme (urn:, mailto:,
# http:, ...) counts as absolute, not just '://' forms.
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _resolve(iri: str, base: str) -> str:
    return iri if not base or _SCHEME_RE.match(iri) else base + iri


class RdfXmlSyntaxError(ValueError):
    pass


def _split(tag: str) -> str:
    """'{ns}local' → '<nslocal>'."""
    if not tag.startswith("{"):
        raise RdfXmlSyntaxError(f"unqualified element {tag!r}")
    ns, local = tag[1:].split("}", 1)
    return f"<{ns}{local}>"


class _Reader:
    def __init__(self, default_graph: str):
        self.g = default_graph
        self.rows: list[tuple[str, str, str]] = []
        self.bn = 0

    def _bnode(self) -> str:
        self.bn += 1
        return f"_:xb{self.bn}"

    def _subject_of(self, el: ET.Element, base: str) -> str:
        about = el.get(_RDF + "about")
        rid = el.get(_RDF + "ID")
        nid = el.get(_RDF + "nodeID")
        if about is not None:
            return f"<{_resolve(about, base)}>"
        if rid is not None:
            return f"<{base}#{rid}>"
        if nid is not None:
            return f"_:{nid}"
        return self._bnode()

    def node(self, el: ET.Element, base: str, lang: str | None) -> str:
        base = el.get(_XML + "base", base)
        lang = el.get(_XML + "lang", lang)
        s = self._subject_of(el, base)
        if el.tag != _RDF + "Description":
            self.rows.append((s, f"<{RDF_NS}type>", _split(el.tag)))
        # property attributes (non-rdf, non-xml) → literal triples
        for k, v in el.attrib.items():
            if k.startswith(_RDF) or k.startswith(_XML) or not k.startswith("{"):
                continue
            self.rows.append((s, _split(k), f'"{_esc(v)}"'))
        for prop in el:
            self.prop(s, prop, base, el.get(_XML + "lang", lang))
        return s

    def prop(self, s: str, el: ET.Element, base: str, lang: str | None) -> None:
        p = _split(el.tag)
        lang = el.get(_XML + "lang", lang)
        res = el.get(_RDF + "resource")
        nid = el.get(_RDF + "nodeID")
        dt = el.get(_RDF + "datatype")
        pt = el.get(_RDF + "parseType")
        kids = list(el)
        if res is not None:
            # rdf:resource is base-resolved exactly like rdf:about.
            self.rows.append((s, p, f"<{_resolve(res, base)}>"))
            return
        if nid is not None:
            self.rows.append((s, p, f"_:{nid}"))
            return
        if pt == "Resource":
            b = self._bnode()
            self.rows.append((s, p, b))
            for sub in kids:
                self.prop(b, sub, base, lang)
            return
        if pt == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(k, encoding="unicode") for k in kids
            )
            self.rows.append(
                (s, p, f'"{_esc(inner)}"^^<{RDF_NS}XMLLiteral>')
            )
            return
        if pt is not None:
            raise RdfXmlSyntaxError(f"unsupported parseType {pt!r}")
        if kids:
            if len(kids) != 1:
                raise RdfXmlSyntaxError(
                    f"property element {p} with {len(kids)} child nodes"
                )
            o = self.node(kids[0], base, lang)
            self.rows.append((s, p, o))
            return
        text = el.text or ""
        if dt is not None:
            self.rows.append((s, p, f'"{_esc(text)}"^^<{dt}>'))
        elif lang:
            self.rows.append((s, p, f'"{_esc(text)}"@{lang}'))
        else:
            self.rows.append((s, p, f'"{_esc(text)}"'))


def _esc(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"')


def _unesc(v: str) -> str:
    out, i = [], 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            out.append(v[i + 1])
            i += 2
        else:
            out.append(v[i])
            i += 1
    return "".join(out)


def parse_rdfxml_driver(
    text: str, default_graph: str = C.HK_NULL_URI
) -> list[tuple[int, str, str, str, str]]:
    """RDF/XML → quad rows (driver-side; see module docstring)."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlSyntaxError(str(e)) from e
    r = _Reader(default_graph)
    base = root.get(_XML + "base", "")
    lang = root.get(_XML + "lang")
    if root.tag == _RDF + "RDF":
        for el in root:
            r.node(el, base, lang)
    else:
        r.node(root, base, lang)
    return [
        (i, s, p, o, default_graph) for i, (s, p, o) in enumerate(r.rows)
    ]


def to_rdfxml(quads: list[tuple[str, str, str, str]] | list[tuple]) -> str:
    """Quad rows → an RDF/XML document (driver-side sink, S5). Accepts
    (s, p, o, g) tuples (graph ignored — RDF/XML has no named graphs, the
    reference's serializer flattens too, graphfactory.js:168-189)."""
    ET.register_namespace("rdf", RDF_NS)
    root = ET.Element(_RDF + "RDF")
    by_subject: dict[str, list[tuple[str, str]]] = {}
    for row in quads:
        s, p, o = row[0], row[1], row[2]
        by_subject.setdefault(s, []).append((p, o))
    for s, pos in by_subject.items():
        node = ET.SubElement(root, _RDF + "Description")
        if s.startswith("_:"):
            node.set(_RDF + "nodeID", s[2:])
        else:
            node.set(_RDF + "about", s.strip("<>"))
        for p, o in pos:
            if not (p.startswith("<") and p.endswith(">")):
                raise RdfXmlSyntaxError(f"predicate {p!r} is not an IRI")
            m_ns = re.match(r"^(.*[#/])([^#/]+)$", p[1:-1])
            if m_ns is None:
                # e.g. <urn:isbn:123> — no '#'/'/' namespace split exists.
                raise RdfXmlSyntaxError(
                    f"cannot derive an XML namespace for predicate {p!r}"
                )
            ns, local = m_ns.groups()
            prop = ET.SubElement(node, "{" + ns + "}" + local)
            if o.startswith("<"):
                prop.set(_RDF + "resource", o.strip("<>"))
            elif o.startswith("_:"):
                prop.set(_RDF + "nodeID", o[2:])
            else:
                m = re.match(r'(?s)^"(.*)"(?:@([A-Za-z0-9-]+)|\^\^<(.*)>)?$', o)
                if not m:
                    raise RdfXmlSyntaxError(f"unparseable literal {o!r}")
                prop.text = _unesc(m.group(1))
                if m.group(2):
                    prop.set(_XML + "lang", m.group(2))
                elif m.group(3):
                    prop.set(_RDF + "datatype", m.group(3))
    ET.indent(root)
    return ET.tostring(root, encoding="unicode", xml_declaration=True)
