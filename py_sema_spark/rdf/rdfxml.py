"""RDF/XML → triples (pure Python, stdlib ElementTree).

RDF/XML is the last entry in the reference's format-fallback chain
(/root/reference/sema/discovery/discovery.py:148-156 tries
``["turtle","json-ld","n3","nt","trig","nquads","xml"]``) and the most
common wire format for SKOS/vocabulary servers. This covers the
RDF/XML 1.1 syntax subset that occurs in practice:

- ``rdf:RDF`` document element (or a bare node element);
- node elements: ``rdf:Description`` and typed nodes (element QName →
  ``rdf:type``), identified by ``rdf:about`` / ``rdf:ID`` /
  ``rdf:nodeID`` or anonymous (fresh bnode);
- property elements: ``rdf:resource``, ``rdf:nodeID``,
  ``rdf:datatype``, ``xml:lang`` (inherited), text literals, nested
  node elements, ``rdf:parseType`` Resource / Literal / Collection,
  property attributes (non-rdf attrs on node elements → literal
  triples), ``rdf:li`` → ``rdf:_1..n`` container membership;
- ``xml:base`` (incl. scoped overrides) and relative IRI resolution,
  mirroring the reference's ``publicID=resp.url`` behaviour.

Raises :class:`RdfXmlParseError` on malformed input so the fallback
chain can move on (a failed parse is silent, discovery.py:158-173).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional
from urllib.parse import urljoin

from .terms import (
    ABS_IRI_RE as _ABS_IRI_RE,
    RDF_NIL,
    RDF_NS,
    RDF_TYPE,
    XSD,
    Term,
    Triple,
    bnode,
    build_rdf_list,
    iri,
    literal,
)

XML_NS = "http://www.w3.org/XML/1998/namespace"

_RDF = "{" + RDF_NS + "}"
_SYNTAX_ATTRS = {
    _RDF + "about",
    _RDF + "ID",
    _RDF + "nodeID",
    _RDF + "resource",
    _RDF + "datatype",
    _RDF + "parseType",
    _RDF + "aboutEach",
    _RDF + "aboutEachPrefix",
    _RDF + "bagID",
}
# old-style non-namespaced rdf attrs seen in the wild are NOT honored —
# rdflib requires the namespace too.

class RdfXmlParseError(ValueError):
    pass


def _split(tag: str) -> str:
    """'{ns}local' → full IRI ns+local; bare tag → error (RDF/XML
    property/node elements must be namespaced)."""
    if not tag.startswith("{"):
        raise RdfXmlParseError(f"non-namespaced element {tag!r}")
    ns, local = tag[1:].split("}", 1)
    return ns + local


class _RdfXmlParser:
    def __init__(self, base: str):
        self.base = base or ""
        self.triples: List[Triple] = []
        self._bn = 0
        self._li: dict[int, int] = {}  # id(node elem) → next li ordinal

    def _fresh(self) -> Term:
        self._bn += 1
        return bnode(f"genx{self._bn}")

    def _resolve(self, ref: str, base: str) -> str:
        if _ABS_IRI_RE.match(ref):
            return ref
        if not base:
            return ref
        return urljoin(base, ref)

    def _base_of(self, elem: ET.Element, base: str) -> str:
        b = elem.get("{%s}base" % XML_NS)
        if b is not None:
            return self._resolve(b, base)
        return base

    def _lang_of(self, elem: ET.Element, lang: Optional[str]) -> Optional[str]:
        x = elem.get("{%s}lang" % XML_NS)
        return x if x is not None else lang

    # ---- node elements ----

    def parse_doc(self, root: ET.Element) -> None:
        base = self._base_of(root, self.base)
        if _split(root.tag) == RDF_NS + "RDF":
            lang = self._lang_of(root, None)
            for child in root:
                self.node_element(child, base, lang)
        else:
            self.node_element(root, base, None)

    def _subject_of(self, elem: ET.Element, base: str) -> Term:
        about = elem.get(_RDF + "about")
        if about is not None:
            return iri(self._resolve(about, base))
        rid = elem.get(_RDF + "ID")
        if rid is not None:
            return iri(self._resolve("#" + rid, base))
        nid = elem.get(_RDF + "nodeID")
        if nid is not None:
            return bnode(nid)
        return self._fresh()

    def node_element(
        self, elem: ET.Element, base: str, lang: Optional[str]
    ) -> Term:
        base = self._base_of(elem, base)
        lang = self._lang_of(elem, lang)
        subj = self._subject_of(elem, base)
        name = _split(elem.tag)
        if name != RDF_NS + "Description":
            self.triples.append(Triple(subj, iri(RDF_TYPE), iri(name)))
        # property attributes (2.12): any non-syntax, non-xml attr
        for k, v in elem.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith("{%s}" % XML_NS):
                continue
            if not k.startswith("{"):
                continue  # unnamespaced attrs are ignored (rdflib does too)
            pred = _split(k)
            if pred == RDF_TYPE:
                self.triples.append(
                    Triple(subj, iri(RDF_TYPE), iri(self._resolve(v, base)))
                )
            elif pred.startswith(RDF_NS + "_") or pred in (
                RDF_NS + "li",
            ):
                continue
            else:
                self.triples.append(
                    Triple(subj, iri(pred), literal(v, lang=lang)
                           if lang else literal(v, datatype=XSD + "string"))
                )
        for child in elem:
            self.property_element(subj, child, base, lang, elem)
        return subj

    # ---- property elements ----

    def _pred_of(self, elem: ET.Element, parent: ET.Element) -> str:
        name = _split(elem.tag)
        if name == RDF_NS + "li":
            n = self._li.get(id(parent), 0) + 1
            self._li[id(parent)] = n
            return f"{RDF_NS}_{n}"
        return name

    def property_element(
        self,
        subj: Term,
        elem: ET.Element,
        base: str,
        lang: Optional[str],
        parent: ET.Element,
    ) -> None:
        base = self._base_of(elem, base)
        lang = self._lang_of(elem, lang)
        pred = iri(self._pred_of(elem, parent))

        ptype = elem.get(_RDF + "parseType")
        if ptype == "Resource":
            node = self._fresh()
            self.triples.append(Triple(subj, pred, node))
            for child in elem:
                self.property_element(node, child, base, lang, elem)
            return
        if ptype == "Literal":
            xml_text = (elem.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in elem
            )
            self.triples.append(
                Triple(subj, pred, literal(
                    xml_text, datatype=RDF_NS + "XMLLiteral"))
            )
            return
        if ptype == "Collection":
            items = [self.node_element(c, base, lang) for c in elem]
            if not items:
                self.triples.append(Triple(subj, pred, iri(RDF_NIL)))
                return
            head = build_rdf_list(items, self._fresh, self.triples)
            self.triples.append(Triple(subj, pred, head))
            return
        if ptype is not None:
            raise RdfXmlParseError(f"unsupported parseType {ptype!r}")

        res = elem.get(_RDF + "resource")
        if res is not None:
            self.triples.append(
                Triple(subj, pred, iri(self._resolve(res, base)))
            )
            return
        nid = elem.get(_RDF + "nodeID")
        if nid is not None:
            self.triples.append(Triple(subj, pred, bnode(nid)))
            return

        children = list(elem)
        if children:
            if len(children) != 1:
                raise RdfXmlParseError(
                    "property element with multiple node children"
                )
            obj = self.node_element(children[0], base, lang)
            self.triples.append(Triple(subj, pred, obj))
            return

        # empty property element with property attributes → bnode object
        prop_attrs = {
            k: v
            for k, v in elem.attrib.items()
            if k not in _SYNTAX_ATTRS
            and k.startswith("{")
            and not k.startswith("{%s}" % XML_NS)
        }
        if prop_attrs and not (elem.text or "").strip():
            node = self._fresh()
            self.triples.append(Triple(subj, pred, node))
            for k, v in prop_attrs.items():
                p = _split(k)
                if p == RDF_TYPE:
                    self.triples.append(
                        Triple(node, iri(RDF_TYPE),
                               iri(self._resolve(v, base)))
                    )
                else:
                    self.triples.append(
                        Triple(node, iri(p),
                               literal(v, lang=lang) if lang
                               else literal(v, datatype=XSD + "string"))
                    )
            return

        text = elem.text or ""
        dt = elem.get(_RDF + "datatype")
        if dt is not None:
            self.triples.append(
                Triple(subj, pred, literal(text, datatype=self._resolve(
                    dt, base)))
            )
        elif lang:
            self.triples.append(Triple(subj, pred, literal(text, lang=lang)))
        else:
            self.triples.append(
                Triple(subj, pred, literal(text, datatype=XSD + "string"))
            )


def parse_rdfxml(text: str, base: str = "") -> List[Triple]:
    """Parse an RDF/XML document → list of Triples.

    Guards against non-RDF XML (plain HTML/Atom/SVG): the document
    element must be ``rdf:RDF`` or carry an rdf: syntax attribute —
    otherwise this is almost certainly not RDF/XML and we refuse, so
    the fallback chain's last entry doesn't claim arbitrary XML.
    """
    # cheap necessary condition before the full XML parse: every
    # RDF/XML document must declare the rdf namespace (rdf:RDF root or
    # rdf:about/ID/nodeID syntax attrs all require it). This keeps the
    # fallback chain's last entry from running ElementTree over every
    # HTML page in a 10^12-document corpus.
    if RDF_NS not in text:
        raise RdfXmlParseError("rdf namespace not declared")
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:  # noqa: BLE001 - chain moves on
        raise RdfXmlParseError(str(e)) from e
    tag = root.tag
    if not (isinstance(tag, str) and tag.startswith("{")):
        raise RdfXmlParseError("document element is not namespaced")
    name = _split(tag)
    if name != RDF_NS + "RDF" and not (
        set(root.attrib) & _SYNTAX_ATTRS
    ):
        raise RdfXmlParseError("document element is not rdf:RDF")
    p = _RdfXmlParser(base)
    p.parse_doc(root)
    return p.triples
