"""RDF term model for the triples DataFrame.

A triple is a plain tuple of typed term dicts flattened into the
columns ``(s, p, o, o_kind, o_datatype, o_lang)`` — see FIXTURES.md §2.
Subjects/predicates are IRIs or bnode labels (``_:label``); the bnode
→ deterministic-skolem-IRI step happens at materialization
(:mod:`py_sema_spark.model`), mirroring the reference's
``store_graph += graph.skolemize()``
(/root/reference/sema/commons/store/store.py:393) but with a
content-hash IRI so it is stable across partitions and runs.
"""

from __future__ import annotations

import hashlib
import re
from typing import NamedTuple, Optional

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

KIND_IRI = "iri"
KIND_LITERAL = "literal"
KIND_BNODE = "bnode"


class Term(NamedTuple):
    value: str
    kind: str
    datatype: Optional[str] = None
    lang: Optional[str] = None


class Triple(NamedTuple):
    s: Term
    p: Term
    o: Term


def iri(value: str) -> Term:
    return Term(value, KIND_IRI)


def bnode(label: str) -> Term:
    return Term("_:" + label if not label.startswith("_:") else label, KIND_BNODE)


def literal(
    value: str, datatype: Optional[str] = None, lang: Optional[str] = None
) -> Term:
    """Lang-tagged literals carry datatype None (rdf:langString is
    implied). Parser convention: every parser in this package passes
    an EXPLICIT ``XSD + "string"`` for plain literals, so a logical
    triple extracted from two formats on the same page is one tuple
    under the 6-column dedup key (serializers omit xsd:string on
    output either way)."""
    if lang:
        datatype = None
    return Term(value, KIND_LITERAL, datatype, lang)


def skolem_iri(src_url: str, label: str) -> str:
    """Deterministic skolem IRI for a blank node.

    Derived from a content hash of (source url, local bnode label) so
    the same input row always yields the same IRI on any partition of
    any run (north_rule: deterministic IRI skolemization). The
    reference delegates to rdflib's UUID-based ``.skolemize()``
    (/root/reference/sema/commons/store/store.py:393); UUIDs are not
    reproducible, hashes are.
    """
    h = hashlib.sha256(f"{src_url}|{label}".encode("utf-8")).hexdigest()
    return f"urn:skolem:{h[:40]}"


def n3(term: Term) -> str:
    """Serialize a term in N-Triples syntax (canonical output form)."""
    if term.kind == KIND_IRI:
        return f"<{term.value}>"
    if term.kind == KIND_BNODE:
        return term.value
    esc = (
        term.value.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if term.lang:
        return f'"{esc}"@{term.lang}'
    if term.datatype and term.datatype != XSD + "string":
        return f'"{esc}"^^<{term.datatype}>'
    return f'"{esc}"'


# shared across the three hand-written parsers (turtle/jsonld/rdfxml) so a
# fix in one cannot silently diverge from the others
ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def build_rdf_list(items, fresh_bnode, sink) -> Term:
    """Append an rdf:first/rdf:rest chain for ``items`` to ``sink`` (a
    list of Triples) and return the head term (rdf:nil for an empty
    list). ``fresh_bnode`` mints the chain's blank nodes."""
    if not items:
        return iri(RDF_NIL)
    head = fresh_bnode()
    node = head
    for k, item in enumerate(items):
        sink.append(Triple(node, iri(RDF_FIRST), item))
        nxt = fresh_bnode() if k + 1 < len(items) else iri(RDF_NIL)
        sink.append(Triple(node, iri(RDF_REST), nxt))
        node = nxt
    return head
