"""RDFa Lite → triples (north_star: "JSON-LD, RDFa, microdata
extraction from raw HTML").

Implements the RDFa Lite 1.1 attribute set: ``vocab``, ``prefix``
(``pfx: iri`` pairs), ``typeof``, ``property``, ``resource``,
``about``, plus ``href``/``src``/``content``/``datatype``/``lang`` as
value sources. Subject resolution follows the Lite rules: ``about`` or
``resource`` set the subject for their subtree; a bare ``typeof``
mints a document-scoped blank node (``_:raN``); property values are
the element's ``resource``/``href``/``src`` (IRI), ``content`` attr or
collected text (literal), and an element carrying both ``property``
and ``typeof`` links parent → child node (chaining).

stdlib ``html.parser`` single pass, document-order bnode numbering, so
skolemization is deterministic per page.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Dict, List, Optional
from urllib.parse import urljoin

from .terms import RDF_TYPE, Term, Triple, iri, literal

XSD = "http://www.w3.org/2001/XMLSchema#"

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _Ctx:
    __slots__ = ("subject", "vocab", "prefixes", "lang")

    def __init__(self, subject, vocab: str, prefixes: Dict[str, str], lang):
        self.subject = subject
        self.vocab = vocab
        self.prefixes = prefixes
        self.lang = lang


class _OpenLiteral:
    def __init__(self, subject, preds, depth, datatype, lang):
        self.subject = subject
        self.preds = preds
        self.depth = depth
        self.datatype = datatype
        self.lang = lang
        self.buf: List[str] = []


class _RdfaParser(HTMLParser):
    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.base = base
        self.triples: List[Triple] = []
        self._bn = 0
        self._depth = 0
        self._stack: List[tuple] = [
            (0, _Ctx(iri(base) if base else None, "", {}, None))
        ]
        self._open_lits: List[_OpenLiteral] = []

    # -- term resolution --

    def _curie(self, token: str, ctx: _Ctx) -> Optional[str]:
        """TERMorCURIEorAbsIRI resolution (typeof/property/datatype):
        absolute IRIs pass, known-prefix CURIEs expand, plain terms
        attach to vocab; unknown-prefix CURIEs are ignored (RDFa Core
        §7.4.3 behavior)."""
        token = token.strip()
        if not token:
            return None
        if token.startswith("urn:") or "://" in token:
            return token
        pfx, sep, local = token.partition(":")
        if sep:
            return ctx.prefixes[pfx] + local if pfx in ctx.prefixes else None
        return ctx.vocab + token if ctx.vocab else None

    def _subject_iri(self, value: str, ctx: _Ctx) -> str:
        """about/resource resolution: CURIE with a known prefix
        expands; anything else is an IRI reference against base."""
        value = value.strip()
        if value.startswith("urn:") or "://" in value:
            return value
        pfx, sep, local = value.partition(":")
        if sep and pfx in ctx.prefixes:
            return ctx.prefixes[pfx] + local
        return urljoin(self.base, value)

    def _bnode(self) -> Term:
        self._bn += 1
        return Term(f"_:ra{self._bn}", "bnode")

    # -- events --

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        self._depth += 1
        parent = self._stack[-1][1]
        is_void = tag in VOID_TAGS

        prefixes = parent.prefixes
        if attrs.get("prefix"):
            # "pfx: http://… pfx2: http://…" pairs
            prefixes = dict(prefixes)
            toks = attrs["prefix"].split()
            i = 0
            while i < len(toks) - 1:
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]
                    i += 2
                else:
                    i += 1
        vocab = attrs.get("vocab", parent.vocab)
        lang = attrs.get("lang", parent.lang)
        ctx = _Ctx(parent.subject, vocab, prefixes, lang)

        prop = attrs.get("property")
        typeof = attrs.get("typeof")
        about = attrs.get("about")
        resource = attrs.get("resource")

        # RDFa Core distinction the two attributes encode: ``about``
        # sets this element's SUBJECT (its property triples hang off
        # it), ``resource`` sets the OBJECT of this element's property
        # (chaining). A bare ``typeof`` mints a bnode — as chained
        # object when a property is present, as new subject otherwise.
        new_subj: Optional[Term] = None
        obj_node: Optional[Term] = None
        if about:
            new_subj = iri(self._subject_iri(about, ctx))
        elif resource:
            obj_node = iri(self._subject_iri(resource, ctx))
        elif typeof is not None:
            if prop:
                obj_node = self._bnode()
            else:
                new_subj = self._bnode()

        typed = new_subj if new_subj is not None else obj_node
        if typeof is not None and typed is not None:
            for t in typeof.split():
                t_iri = self._curie(t, ctx)
                if t_iri:
                    self.triples.append(
                        Triple(typed, iri(RDF_TYPE), iri(t_iri))
                    )

        subj = new_subj if new_subj is not None else parent.subject
        if prop and subj is not None:
            preds = [
                iri(p) for p in (self._curie(p, ctx) for p in prop.split()) if p
            ]
            if obj_node is not None:
                # chaining / resource-valued property
                for p in preds:
                    self.triples.append(Triple(subj, p, obj_node))
            elif attrs.get("href") or attrs.get("src"):
                target = iri(
                    urljoin(self.base, attrs.get("href") or attrs.get("src"))
                )
                for p in preds:
                    self.triples.append(Triple(subj, p, target))
            elif attrs.get("content") is not None:
                dt = self._curie(attrs.get("datatype", ""), ctx)
                if not dt and not lang:
                    dt = XSD + "string"  # parser-family plain-literal form
                for p in preds:
                    self.triples.append(
                        Triple(
                            subj, p,
                            literal(attrs["content"], dt, None if dt else lang),
                        )
                    )
            elif not is_void:
                dt = self._curie(attrs.get("datatype", ""), ctx)
                if not dt and not lang:
                    dt = XSD + "string"  # parser-family plain-literal form
                self._open_lits.append(
                    _OpenLiteral(
                        subj, preds, self._depth, dt,
                        None if dt else lang,
                    )
                )

        node = new_subj if new_subj is not None else obj_node
        if node is not None:
            ctx = _Ctx(node, vocab, prefixes, lang)
        if not is_void:
            self._stack.append((self._depth, ctx))
        else:
            self._depth -= 1

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        while self._open_lits and self._open_lits[-1].depth == self._depth:
            ol = self._open_lits.pop()
            text = " ".join("".join(ol.buf).split())
            for p in ol.preds:
                self.triples.append(
                    Triple(ol.subject, p, literal(text, ol.datatype, ol.lang))
                )
        while len(self._stack) > 1 and self._stack[-1][0] == self._depth:
            self._stack.pop()
        self._depth -= 1

    def handle_data(self, data):
        for ol in self._open_lits:
            ol.buf.append(data)


def parse_rdfa(
    html_text: str, base: str = "", events=None
) -> List[Triple]:
    p = _RdfaParser(base)
    if events is None:
        p.feed(html_text)
        p.close()
    else:  # pre-tokenized stream (html.tokenize_html) — one pass/page
        from .html import replay_html

        replay_html(events, p)
    # flush property literals still open at EOF: truncated /
    # implicitly-closed markup (legal HTML, common in crawls) must not
    # drop its literals
    for ol in p._open_lits:
        text = " ".join("".join(ol.buf).split())
        for pred in ol.preds:
            p.triples.append(
                Triple(ol.subject, pred, literal(text, ol.datatype, ol.lang))
            )
    p._open_lits.clear()
    return p.triples
