"""HTML microdata → triples (north_star: "JSON-LD, RDFa, microdata
extraction from raw HTML").

Implements the WHATWG microdata-to-RDF mapping for the common subset:
``itemscope``/``itemtype``/``itemid`` establish items (typed; itemid →
IRI subject, else a document-scoped blank node), ``itemprop``
contributes properties whose value is the nested item, the element's
``href``/``src`` (a/link/area/img/audio/video/iframe/embed/source),
``content`` (meta), ``datetime`` (time), or the element's text.
Property IRIs: absolute itemprop names pass through; otherwise they
attach to the item's vocabulary (itemtype base up to the last '#' or
'/').

stdlib ``html.parser``-based like the reference's scanner, single
pass, document-order blank-node numbering (``_:mdN``) so
skolemization (model.skolemize keys on src_url + label) is
deterministic per page.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional
from urllib.parse import urljoin

from .terms import RDF_TYPE, XSD, Triple, iri, literal

URL_VALUE_ATTR = {
    "a": "href", "area": "href", "link": "href",
    "img": "src", "audio": "src", "video": "src",
    "iframe": "src", "embed": "src", "source": "src",
}

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


def _vocab_of(itemtype: str) -> str:
    for sep in ("#", "/"):
        if sep in itemtype:
            return itemtype[: itemtype.rindex(sep) + 1]
    return itemtype


class _Item:
    def __init__(self, subject, itemtype: Optional[str]):
        self.subject = subject
        self.vocab = _vocab_of(itemtype) if itemtype else ""


class _Prop:
    """An open itemprop capturing text until its end tag."""

    def __init__(self, item: _Item, name: str, depth: int):
        self.item = item
        self.name = name
        self.depth = depth
        self.buf: List[str] = []


class _MicrodataParser(HTMLParser):
    def __init__(self, base: str):
        super().__init__(convert_charrefs=True)
        self.base = base
        self.triples: List[Triple] = []
        self._bn = 0
        self._item_stack: List[tuple] = []  # (depth, _Item)
        self._open_props: List[_Prop] = []
        self._depth = 0

    # -- helpers --

    def _new_subject(self, attrs) -> object:
        itemid = attrs.get("itemid")
        if itemid:
            return iri(urljoin(self.base, itemid))
        self._bn += 1
        from .terms import Term

        return Term(f"_:md{self._bn}", "bnode")

    def _prop_iri(self, item: _Item, name: str) -> str:
        if "://" in name or name.startswith("urn:"):
            return name
        return (item.vocab or urljoin(self.base, "#")) + name

    def _emit(self, item: _Item, name: str, obj) -> None:
        self.triples.append(
            Triple(item.subject, iri(self._prop_iri(item, name)), obj)
        )

    # -- parser events --

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        self._depth += 1
        is_void = tag in VOID_TAGS

        itemprop = attrs.get("itemprop")
        cur_item = self._item_stack[-1][1] if self._item_stack else None

        if "itemscope" in attrs:
            sub = self._new_subject(attrs)
            # itemtype is a space-separated list (WHATWG §5.2): one
            # rdf:type per token; the property vocab derives from the
            # FIRST type, matching the microdata-to-RDF note
            types = (attrs.get("itemtype") or "").split()
            item = _Item(sub, types[0] if types else None)
            for t in types:
                self.triples.append(Triple(sub, iri(RDF_TYPE), iri(t)))
            if itemprop and cur_item is not None:
                for name in itemprop.split():
                    self._emit(cur_item, name, sub)
            self._item_stack.append((self._depth, item))
            if is_void:
                self._item_stack.pop()
                self._depth -= 1
            return

        if itemprop and cur_item is not None:
            url_attr = URL_VALUE_ATTR.get(tag)
            if url_attr and attrs.get(url_attr):
                val = iri(urljoin(self.base, attrs[url_attr]))
                for name in itemprop.split():
                    self._emit(cur_item, name, val)
            elif tag == "meta" and attrs.get("content") is not None:
                for name in itemprop.split():
                    self._emit(cur_item, name, literal(attrs["content"], datatype=XSD + "string"))
            elif tag == "time" and attrs.get("datetime"):
                for name in itemprop.split():
                    self._emit(cur_item, name, literal(attrs["datetime"], datatype=XSD + "string"))
            elif not is_void:
                for name in itemprop.split():
                    self._open_props.append(
                        _Prop(cur_item, name, self._depth)
                    )
        if is_void:
            self._depth -= 1

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        while self._open_props and self._open_props[-1].depth == self._depth:
            prop = self._open_props.pop()
            text = " ".join("".join(prop.buf).split())
            self._emit(prop.item, prop.name, literal(text, datatype=XSD + "string"))
        while self._item_stack and self._item_stack[-1][0] == self._depth:
            self._item_stack.pop()
        self._depth -= 1

    def handle_data(self, data):
        for prop in self._open_props:
            prop.buf.append(data)


def parse_microdata(
    html_text: str, base: str = "", events=None
) -> List[Triple]:
    p = _MicrodataParser(base)
    if events is None:
        p.feed(html_text)
        p.close()
    else:  # pre-tokenized stream (html.tokenize_html) — one pass/page
        from .html import replay_html

        replay_html(events, p)
    # flush itemprops still open at EOF: truncated / implicitly-closed
    # markup (legal HTML, common in crawls) must not drop its literals
    for prop in p._open_props:
        text = " ".join("".join(prop.buf).split())
        p._emit(prop.item, prop.name, literal(text, datatype=XSD + "string"))
    p._open_props.clear()
    return p.triples
