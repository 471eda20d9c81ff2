"""Format-fallback RDF parsing — the reference's core extraction rule.

Mirrors ``_add_triples_from_text``
(/root/reference/sema/discovery/discovery.py:148-176): try formats in a
fixed order until one yields > 0 triples; a parse failure is silent and
the chain moves on. The reference order is
``["turtle","json-ld","n3","nt","trig","nquads","xml"]``; our subset
engine folds n3/trig/nquads into the Turtle engine and treats RDF/XML
as unsupported (absent from the corpus we synthesize — an import-gated
hook is left for it).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .jsonld import parse_jsonld
from .terms import Triple
from .turtle import parse_ntriples, parse_turtle

FORMATS_TO_TRY: Tuple[str, ...] = ("turtle", "json-ld", "nt")

_PARSERS = {
    "turtle": parse_turtle,
    "json-ld": parse_jsonld,
    "nt": parse_ntriples,
}


def parse_rdf(text: str, fmt: str, base: str = "") -> List[Triple]:
    parser = _PARSERS.get(fmt)
    if parser is None:
        raise ValueError(f"unsupported rdf format {fmt!r}")
    return parser(text, base)


def parse_rdf_auto(
    text: str, base: str = "", formats: Optional[Tuple[str, ...]] = None
) -> Tuple[List[Triple], Optional[str]]:
    """Try each format in order; return (triples, winning_format).

    Returns ``([], None)`` when nothing parses — the caller treats that
    as "no structured data here", exactly like the reference returning
    False from ``_add_triples_from_text``.
    """
    if not text or not text.strip():
        return [], None
    head = text.lstrip()[:1]
    order = list(formats or FORMATS_TO_TRY)
    # cheap dispatch hint: JSON cannot be Turtle and vice versa; keeps
    # the common case at one parse attempt per document.
    if head in "{[":
        order.sort(key=lambda f: 0 if f == "json-ld" else 1)
    for fmt in order:
        try:
            triples = _PARSERS[fmt](text, base)
            if triples:
                return triples, fmt
        except Exception:
            continue
    return [], None
