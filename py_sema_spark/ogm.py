"""OGM — blueprint-driven triple emission (SURVEY.md §2.10 E7).

The reference's GraphBuilder consumes a YAML *blueprint*: an optional
``$`` head (prefixes, jsonld context) plus a body of
``identifier → {$type, $label, property: value…}`` entries, emitted as
triples through term templates
(/root/reference/sema/commons/ogm/graph_builder.py:10-81,
graph_wrapper.py:67-108; RO-Crate is a specialization,
ro/creator/robuilder.py:11-78).

Blueprints are configuration-sized, so building the row list is
driver-side; the output is a standard triples DataFrame that unions
into any store/materialize path. Term resolution follows the
TermBuilder parse ladder (§2.8 X16, term_builder.py:54-144):
``<…>`` resolves against ``@base``, ``pfx:local`` expands via the
prefix map, ``…://…``/``urn:`` pass through as IRIs, a leading
backslash escapes to a literal, everything else is a plain literal.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from .model import TRIPLE_SCHEMA

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"

DEFAULT_PREFIXES = {"rdf": RDF, "rdfs": RDFS, "xsd": XSD}


def resolve_term(
    value: Any, prefixes: Dict[str, str], base: str
) -> Tuple[str, str, Optional[str], Optional[str]]:
    """→ (lexical, kind, datatype, lang) per the TermBuilder ladder."""
    if isinstance(value, bool):
        return str(value).lower(), "literal", XSD + "boolean", None
    if isinstance(value, int):
        return str(value), "literal", XSD + "integer", None
    if isinstance(value, float):
        return str(value), "literal", XSD + "double", None
    s = str(value)
    # backslash-escaped specials force a plain literal with the
    # escapes removed ("\\<bar\\>" → "<bar>", "foo\\:bar" →
    # "foo:bar") — TermBuilder._parse nop semantics
    # (term_builder.py, asserted by the reference's own vectors in
    # tests/commons/ogm/test_term_builder.py)
    import re as _re

    if _re.search(r"\\[<>:]", s) or s.startswith("\\"):
        return _re.sub(r"\\(.)", r"\1", s), "literal", None, None
    # a quoted typed literal stays a literal even when its lexical
    # form is an IRI ('"http://…"^^xsd:string' → Literal, reference
    # vector test_term_builder.py:101-103) — check before IRI ladders
    if s.endswith("^^xsd:string") and s.startswith('"'):
        return s[1:-len('"^^xsd:string')], "literal", XSD + "string", None
    if s.startswith("<") and s.endswith(">"):
        inner = s[1:-1]
        if "://" in inner or inner.startswith("urn:"):
            return inner, "iri", None, None
        return base + inner, "iri", None, None
    if "://" in s or s.startswith("urn:"):
        return s, "iri", None, None
    pfx, sep, local = s.partition(":")
    if sep and pfx in prefixes:
        return prefixes[pfx] + local, "iri", None, None
    return s, "literal", None, None


def build_triples(
    spark: SparkSession,
    blueprint: Dict[str, Any],
    namespaces: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Blueprint dict (or parsed YAML) → triples DataFrame."""
    namespaces = dict(namespaces or {})
    base = namespaces.pop("@base", "urn:nil:")
    head = blueprint.get("$") or {}
    prefixes = {
        **DEFAULT_PREFIXES,
        **namespaces,
        **{str(k): str(v) for k, v in (head.get("prefix") or {}).items()},
    }
    body = {k: v for k, v in blueprint.items() if k != "$"}

    rows: List[tuple] = []
    for identifier, props in body.items():
        s, s_kind, _, _ = resolve_term(identifier, prefixes, base)
        if s_kind != "iri":
            s = base + str(identifier)
        t = props.get("$type")
        if t:
            o, _, _, _ = resolve_term(t, prefixes, base)
            rows.append((s, RDF + "type", o, "iri", None, None))
        label = props.get("$label")
        if label:
            rows.append((s, RDFS + "label", str(label), "literal", None, None))
        for prop, values in props.items():
            if prop.startswith("$"):
                continue
            p, p_kind, _, _ = resolve_term(prop, prefixes, base)
            if p_kind != "iri":
                raise ValueError(f"property {prop!r} does not resolve to an IRI")
            for v in values if isinstance(values, list) else [values]:
                o, kind, dt, lang = resolve_term(v, prefixes, base)
                rows.append((s, p, o, kind, dt, lang))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def build_triples_yaml(
    spark: SparkSession, yaml_text: str,
    namespaces: Optional[Dict[str, str]] = None,
) -> DataFrame:
    import yaml

    return build_triples(spark, yaml.safe_load(yaml_text), namespaces)


def rocrate_blueprint(
    name: str,
    description: str,
    parts: List[Dict[str, str]],
    base: str = "./",
) -> Dict[str, Any]:
    """RO-Crate metadata skeleton as a blueprint (the reference's
    RO-Crate builder wraps OGM the same way, robuilder.py:11-78)."""
    bp: Dict[str, Any] = {
        "$": {"prefix": {"schema": "https://schema.org/"}},
        "<ro-crate-metadata.json>": {
            "$type": "schema:CreativeWork",
            "schema:about": "<./>",
        },
        "<./>": {
            "$type": "schema:Dataset",
            "schema:name": "\\" + name,
            "schema:description": "\\" + description,
            "schema:hasPart": [f"<{p['id']}>" for p in parts],
        },
    }
    for p in parts:
        bp[f"<{p['id']}>"] = {
            "$type": "schema:MediaObject",
            "schema:name": "\\" + p.get("name", p["id"]),
        }
    return bp
