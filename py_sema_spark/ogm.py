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
            o, o_kind, _, _ = resolve_term(t, prefixes, base)
            if o_kind != "iri":
                # a bare word with no matching prefix is not a type
                # IRI; minting it as one would silently corrupt every
                # downstream rdf:type query
                raise ValueError(
                    f"$type {t!r} does not resolve to an IRI "
                    f"(prefixes: {sorted(prefixes)})"
                )
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
        # SCHEMA_NS (http://) — the RO-Crate 1.1 context maps schema: to
        # http://schema.org/, and rocrate_metadata_json compacts that
        # namespace; https here would leave full IRIs in the crate JSON
        "$": {"prefix": {"schema": SCHEMA_NS}},
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


# ---------------------------------------------------------------- ro creator

SCHEMA_NS = "http://schema.org/"


def resolve_yaml_load(text: str, env: Optional[Dict[str, str]] = None):
    """YAML load with the reference's ``!resolve`` tag: scalar values
    tagged ``!resolve`` substitute ``{KEY}`` references from the
    environment dict (commons/yml/loader.py:18-32)."""
    import yaml

    env = env or {}

    class _Loader(yaml.SafeLoader):
        pass

    def _resolve(loader, node):
        txt = loader.construct_scalar(node)
        try:
            return txt.format(**env)
        except (KeyError, ValueError, IndexError):
            # unknown placeholder OR literal braces ("size{>10}",
            # "{0}") — fall back to the raw text rather than aborting
            # the whole YAML load
            return txt

    _Loader.add_constructor("!resolve", _resolve)
    return yaml.load(text, Loader=_Loader)


def ro_creator_triples(
    spark: SparkSession,
    blueprint_text: str,
    env: Optional[Dict[str, str]] = None,
    crate_root: Optional[str] = None,
    base: str = "",
) -> DataFrame:
    """The reference's ROCreator as a triples builder
    (ro/creator/{roblueprint,robuilder,rocreator}.py):

    - ``!resolve`` env substitution in the blueprint YAML;
    - glob-pattern body keys expand against the crate directory
      (include/exclude via :mod:`..functions.globbery`); matched files
      default to ``$type: File``, directories to ``Dataset``;
    - explicit entries update the expanded ones; keys sorted for
      determinism (roblueprint.py:72-80);
    - a ``./`` root Dataset and an ``ro-crate-metadata.json``
      CreativeWork about it always exist;
    - every File becomes ``schema:hasPart`` of the root;
    - bare property names resolve in the RO-Crate context vocabulary
      (schema.org); bare values naming a body entry (or ``./``)
      resolve as IRIs.

    ``base`` prefixes relative identifiers (the reference uses
    ``@base urn:rocreator:``; empty keeps them crate-relative, which is
    how the metadata file renders them anyway)."""
    from copy import deepcopy

    data = resolve_yaml_load(blueprint_text, env)
    head = {str(k): v for k, v in (data.pop("$", None) or {}).items()}
    prefixes = {
        **DEFAULT_PREFIXES,
        "schema": SCHEMA_NS,
        "dc": "http://purl.org/dc/terms/",
        **{str(k): str(v) for k, v in (head.get("prefix") or {}).items()},
    }
    implicit = {k: v for k, v in data.items() if "*" in k}
    explicit = {k: v for k, v in data.items() if "*" not in k}
    if head.get("glob_walk"):
        implicit.setdefault("**/*", {})

    body: Dict[str, Dict[str, Any]] = {}
    if implicit:
        if not crate_root:
            raise ValueError("glob-pattern entries require crate_root")
        from .functions.globbery import matching_glob_paths

        from pathlib import Path as _P

        for pattern, props in implicit.items():
            for path in matching_glob_paths(
                crate_root, pattern, head.get("glob_ignore") or [],
            ):
                entry = deepcopy(props)
                if (_P(crate_root) / path).is_file():
                    entry.setdefault("$type", "File")
                else:
                    entry.setdefault("$type", "Dataset")
                body[path.as_posix()] = entry
    for identifier, props in explicit.items():
        if identifier in body:
            body[identifier].update(props or {})
        else:
            body[identifier] = dict(props or {})
    body = dict(sorted(body.items()))

    # the two structural nodes (robuilder.py:38-49)
    body.setdefault("./", {}).setdefault("$type", "Dataset")
    meta = body.setdefault("ro-crate-metadata.json", {})
    meta.setdefault("$type", "CreativeWork")
    meta.setdefault("about", "./")

    node_ids = set(body.keys())

    def node_iri(identifier: str) -> str:
        if "://" in identifier or identifier.startswith("urn:"):
            return identifier
        return base + identifier

    rows: List[tuple] = []
    for identifier, props in body.items():
        s = node_iri(identifier)
        t = props.get("$type")
        if t:
            o, kind, _, _ = resolve_term(t, prefixes, base)
            if kind != "iri":
                o = SCHEMA_NS + str(t)
            rows.append((s, RDF + "type", o, "iri", None, None))
        label = props.get("$label")
        if label:
            rows.append((s, RDFS + "label", str(label), "literal", None, None))
        for prop, values in props.items():
            if prop.startswith("$"):
                continue
            p, p_kind, _, _ = resolve_term(prop, prefixes, base)
            if p_kind != "iri":
                p = SCHEMA_NS + prop  # crate-context vocabulary
            for v in values if isinstance(values, list) else [values]:
                if isinstance(v, str) and (v in node_ids or v == "./"):
                    rows.append((s, p, node_iri(v), "iri", None, None))
                    continue
                o, kind, dt, lang = resolve_term(v, prefixes, base)
                rows.append((s, p, o, kind, dt, lang))
        if props.get("$type") == "File":
            rows.append((
                node_iri("./"), SCHEMA_NS + "hasPart",
                node_iri(identifier), "iri", None, None,
            ))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def rocrate_metadata_json(
    triples: DataFrame,
    context: str = "https://w3id.org/ro/crate/1.2/context",
) -> str:
    """Deterministic RO-Crate metadata document from a triples frame:
    nodes sorted by @id, keys sorted, schema.org property IRIs
    compacted to the crate context's bare names (the reference
    serializes through rdflib's json-ld compaction,
    rocreator.py:37-47; byte output differs, semantics match)."""
    import json

    nodes: Dict[str, Dict[str, Any]] = {}
    for r in triples.collect():
        node = nodes.setdefault(r["s"], {"@id": r["s"]})
        p, o, kind = r["p"], r["o"], r["o_kind"]
        if p == RDF + "type":
            key, val = "@type", o.split("/")[-1].split("#")[-1]
        else:
            key = p[len(SCHEMA_NS):] if p.startswith(SCHEMA_NS) else p
            val = {"@id": o} if kind == "iri" else o
        if key in node:
            if not isinstance(node[key], list):
                node[key] = [node[key]]
            node[key].append(val)
        else:
            node[key] = val

    def _norm(v):
        if isinstance(v, list):
            return sorted(
                v, key=lambda x: json.dumps(x, sort_keys=True)
            )
        return v

    graph = [
        {k: _norm(v) for k, v in sorted(nodes[s].items())}
        for s in sorted(nodes)
    ]
    return json.dumps(
        {"@context": context, "@graph": graph},
        indent=4, sort_keys=False, ensure_ascii=False,
    )
