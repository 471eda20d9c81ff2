"""JSON-LD → triples (pure Python, expansion-algorithm subset).

Covers the JSON-LD 1.0/1.1 features that occur in Common-Crawl-style
embedded ``<script type="application/ld+json">`` blocks and the
reference fixtures (e.g.
/root/reference/tests/data/localhost_http_documentroot/mrgid.jsonld):

- ``@context``: prefix maps, ``@vocab``, ``@base``, term definitions
  with ``@id`` and type coercion (``"@type": "@id"`` or a datatype),
  ``@language`` defaults; contexts as arrays.
- node objects: ``@id``, ``@type`` (string or array), nested node
  objects (→ bnode or named node + edge), value objects
  (``@value``/``@language``/``@type``), arrays, ``@graph``,
  ``@list`` (→ rdf:first/rest chains), ``@set`` splicing,
  ``@reverse`` (node-level blocks and context terms), container
  maps (``@container``: ``@language`` / ``@index`` / ``@id``).
- scalars: str → xsd:string, bool → xsd:boolean, int → xsd:integer,
  float → xsd:double (JSON-LD value-to-RDF rules).

No remote-context fetching — batch pipelines cannot dereference at
parse time. Remote contexts resolve through an offline cache instead:
bundled defaults (KNOWN_REMOTE_CONTEXTS) plus a configurable local
context directory (``load_context_directory`` /
``PY_SEMA_SPARK_CONTEXT_DIR``); unknown URLs degrade to the active
@vocab/prefix mappings, matching an offline rdflib run.
"""

from __future__ import annotations

import json
import math
import re
from decimal import Decimal
from typing import Any, Dict, List, Optional
from urllib.parse import urljoin

from .terms import (
    ABS_IRI_RE as _ABS_IRI_RE,
    RDF_TYPE,
    XSD,
    Term,
    Triple,
    bnode,
    build_rdf_list,
    iri,
    literal,
)

_KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@graph",
    "@list", "@set", "@base", "@vocab", "@container", "@reverse",
    "@index", "@nest", "@none", "@json", "@direction", "@version",
    "@protected", "@prefix",
}


class JsonLdError(ValueError):
    pass


# Bundled stand-ins for the most common remote contexts on the web —
# "@context": "https://schema.org" is the dominant Common-Crawl shape
# and would otherwise lose every vocab-mapped property. The RO-Crate
# contexts are schema.org-term-for-term for the names that matter
# here; @vocab is a documented approximation of their full term lists
# (terms the real context omits map to schema.org IRIs instead of
# being dropped — recall 1.0, naming differs only for non-schema.org
# extension terms).
_SCHEMA_VOCAB = {"@vocab": "http://schema.org/"}
KNOWN_REMOTE_CONTEXTS: Dict[str, dict] = {
    "https://schema.org": _SCHEMA_VOCAB,
    "http://schema.org": _SCHEMA_VOCAB,
    "https://schema.org/docs/jsonld/schema.jsonld": _SCHEMA_VOCAB,
    "https://w3id.org/ro/crate/1.1/context": _SCHEMA_VOCAB,
    "https://w3id.org/ro/crate/1.2/context": _SCHEMA_VOCAB,
}

# The reference resolves any remote @context URL at parse time via
# rdflib's json-ld loader (/root/reference/sema/discovery/discovery.py
# guess_format + rdflib parse).  A batch corpus job cannot dereference
# URLs per row, so the equivalent here is an offline context cache: a
# directory of pre-fetched context documents registered before the job
# starts (ship it to executors with ``spark-submit --files`` /
# ``--archives``; loading is idempotent so each Python worker can call
# it).  Two ways to populate it:
#
# - ``register_remote_context(url, ctx)`` — programmatic;
# - ``load_context_directory(path)`` — reads every ``*.json`` /
#   ``*.jsonld`` file in ``path``.  A file maps to its URL via a
#   top-level ``"@id"`` key, or via an ``index.json`` manifest
#   ``{"<url>": "<filename>", ...}`` in the same directory.
#   The registered value is the file's ``"@context"`` entry.
#
# ``PY_SEMA_SPARK_CONTEXT_DIR`` (path) is honoured lazily on first
# parse, so executors pick the cache up from the environment without
# driver-side wiring.  Unknown URLs still degrade to the active
# @vocab/prefix mappings (pinned by tests), matching an offline rdflib
# run where the fetch fails.
_ENV_CONTEXT_DIR = "PY_SEMA_SPARK_CONTEXT_DIR"
_env_dir_loaded: Optional[str] = None


def register_remote_context(url: str, context: Any) -> None:
    """Register an offline copy of a remote @context document."""
    KNOWN_REMOTE_CONTEXTS[url.rstrip("/")] = context


def load_context_directory(path: str) -> int:
    """Register every context document found in ``path``; returns the
    number of URLs registered.  See module comment for the file format."""
    import os

    if not os.path.isdir(path):
        raise JsonLdError(f"context directory not found: {path}")
    manifest: Dict[str, str] = {}
    idx = os.path.join(path, "index.json")
    if os.path.isfile(idx):
        with open(idx, encoding="utf-8") as fh:
            raw = json.load(fh)
        if isinstance(raw, dict):
            manifest = {
                str(u): str(f) for u, f in raw.items() if isinstance(f, str)
            }
    by_file = {fname: url for url, fname in manifest.items()}
    n = 0
    for fname in sorted(os.listdir(path)):
        if fname == "index.json" or not fname.endswith((".json", ".jsonld")):
            continue
        try:
            with open(os.path.join(path, fname), encoding="utf-8") as fh:
                doc = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue  # a broken cache entry must not kill the job
        if not isinstance(doc, dict) or "@context" not in doc:
            continue
        url = by_file.get(fname) or (
            doc.get("@id") if isinstance(doc.get("@id"), str) else None
        )
        if url:
            register_remote_context(url, doc["@context"])
            n += 1
    return n


def _maybe_load_env_dir() -> None:
    global _env_dir_loaded
    import os

    path = os.environ.get(_ENV_CONTEXT_DIR)
    if path and path != _env_dir_loaded:
        _env_dir_loaded = path
        try:
            load_context_directory(path)
        except JsonLdError:
            pass  # missing dir on a node: degrade, don't crash the stage


def _flatten_set_items(vals: List[Any]) -> List[Any]:
    """Splice ``{"@set": […]}`` wrappers (recursively) into the value
    list — @set is a transparent array wrapper (JSON-LD §4.6.1)."""
    flat: List[Any] = []
    for v in vals:
        if isinstance(v, dict) and "@set" in v and "@list" not in v:
            items = v["@set"]
            flat.extend(
                _flatten_set_items(items if isinstance(items, list) else [items])
            )
        else:
            flat.append(v)
    return flat


class _Ctx:
    __slots__ = ("prefixes", "terms", "vocab", "base", "lang")

    def __init__(self, base: str):
        self.prefixes: Dict[str, str] = {}
        self.terms: Dict[str, dict] = {}
        self.vocab: Optional[str] = None
        self.base = base
        self.lang: Optional[str] = None

    def child(self) -> "_Ctx":
        c = _Ctx(self.base)
        c.prefixes = dict(self.prefixes)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.lang = self.lang
        return c


class _JsonLdToRdf:
    def __init__(self, base: str):
        self.base = base
        self.triples: List[Triple] = []
        self._bn = 0

    def _fresh_bnode(self) -> Term:
        self._bn += 1
        return bnode(f"jldb{self._bn}")

    # ----- context processing -----

    def _apply_context(self, ctx: _Ctx, context: Any) -> _Ctx:
        if context is None:
            return _Ctx(self.base)
        if isinstance(context, list):
            for c in context:
                ctx = self._apply_context(ctx, c)
            return ctx
        if isinstance(context, str):
            # remote contexts are never fetched at corpus scale;
            # well-known ones are bundled instead (KNOWN_REMOTE_CONTEXTS
            # — the standard offline-context practice). Unknown URLs
            # stay ignored, as before.
            bundled = KNOWN_REMOTE_CONTEXTS.get(context.rstrip("/"))
            if bundled is not None:
                return self._apply_context(ctx, bundled)
            return ctx
        if not isinstance(context, dict):
            return ctx
        ctx = ctx.child()
        if "@base" in context and isinstance(context["@base"], str):
            ctx.base = urljoin(ctx.base, context["@base"])
        if "@vocab" in context and isinstance(context["@vocab"], str):
            ctx.vocab = context["@vocab"]
        if "@language" in context:
            ctx.lang = context["@language"]
        # String term defs may themselves be compact IRIs or
        # vocab-relative terms ({"schema": "http://schema.org/",
        # "name": "schema:name"}) — IRI-expand them (JSON-LD create-
        # term-definition expands a string def's @id with vocab=true),
        # order-independently and with cycle detection.  A defined
        # prefix shadows scheme-likeness (same precedence _expand_iri
        # uses), so a cyclic pair like {"a": "b:x", "b": "a:y"} stays
        # unresolved (and its keys drop later) instead of compounding.
        inherited = dict(ctx.prefixes)
        raw: Dict[str, str] = {}
        for k, v in context.items():
            if not k.startswith("@") and isinstance(v, str):
                raw[k] = v

        def resolve_term(k: str, seen: frozenset) -> Optional[str]:
            if k in seen:
                return None
            v = raw.get(k)
            if v is None:
                pv = inherited.get(k)
                return pv if pv and _ABS_IRI_RE.match(pv) else None
            return resolve_value(v, seen | {k})

        def resolve_value(v: str, seen: frozenset) -> Optional[str]:
            if v in _KEYWORDS or v.startswith("@"):
                return None
            if v in raw or v in inherited:  # term-to-term alias
                r = resolve_term(v, seen)
                if r:
                    return r
            if ":" in v:
                pfx, _, local = v.partition(":")
                if not local.startswith("//") and (
                    pfx in raw or pfx in inherited
                ):
                    b = resolve_term(pfx, seen)
                    return b + local if b else None
                return v if _ABS_IRI_RE.match(v) else None
            if ctx.vocab:
                return ctx.vocab + v
            return None

        for k, v in raw.items():
            ctx.prefixes[k] = resolve_term(k, frozenset()) or v
        for k, v in context.items():
            if k.startswith("@") or not isinstance(v, dict):
                continue
            ctx.terms[k] = v
            if isinstance(v.get("@id"), str):
                ctx.prefixes[k] = self._expand_iri(ctx, v["@id"], vocab=True)
        return ctx

    # ----- IRI expansion -----

    def _expand_iri(self, ctx: _Ctx, value: str, vocab: bool = False) -> str:
        if value in _KEYWORDS:
            return value
        if value in ctx.prefixes and vocab:
            return ctx.prefixes[value]
        if ":" in value:
            pfx, _, local = value.partition(":")
            if pfx in ctx.prefixes and not local.startswith("//"):
                return ctx.prefixes[pfx] + local
            if _ABS_IRI_RE.match(value):
                return value
        if vocab and ctx.vocab:
            return ctx.vocab + value
        if not vocab and ctx.base:
            return urljoin(ctx.base, value)
        return value

    def _term_def(self, ctx: _Ctx, key: str) -> dict:
        return ctx.terms.get(key) or ctx.terms.get(
            self._expand_iri(ctx, key, vocab=True), {}
        )

    # ----- node processing -----

    def _node_subject(self, ctx: _Ctx, node: dict) -> Term:
        nid = node.get("@id")
        if isinstance(nid, str):
            if nid.startswith("_:"):
                return bnode(nid)
            return iri(self._expand_iri(ctx, nid))
        return self._fresh_bnode()

    def process(self, doc: Any) -> List[Triple]:
        ctx = _Ctx(self.base)
        self._process_node(ctx, doc)
        return self.triples

    def _process_node(self, ctx: _Ctx, node: Any) -> Optional[Term]:
        if isinstance(node, list):
            for item in node:
                self._process_node(ctx, item)
            return None
        if not isinstance(node, dict):
            return None
        if "@context" in node:
            ctx = self._apply_context(ctx, node["@context"])
        if "@graph" in node:
            self._process_node(ctx, node["@graph"])
            # a node with @graph may itself also carry properties
            rest = {
                k: v for k, v in node.items()
                if k not in ("@graph", "@context")
            }
            if not any(not k.startswith("@") or k == "@type" for k in rest):
                return None
        if "@value" in node:
            return None  # bare value object at top level: nothing to emit
        subj = self._node_subject(ctx, node)
        for key, value in node.items():
            if key in ("@context", "@id", "@graph"):
                continue
            if key == "@type":
                types = value if isinstance(value, list) else [value]
                for t in types:
                    if isinstance(t, str):
                        self.triples.append(
                            Triple(
                                subj,
                                iri(RDF_TYPE),
                                iri(self._expand_iri(ctx, t, vocab=True)),
                            )
                        )
                continue
            if key == "@reverse":
                # JSON-LD §4.8: {"@reverse": {p: nodes}} asserts
                # (node, p, subj) — object and subject swapped
                if isinstance(value, dict):
                    for rkey, rval in value.items():
                        r_iri = self._expand_iri(ctx, rkey, vocab=True)
                        if not _ABS_IRI_RE.match(r_iri):
                            continue
                        rvals = _flatten_set_items(
                            rval if isinstance(rval, list) else [rval]
                        )
                        for rv in rvals:
                            robj = self._to_object(
                                ctx, self._term_def(ctx, rkey), rv
                            )
                            if robj is not None and robj.kind in (
                                "iri", "bnode",
                            ):
                                self.triples.append(
                                    Triple(robj, iri(r_iri), subj)
                                )
                continue
            if key.startswith("@"):
                continue
            tdef = self._term_def(ctx, key)
            # a context term defined as {"@reverse": iri} inverts the
            # property direction for ALL its values (checked before the
            # abs-IRI guard: such a term has no forward IRI of its own)
            if "@reverse" in tdef:
                rev_iri = self._expand_iri(
                    ctx, tdef["@reverse"], vocab=True
                )
                rvals = _flatten_set_items(
                    value if isinstance(value, list) else [value]
                )
                # the term's own @type/@language coercions apply to the
                # reversed values (tdef, not {}): {"@reverse": p,
                # "@type": "@id"} must coerce string values to IRIs
                for rv in rvals:
                    robj = self._to_object(ctx, tdef, rv)
                    if robj is not None and robj.kind in ("iri", "bnode"):
                        self.triples.append(Triple(robj, iri(rev_iri), subj))
                continue
            pred_iri = self._expand_iri(ctx, key, vocab=True)
            if not _ABS_IRI_RE.match(pred_iri):
                continue  # un-expandable key: dropped (JSON-LD spec)
            container = tdef.get("@container")
            if isinstance(value, dict) and container == "@language":
                # language map (§4.2.4): key = tag, value = string(s)
                for tag, lv in value.items():
                    for one in lv if isinstance(lv, list) else [lv]:
                        if isinstance(one, str):
                            self.triples.append(
                                Triple(
                                    subj, iri(pred_iri),
                                    literal(one, lang=tag),
                                )
                            )
                continue
            if isinstance(value, dict) and container in ("@index", "@id"):
                # index map (§4.6.2): the map key is non-semantic
                # (or, for @id maps, the node's @id) — flatten values
                flat_vals: List[Any] = []
                for mkey, mv in value.items():
                    items = mv if isinstance(mv, list) else [mv]
                    if container == "@id":
                        items = [
                            (
                                {**it, "@id": it.get("@id", mkey)}
                                if isinstance(it, dict)
                                else it
                            )
                            for it in items
                        ]
                    flat_vals.extend(items)
                value = flat_vals
            vals = value if isinstance(value, list) else [value]
            # @set is plain array semantics (JSON-LD §4.6.1): splice its
            # items into the value list — one triple per item, not just
            # the first
            flat = _flatten_set_items(vals)
            for v in flat:
                obj = self._to_object(ctx, tdef, v)
                if obj is not None:
                    self.triples.append(Triple(subj, iri(pred_iri), obj))
        return subj

    def _to_object(self, ctx: _Ctx, tdef: dict, v: Any) -> Optional[Term]:
        if v is None:
            return None
        if isinstance(v, dict):
            if "@list" in v:
                items = v["@list"]
                if not isinstance(items, list):
                    items = [items]
                # @set is transparent even inside a list (§4.6.1):
                # {"@list": [{"@set": [1, 2]}, 3]} is the list (1 2 3)
                items = _flatten_set_items(items)
                objs = [self._to_object(ctx, tdef, it) for it in items]
                objs = [o for o in objs if o is not None]
                return build_rdf_list(objs, self._fresh_bnode, self.triples)
            if "@value" in v:
                val = v["@value"]
                if val is None:
                    return None
                lang = v.get("@language")
                dtype = v.get("@type")
                if isinstance(dtype, str):
                    dtype = self._expand_iri(ctx, dtype, vocab=True)
                lex, natural_dt = _scalar_lex(val)
                if dtype:
                    return literal(lex, datatype=dtype)
                if lang:
                    return literal(lex, lang=lang)
                return literal(lex, datatype=natural_dt)
            if "@set" in v:
                # call sites splice multi-item sets before conversion;
                # a @set reaching here is the residual 0/1-item case
                items = _flatten_set_items(
                    v["@set"] if isinstance(v["@set"], list) else [v["@set"]]
                )
                if not items:
                    return None
                return self._to_object(ctx, tdef, items[0])
            # nested node object
            sub = self._process_node(ctx, v)
            return sub
        # scalar
        coerce = tdef.get("@type")
        if isinstance(v, str):
            if coerce == "@id":
                if v.startswith("_:"):
                    return bnode(v)
                return iri(self._expand_iri(ctx, v))
            if isinstance(coerce, str) and coerce != "@id":
                return literal(v, datatype=self._expand_iri(ctx, coerce, vocab=True))
            tlang = tdef.get("@language", ctx.lang)
            if tlang:
                return literal(v, lang=tlang)
            return literal(v, datatype=XSD + "string")
        lex, natural_dt = _scalar_lex(v)
        if isinstance(coerce, str) and coerce != "@id":
            return literal(lex, datatype=self._expand_iri(ctx, coerce, vocab=True))
        return literal(lex, datatype=natural_dt)


def _scalar_lex(val: Any) -> tuple[str, str]:
    """JSON scalar → (lexical form, xsd datatype) per value-to-RDF rules."""
    if isinstance(val, bool):
        return ("true" if val else "false", XSD + "boolean")
    if isinstance(val, int):
        return (str(val), XSD + "integer")
    if isinstance(val, float):
        return (_canonical_double(val), XSD + "double")
    return (str(val), XSD + "string")


def _canonical_double(val: float) -> str:
    """Canonical xsd:double lexical form (one digit before the point,
    shortest round-trip mantissa, no exponent '+'): 1999.0 → "1.999E3".
    Non-finite JSON extensions map to the XSD lexical forms rather than
    crashing (json.loads accepts Infinity/NaN/1e999)."""
    if math.isnan(val):
        return "NaN"
    if math.isinf(val):
        return "INF" if val > 0 else "-INF"
    if val == 0.0:
        return "-0.0E0" if math.copysign(1.0, val) < 0 else "0.0E0"
    sign, digits, exp = Decimal(repr(val)).as_tuple()
    adjusted = exp + len(digits) - 1
    rest = "".join(map(str, digits[1:])).rstrip("0") or "0"
    return f"{'-' if sign else ''}{digits[0]}.{rest}E{adjusted}"


def parse_jsonld(text: str, base: str = "") -> List[Triple]:
    """Parse a JSON-LD document (string) into triples."""
    _maybe_load_env_dir()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise JsonLdError(f"not JSON: {e}") from e
    if not isinstance(doc, (dict, list)):
        raise JsonLdError("JSON-LD root must be object or array")
    conv = _JsonLdToRdf(base)
    return conv.process(doc)
