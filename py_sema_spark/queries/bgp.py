"""Minimal SPARQL SELECT compiler: basic graph patterns → DataFrame
plans.

The reference evaluates SPARQL through rdflib's interpreter (nested
loops over in-memory triple indexes — SURVEY.md §4); here every triple
pattern becomes a filtered slice of the triples table and shared
variables become equi-joins, which Catalyst then reorders/broadcasts
(§2.3 J1: "all joins are implicit in SPARQL basic graph patterns").

Supported subset — what the reference's own configs/templates actually
use for *programmatic* queries (harvest subject selection,
config_build.py:80-116): ``SELECT [DISTINCT] ?v… | * WHERE { tp . tp …
}`` with terms ``?var``, ``<iri>``, ``curie:ref``, ``"literal"``
[``@lang`` | ``^^dt``], plus LIMIT. The templated analytic queries
live as dedicated builders in :mod:`.sparqlets`; FILTER/OPTIONAL/UNION
shapes are exercised there.

Scale: each pattern with a bound predicate prunes to its predicate
slice before any join (pushdown on ``p``); bound subjects/objects
prune further. Join order is left to Catalyst/AQE — with statistics,
selective slices broadcast automatically.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(
    r"""\?(?P<var>[A-Za-z_][A-Za-z0-9_]*)
      | <(?P<iri>[^>]*)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z-]+)|\^\^(?P<dt>\S+))?
      | (?P<a>\ba\b)
      | (?P<curie>[A-Za-z_][\w.-]*:[\w.%-]*)
    """,
    re.VERBOSE,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class Term:
    __slots__ = ("kind", "value", "lang", "dt")

    def __init__(self, kind, value, lang=None, dt=None):
        self.kind, self.value, self.lang, self.dt = kind, value, lang, dt


def _expand(curie: str, prefixes: Dict[str, str]) -> str:
    pfx, _, local = curie.partition(":")
    if pfx not in prefixes:
        raise ValueError(f"unknown prefix {pfx!r} in {curie!r}")
    return prefixes[pfx] + local


def _parse_term(tok: re.Match, prefixes: Dict[str, str]) -> Term:
    if tok.group("var"):
        return Term("var", tok.group("var"))
    if tok.group("iri") is not None:
        return Term("iri", tok.group("iri"))
    if tok.group("lit") is not None:
        val = re.sub(r"\\(.)", r"\1", tok.group("lit"))
        dt = tok.group("dt")
        if dt and not dt.startswith("<"):
            dt = _expand(dt, prefixes)
        elif dt:
            dt = dt.strip("<>")
        return Term("literal", val, tok.group("lang"), dt)
    if tok.group("a"):
        return Term("iri", RDF_TYPE)
    return Term("iri", _expand(tok.group("curie"), prefixes))


def parse_select(
    sparql: str, prefixes: Optional[Dict[str, str]] = None
) -> Tuple[List[str], bool, List[Tuple[Term, Term, Term]], Optional[int]]:
    """→ (projected vars, distinct, patterns, limit)."""
    prefixes = dict(prefixes or {})
    # inline PREFIX declarations (resolve_sparql-style injection,
    # /root/reference/sema/harvest/helper.py:39-43)
    for m in re.finditer(
        r"(?i)\bPREFIX\s+([A-Za-z_][\w.-]*):\s*<([^>]*)>", sparql
    ):
        prefixes[m.group(1)] = m.group(2)
    body = re.sub(r"(?i)\bPREFIX\s+[A-Za-z_][\w.-]*:\s*<[^>]*>", "", sparql)

    m = re.search(
        r"(?is)\bSELECT\s+(DISTINCT\s+)?(?P<proj>.*?)\s*WHERE\s*\{(?P<w>.*)\}"
        r"\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
        body,
    )
    if not m:
        raise ValueError(f"unsupported SPARQL (BGP subset): {sparql!r}")
    distinct = bool(m.group(1))
    proj_raw = m.group("proj").strip()
    limit = int(m.group("limit")) if m.group("limit") else None

    patterns = []
    for chunk in m.group("w").split("."):
        chunk = chunk.strip()
        if not chunk:
            continue
        terms = [
            _parse_term(t, prefixes) for t in _TERM_RE.finditer(chunk)
        ]
        if len(terms) != 3:
            raise ValueError(f"unsupported triple pattern: {chunk!r}")
        patterns.append(tuple(terms))

    if proj_raw == "*":
        seen = []
        for tp in patterns:
            for t in tp:
                if t.kind == "var" and t.value not in seen:
                    seen.append(t.value)
        proj = seen
    else:
        proj = [v[1:] for v in proj_raw.split() if v.startswith("?")]
    return proj, distinct, patterns, limit


def bgp_select(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Compile + run a BGP SELECT against a triples DataFrame; columns
    are the projected variable names."""
    proj, distinct, patterns, limit = parse_select(sparql, prefixes)

    plan = None
    for i, (s, p, o) in enumerate(patterns):
        df = triples
        cols = []
        for pos, term, kind_col in (
            ("s", s, None),
            ("p", p, None),
            ("o", o, "o_kind"),
        ):
            if term.kind == "var":
                cols.append(F.col(pos).alias(term.value))
            elif term.kind == "iri":
                df = df.where(F.col(pos) == term.value)
                if kind_col:
                    df = df.where(F.col(kind_col) == "iri")
            else:  # literal (object position)
                df = df.where(
                    (F.col(pos) == term.value) & (F.col("o_kind") == "literal")
                )
                if term.lang:
                    df = df.where(F.col("o_lang") == term.lang)
                if term.dt:
                    df = df.where(F.col("o_datatype") == term.dt)
        # repeated variable within one pattern → equality filter
        names = [t.value for t in (s, p, o) if t.kind == "var"]
        if len(set(names)) != len(names):
            pos_of = {}
            for pos, t in (("s", s), ("p", p), ("o", o)):
                if t.kind == "var":
                    if t.value in pos_of:
                        df = df.where(F.col(pos) == F.col(pos_of[t.value]))
                    else:
                        pos_of[t.value] = pos
            cols = [
                F.col(pos).alias(var) for var, pos in pos_of.items()
            ]
        # fully-bound pattern = existence gate: empty slice → empty
        # result, non-empty → no row multiplication
        part = (
            df.select(*cols)
            if cols
            else df.limit(1).select(F.lit(1).alias(f"_m{i}"))
        )
        if plan is None:
            plan = part
        else:
            shared = [c for c in plan.columns if c in part.columns]
            plan = plan.join(part, shared) if shared else plan.crossJoin(part)
    if plan is None:
        raise ValueError("empty WHERE clause")
    missing = [v for v in proj if v not in plan.columns]
    if missing:
        raise ValueError(f"projected vars not bound: {missing}")
    out = plan.select(*proj)
    if distinct:
        out = out.distinct()
    if limit is not None:
        out = out.limit(limit)
    return out
