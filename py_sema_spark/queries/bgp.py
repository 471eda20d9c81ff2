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
[``@lang`` | ``^^dt``], plus ``OPTIONAL { … }`` groups (left joins,
J3), ``FILTER`` with regex / langMatches / lang-eq / (in)equality
(F7/F8), ORDER BY and LIMIT. UNION and property paths stay with the
``{…} UNION {…}`` blocks (branches must bind the same variables).
Property paths stay with :mod:`..operators.closure`.

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


class Filter:
    """One supported FILTER shape: regex / langMatches / lang-eq /
    var-eq (exactly the predicates the reference templates use —
    SURVEY.md §2.2 F7/F8)."""

    __slots__ = ("kind", "var", "arg", "flags")

    def __init__(self, kind: str, var: str, arg: str, flags: str = ""):
        self.kind, self.var, self.arg, self.flags = kind, var, arg, flags


def _parse_filter(expr: str) -> Filter:
    expr = expr.strip()
    m = re.match(
        r'(?is)^regex\s*\(\s*(?:str\s*\(\s*)?\?(\w+)\s*\)?\s*,\s*"([^"]*)"'
        r'\s*(?:,\s*"([^"]*)")?\s*\)$',
        expr,
    )
    if m:
        return Filter("regex", m.group(1), m.group(2), m.group(3) or "")
    m = re.match(
        r'(?is)^langMatches\s*\(\s*lang\s*\(\s*\?(\w+)\s*\)\s*,\s*"([^"]*)"\s*\)$',
        expr,
    )
    if m:
        return Filter("langmatches", m.group(1), m.group(2))
    m = re.match(
        r'(?is)^lang\s*\(\s*\?(\w+)\s*\)\s*=\s*"([^"]*)"$', expr
    )
    if m:
        return Filter("langeq", m.group(1), m.group(2))
    m = re.match(r'(?is)^\?(\w+)\s*(!?=)\s*"([^"]*)"$', expr)
    if m:
        return Filter("eq" if m.group(2) == "=" else "neq", m.group(1), m.group(3))
    m = re.match(r"(?is)^\?(\w+)\s*(!?=)\s*<([^>]*)>$", expr)
    if m:
        return Filter("eq" if m.group(2) == "=" else "neq", m.group(1), m.group(3))
    raise ValueError(f"unsupported FILTER expression: {expr!r}")


def _parse_patterns(text: str, prefixes) -> List[Tuple[Term, Term, Term]]:
    """Tokenize first, then treat '.' as a statement separator only
    *between* term tokens — dots inside <IRI>s, quoted literals, and
    dotted CURIE locals (ex:v1.0) are part of the term, never a split
    point. A CURIE token that swallowed a trailing '.' (PN_LOCAL
    cannot end with one) is stripped and counts as a terminator."""
    patterns: List[Tuple[Term, Term, Term]] = []
    cur: List[Term] = []

    def flush(ctx: str) -> None:
        if not cur:
            return
        if len(cur) != 3:
            raise ValueError(f"unsupported triple pattern: {ctx!r}")
        patterns.append(tuple(cur))
        cur.clear()

    last_end = 0
    for tok in _TERM_RE.finditer(text):
        sep = text[last_end : tok.start()]
        if "." in sep:
            flush(text[max(0, tok.start() - 60) : tok.start()])
        term = _parse_term(tok, prefixes)
        dot_after = False
        if tok.group("curie") and term.value.endswith("."):
            term.value = term.value.rstrip(".")
            dot_after = True
        cur.append(term)
        if dot_after:
            flush(text[tok.start() : tok.end()])
        last_end = tok.end()
    flush(text[last_end:][:60] or text[-60:])
    return patterns


def parse_select(
    sparql: str, prefixes: Optional[Dict[str, str]] = None
):
    """→ (proj vars, distinct, patterns, optional groups, filters,
    order_by, limit)."""
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
        r"\s*(?:ORDER\s+BY\s+(?P<order>[?\w\s]+?))?"
        r"\s*(?:LIMIT\s+(?P<limit>\d+))?\s*$",
        body,
    )
    if not m:
        raise ValueError(f"unsupported SPARQL (BGP subset): {sparql!r}")
    distinct = bool(m.group(1))
    proj_raw = m.group("proj").strip()
    limit = int(m.group("limit")) if m.group("limit") else None
    order_by = (
        [v[1:] for v in m.group("order").split() if v.startswith("?")]
        if m.group("order")
        else []
    )

    where = m.group("w")
    optionals = []
    for om in re.finditer(r"(?is)OPTIONAL\s*\{([^{}]*)\}", where):
        optionals.append(_parse_patterns(om.group(1), prefixes))
    where = re.sub(r"(?is)OPTIONAL\s*\{[^{}]*\}", " ", where)

    # { g1 } UNION { g2 } [UNION { g3 } …] — one union block supported
    unions = []
    um = re.search(
        r"(?is)\{([^{}]*)\}(\s*UNION\s*\{[^{}]*\})+", where
    )
    if um:
        block = um.group(0)
        for bm in re.finditer(r"\{([^{}]*)\}", block):
            unions.append(_parse_patterns(bm.group(1), prefixes))
        where = where.replace(block, " ")

    # FILTER bodies nest parens two deep (regex(str(?x), …))
    _depth2 = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"
    filters = []
    for fm in re.finditer(r"(?is)FILTER\s*\((" + _depth2 + r")\)", where):
        filters.append(_parse_filter(fm.group(1)))
    where = re.sub(r"(?is)FILTER\s*\(" + _depth2 + r"\)\s*\.?", " ", where)

    patterns = _parse_patterns(where, prefixes)

    if proj_raw == "*":
        seen = []
        for tp in patterns + [p for g in optionals for p in g] + [
            p for g in unions for p in g
        ]:
            for t in tp:
                if t.kind == "var" and t.value not in seen:
                    seen.append(t.value)
        proj = seen
    else:
        proj = [v[1:] for v in proj_raw.split() if v.startswith("?")]
    return (
        proj, distinct, patterns, optionals, unions, filters, order_by, limit
    )


def _compile_patterns(
    triples: DataFrame,
    patterns: List[Tuple[Term, Term, Term]],
    lang_vars: set,
    tag: str = "",
) -> Optional[DataFrame]:
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
                if pos == "o" and term.value in lang_vars:
                    cols.append(F.col("o_lang").alias(term.value + "__lang"))
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
            cols = [F.col(pos).alias(var) for var, pos in pos_of.items()]
        # fully-bound pattern = existence gate: empty slice → empty
        # result, non-empty → no row multiplication
        part = (
            df.select(*cols)
            if cols
            else df.limit(1).select(F.lit(1).alias(f"_m{tag}{i}"))
        )
        if plan is None:
            plan = part
        else:
            shared = [c for c in plan.columns if c in part.columns]
            plan = plan.join(part, shared) if shared else plan.crossJoin(part)
    return plan


def _apply_filter(plan: DataFrame, f: Filter) -> DataFrame:
    if f.var not in plan.columns:
        raise ValueError(f"FILTER references unbound var ?{f.var}")
    col = F.col(f.var)
    if f.kind == "regex":
        pat = ("(?i)" if "i" in f.flags else "") + f.arg
        return plan.where(col.rlike(pat))
    if f.kind in ("langmatches", "langeq"):
        lang_col = F.lower(F.coalesce(F.col(f.var + "__lang"), F.lit("")))
        want = f.arg.lower()
        if f.kind == "langmatches":
            return plan.where(
                (lang_col == want) | lang_col.startswith(want + "-")
            )
        return plan.where(lang_col == want)
    if f.kind == "eq":
        return plan.where(col == f.arg)
    if f.kind == "neq":
        return plan.where(col != f.arg)
    raise ValueError(f.kind)


def bgp_select(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Compile + run a BGP SELECT (with OPTIONAL / FILTER / ORDER BY /
    LIMIT) against a triples DataFrame; columns are the projected
    variable names. OPTIONAL groups compile to left joins on their
    shared variables (J3); FILTERs to post-join predicates, which
    Catalyst pushes down into the pattern slices where legal."""
    proj, distinct, patterns, optionals, unions, filters, order_by, limit = (
        parse_select(sparql, prefixes)
    )
    lang_vars = {
        f.var for f in filters if f.kind in ("langmatches", "langeq")
    }

    plan = _compile_patterns(triples, patterns, lang_vars)
    if unions:
        branches = [
            _compile_patterns(triples, g, lang_vars, tag=f"u{k}")
            for k, g in enumerate(unions)
        ]
        # SPARQL union: vars unbound in a branch come through as null
        all_cols = []
        for b in branches:
            for c in b.columns:
                if c not in all_cols:
                    all_cols.append(c)
        aligned = []
        for b in branches:
            for c in all_cols:
                if c not in b.columns:
                    b = b.withColumn(c, F.lit(None).cast("string"))
            aligned.append(b.select(*all_cols))
        ublock = aligned[0]
        for b in aligned[1:]:
            ublock = ublock.unionByName(b)
        if plan is None:
            plan = ublock
        else:
            shared = [c for c in plan.columns if c in ublock.columns]
            plan = (
                plan.join(ublock, shared) if shared else plan.crossJoin(ublock)
            )
    if plan is None:
        raise ValueError("empty WHERE clause")
    for group in optionals:
        sub = _compile_patterns(triples, group, lang_vars, tag="o")
        shared = [c for c in plan.columns if c in sub.columns]
        if not shared:
            raise ValueError("OPTIONAL group shares no variable with base")
        plan = plan.join(sub, shared, "left")
    for f in filters:
        plan = _apply_filter(plan, f)

    missing = [v for v in proj if v not in plan.columns]
    if missing:
        raise ValueError(f"projected vars not bound: {missing}")
    out = plan.select(*proj)
    if distinct:
        out = out.distinct()
    if order_by:
        out = out.orderBy(*order_by)
    if limit is not None:
        out = out.limit(limit)
    return out
