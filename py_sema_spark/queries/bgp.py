"""SPARQL SELECT compiler: graph patterns → DataFrame plans.

The reference evaluates SPARQL through rdflib's interpreter (nested
loops over in-memory triple indexes — SURVEY.md §4); here every triple
pattern becomes a filtered slice of the triples table and shared
variables become equi-joins, which Catalyst then reorders/broadcasts
(§2.3 J1: "all joins are implicit in SPARQL basic graph patterns").

Supported subset::

    SELECT [DISTINCT] ?v… | * | (AGG(…) AS ?a)…
    WHERE {
      tp .  tp …                        # triple patterns; predicate
                                        # may be a property path:
                                        #   iri  ^p  p1/p2  p1|p2
                                        #   p+  p*  p?  !(p1|p2)  (…)
      OPTIONAL { … }                    # left join (J3)
      MINUS { … }                       # anti join on shared vars
      { SELECT … }                      # sub-query (compiled
                                        # recursively, joined on
                                        # shared vars)
      { … } UNION { … }                 # one union block
      GRAPH ?g { … } | GRAPH <iri> { … }  # named-graph blocks over a
                                        # quads table (g column); the
                                        # reference's store is named-
                                        # graph partitioned (F10)
      FILTER(expr)                      # sparql_expr subset, JVM-side
      FILTER [NOT] EXISTS { … }         # semi / anti join
      BIND(expr AS ?v)
      VALUES ?v { … } | VALUES (?a ?b) { (…) … }
    }
    GROUP BY ?v…  HAVING(expr-over-aggregates)
    ORDER BY [ASC|DESC(?v)] ?v …  LIMIT n  OFFSET n

Aggregates: COUNT(*) / COUNT([DISTINCT] ?v) / SUM / AVG / MIN / MAX /
SAMPLE / GROUP_CONCAT(?v; SEPARATOR="…"). Determinism choices (the
spec leaves them open, the DuckDB oracles mirror them): SAMPLE = MIN;
GROUP_CONCAT concatenates in sorted order.

NESTED group graph patterns (OPTIONAL inside OPTIONAL, FILTER/BIND/
sub-SELECT scoped inside a group, UNION branches with their own
groups, …) are NOT handled by the flat extractor here — it refuses
them with NotImplementedError and :func:`bgp_select` falls back to
the recursive §18.2 algebra compiler in :mod:`.algebra`, which also
covers compatible-mapping joins over maybe-bound variables.

Scale: each pattern with a bound predicate prunes to its predicate
slice before any join (pushdown on ``p``); bound subjects/objects
prune further; VALUES compiles to a broadcast join; EXISTS/NOT EXISTS
to LeftSemi/LeftAnti; transitive path modifiers (`+`/`*`) reuse
:mod:`..operators.closure` (one shuffle per doubling round). Join
order is left to Catalyst/AQE — with statistics, selective slices
broadcast automatically.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sparql_expr import XSD_STRING, ColsResolver, Resolver, parse_expr

_TERM_RE = re.compile(
    r"""\?(?P<var>[A-Za-z_][A-Za-z0-9_]*)
      | <(?P<iri>[^>]*)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z-]+)
          |\^\^(?P<dt><[^>\s]*>|[A-Za-z_][\w.-]*:(?:[\w%-]|\.(?=[\w%-]))*))?
      | (?P<a>\ba\b)
      | (?P<curie>(?:[A-Za-z_][\w.-]*)?:[\w.%-]*)
    """,
    re.VERBOSE,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class Term:
    __slots__ = ("kind", "value", "lang", "dt")

    def __init__(self, kind, value, lang=None, dt=None):
        self.kind, self.value, self.lang, self.dt = kind, value, lang, dt


# ---------------------------------------------------------------------
# property paths
# ---------------------------------------------------------------------


class Path:
    """AST for SPARQL 1.1 §18.2 property paths (subset, see module
    docstring). ``op`` ∈ iri|seq|alt|inv|plus|star|opt|neg."""

    __slots__ = ("op", "args")

    def __init__(self, op: str, args):
        self.op, self.args = op, args

    @property
    def is_simple_iri(self) -> bool:
        return self.op == "iri"


class _PathParser:
    """Recursive descent over a statement's (Term | op-char) items."""

    def __init__(self, items: list):
        self.items, self.i = items, 0

    def peek(self):
        return self.items[self.i] if self.i < len(self.items) else None

    def next(self):
        it = self.peek()
        self.i += 1
        return it

    def accept(self, ch: str) -> bool:
        if isinstance(self.peek(), str) and self.peek() == ch:
            self.i += 1
            return True
        return False

    def parse(self) -> Path:
        p = self.alt()
        if self.peek() is not None:
            raise ValueError(f"trailing path tokens: {self.items[self.i:]!r}")
        return p

    def alt(self) -> Path:
        branches = [self.seq()]
        while self.accept("|"):
            branches.append(self.seq())
        return branches[0] if len(branches) == 1 else Path("alt", branches)

    def seq(self) -> Path:
        steps = [self.elt_or_inv()]
        while self.accept("/"):
            steps.append(self.elt_or_inv())
        out = steps[0]
        for s in steps[1:]:
            out = Path("seq", [out, s])
        return out

    def elt_or_inv(self) -> Path:
        if self.accept("^"):
            return Path("inv", [self.elt()])
        return self.elt()

    def elt(self) -> Path:
        p = self.primary()
        if self.accept("+"):
            return Path("plus", [p])
        if self.accept("*"):
            return Path("star", [p])
        if self.accept("?"):
            return Path("opt", [p])
        return p

    def primary(self) -> Path:
        it = self.peek()
        if self.accept("!"):
            if self.accept("("):
                iris = []
                while True:
                    t = self.next()
                    if not isinstance(t, Term) or t.kind != "iri":
                        raise ValueError("negated property set must list IRIs")
                    iris.append(t.value)
                    if self.accept(")"):
                        break
                    if not self.accept("|"):
                        raise ValueError("expected | or ) in negated set")
                return Path("neg", iris)
            t = self.next()
            if not isinstance(t, Term) or t.kind != "iri":
                raise ValueError("negated property must be an IRI")
            return Path("neg", [t.value])
        if self.accept("("):
            p = self.alt()
            if not self.accept(")"):
                raise ValueError("unbalanced ( in property path")
            return p
        it = self.next()
        if not isinstance(it, Term) or it.kind != "iri":
            raise ValueError(f"expected IRI in property path, got {it!r}")
        return Path("iri", it.value)


def _compile_path(triples: DataFrame, path: Path) -> DataFrame:
    """Path → (src, dst) pair relation. Closure modifiers (+ * ?) are
    duplicate-free per the spec's ALP; other combinators keep join
    multiplicity."""
    from ..operators.closure import transitive_closure

    if path.op == "iri":
        return triples.where(F.col("p") == path.args).select(
            F.col("s").alias("src"), F.col("o").alias("dst")
        )
    if path.op == "neg":
        return triples.where(~F.col("p").isin(*path.args)).select(
            F.col("s").alias("src"), F.col("o").alias("dst")
        )
    if path.op == "inv":
        inner = _compile_path(triples, path.args[0])
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if path.op == "seq":
        a = _compile_path(triples, path.args[0]).alias("pa")
        b = _compile_path(triples, path.args[1]).alias("pb")
        return a.join(b, F.col("pa.dst") == F.col("pb.src")).select(
            F.col("pa.src").alias("src"), F.col("pb.dst").alias("dst")
        )
    if path.op == "alt":
        out = None
        for branch in path.args:
            part = _compile_path(triples, branch)
            out = part if out is None else out.unionByName(part)
        return out
    if path.op == "plus":
        pairs = _compile_path(triples, path.args[0])
        return transitive_closure(
            pairs, "src", "dst", with_distance=False
        ).select("src", "dst")
    if path.op in ("star", "opt"):
        pairs = _compile_path(triples, path.args[0])
        reach = (
            transitive_closure(pairs, "src", "dst", with_distance=False).select(
                "src", "dst"
            )
            if path.op == "star"
            else pairs.distinct()
        )
        # zero-length component: every term of the graph paired with
        # itself (SPARQL §18.4 ALP zero-length evaluation)
        nodes = (
            triples.select(F.col("s").alias("n"))
            .unionByName(triples.select(F.col("o").alias("n")))
            .distinct()
        )
        zero = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        return reach.unionByName(zero).distinct()
    raise ValueError(path.op)


# ---------------------------------------------------------------------
# term / filter parsing
# ---------------------------------------------------------------------


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
        # full ECHAR + UCHAR decoding, shared with the expression
        # tokenizer (pre-r5 this dropped the backslash but left \n/\t
        # and \uXXXX undecoded in triple-pattern literals)
        from .sparql_expr import unescape_sparql_string

        val = unescape_sparql_string(tok.group("lit"))
        dt = tok.group("dt")
        if dt and not dt.startswith("<"):
            dt = _expand(dt, prefixes)
        elif dt:
            dt = dt.strip("<>")
        return Term("literal", val, tok.group("lang"), dt)
    if tok.group("a"):
        return Term("iri", RDF_TYPE)
    return Term("iri", _expand(tok.group("curie"), prefixes))


_VALUES_EXTRA_RE = re.compile(
    r"(?P<num>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<bool>true|false)|(?P<undef>UNDEF)",
    re.IGNORECASE,
)


def _values_row_terms(text: str, prefixes: Dict[str, str]) -> List[str]:
    """Tokenize one VALUES row: RDF terms plus the bare numeric /
    boolean shorthands the grammar allows (previously these were
    silently skipped, turning ``VALUES ?x { 1 2 3 }`` into zero rows).
    UNDEF parses to None — a partial binding. The flat path refuses
    those rows (its VALUES join is a plain equi-join) and routes to
    the algebra compiler, whose compatible-mapping join gives UNDEF
    its §10.2 semantics (joins with anything, stays unbound)."""
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        m = _TERM_RE.match(text, i)
        if m and m.end() > i:
            out.append(_parse_term(m, prefixes).value)
            i = m.end()
            continue
        m = _VALUES_EXTRA_RE.match(text, i)
        if m:
            if m.group("undef"):
                out.append(None)
            else:
                out.append(
                    m.group(0).lower() if m.group("bool") else m.group(0)
                )
            i = m.end()
            continue
        raise ValueError(f"unsupported VALUES token at {text[i:]!r}")
    return out


_PATH_OPS = set("/|^+*?()!")


_IRI_TOKEN = re.compile(r"<[^<>\"{}|^`\\\s]*>")


def _skip_token(text: str, i: int) -> int:
    """The ONE quote/IRI-aware skip for every hand scanner in this
    package: if ``text[i]`` opens a quoted string ('" or '), return
    the index past its close (escape-aware); if it opens an IRI
    (``<`` immediately followed by IRI characters up to ``>`` — NOT a
    comparison operator, which is followed by whitespace/operands),
    return the index past ``>``. Otherwise return ``i`` unchanged
    (the caller treats the character normally)."""
    c = text[i]
    if c in "\"'":
        j = i + 1
        n = len(text)
        while j < n and text[j] != c:
            j += 2 if text[j] == "\\" else 1
        return j + 1
    if c == "<":
        m = _IRI_TOKEN.match(text, i)
        if m:
            return m.end()
    return i


_BN_COUNTER = [0]


def _desugar_bnode_lists(text: str) -> str:
    """Turtle-style blank-node syntax in triple patterns → fresh
    variables: ``[]`` becomes ``?__bnN``; ``[ p o ; p2 o2 ]`` becomes
    ``?__bnN`` in place plus an appended ``?__bnN p o ; p2 o2``
    statement (nested brackets recurse). Blank-node labels scope to
    one BGP (§19.6), so appending within the same pattern text is
    exact; the synthetic ``__bn`` vars join like any var but are
    excluded from SELECT * (rdflib likewise hides bnode bindings
    behind its own labels)."""
    out: List[str] = []
    pending: List[Tuple[str, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        j = _skip_token(text, i)
        if j != i:
            out.append(text[i:j])
            i = j
            continue
        if c == "[":
            depth = 0
            j = i
            while j < n:
                cj = text[j]
                if cj == '"':
                    j += 1
                    while j < n and text[j] != '"':
                        j += 2 if text[j] == "\\" else 1
                elif cj == "[":
                    depth += 1
                elif cj == "]":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                raise ValueError(f"unbalanced brackets in {text[i:i+60]!r}")
            inner = _desugar_bnode_lists(text[i + 1 : j])
            _BN_COUNTER[0] += 1
            var = f"?__bn{_BN_COUNTER[0]}"
            out.append(var)
            if inner.strip(" \t\r\n."):
                pending.append((var, inner))
            i = j + 1
            continue
        out.append(c)
        i += 1
    result = "".join(out)
    for var, inner in pending:
        result = f"{result} . {var} {inner} "
    return result


def _parse_patterns(text: str, prefixes) -> List[Tuple[Term, Path | Term, Term]]:
    """Tokenize first, then treat '.' as a statement separator only
    *between* term tokens — dots inside <IRI>s, quoted literals, and
    dotted CURIE locals (ex:v1.0) are part of the term, never a split
    point. A CURIE token that swallowed a trailing '.' (PN_LOCAL
    cannot end with one) is stripped and counts as a terminator.

    Each statement is ``subject path object``: the first and last
    items must be terms, everything between is handed to the property
    path parser (a single IRI term is the plain-triple case).
    Blank-node bracket syntax desugars to fresh ``?__bn`` vars
    first (:func:`_desugar_bnode_lists`)."""
    if "[" in text:
        text = _desugar_bnode_lists(text)
    statements: List[list] = []
    cur: List = []

    def flush(ctx: str) -> None:
        if not cur:
            return
        statements.append(list(cur))
        cur.clear()

    def push_ops(sep: str, ctx: str) -> None:
        for ch in sep:
            if ch in _PATH_OPS:
                cur.append(ch)
            elif ch == ".":
                flush(ctx)
            elif ch in ";,":
                cur.append(("sep", ch))
            elif ch not in " \t\r\n":
                raise ValueError(f"unexpected {ch!r} in pattern near {ctx!r}")

    last_end = 0
    for tok in _TERM_RE.finditer(text):
        sep = text[last_end : tok.start()]
        push_ops(sep, text[max(0, tok.start() - 60) : tok.start()])
        term = _parse_term(tok, prefixes)
        if tok.group("curie") and term.value.endswith("."):
            term.value = term.value.rstrip(".")
            cur.append(term)
            flush(text[tok.start() : tok.end()])
        else:
            cur.append(term)
        last_end = tok.end()
    push_ops(
        "".join(c for c in text[last_end:] if c in _PATH_OPS or c == "."),
        text[last_end:][:60] or text[-60:],
    )
    flush(text[last_end:][:60] or text[-60:])

    def split_on(items: list, sep_ch: str) -> List[list]:
        parts, cur_part = [], []
        for it in items:
            if isinstance(it, tuple) and it == ("sep", sep_ch):
                parts.append(cur_part)
                cur_part = []
            else:
                cur_part.append(it)
        parts.append(cur_part)
        return parts

    def parse_po(subject: Term, seg: list, out: list) -> None:
        """One ``path obj (, obj)*`` segment for a known subject."""
        obj_lists = split_on(seg, ",")
        head = obj_lists[0]
        if len(head) < 2 or not isinstance(head[-1], Term):
            raise ValueError(f"unsupported predicate-object segment: {seg!r}")
        obj, mid = head[-1], head[:-1]
        if len(mid) == 1 and isinstance(mid[0], Term):
            pred: Path | Term = mid[0]  # plain triple (incl. var predicates)
        else:
            pred = _PathParser(mid).parse()
        out.append((subject, pred, obj))
        for extra in obj_lists[1:]:  # ?s p o1 , o2 , o3
            if len(extra) != 1 or not isinstance(extra[0], Term):
                raise ValueError(f"unsupported object list entry: {extra!r}")
            out.append((subject, pred, extra[0]))

    patterns: List[Tuple[Term, Path | Term, Term]] = []
    for st in statements:
        if (
            len(st) == 1
            and isinstance(st[0], Term)
            and st[0].kind == "var"
            and st[0].value.startswith("__bn")
        ):
            # a blank-node property list that WAS the whole statement
            # ([ p o ] .) — its triples live in the appended desugared
            # statements; the in-place substitute is vacuous
            continue
        segments = split_on(st, ";")
        first = segments[0]
        if len(first) < 3 or not isinstance(first[0], Term):
            raise ValueError(f"unsupported triple pattern: {st!r}")
        subject = first[0]
        parse_po(subject, first[1:], patterns)
        for seg in segments[1:]:  # ?s p1 o1 ; p2 o2
            if seg:  # trailing ';' before '.' is legal turtle-style
                parse_po(subject, seg, patterns)
    return patterns


# ---------------------------------------------------------------------
# SELECT clause / aggregates
# ---------------------------------------------------------------------

_AGG_RE = re.compile(
    r"""(?isx)^
    (?P<fn>COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT)\s*\(\s*
    (?P<distinct>DISTINCT\s+)?
    (?P<arg>\*|\?[A-Za-z_][A-Za-z0-9_]*)
    (?:\s*;\s*SEPARATOR\s*=\s*"(?P<sep>[^"]*)")?
    \s*\)$"""
)


class AggItem:
    __slots__ = ("fn", "distinct", "var", "sep", "alias", "arg_expr")

    def __init__(self, fn, distinct, var, sep, alias, arg_expr=None):
        self.fn, self.distinct, self.var, self.sep, self.alias = (
            fn, distinct, var, sep, alias,
        )
        # aggregate over an EXPRESSION argument (SUM(xsd:integer(?v))):
        # _finalize_select materializes it as a synthetic input column
        # pre-groupBy and points ``var`` at it
        self.arg_expr = arg_expr

    def column(self):
        c = F.col(self.var) if self.var else None
        if self.fn == "COUNT":
            if self.var is None:
                return F.count(F.lit(1)).alias(self.alias)
            if self.distinct:
                return F.countDistinct(c).alias(self.alias)
            return F.count(c).alias(self.alias)
        if self.distinct:
            c = None  # only COUNT supports DISTINCT here
            raise ValueError(f"DISTINCT not supported inside {self.fn}")
        if self.fn == "SUM":
            return F.sum(c.try_cast("double")).alias(self.alias)
        if self.fn == "AVG":
            return F.avg(c.try_cast("double")).alias(self.alias)
        if self.fn == "SAMPLE":
            # spec-open choice; engine pins lexical MIN (module contract)
            return F.min(c).alias(self.alias)
        if self.fn in ("MIN", "MAX"):
            # SPARQL §18.5 MIN/MAX apply the "<" operator: numeric
            # literals compare by VALUE, not lexical form ("5" < "10").
            # Encode a total order as a struct (type-rank, numeric
            # value, lexical form): numbers rank before other terms
            # (the Jena/rdflib practical order for the spec's
            # type-error cases), numbers compare numerically, ties and
            # non-numbers fall back to the lexical form. The aggregate
            # returns the original lexical form, preserving the
            # engine's string-out contract. (Gap found by the
            # manifest-driven W3C suite: agg-min-max-001.)
            num = c.try_cast("double")
            ordered = F.struct(
                F.when(num.isNotNull(), F.lit(0))
                .otherwise(F.lit(1))
                .alias("t"),
                num.alias("n"),
                c.alias("lex"),
            )
            agg = F.min(ordered) if self.fn == "MIN" else F.max(ordered)
            return agg.getField("lex").alias(self.alias)
        if self.fn == "GROUP_CONCAT":
            return F.concat_ws(
                self.sep if self.sep is not None else " ",
                F.array_sort(F.collect_list(c)),
            ).alias(self.alias)
        raise ValueError(self.fn)


def _split_select_items(proj_raw: str) -> List[str]:
    """Split the SELECT clause into ?var and (…AS ?alias) items."""
    items, depth, start = [], 0, 0
    i = 0
    while i < len(proj_raw):
        ch = proj_raw[i]
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                items.append(proj_raw[start : i + 1])
        elif ch == "?" and depth == 0:
            m = re.match(r"\?[A-Za-z_][A-Za-z0-9_]*", proj_raw[i:])
            if m:
                items.append(m.group(0))
                i += len(m.group(0)) - 1
        i += 1
    return items


_AGG_CALL_RE = re.compile(
    r"(?is)\b(COUNT|SUM|AVG|MIN|MAX|SAMPLE|GROUP_CONCAT)\s*\("
)
_AGG_INNER_RE = re.compile(
    r'(?is)^\s*(?P<distinct>DISTINCT\s+)?(?P<arg>.*?)'
    r'(?:\s*;\s*SEPARATOR\s*=\s*"(?P<sep>[^"]*)")?\s*$'
)


def _rewrite_agg_calls(
    body: str, prefix: str
) -> Tuple[str, List[AggItem]]:
    """Replace every aggregate call in ``body`` with a synthetic
    ``?{prefix}N`` variable and return the AggItems that compute them.
    Balanced-paren scan, so expression arguments
    (``SUM(xsd:integer(?v))``) and compound aggregate arithmetic
    (``SUM(?x) + COUNT(*)``) both work; the rewritten remainder
    evaluates over the grouped frame referencing the synthetic
    aliases."""
    items: List[AggItem] = []
    out: List[str] = []
    i = 0
    while True:
        m = _AGG_CALL_RE.search(body, i)
        if not m:
            out.append(body[i:])
            break
        end = _scan_balanced(body, m.end() - 1)
        inner = body[m.end() : end - 1]
        im = _AGG_INNER_RE.match(inner)
        arg = im.group("arg").strip()
        alias = f"{prefix}{len(items)}"
        if arg == "*":
            var, arg_expr = None, None
        elif re.fullmatch(r"\?\w+", arg):
            var, arg_expr = arg[1:], None
        else:
            var, arg_expr = None, arg
        items.append(
            AggItem(
                m.group(1).upper(),
                bool(im.group("distinct")),
                var,
                im.group("sep"),
                alias,
                arg_expr=arg_expr,
            )
        )
        out.append(body[i : m.start()])
        out.append("?" + alias)
        i = end
    return "".join(out), items


def _parse_select_items(
    proj_raw: str,
) -> Tuple[List[str], List[AggItem], List[Tuple[str, str]]]:
    """→ (plain vars, aggregate items, (expr_text, alias) items)."""
    plain: List[str] = []
    aggs: List[AggItem] = []
    exprs: List[Tuple[str, str]] = []
    for item in _split_select_items(proj_raw):
        if item.startswith("?"):
            plain.append(item[1:])
            continue
        m = re.match(
            r"(?is)^\(\s*(?P<body>.*?)\s+AS\s+\?(?P<alias>\w+)\s*\)$", item
        )
        if not m:
            raise ValueError(f"unsupported SELECT item: {item!r}")
        body, alias = m.group("body").strip(), m.group("alias")
        am = _AGG_RE.match(body)
        if am:
            var = None if am.group("arg") == "*" else am.group("arg")[1:]
            aggs.append(
                AggItem(
                    am.group("fn").upper(),
                    bool(am.group("distinct")),
                    var,
                    am.group("sep"),
                    alias,
                )
            )
            continue
        if _AGG_CALL_RE.search(body):
            rewritten, call_items = _rewrite_agg_calls(
                body, f"__s{len(aggs)}_"
            )
            if len(call_items) == 1 and rewritten.strip() == (
                "?" + call_items[0].alias
            ):
                # a single aggregate with an expression argument —
                # no projection wrapper needed
                call_items[0].alias = alias
                aggs.append(call_items[0])
            else:
                aggs.extend(call_items)
                exprs.append((rewritten, alias))
            continue
        exprs.append((body, alias))
    return plain, aggs, exprs


# ---------------------------------------------------------------------
# full query parse
# ---------------------------------------------------------------------


class _Filter:
    """expr-based filter, or EXISTS/NOT EXISTS group."""

    __slots__ = ("kind", "expr", "needs", "vars", "group")

    def __init__(self, kind, expr=None, needs=None, vars=None, group=None):
        self.kind, self.expr, self.needs, self.vars, self.group = (
            kind, expr, needs, vars, group,
        )


_DEPTH2 = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"


def _scan_balanced(text: str, open_idx: int) -> int:
    """Index just past the ``)`` matching ``text[open_idx] == '('``.
    Quote-aware: parentheses inside double-quoted literals (with
    backslash escapes) don't count. Replaces the fixed-depth _DEPTH2
    regex where expression bodies can nest arbitrarily (FILTER/BIND —
    ``STRLEN(UCASE(SUBSTR(…)))`` is depth 4 already)."""
    depth = 0
    i, n = open_idx, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses at {text[open_idx:open_idx+40]!r}")


def _extract_calls(
    where: str, keyword: str, bare_call: bool = False
) -> Tuple[str, List[str]]:
    """Find every ``KEYWORD ( body )`` (case-insensitive, balanced,
    quote-aware), return (where-with-calls-blanked, [body, …]).

    With ``bare_call`` (FILTER), also accept the grammar's un-bracketed
    Constraint forms ``KEYWORD fn(args)`` (``FILTER isIRI(?o)``,
    ``FILTER regex(…)``) — the body keeps the call intact. ``FILTER
    [NOT] EXISTS { … }`` never matches here: the name is followed by
    ``{``, not ``(``."""
    bodies: List[str] = []
    out: List[str] = []
    pos = 0
    fn = r"(?P<fn>[A-Za-z_][A-Za-z0-9_]*\s*)?" if bare_call else ""
    # \b after the keyword: without it, bare_call would consume
    # FILTER-prefixed identifiers ("FILTERED(x)" as fn body "ED(x)")
    # — ADVICE r04
    rx = re.compile(r"(?is)\b" + keyword + r"\b\s*" + fn + r"\(")
    while True:
        m = rx.search(where, pos)
        if not m:
            out.append(where[pos:])
            return "".join(out), bodies
        end = _scan_balanced(where, m.end() - 1)
        body = where[m.end() : end - 1]
        if bare_call and m.group("fn"):
            body = m.group("fn").strip() + "(" + body + ")"
        bodies.append(body)
        out.append(where[pos : m.start()])
        out.append(" ")
        tail = re.match(r"\s*\.", where[end:])
        pos = end + (tail.end() if tail else 0)


def parse_select(sparql: str, prefixes: Optional[Dict[str, str]] = None):
    """→ dict with the parsed query (see keys below); raises ValueError
    on anything outside the subset."""
    prefixes = dict(prefixes or {})
    for m in re.finditer(
        r"(?i)\bPREFIX\s+((?:[A-Za-z_][\w.-]*)?):\s*<([^>]*)>", sparql
    ):
        prefixes[m.group(1)] = m.group(2)
    body = re.sub(r"(?i)\bPREFIX\s+(?:[A-Za-z_][\w.-]*)?:\s*<[^>]*>", "", sparql)

    m = re.search(
        r"(?is)\bSELECT\s+(DISTINCT\s+|REDUCED\s+)?"
        r"(?P<proj>[^{]*?)\s*(?:WHERE\s*)?\{(?P<w>.*)\}"
        r"\s*(?:GROUP\s+BY\s+(?P<group>.+?))?"
        r"\s*(?:HAVING\s*\((?P<having>" + _DEPTH2 + r")\))?"
        r"\s*(?:ORDER\s+BY\s+(?P<order>.+?))?"
        # grammar LimitOffsetClauses: LIMIT/OFFSET in EITHER order
        # (found by the manifest-driven W3C suite: offset-001)
        r"\s*(?:LIMIT\s+(?P<limit>\d+)(?:\s+OFFSET\s+(?P<offset>\d+))?"
        r"|OFFSET\s+(?P<offset2>\d+)(?:\s+LIMIT\s+(?P<limit2>\d+))?)?"
        r"\s*$",
        body,
    )
    if not m:
        raise ValueError(f"unsupported SPARQL (SELECT subset): {sparql!r}")
    # REDUCED permits (but does not require) duplicate elimination —
    # keeping the bag unchanged is conformant and free
    distinct = bool(m.group(1)) and m.group(1).strip().upper() == "DISTINCT"

    proj_raw = m.group("proj").strip()
    limit_s = m.group("limit") or m.group("limit2")
    offset_s = m.group("offset") or m.group("offset2")
    limit = int(limit_s) if limit_s else None
    offset = int(offset_s) if offset_s else None
    group_by = _parse_group_conditions(m.group("group") or "")
    order_by = _parse_order_conditions(m.group("order") or "")

    where = m.group("w")

    # { SELECT … } sub-queries — extracted ONLY at top level of the
    # WHERE (balanced scan), compiled recursively, joined on shared
    # variables. A sub-SELECT nested inside another group (OPTIONAL {
    # { SELECT … } }, a UNION branch) must NOT be hoisted out of its
    # scope: it stays in place, the nested-group check below refuses,
    # and the algebra path compiles it where it belongs.
    subselects: List[str] = []
    parts: List[str] = []
    i, pos = 0, 0
    while i < len(where):
        ch = where[i]
        j = _skip_token(where, i)
        if j != i:
            i = j
            continue
        if ch == "{":
            inner, after = _balanced_block(where, i)
            preceded = re.search(
                r"(?is)\b(?:OPTIONAL|MINUS|UNION|EXISTS|VALUES"
                r"|GRAPH\s+\S+)\s*$",
                where[:i],
            )
            if not preceded and re.match(r"(?is)\s*SELECT\b", inner):
                subselects.append(inner.strip())
                parts.append(where[pos:i])
                parts.append(" ")
                pos = after
            i = after
            continue
        i += 1
    parts.append(where[pos:])
    where = "".join(parts)

    # The group extractors below are brace-blind regexes ([^{}]*
    # bodies) applied in a fixed order. A group NESTED inside another
    # (EXISTS inside OPTIONAL, OPTIONAL inside a UNION branch, GRAPH
    # inside OPTIONAL, …) would be extracted from the inside out and
    # silently hoisted to top-level scope — wrong results, not an
    # error. Refuse loudly instead.
    _reject_nested_groups(where)

    # GRAPH ?g { … } | GRAPH <iri> { … } — named-graph blocks over a
    # quads table (g column). Extracted first (brace-delimited).
    graphs: List[Tuple[Term, list]] = []
    for gm in re.finditer(
        r"(?is)GRAPH\s+(\?[A-Za-z_]\w*|<[^>]*>|[A-Za-z_][\w.-]*:[\w.%-]*)"
        r"\s*\{([^{}]*)\}",
        where,
    ):
        head = gm.group(1)
        if head.startswith("?"):
            gterm = Term("var", head[1:])
        elif head.startswith("<"):
            gterm = Term("iri", head[1:-1])
        else:
            gterm = Term("iri", _expand(head, prefixes))
        graphs.append((gterm, _parse_patterns(gm.group(2), prefixes)))
    where = re.sub(
        r"(?is)GRAPH\s+(\?[A-Za-z_]\w*|<[^>]*>|[A-Za-z_][\w.-]*:[\w.%-]*)"
        r"\s*\{[^{}]*\}",
        " ",
        where,
    )

    # FILTER [NOT] EXISTS { … } — before OPTIONAL (both use braces).
    # Parens must be absent or a COMPLETE wrapper: a partial match on
    # FILTER(EXISTS {…} && expr) would strand the boolean tail in the
    # pattern text — that form stays in place for the _extract_calls
    # pass below, which routes it to the algebra compiler.
    filters: List[_Filter] = []
    _F_EXISTS = re.compile(
        r"(?is)FILTER\s*(?:\(\s*(?P<n1>NOT\s+)?EXISTS\s*\{(?P<g1>[^{}]*)\}"
        r"\s*\)|(?P<n2>NOT\s+)?EXISTS\s*\{(?P<g2>[^{}]*)\})"
    )
    for fm in _F_EXISTS.finditer(where):
        filters.append(
            _Filter(
                "not_exists" if (fm.group("n1") or fm.group("n2"))
                else "exists",
                group=_parse_patterns(
                    fm.group("g1")
                    if fm.group("g1") is not None
                    else fm.group("g2"),
                    prefixes,
                ),
            )
        )
    where = _F_EXISTS.sub(" ", where)

    optionals = []
    for om in re.finditer(r"(?is)OPTIONAL\s*\{([^{}]*)\}", where):
        optionals.append(_parse_patterns(om.group(1), prefixes))
    where = re.sub(r"(?is)OPTIONAL\s*\{[^{}]*\}", " ", where)

    minuses = []
    for mm in re.finditer(r"(?is)MINUS\s*\{([^{}]*)\}", where):
        minuses.append(_parse_patterns(mm.group(1), prefixes))
    where = re.sub(r"(?is)MINUS\s*\{[^{}]*\}", " ", where)

    unions = []
    um = re.search(r"(?is)\{([^{}]*)\}(\s*UNION\s*\{[^{}]*\})+", where)
    if um:
        block = um.group(0)
        for bm in re.finditer(r"\{([^{}]*)\}", block):
            unions.append(_parse_patterns(bm.group(1), prefixes))
        where = where.replace(block, " ")

    # VALUES ?v { … } | VALUES (?a ?b) { (…) (…) }
    values_vars: List[str] = []
    values_rows: List[list] = []
    vm = re.search(
        r"(?is)VALUES\s+(\(\s*[?\w\s]+\)|\?\w+)\s*\{(?P<body>[^{}]*)\}", where
    )
    if vm:
        head = vm.group(1)
        values_vars = re.findall(r"\?(\w+)", head)
        vbody = vm.group("body")
        if head.startswith("("):
            for rm in re.finditer(r"\(([^()]*)\)", vbody):
                row = _values_row_terms(rm.group(1), prefixes)
                if len(row) != len(values_vars):
                    raise ValueError(f"VALUES row arity mismatch: {rm.group(0)!r}")
                values_rows.append(row)
        else:
            values_rows = [[v] for v in _values_row_terms(vbody, prefixes)]
        if any(v is None for row in values_rows for v in row):
            raise NotImplementedError(
                "VALUES with UNDEF (partial bindings need the "
                "compatible-mapping join) — routing to the recursive "
                "algebra compiler"
            )
        where = where.replace(vm.group(0), " ")

    # BIND(expr AS ?v) — balanced-paren scan, arbitrary nesting depth
    binds: List[Tuple[object, Dict, set, str]] = []
    where, bind_bodies = _extract_calls(where, "BIND")
    for bbody in bind_bodies:
        am = re.match(r"(?is)^(?P<expr>.*)\s+AS\s+\?(?P<alias>\w+)\s*$", bbody)
        if not am:
            raise ValueError(f"unsupported BIND: {bbody!r}")
        e, needs, evars = parse_expr(am.group("expr"), prefixes)
        binds.append((e, needs, evars, am.group("alias")))

    # FILTER(expr) — same scan
    where, filter_bodies = _extract_calls(where, "FILTER", bare_call=True)
    for fbody in filter_bodies:
        if re.search(r"(?is)\bEXISTS\s*\{", fbody):
            raise NotImplementedError(
                "EXISTS embedded in a boolean FILTER expression — "
                "routing to the recursive algebra compiler"
            )
        e, needs, evars = parse_expr(fbody, prefixes)
        filters.append(_Filter("expr", expr=e, needs=needs, vars=evars))

    patterns = _parse_patterns(where, prefixes)

    if proj_raw == "*":
        seen: List[str] = []
        for tp in patterns + [p for g in optionals for p in g] + [
            p for g in unions for p in g
        ] + [p for _, g in graphs for p in g]:
            for t in tp:
                if (
                    isinstance(t, Term)
                    and t.kind == "var"
                    and t.value not in seen
                    # synthetic vars (desugared blank nodes, anon)
                    # join internally but never project via *
                    and not t.value.startswith("__")
                ):
                    seen.append(t.value)
        for gterm, _ in graphs:
            if gterm.kind == "var" and gterm.value not in seen:
                seen.append(gterm.value)
        # SELECT * also projects vars bound outside triple patterns:
        # VALUES bindings, BIND aliases, and sub-SELECT projections
        for v in values_vars:
            if v not in seen:
                seen.append(v)
        for _, _, _, alias in binds:
            if alias not in seen:
                seen.append(alias)
        for sub_sparql in subselects:
            sm = re.match(r"(?is)\s*SELECT\s+(?P<p>.+?)\s+WHERE", sub_sparql)
            if sm:
                for v in re.findall(r"\?(\w+)", sm.group("p")):
                    if v not in seen:
                        seen.append(v)
        proj, aggs, proj_exprs = seen, [], []
    else:
        proj, aggs, proj_exprs = _parse_select_items(proj_raw)

    having = None
    if m.group("having"):
        having = m.group("having")

    return {
        "proj": proj,
        "aggs": aggs,
        "proj_exprs": proj_exprs,
        "distinct": distinct,
        "graphs": graphs,
        "patterns": patterns,
        "optionals": optionals,
        "minuses": minuses,
        "subselects": subselects,
        "unions": unions,
        "filters": filters,
        "binds": binds,
        "values": (values_vars, values_rows),
        "group_by": group_by,
        "having": having,
        "order_by": order_by,
        "limit": limit,
        "offset": offset,
        "prefixes": prefixes,
    }


# ---------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------


_GROUP_KEYWORDS = re.compile(
    r"(?is)\b(OPTIONAL|MINUS|UNION|GRAPH|EXISTS|VALUES|FILTER|BIND|SELECT)"
    r"\b"
)
_GROUP_OPENERS = re.compile(
    r"(?is)\b(OPTIONAL|MINUS|(?:NOT\s+)?EXISTS"
    r"|GRAPH\s+(?:\?[A-Za-z_]\w*|<[^>]*>|[A-Za-z_][\w.-]*:[\w.%-]*))\s*\{"
    r"|\{"
)


def _reject_nested_groups(where: str) -> None:
    """SPARQL group scoping guard: every brace-delimited group the
    FLAT extractor handles must be flat (no nested ``{`` and no
    group/FILTER/BIND/sub-SELECT keyword inside), because the
    extraction regexes are applied to the whole WHERE text in a fixed
    order and would hoist an inner construct out of its enclosing
    scope (e.g. FILTER inside OPTIONAL belongs to the LeftJoin
    condition, not the whole solution set). Raising
    NotImplementedError here routes the query to the recursive
    algebra compiler (:mod:`.algebra`) — so a false positive (a
    keyword inside a quoted literal, say) costs a plan shape, never
    correctness. Top-level sub-SELECTs are extracted before this
    check runs; bare ``{…}`` groups that are not UNION branches or
    VALUES bodies also route to the algebra path."""
    for m in _GROUP_OPENERS.finditer(where):
        start = m.end() - 1  # the '{'
        bare = m.group(0).strip() == "{"
        # quote-aware body extraction — a '}' inside a literal must
        # not truncate the guarded body (the downstream extraction
        # regexes are brace-blind, so an escaped construct would split
        # mid-literal with a confusing error instead of routing)
        body, after = _balanced_block(where, start)
        # braces INSIDE quoted literals would also split the blind
        # extraction regexes mid-literal — route those to algebra
        # (whose scanners are quote-aware throughout)
        k = 0
        while k < len(body):
            k2 = _skip_token(body, k)
            if k2 != k:
                if body[k] in "\"'" and (
                    "{" in body[k:k2] or "}" in body[k:k2]
                ):
                    raise NotImplementedError(
                        "brace inside a quoted literal in a group — "
                        "routing to the recursive algebra compiler"
                    )
                k = k2
            else:
                k += 1
        kw = _GROUP_KEYWORDS.search(body)
        if "{" in body or kw:
            raise NotImplementedError(
                "nested group "
                f"({(kw.group(1) if kw else '{…}').upper()}) "
                "inside a brace-delimited block — routing "
                "to the recursive algebra compiler"
            )
        if bare:
            is_union = re.search(
                r"(?is)\bUNION\s*$", where[: m.start()]
            ) or re.match(r"(?is)\s*UNION\b", where[after:])
            is_values = re.search(
                r"(?is)\bVALUES\s+(?:\([?\w\s]*\)|\?\w+)\s*$",
                where[: m.start()],
            )
            if not (is_union or is_values):
                raise NotImplementedError(
                    "bare group graph pattern — routing to "
                    "the recursive algebra compiler"
                )


def _compile_patterns(
    triples: DataFrame,
    patterns: Sequence[Tuple[Term, Path | Term, Term]],
    needs: Dict[str, set],
    tag: str = "",
    extra: Optional[List] = None,
    gvar: Optional[str] = None,
) -> Optional[DataFrame]:
    """``extra``: Columns appended to every pattern's projection (the
    GRAPH ?g binding) — shared across patterns, so in-block joins also
    key on it (same-graph semantics for free). ``gvar``: the GRAPH
    variable's name when the block is ``GRAPH ?g`` — property-path
    patterns need it to keep their closure per-graph."""
    plan = None
    gates: List[str] = []
    for i, (s, p, o) in enumerate(patterns):
        if isinstance(p, Path) and not p.is_simple_iri:
            part = _compile_path_pattern(triples, s, p, o, gvar)
            if part.columns == ["_pmatch"]:
                # uniquify the all-constant-path existence gate so two
                # groups' gates can never collide into a join key
                gname = f"_pmatch_{tag}{i}"
                part = part.withColumnRenamed("_pmatch", gname)
                gates.append(gname)
        else:
            pred = Term("iri", p.args) if isinstance(p, Path) else p
            part = _compile_triple(
                triples, s, pred, o, needs, f"{tag}{i}", extra
            )
            if part.columns == [f"_m{tag}{i}"]:
                gates.append(f"_m{tag}{i}")
        if plan is None:
            plan = part
        elif part is not None:
            plan = _join_shared(plan, part)
    # existence gates have done their job (the 0-or-1-row cross join
    # already gated the group); dropping them keeps internal columns
    # from leaking into cross-group joins. A group that is ONLY gates
    # keeps them — the caller still needs a frame to gate on.
    if plan is not None and gates:
        keep = [c for c in plan.columns if c not in gates]
        if keep:
            plan = plan.drop(*gates)
    return plan


def _align_union(branches: List[DataFrame]) -> Tuple[DataFrame, set]:
    """NULL-pad UNION branches to the union of their columns (string
    type — the engine's term columns) and fold with unionByName.
    Returns (unioned df, partial) where ``partial`` is the set of base
    variable columns NOT bound by every branch (the maybe-bound vars a
    downstream join must treat with compatible-mapping semantics).
    Shared by the flat extractor and the algebra compiler so the
    padding rules can never diverge."""
    all_cols: List[str] = []
    for b in branches:
        for c in b.columns:
            if c not in all_cols:
                all_cols.append(c)
    partial = {
        c
        for c in all_cols
        if any(c not in b.columns for b in branches) and "__" not in c
    }
    aligned = []
    for b in branches:
        for c in all_cols:
            if c not in b.columns:
                b = b.withColumn(c, F.lit(None).cast("string"))
        aligned.append(b.select(*all_cols))
    out = aligned[0]
    for b in aligned[1:]:
        out = out.unionByName(b)
    return out, partial


def _join_shared(
    plan: DataFrame, part: DataFrame, how: str = "inner"
) -> DataFrame:
    """Join two pattern frames on their shared variables.

    Base variable columns are never NULL → plain equi-join keys. The
    ``__lang``/``__dt``/``__kind`` companion columns ARE legitimately
    NULL (a plain literal's datatype, an IRI's language), so they join
    null-SAFELY — a null-unsafe key there silently empties every join
    whose shared var carries NULL metadata on either side. Used for
    every solution-frame combination: pattern chains, GRAPH blocks,
    sub-SELECTs, OPTIONAL (left), MINUS / (NOT) EXISTS (anti/semi)."""
    shared = [c for c in plan.columns if c in part.columns]
    if not shared:
        if how == "inner":
            return plan.crossJoin(part)
        return plan.join(part, F.lit(True), how)
    comp = [c for c in shared if "__" in c]
    if not comp:
        return plan.join(part, shared, how)
    renames = {c: f"__rhs_{c}" for c in shared}
    right = part
    for c, rc in renames.items():
        right = right.withColumnRenamed(c, rc)
    cond = None
    for c in shared:
        e = (
            plan[c].eqNullSafe(right[renames[c]])
            if c in comp
            else plan[c] == right[renames[c]]
        )
        cond = e if cond is None else cond & e
    out = plan.join(right, cond, how)
    if how in ("left_semi", "left_anti"):
        return out
    return out.drop(*renames.values())


def _compile_path_pattern(
    triples: DataFrame,
    s: Term,
    path: Path,
    o: Term,
    gvar: Optional[str] = None,
) -> DataFrame:
    """``gvar``: inside a ``GRAPH ?g`` block the path must stay
    per-graph — nodes become (g, value) structs so every path join
    (sequence composition, transitive closure) keys on the graph for
    free, then the binding decomposes back out. Without it a GRAPH-var
    path would close across all graphs and never bind ?g."""
    if gvar is not None:
        triples = triples.select(
            F.struct(F.col("g").alias("g"), F.col("s").alias("v")).alias("s"),
            "p",
            F.struct(F.col("g").alias("g"), F.col("o").alias("v")).alias("o"),
        )
    pairs = _compile_path(triples, path)
    # SPARQL §18.4 ALP: a zero-length path evaluates from the given
    # term ITSELF, even when that term appears nowhere in the graph —
    # the closure's zero-length component only pairs graph terms, so a
    # constant endpoint absent from the data needs its reflexive row
    # added (ASK { <x> <p>* <x> } is true for any <x>). GRAPH-var mode
    # skips this: zero-length inside GRAPH ?g has no graph to bind.
    if gvar is None and path.op in ("star", "opt"):
        const = None
        if s.kind != "var":
            const = s.value
        elif o.kind != "var":
            const = o.value
        if const is not None:
            refl = triples.sparkSession.createDataFrame(
                [(const, const)], "src string, dst string"
            )
            pairs = pairs.unionByName(refl).distinct()
    cols = []
    if gvar is not None:
        # src.g == dst.g by construction (every path join matched the
        # whole struct), so either side carries the binding
        pairs = pairs.select(
            F.col("src.g").alias(gvar),
            F.col("src.v").alias("src"),
            F.col("dst.v").alias("dst"),
        )
        cols.append(F.col(gvar))
    if s.kind == "var":
        cols.append(F.col("src").alias(s.value))
    else:
        pairs = pairs.where(F.col("src") == s.value)
    if o.kind == "var":
        if s.kind == "var" and o.value == s.value:
            pairs = pairs.where(F.col("src") == F.col("dst"))
            # keep the GRAPH ?g binding (cols[0]) — rebuilding the
            # list from scratch dropped it, so ?g either failed
            # projection or silently stopped keying downstream joins
            cols = ([F.col(gvar)] if gvar is not None else []) + [
                F.col("src").alias(s.value)
            ]
        else:
            cols.append(F.col("dst").alias(o.value))
    else:
        pairs = pairs.where(F.col("dst") == o.value)
    if not cols:
        return pairs.limit(1).select(F.lit(1).alias("_pmatch"))
    return pairs.select(*cols)



def _compile_triple(
    triples: DataFrame,
    s: Term,
    p: Term,
    o: Term,
    needs: Dict[str, set],
    tag: str,
    extra: Optional[List] = None,
) -> DataFrame:
    df = triples
    cols = list(extra or [])

    def companions(var: str, pos: str) -> None:
        want = needs.get(var, ())
        if "lang" in want:
            cols.append(
                (F.col("o_lang") if pos == "o" else F.lit(None).cast("string")).alias(
                    var + "__lang"
                )
            )
        if "dt" in want:
            cols.append(
                (
                    F.col("o_datatype") if pos == "o" else F.lit(None).cast("string")
                ).alias(var + "__dt")
            )
        if "kind" in want:
            if pos == "o":
                kind = F.col("o_kind")
            elif pos == "p":
                kind = F.lit("iri")
            else:
                kind = F.when(
                    F.col("s").startswith("_:"), F.lit("bnode")
                ).otherwise(F.lit("iri"))
            cols.append(kind.alias(var + "__kind"))

    for pos, term, kind_col in (("s", s, None), ("p", p, None), ("o", o, "o_kind")):
        if term.kind == "var":
            cols.append(F.col(pos).alias(term.value))
            companions(term.value, pos)
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
            elif term.dt and term.dt != XSD_STRING:
                df = df.where(F.col("o_datatype") == term.dt)
            else:
                # plain literal (≡ xsd:string per RDF 1.1): BGP
                # matching is RDF-term equality — "chat" must NOT
                # match "chat"@en or "chat"^^xsd:token just because
                # the lexical forms coincide
                df = df.where(
                    F.col("o_lang").isNull()
                    & (
                        F.col("o_datatype").isNull()
                        | (F.col("o_datatype") == XSD_STRING)
                    )
                )
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
        cols = list(extra or []) + [
            F.col(pos).alias(var) for var, pos in pos_of.items()
        ]
        # re-attach the companion columns the rebuild just discarded
        # (FILTERs on the repeated var reference them downstream)
        for var, pos in pos_of.items():
            companions(var, pos)
    # fully-bound pattern = existence gate: empty slice → empty
    # result, non-empty → no row multiplication
    if not cols:
        return df.limit(1).select(F.lit(1).alias(f"_m{tag}"))
    return df.select(*cols)


def _merge_needs(*needs_list: Dict[str, set]) -> Dict[str, set]:
    out: Dict[str, set] = {}
    for needs in needs_list:
        for var, what in (needs or {}).items():
            out.setdefault(var, set()).update(what)
    return out


_BNODE_ANON = re.compile(r"\[\s*\]")


def bgp_ask(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """``ASK WHERE { … }`` → one-row DataFrame ``(ask: boolean)``.

    Compiled as the equivalent SELECT limited to one solution — the
    existence check the reference itself issues against stores
    (store.py `ask where {?s ?p [].}`). Anonymous blank nodes ``[]``
    are rewritten to fresh variables (each occurrence is an
    independent wildcard in an ASK)."""
    m = re.search(r"(?is)\bASK\s*(?:WHERE\s*)?\{(?P<w>.*)\}\s*$", sparql)
    if not m:
        raise ValueError(f"unsupported ASK form: {sparql!r}")
    body = m.group("w")
    counter = [0]

    def _fresh(_m: re.Match) -> str:
        counter[0] += 1
        return f"?__anon{counter[0]}"

    body = _BNODE_ANON.sub(_fresh, body)
    head = sparql[: m.start()]  # PREFIX declarations before ASK, if any
    sel = bgp_select(
        triples, f"{head} SELECT * WHERE {{ {body} }} LIMIT 1", prefixes
    )
    spark = triples.sparkSession
    return spark.createDataFrame(
        [(bool(sel.take(1)),)], "ask boolean"
    )


def _balanced_block(text: str, start: int) -> Tuple[str, int]:
    """Return (inner, end_index_after_close) for the ``{…}`` block whose
    opening brace is at ``start`` — brace-counting, so nested groups
    (OPTIONAL/UNION/sub-SELECT) inside a WHERE survive extraction."""
    assert text[start] == "{"
    depth = 0
    i, n = start, len(text)
    while i < n:
        ch = text[i]
        if ch == '"':
            # skip quoted literals so a brace inside a string ("a { b")
            # cannot unbalance the count (escape-aware)
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i], i + 1
        i += 1
    raise ValueError(f"unbalanced braces in {text[start:start+80]!r}")


_IRI_SHAPE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def bgp_construct(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """``CONSTRUCT { template } WHERE { … }`` → a triples DataFrame in
    :data:`..model.TRIPLE_SCHEMA` column order — the graph-building
    query form (the reference gets it from rdflib's full SPARQL,
    `/root/reference/sema/query/__init__.py`; here each template
    triple compiles to one columnar projection of the solution set,
    unioned and set-deduplicated).

    Supported: the ``CONSTRUCT WHERE { … }`` shorthand; blank nodes in
    the template (``_:label`` / ``[]``), instantiated per solution via
    deterministic skolemization (xxhash64 over the solution bindings —
    the same "deterministic IRI skolemization" rule the pipeline uses
    for corpus blank nodes); ORDER/LIMIT/OFFSET solution modifiers.
    Unbound-variable instantiations are dropped per SPARQL §16.2.

    Scale shape: the WHERE compiles exactly as a SELECT (broadcast
    slices, pushed filters); each template triple is a narrow
    projection of that one solution plan (Spark reuses it under AQE),
    and the only added exchange is the final set-dedup."""
    m = re.search(r"(?is)\bCONSTRUCT\b", sparql)
    if not m:
        raise ValueError(f"not a CONSTRUCT query: {sparql!r}")
    head = sparql[: m.start()]  # PREFIX/BASE declarations
    rest = sparql[m.end() :]
    brace = rest.index("{")
    pre = rest[:brace]
    first, after = _balanced_block(rest, brace)
    if re.fullmatch(r"(?is)\s*WHERE\s*", pre):
        # CONSTRUCT WHERE { … } shorthand: template = pattern
        tpl_text = where_body = first
        tail = rest[after:]
    elif pre.strip() == "":
        # CONSTRUCT { tpl } WHERE { … }
        tpl_text = first
        wm = re.match(r"(?is)\s*WHERE\s*(?=\{)", rest[after:])
        if not wm:
            raise ValueError(f"CONSTRUCT template without WHERE: {sparql!r}")
        where_body, wend = _balanced_block(rest, after + wm.end())
        tail = rest[wend:]
    else:
        raise ValueError(f"unsupported CONSTRUCT form: {sparql!r}")

    # merge prefixes: declared in the query head + caller-supplied
    pfx = dict(prefixes or {})
    for pm in re.finditer(
        r"(?i)\bPREFIX\s+((?:[A-Za-z_][\w.-]*)?):\s*<([^>]*)>", head
    ):
        pfx[pm.group(1)] = pm.group(2)
    template = parse_template(tpl_text, pfx)
    sol = bgp_select(
        triples,
        f"{head} SELECT * WHERE {{ {where_body} }} {tail}",
        prefixes,
        _extra_needs=template_needs(template),
        _keep_meta=True,
    )
    return instantiate_template(sol, template)


def parse_template(
    tpl_text: str, prefixes: Dict[str, str]
) -> List[Tuple[Term, Path | Term, Term]]:
    """Parse a CONSTRUCT/Update triple template: blank nodes (``[]`` /
    ``_:label``) become synthetic ``__bn_*`` variables, skolemized per
    solution by :func:`instantiate_template`."""
    anon = [0]

    def _anon(_m: re.Match) -> str:
        anon[0] += 1
        return f"?__bn_anon{anon[0]}"

    tpl_text = _BNODE_ANON.sub(_anon, tpl_text)
    tpl_text = re.sub(r"_:([A-Za-z0-9_]+)", r"?__bn_\1", tpl_text)
    template = _parse_patterns(tpl_text, prefixes)
    for s, p, o in template:
        if isinstance(p, Path) and not p.is_simple_iri:
            raise ValueError("property paths are not allowed in a "
                             "triple template")
    return template


def template_needs(
    template: List[Tuple[Term, Path | Term, Term]],
) -> Dict[str, set]:
    """The ``_extra_needs`` a solution set must carry so the
    template's object variables keep their term metadata."""
    return {
        o.value: {"kind", "lang", "dt"}
        for (_s, _p, o) in template
        if o.kind == "var" and not o.value.startswith("__bn_")
    }


def instantiate_template(
    sol: DataFrame, template: List[Tuple[Term, Path | Term, Term]]
) -> DataFrame:
    """Project one solution set through a triple template → triples
    frame in TRIPLE_SCHEMA order (each template triple is one narrow
    projection branch of the same solution plan; the only exchange is
    the final set-dedup). Shared by CONSTRUCT and by SPARQL Update's
    DELETE/INSERT templates — Update instantiates both templates from
    ONE solution frame, so the WHERE is compiled (and at scale,
    computed) once."""
    bind_cols = sorted(
        c for c in sol.columns if not c.endswith(("__lang", "__dt", "__kind"))
    )

    def _skolem(bnode_var: str):
        return F.concat(
            F.lit("_:c"),
            F.lower(
                F.hex(
                    F.xxhash64(
                        F.lit(bnode_var),
                        *[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                          for c in bind_cols],
                    )
                )
            ),
        )

    def _node(term: Term, pos: str):
        """(value, kind, lang, dt) Column 4-tuple for one template slot."""
        if term.kind == "var":
            v = term.value
            if v.startswith("__bn_"):
                return _skolem(v), F.lit("bnode"), F.lit(None), F.lit(None)
            if v not in sol.columns:
                raise ValueError(
                    f"template variable ?{v} is not bound by the WHERE"
                )
            val = F.col(v).cast("string")
            if pos == "o":
                if f"{v}__kind" in sol.columns:
                    kind = F.coalesce(
                        F.col(f"{v}__kind"),
                        F.when(val.startswith("_:"), "bnode")
                        .when(val.rlike(_IRI_SHAPE.pattern), "iri")
                        .otherwise("literal"),
                    )
                    lang = F.col(f"{v}__lang")
                    dt = F.col(f"{v}__dt")
                else:  # BIND/VALUES-produced: literal unless IRI-shaped
                    kind = (
                        F.when(val.startswith("_:"), "bnode")
                        .when(val.rlike(_IRI_SHAPE.pattern), "iri")
                        .otherwise("literal")
                    )
                    lang, dt = F.lit(None), F.lit(None)
                return val, kind, lang, dt
            return val, None, None, None
        if term.kind == "iri":
            return F.lit(term.value), F.lit("iri"), F.lit(None), F.lit(None)
        return (  # literal (object position only)
            F.lit(term.value),
            F.lit("literal"),
            F.lit(term.lang),
            F.lit(term.dt),
        )

    from ..model import dedup_triples

    parts = []
    for s, p, o in template:
        pterm = p if isinstance(p, Term) else Term("iri", p.args)
        s_val, _, _, _ = _node(s, "s")
        p_val, _, _, _ = _node(pterm, "p")
        o_val, o_kind, o_lang, o_dt = _node(o, "o")
        parts.append(
            sol.select(
                s_val.alias("s"),
                p_val.alias("p"),
                o_val.alias("o"),
                o_kind.cast("string").alias("o_kind"),
                o_dt.cast("string").alias("o_datatype"),
                o_lang.cast("string").alias("o_lang"),
            ).where(
                F.col("s").isNotNull()
                & F.col("p").isNotNull()
                & F.col("o").isNotNull()
            )
        )
    if not parts:
        # CONSTRUCT { } WHERE { … } is legal: empty result graph
        return sol.sparkSession.createDataFrame(
            [],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return dedup_triples(out)


def bgp_describe(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """``DESCRIBE <iri>… | ?var… [WHERE { … }]`` → every triple whose
    *subject* is one of the described resources (simple subject-CBD,
    the common store behaviour), in TRIPLE_SCHEMA column order.

    Var form compiles the WHERE as a SELECT DISTINCT of the described
    variables, stacks them into one resource set, and LeftSemi-joins
    the triples table against its broadcast — one scan of the corpus,
    no shuffle of the big side."""
    m = re.search(r"(?is)\bDESCRIBE\b", sparql)
    if not m:
        raise ValueError(f"not a DESCRIBE query: {sparql!r}")
    head = sparql[: m.start()]
    rest = sparql[m.end() :]
    wm = re.search(r"(?is)\bWHERE\s*\{", rest)
    target_text = rest[: wm.start()] if wm else rest
    pfx = dict(prefixes or {})
    for pm in re.finditer(
        r"(?i)\bPREFIX\s+((?:[A-Za-z_][\w.-]*)?):\s*<([^>]*)>", head
    ):
        pfx[pm.group(1)] = pm.group(2)

    iris: List[str] = []
    dvars: List[str] = []
    for tok in _TERM_RE.finditer(target_text):
        term = _parse_term(tok, pfx)
        if term.kind == "var":
            dvars.append(term.value)
        elif term.kind == "iri":
            iris.append(term.value)
        else:
            raise ValueError("DESCRIBE targets must be IRIs or variables")
    if not iris and not dvars:
        raise ValueError(f"DESCRIBE names no resource: {sparql!r}")

    from ..model import TRIPLE_SCHEMA, dedup_triples

    cols = [f.name for f in TRIPLE_SCHEMA.fields]
    base = triples.select(*cols)
    if dvars:
        if not wm:
            raise ValueError("DESCRIBE ?var needs a WHERE clause")
        where_body, _ = _balanced_block(rest, rest.index("{", wm.start()))
        sel = bgp_select(
            triples,
            f"{head} SELECT DISTINCT {' '.join('?' + v for v in dvars)} "
            f"WHERE {{ {where_body} }}",
            prefixes,
        )
        res = sel.select(F.col(dvars[0]).alias("__r"))
        for v in dvars[1:]:
            res = res.unionByName(sel.select(F.col(v).alias("__r")))
        if iris:
            spark = triples.sparkSession
            res = res.unionByName(
                spark.createDataFrame([(i,) for i in iris], "__r string")
            )
        out = base.join(
            F.broadcast(res.distinct()),
            base["s"] == F.col("__r"),
            "left_semi",
        )
    else:
        out = base.where(F.col("s").isin(iris))
    return dedup_triples(out)


_ASK_HEAD = re.compile(
    r"(?is)^\s*(?:(?:PREFIX\s+(?:[A-Za-z_][\w.-]*)?:\s*<[^>]*>|BASE\s*<[^>]*>)\s*)*ASK\b"
)


def sparql_query(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Dispatch a SPARQL string to the matching compiler — ``ASK`` →
    :func:`bgp_ask`, ``CONSTRUCT`` → :func:`bgp_construct`,
    ``DESCRIBE`` → :func:`bgp_describe`, anything else →
    :func:`bgp_select` — mirroring the reference where one
    ``store.select`` entry point accepts every query form (rdflib
    full-SPARQL; query.py:363-366 probes endpoints with
    ``ask where {?s ?p [].}`` through the same ``select`` call)."""
    if _ASK_HEAD.match(sparql):
        return bgp_ask(triples, sparql, prefixes)
    verb = re.match(
        r"(?is)^\s*(?:(?:PREFIX\s+(?:[A-Za-z_][\w.-]*)?:\s*<[^>]*>|BASE\s*<[^>]*>)\s*)*"
        r"(?P<verb>CONSTRUCT|DESCRIBE)\b",
        sparql,
    )
    if verb:
        fn = bgp_construct if verb.group("verb").upper() == "CONSTRUCT" else bgp_describe
        return fn(triples, sparql, prefixes)
    return bgp_select(triples, sparql, prefixes)


def bgp_select(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
    *,
    _extra_needs: Optional[Dict[str, set]] = None,
    _keep_meta: bool = False,
) -> DataFrame:
    """Compile + run a SPARQL SELECT against a triples DataFrame;
    columns are the projected variable names.

    Two compilation paths share one solution-modifier tail:

    - the FLAT extractor below (regex group extraction — the fast,
      battle-tested path for the un-nested subset in the module
      docstring), and
    - the RECURSIVE algebra compiler (:mod:`.algebra`, SPARQL §18.2
      translation with compatible-mapping joins) for everything the
      flat path refuses with NotImplementedError: nested group graph
      patterns (OPTIONAL inside OPTIONAL, UNION branches with their
      own OPTIONAL/FILTER, FILTER EXISTS inside a group, GRAPH around
      groups) and UNION blocks whose branch-padded variables would
      need a compatible-mapping join against the base pattern.

    The split keeps the flat path's plans byte-identical for existing
    queries (zero regression surface) while the algebra path extends
    coverage; both end in :func:`_finalize_select`.
    """
    try:
        return _bgp_select_flat(
            triples,
            sparql,
            prefixes,
            _extra_needs=_extra_needs,
            _keep_meta=_keep_meta,
        )
    except NotImplementedError:
        from .algebra import algebra_select

        return algebra_select(
            triples,
            sparql,
            prefixes,
            _extra_needs=_extra_needs,
            _keep_meta=_keep_meta,
        )


def _parse_order_conditions(text: str) -> List[Tuple[str, str, bool]]:
    """ORDER BY clause text → [(kind, payload, desc), …] where kind is
    ``var`` (payload = bare variable name, value-ordered composite
    sort) or ``expr`` (payload = expression text for
    :func:`.sparql_expr.parse_expr`). Accepts ``?v``, ``ASC(…)`` /
    ``DESC(…)`` with arbitrary expression bodies, and bare function
    calls (``ORDER BY STRLEN(?x)``)."""
    out: List[Tuple[str, str, bool]] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace() or text[i] == ",":
            i += 1
            continue
        m = re.match(r"(?i)(ASC|DESC)\s*\(", text[i:])
        if m:
            end = _scan_balanced(text, i + m.end() - 1)
            inner = text[i + m.end() : end - 1].strip()
            desc = m.group(1).upper() == "DESC"
            vm = re.fullmatch(r"\?(\w+)", inner)
            if vm:
                out.append(("var", vm.group(1), desc))
            else:
                out.append(("expr", inner, desc))
            i = end
            continue
        vm = re.match(r"\?(\w+)", text[i:])
        if vm:
            out.append(("var", vm.group(1), False))
            i += vm.end()
            continue
        fm = re.match(r"[A-Za-z_][\w.:]*\s*\(", text[i:])
        if fm:
            end = _scan_balanced(text, i + fm.end() - 1)
            out.append(("expr", text[i:end], False))
            i = end
            continue
        raise ValueError(f"unsupported ORDER BY condition at {text[i:]!r}")
    return out


def _parse_group_conditions(text: str) -> List[Tuple[str, str, Optional[str]]]:
    """GROUP BY clause text → [(kind, payload, alias), …]: ``var``
    (bare variable), or ``expr`` — ``(expr AS ?v)`` groups on a new
    projectable binding, ``(expr)`` / bare function calls group on an
    internal synthetic column."""
    out: List[Tuple[str, str, Optional[str]]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace() or c == ",":
            i += 1
            continue
        vm = re.match(r"\?(\w+)", text[i:])
        if vm:
            out.append(("var", vm.group(1), None))
            i += vm.end()
            continue
        if c == "(":
            end = _scan_balanced(text, i)
            inner = text[i + 1 : end - 1]
            am = re.match(
                r"(?is)^(?P<e>.*)\s+AS\s+\?(?P<a>\w+)\s*$", inner
            )
            if am:
                out.append(("expr", am.group("e"), am.group("a")))
            else:
                out.append(("expr", inner, None))
            i = end
            continue
        fm = re.match(r"[A-Za-z_][\w.:]*\s*\(", text[i:])
        if fm:
            end = _scan_balanced(text, i + fm.end() - 1)
            out.append(("expr", text[i:end], None))
            i = end
            continue
        raise ValueError(f"unsupported GROUP BY condition at {text[i:]!r}")
    return out


def _modifier_needs(
    group_by, order_by, aggs, proj_exprs, prefixes
) -> Dict[str, set]:
    """Companion-column needs of every expression OUTSIDE the WHERE
    body: GROUP BY / ORDER BY expression conditions, aggregate
    expression arguments, and SELECT projection expressions. These
    compile against the solution frame, so a LANG()/DATATYPE()/
    ISIRI() there needs its companion columns materialized by the
    pattern compiler exactly like a FILTER's would."""
    needs: Dict[str, set] = {}
    texts: List[str] = []
    texts += [p for kind, p, _a in group_by if kind == "expr"]
    texts += [p for kind, p, _d in order_by if kind == "expr"]
    texts += [a.arg_expr for a in aggs if a.arg_expr is not None]
    texts += [body for body, _alias in proj_exprs]
    for t in texts:
        _e, n, _v = parse_expr(t, prefixes)
        needs = _merge_needs(needs, n)
    return needs


def _parse_having(
    text: str, prefixes: Dict[str, str]
) -> Tuple[object, List["AggItem"], Dict[str, set]]:
    """HAVING body → (expr, synthetic AggItems, companion needs):
    aggregate calls are rewritten to synthetic ``?__hN`` vars computed
    alongside the SELECT aggregates (balanced-paren scan, so
    expression arguments work), then the remainder expr-parses."""
    text, having_aggs = _rewrite_agg_calls(text, "__h")
    having_expr, h_needs, _ = parse_expr(text, prefixes)
    return having_expr, having_aggs, h_needs


def _bgp_select_flat(
    triples: DataFrame,
    sparql: str,
    prefixes: Optional[Dict[str, str]] = None,
    *,
    _extra_needs: Optional[Dict[str, set]] = None,
    _keep_meta: bool = False,
) -> DataFrame:
    """The flat-extraction path (see :func:`bgp_select`). OPTIONAL
    groups compile to left joins on their shared variables (J3);
    FILTERs to Column predicates, which Catalyst pushes down into the
    pattern slices where legal; EXISTS/NOT EXISTS to LeftSemi/LeftAnti
    joins; GROUP BY + aggregates to a hash aggregate (map-side
    partials for free).

    ``_extra_needs``/``_keep_meta`` are the internal CONSTRUCT hooks:
    request term metadata (``v__kind``/``__lang``/``__dt``) for extra
    variables and keep those companion columns in the projection."""
    q = parse_select(sparql, prefixes)

    needs = _merge_needs(
        *[f.needs for f in q["filters"] if f.kind == "expr"],
        *[b[1] for b in q["binds"]],
        _modifier_needs(
            q["group_by"], q["order_by"], q["aggs"], q["proj_exprs"],
            q["prefixes"],
        ),
        _extra_needs or {},
    )
    having_expr = None
    having_aggs: List[AggItem] = []
    if q["having"]:
        having_expr, having_aggs, h_needs = _parse_having(
            q["having"], q["prefixes"]
        )
        needs = _merge_needs(needs, h_needs)

    plan = _compile_patterns(triples, q["patterns"], needs)

    for sub_sparql in q["subselects"]:
        sub = bgp_select(triples, sub_sparql, q["prefixes"])
        if plan is None:
            plan = sub
        else:
            plan = _join_shared(plan, sub)

    for k, (gterm, gpatterns) in enumerate(q["graphs"]):
        if "g" not in triples.columns:
            raise ValueError(
                "GRAPH pattern requires a quads table with a 'g' column"
            )
        if gterm.kind == "iri":
            gbase = triples.where(F.col("g") == gterm.value)
            gextra: List = []
        else:
            gbase = triples
            gextra = [F.col("g").alias(gterm.value)]
        sub = _compile_patterns(
            gbase, gpatterns, needs, tag=f"g{k}", extra=gextra,
            gvar=gterm.value if gterm.kind == "var" else None,
        )
        if plan is None:
            plan = sub
        elif sub is not None:
            plan = _join_shared(plan, sub)

    if q["unions"]:
        branches = [
            _compile_patterns(triples, g, needs, tag=f"u{k}")
            for k, g in enumerate(q["unions"])
        ]
        # an empty branch ({} UNION {…}) contributes one empty
        # solution — a single all-NULL-padded row, not a crash
        branches = [
            b if b is not None else triples.sparkSession.range(1).select()
            for b in branches
        ]
        # vars not bound by EVERY branch are NULL-padded; a
        # base-pattern join on such a var would need SPARQL
        # compatible-mapping semantics (unbound joins with anything,
        # output merges the bound value) — not an equi-join. Refuse
        # loudly (→ algebra fallback) rather than silently dropping
        # the padded solutions.
        ublock, padded = _align_union(branches)
        if plan is None:
            plan = ublock
        else:
            clash = padded & {c for c in plan.columns}
            if clash:
                raise NotImplementedError(
                    "UNION branches bind variable(s) "
                    f"{sorted(clash)} only in some branches while the "
                    "base pattern also binds them; compatible-mapping "
                    "join is not supported"
                )
            # _join_shared, NOT a plain join: companion __lang/__dt
            # columns are legitimately NULL and must compare null-
            # safely (a plain key would drop every plain-literal row)
            plan = _join_shared(plan, ublock)

    values_vars, values_rows = q["values"]
    if values_vars:
        spark = triples.sparkSession
        vdf = spark.createDataFrame(
            [tuple(r) for r in values_rows], schema=values_vars
        )
        if plan is None:
            plan = vdf
        else:
            shared = [c for c in plan.columns if c in vdf.columns]
            plan = (
                plan.join(F.broadcast(vdf), shared)
                if shared
                else plan.crossJoin(F.broadcast(vdf))
            )

    if plan is None:
        # SPARQL: the empty group pattern has exactly ONE solution
        # (the empty mapping) — ASK {} is true, SELECT * WHERE {}
        # yields one row binding nothing
        plan = triples.sparkSession.range(1).select()

    # per-group tags: two OPTIONAL groups each containing an all-
    # constant pattern would otherwise both emit an existence-gate
    # column named _mo0, which the second group's _join_shared would
    # treat as a spurious (and never-matching) join key
    for k, group in enumerate(q["optionals"]):
        sub = _compile_patterns(triples, group, needs, tag=f"o{k}_")
        if sub is None:
            continue  # OPTIONAL {} extends nothing — no-op
        # §18.5 LeftJoin also covers the disjoint-variable case: every
        # mapping pair is compatible, so a non-empty optional group
        # cross-extends each solution and an empty one leaves the left
        # rows unextended — exactly what _join_shared's constant-key
        # left join produces when there are no shared columns. (The
        # cross product is user-authored semantics; Catalyst plans the
        # tiny disjoint side as a broadcast.)
        plan = _join_shared(plan, sub, "left")

    for k, group in enumerate(q["minuses"]):
        sub = _compile_patterns(triples, group, needs, tag=f"m{k}_")
        if sub is None:
            continue  # MINUS {}: empty domain is disjoint — removes nothing
        shared = [c for c in plan.columns if c in sub.columns]
        # SPARQL §8.3: MINUS with disjoint domains removes nothing
        if shared:
            plan = _join_shared(
                plan, sub.select(*shared).distinct(), "left_anti"
            )

    for e, _needs, _evars, alias in q["binds"]:
        plan = plan.withColumn(alias, e.col(ColsResolver(plan.columns)))

    for fk, f in enumerate(q["filters"]):
        if f.kind == "expr":
            # §17.2: a never-bound variable evaluates as unbound (NULL
            # column, via ColsResolver) — ordinary expressions then
            # type-error → NULL → FILTER false, while value-aware forms
            # (BOUND / COALESCE / IF) see the unbound and handle it,
            # e.g. FILTER(!BOUND(?x)) keeps every solution
            plan = plan.where(f.expr.col(ColsResolver(plan.columns)))
        else:
            sub = _compile_patterns(triples, f.group, {}, tag=f"x{fk}_")
            if sub is None:
                # EXISTS {} is true for every solution; NOT EXISTS {}
                # false for every solution
                if f.kind == "not_exists":
                    plan = plan.where(F.lit(False))
                continue
            shared = [c for c in plan.columns if c in sub.columns]
            if not shared:
                # disjoint EXISTS is a global gate: the substituted
                # group is the same for every solution, so all rows
                # survive or none do. One driver-side emptiness probe
                # on the (pattern-bounded) sub-frame at compile time.
                if (f.kind == "exists") == sub.isEmpty():
                    plan = plan.where(F.lit(False))
                continue
            how = "left_semi" if f.kind == "exists" else "left_anti"
            plan = _join_shared(plan, sub.select(*shared).distinct(), how)

    return _finalize_select(plan, q, having_expr, having_aggs, _keep_meta)


def _finalize_select(
    plan: DataFrame,
    q: Dict,
    having_expr,
    having_aggs: List["AggItem"],
    _keep_meta: bool,
) -> DataFrame:
    """Shared solution-modifier tail (both compiler paths): GROUP BY /
    aggregates / HAVING, SELECT expressions, projection, DISTINCT,
    value-ordered ORDER BY, OFFSET/LIMIT.

    Never-bound projected variables (and expressions over them)
    project as NULL columns — §17.2 type-error-→-unbound semantics,
    matching rdflib. Projecting a non-grouped, non-aggregate variable
    in an aggregate query stays a loud error (§19.8 projection
    restriction — a query error, not an unbound)."""
    resolver = Resolver()
    aggs: List[AggItem] = q["aggs"]
    if aggs or q["group_by"] or having_aggs:
        group_cols: List[str] = []
        for k, (kind, payload, alias) in enumerate(q["group_by"]):
            if kind == "var":
                group_cols.append(payload)
                continue
            # (expr AS ?v) binds a projectable grouping var; a bare
            # expression groups on an internal synthetic column
            name = alias or f"__g{k}"
            e, _e_needs, evars = parse_expr(payload, q["prefixes"])
            for v in evars:
                if v not in plan.columns:
                    plan = plan.withColumn(v, F.lit(None).cast("string"))
            plan = plan.withColumn(name, e.col(resolver))
            group_cols.append(name)
        for a in list(aggs) + list(having_aggs):
            if a.arg_expr is not None:
                name = f"__ain_{a.alias}"
                e, _e_needs, evars = parse_expr(a.arg_expr, q["prefixes"])
                for v in evars:
                    if v not in plan.columns:
                        plan = plan.withColumn(
                            v, F.lit(None).cast("string")
                        )
                plan = plan.withColumn(name, e.col(resolver))
                a.var = name
        agg_cols = [a.column() for a in aggs] + [a.column() for a in having_aggs]
        if not agg_cols:
            raise ValueError("GROUP BY without aggregates in SELECT")
        grouped = plan.groupBy(*group_cols).agg(*agg_cols)
        if having_expr is not None:
            grouped = grouped.where(having_expr.col(resolver))
        # non-aggregate SELECT expressions evaluate over the grouped
        # frame (they may reference GROUP BY vars and agg aliases) —
        # previously they were silently dropped from the projection
        for body, alias in q["proj_exprs"]:
            e, _e_needs, evars = parse_expr(body, q["prefixes"])
            missing = [v for v in evars if v not in grouped.columns]
            if missing:
                raise ValueError(
                    "SELECT expression over aggregates references "
                    f"non-grouped vars: {missing}"
                )
            grouped = grouped.withColumn(alias, e.col(resolver))
        proj_cols = (
            [v for v in q["proj"]]
            # synthetic ?__sN aggregates feed proj_exprs, never project
            + [a.alias for a in aggs if not a.alias.startswith("__")]
            + [alias for _, alias in q["proj_exprs"]]
        )
        missing = [v for v in proj_cols if v not in grouped.columns]
        if missing:
            raise ValueError(
                f"projected vars not in GROUP BY/aggregates: {missing}"
            )
        out = grouped.select(*proj_cols)
    else:
        for body, alias in q["proj_exprs"]:
            e, e_needs, evars = parse_expr(body, q["prefixes"])
            missing = [
                v
                for v in evars
                if v not in plan.columns
            ]
            if missing:
                # SPARQL §17.2: the unbound var is a per-row type
                # error → the projected expression is unbound (NULL)
                for v in missing:
                    plan = plan.withColumn(v, F.lit(None).cast("string"))
            plan = plan.withColumn(alias, e.col(resolver))
        proj_cols = q["proj"] + [alias for _, alias in q["proj_exprs"]]
        missing = [v for v in proj_cols if v not in plan.columns]
        if missing:
            for v in missing:
                plan = plan.withColumn(v, F.lit(None).cast("string"))
        if _keep_meta:
            proj_cols = proj_cols + [
                c
                for c in plan.columns
                if c.endswith(("__lang", "__dt", "__kind"))
                and c not in proj_cols
            ]
        out = plan.select(*proj_cols)

    if q["distinct"]:
        out = out.distinct()
    if q["order_by"]:
        # SPARQL 15.1 orders numeric literals by VALUE; the value
        # columns are strings, so a bare string sort would yield
        # "10" < "2" < "9". Composite key: numeric interpretation
        # first (numbers sort by value, before all non-numerics —
        # a conformant consistent total order), lexical as tiebreak.
        # Expression conditions compile through the FILTER/BIND
        # expression layer and sort by the same composite.
        keys = []
        for kind, payload, desc in q["order_by"]:
            if kind == "var":
                col = F.col(payload)
            else:
                e, _needs, evars = parse_expr(payload, q["prefixes"])
                missing = [v for v in evars if v not in out.columns]
                if missing:
                    raise ValueError(
                        "ORDER BY expression references variables "
                        f"outside the projection: {missing}"
                    )
                col = e.col(resolver)
            num = col.try_cast("double")
            if desc:
                keys += [num.desc_nulls_first(), col.desc()]
            else:
                keys += [num.asc_nulls_last(), col.asc()]
        out = out.orderBy(*keys)
    if q["offset"] is not None:
        out = out.offset(q["offset"])
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out
