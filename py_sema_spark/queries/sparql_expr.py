"""SPARQL expression → pyspark Column compiler.

The reference evaluates FILTER/BIND expressions through rdflib's
interpreter (python per row); here every supported expression compiles
to a JVM-side Column tree — whole-stage-codegen'd, pushdown-eligible,
no Python in the row path (SURVEY.md §2.2 F7/F8 and the X-series
scalar ladder are the semantic source; rdflib is the behavioural
model, not the implementation).

Supported grammar (SPARQL 1.1 §17 subset)::

    expr     := or
    or       := and ('||' and)*
    and      := unary2 ('&&' unary2)*
    unary2   := relational
    relational := additive (('='|'!='|'<'|'>'|'<='|'>=') additive)?
                | additive ('NOT'? 'IN' '(' expr (',' expr)* ')')?
    additive := mult (('+'|'-') mult)*
    mult     := unary (('*'|'/') unary)*
    unary    := '!' unary | '-' unary | primary
    primary  := '(' expr ')' | literal | var | call

Calls: REGEX LANGMATCHES LANG BOUND STR CONTAINS STRSTARTS STRENDS
STRLEN UCASE LCASE SUBSTR REPLACE CONCAT COALESCE IF ABS CEIL FLOOR
ROUND STRBEFORE STRAFTER IRI URI DATATYPE ISIRI ISURI ISLITERAL
ISBLANK SAMETERM ENCODE_FOR_URI MD5 SHA1 SHA256 SHA384 SHA512
ISNUMERIC YEAR MONTH DAY HOURS MINUTES SECONDS.

Value model: variables are the string-typed columns the BGP compiler
projects; numeric comparison/arithmetic casts to double exactly when a
numeric literal, arithmetic result, or numeric builtin is involved —
mirroring SPARQL's operator dispatch on the literal forms our triples
table stores. ``LANG``/``DATATYPE``/``ISIRI``-family read companion
columns (``?v__lang``/``__dt``/``__kind``) that the BGP compiler
projects on demand (the parse result's ``needs`` map says which).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Set, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD_NS + "string"

# ---------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<iri><[^>\s]*>)
      | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
      | (?P<string>"(?:[^"\\]|\\.)*")(?:@(?P<lang>[A-Za-z][A-Za-z0-9-]*)|\^\^(?P<dt>\S+?(?=[,)\s]|$)))?
      | (?P<number>[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*(?::[A-Za-z0-9_.%-]+)?)
      | (?P<op>&&|\|\||!=|<=|>=|[=<>!+\-*/(),;])
    )""",
    re.VERBOSE,
)


class Token:
    __slots__ = ("kind", "value", "lang", "dt")

    def __init__(self, kind, value, lang=None, dt=None):
        self.kind, self.value, self.lang, self.dt = kind, value, lang, dt

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.kind},{self.value!r})"


# grammar ECHAR (\t \b \n \r \f \" \' \\) + UCHAR (\uXXXX / \UXXXXXXXX),
# decoded in ONE left-to-right pass so decoded output is never
# re-scanned ('\\u0041' is backslash + literal u0041, not 'A' — the
# same double-decode class as the r4 sitemap finding). Unknown escapes
# keep the escaped character (lenient, matching the engine's style).
# Gap found by the manifest-driven W3C suite (strlen-001: é).
_STR_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_ECHAR_MAP = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
}


def unescape_sparql_string(raw: str) -> str:
    def _dec(m: "re.Match") -> str:
        g = m.group(1)
        if len(g) == 5 and g[0] == "u":
            return chr(int(g[1:], 16))
        if len(g) == 9 and g[0] == "U":
            return chr(int(g[1:], 16))
        return _ECHAR_MAP.get(g, g)

    return _STR_ESC_RE.sub(_dec, raw)


def tokenize(text: str) -> List[Token]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise ValueError(f"cannot tokenize expression at: {text[pos:]!r}")
            break
        pos = m.end()
        if m.group("iri"):
            out.append(Token("iri", m.group("iri")[1:-1]))
        elif m.group("var"):
            out.append(Token("var", m.group("var")[1:]))
        elif m.group("string") is not None:
            raw = m.group("string")[1:-1]
            out.append(
                Token(
                    "string", unescape_sparql_string(raw),
                    m.group("lang"), m.group("dt"),
                )
            )
        elif m.group("number"):
            out.append(Token("number", m.group("number")))
        elif m.group("name"):
            out.append(Token("name", m.group("name")))
        else:
            out.append(Token("op", m.group("op")))
    return out


# ---------------------------------------------------------------------
# AST: compiled lazily against a resolver
# ---------------------------------------------------------------------


class Resolver:
    """Maps variable names to plan columns (+ companion columns).

    The default implementation reads ``v``, ``v__lang``, ``v__dt``,
    ``v__kind`` columns; the BGP compiler guarantees they exist for
    every variable the parse's ``needs`` map flags.
    """

    def var(self, name: str) -> Column:
        return F.col(name)

    def lang(self, name: str) -> Column:
        return F.coalesce(F.col(name + "__lang"), F.lit(""))

    def dt(self, name: str) -> Column:
        return F.col(name + "__dt")

    def kind(self, name: str) -> Column:
        return F.col(name + "__kind")


class ColsResolver(Resolver):
    """Resolver over a concrete column set: referenced-but-absent
    variables (and absent companion columns — e.g. a BIND alias has no
    __lang) evaluate as unbound (NULL) instead of AnalysisException.
    This is §17.2 semantics: an unbound variable is a type error in
    ordinary expressions (comparison → NULL → FILTER false) but a
    value BOUND / COALESCE / IF handle without erroring."""

    def __init__(self, cols):
        self.cols = set(cols)

    def var(self, name: str) -> Column:
        return F.col(name) if name in self.cols else F.lit(None).cast("string")

    def lang(self, name: str) -> Column:
        c = name + "__lang"
        if c in self.cols:
            return F.coalesce(F.col(c), F.lit(""))
        return F.lit("")

    def dt(self, name: str) -> Column:
        c = name + "__dt"
        return F.col(c) if c in self.cols else F.lit(None).cast("string")

    def kind(self, name: str) -> Column:
        c = name + "__kind"
        return F.col(c) if c in self.cols else F.lit(None).cast("string")


class Expr:
    """(compile, typehint) pair; hint ∈ num|str|bool|any. ``meta``
    carries term-level info the column alone can't: ``{'var': name}``
    for a bare variable, ``{'lang': tag}`` / ``{'dt': iri}`` for a
    tagged/typed literal constant — =/!= use it for RDF-term equality
    (value AND language/datatype), not bare lexical equality."""

    __slots__ = ("fn", "hint", "meta")

    def __init__(
        self, fn: Callable[[Resolver], Column], hint: str, meta=None
    ):
        self.fn, self.hint, self.meta = fn, hint, meta or {}

    def col(self, r: Resolver) -> Column:
        return self.fn(r)


def _num(e: Expr, r: Resolver) -> Column:
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
    # cast of a non-numeric literal throws CAST_INVALID_INPUT and
    # kills the job; SPARQL semantics make it a per-row type error
    # (the row filters out / the expression yields NULL)
    c = e.col(r)
    return c if e.hint == "num" else c.try_cast("double")


class _Parser:
    def __init__(self, tokens: List[Token], prefixes: Dict[str, str]):
        self.toks = tokens
        self.i = 0
        self.prefixes = prefixes
        self.needs: Dict[str, Set[str]] = {}
        self.vars: Set[str] = set()

    # -- token helpers --
    def peek(self) -> Token | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end of expression")
        self.i += 1
        return tok

    def accept_op(self, *ops: str) -> str | None:
        tok = self.peek()
        if tok and tok.kind == "op" and tok.value in ops:
            self.i += 1
            return tok.value
        return None

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            raise ValueError(f"expected {op!r} at token {self.peek()!r}")

    def _need(self, var: str, what: str) -> None:
        self.needs.setdefault(var, set()).add(what)

    # -- grammar --
    def parse(self) -> Expr:
        e = self.expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens in expression: {self.peek()!r}")
        return e

    def expr(self) -> Expr:
        return self.or_()

    def or_(self) -> Expr:
        left = self.and_()
        while self.accept_op("||"):
            right = self.and_()
            l, rr = left, right
            left = Expr(lambda r, l=l, rr=rr: l.col(r) | rr.col(r), "bool")
        return left

    def and_(self) -> Expr:
        left = self.relational()
        while self.accept_op("&&"):
            right = self.relational()
            l, rr = left, right
            left = Expr(lambda r, l=l, rr=rr: l.col(r) & rr.col(r), "bool")
        return left

    def relational(self) -> Expr:
        left = self.additive()
        tok = self.peek()
        if tok and tok.kind == "name" and tok.value.upper() in ("IN", "NOT"):
            negate = tok.value.upper() == "NOT"
            self.i += 1
            if negate:
                nxt = self.next()
                if not (nxt.kind == "name" and nxt.value.upper() == "IN"):
                    raise ValueError("expected IN after NOT")
            self.expect_op("(")
            items = [self.expr()]
            while self.accept_op(","):
                items.append(self.expr())
            self.expect_op(")")
            l, its = left, items

            def _in(r: Resolver, l=l, its=its, negate=negate) -> Column:
                # OR-chain (not Column.isin) so items may be arbitrary
                # expressions, not only python literals
                v = l.col(r)
                c = F.lit(False)
                for e in its:
                    c = c | (v == e.col(r))
                return ~c if negate else c

            return Expr(_in, "bool")
        op = self.accept_op("=", "!=", "<", ">", "<=", ">=")
        if not op:
            return left
        right = self.additive()
        numeric = "num" in (left.hint, right.hint)
        l, rr = left, right
        if op in ("=", "!="):  # flag companion columns the compare reads
            for var_side, lit_side in ((l, rr), (rr, l)):
                name = var_side.meta.get("var")
                if name is None:
                    continue
                if "lang" in lit_side.meta:
                    self._need(name, "lang")
                elif "dt" in lit_side.meta:
                    self._need(name, "dt")
                elif "plain" in lit_side.meta:
                    self._need(name, "lang")
                    self._need(name, "dt")

        def _term_extra(r: Resolver) -> Column | None:
            """var =/!= tagged-or-typed literal: RDF-term equality also
            requires the language tag (case-insensitive) / datatype to
            match — "chat"@en must not equal plain "chat" or "chat"@fr."""
            for var_side, lit_side in ((l, rr), (rr, l)):
                name = var_side.meta.get("var")
                if name is None:
                    continue
                if "lang" in lit_side.meta:
                    return F.lower(r.lang(name)) == lit_side.meta[
                        "lang"].lower()
                if "dt" in lit_side.meta:
                    return r.dt(name).eqNullSafe(F.lit(lit_side.meta["dt"]))
                if "plain" in lit_side.meta:
                    # plain literal ≡ xsd:string: the var must carry no
                    # lang tag and no (non-string) datatype
                    return (r.lang(name) == "") & (
                        r.dt(name).isNull()
                        | (r.dt(name) == XSD_STRING)
                    )
            return None

        def _cmp(r: Resolver, l=l, rr=rr, op=op, numeric=numeric) -> Column:
            a = _num(l, r) if numeric else l.col(r)
            b = _num(rr, r) if numeric else rr.col(r)
            if op in ("=", "!="):
                eq = a == b
                extra = _term_extra(r)
                if extra is not None:
                    eq = eq & extra
                return eq if op == "=" else ~eq
            return {
                "<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b,
            }[op]

        return Expr(_cmp, "bool")

    def additive(self) -> Expr:
        left = self.mult()
        while True:
            op = self.accept_op("+", "-")
            if not op:
                return left
            right = self.mult()
            l, rr = left, right
            left = Expr(
                lambda r, l=l, rr=rr, op=op: (
                    _num(l, r) + _num(rr, r) if op == "+" else _num(l, r) - _num(rr, r)
                ),
                "num",
            )

    def mult(self) -> Expr:
        left = self.unary()
        while True:
            op = self.accept_op("*", "/")
            if not op:
                return left
            right = self.unary()
            l, rr = left, right
            left = Expr(
                lambda r, l=l, rr=rr, op=op: (
                    _num(l, r) * _num(rr, r) if op == "*" else _num(l, r) / _num(rr, r)
                ),
                "num",
            )

    def unary(self) -> Expr:
        if self.accept_op("!"):
            e = self.unary()
            return Expr(lambda r, e=e: ~e.col(r), "bool")
        if self.accept_op("-"):
            e = self.unary()
            return Expr(lambda r, e=e: -_num(e, r), "num")
        return self.primary()

    def _expand_dt(self, dt: str) -> str:
        """``^^`` datatype token → full IRI (strip <> or expand CURIE)."""
        if dt.startswith("<") and dt.endswith(">"):
            return dt[1:-1]
        pfx, _, local = dt.partition(":")
        if self.prefixes and pfx in self.prefixes:
            return self.prefixes[pfx] + local
        raise ValueError(f"unknown datatype prefix in {dt!r}")

    def primary(self) -> Expr:
        if self.accept_op("("):
            e = self.expr()
            self.expect_op(")")
            return e
        tok = self.next()
        if tok.kind == "var":
            self.vars.add(tok.value)
            name = tok.value
            return Expr(lambda r, name=name: r.var(name), "any",
                        {"var": name})
        if tok.kind == "string":
            meta = {}
            if tok.lang:
                meta["lang"] = tok.lang
            elif tok.dt:
                meta["dt"] = self._expand_dt(tok.dt)
            else:
                # a PLAIN string literal (≡ xsd:string): = / != against
                # a var must also check the var carries no lang tag and
                # no non-string datatype (RDFterm-equal) — "chat"@en is
                # NOT equal to plain "chat"
                meta["plain"] = True
            return Expr(lambda r, v=tok.value: F.lit(v), "str", meta)
        if tok.kind == "number":
            v = float(tok.value) if "." in tok.value or "e" in tok.value.lower() else int(tok.value)
            return Expr(lambda r, v=v: F.lit(v), "num")
        if tok.kind == "iri":
            if self.accept_op("("):
                return self.cast_call(tok.value)
            return Expr(lambda r, v=tok.value: F.lit(v), "str")
        if tok.kind == "name":
            up = tok.value.upper()
            if up == "TRUE":
                return Expr(lambda r: F.lit(True), "bool")
            if up == "FALSE":
                return Expr(lambda r: F.lit(False), "bool")
            if ":" in tok.value:
                pfx, _, local = tok.value.partition(":")
                if self.prefixes and pfx in self.prefixes:
                    iri = self.prefixes[pfx] + local
                    if self.accept_op("("):
                        # XSD constructor cast (§17.5): xsd:integer(?v)
                        return self.cast_call(iri)
                    # bare prefixed name (CURIE) → IRI constant
                    return Expr(lambda r, v=iri: F.lit(v), "str")
                raise ValueError(
                    f"unknown prefix in expression name {tok.value!r}"
                )
            if self.accept_op("("):
                return self.call(up)
            raise ValueError(f"unsupported bare name {tok.value!r} in expression")
        raise ValueError(f"unexpected token {tok!r}")

    # -- XSD constructor casts (§17.5 XPath constructor functions) --
    def cast_call(self, iri: str) -> Expr:
        arg = self.expr()
        self.expect_op(")")
        local = iri[len(XSD_NS):] if iri.startswith(XSD_NS) else None
        if local in ("integer", "int", "long", "short", "byte",
                     "nonNegativeInteger", "positiveInteger",
                     "negativeInteger", "nonPositiveInteger",
                     "unsignedInt", "unsignedLong"):
            # XPath casting rules: string → integer requires an
            # integer LEXICAL form ("2.7" is a type error → NULL;
            # try_cast(bigint) gives exactly that), while a NUMERIC
            # operand (hint num — already a number, e.g. a nested
            # arithmetic result) truncates toward zero
            if arg.hint == "num":
                return Expr(
                    lambda r, a=arg: a.col(r).try_cast("bigint"), "num"
                )
            return Expr(
                lambda r, a=arg: a.col(r).cast("string")
                .try_cast("bigint"),
                "num",
            )
        if local in ("double", "float", "decimal"):
            return Expr(
                lambda r, a=arg: a.col(r).try_cast("double"), "num"
            )
        if local == "string":
            return Expr(lambda r, a=arg: a.col(r).cast("string"), "str")
        if local == "boolean":
            def _b(r, a=arg):
                c = a.col(r).cast("string")
                return (
                    F.when(c.isin("true", "1"), F.lit(True))
                    .when(c.isin("false", "0"), F.lit(False))
                )
            return Expr(_b, "bool")
        if local in ("dateTime", "date"):
            return Expr(
                lambda r, a=arg: F.try_to_timestamp(
                    a.col(r).cast("string")
                ),
                "any",
            )
        raise ValueError(f"unsupported function IRI <{iri}> in expression")

    # -- function calls (opening paren consumed) --
    def call(self, fname: str) -> Expr:
        args: List[Expr] = []
        argvars: List[str | None] = []
        if not self.accept_op(")"):
            while True:
                tok = self.peek()
                argvars.append(tok.value if tok and tok.kind == "var" else None)
                args.append(self.expr())
                if not self.accept_op(","):
                    break
            self.expect_op(")")
        return self._compile_call(fname, args, argvars)

    def _compile_call(self, f: str, a: List[Expr], av: List[str | None]) -> Expr:
        def arity(*ns: int) -> None:
            if len(a) not in ns:
                raise ValueError(f"{f} expects {ns} args, got {len(a)}")

        if f == "REGEX":
            arity(2, 3)
            def _rx(r, a=a):
                pat = a[1].col(r)
                if len(a) == 3:
                    pat = F.concat(F.lit("(?"), a[2].col(r), F.lit(")"), pat)
                # regexp_like (not Column.rlike) — the pattern may be a
                # Column expression, not only a python literal
                return F.regexp_like(a[0].col(r), pat)
            return Expr(_rx, "bool")
        if f == "LANG":
            arity(1)
            if av[0] is None:
                raise ValueError("LANG() argument must be a variable")
            self._need(av[0], "lang")
            v = av[0]
            return Expr(lambda r, v=v: r.lang(v), "str")
        if f == "LANGMATCHES":
            arity(2)
            l, pat = a[0], a[1]
            def _lm(r, l=l, pat=pat):
                lc, pc = F.lower(l.col(r)), F.lower(pat.col(r))
                return F.when(pc == "*", l.col(r) != "").otherwise(
                    (lc == pc) | lc.startswith(F.concat(pc, F.lit("-")))
                )
            return Expr(_lm, "bool")
        if f == "BOUND":
            arity(1)
            if av[0] is None:
                raise ValueError("BOUND() argument must be a variable")
            v = av[0]
            return Expr(lambda r, v=v: r.var(v).isNotNull(), "bool")
        if f == "STR":
            arity(1)
            return Expr(lambda r, a=a: a[0].col(r).cast("string"), "str")
        if f in ("IRI", "URI"):
            arity(1)
            return Expr(lambda r, a=a: a[0].col(r).cast("string"), "str")
        if f == "CONTAINS":
            arity(2)
            return Expr(lambda r, a=a: a[0].col(r).contains(a[1].col(r)), "bool")
        if f == "STRSTARTS":
            arity(2)
            return Expr(lambda r, a=a: a[0].col(r).startswith(a[1].col(r)), "bool")
        if f == "STRENDS":
            arity(2)
            return Expr(lambda r, a=a: a[0].col(r).endswith(a[1].col(r)), "bool")
        if f == "STRLEN":
            arity(1)
            return Expr(lambda r, a=a: F.length(a[0].col(r)), "num")
        if f == "UCASE":
            arity(1)
            return Expr(lambda r, a=a: F.upper(a[0].col(r)), "str")
        if f == "LCASE":
            arity(1)
            return Expr(lambda r, a=a: F.lower(a[0].col(r)), "str")
        if f == "SUBSTR":
            arity(2, 3)
            def _sub(r, a=a):
                if len(a) == 3:
                    return a[0].col(r).substr(
                        _num(a[1], r).cast("int"), _num(a[2], r).cast("int")
                    )
                return a[0].col(r).substr(_num(a[1], r).cast("int"), F.lit(1 << 30))
            return Expr(_sub, "str")
        if f == "REPLACE":
            arity(3, 4)
            def _rep(r, a=a):
                pat = a[1].col(r)
                if len(a) == 4:
                    pat = F.concat(F.lit("(?"), a[3].col(r), F.lit(")"), pat)
                return F.regexp_replace(a[0].col(r), pat, a[2].col(r))
            return Expr(_rep, "str")
        if f == "CONCAT":
            return Expr(lambda r, a=a: F.concat(*[x.col(r).cast("string") for x in a]), "str")
        if f == "COALESCE":
            return Expr(lambda r, a=a: F.coalesce(*[x.col(r) for x in a]), "any")
        if f == "IF":
            arity(3)
            return Expr(
                lambda r, a=a: F.when(a[0].col(r), a[1].col(r)).otherwise(a[2].col(r)),
                "any",
            )
        if f == "ABS":
            arity(1)
            return Expr(lambda r, a=a: F.abs(_num(a[0], r)), "num")
        if f == "CEIL":
            arity(1)
            return Expr(lambda r, a=a: F.ceil(_num(a[0], r)).cast("double"), "num")
        if f == "FLOOR":
            arity(1)
            return Expr(lambda r, a=a: F.floor(_num(a[0], r)).cast("double"), "num")
        if f == "ROUND":
            arity(1)
            return Expr(lambda r, a=a: F.round(_num(a[0], r), 0), "num")
        if f == "STRBEFORE":
            arity(2)
            def _sb(r, a=a):
                s, sub = a[0].col(r), a[1].col(r)
                pos = F.position(sub, s)
                return F.when(pos > 0, s.substr(F.lit(1), (pos - 1).cast("int"))).otherwise(F.lit(""))
            return Expr(_sb, "str")
        if f == "STRAFTER":
            arity(2)
            def _sa(r, a=a):
                s, sub = a[0].col(r), a[1].col(r)
                pos = F.position(sub, s)
                return F.when(
                    pos > 0, s.substr((pos + F.length(sub)).cast("int"), F.lit(1 << 30))
                ).otherwise(F.lit(""))
            return Expr(_sa, "str")
        if f == "ENCODE_FOR_URI":
            arity(1)
            # url_encode is form-encoding (space→'+'); ENCODE_FOR_URI
            # wants RFC 3986 %20
            return Expr(
                lambda r, a=a: F.replace(
                    F.url_encode(a[0].col(r)), F.lit("+"), F.lit("%20")
                ),
                "str",
            )
        if f in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
            arity(1)
            def _hash(r, a=a, f=f):
                s = a[0].col(r).cast("string")
                if f == "MD5":
                    return F.md5(s)
                if f == "SHA1":
                    return F.sha1(s)
                return F.sha2(s, int(f[3:]))
            return Expr(_hash, "str")
        if f == "ISNUMERIC":
            arity(1)
            # numeric per SPARQL §17.4.2.4: value castable to double
            # (try_cast — ANSI mode makes a plain cast throw)
            return Expr(
                lambda r, a=a: a[0].col(r).try_cast("double").isNotNull(),
                "bool",
            )
        if f in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
            arity(1)
            fn = {
                "YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth,
                "HOURS": F.hour, "MINUTES": F.minute, "SECONDS": F.second,
            }[f]
            # literal values are stored lexically; accessor works on
            # the ISO form (xsd:date/dateTime) via an implicit cast
            # try_to_timestamp: non-temporal operands yield NULL
            # instead of an ANSI runtime error mid-filter
            return Expr(
                lambda r, a=a, fn=fn: fn(
                    F.try_to_timestamp(a[0].col(r).cast("string"))
                ),
                "num",
            )
        if f == "DATATYPE":
            arity(1)
            if av[0] is None:
                raise ValueError("DATATYPE() argument must be a variable")
            self._need(av[0], "dt")
            self._need(av[0], "lang")
            v = av[0]
            def _dt(r, v=v):
                return F.coalesce(
                    r.dt(v),
                    F.when(r.lang(v) != "", F.lit(RDF_LANGSTRING)).otherwise(
                        F.lit(XSD_STRING)
                    ),
                )
            return Expr(_dt, "str")
        if f in ("ISIRI", "ISURI", "ISLITERAL", "ISBLANK"):
            arity(1)
            if av[0] is None:
                raise ValueError(f"{f}() argument must be a variable")
            self._need(av[0], "kind")
            v = av[0]
            want = {"ISIRI": "iri", "ISURI": "iri", "ISLITERAL": "literal", "ISBLANK": "bnode"}[f]
            return Expr(lambda r, v=v, want=want: r.kind(v) == want, "bool")
        if f == "SAMETERM":
            arity(2)
            return Expr(lambda r, a=a: a[0].col(r).eqNullSafe(a[1].col(r)), "bool")
        if f == "RAND":
            arity(0)
            return Expr(lambda r: F.rand(), "num")
        if f == "NOW":
            arity(0)
            return Expr(lambda r: F.current_timestamp(), "any")
        if f == "STRUUID":
            arity(0)
            return Expr(lambda r: F.expr("uuid()"), "str")
        if f == "TZ":
            # lexical timezone of an xsd:dateTime: "Z", "+05:00", or ""
            arity(1)
            return Expr(
                lambda r, a=a: F.regexp_extract(
                    a[0].col(r).cast("string"),
                    r"(Z|[+-]\d{2}:\d{2})$", 1,
                ),
                "str",
            )
        if f in ("STRDT", "STRLANG"):
            # value-space only: returns the lexical form. The term
            # metadata (datatype/language) is NOT attached — companion
            # columns exist only for pattern-bound variables, so a
            # constructed term participates in comparisons by lexical
            # value. Documented approximation (rdflib carries full
            # terms here).
            arity(2)
            return Expr(lambda r, a=a: a[0].col(r).cast("string"), "str")
        raise ValueError(f"unsupported SPARQL function {f}()")


def parse_expr(
    text: str, prefixes: Dict[str, str] | None = None
) -> Tuple[Expr, Dict[str, Set[str]], Set[str]]:
    """Parse one SPARQL expression.

    Returns ``(expr, needs, vars)`` — ``needs`` maps var name →
    companion columns required ({'lang','dt','kind'} subset), ``vars``
    is every variable referenced. ``expr.col(Resolver())`` yields the
    pyspark Column.
    """
    p = _Parser(tokenize(text), dict(prefixes or {}))
    e = p.parse()
    return e, p.needs, p.vars
