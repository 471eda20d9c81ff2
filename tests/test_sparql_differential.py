"""Differential testing of the SPARQL compiler.

A naive reference evaluator (textbook SPARQL algebra over Python
lists: BGP unification, compatibility-merge LeftJoin for OPTIONAL,
multiset projection) is run against :func:`bgp_select` on seeded
random graphs and random queries. The point is not any single
semantics corner but the cross product the hand-written suites can't
enumerate: shared-variable join shapes × OPTIONAL scoping × FILTER
placement × DISTINCT multiplicity, all checked as multisets (SPARQL
SELECT is bag semantics).

The generator keeps lexical spaces disjoint (IRIs ``urn:…``,
literals ``L…``) so value-space collisions don't mask kind bugs, and
only filters on variables bound by the required BGP (unbound-in-
FILTER is type-error semantics, pinned separately in
test_sparql_v2.py).
"""

import random

import pytest

from py_sema_spark.queries.bgp import bgp_select

SUBJECTS = [f"urn:s:{i}" for i in range(5)]
PREDS = [f"urn:p:{i}" for i in range(4)]
OBJ_IRIS = [f"urn:o:{i}" for i in range(3)]
OBJ_LITS = [f"L{i}" for i in range(3)]
VARS = ["a", "b", "c"]


def make_graph(rng):
    """Random triples over the small vocab; objects split iri/literal.
    Subjects may also appear as objects so s-o join chains exist."""
    n = rng.randrange(8, 26)
    rows = set()
    for _ in range(n):
        s = rng.choice(SUBJECTS)
        p = rng.choice(PREDS)
        r = rng.random()
        if r < 0.4:
            o, kind = rng.choice(OBJ_LITS), "literal"
        elif r < 0.7:
            o, kind = rng.choice(OBJ_IRIS), "iri"
        else:
            o, kind = rng.choice(SUBJECTS), "iri"
        rows.add((s, p, o, kind))
    return sorted(rows)


def make_patterns(rng, n_pat):
    """Triple patterns sharing variables: each term is ('var', name)
    or ('const', value, kind). Predicates are constants except an
    occasional predicate variable (compiler supports ?p scans)."""
    pats = []
    for i in range(n_pat):
        if i == 0 or rng.random() < 0.55:
            s = ("var", rng.choice(VARS))
        else:
            s = ("const", rng.choice(SUBJECTS), "iri")
        if rng.random() < 0.15:
            p = ("var", "p%d" % i)  # unique per pattern, projected never
        else:
            p = ("const", rng.choice(PREDS), "iri")
        r = rng.random()
        if r < 0.5:
            o = ("var", rng.choice(VARS))
        elif r < 0.75:
            o = ("const", rng.choice(OBJ_LITS), "literal")
        else:
            o = ("const", rng.choice(OBJ_IRIS + SUBJECTS), "iri")
        pats.append((s, p, o))
    return pats


def term_sparql(t):
    if t[0] == "var":
        return "?" + t[1]
    if t[2] == "literal":
        return '"%s"' % t[1]
    return "<%s>" % t[1]


def pattern_vars(pats):
    return {
        t[1]
        for pat in pats
        for t in pat
        if t[0] == "var" and not t[1].startswith("p")
    }


# ---- naive evaluator (SPARQL 1.1 §18.5 algebra, lists of dicts) ----


def match_pattern(graph, pat, binding):
    """All extensions of ``binding`` matching one triple pattern."""
    out = []
    for (s, p, o, kind) in graph:
        row = {"s": (s, "iri"), "p": (p, "iri"), "o": (o, kind)}
        mu = dict(binding)
        ok = True
        for t, pos in zip(pat, ("s", "p", "o")):
            val = row[pos]
            if t[0] == "const":
                if val != (t[1], t[2]):
                    ok = False
                    break
            else:
                bound = mu.get(t[1])
                if bound is None:
                    mu[t[1]] = val
                elif bound != val:
                    ok = False
                    break
        if ok:
            out.append(mu)
    return out


def eval_bgp(graph, pats, start=None):
    solutions = start if start is not None else [{}]
    for pat in pats:
        solutions = [
            mu for b in solutions for mu in match_pattern(graph, pat, b)
        ]
    return solutions


def compatible(m1, m2):
    return all(m1[k] == m2[k] for k in m1.keys() & m2.keys())


def left_join(left, right):
    out = []
    for m1 in left:
        exts = [
            {**m1, **m2} for m2 in right if compatible(m1, m2)
        ]
        out.extend(exts if exts else [m1])
    return out


def minus(left, right):
    """SPARQL §8.3: μ removed iff some right mapping is compatible AND
    shares at least one bound variable (disjoint domains remove
    nothing)."""
    return [
        m1
        for m1 in left
        if not any(
            compatible(m1, m2) and (m1.keys() & m2.keys()) for m2 in right
        )
    ]


def apply_filter(solutions, var, op, lit):
    keep = []
    for mu in solutions:
        v = mu.get(var)
        if v is None:
            continue  # unbound → type error → row dropped
        eq = v == (lit, "literal")
        keep.append(mu) if (eq if op == "=" else not eq) else None
    return keep


def project(solutions, names, distinct):
    rows = [
        tuple(mu.get(n, (None,))[0] for n in names) for mu in solutions
    ]
    if distinct:
        return sorted(set(rows))
    return sorted(rows, key=lambda r: tuple((x is None, x or "") for x in r))


def canon(rows, distinct):
    rows = [tuple(r) for r in rows]
    if distinct:
        return sorted(set(rows))
    return sorted(rows, key=lambda r: tuple((x is None, x or "") for x in r))


# ---- property-path differential ----
#
# AST := alt of 1-2 seqs; seq := 1-3 units; unit := [^]<pred>[+*?].
# Serialized without parens, which the spec's precedence (| < / <
# unary) parses back to the same tree. Naive eval mirrors §18.4/18.5:
# closures (+ * ?) are duplicate-free ALP sets over the node universe
# subjects ∪ objects; seq/alt keep bag multiplicity.


def gen_unit(rng):
    return (
        rng.choice(PREDS),
        rng.random() < 0.3,
        rng.choice([None] * 11 + ["+", "+", "*", "*", "?"]),
    )


def gen_path_ast(rng):
    return [
        [gen_unit(rng) for _ in range(rng.randrange(1, 4))]
        for _ in range(1 if rng.random() < 0.7 else 2)
    ]


def path_text(ast):
    return "|".join(
        "/".join(
            ("^" if inv else "") + "<%s>" % pred + (mod or "")
            for (pred, inv, mod) in seq
        )
        for seq in ast
    )


def graph_nodes(graph):
    return {s for (s, _, _, _) in graph} | {o for (_, _, o, _) in graph}


def set_closure(pairs):
    pairs = set(pairs)
    while True:
        grown = pairs | {
            (a, d) for (a, b) in pairs for (c, d) in pairs if b == c
        }
        if grown == pairs:
            return pairs
        pairs = grown


def unit_pairs(graph, unit):
    pred, inv, mod = unit
    base = [(s, o) for (s, p, o, _k) in graph if p == pred]
    if inv:
        base = [(b, a) for (a, b) in base]
    if mod is None:
        return base
    zero = {(n, n) for n in graph_nodes(graph)}
    if mod == "+":
        return sorted(set_closure(base))
    if mod == "*":
        return sorted(set_closure(base) | zero)
    return sorted(set(base) | zero)  # '?'


def eval_path(graph, ast):
    out = []
    for seq in ast:
        bag = unit_pairs(graph, seq[0])
        for unit in seq[1:]:
            nxt = unit_pairs(graph, unit)
            bag = [(a, d) for (a, b) in bag for (c, d) in nxt if b == c]
        out.extend(bag)
    return out


@pytest.mark.parametrize("seed", range(40))
def test_differential_property_paths(spark, seed):
    rng = random.Random(900 + seed)
    graph = make_graph(rng)
    df = spark.createDataFrame(
        [(s, p, o, kind, None, None) for (s, p, o, kind) in graph],
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )

    ast = gen_path_ast(rng)
    pairs = eval_path(graph, ast)

    src_const = rng.random() < 0.2 and rng.choice(SUBJECTS)
    distinct = rng.random() < 0.5
    extra = None
    if rng.random() < 0.3:
        extra = rng.choice(PREDS)

    if src_const:
        sols = [{"y": (b,)} for (a, b) in pairs if a == src_const]
        proj, head = ["y"], "<%s> %s ?y ." % (src_const, path_text(ast))
    else:
        sols = [{"x": (a,), "y": (b,)} for (a, b) in pairs]
        proj, head = ["x", "y"], "?x %s ?y ." % path_text(ast)
    body = head
    if extra:
        nxt = [(s, o) for (s, p, o, _k) in graph if p == extra]
        sols = [
            {**mu, "z": (c,)}
            for mu in sols
            for (b, c) in nxt
            if b == mu["y"][0]
        ]
        proj = proj + ["z"]
        body += " ?y <%s> ?z ." % extra

    q = "SELECT %s%s WHERE { %s }" % (
        "DISTINCT " if distinct else "",
        " ".join("?" + v for v in proj),
        body,
    )
    expected = project(sols, proj, distinct)
    got = canon(
        [tuple(r) for r in bgp_select(df, q, {}).collect()], distinct
    )
    assert got == expected, (
        f"seed={seed}\nquery={q}\ngraph={graph}\n"
        f"expected={expected}\ngot={got}"
    )


@pytest.mark.parametrize("seed", range(50))
def test_differential_bgp_optional_filter(spark, seed):
    rng = random.Random(100 + seed)
    graph = make_graph(rng)
    df = spark.createDataFrame(
        [
            (s, p, o, kind, None, None)
            for (s, p, o, kind) in graph
        ],
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )

    pats = make_patterns(rng, rng.randrange(1, 4))
    req_vars = pattern_vars(pats)
    union_pats = None
    if rng.random() < 0.3:
        # { A } UNION { B }: bag concat, branch-missing vars unbound
        union_pats = make_patterns(rng, rng.randrange(1, 3))
        req_vars = req_vars | pattern_vars(union_pats)

    opt_pats = []
    if rng.random() < 0.45:
        # single optional pattern; its subject var comes from the same
        # 3-name pool so it usually (not always) joins the required part
        opt_pats = make_patterns(rng, 1)

    minus_pats = []
    if rng.random() < 0.35:
        minus_pats = make_patterns(rng, 1)

    filt = None
    if rng.random() < 0.4:
        filt = (
            rng.choice(sorted(req_vars)),
            rng.choice(["=", "!="]),
            rng.choice(OBJ_LITS),
        )

    distinct = rng.random() < 0.35
    # the first required pattern always has a variable subject, so
    # req_vars is never empty and the projection is well-defined
    proj = sorted(req_vars | pattern_vars(opt_pats))

    def bgp_text(ps):
        return " ".join(
            "%s %s %s ." % tuple(term_sparql(t) for t in pat) for pat in ps
        )

    if union_pats is not None:
        body = "{ %s } UNION { %s }" % (bgp_text(pats), bgp_text(union_pats))
    else:
        body = bgp_text(pats)
    if opt_pats:
        body += " OPTIONAL { %s }" % bgp_text(opt_pats)
    if minus_pats:
        body += " MINUS { %s }" % bgp_text(minus_pats)
    if filt:
        body += ' FILTER(?%s %s "%s")' % filt
    q = "SELECT %s%s WHERE { %s }" % (
        "DISTINCT " if distinct else "",
        " ".join("?" + v for v in proj),
        body,
    )

    # naive algebra (the compiler applies OPTIONAL, MINUS, FILTER in
    # this group order; FILTER scope is the whole group regardless of
    # its textual position)
    sols = eval_bgp(graph, pats)
    if union_pats is not None:
        sols = sols + eval_bgp(graph, union_pats)
    if opt_pats:
        sols = left_join(sols, eval_bgp(graph, opt_pats))
    if minus_pats:
        sols = minus(sols, eval_bgp(graph, minus_pats))
    if filt:
        sols = apply_filter(sols, *filt)
    expected = project(sols, proj, distinct)

    got = canon(
        [tuple(r) for r in bgp_select(df, q, {}).collect()], distinct
    )
    assert got == expected, (
        f"seed={seed}\nquery={q}\ngraph={graph}\n"
        f"expected={expected}\ngot={got}"
    )
