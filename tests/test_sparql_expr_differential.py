"""Differential testing of the SPARQL FILTER-expression compiler.

Random expression trees over two integer-typed and one string-typed
variable are evaluated twice per seeded case: by a Python mirror of
SPARQL 1.1 §17 operator semantics and by the Column compiler inside a
real ``FILTER(...)`` (so tokenizer → parser → Column tree → JVM
evaluation is exercised end to end). The surviving binding sets must
match exactly.

Scope matches the compiler's documented value model: arithmetic in
double (exact for the small-int pool), codepoint string order, total
(error-free) expressions — division and regex dialects are excluded
by construction, their semantics are pinned by hand tests instead.
"""

import random

import pytest

from py_sema_spark.queries.bgp import bgp_select

P_NUM1 = "http://example.org/num1"
P_NUM2 = "http://example.org/num2"
P_STR = "http://example.org/str"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

STR_POOL = ["alpha", "Beta", "gamma ray", "", "été", "中文", "a%20b", "zz"]


# ---- expression AST: each node is (sparql_text, python_fn) ----


def lit_n(v):
    return (str(v), lambda b: v)


def var_n(name):
    return ("?" + name, lambda b, n=name: b[n])


def gen_num(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.4:
        return rng.choice(
            [lit_n(rng.randrange(-5, 6)), var_n("n1"), var_n("n2")]
        )
    if r < 0.55:
        a = gen_num(rng, depth + 1)
        return ("-(%s)" % a[0], lambda b, a=a: -a[1](b))
    if r < 0.7:
        a = gen_num(rng, depth + 1)
        return ("ABS(%s)" % a[0], lambda b, a=a: abs(a[1](b)))
    op = rng.choice(["+", "-", "*"])
    a, c = gen_num(rng, depth + 1), gen_num(rng, depth + 1)
    fn = {
        "+": lambda x, y: x + y,
        "-": lambda x, y: x - y,
        "*": lambda x, y: x * y,
    }[op]
    return (
        "(%s %s %s)" % (a[0], op, c[0]),
        lambda b, a=a, c=c, fn=fn: fn(a[1](b), c[1](b)),
    )


def gen_str(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.45:
        if rng.random() < 0.6:
            return var_n("s1")
        v = rng.choice(STR_POOL)
        return ('"%s"' % v, lambda b, v=v: v)
    if r < 0.6:
        a = gen_str(rng, depth + 1)
        return ("UCASE(%s)" % a[0], lambda b, a=a: a[1](b).upper())
    if r < 0.72:
        a = gen_str(rng, depth + 1)
        return ("LCASE(%s)" % a[0], lambda b, a=a: a[1](b).lower())
    if r < 0.84:
        a, c = gen_str(rng, depth + 1), gen_str(rng, depth + 1)
        return (
            "CONCAT(%s, %s)" % (a[0], c[0]),
            lambda b, a=a, c=c: a[1](b) + c[1](b),
        )
    a = gen_str(rng, depth + 1)
    start = rng.randrange(1, 4)
    ln = rng.randrange(0, 4)
    return (
        "SUBSTR(%s, %d, %d)" % (a[0], start, ln),
        lambda b, a=a: a[1](b)[start - 1 : start - 1 + ln],
    )


def gen_bool(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.55:
        kind = rng.randrange(5)
        if kind == 0:
            op = rng.choice(["=", "!=", "<", ">", "<=", ">="])
            a, c = gen_num(rng, depth + 1), gen_num(rng, depth + 1)
        elif kind == 1:
            op = rng.choice(["=", "!=", "<", ">"])
            a, c = gen_str(rng, depth + 1), gen_str(rng, depth + 1)
        elif kind == 2:
            fn = rng.choice(["CONTAINS", "STRSTARTS", "STRENDS"])
            a = gen_str(rng, depth + 1)
            needle = rng.choice(["a", "B", "é", " ", "中", "zz", ""])
            py = {
                "CONTAINS": lambda s, t=needle: t in s,
                "STRSTARTS": lambda s, t=needle: s.startswith(t),
                "STRENDS": lambda s, t=needle: s.endswith(t),
            }[fn]
            return (
                '%s(%s, "%s")' % (fn, a[0], needle),
                lambda b, a=a, py=py: py(a[1](b)),
            )
        elif kind == 3:
            a = gen_str(rng, depth + 1)
            op = rng.choice(["=", "!=", "<", ">", "<=", ">="])
            c = lit_n(rng.randrange(0, 8))
            sa = ("STRLEN(%s)" % a[0], lambda b, a=a: len(a[1](b)))
            a = sa
        else:
            a = var_n("n1")
            vals = sorted(rng.sample(range(-5, 6), rng.randrange(1, 4)))
            neg = rng.random() < 0.4
            txt = "?n1 %sIN (%s)" % (
                "NOT " if neg else "",
                ", ".join(str(v) for v in vals),
            )
            return (
                txt,
                lambda b, vals=vals, neg=neg: (b["n1"] in vals) != neg,
            )
        cmp = {
            "=": lambda x, y: x == y,
            "!=": lambda x, y: x != y,
            "<": lambda x, y: x < y,
            ">": lambda x, y: x > y,
            "<=": lambda x, y: x <= y,
            ">=": lambda x, y: x >= y,
        }[op]
        return (
            "(%s %s %s)" % (a[0], op, c[0]),
            lambda b, a=a, c=c, cmp=cmp: cmp(a[1](b), c[1](b)),
        )
    if r < 0.7:
        a = gen_bool(rng, depth + 1)
        return ("!(%s)" % a[0], lambda b, a=a: not a[1](b))
    op = rng.choice(["&&", "||"])
    a, c = gen_bool(rng, depth + 1), gen_bool(rng, depth + 1)
    fn = (lambda x, y: x and y) if op == "&&" else (lambda x, y: x or y)
    return (
        "(%s %s %s)" % (a[0], op, c[0]),
        lambda b, a=a, c=c, fn=fn: fn(a[1](b), c[1](b)),
    )


@pytest.mark.parametrize("seed", range(40))
def test_differential_filter_expressions(spark, seed):
    rng = random.Random(3000 + seed)
    bindings = []
    rows = []
    for i in range(12):
        n1 = rng.randrange(-5, 6)
        n2 = rng.randrange(-5, 6)
        s1 = rng.choice(STR_POOL)
        subj = "urn:r:%d" % i
        bindings.append({"subj": subj, "n1": n1, "n2": n2, "s1": s1})
        rows += [
            (subj, P_NUM1, str(n1), "literal", XSD_INT, None),
            (subj, P_NUM2, str(n2), "literal", XSD_INT, None),
            (subj, P_STR, s1, "literal", None, None),
        ]
    df = spark.createDataFrame(
        rows,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )

    expr_txt, expr_py = gen_bool(rng)
    q = (
        "SELECT ?v WHERE { ?v <%s> ?n1 . ?v <%s> ?n2 . ?v <%s> ?s1 . "
        "FILTER(%s) }" % (P_NUM1, P_NUM2, P_STR, expr_txt)
    )
    expected = sorted(b["subj"] for b in bindings if expr_py(b))
    got = sorted(r["v"] for r in bgp_select(df, q, {}).collect())
    assert got == expected, (
        f"seed={seed}\nfilter={expr_txt}\nbindings={bindings}\n"
        f"expected={expected}\ngot={got}"
    )
