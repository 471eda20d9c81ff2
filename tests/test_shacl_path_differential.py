"""Differential testing of SHACL property-path semantics.

Random path ASTs (inverse / sequence / alternative / zeroOrMore /
oneOrMore / zeroOrOne over random predicates) with random value
constraints run against random graphs twice: through
``shacl.validate``'s DataFrame compilation (predicate slices +
equi-joins + doubling closure) and through a naive Python set/BFS
mirror of §2.3.1. The violation sets must match exactly — the
hand-written suite (test_shacl_paths.py) pins each form in isolation,
this pins their compositions: zero-capable tails inside sequences,
closures that end on literals, inverse-of-sequence, counting over
deduplicated path value sets.
"""

import random
import re

import pytest

from py_sema_spark.shacl import (
    XSD,
    NodeShape,
    PropertyShape,
    path_str,
    validate,
)
from tests.test_shacl_differential import (
    RDF_TYPE,
    effective_dt,
    make_graph,
    to_num,
)

CLASSES = ["urn:C0", "urn:C1"]
PREDS = [f"urn:q{i}" for i in range(4)]
SUBJECTS = [f"urn:i:{i}" for i in range(10)]


def make_path(rng, depth=0):
    forms = ["pred", "inv", "seq", "alt", "zom", "oom", "zoo"]
    if depth >= 2:
        forms = ["pred"]
    kind = rng.choice(forms)
    if kind == "pred":
        return ("pred", rng.choice(PREDS))
    if kind in ("seq", "alt"):
        return (kind, [make_path(rng, depth + 1) for _ in range(2)])
    return (kind, make_path(rng, depth + 1))


def node_kind(v):
    return "bnode" if v.startswith("_:") else "iri"


def eval_path(graph, ast):
    """Naive mirror of shacl._path_values: ≥1-length (s → value-term)
    pair set + includes_zero flag. Value terms are
    (o, kind, datatype, lang) tuples."""
    kind = ast[0]
    if kind == "pred":
        return (
            {(s, (o, k, d, l)) for (s, p, o, k, d, l) in graph
             if p == ast[1]},
            False,
        )
    if kind == "inv":
        # literal objects kept: they are valid focus keys of the
        # inverted relation (sh:targetObjectsOf on a literal)
        pairs, z = eval_path(graph, ast[1])
        return (
            {(v[0], (s, node_kind(s), None, None))
             for (s, v) in pairs},
            z,
        )
    if kind == "seq":
        pairs, z = eval_path(graph, ast[1][0])
        for sub in ast[1][1:]:
            nxt, nz = eval_path(graph, sub)
            comp = {
                (s, v2)
                for (s, v) in pairs
                if v[1] != "literal"
                for (m, v2) in nxt
                if m == v[0]
            }
            if nz:
                comp |= pairs
            if z:
                comp |= nxt
            pairs, z = comp, z and nz
        return (pairs, z)
    if kind == "alt":
        subs = [eval_path(graph, p) for p in ast[1]]
        out = set()
        for ps, _ in subs:
            out |= ps
        return (out, any(z for _, z in subs))
    if kind in ("zom", "oom"):
        pairs, z = eval_path(graph, ast[1])
        edges = {(s, v[0]) for (s, v) in pairs if v[1] != "literal"}
        closure = set(edges)
        while True:
            grown = {(a, d) for (a, b) in closure for (c, d) in edges
                     if b == c} - closure
            if not grown:
                break
            closure |= grown
        node_vals = {(s, (d, node_kind(d), None, None))
                     for (s, d) in closure}
        lits = {(s, v) for (s, v) in pairs if v[1] == "literal"}
        lit_via = {(s, v) for (s, d) in closure
                   for (m, v) in lits if m == d}
        return (node_vals | lits | lit_via,
                True if kind == "zom" else z)
    if kind == "zoo":
        pairs, _ = eval_path(graph, ast[1])
        return (pairs, True)
    raise AssertionError(ast)


def make_path_shape(rng):
    ast = make_path(rng)
    ps = PropertyShape(path=path_str(ast), path_ast=ast)
    picks = rng.sample(
        ["max", "min", "pattern", "kind", "datatype", "in", "class",
         "range", "len"],
        rng.randrange(1, 3),
    )
    if "max" in picks:
        ps.max_count = rng.randrange(0, 4)
    if "min" in picks:
        ps.min_count = rng.randrange(0, 4)
    if "pattern" in picks:
        ps.pattern = rng.choice(["^a", "c", "9$", "urn", "i:[0-4]$"])
    if "kind" in picks:
        ps.node_kind = rng.choice([
            "http://www.w3.org/ns/shacl#IRI",
            "http://www.w3.org/ns/shacl#Literal",
            "http://www.w3.org/ns/shacl#BlankNodeOrIRI",
        ])
    if "datatype" in picks:
        ps.datatype = rng.choice([XSD + "string", XSD + "integer"])
    if "in" in picks:
        ps.in_values = rng.sample(SUBJECTS, 3)
    if "class" in picks:
        ps.class_ = rng.choice(CLASSES)
    if "range" in picks:
        ps.min_inclusive = float(rng.randrange(-5, 5))
    if "len" in picks:
        ps.min_length = rng.randrange(0, 3)
        ps.max_length = ps.min_length + rng.randrange(0, 8)
    shape = NodeShape(iri="urn:shape:path", properties=[ps])
    r = rng.random()
    if r < 0.5:
        shape.target_class = rng.choice(CLASSES)
    elif r < 0.8:
        shape.target_subjects_of = rng.choice(PREDS)
    else:
        shape.target_nodes = rng.sample(SUBJECTS, 3)
    return shape


def naive_path_validate(graph, shape):
    out = set()
    fset = set(shape.target_nodes)
    if shape.target_class:
        fset |= {s for (s, p, o, *_r) in graph
                 if p == RDF_TYPE and o == shape.target_class}
    if shape.target_subjects_of:
        fset |= {t[0] for t in graph if t[1] == shape.target_subjects_of}
    (ps,) = shape.properties
    pairs, z = eval_path(graph, ps.path_ast)
    by_focus = {}
    for (s, v) in pairs:
        if s in fset:
            by_focus.setdefault(s, set()).add(v)
    if z:
        for f in fset:
            by_focus.setdefault(f, set()).add(
                (f, node_kind(f), None, None)
            )

    def viol(f, constraint, value):
        out.add((f, shape.iri, ps.path, constraint, value))

    for f in sorted(fset):
        vals = by_focus.get(f, set())
        if ps.max_count is not None and len(vals) > ps.max_count:
            viol(f, "maxCount", str(len(vals)))
        if ps.min_count is not None and len(vals) < ps.min_count:
            viol(f, "minCount", str(len(vals)))
        for (o, k, d, l) in vals:
            if ps.pattern is not None:
                if k == "bnode" or not re.search(ps.pattern, o):
                    viol(f, "pattern", o)
            if ps.node_kind is not None:
                allowed = {
                    "http://www.w3.org/ns/shacl#IRI": {"iri"},
                    "http://www.w3.org/ns/shacl#Literal": {"literal"},
                    "http://www.w3.org/ns/shacl#BlankNodeOrIRI":
                        {"bnode", "iri"},
                }[ps.node_kind]
                if k not in allowed:
                    viol(f, "nodeKind", o)
            if ps.datatype and (
                k != "literal" or effective_dt(k, d, l) != ps.datatype
            ):
                viol(f, "datatype", o)
            if ps.in_values is not None and o not in ps.in_values:
                viol(f, "in", o)
            if ps.class_ is not None:
                typed = {s for (s, p, c, *_r) in graph
                         if p == RDF_TYPE and c == ps.class_}
                if k == "literal" or o not in typed:
                    viol(f, "class", o)
            if ps.min_inclusive is not None:
                v = to_num(o)
                if v is None or v < ps.min_inclusive:
                    viol(f, "minInclusive", o)
            if ps.min_length is not None and (
                k == "bnode" or len(o) < ps.min_length
            ):
                viol(f, "minLength", o)
            if ps.max_length is not None and (
                k == "bnode" or len(o) > ps.max_length
            ):
                viol(f, "maxLength", o)
    return out


@pytest.mark.parametrize("seed", range(12))
def test_differential_shacl_paths(spark, seed):
    rng = random.Random(9100 + seed)
    graph = make_graph(rng)
    shape = make_path_shape(rng)
    df = spark.createDataFrame(
        graph,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )
    got = {
        (r["focus"], r["shape"], r["path"], r["constraint"], r["value"])
        for r in validate(df, [shape]).collect()
    }
    expected = naive_path_validate(graph, shape)
    assert got == expected, (
        f"seed={seed}\npath={shape.properties[0].path}\n"
        f"shape={shape}\n"
        f"only_spark={sorted(got - expected, key=str)}\n"
        f"only_naive={sorted(expected - got, key=str)}"
    )
