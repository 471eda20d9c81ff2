"""The recursive algebra compiler (queries/algebra.py): pinned nested
semantics + differential fuzz.

Pinned: hand-computed fixed points for each nested construct the flat
extractor refuses (OPTIONAL inside OPTIONAL, FILTER scoped inside
OPTIONAL, UNION branches with their own OPTIONAL, FILTER EXISTS in a
nested group, compatible-mapping UNION joins, MINUS over maybe-bound
vars, bare groups, sub-SELECT inside OPTIONAL).

Differential: a naive recursive evaluator (textbook §18.2.2.6
translation over Python lists — compatible-mapping join/leftjoin/
minus, group-scoped filters, OPTIONAL filter hoisting) is run against
:func:`algebra_select` on seeded random graphs × random nested
pattern trees, compared as multisets. The generator mirrors
test_sparql_differential.py's vocabulary (disjoint lexical spaces) and
keeps EXISTS bodies BGP+filter-only, where substitution semantics and
compatible-semi-join semantics provably coincide.
"""

import random

import pytest

from py_sema_spark.queries.algebra import algebra_select
from py_sema_spark.queries.bgp import bgp_select

SUBJECTS = [f"urn:s:{i}" for i in range(4)]
PREDS = [f"urn:p:{i}" for i in range(3)]
OBJ_LITS = [f"L{i}" for i in range(3)]
VARS = ["a", "b", "c"]


def rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def small(spark):
    data = [
        ("urn:a", "urn:p", "urn:b", "iri", None, None),
        ("urn:b", "urn:p", "urn:c", "iri", None, None),
        ("urn:a", "urn:name", "Alice", "literal", None, None),
        ("urn:b", "urn:name", "Bob", "literal", None, None),
        ("urn:c", "urn:age", "7", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("urn:a", "urn:knows", "urn:c", "iri", None, None),
    ]
    return spark.createDataFrame(
        data,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )


class TestPinnedNested:
    def test_nested_optional_bottom_up_scope(self, small):
        """Non-well-designed pattern: the inner OPTIONAL's ?x is local
        to its group (bottom-up evaluation), so the outer join on
        {s, x} rejects urn:a's extension — the textbook §18.5 result
        (rdflib agrees)."""
        out = bgp_select(
            small,
            """SELECT ?s ?n ?age WHERE {
              ?s <urn:p> ?x .
              OPTIONAL { ?s <urn:name> ?n
                OPTIONAL { ?x <urn:age> ?age } }
            } ORDER BY ?s""",
        )
        assert rows(out) == [
            ("urn:a", None, None),
            ("urn:b", "Bob", "7"),
        ]

    def test_filter_scoped_inside_optional(self, small):
        """FILTER belongs to the LeftJoin condition: urn:b keeps its
        row (unextended), it is not dropped."""
        out = bgp_select(
            small,
            """SELECT ?s ?n WHERE {
              ?s <urn:p> ?x .
              OPTIONAL { ?s <urn:name> ?n FILTER(?n != "Bob") }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", "Alice"), ("urn:b", None)]

    def test_union_branch_with_optional(self, small):
        out = bgp_select(
            small,
            """SELECT ?s ?v WHERE {
              { ?s <urn:name> ?v }
              UNION
              { ?s <urn:knows> ?k OPTIONAL { ?k <urn:age> ?v } }
            } ORDER BY ?s ?v""",
        )
        assert rows(out) == [
            ("urn:a", "7"),
            ("urn:a", "Alice"),
            ("urn:b", "Bob"),
        ]

    def test_exists_inside_nested_group(self, small):
        out = bgp_select(
            small,
            """SELECT ?s WHERE {
              ?s <urn:p> ?x .
              { ?s <urn:name> ?n FILTER EXISTS { ?s <urn:knows> ?c } }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a",)]

    def test_exists_inside_optional_fuses_into_leftjoin(self, small):
        """§18.2.2.6: the EXISTS is part of the LeftJoin condition —
        urn:b's name fails the gate, so urn:b survives unextended."""
        out = bgp_select(
            small,
            """SELECT ?s ?n WHERE {
              ?s <urn:p> ?x .
              OPTIONAL { ?s <urn:name> ?n
                         FILTER EXISTS { ?s <urn:knows> ?c } }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", "Alice"), ("urn:b", None)]

    def test_union_padded_var_compatible_join(self, small):
        """The case the flat path refused outright: a UNION whose
        branches each bind only part of {s, x, n}, joined against a
        base pattern binding ?s and ?n — compatible-mapping join, not
        an equi-join."""
        out = bgp_select(
            small,
            """SELECT ?s ?n WHERE {
              ?s <urn:name> ?n .
              { ?s <urn:p> ?x } UNION { ?x <urn:age> ?n }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", "Alice"), ("urn:b", "Bob")]

    def test_minus_on_maybe_bound_var(self, small):
        out = bgp_select(
            small,
            """SELECT ?s WHERE {
              ?s <urn:p> ?x .
              OPTIONAL { ?s <urn:name> ?n }
              MINUS { ?s <urn:name> ?n FILTER(?n = "Bob") }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a",)]

    def test_bare_group_joins(self, small):
        out = bgp_select(
            small,
            """SELECT ?s ?n WHERE {
              { ?s <urn:p> ?x } { ?s <urn:name> ?n }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", "Alice"), ("urn:b", "Bob")]

    def test_subselect_inside_optional_stays_scoped(self, small):
        """A sub-SELECT nested in OPTIONAL must not be hoisted to the
        top level: subjects without <urn:p> links still appear."""
        out = bgp_select(
            small,
            """SELECT ?s ?cnt WHERE {
              ?s <urn:name> ?nm .
              OPTIONAL {
                { SELECT ?s (COUNT(*) AS ?cnt)
                  WHERE { ?s <urn:p> ?x } GROUP BY ?s }
              }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", 1), ("urn:b", 1)]

    def test_nested_graph_blocks(self, spark):
        quads = spark.createDataFrame(
            [
                ("urn:a", "urn:p", "urn:b", "iri", None, None, "urn:g1"),
                ("urn:a", "urn:q", "X", "literal", None, None, "urn:g1"),
                ("urn:a", "urn:p", "urn:c", "iri", None, None, "urn:g2"),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string, g string",
        )
        out = bgp_select(
            quads,
            """SELECT ?g ?o WHERE {
              GRAPH ?g { ?a <urn:p> ?o OPTIONAL { ?a <urn:q> ?x } }
            } ORDER BY ?g""",
        )
        assert rows(out) == [("urn:g1", "urn:b"), ("urn:g2", "urn:c")]

    def test_exists_in_boolean_filter_disjunction(self, small):
        """EXISTS embedded in a boolean expression compiles via a
        semi/anti marker split — urn:a qualifies through EXISTS
        (knows urn:c), urn:b through the name disjunct."""
        out = bgp_select(
            small,
            """SELECT ?s WHERE { ?s <urn:name> ?n
                 FILTER(EXISTS { ?s <urn:knows> ?k } || ?n = "Bob")
               } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a",), ("urn:b",)]

    def test_not_exists_in_boolean_filter_conjunction(self, small):
        out = bgp_select(
            small,
            """SELECT ?s WHERE { ?s <urn:name> ?n
                 FILTER(NOT EXISTS { ?s <urn:knows> ?k } && ?n != "Zed")
               } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:b",)]

    def test_bind_inside_nested_group(self, small):
        out = bgp_select(
            small,
            """SELECT ?s ?tag WHERE {
              ?s <urn:name> ?n .
              { ?s <urn:p> ?x BIND(CONCAT(?n, "!") AS ?tag) }
            } ORDER BY ?s""",
        )
        # BIND is scoped to its group, where ?n is NOT in scope →
        # CONCAT over unbound is a type error → ?tag unbound
        assert rows(out) == [("urn:a", None), ("urn:b", None)]

    def test_construct_with_nested_group_keeps_metadata(self, small):
        """CONSTRUCT falls back through bgp_select: _extra_needs /
        _keep_meta must survive the algebra path so the template sees
        term metadata (the lang tag rides into the output graph)."""
        from py_sema_spark.queries.bgp import bgp_construct

        df = small.sparkSession.createDataFrame(
            [
                ("urn:a", "urn:name", "Alice", "literal", None, "en"),
                ("urn:b", "urn:name", "Bob", "literal", None, None),
                ("urn:a", "urn:knows", "urn:b", "iri", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_construct(
            df,
            """CONSTRUCT { ?s <urn:tag> ?n } WHERE {
                 ?s <urn:knows> ?k
                 { ?s <urn:name> ?n
                   FILTER(langMatches(lang(?n), "en")) } }""",
        )
        assert sorted(tuple(r) for r in out.collect()) == [
            ("urn:a", "urn:tag", "Alice", "literal", None, "en")
        ]

    def test_ask_with_nested_optional(self, small):
        from py_sema_spark.queries.bgp import bgp_ask

        out = bgp_ask(
            small,
            'ASK { ?s <urn:p> ?x OPTIONAL { ?x <urn:age> ?a '
            'FILTER(?a = "7") } }',
        )
        assert [tuple(r) for r in out.collect()] == [(True,)]

    def test_values_inside_nested_group(self, small):
        out = bgp_select(
            small,
            """SELECT ?s ?n WHERE {
              ?s <urn:name> ?n .
              { VALUES ?n { "Alice" "Zed" } }
            } ORDER BY ?s""",
        )
        assert rows(out) == [("urn:a", "Alice")]


class TestReviewRegressions:
    """Round-3 self-review findings (each reproduced, then fixed)."""

    @pytest.fixture(scope="class")
    def rdf(self, spark):
        return spark.createDataFrame(
            [
                ("urn:a", "u:p", "1", "literal", None, None),
                ("urn:a", "u:q", "r1", "literal", None, None),
                ("urn:b", "u:p", "2", "literal", None, None),
                ("urn:x", "u:v", "2.7", "literal", None, None),
                ("urn:y", "u:v", "3", "literal", None, None),
                ("urn:l", "u:l", "hello", "literal", None, "en"),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )

    def test_lt_comparison_does_not_hoist_nested_subselect(self, rdf):
        """'<' in a FILTER must not be read as an IRI opener — the
        scan previously jumped across the OPTIONAL boundary and
        hoisted its sub-SELECT to top level (silent wrong results:
        0 rows instead of 2)."""
        out = bgp_select(
            rdf,
            """SELECT ?s ?z WHERE { ?s <u:p> ?o . FILTER(?o < "9")
                 OPTIONAL { ?s <u:q> ?r .
                   { SELECT ?s ?z WHERE { ?s <u:nope> ?z } } } }""",
        )
        assert sorted(tuple(r) for r in out.collect()) == [
            ("urn:a", None),
            ("urn:b", None),
        ]

    def test_xsd_integer_rejects_decimal_lexical_form(self, rdf):
        """XPath casting: string "2.7" → xsd:integer is a type error
        (NULL), not a truncation to 2."""
        out = bgp_select(
            rdf,
            "SELECT ?s (xsd:integer(?v) AS ?i) WHERE { ?s <u:v> ?v } "
            "ORDER BY ?s",
            {"xsd": "http://www.w3.org/2001/XMLSchema#"},
        )
        assert [tuple(r) for r in out.collect()] == [
            ("urn:x", None),
            ("urn:y", 3),
        ]

    def test_group_by_lang_materializes_companions(self, rdf):
        out = bgp_select(
            rdf,
            "SELECT ?l (COUNT(*) AS ?c) WHERE { ?s <u:l> ?v } "
            "GROUP BY (LANG(?v) AS ?l)",
        )
        assert [tuple(r) for r in out.collect()] == [("en", 1)]

    def test_whole_statement_bnode_list(self, rdf):
        from py_sema_spark.queries.bgp import _parse_patterns

        pats = _parse_patterns('[ <http://p> "n" ] . ?s <http://q> ?o', {})
        assert len(pats) == 2

    def test_where_keyword_optional(self, rdf):
        out = bgp_select(rdf, "SELECT ?s { ?s <u:p> ?o }")
        assert sorted(r[0] for r in out.collect()) == ["urn:a", "urn:b"]

    def test_brace_inside_quoted_literal_routes_to_algebra(self, rdf):
        out = bgp_select(
            rdf,
            'SELECT ?s WHERE { ?s <u:p> ?o '
            'OPTIONAL { ?s <u:q> "x}y" FILTER(?s = "a") } }',
        )
        assert sorted(r[0] for r in out.collect()) == ["urn:a", "urn:b"]


# ---------------------------------------------------------------------
# differential fuzz: naive recursive evaluator vs algebra_select
# ---------------------------------------------------------------------


def make_graph(rng):
    n = rng.randrange(8, 22)
    rows_ = set()
    for _ in range(n):
        s = rng.choice(SUBJECTS)
        p = rng.choice(PREDS)
        r = rng.random()
        if r < 0.5:
            o, kind = rng.choice(OBJ_LITS), "literal"
        else:
            o, kind = rng.choice(SUBJECTS), "iri"
        rows_.add((s, p, o, kind))
    return sorted(rows_)


def make_patterns(rng, n_pat):
    pats = []
    for i in range(n_pat):
        s = (
            ("var", rng.choice(VARS))
            if rng.random() < 0.6
            else ("const", rng.choice(SUBJECTS), "iri")
        )
        p = ("const", rng.choice(PREDS), "iri")
        r = rng.random()
        if r < 0.55:
            o = ("var", rng.choice(VARS))
        elif r < 0.8:
            o = ("const", rng.choice(OBJ_LITS), "literal")
        else:
            o = ("const", rng.choice(SUBJECTS), "iri")
        pats.append((s, p, o))
    return pats


def gen_group(rng, depth):
    elems = [("triples", make_patterns(rng, rng.randrange(1, 3)))]
    for _ in range(rng.randrange(0, 3)):
        r = rng.random()
        if depth < 2 and r < 0.28:
            elems.append(("optional", gen_group(rng, depth + 1)))
        elif depth < 2 and r < 0.42:
            elems.append(
                ("union", [gen_group(rng, depth + 1),
                           gen_group(rng, depth + 1)])
            )
        elif depth < 2 and r < 0.52:
            elems.append(("minus", gen_group(rng, depth + 1)))
        elif depth < 2 and r < 0.60:
            elems.append(("group", gen_group(rng, depth + 1)))
        elif depth < 2 and r < 0.70:
            elems.append(
                ("exists", rng.random() < 0.5,
                 [("triples", make_patterns(rng, 1))])
            )
        elif depth < 2 and r < 0.78:
            # boolean-embedded EXISTS: FILTER(cond op [NOT]EXISTS{})
            elems.append(
                ("bexists",
                 rng.choice(VARS), rng.choice(["=", "!="]),
                 rng.choice(OBJ_LITS),
                 rng.choice(["&&", "||"]),
                 rng.random() < 0.5,
                 [("triples", make_patterns(rng, 1))])
            )
        elif r < 0.88:
            elems.append(
                ("filter", rng.choice(VARS),
                 rng.choice(["=", "!="]), rng.choice(OBJ_LITS))
            )
        else:
            # VALUES with possible UNDEF cells
            var = rng.choice(VARS)
            vals = [
                (None if rng.random() < 0.3 else rng.choice(OBJ_LITS))
                for _ in range(rng.randrange(1, 3))
            ]
            elems.append(("values1", var, vals))
    return elems


def term_sparql(t):
    if t[0] == "var":
        return "?" + t[1]
    if t[2] == "literal":
        return '"%s"' % t[1]
    return "<%s>" % t[1]


def render(elems):
    out = []
    for el in elems:
        k = el[0]
        if k == "triples":
            out.extend(
                " ".join(term_sparql(t) for t in pat) + " ." for pat in el[1]
            )
        elif k == "optional":
            out.append("OPTIONAL { %s }" % render(el[1]))
        elif k == "minus":
            out.append("MINUS { %s }" % render(el[1]))
        elif k == "group":
            out.append("{ %s }" % render(el[1]))
        elif k == "union":
            out.append(
                " UNION ".join("{ %s }" % render(b) for b in el[1])
            )
        elif k == "exists":
            out.append(
                "FILTER %sEXISTS { %s }"
                % ("NOT " if el[1] else "", render(el[2]))
            )
        elif k == "bexists":
            _, var, op, lit, bop, neg, sub = el
            out.append(
                'FILTER(?%s %s "%s" %s %sEXISTS { %s })'
                % (var, op, lit, bop, "NOT " if neg else "", render(sub))
            )
        elif k == "values1":
            _, var, vals = el
            cells = " ".join(
                "UNDEF" if v is None else '"%s"' % v for v in vals
            )
            out.append("VALUES ?%s { %s }" % (var, cells))
        else:
            out.append('FILTER(?%s %s "%s")' % (el[1], el[2], el[3]))
    return " ".join(out)


# ---- naive evaluator: §18.2.2.6 over lists of {var: (value, kind)} --


def match_pattern(graph, pat, mu0):
    out = []
    for (s, p, o, kind) in graph:
        row = {"s": (s, "iri"), "p": (p, "iri"), "o": (o, kind)}
        mu = dict(mu0)
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


def compatible(m1, m2):
    return all(m1[k] == m2[k] for k in m1.keys() & m2.keys())


def fval(mu, cond):
    _, var, op, lit = cond
    v = mu.get(var)
    if v is None:
        return False  # type error → false
    eq = v == (lit, "literal")
    return eq if op == "=" else not eq


def exists_holds(mu, sols):
    return any(compatible(mu, m2) for m2 in sols)


def naive_group(graph, elems):
    sols, filters, exists = naive_elements(graph, elems)
    return naive_apply_filters(graph, sols, filters, exists)


def cond_holds(graph, mu, cond):
    """One FILTER condition (plain or boolean-embedded EXISTS)."""
    if cond[0] == "filter":
        return fval(mu, cond)
    # ("bexists", var, op, lit, bop, neg, sub)
    _, var, op, lit, bop, neg, sub_elems = cond
    left = fval(mu, ("filter", var, op, lit))
    sub = naive_group(graph, sub_elems)
    right = exists_holds(mu, sub) != neg
    return (left and right) if bop == "&&" else (left or right)


def naive_apply_filters(graph, sols, filters, exists):
    for cond in filters:
        sols = [mu for mu in sols if cond_holds(graph, mu, cond)]
    for (_k, neg, sub_elems) in exists:
        sub = naive_group(graph, sub_elems)
        sols = [
            mu for mu in sols if exists_holds(mu, sub) != neg
        ]
    return sols


def naive_elements(graph, elems):
    G = [{}]
    filters = []
    exists = []
    for el in elems:
        k = el[0]
        if k == "triples":
            part = [{}]
            for pat in el[1]:
                part = [m for b in part for m in match_pattern(graph, pat, b)]
            G = [
                {**m1, **m2}
                for m1 in G
                for m2 in part
                if compatible(m1, m2)
            ]
        elif k == "optional":
            sub, sfilters, sexists = naive_elements(graph, el[1])

            def cond_ok(merged, _sf=sfilters, _se=sexists):
                for c in _sf:
                    if not cond_holds(graph, merged, c):
                        return False
                for (_k2, neg, sub_elems) in _se:
                    se = naive_group(graph, sub_elems)
                    if exists_holds(merged, se) == neg:
                        return False
                return True

            out = []
            for m1 in G:
                exts = [
                    {**m1, **m2}
                    for m2 in sub
                    if compatible(m1, m2) and cond_ok({**m1, **m2})
                ]
                out.extend(exts if exts else [m1])
            G = out
        elif k == "minus":
            sub = naive_group(graph, el[1])
            G = [
                m1
                for m1 in G
                if not any(
                    compatible(m1, m2) and (m1.keys() & m2.keys())
                    for m2 in sub
                )
            ]
        elif k == "group":
            sub = naive_group(graph, el[1])
            G = [
                {**m1, **m2}
                for m1 in G
                for m2 in sub
                if compatible(m1, m2)
            ]
        elif k == "union":
            ub = []
            for b in el[1]:
                ub.extend(naive_group(graph, b))
            G = [
                {**m1, **m2}
                for m1 in G
                for m2 in ub
                if compatible(m1, m2)
            ]
        elif k == "exists":
            exists.append(el)
        elif k == "bexists":
            filters.append(el)
        elif k == "values1":
            var, vals = el[1], el[2]
            part = [
                ({} if v is None else {var: (v, "literal")}) for v in vals
            ]
            G = [
                {**m1, **m2}
                for m1 in G
                for m2 in part
                if compatible(m1, m2)
            ]
        else:
            filters.append(el)
    return G, filters, exists


def canon(rows_):
    return sorted(
        [tuple(r) for r in rows_],
        key=lambda r: tuple((x is None, x or "") for x in r),
    )


def _run_differential(spark, seed, runner):
    rng = random.Random(7100 + seed)
    graph = make_graph(rng)
    df = spark.createDataFrame(
        [(s, p, o, kind, None, None) for (s, p, o, kind) in graph],
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )
    elems = gen_group(rng, 0)
    body = render(elems)
    proj = sorted(VARS)
    sparql = "SELECT %s WHERE { %s }" % (
        " ".join("?" + v for v in proj), body,
    )

    expected = [
        tuple(mu.get(v, (None,))[0] for v in proj)
        for mu in naive_group(graph, elems)
    ]
    got = [tuple(r) for r in runner(df, sparql).collect()]
    assert canon(got) == canon(expected), sparql


@pytest.mark.parametrize("seed", range(30))
def test_differential_nested_algebra(spark, seed):
    _run_differential(spark, seed, algebra_select)


@pytest.mark.parametrize("seed", range(30, 45))
def test_differential_routed_bgp_select(spark, seed):
    """Same generator through the public entry point: flat-compatible
    trees compile on the flat path, nested ones must be REFUSED there
    and fall back — if the flat extractor ever wrongly accepts a
    nested query (scope-hoist bug), the naive-evaluator comparison
    catches the wrong results here."""
    _run_differential(spark, seed, bgp_select)
