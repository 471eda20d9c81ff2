"""SPARQL subset v2: property paths, predicate-object lists,
expression FILTER/BIND, VALUES, EXISTS, GROUP BY/aggregates/HAVING,
ORDER/OFFSET — the widened compiler surface (reference runs full
SPARQL through rdflib: /root/reference/sema/query/__init__.py; this
suite pins our DataFrame compilation to the same answers)."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.queries.bgp import bgp_select, parse_select
from py_sema_spark.queries.sparql_expr import parse_expr

SKOS = "http://www.w3.org/2004/02/skos/core#"
RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
DC = "http://purl.org/dc/terms/"
PFX = {"skos": SKOS, "dc": DC}


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("urn:c:1", RDFT, SKOS + "Concept", "iri", None, None),
        ("urn:c:1", SKOS + "prefLabel", "Alpha", "literal", None, "en"),
        ("urn:c:1", SKOS + "altLabel", "A", "literal", None, None),
        ("urn:c:1", SKOS + "broader", "urn:c:2", "iri", None, None),
        ("urn:c:2", RDFT, SKOS + "Concept", "iri", None, None),
        ("urn:c:2", SKOS + "prefLabel", "Beta", "literal", None, "en"),
        ("urn:c:2", SKOS + "broader", "urn:c:3", "iri", None, None),
        ("urn:c:3", SKOS + "prefLabel", "Gamma", "literal", None, "fr"),
        ("urn:c:3", DC + "identifier", "G3", "literal", None, None),
        ("urn:col:1", SKOS + "member", "urn:c:1", "iri", None, None),
        ("urn:col:1", SKOS + "member", "urn:c:2", "iri", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "s string, p string, o string, o_kind string, "
        "o_datatype string, o_lang string",
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestPropertyPaths:
    def test_plus_transitive(self, triples):
        r = rows(bgp_select(triples, "SELECT ?c ?a WHERE { ?c skos:broader+ ?a . }", PFX))
        assert r == [
            ("urn:c:1", "urn:c:2"),
            ("urn:c:1", "urn:c:3"),
            ("urn:c:2", "urn:c:3"),
        ]

    def test_sequence(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?c ?l WHERE { ?c skos:broader/skos:prefLabel ?l . }",
                PFX,
            )
        )
        assert r == [("urn:c:1", "Beta"), ("urn:c:2", "Gamma")]

    def test_inverse(self, triples):
        r = rows(bgp_select(triples, "SELECT ?n ?c WHERE { ?n ^skos:member ?c . }", PFX))
        assert r == [("urn:c:1", "urn:col:1"), ("urn:c:2", "urn:col:1")]

    def test_alternation(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?o WHERE { <urn:c:1> skos:prefLabel|skos:altLabel ?o . }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["A", "Alpha"]

    def test_star_includes_zero_length(self, triples):
        r = rows(bgp_select(triples, "SELECT ?a WHERE { <urn:c:1> skos:broader* ?a . }", PFX))
        assert [x[0] for x in r] == ["urn:c:1", "urn:c:2", "urn:c:3"]

    def test_zero_or_one(self, triples):
        r = rows(bgp_select(triples, "SELECT ?a WHERE { <urn:c:1> skos:broader? ?a . }", PFX))
        assert [x[0] for x in r] == ["urn:c:1", "urn:c:2"]

    def test_negated_property_set(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?o WHERE { <urn:c:1> !(skos:broader|skos:prefLabel|skos:altLabel) ?o . }",
                PFX,
            )
        )
        assert [x[0] for x in r] == [SKOS + "Concept"]

    def test_inverse_of_sequence_parenthesized(self, triples):
        # ^(member) / prefLabel: collection ← concept → its label
        r = rows(
            bgp_select(
                triples,
                "SELECT ?n ?l WHERE { ?n (^skos:member)/skos:prefLabel ?l . }",
                PFX,
            )
        )
        # ^member maps concept→collection; collection has no prefLabel
        assert r == []

    def test_seq_then_plus(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?m ?a WHERE { ?c skos:member ?m . ?m skos:broader+ ?a . }",
                PFX,
            )
        )
        assert ("urn:c:1", "urn:c:3") in r and ("urn:c:2", "urn:c:3") in r


class TestListsAndSugar:
    def test_bnode_property_list_object_position(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:p", "_:b1", "bnode", None, None),
                ("_:b1", "urn:q", "x", "literal", None, None),
                ("urn:d", "urn:p", "urn:e", "iri", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        r = rows(
            bgp_select(
                df, 'SELECT ?s WHERE { ?s <urn:p> [ <urn:q> "x" ] . }'
            )
        )
        assert r == [("urn:a",)]
        # anonymous [] matches any object; SELECT * hides the
        # synthetic variable (rdflib parity: bnode bindings are not
        # projected by *)
        star = bgp_select(df, "SELECT * WHERE { ?s <urn:p> [] . }")
        assert star.columns == ["s"]
        assert sorted(x[0] for x in rows(star)) == ["urn:a", "urn:d"]

    def test_bnode_property_list_subject_position(self, spark):
        df = spark.createDataFrame(
            [
                ("_:b1", "urn:q", "x", "literal", None, None),
                ("_:b1", "urn:r", "y", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        r = rows(
            bgp_select(
                df,
                'SELECT ?v WHERE { [ <urn:q> "x" ] <urn:r> ?v . }',
            )
        )
        assert r == [("y",)]

    def test_predicate_object_list(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s a skos:Concept ; skos:prefLabel ?l . FILTER(STRLEN(?l) >= 5) }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:c:1"]

    def test_object_list(self, triples):
        # ?o1, ?o2 both range over the subject's prefLabels; the
        # stored literal is "Alpha"@en, so the pattern literal must
        # carry the tag (RDF-term equality)
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s WHERE { ?s skos:prefLabel "Alpha"@en , ?any . }',
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:c:1"]

    def test_plain_literal_does_not_match_tagged(self, triples):
        """BGP matching is RDF-term equality: plain "Alpha" must NOT
        match "Alpha"@en just because the lexical forms coincide."""
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s WHERE { ?s skos:prefLabel "Alpha" . }',
                PFX,
            )
        )
        assert r == []
        # the untagged dc:identifier literal still matches plainly
        r2 = rows(
            bgp_select(
                triples,
                'SELECT ?s WHERE { ?s dc:identifier "G3" . }',
                PFX,
            )
        )
        assert [x[0] for x in r2] == ["urn:c:3"]


class TestExpressions:
    def test_numeric_and_bool_combinators(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT ?l WHERE { ?s skos:prefLabel ?l . '
                'FILTER(STRLEN(?l) > 4 && (STRSTARTS(?l, "Al") || STRENDS(?l, "mma"))) }',
                PFX,
            )
        )
        assert [x[0] for x in r] == ["Alpha", "Gamma"]

    def test_in_not_in(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?l WHERE { ?s skos:prefLabel ?l . FILTER(?s NOT IN (<urn:c:1>, <urn:c:3>)) }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["Beta"]

    def test_lang_and_datatype(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT ?l WHERE { ?s skos:prefLabel ?l . FILTER(lang(?l) = "fr") }',
                PFX,
            )
        )
        assert [x[0] for x in r] == ["Gamma"]
        r = rows(
            bgp_select(
                triples,
                "SELECT ?i WHERE { ?s dc:identifier ?i . "
                "FILTER(DATATYPE(?i) = <http://www.w3.org/2001/XMLSchema#string>) }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["G3"]

    def test_iskind_family(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?o WHERE { <urn:c:1> ?p ?o . FILTER(isLiteral(?o)) }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["A", "Alpha"]

    def test_bind_and_select_expr(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s ?u WHERE { ?s dc:identifier ?i . '
                'BIND(CONCAT("urn:id:", LCASE(?i)) AS ?u) }',
                PFX,
            )
        )
        assert r == [("urn:c:3", "urn:id:g3")]
        r = rows(
            bgp_select(
                triples,
                'SELECT (REPLACE(UCASE(?l), "A", "_") AS ?x) WHERE '
                '{ <urn:c:1> skos:prefLabel ?l . }',
                PFX,
            )
        )
        assert r == [("_LPH_",)]

    def test_str_before_after_substr(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT (STRAFTER(?s, "c:") AS ?n) WHERE { ?s skos:broader ?o . } ORDER BY ?n',
                PFX,
            )
        )
        assert [x[0] for x in r] == ["1", "2"]

    def test_if_coalesce_bound(self, triples):
        q = (
            "SELECT ?s (IF(BOUND(?alt), ?alt, \"none\") AS ?a) WHERE "
            "{ ?s skos:prefLabel ?l . OPTIONAL { ?s skos:altLabel ?alt . } }"
        )
        r = rows(bgp_select(triples, q, PFX))
        assert ("urn:c:1", "A") in r and ("urn:c:2", "none") in r

    def test_parse_expr_errors(self):
        with pytest.raises(ValueError):
            parse_expr("NOSUCHFN(?x)")
        with pytest.raises(ValueError):
            parse_expr("?x >")
        with pytest.raises(ValueError):
            parse_expr("LANG(CONCAT(?x))")


class TestValuesExistsAggregates:
    def test_values_single(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s ?v WHERE { VALUES ?v { "Alpha" "Gamma" } ?s skos:prefLabel ?v . }',
                PFX,
            )
        )
        assert r == [("urn:c:1", "Alpha"), ("urn:c:3", "Gamma")]

    def test_values_multi(self, triples):
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s ?v ?k WHERE { VALUES (?v ?k) { ("Alpha" "x") ("Gamma" "y") } '
                "?s skos:prefLabel ?v . }",
                PFX,
            )
        )
        assert r == [("urn:c:1", "Alpha", "x"), ("urn:c:3", "Gamma", "y")]

    def test_minus(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s skos:prefLabel ?l . "
                "MINUS { ?s skos:altLabel ?al . } }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:c:2", "urn:c:3"]

    def test_minus_disjoint_removes_nothing(self, triples):
        # SPARQL §8.3: MINUS group sharing no variable is a no-op
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s skos:prefLabel ?l . "
                "MINUS { ?x skos:altLabel ?al . } }",
                PFX,
            )
        )
        assert len(r) == 3

    def test_not_exists(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s skos:prefLabel ?l . "
                "FILTER NOT EXISTS { ?s skos:altLabel ?al . } }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:c:2", "urn:c:3"]

    def test_exists(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s skos:prefLabel ?l . "
                "FILTER EXISTS { ?s skos:altLabel ?al . } }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:c:1"]

    def test_group_by_having_order(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
                "HAVING(COUNT(*) >= 2) ORDER BY DESC(?n) ?p",
                PFX,
            )
        )
        d = dict(r)
        assert d[SKOS + "prefLabel"] == 3 and d[SKOS + "member"] == 2
        assert len(r) == 4

    def test_count_distinct_and_group_concat(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT (COUNT(DISTINCT ?s) AS ?ns) "
                '(GROUP_CONCAT(?l; SEPARATOR="|") AS ?labels) '
                "WHERE { ?s skos:prefLabel ?l . }",
                PFX,
            )
        )
        assert r == [(3, "Alpha|Beta|Gamma")]

    def test_min_max_sum_avg(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT (MIN(?l) AS ?lo) (MAX(?l) AS ?hi) "
                "(SUM(?n) AS ?tot) (AVG(?n) AS ?mean) WHERE { "
                "?s skos:prefLabel ?l . BIND(STRLEN(?l) AS ?n) }",
                PFX,
            )
        )
        assert r == [("Alpha", "Gamma", 14.0, 14.0 / 3)]

    def test_sample_deterministic(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT (SAMPLE(?l) AS ?one) WHERE { ?s skos:prefLabel ?l . }",
                PFX,
            )
        )
        assert r == [("Alpha",)]

    def test_subselect(self, triples):
        # label count per subject via sub-query, joined to type pattern
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s ?n WHERE { ?s a skos:Concept . "
                "{ SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s } }",
                PFX,
            )
        )
        assert r == [("urn:c:1", 4), ("urn:c:2", 3)]

    def test_offset(self, triples):
        r = rows(
            bgp_select(
                triples,
                "SELECT ?l WHERE { ?s skos:prefLabel ?l . } ORDER BY ?l LIMIT 1 OFFSET 1",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["Beta"]


class TestGraphBlocks:
    @pytest.fixture(scope="class")
    def quads(self, spark, triples):
        return triples.withColumn(
            "g",
            F.when(
                F.col("s").startswith("urn:col:"), "urn:graph:collections"
            ).otherwise("urn:graph:concepts"),
        )

    def test_graph_iri(self, quads):
        r = rows(
            bgp_select(
                quads,
                "SELECT ?s ?o WHERE { GRAPH <urn:graph:collections> { ?s skos:member ?o . } }",
                PFX,
            )
        )
        assert r == [("urn:col:1", "urn:c:1"), ("urn:col:1", "urn:c:2")]

    def test_graph_var_binds_and_joins(self, quads):
        r = rows(
            bgp_select(
                quads,
                "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s skos:prefLabel ?l . } }",
                PFX,
            )
        )
        assert [x[0] for x in r] == ["urn:graph:concepts"]
        # same-graph join inside the block
        r = rows(
            bgp_select(
                quads,
                "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o . } } "
                "GROUP BY ?g ORDER BY ?g",
                PFX,
            )
        )
        assert r == [("urn:graph:collections", 2), ("urn:graph:concepts", 9)]

    def test_graph_joined_with_default(self, quads):
        # default-graph pattern restricts the subject; graph var binds
        r = rows(
            bgp_select(
                quads,
                "SELECT ?s ?g WHERE { ?s skos:altLabel ?al . "
                "GRAPH ?g { ?s skos:prefLabel ?l . } }",
                PFX,
            )
        )
        assert r == [("urn:c:1", "urn:graph:concepts")]

    def test_graph_requires_g_column(self, triples):
        with pytest.raises(ValueError):
            bgp_select(
                triples,
                "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o . } }",
                PFX,
            ).collect()


class TestParseErrors:
    def test_group_by_without_aggregate(self, triples):
        with pytest.raises(ValueError):
            bgp_select(
                triples, "SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p", PFX
            )

    def test_unbound_projection_pads_null(self, triples):
        """A projected variable bound nowhere in the pattern is
        unbound in every solution (rdflib parity) — a NULL column,
        not a query error."""
        out = bgp_select(triples, "SELECT ?zzz WHERE { ?s ?p ?o }", PFX)
        rows_ = out.collect()
        assert len(rows_) > 0
        assert all(r[0] is None for r in rows_)

    def test_aggregate_expression_arguments(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:v", "1", "literal", None, None),
                ("urn:a", "urn:v", "2", "literal", None, None),
                ("urn:b", "urn:v", "5", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        xsd = {"xsd": "http://www.w3.org/2001/XMLSchema#"}
        # compound aggregate arithmetic → synthetic aggregates feed a
        # projection expression over the grouped frame
        out = bgp_select(
            df,
            "SELECT ?s (SUM(?v) + COUNT(*) AS ?y) WHERE "
            "{ ?s <urn:v> ?v } GROUP BY ?s ORDER BY ?s",
        )
        assert [tuple(r) for r in out.collect()] == [
            ("urn:a", 5.0),
            ("urn:b", 6.0),
        ]
        # expression argument (XSD constructor cast)
        out2 = bgp_select(
            df,
            "SELECT ?s (SUM(xsd:integer(?v)) AS ?y) WHERE "
            "{ ?s <urn:v> ?v } GROUP BY ?s ORDER BY ?s",
            xsd,
        )
        assert [tuple(r) for r in out2.collect()] == [
            ("urn:a", 3.0),
            ("urn:b", 5.0),
        ]
        # DISTINCT over an expression; HAVING over an expression arg
        out3 = bgp_select(
            df,
            "SELECT (COUNT(DISTINCT STR(?v)) AS ?n) WHERE "
            "{ ?s <urn:v> ?v }",
        )
        assert [tuple(r) for r in out3.collect()] == [(3,)]
        out4 = bgp_select(
            df,
            "SELECT ?s WHERE { ?s <urn:v> ?v } GROUP BY ?s "
            "HAVING(SUM(xsd:integer(?v)) > 4) ORDER BY ?s",
            xsd,
        )
        assert [tuple(r) for r in out4.collect()] == [("urn:b",)]

    def test_xsd_constructor_casts_in_filter(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:v", "1", "literal", None, None),
                ("urn:b", "urn:v", "x", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        xsd = {"xsd": "http://www.w3.org/2001/XMLSchema#"}
        # the non-numeric literal is a cast error → type error → row
        # dropped, not a job failure
        out = bgp_select(
            df,
            "SELECT ?s WHERE { ?s <urn:v> ?v "
            "FILTER(xsd:integer(?v) >= 1) }",
            xsd,
        )
        assert rows(out) == [("urn:a",)]

    def test_group_by_expression(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:name", "Al", "literal", None, None),
                ("urn:b", "urn:name", "Bo", "literal", None, None),
                ("urn:c", "urn:name", "Celeste", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df,
            "SELECT ?len (COUNT(*) AS ?n) WHERE { ?s <urn:name> ?nm } "
            "GROUP BY (STRLEN(?nm) AS ?len) ORDER BY ?len",
        )
        assert [tuple(r) for r in out.collect()] == [(2, 2), (7, 1)]
        # bare expression: internal grouping column, not projectable
        out2 = bgp_select(
            df,
            "SELECT (COUNT(*) AS ?n) WHERE { ?s <urn:name> ?nm } "
            "GROUP BY STRLEN(?nm) ORDER BY DESC(?n)",
        )
        assert [r[0] for r in out2.collect()] == [2, 1]

    def test_order_by_expression(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:name", "Al", "literal", None, None),
                ("urn:b", "urn:name", "Celeste", "literal", None, None),
                ("urn:c", "urn:name", "Bobby", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df,
            "SELECT ?n WHERE { ?s <urn:name> ?n } ORDER BY STRLEN(?n)",
        )
        assert [r[0] for r in out.collect()] == ["Al", "Bobby", "Celeste"]
        out2 = bgp_select(
            df,
            "SELECT ?n WHERE { ?s <urn:name> ?n } "
            "ORDER BY DESC(STRLEN(?n)) ?n",
        )
        assert [r[0] for r in out2.collect()] == ["Celeste", "Bobby", "Al"]

    def test_values_undef_partial_bindings(self, spark):
        """§10.2: UNDEF joins with anything and leaves the var as the
        solution's own binding — needs the compatible-mapping join, so
        the flat path refuses and the algebra path computes it."""
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:name", "Alice", "literal", None, None),
                ("urn:b", "urn:name", "Bob", "literal", None, None),
                ("urn:a", "urn:age", "30", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df,
            """SELECT ?s ?n ?a WHERE {
                 ?s <urn:name> ?n .
                 OPTIONAL { ?s <urn:age> ?a }
                 VALUES (?n ?a) { ("Alice" UNDEF) (UNDEF "99") }
               } ORDER BY ?s""",
        )
        assert rows(out) == [
            ("urn:a", "Alice", "30"),
            ("urn:b", "Bob", "99"),
        ]

    def test_select_reduced_is_bag_noop(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:name", "X", "literal", None, None),
                ("urn:b", "urn:name", "X", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df, "SELECT REDUCED ?n WHERE { ?s <urn:name> ?n }"
        )
        # keeping the bag unchanged is conformant (§9.3 permits, does
        # not require, duplicate elimination)
        assert sorted(rows(out)) == [("X",), ("X",)]

    def test_values_arity_mismatch(self):
        with pytest.raises(ValueError):
            parse_select(
                'SELECT ?a WHERE { VALUES (?a ?b) { ("x") } ?s ?p ?a }', PFX
            )

    def test_dotted_iri_still_parses(self):
        q = parse_select(
            "SELECT ?x WHERE { <http://vocab.example.org/v1.0/x> a ?x . }", PFX
        )
        assert len(q["patterns"]) == 1


class TestAsk:
    """ASK form (reference probes stores with `ask where {?s ?p [].}`,
    query.py:363-366; routed through the same select entry point)."""

    def _ask(self, triples, q, pfx=None):
        from py_sema_spark.queries.bgp import sparql_query

        df = sparql_query(triples, q, pfx)
        assert df.columns == ["ask"]
        out = df.collect()
        assert len(out) == 1
        return out[0]["ask"]

    def test_ask_anonymous_bnode_true(self, triples):
        assert self._ask(triples, "ask where {?s ?p [].}") is True

    def test_ask_false(self, triples):
        assert (
            self._ask(
                triples,
                "ASK { ?s <urn:no-such-predicate> ?o . }",
            )
            is False
        )

    def test_ask_with_prefixes_and_filter(self, triples):
        q = (
            f"PREFIX skos: <{SKOS}> "
            'ASK WHERE { ?c skos:prefLabel ?l . FILTER(lang(?l) = "fr") }'
        )
        assert self._ask(triples, q) is True

    def test_ask_dispatch_select_unaffected(self, triples):
        from py_sema_spark.queries.bgp import sparql_query

        df = sparql_query(
            triples, "SELECT ?s WHERE { ?s ?p ?o . }", None
        )
        assert df.columns == ["s"]

    def test_store_select_accepts_ask(self, spark, tmp_path):
        from py_sema_spark.model import GraphNameMapper
        from py_sema_spark.store import ParquetTripleStore

        store = ParquetTripleStore(
            spark, str(tmp_path / "store"), mapper=GraphNameMapper("urn:g:")
        )
        triples = spark.createDataFrame(
            [("urn:s", "urn:p", "urn:o", "iri", None, None)],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        store.insert_for_key(triples, "k1")
        res = store.select("ask where {?s ?p [].}")
        assert res.to_list() == [{"ask": True}]


class TestConstructDescribe:
    """CONSTRUCT / DESCRIBE (the reference gets both from rdflib's
    full SPARQL; here each template triple is one columnar projection
    of the solution plan, unioned + set-deduplicated)."""

    def test_construct_carries_term_metadata(self, triples):
        from py_sema_spark.queries.bgp import bgp_construct

        out = bgp_construct(
            triples,
            "CONSTRUCT { ?c <urn:label> ?l . ?c a <urn:Thing> } "
            "WHERE { ?c skos:prefLabel ?l . }",
            PFX,
        )
        assert out.columns == [
            "s", "p", "o", "o_kind", "o_datatype", "o_lang",
        ]
        got = rows(out)
        assert ("urn:c:1", "urn:label", "Alpha", "literal", None, "en") in got
        assert (
            "urn:c:1",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "urn:Thing", "iri", None, None,
        ) in got
        assert len(got) == 6  # 3 labels + 3 typed subjects

    def test_construct_iri_object_kind(self, triples):
        from py_sema_spark.queries.bgp import bgp_construct

        out = bgp_construct(
            triples,
            "CONSTRUCT { ?a <urn:narrower> ?c } "
            "WHERE { ?c skos:broader ?a . }",
            PFX,
        )
        for r in out.collect():
            assert r["o_kind"] == "iri"

    def test_construct_template_bnode_skolem(self, triples):
        from py_sema_spark.queries.bgp import bgp_construct

        out = bgp_construct(
            triples,
            "CONSTRUCT { ?c <urn:hasLabel> _:b . _:b <urn:value> ?l } "
            'WHERE { ?c skos:prefLabel ?l . FILTER(lang(?l) = "en") }',
            PFX,
        ).collect()
        # per solution, the SAME fresh bnode links the two template
        # triples; across solutions the bnodes differ (deterministic
        # xxhash64 skolemization over the solution bindings)
        by_subj = {
            r["o"]: r["s"] for r in out if r["p"] == "urn:hasLabel"
        }
        values = {r["s"]: r["o"] for r in out if r["p"] == "urn:value"}
        assert len(by_subj) == 2 and len(values) == 2
        for bnode, subj in by_subj.items():
            assert bnode.startswith("_:c")
            assert values[bnode] in ("Alpha", "Beta")

    def test_construct_shorthand_and_dedup(self, triples):
        from py_sema_spark.queries.bgp import bgp_construct

        out = bgp_construct(
            triples,
            "CONSTRUCT WHERE { ?s skos:prefLabel ?l . }",
            PFX,
        )
        assert out.count() == 3

    def test_construct_unbound_optional_dropped(self, triples):
        from py_sema_spark.queries.bgp import bgp_construct

        out = bgp_construct(
            triples,
            "CONSTRUCT { ?c <urn:alt> ?a } "
            "WHERE { ?c skos:prefLabel ?l . "
            "OPTIONAL { ?c skos:altLabel ?a } }",
            PFX,
        )
        # only urn:c:1 has an altLabel; unbound ?a instantiations drop
        assert rows(out) == [
            ("urn:c:1", "urn:alt", "A", "literal", None, None)
        ]

    def test_describe_iri(self, triples):
        from py_sema_spark.queries.bgp import bgp_describe

        out = bgp_describe(triples, "DESCRIBE <urn:c:1>")
        assert out.count() == 4
        assert {r["s"] for r in out.collect()} == {"urn:c:1"}

    def test_describe_var_where(self, triples):
        from py_sema_spark.queries.bgp import bgp_describe

        out = bgp_describe(
            triples,
            "DESCRIBE ?c WHERE { ?c skos:broader <urn:c:3> . }",
            PFX,
        )
        assert {r["s"] for r in out.collect()} == {"urn:c:2"}

    def test_dispatch_construct_describe(self, triples):
        from py_sema_spark.queries.bgp import sparql_query

        out = sparql_query(
            triples,
            f"PREFIX skos: <{SKOS}> "
            "CONSTRUCT { ?s <urn:p> ?l } WHERE { ?s skos:prefLabel ?l }",
        )
        assert out.columns[:3] == ["s", "p", "o"]
        out = sparql_query(triples, "DESCRIBE <urn:c:2>")
        assert out.count() == 3


class TestExprBuiltinsV3:
    """SPARQL 1.1 §17.4.4-17.4.6: hash functions, ISNUMERIC, date
    accessors — added after the v2 compiler round."""

    def test_hash_functions(self, spark, triples):
        import hashlib

        r = rows(
            bgp_select(
                triples,
                "SELECT ?l (MD5(?l) AS ?h5) (SHA1(?l) AS ?h1) "
                "(SHA256(?l) AS ?h256) WHERE { "
                "<urn:c:1> skos:prefLabel ?l . }",
                PFX,
            )
        )
        assert len(r) == 1
        l, h5, h1, h256 = r[0]
        assert l == "Alpha"
        assert h5 == hashlib.md5(b"Alpha").hexdigest()
        assert h1 == hashlib.sha1(b"Alpha").hexdigest()
        assert h256 == hashlib.sha256(b"Alpha").hexdigest()

    def test_isnumeric(self, spark, triples):
        # identifiers "G3" are not numeric; "3" would be
        r = rows(
            bgp_select(
                triples,
                "SELECT ?i WHERE { ?s dc:identifier ?i . "
                "FILTER(!ISNUMERIC(?i)) }",
                PFX,
            )
        )
        assert r == [("G3",)]

    def test_date_accessors(self, spark):
        t = spark.createDataFrame(
            [
                ("urn:e:1", "urn:p:when", "2024-03-05T07:08:09",
                 "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        r = rows(
            bgp_select(
                t,
                "SELECT (YEAR(?d) AS ?y) (MONTH(?d) AS ?m) "
                "(DAY(?d) AS ?dd) (HOURS(?d) AS ?hh) "
                "(MINUTES(?d) AS ?mi) (SECONDS(?d) AS ?ss) "
                "WHERE { ?s <urn:p:when> ?d . }",
            )
        )
        assert r == [(2024, 3, 5, 7, 8, 9)]


class TestReviewRegressions:
    """Pins for engine bugs found by adversarial review: null-safe
    companion joins, ANSI-safe numeric coercion, tokenizer/term-regex
    greediness, SELECT * completeness, numeric VALUES, per-graph
    paths, aggregate-frame SELECT expressions."""

    def test_shared_var_with_dt_filter_across_patterns(self, spark):
        t = spark.createDataFrame(
            [
                ("urn:a", "http://ex/p", "hello", "literal", None, None),
                ("urn:b", "http://ex/q", "hello", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        got = bgp_select(
            t,
            "SELECT ?o WHERE { ?a <http://ex/p> ?o . ?b <http://ex/q> ?o ."
            " FILTER(DATATYPE(?o) = <http://www.w3.org/2001/XMLSchema#string>) }",
        ).collect()
        # plain literals carry NULL o_datatype: the companion columns
        # must join null-safely or this valid solution vanishes
        assert [r.o for r in got] == ["hello"]

    def test_numeric_filter_skips_non_numeric_rows(self, triples):
        # a non-numeric literal in the table must not crash the job
        # under ANSI mode; SPARQL treats it as a per-row type error
        got = bgp_select(
            triples, "SELECT ?s WHERE { ?s ?p ?o . FILTER(?o > 1) }"
        ).collect()
        assert got == []

    def test_range_filter_lt_gt(self, spark):
        t = spark.createDataFrame(
            [("urn:a", "http://ex/v", "12", "literal", None, None)],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        got = bgp_select(
            t,
            "SELECT ?s WHERE { ?s <http://ex/v> ?x ."
            " FILTER(?x < 20 && ?x > 3) }",
        ).collect()
        assert [r.s for r in got] == ["urn:a"]

    def test_select_star_includes_bind_and_values(self, triples):
        q = parse_select(
            "SELECT * WHERE { ?s <" + SKOS + "prefLabel> ?o ."
            " BIND(STRLEN(?o) AS ?len) }"
        )
        assert "len" in q["proj"]
        q2 = parse_select("SELECT * WHERE { VALUES ?x { 1 2 } ?s ?p ?x }")
        assert "x" in q2["proj"]

    def test_numeric_values_rows(self, spark):
        t = spark.createDataFrame(
            [("urn:a", "http://ex/v", "12", "literal", None, None)],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        got = bgp_select(
            t, "SELECT ?x WHERE { VALUES ?x { 12 13 } ?s <http://ex/v> ?x }"
        ).collect()
        assert [r.x for r in got] == ["12"]

    def test_datatype_dot_separator(self, triples):
        # "5"^^<…#int>. ?s … — the dt capture must not swallow the dot
        got = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s <' + DC + 'identifier> "G3" . '
            "?s <" + SKOS + "prefLabel> ?o }",
        ).collect()
        assert [r.s for r in got] == ["urn:c:3"]

    def test_graph_var_path_stays_per_graph(self, spark):
        quads = spark.createDataFrame(
            [
                ("urn:g1", "urn:a", "http://ex/b", "urn:b", "iri", None, None),
                ("urn:g1", "urn:b", "http://ex/b", "urn:c", "iri", None, None),
                ("urn:g2", "urn:b", "http://ex/b", "urn:d", "iri", None, None),
            ],
            "g string, s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        got = sorted(
            (r.g, r.x)
            for r in bgp_select(
                quads,
                "SELECT ?g ?x WHERE { GRAPH ?g { <urn:a> <http://ex/b>+ ?x } }",
            ).collect()
        )
        # the closure must not leak into g2 (b→d lives there)
        assert got == [("urn:g1", "urn:b"), ("urn:g1", "urn:c")]

    def test_select_expr_over_aggregates(self, triples):
        got = bgp_select(
            triples,
            "SELECT ?p (COUNT(?s) AS ?c) (STRLEN(?p) AS ?l)"
            " WHERE { ?s ?p ?o } GROUP BY ?p",
        )
        assert got.columns == ["p", "c", "l"]
        r = {row.p: (row.c, row.l) for row in got.collect()}
        assert r[SKOS + "member"] == (2, len(SKOS + "member"))


class TestTermEqualityFilters:
    """=/!= against language-tagged or typed literal constants compare
    the RDF term (value AND tag/datatype), not just the lexical form
    (round-3 review fix)."""

    def test_eq_lang_tagged_literal(self, triples, spark):
        out = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s skos:prefLabel ?l . '
            'FILTER(?l = "Gamma"@fr) }',
            PFX,
        )
        assert rows(out) == [("urn:c:3",)]
        # same lexical form, wrong tag: no match
        out = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s skos:prefLabel ?l . '
            'FILTER(?l = "Gamma"@en) }',
            PFX,
        )
        assert rows(out) == []
        # tag compare is case-insensitive (BCP47)
        out = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s skos:prefLabel ?l . '
            'FILTER(?l = "Gamma"@FR) }',
            PFX,
        )
        assert rows(out) == [("urn:c:3",)]

    def test_neq_lang_tagged_literal(self, triples):
        out = bgp_select(
            triples,
            'SELECT ?l WHERE { ?s skos:prefLabel ?l . '
            'FILTER(?l != "Gamma"@fr) }',
            PFX,
        )
        assert rows(out) == [("Alpha",), ("Beta",)]

    def test_eq_typed_literal(self, spark):
        xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:p", "5", "literal", xsd_int, None),
                ("urn:b", "urn:p", "5", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df,
            'SELECT ?s WHERE { ?s <urn:p> ?v . '
            'FILTER(?v = "5"^^<http://www.w3.org/2001/XMLSchema#integer>) }',
        )
        assert rows(out) == [("urn:a",)]


class TestRound3CompilerFixes:
    """Pins for the round-3 SPARQL-semantics review findings."""

    def test_filter_eq_plain_literal_ignores_tagged(self, triples):
        """RDFterm-equal: "Alpha"@en = "Alpha" is a type error → false
        (17.4.1.7); only the tagged compare matches."""
        r = rows(
            bgp_select(
                triples,
                'SELECT ?s WHERE { ?s skos:prefLabel ?l . FILTER(?l = "Alpha") }',
                PFX,
            )
        )
        assert r == []
        r2 = rows(
            bgp_select(
                triples,
                'SELECT ?s WHERE { ?s skos:prefLabel ?l . '
                'FILTER(?l = "Alpha"@en) }',
                PFX,
            )
        )
        assert [x[0] for x in r2] == ["urn:c:1"]

    def test_nested_group_routes_to_algebra(self, triples):
        """An EXISTS inside OPTIONAL would be regex-hoisted by the
        flat extractor (silently gating the whole solution set) — it
        must route to the recursive algebra compiler, which fuses the
        EXISTS into the LeftJoin condition (§18.2.2.6): concepts keep
        their label only where a broader link exists, everything else
        survives unextended."""
        out = bgp_select(
            triples,
            "SELECT ?s ?l WHERE { ?s a skos:Concept OPTIONAL { "
            "?s skos:prefLabel ?l FILTER EXISTS { ?s skos:broader ?b } } } "
            "ORDER BY ?s",
            PFX,
        )
        got = rows(out)
        # every concept appears exactly once (left rows never drop);
        # ?l is bound only where the EXISTS gate held
        subjects = [r[0] for r in got]
        assert subjects == sorted(set(subjects))
        with_l = {r[0] for r in got if r[1] is not None}
        broader = {
            r[0]
            for r in rows(
                bgp_select(
                    triples,
                    "SELECT ?s WHERE { ?s skos:broader ?b . "
                    "?s skos:prefLabel ?l }",
                    PFX,
                )
            )
        }
        assert with_l == broader

    def test_unbound_filter_var_yields_empty_not_error(self, triples):
        """17.2: an unbound variable is a type error; FILTER treats
        errors as false — empty result, not a query failure."""
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s WHERE { ?s a skos:Concept . FILTER(?nope > 1) }",
                PFX,
            )
        )
        assert r == []

    def test_order_by_numeric_value_not_lexicographic(self, spark):
        df = spark.createDataFrame(
            [
                ("urn:a", "urn:age", "2", "literal", None, None),
                ("urn:b", "urn:age", "9", "literal", None, None),
                ("urn:c", "urn:age", "10", "literal", None, None),
            ],
            "s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        out = bgp_select(
            df, "SELECT ?n WHERE { ?s <urn:age> ?n } ORDER BY ?n"
        ).collect()
        assert [r.n for r in out] == ["2", "9", "10"]
        out_d = bgp_select(
            df, "SELECT ?n WHERE { ?s <urn:age> ?n } ORDER BY DESC(?n)"
        ).collect()
        assert [r.n for r in out_d] == ["10", "9", "2"]

    def test_zero_length_path_out_of_graph_constant(self, triples):
        """§18.4 ALP: ZeroOrMorePath evaluates from the given term
        itself, even when it appears nowhere in the graph."""
        r = rows(
            bgp_select(
                triples,
                "SELECT ?x WHERE { <urn:absent> skos:broader* ?x }",
                PFX,
            )
        )
        assert r == [("urn:absent",)]

    def test_two_optionals_with_constant_gates_do_not_collide(self, triples):
        """Two OPTIONAL groups each opening with an all-constant
        triple used to both emit a gate column _mo0, which the second
        group's join treated as a never-matching key."""
        r = rows(
            bgp_select(
                triples,
                "SELECT ?s ?l1 ?l2 WHERE { ?s a skos:Concept "
                "OPTIONAL { <urn:col:1> skos:member <urn:c:1> . "
                "?s skos:prefLabel ?l1 } "
                "OPTIONAL { <urn:col:1> skos:member <urn:c:2> . "
                "?s skos:altLabel ?l2 } }",
                PFX,
            )
        )
        assert ("urn:c:1", "Alpha", "A") in r

    def test_graph_var_same_var_path_keeps_g(self, spark):
        """GRAPH ?g { ?x <p>+ ?x }: the ?g binding must survive the
        same-variable endpoint rebuild."""
        quads = spark.createDataFrame(
            [
                ("urn:g1", "urn:a", "http://ex/p", "urn:b", "iri", None, None),
                ("urn:g1", "urn:b", "http://ex/p", "urn:a", "iri", None, None),
                ("urn:g2", "urn:a", "http://ex/p", "urn:z", "iri", None, None),
            ],
            "g string, s string, p string, o string, o_kind string, "
            "o_datatype string, o_lang string",
        )
        got = sorted(
            (r.g, r.x)
            for r in bgp_select(
                quads,
                "SELECT ?g ?x WHERE { GRAPH ?g { ?x <http://ex/p>+ ?x } }",
            ).collect()
        )
        assert got == [("urn:g1", "urn:a"), ("urn:g1", "urn:b")]

    def test_empty_where_is_one_empty_solution(self, triples):
        from py_sema_spark.queries.bgp import bgp_ask

        assert bgp_ask(triples, "ASK WHERE { }").first().ask is True


class TestExtractCallsBoundary:
    """ADVICE r04: with bare_call, \\bFILTER\\s*fn?\\( must not consume
    FILTER-prefixed identifiers like FILTERED(x)."""

    def test_filter_prefixed_identifier_not_hijacked(self):
        from py_sema_spark.queries.bgp import _extract_calls

        where, bodies = _extract_calls(
            "?s ex:FILTERED(x) FILTER isIRI(?s)", "FILTER", bare_call=True
        )
        assert bodies == ["isIRI(?s)"]
        assert "FILTERED(x)" in where

    def test_bare_filter_still_matches(self):
        from py_sema_spark.queries.bgp import _extract_calls

        _, bodies = _extract_calls(
            "FILTER regex(?n, \"^A\") . FILTER(?x > 2)", "FILTER",
            bare_call=True,
        )
        assert bodies == ['regex(?n, "^A")', "?x > 2"]
