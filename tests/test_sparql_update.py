"""SPARQL 1.1 Update subset → DataFrame set algebra
(py_sema_spark/queries/update.py). The reference mutates stores via
rdflib graph ops (/root/reference/sema/commons/store/store.py:384-395,
507-510); this pins the update-verb compilation to the spec's
sequence/anti-join/union semantics."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.queries.update import apply_update, parse_update

SKOS = "http://www.w3.org/2004/02/skos/core#"
RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
EX = "http://example.org/"
PFX = {"skos": SKOS, "ex": EX}

SCHEMA = (
    "s string, p string, o string, o_kind string, "
    "o_datatype string, o_lang string"
)


@pytest.fixture()
def triples(spark):
    rows = [
        ("urn:c:1", RDFT, SKOS + "Concept", "iri", None, None),
        ("urn:c:1", SKOS + "prefLabel", "Alpha", "literal", None, "en"),
        ("urn:c:1", EX + "status", "active", "literal", None, None),
        ("urn:c:2", RDFT, SKOS + "Concept", "iri", None, None),
        ("urn:c:2", SKOS + "prefLabel", "Beta", "literal", None, "en"),
        ("urn:c:2", EX + "status", "deprecated", "literal", None, None),
        ("urn:c:2", SKOS + "broader", "urn:c:1", "iri", None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _set(df):
    return {tuple(r) for r in df.collect()}


def test_insert_data(triples):
    out = apply_update(
        triples,
        'PREFIX ex: <http://example.org/> '
        'INSERT DATA { <urn:c:3> a skos:Concept . '
        '<urn:c:3> skos:prefLabel "Gamma"@fr . '
        '<urn:c:3> ex:rank "3"^^<http://www.w3.org/2001/XMLSchema#integer> }',
        PFX,
    )
    got = _set(out)
    assert ("urn:c:3", RDFT, SKOS + "Concept", "iri", None, None) in got
    assert ("urn:c:3", SKOS + "prefLabel", "Gamma", "literal", None, "fr") in got
    assert (
        "urn:c:3", EX + "rank", "3", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", None,
    ) in got
    assert len(got) == triples.count() + 3


def test_insert_data_is_set_semantics(triples):
    # inserting an existing triple does not double it (U2)
    out = apply_update(
        triples,
        'INSERT DATA { <urn:c:1> <http://example.org/status> "active" }',
        PFX,
    )
    assert out.count() == triples.count()


def test_delete_data(triples):
    out = apply_update(
        triples,
        'DELETE DATA { <urn:c:2> <http://example.org/status> "deprecated" }',
    )
    assert out.count() == triples.count() - 1
    assert (
        out.where(F.col("o") == "deprecated").count() == 0
    )


def test_delete_data_lang_is_distinct(triples):
    # "Alpha" (no lang) is NOT in the graph — only "Alpha"@en; a
    # lang-less DELETE DATA must not match the tagged literal
    out = apply_update(
        triples,
        "DELETE DATA { "
        "<urn:c:1> <http://www.w3.org/2004/02/skos/core#prefLabel> \"Alpha\" }",
    )
    assert out.count() == triples.count()


def test_delete_where(triples):
    out = apply_update(
        triples, "DELETE WHERE { ?s <http://example.org/status> ?v }"
    )
    assert out.where(F.col("p") == EX + "status").count() == 0
    assert out.count() == triples.count() - 2


def test_delete_insert_where(triples):
    out = apply_update(
        triples,
        """
        PREFIX ex: <http://example.org/>
        DELETE { ?s ex:status "deprecated" }
        INSERT { ?s ex:status "retired" . ?s ex:retiredFrom ?b }
        WHERE  { ?s ex:status "deprecated" . ?s skos:broader ?b }
        """,
        PFX,
    )
    got = _set(out)
    assert ("urn:c:2", EX + "status", "retired", "literal", None, None) in got
    assert ("urn:c:2", EX + "retiredFrom", "urn:c:1", "iri", None, None) in got
    assert ("urn:c:2", EX + "status", "deprecated", "literal", None, None) not in got
    # c:1 stays untouched
    assert ("urn:c:1", EX + "status", "active", "literal", None, None) in got


def test_insert_where_only(triples):
    out = apply_update(
        triples,
        "PREFIX skos: <http://www.w3.org/2004/02/skos/core#> "
        "INSERT { ?o skos:narrower ?s } WHERE { ?s skos:broader ?o }",
    )
    assert (
        "urn:c:1", SKOS + "narrower", "urn:c:2", "iri", None, None,
    ) in _set(out)
    assert out.count() == triples.count() + 1


def test_sequence_semantics(triples):
    # second op sees the first op's result (spec §3: left-to-right)
    out = apply_update(
        triples,
        'PREFIX ex: <http://example.org/> '
        'INSERT DATA { <urn:c:9> ex:status "deprecated" } ; '
        'DELETE WHERE { ?s ex:status "deprecated" }',
        PFX,
    )
    assert out.where(F.col("o") == "deprecated").count() == 0
    assert out.where(F.col("s") == "urn:c:9").count() == 0


def test_where_evaluated_pre_delete(triples):
    # DELETE removes the very triples the INSERT template reads: the
    # solution set must come from the pre-op state
    out = apply_update(
        triples,
        "PREFIX skos: <http://www.w3.org/2004/02/skos/core#> "
        "PREFIX ex: <http://example.org/> "
        "DELETE { ?s skos:broader ?o } "
        "INSERT { ?s ex:wasUnder ?o } "
        "WHERE { ?s skos:broader ?o }",
    )
    got = _set(out)
    assert ("urn:c:2", EX + "wasUnder", "urn:c:1", "iri", None, None) in got
    assert not any(t[1] == SKOS + "broader" for t in got)


def test_clear_all(triples):
    assert apply_update(triples, "CLEAR ALL").count() == 0


def test_quads_graph_blocks(spark):
    quads = spark.createDataFrame(
        [
            ("urn:g:1", "urn:s:1", EX + "p", "x", "literal", None, None),
            ("urn:g:2", "urn:s:1", EX + "p", "x", "literal", None, None),
        ],
        "g string, " + SCHEMA,
    )
    out = apply_update(
        quads,
        'INSERT DATA { GRAPH <urn:g:3> { <urn:s:2> <http://example.org/p> "y" } }',
    )
    assert out.where(F.col("g") == "urn:g:3").count() == 1
    # graph-scoped DELETE DATA touches only its graph
    out2 = apply_update(
        out,
        'DELETE DATA { GRAPH <urn:g:1> { <urn:s:1> <http://example.org/p> "x" } }',
    )
    assert _set(out2.select("g")) == {("urn:g:2",), ("urn:g:3",)}
    # CLEAR GRAPH prunes one graph
    assert apply_update(out, "CLEAR GRAPH <urn:g:2>").where(
        F.col("g") == "urn:g:2"
    ).count() == 0


def _quads(spark):
    return spark.createDataFrame(
        [
            ("urn:g:1", "urn:s:1", EX + "p", "x", "literal", None, None),
            ("urn:g:1", "urn:s:1", EX + "q", "k", "literal", None, None),
            ("urn:g:2", "urn:s:1", EX + "p", "x", "literal", None, None),
        ],
        "g string, " + SCHEMA,
    )


def test_graph_wrapped_delete_where(spark):
    """DELETE WHERE { GRAPH <g> { … } } (the form rdflib's
    SPARQLUpdateStore emits) touches only that graph's slice."""
    out = apply_update(
        _quads(spark),
        "DELETE WHERE { GRAPH <urn:g:1> { <urn:s:1> <http://example.org/p> ?o } }",
    )
    assert _set(out.select("g", "p")) == {
        ("urn:g:1", EX + "q"),
        ("urn:g:2", EX + "p"),
    }


def test_graph_wrapped_modify(spark):
    """DELETE {…} INSERT {…} WHERE {…} with every block wrapped in the
    same GRAPH scopes solutions AND effects to that graph."""
    out = apply_update(
        _quads(spark),
        "DELETE { GRAPH <urn:g:1> { ?s <http://example.org/p> ?o } } "
        'INSERT { GRAPH <urn:g:1> { ?s <http://example.org/p> "y" } } '
        "WHERE { GRAPH <urn:g:1> { ?s <http://example.org/p> ?o } }",
    )
    assert _set(out.select("g", "o")) == {
        ("urn:g:1", "y"),
        ("urn:g:1", "k"),
        ("urn:g:2", "x"),
    }


def test_with_graph_modify(spark):
    """WITH <g> DELETE … WHERE … scopes like the GRAPH wrapper."""
    out = apply_update(
        _quads(spark),
        "WITH <urn:g:2> DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
    )
    assert _set(out.select("g")) == {("urn:g:1",)}


def test_mixed_graph_modify_rejected():
    with pytest.raises(ValueError, match="mixed GRAPH"):
        parse_update(
            "DELETE { GRAPH <urn:g:1> { ?s ?p ?o } } "
            "WHERE { GRAPH <urn:g:2> { ?s ?p ?o } }"
        )


def test_graph_wrapped_modify_on_gless_frame(triples):
    """A g-less frame with identity A: a GRAPH <B>-scoped modify is a
    no-op; a GRAPH <A>-scoped one applies."""
    me = "urn:g:me"
    n = triples.count()
    assert apply_update(
        triples,
        "DELETE WHERE { GRAPH <urn:g:other> { ?s ?p ?o } }",
        default_graph=me,
    ).count() == n
    assert apply_update(
        triples,
        f"DELETE WHERE {{ GRAPH <{me}> {{ ?s ?p ?o }} }}",
        default_graph=me,
    ).count() == 0


def test_parse_rejects_vars_in_data():
    with pytest.raises(ValueError, match="illegal"):
        parse_update("INSERT DATA { ?s <urn:p> ?o }")


def test_parse_ops_split():
    _, ops = parse_update(
        'INSERT DATA { <urn:a> <urn:p> "x;y" } ; CLEAR ALL'
    )
    assert [o["kind"] for o in ops] == ["insert_data", "clear"]
    # the ';' inside the literal did not split the op
    assert ops[0]["quads"][0][1][2] == "x;y"


def test_graph_scoped_ops_on_gless_frame(triples):
    """A g-less frame carrying a declared identity (default_graph):
    graph-targeted CLEAR/DELETE apply only when they name THAT graph —
    a request routed to graph A must never mutate A on behalf of B."""
    me = "urn:g:me"
    n = triples.count()
    # CLEAR GRAPH <other> is a no-op, not a wipe
    assert apply_update(
        triples, "CLEAR GRAPH <urn:g:other>", default_graph=me
    ).count() == n
    # CLEAR GRAPH <me> clears this frame
    assert apply_update(
        triples, f"CLEAR GRAPH <{me}>", default_graph=me
    ).count() == 0
    # CLEAR DEFAULT on a named frame is a no-op; without identity it
    # clears (the frame IS the default graph)
    assert apply_update(
        triples, "CLEAR DEFAULT", default_graph=me
    ).count() == n
    assert apply_update(triples, "CLEAR DEFAULT").count() == 0
    # DELETE DATA aimed at another graph deletes nothing here
    out = apply_update(
        triples,
        'DELETE DATA { GRAPH <urn:g:other> { <urn:c:2> '
        "<http://www.w3.org/2004/02/skos/core#broader> <urn:c:1> } }",
        default_graph=me,
    )
    assert out.count() == n


def test_split_ops_escaped_backslash():
    r"""A literal ending in an escaped backslash ("C:\\") must not
    swallow the following ';' separator."""
    _, ops = parse_update(
        'INSERT DATA { <urn:a> <urn:p> "C:\\\\" } ; CLEAR ALL'
    )
    assert [o["kind"] for o in ops] == ["insert_data", "clear"]


class TestReviewRegressions:
    """Round-3 adversarial-review fixes: quote-aware parsing and
    graph-routing symmetry on g-less frames."""

    def test_prefix_inside_literal_is_data(self, triples):
        out = apply_update(
            triples,
            'INSERT DATA { <urn:c:9> <http://example.org/note> '
            '"see PREFIX ex: <http://evil/> for details" }',
            PFX,
        )
        got = _set(out)
        assert (
            "urn:c:9", EX + "note",
            "see PREFIX ex: <http://evil/> for details",
            "literal", None, None,
        ) in got
        # and the bogus prefix is not harvested
        pfx, _ = parse_update(
            'INSERT DATA { <urn:s> <urn:p> "PREFIX zz: <http://z/>" }'
        )
        assert "zz" not in pfx

    def test_graph_keyword_inside_literal_is_data(self, triples):
        out = apply_update(
            triples,
            'INSERT DATA { <urn:c:9> <http://example.org/note> '
            '"example: GRAPH <http://g> { ... }" }',
            PFX,
        )
        assert (
            "urn:c:9", EX + "note", "example: GRAPH <http://g> { ... }",
            "literal", None, None,
        ) in _set(out)

    def test_graph_targeted_insert_data_routing_on_gless_frame(self, triples):
        me = "urn:g:mine"
        before = _set(triples)
        # addressed to another graph: must NOT land in this frame
        out = apply_update(
            triples,
            'INSERT DATA { GRAPH <urn:g:other> { <urn:x> <urn:p> <urn:o> } }',
            default_graph=me,
        )
        assert _set(out) == before
        # addressed to this frame's own graph: inserts
        out = apply_update(
            triples,
            f'INSERT DATA {{ GRAPH <{me}> {{ <urn:x> <urn:p> <urn:o> }} }}',
            default_graph=me,
        )
        assert ("urn:x", "urn:p", "urn:o", "iri", None, None) in _set(out)
