"""SHACL-subset engine tests — constraint surface mirrored from the
reference fixture (example_shape.ttl: datatype, maxCount, in, lessThan,
node, closed, min/maxInclusive) with fresh shapes/data; conform passes,
each nonconform case trips its specific constraint — the same
pass/raise contract as the reference's ShaclHandler
(/root/reference/sema/bench/handler.py:61-81)."""

import pytest

from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.rdf.turtle import parse_turtle
from py_sema_spark.shacl import (
    assert_conforms,
    conforms,
    parse_shapes_ttl,
    validate,
)

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .

ex:CrewShape
    a sh:NodeShape ;
    sh:targetClass ex:Crew ;
    sh:property [
        sh:path ex:callSign ;
        sh:datatype xsd:string ;
        sh:name "call sign" ;
    ] ;
    sh:property [
        sh:path ex:boarded ;
        sh:lessThan ex:departed ;
        sh:maxCount 1 ;
    ] ;
    sh:property [
        sh:path ex:role ;
        sh:in ( "pilot" "navigator" "engineer" ) ;
    ] ;
    sh:property [
        sh:path ex:berth ;
        sh:node ex:BerthShape ;
    ] .

ex:BerthShape
    a sh:NodeShape ;
    sh:closed true ;
    sh:property [
        sh:path ex:deck ;
        sh:datatype xsd:string ;
    ] ;
    sh:property [
        sh:path ex:number ;
        sh:datatype xsd:integer ;
        sh:minInclusive 100 ;
        sh:maxInclusive 999 ;
    ] .
"""

CONFORM_TTL = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:ann a ex:Crew ;
    ex:callSign "kestrel" ;
    ex:boarded "2024-02-01"^^xsd:date ;
    ex:departed "2024-03-01"^^xsd:date ;
    ex:role "pilot" ;
    ex:berth ex:b1 .

ex:b1 ex:deck "C" ; ex:number "412"^^xsd:integer .
"""


def triples_df(spark, ttl):
    rows = [
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
        for t in parse_turtle(ttl, base="http://example.org/")
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


@pytest.fixture(scope="module")
def shapes():
    return parse_shapes_ttl(SHAPES_TTL)


def test_shape_parsing(shapes):
    by = {s.iri: s for s in shapes}
    crew = by["http://example.org/CrewShape"]
    assert crew.target_class == "http://example.org/Crew"
    paths = {p.path.rsplit("/", 1)[-1]: p for p in crew.properties}
    assert paths["callSign"].datatype.endswith("string")
    assert paths["boarded"].max_count == 1
    assert paths["boarded"].less_than.endswith("departed")
    assert paths["role"].in_values == ["pilot", "navigator", "engineer"]
    berth = by["http://example.org/BerthShape"]
    assert berth.closed is True
    nums = [p for p in berth.properties if p.path.endswith("number")][0]
    assert nums.min_inclusive == 100 and nums.max_inclusive == 999


def test_conform(spark, shapes):
    df = triples_df(spark, CONFORM_TTL)
    assert conforms(df, shapes)
    assert_conforms(df, shapes)  # must not raise


@pytest.mark.parametrize(
    "old,new,expected_constraint",
    [
        ('ex:callSign "kestrel"', "ex:callSign ex:oops", "datatype"),
        (
            'ex:boarded "2024-02-01"^^xsd:date ;',
            'ex:boarded "2024-02-01"^^xsd:date, "2024-02-02"^^xsd:date ;',
            "maxCount",
        ),
        (
            'ex:boarded "2024-02-01"^^xsd:date',
            'ex:boarded "2024-09-01"^^xsd:date',
            "lessThan",
        ),
        ('ex:role "pilot"', 'ex:role "stowaway"', "in"),
        ('ex:number "412"^^xsd:integer', 'ex:number "7"^^xsd:integer', "range"),
        (
            'ex:number "412"^^xsd:integer',
            'ex:number "412"^^xsd:integer ; ex:hammock "yes"',
            "closed",
        ),
    ],
    ids=["datatype", "maxCount", "lessThan", "in", "range", "closed"],
)
def test_nonconform(spark, shapes, old, new, expected_constraint):
    assert old in CONFORM_TTL
    df = triples_df(spark, CONFORM_TTL.replace(old, new))
    viols = validate(df, shapes).collect()
    assert viols, f"expected a {expected_constraint} violation"
    assert expected_constraint in {v["constraint"] for v in viols}
    with pytest.raises(AssertionError):
        assert_conforms(df, shapes)


def test_node_constraint_propagates(spark, shapes):
    # berth with an out-of-range number: child 'range' violation AND a
    # parent 'node' violation on ex:berth
    bad = CONFORM_TTL.replace('"412"^^xsd:integer', '"7"^^xsd:integer')
    viols = validate(triples_df(spark, bad), shapes).collect()
    constraints = {v["constraint"] for v in viols}
    assert "range" in constraints and "node" in constraints
    node_v = [v for v in viols if v["constraint"] == "node"][0]
    assert node_v["focus"].endswith("ann")
    assert node_v["value"].endswith("b1")


def test_cyclic_node_shapes_terminate(spark):
    """ADVICE r01: mutually-referencing sh:node shapes (A→B→A) must
    validate without unbounded driver recursion."""
    cyc_shapes = parse_shapes_ttl(
        """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:AShape a sh:NodeShape ;
    sh:targetClass ex:A ;
    sh:property [ sh:path ex:toB ; sh:node ex:BShape ] .
ex:BShape a sh:NodeShape ;
    sh:property [ sh:path ex:toA ; sh:node ex:AShape ] .
"""
    )
    data = triples_df(
        spark,
        """
@prefix ex: <http://example.org/> .
ex:a1 a ex:A ; ex:toB ex:b1 .
ex:b1 ex:toA ex:a1 .
""",
    )
    from py_sema_spark.shacl import validate

    # terminates and reports no violations on the conforming cycle
    assert validate(data, cyc_shapes).isEmpty()
