"""SHACL property-path semantics (§2.3.1) + sh:xone +
sh:qualifiedValueShape.

The reference validates with pyshacl, which implements full SHACL
paths (/root/reference/sema/bench/handler.py:61-81 hard-asserts
conformance of whatever shape graph a sembench config supplies — path
expressions included). Here each path form is pinned twice: the
(focus → value) relation directly via ``_path_values``, and the
end-to-end constraint behavior through ``validate``.
"""

import pytest

from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.rdf.turtle import parse_turtle
from py_sema_spark.shacl import (
    _path_values,
    parse_shapes_ttl,
    path_str,
    validate,
)

EX = "http://example.org/"

DATA_TTL = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:alice a ex:Person ; ex:knows ex:bob ; ex:name "Alice" .
ex:bob a ex:Person ; ex:knows ex:carol ; ex:name "Bob" .
ex:carol a ex:Person ; ex:name "Carol" .
ex:dave a ex:Person .
ex:acme a ex:Org ; ex:member ex:alice ; ex:member ex:bob ;
    ex:member "not-a-person" .
ex:t1 ex:broader ex:t2 . ex:t2 ex:broader ex:t3 .
"""


def triples_df(spark, ttl=DATA_TTL):
    rows = [
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
        for t in parse_turtle(ttl, base=EX)
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def pair_set(df):
    return {(r["s"], r["o"]) for r in df.collect()}


class TestPathValues:
    def test_inverse(self, spark):
        pairs, z = _path_values(
            triples_df(spark), ("inv", ("pred", EX + "member"))
        )
        assert z is False
        assert pair_set(pairs) == {
            (EX + "alice", EX + "acme"),
            (EX + "bob", EX + "acme"),
            ("not-a-person", EX + "acme"),
        }

    def test_inverse_keeps_literal_focus_keys(self, spark):
        # acme ex:member "not-a-person": the literal IS a valid focus
        # of the inverted relation (sh:targetObjectsOf can select it);
        # its ^member value is acme — dropping it caused spurious
        # minCount violations on literal focus nodes
        pairs, _ = _path_values(
            triples_df(spark), ("inv", ("pred", EX + "member"))
        )
        assert ("not-a-person", EX + "acme") in pair_set(pairs)

    def test_sequence(self, spark):
        pairs, z = _path_values(
            triples_df(spark),
            ("seq", [("pred", EX + "knows"), ("pred", EX + "name")]),
        )
        assert z is False
        assert pair_set(pairs) == {
            (EX + "alice", "Bob"),
            (EX + "bob", "Carol"),
        }

    def test_alternative(self, spark):
        pairs, z = _path_values(
            triples_df(spark),
            ("alt", [("pred", EX + "knows"), ("pred", EX + "name")]),
        )
        assert z is False
        got = pair_set(pairs)
        assert (EX + "alice", EX + "bob") in got
        assert (EX + "alice", "Alice") in got
        assert len(got) == 5

    def test_zero_or_more(self, spark):
        pairs, z = _path_values(
            triples_df(spark), ("zom", ("pred", EX + "broader"))
        )
        assert z is True  # zero-length handled at the focus set
        assert {
            o for s, o in pair_set(pairs) if s == EX + "t1"
        } == {EX + "t2", EX + "t3"}

    def test_one_or_more(self, spark):
        pairs, z = _path_values(
            triples_df(spark), ("oom", ("pred", EX + "broader"))
        )
        assert z is False
        assert {
            o for s, o in pair_set(pairs) if s == EX + "t1"
        } == {EX + "t2", EX + "t3"}

    def test_zero_or_one(self, spark):
        pairs, z = _path_values(
            triples_df(spark), ("zoo", ("pred", EX + "broader"))
        )
        assert z is True
        assert pair_set(pairs) == {
            (EX + "t1", EX + "t2"),
            (EX + "t2", EX + "t3"),
        }

    def test_closure_reaches_trailing_literals(self, spark):
        # (knows|name)+ from alice: node closure over knows, plus the
        # literal-valued name step from every reachable node
        pairs, _ = _path_values(
            triples_df(spark),
            ("oom", ("alt", [("pred", EX + "knows"),
                             ("pred", EX + "name")])),
        )
        alice = {o for s, o in pair_set(pairs) if s == EX + "alice"}
        assert alice == {EX + "bob", EX + "carol", "Alice", "Bob", "Carol"}

    def test_sequence_with_zero_capable_tail(self, spark):
        # knows/(knows?) from alice: bob (tail skipped) and carol
        pairs, z = _path_values(
            triples_df(spark),
            ("seq", [("pred", EX + "knows"),
                     ("zoo", ("pred", EX + "knows"))]),
        )
        assert z is False
        alice = {o for s, o in pair_set(pairs) if s == EX + "alice"}
        assert alice == {EX + "bob", EX + "carol"}

    def test_literal_values_keep_term_metadata(self, spark):
        pairs, _ = _path_values(
            triples_df(spark),
            ("seq", [("pred", EX + "knows"), ("pred", EX + "name")]),
        )
        row = pairs.where(pairs.o == "Bob").collect()[0]
        assert row["o_kind"] == "literal"
        assert row["o_datatype"].endswith("string")


class TestPathValidation:
    def test_inverse_min_count(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:MemberOfSomething a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path [ sh:inversePath ex:member ] ; sh:minCount 1 ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        assert {v["focus"] for v in viols} == {EX + "carol", EX + "dave"}
        assert all(v["constraint"] == "minCount" for v in viols)
        assert all(v["path"] == "^" + EX + "member" for v in viols)

    def test_sequence_path_turtle_list(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:KnownName a sh:NodeShape ;
  sh:targetNode ex:alice ;
  sh:property [ sh:path ( ex:knows ex:name ) ; sh:pattern "^B" ] .
""")
        (shape,) = shapes
        assert shape.properties[0].path_ast == (
            "seq", [("pred", EX + "knows"), ("pred", EX + "name")]
        )
        assert validate(triples_df(spark), shapes).collect() == []
        bad = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:KnownName a sh:NodeShape ;
  sh:targetNode ex:alice ;
  sh:property [ sh:path ( ex:knows ex:name ) ; sh:pattern "^C" ] .
""")
        viols = validate(triples_df(spark), bad).collect()
        assert [(v["constraint"], v["value"]) for v in viols] == [
            ("pattern", "Bob")
        ]

    def test_zero_or_more_includes_focus_itself(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:Broader a sh:NodeShape ;
  sh:targetNode ex:t1 ;
  sh:property [ sh:path [ sh:zeroOrMorePath ex:broader ] ;
                sh:pattern "t[23]$" ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        # t2/t3 match; the zero-length value (t1 itself) violates
        assert [(v["focus"], v["value"]) for v in viols] == [
            (EX + "t1", EX + "t1")
        ]

    def test_compound_path_never_widens_closed_shape(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
ex:Closed a sh:NodeShape ;
  sh:targetNode ex:t1 ;
  sh:closed true ;
  sh:ignoredProperties ( rdf:type ) ;
  sh:property [ sh:path [ sh:inversePath ex:broader ] ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        # ex:broader on t1 is NOT allowed by the inverse-path property
        assert [(v["constraint"], v["path"]) for v in viols] == [
            ("closed", EX + "broader")
        ]


class TestXone:
    SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetNode ex:x ;
  sh:property [ sh:path ex:v ;
    sh:xone ( [ sh:minLength 2 ] [ sh:maxLength 4 ] ) ] .
"""

    def data(self, spark, value):
        return triples_df(
            spark,
            f'@prefix ex: <http://example.org/> .\nex:x ex:v "{value}" .',
        )

    def test_exactly_one_branch_conforms(self, spark):
        shapes = parse_shapes_ttl(self.SHAPES)
        # len 7: only minLength 2 conforms → ok
        assert validate(self.data(spark, "longish"), shapes).collect() == []
        # len 1: only maxLength 4 conforms → ok
        assert validate(self.data(spark, "a"), shapes).collect() == []

    def test_both_or_neither_violate(self, spark):
        shapes = parse_shapes_ttl(self.SHAPES)
        # len 3 conforms to both branches → xone violation
        viols = validate(self.data(spark, "abc"), shapes).collect()
        assert [v["constraint"] for v in viols] == ["xone"]


class TestQualifiedValueShape:
    def shapes(self, line):
        return parse_shapes_ttl(f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:OrgShape a sh:NodeShape ;
  sh:targetClass ex:Org ;
  sh:property [ sh:path ex:member ;
    sh:qualifiedValueShape [ sh:class ex:Person ] ;
    {line} ] .
""")

    def test_min_count_met(self, spark):
        ok = self.shapes("sh:qualifiedMinCount 2")
        assert validate(triples_df(spark), ok).collect() == []

    def test_min_count_violation_counts_conforming_only(self, spark):
        # acme has 3 member values but only 2 conform to [sh:class
        # ex:Person] (the literal doesn't)
        viols = validate(
            triples_df(spark), self.shapes("sh:qualifiedMinCount 3")
        ).collect()
        assert [(v["constraint"], v["value"]) for v in viols] == [
            ("qualifiedMinCount", "2")
        ]

    def test_max_count(self, spark):
        viols = validate(
            triples_df(spark), self.shapes("sh:qualifiedMaxCount 1")
        ).collect()
        assert [(v["constraint"], v["value"]) for v in viols] == [
            ("qualifiedMaxCount", "2")
        ]

    def test_qualified_over_inverse_path(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
  sh:targetNode ex:alice, ex:dave ;
  sh:property [ sh:path [ sh:inversePath ex:member ] ;
    sh:qualifiedValueShape [ sh:class ex:Org ] ;
    sh:qualifiedMinCount 1 ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        assert [(v["focus"], v["constraint"]) for v in viols] == [
            (EX + "dave", "qualifiedMinCount")
        ]


def test_path_str_rendering():
    assert path_str(("pred", "urn:p")) == "urn:p"
    assert path_str(("inv", ("pred", "urn:p"))) == "^urn:p"
    assert path_str(
        ("seq", [("pred", "urn:p"), ("inv", ("pred", "urn:q"))])
    ) == "urn:p/^urn:q"
    assert path_str(
        ("inv", ("seq", [("pred", "urn:p"), ("pred", "urn:q")]))
    ) == "^(urn:p/urn:q)"
    assert path_str(
        ("zom", ("alt", [("pred", "urn:p"), ("pred", "urn:q")]))
    ) == "(urn:p|urn:q)*"
    assert path_str(("oom", ("pred", "urn:p"))) == "urn:p+"
    assert path_str(("zoo", ("pred", "urn:p"))) == "urn:p?"


def test_unknown_path_expression_raises():
    with pytest.raises(ValueError, match="path expression"):
        parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetNode ex:x ;
  sh:property [ sh:path [ ex:notAPath ex:p ] ; sh:minCount 1 ] .
""")


class TestNodeShapeConstraints:
    """Constraints declared directly on the node shape apply to each
    focus node itself (SHACL §2.1; pyshacl honors e.g. ex:S
    sh:nodeKind sh:IRI with no sh:path)."""

    def test_node_level_pattern(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonIri a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:pattern "/(alice|bob|carol)$" .
""")
        viols = validate(triples_df(spark), shapes).collect()
        assert [(v["focus"], v["constraint"], v["path"]) for v in viols] \
            == [(EX + "dave", "pattern", None)]

    def test_node_level_class(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:MembersArePeople a sh:NodeShape ;
  sh:targetObjectsOf ex:member ;
  sh:class ex:Person .
""")
        viols = validate(triples_df(spark), shapes).collect()
        # acme's members: alice, bob (Persons) and the literal
        assert {(v["focus"], v["constraint"]) for v in viols} == {
            ("not-a-person", "class")
        }

    def test_node_level_node_kind_and_logicals(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetNode ex:alice, ex:t1 ;
  sh:nodeKind sh:IRI ;
  sh:not [ sh:pattern "t1$" ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        assert [(v["focus"], v["constraint"]) for v in viols] == [
            (EX + "t1", "not")
        ]

    def test_node_level_has_value_means_focus_equals(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:broader ;
  sh:hasValue ex:t1 .
""")
        viols = validate(triples_df(spark), shapes).collect()
        assert {v["focus"] for v in viols} == {EX + "t2"}
        assert all(v["constraint"] == "hasValue" for v in viols)

    def test_node_level_sh_node_recurses(self, spark):
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetNode ex:alice, ex:dave ;
  sh:node ex:HasName .
ex:HasName a sh:NodeShape ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
        viols = validate(triples_df(spark), shapes).collect()
        by_constraint = {}
        for v in viols:
            by_constraint.setdefault(v["constraint"], set()).add(v["focus"])
        assert by_constraint["node"] == {EX + "dave"}

    def test_property_only_component_on_node_shape_rejected(self):
        with pytest.raises(ValueError, match="ill-formed"):
            parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:minCount 1 .
""")

    def test_plain_shapes_unchanged(self, spark):
        # a shape with ONLY sh:property members must not grow a
        # node-constraint pseudo property
        shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
        (shape,) = shapes
        assert shape.node_constraints is None
        assert len(shape.properties) == 1


def test_sh_message_overrides_default(spark):
    shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ;
                sh:message "every person needs a name" ] .
""")
    viols = validate(triples_df(spark), shapes).collect()
    assert [(v["focus"], v["message"]) for v in viols] == [
        (EX + "dave", "every person needs a name")
    ]
    # no sh:message → engine default stays
    plain = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    (v,) = validate(triples_df(spark), plain).collect()
    assert v["message"] == "fewer than 1 values"


def test_sh_severity(spark):
    from py_sema_spark.shacl import SEVERITY_VIOLATION, conforms

    warn_shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ;
                sh:severity sh:Warning ] .
""")
    df = triples_df(spark)
    viols = validate(df, warn_shapes).collect()
    assert [(v["focus"], v["severity"]) for v in viols] == [
        (EX + "dave", "http://www.w3.org/ns/shacl#Warning")
    ]
    # spec default: any result is non-conforming; pyshacl's
    # allow_warnings knob relaxes to Violation-only
    assert conforms(df, warn_shapes) is False
    assert conforms(df, warn_shapes, allow_warnings=True) is True

    # default severity is sh:Violation; node-shape severity applies to
    # its own results (closed)
    plain = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
ex:C a sh:NodeShape ;
  sh:targetNode ex:t1 ;
  sh:closed true ;
  sh:severity sh:Info ;
  sh:ignoredProperties ( rdf:type ) .
""")
    rows = validate(df, plain).collect()
    assert rows and all(
        v["severity"] == "http://www.w3.org/ns/shacl#Info" for v in rows
    )
    defaults = validate(df, parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")).collect()
    assert all(v["severity"] == SEVERITY_VIOLATION for v in defaults)

    # a node shape's sh:severity does NOT cascade onto its property
    # shapes — each shape's severity independently defaults to
    # sh:Violation (spec §3.5; matches pyshacl)
    node_warn = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:severity sh:Warning ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
    rows = validate(df, node_warn).collect()
    assert rows and all(
        v["severity"] == SEVERITY_VIOLATION for v in rows
    )


def test_literal_focus_keeps_term_metadata(spark):
    """targetObjectsOf can make LITERALS the focus nodes; node-level
    datatype checks must see their real datatype (the pyshacl-style
    'every object of ex:age is an xsd:integer' idiom)."""
    data = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a ex:age "30"^^xsd:integer .
ex:b ex:age "thirty" .
ex:c ex:age ex:unknown .
"""
    shapes = parse_shapes_ttl("""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <http://example.org/> .
ex:AgeValues a sh:NodeShape ;
  sh:targetObjectsOf ex:age ;
  sh:datatype xsd:integer .
""")
    viols = validate(triples_df(spark, data), shapes).collect()
    assert {(v["focus"], v["constraint"]) for v in viols} == {
        ("thirty", "datatype"),
        (EX + "unknown", "datatype"),
    }
