"""SHACL-core conformance vectors (r3 verdict ask #5).

Hand-transcribed vectors for the constraint components this engine
implements, modeled on the PUBLIC W3C SHACL spec examples
(https://www.w3.org/TR/shacl/ — section cited per test) and the areas
the ``w3c/data-shapes`` core test suite covers (core/property/*,
core/node/*, core/targets/*, core/path/*). No network in this
sandbox, so the suite manifests could not be fetched verbatim; each
vector's expected report is fixed by the spec text for that
component, NOT by this repo's validator — an external pin the way
test_sparql_w3c.py pins the query compiler (the r3 differential
suites mirror in-repo semantics and cannot catch shared mistakes).

Assertions check the exact (focusNode, resultPath, component) set of
each report plus conformance, mirroring how the W3C manifests state
expected ValidationResults.

SKIP-LIST — excluded areas, with reasons:
- SPARQL-based constraints (sh:sparql): SPARQL-constraints suite is
  a separate SHACL spec; out of the engine's declared core subset.
- sh:closed with sh:ignoredProperties beyond rdf:type is covered in
  test_shacl.py; vectors here pin the basic form.
- Recursive shape references (shape cycles): undefined validation
  per spec §3.4.3 — pyshacl errors; engine documents non-support.
- misc/ (deactivated, message, severity): covered by
  test_shacl_paths.py::test_sh_severity and the deactivated test in
  test_shacl.py.
- sh:entailment, owl:imports resolution: no network / no reasoner
  coupling by design (inference is a separate operator).
"""

from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.rdf.turtle import parse_turtle
from py_sema_spark.shacl import conforms, parse_shapes_ttl, validate

EX = "http://example.org/"

PREFIXES = """
@prefix sh:   <http://www.w3.org/ns/shacl#> .
@prefix ex:   <http://example.org/> .
@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .
@prefix rdf:  <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
"""


def tdf(spark, ttl):
    rows = [
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype,
         t.o.lang)
        for t in parse_turtle(PREFIXES + ttl, base=EX)
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def report(spark, data_ttl, shapes_ttl):
    """(focus, path, constraint) triples of the validation report."""
    data = tdf(spark, data_ttl)
    shapes = parse_shapes_ttl(PREFIXES + shapes_ttl)
    rows = validate(data, shapes).collect()
    return {(r["focus"], r["path"], r["constraint"]) for r in rows}


def is_conformant(spark, data_ttl, shapes_ttl):
    return conforms(
        tdf(spark, data_ttl), parse_shapes_ttl(PREFIXES + shapes_ttl)
    )


class TestCardinality:
    """core/property/minCount + maxCount (spec §4.2)."""

    DATA = """
ex:alice a ex:Person ; ex:name "Alice" .
ex:bob a ex:Person ; ex:name "Bob", "Robert" .
ex:carol a ex:Person .
"""

    def test_min_count(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
        assert got == {(EX + "carol", EX + "name", "minCount")}

    def test_max_count(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:maxCount 1 ] .
""")
        assert got == {(EX + "bob", EX + "name", "maxCount")}


class TestValueType:
    """core/property/datatype, class, nodeKind (spec §4.1)."""

    def test_datatype(self, spark):
        # spec §4.1.2 example: string-typed names conform, integers
        # and lang-tagged literals do not
        data = """
ex:alice ex:age 23 .
ex:bob ex:age "twenty-two" .
ex:carol ex:age "23"^^xsd:int .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:age ;
  sh:property [ sh:path ex:age ; sh:datatype xsd:integer ] .
""")
        assert got == {
            (EX + "bob", EX + "age", "datatype"),
            # xsd:int is a DIFFERENT datatype than xsd:integer (§4.1.2
            # uses exact datatype match, no derivation)
            (EX + "carol", EX + "age", "datatype"),
        }

    def test_class(self, spark):
        # §4.1.1: value must be a SHACL instance of the class
        # (rdf:type / rdfs:subClassOf*)
        data = """
ex:Student rdfs:subClassOf ex:Person .
ex:alice a ex:Person .
ex:carl a ex:Student .
ex:ghost a ex:Robot .
ex:c1 ex:member ex:alice . ex:c2 ex:member ex:carl .
ex:c3 ex:member ex:ghost .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:member ;
  sh:property [ sh:path ex:member ; sh:class ex:Person ] .
""")
        assert got == {(EX + "c3", EX + "member", "class")}

    def test_node_kind(self, spark):
        # §4.1.3 example: sh:IRI
        data = """
ex:alice ex:knows ex:bob .
ex:carol ex:knows "Bob" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:knows ;
  sh:property [ sh:path ex:knows ; sh:nodeKind sh:IRI ] .
""")
        assert got == {(EX + "carol", EX + "knows", "nodeKind")}


class TestValueRange:
    """core/property/minInclusive &c (spec §4.3)."""

    DATA = """
ex:a ex:score 10 .
ex:b ex:score 3 .
ex:c ex:score 100 .
ex:d ex:score "high" .
"""
    SHAPE = """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:score ;
  sh:property [ sh:path ex:score ;
                sh:minInclusive 4 ; sh:maxInclusive 10 ] .
"""

    def test_range(self, spark):
        got = report(spark, self.DATA, self.SHAPE)
        # §4.3: non-comparable values ("high") violate BOTH bounds'
        # components per spec ("…or cannot be compared")
        assert {(f, c) for (f, _p, c) in got} == {
            (EX + "b", "minInclusive"),
            (EX + "c", "maxInclusive"),
            (EX + "d", "minInclusive"),
            (EX + "d", "maxInclusive"),
        }

    def test_exclusive(self, spark):
        got = report(spark, "ex:a ex:score 4 .", """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:score ;
  sh:property [ sh:path ex:score ; sh:minExclusive 4 ] .
""")
        assert got == {(EX + "a", EX + "score", "minExclusive")}


class TestStringConstraints:
    """core/property/pattern, minLength, maxLength, languageIn,
    uniqueLang (spec §4.4)."""

    def test_pattern(self, spark):
        # §4.4.3 example shape: bCode pattern "^B" — B102 conforms,
        # C103 violates
        data = """
ex:a ex:bCode "B102" .
ex:b ex:bCode "C103" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:bCode ;
  sh:property [ sh:path ex:bCode ; sh:pattern "^B" ] .
""")
        assert got == {(EX + "b", EX + "bCode", "pattern")}

    def test_length_bounds(self, spark):
        data = """
ex:a ex:pw "ab" .
ex:b ex:pw "abcdef" .
ex:c ex:pw "abcdefghijk" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:pw ;
  sh:property [ sh:path ex:pw ; sh:minLength 3 ; sh:maxLength 10 ] .
""")
        assert {(f, c) for (f, _p, c) in got} == {
            (EX + "a", "minLength"), (EX + "c", "maxLength"),
        }

    def test_unique_lang(self, spark):
        # §4.4.5 example: two English labels on one node violate
        data = """
ex:a ex:label "Hello"@en ; ex:label "Hi"@en ; ex:label "Bonjour"@fr .
ex:b ex:label "Ciao"@it .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:label ;
  sh:property [ sh:path ex:label ; sh:uniqueLang true ] .
""")
        assert got == {(EX + "a", EX + "label", "uniqueLang")}

    def test_language_in(self, spark):
        data = """
ex:a ex:label "Hello"@en . ex:b ex:label "Bonjour"@fr .
ex:c ex:label "plain" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:label ;
  sh:property [ sh:path ex:label ; sh:languageIn ( "en" ) ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "b", EX + "c"}


class TestPropertyPairs:
    """core/property/equals, disjoint, lessThan (spec §4.5)."""

    def test_equals(self, spark):
        # §4.5.1 example: firstName must equal givenName value set
        data = """
ex:a ex:firstName "Peter" ; ex:givenName "Peter" .
ex:b ex:firstName "Paul" ; ex:givenName "Saul" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:firstName ;
  sh:property [ sh:path ex:firstName ; sh:equals ex:givenName ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "b"}

    def test_disjoint(self, spark):
        data = """
ex:usa ex:prefLabel "USA" ; ex:altLabel "United States" .
ex:de ex:prefLabel "Germany" ; ex:altLabel "Germany" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:prefLabel ;
  sh:property [ sh:path ex:prefLabel ; sh:disjoint ex:altLabel ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "de"}

    def test_less_than(self, spark):
        # §4.5.3 example: startDate < endDate
        data = """
ex:ok ex:startYear 2020 ; ex:endYear 2024 .
ex:bad ex:startYear 2024 ; ex:endYear 2020 .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:startYear ;
  sh:property [ sh:path ex:startYear ; sh:lessThan ex:endYear ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "bad"}


class TestOther:
    """core/property/in, hasValue (spec §4.6) + closed (§4.8)."""

    def test_in(self, spark):
        # §4.6.2 example: colors limited to an enumeration
        data = """
ex:a ex:color "red" . ex:b ex:color "blue" . ex:c ex:color "pink" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:color ;
  sh:property [ sh:path ex:color ; sh:in ( "red" "blue" ) ] .
""")
        assert got == {(EX + "c", EX + "color", "in")}

    def test_has_value(self, spark):
        # §4.6.1: focus node must have the value among the path values
        data = """
ex:alice ex:role ex:admin , ex:user .
ex:bob ex:role ex:user .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:role ;
  sh:property [ sh:path ex:role ; sh:hasValue ex:admin ] .
""")
        assert got == {(EX + "bob", EX + "role", "hasValue")}

    def test_closed(self, spark):
        # §4.8.1 example shape: only ex:name allowed (rdf:type ignored)
        data = """
ex:a a ex:Person ; ex:name "A" .
ex:b a ex:Person ; ex:name "B" ; ex:nick "bee" .
"""
        got = report(spark, data, """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:closed true ; sh:ignoredProperties ( rdf:type ) ;
  sh:property [ sh:path ex:name ] .
""")
        assert got == {(EX + "b", EX + "nick", "closed")}


class TestLogical:
    """core/node/and, or, not, xone (spec §4.7)."""

    DATA = """
ex:a ex:email "a@x.org" .
ex:b ex:phone "123" .
ex:c ex:email "c@x.org" ; ex:phone "456" .
ex:d ex:name "No Contact" .
"""

    def _contact_shapes(self, op):
        return f"""
ex:S a sh:NodeShape ;
  sh:targetSubjectsOf ex:email , ex:phone , ex:name ;
  sh:{op} ( [ sh:property [ sh:path ex:email ; sh:minCount 1 ] ]
            [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] ) .
"""

    def test_or(self, spark):
        got = report(spark, self.DATA, self._contact_shapes("or"))
        assert {f for (f, _p, _c) in got} == {EX + "d"}

    def test_and(self, spark):
        got = report(spark, self.DATA, self._contact_shapes("and"))
        assert {f for (f, _p, _c) in got} == {EX + "a", EX + "b", EX + "d"}

    def test_xone(self, spark):
        # §4.7.4: exactly one — both-present and none-present violate
        got = report(spark, self.DATA, self._contact_shapes("xone"))
        assert {f for (f, _p, _c) in got} == {EX + "c", EX + "d"}

    def test_not(self, spark):
        # §4.7.1 example: nothing may have a property (here ex:phone)
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:email , ex:phone ;
  sh:not [ sh:property [ sh:path ex:phone ; sh:minCount 1 ] ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "b", EX + "c"}


class TestTargets:
    """core/targets (spec §2.1.3): each target type selects the right
    focus nodes; conforms() reflects any-violation."""

    DATA = """
ex:alice a ex:Person .
ex:bob ex:knows ex:alice .
ex:doc1 ex:author ex:ghost .
"""

    def test_target_node(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetNode ex:alice , ex:doc1 ;
  sh:property [ sh:path ex:author ; sh:maxCount 0 ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "doc1"}

    def test_target_subjects_of(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:knows ;
  sh:property [ sh:path ex:age ; sh:minCount 1 ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "bob"}

    def test_target_objects_of(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetObjectsOf ex:author ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
""")
        assert {f for (f, _p, _c) in got} == {EX + "ghost"}

    def test_conforms_boolean(self, spark):
        ok = """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:age ; sh:maxCount 5 ] .
"""
        assert is_conformant(spark, self.DATA, ok) is True
        bad = """
ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:age ; sh:minCount 1 ] .
"""
        assert is_conformant(spark, self.DATA, bad) is False


class TestQualified:
    """core/property/qualifiedValueShape (spec §4.7.5 example:
    a hand with ≥1 thumb and 4 fingers)."""

    DATA = """
ex:hand1 ex:digit ex:t1 , ex:f1 , ex:f2 , ex:f3 , ex:f4 .
ex:t1 a ex:Thumb .
ex:f1 a ex:Finger . ex:f2 a ex:Finger .
ex:f3 a ex:Finger . ex:f4 a ex:Finger .
ex:hand2 ex:digit ex:g1 .
ex:g1 a ex:Finger .
"""

    def test_qualified_min(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:digit ;
  sh:property [ sh:path ex:digit ;
    sh:qualifiedValueShape [ sh:class ex:Thumb ] ;
    sh:qualifiedMinCount 1 ] .
""")
        assert got == {(EX + "hand2", EX + "digit", "qualifiedMinCount")}

    def test_qualified_max(self, spark):
        got = report(spark, self.DATA, """
ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:digit ;
  sh:property [ sh:path ex:digit ;
    sh:qualifiedValueShape [ sh:class ex:Finger ] ;
    sh:qualifiedMaxCount 3 ] .
""")
        assert got == {(EX + "hand1", EX + "digit", "qualifiedMaxCount")}
