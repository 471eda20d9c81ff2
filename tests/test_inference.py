"""RDFS entailment (operators/inference.py) against hand-computed
closures. The reference reasons via rdflib in-memory graphs
(/root/reference/sema/query/__init__.py); the semantics mirrored here
are the ρdf fragment rules rdfs2/3/5/7/9/11."""

import pytest

from py_sema_spark.operators.inference import (
    RDF_TYPE,
    SUBCLASS,
    SUBPROP,
    DOMAIN,
    RANGE,
    rdfs_entailment,
)

EX = "urn:ex:"


@pytest.fixture(scope="module")
def graph(spark):
    rows = [
        # ontology (in-band)
        (EX + "name", SUBPROP, EX + "label", "iri"),
        (EX + "label", SUBPROP, EX + "annotation", "iri"),
        (EX + "Dog", SUBCLASS, EX + "Mammal", "iri"),
        (EX + "Mammal", SUBCLASS, EX + "Animal", "iri"),
        (EX + "hasOwner", DOMAIN, EX + "Pet", "iri"),
        (EX + "hasOwner", RANGE, EX + "Person", "iri"),
        # instance data
        (EX + "rex", RDF_TYPE, EX + "Dog", "iri"),
        (EX + "rex", EX + "name", "Rex", "literal"),
        (EX + "rex", EX + "hasOwner", EX + "ann", "iri"),
        # literal object for a ranged property: rdfs3 must NOT fire
        (EX + "rex", EX + "note", "a note", "literal"),
        (EX + "note", RANGE, EX + "Text", "iri"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o", "o_kind"])


class TestRdfsEntailment:
    @pytest.fixture(scope="class")
    def out(self, graph):
        return {
            (r["s"], r["p"], r["o"])
            for r in rdfs_entailment(graph).collect()
        }

    def test_input_preserved(self, graph, out):
        for r in graph.select("s", "p", "o").collect():
            assert (r["s"], r["p"], r["o"]) in out

    def test_subproperty_widening_transitive(self, out):
        assert (EX + "rex", EX + "label", "Rex") in out
        # rdfs5 chain: name ⊑ label ⊑ annotation
        assert (EX + "rex", EX + "annotation", "Rex") in out
        assert (EX + "name", SUBPROP, EX + "annotation") in out

    def test_domain_range_types(self, out):
        assert (EX + "rex", RDF_TYPE, EX + "Pet") in out
        assert (EX + "ann", RDF_TYPE, EX + "Person") in out

    def test_range_skips_literals(self, out):
        assert ("a note", RDF_TYPE, EX + "Text") not in out

    def test_subclass_propagation_transitive(self, out):
        assert (EX + "rex", RDF_TYPE, EX + "Mammal") in out
        assert (EX + "rex", RDF_TYPE, EX + "Animal") in out
        assert (EX + "Dog", SUBCLASS, EX + "Animal") in out

    def test_exact_closure(self, graph, out):
        base = {
            (r["s"], r["p"], r["o"])
            for r in graph.select("s", "p", "o").collect()
        }
        expected = base | {
            (EX + "rex", EX + "label", "Rex"),
            (EX + "rex", EX + "annotation", "Rex"),
            (EX + "name", SUBPROP, EX + "annotation"),
            (EX + "Dog", SUBCLASS, EX + "Animal"),
            (EX + "rex", RDF_TYPE, EX + "Pet"),
            (EX + "rex", RDF_TYPE, EX + "Mammal"),
            (EX + "rex", RDF_TYPE, EX + "Animal"),
            (EX + "ann", RDF_TYPE, EX + "Person"),
        }
        assert out == expected

    def test_no_kind_column_treats_objects_as_iris(self, spark):
        g = spark.createDataFrame(
            [
                (EX + "p", RANGE, EX + "C"),
                (EX + "x", EX + "p", EX + "y"),
            ],
            ["s", "p", "o"],
        )
        out = {
            (r["s"], r["p"], r["o"]) for r in rdfs_entailment(g).collect()
        }
        assert (EX + "y", RDF_TYPE, EX + "C") in out


class TestOwlPropertyEntailment:
    def test_many_transitive_properties_one_closure(self, spark):
        """Several TransitiveProperty declarations close independently
        in the ONE (property, node)-keyed closure run (round-3 fix:
        previously one sequential job chain per property)."""
        from py_sema_spark.operators.inference import (
            TRANSITIVE,
            owl_property_entailment,
        )

        rows = [(EX + f"p{i}", RDF_TYPE, TRANSITIVE, "iri") for i in range(3)]
        for i in range(3):
            rows += [
                (EX + f"a{i}", EX + f"p{i}", EX + f"b{i}", "iri"),
                (EX + f"b{i}", EX + f"p{i}", EX + f"c{i}", "iri"),
            ]
        # a cross-property chain must NOT close: a0 -p0-> b0 -p1-> z
        rows.append((EX + "b0", EX + "p1", EX + "z", "iri"))
        g = spark.createDataFrame(rows, ["s", "p", "o", "o_kind"])
        out = {
            (r["s"], r["p"], r["o"])
            for r in owl_property_entailment(g).collect()
        }
        for i in range(3):
            assert (EX + f"a{i}", EX + f"p{i}", EX + f"c{i}") in out
        assert (EX + "a0", EX + "p0", EX + "z") not in out
        assert (EX + "a0", EX + "p1", EX + "z") not in out

    def test_all_three_rules_and_literal_gate(self, spark):
        from py_sema_spark.operators.inference import (
            INVERSE_OF,
            SYMMETRIC,
            TRANSITIVE,
            owl_property_entailment,
        )

        rows = [
            # ontology
            (EX + "part", RDF_TYPE, TRANSITIVE, "iri"),
            (EX + "whole", INVERSE_OF, EX + "part", "iri"),
            (EX + "near", RDF_TYPE, SYMMETRIC, "iri"),
            # chain a part b part c  → a part c; inverses all flipped
            (EX + "a", EX + "part", EX + "b", "iri"),
            (EX + "b", EX + "part", EX + "c", "iri"),
            # symmetric pair + a literal that must NOT flip
            (EX + "p", EX + "near", EX + "q", "iri"),
            (EX + "p", EX + "near", "close by", "literal"),
            # inverse declared the other way round still fires
            (EX + "x", EX + "whole", EX + "y", "iri"),
        ]
        g = spark.createDataFrame(rows, ["s", "p", "o", "o_kind"])
        out = {
            (r["s"], r["p"], r["o"])
            for r in owl_property_entailment(g).collect()
        }
        # prp-trp
        assert (EX + "a", EX + "part", EX + "c") in out
        # prp-inv over base AND closed triples, both directions
        assert (EX + "b", EX + "whole", EX + "a") in out
        assert (EX + "c", EX + "whole", EX + "a") in out
        assert (EX + "y", EX + "part", EX + "x") in out
        # prp-symp
        assert (EX + "q", EX + "near", EX + "p") in out
        # the literal object never becomes a subject
        assert not any(s == "close by" for s, _, _ in out)
        # inputs preserved
        assert (EX + "p", EX + "near", "close by") in out

    def test_inverse_of_transitive_property_closes(self, spark):
        """Triples asserted only on the INVERSE of a transitive
        property must still reach the closure: {p transitive,
        q = inverseOf(p), a q b, b q c} entails (c p a) and (a q c)."""
        from py_sema_spark.operators.inference import (
            INVERSE_OF,
            TRANSITIVE,
            owl_property_entailment,
        )

        rows = [
            (EX + "p", RDF_TYPE, TRANSITIVE, "iri"),
            (EX + "q", INVERSE_OF, EX + "p", "iri"),
            (EX + "a", EX + "q", EX + "b", "iri"),
            (EX + "b", EX + "q", EX + "c", "iri"),
        ]
        g = spark.createDataFrame(rows, ["s", "p", "o", "o_kind"])
        out = {
            (r["s"], r["p"], r["o"])
            for r in owl_property_entailment(g).collect()
        }
        assert (EX + "c", EX + "p", EX + "a") in out
        assert (EX + "a", EX + "q", EX + "c") in out
        # and the flipped base pairs themselves
        assert (EX + "b", EX + "p", EX + "a") in out

    def test_meta_modeling_object_guard(self, spark):
        """(X owl:inverseOf owl:SymmetricProperty) must NOT classify X
        as symmetric — classification requires the rdf:type predicate."""
        from py_sema_spark.operators.inference import (
            INVERSE_OF,
            SYMMETRIC,
            owl_property_entailment,
        )

        rows = [
            (EX + "x", INVERSE_OF, SYMMETRIC, "iri"),
            (EX + "s", EX + "x", EX + "o", "iri"),
        ]
        g = spark.createDataFrame(rows, ["s", "p", "o", "o_kind"])
        out = {
            (r["s"], r["p"], r["o"])
            for r in owl_property_entailment(g).collect()
        }
        # no symmetric flip of the x triple...
        assert (EX + "o", EX + "x", EX + "s") not in out
        # ...but the inverse pair (x, SymmetricProperty-as-IRI) DOES
        # flip the x triple onto the partner "property"
        assert (EX + "o", SYMMETRIC, EX + "s") in out
