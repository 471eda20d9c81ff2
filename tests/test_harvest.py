"""Harvest engine tests — scenario shape mirrored from the reference's
localhost doc-chain fixtures (/root/reference/tests/harvest/
test_scenarios.py: config-driven assertions over a link-fanout corpus,
asserting which documents got dereferenced and what landed in the
store) with fresh fixture content, plus BGP-compiler unit tests."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.harvest import (
    HarvestConfig,
    Harvester,
    compile_ppath,
    ppath_split,
    report_triples,
    resolve_uri,
    verify_path,
)
from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.queries.bgp import bgp_select
from py_sema_spark.rdf.turtle import parse_turtle

EX = "http://ex.test/"
U = "https://h.test/"

DOCS = {
    f"{U}D1": f"""
@prefix ex: <{EX}> .
<{U}D1> ex:resource <{U}D2> , <{U}D3> ;
    ex:subset [ ex:id <{U}D5> ] ;
    ex:label "doc one" ;
    ex:name "one"@en , "eins"@de .
""",
    f"{U}D2": f"""
@prefix ex: <{EX}> .
<{U}D2> ex:next <{U}D4> ; ex:label "doc two" .
""",
    f"{U}D3": f"""
@prefix ex: <{EX}> .
<{U}D3> ex:label "doc three" .
""",
    f"{U}D4": f"""
@prefix ex: <{EX}> .
<{U}D4> ex:next <{U}D6> ; ex:label "doc four" .
""",
    f"{U}D5": f"""
@prefix ex: <{EX}> .
<{U}D5> ex:label "doc five" .
""",
    f"{U}D6": f"""
@prefix ex: <{EX}> .
<{U}D6> ex:label "doc six" .
""",
}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (url, None, body.encode("utf-8"), body, "en")
        for url, body in DOCS.items()
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).persist()


def downloads_of(report):
    return {
        r["url"]
        for r in report.where(F.col("kind") == "download").collect()
    }


class TestPathCompiler:
    def test_ppath_split(self):
        assert ppath_split("ex:a/ex:b") == ["ex:a", "ex:b"]
        assert ppath_split("<http://x/y>/ex:b") == ["http://x/y", "ex:b"]
        assert ppath_split("ex:a") == ["ex:a"]

    def test_resolve_uri(self):
        assert resolve_uri("ex:r", {"ex": EX}) == EX + "r"
        assert resolve_uri(f"<{EX}r>", {}) == EX + "r"
        assert resolve_uri("https://a.b/c", {}) == "https://a.b/c"
        with pytest.raises(ValueError):
            resolve_uri("nope:x", {})

    def test_compile(self):
        assert compile_ppath("ex:a/ex:b", {"ex": EX}) == [EX + "a", EX + "b"]
        assert compile_ppath("*", {}) == ["*"]


class TestBGP:
    @pytest.fixture(scope="class")
    def triples(self, spark):
        rows = []
        for url, body in DOCS.items():
            for t in parse_turtle(body, base=url):
                rows.append(
                    (t.s.value, t.p.value, t.o.value, t.o.kind,
                     t.o.datatype, t.o.lang)
                )
        return spark.createDataFrame(rows, TRIPLE_SCHEMA).persist()

    def test_simple_select(self, triples):
        out = bgp_select(
            triples,
            "SELECT ?s ?o WHERE { ?s ex:label ?o . }",
            {"ex": EX},
        )
        vals = {(r["s"], r["o"]) for r in out.collect()}
        assert (f"{U}D3", "doc three") in vals
        assert len(vals) == 6

    def test_join_and_distinct(self, triples):
        out = bgp_select(
            triples,
            "SELECT DISTINCT ?o WHERE { ?s ex:subset ?bn . ?bn ex:id ?o . }",
            {"ex": EX},
        )
        assert [r["o"] for r in out.collect()] == [f"{U}D5"]

    def test_literal_and_prefix_inline(self, triples):
        out = bgp_select(
            triples,
            f'PREFIX e: <{EX}>\nSELECT ?s WHERE {{ ?s e:label "doc two" . }}',
        )
        assert [r["s"] for r in out.collect()] == [f"{U}D2"]

    def test_optional_left_join(self, triples):
        out = bgp_select(
            triples,
            "SELECT ?s ?o ?id WHERE { ?s ex:label ?o . "
            "OPTIONAL { ?s ex:next ?id . } }",
            {"ex": EX},
        )
        rows = {r["s"]: r["id"] for r in out.collect()}
        assert len(rows) == 6
        assert rows[f"{U}D2"] == f"{U}D4"  # optional matched
        assert rows[f"{U}D3"] is None  # optional unmatched → null kept

    def test_filter_regex_and_eq(self, triples):
        out = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s ex:label ?o . '
            'FILTER(regex(str(?o), "THREE|four", "i")) }',
            {"ex": EX},
        )
        assert {r["s"] for r in out.collect()} == {f"{U}D3", f"{U}D4"}
        out2 = bgp_select(
            triples,
            'SELECT ?s WHERE { ?s ex:label ?o . FILTER(?o = "doc six") }',
            {"ex": EX},
        )
        assert [r["s"] for r in out2.collect()] == [f"{U}D6"]

    def test_filter_langmatches_and_order(self, triples):
        out = bgp_select(
            triples,
            'SELECT ?n WHERE { ?s ex:name ?n . '
            'FILTER(langMatches(lang(?n), "de")) } ORDER BY ?n',
            {"ex": EX},
        )
        assert [r["n"] for r in out.collect()] == ["eins"]
        out2 = bgp_select(
            triples,
            'SELECT ?n WHERE { ?s ex:name ?n . FILTER(lang(?n) = "en") }',
            {"ex": EX},
        )
        assert [r["n"] for r in out2.collect()] == ["one"]

    def test_limit_and_star(self, triples):
        out = bgp_select(
            triples, "SELECT * WHERE { ?s ex:next ?o . } LIMIT 1", {"ex": EX}
        )
        assert out.columns == ["s", "o"] and out.count() == 1

    def test_absolute_iri_terms(self, triples):
        """Dots inside <IRI> terms must not split patterns (ADVICE r01:
        hostnames contain dots) — bound-subject and bound-predicate
        full-IRI forms."""
        out = bgp_select(
            triples,
            f"SELECT ?o WHERE {{ <{U}D1> <{EX}label> ?o . }}",
        )
        assert [r["o"] for r in out.collect()] == ["doc one"]
        out2 = bgp_select(
            triples,
            f"SELECT ?s ?o WHERE {{ ?s <{EX}next> ?o . ?o ex:label ?l . }}",
            {"ex": EX},
        )
        assert out2.count() == 2

    def test_dotted_curie_local_and_literal(self, spark):
        """CURIE locals with dots (ex:v1.0) and dotted literals parse;
        the trailing statement dot still terminates."""
        rows = [
            (EX + "v1.0", EX + "label", "release 1.0", "literal", None, None),
        ]
        t = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        out = bgp_select(
            t, 'SELECT ?s WHERE { ?s ex:label "release 1.0" . }', {"ex": EX}
        )
        assert [r["s"] for r in out.collect()] == [EX + "v1.0"]
        out2 = bgp_select(
            t, "SELECT ?o WHERE { ex:v1.0 ex:label ?o . }", {"ex": EX}
        )
        assert [r["o"] for r in out2.collect()] == ["release 1.0"]


class TestHarvester:
    def test_single_hop(self, spark, corpus):
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 0
prefix:
  ex: {EX}
assert:
  - subjects:
      literal:
        - {U}D1
    paths:
      - "ex:resource"
""",
            name="t1",
        )
        store, report = Harvester(spark, corpus).run(cfg)
        # D1's own deref satisfies the path; the path-end nodes D2/D3
        # are then dereferenced too (reference parity:
        # path_assertion.py:258-272 harvests at the verified path end)
        assert downloads_of(report) == {f"{U}D1", f"{U}D2", f"{U}D3"}
        assert store.where(F.col("p") == EX + "resource").count() == 2
        assert store.select("g").distinct().collect()[0]["g"].endswith("t1")

    def test_multi_hop_traversal(self, spark, corpus):
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 0
prefix:
  ex: {EX}
assert:
  - subjects:
      literal:
        - {U}D2
    paths:
      - "ex:next/ex:next"
""",
            name="t2",
        )
        store, report = Harvester(spark, corpus).run(cfg)
        # D2 alone can't verify next/next → frontier deref of D4; on
        # success the path-end node D6 is dereferenced as well
        assert downloads_of(report) == {f"{U}D2", f"{U}D4", f"{U}D6"}
        asserts = report.where(F.col("kind") == "assertion").collect()
        assert all(a["success"] for a in asserts)
        subj = spark.createDataFrame([(f"{U}D2",)], "subject string")
        assert verify_path(store, subj, [EX + "next", EX + "next"]).count() == 1

    def test_sparql_subjects_and_star(self, spark, corpus):
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 0
prefix:
  ex: {EX}
assert:
  - subjects:
      literal:
        - {U}D1
    paths:
      - "*"
  - subjects:
      SPARQL: >
        SELECT DISTINCT ?o
        WHERE {{
            ?s ex:subset ?bn .
            ?bn ex:id ?o .
        }}
    paths:
      - "ex:label"
""",
            name="t3",
        )
        store, report = Harvester(spark, corpus).run(cfg)
        # task 1 derefs D1; task 2's SPARQL (against current store,
        # through skolemized bnodes) selects D5, whose deref satisfies
        # ex:label
        assert downloads_of(report) == {f"{U}D1", f"{U}D5"}
        labels = {
            r["o"]
            for r in store.where(F.col("p") == EX + "label").collect()
        }
        assert {"doc one", "doc five"} <= labels

    def test_unresolvable_path_fails_softly(self, spark, corpus):
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 0
prefix:
  ex: {EX}
assert:
  - subjects:
      literal:
        - {U}D3
    paths:
      - "ex:next/ex:next"
""",
            name="t4",
        )
        store, report = Harvester(spark, corpus).run(cfg)
        asserts = report.where(F.col("kind") == "assertion").collect()
        assert len(asserts) == 1 and asserts[0]["success"] is False

    def test_snooze_gate(self, spark, corpus, tmp_path):
        from py_sema_spark.model import GraphRegistry

        reg = GraphRegistry(spark, str(tmp_path / "reg.parquet"))
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 60
prefix:
  ex: {EX}
assert:
  - subjects:
      literal:
        - {U}D1
    paths:
      - "*"
""",
            name="t5",
        )
        h = Harvester(spark, corpus, registry=reg)
        store1, rep1 = h.run(cfg)
        assert downloads_of(rep1) == {f"{U}D1"}
        # second run inside the snooze window → skipped
        store2, rep2 = h.run(cfg)
        assert rep2.collect()[0]["kind"] == "snoozed"
        assert store2.drop("g").count() == 0

    def test_report_triples(self, spark, corpus):
        cfg = HarvestConfig.from_yaml(
            f"""
snooze-till-graph-age-minutes: 0
assert:
  - subjects:
      literal:
        - {U}D6
    paths:
      - "*"
""",
            name="t6",
        )
        store, report = Harvester(spark, corpus).run(cfg)
        rt = report_triples(report, "urn:g:t6").collect()
        assert len(rt) == 1
        assert rt[0]["p"] == "http://rdfs.org/ns/void#triples"
        assert rt[0]["g"].endswith("#execution-report")

    def test_config_validation(self):
        with pytest.raises(ValueError, match="snooze"):
            HarvestConfig.from_yaml("assert: []")
        with pytest.raises(ValueError, match="assert"):
            HarvestConfig.from_yaml("snooze-till-graph-age-minutes: 0")


class TestBGPUnion:
    def test_union_branches(self, spark):
        from py_sema_spark.model import TRIPLE_SCHEMA
        from py_sema_spark.rdf.turtle import parse_turtle

        rows = []
        for url, body in DOCS.items():
            for t in parse_turtle(body, base=url):
                rows.append(
                    (t.s.value, t.p.value, t.o.value, t.o.kind,
                     t.o.datatype, t.o.lang)
                )
        triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        out = bgp_select(
            triples,
            "SELECT DISTINCT ?x WHERE { "
            "{ ?s ex:resource ?x . } UNION { ?s ex:next ?x . } }",
            {"ex": EX},
        )
        got = {r["x"] for r in out.collect()}
        assert got == {f"{U}D2", f"{U}D3", f"{U}D4", f"{U}D6"}

    def test_union_joined_with_base(self, spark):
        from py_sema_spark.model import TRIPLE_SCHEMA
        from py_sema_spark.rdf.turtle import parse_turtle

        rows = []
        for url, body in DOCS.items():
            for t in parse_turtle(body, base=url):
                rows.append(
                    (t.s.value, t.p.value, t.o.value, t.o.kind,
                     t.o.datatype, t.o.lang)
                )
        triples = spark.createDataFrame(rows, TRIPLE_SCHEMA)
        # base pattern binds ?x's label; union supplies ?x two ways
        out = bgp_select(
            triples,
            "SELECT DISTINCT ?x ?l WHERE { "
            "{ ?a ex:resource ?x . } UNION { ?b ex:next ?x . } "
            "?x ex:label ?l . }",
            {"ex": EX},
        )
        got = dict((r["x"], r["l"]) for r in out.collect())
        assert got[f"{U}D4"] == "doc four" and len(got) == 4
