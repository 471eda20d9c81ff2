"""SPARQL-endpoint store adapter contract tests.

Mirrors the reference's store contract suite
(/root/reference/tests/commons/store/test_basics.py), which runs the
same assertions against MemoryRDFStore and an env-gated URIRDFStore
(tests/conftest.py:169-187).  Here the endpoint is an in-process stub
(:class:`py_sema_spark.endpoint_store.InProcessSparqlEndpoint`), so the
endpoint leg always runs; the parquet store is the other leg.
"""

import time

import pytest

from py_sema_spark.endpoint_store import (
    EndpointError,
    InProcessSparqlEndpoint,
    SparqlEndpointStore,
    SrjQueryResult,
)
from py_sema_spark.model import GraphNameMapper
from py_sema_spark.store import ParquetTripleStore

SELECT_ALL_SPO = "SELECT ?s ?p ?o WHERE { ?s ?p ?o }"

_TRIPLE_COLS = (
    "s string, p string, o string, o_kind string,"
    " o_datatype string, o_lang string"
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, _TRIPLE_COLS)


def _rows_a():
    return [
        ("http://t.ex/a", "http://t.ex/p", "one", "literal", None, None),
        ("http://t.ex/a", "http://t.ex/q", "http://t.ex/b", "iri", None, None),
    ]


def _rows_b():
    return [
        ("http://t.ex/b", "http://t.ex/p", "two", "literal", None, "en"),
        (
            "http://t.ex/b", "http://t.ex/n", "5", "literal",
            "http://www.w3.org/2001/XMLSchema#integer", None,
        ),
        ("http://t.ex/b", "http://t.ex/r", "http://t.ex/a", "iri", None, None),
    ]


@pytest.fixture(params=["parquet", "endpoint"])
def store(request, spark, tmp_path):
    if request.param == "parquet":
        return ParquetTripleStore(spark, str(tmp_path / "pstore"))
    ep = InProcessSparqlEndpoint(spark)
    s = SparqlEndpointStore(
        spark,
        "http://stub.local/sparql",
        "http://stub.local/sparql/update",
        mapper=GraphNameMapper(base="urn:sync:"),
        transport=ep,
        batch_size=1000,
    )
    s._stub = ep  # test hook
    return s


def _select_count(store, key):
    ng = store.mapper.key_to_ng(key)
    return len(store.select(SELECT_ALL_SPO, ng))


class TestStoreContract:
    def test_insert_select_keys(self, store, spark):
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        store.insert_for_key(_triples(spark, _rows_b()), "b.ttl")
        assert _select_count(store, "a.ttl") == 2
        assert _select_count(store, "b.ttl") == 3
        assert sorted(store.keys) == ["a.ttl", "b.ttl"]

    def test_insert_is_set_semantics(self, store, spark):
        store.insert_for_key(_triples(spark, _rows_a()), "k")
        store.insert_for_key(_triples(spark, _rows_a()), "k")
        assert _select_count(store, "k") == 2

    def test_typed_literals_round_trip(self, store, spark):
        store.insert_for_key(_triples(spark, _rows_b()), "b.ttl")
        ng = store.mapper.key_to_ng("b.ttl")
        res = store.select(
            "SELECT ?o WHERE { ?s <http://t.ex/n> ?o }", ng
        )
        vals = [r["o"] for r in res.to_list()]
        assert vals in ([5], ["5"])  # int via SRJ decode; str via Spark term

    def test_verify_max_age(self, store, spark):
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        assert store.verify_max_age_of_key("a.ttl", time.time() - 3600)
        assert not store.verify_max_age_of_key("a.ttl", time.time() + 3600)
        assert not store.verify_max_age_of_key("never-inserted", time.time())

    def test_drop_graph_empties_content(self, store, spark):
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        store.drop_graph_for_key("a.ttl")
        assert _select_count(store, "a.ttl") == 0


class TestEndpointSpecifics:
    @pytest.fixture
    def ep_store(self, spark):
        ep = InProcessSparqlEndpoint(spark)
        s = SparqlEndpointStore(
            spark,
            "http://stub.local/sparql",
            "http://stub.local/sparql/update",
            mapper=GraphNameMapper(base="urn:sync:"),
            transport=ep,
            batch_size=1000,
        )
        return s, ep

    def test_drop_leaves_lastmod_trail(self, ep_store, spark):
        # reference store.py:280-296: drop keeps the admin 'update'
        # trail; forget removes it
        store, ep = ep_store
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        store.drop_graph_for_key("a.ttl")
        assert store.keys == ["a.ttl"]
        assert store.lastmod_ts(store.mapper.key_to_ng("a.ttl")) is not None
        store.forget_graph_for_key("a.ttl")
        assert store.keys == []

    def test_forget_keeps_content(self, ep_store, spark):
        store, ep = ep_store
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        store.forget_graph_for_key("a.ttl")
        assert store.keys == []
        assert _select_count(store, "a.ttl") == 2

    def test_insert_batching(self, ep_store, spark):
        store, ep = ep_store
        store.batch_size = 3
        rows = [
            (f"http://t.ex/s{i}", "http://t.ex/p", f"v{i}",
             "literal", None, None)
            for i in range(10)
        ]
        store.insert_for_key(_triples(spark, rows), "big")
        ng = store.mapper.key_to_ng("big")
        data_posts = [
            u for u in ep.update_log
            if u.startswith("INSERT DATA") and f"GRAPH <{ng}>" in u
        ]
        assert len(data_posts) == 4  # ceil(10/3)
        assert _select_count(store, "big") == 10

    def test_ask_query(self, ep_store, spark):
        store, ep = ep_store
        store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")
        ng = store.mapper.key_to_ng("a.ttl")
        res = store.select("ASK WHERE { ?s ?p ?o }", ng)
        assert isinstance(res, SrjQueryResult)
        assert res.to_list() == [{"ask": True}]

    def test_read_only_rejects_update(self, spark):
        ep = InProcessSparqlEndpoint(spark)
        store = SparqlEndpointStore(
            spark, "http://stub.local/sparql", None, transport=ep
        )
        with pytest.raises(EndpointError):
            store.insert_for_key(_triples(spark, _rows_a()), "a.ttl")

    def test_result_conversions(self, ep_store, spark):
        store, ep = ep_store
        store.insert_for_key(_triples(spark, _rows_b()), "b.ttl")
        ng = store.mapper.key_to_ng("b.ttl")
        res = store.select(SELECT_ALL_SPO, ng)
        assert res.columns == ["s", "p", "o"]
        assert len(res) == 3
        pdf = res.to_dataframe()
        assert list(pdf.columns) == ["s", "p", "o"] and len(pdf) == 3
        d = res.to_dict()
        assert set(d) == {"s", "p", "o"}
