"""Endpoint-store round-trip through the REAL HTTP transport
(r3 verdict ask #7).

The contract suite in test_endpoint_store.py wires the store to
``InProcessSparqlEndpoint`` directly, which bypasses urllib, the SRJ
body parse, and the executor-side partition batching. Here the same
in-process endpoint is wrapped in a stdlib ``http.server`` thread on
localhost — mirroring the reference's localhost fixture server
(/root/reference/tests/conftest.py:286-330) — and the store talks to
it through ``HttpSparqlTransport``:

- the urllib POST path (form encoding, Accept header, timeouts),
- the SRJ JSON parse (``_query`` / ``SrjQueryResult``),
- ``distributed_safe=True`` inserts: the INSERT DATA POSTs happen on
  executor threads via ``foreachPartition``, concurrently against the
  threading server,
- HTTP error mapping (500 → ``EndpointError``).
"""

import datetime as dt
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from py_sema_spark.endpoint_store import (
    EndpointError,
    HttpSparqlTransport,
    InProcessSparqlEndpoint,
    SparqlEndpointStore,
)

_TRIPLE_COLS = (
    "s string, p string, o string, o_kind string,"
    " o_datatype string, o_lang string"
)


def _rows():
    return [
        ("http://t.ex/a", "http://t.ex/p", "one", "literal", None, None),
        ("http://t.ex/a", "http://t.ex/q", "http://t.ex/b", "iri", None,
         None),
        ("http://t.ex/b", "http://t.ex/n", "5", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None),
    ]


class _SparqlHandler(BaseHTTPRequestHandler):
    endpoint = None  # set by the fixture
    lock = None  # serializes endpoint state like a real SPARQL server

    def do_POST(self):  # noqa: N802 (stdlib naming)
        n = int(self.headers.get("Content-Length", 0))
        fields = dict(urllib.parse.parse_qsl(self.rfile.read(n).decode()))
        if self.path == "/boom":
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b"deliberate failure")
            return
        try:
            # the ThreadingHTTPServer accepts the executor POSTs
            # concurrently (that concurrency is what's under test);
            # the ENDPOINT serializes state changes, as a real SPARQL
            # server's transaction layer does
            with self.lock:
                body = self.endpoint.request(
                    self.path, fields, self.headers.get("Accept", "")
                )
        except Exception as e:  # endpoint bug → a 500, not a hang
            self.send_response(500)
            self.end_headers()
            self.wfile.write(str(e).encode())
            return
        self.send_response(200)
        self.send_header(
            "Content-Type", "application/sparql-results+json"
        )
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture()
def http_endpoint(spark):
    ep = InProcessSparqlEndpoint(spark)
    handler = type(
        "Handler",
        (_SparqlHandler,),
        {"endpoint": ep, "lock": threading.Lock()},
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield ep, base
    finally:
        srv.shutdown()
        srv.server_close()


def _store(spark, base, **kw):
    return SparqlEndpointStore(
        spark,
        read_uri=f"{base}/query",
        write_uri=f"{base}/update",
        transport=HttpSparqlTransport(timeout=30.0),
        **kw,
    )


def test_insert_select_roundtrip_over_http(spark, http_endpoint):
    ep, base = http_endpoint
    store = _store(spark, base)
    triples = spark.createDataFrame(_rows(), _TRIPLE_COLS)
    # distributed_safe transport → the INSERT DATA batches POST from
    # executor threads (foreachPartition), not the driver
    assert store.transport.distributed_safe is True
    store.insert_for_key(triples.repartition(2), "k1")

    res = store.select(
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o }",
        named_graph=store.mapper.key_to_ng("k1"),
    )
    got = {(r["s"], r["p"], r["o"]) for r in res.to_list()}
    assert got == {
        ("http://t.ex/a", "http://t.ex/p", "one"),
        ("http://t.ex/a", "http://t.ex/q", "http://t.ex/b"),
        # engine convention: projected RDF terms are lexical strings
        ("http://t.ex/b", "http://t.ex/n", "5"),
    }
    # the real wire was exercised: endpoint saw INSERT DATA + SELECT
    assert any("INSERT DATA" in u for u in ep.update_log)
    assert any("SELECT" in q for q in ep.query_log)


def test_keys_lastmod_and_age_gate_over_http(spark, http_endpoint):
    _ep, base = http_endpoint
    store = _store(spark, base)
    triples = spark.createDataFrame(_rows(), _TRIPLE_COLS)
    store.insert_for_key(triples, "k1")
    assert store.keys == ["k1"]
    ts = store.lastmod_ts(store.mapper.key_to_ng("k1"))
    assert ts is not None
    now = dt.datetime.now(dt.timezone.utc)
    assert abs((now - ts).total_seconds()) < 120
    # modified-since gate: true against a reference time before the
    # insert, false against one after it
    assert store.verify_max_age_of_key(
        "k1", now - dt.timedelta(hours=1)
    ) is True
    assert store.verify_max_age_of_key(
        "k1", now + dt.timedelta(hours=1)
    ) is False


def test_drop_and_forget_over_http(spark, http_endpoint):
    _ep, base = http_endpoint
    store = _store(spark, base)
    triples = spark.createDataFrame(_rows(), _TRIPLE_COLS)
    store.insert_for_key(triples, "k1")
    ng = store.mapper.key_to_ng("k1")

    store.drop_graph_for_key("k1")
    assert len(store.select("SELECT ?s WHERE { ?s ?p ?o }", ng)) == 0
    # drop keeps the lastmod trail; forget removes it
    assert store.lastmod_ts(ng) is not None
    store.forget_graph_for_key("k1")
    assert store.lastmod_ts(ng) is None


def test_http_error_maps_to_endpoint_error(spark, http_endpoint):
    _ep, base = http_endpoint
    store = SparqlEndpointStore(
        spark,
        read_uri=f"{base}/boom",
        transport=HttpSparqlTransport(timeout=10.0),
    )
    with pytest.raises(EndpointError):
        store.select("SELECT ?s WHERE { ?s ?p ?o }")


def test_read_only_store_refuses_insert(spark, http_endpoint):
    _ep, base = http_endpoint
    store = SparqlEndpointStore(
        spark,
        read_uri=f"{base}/query",
        transport=HttpSparqlTransport(timeout=10.0),
    )
    triples = spark.createDataFrame(_rows(), _TRIPLE_COLS)
    with pytest.raises(EndpointError):
        store.insert_for_key(triples, "k1")
