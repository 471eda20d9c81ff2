"""SPARQL-endpoint store adapter (reference ``URIRDFStore``,
/root/reference/sema/commons/store/store.py:317-467).

The reference's production store is a remote SPARQL endpoint (GraphDB)
driven through rdflib's ``SPARQLStore``/``SPARQLUpdateStore``: ``select``
POSTs a query, ``insert`` POSTs ``INSERT DATA`` into a named graph, and
per-graph lastmod administration lives in the admin named graph
``urn:py-rdf-store:admin`` as ``schema:dateModified`` triples
(store.py:386-441).  This module reproduces that adapter shape over the
plain SPARQL 1.1 protocol (no rdflib in this environment):

- :class:`SparqlEndpointStore` — the store contract
  (``insert_for_key`` / ``select`` / ``keys`` / ``lastmod_ts`` /
  ``verify_max_age_of_key`` / ``drop_graph_for_key`` /
  ``forget_graph_for_key``) against ``read_uri``/``write_uri``.
- :class:`HttpSparqlTransport` — form-encoded POST via urllib
  (``query=`` → ``application/sparql-results+json``, ``update=``).
- :class:`InProcessSparqlEndpoint` — a transport test double that
  evaluates the posted queries/updates with this repo's own SPARQL
  compiler over an in-memory quads frame, the way the reference's
  contract tests run against an env-gated endpoint
  (/root/reference/tests/conftest.py:169-187) — here the endpoint is
  always available because it's in-process.

Scale notes: triple payloads are shipped as batched ``INSERT DATA``
requests.  With a picklable transport (``distributed_safe=True``, the
HTTP one) the POSTs happen per partition on the executors —
``batch_size`` bounds request size, and no triple ever passes through
the driver.  Admin-graph traffic is per-named-graph (dimension-sized)
and stays on the driver, matching the reference.  The bulk KG
materialization path remains the parquet/Iceberg store
(:mod:`.store`); this adapter is the serving/infra integration the
reference deploys against.
"""

from __future__ import annotations

import datetime as _dt
import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import TRIPLE_SCHEMA, GraphNameMapper
from .serialize import ntriples_lines

ADMIN_NAMED_GRAPH = "urn:py-rdf-store:admin"
SCHEMA_DATEMODIFIED = "https://schema.org/dateModified"
_XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
_SRJ = "application/sparql-results+json"


class EndpointError(RuntimeError):
    pass


class HttpSparqlTransport:
    """SPARQL 1.1 protocol over form-encoded POST (stateless, picklable
    → safe to ship to executors for per-partition inserts)."""

    distributed_safe = True

    def __init__(self, timeout: float = 60.0):
        self.timeout = timeout

    def request(
        self, url: str, fields: Dict[str, str], accept: str = _SRJ
    ) -> str:
        data = urllib.parse.urlencode(fields).encode("utf-8")
        req = urllib.request.Request(
            url,
            data=data,
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": accept,
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            # urlopen raises on 4xx/5xx rather than returning; normalize
            # to the module's error type so callers can catch one class
            raise EndpointError(f"{url}: HTTP {e.code}") from e
        except urllib.error.URLError as e:
            raise EndpointError(f"{url}: {e.reason}") from e


class SrjQueryResult:
    """SPARQL-results-JSON-backed result with the same conversion
    surface as :class:`.queries.source.QueryResult` (reference
    ``Result`` consumers use len / iteration / dict access)."""

    def __init__(self, srj: dict, query: str = ""):
        self.query = query
        self.raw = srj
        if "boolean" in srj:  # ASK
            self._cols = ["ask"]
            self._rows: List[dict] = [{"ask": bool(srj["boolean"])}]
        else:
            self._cols = list(srj.get("head", {}).get("vars", []))
            self._rows = [
                {v: _decode_binding(b.get(v)) for v in self._cols}
                for b in srj.get("results", {}).get("bindings", [])
            ]

    @property
    def columns(self) -> List[str]:
        return list(self._cols)

    def to_list(self) -> List[dict]:
        return [dict(r) for r in self._rows]

    def to_dict(self) -> dict:
        return {c: [r.get(c) for r in self._rows] for c in self._cols}

    def to_dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(self._rows, columns=self._cols)

    def as_csv(self, file_output_path: str, sep: str = ",") -> None:
        self.to_dataframe().to_csv(file_output_path, sep=sep, index=False)

    def __len__(self) -> int:
        return len(self._rows)


def _decode_binding(b: Optional[dict]) -> Any:
    if b is None:
        return None
    val = b.get("value")
    if b.get("type") != "literal" or val is None:
        return val
    dt = b.get("datatype", "")
    try:
        if dt.endswith(("#integer", "#long", "#int")):
            return int(val)
        if dt.endswith(("#double", "#decimal", "#float")):
            return float(val)
        if dt.endswith("#boolean"):
            return val == "true"
    except ValueError:
        pass
    return val


def _post_insert_batches(transport, write_uri, ng, batch_size):
    """Build the per-partition POST closure (module-level so the
    returned function pickles cleanly to executors)."""

    def _send(lines_iter) -> None:
        batch: List[str] = []
        for row in lines_iter:
            batch.append(row["line"])
            if len(batch) >= batch_size:
                _flush(batch)
                batch = []
        if batch:
            _flush(batch)

    def _flush(batch: List[str]) -> None:
        body = "\n".join(batch)
        transport.request(
            write_uri,
            {"update": f"INSERT DATA {{ GRAPH <{ng}> {{\n{body}\n}} }}"},
        )

    return _send


class SparqlEndpointStore:
    """Store contract against a (remote or stubbed) SPARQL endpoint.

    :param read_uri: query endpoint URL.
    :param write_uri: update endpoint URL; ``None`` → read-only, like
      the reference (store.py:329-344 ``allows_update``).
    :param transport: request transport; defaults to HTTP.  A
      transport with ``distributed_safe=True`` receives the insert
      POSTs on the executors (per partition); otherwise triples stream
      through the driver in ``batch_size`` chunks.
    """

    def __init__(
        self,
        spark: SparkSession,
        read_uri: str,
        write_uri: Optional[str] = None,
        *,
        mapper: Optional[GraphNameMapper] = None,
        transport=None,
        batch_size: int = 2000,
    ):
        self.spark = spark
        self.read_uri = read_uri
        self.write_uri = write_uri
        self.allows_update = write_uri is not None
        self.mapper = mapper or GraphNameMapper(base="urn:sync:")
        self.transport = transport or HttpSparqlTransport()
        self.batch_size = batch_size

    # ---- protocol plumbing ----

    def _query(
        self, sparql: str, named_graph: Optional[str] = None
    ) -> SrjQueryResult:
        fields = {"query": sparql}
        if named_graph is not None:
            fields["default-graph-uri"] = named_graph
        body = self.transport.request(self.read_uri, fields, accept=_SRJ)
        try:
            srj = json.loads(body)
        except json.JSONDecodeError as e:
            raise EndpointError(f"endpoint returned non-SRJ body: {e}") from e
        return SrjQueryResult(srj, query=sparql)

    def _require_update(self) -> None:
        if not self.allows_update:
            raise EndpointError(
                "data can not be inserted into a store if no write_uri "
                "is provided"  # reference store.py:389-391 wording
            )

    def _update(self, update_str: str) -> None:
        self._require_update()
        self.transport.request(self.write_uri, {"update": update_str})

    # ---- contract ----

    def select(
        self, sparql: str, named_graph: Optional[str] = None
    ) -> SrjQueryResult:
        return self._query(sparql, named_graph)

    def insert_for_key(self, triples: DataFrame, key: str) -> None:
        self._require_update()
        ng = self.mapper.key_to_ng(key)
        lines = ntriples_lines(
            triples.select(*[f.name for f in TRIPLE_SCHEMA.fields])
        )
        send = _post_insert_batches(
            self.transport, self.write_uri, ng, self.batch_size
        )
        if getattr(self.transport, "distributed_safe", False):
            lines.foreachPartition(send)
        else:
            send(iter(r.asDict() for r in lines.toLocalIterator()))
        self._touch(ng)

    def drop_graph_for_key(self, key: str) -> None:
        """DROP the graph's content; the lastmod trail stays in the
        admin graph (reference store.py:280-296: drop leaves the
        'update' trail — forget removes it)."""
        ng = self.mapper.key_to_ng(key)
        self._update(f"DROP SILENT GRAPH <{ng}>")
        self._touch(ng)

    def forget_graph_for_key(self, key: str) -> None:
        ng = self.mapper.key_to_ng(key)
        self._update(
            f"DELETE WHERE {{ GRAPH <{ADMIN_NAMED_GRAPH}> "
            f"{{ <{ng}> <{SCHEMA_DATEMODIFIED}> ?o }} }}"
        )

    @property
    def named_graphs(self) -> List[str]:
        res = self._query(
            f"SELECT ?g WHERE {{ ?g <{SCHEMA_DATEMODIFIED}> ?m }}",
            named_graph=ADMIN_NAMED_GRAPH,
        )
        return sorted(r["g"] for r in res.to_list() if r.get("g"))

    @property
    def keys(self) -> List[str]:
        base = self.mapper.base
        return [
            self.mapper.ng_to_key(ng)
            for ng in self.named_graphs
            if ng.startswith(base)
        ]

    def lastmod_ts(self, named_graph: str) -> Optional[_dt.datetime]:
        res = self._query(
            f"SELECT ?m WHERE {{ <{named_graph}> "
            f"<{SCHEMA_DATEMODIFIED}> ?m }}",
            named_graph=ADMIN_NAMED_GRAPH,
        )
        rows = res.to_list()
        if not rows or rows[0].get("m") is None:
            return None
        val = str(rows[0]["m"])
        try:
            return _dt.datetime.fromisoformat(val.replace("Z", "+00:00"))
        except ValueError:
            return None

    def verify_max_age_of_key(self, key: str, reference_time) -> bool:
        ts = self.lastmod_ts(self.mapper.key_to_ng(key))
        if ts is None:
            return False
        if isinstance(reference_time, (int, float)):
            reference_time = _dt.datetime.fromtimestamp(
                reference_time, tz=_dt.timezone.utc
            )
        if reference_time.tzinfo is None:
            reference_time = reference_time.replace(tzinfo=_dt.timezone.utc)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts >= reference_time

    # ---- admin graph ----

    def _touch(self, ng: str, ts: Optional[_dt.datetime] = None) -> None:
        """Replace the graph's dateModified entry (reference
        ``_update_registry_lastmod``, store.py:397-441)."""
        ts = ts or _dt.datetime.now(_dt.timezone.utc)
        lex = ts.isoformat()
        self._update(
            f"DELETE WHERE {{ GRAPH <{ADMIN_NAMED_GRAPH}> "
            f"{{ <{ng}> <{SCHEMA_DATEMODIFIED}> ?o }} }}"
        )
        self._update(
            f"INSERT DATA {{ GRAPH <{ADMIN_NAMED_GRAPH}> {{ "
            f'<{ng}> <{SCHEMA_DATEMODIFIED}> "{lex}"^^<{_XSD_DT}> }} }}'
        )


# --------------------------------------------------------------------
# in-process endpoint stub


_QUAD_SCHEMA = (
    "s string, p string, o string, o_kind string,"
    " o_datatype string, o_lang string, g string"
)

_IRI_LIKE = None  # compiled lazily


def _looks_iri(val: str) -> bool:
    global _IRI_LIKE
    if _IRI_LIKE is None:
        import re

        _IRI_LIKE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S+$")
    return bool(_IRI_LIKE.match(val)) and " " not in val


class InProcessSparqlEndpoint:
    """Transport double: a quads table + this repo's SPARQL compiler
    standing in for a remote endpoint.  NOT distributed_safe — state
    lives in the driver process, so the store routes inserts through
    the driver (exactly the batching code path under test).

    SRJ encoding is a stub approximation: result cells are typed by
    Python type, strings that look like absolute IRIs are encoded as
    ``uri`` bindings.
    """

    distributed_safe = False

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.quads = spark.createDataFrame([], _QUAD_SCHEMA)
        self.update_log: List[str] = []
        self.query_log: List[str] = []

    def request(
        self, url: str, fields: Dict[str, str], accept: str = _SRJ
    ) -> str:
        if "update" in fields:
            return self._do_update(fields["update"])
        return self._do_query(
            fields["query"], fields.get("default-graph-uri")
        )

    def _do_update(self, update_str: str) -> str:
        from .queries.update import apply_update

        self.update_log.append(update_str)
        new = apply_update(self.quads, update_str)
        # materialize eagerly: a real endpoint's state doesn't grow a
        # lazy plan chain per request
        rows = [tuple(r) for r in new.collect()]
        self.quads = self.spark.createDataFrame(rows, _QUAD_SCHEMA)
        return ""

    def _do_query(self, sparql: str, default_graph: Optional[str]) -> str:
        from .queries.bgp import sparql_query

        self.query_log.append(sparql)
        df = self.quads
        if default_graph is not None:
            df = df.where(F.col("g") == default_graph).drop("g")
        out = sparql_query(df, sparql)
        if out.columns == ["ask"]:
            return json.dumps({"boolean": bool(out.collect()[0]["ask"])})
        cols = list(out.columns)
        bindings = []
        for row in out.collect():
            b = {}
            for c in cols:
                v = row[c]
                if v is None:
                    continue
                if isinstance(v, bool):
                    b[c] = {
                        "type": "literal",
                        "value": "true" if v else "false",
                        "datatype": "http://www.w3.org/2001/XMLSchema#boolean",
                    }
                elif isinstance(v, int):
                    b[c] = {
                        "type": "literal",
                        "value": str(v),
                        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                    }
                elif isinstance(v, float):
                    b[c] = {
                        "type": "literal",
                        "value": repr(v),
                        "datatype": "http://www.w3.org/2001/XMLSchema#double",
                    }
                elif isinstance(v, str) and _looks_iri(v):
                    b[c] = {"type": "uri", "value": v}
                else:
                    b[c] = {"type": "literal", "value": str(v)}
            bindings.append(b)
        return json.dumps(
            {"head": {"vars": cols}, "results": {"bindings": bindings}}
        )
