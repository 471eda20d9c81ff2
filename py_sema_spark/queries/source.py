"""GraphSource / QueryResult facade — the reference's query-module
contract (`/root/reference/sema/query/query.py:24-345`) over Spark.

A reference user writes::

    source = GraphSource.build("a.ttl", "b.jsonld")
    result = source.query(sparql)
    result.to_dataframe() / to_list() / to_dict() / as_csv(path)

Here the same surface compiles to DataFrame plans: files are parsed by
the distributed extraction stage (one corpus row per file →
Arrow-batched multi-format parse, :func:`..serialize.aggregate_files`)
and ``query`` runs the :mod:`.bgp` SPARQL compiler. ``QueryResult``
stays lazy until a conversion is called — ``to_*`` collect to the
driver (the reference's results are driver-side pandas by contract;
for cluster-scale outputs use ``.df`` and write distributed).

The reference's third source kind — a live SPARQL endpoint
(`SPARQLGraphSource`, query.py:324-343) — is
:class:`SparqlEndpointGraphSource`: ``build`` dispatches a single
``http(s)://`` source to it, backed by the
:mod:`..endpoint_store` adapter (the sandbox has no network, so tests
inject the in-process stub endpoint as ``transport``; the default
HTTP transport is the deploy path). Mixing endpoint and file sources
raises, mirroring the reference's ``MultipleSourceTypes``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, Iterable, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class QueryResult:
    """Spark-backed result with the reference's conversion contract
    (DFBasedQueryResult, query.py:124-161)."""

    def __init__(self, df: DataFrame, query: str = ""):
        self.df = df
        self.query = query
        self._pdf: Optional[pd.DataFrame] = None

    def _collect(self) -> pd.DataFrame:
        if self._pdf is None:
            self._pdf = self.df.toPandas()
        return self._pdf

    def as_csv(self, file_output_path: str, sep: str = ",") -> None:
        self._collect().to_csv(file_output_path, sep=sep, index=False)

    def to_list(self) -> List:
        return self._collect().to_dict(orient="records")

    def to_dict(self) -> dict:
        return self._collect().to_dict(orient="list")

    def to_dataframe(self) -> pd.DataFrame:
        return self._collect().copy()

    def __len__(self) -> int:
        return len(self._collect())

    @property
    def columns(self) -> Iterable:
        return list(self.df.columns)


class GraphSource(ABC):
    """Abstract queryable graph; ``build`` dispatches like the
    reference's ``GraphSource.build`` (query.py:231-269)."""

    @abstractmethod
    def query(self, sparql: str) -> QueryResult: ...

    @staticmethod
    def build(
        *sources,
        spark: Optional[SparkSession] = None,
        prefixes: Optional[Dict[str, str]] = None,
        transport=None,
    ) -> "GraphSource":
        if not sources:
            raise ValueError("GraphSource.build needs at least one source")
        # type dispatch like the reference's build (query.py:231-269):
        # triples DataFrames → DataFrameGraphSource (MemoryGraphSource
        # analog), http(s) URL → SparqlEndpointGraphSource, strings →
        # file parse; anything else fails HERE with a clear message
        # instead of deep inside glob
        if all(isinstance(src, DataFrame) for src in sources):
            triples = sources[0]
            for d in sources[1:]:
                triples = triples.unionByName(
                    d, allowMissingColumns=True
                )
            if len(sources) > 1:
                triples = triples.dropDuplicates()
            return DataFrameGraphSource(triples, prefixes=prefixes)
        for src in sources:
            if not isinstance(src, str):
                raise TypeError(
                    "GraphSource.build sources must be all file paths "
                    "or all triples DataFrames; got "
                    f"{type(src).__name__}"
                )
        is_endpoint = [
            src.startswith(("http://", "https://")) for src in sources
        ]
        if any(is_endpoint):
            if not all(is_endpoint):
                # reference: MultipleSourceTypes (query.py:264-268)
                raise TypeError(
                    "cannot mix SPARQL endpoints and dump files in one "
                    "GraphSource"
                )
            if len(sources) > 1:
                raise TypeError(
                    "a SPARQL-endpoint GraphSource takes exactly one "
                    "endpoint URL"
                )
            return SparqlEndpointGraphSource(
                sources[0], spark=spark, transport=transport
            )
        return FileGraphSource(*sources, spark=spark, prefixes=prefixes)


class DataFrameGraphSource(GraphSource):
    """A triples/quads DataFrame (columns s,p,o,o_kind,o_datatype,
    o_lang[,g]) as a queryable graph — the MemoryGraphSource analog."""

    def __init__(
        self, triples: DataFrame, prefixes: Optional[Dict[str, str]] = None
    ):
        self.triples = triples
        self.prefixes = dict(prefixes or {})

    def query(self, sparql: str) -> QueryResult:
        from .bgp import sparql_query

        return QueryResult(
            sparql_query(self.triples, sparql, self.prefixes), query=sparql
        )


class SparqlEndpointGraphSource(GraphSource):
    """A live SPARQL endpoint as a queryable source — the reference's
    ``SPARQLGraphSource`` (query.py:324-343: each query builds a
    ``URIRDFStore`` on the endpoint URL and runs ``select``). Backed by
    :class:`..endpoint_store.SparqlEndpointStore`; the returned
    ``SrjQueryResult`` carries the same conversion surface as
    :class:`QueryResult` (to_list / to_dict / to_dataframe / as_csv /
    len / columns)."""

    def __init__(
        self,
        url: str,
        spark: Optional[SparkSession] = None,
        transport=None,
    ):
        from ..endpoint_store import SparqlEndpointStore

        self.endpoint = url
        self._store = SparqlEndpointStore(
            spark or SparkSession.active(), read_uri=url,
            transport=transport,
        )

    def query(self, sparql: str):
        return self._store.select(sparql)


class FileGraphSource(DataFrameGraphSource):
    """RDF dump files (any of the 7-format fallback chain) parsed into
    one deduplicated triples set by the distributed extraction stage."""

    def __init__(
        self,
        *paths: str,
        spark: Optional[SparkSession] = None,
        prefixes: Optional[Dict[str, str]] = None,
    ):
        from ..serialize import aggregate_files

        spark = spark or SparkSession.active()
        super().__init__(
            aggregate_files(spark, list(paths)), prefixes=prefixes
        )
