"""Named-graph triple store over parquet (SURVEY.md §1.2).

The reference's ``RDFStore`` contract
(/root/reference/sema/commons/store/store.py:81-314): named-graph
scoped insert/select, per-graph lastmod administration, drop/forget.
Here each named graph is one parquet subdirectory (the local stand-in
for an Iceberg table partitioned by ``g`` — insert = append to the
partition, drop = partition delete, i.e. ``DELETE WHERE g = …``), and
the admin graph is the :class:`..model.GraphRegistry` table.

Set semantics: every insert dedups against the graph's existing
triples (``graph += g`` dedups, store.py:500-502); skolemization
happens in extraction (:func:`..model.skolemize`), matching
``store_graph += graph.skolemize()`` (store.py:393).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import TRIPLE_SCHEMA, GraphNameMapper, GraphRegistry, dedup_triples


class ParquetTripleStore:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        mapper: Optional[GraphNameMapper] = None,
    ):
        self.spark = spark
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.mapper = mapper or GraphNameMapper(base="urn:sync:")
        self.registry = GraphRegistry(spark, str(self.workdir / "_registry"))

    # ---- paths ----

    def _graph_dir(self, key: str) -> Path:
        from urllib.parse import quote

        return self.workdir / ("g=" + quote(key, safe=""))

    def _stage_dir(self) -> str:
        """A unique staging dir OUTSIDE the graph-dir namespace.
        ``str(gdir) + '.tmp'`` collided with the real directory of key
        '<key>.tmp' (quote leaves '.' unescaped) — an insert of 'a'
        would overwrite and then delete graph 'a.tmp' — and a fixed
        suffix also races two concurrent writers of the same key."""
        import uuid

        return str(self.workdir / "_stage" / uuid.uuid4().hex)

    # ---- contract ----

    @property
    def keys(self) -> List[str]:
        return [
            self.mapper.ng_to_key(ng) for ng in self.registry.named_graphs()
        ]

    def insert_for_key(self, triples: DataFrame, key: str) -> None:
        ng = self.mapper.key_to_ng(key)
        gdir = self._graph_dir(key)
        incoming = triples.select(*[f.name for f in TRIPLE_SCHEMA.fields])
        if gdir.exists():
            existing = self.spark.read.schema(TRIPLE_SCHEMA).parquet(str(gdir))
            merged = dedup_triples(existing.unionByName(incoming))
        else:
            merged = dedup_triples(incoming)
        stage = self._stage_dir()
        merged.write.mode("overwrite").parquet(stage)
        self.spark.read.parquet(stage).write.mode(
            "overwrite"
        ).parquet(str(gdir))
        shutil.rmtree(stage, ignore_errors=True)
        self.registry.touch([ng])

    def drop_graph_for_key(self, key: str) -> None:
        gdir = self._graph_dir(key)
        if gdir.exists():
            shutil.rmtree(gdir)
        self.registry.drop(self.mapper.key_to_ng(key))

    def graph_for_key(self, key: str) -> DataFrame:
        gdir = self._graph_dir(key)
        if not gdir.exists():
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        return self.spark.read.schema(TRIPLE_SCHEMA).parquet(str(gdir))

    def all_triples(self) -> DataFrame:
        """Union view with the ``g`` column (named-graph scoping =
        partition pruning on a real Iceberg table)."""
        out = None
        for key in self.keys:
            df = self.graph_for_key(key).withColumn(
                "g", F.lit(self.mapper.key_to_ng(key))
            )
            out = df if out is None else out.unionByName(df)
        if out is None:
            out = self.spark.createDataFrame([], TRIPLE_SCHEMA).withColumn(
                "g", F.lit(None).cast("string")
            )
        return out

    def forget_graph_for_key(self, key: str) -> None:
        """Remove the graph from the admin registry WITHOUT deleting
        its triples (reference store.py:182-194 ``forget`` vs ``drop``
        distinction): the data stays on disk but the store no longer
        tracks or ages it."""
        self.registry.drop(self.mapper.key_to_ng(key))

    def select(self, sparql: str, named_graph: Optional[str] = None):
        """SPARQL SELECT over the store (reference store.py:196-222):
        scoped to one named graph when given, else the union view —
        which carries ``g``, so queries may also use ``GRAPH ?g { … }``
        blocks. ``ASK`` strings are accepted too (the reference probes
        stores with ``ask where {?s ?p [].}``, query.py:363-366).
        Returns a :class:`..queries.source.QueryResult`
        (Spark plan under the hood; conversions collect)."""
        from .queries.bgp import sparql_query
        from .queries.source import QueryResult

        triples = self.all_triples()
        if named_graph is not None:
            triples = triples.where(F.col("g") == named_graph)
        return QueryResult(sparql_query(triples, sparql), query=sparql)

    def update(
        self, update_str: str, named_graph: Optional[str] = None
    ) -> None:
        """SPARQL Update over the store (queries/update.py verbs).

        Scoped form applies to one named graph (GRAPH blocks inside
        DATA collapse into that graph). Unscoped form runs over the
        union quads view — GRAPH blocks address individual graphs —
        and rewrites every registered graph from ONE materialized
        result (the updated frame is checkpointed before the first
        overwrite, so later graphs don't observe earlier writes:
        spec §3 evaluates each op against the pre-op state)."""
        from .queries.update import apply_update

        cols = [f.name for f in TRIPLE_SCHEMA.fields]
        if named_graph is not None:
            key = self.mapper.ng_to_key(named_graph)
            # default_graph declares the frame's identity so
            # graph-targeted DELETE/CLEAR ops inside the request apply
            # only when they actually name THIS graph
            new = apply_update(
                self.graph_for_key(key), update_str,
                default_graph=named_graph,
            ).select(*cols)
            self._overwrite_graph(key, new)
            self.registry.touch([named_graph])
            return
        # unscoped: SPARQL's default graph is a real graph here (key
        # "default"); GRAPH blocks inside DATA address other graphs
        ng_default = self.mapper.key_to_ng("default")

        def _graph_sigs(df: DataFrame) -> dict:
            """Per-graph (row count, content hash-sum): one map-side
            aggregated pass, registry-sized result. decimal(38,0) sum
            can't overflow (ANSI mode) and is order-independent."""
            h = F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")
            rows = (
                df.groupBy("g")
                .agg(F.count("*").alias("n"), F.sum(h).alias("h"))
                .collect()
            )
            return {r["g"]: (r["n"], r["h"]) for r in rows}

        old_sigs = _graph_sigs(self.all_triples())
        new = apply_update(
            self.all_triples(), update_str, default_graph=ng_default
        ).localCheckpoint()
        new_sigs = _graph_sigs(new)
        present = {g for g in new_sigs if g is not None}
        registered = {self.mapper.key_to_ng(k) for k in self.keys}
        # rewrite + touch ONLY graphs whose content actually changed:
        # bumping lastmod on untouched graphs would make the age-based
        # syncfs re-harvest decision report stale graphs as fresh (and
        # rewriting them is wasted IO)
        changed = [
            ng
            for ng in sorted(present | registered)
            if old_sigs.get(ng) != new_sigs.get(ng)
        ]
        # validate BEFORE any write so a bad target can't abort the
        # loop half-overwritten
        foreign = [
            ng for ng in changed if not ng.startswith(self.mapper.base)
        ]
        if foreign:
            raise ValueError(
                f"update targets graphs outside this store's base "
                f"({self.mapper.base!r}): {foreign!r} — a parquet store "
                "hosts only graphs it can key; use the endpoint store "
                "for arbitrary named graphs"
            )
        for ng in changed:
            self._overwrite_graph(
                self.mapper.ng_to_key(ng),
                new.where(F.col("g") == ng).select(*cols),
            )
        if changed:
            self.registry.touch(changed)

    def _overwrite_graph(self, key: str, triples: DataFrame) -> None:
        """Two-step overwrite via a unique staging dir so a plan that
        reads the graph's own parquet can safely replace it (Iceberg:
        an atomic snapshot commit)."""
        gdir = self._graph_dir(key)
        stage = self._stage_dir()
        triples.write.mode("overwrite").parquet(stage)
        self.spark.read.parquet(stage).write.mode(
            "overwrite"
        ).parquet(str(gdir))
        shutil.rmtree(stage, ignore_errors=True)

    def verify_max_age_of_key(self, key: str, reference_time) -> bool:
        """True iff the graph is NOT older than the reference time
        (mirrors store.py:224-255 driving the syncfs update decision)."""
        import datetime as _dt

        ts = self.registry.lastmod_ts(self.mapper.key_to_ng(key))
        if ts is None:
            return False
        if isinstance(reference_time, (int, float)):
            reference_time = _dt.datetime.fromtimestamp(
                reference_time, _dt.timezone.utc
            )
        if reference_time.tzinfo is not None:
            # registry timestamps are naive UTC; normalize aware inputs
            # instead of raising a naive/aware comparison TypeError
            reference_time = reference_time.astimezone(
                _dt.timezone.utc
            ).replace(tzinfo=None)
        return ts >= reference_time
