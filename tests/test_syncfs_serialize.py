"""Store / syncfs / serialization / task-registry tests, mirroring the
reference's sync semantics (service.py:140-171: add / update / remove /
skip by mtime) and its deterministic-serialization rules."""

import os
import time

import pytest
from pyspark.sql import functions as F

from py_sema_spark.serialize import (
    aggregate_files,
    ntriples_lines,
    unique_filename_col,
    write_ntriples,
)
from py_sema_spark.store import ParquetTripleStore
from py_sema_spark.syncfs import load_graph_file, perform_sync
from py_sema_spark.tasks import dispatch, run_sembench

TTL_A = """@prefix ex: <http://t.ex/> .
ex:a ex:p "one" ; ex:q <http://t.ex/b> .
"""
TTL_B = """@prefix ex: <http://t.ex/> .
ex:b ex:p "two"@en ; ex:n "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""


@pytest.fixture
def dump_dir(tmp_path):
    d = tmp_path / "dumps"
    d.mkdir()
    (d / "a.ttl").write_text(TTL_A)
    (d / "b.ttl").write_text(TTL_B)
    return d


class TestSync:
    def test_add_update_remove(self, spark, dump_dir, tmp_path):
        store = ParquetTripleStore(spark, str(tmp_path / "store"))
        rep = perform_sync(spark, str(dump_dir), store)
        assert rep["added"] == ["a.ttl", "b.ttl"]
        assert store.graph_for_key("a.ttl").count() == 2
        assert store.all_triples().count() == 4

        # unchanged → skip
        rep = perform_sync(spark, str(dump_dir), store)
        assert rep["skipped"] == ["a.ttl", "b.ttl"] and not rep["added"]

        # touch a.ttl into the future → update
        future = time.time() + 3600
        os.utime(dump_dir / "a.ttl", (future, future))
        rep = perform_sync(spark, str(dump_dir), store)
        assert rep["updated"] == ["a.ttl"]

        # delete b.ttl → remove
        (dump_dir / "b.ttl").unlink()
        rep = perform_sync(spark, str(dump_dir), store)
        assert rep["removed"] == ["b.ttl"]
        assert sorted(store.keys) == ["a.ttl"]
        assert store.all_triples().count() == 2

    def test_update_replaces_content(self, spark, dump_dir, tmp_path):
        store = ParquetTripleStore(spark, str(tmp_path / "store2"))
        perform_sync(spark, str(dump_dir), store)
        (dump_dir / "a.ttl").write_text(
            '@prefix ex: <http://t.ex/> .\nex:a ex:p "changed" .\n'
        )
        future = time.time() + 3600
        os.utime(dump_dir / "a.ttl", (future, future))
        perform_sync(spark, str(dump_dir), store)
        g = store.graph_for_key("a.ttl")
        assert g.count() == 1
        assert g.collect()[0]["o"] == "changed"


class TestSerialize:
    def test_ntriples_forms(self, spark, dump_dir):
        df = load_graph_file(spark, str(dump_dir / "b.ttl"))
        lines = {r["line"] for r in ntriples_lines(df).collect()}
        assert (
            '<http://t.ex/b> <http://t.ex/p> "two"@en .' in lines
        )
        assert (
            '<http://t.ex/b> <http://t.ex/n> '
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer> .' in lines
        )

    def test_ntriples_blank_nodes(self, spark):
        """Bnode subjects/objects serialize as _:label, not as
        <_:label> IRIs or quoted literals (round-3 review fix)."""
        df = spark.createDataFrame(
            [("_:b0", "urn:p", "_:b1", "bnode", None, None),
             ("_:b1", "urn:p", "lit", "literal", None, None)],
            "s string, p string, o string, o_kind string,"
            " o_datatype string, o_lang string",
        )
        lines = {r["line"] for r in ntriples_lines(df).collect()}
        assert lines == {
            "_:b0 <urn:p> _:b1 .",
            '_:b1 <urn:p> "lit" .',
        }

    def test_ntriples_escaping(self, spark):
        df = spark.createDataFrame(
            [("urn:s", "urn:p", 'he said "hi"\nback\\slash',
              "literal", None, None)],
            "s string, p string, o string, o_kind string,"
            " o_datatype string, o_lang string",
        )
        line = ntriples_lines(df).collect()[0]["line"]
        assert line == (
            '<urn:s> <urn:p> "he said \\"hi\\"\\nback\\\\slash" .'
        )

    def test_write_ntriples_deterministic(self, spark, dump_dir, tmp_path):
        df = load_graph_file(spark, str(dump_dir / "a.ttl"))
        out = str(tmp_path / "out.nt")
        write_ntriples(df, out)
        text = "".join(
            open(os.path.join(out, f)).read()
            for f in sorted(os.listdir(out))
            if f.startswith("part-")
        )
        assert text.splitlines() == sorted(text.splitlines())
        assert len(text.splitlines()) == 2

    def test_unique_filename(self, spark):
        # mirror of the reference's pure-python rule
        import base64
        from hashlib import sha256

        url = "https://host.org/data/set.ttl"
        mime = "text/turtle"
        expected_base = base64.urlsafe_b64encode(
            sha256((url + mime).encode()).digest()
        )[:13].decode()
        df = spark.createDataFrame([(url, mime)], "url string, mime string")
        got = df.select(
            unique_filename_col(F.col("url"), F.col("mime")).alias("f")
        ).collect()[0]["f"]
        assert got == f"{expected_base}-data-set.ttl"

    def test_aggregate_files(self, spark, dump_dir):
        triples = aggregate_files(spark, [str(dump_dir / "*.ttl")])
        assert triples.count() == 4


class TestTasks:
    def test_dispatch_unknown(self, spark):
        with pytest.raises(KeyError, match="unknown task type"):
            dispatch(spark, "nope", {})

    def test_sembench_subyt_and_aggregate(self, spark, dump_dir, tmp_path):
        src = tmp_path / "rec.csv"
        src.write_text("id,name\n1,x\n2,y\n")
        tpl = tmp_path / "t.ttl"
        tpl.write_text("<urn:r:{{ _['id'] }}> ex:n \"{{ _['name'] }}\" .\n")
        sink = tmp_path / "out.ttl"
        agg_sink = str(tmp_path / "agg.nt")
        res = run_sembench(
            spark,
            f"""
tasks:
  - id: gen
    type: subyt
    args:
      template: {tpl}
      source: {src}
      sink: {sink}
  - id: agg
    type: aggregate
    args:
      globs: ["{dump_dir}/*.ttl"]
      sink: {agg_sink}
""",
        )
        assert res["gen"] == str(sink)
        body = sink.read_text()
        assert '<urn:r:1> ex:n "x" .' in body and '<urn:r:2> ex:n "y" .' in body
        assert res["agg"].count() == 4

    def test_sembench_shacl(self, spark, tmp_path):
        shapes = tmp_path / "shape.ttl"
        shapes.write_text(
            """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://t.ex/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:n ; sh:datatype xsd:integer ] .
"""
        )
        good = tmp_path / "good.ttl"
        good.write_text(
            '@prefix ex: <http://t.ex/> .\n'
            '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
            'ex:i a ex:T ; ex:n "3"^^xsd:integer .\n'
        )
        bad = tmp_path / "bad.ttl"
        bad.write_text(
            '@prefix ex: <http://t.ex/> .\n'
            'ex:i a ex:T ; ex:n "three" .\n'
        )
        assert dispatch(
            spark, "shacl",
            {"shacl_graph": str(shapes), "data_graph": str(good)},
        )
        with pytest.raises(AssertionError):
            dispatch(
                spark, "shacl",
                {"shacl_graph": str(shapes), "data_graph": str(bad)},
            )

    def test_sembench_reference_shape(self, spark, dump_dir, tmp_path):
        """The reference's sembench.yaml mapping form (name -> {func,
        args}) with !resolve interpolation runs unchanged."""
        from py_sema_spark.tasks import run_sembench

        agg_sink = str(tmp_path / "ref_agg.nt")
        res = run_sembench(
            spark,
            f"""
collect_dumps:
  func: Aggregate
  args:
    globs: ["{dump_dir}/*.ttl"]
    sink: !resolve "{{out}}"
""",
            context={"out": agg_sink},
        )
        assert res["collect_dumps"].count() == 4
        import os

        assert os.path.isdir(agg_sink)


class TestTurtleJsonLdWriters:
    """S16 completion: Turtle + sorted-JSON-LD writers, gated by
    round-trips through our own (fixed-point-validated) parsers and
    by determinism checks (the reference's serialize path is
    discovery.py:277-287 + the OGM's sorted @graph,
    object_graph_mapper.py:62-64)."""

    @pytest.fixture(scope="class")
    def triples(self, spark):
        txt = """@prefix ex: <http://t.ex/> .
ex:a ex:p "one" , "two"@en ; ex:q <http://t.ex/b> ;
     ex:n "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
ex:b ex:p "line\\nbreak" ; ex:r ex:a .
"""
        from py_sema_spark.model import TRIPLE_SCHEMA
        from py_sema_spark.rdf.parse import parse_rdf_auto

        ts, _ = parse_rdf_auto(txt)
        rows = [
            (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
            for t in ts
        ]
        return spark.createDataFrame(rows, TRIPLE_SCHEMA).persist()

    def _as_set(self, df):
        return {
            (r["s"], r["p"], r["o"], r["o_kind"], r["o_datatype"], r["o_lang"])
            for r in df.collect()
        }

    def test_turtle_roundtrip(self, spark, triples):
        from py_sema_spark.model import TRIPLE_SCHEMA
        from py_sema_spark.rdf.parse import parse_rdf_auto
        from py_sema_spark.serialize import turtle_text

        text = turtle_text(triples)
        ts, fmt = parse_rdf_auto(text)
        assert fmt == "turtle"
        back = spark.createDataFrame(
            [
                (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype,
                 t.o.lang)
                for t in ts
            ],
            TRIPLE_SCHEMA,
        )
        assert self._as_set(back) == self._as_set(triples)

    def test_turtle_deterministic(self, triples):
        from py_sema_spark.serialize import turtle_text

        assert turtle_text(triples) == turtle_text(
            triples.orderBy(F.rand(7))
        )

    def test_jsonld_roundtrip_and_sorted(self, spark, triples):
        import json

        from py_sema_spark.model import TRIPLE_SCHEMA
        from py_sema_spark.rdf.parse import parse_rdf_auto
        from py_sema_spark.serialize import jsonld_document

        doc = jsonld_document(triples)
        parsed = json.loads(doc)  # valid JSON
        ids = [n["@id"] for n in parsed["@graph"]]
        assert ids == sorted(ids)  # deterministic @graph order
        ts, fmt = parse_rdf_auto(doc)
        assert fmt == "json-ld"
        back = spark.createDataFrame(
            [
                (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype,
                 t.o.lang)
                for t in ts
            ],
            TRIPLE_SCHEMA,
        )
        assert self._as_set(back) == self._as_set(triples)

    def test_write_turtle_files(self, spark, triples, tmp_path):
        from py_sema_spark.serialize import write_turtle

        out = tmp_path / "dump.ttl.d"
        write_turtle(triples, str(out))
        parts = sorted(out.glob("part-*"))
        text = "".join(p.read_text() for p in parts)
        assert text.count(" .") == 2  # one block per subject


class TestSerializeReviewFindings:
    """Round-3 review findings: single-segment filenames, NT tie-break
    ordering, mapper column-form guard, registry load error handling."""

    def test_unique_filename_single_segment_path(self, spark):
        import base64
        from hashlib import sha256

        url = "https://example.com/data.ttl"
        mime = "text/turtle"
        expected_base = base64.urlsafe_b64encode(
            sha256((url + mime).encode()).digest()
        )[:13].decode()
        df = spark.createDataFrame([(url, mime)], "url string, mime string")
        got = df.select(
            unique_filename_col(F.col("url"), F.col("mime")).alias("f")
        ).collect()[0]["f"]
        # reference keeps the lone segment (path.split('/')[-2:] on a
        # 1-element list); F.slice(-2,2) used to return [] here
        assert got == f"{expected_base}-data.ttl"

    def test_write_ntriples_lang_tie_break(self, spark, tmp_path):
        rows = [
            ("urn:s", "urn:p", "x", "literal", None, lang)
            for lang in ("fr", "en", "de")
        ]
        df = spark.createDataFrame(
            rows,
            "s string, p string, o string, o_kind string,"
            " o_datatype string, o_lang string",
        )
        out = str(tmp_path / "tie.nt")
        write_ntriples(df.repartition(3), out)
        text = "".join(
            open(os.path.join(out, f)).read()
            for f in sorted(os.listdir(out))
            if f.startswith("part-")
        )
        assert [ln.split("@")[-1].rstrip(" .") for ln in text.splitlines()] \
            == ["de", "en", "fr"]

    def test_key_to_ng_col_safe_and_unsafe(self, spark):
        from py_sema_spark.model import GraphNameMapper

        m = GraphNameMapper(base="urn:sync:")
        df = spark.createDataFrame([("a/b_c.txt",)], "k string")
        got = df.select(m.key_to_ng_col(F.col("k")).alias("ng")).collect()
        assert got[0]["ng"] == m.key_to_ng("a/b_c.txt")
        bad = spark.createDataFrame([("has space.txt",)], "k string")
        with pytest.raises(Exception, match="percent-encoding"):
            bad.select(m.key_to_ng_col(F.col("k")).alias("ng")).collect()

    def test_registry_load_propagates_corrupt_path(self, spark, tmp_path):
        from py_sema_spark.model import GraphRegistry

        path = tmp_path / "registry"
        path.mkdir()
        (path / "part-00000.parquet").write_text("this is not parquet")
        reg = GraphRegistry(spark, str(path))
        with pytest.raises(Exception):
            reg.load().collect()

    def test_registry_load_missing_path_is_empty(self, spark, tmp_path):
        from py_sema_spark.model import GraphRegistry

        reg = GraphRegistry(spark, str(tmp_path / "nope"))
        assert reg.load().count() == 0


class TestSyncCrashSafety:
    def test_update_with_unparseable_file_keeps_old_graph(
        self, spark, tmp_path
    ):
        import time

        from py_sema_spark.store import ParquetTripleStore
        from py_sema_spark.syncfs import perform_sync

        root = tmp_path / "dumps"
        root.mkdir()
        f = root / "g.ttl"
        f.write_text(
            "@prefix ex: <http://ex.org/> .\nex:a ex:p ex:b .\n",
            encoding="utf-8",
        )
        store = ParquetTripleStore(spark, str(tmp_path / "store"))
        perform_sync(spark, str(root), store)
        assert store.graph_for_key("g.ttl").count() == 1
        # simulate a mid-write replacement: newer mtime, unparseable
        time.sleep(0.05)
        f.write_text("@prefix ex: <http://ex.org/> .\nex:a ex:p ", encoding="utf-8")
        import os as _os

        _os.utime(f, (time.time() + 10, time.time() + 10))
        with pytest.raises(Exception):
            perform_sync(spark, str(root), store)
        # the old graph must still be in the store (drop happens only
        # after a successful parse)
        assert store.graph_for_key("g.ttl").count() == 1


class TestTasksReviewRegressions:
    def test_noniteration_sink_creates_parent_dir_utf8(self, spark, tmp_path):
        from py_sema_spark.tasks import dispatch

        tpl = tmp_path / "t.ttl"
        tpl.write_text(
            '<urn:c> ex:label "café {{ sets["xs"] | length }}" .\n',
            encoding="utf-8",
        )
        src = tmp_path / "xs.csv"
        src.write_text("id\n1\n2\n", encoding="utf-8")
        sink = tmp_path / "not" / "yet" / "out.ttl"
        got = dispatch(
            spark,
            "subyt",
            {
                "mode": "no-it",
                "template": str(tpl),
                "sets": {"xs": str(src)},
                "sink": str(sink),
            },
        )
        assert got == str(sink)
        body = sink.read_bytes().decode("utf-8")
        assert "café 2" in body

    def test_resolve_passes_through_unbalanced_brace(self, spark, tmp_path):
        import yaml

        from py_sema_spark.tasks import _resolving_loader

        doc = yaml.load(
            'frag: !resolve "{out_dir}/q{"\nok: !resolve "{out_dir}/a"\n',
            Loader=_resolving_loader({"out_dir": "/tmp/x"}),
        )
        assert doc["frag"] == "{out_dir}/q{"
        assert doc["ok"] == "/tmp/x/a"


class TestSerializeRound3bFindings:
    TS = ("s string, p string, o string, o_kind string, "
          "o_datatype string, o_lang string")

    def test_iri_with_forbidden_chars_escaped_as_uchar(self, spark):
        """IRIREF forbids spaces/angle brackets; a dirty extracted
        href must serialize as \\uXXXX escapes (term-preserving), not
        as an unparseable raw line."""
        df = spark.createDataFrame(
            [("http://x/a b", "urn:p", "http://y/<c>", "iri", None, None)],
            self.TS,
        )
        line = ntriples_lines(df).collect()[0]["line"]
        assert line == (
            "<http://x/a\\u0020b> <urn:p> "
            "<http://y/\\u003Cc\\u003E> ."
        )

    def test_unique_filename_survives_unparseable_url(self, spark):
        """java.net.URI rejects embedded spaces → parse_url NULL; the
        name must fall back to a regex path extract, never go NULL."""
        df = spark.createDataFrame(
            [("https://x.org/my file.ttl", "text/turtle")],
            "url string, mime string",
        )
        got = df.select(
            unique_filename_col(F.col("url"), F.col("mime")).alias("f")
        ).collect()[0]["f"]
        assert got is not None and got.endswith("-my file.ttl")

    def test_files_as_corpus_glob_metachar_filename(self, spark, tmp_path):
        """Hadoop treats load paths as globs: a file literally named
        with brackets must still load (paths are escaped)."""
        from py_sema_spark.serialize import files_as_corpus

        p = tmp_path / "report[2024].ttl"
        p.write_text('<urn:a> <urn:p> "v" .\n')
        corpus = files_as_corpus(spark, [str(tmp_path / "*.ttl")])
        assert corpus.count() == 1

    def test_aggregate_files_skolemizes_per_file_bnodes(
        self, spark, tmp_path
    ):
        """'_:b0' in two different files is two different nodes: the
        aggregator must not capture them into one (nor dedup away a
        second file's identical-looking bnode triple)."""
        (tmp_path / "f1.ttl").write_text(
            '_:b0 <urn:p> "Alice" .\n'
        )
        (tmp_path / "f2.ttl").write_text(
            '_:b0 <urn:p> "Alice" .\n'
        )
        out = aggregate_files(spark, [str(tmp_path / "*.ttl")])
        rows = out.collect()
        assert len(rows) == 2                       # no cross-file dedup
        assert len({r.s for r in rows}) == 2        # distinct skolem IRIs
        assert all(r.s.startswith("urn:skolem:") for r in rows)
