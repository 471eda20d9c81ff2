"""Subyt templating tests — semantics mirrored from the reference's
golden-output strategy (/root/reference/sema/subyt/tests via
tests/subyt/test_generator.py:11-47): render small record sets through
templates exercising ctrl, sets, and every registered filter/function,
and compare exact strings (fresh fixtures, not copies)."""

import os

import pytest

from py_sema_spark.subyt import (
    GeneratorSettings,
    PatternedSink,
    SingleFileSink,
    SparkSubyt,
    make_source_df,
    render_collection,
)
from py_sema_spark.subyt.sources import collect_set


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", "2021-03-04"),
            (2, "beta", "2022-05-06"),
            (3, "gamma", "2023-07-08"),
        ],
        "id int, name string, seen string",
    )


def parts_list(df):
    return [r["part"] for r in df.orderBy("idx").collect()]


class TestIteration:
    def test_ctrl_and_filters(self, spark, records):
        template = (
            "{% if ctrl.isFirst %}# first\n{% endif %}"
            "<urn:x:{{ _['id'] }}> a ex:Thing ;\n"
            "  ex:name {{ _['name'] | xsd('xsd:string', '\"') }} ;\n"
            "  ex:seen {{ _['seen'] | xsd('xsd:date', '\"') }} ;\n"
            "  ex:pos {{ ctrl.index }} .\n"
            "{% if ctrl.isLast %}# last\n{% endif %}"
        )
        out = SparkSubyt(template, order_by=["id"]).process(records)
        parts = parts_list(out)
        assert len(parts) == 3
        assert parts[0].startswith("# first\n<urn:x:1>")
        assert 'ex:name "alpha"^^xsd:string ;' in parts[0]
        assert 'ex:seen "2021-03-04"^^xsd:date ;' in parts[0]
        assert "ex:pos 0 ." in parts[0]
        assert "ex:pos 1 ." in parts[1]
        assert "# first" not in parts[1]
        assert parts[2].rstrip().endswith("# last")

    def test_uri_filter_and_functions(self, spark, records):
        template = (
            "{{ ('https://example.org/x/' ~ _['name']) | uri }} "
            "{{ unite(_['name'], 'tag', sep='-') }} "
            "{{ unite(_['name'], '', fb='FB') }} "
            "{{ regexreplace('a', 'A', _['name']) }} "
            "{{ uritexpand('urn:t:{id}', _) }}\n"
        )
        out = SparkSubyt(template, order_by=["id"]).process(records)
        parts = parts_list(out)
        # unite joins str values only when ALL args are truthy
        # (j2_functions.py:426-451: '' is falsy → fallback)
        assert parts[0] == "<https://example.org/x/alpha> alpha-tag FB AlphA urn:t:1"
        assert parts[1] == "<https://example.org/x/beta> beta-tag FB betA urn:t:2"

    def test_map_valuemapper(self, spark, records):
        kinds = [
            {"key": "alpha", "val": "vowel"},
            {"key": "beta", "val": "consonant"},
            {"key": "gamma", "val": "consonant"},
        ]
        # reference ValueMapper.apply mutates the record in place
        # (j2_functions.py:396-423): apply(record, origin, target, fb)
        template = (
            "{% set m = map(sets['kinds'], 'key', 'val') %}"
            "{% set ignored = m.apply(_, 'name', 'kind', 'unknown') %}"
            "{{ _['name'] }}={{ _['kind'] }}\n"
        )
        out = SparkSubyt(
            template, order_by=["id"], sets={"kinds": kinds}
        ).process(records)
        assert parts_list(out) == [
            "alpha=vowel",
            "beta=consonant",
            "gamma=consonant",
        ]

    def test_variables_and_streams(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 1)], "grp string, n int"
        )
        template = "{{ prefix }}:{{ _['grp'] }}{{ _['n'] }}@{{ ctrl.index }};"
        out = SparkSubyt(
            template,
            order_by=["n"],
            stream_by=["grp"],
            variables={"prefix": "P"},
        ).process(df)
        parts = set(p["part"] for p in out.collect())
        # per-stream ctrl indexes restart at 0
        assert parts == {"P:a1@0;", "P:a2@1;", "P:b1@0;"}
        # …but the OUTPUT idx is a global total order (sinks rely on
        # it for deterministic concatenation / _N numbering) — per
        # round-3 review fix it must not collide across streams
        idxs = sorted(r["idx"] for r in out.collect())
        assert idxs == [0, 1, 2]

    def test_internal_ord_column_not_in_record(self, spark):
        """Sources attach _ord for deterministic ordering; it is
        plumbing, not record data — `_` must not contain it (round-3
        review fix)."""
        df = spark.createDataFrame(
            [(0, "x"), (1, "y")], "_ord long, name string"
        )
        template = "{{ _.keys() | list | sort | join(',') }};"
        out = SparkSubyt(template, order_by=["_ord"]).process(df)
        assert set(p["part"] for p in out.collect()) == {"name;"}


class TestCollection:
    def test_no_it_mode(self):
        sets = {
            "_": [{"n": "x"}, {"n": "y"}],
            "extra": [{"v": 1}],
        }
        template = (
            "items:{% for it in sets['_'] %} {{ it['n'] }}{% endfor %}"
            " extra={{ sets['extra'][0]['v'] }}"
            " first={{ ctrl.isFirst }} last={{ ctrl.isLast }}"
        )
        out = render_collection(
            template, sets, settings=GeneratorSettings("no-it")
        )
        assert out == "items: x y extra=1 first=True last=True"

    def test_settings_parsing(self):
        s = GeneratorSettings("no-it,ignorecase")
        assert s.iteration is False and s.ignorecase is True
        with pytest.raises(KeyError):
            GeneratorSettings("bogus")


class TestSinks:
    def test_single_file_sink(self, spark, records, tmp_path):
        out = SparkSubyt("{{ _['name'] }};", order_by=["id"]).process(records)
        path = str(tmp_path / "out.ttl")
        SingleFileSink(path).write(out)
        assert open(path).read() == "alpha;beta;gamma;"

    def test_patterned_sink(self, spark, records, tmp_path):
        out = SparkSubyt(
            "data for {{ _['name'] }}", order_by=["id"]
        ).process(records)
        sink = PatternedSink(str(tmp_path), "{name2}.ttl")
        written = sink.write(_with_cols(out, records))
        paths = sorted(r["path"] for r in written.collect())
        assert paths == ["alpha.ttl", "beta.ttl", "gamma.ttl"]
        assert open(tmp_path / "beta.ttl").read() == "data for beta"

    def test_patterned_dup_policy(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(0, "p1", "same"), (1, "p2", "same")],
            "idx long, part string, key string",
        )
        sink = PatternedSink(str(tmp_path), "{key}.ttl")
        with pytest.raises(ValueError, match="duplicate sink path"):
            sink.write(df)
        sink2 = PatternedSink(str(tmp_path), "{key}.ttl", allow_repeated=True)
        written = sink2.write(df)
        # reference numbering: 2nd occurrence = <path>_0, appended
        # after the extension (reference sinks.py:185-187)
        assert sorted(r["path"] for r in written.collect()) == [
            "same.ttl",
            "same.ttl_0",
        ]


def _with_cols(parts, records):
    """Attach record columns to rendered parts by ctrl order (test
    helper: records ordered by id == parts ordered by idx)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("id")
    keyed = records.withColumn("idx", F.row_number().over(w) - 1)
    return parts.join(keyed.select("idx", F.col("name").alias("name2")), "idx")


class TestSources:
    def test_csv_source(self, spark, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("# comment\nid,name\n1,a\n2,b\n")
        df = make_source_df(spark, str(p))
        rows = collect_set(df)
        assert rows == [{"id": "1", "name": "a"}, {"id": "2", "name": "b"}]

    def test_csv_explicit_header(self, spark, tmp_path):
        p = tmp_path / "h.csv"
        p.write_text("1;x\n2;y\n")
        df = make_source_df(
            spark, str(p), delimiter=";", header=["id", "name"]
        )
        assert collect_set(df) == [
            {"id": "1", "name": "x"},
            {"id": "2", "name": "y"},
        ]

    def test_json_unwrap(self, spark, tmp_path):
        p = tmp_path / "w.json"
        p.write_text('{"wrapper": {"inner": [{"a": 1}, {"a": 2}]}}')
        df = make_source_df(spark, str(p))
        assert [r["a"] for r in collect_set(df)] == [1, 2]

    def test_xml_source(self, spark, tmp_path):
        p = tmp_path / "r.xml"
        p.write_text(
            "<root><item><id>1</id><name>a</name></item>"
            "<item><id>2</id><name>b</name></item></root>"
        )
        df = make_source_df(spark, str(p))
        assert collect_set(df) == [
            {"id": "1", "name": "a"},
            {"id": "2", "name": "b"},
        ]

    def test_folder_and_glob(self, spark, tmp_path):
        (tmp_path / "a.csv").write_text("n\n1\n2\n")
        (tmp_path / "b.csv").write_text("n\n3\n")
        df = make_source_df(spark, str(tmp_path))
        assert [r["n"] for r in collect_set(df)] == ["1", "2", "3"]
        df2 = make_source_df(spark, str(tmp_path / "*.csv"))
        assert [r["n"] for r in collect_set(df2)] == ["1", "2", "3"]

    def test_concat_ord_contiguous_across_partitioned_files(
        self, spark, tmp_path
    ):
        """ADVICE r01: per-file _ord from monotonically_increasing_id
        jumps by 2^33 between scan partitions; the concat offset must
        use dense per-file positions or later files sort into earlier
        ones. A file large enough to scan as multiple partitions keeps
        global order file-by-file."""
        big = "n\n" + "\n".join(str(i) for i in range(2000))
        (tmp_path / "a.csv").write_text(big)
        (tmp_path / "b.csv").write_text("n\n9998\n9999\n")
        df = make_source_df(spark, str(tmp_path))
        vals = [r["n"] for r in collect_set(df)]
        assert len(vals) == 2002
        assert vals[:3] == ["0", "1", "2"]
        assert vals[-2:] == ["9998", "9999"]
        ords = [r["_ord"] for r in df.orderBy("_ord").select("_ord").collect()]
        assert ords == list(range(2002))


class TestGapFillers:
    def test_extra_filters_and_functions(self, spark, records):
        from py_sema_spark.subyt.engine import build_env

        env = build_env(
            extra_filters={"shout": lambda s: str(s).upper()},
            extra_functions={"double": lambda x: x * 2},
        )
        out = env.from_string(
            "{{ 'abc' | shout }} {{ double(21) }} {{ 'x' | xsd('xsd:string') }}"
        ).render()
        assert out == "ABC 42 'x'^^xsd:string"

    def test_needs_regeneration(self, tmp_path):
        import os
        import time

        from py_sema_spark.subyt.engine import needs_regeneration

        src = tmp_path / "src.csv"
        src.write_text("a\n1\n")
        sink = tmp_path / "out.ttl"
        assert needs_regeneration([str(src)], [str(sink)])  # sink missing
        sink.write_text("done")
        future = time.time() + 60
        os.utime(sink, (future, future))
        assert not needs_regeneration([str(src)], [str(sink)])  # sink newer
        os.utime(src, (future + 60, future + 60))
        assert needs_regeneration([str(src)], [str(sink)])  # src newer

    def test_format_maps(self):
        from py_sema_spark.rdf.formats import (
            MIME_TO_FORMAT,
            format_for_suffix,
        )

        assert format_for_suffix("x/y.ttl") == "turtle"
        assert format_for_suffix("a.jsonld") == "json-ld"
        assert MIME_TO_FORMAT["application/ld+json"] == "json-ld"

    def test_write_csv(self, spark, records, tmp_path):
        import os

        from py_sema_spark.serialize import write_csv

        out = str(tmp_path / "res")
        write_csv(records, out, sep="\t")
        body = "".join(
            open(os.path.join(out, f)).read()
            for f in sorted(os.listdir(out))
            if f.startswith("part-")
        )
        assert "id\tname\tseen" in body and "1\talpha\t2021-03-04" in body
