"""Conneg variant-set semantics vs the reference's own test vectors
(/root/reference/tests/commons/web/test_conneg.py variant parsing;
conneg.py FoundVariants set rules)."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.functions.conneg import (
    FoundVariants,
    conneg_audit,
    detect_variants,
    parse_request_variants,
    variants_query,
)


@pytest.mark.parametrize(
    "variant_str, expected",
    (
        # verbatim reference vectors (test_conneg.py:8-23)
        (None, []),
        ("", []),
        ("mt", [("mt", "")]),
        ("mt;pr", [("mt", "pr")]),
        ("m1;p1,m2,m3;p3", [("m1", "p1"), ("m2", ""), ("m3", "p3")]),
        ("m1,m2,m3", [("m1", ""), ("m2", ""), ("m3", "")]),
        ("m1,m2;p2,m3", [("m1", ""), ("m2", "p2"), ("m3", "")]),
    ),
)
def test_variant_parsing(variant_str, expected):
    assert parse_request_variants(variant_str) == expected


class TestFoundVariants:
    def test_success_requires_exact_set_and_200(self):
        fv = FoundVariants([("text/html", ""), ("text/turtle", "p")])
        fv.set_detected([("text/turtle", "p"), ("application/json", "")])
        for key in fv.expected:
            fv.add_variant(mime_type=key[0], profile=key[1], status=200)
        assert fv.success and fv.missing == set()

        # a non-200 breaks success
        fv2 = FoundVariants([("text/html", "")])
        fv2.add_variant(mime_type="text/html", profile="", status=404)
        assert not fv2.success

        # a missing expected variant breaks success
        fv3 = FoundVariants([("text/html", ""), ("text/turtle", "")])
        fv3.add_variant(mime_type="text/html", profile="", status=200)
        assert not fv3.success
        assert fv3.missing == {("text/turtle", "")}

    def test_duplicate_variant_rejected(self):
        fv = FoundVariants()
        fv.add_variant(mime_type="m", profile="p", status=200)
        with pytest.raises(AssertionError):
            fv.add_variant(mime_type="m", profile="p", status=200)

    def test_as_csv_shape(self):
        fv = FoundVariants([("text/html", "")])
        fv.add_variant(
            mime_type="text/html", profile="", status=200,
            response_mime="text/html", filename=None,
        )
        csv = fv.as_csv("http://x")
        lines = csv.strip().split("\n")
        # reference outfields order (conneg.py:92-100) with url prefix
        assert lines[0] == (
            "url,mime_type,profile,inRequested,inDetected,"
            "status,match_mime,filename"
        )
        assert lines[1] == "http://x,text/html,,True,False,200,True,None"


def test_detect_variants_altr_query(spark):
    """The altr detection SPARQL over a parsed alternate-
    representations document (reference conneg.py:199-220)."""
    from py_sema_spark.model import TRIPLE_SCHEMA
    from py_sema_spark.rdf.parse import parse_rdf_auto

    ttl = """
    @prefix altr: <http://www.w3.org/ns/dx/conneg/altr#> .
    @prefix dct: <http://purl.org/dc/terms/> .
    <http://r/1> altr:hasRepresentation <http://r/1#html>, <http://r/1#ttl> .
    <http://r/1#html> a altr:Representation ;
        dct:format "text/html" ;
        dct:conformsTo "https://p/default" .
    <http://r/1#ttl> a altr:Representation ;
        dct:format "text/turtle" .
    <http://r/2> altr:hasRepresentation <http://r/2#x> .
    <http://r/2#x> a altr:Representation ; dct:format "text/xml" .
    """
    ts, _fmt = parse_rdf_auto(ttl)
    df = spark.createDataFrame(
        [
            (t.s.value, t.p.value, t.o.value, t.o.kind,
             t.o.datatype, t.o.lang)
            for t in ts
        ],
        TRIPLE_SCHEMA,
    )
    got = set(detect_variants(df, "http://r/1"))
    assert got == {
        ("text/html", "https://p/default"),
        ("text/turtle", ""),  # OPTIONAL profile → empty, like the ref
    }
    assert set(detect_variants(df, "http://r/2")) == {("text/xml", "")}
    assert "altr:hasRepresentation" in variants_query("http://r/1")


class TestConnegAudit:
    def test_set_difference_flags(self, spark):
        found = spark.createDataFrame(
            [
                ("u1", "text/html", "", 200),
                ("u1", "text/turtle", "p", 200),
                ("u1", "application/zip", "", 200),  # found, unexpected
                ("u2", "text/html", "", 404),  # found, broken
            ],
            "url string, mime_type string, profile string, status int",
        )
        detected = spark.createDataFrame(
            [("u1", "text/turtle", "p")],
            "url string, mime_type string, profile string",
        )
        out = conneg_audit(
            found, [("text/html", "")], detected
        ).collect()
        rows = {(r["url"], r["mime_type"], r["profile"]): r for r in out}

        r = rows[("u1", "text/html", "")]
        assert r["in_requested"] and not r["in_detected"] and r["found"]
        r = rows[("u1", "text/turtle", "p")]
        assert r["in_detected"] and not r["in_requested"] and r["found"]
        r = rows[("u1", "application/zip", "")]
        assert r["found"] and not (r["in_requested"] or r["in_detected"])
        # u1 fails the equality rule (unexpected extra variant)
        assert not rows[("u1", "text/html", "")]["url_success"]
        # u2: requested found but 404 → fail
        assert not rows[("u2", "text/html", "")]["url_success"]

    def test_success_url(self, spark):
        found = spark.createDataFrame(
            [("u", "text/html", "", 200), ("u", "text/turtle", "", 200)],
            "url string, mime_type string, profile string, status int",
        )
        detected = spark.createDataFrame(
            [("u", "text/turtle", "")],
            "url string, mime_type string, profile string",
        )
        out = conneg_audit(found, [("text/html", "")], detected)
        assert all(r["url_success"] for r in out.collect())

    def test_missing_expected_row_materializes(self, spark):
        found = spark.createDataFrame(
            [("u", "text/html", "", 200)],
            "url string, mime_type string, profile string, status int",
        )
        out = conneg_audit(
            found, [("text/html", ""), ("text/turtle", "")], None
        ).collect()
        missing = [r for r in out if not r["found"]]
        assert [(r["mime_type"], r["profile"]) for r in missing] == [
            ("text/turtle", "")
        ]
        assert not missing[0]["url_success"]


class TestConnegCli:
    """python -m py_sema_spark conneg — the sema-conneg analog
    (conneg_cli.py): requested variants + altr dump + found CSV →
    FoundVariants CSV + summary; exit 0 iff any variant found."""

    ALTR = """
@prefix altr: <http://www.w3.org/ns/dx/conneg/altr#> .
@prefix dct: <http://purl.org/dc/terms/> .
<http://r/1> altr:hasRepresentation <http://r/1#html> .
<http://r/1#html> a altr:Representation ; dct:format "text/html" .
"""

    def run(self, tmp_path, capsys, found_rows, output=None):
        import json as _json

        from py_sema_spark.cli import main

        altr = tmp_path / "altr.ttl"
        altr.write_text(self.ALTR)
        found = tmp_path / "found.csv"
        found.write_text(
            "mime_type,profile,status,response_mime\n"
            + "".join(f"{r}\n" for r in found_rows)
        )
        argv = [
            "conneg", "http://r/1",
            "-v", "text/turtle;https://p/x",
            "--altr", str(altr), "--found", str(found),
        ]
        if output:
            argv += ["-o", str(output)]
        rc = main(argv)
        cap = capsys.readouterr().out
        return rc, cap, _json

    def test_success_set(self, spark, tmp_path, capsys):
        out = tmp_path / "res.csv"
        rc, cap, _json = self.run(
            tmp_path, capsys,
            [
                "text/turtle,https://p/x,200,text/turtle",
                "text/html,,200,text/html",
            ],
            output=out,
        )
        assert rc == 0
        summary = _json.loads(cap.strip().splitlines()[-1])
        assert summary["success"] is True and summary["missing"] == []
        text = out.read_text()
        assert text.splitlines()[0].startswith("url,mime_type,profile")
        assert "text/turtle" in text and "text/html" in text

    def test_missing_detected_variant(self, spark, tmp_path, capsys):
        out = tmp_path / "res.csv"
        rc, cap, _json = self.run(
            tmp_path, capsys,
            ["text/turtle,https://p/x,200,text/turtle"],
            output=out,
        )
        assert rc == 0  # something found — but not successful
        summary = _json.loads(cap.strip().splitlines()[-1])
        assert summary["success"] is False
        assert summary["missing"] == [["text/html", ""]]

    def test_nothing_found_exits_1(self, spark, tmp_path, capsys):
        rc, cap, _json = self.run(tmp_path, capsys, [])
        assert rc == 1
