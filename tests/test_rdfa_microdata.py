"""RDFa Lite + microdata extraction tests (north_star surface: the
third and fourth structured-data syntaxes next to JSON-LD and Turtle
script blocks)."""

from py_sema_spark.rdf.microdata import parse_microdata
from py_sema_spark.rdf.rdfa import parse_rdfa

BASE = "https://md.test/page/1"


def spo(triples):
    return {(t.s.value, t.p.value, t.o.value) for t in triples}


class TestMicrodata:
    HTML = """<!DOCTYPE html><html><body>
<div itemscope itemtype="https://schema.org/Person" itemid="#alice">
  <span itemprop="name">Alice <b>B.</b> Carol</span>
  <a itemprop="url" href="/alice">home</a>
  <meta itemprop="height" content="1.70">
  <time itemprop="birthDate" datetime="1990-04-01">April Fools 1990</time>
  <div itemprop="address" itemscope itemtype="https://schema.org/PostalAddress">
    <span itemprop="postalCode">90210</span>
  </div>
</div>
</body></html>"""

    def test_typed_item_with_values(self):
        triples = parse_microdata(self.HTML, base=BASE)
        got = spo(triples)
        subj = "https://md.test/page/1#alice"
        assert (subj, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "https://schema.org/Person") in got
        assert (subj, "https://schema.org/name", "Alice B. Carol") in got
        assert (subj, "https://schema.org/url", "https://md.test/alice") in got
        assert (subj, "https://schema.org/height", "1.70") in got
        assert (subj, "https://schema.org/birthDate", "1990-04-01") in got
        # nested item linked from parent, typed, with its own property
        addr = [o for s, p, o in got if p == "https://schema.org/address"]
        assert addr and addr[0].startswith("_:md")
        assert (addr[0], "https://schema.org/postalCode", "90210") in got

    def test_no_markup_no_triples(self):
        assert parse_microdata("<html><body><p>plain</p></body></html>", BASE) == []

    def test_bnode_numbering_deterministic(self):
        a = parse_microdata(self.HTML, base=BASE)
        b = parse_microdata(self.HTML, base=BASE)
        assert [t.s.value for t in a] == [t.s.value for t in b]


class TestRdfa:
    HTML = """<!DOCTYPE html><html><body>
<div vocab="https://schema.org/" resource="#book" typeof="Book">
  <h1 property="name">Spark <i>Graft</i></h1>
  <a property="publisher" href="/acme">ACME</a>
  <meta property="isbn" content="978-3-16-148410-0">
  <span property="inLanguage" lang="en">English</span>
  <div property="author" typeof="Person">
    <span property="name">Robin</span>
  </div>
  <span prefix="dc: http://purl.org/dc/terms/ xsd: http://www.w3.org/2001/XMLSchema#"
        property="dc:created" datatype="xsd:date">2020-01-02</span>
</div>
</body></html>"""

    def test_rdfa_lite_surface(self):
        triples = parse_rdfa(self.HTML, base=BASE)
        got = spo(triples)
        subj = "https://md.test/page/1#book"
        assert (subj, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "https://schema.org/Book") in got
        assert (subj, "https://schema.org/name", "Spark Graft") in got
        assert (subj, "https://schema.org/publisher", "https://md.test/acme") in got
        assert (subj, "https://schema.org/isbn", "978-3-16-148410-0") in got
        # lang-tagged literal
        lang_t = [t for t in triples if t.p.value.endswith("inLanguage")][0]
        assert lang_t.o.value == "English" and lang_t.o.lang == "en"
        # chained bnode author
        author = [o for s, p, o in got if p == "https://schema.org/author"]
        assert author and author[0].startswith("_:ra")
        assert (author[0], "https://schema.org/name", "Robin") in got
        # prefixed predicate with datatype
        dc = [t for t in triples if t.p.value == "http://purl.org/dc/terms/created"]
        assert dc and dc[0].o.value == "2020-01-02"
        assert dc[0].o.datatype == "http://www.w3.org/2001/XMLSchema#date"

    def test_plain_html_yields_nothing(self):
        assert parse_rdfa("<html><body><p property='x'>t</p></body></html>", BASE) == []


class TestExtractIntegration:
    def test_extract_page_collects_all_syntaxes(self):
        from py_sema_spark.operators.extract import extract_page

        body = (
            "<!DOCTYPE html><html><head>"
            '<script type="application/ld+json">'
            '{"@id": "https://md.test/e1", "@type": "https://schema.org/Thing"}'
            "</script></head><body>"
            '<div itemscope itemtype="https://schema.org/Person" itemid="#p">'
            '<span itemprop="name">Ada</span></div>'
            '<div vocab="https://schema.org/" resource="#r" typeof="Report">'
            '<span property="name">Rep</span></div>'
            "</body></html>"
        )
        triples, links = extract_page(BASE, body)
        fmts = {fmt for _, fmt in triples}
        assert {"json-ld", "microdata", "rdfa"} <= fmts
        got = {(t.s.value, t.p.value, t.o.value) for t, _ in triples}
        assert ("https://md.test/page/1#p", "https://schema.org/name", "Ada") in got
        assert ("https://md.test/page/1#r", "https://schema.org/name", "Rep") in got


class TestReviewRegressions:
    """Round-3 adversarial-review fixes: about-as-subject, multi-type
    itemtype, EOF flush of open literals, link-header column parity."""

    def test_rdfa_about_sets_subject(self):
        from py_sema_spark.rdf.rdfa import parse_rdfa

        html = (
            '<div vocab="https://schema.org/">'
            '<div about="#me" property="name">Alice</div></div>'
        )
        got = spo(parse_rdfa(html, base="https://x.test/p"))
        assert ("https://x.test/p#me", "https://schema.org/name",
                "Alice") in got

    def test_rdfa_resource_still_chains(self):
        from py_sema_spark.rdf.rdfa import parse_rdfa

        html = (
            '<div vocab="https://schema.org/" about="#me">'
            '<div property="knows" resource="#bob"></div></div>'
        )
        got = spo(parse_rdfa(html, base="https://x.test/p"))
        assert ("https://x.test/p#me", "https://schema.org/knows",
                "https://x.test/p#bob") in got

    def test_microdata_multi_itemtype(self):
        from py_sema_spark.rdf.microdata import parse_microdata

        html = (
            '<div itemscope itemid="#a" '
            'itemtype="https://schema.org/Person https://schema.org/Author">'
            '<span itemprop="name">Ada</span></div>'
        )
        ts = parse_microdata(html, base="https://x.test/p")
        got = spo(ts)
        types = {o for s, p, o in got if p.endswith("#type")}
        assert types == {
            "https://schema.org/Person", "https://schema.org/Author"
        }
        # property vocab from the FIRST type
        assert ("https://x.test/p#a", "https://schema.org/name",
                "Ada") in got

    def test_truncated_markup_flushes_open_literals(self):
        from py_sema_spark.rdf.microdata import parse_microdata
        from py_sema_spark.rdf.rdfa import parse_rdfa

        # crawl-truncated page: no closing tags at all
        r = parse_rdfa(
            '<div vocab="https://schema.org/" about="#b">'
            '<span property="name">Alice',
            base="https://x.test/p",
        )
        assert ("https://x.test/p#b", "https://schema.org/name",
                "Alice") in spo(r)
        m = parse_microdata(
            '<div itemscope itemid="#i" '
            'itemtype="https://schema.org/Book">'
            '<span itemprop="name">Dune',
            base="https://x.test/p",
        )
        assert ("https://x.test/p#i", "https://schema.org/name",
                "Dune") in spo(m)

    def test_link_header_col_matches_python_oracle(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.functions.web import (
            link_header_urls_col,
            parse_link_header,
        )

        headers = [
            # rel=… inside the URL query string must NOT match
            '<https://x/page?rel=describedby>; rel="author", '
            '<https://x/meta>; rel=describedby',
            # whitespace inside the angle brackets is stripped
            '< https://x/doc1 >; rel=describedby',
            # quoted rel does not match the unquoted substring test
            # (reference linkheaders.py parity)
            '<https://x/q>; rel="describedby"',
        ]
        df = spark.createDataFrame([(h,) for h in headers], "h string")
        got = [
            sorted(u for u in r["urls"] if u != "")
            for r in df.select(
                link_header_urls_col(F.col("h"), rel="describedby")
                .alias("urls")
            ).collect()
        ]
        want = [
            sorted(
                u.replace("https://base/", "")
                for u in parse_link_header(h, "", rel="describedby")
            )
            for h in headers
        ]
        assert got == want
        assert got[0] == ["https://x/meta"]
        assert got[1] == ["https://x/doc1"]
        assert got[2] == []


class TestExtractPrefilter:
    """The JVM-side marker prefilter must be output-invariant: it may
    only drop pages whose extraction is provably empty."""

    def test_prefilter_output_identical(self, spark):
        from py_sema_spark.operators.extract import extract_structured
        from py_sema_spark.sources.corpus import synth_corpus

        corpus = synth_corpus(spark, 300, seed=42)
        cols = [f.name for f in extract_structured(corpus).schema.fields]
        a = extract_structured(corpus, prefilter=True).select(cols)
        b = extract_structured(corpus, prefilter=False).select(cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_prefilter_drops_noise_pages(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.sources.corpus import page_kind, synth_corpus

        corpus = synth_corpus(spark, 300, seed=42)
        noise = [i for i in range(300) if page_kind(42, i) == "noise"]
        assert noise  # the corpus mixes ~20% noise pages
        # drive the filtered frame: noise URLs must not reach Python
        from py_sema_spark.operators.extract import extract_structured

        out = extract_structured(corpus, prefilter=True)
        got_urls = {
            r["src_url"] for r in out.select("src_url").distinct().collect()
        }
        from py_sema_spark.sources.corpus import page_url

        assert not ({page_url(i) for i in noise} & got_urls)


class TestLinkHeaderBracketless:
    def test_bracketless_entry_matches_python_oracle(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.functions.web import (
            link_header_urls_col,
            parse_link_header,
        )

        # captured fixture headers sometimes omit the angle brackets;
        # the Python form's strip("<> ") keeps the URL — the column
        # form must not degrade it to ''
        h = 'http://ex.org/meta; rel=describedby, <http://ex.org/a>; rel=describedby'
        df = spark.createDataFrame([(h,)], "h string")
        got = sorted(
            df.select(
                link_header_urls_col(F.col("h"), rel="describedby").alias("u")
            ).collect()[0]["u"]
        )
        want = sorted(parse_link_header(h, "", rel="describedby"))
        assert got == want == ["http://ex.org/a", "http://ex.org/meta"]


class TestContentHeaderParsing:
    """parse_content_header vs the reference's own test vectors
    (/root/reference/tests/commons/web/test_parse_headers.py), plus
    the column fast path against the python oracle."""

    VECTORS = [
        ("content-type", "application/json", "application/json", {}),
        ("content-type", 'text/plain; charset="utf8"',
         "text/plain", {"charset": "utf8"}),
        ("content-type", 'main/subtype; key="value"; other="info"',
         "main/subtype", {"key": "value", "other": "info"}),
        ("content-disposition", 'Attachment; filename="name.extension"',
         "attachment", {"filename": "name.extension"}),
        ("content-type", "", None, None),
        # malformed content-type → email-parser text/plain fallback
        ("content-type", "invalidtype;extra", "text/plain", {"extra": ""}),
    ]

    def test_reference_vectors(self):
        from py_sema_spark.functions.web import parse_content_header

        for mode, content, main, params in self.VECTORS:
            got = parse_content_header(content, mode)
            assert got == (main, params), (mode, content, got)

    def test_invalid_mode_raises(self):
        import pytest as _pytest

        from py_sema_spark.functions.web import parse_content_header

        with _pytest.raises(ValueError, match="mode should be one of"):
            parse_content_header("some-content", "invalid-mode")

    def test_get_parsed_header_dict(self):
        from py_sema_spark.functions.web import get_parsed_header

        headers = {"content-type": "text/turtle; charset=utf-8"}
        assert get_parsed_header(headers, "content-type") == (
            "text/turtle", {"charset": "utf-8"}
        )
        assert get_parsed_header(headers, "content-disposition") == (
            None, None
        )

    def test_column_forms_match_python_oracle(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.functions.web import (
            header_main_col,
            header_param_col,
            parse_content_header,
        )

        rows = [
            ("text/html; charset=UTF-8",),
            ('text/plain; charset="utf8"',),
            ("application/ld+json",),
            ('main/subtype; key="value"; other="info"',),
            ("text/turtle; profile=https://p/x; charset=utf-8",),
        ]
        df = spark.createDataFrame(rows, "h string")
        got = df.select(
            F.col("h"),
            header_main_col(F.col("h")).alias("main"),
            header_param_col(F.col("h"), "charset").alias("charset"),
        ).collect()
        for r in got:
            main, params = parse_content_header(r["h"])
            assert r["main"] == main, r["h"]
            assert r["charset"] == (params or {}).get("charset"), r["h"]
