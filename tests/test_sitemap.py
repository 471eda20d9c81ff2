"""Sitemap parsing + frontier operators (sitemaps.org semantics)."""

import datetime

from py_sema_spark.operators.sitemap import (
    parse_sitemaps,
    sitemap_children,
    sitemap_frontier,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.ex/p1</loc><lastmod>2024-03-01</lastmod></url>
  <url>
    <loc> http://a.ex/p2 </loc>
  </url>
  <!-- <url><loc>http://a.ex/ghost</loc></url> -->
  <url><loc>http://a.ex/p3</loc><lastmod>2024-05-02T10:30:00</lastmod></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.ex/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>http://a.ex/sitemap-missing.xml</loc></sitemap>
</sitemapindex>
"""


def fetched_df(spark):
    return spark.createDataFrame(
        [
            ("http://a.ex/sitemap-a.xml", URLSET),
            ("http://a.ex/sitemap-index.xml", INDEX),
        ],
        "sitemap_url string, body string",
    )


def test_parse_urlset(spark):
    rows = {
        (r["url"], r["lastmod"])
        for r in parse_sitemaps(fetched_df(spark)).collect()
    }
    assert rows == {
        ("http://a.ex/p1", datetime.datetime(2024, 3, 1)),
        ("http://a.ex/p2", None),  # lastmod absent; whitespace trimmed
        ("http://a.ex/p3", datetime.datetime(2024, 5, 2, 10, 30)),
    }
    # the commented-out entry is ignored; the index yields no pages
    assert all(
        r["sitemap_url"] == "http://a.ex/sitemap-a.xml"
        for r in parse_sitemaps(fetched_df(spark)).collect()
    )


def test_children_flag_fetched_state(spark):
    rows = {
        (r["child_url"], r["fetched"])
        for r in sitemap_children(fetched_df(spark)).collect()
    }
    assert rows == {
        ("http://a.ex/sitemap-a.xml", True),
        ("http://a.ex/sitemap-missing.xml", False),
    }


def test_frontier_freshness_diff(spark):
    parsed = parse_sitemaps(fetched_df(spark))
    known = spark.createDataFrame(
        [
            # crawled before lastmod → stale → recrawl
            ("http://a.ex/p1", datetime.datetime(2024, 1, 1)),
            # crawled; sitemap makes no lastmod claim → unchanged
            ("http://a.ex/p2", datetime.datetime(2023, 1, 1)),
            # crawled after lastmod → fresh
            ("http://a.ex/p3", datetime.datetime(2024, 6, 1)),
        ],
        "url string, crawled_ts timestamp",
    )
    got = {r["url"] for r in sitemap_frontier(parsed, known).collect()}
    assert got == {"http://a.ex/p1"}
    # never-crawled pages always enter the frontier
    got_all = {
        r["url"]
        for r in sitemap_frontier(parsed, known.limit(0)).collect()
    }
    assert got_all == {
        "http://a.ex/p1", "http://a.ex/p2", "http://a.ex/p3"
    }
