"""Sitemap parsing (sitemaps.org XML) as column algebra.

The crawl-frontier side of a web-scale pipeline: given fetched
``sitemap.xml`` bodies, extract the advertised URL set with
last-modification stamps — the input to freshness-aware recrawl
scheduling (the engine's CDC/mtime gates consume exactly this shape).
Sitemaps are flat, schema-fixed XML, so extraction compiles to
``regexp_extract_all`` over the raw body — whole-stage codegen, no
XML library, no per-row Python — and a ``<sitemapindex>`` document
expands one level by joining its child ``<loc>`` URLs back against
the fetched-bodies table.

Reference scope note: the reference discovers documents per-URL
(signposting/conneg, no sitemap support); this operator belongs to
the large-scale-pipeline surface the PySpark engine adds alongside
robots.txt compliance (`operators/robots.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tags may carry a namespace prefix (<sm:url>) and/or attributes —
# both appear in the wild even though the sitemaps.org examples don't
_URL_BLOCK = r"<(?:\w+:)?url(?:\s[^>]*)?>(.*?)</(?:\w+:)?url\s*>"
_SITEMAP_BLOCK = (
    r"<(?:\w+:)?sitemap(?:\s[^>]*)?>(.*?)</(?:\w+:)?sitemap\s*>"
)
_LOC = r"(?s)<(?:\w+:)?loc(?:\s[^>]*)?>\s*(.*?)\s*</(?:\w+:)?loc\s*>"
_LASTMOD = (
    r"(?s)<(?:\w+:)?lastmod(?:\s[^>]*)?>\s*(.*?)\s*</(?:\w+:)?lastmod\s*>"
)


def _xml_unescape(col):
    """Decode XML character data column-side (sitemaps.org REQUIRES
    entity-escaped URLs, so ``&`` in a loc arrives as ``&amp;`` — left
    undecoded it would never equi-join against a crawled-URL table).

    Handles a CDATA wrapper (content taken verbatim), the five named
    entities, and ASCII-range numeric refs (``&#38;`` / ``&#x26;``;
    non-ASCII refs are left intact — sitemap URLs are percent-encoded
    ASCII per the spec, and Spark's ``char`` is mod-256). ``&#`` refs
    and ``&amp;`` decode in ONE left-to-right split pass, so decoded
    output is never re-scanned: ``&amp;lt;`` yields the literal
    ``&lt;`` and ``&#38;amp;`` yields the literal ``&amp;`` (the
    pre-r5 two-pass chain double-decoded the latter to ``&`` — ADVICE
    r04). All whole-stage-codegen-able expressions; the split pass
    runs only on rows that contain ``&#`` or ``&amp;``."""
    cdata = F.regexp_extract(col, r"(?s)^<!\[CDATA\[(.*?)\]\]>$", 1)
    c = F.regexp_replace(col, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    c = F.regexp_replace(c, "&apos;", "'")

    def _dec(s):
        d10 = F.regexp_extract(s, r"^&#([0-9]{1,3});", 1)
        d16 = F.regexp_extract(s, r"^&#[xX]([0-9a-fA-F]{1,2});", 1)
        return (
            F.when(
                (d10 != "") & (d10.cast("int") < 128),
                F.concat(
                    F.char(d10.cast("long")),
                    F.regexp_replace(s, r"^&#[0-9]{1,3};", ""),
                ),
            )
            .when(
                (d16 != "") & (F.conv(d16, 16, 10).cast("int") < 128),
                F.concat(
                    F.char(F.conv(d16, 16, 10).cast("long")),
                    F.regexp_replace(s, r"^&#[xX][0-9a-fA-F]{1,2};", ""),
                ),
            )
            .when(
                s.startswith("&amp;"),
                F.concat(
                    F.lit("&"), F.regexp_replace(s, r"^&amp;", "")
                ),
            )
            .otherwise(s)
        )

    entity = F.array_join(
        F.transform(F.split(c, r"(?=&#|&amp;)"), _dec), ""
    )
    c = F.when(
        c.contains("&#") | c.contains("&amp;"), entity
    ).otherwise(c)
    decoded = F.when(cdata != "", cdata).otherwise(c)
    # fast path: a loc with no '&' and no CDATA wrapper (the common
    # case on entity-free sitemaps) needs none of the decode passes —
    # CaseWhen short-circuits per row, so the regexp chain above only
    # evaluates on rows that can actually contain an escape (paired
    # A/B showed the unguarded chain costing ~1.5× on clean fixtures)
    plain = (~col.contains("&")) & (~col.startswith("<![CDATA["))
    return F.when(plain, col).otherwise(decoded)


def _entries(fetched: DataFrame, block_rx: str) -> DataFrame:
    # strip XML comments first so commented-out entries don't match
    body = F.regexp_replace(F.col("body"), r"(?s)<!--.*?-->", "")
    blocks = fetched.select(
        "sitemap_url",
        F.explode(
            F.regexp_extract_all(
                body, F.lit(f"(?s){block_rx}"), F.lit(1)
            )
        ).alias("_e"),
    )
    return blocks.select(
        "sitemap_url",
        _xml_unescape(F.regexp_extract("_e", _LOC, 1)).alias("loc"),
        F.nullif(
            _xml_unescape(F.regexp_extract("_e", _LASTMOD, 1)),
            F.lit(""),
        ).alias("lastmod"),
    ).where(F.col("loc") != "")


def parse_sitemaps(fetched: DataFrame) -> DataFrame:
    """``(sitemap_url, body)`` → ``(sitemap_url, url, lastmod)``:
    one row per ``<url>`` entry of every ``<urlset>`` body (lastmod
    NULL when absent; a ``<sitemapindex>`` body has no ``<url>``
    blocks and yields nothing — discover its children with
    :func:`sitemap_children`). One regexp pass over the body column,
    whole-stage codegen; the only exchange is the final distinct."""
    return _entries(fetched, _URL_BLOCK).select(
        "sitemap_url",
        F.col("loc").alias("url"),
        # try_: lastmod is advisory (sitemaps.org) — a malformed value
        # must degrade to NULL, not abort the job under ANSI mode
        F.try_to_timestamp("lastmod").alias("lastmod"),
    ).distinct()


def sitemap_children(fetched: DataFrame) -> DataFrame:
    """``<sitemapindex>`` expansion, frontier-shaped:
    ``(index_url, child_url, fetched)`` — one row per ``<sitemap>``
    child reference, flagged by whether the child's body is already in
    ``fetched``. Unfetched children are the next crawl wave; fetched
    ones are parsed by :func:`parse_sitemaps` directly."""
    refs = _entries(fetched, _SITEMAP_BLOCK).select(
        F.col("sitemap_url").alias("index_url"),
        F.col("loc").alias("child_url"),
    ).distinct()
    have = fetched.select(
        F.col("sitemap_url").alias("child_url")
    ).distinct().withColumn("fetched", F.lit(True))
    return refs.join(have, "child_url", "left").select(
        "index_url",
        "child_url",
        F.coalesce("fetched", F.lit(False)).alias("fetched"),
    )


def sitemap_frontier(
    parsed: DataFrame, known: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Freshness diff against an already-crawled table
    ``known(url, crawled_ts)``: rows whose sitemap ``lastmod`` is
    newer than the stored crawl (or never crawled) — the recrawl
    frontier. NULL lastmod on a known url is treated as unchanged
    (sitemaps.org: lastmod is advisory; absent means no claim)."""
    k = known.select(
        F.col(url_col).alias("url"), F.col("crawled_ts")
    )
    j = parsed.join(k, "url", "left")
    return j.where(
        F.col("crawled_ts").isNull()
        | (
            F.col("lastmod").isNotNull()
            & (F.col("lastmod") > F.col("crawled_ts"))
        )
    ).select(parsed["*"])
