"""Web-header helpers (SURVEY.md §2.1 S9, §2.8 X19).

The corpus replaces live HTTP, but harvested fixture tables may carry
captured ``Link:`` headers; signposting then becomes: parse →
``rel=describedby`` filter → urljoin → corpus join on the resulting
url (the J8 link-follow). Mirrors
/root/reference/sema/discovery/linkheaders.py:10-28.
"""

from __future__ import annotations

from typing import List, Optional
from urllib.parse import urljoin

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_link_header(
    header: Optional[str], base_url: str, rel: Optional[str] = None
) -> List[str]:
    """``<url>; rel=x, <url2>; rel=y`` → absolute urls (optionally
    rel-filtered). Python form — used in fixture prep and as the
    semantics oracle for the column form."""
    if not header:
        return []
    out = []
    for link_str in header.split(","):
        link, *remainder = link_str.split(";")
        link = link.strip("<> ")
        joined = "|".join(part.strip() for part in remainder)
        if rel is None or f"rel={rel}" in joined:
            out.append(urljoin(base_url, link))
    return sorted(set(out))


#: query-parameter names that never affect page identity (tracking)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|mc_cid|mc_eid|ref)(=|$)"


def url_canonicalize(url: Column) -> Column:
    """Canonical form of a web URL for crawl-level dedup (the CCNet /
    RefinedWeb URL-normalization step):

    - drop the ``#fragment``
    - lowercase ``scheme://host[:port]`` (path/query case preserved)
    - strip a leading ``www.`` and the scheme-default port
      (``:80`` for http, ``:443`` for https)
    - drop tracking query parameters (``utm_*``, ``fbclid``,
      ``gclid``, ``mc_cid``, ``mc_eid``, ``ref``), sort the remaining
      parameters, and strip trailing slashes from the path

    Pure column algebra (regexp + array ops, whole-stage codegen) —
    zero shuffles at any corpus size. Scheme-less inputs pass through
    the path/query rules only.
    """
    u = F.regexp_replace(url, "#.*$", "")
    prefix = F.lower(F.regexp_extract(u, "^([^/?#]+://[^/?#]*)", 1))
    prefix = F.regexp_replace(prefix, "://www\\.", "://")
    prefix = F.regexp_replace(prefix, "^(http://[^/:]*):80$", "$1")
    prefix = F.regexp_replace(prefix, "^(https://[^/:]*):443$", "$1")
    rest = F.regexp_replace(u, "^[^/?#]+://[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qstr = F.array_join(F.array_sort(params), "&")
    return F.concat(
        prefix,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def link_header_urls_col(
    header: Column, rel: Optional[str] = None
) -> Column:
    """Column form: array of raw link targets from a Link header
    (vectorized regexp; relative→absolute resolution happens at the
    corpus join where the base url column is in scope)."""
    entries = F.split(header, ",")
    if rel is not None:
        # exact mirror of parse_link_header: only the params AFTER the
        # first ';' are searched (a "?rel=…" query string inside the
        # <url> itself must not match), parts stripped and '|'-joined,
        # then the same unquoted substring test
        def _rel_match(e: Column) -> Column:
            # slice(…, 2, size) drops the <url> part; an int-max length
            # overflows start+length inside higher-order codegen
            parts = F.split(e, ";")
            params = F.slice(parts, 2, F.size(parts))
            # no per-part trim needed: contains() is a substring test,
            # and edge whitespace (what Python's strip removes) can't
            # interrupt a "rel=…" match
            return F.array_join(params, "|").contains(f"rel={rel}")

        entries = F.filter(entries, _rel_match)
    return F.transform(
        entries,
        # exact mirror of the Python form's link.strip("<> ") on the
        # pre-';' part: entries without angle brackets (seen in captured
        # fixture headers) keep their URL instead of degrading to ''
        lambda e: F.regexp_replace(
            F.element_at(F.split(e, ";"), 1), r"^[<> ]+|[<> ]+$", ""
        ),
    )


def parse_content_header(
    content: Optional[str], mode: str = "content-type"
):
    """``Content-Type`` / ``Content-Disposition`` header value →
    ``(main, params)`` — reference ``parse_header``
    (/root/reference/sema/commons/web/parse_headers.py:4-28), including
    its edge behaviors: empty/None → ``(None, None)``, malformed
    content-type falls back to ``text/plain`` (the email-parser
    default), main value lowercased, param quotes stripped.

    Python form — driver-side config/fixture use and the semantics
    oracle for :func:`header_main_col` / :func:`header_params_col`."""
    mode = mode.lower()
    if mode not in ("content-type", "content-disposition"):
        raise ValueError(
            "mode should be one of 'content-type' (default) "
            "or 'content-disposition'"
        )
    if content is None or not content.strip():
        return None, None
    from email.message import EmailMessage

    msg = EmailMessage()
    msg[mode] = content.strip()
    header = msg[mode]
    main = (
        msg.get_content_type()
        if mode == "content-type"
        else msg.get_content_disposition()
    )
    return main, dict(header.params)


def get_parsed_header(headers: dict, key: str):
    """Convenience over a headers dict (reference
    parse_headers.py:31-35)."""
    return parse_content_header(headers.get(key, None), key)


def header_main_col(header: Column) -> Column:
    """Column form of the MAIN part of a content header: lowercased
    text before the first ``;``. Fast path for corpus-scale columns —
    exact for values without quoted semicolons (the overwhelmingly
    common case; the python form is the full RFC parser)."""
    return F.when(
        F.trim(header) == "", F.lit(None).cast("string")
    ).otherwise(F.lower(F.trim(F.split_part(header, F.lit(";"), F.lit(1)))))


def header_param_col(header: Column, param: str) -> Column:
    """Column form of one ``;key=value`` parameter of a content header
    (e.g. ``charset``, ``filename``, conneg ``profile``): value with
    surrounding quotes stripped, NULL when absent. Same
    no-quoted-semicolon caveat as :func:`header_main_col`."""
    v = F.regexp_extract(
        header, r"(?i)[;\s]" + param + r"\s*=\s*([^;]*)", 1
    )
    v = F.trim(v)
    # strip symmetric double quotes
    v = F.when(
        v.rlike('^".*"$'), F.substring(v, 2, F.length(v) - 2)
    ).otherwise(v)
    return F.when(v == "", F.lit(None).cast("string")).otherwise(v)
