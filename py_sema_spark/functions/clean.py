"""URI validation / cleaning — semantics of
/root/reference/sema/commons/clean/clean.py, re-implemented without the
``validators``/``urnparse`` dependencies (not available here), plus
Spark column-expression forms for use in the hot path.

The contract that matters downstream (auto-format step 13, smart
cleaning, node cleaning):

- ``check_valid_url``: syntactic http(s)/ftp-style URL check
  (clean.py:52-58 delegates to ``validators.url``),
- ``check_valid_urn``: RFC 8141 URN format (clean.py:38-49),
- ``clean_uri_str``: ``urllib.parse.quote`` with safe set
  ``~@#$&()*!+=:;,?/'`` (clean.py:75-89) — byte-for-byte,
- ``normalise_scheme_str``: force scheme on a domain
  (clean.py:110-121).
"""

from __future__ import annotations

import re
from urllib.parse import quote

from pyspark.sql import Column
from pyspark.sql import functions as F

# approximates validators.url: scheme, optional user, host (ip or
# dotted name or localhost), optional port, optional path/query/frag,
# and no characters that require percent-encoding.
_URL_RE = re.compile(
    r"^(?:[a-z][a-z0-9+.-]*)://"                      # scheme
    r"(?:[^\s/?#@]+@)?"                               # userinfo
    r"(?:"
    r"localhost"
    r"|\d{1,3}(?:\.\d{1,3}){3}"                       # ipv4
    r"|\[[0-9a-fA-F:]+\]"                             # ipv6
    r"|(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+[a-zA-Z]{2,63}"
    r")"
    r"(?::\d{2,5})?"                                  # port
    r"(?:[/?#][A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*)?$",
    re.IGNORECASE,
)

# RFC 8141: urn:<nid>:<nss>; nid = alnum, 1-31 chars of alnum/-,
# ending alnum; nss non-empty of pchars.
_URN_RE = re.compile(
    r"^urn:[a-zA-Z0-9][a-zA-Z0-9-]{0,30}[a-zA-Z0-9]?:"
    r"[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]+$"
)

CLEAN_SAFE = "~@#$&()*!+=:;,?/'"


def check_valid_url(url: str) -> bool:
    if not isinstance(url, str) or not url:
        return False
    return bool(_URL_RE.match(url))


def check_valid_urn(urn: str) -> bool:
    if not isinstance(urn, str):
        return False
    return bool(_URN_RE.match(urn))


def check_valid_uri(uri: str) -> bool:
    """URN or URL (clean.py:61-72)."""
    if not isinstance(uri, str):
        return False
    return bool(
        (uri.startswith("urn:") and check_valid_urn(uri)) or check_valid_url(uri)
    )


def clean_uri_str(uri: str, smart: bool = False) -> str:
    """Percent-quote invalid URI chars; safe set per clean.py:89."""
    if smart and check_valid_uri(uri):
        return uri
    return quote(uri, safe=CLEAN_SAFE)


def normalise_scheme_str(
    uri: str, domain: str = "schema.org", to_scheme: str = "https"
) -> str:
    # escape the domain (its '.' must not act as a regex wildcard) —
    # keeps the str form in lockstep with normalise_scheme_col
    return re.sub(
        rf"^https?://{re.escape(domain)}", rf"{to_scheme}://{domain}", uri
    )


# ---------------- Spark column forms ----------------

# the URL regex above, translated for rlike (Java regex; anchors kept)
URL_RLIKE = (
    r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^\s/?#@]+@)?"
    r"(localhost|\d{1,3}(\.\d{1,3}){3}|\[[0-9a-fA-F:]+\]"
    r"|([a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?\.)+[a-zA-Z]{2,63})"
    r"(:\d{2,5})?([/?#][a-zA-Z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*)?$"
)
URN_RLIKE = (
    r"^urn:[a-zA-Z0-9][a-zA-Z0-9-]{0,30}[a-zA-Z0-9]?:"
    r"[a-zA-Z0-9\-._~:/?#\[\]@!$&'()*+,;=%]+$"
)


def is_valid_uri_col(col: Column) -> Column:
    return col.rlike(URN_RLIKE) | col.rlike(URL_RLIKE)


def normalise_scheme_col(
    col: Column, domain: str = "schema.org", to_scheme: str = "https"
) -> Column:
    return F.regexp_replace(
        col, rf"^https?://{re.escape(domain)}", f"{to_scheme}://{domain}"
    )


def clean_uri_col(col: Column) -> Column:
    """Vectorized percent-quoting of the characters outside
    quote()'s always-safe set ∪ CLEAN_SAFE. Exact parity with
    ``urllib.parse.quote`` for ASCII input is covered by tests; for
    non-ASCII the Python form (used in templating UDF batches) is
    authoritative."""
    safe = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789_.-~" + CLEAN_SAFE
    )
    unsafe = set(chr(c) for c in range(0x20, 0x7F)) - set(safe)
    # '%' must be encoded FIRST: encoding it after other characters
    # would re-encode their freshly-emitted %XX escapes ('a b' →
    # 'a%2520b' instead of 'a%20b', splitting the node from the
    # Python-cleaned form)
    out = col
    for ch in ["%"] + sorted(unsafe - {"%"}):
        out = F.regexp_replace(
            out, re.escape(ch), "%{:02X}".format(ord(ch))
        )
    return out


def apply_node_clean_chain(
    df, cols: tuple = ("s", "p", "o"), kinds_col: str = "o_kind"
):
    """Default cleaner chain (clean.py:142-254, default specs =
    reparse + clean_uri + normalise_schema.org) as DataFrame column
    transforms. Node-level cleaners apply only to IRI positions:
    s/p always; o only when o_kind='iri'."""
    out = df
    for c in cols:
        cleaned = normalise_scheme_col(
            F.when(is_valid_uri_col(F.col(c)), F.col(c)).otherwise(
                clean_uri_col(F.col(c))
            )
        )
        if c == "o" and kinds_col in df.columns:
            cleaned = F.when(
                F.col(kinds_col) == "iri", cleaned
            ).otherwise(F.col(c))
        out = out.withColumn(c, cleaned)
    return out
