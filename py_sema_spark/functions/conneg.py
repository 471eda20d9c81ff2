"""Content-negotiation variant-set semantics (reference
``sema.commons.web.conneg``, /root/reference/sema/commons/web/conneg.py).

The reference's ``ConnegEvaluation`` service probes a live URL: it
parses the requested ``"mime;profile,…"`` spec (conneg.py:128-139),
detects available variants by fetching the resource's altr
(alternate-representations) document and running a SPARQL query over
it (conneg.py:179-220), fetches every requested+detected variant once
(conneg.py:222-240), and reports the requested+detected vs found
set-difference (``FoundVariants``, conneg.py:26-105).

Under the corpus-scan model there is no live HTTP, so the same
semantics split into:

- :func:`parse_request_variants` — the exact spec-string parsing.
- :func:`detect_variants` — the altr SPARQL (conneg.py:181-192)
  over an already-parsed triples frame (this engine's SPARQL
  compiler instead of rdflib).
- :class:`FoundVariants` — the reference's result/set logic,
  including ``success`` (expected set == found keys AND all 200 —
  conneg.py:68-73) and the ``as_csv`` column layout.
- :func:`conneg_audit` — the distributed form: per-URL
  requested+detected vs found set-difference as one full-outer join,
  for auditing variant coverage across a whole crawl at once.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VariantKey = Tuple[str, str]

ALTR_PREFIX = "http://www.w3.org/ns/dx/conneg/altr#"
DCT = "http://purl.org/dc/terms/"


def parse_request_variants(spec: Optional[str]) -> List[VariantKey]:
    """``"m1;p1,m2,m3;p3"`` → ``[("m1","p1"),("m2",""),("m3","p3")]``
    — profile optional per entry (reference conneg.py:128-139)."""
    if not spec:
        return []
    return [
        (mt.strip(), pf.strip())
        for mt, pf in ((v + ";").split(";")[:2] for v in spec.split(","))
    ]


def variants_query(url: str) -> str:
    """The altr detection SPARQL, verbatim semantics
    (conneg.py:199-210)."""
    return f"""
prefix altr: <{ALTR_PREFIX}>
prefix dct: <{DCT}>
SELECT ?mime ?profile WHERE {{
  <{url}> altr:hasRepresentation ?repr .
  ?repr a altr:Representation .
  OPTIONAL {{ ?repr dct:format ?mime . }}
  OPTIONAL {{ ?repr dct:conformsTo ?profile . }}
}}
"""


def detect_variants(triples: DataFrame, url: str) -> List[VariantKey]:
    """Run the altr detection query over a parsed alternate-
    representations document (triples frame) and return the detected
    (mime, profile) keys — the offline analog of conneg.py:192-220."""
    from ..queries.bgp import sparql_query

    rows = sparql_query(triples, variants_query(url)).collect()
    return [(r["mime"] or "", r["profile"] or "") for r in rows]


class FoundVariants:
    """The reference's conneg result object (conneg.py:26-105):
    requested + detected variant keys vs the variants actually found,
    with the same ``success`` rule and CSV export shape."""

    _CSV_FIELDS = [
        "mime_type", "profile", "inRequested", "inDetected",
        "status", "match_mime", "filename",
    ]

    def __init__(self, requested: Optional[List[VariantKey]] = None):
        self.requested: List[VariantKey] = list(requested or [])
        self.detected: List[VariantKey] = []
        self.variants: Dict[VariantKey, dict] = {}

    def set_detected(self, detected: Optional[List[VariantKey]]) -> None:
        self.detected = list(detected or [])

    def add_variant(
        self,
        *,
        mime_type: str,
        profile: str,
        status: Optional[int] = None,
        response_mime: Optional[str] = None,
        filename: Optional[str] = None,
    ) -> None:
        key = (mime_type or "", profile or "")
        assert key not in self.variants, f"Variant {key} already added"
        self.variants[key] = dict(
            mime_type=mime_type,
            profile=profile,
            inRequested=key in self.requested,
            inDetected=key in self.detected,
            status=status,
            match_mime=(
                bool(mime_type == response_mime)
                if response_mime is not None
                else None
            ),
            filename=filename,
        )

    @property
    def expected(self) -> set:
        return set(self.requested + self.detected)

    @property
    def missing(self) -> set:
        """Expected variants with no found entry — the set-difference
        the service exists to surface."""
        return self.expected - set(self.variants)

    @property
    def success(self) -> bool:
        # conneg.py:68-73: found keys must EQUAL requested ∪ detected
        # and every found variant must be a 200
        return self.expected == set(self.variants) and all(
            v["status"] == 200 for v in self.variants.values()
        )

    def __len__(self) -> int:
        return len(self.variants)

    def as_csv(self, url: Optional[str] = None) -> str:
        out = ("url," if url else "") + ",".join(self._CSV_FIELDS) + "\n"
        for v in self.variants.values():
            out += (f"{url}," if url else "") + ",".join(
                str(v[f]) for f in self._CSV_FIELDS
            ) + "\n"
        return out


def conneg_audit(
    found: DataFrame,
    requested: List[VariantKey],
    detected: Optional[DataFrame] = None,
) -> DataFrame:
    """Distributed requested+detected vs found set-difference.

    :param found: one row per fetched variant —
      ``(url, mime_type, profile, status)`` (profile nullable).
    :param requested: (mime, profile) keys requested for EVERY url
      (the CLI's ``request_variants`` applies uniformly; broadcast).
    :param detected: optional ``(url, mime_type, profile)`` rows from
      altr documents (per-url detected sets).
    :returns: one row per (url, expected-or-found variant) with
      ``in_requested`` / ``in_detected`` / ``found`` / ``status_ok``
      flags plus a per-url ``url_success`` mirroring
      :attr:`FoundVariants.success`.

    Shape: expected keys = (urls × requested) ∪ detected — both sides
    dimension-small per url — full-outer-joined with the found rows on
    (url, mime, profile). One shuffle on the composite key; the
    requested list joins broadcast.
    """
    spark = found.sparkSession
    norm = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731
    f = found.select(
        "url",
        norm("mime_type").alias("mime_type"),
        norm("profile").alias("profile"),
        F.col("status").cast("int").alias("status"),
    )
    urls = f.select("url").distinct()
    if detected is not None:
        urls = urls.unionByName(detected.select("url").distinct()).distinct()
    req = spark.createDataFrame(
        [(m or "", p or "") for m, p in requested] or [],
        "mime_type string, profile string",
    )
    expected = urls.crossJoin(F.broadcast(req)).withColumn(
        "in_requested", F.lit(True)
    )
    if detected is not None:
        det = detected.select(
            "url",
            norm("mime_type").alias("mime_type"),
            norm("profile").alias("profile"),
        ).withColumn("in_detected", F.lit(True))
        expected = expected.unionByName(
            det, allowMissingColumns=True
        )
        expected = (
            expected.groupBy("url", "mime_type", "profile")
            .agg(
                F.max(F.coalesce("in_requested", F.lit(False))).alias(
                    "in_requested"
                ),
                F.max(F.coalesce("in_detected", F.lit(False))).alias(
                    "in_detected"
                ),
            )
        )
    else:
        expected = expected.withColumn("in_detected", F.lit(False))

    keys = ["url", "mime_type", "profile"]
    joined = expected.join(f, keys, "full_outer").select(
        *keys,
        F.coalesce("in_requested", F.lit(False)).alias("in_requested"),
        F.coalesce("in_detected", F.lit(False)).alias("in_detected"),
        F.col("status").isNotNull().alias("found"),
        (F.col("status") == 200).alias("status_ok"),
        "status",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url")
    # success per url = no expected-but-missing, no found-but-
    # unexpected, no non-200 (FoundVariants.success equality rule)
    bad = (
        ((F.col("in_requested") | F.col("in_detected")) & ~F.col("found"))
        | (F.col("found") & ~(F.col("in_requested") | F.col("in_detected")))
        | (F.col("found") & ~F.coalesce("status_ok", F.lit(False)))
    )
    return joined.withColumn(
        "url_success", F.max(F.when(bad, 1).otherwise(0)).over(w) == 0
    )
