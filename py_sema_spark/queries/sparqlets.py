"""The reference's templated-SPARQL surface as DataFrame builders.

One function per template in
/root/reference/sema/query/sparql_templates/ (SURVEY.md §3.1): each
takes a triples DataFrame ``(s,p,o,o_kind,o_datatype,o_lang,…)`` plus
the template's variables and returns the result DataFrame with the
same column names the SPARQL SELECT would produce.

Join strategy (§2.3): every SPARQL basic graph pattern is a self-join
of the triples table on shared variables. Each triple pattern first
narrows to its predicate slice (filter on ``p`` — pushed to the scan),
then slices join on subject. Predicate slices of selective predicates
are broadcast when joined against bigger ones; Catalyst/AQE handles
the rest.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.closure import closure_from_triples

SKOS = "http://www.w3.org/2004/02/skos/core#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL = "http://www.w3.org/2002/07/owl#"
DC = "http://purl.org/dc/terms/"

RDF_TYPE = RDF + "type"


def pred_slice(triples: DataFrame, p: str, s_as: str, o_as: str, extra: Optional[dict] = None) -> DataFrame:
    """σ(p=…) π(s→s_as, o→o_as [, o_lang→…]) — the unit of BGP building."""
    cols = [F.col("s").alias(s_as), F.col("o").alias(o_as)]
    for src, dst in (extra or {}).items():
        cols.append(F.col(src).alias(dst))
    return triples.where(F.col("p") == p).select(*cols)


def lang_matches(lang_col: Column, lang: str) -> Column:
    """SPARQL langMatches(lang(?x), 'en'): primary-tag match."""
    ll = F.lower(F.coalesce(lang_col, F.lit("")))
    return (ll == lang.lower()) | ll.startswith(lang.lower() + "-")


def ci_regex(col: Column, pattern: str) -> Column:
    """FILTER(regex(str(?x), pat, 'i')) — case-insensitive, unanchored."""
    return col.rlike("(?i)" + pattern)


# ---- the 11 templates ----


def all_triples(triples: DataFrame, N: Optional[int] = None) -> DataFrame:
    """all.sparql — SELECT * WHERE { ?s ?p ?o } [LIMIT N]."""
    out = triples.select("s", "p", "o")
    return out.limit(N) if N is not None else out


def rdf_predicates(triples: DataFrame, regex: Optional[str] = None) -> DataFrame:
    """rdf-predicates.sparql — distinct ?predicate [regex-filtered]."""
    out = triples.select(F.col("p").alias("predicate"))
    if regex:
        out = out.where(ci_regex(F.col("predicate"), regex))
    return out.distinct()


def rdf_predicates_count(triples: DataFrame) -> DataFrame:
    """rdf-predicates-count.sparql — ?pred, count(?obj) as ?count."""
    return (
        triples.groupBy(F.col("p").alias("pred"))
        .agg(F.count("o").alias("count"))
    )


def rdf_types(triples: DataFrame, regex: Optional[str] = None) -> DataFrame:
    """rdf-types.sparql — distinct ?type [regex-filtered]."""
    out = triples.where(F.col("p") == RDF_TYPE).select(F.col("o").alias("type"))
    if regex:
        out = out.where(ci_regex(F.col("type"), regex))
    return out.distinct()


def skos_collection(triples: DataFrame, language: Optional[str] = None) -> DataFrame:
    """skos-collection.sparql — ?collection ?title."""
    colls = triples.where(
        (F.col("p") == RDF_TYPE) & (F.col("o") == SKOS + "Collection")
    ).select(F.col("s").alias("collection"))
    titles = pred_slice(
        triples, DC + "title", "collection", "title", {"o_lang": "title_lang"}
    )
    out = colls.join(titles, "collection")
    if language:
        out = out.where(F.coalesce(F.col("title_lang"), F.lit("")) == language)
    return out.select("collection", "title")


def skos_collection_member_count(triples: DataFrame) -> DataFrame:
    """skos-collection-member-count.sparql — ?collection ?title ?count.

    The ``skos:member`` slice is the hub-skew side: aggregate first
    (partial map-side combine on the big slice), then join the small
    (collection,title) dimension — never the other way around.
    """
    member_counts = (
        triples.where(F.col("p") == SKOS + "member")
        .groupBy(F.col("s").alias("collection"))
        .agg(F.count("o").alias("count"))
    )
    dim = skos_collection(triples)
    return F.broadcast(dim).join(member_counts, "collection").select(
        "collection", "title", "count"
    )


def bodc_find(
    triples: DataFrame,
    collections: List[str],
    regex: Optional[str] = None,
    language: str = "en",
    collection_base: str = "http://vocab.nerc.ac.uk/collection/{}/current/",
) -> DataFrame:
    """bodc-find.sparql — per-collection UNION of member⋈prefLabel⋈
    deprecated='false'⋈identifier, distinct, ordered by identifier."""
    pref = pred_slice(
        triples, SKOS + "prefLabel", "x", "pl", {"o_lang": "pl_lang"}
    )
    depr = pred_slice(triples, OWL + "deprecated", "x", "depr").where(
        F.col("depr") == "false"
    )
    ident = pred_slice(triples, DC + "identifier", "x", "dci")
    member = pred_slice(triples, SKOS + "member", "coll", "x")

    if not collections:
        raise ValueError(
            "bodc_find needs at least one collection (use '*' for all)"
        )
    branches = []
    for c in collections:
        if c == "*":
            m = member.select("x").distinct()
        else:
            m = member.where(
                F.col("coll") == collection_base.format(c)
            ).select("x")
        b = (
            m.join(pref, "x")
            .where(lang_matches(F.col("pl_lang"), language))
            .join(depr.select("x"), "x", "left_semi")
            .join(ident, "x")
        )
        if regex:
            b = b.where(ci_regex(F.col("pl"), regex))
        branches.append(b.select("x", "dci", "pl"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return (
        out.distinct()
        .select(
            F.col("x").alias("uri"),
            F.col("dci").alias("identifier"),
            F.col("pl").alias("prefLabel"),
        )
        .orderBy("identifier")
    )


def bodc_listing(
    triples: DataFrame,
    cc: str,
    lang: str = "en",
    N: Optional[int] = None,
    collection_base: str = "http://vocab.nerc.ac.uk/collection/{}/current/",
) -> DataFrame:
    """bodc-listing.sparql — members of one collection with pref/alt
    labels; lang-tagged altLabel is OPTIONAL (left join, J3)."""
    coll_uri = collection_base.format(cc)
    member = pred_slice(triples, SKOS + "member", "coll", "member").where(
        F.col("coll") == coll_uri
    )
    pref = pred_slice(
        triples, SKOS + "prefLabel", "member", "pref_lang_v", {"o_lang": "pl_lang"}
    ).where(lang_matches(F.col("pl_lang"), lang))
    ident = pred_slice(triples, DC + "identifier", "member", "id")
    alt_plain = pred_slice(
        triples, SKOS + "altLabel", "member", "alt", {"o_lang": "alt_l"}
    ).where(F.coalesce(F.col("alt_l"), F.lit("")) == "")
    depr = pred_slice(triples, OWL + "deprecated", "member", "depr")
    alt_lang = pred_slice(
        triples, SKOS + "altLabel", "member", "alt_lang_v", {"o_lang": "al_l"}
    ).where(lang_matches(F.col("al_l"), lang))

    out = (
        member.select("member")
        .join(pref.select("member", F.col("pref_lang_v").alias("pref_lang")), "member")
        .join(ident, "member")
        .join(alt_plain.select("member", "alt"), "member")
        .join(depr, "member")
        .join(
            alt_lang.select("member", F.col("alt_lang_v").alias("alt_lang")),
            "member",
            "left",
        )
        .select("id", "pref_lang", "alt_lang", "alt", "depr", "member")
    )
    return out.limit(N) if N is not None else out


def term_match_in_collection(
    triples: DataFrame, col_uri: str, term: str, N: Optional[int] = None
) -> DataFrame:
    """term-match-in-collection.sparql — regex match members' labels."""
    member = pred_slice(triples, SKOS + "member", "coll", "term").where(
        F.col("coll") == col_uri
    )
    pref = pred_slice(triples, SKOS + "prefLabel", "term", "lbl")
    out = (
        member.select("term")
        .join(pref, "term")
        .where(ci_regex(F.col("lbl"), term_regex(term)))
        .select("term", "lbl")
    )
    return out.limit(N) if N is not None else out


def term_regex(term: str) -> str:
    return term


def broader_terms(
    triples: DataFrame, term: str, language: Optional[str] = None
) -> DataFrame:
    """broader-terms.sparql — ?bterm ?blbl via skos:broader+ from a
    bound subject. Bound subject ⇒ the frontier starts at one node, so
    every round's join is broadcast-sized — an iterative BFS, NOT the
    whole-graph closure (which would pay O(n·depth) pairs to then keep
    a handful of rows; round-3 review fix makes the code match this
    docstring)."""
    edges = pred_slice(triples, SKOS + "broader", "src", "dst")
    edges = edges.localCheckpoint(eager=False)  # feeds every round
    seen = (
        edges.where(F.col("src") == F.lit(term))
        .select("dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = seen
    for _ in range(50):
        if frontier.isEmpty():
            break
        frontier = (
            frontier.withColumnRenamed("dst", "src")
            .join(edges, "src")
            .select("dst")
            .distinct()
            .join(seen, "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        seen = seen.unionByName(frontier).localCheckpoint(eager=True)
    b = seen.select(F.col("dst").alias("bterm"))
    pref = pred_slice(
        triples, SKOS + "prefLabel", "bterm", "blbl", {"o_lang": "bl_lang"}
    )
    out = b.join(pref, "bterm")
    if language:
        out = out.where(F.coalesce(F.col("bl_lang"), F.lit("")) == language)
    return out.select("bterm", "blbl")


def skos_broader_depth(triples: DataFrame) -> DataFrame:
    """skos-broader-depth.sparql — ?super ?sub count(?mid) as ?distance.

    ``?super broader* ?mid . ?mid broader+ ?sub`` counts the nodes on
    the path from super (inclusive) to sub (exclusive); on the tree
    shape that equals hop distance, computed directly by the closure's
    min-dist column — no second join needed.
    """
    closure = closure_from_triples(triples, SKOS + "broader")
    return (
        closure.select(
            F.col("src").alias("super"),
            F.col("dst").alias("sub"),
            F.col("dist").alias("distance"),
        )
        .orderBy("super", "sub")
    )
