"""Randomized serializer↔parser round-trips.

The fixed-fixture round-trips (test_syncfs_serialize.py) pin the
happy path; this suite fuzzes the TERM space — literals containing
quotes, backslashes, newlines, tabs, unicode (incl. astral plane),
language tags, datatype IRIs, IRIs with percent/unicode characters,
and blank nodes — through every serializer we emit (N-Triples,
Turtle, JSON-LD) and back through our own parsers, asserting exact
triple-set equality. Any escaping asymmetry between a serializer and
its parser shows up as a diff with the seed + offending triple.
"""

import random

import pytest
from pyspark.sql import functions as F

from py_sema_spark.model import TRIPLE_SCHEMA

LIT_POOL = [
    "plain",
    'quote " inside',
    "back\\slash",
    "line\nbreak",
    "tab\there",
    "both \"quo\" and \\ and \r cr",
    "unicode é ✓ 中",
    "astral \U0001f600 pair",
    "",
    "   padded   ",
    "ends with backslash \\",
    '"',
    "'single' quotes",
    "trailing newline\n",
]
LANGS = [None, "en", "fr", "en-GB"]
# plain literals carry explicit xsd:string — the parser-family
# canonical form (every parser materializes it so cross-format dedup
# on the 6-column key sees one representation; serializers omit it)
DATATYPES = [
    "http://www.w3.org/2001/XMLSchema#string",
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#date",
    "http://example.org/custom#dt",
]
IRIS = [
    "http://example.org/a",
    "http://example.org/path/with%20escape",
    "http://example.org/uni/é",
    "urn:uuid:0000",
    "http://example.org/q?x=1&y=2",
    "http://example.org/frag#f",
]
PREDS = [f"http://example.org/p{i}" for i in range(4)]


def rand_triples(rng, with_bnodes=True):
    rows = set()
    for _ in range(rng.randrange(4, 16)):
        s = rng.choice(IRIS + (["_:b0", "_:b1"] if with_bnodes else []))
        p = rng.choice(PREDS)
        r = rng.random()
        if r < 0.55:
            lang = rng.choice(LANGS)
            dt = None if lang else rng.choice(DATATYPES)
            rows.add((s, p, rng.choice(LIT_POOL), "literal", dt, lang))
        elif r < 0.85 or not with_bnodes:
            rows.add((s, p, rng.choice(IRIS), "iri", None, None))
        else:
            rows.add((s, p, rng.choice(["_:b0", "_:b1"]), "bnode", None, None))
    return sorted(rows)


def as_set(rows_or_df):
    if hasattr(rows_or_df, "collect"):
        return {tuple(r) for r in rows_or_df.collect()}
    return set(rows_or_df)


def parsed_set(text, fmt_expect):
    from py_sema_spark.rdf.parse import parse_rdf_auto

    ts, fmt = parse_rdf_auto(text)
    # NT is a Turtle subset, so the reference fallback chain (turtle
    # first) may legitimately win with either format
    allowed = {fmt_expect, "turtle"} if fmt_expect == "nt" else {fmt_expect}
    assert fmt in allowed, f"format fallback picked {fmt}"
    return {
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
        for t in ts
    }


@pytest.mark.parametrize("seed", range(12))
def test_ntriples_roundtrip_fuzz(spark, seed):
    from py_sema_spark.serialize import ntriples_lines

    rows = rand_triples(random.Random(seed))
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    text = "\n".join(r["line"] for r in ntriples_lines(df).collect())
    assert parsed_set(text, "nt") == set(rows), f"seed={seed}\n{text}"


@pytest.mark.parametrize("seed", range(12))
def test_turtle_roundtrip_fuzz(spark, seed):
    from py_sema_spark.serialize import turtle_text

    rows = rand_triples(random.Random(100 + seed))
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    text = turtle_text(df)
    assert parsed_set(text, "turtle") == set(rows), f"seed={seed}\n{text}"


@pytest.mark.parametrize("seed", range(12))
def test_jsonld_roundtrip_fuzz(spark, seed):
    from py_sema_spark.serialize import jsonld_document

    rows = rand_triples(random.Random(200 + seed))
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    doc = jsonld_document(df)
    assert parsed_set(doc, "json-ld") == set(rows), f"seed={seed}\n{doc}"
