"""Manifest-driven SPARQL evaluation vectors (VERDICT r04 #6).

The suite at ``tests/w3c/sparql/manifest.ttl`` is a checked-in subset
in the public ``w3c/rdf-tests`` on-disk format (mf:/qt: manifest,
.rq query files, Turtle data, rs:-vocabulary expected results) —
transcribed by area from the published data-r2 / sparql11 evaluation
suites (this sandbox has no network; every expected answer follows
from the SPARQL 1.1 spec text for the given data). Unlike the
hand-written vectors in test_sparql_w3c.py, coverage here scales by
adding declarative entries, and the repo's OWN Turtle parser loads
manifest, data, and results — the same wiring a real conformance
runner would use against the full W3C checkout.

Exclusions are per-entry with reasons (SKIP dict), mirroring the
suite-level skip-list documented in test_sparql_w3c.py.
"""

from pathlib import Path

import pytest

from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.queries.bgp import sparql_query
from w3c_manifest import (
    compare_select,
    load_manifest,
    load_result_set,
    parse_file,
)

MANIFEST = Path(__file__).parent / "w3c" / "sparql" / "manifest.ttl"

# name -> reason; entries listed here are collected but skipped.
SKIP: dict = {}

ENTRIES = load_manifest(MANIFEST)


def _data_df(spark, path: Path):
    rows = [
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
        for t in parse_file(path).triples
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_manifest_loaded():
    assert len(ENTRIES) >= 50
    assert all(
        e.type.endswith(("QueryEvaluationTest", "NegativeSyntaxTest11"))
        for e in ENTRIES
    )
    assert all("query" in e.action for e in ENTRIES)


@pytest.mark.parametrize("entry", ENTRIES, ids=[e.name for e in ENTRIES])
def test_w3c_sparql(spark, entry):
    if entry.name in SKIP:
        pytest.skip(SKIP[entry.name])
    if entry.type.endswith("NegativeSyntaxTest11"):
        # invalid query text must be rejected loudly, never compiled
        # to a silently-wrong plan (the engine raises ValueError for
        # out-of-subset syntax too, which is also a pass here)
        empty = spark.createDataFrame([], TRIPLE_SCHEMA)
        with pytest.raises(Exception):
            sparql_query(
                empty, entry.action["query"].read_text()
            ).collect()
        return
    data = _data_df(spark, entry.action["data"])
    query = entry.action["query"].read_text()
    expected = load_result_set(entry.result)
    out = sparql_query(data, query)
    if expected.boolean is not None:
        got = out.collect()
        assert len(got) == 1 and got[0][0] is expected.boolean, (
            f"{entry.name}: ASK returned {got}, expected {expected.boolean}"
        )
        return
    rows = out.collect()
    mismatch = compare_select(rows, expected)
    assert mismatch is None, f"{entry.name} ({entry.comment}): {mismatch}"
