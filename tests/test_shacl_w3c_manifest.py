"""Manifest-driven SHACL-core vectors (VERDICT r04 #6).

``tests/w3c/shacl/manifest.ttl`` is a checked-in subset in the public
``w3c/data-shapes`` on-disk format (sht:Validate entries whose
mf:result is an inline sh:ValidationReport) — transcribed by
constraint-component area from the published core suite (no network
in this sandbox; each expected report follows from the SHACL spec for
the given data+shapes). The repo's own Turtle parser loads manifest,
data graph, and shapes graph, and the expected report is compared on
(focusNode, resultPath, sourceConstraintComponent) + sh:conforms —
the same projection the data-shapes suite checks.

Exclusions are per-entry with reasons (SKIP dict); suite-level
exclusions (sh:sparql, entailment, owl:imports) are documented in
test_shacl_w3c.py and apply here unchanged.
"""

from pathlib import Path

import pytest

from py_sema_spark.model import TRIPLE_SCHEMA
from py_sema_spark.shacl import parse_shapes_ttl, validate
from w3c_manifest import load_manifest, load_validation_report, parse_file

MANIFEST = Path(__file__).parent / "w3c" / "shacl" / "manifest.ttl"

SKIP: dict = {}

ENTRIES = load_manifest(MANIFEST)


def _data_df(spark, path: Path):
    rows = [
        (t.s.value, t.p.value, t.o.value, t.o.kind, t.o.datatype, t.o.lang)
        for t in parse_file(path).triples
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_manifest_loaded():
    assert len(ENTRIES) >= 20
    assert all(e.type.endswith("Validate") for e in ENTRIES)
    assert all(
        "dataGraph" in e.action and "shapesGraph" in e.action
        for e in ENTRIES
    )


@pytest.mark.parametrize("entry", ENTRIES, ids=[e.name for e in ENTRIES])
def test_w3c_shacl(spark, entry):
    if entry.name in SKIP:
        pytest.skip(SKIP[entry.name])
    data = _data_df(spark, entry.action["dataGraph"])
    shapes = parse_shapes_ttl(entry.action["shapesGraph"].read_text())
    expected = load_validation_report(entry.result)
    rows = validate(data, shapes).collect()
    got = {(r["focus"], r["path"], r["constraint"]) for r in rows}
    want = set(expected.results)
    assert got == want, (
        f"{entry.name} ({entry.comment}): engine={sorted(got)} "
        f"expected={sorted(want)}"
    )
    assert (len(rows) == 0) == expected.conforms, (
        f"{entry.name}: conforms mismatch"
    )
