"""The reference's subyt golden-corpus run, verbatim.

Re-runs /root/reference/tests/subyt/test_generator.py:11-129 against
our Spark generator: every template in ``templates/`` (incl. the
macro-driven ``11-schemadriven.ttl``) is rendered over the real
``in/`` sources and part-compared with the committed ``out/`` goldens
— byte-compatibility (modulo the reference's own ``.strip()`` per
part) with templates written for py-sema.

Harness semantics re-derived from test_generator.py:
- inputs keyed by the name segment after '_' (``data.csv`` → ``_``,
  ``data_team.json`` → ``team``, the ``data_glob`` folder replaced by
  a ``data_glob/*.json`` glob source keyed ``glob``);
- generator settings come from the template name's indicator
  (``*_no-it.*`` → collection mode);
- expected parts split on '#'-prefixed lines, compared stripped;
- ``vars_dict={"my_domain": "realexample.org"}``.
"""

from pathlib import Path

import pytest

from py_sema_spark.subyt.engine import (
    GeneratorSettings,
    SparkSubyt,
    render_collection,
)
from py_sema_spark.subyt.sources import collect_set, make_source_df

REF = Path("/root/reference/tests/subyt")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference fixtures not available"
)

VARS = {"my_domain": "realexample.org"}


def get_expected_parts(outfile: Path):
    """Parts of a golden file, split on '#'-prefixed lines
    (test_generator.py:50-61 semantics)."""
    parts = [""]
    n = 0
    for line in outfile.read_text().splitlines(keepends=True):
        if not line.startswith("#"):
            parts[n] = parts[n] + line
        else:
            if len(parts[n]) > 0:
                parts.append("")
                n += 1
    return parts


def indicator_from_name(name: str, fallback=None):
    if name == "data_glob/*.json":
        return "glob"
    stem = Path(name).stem
    return stem[stem.index("_") + 1 :] if "_" in stem else fallback


def template_names():
    if not REF.exists():
        return []
    return sorted(p.name for p in (REF / "templates").iterdir() if p.is_file())


@pytest.fixture(scope="module")
def inputs(spark):
    inp = REF / "in"
    names = [p.name for p in inp.iterdir() if p.name != "data_glob"]
    names.append("data_glob/*.json")
    out = {}
    for nm in names:
        key = indicator_from_name(nm, fallback="_")
        out[key] = make_source_df(spark, str(inp / nm)).persist()
    return out


@pytest.fixture(scope="module")
def sets_dict(inputs):
    return {k: collect_set(df) for k, df in inputs.items()}


@pytest.mark.parametrize("tpl_name", template_names())
def test_reference_golden(spark, inputs, sets_dict, tpl_name):
    settings = GeneratorSettings(indicator_from_name(tpl_name))
    expected = get_expected_parts(REF / "out" / tpl_name)
    src = (REF / "templates" / tpl_name).read_text()
    if settings.iteration:
        gen = SparkSubyt(
            src,
            order_by=["_ord"],
            sets=sets_dict,
            variables=VARS,
            settings=settings,
            templates_folder=str(REF / "templates"),
        )
        rows = gen.process(inputs["_"]).orderBy("idx").collect()
        parts = [r["part"] for r in rows]
    else:
        parts = [
            render_collection(
                src,
                sets_dict,
                variables=VARS,
                settings=settings,
                templates_folder=str(REF / "templates"),
            )
        ]
    assert len(parts) == len(expected), (
        f"{tpl_name}: {len(parts)} parts rendered, "
        f"{len(expected)} in golden"
    )
    for i, (got, want) in enumerate(zip(parts, expected)):
        assert got.strip() == want.strip(), (
            f"{tpl_name} part {i} mismatch:\n--- got ---\n{got.strip()}\n"
            f"--- want ---\n{want.strip()}"
        )


class TestUniqueFilterFixedPoints:
    """The reference's executed FilteringSource assertions
    (tests/subyt/test_unique_filter_source.py:55-103) on its own data
    files: 246 countries; 27 first-per-leading-char countries in
    source order; 3 first-per-orcid-prefix team members by name."""

    def test_countries_count_and_leadchar_uniques(self, spark):
        path = str(REF / "in" / "data_countries.csv")
        full = make_source_df(spark, path)
        assert full.count() == 246
        uniq = make_source_df(
            spark, path,
            unique_pattern="{English short name lower case:1}",
        )
        rows = collect_set(uniq)
        expected_leadchars = "AÅBCDEFGHIJKLMNOPQRSTUVWYZ"
        assert len(rows) == len(expected_leadchars)
        for i, ch in enumerate(expected_leadchars):
            assert rows[i]["English short name lower case"].startswith(ch)

    def test_team_orcid_prefix_uniques(self, spark):
        path = str(REF / "in" / "data_team.json")
        full = make_source_df(spark, path)
        assert full.count() == 5
        uniq = make_source_df(spark, path, unique_pattern="{orcid:9}")
        rows = collect_set(uniq)
        assert len(rows) == 3
        expected_names = [
            "Cedric Decruw",
            "Katrina Exter",
            "Laurian Van Maldeghem",
        ]
        for i in range(3):
            assert rows[i]["orcid"].startswith(f"0000-000{i + 1}")
            assert rows[i]["name"] == expected_names[i]
