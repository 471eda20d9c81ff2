"""Golden-triple-set regression gate: the extraction pipeline must
reproduce tests/golden/corpus500.nt exactly (the P/R ≥ 0.95 BASELINE
metric, held at 1.0 on the deterministic fixture corpus)."""


def test_extraction_matches_golden(spark):
    import tools.pr_check as prc

    with open(prc.GOLDEN) as f:
        golden = set(ln for ln in f.read().splitlines() if ln)
    got = set(prc.current_lines(spark))
    tp = len(got & golden)
    assert tp / len(got) == 1.0, sorted(got - golden)[:5]
    assert tp / len(golden) == 1.0, sorted(golden - got)[:5]
