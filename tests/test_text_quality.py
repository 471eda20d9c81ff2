"""Gopher-style quality metrics + PII scrub (functions/text.py) —
targeted fixtures for the repetition/symbol/alpha signals and the
redaction chain (the driver oracles `gopher_quality`/`pii_scrub`
cover the corpus-wide agreement; these pin the edge semantics)."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.functions.text import (
    PII_PATTERNS,
    gopher_metrics,
    gopher_pass,
    pii_counts,
    pii_redact,
)

GOOD = (
    "The quick brown fox jumps over the lazy dog near the river bank.\n"
    "It is a fine day in the valley and the birds sing with joy."
)
REPETITIVE = "buy now\nbuy now\nbuy now\nbuy now\nonly today"
SYMBOLIC = "### menu ### home ### about ### contact ... more ... links"
NUMERIC = "12 34 56 78 90 11 22 33 44 55"


def _metrics(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    m = gopher_metrics(F.col("text"))
    row = df.select(*m.values(), gopher_pass(F.col("text"))).first()
    return row.asDict()


def test_good_text_passes(spark):
    m = _metrics(spark, GOOD)
    assert m["gopher_pass"] is True
    assert m["n_words"] == 27
    assert m["dup_line_frac"] == 0.0
    assert m["frac_alpha_words"] > 0.9
    assert m["stop_hits"] >= 2


def test_repetitive_lines_fail(spark):
    m = _metrics(spark, REPETITIVE)
    # 5 non-empty lines, 2 distinct → 0.6 duplicated
    assert m["dup_line_frac"] == pytest.approx(0.6)
    assert m["gopher_pass"] is False


def test_symbol_heavy_fails(spark):
    m = _metrics(spark, SYMBOLIC)
    assert m["symbol_word_ratio"] > 0.1
    assert m["gopher_pass"] is False


def test_numeric_text_fails_alpha_gate(spark):
    m = _metrics(spark, NUMERIC)
    assert m["frac_alpha_words"] == 0.0
    assert m["gopher_pass"] is False


def test_empty_text_is_safe(spark):
    m = _metrics(spark, "")
    assert m["n_words"] == 0
    assert m["dup_line_frac"] == 0.0
    assert m["gopher_pass"] is False


def test_pii_redact_and_counts(spark):
    text = (
        "Mail alice.smith+spam@sub.example.co.uk or bob@ex.io, "
        "ssh to 192.168.0.254 (not 999.999.999.9999), "
        "call +1-202-555-0176 or 31-020-555-1234."
    )
    df = spark.createDataFrame([(text,)], "text string")
    c = pii_counts(F.col("text"))
    row = df.select(
        pii_redact(F.col("text")), c["email"], c["ip"], c["phone"]
    ).first()
    assert row["n_email"] == 2
    assert row["n_phone"] == 2
    red = row["redacted"]
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    assert "alice" not in red and "bob@" not in red
    assert "192.168.0.254" not in red
    assert "+1-202-555-0176" not in red and "31-020-555-1234" not in red


def test_frac_alpha_is_unicode_aware(spark):
    # \p{L}, not [A-Za-z]: a clean Greek document must not be dropped
    # by the alpha-word gate
    m = _metrics(spark, "Καλημέρα κόσμε από την Ελλάδα σήμερα πάλι εδώ")
    assert m["frac_alpha_words"] == 1.0


def test_pii_counts_agree_with_redaction_on_overlap(spark):
    # a phone-like run inside an e-mail local part is ONE e-mail and
    # ZERO phones — counts follow the sequential redaction chain
    text = "write bob.1-555-123-4567@mail.com today"
    df = spark.createDataFrame([(text,)], "text string")
    c = pii_counts(F.col("text"))
    row = df.select(
        pii_redact(F.col("text")), c["email"], c["phone"]
    ).first()
    assert row["n_email"] == 1 and row["n_phone"] == 0
    assert row["redacted"] == "write <EMAIL> today"


def test_phone_never_matches_mid_digit_run(spark):
    # \b after the optional '+' — the tail of a longer digit run must
    # not be partially redacted, while a real phone still is
    df = spark.createDataFrame(
        [("ref 98765-123-456-7890 code", "call +1-555-123-4567 now")],
        "a string, b string",
    )
    row = df.select(
        pii_redact(F.col("a")).alias("a"),
        pii_redact(F.col("b")).alias("b"),
    ).first()
    assert row["a"] == "ref 98765-123-456-7890 code"
    assert row["b"] == "call <PHONE> now"


def test_pii_order_ip_before_phone(spark):
    # a dotted quad must become <IP>, not be nibbled by the phone rule
    df = spark.createDataFrame([("host 10.1.2.3 up",)], "text string")
    assert df.select(pii_redact(F.col("text"))).first()[0] == "host <IP> up"


def test_patterns_have_no_lookaround():
    # the oracle runs the same patterns under RE2 — keep to the
    # common syntax subset
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?<" not in pat and "(?!" not in pat


class TestLineDedup:
    DOCS = [
        (1, "alpha beta\ncommon footer\nunique one"),
        (2, "common footer\nunique two"),
        (3, "  common footer  \nalpha beta\nunique three"),
        (4, "\n\n"),           # only empty lines → vanishes
        (5, "unique five"),
    ]

    def _run(self, spark):
        from py_sema_spark.operators.dedup import line_dedup

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        return {
            r["doc_id"]: r.asDict() for r in line_dedup(df).collect()
        }

    def test_first_occurrence_survives(self, spark):
        out = self._run(spark)
        assert out[1]["clean_text"] == "alpha beta\ncommon footer\nunique one"
        assert out[1]["n_removed"] == 0

    def test_later_copies_removed(self, spark):
        out = self._run(spark)
        assert out[2]["clean_text"] == "unique two"
        assert out[2]["n_removed"] == 1
        # trim-insensitive match, original spacing kept only at the
        # surviving first occurrence
        assert out[3]["clean_text"] == "unique three"
        assert out[3]["n_removed"] == 2

    def test_counts_and_empty_docs(self, spark):
        out = self._run(spark)
        assert 4 not in out  # all-empty doc has no rows
        assert out[5] == {
            "doc_id": 5, "clean_text": "unique five",
            "n_lines": 1, "n_removed": 0,
        }
