"""Unicode text-normalization operator (operators/normalize.py)."""

import unicodedata

import duckdb
import pytest

from py_sema_spark.operators.normalize import (
    normalize_sql_expr,
    normalize_string,
    normalize_text,
)


class TestNormalizeString:
    def test_nfc_folds_decomposed(self):
        assert normalize_string("Café") == "Café"

    def test_crlf_and_cr_become_lf(self):
        assert normalize_string("a\r\nb\rc") == "a\nb\nc"

    def test_controls_stripped_tab_newline_kept(self):
        assert normalize_string("x\x07y\x00z\nq") == "xyz\nq"

    def test_nbsp_and_hspace_collapse(self):
        assert normalize_string("a b\t\t c   d") == "a b c d"

    def test_trims_spaces_not_newlines(self):
        # only spaces trim at the ends — a leading/trailing newline is
        # document structure, not padding (and DuckDB trim(x, ' ')
        # behaves the same way, which the oracle twin relies on)
        assert normalize_string("  x  ") == "x"
        assert normalize_string("\nx\n") == "\nx\n"

    def test_idempotent(self):
        cases = ["Café \t x\r\n", "a b", "  q  ", "ﬁne ① text"]
        for c in cases:
            once = normalize_string(c)
            assert normalize_string(once) == once

    def test_nfc_not_nfkc(self):
        # compatibility characters survive (ligature fi, circled one):
        # normalization must not rewrite meaning, only representation
        assert normalize_string("ﬁ ①") == "ﬁ ①"

    def test_matches_duckdb_twin(self):
        con = duckdb.connect()
        expr = normalize_sql_expr("t")
        cases = [
            "Café au lait",
            "a\r\nb\rc",
            "x\x07y\x00z",
            "a b",
            "  lots\t\tof   space  ",
            "q̣̇ canonical ordering",
            "中文 \U0001f600",
            "",
        ]
        for c in cases:
            db = con.execute(
                f"select {expr} from (select ? as t)", [c]
            ).fetchone()[0]
            assert db == normalize_string(c), repr(c)


class TestNormalizeText:
    def test_dataframe_pass(self, spark):
        df = spark.createDataFrame(
            [
                (1, "Café\t x\r\n"),
                (2, "clean"),
                (3, None),
            ],
            "id int, text string",
        )
        out = {
            r["id"]: (r["text_norm"], r["was_changed"])
            for r in normalize_text(df).collect()
        }
        assert out[1] == ("Café x\n", True)
        assert out[2] == ("clean", False)
        assert out[3] == (None, None)

    def test_custom_form_and_out_col(self, spark):
        df = spark.createDataFrame([(1, "ﬁne")], "id int, text string")
        row = normalize_text(df, out_col="t2", form="NFKC").collect()[0]
        assert row["t2"] == "fine"
        assert unicodedata.is_normalized("NFKC", row["t2"])

    def test_exact_dedup_sees_nfc_equal_duplicates(self, spark):
        # the motivating composition: byte-distinct, NFC-equal rows
        # hash identically after the pass
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "Café"), (2, "Café")], "id int, text string"
        )
        hashes = (
            normalize_text(df)
            .select(F.md5("text_norm").alias("h"))
            .distinct()
            .count()
        )
        assert hashes == 1
