"""Unit vectors for the xsd-format ladder — values mined from the
reference compliance context
(/root/reference/tests/commons/j2/test_j2_subyt_compliance.py:28-50)
and the function specs (j2_functions.py:44-357)."""

import pytest

from py_sema_spark.functions.xsd import (
    auto_format_any,
    format_boolean,
    format_date,
    format_datetime,
    format_double,
    format_gyear,
    format_gyearmonth,
    format_integer,
    format_string,
    unite,
    uri_format,
    xsd_format,
    ValueMapper,
    map_build,
)


class TestBoolean:
    @pytest.mark.parametrize(
        "val,expect",
        [
            (True, "'true'^^xsd:boolean"),
            (False, "'false'^^xsd:boolean"),
            ("true", "'true'^^xsd:boolean"),
            ("True", "'true'^^xsd:boolean"),
            ("", "'false'^^xsd:boolean"),
            ("0", "'false'^^xsd:boolean"),
            ("no", "'false'^^xsd:boolean"),
            ("off", "'false'^^xsd:boolean"),
            ("FALSE", "'false'^^xsd:boolean"),
            ("anything-else", "'true'^^xsd:boolean"),
            (1, "'true'^^xsd:boolean"),
        ],
    )
    def test_values(self, val, expect):
        assert format_boolean(val, "'") == expect

    def test_rejects_none_and_collections(self):
        for bad in (None, [], {}):
            with pytest.raises(TypeError):
                format_boolean(bad, "'")


class TestInteger:
    def test_roundtrip_ok(self):
        assert format_integer("1", "'") == "'1'^^xsd:integer"
        assert format_integer(42, '"') == '"42"^^xsd:integer'
        assert format_integer("-7", "'") == "'-7'^^xsd:integer"

    def test_non_roundtrip_raises(self):
        # "001" != str(int("001")) — reference raises (j2_functions.py:74-78)
        with pytest.raises(ValueError):
            format_integer("001", "'")

    def test_fb_fallback(self):
        assert xsd_format("001", "integer", fb="'x'") == "'x'"


class TestRealNumbers:
    def test_double(self):
        assert format_double("1.0", "'") == "'1.0'^^xsd:double"
        assert format_double(2.5, "'") == "'2.5'^^xsd:double"

    def test_float_negzero(self):
        assert xsd_format(-0.0, "float") == "'0.0'^^xsd:float"

    def test_nonfinite_rejected(self):
        with pytest.raises(ValueError):
            format_double(float("inf"), "'")
        with pytest.raises(ValueError):
            format_double(float("nan"), "'")


class TestDates:
    def test_date(self):
        assert format_date("1970-05-06", "'") == "'1970-05-06'^^xsd:date"

    def test_datetime_naive(self):
        assert (
            format_datetime("2025-09-25T17:00:00", "'")
            == "'2025-09-25T17:00:00'^^xsd:dateTime"
        )

    def test_datetime_tz(self):
        assert (
            format_datetime("2025-09-25T17:00:00+02:00", "'")
            == "'2025-09-25T17:00:00+02:00'^^xsd:dateTime"
        )

    def test_datetime_into_date_raises(self):
        import datetime

        with pytest.raises(TypeError):
            format_date(datetime.datetime(2020, 1, 1, 3), "'")

    def test_gyear(self):
        assert format_gyear("987", "'") == "'0987'^^xsd:gYear"
        assert format_gyear(-44, "'") == "'-0044'^^xsd:gYear"
        assert format_gyear(" 2024 ", "'") == "'2024'^^xsd:gYear"

    def test_gyearmonth(self):
        assert format_gyearmonth("1999-05", "'") == "'1999-05'^^xsd:gYearMonth"
        assert format_gyearmonth("-0044-03", "'") == "'-0044-03'^^xsd:gYearMonth"


class TestString:
    def test_escapes(self):
        # \ → \\ and quote → \quote (j2_functions.py:178-180)
        assert format_string("it's", "'") == r"'it\'s'^^xsd:string"
        assert format_string("a\\b", '"') == '"a\\\\b"^^xsd:string'

    def test_newline_long_quote(self):
        out = format_string("line1\nline2", "'")
        assert out == "'''line1\nline2'''^^xsd:string"

    def test_lang_suffix(self):
        assert xsd_format("hallo", "@nl") == "'hallo'@nl"
        assert xsd_format("hello", "@en", '"') == '"hello"@en'


class TestAutoLadder:
    @pytest.mark.parametrize(
        "val,expect",
        [
            (True, "'true'^^xsd:boolean"),
            ("true", "'true'^^xsd:boolean"),
            ("False", "'false'^^xsd:boolean"),
            (1, "'1'^^xsd:integer"),
            ("1", "'1'^^xsd:integer"),
            (1.0, "'1.0'^^xsd:double"),
            ("1.0", "'1.0'^^xsd:double"),
            ("-3", "'-3'^^xsd:integer"),
            ("2025-09-25T17:00:00", "'2025-09-25T17:00:00'^^xsd:dateTime"),
            ("1970-05-06", "'1970-05-06'^^xsd:date"),
            ("1999-05", "'1999-05'^^xsd:gYearMonth"),
            ("1999", "'1999'^^xsd:integer"),  # number gate runs before date
            ("", "''^^xsd:string"),
            (" ", "' '^^xsd:string"),
            ("https://example.com/x", "'https://example.com/x'^^xsd:anyURI"),
            ("plain words", "'plain words'^^xsd:string"),
        ],
    )
    def test_auto_any(self, val, expect):
        assert auto_format_any(val, "'") == expect

    def test_auto_date_ladder(self):
        assert xsd_format("1999", "auto-date") == "'1999'^^xsd:gYear"
        assert xsd_format("1999-05", "auto-date") == "'1999-05'^^xsd:gYearMonth"

    def test_dispatch_normalization(self):
        # bare names get the xsd: prefix; case-insensitive
        assert xsd_format("x", "string") == "'x'^^xsd:string"
        assert xsd_format(2024, "YYYY") == "'2024'^^xsd:gYear"
        assert xsd_format("7", "Integer") == "'7'^^xsd:integer"

    def test_unknown_type_asserts(self):
        with pytest.raises(AssertionError):
            xsd_format("x", "nosuchtype")

    def test_bad_quote_asserts(self):
        with pytest.raises(AssertionError):
            xsd_format("x", "string", "`")


class TestUriFormat:
    def test_wraps(self):
        assert uri_format("https://ex.org/a") == "<https://ex.org/a>"

    def test_cleans(self):
        # space percent-quoted; safe set preserved (clean.py:89)
        assert uri_format("https://ex.org/a b") == "<https://ex.org/a%20b>"
        assert uri_format("https://ex.org/a?x=1;y=2") == "<https://ex.org/a?x=1;y=2>"


class TestUnite:
    def test_happy(self):
        assert unite("a", "b", sep=" ") == "a b"

    def test_falsy_gives_fallback(self):
        assert unite("a", "", "c") == ""
        assert unite("a", None, fb="FB") == "FB"

    def test_too_many_strings(self):
        assert unite("a", "b", "c", "d", n=3) == ""

    def test_nonstring_truthy_ignored_in_join(self):
        assert unite("a", 5, "b") == "a b"


class TestValueMapper:
    def test_build_and_apply(self):
        vm = map_build(
            [{"k": "BE", "v": "Belgium"}, {"k": "FR", "v": "France"}], "k", "v"
        )
        rec = {"code": "BE"}
        vm.apply(rec, "code", "country", fallback="?")
        assert rec["country"] == "Belgium"

    def test_duplicate_distinct_value_asserts(self):
        vm = ValueMapper()
        vm.add("k", 1)
        vm.add("k", 1)  # same value ok
        with pytest.raises(AssertionError):
            vm.add("k", 2)

    def test_refuses_overwrite(self):
        vm = map_build([{"k": "a", "v": 1}], "k", "v")
        with pytest.raises(AssertionError):
            vm.apply({"k": "a", "t": 0}, "k", "t")


class TestReviewRegressions:
    """Round-3 adversarial-review fixes (reference parity verified
    against j2_functions.py this round)."""

    def test_jinja_undefined_raises_not_silent_empty(self):
        from jinja2 import Environment

        from py_sema_spark.functions.xsd import (
            format_boolean,
            format_string,
            xsd_format,
        )

        undef = Environment().from_string("").environment.undefined(name="naem")
        with pytest.raises(TypeError):
            format_string(undef, "'")
        with pytest.raises(TypeError):
            format_boolean(undef, "'")
        # and the fb fallback still applies through the dispatcher
        assert xsd_format(undef, "xsd:string", fb="'x'^^xsd:string") == (
            "'x'^^xsd:string"
        )

    def test_auto_number_bool_keeps_reference_lexical_form(self):
        from py_sema_spark.functions.xsd import auto_format_number

        # the reference's int branch keeps the bool object: str(True)
        assert auto_format_number(True, "'") == "'True'^^xsd:integer"
        assert auto_format_number(False, "'") == "'False'^^xsd:integer"

    def test_boolean_col_null_passthrough(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.functions.xsd import xsd_boolean_col

        df = spark.createDataFrame(
            [("yes",), (None,), ("0",)], "v string"
        ).select(xsd_boolean_col(F.col("v")).alias("lit"))
        assert [r["lit"] for r in df.collect()] == [
            "'true'^^xsd:boolean", None, "'false'^^xsd:boolean"
        ]
