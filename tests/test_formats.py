"""Port of TestTimestampFormatConverter (src/test/java/.../TestTimestampFormatConverter.java)
plus tokenizer / Spark-pattern-lowering unit tests (no Spark session needed)."""

import pytest

from embulk_filter_timestamp_format_spark.functions import formats as FT
from embulk_filter_timestamp_format_spark.functions.formats import (
    RUBY_TO_JAVA_FORMAT_TABLE,
    parse_format,
    ruby_to_java_format,
    to_spark_parse_pattern,
)


# --- TestTimestampFormatConverter.testToJavaFormat:57-65 -------------------
def test_to_java_format_table_entries():
    for key, java in RUBY_TO_JAVA_FORMAT_TABLE.items():
        assert ruby_to_java_format("%-2" + key) == java


# --- testToJavaFormats:67-109 ----------------------------------------------
@pytest.mark.parametrize(
    "ruby,java",
    [
        ("%Y-%m-%d %H:%M:%S.%6N %:z", "yyyy-MM-dd HH:mm:ss.nnnnnnnnn Z"),
        ("%Y-%m-%d %H:%M:%S.%6N UTC", "yyyy-MM-dd HH:mm:ss.nnnnnnnnn 'UTC'"),
        ("%Y-%m-%d %H:%M:%S.%6N +00:00", "yyyy-MM-dd HH:mm:ss.nnnnnnnnn '+00:00'"),
    ],
)
def test_to_java_formats(ruby, java):
    assert ruby_to_java_format(ruby) == java


def test_give_up_rule():
    # unconvertible directive survives as % → None (keep ruby)
    assert ruby_to_java_format("%Y %s") is None
    assert ruby_to_java_format("%k:%M") is None  # %k not in table (" 9" fails HH)


# --- tokenizer behaviors -----------------------------------------------------
def test_ruby_tokenizer_composites():
    pf = parse_format("%F %T")
    kinds = [t.kind for t in pf.tokens if t.kind != FT.LIT]
    assert kinds == [FT.Y4, FT.MONTH_NUM, FT.DAY_NUM, FT.H24, FT.MINUTE, FT.SECOND]


def test_ruby_tokenizer_fraction_width():
    assert parse_format("%N").tokens[0].digits == 9
    assert parse_format("%N").tokens[0].variable
    t6 = parse_format("%6N").tokens[0]
    assert t6.digits == 6 and not t6.variable
    assert parse_format("%L").tokens[0].digits == 3


def test_ruby_tokenizer_tz_styles():
    assert parse_format("%z").tokens[0].style == ""
    assert parse_format("%:z").tokens[0].style == ":"
    assert parse_format("%::z").tokens[0].style == "::"


def test_java_tokenizer_quoted_literals_and_nano():
    pf = parse_format("yyyy-MM-dd'T'HH:mm:ss.nnnnnnnnn 'UTC'")
    lits = [t.text for t in pf.tokens if t.kind == FT.LIT]
    assert "T" in lits and "UTC" in lits
    assert pf.java_nano_hack and not pf.java_micro_hack
    pf6 = parse_format("yyyy-MM-dd HH:mm:ss.nnnnnn Z")
    assert pf6.java_micro_hack and not pf6.java_nano_hack


def test_dialect_detection():
    assert parse_format("%Y-%m-%d").dialect == "ruby"
    assert parse_format("yyyy-MM-dd").dialect == "java"


# --- Spark-pattern lowering (the fast-path classifier) -----------------------
def test_spark_pattern_lowering():
    assert to_spark_parse_pattern(parse_format("%Y-%m-%d %H:%M:%S")) == "yyyy-MM-dd HH:mm:ss"
    assert to_spark_parse_pattern(parse_format("yyyy-MM-dd HH:mm:ss")) == "yyyy-MM-dd HH:mm:ss"
    # variable fractions / ruby %z (matches zone names) / %s are NOT lowered
    assert to_spark_parse_pattern(parse_format("%Y-%m-%d %H:%M:%S.%N")) is None
    assert to_spark_parse_pattern(parse_format("%Y-%m-%d %z")) is None
    assert to_spark_parse_pattern(parse_format("%s")) is None


def test_jsonpath_validation():
    from embulk_filter_timestamp_format_spark.functions.jsonpath import (
        JsonPathError,
        parse_jsonpath,
        root_column,
    )

    assert parse_jsonpath("$.a.b[0].c") == ("a", "b", 0, "c")
    assert parse_jsonpath("$['a']['b'][0]['c']") == ("a", "b", 0, "c")
    assert parse_jsonpath("$.a[*].c") == ("a", "*", "c")
    assert root_column("$.rec.x") == "rec"
    for bad in ["$..a", "$.a[?(@.b)]", "$.a[0:2]", "$.a[0,1]", "$.a.min()", "a.b"]:
        with pytest.raises(JsonPathError):
            parse_jsonpath(bad)
