"""The round-4 driver failure class: a DuckDB oracle whose values are
canonically equal to Spark's but whose *dtype* differs (HUGEINT -> float64)
must be flagged by the harness before the driver's hash splits them.
Seeds the exact fixture from VERDICT.md round 4 item #1."""
import duckdb
import pandas as pd
import pytest

from tools_oracle_check import dtype_flag, dtype_report


def test_hugeint_window_sum_materializes_float64_and_is_flagged():
    # The real round-4 repro: sum(BIGINT) OVER (...) yields HUGEINT in
    # DuckDB, pandas materializes it float64 even with zero nulls.
    con = duckdb.connect()
    ddf = con.execute(
        """
        SELECT g, coalesce(sum(n) OVER (PARTITION BY g ORDER BY g
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
        FROM (VALUES (1, 10::BIGINT), (1, 20::BIGINT), (2, 5::BIGINT)) v(g, n)
        """
    ).fetch_df()
    assert ddf["strt"].dtype.kind == "f", "fixture should reproduce the HUGEINT->float64 leak"
    flag = dtype_flag("bigint", ddf["strt"])
    assert flag is not None and "HUGEINT" in flag


def test_cast_bigint_clears_the_flag():
    con = duckdb.connect()
    ddf = con.execute(
        """
        SELECT CAST(coalesce(sum(n) OVER (ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS strt
        FROM (VALUES (10::BIGINT), (20::BIGINT)) v(n)
        """
    ).fetch_df()
    assert ddf["strt"].dtype.kind in ("i", "u")
    assert dtype_flag("bigint", ddf["strt"]) is None


def test_null_driven_float_widening_is_not_flagged():
    s = pd.Series([1.0, None, 3.0])
    assert dtype_flag("bigint", s) is None


def test_decimal_object_leak_is_flagged():
    from decimal import Decimal

    s = pd.Series([Decimal("1"), Decimal("2")])
    assert dtype_flag("bigint", s) is not None


def test_int_where_double_expected_is_flagged():
    s = pd.Series([1, 2, 3])
    assert dtype_flag("double", s) is not None
    assert dtype_flag("bigint", s) is None


def test_dtype_report_names_the_column():
    df = pd.DataFrame({"ok": [1, 2], "leak": [0.0, 1.0]})
    flags = dtype_report([("ok", "bigint"), ("leak", "bigint")], df)
    assert len(flags) == 1 and flags[0].startswith("leak:")


@pytest.mark.parametrize("styp", ["string", "timestamp", "array<bigint>"])
def test_unchecked_types_never_flag(styp):
    s = pd.Series(["a", "b"])
    assert dtype_flag(styp, s) is None
