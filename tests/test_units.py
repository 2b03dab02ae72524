"""Port of the reference's TestTimestampUnit (src/test/java/.../TestTimestampUnit.java)
against all three kernel forms (scalar, numpy, Column expression).

Same constants: epoch 1462087147.100200300 (long tests) and
1462087147100200192 (double tests, float64-representable). Scalar and
numpy forms are asserted per-case; the Column form is asserted for ALL
cases in one Spark job per kernel family (keeps the suite fast).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.functions import units as U
from embulk_filter_timestamp_format_spark.functions.units import TimestampUnit as TU

EPOCH_NANOS = 1462087147100200300
EPOCH_NANOS_F = 1462087147100200192  # exactly representable in float64
UNITS = [TU.SECOND, TU.MILLISECOND, TU.MICROSECOND, TU.NANOSECOND]


# ---------------------------------------------------------------------------
# scalar + numpy forms, per reference test case
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "unit,expect_nano",
    [(TU.SECOND, 0), (TU.MILLISECOND, 100000000), (TU.MICROSECOND, 100200000), (TU.NANOSECOND, 100200300)],
)
def test_long_to_timestamp(unit, expect_nano):
    value = EPOCH_NANOS // unit.scale_to_nano
    nanos = U.long_to_nanos(value, unit)
    assert nanos // 10**9 == 1462087147
    assert nanos % 10**9 == expect_nano
    assert U.np_long_to_nanos(np.array([value]), unit)[0] == nanos


@pytest.mark.parametrize("unit", UNITS)
def test_double_to_timestamp(unit):
    value = EPOCH_NANOS_F / unit.scale_to_nano
    nanos = U.double_to_nanos(value, unit)
    assert nanos // 10**9 == 1462087147
    assert abs(nanos % 10**9 - 100200192) <= 200  # float64 slack, as in reference
    assert U.np_double_to_nanos(np.array([value]), unit)[0] == nanos


@pytest.mark.parametrize("unit", UNITS)
def test_timestamp_to_long(unit):
    expect = EPOCH_NANOS // unit.scale_to_nano
    assert U.nanos_to_long(EPOCH_NANOS, unit) == expect
    assert U.np_nanos_to_long(np.array([EPOCH_NANOS]), unit)[0] == expect


@pytest.mark.parametrize("unit", UNITS)
def test_timestamp_to_double(unit):
    stn = unit.scale_to_nano
    int_part = EPOCH_NANOS_F // stn
    expect = float(int_part) + (EPOCH_NANOS_F - int_part * stn) / stn
    assert U.nanos_to_double(EPOCH_NANOS_F, unit) == expect
    assert U.np_nanos_to_double(np.array([EPOCH_NANOS_F]), unit)[0] == expect


def _expect_long_change(value, from_unit, to_unit):
    if from_unit.scale <= to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return value // (from_unit.scale // to_unit.scale)


@pytest.mark.parametrize("from_unit", UNITS)
@pytest.mark.parametrize("to_unit", UNITS)
def test_long_change_unit(from_unit, to_unit):
    value = EPOCH_NANOS // from_unit.scale_to_nano
    expect = _expect_long_change(value, from_unit, to_unit)
    assert U.change_unit_long(value, from_unit, to_unit) == expect
    assert U.np_change_unit_long(np.array([value]), from_unit, to_unit)[0] == expect


def _expect_double_change(value, from_unit, to_unit):
    if from_unit.scale == to_unit.scale:
        return value
    if from_unit.scale < to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return value / float(from_unit.scale // to_unit.scale)


@pytest.mark.parametrize("from_unit", UNITS)
@pytest.mark.parametrize("to_unit", UNITS)
def test_double_change_unit(from_unit, to_unit):
    value = EPOCH_NANOS_F / from_unit.scale_to_nano
    expect = _expect_double_change(value, from_unit, to_unit)
    assert U.change_unit_double(value, from_unit, to_unit) == expect
    assert U.np_change_unit_double(np.array([value]), from_unit, to_unit)[0] == expect


# ---------------------------------------------------------------------------
# Column form: every kernel × every unit pair in ONE job per family
# ---------------------------------------------------------------------------


def test_column_kernels_all_units(spark):
    df = spark.createDataFrame(
        [(EPOCH_NANOS, EPOCH_NANOS_F, -1001, -1)], "n long, nf long, neg long, negn long"
    )
    exprs = []
    expects = []
    for unit in UNITS:
        lv = EPOCH_NANOS // unit.scale_to_nano
        exprs.append(U.col_long_to_nanos(F.lit(lv), unit))
        expects.append(U.long_to_nanos(lv, unit))
        dv = EPOCH_NANOS_F / unit.scale_to_nano
        exprs.append(U.col_double_to_nanos(F.lit(dv), unit))
        expects.append(U.double_to_nanos(dv, unit))
        exprs.append(U.col_nanos_to_long(F.col("n"), unit))
        expects.append(U.nanos_to_long(EPOCH_NANOS, unit))
        exprs.append(U.col_nanos_to_double(F.col("nf"), unit))
        expects.append(U.nanos_to_double(EPOCH_NANOS_F, unit))
    for fu in UNITS:
        for tu in UNITS:
            lv = EPOCH_NANOS // fu.scale_to_nano
            exprs.append(U.col_change_unit_long(F.lit(lv), fu, tu))
            expects.append(U.change_unit_long(lv, fu, tu))
            dv = EPOCH_NANOS_F / fu.scale_to_nano
            exprs.append(U.col_change_unit_double(F.lit(dv), fu, tu))
            expects.append(U.change_unit_double(dv, fu, tu))
    # negative-epoch fine print: trunc (long changeUnit) vs floor (instant)
    exprs.append(U.col_change_unit_long(F.col("neg"), TU.MILLISECOND, TU.SECOND))
    expects.append(-1)  # trunc toward zero (TimestampUnit.java:92-95)
    exprs.append(U.col_nanos_to_long(F.col("negn"), TU.SECOND))
    expects.append(-1)  # floor via (epochSecond, nano>=0) decomposition

    row = df.select(*[e.alias(f"c{i}") for i, e in enumerate(exprs)]).collect()[0]
    for i, expect in enumerate(expects):
        assert row[f"c{i}"] == expect, f"expr {i}"


def test_unit_aliases():
    assert U.parse_unit("ms") is TU.MILLISECOND
    assert U.parse_unit("msec") is TU.MILLISECOND
    assert U.parse_unit("micro_second") is TU.MICROSECOND
    assert U.parse_unit("NanoSecond") is TU.NANOSECOND
    assert U.parse_unit("sec") is TU.SECOND
    with pytest.raises(ValueError):
        U.parse_unit("fortnight")
