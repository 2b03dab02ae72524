"""Port of the reference's TestTimestampUnit (src/test/java/.../TestTimestampUnit.java)
against all three kernel forms (scalar, numpy, Column expression).

Same constants: epoch 1462087147.100200300 (long tests) and
1462087147100200192 (double tests, float64-representable).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.functions import units as U
from embulk_filter_timestamp_format_spark.functions.units import TimestampUnit as TU

EPOCH_NANOS = 1462087147100200300
EPOCH_NANOS_F = 1462087147100200192  # exactly representable in float64
UNITS = [TU.SECOND, TU.MILLISECOND, TU.MICROSECOND, TU.NANOSECOND]


def _spark_eval(spark, fn, value, dtype):
    df = spark.createDataFrame([(value,)], f"v {dtype}")
    return df.select(fn(F.col("v")).alias("r")).collect()[0]["r"]


# --- TestTimestampUnit.testLongToTimestamp:10-32 --------------------------
@pytest.mark.parametrize(
    "unit,expect_nano",
    [(TU.SECOND, 0), (TU.MILLISECOND, 100000000), (TU.MICROSECOND, 100200000), (TU.NANOSECOND, 100200300)],
)
def test_long_to_timestamp(spark, unit, expect_nano):
    value = EPOCH_NANOS // unit.scale_to_nano
    nanos = U.long_to_nanos(value, unit)
    assert nanos // 10**9 == 1462087147
    assert nanos % 10**9 == expect_nano
    assert U.np_long_to_nanos(np.array([value]), unit)[0] == nanos
    assert _spark_eval(spark, lambda c: U.col_long_to_nanos(c, unit), value, "long") == nanos


# --- testDoubleToTimestamp:34-57 ------------------------------------------
@pytest.mark.parametrize("unit", UNITS)
def test_double_to_timestamp(spark, unit):
    value = EPOCH_NANOS_F / unit.scale_to_nano
    nanos = U.double_to_nanos(value, unit)
    assert nanos // 10**9 == 1462087147
    assert abs(nanos % 10**9 - 100200192) <= 200  # float64 slack, as in reference
    assert U.np_double_to_nanos(np.array([value]), unit)[0] == nanos
    assert _spark_eval(spark, lambda c: U.col_double_to_nanos(c, unit), value, "double") == nanos


# --- testTimestampToLong:59-77 ---------------------------------------------
@pytest.mark.parametrize("unit", UNITS)
def test_timestamp_to_long(spark, unit):
    expect = EPOCH_NANOS // unit.scale_to_nano
    assert U.nanos_to_long(EPOCH_NANOS, unit) == expect
    assert U.np_nanos_to_long(np.array([EPOCH_NANOS]), unit)[0] == expect
    assert _spark_eval(spark, lambda c: U.col_nanos_to_long(c, unit), EPOCH_NANOS, "long") == expect


# --- testTimestampToDouble:79-97 -------------------------------------------
@pytest.mark.parametrize("unit", UNITS)
def test_timestamp_to_double(spark, unit):
    stn = unit.scale_to_nano
    int_part = EPOCH_NANOS_F // stn
    expect = float(int_part) + (EPOCH_NANOS_F - int_part * stn) / stn
    got = U.nanos_to_double(EPOCH_NANOS_F, unit)
    assert got == expect
    assert U.np_nanos_to_double(np.array([EPOCH_NANOS_F]), unit)[0] == expect
    assert _spark_eval(spark, lambda c: U.col_nanos_to_double(c, unit), EPOCH_NANOS_F, "long") == expect


# --- testLongChangeUnit:99-143 ----------------------------------------------
@pytest.mark.parametrize("from_unit", UNITS)
@pytest.mark.parametrize("to_unit", UNITS)
def test_long_change_unit(spark, from_unit, to_unit):
    value = EPOCH_NANOS // from_unit.scale_to_nano
    if from_unit.scale <= to_unit.scale:
        expect = value * (to_unit.scale // from_unit.scale)
    else:
        expect = value // (from_unit.scale // to_unit.scale)
    got = U.change_unit_long(value, from_unit, to_unit)
    assert got == expect
    assert U.np_change_unit_long(np.array([value]), from_unit, to_unit)[0] == expect
    assert _spark_eval(spark, lambda c: U.col_change_unit_long(c, from_unit, to_unit), value, "long") == expect


# --- testDoubleChangeUnit:145-190 --------------------------------------------
@pytest.mark.parametrize("from_unit", UNITS)
@pytest.mark.parametrize("to_unit", UNITS)
def test_double_change_unit(spark, from_unit, to_unit):
    value = EPOCH_NANOS_F / from_unit.scale_to_nano
    if from_unit.scale == to_unit.scale:
        expect = value
    elif from_unit.scale < to_unit.scale:
        expect = value * (to_unit.scale // from_unit.scale)
    else:
        expect = value / float(from_unit.scale // to_unit.scale)
    got = U.change_unit_double(value, from_unit, to_unit)
    assert got == expect
    assert U.np_change_unit_double(np.array([value]), from_unit, to_unit)[0] == expect
    assert _spark_eval(spark, lambda c: U.col_change_unit_double(c, from_unit, to_unit), value, "double") == expect


# --- negative-epoch fine print: trunc (long path) vs floor (instant path) ---
def test_negative_trunc_vs_floor(spark):
    # changeUnit(long) truncates toward zero (TimestampUnit.java:92-95)
    assert U.change_unit_long(-1001, TU.MILLISECOND, TU.SECOND) == -1
    # instant → long floors via the (epochSecond, nano>=0) decomposition
    assert U.nanos_to_long(-1, TU.SECOND) == -1
    assert _spark_eval(spark, lambda c: U.col_change_unit_long(c, TU.MILLISECOND, TU.SECOND), -1001, "long") == -1
    assert _spark_eval(spark, lambda c: U.col_nanos_to_long(c, TU.SECOND), -1, "long") == -1


def test_unit_aliases():
    assert U.parse_unit("ms") is TU.MILLISECOND
    assert U.parse_unit("msec") is TU.MILLISECOND
    assert U.parse_unit("micro_second") is TU.MICROSECOND
    assert U.parse_unit("NanoSecond") is TU.NANOSECOND
    assert U.parse_unit("sec") is TU.SECOND
    with pytest.raises(ValueError):
        U.parse_unit("fortnight")
