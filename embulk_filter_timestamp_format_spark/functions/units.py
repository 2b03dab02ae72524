"""Epoch-unit conversion kernels.

Semantics mirror the reference's ``TimestampUnit``
(reference: src/main/java/.../TimestampUnit.java:7-111):

* an instant is epoch-seconds (int64) + nano-of-second in ``[0, 1e9)`` —
  i.e. the *floor* decomposition of a single signed epoch-nanos int64.
  We carry instants as **epoch-nanos int64** throughout ("nanos rep").
* ``long → instant``  : ``value * scale_to_nano``                (exact)
* ``double → instant``: ``(int64)(value * scale_to_nano)``       (float64
  multiply then truncation toward zero — TimestampUnit.java:62-66; the
  float64 round-off is part of the contract, see golden from_double.txt)
* ``instant → long``  : floor-division of nanos by ``scale_to_nano``
  (equivalent to epochSecond*scale + nano/scaleToNano of the reference,
  TimestampUnit.java:68-74, since nano-of-second is non-negative)
* ``instant → double``: integer part as above, plus the fractional
  sub-unit remainder divided in float64 (TimestampUnit.java:75-81)
* ``long  unit change``: upscale = multiply; downscale = **truncation
  toward zero** (Java integer division, TimestampUnit.java:83-96 — NOT
  floor; differs from the instant path for negative epochs)
* ``double unit change``: float64 multiply / divide (TimestampUnit.java:98-111)

Every kernel exists in three forms: pure-python scalar (tests/spec),
numpy (pandas-UDF path), and pyspark Column expression (Catalyst path).
All three are bit-identical on int64 / float64 inputs.
"""

from __future__ import annotations

from enum import Enum

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

NANOS_PER_SECOND = 1_000_000_000


class TimestampUnit(Enum):
    SECOND = ("sec", 1)
    MILLISECOND = ("ms", 1_000)
    MICROSECOND = ("us", 1_000_000)
    NANOSECOND = ("ns", 1_000_000_000)

    def __init__(self, short: str, scale: int):
        self.short = short
        self._scale = scale

    @property
    def scale(self) -> int:
        """Units per second (TimestampUnit.java scale())."""
        return self._scale

    @property
    def scale_to_nano(self) -> int:
        """Nanos per unit (TimestampUnit.java scaleToNano())."""
        return NANOS_PER_SECOND // self._scale


# Accepted config spellings (reference: TimestampUnitDeserializer.java:16-40).
_UNIT_ALIASES: dict[str, TimestampUnit] = {}
for _names, _unit in [
    (("Second", "second", "sec", "s"), TimestampUnit.SECOND),
    (
        ("MilliSecond", "millisecond", "milli_second", "milli", "msec", "ms"),
        TimestampUnit.MILLISECOND,
    ),
    (
        ("MicroSecond", "microsecond", "micro_second", "micro", "usec", "us"),
        TimestampUnit.MICROSECOND,
    ),
    (
        ("NanoSecond", "nanosecond", "nano_second", "nano", "nsec", "ns"),
        TimestampUnit.NANOSECOND,
    ),
]:
    for _n in _names:
        _UNIT_ALIASES[_n] = _unit


def parse_unit(name: "str | TimestampUnit") -> TimestampUnit:
    if isinstance(name, TimestampUnit):
        return name
    try:
        return _UNIT_ALIASES[name]
    except KeyError:
        raise ValueError(
            f"Unknown timestamp unit {name!r}. Supported: {sorted(_UNIT_ALIASES)}"
        ) from None


# ---------------------------------------------------------------------------
# scalar kernels (reference spec; used by tests and as documentation)
# ---------------------------------------------------------------------------


def _trunc_div_int(a: int, b: int) -> int:
    """Java integer division: truncation toward zero."""
    q = a // b
    if a % b != 0 and (a < 0) != (b < 0):
        q += 1
    return q


def long_to_nanos(value: int, from_unit: TimestampUnit) -> int:
    return value * from_unit.scale_to_nano


def double_to_nanos(value: float, from_unit: TimestampUnit) -> int:
    return int(value * from_unit.scale_to_nano)  # trunc toward zero


def nanos_to_long(nanos: int, to_unit: TimestampUnit) -> int:
    return nanos // to_unit.scale_to_nano  # floor (nano-of-second >= 0)


def nanos_to_double(nanos: int, to_unit: TimestampUnit) -> float:
    stn = to_unit.scale_to_nano
    int_part = nanos // stn
    frac = (nanos - int_part * stn) / stn
    return float(int_part) + frac


def change_unit_long(value: int, from_unit: TimestampUnit, to_unit: TimestampUnit) -> int:
    if from_unit.scale == to_unit.scale:
        return value
    if from_unit.scale < to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return _trunc_div_int(value, from_unit.scale // to_unit.scale)


def change_unit_double(
    value: float, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> float:
    if from_unit.scale == to_unit.scale:
        return value
    if from_unit.scale < to_unit.scale:
        return value * (to_unit.scale // from_unit.scale)
    return value / float(from_unit.scale // to_unit.scale)


# ---------------------------------------------------------------------------
# numpy kernels (vectorized; pandas-UDF path). int64 in/out.
# ---------------------------------------------------------------------------


def np_trunc_div(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Java-style int64 division (truncate toward zero)."""
    q = a // b
    r = a - q * b
    fix = (r != 0) & ((a < 0) != (b < 0))
    return q + fix.astype(np.int64)


def np_long_to_nanos(values: np.ndarray, from_unit: TimestampUnit) -> np.ndarray:
    return values.astype(np.int64) * np.int64(from_unit.scale_to_nano)


def np_double_to_nanos(values: np.ndarray, from_unit: TimestampUnit) -> np.ndarray:
    prod = values.astype(np.float64) * np.float64(from_unit.scale_to_nano)
    return prod.astype(np.int64)  # C-cast truncation toward zero


def np_nanos_to_long(nanos: np.ndarray, to_unit: TimestampUnit) -> np.ndarray:
    return nanos // np.int64(to_unit.scale_to_nano)  # numpy // floors


def np_nanos_to_double(nanos: np.ndarray, to_unit: TimestampUnit) -> np.ndarray:
    stn = np.int64(to_unit.scale_to_nano)
    int_part = nanos // stn
    frac = (nanos - int_part * stn).astype(np.float64) / np.float64(stn)
    return int_part.astype(np.float64) + frac


def np_change_unit_long(
    values: np.ndarray, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> np.ndarray:
    if from_unit.scale == to_unit.scale:
        return values
    if from_unit.scale < to_unit.scale:
        return values * np.int64(to_unit.scale // from_unit.scale)
    return np_trunc_div(values, from_unit.scale // to_unit.scale)


def np_change_unit_double(
    values: np.ndarray, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> np.ndarray:
    if from_unit.scale == to_unit.scale:
        return values
    if from_unit.scale < to_unit.scale:
        return values * np.float64(to_unit.scale // from_unit.scale)
    return values / np.float64(from_unit.scale // to_unit.scale)


# ---------------------------------------------------------------------------
# Column-expression kernels (Catalyst path — stays inside codegen)
# ---------------------------------------------------------------------------


def col_trunc_div(c: Column, divisor: int) -> Column:
    """`c div divisor` — Spark's IntegralDivide truncates toward zero like
    Java's long division; exact over the whole int64 range."""
    return F.call_function("div", c, F.lit(divisor))


def col_floor_div(c: Column, divisor: int) -> Column:
    """Floor division of a long column by a positive constant, exact for
    the full int64 range (never routes through float)."""
    d = F.lit(divisor)
    trunc = F.call_function("div", c, d)
    return trunc - F.when(((c % d) != 0) & (c < 0), F.lit(1)).otherwise(F.lit(0))


def col_long_to_nanos(c: Column, from_unit: TimestampUnit) -> Column:
    return c.cast("long") * F.lit(from_unit.scale_to_nano).cast("long")


def col_double_to_nanos(c: Column, from_unit: TimestampUnit) -> Column:
    # double→long cast in Spark truncates toward zero (Java (long) cast).
    return (c * F.lit(float(from_unit.scale_to_nano))).try_cast("long")


def col_nanos_to_long(nanos: Column, to_unit: TimestampUnit) -> Column:
    return col_floor_div(nanos, to_unit.scale_to_nano)


def col_nanos_to_double(nanos: Column, to_unit: TimestampUnit) -> Column:
    stn = to_unit.scale_to_nano
    int_part = col_floor_div(nanos, stn)
    frac = F.pmod(nanos, F.lit(stn)).cast("double") / F.lit(float(stn))
    return int_part.cast("double") + frac


def col_change_unit_long(
    c: Column, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> Column:
    if from_unit.scale == to_unit.scale:
        return c.cast("long")
    if from_unit.scale < to_unit.scale:
        return c.cast("long") * F.lit(to_unit.scale // from_unit.scale).cast("long")
    return col_trunc_div(c, from_unit.scale // to_unit.scale)


def col_change_unit_double(
    c: Column, from_unit: TimestampUnit, to_unit: TimestampUnit
) -> Column:
    if from_unit.scale == to_unit.scale:
        return c.cast("double")
    if from_unit.scale < to_unit.scale:
        return c * F.lit(float(to_unit.scale // from_unit.scale))
    return c / F.lit(float(from_unit.scale // to_unit.scale))


def col_nanos_to_timestamp(nanos: Column) -> Column:
    """nanos rep → Spark TimestampType (µs resolution, floor like Instant)."""
    return F.timestamp_micros(col_floor_div(nanos, 1000))


def col_timestamp_to_nanos(ts: Column) -> Column:
    """Spark TimestampType/TimestampNTZType → nanos rep (µs-resolution;
    pair with a companion nanos column when full nano fidelity is
    asserted). NTZ wall clock is interpreted in the session timezone
    (engine sessions pin UTC), matching the oracle's naive TIMESTAMP."""
    return (F.unix_micros(ts.cast("timestamp")) * F.lit(1000)).cast("long")
