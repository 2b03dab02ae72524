"""Vectorized timestamp formatting (instant → string).

Reference semantics (TimestampFormatter.java:62-134):

* ruby dialect: wall-clock fields are rendered from whole epoch-seconds
  in ``to_timezone``; the fraction (``%N``/``%L``) is printed from the
  nano-of-second value, zero-padded, truncated to the directive width;
* java dialect: Joda renders from epoch-millis; with the grafted
  ``nnnnnnnnn``/``nnnnnn`` extensions the fraction is substituted from
  nanos/micros (``String.format('%09d'|'%06d')``); otherwise fraction
  letters ``S`` carry milliseconds only (zero-extended on the right);
* ``to_timezone`` changes the rendering only, never the instant.

Implementation: the token IR compiles to a CONCAT of segments — runs of
plain date/time fields become a single ``date_format`` over the
wall-clock-shifted timestamp (whole-stage codegen), fraction / offset /
zone-name / epoch segments are computed from the nanos column with
integer arithmetic. No Python in the hot path; the numpy twin exists for
the Arrow engine parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from . import formats as FT
from .formats import ParsedFormat
from .parse import TZ_NAME_OFFSETS, _fixed_offset_seconds
from .units import col_floor_div

# zone id → conventional abbreviation for %Z (fixed-offset zones; DST
# zones get per-instant names from zoneinfo via _zone_abbreviations)
TZ_ABBREVIATIONS = {
    "UTC": "UTC", "Etc/UTC": "UTC", "GMT": "GMT", "Etc/GMT": "GMT",
    "Asia/Tokyo": "JST", "Asia/Seoul": "KST", "Asia/Taipei": "CST",
    "Asia/Shanghai": "CST", "Asia/Kolkata": "IST",
}


def _zone_abbreviations(tz: str) -> dict[int, str]:
    """offset-seconds → zone abbreviation, derived from zoneinfo at two
    probes (standard + DST). Lets %Z render real names (EST/EDT, CET/CEST)
    like the reference's Joda/Ruby zone rendering
    (TimestampFormatter.java:115-134); zones whose tzname is numeric
    ('+03') fall back to the offset string."""
    out: dict[int, str] = {}
    try:
        from datetime import datetime, timezone
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        for month in (1, 7):
            loc = datetime(2023, month, 15, tzinfo=timezone.utc).astimezone(z)
            name = loc.tzname()
            if name and name[0] not in "+-":
                out[int(loc.utcoffset().total_seconds())] = name
    except Exception:
        pass
    return out


def _require_utc_session() -> None:
    """Wall-clock rendering (date_format) and DST wall→instant resolution
    (to_utc_timestamp) are session-timezone dependent; the engine's plans
    are built for a UTC session. Fail fast at plan time instead of
    silently mis-rendering every string in a non-UTC session."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return
    tz = s.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Etc/GMT", "+00:00", "Z"):
        raise ValueError(
            "timestamp_format engine requires spark.sql.session.timeZone=UTC "
            f"(session has {tz!r}); set spark.conf.set('spark.sql.session.timeZone', 'UTC') "
            "— to_timezone/from_timezone options control rendering, not the session zone"
        )

_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MONTH_FULL = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
_DAY_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]  # ISO order
_DAY_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]


class TimestampFormatterPlan:
    """Per-column format plan (format string + to_timezone), compiled once
    (analog of the reference's formatter cache, ColumnCaster.java:94-110)."""

    def __init__(self, fmt: str, to_timezone: str = "UTC"):
        self.format = fmt
        self.to_timezone = to_timezone
        self.parsed: ParsedFormat = FT.parse_format(fmt)
        self.fixed_offset = _fixed_offset_seconds(to_timezone)
        self.zone_abbrs = (
            _zone_abbreviations(to_timezone) if self.parsed.has(FT.TZNAME) else {}
        )

    # ------------------------------------------------------------------
    # Catalyst plan
    # ------------------------------------------------------------------

    def format_expr(self, nanos: Column) -> Column:
        """epoch-nanos column → formatted string column."""
        _require_utc_session()
        pf = self.parsed
        tz = self.to_timezone
        sec = col_floor_div(nanos, 1_000_000_000)
        nano_of_sec = F.pmod(nanos, F.lit(1_000_000_000))

        # wall-clock timestamp for field rendering.
        # ruby renders from whole seconds; java (no hack) includes millis.
        if pf.dialect == "java" and not (pf.java_nano_hack or pf.java_micro_hack):
            ms = col_floor_div(nano_of_sec, 1_000_000)
            base = F.timestamp_micros(sec * 1_000_000 + ms * 1000)
        else:
            base = F.timestamp_micros(sec * 1_000_000)
        wall = F.from_utc_timestamp(base, tz) if tz != "UTC" else base

        if self.fixed_offset is not None:
            off_sec: Column = F.lit(self.fixed_offset).cast("long")
        else:
            off_sec = col_floor_div(
                F.unix_micros(F.from_utc_timestamp(base, tz)) - F.unix_micros(base), 1_000_000
            )

        nano_str9 = F.lpad(nano_of_sec.cast("string"), 9, "0")

        segments: list[Column] = []
        chunk: list[str] = []  # pending spark-pattern run

        def flush():
            if chunk:
                segments.append(F.date_format(wall, "".join(chunk)))
                chunk.clear()

        for t in pf.tokens:
            k = t.kind
            if k == FT.LIT:
                chunk.append(FT.spark_literal(t.text))
                continue
            if k == FT.FRAC:
                flush()
                if pf.dialect == "ruby" or pf.java_nano_hack or pf.java_micro_hack:
                    digits = 6 if pf.java_micro_hack and not pf.java_nano_hack else t.digits
                    if pf.dialect == "ruby":
                        digits = t.digits
                    seg = F.substring(nano_str9, 1, digits)
                    if digits > 9:
                        seg = F.rpad(seg, digits, "0")
                else:
                    # java without nano ext: milliseconds, zero-extended
                    ms_str = F.substring(nano_str9, 1, 3)
                    seg = F.rpad(ms_str, t.digits, "0") if t.digits > 3 else F.substring(ms_str, 1, t.digits)
                segments.append(seg)
                continue
            if k == FT.TZOFF:
                flush()
                segments.append(_col_offset_string(off_sec, t.style))
                continue
            if k == FT.TZNAME:
                flush()
                abbr = TZ_ABBREVIATIONS.get(tz)
                if abbr is not None:
                    segments.append(F.lit(abbr))
                elif self.zone_abbrs:
                    # per-instant name selected by the row's actual offset
                    # (handles DST: America/New_York → EST or EDT)
                    seg = None
                    for off, name in self.zone_abbrs.items():
                        cond = off_sec == F.lit(off)
                        seg = F.when(cond, F.lit(name)) if seg is None else seg.when(cond, F.lit(name))
                    segments.append(seg.otherwise(_col_offset_string(off_sec, ":")))
                else:
                    segments.append(_col_offset_string(off_sec, ":"))
                continue
            if k == FT.EPOCH:
                flush()
                segments.append(sec.cast("string"))
                continue
            if k == FT.WDAY:
                flush()
                dow = F.dayofweek(wall)  # 1=Sun..7=Sat
                if pf.dialect == "ruby" and t.kind == FT.WDAY:
                    # %u: 1=Mon..7=Sun ; %w: 0=Sun..6=Sat — we kept only one
                    # token kind; use ISO %u convention (table maps both to e)
                    seg = (F.pmod(dow + 5, F.lit(7)) + 1).cast("string")
                else:
                    seg = (F.pmod(dow + 5, F.lit(7)) + 1).cast("string")
                segments.append(seg)
                continue
            if k == FT.WEEK:
                flush()
                segments.append(F.lpad(F.weekofyear(wall).cast("string"), 2, "0"))
                continue
            if k == FT.CENTURY:
                flush()
                segments.append(
                    F.lpad(F.call_function("div", F.year(wall), F.lit(100)).cast("string"), 2, "0")
                )
                continue
            if k == FT.GYEAR:
                flush()
                # ISO week-based year = calendar year of that week's Thursday
                isodow = F.pmod(F.dayofweek(wall) + 5, F.lit(7)) + 1
                gyr = F.year(F.date_add(F.to_date(wall), (F.lit(4) - isodow).cast("int")))
                if t.digits == 2:
                    segments.append(F.lpad(F.pmod(gyr, F.lit(100)).cast("string"), 2, "0"))
                else:
                    segments.append(F.lpad(gyr.cast("string"), 4, "0"))
                continue
            # plain field → spark pattern chunk
            if t.pad == "-" and k in FT._SPARK_PATTERN_CHUNK_NOPAD:
                chunk.append(FT._SPARK_PATTERN_CHUNK_NOPAD[k])
            elif t.pad == "_" and k in FT._SPARK_PATTERN_CHUNK_NOPAD:
                flush()
                seg = F.lpad(F.date_format(wall, FT._SPARK_PATTERN_CHUNK_NOPAD[k]), 2, " ")
                segments.append(seg)
            else:
                pat = FT._SPARK_PATTERN_CHUNK.get(k)
                if pat is None:
                    raise ValueError(f"Cannot format token {t} with Catalyst plan")
                if k == FT.AMPM and t.text == "lower":
                    flush()
                    segments.append(F.lower(F.date_format(wall, "a")))
                elif t.upcase:
                    flush()
                    segments.append(F.upper(F.date_format(wall, pat)))
                else:
                    chunk.append(pat)
        flush()
        if not segments:
            return F.lit("")
        return segments[0] if len(segments) == 1 else F.concat(*segments)

    # ------------------------------------------------------------------
    # numpy / Arrow twin
    # ------------------------------------------------------------------

    def format_np(self, nanos: np.ndarray, valid: "np.ndarray | None" = None) -> pd.Series:
        pf = self.parsed
        tz = self.to_timezone
        sec = nanos // 1_000_000_000
        nano_of_sec = (nanos - sec * 1_000_000_000).astype(np.int64)

        if self.fixed_offset is not None:
            off = np.full(len(nanos), self.fixed_offset, dtype=np.int64)
            wall_sec = sec + off
            idx = pd.DatetimeIndex(wall_sec.astype("datetime64[s]"))
        else:
            utc_idx = pd.DatetimeIndex(sec.astype("datetime64[s]"), tz="UTC")
            local = utc_idx.tz_convert(tz)
            idx = local.tz_localize(None)
            # unit-safe offset (asi8 is in the index's own resolution,
            # seconds here, NOT nanos)
            off = np.round(
                (idx - utc_idx.tz_localize(None)).total_seconds().to_numpy()
            ).astype(np.int64)

        if pf.dialect == "java" and not (pf.java_nano_hack or pf.java_micro_hack):
            ms = nano_of_sec // 1_000_000
        else:
            ms = None

        def num(vals: np.ndarray, width: int, pad: str) -> pd.Series:
            s = pd.Series(vals.astype(str))
            if pad == "-":
                return s
            fill = " " if pad == "_" else "0"
            return s.str.rjust(width, fill)

        nano_str9 = pd.Series(nano_of_sec.astype(str)).str.rjust(9, "0")
        parts: list[pd.Series] = []
        n = len(nanos)

        for t in pf.tokens:
            k = t.kind
            if k == FT.LIT:
                parts.append(pd.Series([t.text] * n))
            elif k == FT.Y4:
                parts.append(num(idx.year.to_numpy(), 4, t.pad or "0"))
            elif k == FT.Y2:
                parts.append(num(idx.year.to_numpy() % 100, 2, t.pad or "0"))
            elif k == FT.CENTURY:
                parts.append(num(idx.year.to_numpy() // 100, 2, t.pad or "0"))
            elif k == FT.MONTH_NUM:
                parts.append(num(idx.month.to_numpy(), 2, t.pad or "0"))
            elif k == FT.MONTH_ABBR:
                parts.append(pd.Series(np.array(_MONTH_ABBR)[idx.month.to_numpy() - 1]))
            elif k == FT.MONTH_FULL:
                parts.append(pd.Series(np.array(_MONTH_FULL)[idx.month.to_numpy() - 1]))
            elif k == FT.DAY_NUM:
                parts.append(num(idx.day.to_numpy(), 2, t.pad or "0"))
            elif k == FT.DOY:
                parts.append(num(idx.dayofyear.to_numpy(), 3, t.pad or "0"))
            elif k == FT.DAY_ABBR:
                parts.append(pd.Series(np.array(_DAY_ABBR)[idx.dayofweek.to_numpy()]))
            elif k == FT.DAY_FULL:
                parts.append(pd.Series(np.array(_DAY_FULL)[idx.dayofweek.to_numpy()]))
            elif k == FT.H24:
                parts.append(num(idx.hour.to_numpy(), 2, t.pad or "0"))
            elif k == FT.H12:
                h = idx.hour.to_numpy() % 12
                h = np.where(h == 0, 12, h)
                parts.append(num(h, 2, t.pad or "0"))
            elif k == FT.H24C:
                h = idx.hour.to_numpy()
                parts.append(num(np.where(h == 0, 24, h), 2, t.pad or "0"))
            elif k == FT.H11:
                parts.append(num(idx.hour.to_numpy() % 12, 2, t.pad or "0"))
            elif k == FT.GYEAR:
                gyr = idx.isocalendar().year.to_numpy().astype(np.int64)
                if t.digits == 2:
                    parts.append(num(gyr % 100, 2, t.pad or "0"))
                else:
                    parts.append(num(gyr, 4, t.pad or "0"))
            elif k == FT.MINUTE:
                parts.append(num(idx.minute.to_numpy(), 2, t.pad or "0"))
            elif k == FT.SECOND:
                parts.append(num(idx.second.to_numpy(), 2, t.pad or "0"))
            elif k == FT.FRAC:
                if pf.dialect == "ruby":
                    parts.append(nano_str9.str[: t.digits])
                elif pf.java_nano_hack:
                    parts.append(nano_str9.str[: t.digits])
                elif pf.java_micro_hack:
                    parts.append(nano_str9.str[:6])
                else:
                    ms_str = pd.Series((nano_of_sec // 1_000_000).astype(str)).str.rjust(3, "0")
                    parts.append(ms_str.str.ljust(t.digits, "0").str[: t.digits])
            elif k == FT.AMPM:
                am = np.where(idx.hour.to_numpy() < 12, "AM", "PM")
                if t.text == "lower":
                    am = np.char.lower(am)
                parts.append(pd.Series(am))
            elif k == FT.TZOFF:
                parts.append(pd.Series(_np_offset_string(off, t.style)))
            elif k == FT.TZNAME:
                abbr = TZ_ABBREVIATIONS.get(tz)
                if abbr is not None:
                    parts.append(pd.Series([abbr] * n))
                elif self.zone_abbrs:
                    named = np.asarray(_np_offset_string(off, ":"), dtype=object)
                    for o, name in self.zone_abbrs.items():
                        named = np.where(np.asarray(off) == o, name, named)
                    parts.append(pd.Series(named.astype(str)))
                else:
                    parts.append(pd.Series(_np_offset_string(off, ":")))
            elif k == FT.EPOCH:
                parts.append(pd.Series(sec.astype(str)))
            elif k == FT.WDAY:
                parts.append(pd.Series((idx.dayofweek.to_numpy() + 1).astype(str)))
            elif k == FT.WEEK:
                parts.append(pd.Series(idx.isocalendar().week.to_numpy().astype(str)).str.rjust(2, "0"))
            elif k == FT.ERA:
                parts.append(pd.Series(["AD"] * n))
            else:
                raise ValueError(f"Cannot format token {t} with numpy plan")
            if t.upcase:
                parts[-1] = parts[-1].str.upper()

        out = parts[0].astype("string") if parts else pd.Series([""] * n, dtype="string")
        for p in parts[1:]:
            out = out + p.astype("string").to_numpy()
        if valid is not None:
            out = out.where(pd.Series(valid))
        return out


def _col_offset_string(off_sec: Column, style: str) -> Column:
    sign = F.when(off_sec < 0, F.lit("-")).otherwise(F.lit("+"))
    a = F.abs(off_sec)
    hh = F.lpad(F.call_function("div", a, F.lit(3600)).cast("string"), 2, "0")
    mm = F.lpad(F.call_function("div", F.pmod(a, F.lit(3600)), F.lit(60)).cast("string"), 2, "0")
    ss = F.lpad(F.pmod(a, F.lit(60)).cast("string"), 2, "0")
    if style == "::":
        return F.concat(sign, hh, F.lit(":"), mm, F.lit(":"), ss)
    if style == ":":
        return F.concat(sign, hh, F.lit(":"), mm)
    return F.concat(sign, hh, mm)


def _np_offset_string(off: np.ndarray, style: str) -> np.ndarray:
    sign = np.where(off < 0, "-", "+")
    a = np.abs(off)
    hh = np.char.zfill((a // 3600).astype(str), 2)
    mm = np.char.zfill(((a % 3600) // 60).astype(str), 2)
    ss = np.char.zfill((a % 60).astype(str), 2)
    if style == "::":
        return np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(sign, hh), ":"), mm), ":"), ss)
    if style == ":":
        return np.char.add(np.char.add(np.char.add(sign, hh), ":"), mm)
    return np.char.add(np.char.add(sign, hh), mm)
