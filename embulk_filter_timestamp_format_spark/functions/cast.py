"""The 4×4 cast matrix: {long,double,string,timestamp} → {string,timestamp,long,double}.

Column-expression builders mirroring the reference's cast kernels
(reference: cast/LongCast.java, cast/DoubleCast.java, cast/StringCast.java,
cast/TimestampCast.java, dispatched by ColumnCaster.java:144-237):

* long→long / double→double / long→double / double→long go through
  ``changeUnit`` (pure unit arithmetic, trunc-toward-zero on downscale) —
  NOT through an instant;
* every path to string/timestamp goes through the instant (epoch-nanos);
* string sources are parsed by the multi-format cascade;
* timestamp→timestamp is identity (TimestampCast.java:17-20).

NULL in → NULL out on every path (ColumnVisitorImpl.java:82-84); a parse
failure yields NULL (the error-policy layer counts and optionally aborts,
= stop_on_invalid_record).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column

from .format import TimestampFormatterPlan
from .parse import TimestampParserPlan
from . import units as U
from .units import TimestampUnit

SOURCE_TYPES = ("long", "double", "string", "timestamp")
TARGET_TYPES = ("string", "timestamp", "long", "double")


class CastPlan:
    """Compiled per-column cast: source type × target type + parser /
    formatter / unit plans (the analog of ColumnCaster's per-column maps,
    built once at plan time — ColumnCaster.java:37-58)."""

    def __init__(
        self,
        source_type: str,
        target_type: str,
        parser: "TimestampParserPlan | None" = None,
        formatter: "TimestampFormatterPlan | None" = None,
        from_unit: TimestampUnit = TimestampUnit.SECOND,
        to_unit: TimestampUnit = TimestampUnit.SECOND,
    ):
        if source_type not in SOURCE_TYPES:
            raise ValueError(f"unsupported source type {source_type}")
        if target_type not in TARGET_TYPES:
            raise ValueError(f"unsupported target type {target_type}")
        self.source_type = source_type
        self.target_type = target_type
        self.parser = parser
        self.formatter = formatter
        self.from_unit = from_unit
        self.to_unit = to_unit

    # ------------------------------------------------------------------
    # Catalyst
    # ------------------------------------------------------------------

    @property
    def needs_instant(self) -> bool:
        """True when the cast routes through epoch-nanos (vs pure unit
        arithmetic / identity). Instant-routed casts should be staged:
        compute nanos into an intermediate column, then derive the target
        from that column — otherwise the (large) parse tree is inlined
        into every formatter segment and Catalyst optimization time blows
        up (the staged projection is the plan-time analog of the
        reference's per-task kernel cache)."""
        src, dst = self.source_type, self.target_type
        if src in ("long", "double") and dst in ("long", "double"):
            return False
        if src == "timestamp" and dst == "timestamp":
            return False
        return True

    def expr(self, c: Column) -> Column:
        src, dst = self.source_type, self.target_type

        # unit-arithmetic paths (no instant): Long/DoubleCast.asLong/asDouble
        if src == "long" and dst == "long":
            return U.col_change_unit_long(c, self.from_unit, self.to_unit)
        if src == "long" and dst == "double":
            return U.col_change_unit_long(c, self.from_unit, self.to_unit).cast("double")
        if src == "double" and dst == "double":
            return U.col_change_unit_double(c, self.from_unit, self.to_unit)
        if src == "double" and dst == "long":
            return U.col_change_unit_double(c, self.from_unit, self.to_unit).try_cast("long")
        if src == "timestamp" and dst == "timestamp":
            return c
        return self.from_nanos_expr(self.to_nanos_expr(c))

    def to_nanos_expr(self, c: Column) -> Column:
        return self._to_nanos_expr(c)

    def from_nanos_expr(self, nanos: Column) -> Column:
        dst = self.target_type
        if dst == "string":
            return self.formatter.format_expr(nanos)
        if dst == "timestamp":
            return U.col_nanos_to_timestamp(nanos)
        if dst == "long":
            return U.col_nanos_to_long(nanos, self.to_unit)
        return U.col_nanos_to_double(nanos, self.to_unit)

    def _to_nanos_expr(self, c: Column) -> Column:
        src = self.source_type
        if src == "long":
            return U.col_long_to_nanos(c, self.from_unit)
        if src == "double":
            return U.col_double_to_nanos(c, self.from_unit)
        if src == "timestamp":
            return U.col_timestamp_to_nanos(c)
        return self.parser.parse_expr(c)

    # ------------------------------------------------------------------
    # Arrow / numpy (pandas-UDF engine)
    # ------------------------------------------------------------------

    def apply_np(self, s: pd.Series) -> pd.Series:
        """Same cast over a pandas Series (Arrow batch column)."""
        src, dst = self.source_type, self.target_type
        isnull = s.isna()

        if src in ("long", "double") and dst in ("long", "double"):
            vals = s.fillna(0).to_numpy(
                dtype=np.int64 if src == "long" else np.float64
            )
            if src == "long":
                out = U.np_change_unit_long(vals, self.from_unit, self.to_unit)
            else:
                out = U.np_change_unit_double(vals, self.from_unit, self.to_unit)
            if dst == "long":
                out = out.astype(np.int64)
                return pd.Series(out, index=s.index, dtype="Int64").mask(isnull)
            return pd.Series(out.astype(np.float64), index=s.index).mask(isnull)

        if src == "timestamp" and dst == "timestamp":
            return s

        nanos, valid = self._to_nanos_np(s)
        if dst == "string":
            out = self.formatter.format_np(nanos)
            return pd.Series(out.to_numpy(), index=s.index, dtype="string").mask(~valid | isnull.to_numpy())
        if dst == "timestamp":
            micros = nanos // 1000
            ts = pd.Series(micros.astype("datetime64[us]"), index=s.index)
            return ts.mask(~valid | isnull.to_numpy())
        if dst == "long":
            out = U.np_nanos_to_long(nanos, self.to_unit)
            return pd.Series(out, index=s.index, dtype="Int64").mask(~valid | isnull.to_numpy())
        out = U.np_nanos_to_double(nanos, self.to_unit)
        return pd.Series(out, index=s.index).mask(~valid | isnull.to_numpy())

    def _to_nanos_np(self, s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        src = self.source_type
        n = len(s)
        if src == "string":
            return self.parser.parse_np(s)
        valid = (~s.isna()).to_numpy(dtype=bool)
        if src == "long":
            vals = s.fillna(0).to_numpy(dtype=np.int64)
            return U.np_long_to_nanos(vals, self.from_unit), valid
        if src == "double":
            vals = s.fillna(0).to_numpy(dtype=np.float64)
            return U.np_double_to_nanos(vals, self.from_unit), valid
        # timestamp
        vals = pd.to_datetime(s).fillna(pd.Timestamp(0))
        nanos = vals.astype("datetime64[ns]").to_numpy().astype(np.int64)
        return nanos, valid
