"""Task / column configuration model (the reference's "query language").

Mirrors PluginTask / ColumnConfig (TimestampFormatFilterPlugin.java:38-79)
including every default:

* default_from_timestamp_format = ["%Y-%m-%d %H:%M:%S.%N %z"]   (TimestampParser.java:32-34)
* default_from_timezone        = "UTC"                          (TimestampParser.java:28-30)
* default_to_timestamp_format  = "%Y-%m-%d %H:%M:%S.%6N %z"     (TimestampFormatter.java:30-32
  — the CODE default, micros; README.md:20 claims %N but the code wins)
* default_to_timezone          = "UTC"                          (TimestampFormatter.java:26-28)
* default_from/to_timestamp_unit = second                       (TimestampFormatFilterPlugin.java:72-79)
* stop_on_invalid_record       = False                          (:64-66)
* timestamp_parser             = "auto"                         (:68-70)

Our engine adds ``engine``: 'catalyst' (built-in expressions, default) or
'arrow' (pandas/Arrow UDF kernels) — the analog of the reference's
jruby/java parser choice, with identical results.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.units import TimestampUnit, parse_unit

VALID_TARGET_TYPES = ("string", "timestamp", "long", "double")


class ConfigError(ValueError):
    """Analysis-time configuration error (Embulk's ConfigException)."""


@dataclass
class ColumnConfig:
    name: str  # plain column name or JSONPath ($.a.b[0].c)
    type: str = "string"  # target type (TimestampFormatFilterPlugin.java:44-46)
    from_format: "list[str] | None" = None
    from_timezone: "str | None" = None
    to_format: "str | None" = None
    to_timezone: "str | None" = None
    from_unit: "str | TimestampUnit | None" = None
    to_unit: "str | TimestampUnit | None" = None

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnConfig":
        return cls(**{k: d[k] for k in d})


@dataclass
class TaskConfig:
    columns: list[ColumnConfig] = field(default_factory=list)
    default_from_timestamp_format: list[str] = field(
        default_factory=lambda: ["%Y-%m-%d %H:%M:%S.%N %z"]
    )
    default_from_timezone: str = "UTC"
    default_to_timestamp_format: str = "%Y-%m-%d %H:%M:%S.%6N %z"
    default_to_timezone: str = "UTC"
    default_from_timestamp_unit: "str | TimestampUnit" = TimestampUnit.SECOND
    default_to_timestamp_unit: "str | TimestampUnit" = TimestampUnit.SECOND
    stop_on_invalid_record: bool = False
    timestamp_parser: str = "auto"
    engine: str = "catalyst"  # 'catalyst' | 'arrow'

    @classmethod
    def from_dict(cls, d: dict) -> "TaskConfig":
        d = dict(d)
        cols = [
            c if isinstance(c, ColumnConfig) else ColumnConfig.from_dict(c)
            for c in d.pop("columns", [])
        ]
        return cls(columns=cols, **d)

    # resolved per-column accessors (option-or-default, as in
    # ColumnCaster.getTimestampParser/getTimestampFormatter)
    def from_formats(self, c: ColumnConfig) -> list[str]:
        return list(c.from_format or self.default_from_timestamp_format)

    def from_tz(self, c: ColumnConfig) -> str:
        return c.from_timezone or self.default_from_timezone

    def to_fmt(self, c: ColumnConfig) -> str:
        return c.to_format or self.default_to_timestamp_format

    def to_tz(self, c: ColumnConfig) -> str:
        return c.to_timezone or self.default_to_timezone

    def from_unit_of(self, c: ColumnConfig) -> TimestampUnit:
        return parse_unit(c.from_unit or self.default_from_timestamp_unit)

    def to_unit_of(self, c: ColumnConfig) -> TimestampUnit:
        return parse_unit(c.to_unit or self.default_to_timestamp_unit)
