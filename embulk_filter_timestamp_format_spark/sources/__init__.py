"""Sources: deterministic synthetic binlog/WAL generator + readers."""

from .binlog import BINLOG_SCHEMA, generate_binlog  # noqa: F401
