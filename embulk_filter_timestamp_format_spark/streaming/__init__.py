"""Structured-Streaming CDC apply loop (exactly-once, lineage, skew-safe)."""

from .cdc import CdcPipeline, TARGET_SCHEMA, dedup_latest  # noqa: F401
from .feed import ChangesFeed, replicate_changes  # noqa: F401
