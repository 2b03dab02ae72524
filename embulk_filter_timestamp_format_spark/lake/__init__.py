"""Iceberg-semantics table format ("icetable").

No Iceberg/Delta runtime jars exist in this sandbox, so the lake layer
implements the Iceberg feature subset the engine needs from scratch:
immutable parquet data files bucketed by key, a JSON snapshot log with
atomic exclusive-create commits, snapshot isolation, time travel,
idempotent batch-id fencing, schema evolution, and copy-on-write MERGE
that rewrites only touched buckets. The API mirrors Iceberg so a real
catalog can be swapped in when jars are available.
"""

from .table import IceTable, changelog_diff  # noqa: F401
from .catalog import (  # noqa: F401
    Catalog,
    IcebergSparkCatalog,
    LocalCatalog,
    TableProtocol,
)
