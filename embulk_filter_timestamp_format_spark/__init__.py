"""PySpark-native CDC/incremental-ingest engine with the column-reformat
semantics of sonots/embulk-filter-timestamp_format.

Layout
------
functions/   vectorized timestamp kernels (units, parse, format, cast, jsonpath)
plans/       config model, validation, schema retype, projection planner
lake/        Iceberg-semantics table format (snapshots, atomic commit, MERGE)
sources/     binlog/WAL synthetic source + readers
streaming/   foreachBatch CDC apply loop (exactly-once, lineage)
operators/   large-scale pipeline operators (dedup, similarity, text analysis)

All execution is DataFrame/Catalyst first; pandas/Arrow UDFs only where the
reference semantics (variable-digit %N fractions, ruby strptime dialect)
cannot be expressed with built-in functions. No per-row Python anywhere.
"""

__version__ = "0.1.0"
