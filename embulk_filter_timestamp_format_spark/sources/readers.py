"""Input readers mirroring the reference's example pipelines.

The reference plugin sits behind Embulk's `file` input + `csv`/`json`
parsers (example/*.yml). Spark equivalents:

* ``read_csv``   — headerless CSV with a declared schema (the embulk csv
  parser's `columns:` list); all tsfmt-relevant columns arrive as the
  declared types (string/long/double/timestamp).
* ``read_jsonl`` — the embulk `json` parser semantic: each line becomes
  ONE top-level json column named ``record`` (a JSON string addressed by
  JSONPath column configs), exactly like example/nested.yml.

Both return plain DataFrames; the filter is then `apply_task(df, task)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
    **options,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", header)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, record_column: str = "record"
) -> DataFrame:
    """Each JSONL line → one JSON-string column (embulk json parser)."""
    return spark.read.text(path).select(F.col("value").alias(record_column))
