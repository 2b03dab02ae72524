"""Deterministic synthetic binlog/WAL change stream.

Insert/update/delete events keyed by doc_id over pre-tokenized training
sequences (the north-star input shape: doc_id, tokens array<int>, n_tok,
source), with event-time columns in three representations (string /
epoch-ms long / epoch-sec double) so every batch exercises the tsfmt
coercion layer.

Everything derives from the event offset via xxhash64 — fully
deterministic for a given (seed, num_events, num_docs) regardless of
parallelism or chunking; scale-free (10^10 events on a real cluster is
the same code with a bigger range). Generation is pure Catalyst: `range`
→ hash arithmetic → `transform(sequence(...))` token arrays; no Python.

Skew is generated on purpose: `hot_pct`% of events hit `num_hot` doc_ids
(hot-key skew the dedup/merge path must absorb).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BINLOG_SCHEMA = (
    "offset long, op string, doc_id string, event_seq long, "
    "event_time_str string, event_time_ms long, event_time_sec double, "
    "tokens array<int>, n_tok int, source string"
)

BASE_EPOCH_MS = 1700000000000  # 2023-11-14T22:13:20Z


def binlog_events(
    spark: SparkSession,
    num_events: int,
    num_docs: int,
    seed: int = 42,
    hot_pct: int = 10,
    num_hot: int = 4,
    delete_pct: int = 5,
    max_tokens: int = 64,
    vocab: int = 32000,
    start_offset: int = 0,
    num_partitions: "int | None" = None,
) -> DataFrame:
    """Events [start_offset, start_offset+num_events) as a DataFrame."""
    df = spark.range(start_offset, start_offset + num_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))  # noqa: E731

    doc_num = F.when(
        F.pmod(h("hot"), F.lit(100)) < F.lit(hot_pct),
        F.pmod(h("hotpick"), F.lit(num_hot)),
    ).otherwise(F.pmod(h("pick"), F.lit(num_docs)))

    op = (
        F.when(F.pmod(h("op"), F.lit(100)) < F.lit(delete_pct), F.lit("D"))
        .when(F.pmod(h("op"), F.lit(100)) < F.lit(40), F.lit("I"))
        .otherwise(F.lit("U"))
    )

    n_tok = (F.pmod(h("ntok"), F.lit(max_tokens)) + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(doc_num, F.col("id"), i, F.lit(seed)), F.lit(vocab)).cast("int"),
    )

    event_ms = (F.lit(BASE_EPOCH_MS) + F.col("id")).cast("long")
    # "%Y-%m-%d %H:%M:%S.%3N" rendering, pure Catalyst
    event_str = F.concat(
        F.date_format(F.timestamp_millis(event_ms), "yyyy-MM-dd HH:mm:ss."),
        F.lpad(F.pmod(event_ms, F.lit(1000)).cast("string"), 3, "0"),
        F.lit(" UTC"),
    )

    return df.select(
        F.col("id").alias("offset"),
        op.alias("op"),
        F.concat(F.lit("doc_"), doc_num.cast("string")).alias("doc_id"),
        F.col("id").alias("event_seq"),
        event_str.alias("event_time_str"),
        event_ms.alias("event_time_ms"),
        (event_ms.cast("double") / 1000.0).alias("event_time_sec"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        F.concat(F.lit("src"), F.pmod(h("src"), F.lit(4)).cast("string")).alias("source"),
    )


def generate_binlog(
    spark: SparkSession,
    out_dir: str,
    num_events: int,
    num_docs: int,
    num_chunks: int = 8,
    seed: int = 42,
    **kwargs,
) -> list[str]:
    """Write the stream as `num_chunks` sequential parquet chunk dirs so
    Structured Streaming can tail them in order. Returns chunk paths."""
    os.makedirs(out_dir, exist_ok=True)
    chunk_size = (num_events + num_chunks - 1) // num_chunks
    paths = []
    for i in range(num_chunks):
        start = i * chunk_size
        end = min(num_events, start + chunk_size)
        if start >= end:
            break
        df = binlog_events(
            spark, end - start, num_docs, seed=seed, start_offset=start, **kwargs
        )
        path = os.path.join(out_dir, f"chunk_{i:05d}")
        df.write.mode("overwrite").parquet(path)
        paths.append(path)
    return paths
