#!/usr/bin/env python
"""spark-submit driver: tail a binlog directory into an icetable.

Usage (see spark_submit_example.sh for the submit incantation):

    replay_driver.py BINLOG_DIR TABLE_DIR CHECKPOINT_DIR \
        [--mode cow|mor] [--buckets N] [--stream]

Batch mode replays the chunk directories in order (deterministic test
harness); --stream tails the directory with Structured Streaming
(availableNow trigger — exactly-once via checkpointed offsets plus
batch-id-fenced commits, resumable from any checkpoint).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("binlog_dir")
    ap.add_argument("table_dir")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--mode", choices=["cow", "mor"], default="mor")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--metrics-table", default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("efts-cdc-replay")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from embulk_filter_timestamp_format_spark.lake import IceTable
    from embulk_filter_timestamp_format_spark.streaming.cdc import (
        TARGET_SCHEMA,
        CdcPipeline,
    )

    if os.path.isdir(os.path.join(args.table_dir, "metadata")):
        table = IceTable.load(spark, args.table_dir)
    else:
        table = IceTable.create(
            spark,
            args.table_dir,
            TARGET_SCHEMA,
            key="doc_id",
            num_buckets=args.buckets,
            write_mode=args.mode,
        )
    pipe = CdcPipeline(spark, table, metrics_table_path=args.metrics_table)

    t0 = time.time()
    if args.stream:
        pipe.replay_stream(args.binlog_dir, args.checkpoint_dir)
    else:
        pipe.replay_chunks(sorted(glob.glob(os.path.join(args.binlog_dir, "chunk_*"))))
    dt = time.time() - t0

    rows = table.read().count()
    print(
        json.dumps(
            {
                "replay_sec": round(dt, 2),
                "final_rows": rows,
                "snapshots": table.current_version(),
                "last_batch_id": table.last_batch_id(pipe.source_name),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
