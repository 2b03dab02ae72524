#!/usr/bin/env python
"""Per-phase decomposition of one CDC batch at a given parallelism.

Refreshes BENCH/BASELINE.md's Amdahl table: times (a) the stats pass
(with the invalid-record flag), (b) coercion alone, (c) coercion +
dedup-latest, (d) the full merge+write batch — each as the only work in
a fresh-plan action, over one 8M-event chunk.

Usage: python scripts/phase_profile.py CHUNK_DIR [cpus] [mode]
Emits one JSON line. Run one level per process (fresh JVM).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    chunk, cpus, mode = (
        sys.argv[1],
        sys.argv[2] if len(sys.argv) > 2 else "32",
        sys.argv[3] if len(sys.argv) > 3 else "cow",
    )
    from bench import _proc_stat_sample, _steal_pct, build_spark, force

    from pyspark.sql import functions as F

    from embulk_filter_timestamp_format_spark.lake import IceTable
    from embulk_filter_timestamp_format_spark.plans.apply import InvalidFlagPlan
    from embulk_filter_timestamp_format_spark.streaming.cdc import (
        TARGET_SCHEMA,
        CdcPipeline,
        dedup_latest,
    )

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    batch = spark.read.parquet(chunk)
    out: dict = {"cpus": cpus, "mode": mode, "events": batch.count()}

    workdir = tempfile.mkdtemp(prefix="efts_phase_")
    table = IceTable.create(
        spark, os.path.join(workdir, "t"), TARGET_SCHEMA,
        key="doc_id", num_buckets=64, write_mode=mode,
    )
    pipe = CdcPipeline(spark, table)

    def timed(name, fn, warm=True):
        if warm:
            fn()  # codegen compile — excluded, same serial cost any scale
        s0 = _proc_stat_sample()
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 2)
        out[name + "_steal"] = _steal_pct(s0, _proc_stat_sample())

    plan = InvalidFlagPlan(batch.schema, pipe.task, ["offset", "op", "doc_id"])
    aggs = [
        F.count(F.lit(1)).alias("events"),
        F.min("offset").alias("min_offset"),
        F.max("offset").alias("max_offset"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes"),
        F.sum(InvalidFlagPlan.FLAG).alias("invalid"),
    ]

    def stats():
        (
            plan.apply(batch)
            .withColumn("__part", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
            .groupBy("__part")
            .agg(*aggs)
            .collect()
        )

    timed("stats_sec", stats)
    timed("coerce_sec", lambda: force(pipe.coerce(batch)))
    timed("dedup_sec", lambda: force(dedup_latest(pipe.coerce(batch))))
    # full batch: merge + parquet write + commit (no warm twin — the
    # table mutates; codegen for these shapes compiled by phases above)
    t0 = time.time()
    pipe.apply_batch(batch, 0)
    out["full_batch_sec"] = round(time.time() - t0, 2)
    out["rows"] = table.read().count()
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
