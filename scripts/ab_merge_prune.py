#!/usr/bin/env python
"""Interleaved A/B of file-scoped COW overwrite (merge_file_pruning).

The round-4 scaling runs pinned local[32] COW replay cost to the
single-NVMe rewrite of every touched-bucket file. This harness measures
the round-5 fix — manifest-key-bound file pruning + target-file-size
splitting — under the workload it is FOR: key-localized churn (a
drifting contiguous window of hot doc_ids, 1-5% of the corpus per
batch) against a large seeded table.

Arms (each a fresh identically-seeded table per round, interleaved
A,B,C,A,B,C so co-tenant drift hits all arms equally):

  off          merge_file_pruning=False            (round-4 behavior)
  prune        pruning ON, monolithic files        (the layout where
               pruning can't help: full-span file bounds, nothing to
               carry — measures the feature's overhead there. The
               first run of this arm exposed ~0.36 s/merge of exact-
               probe cost, which led to the two-tier gating: tier 2
               now never fires on this arm, and the arm verifies that)
  prune_split  pruning ON + max_file_rows split    (the round-5 design)

Reported per arm: total merge wall clock (seed excluded), total bytes
written across merges, files rewritten/carried, per-run /proc/stat
steal. Bytes written is the write-amplification number — the quantity
the NVMe tail scales with.

Usage: python scripts/ab_merge_prune.py [--docs N] [--batches K]
           [--churn-pct P] [--rounds R] [--buckets B] [--file-rows M]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _proc_stat_sample, _steal_pct, build_spark  # noqa: E402


def corpus(spark, lo, hi, seq, n_tok=16, vocab=32000):
    """Docs [lo, hi) with zero-padded ids (lexicographic == numeric, so
    manifest string bounds track the numeric window) — pure Catalyst."""
    from pyspark.sql import functions as F

    df = spark.range(lo, hi)
    tokens = F.transform(
        F.sequence(F.lit(1), F.lit(n_tok)),
        lambda i: F.pmod(F.xxhash64(F.col("id"), i), F.lit(vocab)).cast("int"),
    )
    ms = F.lit(1700000000000) + F.col("id")
    return df.select(
        F.concat(F.lit("doc_"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("doc_id"),
        tokens.alias("tokens"),
        F.lit(n_tok).alias("n_tok"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id"), F.lit(4)).cast("string")).alias("source"),
        F.timestamp_millis(ms).alias("event_time"),
        ms.alias("event_time_ms"),
        (ms.cast("double") / 1000.0).alias("event_time_sec"),
        F.lit(seq).cast("long").alias("event_seq"),
    )


def churn_batch(spark, lo, hi, seq, delete_pct=5):
    """One update batch over the contiguous doc window [lo, hi): mostly
    updates, a few deletes — the hot-recent-docs shape."""
    from pyspark.sql import functions as F

    df = corpus(spark, lo, hi, seq)
    op = F.when(
        F.pmod(F.xxhash64("doc_id", F.lit(seq)), F.lit(100)) < F.lit(delete_pct),
        F.lit("D"),
    ).otherwise(F.lit("U"))
    return df.withColumn("op", op)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--churn-pct", type=float, default=2.0)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--file-rows", type=int, default=16384)
    ap.add_argument("--arms", default="off,prune,prune_split")
    args = ap.parse_args()

    spark = build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_timestamp_format_spark.lake import IceTable

    ARMS = {
        "off": {"merge_file_pruning": False},
        "prune": {"merge_file_pruning": True},
        "prune_split": {"merge_file_pruning": True, "max_file_rows": args.file_rows},
    }
    names = [a for a in args.arms.split(",") if a in ARMS]
    window = max(int(args.docs * args.churn_pct / 100), 1)
    workdir = tempfile.mkdtemp(prefix="efts_mp_")
    results: dict[str, list] = {n: [] for n in names}
    schema = corpus(spark, 0, 1, 1).schema
    try:
        for rnd in range(args.rounds):
            for name in names:
                path = os.path.join(workdir, f"t_{name}_{rnd}")
                table = IceTable.create(
                    spark, path, schema, key="doc_id",
                    num_buckets=args.buckets, write_mode="cow",
                    **ARMS[name],
                )
                table.append(corpus(spark, 0, args.docs, seq=1))
                s0 = _proc_stat_sample()
                t0 = time.time()
                tot = {"bytes": 0, "rewritten": 0, "carried": 0, "written": 0}
                for b in range(args.batches):
                    lo = (b * window) % max(args.docs - window, 1)
                    table.merge_into(
                        churn_batch(spark, lo, lo + window, seq=b + 2),
                        batch_id=b + 2,
                    )
                    info = table.last_merge_info or {}
                    tot["bytes"] += info.get("bytes_written", 0)
                    tot["rewritten"] += info.get("files_rewritten", 0)
                    tot["carried"] += info.get("files_carried", 0)
                    tot["written"] += info.get("files_written", 0)
                dt = round(time.time() - t0, 2)
                steal = _steal_pct(s0, _proc_stat_sample())
                rows = table.read().count()
                shutil.rmtree(path, ignore_errors=True)
                rec = {"sec": dt, "steal": steal, "rows": rows, **tot}
                results[name].append(rec)
                print(f"[round {rnd}] {name}: {dt}s steal={steal}% "
                      f"bytes={tot['bytes']/1e6:.1f}MB rewrit={tot['rewritten']} "
                      f"carry={tot['carried']} rows={rows}", flush=True)
        summary = {
            n: {
                "best_sec": min(r["sec"] for r in results[n]),
                "runs_sec": [r["sec"] for r in results[n]],
                "steal": [r["steal"] for r in results[n]],
                "mb_written": round(results[n][0]["bytes"] / 1e6, 1),
                "files_rewritten": results[n][0]["rewritten"],
                "files_carried": results[n][0]["carried"],
                "rows": results[n][0]["rows"],
            }
            for n in names
        }
        summary["config"] = {
            "docs": args.docs, "batches": args.batches,
            "churn_pct": args.churn_pct, "window": window,
            "buckets": args.buckets, "file_rows": args.file_rows,
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
