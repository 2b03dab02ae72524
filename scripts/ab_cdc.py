#!/usr/bin/env python
"""Interleaved A/B of CdcPipeline configurations over ONE shared binlog.

Round-4 bisect harness for the COW replay headline: each variant replays
the same chunks in alternating order (A,B,C,A,B,C,...) so co-tenant
drift hits all variants equally; per-run /proc/stat steal is recorded.

Usage: python scripts/ab_cdc.py [--events N] [--rounds K] [--mode cow]
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

VARIANTS = {
    # current defaults (round-3 code as committed)
    "default": {},
    # kill the invalid-record flag column from the stats pass entirely
    "no_invalid": {"record_invalid": False},
    # kill the skew probe (and its sampled key-count action)
    "no_skew": {"skew_detect": False},
    # both off: the r1-era minimal stats pass
    "minimal": {"record_invalid": False, "skew_detect": False},
}

# table-spec arms (IceTable.create kwargs), selectable alongside the
# pipeline arms above — added for the round-4 manifest-stats bisect
TABLE_VARIANTS = {
    # manifest footer stats off: the pre-30182b0 write path
    "no_stats": {"stats_cols": []},
    # z-order-lite on event_seq (NOT the bench default; cost check only)
    "zorder_seq": {"sort_cols": ["event_seq"]},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--mode", default="cow")
    ap.add_argument("--variants", default="default,no_invalid,no_skew,minimal")
    args = ap.parse_args()

    spark = build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    from embulk_filter_timestamp_format_spark.lake import IceTable
    from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
    from embulk_filter_timestamp_format_spark.streaming.cdc import (
        TARGET_SCHEMA,
        CdcPipeline,
    )

    names = [
        v for v in args.variants.split(",")
        if v in VARIANTS or v in TABLE_VARIANTS
    ]
    workdir = tempfile.mkdtemp(prefix="efts_ab_")
    results: dict[str, list] = {n: [] for n in names}
    try:
        chunks = generate_binlog(
            spark, os.path.join(workdir, "binlog"), args.events,
            num_docs=max(args.events // 10, 100), num_chunks=4,
        )
        for rnd in range(args.rounds):
            for name in names:
                path = os.path.join(workdir, f"t_{name}_{rnd}")
                table = IceTable.create(
                    spark, path, TARGET_SCHEMA, key="doc_id",
                    num_buckets=32, write_mode=args.mode,
                    **TABLE_VARIANTS.get(name, {}),
                )
                pipe = CdcPipeline(spark, table, **VARIANTS.get(name, {}))
                s0 = _proc_stat_sample()
                t0 = time.time()
                pipe.replay_chunks(chunks)
                dt = round(time.time() - t0, 2)
                steal = _steal_pct(s0, _proc_stat_sample())
                rows = table.read().count()
                shutil.rmtree(path, ignore_errors=True)
                results[name].append({"sec": dt, "steal": steal, "rows": rows})
                print(f"[round {rnd}] {name}: {dt}s steal={steal}% rows={rows}",
                      flush=True)
        summary = {
            n: {"best": min(r["sec"] for r in results[n]),
                "runs": [r["sec"] for r in results[n]],
                "steal": [r["steal"] for r in results[n]],
                "rows": results[n][0]["rows"]}
            for n in names
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
