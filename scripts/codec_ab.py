#!/usr/bin/env python
"""Parquet-codec A/B for the CDC lake write/read tail.

The local[32] replay residue is the merge tail (disk/bandwidth-bound —
BENCH/BASELINE.md round-4 phase table), so the lake file codec is a
direct lever: snappy (Spark default) vs zstd (smaller files, more CPU)
vs lz4 (faster CPU, similar size) vs none. Replays the SAME generated
binlog once per codec per mode inside ONE JVM, interleaving codecs so
a steal burst hits all arms equally; appends one JSON line per arm.

Usage: python scripts/codec_ab.py [events] [cpus] [out.jsonl] [rot]
Run multiple invocations for repeats (fresh JVM each); pass rot=1,2,…
to rotate codec order so any residual warmup bias moves arms. A
2M-event unrecorded warmup replay absorbs codegen before the arms.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODECS = ("snappy", "zstd", "lz4", "uncompressed")


def main():
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/codec_ab.jsonl"
    rot = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from bench import _proc_stat_sample, _steal_pct, build_spark

    from embulk_filter_timestamp_format_spark.lake import IceTable
    from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
    from embulk_filter_timestamp_format_spark.streaming.cdc import (
        TARGET_SCHEMA,
        CdcPipeline,
    )

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="efts_codec_")
    try:
        chunks = generate_binlog(
            spark, os.path.join(workdir, "binlog"), events,
            num_docs=max(events // 10, 100), num_chunks=4,
        )

        def arm(mode: str, codec: str, warmup: bool = False) -> dict:
            path = os.path.join(workdir, f"t_{mode}_{codec}_{'w' if warmup else 'm'}")
            table = IceTable.create(
                spark, path, TARGET_SCHEMA,
                key="doc_id", num_buckets=32, write_mode=mode,
                codec=codec,
            )
            pipe = CdcPipeline(spark, table)
            if warmup:  # one chunk, unrecorded: absorbs codegen/JIT
                pipe.replay_chunks(chunks[:1])
                shutil.rmtree(path, ignore_errors=True)
                return {}
            s0 = _proc_stat_sample()
            t0 = time.time()
            pipe.replay_chunks(chunks)
            dt = time.time() - t0
            steal = _steal_pct(s0, _proc_stat_sample())
            rows = table.read().count()
            data_mb = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(os.path.join(path, "data"))
                for f in fs
            ) / 1e6
            shutil.rmtree(path, ignore_errors=True)
            r = {"mode": mode, "codec": codec, "replay_sec": round(dt, 3),
                 "steal_pct": steal, "final_rows": rows,
                 "final_data_mb": round(data_mb, 1)}
            with open(out_path, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(json.dumps(r), flush=True)
            return r

        # warm both mode plan shapes once (not recorded), then interleave
        arm("cow", "snappy", warmup=True)
        arm("mor", "snappy", warmup=True)
        order = CODECS[rot % 4:] + CODECS[: rot % 4]
        for mode in ("cow", "mor"):
            for codec in order:
                arm(mode, codec)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
