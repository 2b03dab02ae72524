#!/usr/bin/env python
"""Benchmark harness.

Runs (a) every __spark_entry__ query at $SPARK_GRAFT_SF_DIR and (b) the
headline CDC replay — synthetic binlog → tsfmt coercion → dedup-latest →
batch-fenced MERGE into an icetable — and prints ONE JSON line:

    {"metric": "cdc_replay_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "cdc": {"events": N, "events_per_sec": ...}}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CDC_EVENTS (default 500000).
Queries are forced with the noop sink (full computation, no collect).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def _proc_stat_sample() -> "tuple[int, int]":
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat cpu
    line — sampled around each timed run so the committed artifact can
    separate co-tenant CPU steal from real regressions (this host's
    single-run spread is up to 3x)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return 0, 0


def _steal_pct(before: "tuple[int, int]", after: "tuple[int, int]") -> float:
    dt = after[0] - before[0]
    return round(100.0 * (after[1] - before[1]) / dt, 2) if dt > 0 else 0.0


def build_spark(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("efts-bench")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Per-query (warm, cold) seconds. The first force pays Catalyst
    analysis + janino codegen compile (the driver-serial floor — reported
    separately as `queries_cold`); warm is the BEST of two subsequent
    runs — single-sample warm numbers on this steal-prone host moved up
    to 3x between windows (r03→r04 cascade 'regression' was exactly
    this), and min-of-2 is the cheapest estimator that survives one
    mid-loop steal burst."""
    import __spark_entry__ as E
    from embulk_filter_timestamp_format_spark.operators import (
        unpersist_intermediates,
    )

    warm, cold = {}, {}
    for name, fn in E.queries().items():
        try:
            t0 = time.time()
            force(fn(spark, sf_dir))
            cold[name] = round(time.time() - t0, 3)
            best = float("inf")
            # warm re-CALLS the query fn: eager operators (driver-side
            # fixpoints like dedup_components) do their real work inside
            # fn(), and a pre-built DataFrame would time only the final
            # checkpoint read. For lazy queries fn() is ms of plan build.
            for _ in range(2):
                t0 = time.time()
                force(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
            warm[name] = round(best, 3)
        except Exception as ex:  # record, don't die
            warm[name] = cold[name] = -1.0
            print(f"query {name} failed: {ex}", file=sys.stderr)
        finally:
            # release operator intermediates so one query's caches don't
            # evict the next query's (the registry is the service-usage
            # discipline documented in operators/cache.py)
            unpersist_intermediates()
    return warm, cold


def bench_cdc(spark, num_events: int, num_chunks: int = 4, runs: int = 3) -> dict:
    """CDC replay at both table modes over the same binlog: copy-on-write
    (rewrite touched buckets) and merge-on-read (delta appends + adaptive
    compaction — write cost ∝ changes, the 10^10-event mode).

    Each mode replays `runs` times against the same generated binlog
    (fresh table per run); the headline is the BEST run, with every run's
    wall time and its /proc/stat steal share recorded alongside so a
    slower number can be attributed to co-tenant load instead of code."""
    from embulk_filter_timestamp_format_spark.lake import IceTable
    from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
    from embulk_filter_timestamp_format_spark.streaming.cdc import (
        TARGET_SCHEMA,
        CdcPipeline,
    )

    workdir = tempfile.mkdtemp(prefix="efts_bench_")
    try:
        binlog_dir = os.path.join(workdir, "binlog")
        chunks = generate_binlog(
            spark, binlog_dir, num_events, num_docs=max(num_events // 10, 100),
            num_chunks=num_chunks,
        )

        def replay_once(mode: str, run_i: int) -> dict:
            path = os.path.join(workdir, f"table_{mode}_{run_i}")
            table = IceTable.create(
                spark, path, TARGET_SCHEMA,
                key="doc_id", num_buckets=32, write_mode=mode,
            )
            pipe = CdcPipeline(spark, table)
            s0 = _proc_stat_sample()
            t0 = time.time()
            pipe.replay_chunks(chunks)
            dt = time.time() - t0
            steal = _steal_pct(s0, _proc_stat_sample())
            rows = table.read().count()
            snaps = table.current_version()
            shutil.rmtree(path, ignore_errors=True)
            return {"replay_sec": round(dt, 3), "steal_pct": steal,
                    "final_rows": rows, "snapshots": snaps}

        def replay(mode: str) -> dict:
            results = [replay_once(mode, i) for i in range(max(runs, 1))]
            best = min(results, key=lambda r: r["replay_sec"])
            return {
                "events": num_events,
                "replay_sec": best["replay_sec"],
                "events_per_sec": round(num_events / best["replay_sec"], 1),
                "final_rows": best["final_rows"],
                "snapshots": best["snapshots"],
                "runs": [r["replay_sec"] for r in results],
                "steal_pct": [r["steal_pct"] for r in results],
            }

        out = replay("cow")
        out["mor"] = replay("mor")
        return out
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def bench_parse_format(spark, rows: int | None = None) -> dict:
    """The reference's own benchmark shape (bench/gen_dummy.rb: N timestamp
    strings parsed and reformatted) — our Catalyst path, end to end.

    Rows scale with the core count (250k/core, floor 2M — the same
    steady-state protocol as scripts/percore_parse.py): the round-4
    staged fast path trades fixed per-stage scheduling cost for 2.4×
    per-row throughput, so a fixed 2M-row job at 32 cores measures
    stage overhead, not the engine (measured 1.05 s fixed-2M vs
    8.85M rows/s steady-state in BENCH/BASELINE.md round 4)."""
    from pyspark.sql import functions as F

    if rows is None:
        cores = spark.sparkContext.defaultParallelism
        rows = max(2_000_000, 250_000 * cores)

    from embulk_filter_timestamp_format_spark.functions.format import TimestampFormatterPlan
    from embulk_filter_timestamp_format_spark.functions.parse import TimestampParserPlan

    df = spark.range(rows).select(
        F.concat(
            F.date_format(F.timestamp_millis(F.lit(1500000000000) + F.col("id")), "yyyy-MM-dd HH:mm:ss."),
            F.lpad(F.pmod(F.col("id"), F.lit(1000)).cast("string"), 3, "0"),
            F.lit("000000"),
        ).alias("s")
    )
    parser = TimestampParserPlan(["%Y-%m-%d %H:%M:%S.%N"], "UTC")
    fmt = TimestampFormatterPlan("%Y-%m-%d", "UTC")
    # the engine's documented hot-loop config (the CDC batch body sets
    # the same): whole-stage codegen OFF so parse_df's staged fast path
    # engages — per-operator codegen compiles each stage separately;
    # fused WSCG lands the 4-stage pipeline beyond HotSpot's JIT size
    # threshold (measured 2.3× slower, BENCH/NOTES.md round 4)
    prev_wscg = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        # staged via parse_df: aligned rows take the native civil kernel
        # (no regex, no civil-arithmetic tree); nanos lands in an
        # intermediate projection (same rule as apply_task)
        # best-of-3 after a warm run (same protocol as the CDC replay):
        # HotSpot's C2 recompile of a ~3 s single-core loop often lands
        # MID-measurement on run 2 — single-shot timings spread 495-700k
        # rows/s at local[1] on identical code (round-5 session)
        out = parser.parse_df(df, "s", "__n").select(
            fmt.format_expr(F.col("__n")).alias("d")
        )
        force(out)  # warm (codegen compile)
        dt = None
        for _ in range(3):
            t0 = time.time()
            force(out)
            dt = min(x for x in (dt, time.time() - t0) if x is not None)
        # cached-input twin: parse+format only (the reference parses a
        # pre-generated file, so the generate cost above is NOT in its
        # number; this row is the apples-to-apples per-core comparison)
        cached = df.persist()
        cached.count()
        outc = parser.parse_df(cached, "s", "__n").select(
            fmt.format_expr(F.col("__n")).alias("d")
        )
        force(outc)
        dtc = None
        for _ in range(3):
            t0 = time.time()
            force(outc)
            dtc = min(x for x in (dtc, time.time() - t0) if x is not None)
        cached.unpersist()
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", prev_wscg)
    return {
        "rows": rows,
        "sec": round(dt, 3),
        "rows_per_sec": round(rows / dt, 1),
        "cached_sec": round(dtc, 3),
        "cached_rows_per_sec": round(rows / dtc, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cdc-only", action="store_true",
                    help="skip the 23 contract queries and the parse bench; "
                         "re-measure just the headline CDC replay")
    ap.add_argument("--queries-only", action="store_true",
                    help="run just the contract queries + parse bench; "
                         "skip the CDC replay (value = parse sec)")
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CDC_RUNS", "3")),
                    help="replays per table mode; headline = best run")
    ap.add_argument("--events", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CDC_EVENTS", "8000000")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cdc_only:
            qtimes, qcold, pf = {}, {}, None
        else:
            qtimes, qcold = bench_queries(spark, sf_dir)
            pf = bench_parse_format(spark)
        cdc = (
            None if args.queries_only
            else bench_cdc(spark, args.events, runs=args.runs)
        )
    finally:
        spark.stop()

    result = {
        "metric": "cdc_replay_sec",
        "value": cdc["replay_sec"] if cdc else pf["sec"],
        "unit": "sec",
        "queries": qtimes,
        "queries_cold": qcold,
        "sf": float(sf),
        "cdc": cdc,
        "parse_format": pf,
        "cpus": int(cpus),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
