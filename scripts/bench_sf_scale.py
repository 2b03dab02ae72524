#!/usr/bin/env python
"""Corpus-scale (sf1) sweep for the pipeline operators.

Every operator number on file is sf0.1, where fixed scheduler/barrier
overhead dominates (the ANN and incremental-dedup phase notes say so
explicitly). This harness turns the "amortizes at scale" claims into a
measured curve: it derives an sf1-equivalent corpus (factor x docs /
embeddings / events) deterministically FROM the driver's sf0.1 parquet
— no external data, same generator seed story — then times the slowest
queries at both scales in one session and reports sec(sf1)/sec(sf0.1)
against the x10 data growth.

Scale-up construction (replica r = 0 keeps the original rows bit-exact;
r > 0 gets shifted ids, STRIDE = 10_000_000):

* documents: text is WORD-PERMUTED per replica (sort words by
  xxhash64(word, pos, r) — pure Catalyst: transform -> struct ->
  array_sort). Within a replica, near-identical source docs keep
  near-identical word multisets and hash order, so each replica
  reproduces sf0.1's duplicate-pair structure (the corpus grows, the
  per-group pair blowup does NOT go superlinear); across replicas the
  shingle sets diverge, so no cross-replica matches.
* embeddings: elementwise Rademacher sign flip keyed by (r, dim) — an
  orthogonal transform, so within-replica geometry (top-k lists, near-
  dup pairs) is EXACTLY the original's; cross-replica cosine is a
  centered weighted-Rademacher sum, std ~ 1/sqrt(d), far below every
  threshold in use.
* events: event_id/user_id shifted, ts shifted r*400 days — sessions,
  as-of matches and range-join intervals never straddle replicas.
* dimension tables (region..lineitem): byte-copied, unscaled — none of
  the swept queries read them.

Usage: python scripts/bench_sf_scale.py [--factor 10] [--out DIR]
           [--queries q1,q2,...] [--skip-small]
Prints one JSON line {query: {"sf01_sec", "sf1_sec", "ratio"}, ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _proc_stat_sample, _steal_pct, build_spark, force  # noqa: E402

STRIDE = 10_000_000

# the 10 slowest sf0.1 queries from BENCH/bench_r4_sf01.json plus the
# three remaining dedup-family pair producers (scaling claims on file)
DEFAULT_QUERIES = (
    "incremental_dedup embedding_neardup dedup_components "
    "multimodal_features semantic_dedup repetition_signals quality_filter "
    "line_dedup ann_ivf_topk corpus_dedup_pass minhash_lsh simhash_pairs "
    "ngram_jaccard"
).split()


def scale_documents(spark, src, factor):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{src}/documents.parquet")
    parts = [base]
    for r in range(1, factor):
        words = F.split(F.col("text"), " ")
        salted = F.transform(
            words,
            lambda w, i: F.struct(
                F.xxhash64(w, i, F.lit(r)).alias("h"), w.alias("w")
            ),
        )
        text2 = F.array_join(
            F.transform(F.array_sort(salted), lambda s: s["w"]), " "
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * STRIDE)).alias("doc_id"),
                text2.alias("text"),
                "lang",
                "source",
                F.length(text2).cast("long").alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_embeddings(spark, src, factor):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{src}/embeddings.parquet")
    parts = [base]
    for r in range(1, factor):
        flipped = F.transform(
            F.col("embedding"),
            lambda x, i: x
            * (F.lit(1) - F.lit(2) * F.pmod(F.xxhash64(F.lit(r), i), F.lit(2)))
            .cast("float"),
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * STRIDE)).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_events(spark, src, factor):
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{src}/events.parquet")
    parts = [base]
    for r in range(1, factor):
        parts.append(
            base.select(
                (F.col("event_id") + F.lit(r * STRIDE)).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {r * 400} DAYS")).alias("ts"),
                (F.col("user_id") + F.lit(r * STRIDE)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_scaled_dir(spark, src, out, factor):
    os.makedirs(out, exist_ok=True)
    scaled = {
        "documents": scale_documents,
        "embeddings": scale_embeddings,
        "events": scale_events,
    }
    for name, fn in scaled.items():
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            fn(spark, src, factor).repartition(32).write.parquet(dst)
    for name in "region nation customer supplier part orders lineitem".split():
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copytree(
                os.path.join(src, f"{name}.parquet"), dst,
            ) if os.path.isdir(
                os.path.join(src, f"{name}.parquet")
            ) else shutil.copy(os.path.join(src, f"{name}.parquet"), dst)


def time_query(spark, fn, sf_dir, runs=2):
    from embulk_filter_timestamp_format_spark.operators import (
        unpersist_intermediates,
    )

    force(fn(spark, sf_dir))  # cold: codegen + analysis
    best, steal = float("inf"), 0.0
    for _ in range(runs):
        s0 = _proc_stat_sample()
        t0 = time.time()
        force(fn(spark, sf_dir))
        dt = time.time() - t0
        if dt < best:
            best, steal = dt, _steal_pct(s0, _proc_stat_sample())
    unpersist_intermediates()
    return round(best, 3), steal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/BENCH/.sf1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--skip-small", action="store_true",
                    help="skip the sf0.1 arm (reuse numbers on file)")
    args = ap.parse_args()

    spark = build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled_dir(spark, args.src, args.out, args.factor)

    import __spark_entry__ as E

    qs = E.queries()
    result: dict = {}
    for name in args.queries.split(","):
        fn = qs[name]
        rec: dict = {}
        if not args.skip_small:
            rec["sf01_sec"], rec["sf01_steal"] = time_query(spark, fn, args.src)
        rec["sf1_sec"], rec["sf1_steal"] = time_query(spark, fn, args.out)
        if "sf01_sec" in rec:
            rec["ratio"] = round(rec["sf1_sec"] / rec["sf01_sec"], 2)
        result[name] = rec
        print(f"{name}: {rec}", file=sys.stderr, flush=True)
    result["config"] = {"factor": args.factor, "src": args.src, "out": args.out}
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
