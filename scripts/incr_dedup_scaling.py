"""Evidence that incremental_dedup_pass cost tracks CHURN, not corpus size.

Protocol: for each corpus size N (same churn C): synth N deterministic
docs Catalyst-side (no driver lists), seed an IceTable, run the
bootstrap pass (signs all N — NOT the steady-state claim, reported for
contrast), merge a C-doc churn batch (updates with ~10% planted dups),
then time the steady-state incremental pass. If the design holds,
pass_sec grows far slower than N (the only N-proportional inputs are
the slim sketch read and the merge bookkeeping; the text-expensive
signature/verify work is C-proportional).

Usage:
    python scripts/incr_dedup_scaling.py [sizes_csv] [churn]
    # defaults: 20000,80000  1000
Prints one JSON line per corpus size.
"""

import json
import sys
import time


from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, ".")

from embulk_filter_timestamp_format_spark.lake import IceTable  # noqa: E402
from embulk_filter_timestamp_format_spark.operators.incremental import (  # noqa: E402
    create_sketch_table,
    incremental_dedup_pass,
)
from bench import _proc_stat_sample, _steal_pct  # noqa: E402  (steal telemetry)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def synth_docs(spark, n, seq_base=0, variant=""):
    """N deterministic ~40-word docs, built Catalyst-side with
    hash-mixed tokens (xxhash64 of doc_id*64+j) — an earlier affine
    formula made token sets arithmetic progressions sharing one step,
    which turned ~0.2% of ALL pairs into accidental near-dups; hashing
    kills the structure. Zero driver materialization."""
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(
                F.xxhash64(F.col("doc_id") * 64 + j), F.lit(50021)
            ).cast("string"),
        ),
    )
    return ids.select(
        "doc_id",
        F.concat(F.array_join(tok, " "), F.lit(variant)).alias("text"),
        (F.col("doc_id") + F.lit(seq_base)).alias("event_seq"),
    )


def run_one(spark, n, churn, root, tag, mode="cow"):
    corpus = IceTable.create(
        spark, f"{root}/corpus_{tag}", SCHEMA, key="doc_id", num_buckets=16,
        write_mode=mode, compact_threshold=16,
    )
    sketch = create_sketch_table(spark, f"{root}/sketch_{tag}", num_buckets=16)
    v0 = corpus.current_version()
    corpus.merge_into(
        synth_docs(spark, n).withColumn("op", F.lit("U")), batch_id=0, source="ingest"
    )
    s0 = _proc_stat_sample()
    t0 = time.time()
    r1 = incremental_dedup_pass(corpus, sketch, v0, batch_id=100)
    bootstrap_sec = time.time() - t0
    bootstrap_steal = _steal_pct(s0, _proc_stat_sample())
    after_bootstrap = corpus.read().count()

    # churn batch: C updated docs (new variant text); every 10th churned
    # doc instead copies its neighbor's NEW text → planted near-dups so
    # the steady-state pass exercises the drop path too
    upd = synth_docs(spark, churn, seq_base=n + 1, variant=" v2 extra tokens here")
    neighbor = synth_docs(spark, churn, seq_base=n + 1, variant=" v2 extra tokens here")
    dup_text = neighbor.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("__dup")
    )
    upd = (
        upd.join(dup_text, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 == 0) & F.col("__dup").isNotNull(),
                F.col("__dup"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "event_seq",
        )
        .withColumn("op", F.lit("U"))
    )
    corpus.merge_into(upd, batch_id=1, source="ingest")
    after = r1["corpus_version"] or r1["to_version"]
    s1 = _proc_stat_sample()
    t1 = time.time()
    r2 = incremental_dedup_pass(corpus, sketch, after, batch_id=101)
    pass_sec = time.time() - t1
    pass_steal = _steal_pct(s1, _proc_stat_sample())
    dropped = (
        0
        if r2["corpus_version"] is None
        else after_bootstrap - corpus.read().count()
    )
    return {
        "corpus": n,
        "churn": churn,
        "mode": mode,
        "bootstrap_sec": round(bootstrap_sec, 2),
        "bootstrap_steal_pct": bootstrap_steal,
        "pass_sec": round(pass_sec, 2),
        "pass_steal_pct": pass_steal,
        "bootstrap_dropped": int(n - after_bootstrap),
        "dropped": int(dropped),
    }


def main():
    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "20000,80000").split(",")]
    churn = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    mode = sys.argv[3] if len(sys.argv) > 3 else "cow"
    import tempfile

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("incr-dedup-scaling")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="incr_scaling_")
    for i, n in enumerate(sizes):
        print(json.dumps(run_one(spark, n, churn, root, i, mode)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
