"""Streaming windowed aggregation (watermark semantics) and the
applyInPandasWithState custom stateful operator."""

import glob

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.sources.binlog import BINLOG_SCHEMA, generate_binlog
from embulk_filter_timestamp_format_spark.streaming.windows import (
    track_doc_state,
    windowed_counts,
)

N_EVENTS = 3000
N_DOCS = 200


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog_stream"))
    generate_binlog(spark, d, N_EVENTS, N_DOCS, num_chunks=3)
    return d


def _stream(spark, binlog_dir):
    return (
        spark.readStream.schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(binlog_dir + "/chunk_*")
    )


def _with_ts(df):
    return df.withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))


def test_windowed_counts_stream_matches_batch(spark, binlog_dir):
    """Complete-mode streaming windowed agg over the full (bounded)
    stream equals the identical batch plan."""
    stream = _with_ts(_stream(spark, binlog_dir))
    out = windowed_counts(stream, window="1 minute", keys=("op",))
    q = (
        out.writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["window_end"], r["op"]): r["events"]
        for r in spark.sql("SELECT * FROM win_complete").collect()
    }
    batch_df = _with_ts(spark.read.schema(BINLOG_SCHEMA).parquet(binlog_dir + "/chunk_*"))
    expect = {
        (r["window_start"], r["window_end"], r["op"]): r["events"]
        for r in windowed_counts(batch_df, window="1 minute", keys=("op",)).collect()
    }
    assert got == expect


def test_windowed_counts_append_emits_only_finalized(spark, binlog_dir):
    """Append mode emits only windows the watermark has passed — a
    subset of the batch result, with exactly matching counts (no window
    is emitted before all its (non-late) data arrived)."""
    stream = _with_ts(_stream(spark, binlog_dir))
    out = windowed_counts(stream, window="1 minute", watermark="2 minutes", keys=("op",))
    q = (
        out.writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["window_end"], r["op"]): r["events"]
        for r in spark.sql("SELECT * FROM win_append").collect()
    }
    batch_df = _with_ts(spark.read.schema(BINLOG_SCHEMA).parquet(binlog_dir + "/chunk_*"))
    expect = {
        (r["window_start"], r["window_end"], r["op"]): r["events"]
        for r in windowed_counts(batch_df, window="1 minute", keys=("op",)).collect()
    }
    assert set(got) <= set(expect)
    for k, v in got.items():
        assert expect[k] == v  # finalized windows are complete


def test_track_doc_state_matches_batch_truth(spark, binlog_dir):
    """The stateful operator's LAST emission per doc equals the batch
    ground truth (total events, max seq, latest-op-is-delete)."""
    stream = _stream(spark, binlog_dir)
    q = (
        track_doc_state(stream)
        .writeStream.format("memory")
        .queryName("doc_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode re-emits a key every batch it appears in; the final
    # state is the row with the highest event count per doc
    rows = spark.sql("SELECT * FROM doc_state").collect()
    final = {}
    for r in rows:
        cur = final.get(r["doc_id"])
        if cur is None or r["events"] > cur["events"]:
            final[r["doc_id"]] = r

    ev = spark.read.schema(BINLOG_SCHEMA).parquet(binlog_dir + "/chunk_*")
    truth = {
        r["doc_id"]: r
        for r in ev.groupBy("doc_id")
        .agg(
            F.count("*").alias("events"),
            F.max("event_seq").alias("last_seq"),
            F.max_by("op", "event_seq").alias("last_op"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    for d, r in final.items():
        t = truth[d]
        assert (r["events"], r["last_seq"], r["deleted"]) == (
            t["events"],
            t["last_seq"],
            t["last_op"] == "D",
        ), d


def test_streaming_dedup_equals_batch_dedup(spark, tmp_path_factory):
    """streaming_dedup over chunked micro-batches (files delivered in
    id order) emits exactly the batch canonical-keep mapping — each
    fingerprint once, min doc_id, duplicate count — regardless of
    chunking."""
    from embulk_filter_timestamp_format_spark.operators.text import fingerprint_md5
    from embulk_filter_timestamp_format_spark.streaming.windows import streaming_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path_factory.mktemp("dedup_stream"))
    n = docs.count()
    # three id-ordered chunks so "first seen" == "min doc_id"
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/c{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/c*")
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["fp"]: (r["doc_id"], r["dups_suppressed"])
        for r in spark.sql("SELECT * FROM sdedup WHERE fp IS NOT NULL").collect()
    }
    expect = {
        r["fp"]: (r["winner"], r["dups"])
        for r in docs.select(fingerprint_md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("winner"),
            (F.count(F.lit(1)) - 1).alias("dups"),
        )
        .collect()
    }
    # every fingerprint emitted exactly once with the batch-true winner
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in expect.items()}
    # suppressed-dup counters: the memory sink sees only first-batch
    # rows, whose counter covers dups in that first batch; cross-batch
    # dups are counted in state (not re-emitted) — verify total dups via
    # survivors vs input size instead
    assert n - len(got) == sum(v[1] for v in expect.values())


def test_ttl_ms_parser():
    from embulk_filter_timestamp_format_spark.streaming.windows import _ttl_ms

    assert _ttl_ms(1500) == 1500
    assert _ttl_ms("2 seconds") == 2000
    assert _ttl_ms("5 minutes") == 300_000
    with pytest.raises(ValueError):
        _ttl_ms("fortnight")
    with pytest.raises(ValueError):
        _ttl_ms("3 fortnights")


def test_streaming_dedup_ttl_evicts_and_reemits(spark, tmp_path_factory):
    """With state_ttl set, a fingerprint idle past the TTL is evicted
    from the state store (processing-time timeout) and a later
    recurrence RE-emits — the documented bounded-state trade-off.

    Runs one CONTINUOUS micro-batch query and stops it explicitly:
    ProcessingTimeTimeout makes the engine keep scheduling (empty)
    batches to fire timers, so ``availableNow`` + ``awaitTermination``
    would never return (measured — batchIds climbed past 50 on a
    1-row input). The empty batches are also what evicts the idle key."""
    import time

    from embulk_filter_timestamp_format_spark.streaming.windows import streaming_dedup

    base = tmp_path_factory.mktemp("dedup_ttl")
    d, ck = str(base / "src"), str(base / "ck")
    schema = "doc_id LONG, text STRING"
    spark.createDataFrame([(0, "alpha alpha")], schema).coalesce(1).write.parquet(f"{d}/c0")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/c*")
    )
    q = (
        streaming_dedup(stream, state_ttl="2 seconds")
        .writeStream.format("memory")
        .queryName("sdedup_ttl")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .start()
    )

    def sink():
        return {
            (r["fp"], r["doc_id"])
            for r in spark.sql("SELECT * FROM sdedup_ttl WHERE fp IS NOT NULL").collect()
        }

    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            got = sink()
            if pred(got):
                return got
            time.sleep(0.5)
        return sink()

    try:
        first = wait_for(lambda g: len(g) == 1)
        assert len(first) == 1, f"alpha should emit once, got {first}"
        fp_alpha = next(iter(first))[0]

        # idle past the TTL: the engine's timer batches evict alpha
        time.sleep(4)
        # recurrence under a NEW doc_id: state is gone, so it re-emits
        spark.createDataFrame([(2, "alpha alpha")], schema).coalesce(1).write.parquet(
            f"{d}/c1"
        )
        second = wait_for(lambda g: (fp_alpha, 2) in g)
        assert (fp_alpha, 2) in second, (
            f"evicted fingerprint should re-emit with the new doc_id; got {second}"
        )
    finally:
        q.stop()


def test_streaming_dedup_no_ttl_still_suppresses(spark, tmp_path_factory):
    """Without a TTL the same restart scenario suppresses the recurrence
    (exact mode) — guards that the TTL plumbing didn't change the
    default path."""
    from embulk_filter_timestamp_format_spark.streaming.windows import streaming_dedup

    base = tmp_path_factory.mktemp("dedup_nottl")
    d, ck = str(base / "src"), str(base / "ck")
    schema = "doc_id LONG, text STRING"
    spark.createDataFrame([(0, "alpha alpha")], schema).coalesce(1).write.parquet(f"{d}/c0")
    spark.createDataFrame([(2, "alpha alpha")], schema).coalesce(1).write.parquet(f"{d}/c1")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/c*")
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup_nottl")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sdedup_nottl WHERE fp IS NOT NULL").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 0
