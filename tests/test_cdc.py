"""CDC-layer tests: replay determinism, idempotent batch fencing,
resume-from-checkpoint equivalence, dedup semantics vs the window spec,
token-array equality invariant, schema evolution, time travel."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.sources.binlog import (
    BINLOG_SCHEMA,
    binlog_events,
    generate_binlog,
)
from embulk_filter_timestamp_format_spark.streaming.cdc import (
    TARGET_SCHEMA,
    CdcPipeline,
    dedup_latest,
)

N_EVENTS = 2000
N_DOCS = 300


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog"))
    generate_binlog(spark, d, N_EVENTS, N_DOCS, num_chunks=4)
    return d


def _fresh_table(spark, tmp_path, name="t"):
    return IceTable.create(
        spark, str(tmp_path / name), TARGET_SCHEMA, key="doc_id", num_buckets=8
    )


def _expected_final(spark, binlog_dir):
    """Reference replay semantics in plain SQL: latest event per doc_id by
    event_seq; deletes drop the row."""
    ev = spark.read.schema(BINLOG_SCHEMA).parquet(binlog_dir + "/chunk_*")
    w = Window.partitionBy("doc_id").orderBy(F.desc("event_seq"))
    latest = ev.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1")
    return latest.filter(F.col("op") != "D").select("doc_id", "tokens", "n_tok", "event_seq")


def _table_rows(table):
    return {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["event_seq"])
        for r in table.read().collect()
    }


def test_binlog_deterministic(spark):
    a = binlog_events(spark, 500, 100).orderBy("offset").collect()
    b = binlog_events(spark, 500, 100, num_partitions=7).orderBy("offset").collect()
    assert a == b
    # ops/skew sanity
    ops = {r["op"] for r in a}
    assert ops == {"I", "U", "D"}


def test_dedup_latest_matches_window_spec(spark):
    ev = binlog_events(spark, 1000, 50)
    got = dedup_latest(ev).select("doc_id", "event_seq").collect()
    w = Window.partitionBy("doc_id").orderBy(F.desc("event_seq"))
    spec = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", "event_seq")
        .collect()
    )
    assert sorted(got) == sorted(spec)
    # salted variant identical
    salted = dedup_latest(ev, salt_buckets=4).select("doc_id", "event_seq").collect()
    assert sorted(salted) == sorted(spec)
    # billion-key escape hatch (maxes NOT broadcast → AQE shuffled-hash
    # join) — identical result
    nobc = dedup_latest(ev, broadcast_maxes=False).select("doc_id", "event_seq").collect()
    assert sorted(nobc) == sorted(spec)


def test_replay_matches_reference_and_tokens(spark, binlog_dir, tmp_path):
    table = _fresh_table(spark, tmp_path)
    pipe = CdcPipeline(spark, table)
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    pipe.replay_chunks(chunks)

    got = _table_rows(table)
    expect = {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["event_seq"])
        for r in _expected_final(spark, binlog_dir).collect()
    }
    assert got == expect  # per-row token-array equality invariant included

    # lineage recorded per batch
    assert len(pipe.metrics) == len(chunks)
    assert pipe.metrics[0]["min_offset"] == 0
    assert pipe.metrics[-1]["max_offset"] == N_EVENTS - 1
    # tsfmt coercion materialized typed event_time
    row = table.read().filter(F.col("event_time").isNotNull()).first()
    assert row["event_time_str"].endswith("+0000")
    assert row["ingest_time_unix"] > 1_600_000_000


def test_duplicate_batch_idempotent(spark, binlog_dir, tmp_path):
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    t1 = _fresh_table(spark, tmp_path, "dup")
    pipe = CdcPipeline(spark, t1)
    pipe.replay_chunks(chunks)
    v_after = t1.current_version()
    # duplicate delivery of every batch: fenced, no new snapshots
    pipe2 = CdcPipeline(spark, t1)
    pipe2.replay_chunks(chunks)
    assert t1.current_version() == v_after

    # out-of-order / stale batch id also fenced
    df0 = spark.read.schema(BINLOG_SCHEMA).parquet(chunks[0])
    assert pipe2.apply_batch(df0, 0) is None


def test_resume_from_partial_replay(spark, binlog_dir, tmp_path):
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    # single-shot
    t_full = _fresh_table(spark, tmp_path, "full")
    CdcPipeline(spark, t_full).replay_chunks(chunks)
    # interrupted after 2 batches, then resumed by a NEW pipeline instance
    t_resume = _fresh_table(spark, tmp_path, "resume")
    CdcPipeline(spark, t_resume).replay_chunks(chunks[:2])
    CdcPipeline(spark, t_resume).replay_chunks(chunks, start_batch=0)  # re-delivers 0,1 too
    assert _table_rows(t_full) == _table_rows(t_resume)


def test_streaming_replay_equivalence(spark, binlog_dir, tmp_path):
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    t_stream = _fresh_table(spark, tmp_path, "stream")
    pipe = CdcPipeline(spark, t_stream)
    pipe.replay_stream(binlog_dir, str(tmp_path / "ckpt"), max_files_per_trigger=8)

    t_batch = _fresh_table(spark, tmp_path, "batch")
    CdcPipeline(spark, t_batch).replay_chunks(chunks)
    assert _table_rows(t_stream) == _table_rows(t_batch)


def test_time_travel_and_history(spark, binlog_dir, tmp_path):
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    table = _fresh_table(spark, tmp_path, "tt")
    pipe = CdcPipeline(spark, table)
    pipe.replay_chunks(chunks[:1])
    v1 = table.current_version()
    n1 = table.read().count()
    pipe.replay_chunks(chunks, start_batch=0)
    assert table.read(version=v1).count() == n1  # snapshot isolation
    hist = table.history()
    assert hist[0]["operation"] == "create"
    assert all(h["operation"] in ("create", "merge") for h in hist)


def test_schema_evolution_replay(spark, binlog_dir, tmp_path):
    """Retype-in-place mid-replay: ingest_time_unix long → double (the
    reference's schema-evolution rule lake-side); old files read through
    a cast projection, replay continues, token arrays unaffected."""
    import glob

    chunks = sorted(glob.glob(binlog_dir + "/chunk_*"))
    table = _fresh_table(spark, tmp_path, "evolve")
    pipe = CdcPipeline(spark, table)
    pipe.replay_chunks(chunks[:2])

    fields = []
    for f in TARGET_SCHEMA.fields:
        if f.name == "ingest_time_unix":
            fields.append(T.StructField(f.name, T.DoubleType(), True))
        else:
            fields.append(f)
    table.evolve_schema(T.StructType(fields))
    assert dict(table.read().dtypes)["ingest_time_unix"] == "double"

    # resume replay: updates keep flowing (coerced long casts into double on read)
    pipe2 = CdcPipeline(spark, table)
    pipe2.replay_chunks(chunks, start_batch=0)
    got = table.read()
    assert dict(got.dtypes)["ingest_time_unix"] == "double"

    t_plain = _fresh_table(spark, tmp_path, "plain")
    CdcPipeline(spark, t_plain).replay_chunks(chunks)
    assert _table_rows(table) == _table_rows(t_plain)


def test_stop_on_invalid_record_aborts_before_commit(spark, tmp_path):
    from embulk_filter_timestamp_format_spark.streaming.cdc import InvalidRecordError

    table = _fresh_table(spark, tmp_path, "err")
    pipe = CdcPipeline(spark, table, stop_on_invalid_record=True)
    good = binlog_events(spark, 50, 10)
    bad = good.withColumn(
        "event_time_str",
        F.when(F.col("offset") == 7, F.lit("NOT A TIME")).otherwise(F.col("event_time_str")),
    )
    v_before = table.current_version()
    with pytest.raises(InvalidRecordError):
        pipe.apply_batch(bad, 0)
    assert table.current_version() == v_before  # nothing committed
    # without the flag: invalid value → NULL, batch commits
    pipe_ok = CdcPipeline(spark, table, stop_on_invalid_record=False)
    pipe_ok.apply_batch(bad, 0)
    assert table.current_version() == v_before + 1
    nulls = table.read().filter(F.col("event_time_str").isNull()).count()
    assert nulls <= 1  # the poisoned row (if it won dedup) carries NULL
