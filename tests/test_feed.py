"""ChangesFeed / replicate_changes (streaming/feed.py): durable-cursor
incremental changelog consumption and exactly-once table→table
replication — resume-after-crash at every failure point (before merge,
between merge and cursor commit), fan-out independence, and the
falling-behind consumer paying one net diff."""

import glob

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
from embulk_filter_timestamp_format_spark.streaming import (
    ChangesFeed,
    CdcPipeline,
    TARGET_SCHEMA,
    replicate_changes,
)

N_EVENTS = 2000
N_DOCS = 300


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog_feed"))
    generate_binlog(spark, d, N_EVENTS, N_DOCS, num_chunks=4)
    return d


def _chunks(binlog_dir):
    return sorted(glob.glob(binlog_dir + "/chunk_*"))


def _state(table):
    return {
        r["doc_id"]: (tuple(r["tokens"] or ()), r["n_tok"], r["event_seq"])
        for r in table.read().collect()
    }


def _make_source(spark, tmp_path, binlog_dir, n_chunks=4, mode="cow"):
    src = IceTable.create(
        spark, str(tmp_path / "src"), TARGET_SCHEMA, key="doc_id",
        num_buckets=8, write_mode=mode,
    )
    CdcPipeline(spark, src).replay_chunks(_chunks(binlog_dir)[:n_chunks])
    return src


def test_replication_loop_reaches_source_state(spark, binlog_dir, tmp_path):
    src = _make_source(spark, tmp_path, binlog_dir, n_chunks=2)
    dst = IceTable.create(
        spark, str(tmp_path / "dst"), TARGET_SCHEMA, key="doc_id", num_buckets=8
    )
    feed = ChangesFeed(src, str(tmp_path / "cursor.json"), start_version=1)

    v = replicate_changes(feed, dst)
    assert v == src.current_version()
    assert _state(dst) == _state(src)
    # caught up → poll/replicate are no-ops
    assert feed.poll() is None
    assert replicate_changes(feed, dst) is None

    # more source batches; a later poll nets them in ONE diff
    CdcPipeline(spark, src).replay_chunks(_chunks(binlog_dir)[2:], start_batch=2)
    assert src.current_version() > feed.cursor
    v2 = replicate_changes(feed, dst)
    assert v2 == src.current_version()
    assert _state(dst) == _state(src)


def test_crash_between_merge_and_cursor_commit_is_exactly_once(
    spark, binlog_dir, tmp_path
):
    """Apply the merge but 'crash' before feed.commit: a fresh feed from
    the stale cursor re-delivers the same batch; the target's batch-id
    fence absorbs it and the final state stays correct."""
    src = _make_source(spark, tmp_path, binlog_dir, n_chunks=2)
    dst = IceTable.create(
        spark, str(tmp_path / "dst"), TARGET_SCHEMA, key="doc_id", num_buckets=8
    )
    cursor = str(tmp_path / "cursor.json")
    feed = ChangesFeed(src, cursor, start_version=1)

    changes, to_version = feed.poll()
    payload = [c for c in changes.columns if c != "_change_type"]
    upd = changes.select(
        *payload,
        F.when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )
    dst.merge_into(upd, batch_id=to_version, source="replication")
    applied_version = dst.current_version()
    # crash: cursor never committed — resume with a FRESH feed object
    feed2 = ChangesFeed(src, cursor, start_version=1)
    assert feed2.cursor == 1  # stale, as persisted
    v = replicate_changes(feed2, dst)
    assert v == to_version
    # fence made the re-apply a no-op commit-wise
    assert dst.current_version() == applied_version
    assert _state(dst) == _state(src)
    # and the cursor is now caught up
    assert ChangesFeed(src, cursor).cursor == to_version


def test_existing_cursor_wins_over_start_version(spark, binlog_dir, tmp_path):
    src = _make_source(spark, tmp_path, binlog_dir, n_chunks=2)
    cursor = str(tmp_path / "cursor.json")
    feed = ChangesFeed(src, cursor, start_version=1)
    changes, to_version = feed.poll()
    feed.commit(to_version)
    # re-open with a rewinding start_version: persisted cursor wins
    feed2 = ChangesFeed(src, cursor, start_version=1)
    assert feed2.cursor == to_version
    with pytest.raises(ValueError):
        feed2.commit(to_version - 1)


def test_independent_consumers_fan_out(spark, binlog_dir, tmp_path):
    src = _make_source(spark, tmp_path, binlog_dir, n_chunks=4)
    final = _state(src)
    for name in ("a", "b"):
        dst = IceTable.create(
            spark, str(tmp_path / f"dst_{name}"), TARGET_SCHEMA,
            key="doc_id", num_buckets=4,
        )
        feed = ChangesFeed(src, str(tmp_path / f"cur_{name}.json"), start_version=1)
        replicate_changes(feed, dst, source=f"replica_{name}")
        assert _state(dst) == final


def test_default_start_is_changes_from_now(spark, binlog_dir, tmp_path):
    src = _make_source(spark, tmp_path, binlog_dir, n_chunks=2)
    feed = ChangesFeed(src, str(tmp_path / "cursor.json"))  # no start_version
    assert feed.cursor == src.current_version()
    assert feed.poll() is None
    CdcPipeline(spark, src).replay_chunks(_chunks(binlog_dir)[2:3], start_batch=2)
    polled = feed.poll()
    assert polled is not None and polled[1] == src.current_version()
