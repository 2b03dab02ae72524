"""Write-audit-publish branches (lake/table.py branch section): isolated
staging of CDC batches on a branch, audit against the branch state, then
metadata-only fast-forward publish onto main — or drop + GC reclaim.
Pins: main isolation while a branch accumulates commits, squash-publish
state equality + changes() across the publish, batch-id fences surviving
the publish (post-publish redelivery is a no-op), fast-forward conflict
when main advances, MOR branches (deltas + compaction staged on the
branch), GC protecting live-branch files and reclaiming dropped ones,
and the guard rails (branch-of-branch, branch-handle lifecycle ops)."""

import glob

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.lake.table import CommitConflict
from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
from embulk_filter_timestamp_format_spark.streaming.cdc import (
    TARGET_SCHEMA,
    CdcPipeline,
)

N_EVENTS = 2000
N_DOCS = 300


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog_wap"))
    generate_binlog(spark, d, N_EVENTS, N_DOCS, num_chunks=4)
    return d


def _chunks(binlog_dir):
    return sorted(glob.glob(binlog_dir + "/chunk_*"))


def _state(table, version=None):
    return {
        r["doc_id"]: (tuple(r["tokens"] or ()), r["n_tok"], r["event_seq"])
        for r in table.read(version).collect()
    }


def _make(spark, tmp_path, binlog_dir, n_chunks=2, mode="cow"):
    t = IceTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id",
        num_buckets=8, write_mode=mode,
    )
    CdcPipeline(spark, t).replay_chunks(_chunks(binlog_dir)[:n_chunks])
    return t


def test_wap_publish_roundtrip(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir)
    fork_v = t.current_version()
    main_before = _state(t)

    br = t.create_branch("audit")
    assert br.branch_name == "audit"
    assert t.list_branches() == ["audit"]
    CdcPipeline(spark, br).replay_chunks(_chunks(binlog_dir)[2:4], start_batch=2)

    # isolation: main sees nothing until publish; branch sees its commits
    assert _state(t) == main_before
    assert t.current_version() == fork_v
    branch_state = _state(br)
    assert branch_state != main_before

    pub_v = t.publish_branch("audit")
    assert pub_v == fork_v + 1  # squash: one main commit
    assert _state(t) == branch_state
    assert t.snapshot()["summary"]["operation"] == "publish"
    assert t.list_branches() == []  # dropped on publish

    # changes() across the publish = the branch's net churn vs the fork
    changed = {r["doc_id"] for r in t.changes(fork_v, pub_v).collect()}
    expect = {
        k for k in set(main_before) | set(branch_state)
        if main_before.get(k) != branch_state.get(k)
    }
    assert changed == expect


def test_publish_carries_batch_fences(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir)
    br = t.create_branch("stage")
    pipe = CdcPipeline(spark, br)
    pipe.replay_chunks(_chunks(binlog_dir)[2:3], start_batch=2)
    staged_last = br.last_batch_id(source=pipe.source_name)
    assert staged_last is not None

    t.publish_branch("stage")
    assert t.last_batch_id(source=pipe.source_name) == staged_last

    # post-publish redelivery of the staged batch onto MAIN is fenced
    v_before = t.current_version()
    state_before = _state(t)
    CdcPipeline(spark, t).replay_chunks(_chunks(binlog_dir)[2:3], start_batch=2)
    assert _state(t) == state_before
    assert t.current_version() == v_before


def test_publish_fast_forward_conflict(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=1)
    br = t.create_branch("stale")
    CdcPipeline(spark, br).replay_chunks(_chunks(binlog_dir)[1:2], start_batch=1)
    # main advances under the branch -> audit is stale
    CdcPipeline(spark, t).replay_chunks(_chunks(binlog_dir)[2:3], start_batch=1)
    with pytest.raises(CommitConflict, match="advanced"):
        t.publish_branch("stale")
    assert t.list_branches() == ["stale"]  # conflict does not drop it
    t.drop_branch("stale")


def test_drop_branch_and_gc_reclaims_only_branch_files(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=1)
    main_state = _state(t)
    br = t.create_branch("bad")
    CdcPipeline(spark, br).replay_chunks(_chunks(binlog_dir)[1:3], start_batch=1)

    # live branch pins its files even past the grace window
    res = t.expire_snapshots(keep_last=100, orphan_grace_sec=0.0)
    assert res["files"] == 0
    assert _state(br) != main_state  # branch still readable after GC

    t.drop_branch("bad")
    res = t.expire_snapshots(keep_last=100, orphan_grace_sec=0.0)
    assert res["files"] > 0  # branch-only data reclaimed
    assert _state(t) == main_state  # main untouched by the whole episode


def test_wap_mor_branch_with_compaction(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=2, mode="mor")
    fork_v = t.current_version()
    br = t.create_branch("mor-stage")
    CdcPipeline(spark, br).replay_chunks(_chunks(binlog_dir)[2:4], start_batch=2)
    staged = _state(br)
    br.compact()  # audit-side maintenance stages on the branch too
    assert _state(br) == staged
    pub_v = t.publish_branch("mor-stage")
    assert _state(t) == staged
    assert {r["doc_id"] for r in t.changes(fork_v, pub_v).collect()} == {
        k for k in set(staged) | set(_state(t, fork_v))
        if _state(t, fork_v).get(k) != staged.get(k)
    }


def test_branch_guard_rails(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=1)
    br = t.create_branch("a")
    with pytest.raises(ValueError, match="branch from a branch"):
        br.create_branch("b")
    with pytest.raises(ValueError, match="main handle"):
        br.expire_snapshots()
    with pytest.raises(ValueError, match="main handle"):
        br.publish_branch("a")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("a")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("../escape")
    with pytest.raises(FileNotFoundError):
        t.branch("missing")
    # empty-branch publish is a no-op commit-wise
    v = t.current_version()
    assert t.publish_branch("a") == v
    assert t.list_branches() == []
