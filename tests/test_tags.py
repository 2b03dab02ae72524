"""Snapshot tags (lake/table.py tags section): named immutable refs that
pin a committed version — addressable everywhere a version number is
(read / scan / changes / time travel, via snapshot() resolution) — and
that protect the pinned snapshot and its data files from
expire_snapshots until dropped. Pins: resolution equality vs numeric
time travel, GC pinning + post-drop reclaim, immutability (duplicate
create rejected), guard rails (bad names, unknown tags, tagging
uncommitted versions), and branch-handle tag-namespace independence."""

import glob

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
from embulk_filter_timestamp_format_spark.streaming.cdc import (
    TARGET_SCHEMA,
    CdcPipeline,
)

N_EVENTS = 2000
N_DOCS = 300


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("binlog_tags"))
    generate_binlog(spark, d, N_EVENTS, N_DOCS, num_chunks=4)
    return d


def _chunks(binlog_dir):
    return sorted(glob.glob(binlog_dir + "/chunk_*"))


def _state(table, version=None):
    return {
        r["doc_id"]: (tuple(r["tokens"] or ()), r["n_tok"], r["event_seq"])
        for r in table.read(version).collect()
    }


def _make(spark, tmp_path, binlog_dir, n_chunks=2):
    t = IceTable.create(
        spark, str(tmp_path / "t"), TARGET_SCHEMA, key="doc_id", num_buckets=8
    )
    CdcPipeline(spark, t).replay_chunks(_chunks(binlog_dir)[:n_chunks])
    return t


def test_tag_resolves_like_version_everywhere(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=2)
    v_mid = t.current_version()
    t.create_tag("mid")
    CdcPipeline(spark, t).replay_chunks(_chunks(binlog_dir)[2:3], start_batch=2)
    v_head = t.current_version()
    t.create_tag("head", v_head)

    assert t.list_tags() == {"head": v_head, "mid": v_mid}
    assert t.tag_version("mid") == v_mid
    # read by tag == read by number
    assert _state(t, "mid") == _state(t, v_mid)
    assert _state(t, "head") == _state(t) == _state(t, v_head)
    # changes by tag == changes by number (both endpoints)
    by_tag = t.changes("mid", "head").orderBy("doc_id", "_change_type")
    by_num = t.changes(v_mid, v_head).orderBy("doc_id", "_change_type")
    assert by_tag.collect() == by_num.collect()
    # scan by tag honours the pinned snapshot
    n_mid = t.scan([("n_tok", ">=", 0)], version="mid").count()
    assert n_mid == t.read(v_mid).count()


def test_tag_pins_against_gc_until_dropped(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=1)
    v_tagged = t.current_version()
    t.create_tag("keepme")
    pinned = _state(t, v_tagged)
    for i in range(1, 4):
        # advance the fence: each chunk is a fresh, higher batch id
        CdcPipeline(spark, t).replay_chunks(
            _chunks(binlog_dir)[i : i + 1], start_batch=i
        )

    rep = t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    # the tagged snapshot and its files survived the horizon
    assert v_tagged in t.versions()
    assert _state(t, "keepme") == pinned
    assert rep["snapshots"] >= 1  # untagged middle versions did expire

    t.drop_tag("keepme")
    rep2 = t.expire_snapshots(keep_last=1, orphan_grace_sec=0)
    assert rep2["snapshots"] == 1
    assert v_tagged not in t.versions()
    with pytest.raises(FileNotFoundError):
        t.tag_version("keepme")


def test_tag_guard_rails(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=1)
    t.create_tag("r1")
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("r1")  # no silent re-point
    with pytest.raises(ValueError, match="invalid tag name"):
        t.create_tag("bad/name")
    with pytest.raises(ValueError, match="no committed version"):
        t.create_tag("future", t.current_version() + 7)
    with pytest.raises(FileNotFoundError):
        t.drop_tag("nope")
    with pytest.raises(FileNotFoundError):
        t.read("nope")


def test_branch_tags_are_namespaced(spark, binlog_dir, tmp_path):
    t = _make(spark, tmp_path, binlog_dir, n_chunks=2)
    t.create_tag("main-ref")
    br = t.create_branch("audit")
    CdcPipeline(spark, br).replay_chunks(_chunks(binlog_dir)[2:3], start_batch=2)
    br.create_tag("staged")
    # namespaces don't leak either way
    assert "staged" not in t.list_tags()
    assert "main-ref" not in br.list_tags()
    assert _state(br, "staged") == _state(br)
    t.drop_branch("audit")
