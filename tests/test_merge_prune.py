"""File-scoped copy-on-write overwrite (merge_file_pruning): a COW
merge rewrites only the files of a touched bucket whose manifest KEY
bounds may contain a batch key; bound-disjoint files are carried
forward in the commit (Iceberg overwrite-by-file semantics).

Pinned here:

* state equivalence — pruning ON and OFF produce identical table state
  and identical changes() diffs over a randomized I/U/D batch sequence
* the carry actually happens under key-localized churn (the whole
  point), and carried files' entries are byte-identical in the manifest
* soundness fallbacks: no key stats (stats_cols=[]) → everything hit;
  deletes against carried ranges; inserts landing between file ranges
* cow_file_threshold bounds the per-bucket base-file chain (coalescing
  rewrite once the chain is too long)
* legacy-generation (pre-rebucket) files carry/hit correctly
"""

import random

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.streaming.cdc import TARGET_SCHEMA


def _payload(spark, ids, seq, op="U", tok=None):
    rows = [(d, tok or [1, 2], 2, "s", None, None, None, seq) for d in ids]
    return spark.createDataFrame(rows, TARGET_SCHEMA).withColumn("op", F.lit(op))


def _mixed(spark, tuples):
    """tuples: (doc_id, seq, op)"""
    rows = [(d, [int(s) % 7, 3], 2, "s", None, None, None, s) for d, s, _ in tuples]
    df = spark.createDataFrame(rows, TARGET_SCHEMA)
    ops = spark.createDataFrame([(d, o) for d, s, o in tuples], ["doc_id", "op"])
    return df.join(ops, "doc_id")


def _state(table, version=None):
    return {
        r["doc_id"]: (tuple(r["tokens"] or ()), r["event_seq"])
        for r in table.read(version).collect()
    }


def _ids(lo, hi):
    return [f"doc_{i:06d}" for i in range(lo, hi)]


def _make(spark, tmp_path, name, **kw):
    kw.setdefault("num_buckets", 4)
    return IceTable.create(spark, str(tmp_path / name), TARGET_SCHEMA, **kw)


# ------------------------------------------------------------- carry


def test_localized_churn_carries_disjoint_files(spark, tmp_path):
    t = _make(spark, tmp_path, "carry")
    # three appends with disjoint key ranges → each bucket holds three
    # files with disjoint per-file key bounds
    for lo in (0, 1000, 2000):
        t.append(_payload(spark, _ids(lo, lo + 300), seq=1).drop("op"))
    before = _state(t)
    # churn localized to the middle range: only the middle files rewrite
    upd = _ids(1100, 1140)
    t.merge_into(_payload(spark, upd, seq=2), batch_id=1)
    info = t.last_merge_info
    assert info["files_carried"] > 0
    assert info["files_rewritten"] < info["files_candidate"]
    after = _state(t)
    assert set(after) == set(before)
    for d in upd:
        assert after[d][1] == 2
    for d in set(before) - set(upd):
        assert after[d] == before[d]
    # carried entries are byte-identical in the new manifest
    old_paths = {f["path"]: f for f in t.snapshot(t.current_version() - 1)["files"]}
    new_paths = {f["path"]: f for f in t.snapshot()["files"]}
    carried = set(old_paths) & set(new_paths)
    assert len(carried) >= info["files_carried"]
    for p in carried:
        assert old_paths[p] == new_paths[p]


def test_insert_between_ranges_and_delete_in_carried_range(spark, tmp_path):
    t = _make(spark, tmp_path, "edges")
    t.append(_payload(spark, _ids(0, 200), seq=1).drop("op"))
    t.append(_payload(spark, _ids(1000, 1200), seq=1).drop("op"))
    # an insert whose key falls BETWEEN both file ranges must still land
    batch = _mixed(spark, [("doc_000500", 2, "I"), ("doc_001100", 2, "D")])
    t.merge_into(batch, batch_id=1)
    s = _state(t)
    assert "doc_000500" in s and s["doc_000500"][1] == 2
    assert "doc_001100" not in s
    assert len(s) == 400  # 200 + 200 - 1 delete + 1 insert


def test_delete_only_batch_prunes(spark, tmp_path):
    t = _make(spark, tmp_path, "delonly")
    t.append(_payload(spark, _ids(0, 200), seq=1).drop("op"))
    t.append(_payload(spark, _ids(1000, 1200), seq=1).drop("op"))
    t.merge_into(_payload(spark, _ids(0, 10), seq=2, op="D"), batch_id=1)
    assert t.last_merge_info["files_carried"] > 0
    s = _state(t)
    assert len(s) == 390
    assert not any(d in s for d in _ids(0, 10))


# ------------------------------------------------------- equivalence


def test_pruning_equivalence_random_batches(spark, tmp_path):
    ton = _make(spark, tmp_path, "on", merge_file_pruning=True)
    toff = _make(spark, tmp_path, "off", merge_file_pruning=False)
    rng = random.Random(5)
    universe = _ids(0, 600)
    for lo in (0, 200, 400):
        seed = _payload(spark, _ids(lo, lo + 200), seq=1).drop("op")
        ton.append(seed)
        toff.append(seed)
    for b in range(2, 7):
        tuples = [
            (d, b, rng.choice(["U", "U", "I", "D"]))
            for d in rng.sample(universe, 40)
        ]
        batch = _mixed(spark, tuples)
        ton.merge_into(batch, batch_id=b)
        toff.merge_into(batch, batch_id=b)
        assert _state(ton) == _state(toff)
    assert toff.last_merge_info["files_carried"] == 0
    # changes() across the whole replay agree too
    def diff(t):
        return {
            (r["doc_id"], r["_change_type"], r["event_seq"])
            for r in t.changes(4, t.current_version()).collect()
        }
    assert diff(ton) == diff(toff)


def test_no_stats_falls_back_to_full_rewrite(spark, tmp_path):
    t = _make(spark, tmp_path, "nostats", stats_cols=[])
    t.append(_payload(spark, _ids(0, 200), seq=1).drop("op"))
    t.append(_payload(spark, _ids(1000, 1200), seq=1).drop("op"))
    t.merge_into(_payload(spark, _ids(0, 5), seq=2), batch_id=1)
    info = t.last_merge_info
    assert info["files_carried"] == 0
    assert info["files_rewritten"] == info["files_candidate"]
    s = _state(t)
    assert len(s) == 400 and s["doc_000004"][1] == 2


# ---------------------------------------------------------- threshold


def test_cow_file_threshold_coalesces_chain(spark, tmp_path):
    t = _make(spark, tmp_path, "chain", num_buckets=2, cow_file_threshold=3)
    # repeated range-localized merges grow per-bucket chains; the
    # threshold must cap them with a coalescing whole-bucket rewrite
    for i in range(10):
        lo = i * 100
        t.merge_into(_payload(spark, _ids(lo, lo + 60), seq=i + 1), batch_id=i + 1)
    snap = t.snapshot()
    per_bucket: dict = {}
    for f in snap["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert max(per_bucket.values()) <= 3 + 1  # ≤ threshold + this batch's file
    assert len(_state(t)) == 10 * 60


# ------------------------------------------------------------ rebucket


def test_max_file_rows_splits_into_disjoint_ranges(spark, tmp_path):
    t = _make(spark, tmp_path, "split", num_buckets=2, max_file_rows=100)
    t.append(_payload(spark, _ids(0, 1000), seq=1).drop("op"))
    snap = t.snapshot()
    by_bucket: dict = {}
    for f in snap["files"]:
        by_bucket.setdefault(f["bucket"], []).append(f)
    for b, files in by_bucket.items():
        assert len(files) >= 4  # ~500 rows/bucket, ≤100 rows/file
        assert all(f["rows"] <= 100 for f in files)
        # key ranges are contiguous and pairwise disjoint (sorted split)
        spans = sorted(
            (f["stats"]["doc_id"]["min"], f["stats"]["doc_id"]["max"])
            for f in files
        )
        for (_, hi), (lo2, _) in zip(spans, spans[1:]):
            assert hi < lo2


def test_split_layout_prunes_in_steady_state(spark, tmp_path):
    """The whole point: with target-file splitting, key-localized churn
    keeps carrying cold files across REPEATED merges (a monolithic
    layout consolidates to full-span files after the first merge)."""
    t = _make(
        spark, tmp_path, "steady", num_buckets=2, max_file_rows=100,
        cow_file_threshold=8,
    )
    t.append(_payload(spark, _ids(0, 1000), seq=1).drop("op"))
    for i in range(2, 6):
        # churn localized to one drifting 30-doc window (~3%)
        lo = 100 * (i - 2)
        t.merge_into(_payload(spark, _ids(lo, lo + 30), seq=i), batch_id=i)
        info = t.last_merge_info
        assert info["files_carried"] > 0, f"merge {i} carried nothing"
        assert info["files_rewritten"] <= info["files_candidate"] // 2
    s = _state(t)
    assert len(s) == 1000
    for i in range(2, 6):
        lo = 100 * (i - 2)  # windows are disjoint: each doc updated once
        for d in _ids(lo, lo + 30):
            assert s[d][1] == i


def test_split_equivalence_and_excess_threshold(spark, tmp_path):
    ton = _make(spark, tmp_path, "son", num_buckets=2, max_file_rows=100,
                cow_file_threshold=2)
    toff = _make(spark, tmp_path, "soff", num_buckets=2,
                 merge_file_pruning=False)
    rng = random.Random(11)
    for t in (ton, toff):
        t.append(_payload(spark, _ids(0, 600), seq=1).drop("op"))
    for b in range(2, 8):
        tuples = [(d, b, rng.choice(["U", "I", "D"]))
                  for d in rng.sample(_ids(0, 700), 25)]
        batch = _mixed(spark, tuples)
        ton.merge_into(batch, batch_id=b)
        toff.merge_into(batch, batch_id=b)
        assert _state(ton) == _state(toff)
    # excess-over-ideal coalescing: chains stay bounded by ideal+threshold
    snap = ton.snapshot()
    per_bucket: dict = {}
    rows_b: dict = {}
    for f in snap["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
        rows_b[f["bucket"]] = rows_b.get(f["bucket"], 0) + f["rows"]
    for b, c in per_bucket.items():
        ideal = -(-rows_b[b] // 100)
        assert c <= ideal + 2 + 1  # + this batch's files


def test_probe_tier_gating(spark, tmp_path):
    """Tier 1 (batch-key envelope, free) vs tier 2 (exact in-Spark
    probe): monolithic layouts must never pay the probe job — the
    round-5 A/B measured it as pure overhead there — while split
    layouts engage it for files the envelope can't clear."""
    # monolithic: disjoint-range files, localized churn → carries via
    # the envelope alone, probe_ran stays False
    mono = _make(spark, tmp_path, "mono")
    for lo in (0, 1000):
        mono.append(_payload(spark, _ids(lo, lo + 200), seq=1).drop("op"))
    mono.merge_into(_payload(spark, _ids(1000, 1010), seq=2), batch_id=1)
    info = mono.last_merge_info
    assert info["probe_ran"] is False
    assert info["files_carried"] > 0
    # monolithic + envelope-overlapping batch: still no probe, no carry
    mono.merge_into(
        _mixed(spark, [("doc_000000", 3, "U"), ("doc_001199", 3, "U")]),
        batch_id=2,
    )
    assert mono.last_merge_info["probe_ran"] is False

    # split layout: a batch whose envelope spans the whole key range but
    # whose keys are sparse — the exact probe carries the in-envelope
    # gaps the envelope test cannot
    split = _make(spark, tmp_path, "gating_split", num_buckets=2,
                  max_file_rows=100)
    split.append(_payload(spark, _ids(0, 1000), seq=1).drop("op"))
    split.merge_into(
        _mixed(spark, [("doc_000001", 2, "U"), ("doc_000998", 2, "U")]),
        batch_id=1,
    )
    info = split.last_merge_info
    assert info["probe_ran"] is True
    assert info["files_carried"] > 0
    assert info["files_rewritten"] < info["files_candidate"]
    s = _state(split)
    assert len(s) == 1000
    assert s["doc_000001"][1] == 2 and s["doc_000998"][1] == 2


def test_pruning_across_rebucket_generations(spark, tmp_path):
    t = _make(spark, tmp_path, "rb", num_buckets=2)
    t.append(_payload(spark, _ids(0, 200), seq=1).drop("op"))
    t.append(_payload(spark, _ids(1000, 1200), seq=1).drop("op"))
    t.rebucket(4)
    before = _state(t)
    t.merge_into(_payload(spark, _ids(1000, 1020), seq=2), batch_id=1)
    info = t.last_merge_info
    assert info["files_carried"] > 0  # the doc_0000xx legacy files carry
    after = _state(t)
    assert set(after) == set(before)
    for d in _ids(1000, 1020):
        assert after[d][1] == 2
    for d in _ids(0, 200):
        assert after[d] == before[d]
