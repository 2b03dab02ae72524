"""Manifest column statistics + data-skipping scans (IceTable.scan).

Correctness contract: scan(preds) ≡ read().filter(preds) always — the
manifest bounds only prune files/buckets that PROVABLY contain no match.
Pruning contract: time/seq-ordered appends give disjoint per-file ranges,
so a range scan reads a strict subset of files (file granularity on COW,
bucket granularity on MOR)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.lake.table import (
    _entry_may_match,
    _stats_bound,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("event_seq", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tag", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _batch(spark, lo, hi):
    """Rows with doc_id==event_seq in [lo, hi), ts = epoch + seq minutes."""
    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, i, base + dt.timedelta(minutes=i), f"tag{i:06d}", float(i) / 7.0)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _sorted_ids(df):
    return sorted(r["doc_id"] for r in df.collect())


@pytest.fixture(scope="module")
def cow_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_cow"))
    t = IceTable.create(spark, root, SCHEMA, key="doc_id", num_buckets=4)
    for lo in (0, 400, 800):
        t.append(_batch(spark, lo, lo + 400))
    return t


def test_footer_stats_recorded(cow_table):
    snap = cow_table.snapshot()
    assert snap["files"], "appends committed no files"
    for f in snap["files"]:
        assert f["rows"] > 0
        st = f["stats"]
        # every top-level atomic column got bounds under stats_cols=auto
        for col in ("doc_id", "event_seq", "tag", "score"):
            assert st[col]["min"] is not None, (col, st)
            assert st[col]["min"] <= st[col]["max"]
        assert st["ts"]["type"] == "ts"
        assert isinstance(st["ts"]["min"], int)  # epoch micros
    total_rows = sum(f["rows"] for f in snap["files"])
    assert total_rows == 1200


def test_cow_scan_equals_filter_and_prunes(cow_table):
    got = cow_table.scan([("event_seq", ">=", 800)])
    expect = cow_table.read().filter(F.col("event_seq") >= 800)
    assert _sorted_ids(got) == _sorted_ids(expect) == list(range(800, 1200))
    info = cow_table.last_scan_info
    assert info["granularity"] == "file"
    # each append wrote 4 bucket files with a disjoint 400-row seq range;
    # only the third append's files can contain seq >= 800
    assert info["files_read"] < info["files_total"]
    assert info["files_read"] == 4 and info["files_total"] == 12


def test_cow_timestamp_between_scan(cow_table):
    base = dt.datetime(2026, 1, 1)
    lo, hi = base + dt.timedelta(minutes=100), base + dt.timedelta(minutes=450)
    got = cow_table.scan([("ts", "between", (lo, hi))])
    expect = cow_table.read().filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
    assert _sorted_ids(got) == _sorted_ids(expect) == list(range(100, 451))
    assert cow_table.last_scan_info["files_read"] == 8  # third append pruned


def test_scan_empty_range_reads_nothing(cow_table):
    got = cow_table.scan([("event_seq", ">", 10_000)])
    assert got.count() == 0
    assert cow_table.last_scan_info["files_read"] == 0


def test_scan_conjunction_prunes_per_predicate(cow_table):
    got = cow_table.scan([("event_seq", "<", 100), ("score", ">=", 0.0)])
    assert _sorted_ids(got) == list(range(0, 100))
    assert cow_table.last_scan_info["files_read"] == 4


def test_scan_string_equality(cow_table):
    got = cow_table.scan([("tag", "=", "tag000450")])
    assert _sorted_ids(got) == [450]
    assert cow_table.last_scan_info["files_read"] <= 4


def test_scan_validates_inputs(cow_table):
    with pytest.raises(ValueError, match="unknown column"):
        cow_table.scan([("nope", ">=", 1)])
    with pytest.raises(ValueError, match="unsupported scan op"):
        cow_table.scan([("doc_id", "!=", 1)])


def test_mor_scan_bucket_granularity(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_mor"))
    t = IceTable.create(
        spark, root, SCHEMA, key="doc_id", num_buckets=4, write_mode="mor",
        compact_threshold=100,
    )
    t.append(_batch(spark, 0, 400))
    # delta batch updates doc 7 to a HIGH seq — its base file's seq range
    # [0,400) now understates the merged row; bucket granularity must keep
    # the bucket because the DELTA file's bounds match.
    upd = _batch(spark, 7, 8).withColumn(
        "event_seq", F.lit(9_999).cast("long")
    ).withColumn("op", F.lit("U"))
    t.merge_into(upd, batch_id=1)

    got = t.scan([("event_seq", ">=", 9_000)])
    rows = got.collect()
    assert [r["doc_id"] for r in rows] == [7]
    assert rows[0]["event_seq"] == 9_999
    info = t.last_scan_info
    assert info["granularity"] == "bucket"
    assert info["buckets_skipped"] == 3  # only doc 7's bucket survives
    # equivalence with the unpruned read on a broader predicate
    got2 = _sorted_ids(t.scan([("event_seq", "<", 50)]))
    expect2 = _sorted_ids(t.read().filter(F.col("event_seq") < 50))
    assert got2 == expect2


def test_mor_delete_not_resurrected_by_scan(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_mor_del"))
    t = IceTable.create(
        spark, root, SCHEMA, key="doc_id", num_buckets=2, write_mode="mor",
        compact_threshold=100,
    )
    t.append(_batch(spark, 0, 50))
    dels = _batch(spark, 10, 11).withColumn(
        "event_seq", F.lit(1_000).cast("long")
    ).withColumn("op", F.lit("D"))
    t.merge_into(dels, batch_id=1)
    got = _sorted_ids(t.scan([("doc_id", "between", (5, 15))]))
    assert got == [i for i in range(5, 16) if i != 10]


def test_all_null_column_prunes_comparisons(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_nulls"))
    t = IceTable.create(spark, root, SCHEMA, key="doc_id", num_buckets=1)
    df = _batch(spark, 0, 20).withColumn("score", F.lit(None).cast("double"))
    t.append(df)
    got = t.scan([("score", ">=", 0.0)])
    assert got.count() == 0
    assert t.last_scan_info["files_read"] == 0  # proven impossible from nulls


def test_stats_cols_list_and_disable(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scan_pin"))
    t = IceTable.create(
        spark, root, SCHEMA, key="doc_id", num_buckets=1,
        stats_cols=["event_seq"],
    )
    t.append(_batch(spark, 0, 10))
    st = t.snapshot()["files"][0]["stats"]
    assert set(st) == {"event_seq"}
    # un-tracked column: scan stays correct, just never prunes on it
    assert _sorted_ids(t.scan([("doc_id", "<", 3)])) == [0, 1, 2]
    assert t.last_scan_info["files_read"] == 1

    root2 = str(tmp_path_factory.mktemp("scan_off"))
    t2 = IceTable.create(
        spark, root2, SCHEMA, key="doc_id", num_buckets=1, stats_cols=[]
    )
    t2.append(_batch(spark, 0, 10))
    assert "stats" not in t2.snapshot()["files"][0]
    assert _sorted_ids(t2.scan([("doc_id", "<", 3)])) == [0, 1, 2]


def test_string_max_truncation_is_upper_bound():
    long = "b" * 100
    lo, _ = _stats_bound(long, lower=True)
    hi, _ = _stats_bound(long, lower=False)
    assert lo == "b" * 64 and lo <= long
    assert hi > long  # rounded UP, still a valid upper bound
    entry = {"rows": 1, "stats": {"s": {"min": lo, "max": hi, "nulls": 0, "type": "plain"}}}
    assert _entry_may_match(entry, "s", "=", long)  # the real value survives
    assert not _entry_may_match(entry, "s", "<", "a")
    assert not _entry_may_match(entry, "s", ">", "c")


def test_bounds_conservative_on_type_mismatch():
    entry = {"rows": 5, "stats": {"x": {"min": 1, "max": 9, "nulls": 0, "type": "plain"}}}
    # incomparable literal → keep the file (never a wrong prune)
    assert _entry_may_match(entry, "x", ">=", "zzz")
    assert _entry_may_match(entry, "x", "=", 5)
    assert not _entry_may_match(entry, "x", ">", 9)
    assert _entry_may_match(entry, "x", ">=", 9)


def test_sorted_within_bucket_row_groups(spark, tmp_path_factory):
    """sort_cols gives z-order-lite files: rows inside each bucket file
    are seq-sorted, so with small row groups (parquet_block_bytes) the
    per-row-group min/max ranges are DISJOINT — the parquet reader's
    row-group pruning becomes effective on seq/time filters. Also proves
    the dynamic-partition writer did not re-sort (a __bucket-only re-sort
    is unstable and would scramble the secondary order)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("scan_sorted"))
    t = IceTable.create(
        spark, root, SCHEMA, key="doc_id", num_buckets=2,
        sort_cols=["event_seq"], parquet_block_bytes=64 * 1024,
    )
    # scrambled arrival order: the write path must impose the sort
    t.append(_batch(spark, 0, 20000).orderBy(F.xxhash64("doc_id")))

    snap = t.snapshot()
    multi_rg = 0
    for f in snap["files"]:
        pf = pq.ParquetFile(os.path.join(root, f["path"]))
        md = pf.metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "event_seq"
        )
        bounds = [
            (md.row_group(rg).column(idx).statistics.min,
             md.row_group(rg).column(idx).statistics.max)
            for rg in range(md.num_row_groups)
        ]
        for lo, hi in bounds:
            assert lo <= hi
        # row groups cover disjoint, ascending seq ranges
        for (_, hi1), (lo2, _) in zip(bounds, bounds[1:]):
            assert hi1 < lo2, bounds
        if md.num_row_groups > 1:
            multi_rg += 1
        seqs = pf.read(columns=["event_seq"])["event_seq"].to_pylist()
        assert seqs == sorted(seqs)
    assert multi_rg == len(snap["files"])  # block sizing actually bit

    # scan + filter equivalence unchanged by the sorted layout
    got = _sorted_ids(t.scan([("event_seq", "between", (5000, 5100))]))
    assert got == list(range(5000, 5101))
