"""Catalog boundary: lake access through the Catalog/TableProtocol
surface (LocalCatalog → IceTable) and the documented SQL mapping of the
real-Iceberg adapter."""

import glob

import pytest

from embulk_filter_timestamp_format_spark.lake import (
    IcebergSparkCatalog,
    LocalCatalog,
    TableProtocol,
)
from embulk_filter_timestamp_format_spark.sources.binlog import generate_binlog
from embulk_filter_timestamp_format_spark.streaming.cdc import TARGET_SCHEMA, CdcPipeline


def test_local_catalog_lifecycle_and_replay(spark, tmp_path):
    cat = LocalCatalog(spark, str(tmp_path / "warehouse"))
    t = cat.create_table(
        "cdc.docs", TARGET_SCHEMA, key="doc_id", num_buckets=8, write_mode="mor"
    )
    assert isinstance(t, TableProtocol)  # structural conformance
    assert cat.table_exists("cdc.docs")
    assert cat.list_tables() == ["cdc.docs"]
    with pytest.raises(ValueError):
        cat.create_table("cdc.docs", TARGET_SCHEMA)

    d = str(tmp_path / "binlog")
    generate_binlog(spark, d, 1000, 200, num_chunks=2)
    CdcPipeline(spark, t).replay_chunks(sorted(glob.glob(d + "/chunk_*")))
    n = t.read().count()
    assert n > 0

    # an independently loaded handle sees the committed state
    t2 = cat.load_table("cdc.docs")
    assert t2.read().count() == n
    assert t2.current_version() == t.current_version()
    assert t2.last_batch_id("binlog") == 1

    cat.drop_table("cdc.docs")
    assert not cat.table_exists("cdc.docs")
    with pytest.raises(FileNotFoundError):
        cat.load_table("cdc.docs")


def test_local_catalog_rejects_path_escapes(spark, tmp_path):
    cat = LocalCatalog(spark, str(tmp_path / "w2"))
    for bad in ("../evil", "a/../b", "", "db..t"):
        with pytest.raises(ValueError):
            cat.create_table(bad, TARGET_SCHEMA)


def test_iceberg_adapter_requires_real_catalog(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergSparkCatalog(spark, "nonexistent_catalog")


def test_iceberg_adapter_sql_mapping():
    m = IcebergSparkCatalog.merge_sql("ice.cdc.docs", "updates_v", "doc_id")
    assert "MERGE INTO ice.cdc.docs t" in m
    assert "USING updates_v s" in m
    assert "ON t.doc_id = s.doc_id" in m
    assert "WHEN MATCHED AND s.op = 'D' THEN DELETE" in m
    assert "WHEN MATCHED THEN UPDATE SET *" in m
    assert "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *" in m

    f = IcebergSparkCatalog.fence_property_sql("ice.cdc.docs", "binlog", 41)
    assert f == (
        "ALTER TABLE ice.cdc.docs SET TBLPROPERTIES "
        "('cdc.last-batch-id.binlog' = '41')"
    )

    assert IcebergSparkCatalog.time_travel_sql("ice.cdc.docs", 123).endswith(
        "VERSION AS OF 123"
    )
    c = IcebergSparkCatalog.changelog_sql("ice", "cdc.docs", 5, 9)
    assert "create_changelog_view" in c and "'start-snapshot-id','5'" in c
    e = IcebergSparkCatalog.expire_sql("ice", "cdc.docs", "2026-01-01 00:00:00", 2)
    assert len(e) == 2 and "expire_snapshots" in e[0] and "remove_orphan_files" in e[1]

    ev = IcebergSparkCatalog.evolve_sql(
        "ice.cdc.docs",
        [("retype", "ingest_time_unix", "DOUBLE"), ("add", "quality", "FLOAT")],
    )
    assert ev == [
        "ALTER TABLE ice.cdc.docs ALTER COLUMN ingest_time_unix TYPE DOUBLE",
        "ALTER TABLE ice.cdc.docs ADD COLUMN quality FLOAT",
    ]
    with pytest.raises(ValueError):
        IcebergSparkCatalog.evolve_sql("t", [("drop", "c", "INT")])


def test_iceberg_sql_builders_reject_unsafe_names():
    """Identifiers and literals are validated before interpolation — a
    quote-bearing name raises instead of smuggling SQL."""
    for bad_ident in ("t; DROP TABLE x", "a.`b`", "d b", "a..b", ""):
        with pytest.raises(ValueError, match="unsafe"):
            IcebergSparkCatalog.merge_sql(bad_ident, "v", "k")
        with pytest.raises(ValueError, match="unsafe"):
            IcebergSparkCatalog.fence_property_sql(bad_ident, "s", 1)
    with pytest.raises(ValueError, match="unsafe"):
        IcebergSparkCatalog.merge_sql("t", "v", "k", delete_value="D' OR '1'='1")
    with pytest.raises(ValueError, match="unsafe"):
        IcebergSparkCatalog.last_batch_id_sql("t", "src' --")
    # clean names pass through unchanged (the pinned text above)
    assert "cdc.last-batch-id.binlog" in IcebergSparkCatalog.last_batch_id_sql(
        "ice.cdc.docs", "binlog"
    )
