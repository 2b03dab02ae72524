"""File-ingestion parity: run the reference's own example input FILES
through the readers + filter and compare against the committed goldens.
(Reads the reference's example data files read-only; skipped when absent.)"""

import os

import pytest

from embulk_filter_timestamp_format_spark.plans import TaskConfig, apply_task
from embulk_filter_timestamp_format_spark.sources.readers import read_csv, read_jsonl

REF = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference examples not available"
)


def test_from_string_csv_file(spark):
    from tests.test_golden_examples import FROM_STRING_GOLDEN, FROM_STRING_TASK

    df = read_csv(
        spark,
        f"{REF}/from_string.csv",
        "string1 string, string2 string, string3 string, string4 string, record string",
    )
    # embulk csv parser trims the trailing padding differently; normalize
    out = apply_task(df, TaskConfig.from_dict(FROM_STRING_TASK))
    rows = sorted(out.collect(), key=lambda r: (r["string1"], r["string2"]))
    golden = sorted((g[0], g[1]) for g in FROM_STRING_GOLDEN)
    got = [(r["string1"], r["string2"]) for r in rows]
    assert got == golden


def test_nested_jsonl_file(spark):
    df = read_jsonl(spark, f"{REF}/nested.jsonl")
    task = TaskConfig.from_dict(
        {
            "default_to_timezone": "Asia/Tokyo",
            "default_to_timestamp_format": "%Y-%m-%d %H:%M:%S.%N",
            "columns": [
                {
                    "name": "$.record.timestamp",
                    "type": "long",
                    "from_format": ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"],
                    "to_unit": "ms",
                },
                {
                    "name": "$.record.nested.nested[0].timestamp",
                    "from_format": ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"],
                },
            ],
        }
    )
    import json

    out = [json.loads(r["record"]) for r in apply_task(df, task).collect()]
    by_ts = {x["timestamp"]: x for x in out}
    assert by_ts[1436713200000]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.000000000"
    assert by_ts[1436713200100]["nested"]["nested"][0]["timestamp"] == "2015-07-13 00:00:00.100000000"
    assert by_ts[1436713200000]["ignore_nested"]["timestamp"] == "2015-07-12 15:00:00 UTC"
