"""End-to-end golden parity with the reference's example/ outputs.

Each test reproduces one committed `embulk preview` golden
(reference: example/{from_string,from_long,from_double,from_timestamp,
timezone,nested,from_string_java}.{yml,csv,jsonl,txt}) as a DataFrame
transformation, for BOTH engines (catalyst expressions and Arrow/pandas
kernels). Expected values are the literal golden strings; numeric columns
use the scalar spec kernels (unit-tested against reference constants).
"""

import datetime as dt
import json

import pytest

from embulk_filter_timestamp_format_spark.plans import TaskConfig, apply_task

ENGINES = ["catalyst", "arrow"]


def _run(spark, engine, rows, schema, task_dict):
    df = spark.createDataFrame(rows, schema)
    task = TaskConfig.from_dict({**task_dict, "engine": engine})
    return apply_task(df, task).collect()


def utc(*args, micros=0):
    return dt.datetime(*args, microsecond=micros)


# ---------------------------------------------------------------------------
# example/from_string.yml → from_string.txt (ruby dialect, 5-format cascade)
# ---------------------------------------------------------------------------

FROM_STRING_TASK = {
    "default_from_timezone": "Asia/Taipei",
    "default_from_timestamp_format": [
        "%Y-%m-%d %H:%M:%S.%N %z",
        "%Y-%m-%d %H:%M:%S %z",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d %z",
        "%Y-%m-%d",
    ],
    "default_to_timezone": "Asia/Taipei",
    "default_to_timestamp_format": "%Y-%m-%d %H:%M:%S.%N",
    "columns": [
        {"name": "string1", "type": "string"},
        {"name": "string2", "type": "long", "to_unit": "ms"},
        {"name": "string3", "type": "double", "to_unit": "ms"},
        {"name": "string4", "type": "timestamp"},
        {"name": "$.record.string1", "to_timezone": "Asia/Taipei", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "$.record.string2", "type": "long", "to_unit": "ms"},
        {"name": "$.record.string3", "type": "double", "to_unit": "ms"},
    ],
}

FROM_STRING_INPUTS = [
    "2015-07-13",
    "2015-07-13 UTC",
    "2015-07-13 00:00:00",
    "2015-07-12 16:00:00 UTC",
    "2015-07-12 16:00:00.1 UTC",
    "2015-07-12 16:00:00.12 UTC",
    "2015-07-12 16:00:00.123 UTC",
    "2015-07-12 16:00:00.1234 UTC",
    "2015-07-12 16:00:00.12345 UTC",
    "2015-07-12 16:00:00.123456 UTC",
    "2015-07-12 16:00:00.1234567 UTC",
    "2015-07-12 16:00:00.12345678 UTC",
    "2015-07-12 16:00:00.123456789 UTC",
]

# golden from_string.txt: (string1, string2:long ms, nanos-of-instant)
FROM_STRING_GOLDEN = [
    ("2015-07-13 00:00:00.000000000", 1436716800000, 1436716800000000000),
    ("2015-07-13 08:00:00.000000000", 1436745600000, 1436745600000000000),
    ("2015-07-13 00:00:00.000000000", 1436716800000, 1436716800000000000),
    ("2015-07-13 00:00:00.000000000", 1436716800000, 1436716800000000000),
    ("2015-07-13 00:00:00.100000000", 1436716800100, 1436716800100000000),
    ("2015-07-13 00:00:00.120000000", 1436716800120, 1436716800120000000),
    ("2015-07-13 00:00:00.123000000", 1436716800123, 1436716800123000000),
    ("2015-07-13 00:00:00.123400000", 1436716800123, 1436716800123400000),
    ("2015-07-13 00:00:00.123450000", 1436716800123, 1436716800123450000),
    ("2015-07-13 00:00:00.123456000", 1436716800123, 1436716800123456000),
    ("2015-07-13 00:00:00.123456700", 1436716800123, 1436716800123456700),
    ("2015-07-13 00:00:00.123456780", 1436716800123, 1436716800123456780),
    ("2015-07-13 00:00:00.123456789", 1436716800123, 1436716800123456789),
]


@pytest.mark.parametrize("engine", ENGINES)
def test_from_string_golden(spark, engine):
    rows = [
        (s, s, s, s, json.dumps({"string1": s, "string2": s, "string3": s}))
        for s in FROM_STRING_INPUTS
    ]
    out = _run(
        spark, engine, rows,
        "string1 string, string2 string, string3 string, string4 string, record string",
        FROM_STRING_TASK,
    )
    for row, (g_str, g_ms, g_nanos) in zip(out, FROM_STRING_GOLDEN):
        assert row["string1"] == g_str
        assert row["string2"] == g_ms
        # toDouble(ms): integer ms part + fractional sub-ms (float64)
        expect_dbl = float(g_ms) + (g_nanos - g_ms * 10**6) / 10**6
        assert row["string3"] == expect_dbl
        # timestamp target: µs floor of the instant
        expect_ts = dt.datetime.fromtimestamp(g_nanos // 1000 / 10**6, dt.timezone.utc)
        assert row["string4"].replace(tzinfo=dt.timezone.utc) == expect_ts
        rec = json.loads(row["record"])
        assert rec["string1"] == g_str
        assert rec["string2"] == g_ms
        assert rec["string3"] == expect_dbl


# ---------------------------------------------------------------------------
# example/from_long.yml → from_long.txt (epoch-ms source)
# ---------------------------------------------------------------------------

FROM_LONG_TASK = {
    "default_from_timestamp_unit": "ms",
    "columns": [
        {"name": "long1", "to_timezone": "Asia/Tokyo", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "long2", "type": "long"},
        {"name": "long3", "type": "double"},
        {"name": "long4", "type": "timestamp"},
        {"name": "$.record.long1", "to_timezone": "Asia/Tokyo", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "$.record.long2", "type": "long"},
        {"name": "$.record.long3", "type": "double"},
    ],
}


@pytest.mark.parametrize("engine", ENGINES)
def test_from_long_golden(spark, engine):
    v = 1436713200100
    rows = [(v, v, v, v, json.dumps({"long1": v, "long2": v, "long3": v}))]
    out = _run(
        spark, engine, rows,
        "long1 long, long2 long, long3 long, long4 long, record string",
        FROM_LONG_TASK,
    )
    row = out[0]
    assert row["long1"] == "2015-07-13 00:00:00.100000000"
    assert row["long2"] == 1436713200  # changeUnit trunc ms→sec
    assert row["long3"] == 1436713200.0  # (double) changeUnit — integer!
    assert row["long4"].replace(tzinfo=dt.timezone.utc) == dt.datetime(
        2015, 7, 12, 15, 0, 0, 100000, tzinfo=dt.timezone.utc
    )
    rec = json.loads(row["record"])
    assert rec == {
        "long1": "2015-07-13 00:00:00.100000000",
        "long2": 1436713200,
        "long3": 1436713200.0,
    }


# ---------------------------------------------------------------------------
# example/from_double.yml → from_double.txt (float64 fine print)
# ---------------------------------------------------------------------------

FROM_DOUBLE_TASK = {
    "default_from_timestamp_unit": "ms",
    "columns": [
        {"name": "double1", "to_timezone": "Asia/Tokyo", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "double2", "type": "long"},
        {"name": "double3", "type": "double"},
        {"name": "double4", "type": "timestamp"},
        {"name": "$.record.double1", "to_timezone": "Asia/Tokyo", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "$.record.double2", "type": "long"},
        {"name": "$.record.double3", "type": "double"},
    ],
}


@pytest.mark.parametrize("engine", ENGINES)
def test_from_double_golden(spark, engine):
    v = 1436713200100.2
    rows = [(v, v, v, v, json.dumps({"double1": v, "double2": v, "double3": v}))]
    out = _run(
        spark, engine, rows,
        "double1 double, double2 double, double3 double, double4 double, record string",
        FROM_DOUBLE_TASK,
    )
    row = out[0]
    # float64 path: 1436713200100.2 ms → ...100199936 ns (golden fine print #4)
    assert row["double1"] == "2015-07-13 00:00:00.100199936"
    assert row["double2"] == 1436713200
    assert row["double3"] == 1436713200100.2 / 1000.0
    assert row["double4"].replace(tzinfo=dt.timezone.utc) == dt.datetime(
        2015, 7, 12, 15, 0, 0, 100199, tzinfo=dt.timezone.utc
    )
    rec = json.loads(row["record"])
    assert rec["double1"] == "2015-07-13 00:00:00.100199936"
    assert rec["double2"] == 1436713200
    assert rec["double3"] == 1436713200100.2 / 1000.0


# ---------------------------------------------------------------------------
# example/from_timestamp.yml → from_timestamp.txt
# ---------------------------------------------------------------------------

FROM_TIMESTAMP_TASK = {
    "default_to_timezone": "Asia/Tokyo",
    "default_to_timestamp_format": "%Y-%m-%d %H:%M:%S.%N",
    "columns": [
        {"name": "timestamp1", "to_format": "%Y-%m-%d %H:%M:%S.%N"},
        {"name": "timestamp2", "type": "long", "to_unit": "ms"},
        {"name": "timestamp3", "type": "double", "to_unit": "ms"},
        {"name": "timestamp4", "type": "timestamp"},
    ],
}


@pytest.mark.parametrize("engine", ENGINES)
def test_from_timestamp_golden(spark, engine):
    t = dt.datetime(2015, 7, 12, 15, 0, 0, 100000)
    rows = [(t, t, t, t)]
    out = _run(
        spark, engine, rows,
        "timestamp1 timestamp, timestamp2 timestamp, timestamp3 timestamp, timestamp4 timestamp",
        FROM_TIMESTAMP_TASK,
    )
    row = out[0]
    assert row["timestamp1"] == "2015-07-13 00:00:00.100000000"
    assert row["timestamp2"] == 1436713200100
    assert row["timestamp3"] == 1436713200100.0
    assert row["timestamp4"] == t


# ---------------------------------------------------------------------------
# example/timezone.yml → timezone.txt (to_timezone changes rendering only)
# ---------------------------------------------------------------------------

TIMEZONE_TASK = {
    "default_from_timestamp_format": ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"],
    "columns": [
        {"name": "string1", "to_format": "%Y-%m-%d", "to_timezone": "Asia/Tokyo"},
        {"name": "string2", "to_format": "%Y-%m-%d %H:%M:%S.%N %z", "to_timezone": "Asia/Tokyo"},
    ],
}


@pytest.mark.parametrize("engine", ENGINES)
def test_timezone_golden(spark, engine):
    rows = [
        ("2015-07-12 15:00:00 UTC", "2015-07-12 15:00:00 UTC"),
        ("2015-07-12 15:00:00.1 UTC", "2015-07-12 15:00:00.1 UTC"),
    ]
    out = _run(spark, engine, rows, "string1 string, string2 string", TIMEZONE_TASK)
    assert [r["string1"] for r in out] == ["2015-07-13", "2015-07-13"]
    assert [r["string2"] for r in out] == [
        "2015-07-13 00:00:00.000000000 +0900",
        "2015-07-13 00:00:00.100000000 +0900",
    ]


# ---------------------------------------------------------------------------
# example/nested.yml + bracket_notation.yml → nested.txt (JSONPath rewrite)
# ---------------------------------------------------------------------------

NESTED_FROM = ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S %z"]


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("notation", ["dot", "bracket"])
def test_nested_golden(spark, engine, notation):
    if notation == "dot":
        p1, p2 = "$.record.timestamp", "$.record.nested.nested[0].timestamp"
    else:
        p1, p2 = "$['record']['timestamp']", "$['record']['nested']['nested'][0]['timestamp']"
    task = {
        "default_to_timezone": "Asia/Tokyo",
        "default_to_timestamp_format": "%Y-%m-%d %H:%M:%S.%N",
        "columns": [
            {"name": p1, "type": "long", "from_format": NESTED_FROM, "to_unit": "ms"},
            {"name": p2, "from_format": NESTED_FROM},
        ],
    }
    lines = [
        {"timestamp": "2015-07-12 15:00:00 UTC",
         "nested": {"nested": [{"timestamp": "2015-07-12 15:00:00 UTC"}]},
         "ignore_nested": {"timestamp": "2015-07-12 15:00:00 UTC"}},
        {"timestamp": "2015-07-12 15:00:00.1 UTC",
         "nested": {"nested": [{"timestamp": "2015-07-12 15:00:00.1 UTC"}]},
         "ignore_nested": {"timestamp": "2015-07-12 15:00:00.1 UTC"}},
    ]
    rows = [(json.dumps(x),) for x in lines]
    out = _run(spark, engine, rows, "record string", task)
    got = [json.loads(r["record"]) for r in out]
    assert got[0] == {
        "timestamp": 1436713200000,
        "nested": {"nested": [{"timestamp": "2015-07-13 00:00:00.000000000"}]},
        "ignore_nested": {"timestamp": "2015-07-12 15:00:00 UTC"},
    }
    assert got[1] == {
        "timestamp": 1436713200100,
        "nested": {"nested": [{"timestamp": "2015-07-13 00:00:00.100000000"}]},
        "ignore_nested": {"timestamp": "2015-07-12 15:00:00.1 UTC"},
    }


# ---------------------------------------------------------------------------
# example/from_string_java.yml → from_string_java.txt (Joda dialect:
# milli truncation, nnnnnnnnn nano hack, nnnnnn micro formatting)
# ---------------------------------------------------------------------------

FROM_STRING_JAVA_TASK = {
    "default_from_timezone": "Asia/Taipei",
    "default_from_timestamp_format": [
        "yyyy-MM-dd",
        "yyyy-MM-dd z",
        "yyyy-MM-dd HH:mm:ss.nnnnnnnnn z",
        "yyyy-MM-dd HH:mm:ss z",
        "yyyy-MM-dd HH:mm:ss",
    ],
    "default_to_timezone": "Asia/Taipei",
    "default_to_timestamp_format": "yyyy-MM-dd HH:mm:ss.nnnnnn Z",
    "columns": [
        {"name": "string1"},
        {"name": "string2", "type": "long", "to_unit": "ms"},
        {"name": "string4", "type": "timestamp"},
    ],
}

# golden from_string_java.txt: (string1, string2 ms, instant nanos)
FROM_STRING_JAVA_GOLDEN = [
    ("2015-07-13 00:00:00.000000 +0800", 1436716800000, 1436716800000000000),
    ("2015-07-13 08:00:00.000000 +0800", 1436745600000, 1436745600000000000),
    ("2015-07-13 00:00:00.000000 +0800", 1436716800000, 1436716800000000000),
    ("2015-07-13 00:00:00.000000 +0800", 1436716800000, 1436716800000000000),
    ("2015-07-13 00:00:00.100000 +0800", 1436716800100, 1436716800100000000),
    ("2015-07-13 00:00:00.120000 +0800", 1436716800120, 1436716800120000000),
    ("2015-07-13 00:00:00.123000 +0800", 1436716800123, 1436716800123000000),
    ("2015-07-13 00:00:00.123400 +0800", 1436716800123, 1436716800123400000),
    ("2015-07-13 00:00:00.123450 +0800", 1436716800123, 1436716800123450000),
    ("2015-07-13 00:00:00.123456 +0800", 1436716800123, 1436716800123456000),
    ("2015-07-13 00:00:00.123456 +0800", 1436716800123, 1436716800123456700),
    ("2015-07-13 00:00:00.123456 +0800", 1436716800123, 1436716800123456780),
    ("2015-07-13 00:00:00.123456 +0800", 1436716800123, 1436716800123456789),
]


@pytest.mark.parametrize("engine", ENGINES)
def test_from_string_java_golden(spark, engine):
    rows = [(s, s, s) for s in FROM_STRING_INPUTS]
    out = _run(
        spark, engine, rows,
        "string1 string, string2 string, string4 string",
        FROM_STRING_JAVA_TASK,
    )
    for row, (g_str, g_ms, g_nanos) in zip(out, FROM_STRING_JAVA_GOLDEN):
        assert row["string1"] == g_str
        assert row["string2"] == g_ms
        expect_ts = dt.datetime.fromtimestamp(g_nanos // 1000 / 10**6, dt.timezone.utc)
        assert row["string4"].replace(tzinfo=dt.timezone.utc) == expect_ts


# ---------------------------------------------------------------------------
# example/from_string_auto_java.yml → from_string_auto_java.txt
# (timestamp_parser: auto_java — ruby formats lowered to Joda at plan time,
#  ColumnCaster.java:76-90; %N → nnnnnnnnn keeps nano fidelity)
# ---------------------------------------------------------------------------

AUTO_JAVA_TASK = {
    "default_from_timezone": "Asia/Taipei",
    "default_from_timestamp_format": [
        "%Y-%m-%d",
        "%Y-%m-%d %Z",
        "%Y-%m-%d %H:%M:%S.%N %Z",
        "%Y-%m-%d %H:%M:%S %Z",
        "%Y-%m-%d %H:%M:%S",
    ],
    "default_to_timezone": "Asia/Taipei",
    "default_to_timestamp_format": "%Y-%m-%d %H:%M:%S.%N",
    "timestamp_parser": "auto_java",
    "columns": [
        {"name": "string1"},
        {"name": "string2", "type": "long", "to_unit": "ms"},
    ],
}


@pytest.mark.parametrize("engine", ENGINES)
def test_from_string_auto_java_golden(spark, engine):
    rows = [(s, s) for s in FROM_STRING_INPUTS]
    out = _run(spark, engine, rows, "string1 string, string2 string", AUTO_JAVA_TASK)
    # golden from_string_auto_java.txt equals the pure-ruby golden (nano
    # fidelity preserved through the nnnnnnnnn conversion)
    for row, (g_str, g_ms, _) in zip(out, FROM_STRING_GOLDEN):
        assert row["string1"] == g_str
        assert row["string2"] == g_ms


# ---------------------------------------------------------------------------
# error policy: invalid value → NULL; NULL in → NULL out (fine print #10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("engine", ENGINES)
def test_invalid_and_null(spark, engine):
    task = {
        "columns": [{"name": "s", "type": "timestamp", "from_format": ["%Y-%m-%d"]}]
    }
    rows = [("2015-07-13",), ("bogus",), (None,)]
    out = _run(spark, engine, rows, "s string", task)
    assert out[0]["s"] is not None
    assert out[1]["s"] is None
    assert out[2]["s"] is None


def test_stop_on_invalid_record_filter(spark):
    from embulk_filter_timestamp_format_spark.plans import invalid_filter

    task = TaskConfig.from_dict(
        {"columns": [{"name": "s", "type": "timestamp", "from_format": ["%Y-%m-%d"]}],
         "stop_on_invalid_record": True}
    )
    df = spark.createDataFrame([("2015-07-13",), ("bogus",), (None,)], "s string")
    bad = invalid_filter(df, task)
    assert bad.count() == 1
    assert bad.collect()[0]["s"] == "bogus"


# ---------------------------------------------------------------------------
# config validation (ops 2-3: TimestampFormatFilterPlugin.java:92-121)
# ---------------------------------------------------------------------------


def test_config_validation(spark):
    from embulk_filter_timestamp_format_spark.plans.config import ConfigError

    df = spark.createDataFrame([(1, True, "x")], "a long, b boolean, j string")
    with pytest.raises(ConfigError, match="not included"):
        apply_task(df, TaskConfig.from_dict({"columns": [{"name": "zzz"}]}))
    with pytest.raises(ConfigError, match="boolean"):
        apply_task(df, TaskConfig.from_dict({"columns": [{"name": "a", "type": "boolean"}]}))
    with pytest.raises(ConfigError, match="json"):
        apply_task(df, TaskConfig.from_dict({"columns": [{"name": "a", "type": "json"}]}))
    with pytest.raises(ConfigError, match="timestamp"):
        apply_task(df, TaskConfig.from_dict({"columns": [{"name": "$.j.x", "type": "timestamp"}]}))
    # boolean source columns pass through verbatim even when configured
    out = apply_task(df, TaskConfig.from_dict({"columns": [{"name": "b", "type": "string"}]}))
    assert out.collect()[0]["b"] is True
    assert dict(out.dtypes)["b"] == "boolean"
