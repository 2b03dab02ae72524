"""Round-2 fidelity edges: strict civil-date validation, mixed-dialect
cascade restriction, Joda k/K hour letters, ruby %G/%g ISO week year,
%Z zone-name rendering, JSON non-castable leaf preservation.

Reference anchors: TimestampParser.java:76-121 (Joda letters accepted,
jruby-only cascade for ruby lists), TimestampFormatter.java:115-134
(zone names), JsonCaster.java:46-110 (non-castable values unchanged).
"""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.functions.format import TimestampFormatterPlan
from embulk_filter_timestamp_format_spark.functions.parse import TimestampParserPlan


def _parse_catalyst(spark, parser, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r["n"] for r in df.select(parser.parse_expr(F.col("s")).alias("n")).collect()]


def _format_catalyst(spark, fmt, nanos_values):
    df = spark.createDataFrame([(v,) for v in nanos_values], "n long")
    return [r["s"] for r in df.select(fmt.format_expr(F.col("n")).alias("s")).collect()]


# ---------------------------------------------------------------------------
# strict civil-date validation (ruby strptime rejects impossible dates)
# ---------------------------------------------------------------------------

INVALID_DATES = ["2015-02-30", "2015-04-31", "2015-02-29", "2015-13-01", "2015-00-10"]
VALID_DATES = {"2016-02-29": 1456704000, "2015-01-31": 1422662400}


def test_invalid_dates_rejected_catalyst(spark):
    p = TimestampParserPlan(["%Y-%m-%d"], "UTC")
    got = _parse_catalyst(spark, p, INVALID_DATES + list(VALID_DATES))
    assert got[: len(INVALID_DATES)] == [None] * len(INVALID_DATES)
    for v, expect_sec in zip(got[len(INVALID_DATES):], VALID_DATES.values()):
        assert v == expect_sec * 1_000_000_000


def test_invalid_dates_rejected_numpy():
    p = TimestampParserPlan(["%Y-%m-%d"], "UTC")
    nanos, valid = p.parse_np(pd.Series(INVALID_DATES + list(VALID_DATES)))
    assert not valid[: len(INVALID_DATES)].any()
    assert valid[len(INVALID_DATES):].all()
    assert list(nanos[len(INVALID_DATES):]) == [s * 1_000_000_000 for s in VALID_DATES.values()]


# ---------------------------------------------------------------------------
# mixed-dialect lists: java formats silently ignored when any ruby present
# ---------------------------------------------------------------------------

def test_mixed_dialect_cascade_restricts_to_ruby():
    p = TimestampParserPlan(["%Y-%m-%d", "yyyy/MM/dd"], "UTC")
    assert p.formats == ["%Y-%m-%d"]
    nanos, valid = p.parse_np(pd.Series(["2015/01/02"]))
    assert not valid[0]  # java format would have matched, but is ignored
    # all-java list untouched
    pj = TimestampParserPlan(["yyyy/MM/dd", "yyyy-MM-dd"], "UTC")
    assert len(pj.formats) == 2


# ---------------------------------------------------------------------------
# Joda k (clockhour-of-day 1-24) / K (hour-of-halfday 0-11)
# ---------------------------------------------------------------------------

def test_joda_clockhour_parse_both_engines(spark):
    p = TimestampParserPlan(["yyyy-MM-dd kk:mm"], "UTC")
    vals = ["2015-01-02 24:30", "2015-01-02 01:30", "2015-01-02 00:30", "2015-01-02 25:00"]
    nanos, valid = p.parse_np(pd.Series(vals))
    assert valid.tolist() == [True, True, False, False]
    assert nanos[0] == 1420158600 * 1_000_000_000  # 2015-01-02 00:30 UTC
    assert nanos[1] == 1420162200 * 1_000_000_000
    got = _parse_catalyst(spark, p, vals)
    assert got == [1420158600 * 10**9, 1420162200 * 10**9, None, None]


def test_joda_halfday_hour_parse(spark):
    p = TimestampParserPlan(["yyyy-MM-dd KK:mm a"], "UTC")
    vals = ["2015-01-02 00:30 AM", "2015-01-02 00:30 PM", "2015-01-02 11:30 PM"]
    nanos, valid = p.parse_np(pd.Series(vals))
    assert valid.all()
    assert nanos[0] == 1420158600 * 10**9  # 00:30
    assert nanos[1] == 1420201800 * 10**9  # 12:30
    assert nanos[2] == 1420241400 * 10**9  # 23:30
    assert _parse_catalyst(spark, p, vals) == [int(x) for x in nanos]


def test_joda_clockhour_format(spark):
    fmt = TimestampFormatterPlan("yyyy-MM-dd kk:mm", "UTC")
    midnight = 1420158600 * 10**9  # 2015-01-02 00:30
    noonish = 1420201800 * 10**9  # 2015-01-02 12:30
    assert _format_catalyst(spark, fmt, [midnight, noonish]) == [
        "2015-01-02 24:30",
        "2015-01-02 12:30",
    ]
    np_out = fmt.format_np(np.array([midnight, noonish], dtype=np.int64))
    assert list(np_out) == ["2015-01-02 24:30", "2015-01-02 12:30"]
    fmtk = TimestampFormatterPlan("KK:mm a", "UTC")
    assert _format_catalyst(spark, fmtk, [midnight, noonish]) == ["00:30 AM", "00:30 PM"]
    assert list(fmtk.format_np(np.array([midnight, noonish], dtype=np.int64))) == [
        "00:30 AM",
        "00:30 PM",
    ]


# ---------------------------------------------------------------------------
# ruby %G/%g ISO week-based year
# ---------------------------------------------------------------------------

def test_iso_week_year_format(spark):
    # 2016-01-01 is ISO 2015-W53-5; 2014-12-29 is ISO 2015-W01-1
    fmt = TimestampFormatterPlan("%G-%V %g", "UTC")
    t1 = 1451606400 * 10**9  # 2016-01-01
    t2 = 1419811200 * 10**9  # 2014-12-29
    assert _format_catalyst(spark, fmt, [t1, t2]) == ["2015-53 15", "2015-01 15"]
    assert list(fmt.format_np(np.array([t1, t2], dtype=np.int64))) == [
        "2015-53 15",
        "2015-01 15",
    ]


def test_iso_week_date_parse_roundtrip(spark):
    p = TimestampParserPlan(["%G %V %u"], "UTC")
    vals = ["2015 53 5", "2015 01 1", "2015 54 1", "2015 01 8"]
    nanos, valid = p.parse_np(pd.Series(vals))
    assert valid.tolist() == [True, True, False, False]
    assert nanos[0] == 1451606400 * 10**9  # 2016-01-01
    assert nanos[1] == 1419811200 * 10**9  # 2014-12-29
    got = _parse_catalyst(spark, p, vals)
    assert got == [1451606400 * 10**9, 1419811200 * 10**9, None, None]


# ---------------------------------------------------------------------------
# %Z renders real zone names for DST zones
# ---------------------------------------------------------------------------

def test_z_zone_names_dst(spark):
    fmt = TimestampFormatterPlan("%Y-%m-%d %H:%M %Z", "America/New_York")
    winter = 1421159400 * 10**9  # 2015-01-13 14:30 UTC → 09:30 EST
    summer = 1436796000 * 10**9  # 2015-07-13 14:00 UTC → 10:00 EDT
    assert _format_catalyst(spark, fmt, [winter, summer]) == [
        "2015-01-13 09:30 EST",
        "2015-07-13 10:00 EDT",
    ]
    assert list(fmt.format_np(np.array([winter, summer], dtype=np.int64))) == [
        "2015-01-13 09:30 EST",
        "2015-07-13 10:00 EDT",
    ]


# ---------------------------------------------------------------------------
# JSON: non-castable leaves (boolean/null) preserved, not nulled
# ---------------------------------------------------------------------------

def test_json_non_castable_leaf_preserved():
    from embulk_filter_timestamp_format_spark.functions.cast import CastPlan
    from embulk_filter_timestamp_format_spark.functions.jsonpath import JsonRewritePlan
    from embulk_filter_timestamp_format_spark.functions.units import TimestampUnit

    # target path is relative to the root JSON column ("props"): the
    # column's JSON text holds {"k": ...}
    plan = JsonRewritePlan(
        [
            (
                "$.props.k",
                CastPlan(
                    "string",
                    "long",
                    parser=TimestampParserPlan(["%Y-%m-%d"], "UTC"),
                    formatter=TimestampFormatterPlan("%Y-%m-%d", "UTC"),
                    to_unit=TimestampUnit.SECOND,
                ),
            )
        ]
    )
    rows = pd.Series(
        [
            json.dumps({"k": True, "other": 1}),
            json.dumps({"k": None}),
            json.dumps({"k": "2015-01-02"}),
        ]
    )
    out = [json.loads(x) for x in plan.rewrite_series(rows)]
    assert out[0]["k"] is True  # boolean untouched (JsonCaster parity)
    assert out[0]["other"] == 1
    assert out[1]["k"] is None
    assert out[2]["k"] == 1420156800  # string actually cast


# ---------------------------------------------------------------------------
# UTC session requirement is enforced at plan-build time
# ---------------------------------------------------------------------------

def test_non_utc_session_rejected(spark):
    fmt = TimestampFormatterPlan("%Y-%m-%d", "UTC")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        with pytest.raises(ValueError, match="session.timeZone"):
            fmt.format_expr(F.lit(0).cast("long"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# instant-range guard + DST from_timezone parity (round-2 fuzz findings)
# ---------------------------------------------------------------------------


def _parse_numpy(parser, values):
    nanos, valid = parser.parse_np(pd.Series(values))
    return [int(v) if ok else None for v, ok in zip(nanos, valid)]


def test_dst_from_timezone_numpy_matches_catalyst(spark):
    """The numpy DST-zone path returned asi8 (already seconds) divided by
    1e9 — garbage for every DST from_timezone on the Arrow engine."""
    p = TimestampParserPlan(["%Y-%m-%d %H:%M:%S"], "America/New_York")
    vals = ["2023-11-14 22:13:20", "2023-07-01 10:00:00", "2023-03-12 02:30:00"]
    cat = _parse_catalyst(spark, p, vals)
    npy = _parse_numpy(p, vals)
    assert cat == npy
    assert cat[0] == (1700000000 + 18000) * 10**9  # EST: wall + 5h
    assert cat[1] == (1688205600 + 14400) * 10**9  # EDT: wall + 4h


def test_out_of_range_civil_invalid_not_crash(spark):
    """Year 9999 exceeds the int64-nanos span: must be an INVALID record
    in both engines — previously an ANSI ArithmeticException killed the
    whole Catalyst batch and numpy wrapped silently."""
    p = TimestampParserPlan(["%Y-%m-%d %H:%M:%S"], "UTC")
    vals = ["9999-12-31 23:59:59", "2023-11-14 22:13:20"]
    cat = _parse_catalyst(spark, p, vals)
    npy = _parse_numpy(p, vals)
    assert cat == npy == [None, 1700000000 * 10**9]


def test_epoch_seconds_past_2038_and_range(spark):
    """%s must accept epochs beyond 2^31 (the group was cast to INT) and
    reject epochs beyond the instant range without overflow."""
    p = TimestampParserPlan(["%s"], "UTC")
    vals = ["4102444800", "1700000000", "9999999999999999999", "-9999999999"]
    cat = _parse_catalyst(spark, p, vals)
    npy = _parse_numpy(p, vals)
    assert cat == npy == [4102444800 * 10**9, 1700000000 * 10**9, None, None]


def test_historical_dst_of_currently_fixed_zone(spark):
    """America/Sao_Paulo has had no DST since 2019, so a sparse
    fixed-offset probe classified it as fixed (-03:00) and the numpy
    engine rendered its 1997 DST wall clocks an hour off the Catalyst
    result (cross-engine formatter fuzz finding). Dense probing keeps
    historically-DST zones on the rule-aware path in both engines."""
    from embulk_filter_timestamp_format_spark.functions.parse import _fixed_offset_seconds

    assert _fixed_offset_seconds("America/Sao_Paulo") is None
    assert _fixed_offset_seconds("Asia/Taipei") is None  # DST until 1979
    assert _fixed_offset_seconds("+09:00") == 32400

    plan = TimestampFormatterPlan("%Y-%m-%d %H:%M:%S %z", "America/Sao_Paulo")
    nanos = [876268071 * 10**9, 1700000000 * 10**9]  # 1997 DST, 2023 fixed
    cat = _format_catalyst(spark, plan, nanos)
    npy = list(plan.format_np(np.array(nanos, dtype=np.int64)))
    assert cat == npy
    assert cat[0] == "1997-10-07 21:47:51 -0200"  # historical DST applied
    assert cat[1] == "2023-11-14 19:13:20 -0300"


# ---------------------------------------------------------------------------
# int64-nanos boundary: both engines share Catalyst's multiply-first
# overflow semantics (sec = -9223372037 rejected outright even though
# instants in [int64min, int64min + 145224192 ns) are representable)
# ---------------------------------------------------------------------------

BOUNDARY_EPOCHS = [
    ("9223372036.854775807", True),   # int64max nanos exactly
    ("9223372036.854775808", False),  # one nano past
    ("-9223372036.000000000", True),  # most negative accepted second
    ("-9223372036.999999999", True),  # frac keeps it in range (sec<0 → +frac)
    ("-9223372037.000000000", False), # product leaves int64 before try_add
    ("-9223372037.200000000", False), # representable instant, still rejected
    ("9223372037.0", False),
]


def test_nanos_boundary_parity_both_engines(spark):
    p = TimestampParserPlan(["%s.%N"], "UTC")
    vals = [v for v, _ in BOUNDARY_EPOCHS]
    nanos, valid = p.parse_np(pd.Series(vals))
    assert valid.tolist() == [ok for _, ok in BOUNDARY_EPOCHS]
    got = _parse_catalyst(spark, p, vals)
    assert [g is not None for g in got] == [ok for _, ok in BOUNDARY_EPOCHS]
    for g, n, (_, ok) in zip(got, nanos, BOUNDARY_EPOCHS):
        if ok:
            assert g == int(n)
    assert got[0] == 9223372036854775807


# ---------------------------------------------------------------------------
# staged multi-format cascade (parse_df) ≡ inline coalesce ≡ numpy engine
# ---------------------------------------------------------------------------

def test_staged_cascade_matches_inline_and_numpy(spark):
    p = TimestampParserPlan(
        ["%Y-%m-%d %H:%M:%S.%N %z", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"], "UTC"
    )
    vals = [
        "2015-01-02 03:04:05.678901234 +0900",
        "2015-01-02 03:04:05",
        "2015-01-02",
        "2015-02-30",          # fails every format
        "garbage",
        None,
        "1999-12-31 23:59:60",  # leap second accepted (second=60)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    staged = [
        r["n"] for r in p.parse_df(df, "s", "n").select("n").collect()
    ]
    inline = [
        r["n"] for r in df.select(p.parse_expr(F.col("s")).alias("n")).collect()
    ]
    assert staged == inline
    nanos, valid = p.parse_np(pd.Series(vals))
    npy = [int(n) if ok else None for n, ok in zip(nanos, valid)]
    # null input is invalid on the numpy side mask as well
    assert staged == npy


# ---------------------------------------------------------------------------
# tzdb divergence domains (documented, PINNED): DST-rule from_timezone
# resolves through the JVM tz database on the Catalyst side but Python
# zoneinfo/pytz on the numpy side. They agree on 1970-2037 instants and
# all fixed-offset zones; they diverge on
#   (a) pre-1883 local-mean-time history — a constant per-zone
#       seconds-precision delta (JVM keeps LMT seconds, the Python stack
#       rounds to whole minutes), and
#   (b) post-2037 DST extrapolation — the JVM extrapolates the last DST
#       rule forever, pandas/pytz freezes at the table horizon, so
#       summer instants differ by the zone's full DST shift.
# These tests MEASURE the divergence so the gap is pinned, not prose.
# ---------------------------------------------------------------------------

DIVERGENCE_CASES = [
    # (zone, wall time, expected catalyst-minus-numpy seconds)
    ("America/New_York", "1850-06-01 12:00:00", 2.0),       # LMT −04:56:02 vs −04:56
    ("Europe/Berlin", "1850-06-01 12:00:00", -28.0),        # LMT +00:53:28 vs +00:53
    ("Australia/Lord_Howe", "1880-01-01 00:00:00", -20.0),
    ("America/New_York", "2039-07-01 12:00:00", -3600.0),   # JVM keeps EDT, pytz EST
    ("Europe/Berlin", "2039-07-01 12:00:00", -3600.0),
    ("Australia/Lord_Howe", "2039-07-01 12:00:00", 1800.0),  # half-hour DST zone
    # control rows: modern instants and far-future WINTER agree exactly
    ("America/New_York", "2000-07-01 12:00:00", 0.0),
    ("Europe/Berlin", "2000-07-01 12:00:00", 0.0),
    ("America/New_York", "2045-01-15 12:00:00", 0.0),
    ("Australia/Lord_Howe", "2045-01-15 12:00:00", 0.0),
]


@pytest.mark.parametrize("zone,wall,expect_diff", DIVERGENCE_CASES)
def test_tzdb_divergence_domains_pinned(spark, zone, wall, expect_diff):
    p = TimestampParserPlan(["%Y-%m-%d %H:%M:%S"], zone)
    cat = _parse_catalyst(spark, p, [wall])[0]
    nanos, valid = p.parse_np(pd.Series([wall]))
    assert cat is not None and valid[0]
    diff_sec = (cat - int(nanos[0])) / 1e9
    assert diff_sec == expect_diff, (
        f"{zone} {wall}: catalyst-numpy divergence changed "
        f"({diff_sec}s, pinned {expect_diff}s)"
    )


# ---------------------------------------------------------------------------
# fixed-width fast path (round 4): regex-free parse must be
# indistinguishable from the regex engine
# ---------------------------------------------------------------------------


def test_fast_layout_eligibility():
    from embulk_filter_timestamp_format_spark.functions import formats as FT
    from embulk_filter_timestamp_format_spark.functions.parse import fast_layout

    L = fast_layout(FT.parse_format("%Y-%m-%d %H:%M:%S.%N"))
    assert L is not None
    assert L.prefix_len == 20 and L.frac_pos == 21 and L.frac_max == 9
    assert L.residue == "-- ::."
    assert L.fields[FT.Y4] == (1, 4) and L.fields[FT.SECOND] == (18, 2)
    # the strict java.time pattern the native civil kernel parses with
    assert L.pattern == "yyyy'-'MM'-'dd' 'HH':'mm':'ss'.'"

    # trailing zones qualify (fixed position, or cut at the literal
    # after the fraction)
    Lz = fast_layout(FT.parse_format("%Y-%m-%d %H:%M:%S %z"))
    assert Lz is not None and Lz.zone and not Lz.frac_pos and Lz.prefix_len == 20
    Lfz = fast_layout(FT.parse_format("%Y-%m-%d %H:%M:%S.%N %z"))
    assert Lfz is not None and Lfz.zone and Lfz.frac_pos == 21 and Lfz.zone_lit == " "

    ineligible = [
        "%z %H",                   # zone not final
        "%H.%N%z",                 # no delimiter between fraction and zone
        "%s",                      # variable-width epoch
        "%Y-%b-%d",                # month name
        "%N %H",                   # fraction not final
        "%H:%H",                   # duplicate field
        "%d2%m",                   # digit literal breaks residue
        "%_d/%m",                  # space-pad flag
        "'abc'",                   # no numeric fields (joda literal)
    ]
    for f in ineligible:
        assert fast_layout(FT.parse_format(f)) is None, f


def _parse_vals(spark, fmt, vals, via_df=True):
    from pyspark.sql import functions as F

    from embulk_filter_timestamp_format_spark.functions.parse import (
        TimestampParserPlan,
    )

    p = TimestampParserPlan([fmt], "UTC")
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    if via_df:  # staged fast path (forced on — the default only engages
        # it under WSCG-off sessions, see staged_stages)
        rows = p.parse_df(df, "s", "n", fast=True).select("n").collect()
    else:  # inline regex engine
        rows = df.select(p.parse_expr(F.col("s")).alias("n")).collect()
    return [r["n"] for r in rows]


def test_fast_path_agrees_with_regex_engine(spark):
    """Adversarial sweep: aligned, flexible-width, misaligned, and
    malicious rows must come out identical through the staged fast path
    and the inline regex engine."""
    cases = {
        "%Y-%m-%d %H:%M:%S.%N": [
            "2017-01-01 12:34:56.123456789",   # aligned, full frac
            "2017-01-01 12:34:56.5",           # aligned, 1-digit frac
            "2017-1-01 12:34:56.123",          # flex month → regex engine
            "2017-01-01  12:34:56.1",          # double space (\s+ literal)
            "2017-01-01 12:34:56.1234567890",  # 10 frac digits → invalid
            "2017-01-01 12:34:56.",            # empty frac → invalid
            "2017-02-30 12:00:00.1",           # aligned, invalid date
            "2017-01-01 12:34:60.1",           # leap second (engine allows)
            "garbage",
            None,
        ],
        "%Y-%m": [
            "2017-01",
            "2017-1",     # flex → regex engine
            "-217001",    # the residue exploit: must NOT fabricate year -217
            "20170-1",
            "2017-13",    # invalid month
        ],
        "%H:%M": ["12:34", "1:23", "123:4", "1:234", "00:00", "23:59", "24:00"],
        "%Y%m%d": ["20170102", "2017012", "abcdefgh"],
        "%Y-%m-%d %H:%M:%S.%N %z": [
            "2017-01-01 12:34:56.123 UTC",       # the CDC binlog shape
            "2017-01-01 12:34:56.123456789 +09:00",
            "2017-01-01 12:34:56.1 -0830",
            "2017-01-01 12:34:56.1 +09",
            "2017-01-01 12:34:56.123 JST",
            "2017-01-01 12:34:56.123 XXXXX",     # unknown name → invalid
            "2017-01-01 12:34:56.123 +09001",    # malformed offset → invalid
            "2017-01-01 12:34:56.123 UTC junk",  # trailing junk → invalid
            "2017-01-01 12:34:56.123",           # zone missing → invalid
            "2017-1-01 12:34:56.123 UTC",        # flex month → regex engine
        ],
        "%Y-%m-%d %H:%M:%S %z": [
            "2017-01-01 12:34:56 UTC",
            "2017-01-01 12:34:56 +09:30:15",
            "2017-01-01 12:34:56 Z",
            "2017-01-01 12:34:56  UTC",          # double space → regex engine
            "2017-01-01 12:34:56UTC",            # missing space → invalid
        ],
    }
    for fmt, vals in cases.items():
        fast = _parse_vals(spark, fmt, vals, via_df=True)
        slow = _parse_vals(spark, fmt, vals, via_df=False)
        assert fast == slow, f"{fmt}: {list(zip(vals, fast, slow))}"


def test_fast_path_values_match_numpy_engine(spark):
    """Aligned rows through the fast path equal the numpy twin (the
    cross-engine contract the hypothesis suite enforces for the regex
    engine)."""
    import pandas as pd

    from embulk_filter_timestamp_format_spark.functions.parse import (
        TimestampParserPlan,
    )

    vals = [
        "2017-01-01 12:34:56.123456789",
        "1969-12-31 23:59:59.999999999",
        "2262-04-11 23:47:16.854775807",
    ]
    p = TimestampParserPlan(["%Y-%m-%d %H:%M:%S.%N"], "UTC")
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [
        r["n"] for r in p.parse_df(df, "s", "n", fast=True).select("n").collect()
    ]
    np_nanos, _ = p.parse_np(pd.Series(vals))
    assert got == list(np_nanos)
