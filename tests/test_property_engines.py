"""Property-based dual-engine equivalence (hypothesis): for random
format strings drawn from the supported ruby directive pool and random
epoch instants (1677–2262, the int64-nanos span, negatives included),
the Catalyst expression engine and the Arrow/numpy engine must produce
IDENTICAL output — formatting, and parse-of-formatted round trips.

This is the §5 test-strategy complement to the golden files: goldens pin
the reference's exact outputs; these properties pin the two engines to
each other over a much larger input space."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.functions.format import TimestampFormatterPlan
from embulk_filter_timestamp_format_spark.functions.parse import TimestampParserPlan

# directives the ruby tokenizer supports for BOTH rendering and (where
# used in the parse property) parsing; separators avoid regex traps
FMT_POOL = [
    "%Y", "%m", "%d", "%H", "%M", "%S", "%y", "%j", "%N", "%3N", "%6N",
    "%z", "%p", "%I", "%L", "%e", "%k", "%a", "%A", "%b", "%B",
]
SEPS = [" ", "-", ":", "/", "T", "."]

# inside the engine instant span (int64-nanos representability)
NANO_LO = -9_000_000_000 * 10**9
NANO_HI = 9_000_000_000 * 10**9

fmt_strategy = st.builds(
    lambda parts, seps: "".join(
        p + s for p, s in zip(parts, seps + [""])
    ),
    st.lists(st.sampled_from(FMT_POOL), min_size=3, max_size=6),
    st.lists(st.sampled_from(SEPS), min_size=2, max_size=5),
)

epochs_strategy = st.lists(
    st.integers(min_value=NANO_LO, max_value=NANO_HI), min_size=4, max_size=12
)


@pytest.mark.parametrize("dummy", [0])  # keep the spark fixture session-scoped
@given(fmt=fmt_strategy, epochs=epochs_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_formatter_engines_agree(spark, dummy, fmt, epochs):
    plan = TimestampFormatterPlan(fmt, "UTC")
    df = spark.createDataFrame([(int(e),) for e in epochs], "nanos long")
    cat = [r["s"] for r in df.select(plan.format_expr(F.col("nanos")).alias("s")).collect()]
    npy = list(plan.format_np(np.array(epochs, dtype=np.int64)))
    assert cat == npy, f"engine divergence for {fmt!r}"


ZONES = [
    "UTC", "America/New_York", "Asia/Taipei", "Europe/Berlin",
    "+09:00", "Australia/Sydney", "America/Sao_Paulo",
]
# modern instants: DST-rule zones resolve through two tz databases
# (JVM vs zoneinfo) which agree on 1970–2037 but can differ on
# pre-standardization history and post-2037 extrapolation
MODERN_LO, MODERN_HI = 0, 2_140_000_000 * 10**9


@pytest.mark.parametrize("dummy", [0])
@given(
    fmt=fmt_strategy,
    tz=st.sampled_from(ZONES),
    epochs=st.lists(
        st.integers(min_value=MODERN_LO, max_value=MODERN_HI), min_size=4, max_size=10
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_formatter_engines_agree_across_zones(spark, dummy, fmt, tz, epochs):
    """DST-rule to_timezone rendering parity — the fuzz that caught the
    sparse fixed-offset probe misclassifying America/Sao_Paulo (its 1997
    DST wall clocks rendered an hour apart across engines)."""
    plan = TimestampFormatterPlan(fmt + " %z %Z", tz)
    df = spark.createDataFrame([(int(e),) for e in epochs], "nanos long")
    cat = [r["s"] for r in df.select(plan.format_expr(F.col("nanos")).alias("s")).collect()]
    npy = list(plan.format_np(np.array(epochs, dtype=np.int64)))
    assert cat == npy, f"engine divergence for {fmt!r} in {tz}"


PARSE_POOL = [
    "%Y", "%m", "%d", "%H", "%M", "%S", "%y", "%j", "%N", "%3N", "%6N",
    "%z", "%p", "%I", "%L", "%s",
]
MUTS = ["", "x", "99999", " ", "0", "-"]


@pytest.mark.parametrize("dummy", [0])
@given(
    fmt=st.builds(
        lambda parts, seps: "".join(p + s for p, s in zip(parts, seps + [""])),
        st.lists(st.sampled_from(PARSE_POOL), min_size=2, max_size=5),
        st.lists(st.sampled_from(SEPS), min_size=1, max_size=4),
    ),
    epochs=st.lists(
        st.integers(min_value=NANO_LO, max_value=NANO_HI), min_size=3, max_size=6
    ),
    data=st.data(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_parser_engines_agree_on_valid_and_mutated(spark, dummy, fmt, epochs, data):
    """Render valid strings via the formatter, mutate some, add garbage:
    the two parse engines must agree on every value AND every validity
    decision. UTC from_tz only — DST-rule zones resolve through two
    different tz databases (documented divergence domain in parse.py)."""
    import pandas as pd

    try:
        fplan = TimestampFormatterPlan(fmt, "UTC")
        pplan = TimestampParserPlan([fmt], "UTC")
    except ValueError:
        return  # unformattable/unparseable directive mix — out of scope
    strings = list(fplan.format_np(np.array(epochs, dtype=np.int64)))
    mutated = []
    for s in strings:
        chars = list(s)
        idx = data.draw(st.integers(min_value=0, max_value=max(len(chars) - 1, 0)))
        chars[idx] = data.draw(st.sampled_from(MUTS))
        mutated.append("".join(chars))
    allstr = strings + mutated + ["", "garbage", "99999999999999999999"]
    df = spark.createDataFrame([(s,) for s in allstr], "s string")
    cat = [r["n"] for r in df.select(pplan.parse_expr(F.col("s")).alias("n")).collect()]
    nanos, valid = pplan.parse_np(pd.Series(allstr))
    npy = [int(v) if ok else None for v, ok in zip(nanos, valid)]
    assert cat == npy, f"parser divergence for {fmt!r}"


# a lossless format: full date+time+nanos+offset — formatting then
# parsing must return the exact instant in BOTH engines
LOSSLESS = "%Y-%m-%d %H:%M:%S.%N %z"


@pytest.mark.parametrize("dummy", [0])
@given(epochs=epochs_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lossless_roundtrip_both_engines(spark, dummy, epochs):
    import pandas as pd

    fplan = TimestampFormatterPlan(LOSSLESS, "UTC")
    pplan = TimestampParserPlan([LOSSLESS], "UTC")
    df = spark.createDataFrame([(int(e),) for e in epochs], "nanos long")
    rt = df.select(
        "nanos",
        pplan.parse_expr(fplan.format_expr(F.col("nanos"))).alias("back"),
    ).collect()
    assert all(r["back"] == r["nanos"] for r in rt)

    strings = fplan.format_np(np.array(epochs, dtype=np.int64))
    back, valid = pplan.parse_np(pd.Series(strings))
    assert valid.all()
    assert list(back) == [int(e) for e in epochs]


# multi-format cascades: the STAGED projection path (parse_df) must agree
# with the inline coalesce cascade AND the numpy engine on values and
# validity, for random format lists and mixed/mutated inputs
@pytest.mark.parametrize("dummy", [0])
@given(
    fmts=st.lists(
        st.builds(
            lambda parts, seps: "".join(p + s for p, s in zip(parts, seps + [""])),
            st.lists(st.sampled_from(PARSE_POOL), min_size=2, max_size=4),
            st.lists(st.sampled_from(SEPS), min_size=1, max_size=3),
        ),
        min_size=2,
        max_size=3,
        unique=True,
    ),
    epochs=st.lists(
        st.integers(min_value=NANO_LO, max_value=NANO_HI), min_size=3, max_size=5
    ),
    data=st.data(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_staged_cascade_property(spark, dummy, fmts, epochs, data):
    import pandas as pd

    try:
        fplans = [TimestampFormatterPlan(f, "UTC") for f in fmts]
        pplan = TimestampParserPlan(fmts, "UTC")
    except ValueError:
        return
    strings = []
    for e in epochs:
        which = data.draw(st.integers(min_value=0, max_value=len(fplans) - 1))
        strings.append(fplans[which].format_np(np.array([e], dtype=np.int64))[0])
    mutated = []
    for s in strings:
        chars = list(s)
        idx = data.draw(st.integers(min_value=0, max_value=max(len(chars) - 1, 0)))
        chars[idx] = data.draw(st.sampled_from(MUTS))
        mutated.append("".join(chars))
    allstr = strings + mutated + ["", "garbage"]
    df = spark.createDataFrame([(s,) for s in allstr], "s string")
    staged = [r["n"] for r in pplan.parse_df(df, "s", "n").select("n").collect()]
    inline = [r["n"] for r in df.select(pplan.parse_expr(F.col("s")).alias("n")).collect()]
    nanos, valid = pplan.parse_np(pd.Series(allstr))
    npy = [int(v) if ok else None for v, ok in zip(nanos, valid)]
    assert staged == inline == npy, f"cascade divergence for {fmts!r}"


# the staged FAST path (fast=True: native try_to_timestamp kernels —
# full-string for zone-less fixed-width layouts, prefix+residual
# otherwise, regex fall-through for the rest) must agree with the
# inline regex engine and numpy over the same fuzzed space as the
# staged-cascade property above. fast=True is forced because the
# default only engages the fast staging under WSCG-off sessions.
@pytest.mark.parametrize("dummy", [0])
@given(
    fmts=st.lists(
        st.builds(
            lambda parts, seps: "".join(p + s for p, s in zip(parts, seps + [""])),
            st.lists(st.sampled_from(PARSE_POOL), min_size=2, max_size=4),
            st.lists(st.sampled_from(SEPS), min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    epochs=st.lists(
        st.integers(min_value=NANO_LO, max_value=NANO_HI), min_size=3, max_size=5
    ),
    data=st.data(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_staged_fast_path_property(spark, dummy, fmts, epochs, data):
    import pandas as pd

    try:
        fplans = [TimestampFormatterPlan(f, "UTC") for f in fmts]
        pplan = TimestampParserPlan(fmts, "UTC")
    except ValueError:
        return
    strings = []
    for e in epochs:
        which = data.draw(st.integers(min_value=0, max_value=len(fplans) - 1))
        strings.append(fplans[which].format_np(np.array([e], dtype=np.int64))[0])
    mutated = []
    for s in strings:
        chars = list(s)
        idx = data.draw(st.integers(min_value=0, max_value=max(len(chars) - 1, 0)))
        chars[idx] = data.draw(st.sampled_from(MUTS))
        mutated.append("".join(chars))
    allstr = strings + mutated + ["", "garbage", " "]
    df = spark.createDataFrame([(s,) for s in allstr], "s string")
    fast = [
        r["n"]
        for r in pplan.parse_df(df, "s", "n", fast=True).select("n").collect()
    ]
    inline = [r["n"] for r in df.select(pplan.parse_expr(F.col("s")).alias("n")).collect()]
    nanos, valid = pplan.parse_np(pd.Series(allstr))
    npy = [int(v) if ok else None for v, ok in zip(nanos, valid)]
    assert fast == inline == npy, f"fast-path divergence for {fmts!r}"
