"""Property test for manifest-bound pruning (pure python, no Spark):
for ANY file contents and ANY supported predicate, a file that
`_entry_may_match` prunes must contain NO row satisfying the predicate
— the conservative-correctness invariant data skipping lives or dies by.

Bounds are built through `_stats_bound` exactly as the writer does
(string truncation + upper-bound rounding included), so the property
exercises the same encode→prune path as production."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_filter_timestamp_format_spark.lake.table import (
    _entry_may_match,
    _stats_bound,
)

OPS = ["<", "<=", ">", ">=", "="]

scalars = st.one_of(
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=True, allow_infinity=False, width=64),
    st.text(max_size=80),
    st.datetimes(
        min_value=dt.datetime(1970, 1, 5), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=(d.microsecond // 1) )),
)


def _entry_from_values(values):
    """Build the manifest entry the writer would record for a column
    chunk holding `values` (None = SQL null)."""
    non_null = [v for v in values if v is not None]
    nulls = len(values) - len(non_null)
    ok = True
    lo = hi = None
    if non_null:
        try:
            mn, mx = min(non_null), max(non_null)
        except TypeError:
            return {"rows": len(values)}  # mixed types: no stats recorded
        lo, lo_t = _stats_bound(mn, lower=True)
        hi, hi_t = _stats_bound(mx, lower=False)
        ok = lo is not None and hi is not None
        typ = lo_t or hi_t
    else:
        ok, typ = False, None
    stats = {"min": lo if ok else None, "max": hi if ok else None,
             "nulls": nulls, "type": typ if ok else None}
    return {"rows": len(values), "stats": {"c": stats}}


def _py_satisfies(v, op, pred):
    if v is None:
        return False  # SQL comparison semantics: null never matches
    try:
        if op == "<":
            return v < pred
        if op == "<=":
            return v <= pred
        if op == ">":
            return v > pred
        if op == ">=":
            return v >= pred
        if op == "=":
            return v == pred
        lo, hi = pred
        return lo <= v <= hi
    except TypeError:
        return False


@settings(max_examples=400, deadline=None)
@given(
    values=st.lists(st.one_of(st.none(), scalars), min_size=0, max_size=12),
    op=st.sampled_from(OPS + ["between"]),
    pred=st.one_of(scalars, st.tuples(scalars, scalars)),
)
def test_pruned_file_has_no_matching_row(values, op, pred):
    if op == "between":
        if not isinstance(pred, tuple):
            pred = (pred, pred)
    elif isinstance(pred, tuple):
        pred = pred[0]
    # homogeneous-type column chunks only (parquet columns are typed);
    # mix of int/float is fine (numeric promotion), anything else isn't
    non_null = [v for v in values if v is not None]
    kinds = {("num" if isinstance(v, (int, float)) else type(v).__name__) for v in non_null}
    if len(kinds) > 1:
        return
    entry = _entry_from_values(values)
    if not _entry_may_match(entry, "c", op, pred):
        for v in values:
            assert not _py_satisfies(v, op, pred), (values, op, pred, entry)


@settings(max_examples=200, deadline=None)
@given(s=st.text(min_size=65, max_size=300))
def test_string_truncation_bounds_contain_value(s):
    lo, _ = _stats_bound(s, lower=True)
    hi, _ = _stats_bound(s, lower=False)
    assert lo is not None and lo <= s
    if hi is not None:
        assert s <= hi
