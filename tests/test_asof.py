"""As-of join (operators.asof) vs pandas.merge_asof on randomized
inputs — both directions, tolerance, equal-instant inclusivity, name
collisions — plus session windows (streaming.windows.sessionize) vs a
sequential gaps-and-islands reference."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators.asof import asof_join
from embulk_filter_timestamp_format_spark.streaming.windows import sessionize

EPOCH = dt.datetime(2024, 1, 1)


def _mk(spark, seed=7, n_left=400, n_right=150, n_keys=12):
    rng = random.Random(seed)
    lrows = [
        (rng.randrange(n_keys), EPOCH + dt.timedelta(seconds=rng.randrange(100000)), i)
        for i in range(n_left)
    ]
    rrows = [
        (rng.randrange(n_keys), EPOCH + dt.timedelta(seconds=rng.randrange(100000)), float(i))
        for i in range(n_right)
    ]
    # determinism contract: one right row per (key, ts)
    seen, rdedup = set(), []
    for k, ts, v in rrows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((k, ts, v))
    left = spark.createDataFrame(lrows, "user_id long, ts timestamp, lid long")
    right = spark.createDataFrame(rdedup, "user_id long, ts timestamp, price double")
    return left, right, lrows, rdedup


def _pd_asof(lrows, rrows, direction, tol=None):
    lpd = pd.DataFrame(lrows, columns=["user_id", "ts", "lid"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["user_id", "ts", "price"]).sort_values("ts")
    out = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol else None,
        allow_exact_matches=True,
    )
    return {
        int(r.lid): (None if pd.isna(r.price) else float(r.price))
        for r in out.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, direction):
    left, right, lrows, rrows = _mk(spark)
    got = {
        r["lid"]: r["price"]
        for r in asof_join(left, right, on="ts", by=["user_id"], direction=direction).collect()
    }
    assert got == _pd_asof(lrows, rrows, direction)


def test_asof_join_tolerance(spark):
    left, right, lrows, rrows = _mk(spark, seed=11)
    tol_s = 3600
    got = {
        r["lid"]: r["price"]
        for r in asof_join(
            left, right, on="ts", by=["user_id"],
            tolerance=F.expr(f"INTERVAL {tol_s} SECONDS"),
        ).collect()
    }
    assert got == _pd_asof(lrows, rrows, "backward", tol=tol_s)


def test_asof_join_equal_instant_inclusive_and_audit_ts(spark):
    left = spark.createDataFrame(
        [(1, EPOCH, 0)], "user_id long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(1, EPOCH, 9.5), (1, EPOCH - dt.timedelta(hours=1), 1.0)],
        "user_id long, ts timestamp, price double",
    )
    row = asof_join(left, right).collect()[0]
    assert row["price"] == 9.5 and row["ts_asof"] == EPOCH


def test_asof_join_collision_suffix_and_validation(spark):
    left = spark.createDataFrame(
        [(1, EPOCH, 5.0)], "user_id long, ts timestamp, price double"
    )
    right = spark.createDataFrame(
        [(1, EPOCH, 7.0)], "user_id long, ts timestamp, price double"
    )
    out = asof_join(left, right)
    assert set(out.columns) == {"user_id", "ts", "price", "ts_asof", "price_asof"}
    r = out.collect()[0]
    assert r["price"] == 5.0 and r["price_asof"] == 7.0
    with pytest.raises(ValueError):
        asof_join(left, right.drop("user_id"))
    with pytest.raises(ValueError):
        asof_join(left, right, direction="nearest")


def test_sessionize_matches_islands_reference(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(8), EPOCH + dt.timedelta(seconds=rng.randrange(50000)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_time timestamp")
    gap = dt.timedelta(minutes=30)
    by_user = {}
    for k, ts in rows:
        by_user.setdefault(k, []).append(ts)
    expect = set()
    for k, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if ts - last >= gap:
                expect.add((k, start, last + gap, n))
                start, n = ts, 0
            last, n = ts, n + 1
        expect.add((k, start, last + gap, n))
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["events"])
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------

from embulk_filter_timestamp_format_spark.operators.ranges import range_join  # noqa: E402


def _mk_ranges(spark, seed=5, n_left=300, n_right=80, n_keys=10):
    rng = random.Random(seed)
    lrows = [
        (rng.randrange(n_keys), EPOCH + dt.timedelta(seconds=rng.randrange(200000)), i)
        for i in range(n_left)
    ]
    rrows = []
    for j in range(n_right):
        s = EPOCH + dt.timedelta(seconds=rng.randrange(200000))
        rrows.append(
            (rng.randrange(n_keys), s, s + dt.timedelta(seconds=rng.randrange(30000)), j)
        )
    left = spark.createDataFrame(lrows, "user_id long, ts timestamp, lid long")
    right = spark.createDataFrame(
        rrows, "user_id long, range_start timestamp, range_end timestamp, rid long"
    )
    return left, right, lrows, rrows


def _py_range_join(lrows, rrows):
    return {
        (lid, rid)
        for k, ts, lid in lrows
        for rk, s, e, rid in rrows
        if k == rk and s <= ts <= e
    }


def test_range_join_matches_bruteforce(spark):
    left, right, lrows, rrows = _mk_ranges(spark)
    expect = _py_range_join(lrows, rrows)
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, by=["user_id"], bucket_width="1 hour").collect()
    }
    assert got == expect
    # bucket width must not change the answer (spans cover many buckets)
    got_narrow = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, by=["user_id"], bucket_width="7 minutes").collect()
    }
    assert got_narrow == expect
    bcast = {
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, by=["user_id"], bucket_width="1 hour", broadcast_right=True
        ).collect()
    }
    assert bcast == expect


def test_range_join_left_outer(spark):
    left, right, lrows, rrows = _mk_ranges(spark, seed=9)
    expect = _py_range_join(lrows, rrows)
    matched_l = {lid for lid, _ in expect}
    rows = range_join(left, right, by=["user_id"], how="left").collect()
    got_pairs = {(r["lid"], r["rid"]) for r in rows if r["rid"] is not None}
    assert got_pairs == expect
    unmatched = {r["lid"] for r in rows if r["rid"] is None}
    assert unmatched == {lid for _, _, lid in lrows} - matched_l
    assert all(
        r["range_start"] is None for r in rows if r["rid"] is None
    )


def test_range_join_validation_and_empty_ranges(spark):
    left, right, _, _ = _mk_ranges(spark, seed=2, n_left=20, n_right=5)
    with pytest.raises(ValueError):
        range_join(left, right, how="outer")
    with pytest.raises(ValueError):
        range_join(left.drop("user_id"), right, by=["user_id"])
    # inverted intervals are dropped, not matched
    inv = spark.createDataFrame(
        [(1, EPOCH + dt.timedelta(hours=2), EPOCH, 0)],
        "user_id long, range_start timestamp, range_end timestamp, rid long",
    )
    assert range_join(left, inv, by=["user_id"]).count() == 0
