"""Distributed range (interval) join.

Join points to intervals — ``l.ts BETWEEN r.start AND r.end`` within
key groups — without the broadcast-nested-loop plan Catalyst falls
back to for theta-joins (per-pair interpreted predicates; see
BENCH/NOTES.md). The standard fix Spark itself doesn't ship (Databricks
exposes it as the "range join optimization" hint): quantize time into
fixed-width buckets, explode each interval to the buckets it covers,
equi-join points to intervals on (keys..., bucket), then verify the
exact bounds. Each point lives in exactly one bucket, so a qualifying
(point, interval) pair meets exactly once — no dedup pass.

Scale notes (100 TB): the join becomes a plain shuffled (or broadcast)
hash join on (keys, bucket); the residual BETWEEN lands as a cheap
column-compare filter on hash-matched rows, not a nested-loop
condition. Cost is the interval blow-up factor ``avg_span /
bucket_width`` — pick ``bucket_width`` near the median interval length
(1-2 buckets per interval). Long-tail intervals fatten one key's
bucket row count linearly, not quadratically. For unkeyed joins the
bucket id alone is the shuffle key.

Reference parity note: the reference (embulk-filter-timestamp_format)
has no join operators; this is part of the CDC/time-series surface the
brief adds (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start: str = "range_start",
    end: str = "range_end",
    by: "tuple[str, ...] | list[str]" = (),
    bucket_width: str = "1 hour",
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join each ``left`` row to every ``right`` interval containing
    its ``on`` timestamp (inclusive bounds), matching ``by`` keys
    exactly. Returns left columns + right's non-key columns (name
    collisions get ``_range`` appended). ``how`` is ``inner`` or
    ``left`` (unmatched points kept with NULL interval columns).

    ``bucket_width`` is any Spark interval string; buckets are
    epoch-anchored. ``broadcast_right=True`` for dimension-sized
    interval tables (the exploded bucket rows are broadcast, skipping
    the big side's shuffle entirely).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    by = list(by)
    for c in by + [on]:
        if c not in left.columns:
            raise ValueError(f"range_join: column {c!r} missing from left")
    for c in by + [start, end]:
        if c not in right.columns:
            raise ValueError(f"range_join: column {c!r} missing from right")

    width_us = F.lit(0) + F.unix_micros(
        F.lit("1970-01-01 00:00:00").cast("timestamp")
        + F.expr(f"INTERVAL {bucket_width}")
    )
    bucket_of = lambda c: F.floor(F.unix_micros(c) / width_us)  # noqa: E731

    payload = [c for c in right.columns if c not in by]
    out_names = {c: (c + "_range" if c in left.columns else c) for c in payload}

    r = right.filter(F.col(start) <= F.col(end)).select(
        *by,
        F.col(start).alias("__s"),
        F.col(end).alias("__e"),
        *[F.col(c).alias(out_names[c]) for c in payload],
    )
    # one row per covered bucket; sequence is inclusive on both ends
    r = r.withColumn(
        "__bucket",
        F.explode(F.sequence(bucket_of(F.col("__s")), bucket_of(F.col("__e")))),
    ).drop("__s", "__e")
    if broadcast_right:
        r = F.broadcast(r)

    l = left.withColumn("__bucket", bucket_of(F.col(on)))
    joined = l.join(r, by + ["__bucket"], "inner").filter(
        (F.col(on) >= F.col(out_names[start]))
        & (F.col(on) <= F.col(out_names[end]))
    )
    if how == "left":
        matched = joined.drop("__bucket")
        missing = l.join(
            joined.select(*by, on).distinct(), by + [on], "left_anti"
        ).drop("__bucket")
        for c in payload:
            missing = missing.withColumn(
                out_names[c], F.lit(None).cast(right.schema[c].dataType)
            )
        return matched.unionByName(missing)
    return joined.drop("__bucket")
