"""Distributed as-of (point-in-time) join.

The canonical time-series/CDC lookup Spark has no built-in for: attach
to every left row the most recent right row for the same key at or
before (``backward``, default) / the earliest at or after
(``forward``) the left row's timestamp, optionally bounded by a
``tolerance``. This is kdb's ``aj``, pandas ``merge_asof``, DuckDB's
``ASOF JOIN`` — used here to join events against dimension snapshots
(price/state as-of the event time) without a range cross-join.

Spark-first design: instead of a theta-join (which Catalyst can only
execute as a broadcast-nested-loop with a per-pair interpreted range
predicate — see BENCH/NOTES.md "never let an expensive predicate reach
a join condition"), the two sides are UNIONED and resolved by one
window pass: tag rows, sort each key's partition by (ts, tag) so right
rows precede left rows at equal timestamps, and carry the last non-null
right payload forward (``last(..., ignorenulls=True)`` over an
unbounded-preceding running frame — an O(n) running accumulator, not a
per-row rescan). One shuffle on the key, one per-partition sort, zero
UDFs.

Scale notes (100 TB): both sides shuffle once on ``by`` (co-partition
via bucketing to eliminate even that); the window frame is running, so
state per key is one row. Heavily skewed keys serialize inside their
partition — for a hot key, pre-bucket by time range and as-of within
buckets carrying the bucket-boundary state (the lake's MOR merge plays
the same trick per bucket). The tie rule (right-before-left at equal
ts) makes equal-timestamp matches inclusive, exactly DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``.

Reference parity note: the reference (embulk-filter-timestamp_format)
has no join operators; this is part of the CDC/time-series surface the
brief adds (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: "tuple[str, ...] | list[str]" = ("user_id",),
    direction: str = "backward",
    tolerance: "Column | None" = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on time column ``on`` within
    key groups ``by``.

    Every non-key, non-time column of ``right`` is attached to each
    left row (NULL when no right row qualifies), plus ``on + suffix``
    — the matched right timestamp (the audit column; also what
    ``tolerance`` is measured against). Right-side payload columns
    that collide with left column names get ``suffix`` appended.

    ``direction='backward'`` matches the latest right row with
    ``r.on <= l.on``; ``'forward'`` the earliest with ``r.on >=
    l.on``; both inclusive. ``tolerance`` (an interval Column, e.g.
    ``F.expr("INTERVAL 30 MINUTES")``) nulls out matches farther than
    the tolerance from the left timestamp.

    Determinism: if ``right`` holds several rows at the same (key, on)
    instant the carried payload would be input-order-dependent —
    pre-aggregate ``right`` to one row per (by, on) (the contract
    query does max-by; any deterministic pick works).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    for c in by + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"asof_join: column {c!r} missing from a side")

    payload_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }
    ts_out = on + suffix

    r = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(on).alias("__rts"),
            *[F.col(c).alias(out_names[c]) for c in payload_cols],
        ).alias("__rpay"),
    )
    l = left.withColumn("__tag", F.lit(1)).withColumn(
        "__rpay", F.lit(None).cast(r.schema["__rpay"].dataType)
    )
    extra = [c for c in left.columns if c not in by and c != on]
    unioned = l.select(
        *by, on, "__tag", "__rpay", *extra
    ).unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts in both directions,
    # so equal-instant matches are inclusive.
    order = [F.col(on).asc(), F.col("__tag").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rpay", ignorenulls=True).over(w)

    matched = (
        unioned.withColumn("__m", carried)
        .filter(F.col("__tag") == 1)
        .drop("__tag", "__rpay")
    )
    if tolerance is not None:
        dist_ok = (
            (F.col("__m.__rts") >= F.col(on) - tolerance)
            if direction == "backward"
            else (F.col("__m.__rts") <= F.col(on) + tolerance)
        )
        matched = matched.withColumn(
            "__m", F.when(dist_ok, F.col("__m"))
        )
    return matched.select(
        *by,
        on,
        *extra,
        F.col("__m.__rts").alias(ts_out),
        *[F.col(f"__m.{out_names[c]}").alias(out_names[c]) for c in payload_cols],
    )
