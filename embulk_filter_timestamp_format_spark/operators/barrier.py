"""Pushdown barrier: keep expensive post-join predicates OUT of join
conditions.

A threshold filter over a score computed from both sides of a join
(`cosine >= t`, `jaccard >= t`) is pushed by Catalyst into the join's
extra condition, where expressions evaluate INTERPRETED per candidate
pair (~20 µs/eval) instead of codegen'd per surviving row — measured
3.8 s vs ~0.5 s per 500k pairs for an HOF cosine fold. Pushdown rules
(PushPredicateThroughNonJoin, PushPredicateThroughJoin) have no cost
guard, so the barrier must be structural: the score is staged in a
projection that also carries a NONDETERMINISTIC column
(monotonically_increasing_id), and the filter references that column
(always-true `__nd >= 0`). Two properties hold it in place:

* a projection with a nondeterministic field is not pushed through
  (PushPredicateThroughNonJoin requires all-deterministic projections);
* the barrier column is REFERENCED by the filter — unreferenced it is
  dead code, ColumnPruning deletes it, the projection turns
  deterministic, and the predicate pushes after all.

Both properties are optimizer internals that could change across Spark
versions, so every caller goes through :func:`scored_above` and
tests/test_operators.py pins the plan shape with
:func:`assert_no_expensive_join_condition` — a Spark upgrade that
re-enables the pushdown fails the suite instead of silently regressing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scored_above(
    df: DataFrame,
    keep_cols: "list[str]",
    score: Column,
    score_name: str,
    threshold: float,
) -> DataFrame:
    """Project `keep_cols` + `score` (as `score_name`) behind a pushdown
    barrier and keep rows with score >= threshold. The returned frame
    has keep_cols + the score column; the barrier column is dropped."""
    scored = df.select(
        *keep_cols,
        score.alias(score_name),
        F.monotonically_increasing_id().alias("__nd"),  # pushdown barrier
    )
    return scored.filter(
        (F.col(score_name) >= threshold) & (F.col("__nd") >= 0)
    ).drop("__nd")


# expression markers that must never appear inside a join condition —
# the HOF folds / array set ops the barrier exists to keep out
EXPENSIVE_MARKERS = ("aggregate(", "array_intersect", "array_union", "zip_with")


def assert_no_expensive_join_condition(df: DataFrame) -> None:
    """Plan-shape regression check: no Join node in the optimized plan
    carries an expensive expression in its condition. Raises
    AssertionError with the offending plan line otherwise."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        stripped = line.lstrip(" +-:")
        if stripped.startswith("Join "):
            low = stripped.lower()
            for marker in EXPENSIVE_MARKERS:
                assert marker not in low, (
                    f"expensive expression {marker!r} reached a join "
                    f"condition — the pushdown barrier is broken:\n{line}"
                )
