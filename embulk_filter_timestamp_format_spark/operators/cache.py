"""Registry for persisted operator intermediates.

Several operators persist a slim intermediate (shingle/sketch/norm
tables) so self-join branches and verify join-backs read it instead of
recomputing the extraction per branch. Those caches are deliberate — but
in a long-lived session (service-style usage, notebooks) repeated calls
would accumulate MEMORY_AND_DISK blocks until LRU eviction, evicting
hotter caches. Every persist therefore registers here, and callers that
have materialized the operator output can reclaim the blocks eagerly:

    from embulk_filter_timestamp_format_spark.operators import (
        unpersist_intermediates,
    )
    result.write...   # materialize while the caches are warm
    unpersist_intermediates()

`bench.py` and the contract harness call this between queries. Leaving
the caches in place is also fine for one-shot jobs — the session end
releases them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: "list[DataFrame]" = []


def register_persist(df: DataFrame, enabled: bool = True) -> DataFrame:
    """Persist `df` (MEMORY_AND_DISK) and track it for eager cleanup.

    Callers must apply output-shrinking filters AFTER this barrier:
    below it, predicate pushdown re-inlines the extraction expressions
    into the scan (PushPredicateThroughNonJoin has no cost guard)."""
    if not enabled:
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _REGISTRY.append(df)
    return df


def spread_scan(df: DataFrame, id_col: str) -> DataFrame:
    """Fan a narrow input out to the session's parallelism before a
    per-row-heavy extraction stage (r06, guide §2.5/§6).

    Lake-table reads surface one file per bucket (8-16 splits) and
    single-file parquet tables 1-2 splits, so a shingle/sketch/regex
    projection planned into the scan stage runs on that many tasks
    regardless of core count. One deterministic hash exchange on the id
    spreads it; inputs already at least as parallel pass through
    untouched (scale-adaptive — on a real cluster scan, splits already
    exceed the width and this is a no-op). Values are unchanged: only
    row placement moves."""
    spark = df.sparkSession
    try:
        target = max(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            spark.sparkContext.defaultParallelism,
        )
    except Exception:
        target = spark.sparkContext.defaultParallelism
    from pyspark.sql import functions as F

    # Size gate first: below ~4 MB of estimated input the exchange costs
    # more than the parallelism it buys (measured ~1 s on the sf0.1
    # dedup family). The optimizer's logical size estimate is file-size
    # based for scans and free to read (no job) — unlike
    # df.rdd.getNumPartitions(), which EXECUTES every upstream shuffle
    # stage under AQE (measured: one extra job per probe). When the
    # estimate is unavailable, spread: at 100-TB scale the narrow-input
    # case is the one that hurts.
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        est = None
    if est is not None and 0 <= est < 4 * 1024 * 1024:
        return df
    # UNCONDITIONAL repartition otherwise: inputs that are already an
    # explicit hash fan-out on the same key collapse with this node
    # (CollapseRepartition) into a single exchange — so the
    # already-wide case costs one shuffle of the rows the extraction
    # was about to traverse anyway, and the narrow case (lake bucket
    # reads, changelog diffs) gains core-count parallelism.
    return df.repartition(target, F.col(id_col))


def unpersist_intermediates() -> int:
    """Unpersist every registered intermediate (non-blocking); returns
    the number released. Safe to call at any time — a DataFrame whose
    blocks were already evicted or freed unpersists as a no-op."""
    n = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
