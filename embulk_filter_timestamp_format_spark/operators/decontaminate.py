"""Benchmark decontamination: n-gram overlap between a training corpus
and a (small) evaluation/benchmark set.

The standard pretrain-hygiene pass (GPT-3 appendix C / PaLM style): a
training document is *contaminated* when at least ``threshold`` of its
distinct word n-gram shingles also occur anywhere in the benchmark set.
Contaminated docs are dropped (or flagged) before training so eval
numbers aren't memorization artifacts.

Scale shape (100 TB corpus, MB-scale benchmark): the benchmark side is
reduced to a DISTINCT int64 shingle-key set and **broadcast** — the
corpus-side probe is then a broadcast hash semi-join on the exploded
shingle stream followed by one (doc_id) hash aggregate with map-side
combine. The corpus is never shuffled by content; the only wide
exchange is the final per-doc count, and the hits side of the
report join-back is bounded by the number of docs sharing ≥1 shingle
with the benchmark, so it broadcasts too. Shingle extraction is staged
once behind a persist barrier (see ``_maybe_persist`` in dedup.py:
filter/branch pushdown would otherwise re-run the extraction per
consumer).

Reference parity note: the reference (embulk-filter-timestamp_format)
has no corpus operators; this module is part of the training-data
pipeline surface the brief adds on top (SURVEY.md §2.2 additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _maybe_persist, shingle_keys

__all__ = ["benchmark_key_set", "contamination_report", "decontaminate"]


def benchmark_key_set(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct 60-bit shingle keys of the benchmark set — one column
    ``k`` (long). Small by construction (eval sets are MBs); callers
    broadcast it."""
    return (
        benchmark.select(F.explode(shingle_keys(F.col(text_col), n)).alias("k"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
    persist_intermediate: bool = True,
) -> DataFrame:
    """Per-document contamination report:
    ``(doc_id, n_shingles, n_hits, overlap_frac, contaminated)``.

    ``overlap_frac`` = |doc shingles ∩ benchmark shingles| / |doc
    shingles| (0.0 for shingle-less docs), rounded 6 for the oracle;
    ``contaminated`` uses the unrounded fraction. Set
    ``broadcast_benchmark=False`` only if the benchmark key set is
    too large to broadcast (then the semi-join becomes a shuffled hash
    join — still slim int64 rows)."""
    bench = benchmark_key_set(benchmark, text_col=text_col, n=n)
    if broadcast_benchmark:
        bench = F.broadcast(bench)

    base = _maybe_persist(
        docs.select(F.col(id_col), shingle_keys(F.col(text_col), n).alias("__ks")),
        persist_intermediate,
    )
    totals = base.select(F.col(id_col), F.size("__ks").alias("n_shingles"))
    hits = (
        base.select(F.col(id_col), F.explode("__ks").alias("k"))
        .join(bench, "k")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = totals.join(F.broadcast(hits), id_col, "left")
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    frac = F.when(
        F.col("n_shingles") > 0, nh / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        nh.alias("n_hits"),
        F.round(frac, 6).alias("overlap_frac"),
        (frac >= F.lit(float(threshold))).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Drop contaminated docs: the filter twin of
    :func:`contamination_report`, returning the surviving ``docs`` rows
    (all original columns). The report's broadcast-hits join-back keeps
    the corpus side un-shuffled."""
    report = contamination_report(
        docs,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        threshold=threshold,
        **kwargs,
    )
    bad = report.filter(F.col("contaminated")).select(F.col(id_col).alias("__bad_id"))
    return docs.join(
        F.broadcast(bad), docs[id_col] == F.col("__bad_id"), "left_anti"
    )
