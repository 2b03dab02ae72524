"""Grouped corpus profiling: count / mass / quantile statistics.

The dataset-card pass a training-data pipeline runs before and after
every filter stage: per-group (language, source, split, …) document
counts, token mass, and length distribution quantiles — the numbers
that decide mixture weights and catch a filter that silently nuked a
language.

Two quantile engines behind one signature:

* ``exact=False`` (default, the scale path): ``approx_percentile``
  (KLL-ish sketch, fixed memory per group, one map-side-combinable
  aggregate — correct shape for 100 TB where an exact quantile would
  sort the corpus);
* ``exact=True``: ``percentile`` (exact linear-interpolation, matches
  DuckDB's ``quantile_cont`` bit-for-bit after rounding — the oracle
  twin). Exact quantiles keep the whole group's values per aggregate
  state; use only on bounded groups or small SFs.

Everything else is one hash aggregate either way — no joins, one
shuffle on the (tiny) group key.

Reference parity note: the reference (embulk-filter-timestamp_format)
has no aggregate surface; this is part of the training-data pipeline
layer the brief adds (SURVEY.md §2.2/§2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_count

__all__ = ["corpus_profile"]


def corpus_profile(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.9, 0.99),
    exact: bool = False,
) -> DataFrame:
    """Per-``group_col`` corpus statistics: (group, n_docs, total_words,
    avg_words, p<q>_words…, avg_chars). Word counts use the same
    whitespace tokenizer as the rest of the text layer
    (text.word_count), so profile numbers are consistent with
    token_frequencies / repetition_signals / quality scoring."""
    nw = word_count(F.col(text_col))
    per_doc = df.select(
        F.col(group_col).alias("group"),
        nw.alias("_nw"),
        F.length(F.col(text_col)).alias("_nc"),
    )
    pct = F.percentile if exact else F.approx_percentile
    q_aggs = [
        F.round(pct(F.col("_nw"), F.lit(float(q))), 6).alias(
            f"p{str(q)[2:].ljust(2, '0')}_words"
        )
        for q in qs
    ]
    return (
        per_doc.groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nw").alias("total_words"),
            F.round(F.avg("_nw"), 6).alias("avg_words"),
            *q_aggs,
            F.round(F.avg("_nc"), 6).alias("avg_chars"),
        )
        .withColumnRenamed("group", group_col)
    )
