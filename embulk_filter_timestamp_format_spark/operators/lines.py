"""Corpus-wide line / span deduplication (CCNet paragraph dedup,
C4 repeated-span removal).

The CCNet pipeline hashes every normalized paragraph and drops
paragraphs whose hash repeats across the corpus; C4 removes any
three-sentence span that occurs more than once. Both reduce to the
same shape: explode documents into a (doc, position, line) stream,
count normalized lines corpus-wide, drop the occurrences of lines
that repeat, and reassemble each document from its surviving lines
in order.

Scale shape (100 TB): two inherent shuffles — one hash aggregate on
the normalized-line key (map-side combined; the count table is
line-vocabulary-sized) and one per-document regroup to reassemble.
The duplicate-line set (count >= min_count) is usually tiny relative
to the corpus (boilerplate headers/footers), so it broadcasts to the
drop join by default; flip ``broadcast_dupes=False`` for adversarial
corpora where the dup vocabulary itself is huge and a shuffled hash
join on the slim (norm) key is safer. No sorts outside the bounded
per-document ``array_sort``; no UDFs — plain Catalyst end-to-end with
an exact DuckDB twin (``line_dedup`` in __spark_entry__.py).

Reference parity note: the reference (embulk-filter-timestamp_format)
has no corpus operators; this module is part of the training-data
pipeline surface the brief adds on top (SURVEY.md §2.2 additions).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words

__all__ = ["chunk_lines", "line_dedup"]


def chunk_lines(words_col: Column, chunk_words: int) -> Column:
    """Non-overlapping ``chunk_words``-word spans — the C4-style span
    unit for corpora whose text carries no newlines. Returns
    array<string>; an empty word array yields zero spans.

    ``words_col`` MUST be an already-staged array column (a plain
    attribute), not an inline tokenization expression: HOF lambdas
    re-evaluate captured free subexpressions PER ELEMENT, so an inline
    ``words(text)`` here would re-run the regex split once per chunk
    (measured 20× — BENCH/NOTES.md). :func:`line_dedup` stages it in
    its own projection, referenced 3×, which CollapseProject keeps
    staged.
    """
    if chunk_words < 1:
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    w = chunk_words
    ws = words_col
    n_chunks = F.greatest(
        F.ceil(F.size(ws) / F.lit(float(w))).cast("int"), F.lit(1)
    )
    starts = F.when(
        F.size(ws) > 0,
        F.sequence(F.lit(1), (n_chunks - 1) * F.lit(w) + F.lit(1), F.lit(w)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda s: F.array_join(F.slice(ws, s, w), " "))


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    lines: "Column | None" = None,
    chunk_words: "int | None" = None,
    min_count: int = 2,
    keep_first: bool = False,
    broadcast_dupes: bool = True,
    persist_intermediate: bool = True,
) -> DataFrame:
    """Remove corpus-duplicated lines from every document.

    A line is *duplicated* when its normalized form (``lower(trim)``)
    occurs at least ``min_count`` times across the whole corpus.
    ``keep_first=False`` (CCNet-strict / C4 span rule) drops every
    occurrence; ``keep_first=True`` keeps the canonical first
    occurrence (smallest ``(doc_id, position)``) and drops the rest.
    Lines whose normalized form is empty are never treated as
    duplicates (blank separators survive).

    Line source, in priority order: an explicit ``lines`` array
    column, ``chunk_words``-word spans (:func:`chunk_lines`), or
    ``split(text, sep)`` (``sep`` is a literal separator, regex-escaped
    for the split and used verbatim for the rejoin).

    Output, one row per input document: ``(id_col, n_lines, n_kept,
    text_kept)`` where ``text_kept`` is the surviving lines re-joined
    with ``sep`` ('' when everything was dropped or the document had
    no lines).
    """
    # Stage the array once, then explode: keeps the (possibly
    # expensive) line derivation out of the generator's per-row loop,
    # and — for the chunk path — out of the HOF lambda (see
    # chunk_lines).
    if lines is not None:
        staged = df.select(F.col(id_col), lines.alias("__lines"))
    elif chunk_words is not None:
        ws = df.select(F.col(id_col), words(F.col(text_col)).alias("__ws"))
        staged = ws.select(
            F.col(id_col),
            chunk_lines(F.col("__ws"), chunk_words).alias("__lines"),
        )
    else:
        staged = df.select(
            F.col(id_col),
            F.split(F.col(text_col), re.escape(sep), -1).alias("__lines"),
        )
    ex = staged.select(
        F.col(id_col), F.posexplode("__lines").alias("pos", "line")
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))
    # r06: the exploded span stream feeds BOTH the corpus-wide count
    # aggregate and the drop-join/regroup side — uncached, the (possibly
    # expensive) chunking + explode pipeline executed once per consumer.
    # Registry-persisted like every other shared operator intermediate.
    from .cache import register_persist

    ex = register_persist(ex, persist_intermediate)

    occ = ex.filter(F.col("norm") != "")
    counts = occ.groupBy("norm").agg(F.count(F.lit(1)).alias("__c"))
    dupes = counts.filter(F.col("__c") >= min_count).select("norm")
    bc = F.broadcast if broadcast_dupes else (lambda d: d)

    if keep_first:
        # Canonical occurrence via two hash aggregates over the
        # dup-restricted stream (min(struct) would compile to
        # SortAggregate — see BENCH/NOTES.md); both tables are
        # duplicate-vocabulary-sized.
        d_occ = occ.join(bc(dupes), "norm")
        first_doc = d_occ.groupBy("norm").agg(F.min(id_col).alias("__fdoc"))
        first_pos = (
            d_occ.join(bc(first_doc), "norm")
            .filter(F.col(id_col) == F.col("__fdoc"))
            .groupBy("norm", "__fdoc")
            .agg(F.min("pos").alias("__fpos"))
        )
        flagged = ex.join(bc(first_pos), "norm", "left")
        kept = F.col("__fdoc").isNull() | (
            (F.col(id_col) == F.col("__fdoc")) & (F.col("pos") == F.col("__fpos"))
        )
    else:
        # Drop-all semantics via a left join's null probe on the slim
        # (norm)-only duplicate set.
        flagged = ex.join(bc(dupes.withColumn("__hit", F.lit(1))), "norm", "left")
        kept = F.col("__hit").isNull()

    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(kept.cast("int")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(kept, F.struct("pos", "line")))
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_kept"),
    )
    base = df.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text_kept"), F.lit("")).alias("text_kept"),
    )
