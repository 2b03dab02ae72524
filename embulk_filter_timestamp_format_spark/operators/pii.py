"""PII detection and redaction over a text corpus.

The standard pre-training scrub pass (CCNet/Dolma-style taggers):
count and mask emails, IPv4 addresses, and phone-shaped digit runs so
downstream training never sees raw contact data. Pure Catalyst —
``regexp_extract_all`` + ``regexp_replace`` stay inside whole-stage
codegen, no UDFs, no shuffle (embarrassingly parallel per row), so the
pass runs at scan speed at any scale and the filters/projections around
it still push down.

Pattern discipline: every regex is written in the common subset of
Java's regex (Spark) and RE2 (DuckDB oracle) — character classes,
bounded quantifiers and alternation only; no backreferences or
lookaround (RE2 has neither). Replacement order matters and is fixed:
emails first (an email's host part would otherwise survive as a bare
domain), then IPs, then phones (the loosest pattern — digit runs —
must never see digits that belong to an IP).

Reference parity note: the reference (embulk-filter-timestamp_format,
a column-reformat filter) has no PII surface; this is part of the
training-data pipeline layer the brief adds (SURVEY.md §2.2/§2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_signals", "scrub_pii"]

# (name, pattern, replacement) in mandatory application order.
# Patterns are deliberately high-precision / pragmatic-recall — the
# same trade CCNet's taggers make — and RE2-compatible (see module
# docstring). Context anchoring: RE2 has no lookaround, so non-digit
# boundaries are CONSUMED via ``(^|[^0-9.])`` groups and re-emitted by
# the replacement ($N in Java == \N in the DuckDB oracle). Consumed
# boundaries mean back-to-back hits separated by one char leave the
# second unmasked ("1.2.3.4 5.6.7.8" masks only the first IP) — a
# documented recall trade, identical in both engines.
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"(^|[^0-9.])((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])([^0-9.]|$)",
        "$1<IP>$5",
    ),
    (
        "phone",
        r"(^|[^0-9])\+?[0-9]{1,3}[- ]?(\([0-9]{1,4}\)[- ]?)?"
        r"[0-9]{2,4}([- ][0-9]{2,4}){1,3}",
        "$1<PHONE>",
    ),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_scrubbed: bool = False,
    persist_intermediate: bool = True,
) -> DataFrame:
    """Per-document PII hit counts: (id, email_count, ipv4_count,
    phone_count, pii_total[, scrubbed]). Counting uses the same
    patterns as the scrub, applied to the same progressively-masked
    text, so ``pii_total`` equals the number of tokens ``scrub_pii``
    inserts (an IP inside an email, say, is counted once, as the
    email). ``keep_scrubbed`` also returns the fully-masked text —
    it is already computed as the last masking stage, so this is
    free (signals + redaction in one pass instead of two scans).

    r06 perf note: each masked intermediate is materialized through the
    operator persist registry. A regex pass over the CHAINED output of a
    previous ``regexp_replace`` in the same codegen stage measured ~8x
    slower than the identical pass over a materialized column (3.3 s vs
    0.4 s per stage at sf1.0; content-equivalence and WSCG on/off ruled
    out as causes — see OPTIMIZATION_r06.md). Values are unchanged: the
    barrier only changes where the intermediate lives. Pass
    ``persist_intermediate=False`` to keep the operator side-effect-free
    (the registry discipline of operators/cache.py)."""
    from .cache import register_persist

    out = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    for i, (name, pattern, repl) in enumerate(PII_PATTERNS):
        out = out.withColumn(f"{name}_count", _count(F.col("_t"), pattern))
        out = out.withColumn("_t", F.regexp_replace(F.col("_t"), pattern, repl))
        counts.append(f"{name}_count")
        if i < len(PII_PATTERNS) - 1:
            out = register_persist(out, persist_intermediate)
    total = sum((F.col(c) for c in counts[1:]), F.col(counts[0]))
    tail = [F.col("_t").alias("scrubbed")] if keep_scrubbed else []
    return out.select(id_col, *counts, total.alias("pii_total"), *tail)


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redacted corpus: (id, scrubbed) with every PII hit replaced by
    its type token (<EMAIL>/<IP>/<PHONE>), in the fixed order the
    module docstring justifies. One projection, codegen-resident."""
    c = F.col(text_col)
    for name, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return df.select(F.col(id_col), c.alias("scrubbed"))
