"""Deterministic corpus sampling, splitting and sequence packing.

The three operations every pretraining-data pipeline runs between
dedup/quality filtering and the trainer:

* :func:`hash_split` — reproducible train/val/test assignment keyed on a
  stable id. No randomness, no state: the label is a pure function of
  (key, salt), so re-running the pipeline, adding rows, or re-sharding
  never moves an existing document across splits (the property that
  protects against train/test contamination across dataset versions).
* :func:`stratified_sample` — per-stratum deterministic downsampling
  (e.g. language rebalancing) with the same hash-threshold trick.
* :func:`pack_sequences` — contiguous token-stream packing: concatenate
  each group's documents (in stable id order) into one virtual token
  stream and cut it every ``budget`` tokens, the standard pretraining
  packing shape. Emits, per document, the group, starting bin and token
  offset within the bin; documents straddle bin boundaries by design
  (the consumer splits or truncates — every bin but each group's last
  holds exactly ``budget`` tokens).

All three are pure Catalyst expressions with exact DuckDB oracle twins
(__spark_entry__.py): the hash is the engine's reproducible-oracle
scheme — a 60-bit md5-prefix integer, identical in Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substring(md5(x),1,15))::BIGINT``).

Scale notes (100 TB): hash_split and stratified_sample are stateless
narrow projections — no shuffle, no driver state, filters push down
through them. pack_sequences shuffles once on the group key and sorts
only within groups; ``num_groups`` bounds the per-partition sort (pick
groups of ~1-10 GB of token counts — e.g. 2^16 groups for a 10^10-doc
corpus). Packing is independent per group, so adding executors scales
it linearly; the window never sees more than one group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# split-bucket resolution: weights are quantized to 1/10000ths
HASH_BUCKETS = 10_000


def hash60(col: Column, salt: str) -> Column:
    """Deterministic non-negative 60-bit hash of ``salt:value`` — the
    md5-prefix scheme shared with the dedup/ANN oracles (a production
    deployment would swap in xxhash64; md5 keeps the DuckDB twin
    bit-exact)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def split_bucket(col: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, HASH_BUCKETS) for split/sample thresholds."""
    return hash60(col, salt) % HASH_BUCKETS


def _thresholds(weights: "dict[str, float]") -> "list[tuple[str, int]]":
    """Cumulative bucket thresholds from normalized weights. The final
    threshold is pinned to HASH_BUCKETS so rounding never strands a
    bucket without a label."""
    if not weights:
        raise ValueError("hash_split needs at least one split weight")
    bad = {n: w for n, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"split weights must be positive: {bad}")
    total = float(sum(weights.values()))
    out: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        out.append((name, int(round(acc * HASH_BUCKETS))))
    out.append((names[-1], HASH_BUCKETS))
    return out


def split_label(
    key: Column, weights: "dict[str, float]", salt: str = "split"
) -> Column:
    """The split name for ``key`` — a chained threshold compare on the
    stable bucket (dict order defines the bucket layout, so keep the
    weights dict ordered the same across runs)."""
    b = split_bucket(key, salt)
    expr = None
    for name, thr in _thresholds(weights)[:-1]:
        expr = (expr.when if expr is not None else F.when)(b < thr, name)
    last = list(weights)[-1]
    return expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: "dict[str, float] | None" = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label (+ its bucket, kept
    for auditability). Weights are normalized; quantization is
    1/HASH_BUCKETS (0.01%)."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    key = F.col(key_col)
    return df.withColumn("split_bucket", split_bucket(key, salt)).withColumn(
        "split", split_label(key, weights, salt)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: "dict[str, float] | float",
    strata_col: "str | None" = None,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, optionally per stratum
    (e.g. per language). A row survives iff its stable bucket falls
    below ``fraction * HASH_BUCKETS`` — so samples at different rates
    are NESTED (the 1% sample is a subset of the 10% sample), which is
    what ablation-scale experiments want. Strata missing from the dict
    are dropped (fraction 0)."""
    b = split_bucket(F.col(key_col), salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        thr = None
        for value, frac in fractions.items():
            cond = F.col(strata_col) == value
            lim = F.lit(int(round(frac * HASH_BUCKETS)))
            thr = (thr.when if thr is not None else F.when)(cond, lim)
        thr = thr.otherwise(F.lit(0))
    else:
        thr = F.lit(int(round(float(fractions) * HASH_BUCKETS)))
    return df.filter(b < thr)


def _mix_thresholds(
    docs: DataFrame,
    weights: "dict[str, float]",
    budget: int,
    group_col: str,
    broadcast_totals: bool,
) -> DataFrame:
    """Per-group acceptance threshold (in HASH_BUCKETS units) for
    :func:`token_budget_mix`: thr_g = floor(min(1, target_g / T_g) *
    HASH_BUCKETS) where target_g = budget * w_g / sum(w) and T_g is the
    group's observed token total. floor (not round) keeps the DuckDB
    twin bit-exact regardless of either engine's rounding-mode choice.
    Returns (group, total_docs, total_tokens, target_tokens, rate_bp).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bad = {n: w for n, w in weights.items() if w <= 0}
    if not weights or bad:
        raise ValueError(f"mixture weights must be non-empty and positive: {bad}")
    sumw = float(sum(weights.values()))
    target = None
    for name, w in weights.items():
        cond = F.col(group_col) == name
        val = F.lit(float(budget) * w / sumw)
        target = (target.when if target is not None else F.when)(cond, val)
    target = target.otherwise(F.lit(0.0))

    totals = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    thr = totals.select(
        F.col(group_col),
        F.col("total_docs"),
        F.col("total_tokens"),
        target.alias("target_tokens"),
        F.when(
            F.col("total_tokens") > 0,
            F.least(
                F.lit(HASH_BUCKETS),
                F.floor(
                    target / F.col("total_tokens") * F.lit(HASH_BUCKETS)
                ).cast("int"),
            ),
        )
        .otherwise(F.lit(0))
        .alias("rate_bp"),
    )
    return F.broadcast(thr) if broadcast_totals else thr


def token_budget_mix(
    df: DataFrame,
    weights: "dict[str, float]",
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens: "Column | None" = None,
    salt: str = "mix",
    broadcast_totals: bool = True,
) -> DataFrame:
    """Deterministic domain-mixture sampling to a token budget — the
    data-mixing step of a pretraining pipeline (DoReMi/Pile-style
    source reweighting): given target weights per ``group_col`` value
    and a total token ``budget``, keep a hash-selected subset of each
    group whose expected token mass is ``budget * w_g / sum(w)``
    (capped at the group's full size; groups absent from ``weights``
    are dropped).

    The keep decision is the engine's stable-bucket threshold — a pure
    function of (key, salt) — so growing the corpus or re-sharding
    never flips an existing document's membership, and lower budgets
    select nested subsets of higher ones for ablations.

    Scale shape (100 TB): one hash aggregate to the per-group token
    totals (a #groups-row table, broadcast back by default — flip
    ``broadcast_totals=False`` for million-group corpora), then a
    stateless filter; the corpus is never shuffled. ``tokens`` defaults
    to whitespace word count over ``text``.

    Output: the kept rows of ``df`` plus ``n_tokens`` and the audit
    columns ``mix_bucket`` / ``rate_bp``.
    """
    from .text import word_count

    if tokens is None:
        tokens = word_count(F.col("text"))
    docs = df.withColumn("n_tokens", tokens.cast("long"))
    thr = _mix_thresholds(docs, weights, budget, group_col, broadcast_totals)
    return (
        docs.join(thr.select(group_col, "rate_bp"), group_col)
        .withColumn("mix_bucket", split_bucket(F.col(key_col), salt))
        .filter(F.col("mix_bucket") < F.col("rate_bp"))
    )


def mixture_report(
    df: DataFrame,
    weights: "dict[str, float]",
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens: "Column | None" = None,
    salt: str = "mix",
    broadcast_totals: bool = True,
) -> DataFrame:
    """Audit summary for :func:`token_budget_mix`: one row per observed
    group — (group, total_docs, total_tokens, target_tokens, rate_bp,
    kept_docs, kept_tokens). kept_* are the realized sample sizes under
    the same thresholds the mix applies."""
    from .text import word_count

    if tokens is None:
        tokens = word_count(F.col("text"))
    docs = df.select(
        F.col(group_col),
        F.col(key_col),
        tokens.cast("long").alias("n_tokens"),
    )
    thr = _mix_thresholds(docs, weights, budget, group_col, broadcast_totals)
    kept = (
        docs.join(thr.select(group_col, "rate_bp"), group_col)
        .filter(split_bucket(F.col(key_col), salt) < F.col("rate_bp"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
    )
    return thr.join(kept, group_col, "left").select(
        F.col(group_col),
        F.col("total_docs"),
        F.col("total_tokens"),
        F.round(F.col("target_tokens"), 6).alias("target_tokens"),
        F.col("rate_bp").cast("int").alias("rate_bp"),
        F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias("kept_docs"),
        F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_groups: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Contiguous token-stream packing plan: each document lands in a
    hash group, the group's documents are laid out in ascending id
    order, and the resulting virtual token stream is cut every
    ``budget`` tokens.

    Returns one row per input document:

    * ``grp``        — hash group (independent packing unit)
    * ``bin``        — fixed-``budget`` bin where the document STARTS
    * ``bin_offset`` — token offset of the document within that bin
    * ``n_bins``     — how many bins the document touches (1 = fits)

    Deterministic under any input partitioning/order (the layout is
    keyed on ids, not arrival). The only wide operation is one shuffle
    on ``grp`` + a per-group sort; no driver state, no iteration.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if num_groups <= 0:
        raise ValueError("num_groups must be positive")
    grp = (hash60(F.col(id_col), salt) % num_groups).alias("grp")
    tok = F.col(token_col).cast("long")
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("__tok").over(w), F.lit(0))
    out = (
        df.select(F.col(id_col), grp, tok.alias("__tok"))
        .withColumn("__start", start)
        .select(
            id_col,
            "grp",
            # `div` = exact integral division (the float `/` loses
            # precision past 2^53 cumulative tokens per group)
            F.expr(f"__start div {int(budget)}").alias("bin"),
            F.pmod(F.col("__start"), F.lit(budget)).cast("long").alias("bin_offset"),
            F.expr(
                f"(__start + greatest(__tok, 1L) - 1) div {int(budget)}"
            ).alias("__endbin"),
        )
        .withColumn("n_bins", F.col("__endbin") - F.col("bin") + 1)
        .drop("__endbin")
    )
    return out
