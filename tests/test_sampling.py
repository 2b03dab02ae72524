"""Deterministic split / sample / packing operators (operators.sampling).

The contract: labels and layouts are pure functions of (id, salt) —
invariant under row order, partitioning and re-runs — with exact md5
twins recomputable in Python, and the packing cumsum math checkable
row-by-row against a sequential reimplementation.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators import sampling as SP

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def _py_bucket(value, salt):
    h = hashlib.md5(f"{salt}:{value}".encode()).hexdigest()
    return int(h[:15], 16) % SP.HASH_BUCKETS


def test_hash_split_matches_python_twin_and_is_exhaustive(spark, docs):
    out = SP.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.select("doc_id", "split", "split_bucket").collect()
    assert len(rows) == docs.count()
    for r in rows:
        b = _py_bucket(r["doc_id"], "split")
        assert r["split_bucket"] == b
        want = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert r["split"] == want


def test_hash_split_deterministic_under_partitioning(spark, docs):
    a = SP.hash_split(docs, "doc_id").select("doc_id", "split")
    b = SP.hash_split(docs.repartition(7, "lang"), "doc_id").select(
        "doc_id", "split"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hash_split_weights_normalized_and_validated(spark, docs):
    # weights 8/1/1 behave like 0.8/0.1/0.1
    a = SP.hash_split(docs, "doc_id", {"train": 8, "val": 1, "test": 1})
    b = SP.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.groupBy("split").count().collect() == b.groupBy("split").count().collect()
    with pytest.raises(ValueError):
        SP.hash_split(docs, "doc_id", {"train": 1.0, "bad": -0.1})
    with pytest.raises(ValueError):
        SP.hash_split(docs, "doc_id", {})


def test_stratified_sample_nested_and_per_stratum(spark, docs):
    half = SP.stratified_sample(docs, "doc_id", 0.5)
    tenth = SP.stratified_sample(docs, "doc_id", 0.1)
    half_ids = {r["doc_id"] for r in half.select("doc_id").collect()}
    tenth_ids = {r["doc_id"] for r in tenth.select("doc_id").collect()}
    assert tenth_ids <= half_ids  # nested samples
    n = docs.count()
    assert abs(len(half_ids) / n - 0.5) < 0.1

    per_lang = SP.stratified_sample(
        docs, "doc_id", {"en": 1.0, "de": 0.0}, strata_col="lang"
    )
    got = {r["lang"] for r in per_lang.select("lang").distinct().collect()}
    assert got == {"en"}  # de sampled out, unlisted langs dropped
    assert per_lang.count() == docs.filter("lang = 'en'").count()

    with pytest.raises(ValueError):
        SP.stratified_sample(docs, "doc_id", {"en": 0.5})  # no strata_col


def test_pack_sequences_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = SP.pack_sequences(
        df, "doc_id", "n_tok", budget=1000, num_groups=4
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == 500

    # sequential reference: per group, ascending id, running offset
    by_grp: dict[int, list[tuple[int, int]]] = {}
    for i, tok in rows:
        g = (int(hashlib.md5(f"pack:{i}".encode()).hexdigest()[:15], 16)) % 4
        by_grp.setdefault(g, []).append((i, tok))
    for g, members in by_grp.items():
        start = 0
        for i, tok in sorted(members):
            r = got[i]
            assert r["grp"] == g
            assert r["bin"] == start // 1000
            assert r["bin_offset"] == start % 1000
            end_bin = (start + max(tok, 1) - 1) // 1000
            assert r["n_bins"] == end_bin - r["bin"] + 1
            start += tok


def test_pack_sequences_invariant_under_input_order(spark):
    rows = [(i, (i * 13) % 300 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = SP.pack_sequences(df, "doc_id", "n_tok", 512, num_groups=3).collect()
    b = SP.pack_sequences(
        df.orderBy(F.rand(7)).repartition(5), "doc_id", "n_tok", 512, num_groups=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_sequences_validation(spark, docs):
    with pytest.raises(ValueError):
        SP.pack_sequences(docs, "doc_id", "n_chars", 0)
    with pytest.raises(ValueError):
        SP.pack_sequences(docs, "doc_id", "n_chars", 100, num_groups=0)


def test_pack_sequences_plan_has_single_shuffle(spark, docs):
    """Scale shape: exactly one exchange (hash by grp) feeds the window
    sort — no global sort, no extra shuffle after packing."""
    out = SP.pack_sequences(docs, "doc_id", "n_chars", 4096, num_groups=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


# ---------------------------------------------------------------------------
# token-budget domain mixture
# ---------------------------------------------------------------------------

_MIX_W = {"src0": 3.0, "src1": 2.0, "src2": 1.0}
_MIX_BUDGET = 1500


def _py_tokens(text):
    return len([t for t in (text or "").strip().split() if t])


def _py_mix(rows, weights, budget):
    sumw = sum(weights.values())
    totals, docs_by_g = {}, {}
    for did, src, text in rows:
        n = _py_tokens(text)
        totals[src] = totals.get(src, 0) + n
        docs_by_g.setdefault(src, []).append((did, n))
    thr = {}
    for g, t in totals.items():
        target = budget * weights.get(g, 0.0) / sumw
        thr[g] = min(10000, int(target / t * 10000)) if t > 0 else 0
    kept = {
        (did, g)
        for g, ds in docs_by_g.items()
        for did, n in ds
        if _py_bucket(did, "mix") < thr[g]
    }
    return totals, thr, kept


def test_token_budget_mix_matches_python_twin(spark, docs):
    rows = [(r["doc_id"], r["source"], r["text"])
            for r in docs.select("doc_id", "source", "text").collect()]
    totals, thr, kept = _py_mix(rows, _MIX_W, _MIX_BUDGET)
    out = SP.token_budget_mix(docs, _MIX_W, _MIX_BUDGET).select(
        "doc_id", "source", "n_tokens", "rate_bp"
    ).collect()
    got = {(r["doc_id"], r["source"]) for r in out}
    assert got == kept
    for r in out:
        assert r["rate_bp"] == thr[r["source"]]
    # groups absent from the weights are dropped entirely
    assert not any(g not in _MIX_W for _, g in got)


def test_token_budget_mix_nested_budgets(spark, docs):
    small = {(r["doc_id"]) for r in SP.token_budget_mix(docs, _MIX_W, 500).select("doc_id").collect()}
    large = {(r["doc_id"]) for r in SP.token_budget_mix(docs, _MIX_W, 1500).select("doc_id").collect()}
    assert small <= large


def test_mixture_report_consistent_with_mix(spark, docs):
    rep = {r["source"]: r for r in SP.mixture_report(docs, _MIX_W, _MIX_BUDGET).collect()}
    rows = [(r["doc_id"], r["source"], r["text"])
            for r in docs.select("doc_id", "source", "text").collect()]
    totals, thr, kept = _py_mix(rows, _MIX_W, _MIX_BUDGET)
    assert set(rep) == set(totals)
    sumw = sum(_MIX_W.values())
    for g, r in rep.items():
        assert r["total_tokens"] == totals[g]
        assert r["rate_bp"] == thr[g]
        assert r["target_tokens"] == pytest.approx(
            _MIX_BUDGET * _MIX_W.get(g, 0.0) / sumw, abs=1e-6
        )
        assert r["kept_docs"] == sum(1 for (d, gg) in kept if gg == g)
    # realized kept token mass is near target for weighted groups
    # (hash thresholds are unbiased; tolerance is loose at this scale)
    for g in _MIX_W:
        if rep[g]["rate_bp"] < 10000:
            assert rep[g]["kept_tokens"] <= totals[g]


def test_token_budget_mix_validation(spark, docs):
    with pytest.raises(ValueError):
        SP.token_budget_mix(docs, {}, 100)
    with pytest.raises(ValueError):
        SP.token_budget_mix(docs, {"src0": -1.0}, 100)
    with pytest.raises(ValueError):
        SP.token_budget_mix(docs, {"src0": 1.0}, 0)
