"""Gopher-style composite quality filter (operators/text.py::quality_filter):
python-twin equality on corpus + adversarial edge docs, per-rule reason
attribution, and the shuffle-free document-rule-only mode."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators.text import (
    REQUIRED_STOPWORDS,
    quality_filter,
)

SF = "/root/testdata/sf0.001"

THRESH = dict(
    min_words=5,
    max_words=60,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    min_alpha_word_frac=0.8,
    min_required_stopwords=1,
    max_top_bigram_frac=0.18,
    max_top_trigram_frac=0.16,
)


def py_quality(doc_id, text, with_repetition=True):
    ws = [w for w in (text or "").lower().split() if w]
    n = len(ws)
    mwl = sum(len(w) for w in ws) / n if n else 0.0
    sym = (
        ((text or "").count("#") + len(re.findall(r"\.\.\.", text or ""))) / n
        if n
        else 0.0
    )
    alpha = len([w for w in ws if re.search("[a-z]", w)]) / n if n else 0.0
    nstop = len({w for w in ws if w in REQUIRED_STOPWORDS})
    fails = []
    if n < THRESH["min_words"] or n > THRESH["max_words"]:
        fails.append("word_count")
    if mwl < THRESH["min_mean_word_len"] or mwl > THRESH["max_mean_word_len"]:
        fails.append("mean_word_len")
    if sym > THRESH["max_symbol_word_ratio"]:
        fails.append("symbol_ratio")
    if alpha < THRESH["min_alpha_word_frac"]:
        fails.append("alpha_words")
    if nstop < THRESH["min_required_stopwords"]:
        fails.append("stopwords")
    if with_repetition:
        bi = Counter(zip(ws, ws[1:]))
        tri = Counter(zip(ws, ws[1:], ws[2:]))
        top_bi = round(2.0 * max(bi.values()) / n, 6) if n >= 2 else 0.0
        top_tri = round(3.0 * max(tri.values()) / n, 6) if n >= 3 else 0.0
        if top_bi > THRESH["max_top_bigram_frac"]:
            fails.append("bigram_rep")
        if top_tri > THRESH["max_top_trigram_frac"]:
            fails.append("trigram_rep")
    reasons = ",".join(fails)
    return (doc_id, n, round(mwl, 6), round(alpha, 6), reasons == "", reasons)


EDGE_ROWS = [
    (900001, "spam spam spam spam spam spam spam spam"),   # repetition + no stopword
    # clean doc: ≥19 words (top-trigram mass 3/n clears 0.16 only there)
    (900002, "the cat sat on a mat with one hat and that dog ran to the park of his dreams every single day"),
    (900003, "## ### #### ...... ... #"),                  # symbols, no alpha
    (900004, ""),                                          # empty
    (900005, None),                                        # null text
    (900006, "a b c d e f g h i j"),                       # 1-char words
    (900007, "supercalifragilistic expialidocious " * 6),  # long words
    (900008, "the " + "unique" + " ".join(f"w{i}" for i in range(70))),  # too long
]


@pytest.fixture(scope="module")
def sample(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    return docs.limit(60).unionByName(extra).cache()


def test_quality_filter_matches_python(spark, sample):
    out = sorted(
        (
            r["doc_id"], r["n_words"], r["mean_word_len"], r["alpha_word_frac"],
            r["keep"], r["reasons"],
        )
        for r in quality_filter(sample, **THRESH).collect()
    )
    expected = sorted(py_quality(r["doc_id"], r["text"]) for r in sample.collect())
    assert out == expected


def test_quality_filter_reason_attribution(spark):
    df = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    by_id = {r["doc_id"]: r for r in quality_filter(df, **THRESH).collect()}
    assert by_id[900002]["keep"] is True and by_id[900002]["reasons"] == ""
    assert "bigram_rep" in by_id[900001]["reasons"]
    assert "stopwords" in by_id[900001]["reasons"]
    assert "symbol_ratio" in by_id[900003]["reasons"]
    assert "alpha_words" in by_id[900003]["reasons"]
    assert by_id[900004]["reasons"].startswith("word_count")
    assert by_id[900005]["reasons"].startswith("word_count")
    assert "mean_word_len" in by_id[900006]["reasons"]  # mean len 1
    assert "mean_word_len" in by_id[900007]["reasons"]  # mean len > 10
    assert "word_count" in by_id[900008]["reasons"]     # > max_words
    # reasons keep the fixed rule order
    assert by_id[900003]["reasons"].index("symbol_ratio") < by_id[900003][
        "reasons"
    ].index("alpha_words")


def test_quality_filter_document_rules_only(spark, sample):
    """with_repetition=False drops the join: same rows, repetition rules
    never fire, plan has no aggregate/join (single codegen projection)."""
    out = quality_filter(sample, with_repetition=False, **{
        k: v for k, v in THRESH.items()
        if not k.startswith("max_top")
    })
    rows = {r["doc_id"]: r for r in out.collect()}
    expected = {
        t[0]: t for t in (
            py_quality(r["doc_id"], r["text"], with_repetition=False)
            for r in sample.collect()
        )
    }
    for did, exp in expected.items():
        r = rows[did]
        assert (r["n_words"], r["mean_word_len"], r["alpha_word_frac"], r["keep"], r["reasons"]) == exp[1:]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan
