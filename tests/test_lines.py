"""Corpus line/span dedup (operators.lines): hand-built corpora with
known duplicate lines, both keep policies, the chunked C4-span path
checked against a sequential Python reimplementation, and
order/partitioning invariance."""

import math

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators import lines as L

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "unique alpha\nCOMMON FOOTER\nunique beta"),
        (2, "common footer\nunique gamma"),
        (3, "unique delta\n  common footer  \n\nunique epsilon"),
        (4, ""),
        (5, None),
        (6, "common footer"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_drop_all(spark, corpus):
    out = {r["doc_id"]: r for r in L.line_dedup(corpus).collect()}
    # 'common footer' normalizes identically in docs 1,2,3,6 -> count 4
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == "unique alpha\nunique beta"
    assert out[2]["text_kept"] == "unique gamma"
    # blank line in doc 3 survives (empty norm is exempt)
    assert out[3]["n_lines"] == 4 and out[3]["n_kept"] == 3
    assert out[3]["text_kept"] == "unique delta\n\nunique epsilon"
    # empty doc: one empty line, exempt, kept
    assert out[4]["n_lines"] == 1 and out[4]["n_kept"] == 1
    assert out[4]["text_kept"] == ""
    # NULL text: zero lines
    assert out[5]["n_lines"] == 0 and out[5]["n_kept"] == 0
    assert out[5]["text_kept"] == ""
    # fully-duplicated doc empties out
    assert out[6]["n_kept"] == 0 and out[6]["text_kept"] == ""


def test_line_dedup_keep_first(spark, corpus):
    out = {r["doc_id"]: r for r in L.line_dedup(corpus, keep_first=True).collect()}
    # canonical = smallest (doc_id, pos): doc 1 pos 1 keeps its copy
    assert out[1]["n_kept"] == 3
    assert out[1]["text_kept"] == "unique alpha\nCOMMON FOOTER\nunique beta"
    assert out[2]["text_kept"] == "unique gamma"
    assert out[3]["text_kept"] == "unique delta\n\nunique epsilon"
    assert out[6]["n_kept"] == 0


def test_line_dedup_min_count_threshold(spark, corpus):
    # min_count above the dup multiplicity -> nothing dropped
    out = L.line_dedup(corpus, min_count=5)
    assert out.filter(F.col("n_kept") != F.col("n_lines")).count() == 0


def test_line_dedup_broadcast_equivalence(spark, corpus):
    a = sorted(map(tuple, L.line_dedup(corpus).collect()))
    b = sorted(map(tuple, L.line_dedup(corpus, broadcast_dupes=False).collect()))
    assert a == b
    c = sorted(map(tuple, L.line_dedup(corpus.repartition(5)).collect()))
    assert a == c


def _py_chunks(text, w):
    ws = [t for t in (text or "").strip().split() if t]
    return [" ".join(ws[i * w : (i + 1) * w]) for i in range(math.ceil(len(ws) / w))]


def test_line_dedup_chunked_matches_python(spark, docs):
    w = 12
    sample = docs.limit(120)
    rows = [(r["doc_id"], r["text"]) for r in sample.select("doc_id", "text").collect()]
    counts = {}
    for _, text in rows:
        for c in _py_chunks(text, w):
            n = c.strip().lower()
            if n:
                counts[n] = counts.get(n, 0) + 1
    expect = {}
    for did, text in rows:
        ch = _py_chunks(text, w)
        kept = [c for c in ch if counts.get(c.strip().lower(), 0) < 2 or not c.strip()]
        expect[did] = (len(ch), len(kept), "\n".join(kept))
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_kept"])
        for r in L.line_dedup(sample, chunk_words=w).collect()
    }
    assert got == expect
    # the synthetic corpus carries exact/near duplicates: the pass
    # must actually drop something at this scale
    assert any(k < n for n, k, _ in got.values())


def test_chunk_lines_validation(spark, corpus):
    with pytest.raises(ValueError):
        L.chunk_lines(F.col("text"), 0)
