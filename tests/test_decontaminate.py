"""Benchmark-decontamination tests: known-overlap fixtures, edge cases
(empty/short docs), the decontaminate filter twin, and the
broadcast_benchmark=False equivalence path."""

import pytest
from pyspark.sql import functions as F

from embulk_filter_timestamp_format_spark.operators import decontaminate as DC


@pytest.fixture(scope="module")
def corpus(spark):
    # benchmark doc 100 is "q1 q2 q3 q4" -> shingles {q1 q2 q3, q2 q3 q4}
    bench = spark.createDataFrame(
        [(100, "q1 q2 q3 q4")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # full copy of the benchmark: 2/2 shingles hit
            (1, "Q1 q2 q3 q4"),
            # shares exactly one shingle of three
            (2, "q1 q2 q3 x1 x2"),
            # no overlap
            (3, "a b c d e"),
            # too short for any 3-gram
            (4, "one two"),
            # empty / null
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    return train, bench


def _report(train, bench, **kw):
    rows = DC.contamination_report(train, bench, threshold=0.5, **kw).collect()
    return {r["doc_id"]: r for r in sorted(rows, key=lambda r: r["doc_id"])}


def test_contamination_report_values(spark, corpus):
    train, bench = corpus
    out = _report(train, bench)
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert (out[1]["n_shingles"], out[1]["n_hits"], out[1]["contaminated"]) == (2, 2, True)
    assert out[1]["overlap_frac"] == 1.0
    assert (out[2]["n_shingles"], out[2]["n_hits"], out[2]["contaminated"]) == (3, 1, False)
    assert out[2]["overlap_frac"] == round(1 / 3, 6)
    assert (out[3]["n_hits"], out[3]["contaminated"]) == (0, False)
    for d in (4, 5, 6):  # shingle-less docs: 0 shingles, frac 0.0, clean
        assert (out[d]["n_shingles"], out[d]["n_hits"]) == (0, 0)
        assert out[d]["overlap_frac"] == 0.0
        assert out[d]["contaminated"] is False


def test_threshold_boundary_is_inclusive(spark, corpus):
    train, bench = corpus
    # doc 2 overlaps 1/3; with threshold exactly 1/3 it must flag
    rows = DC.contamination_report(train, bench, threshold=1 / 3).collect()
    flags = {r["doc_id"]: r["contaminated"] for r in rows}
    assert flags[2] is True and flags[3] is False


def test_decontaminate_drops_only_contaminated(spark, corpus):
    train, bench = corpus
    kept = sorted(r["doc_id"] for r in DC.decontaminate(train, bench).collect())
    assert kept == [2, 3, 4, 5, 6]
    # all original columns survive
    assert DC.decontaminate(train, bench).columns == train.columns


def test_no_broadcast_path_is_equivalent(spark, corpus):
    train, bench = corpus
    a = sorted(map(tuple, DC.contamination_report(train, bench).collect()))
    b = sorted(
        map(
            tuple,
            DC.contamination_report(
                train, bench, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b


def test_self_contamination_is_total(spark, corpus):
    train, _ = corpus
    real = train.filter(F.col("doc_id") <= 3)  # docs with >=1 shingle
    out = _report(real, real)
    assert all(r["contaminated"] and r["overlap_frac"] == 1.0 for r in out.values())
