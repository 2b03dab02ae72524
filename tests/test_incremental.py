"""Incremental (churn-proportional) corpus dedup
(operators/incremental.py): bootstrap + follow-up passes reach the same
fixpoint as the full dedup_pass, old↔new and new↔new dups both resolve,
sketch table tracks survivors, and redelivery is fenced."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.operators.incremental import (
    create_sketch_table,
    incremental_dedup_pass,
)
from embulk_filter_timestamp_format_spark.operators.maintenance import dedup_pass

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_seq", T.LongType()),
    ]
)

# three DISTINCT long bases — shingle overlap across groups ~0 (a shared
# base would make every group dup every other: BASE dominates the set)
BASE_A = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles carry mysterious lanterns across the frozen river delta "
)
BASE_B = (
    "yesterday the committee reviewed forty archived proposals concerning "
    "harbor lights maintenance budgets and voted to postpone final plans "
)
BASE_C = (
    "deep beneath the observatory ancient copper pipes hum with steam "
    "carrying warmth toward the distant greenhouse full of winter roses "
)
UNIQ = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa some longer tail here {}",
    "one two three four five six seven eight nine ten eleven twelve thirteen {}",
    "red orange yellow green blue indigo violet colors of the visible arc {}",
]


def _rows(*pairs):
    return [(i, t, i) for i, t in pairs]


def _mk(spark, rows):
    return spark.createDataFrame(_rows(*rows), SCHEMA).withColumn("op", F.lit("U"))


def _ids(table):
    return sorted(r["doc_id"] for r in table.read().select("doc_id").collect())


@pytest.fixture()
def tables(spark, tmp_path):
    corpus = IceTable.create(
        spark, str(tmp_path / "corpus"), SCHEMA, key="doc_id", num_buckets=4
    )
    sketch = create_sketch_table(spark, str(tmp_path / "sketch"), num_buckets=4)
    return corpus, sketch


def test_incremental_matches_full_fixpoint(spark, tables):
    corpus, sketch = tables
    seed_version = corpus.current_version()

    # batch 1: 1≈2 exact dup group, 3≈4 near dup, 5-7 unique
    b1 = _mk(
        spark,
        [
            (1, BASE_A + "group one"),
            (2, BASE_A + "group one"),
            (3, BASE_B + "group two marker"),
            (4, BASE_B + "group two marker extra"),
            (5, UNIQ[0].format("x")),
            (6, BASE_C + "solo text for six"),
            (7, UNIQ[1].format("y")),
        ],
    )
    corpus.merge_into(b1, batch_id=1, source="ingest")
    r1 = incremental_dedup_pass(corpus, sketch, seed_version, batch_id=101)
    assert _ids(corpus) == [1, 3, 5, 6, 7]  # 2 and 4 dropped (keep-min)
    # sketch holds exactly the survivors
    assert sorted(r["doc_id"] for r in sketch.read().collect()) == [1, 3, 5, 6, 7]

    # batch 2: 9 dups OLD doc 1 (old↔new); doc 5 UPDATED to dup OLD doc 6
    # (update → old doc 6 drops, 5 < 6); 10 unique; doc 7 deleted
    after1 = r1["corpus_version"] or r1["to_version"]
    # NOTE: updates must bump event_seq — changes() classifies rows by
    # (key, seq), so a same-seq rewrite reads as unchanged (the lake's
    # producer contract)
    b2 = spark.createDataFrame(
        [
            (9, BASE_A + "group one", 9),
            (5, BASE_C + "solo text for six", 55),
            (10, UNIQ[2].format("z"), 10),
        ],
        SCHEMA,
    ).withColumn("op", F.lit("U")).union(
        spark.createDataFrame([(7, None, 99)], SCHEMA).withColumn("op", F.lit("D"))
    )
    corpus.merge_into(b2, batch_id=2, source="ingest")
    r2 = incremental_dedup_pass(corpus, sketch, after1, batch_id=102)
    assert _ids(corpus) == [1, 3, 5, 10]  # 9 drops vs 1; 6 drops vs updated 5
    assert sorted(r["doc_id"] for r in sketch.read().collect()) == [1, 3, 5, 10]

    # fixpoint: a FULL pass finds nothing left to drop
    full = dedup_pass(corpus, batch_id=103)
    assert full["committed_version"] is None
    assert _ids(corpus) == [1, 3, 5, 10]
    # fence: same batch_id is a no-op on both tables
    v_c, v_s = corpus.current_version(), sketch.current_version()
    incremental_dedup_pass(corpus, sketch, after1, batch_id=102)
    assert corpus.current_version() == v_c and sketch.current_version() == v_s


def test_incremental_clean_batch_commits_nothing(spark, tables):
    corpus, sketch = tables
    v0 = corpus.current_version()
    corpus.merge_into(
        _mk(spark, [(1, UNIQ[0].format("a")), (2, UNIQ[1].format("b"))]),
        batch_id=1, source="ingest",
    )
    r = incremental_dedup_pass(corpus, sketch, v0, batch_id=201)
    assert r["corpus_version"] is None  # no dups → no corpus commit
    assert r["sketch_version"] is not None  # signatures still recorded
    assert _ids(corpus) == [1, 2]

    # second pass over a no-churn window: nothing changed anywhere
    after = r["to_version"]
    v_s = sketch.current_version()
    r2 = incremental_dedup_pass(corpus, sketch, after, batch_id=202)
    assert r2["corpus_version"] is None
    # empty sketch batch: merge_into of an empty changed-set commits nothing
    assert sketch.current_version() == v_s


def test_incremental_mor_corpus(spark, tmp_path):
    corpus = IceTable.create(
        spark, str(tmp_path / "mor"), SCHEMA, key="doc_id", num_buckets=2,
        write_mode="mor", compact_threshold=64,
    )
    sketch = create_sketch_table(spark, str(tmp_path / "sk"), num_buckets=2)
    v0 = corpus.current_version()
    corpus.merge_into(
        _mk(spark, [(1, BASE_A + "m"), (2, BASE_A + "m"), (3, UNIQ[0].format("q"))]),
        batch_id=1, source="ingest",
    )
    incremental_dedup_pass(corpus, sketch, v0, batch_id=301)
    assert _ids(corpus) == [1, 3]
    assert sorted(r["doc_id"] for r in sketch.read().collect()) == [1, 3]


def test_degenerate_update_clears_sketch_row(spark, tables):
    corpus, sketch = tables
    v0 = corpus.current_version()
    corpus.merge_into(
        _mk(spark, [(1, BASE_A + "will degenerate"), (2, UNIQ[1].format("k"))]),
        batch_id=1, source="ingest",
    )
    r1 = incremental_dedup_pass(corpus, sketch, v0, batch_id=401)
    assert sorted(r["doc_id"] for r in sketch.read().collect()) == [1, 2]
    # doc 1 updated to a two-word text (no 3-shingles) → sketch row deleted
    upd = spark.createDataFrame([(1, "tiny text", 11)], SCHEMA).withColumn(
        "op", F.lit("U")
    )
    corpus.merge_into(upd, batch_id=2, source="ingest")
    incremental_dedup_pass(
        corpus, sketch, r1["corpus_version"] or r1["to_version"], batch_id=402
    )
    assert sorted(r["doc_id"] for r in sketch.read().collect()) == [2]
    assert _ids(corpus) == [1, 2]  # doc stays in the corpus
