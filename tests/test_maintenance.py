"""Lake-integrated corpus dedup maintenance pass: snapshot → MinHash-LSH
→ keep-min policy → op='D' delete batch through merge_into."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_filter_timestamp_format_spark.lake import IceTable
from embulk_filter_timestamp_format_spark.operators.dedup import minhash_lsh_pairs
from embulk_filter_timestamp_format_spark.operators.maintenance import dedup_pass

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def _seed_table(spark, tmp_path, name, write_mode):
    """Corpus with engineered near-dup groups: docs 0/1/2 identical, docs
    10/11 near-identical, the rest distinct."""
    sent = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        (0, sent * 4, 100),
        (1, sent * 4, 101),                      # exact dup of 0
        (2, sent * 4 + "the quick brown fox", 102),  # near dup of 0
        (10, "alpha beta gamma delta epsilon zeta eta theta " * 5, 110),
        (11, "alpha beta gamma delta epsilon zeta eta theta " * 5 + "alpha beta", 111),
        (20, "completely different content about spark shuffles and catalyst", 120),
        (21, "yet another unique document mentioning parquet footers only", 121),
    ]
    table = IceTable.create(
        spark, str(tmp_path / name), DOC_SCHEMA, key="doc_id",
        num_buckets=4, write_mode=write_mode,
    )
    ups = spark.createDataFrame(rows, DOC_SCHEMA).withColumn("op", F.lit("U"))
    table.merge_into(ups, batch_id=0, source="seed")
    return table


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_dedup_pass_state_and_changelog(spark, tmp_path, mode):
    table = _seed_table(spark, tmp_path, f"corpus_{mode}", mode)
    v0 = table.current_version()
    pre = table.read()

    # independent expectation: keep-min over the pairs the sweep finds
    pairs = minhash_lsh_pairs(pre, threshold=0.7).collect()
    assert pairs, "engineered dups must produce pairs"
    expected_drops = {r["id_b"] for r in pairs}
    expected_keep = {r["doc_id"] for r in pre.collect()} - expected_drops
    assert {0, 10} <= expected_keep and {1, 2} <= expected_drops

    out = dedup_pass(table, threshold=0.7, batch_id=1)
    assert out["from_version"] == v0 and out["committed_version"] == v0 + 1

    # post-pass state == keep set, payloads untouched
    post = {r["doc_id"]: r for r in table.read().collect()}
    assert set(post) == expected_keep
    # changelog between the two versions is exactly the dup deletes
    ch = table.changes(v0, out["committed_version"]).collect()
    assert {r["doc_id"] for r in ch} == expected_drops
    assert all(r["_change_type"] == "delete" for r in ch)

    # fenced idempotence: same batch id re-delivered is a no-op
    again = dedup_pass(table, threshold=0.7, batch_id=1)
    assert again["committed_version"] is None or again["committed_version"] == out["committed_version"]
    assert table.current_version() == out["committed_version"]


def test_dedup_pass_clean_corpus_commits_nothing(spark, tmp_path):
    table = IceTable.create(
        spark, str(tmp_path / "clean"), DOC_SCHEMA, key="doc_id", num_buckets=2
    )
    ups = spark.createDataFrame(
        [(1, "one of a kind document text here", 1),
         (2, "entirely different words compose this row", 2)],
        DOC_SCHEMA,
    ).withColumn("op", F.lit("U"))
    table.merge_into(ups, batch_id=0)
    v = table.current_version()
    out = dedup_pass(table, threshold=0.7, batch_id=1)
    assert out["committed_version"] is None
    assert table.current_version() == v


def test_dedup_pass_component_keep_vs_min(spark, tmp_path):
    """Star through a high id (5~7, 6~7, 5!~6): keep='min' keeps both 5
    and 6 (neither is the larger side of any pair), keep='component'
    keeps only the cluster minimum 5."""
    rows = [(5, "a", 1), (6, "b", 2), (7, "c", 3), (9, "d", 4)]

    def star_pairs(df):
        return df.sparkSession.createDataFrame(
            [(5, 7), (6, 7)], "id_a long, id_b long"
        )

    for keep, expected in (("min", {5, 6, 9}), ("component", {5, 9})):
        table = IceTable.create(
            spark, str(tmp_path / f"star_{keep}"), DOC_SCHEMA,
            key="doc_id", num_buckets=2,
        )
        ups = spark.createDataFrame(rows, DOC_SCHEMA).withColumn("op", F.lit("U"))
        table.merge_into(ups, batch_id=0)
        dedup_pass(table, pairs_fn=star_pairs, keep=keep, batch_id=1)
        assert {r["doc_id"] for r in table.read().collect()} == expected

    with pytest.raises(ValueError):
        dedup_pass(table, keep="max")


def test_dedup_pass_custom_pairs_fn(spark, tmp_path):
    """pairs_fn plugs any sweep (here: exact text equality)."""
    table = _seed_table(spark, tmp_path, "custom", "cow")

    def exact_pairs(df):
        a = df.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
        b = df.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
        return a.join(b, (F.col("ta") == F.col("tb")) & (F.col("id_a") < F.col("id_b")))

    out = dedup_pass(table, pairs_fn=exact_pairs, batch_id=7)
    post = {r["doc_id"] for r in table.read().collect()}
    assert 1 not in post and 0 in post and 2 in post  # only the exact dup dropped
    assert out["committed_version"] == 3
