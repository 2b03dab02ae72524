"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:

* **exact** — one hash-groupBy shuffle on the normalized fingerprint;
  map-side combine absorbs duplicates early. O(N).
* **n-gram Jaccard (exact pairwise)** — the oracle-able baseline: blocked
  self-join (equal blocking key) + array intersection math. Quadratic per
  block; at 100 TB use the LSH path and keep this for verification
  samples.
* **MinHash + LSH** — the scale path: k permutations via seeded xxhash64
  over shingles (one pass, `transform`/`aggregate`, no UDF), banded into
  b bands × r rows; candidates = pairs sharing any band bucket (shuffle
  on band hash — near-linear), then exact-Jaccard verification of the
  candidate set only. Tested by containment vs the exact baseline.
* **SimHash** — 64-bit sketch; near-dups = sketches within Hamming
  distance d, bucketed by 16-bit sub-bands for candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_md5, normalized, words


def shingles(col, n: int = 3):
    """Distinct word n-grams (space-joined), lowercase-normalized."""
    ws = words(F.lower(col))
    k = F.size(ws) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, (i + j).cast("int")) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingle_keys(col, n: int = 3):
    """Distinct 60-bit integer shingle keys: first 15 hex digits of the
    md5 of each n-gram. Set operations on int64 are far cheaper than on
    strings at scale, the keyspace (2^60) makes collisions negligible,
    and md5-prefix (unlike xxhash64) is reproducible in the SQL oracle
    (`('0x' || substring(md5(s),1,15))::BIGINT`)."""
    return F.array_distinct(
        F.transform(
            shingles(col, n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup mapping: group identical normalized texts (NULL-safe),
    canonical = min id per group.

    Returns (doc_id, canonical_id, group_size, is_dup) for EVERY doc —
    the keep/remove decision a 100 TB dedup pass materializes. One
    hash-groupBy shuffle + one fp-equi join (broadcastable group side when
    duplicates are rare)."""
    fp = df.select(
        F.col(id_col), fingerprint_md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp")
    )
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return fp.join(groups, "fp").select(
        id_col,
        "canonical_id",
        "group_size",
        (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (oracle baseline)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs within a block with n-gram Jaccard ≥ threshold.

    Exact but quadratic per block — the verification baseline for the LSH
    path (and the oracle query). Output: (id_a, id_b, jaccard) id_a<id_b.

    Pruning (exact, no false negatives at threshold ≥ 0.5):

    * size-band blocking — J(A,B) ≥ 0.8 ⇒ |A|/|B| ∈ [0.8, 1.25] ⇒ the
      bit-lengths of the shingle counts differ by ≤ 1; pairs join on
      (block, band±1). Integer-exact, so the SQL oracle reproduces it.
    * size-ratio prefilter — J ≥ τ ⇒ τ·max ≤ min (checked with integer
      arithmetic for τ=0.8: 5·min ≥ 4·max) BEFORE the array intersection.
    """
    assert threshold >= 0.8, "size-band pruning is proven for threshold >= 0.8"
    sh = df.select(
        F.col(id_col), F.col(block_col).alias("__block"), shingle_keys(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    sh = sh.withColumn("__sz", F.size("sh")).withColumn(
        "__band", F.length(F.bin(F.col("__sz")))
    )
    a = sh.select(
        F.col(id_col).alias("id_a"), F.col("__block"), F.col("sh").alias("sh_a"),
        F.col("__sz").alias("sz_a"),
        F.explode(
            F.array(F.col("__band") - 1, F.col("__band"), F.col("__band") + 1)
        ).alias("__band"),
    )
    b = sh.select(
        F.col(id_col).alias("id_b"), F.col("__block"), F.col("sh").alias("sh_b"),
        F.col("__sz").alias("sz_b"), F.col("__band"),
    )
    pairs = (
        a.join(b, ["__block", "__band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("sz_a", "sz_b") * 5 >= F.greatest("sz_a", "sz_b") * 4
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path)
# ---------------------------------------------------------------------------


def minhash_signature(sh_col, num_hashes: int = 32, seed: int = 7):
    """k min-hashes over the shingle array, one xxhash64 pass per perm —
    array<long> signature, pure Catalyst."""
    def perm(i: int):
        return lambda s: F.xxhash64(s, F.lit(seed + i))

    return F.array(
        *[F.array_min(F.transform(sh_col, perm(i))) for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band bucket, then exact-Jaccard
    verified at `threshold`. Near-linear: the only wide operations are the
    band-bucket shuffle and the candidate join."""
    rows = num_hashes // bands
    sh = df.select(
        F.col(id_col), shingle_keys(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes, seed))
    banded = sig.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[bi * rows + j].cast("string") for j in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return cand.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(col):
    """64-bit SimHash over word hashes: bit b of the sketch = majority of
    bit b across xxhash64(word). Pure Catalyst (aggregate over a 64-int
    accumulator avoided: per-bit popcount via shiftright/bitwise ops)."""
    ws = F.array_distinct(words(F.lower(col)))
    hashes = F.transform(ws, lambda w: F.xxhash64(w))
    n = F.size(ws)
    def bit_counter(b: int):
        return lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1))

    bits = []
    for b in range(64):
        ones = F.aggregate(hashes, F.lit(0).cast("long"), bit_counter(b))
        bits.append(F.when(ones * 2 >= n, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming; candidate
    generation by 16-bit sub-band equality (any of 4 bands equal — covers
    all pairs with distance ≤ 3 by pigeonhole)."""
    s = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("sim"))
    bandcols = [
        F.shiftrightunsigned(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"b{i}")
        for i in range(4)
    ]
    s = s.select(id_col, "sim", *bandcols)
    pairs = None
    for i in range(4):
        a = s.select(F.col(id_col).alias("id_a"), F.col("sim").alias("sim_a"), F.col(f"b{i}").alias("bk"))
        b = s.select(F.col(id_col).alias("id_b"), F.col("sim").alias("sim_b"), F.col(f"b{i}").alias("bk"))
        p = a.join(b, "bk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "sim_a", "sim_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
