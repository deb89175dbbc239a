"""Near-duplicate detection over a text corpus: blocked exact Jaccard,
MinHash+LSH, and SimHash — the generalization ladder of the
reference's exact per-key dedup (O18) demanded by the extended surface.

Scale design (the point of each variant):
  * ``ngram_jaccard_pairs`` — exact, but only within cheap blocks
    (same lang, similar length). Quadratic within a block; use when
    blocks are small and recall within the block must be total.
  * ``minhash_lsh_pairs`` — the 100 TB path. Each doc maps to a
    k-value signature (narrow, no shuffle), bands of the signature
    become join keys, and the only shuffle is a self-join on
    (band_id, band_hash) whose groups are tiny for any sane banding.
    Candidates are then verified with exact Jaccard. Cost ~ O(n * k)
    + O(candidate pairs), never O(n^2).
  * ``simhash_pairs`` — constant-size 64-bit sketch; near-dup =
    small Hamming distance; banding the 64 bits into 4x16 gives exact
    recall for distance <= 3 by pigeonhole (any 3 flipped bits leave
    one band untouched), and the verify step prunes false positives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_inreach_spark.functions.text import char_shingles, jaccard

MERSENNE61 = (1 << 61) - 1


def _shingled(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"), char_shingles(F.col(text_col), k).alias("_sh")
    ).filter(F.size("_sh") > 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    block_cols: tuple[str, ...] = (),
    length_block: int | None = None,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-Jaccard pairs (id_a < id_b, jaccard >= threshold)
    within blocks. ``length_block`` additionally requires
    |len_a - len_b| <= length_block (a near-dup necessity: Jaccard
    >= t forces similar sizes).

    The length block is rendered as a BUCKETED EQUI-JOIN (bucket width
    = length_block+1; the probe side explodes into its own and both
    neighbor buckets), not as a |diff|<=k theta condition: an equi key
    keeps this a hash join — a theta-only condition would plan as a
    nested-loop cross product AND re-evaluate the shingle projection
    per pair instead of once per row before the shuffle.
    """
    s = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(F.col(text_col), shingle_k).alias("_sh"),
        F.length(F.col(text_col)).alias("_len"),
        *[F.col(c) for c in block_cols],
    ).filter(F.size("_sh") > 0)
    width = (length_block + 1) if length_block is not None else None
    if width is not None:
        bucket = F.floor(F.col("_len") / width)
        build = s.withColumn("_bucket", bucket)
        probe = s.withColumn(
            "_bucket", F.explode(F.array(bucket - 1, bucket, bucket + 1))
        )
    else:
        build = s.withColumn("_bucket", F.lit(0))
        probe = s.withColumn("_bucket", F.lit(0))
    a, b = probe.alias("a"), build.alias("b")
    cond = (F.col("a._id") < F.col("b._id")) & (F.col("a._bucket") == F.col("b._bucket"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    if length_block is not None:
        cond = cond & (F.abs(F.col("a._len") - F.col("b._len")) <= length_block)
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .select("id_a", "id_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """k-value MinHash signature: per hash i, min over shingles of
    xxhash64(i || shingle). Pure expressions — one narrow projection."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("|"), s)))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    With k=32, b=8 (r=4): P(candidate | j) = 1-(1-j^4)^8 — ~1.0 at
    j=0.9, ~0.06 at j=0.3, so candidates are few and verification
    exact. Returns (id_a, id_b, jaccard >= threshold), same contract
    as ngram_jaccard_pairs but without any quadratic stage.
    """
    rows = num_hashes // bands
    s = _shingled(df, id_col, text_col, shingle_k)
    sig = s.select("_id", "_sh", minhash_signature(F.col("_sh"), num_hashes).alias("_sig"))
    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("_sig"), b * rows + 1, rows))
                    ).alias("band_hash"),
                ),
            )
        ).alias("_band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])  # a pair may collide in many bands
    )
    j = jaccard(F.col("sh_a"), F.col("sh_b"))
    return cand.select("id_a", "id_b", j.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash: sign-aggregate each bit of xxhash64(shingle).

    bit b of the sketch = 1 iff more shingle hashes have bit b set
    than unset. One aggregate pass over the hashes carrying a
    64-element count vector (bit positions are static Python ints —
    shiftright requires a literal shift).
    """
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    zero64 = F.array_repeat(F.lit(0).cast("bigint"), 64)
    counts = F.aggregate(
        hashes,
        zero64,
        lambda acc, h: F.array(
            *[
                F.element_at(acc, i + 1)
                + F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(64)
            ]
        ),
    )
    # bit 63 is the sign bit of int64: its weight is -(2^63)
    out = F.lit(0).cast("bigint")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        out = out + F.when(
            F.element_at(counts, i + 1) > 0, F.lit(weight).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    shingle_k: int = 5,
) -> DataFrame:
    """SimHash near-dup pairs with banded blocking: 4 bands of 16 bits;
    by pigeonhole any pair within Hamming distance 3 shares at least
    one exact band, so the blocked join loses nothing; the Hamming
    filter then prunes collisions."""
    s = _shingled(df, id_col, text_col, shingle_k)
    sk = s.select("_id", simhash64(F.col("_sh")).alias("_sim"))
    banded = sk.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright(F.col("_sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("_band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a._band") == F.col("b._band")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sim").alias("sim_a"),
            F.col("b._sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        hamming64(F.col("sim_a"), F.col("sim_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
