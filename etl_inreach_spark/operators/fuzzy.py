"""Fuzzy (edit-distance) self-join via deletion neighborhoods — the
FastSS blocking scheme rendered as DataFrame ops.

Record linkage / typo-dedup needs "pairs of strings within edit
distance 1", and the naive rendering is an O(n^2) theta join that no
engine survives at corpus scale. The FastSS observation: two strings
u, v with levenshtein(u, v) <= 1 ALWAYS share an element of their
deletion neighborhoods D(s) = {s} U {s with one char deleted} —
  * equal strings share s itself,
  * a substitution at position i means deleting position i from both
    yields the same string,
  * an insertion means the longer string's neighborhood contains the
    shorter string itself.
So the candidate set is an EQUI-join on deletion-variant keys — the
same narrow-key bucketing discipline as the shingle/LSH dedup family:

  1. explode each string into its |s|+1 variants, keyed by xxhash64
     (8-byte shuffle key, never the variant text itself);
  2. self-join on the key, id_a < id_b, distinct pairs (a pair can
     share several variants — and hash collisions may surface false
     candidates, which is fine because of step 3);
  3. verify candidates with the exact ``levenshtein`` (built-in,
     identical semantics in DuckDB — the oracle is the naive
     cross-join filter at small SF).

Cost: sum of per-variant-bucket |b|^2 — buckets are strings agreeing
everywhere except one position, tiny for natural keys. Blow-up guard:
|s|+1 replication on the explode, linear in total text size.

Skew guard (VERDICT r9 item 3): a mass-duplicated name puts ALL its
copies into the same |s|+1 variant buckets, and each bucket's |b|^2
candidate expansion lands in ONE join task — the same compute-dense/
byte-small straggler the semantic-dedup hot cell had (invisible to
AQE's byte-based skew detection). ``max_bucket_rows`` applies the
identical remedy, the triangular block grid
(operators/similarity.py:semantic_dedup_cells): rows of a bucket are
salted into ceil(|b|/cap) id-hash blocks and the self-join runs over
(vkey, block_i, block_j) grid cells, so per-task pairs are bounded by
cap^2 while every unordered pair still meets exactly once — output
identical by construction (tests/test_skew_cap.py). Unlike the
semantic-dedup cap there is NO driver-side sizing collect: the
variant-key domain is corpus-sized (one bucket per distinct variant,
not nlist cells), so block counts stay a DataFrame — one extra
groupBy(vkey) counting pass + a join against the (rare, by
construction) hot buckets, fully distributed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(id, s, vkey): one row per deletion-neighborhood member, keyed
    by xxhash64 of the variant text."""
    variants = F.expr(
        f"concat(array({s_col}), transform(sequence(1, length({s_col})), "
        f"i -> concat(substring({s_col}, 1, i - 1), "
        f"substring({s_col}, i + 1, length({s_col}) - i))))"
    )
    return (
        df.select(F.col(id_col), F.col(s_col), F.explode(variants).alias("_v"))
        .select(id_col, s_col, F.xxhash64("_v").alias("vkey"))
        .distinct()
    )


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_bucket_rows: int | None = None,
) -> DataFrame:
    """(id_a, id_b, s_a, s_b, dist) for every UNORDERED pair with
    levenshtein <= 1 (includes exact duplicates at dist 0). Exact:
    deletion-neighborhood candidates have no false negatives for
    distance <= 1, and every candidate is re-verified.

    ``max_bucket_rows`` bounds per-TASK candidate work when a variant
    bucket goes hot (mass-duplicated strings — see module docstring):
    the bucket self-join becomes a triangular block grid over id-hash
    blocks, per-task pairs <= cap^2, output unchanged. Size the cap so
    a hot bucket yields grid cells >> shuffle partitions — cells land
    on partitions by HASH, so balance is law-of-large-numbers (the r10
    probe measured cap=512 leaving ~10-cell birthday pileups on one
    task; 256 gives 4x the cells at a quarter the per-cell cost)."""
    v = deletion_variants(df, id_col, s_col)
    if max_bucket_rows is None:
        a = v.select(
            F.col(id_col).alias("id_a"), F.col(s_col).alias("s_a"), "vkey"
        )
        b = v.select(
            F.col(id_col).alias("id_b"), F.col(s_col).alias("s_b"), "vkey"
        )
        cand = (
            a.join(b, "vkey")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "s_a", "s_b")
            .distinct()
        )
    else:
        # block counts stay DISTRIBUTED (no nlist-style bound on the
        # variant-key domain): count each bucket once, keep only the
        # hot ones (rare by construction — AQE broadcast-joins the
        # tiny relation back), everything else gets nb=1 and the grid
        # degenerates to the plain bucket join
        hot = (
            v.groupBy("vkey")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_rows)
            .select(
                "vkey",
                F.expr(
                    f"cast((_n + {max_bucket_rows} - 1) div "
                    f"{max_bucket_rows} as int)"
                ).alias("_nb_blk"),
            )
        )
        wb = (
            v.join(hot, "vkey", "left")
            .withColumn("_nb_blk", F.coalesce("_nb_blk", F.lit(1)))
            .withColumn(
                "_blk",
                F.pmod(F.xxhash64(F.col(id_col)), F.col("_nb_blk")).cast(
                    "int"
                ),
            )
        )
        # triangular grid: an unordered pair with blocks (kx, ky)
        # meets in exactly ONE grid cell — (min, max) off-diagonal
        # (the smaller-block row on side a), or (k, k) where the
        # _ida < _idb filter de-duplicates the two orientations —
        # identical coverage argument to semantic_dedup_cells
        a = wb.select(
            F.col(id_col).alias("_ida"), F.col(s_col).alias("_sa"),
            "vkey",
            F.col("_blk").alias("_gi"),
            F.explode(
                F.sequence(F.col("_blk"), F.col("_nb_blk") - 1)
            ).alias("_gj"),
        )
        b = wb.select(
            F.col(id_col).alias("_idb"), F.col(s_col).alias("_sb"),
            "vkey",
            F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("_gi"),
            F.col("_blk").alias("_gj"),
        )
        # pin the grid shuffle (explicit-N repartition on the join
        # keys): grid partitions are compute-dense but byte-small, so
        # AQE's byte-based coalescing would merge them back into one
        # task and resurrect the straggler (the semantic-dedup r9
        # lesson, measured there)
        try:
            n_shuffle = int(
                v.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
        except ValueError:
            n_shuffle = v.sparkSession.sparkContext.defaultParallelism
        a = a.repartition(n_shuffle, "vkey", "_gi", "_gj")
        b = b.repartition(n_shuffle, "vkey", "_gi", "_gj")
        raw = a.join(b, ["vkey", "_gi", "_gj"]).filter(
            (
                (F.col("_gi") < F.col("_gj"))
                & (F.col("_ida") != F.col("_idb"))
            )
            | ((F.col("_gi") == F.col("_gj")) & (F.col("_ida") < F.col("_idb")))
        )
        # canonicalize to id order: off-diagonal pairs arrive in
        # BLOCK order, which is an id hash, not the id order the
        # contract promises
        lo = F.col("_ida") < F.col("_idb")
        cand = raw.select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            F.when(lo, F.col("_sa")).otherwise(F.col("_sb")).alias("s_a"),
            F.when(lo, F.col("_sb")).otherwise(F.col("_sa")).alias("s_b"),
        ).distinct()
    # exact-duplicate fast path: levenshtein is an O(|s|^2) DP per
    # pair, and on a mass-duplicated name EVERY clique pair is two
    # IDENTICAL strings — the r10 probe measured the DP itself as the
    # dominant straggler cost (2M clique pairs x ~1k char-ops each in
    # one task). An equality guard makes dist-0 pairs one string
    # compare; the DP runs only on genuine near-miss candidates.
    dist = F.when(F.col("s_a") == F.col("s_b"), F.lit(0).cast("bigint")).otherwise(
        F.levenshtein("s_a", "s_b").cast("bigint")
    )
    return cand.withColumn("dist", dist).filter(F.col("dist") <= 1)
