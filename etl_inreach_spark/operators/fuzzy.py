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


def edit1_pairs(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(id_a, id_b, s_a, s_b, dist) for every UNORDERED pair with
    levenshtein <= 1 (includes exact duplicates at dist 0). Exact:
    deletion-neighborhood candidates have no false negatives for
    distance <= 1, and every candidate is re-verified."""
    v = deletion_variants(df, id_col, s_col)
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
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b").cast("bigint")
    ).filter(F.col("dist") <= 1)
