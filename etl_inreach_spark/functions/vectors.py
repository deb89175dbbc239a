"""Embedding-vector expressions over array<float|double> columns.

All built-in higher-order functions (zip_with/aggregate) — JVM-side,
codegen'd, no UDF. The fold is sequential left-to-right in DOUBLE,
which is bit-identical to DuckDB's list_cosine_similarity over
DOUBLE[] (verified) — so similarity queries can be value-hash oracled.

At 100 TB the brute-force paths below pair with the LSH bucketing in
operators/similarity.py; these expressions are the inner kernel either
way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def morton_interleave16(x, y):
    """Z-order (Morton) key for two 16-bit dimensions: bits of x at
    even positions, y at odd — the space-filling-curve layout key
    behind multi-dimensional data skipping (sort/cluster by the key
    and BOTH dimensions get locality, so parquet min/max row-group
    stats prune on either predicate).

    Pure integer shift/mask expressions (the classic bit-spreading
    magic numbers), identically renderable in ANSI SQL — no UDF.
    """

    def spread(c):
        # Column.__or__ is BOOLEAN or in PySpark — bitwiseOR required
        c = c.bitwiseAND(F.lit(0xFFFF))
        c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
        c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
        c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
        return c

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1))
