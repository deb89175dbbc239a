"""Z-order (Morton-curve) multi-column clustering — the lakehouse
data-layout operator (Delta/Iceberg ``OPTIMIZE ZORDER BY``) that makes
min-max data skipping work for MORE THAN ONE filter column at once.

A file sorted by ``o_custkey`` prunes perfectly on custkey predicates
and not at all on ``o_totalprice``; interleaving the bits of both
columns' bucket numbers produces a single sort key whose contiguous
ranges are small RECTANGLES in (custkey, price) space, so each output
partition/file carries a tight min-max envelope on EVERY participating
column and a scan filtered on either one skips most files. This is the
100 TB table-maintenance story: at that scale full resorts per query
are impossible — you lay data out ONCE so that zonemap pruning serves
all the common predicates.

Design (all JVM-side scalar expressions, zero UDFs, one pass + one
range shuffle):

1. normalize each column to an integer bucket in [0, 2^bits) with the
   affine min-max map from a ONE-ROW broadcast aggregate (the same
   bounded-collect discipline as indexing.global_row_index) — rank
   normalization would be exact-quantile but needs a second shuffle;
   min-max is the standard zonemap-oriented choice (what Delta does);
2. interleave the bucket bits into the Morton code — a fold of
   ``(bucket >> i & 1) << (i*n_cols + j)`` terms, constant-folded by
   Catalyst into one codegen expression (bit counts are Python-literal
   ints, sidestepping the shiftleft literal-only pitfall);
3. ``repartitionByRange`` on the code: contiguous z-ranges land in the
   same partition, which is exactly the property writers turn into
   tight per-file column stats.

The z-value itself is a pure integer function of the input row and the
global min/max — deterministic on any cluster/partitioning, and
renderable 1:1 in ANSI SQL (the ``zorder_locality_orders`` query's
DuckDB oracle replays the same bit arithmetic).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(buckets: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of integer bucket columns (each must already
    lie in [0, 2^bits)); column j contributes its bit i at output
    position ``i * len(buckets) + j``, so the result fits in a bigint
    for ``bits * n_cols <= 63``."""
    n = len(buckets)
    if n < 1:
        raise ValueError("zvalue needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*n_cols must be <= 63, got {bits}*{n}")
    out = F.lit(0).cast("bigint")
    for j, b in enumerate(buckets):
        b = b.cast("bigint")
        for i in range(bits):
            # literal shift counts: Python ints, never Columns
            out = out + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def minmax_bucket(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Affine min-max bucket in [0, 2^bits): floor((x-lo) * 2^bits /
    (hi-lo+1)) — monotone in x, the +1 keeping x = hi inside range.

    Cross-engine portability: inputs must be INTEGER columns (cast
    timestamps to epoch, pre-scale doubles to an integer grid — a raw
    double→bigint CAST truncates on Spark but ROUNDS on DuckDB). The
    bucket itself is floor() OVER the double division, not a bigint
    cast, for the same reason; the numerator stays < 2^53 for spans up
    to ~1.4e11, so the division is exact-IEEE-identical on any
    engine."""
    span = (hi - lo).cast("bigint") + F.lit(1)
    return F.floor(
        (col.cast("bigint") - lo.cast("bigint")) * F.lit(1 << bits) / span
    ).cast("bigint")


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "_zvalue",
) -> DataFrame:
    """``df`` range-partitioned by the Morton code of ``cols`` (the
    OPTIMIZE ZORDER layout pass, minus the file writer). Appends the
    code as ``z_col`` so callers can sortWithinPartitions / write and
    tests can audit locality. One 1-row aggregate (broadcast) for the
    min-max bounds + one range shuffle; no other passes."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    b = df.crossJoin(F.broadcast(bounds))
    z = zvalue(
        [
            minmax_bucket(
                F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
            )
            for c in cols
        ],
        bits,
    )
    b = b.withColumn(z_col, z).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )
    if num_partitions:
        return b.repartitionByRange(num_partitions, F.col(z_col))
    return b.repartitionByRange(F.col(z_col))
