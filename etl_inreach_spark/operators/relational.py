"""Relational operators: broadcast config join, anchored time-window
filter, as-of join (SURVEY.md §2.2 joins row, O5).

Scale notes per operator are in the docstrings — these are the pieces
where shuffle strategy decides whether 100 TB works.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast: bool = True,
) -> DataFrame:
    """Fact-to-dimension join, broadcasting the dim side by default.

    The idiomatic rendering of the reference's closure-captured config
    (task.ts:68,121,128): config rows are KBs, so they ship to every
    executor and the join is shuffle-free. Set ``broadcast=False`` for
    dims too large for executor memory — Catalyst then picks
    sort-merge/shuffled-hash (AQE may still convert back to broadcast
    if runtime stats allow).
    """
    d = F.broadcast(dim) if broadcast else dim
    return fact.join(d, on=on, how=how)


def filter_recent(
    df: DataFrame,
    ts_col: str,
    lookback: str = "30 minutes",
    anchor: Column | None = None,
) -> DataFrame:
    """O5 (task.ts:80-82) — keep rows within ``lookback`` of an anchor.

    The reference pushes ``d1 = now - 30min`` to the server; the batch
    analog anchors on max(ts) for determinism (FIXTURES.md §5). The
    anchor aggregate is a 1-row DataFrame broadcast-joined in — at any
    scale this is one cheap pre-pass (min/max come from parquet
    footer stats) plus a shuffle-free join; the comparison itself is
    codegen'd and, when the anchor is a literal, pushed to the scan.
    """
    if anchor is not None:
        return df.filter(F.col(ts_col) >= anchor - F.expr(f"INTERVAL {lookback}"))
    anchor_df = df.agg(F.max(F.col(ts_col)).alias("_anchor"))
    return (
        df.join(F.broadcast(anchor_df))
        .filter(F.col(ts_col) >= F.col("_anchor") - F.expr(f"INTERVAL {lookback}"))
        .drop("_anchor")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``direction="backward"`` (default): for each left
    row, the LATEST right row with ``right.ts <= left.ts`` on the same
    key. ``direction="forward"``: the EARLIEST right row with
    ``right.ts >= left.ts`` — the same one-window rendering with the
    timeline walked in reverse, so both directions share every scale
    property below.

    Implemented as UNION + single window pass (the scale path): tag
    both sides, sort each key's timeline once, and carry the last seen
    right-side values forward with ``last(..., ignorenulls=True)``.
    One shuffle on the key, no per-row range probe, no O(n*m) key
    blow-up — this survives 100 TB where a range-condition join (which
    Spark plans as a broadcast-nested-loop or exploding theta join)
    does not. Right rows sort BEFORE left rows on timestamp ties, so
    an exactly-simultaneous right row is visible (<= semantics).
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    # All right value columns travel as ONE struct carried by a single
    # last(ignorenulls): left rows hold a NULL struct (skipped whole),
    # right rows a non-null struct even when individual FIELDS are
    # NULL — so the carried values always come from one right row,
    # never a per-column mix of different rows.
    vals_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_value_cols]
    )
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_side"),
        F.lit(None).cast(vals_type).alias("_vals"),
        F.col(left_ts).alias("_ts"),
    )
    tagged_right = right.select(
        *[
            F.col(k) if k in key_cols else F.lit(None).cast(left.schema[k].dataType).alias(k)
            for k in lcols
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("_vals"),
        F.col(right_ts).alias("_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Tie-break among right rows sharing a timestamp: order by the
    # carried struct so `last` is deterministic (left rows have a NULL
    # struct and are already separated by _side).
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # forward = the same carry walked in reverse timeline order:
    # descending ts with right still sorting before left on ties keeps
    # the >= (respectively <=) boundary row visible to `last`.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_vals").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("_side"),
        F.last(F.col("_vals"), ignorenulls=True).over(w).alias("_vals"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col(f"_vals.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
        )
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-stage skew-safe aggregation: rows are salted into
    ``salt_buckets`` sub-keys, partially aggregated per (key, salt),
    then merged per key. The first shuffle spreads a hot key over
    ``salt_buckets`` reducers; the second handles one row per (key,
    salt) — negligible.

    ``aggs`` maps output column name -> (stage1_expr, merge) where
    ``merge`` names the stage-2 re-aggregation: 'sum' (for sum/count),
    'min', or 'max'. The decomposition is the caller's contract; for
    algebraic aggregates beyond these, pre-compose (avg = salted sum /
    salted count). The aggregate result is salt-invariant, so any salt
    assignment is correct; a seeded rand keeps runs deterministic.

    Spark's AQE skew handling covers JOIN skew; aggregation skew with
    partial aggregation is usually fine too (map-side combine), but
    this operator is the explicit pattern for extreme cardinality-1
    keys where even combined partial rows overwhelm one reducer
    (e.g., count per event_type with one type at 99%).
    """
    merge_fn = {"sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        salt_col, (F.rand(seed=7) * salt_buckets).cast("int")
    )
    stage1 = salted.groupBy(*keys, salt_col).agg(
        *[expr.alias(f"_s1_{name}") for name, (expr, _) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[
            merge_fn[merge](F.col(f"_s1_{name}")).alias(name)
            for name, (_, merge) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    salt_buckets: int = 8,
    salt_col: str = "_salt",
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by salting: the big side gets a
    deterministic salt in [0, salt_buckets), the small side is
    REPLICATED once per salt value, and the join runs on
    (key, salt) — a hot key's rows spread over ``salt_buckets``
    reducers instead of hammering one. Result is exactly the plain
    join (salt-invariant: every big row meets every matching small row
    exactly once, in its own salt slice).

    Cost model: small side shuffles ``salt_buckets``x — worth it only
    when the big side's key histogram is so degenerate that AQE's
    skew-join splitting (which handles MOST skew for free and is on in
    tune()) still leaves a straggler, and the small side is too big to
    broadcast outright. ``how`` supports 'inner' and 'left' (for
    'left', unmatched big rows survive in their salt slice).

    The salt is a hash of the big side's whole row (xxhash64 over all
    columns), not rand(): deterministic across retries/replays, which
    straggler re-execution at 100 TB requires.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    small_r = small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    on = [*key_cols, salt_col]
    return big_s.join(small_r, on=on, how=how).drop(salt_col)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    band: int,
) -> DataFrame:
    """Interval OVERLAP join with NO equi key — pairs of (left, right)
    rows whose [start, end] ranges intersect — via band bucketing, the
    pattern that keeps a pure range theta-join off Spark's
    broadcast-nested-loop path at scale (genomic-region and
    time-interval joins).

    Each interval explodes into the ``band``-width buckets it spans;
    candidates come from an EQUI-join on the bucket id; the exact
    overlap predicate filters false candidates. A pair spanning
    several shared buckets would surface once per bucket, so instead
    of a distinct over the (wide) pair output, each pair is kept only
    in its CANONICAL bucket — the bucket of max(l_start, r_start),
    which both sides provably contain (it is where the overlap
    starts). Cost: sum of per-bucket |L_b| x |R_b| — the caller picks
    ``band`` near the typical interval length so intervals span O(1)
    buckets; long outlier intervals degrade gracefully (more bucket
    rows, same per-bucket math). Bounds are integral (epoch
    seconds/positions); both endpoints inclusive.

    Endpoint columns are referenced unqualified after the join, so the
    two sides must use DISTINCT endpoint names (rename before calling);
    sharing one raises ``ValueError`` here instead of an ambiguous-
    reference analysis error later.
    """
    if band <= 0:
        raise ValueError(f"band must be a positive bucket width, got {band}")
    shared = ({l_start, l_end} & set(right.columns)) | (
        {r_start, r_end} & set(left.columns)
    )
    if shared:
        raise ValueError(
            "interval_overlap_join needs distinct endpoint column names "
            f"on the two sides; {sorted(shared)} exist on both — rename "
            "one side's endpoints before joining"
        )

    def banded(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        return df.withColumn(
            f"_b_{side}",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / band), F.floor(F.col(end) / band)
                )
            ),
        )

    lb = banded(left, l_start, l_end, "l")
    rb = banded(right, r_start, r_end, "r")
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    canonical = F.col("_b_l") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / band
    )
    return (
        lb.join(rb, F.col("_b_l") == F.col("_b_r"))
        .filter(overlap & canonical)
        .drop("_b_l", "_b_r")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Change-data-feed GENERATION: diff two snapshots of a keyed
    table into (key..., change_type in {'insert','update','delete'})
    — the inverse of cdc_latest_state (which COMPACTS a feed back
    into a snapshot). This is how a plain-parquet pipeline emits an
    incremental feed downstream when the source cannot (Delta/Iceberg
    CDF does this natively; the plan here is the same one they run).

    One full-outer equi-join on the key; rows equal on every
    ``compare_cols`` (null-safe) are dropped, so the output is
    |changes|-sized, not |table|-sized. Comparison is per-column
    IS-NOT-DISTINCT-FROM conjunction — no hashing, so the oracle
    renders 1:1 and false "changes" are impossible (a hash would
    admit collisions the other way). At 100 TB both sides shuffle on
    the key once; with both snapshots bucketed by key the join is
    co-located and shuffle-free."""
    o = old.select(
        *[F.col(k) for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_ov"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_nv"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, on=list(key_cols), how="full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~F.col("_ov").eqNullSafe(F.col("_nv")), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
