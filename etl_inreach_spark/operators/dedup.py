"""Keyed-argmax / latest-per-key deduplication.

Re-expresses the reference's one real aggregation — the per-device
"keep the newest position report" hash-map upsert
(reference task.ts:92,151-159) — as Spark aggregations.

Exact semantics preserved (SURVEY.md §2.3.1-2):
  * strict ``>`` comparison => on timestamp ties the EARLIEST-SEEN row
    wins (task.ts:154). We need an explicit arrival-order column for
    that to be deterministic under Spark parallelism.
  * NULL timestamps compare as epoch 0 (``time ?? 0``, task.ts:154):
    a null-time row never replaces anything and is replaced by any
    timestamped row.

Scale notes:
  * ``latest_by_key`` (default) renders the argmax as
    ``max_by(struct(*), ordering_struct)`` — a hash aggregation with
    map-side partial aggregation, so the shuffle carries one row per
    (partition, key) instead of every row. This is the 100 TB path:
    shuffle volume ~ |keys|, not |rows|.
  * ``latest_by_key_window`` is the window rendering (full shuffle +
    per-partition sort). Kept because it generalizes to top-k (k>1) and
    because some callers want rank columns. Prefer the agg form for
    k=1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def EPOCH0() -> Column:
    """Epoch-0 stand-in for NULL event times ("time ?? 0", task.ts:154).

    A function, not a module constant: classic Column objects need an
    active SparkContext, which doesn't exist at import time.
    """
    return F.to_timestamp(F.lit("1970-01-01 00:00:00"))


def _ordering_struct(ts_col: str, arrival_col: str | None) -> Column:
    """Struct whose lexicographic MAX is the row the reference keeps.

    Timestamp ascending-max picks the latest; on ties, the smallest
    arrival index must win, so arrival enters NEGATED (max of -arrival
    = min arrival = first seen).
    """
    ts = F.coalesce(F.col(ts_col), EPOCH0())
    if arrival_col is None:
        return F.struct(ts.alias("ts"))
    return F.struct(ts.alias("ts"), (-F.col(arrival_col)).alias("neg_arrival"))


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    arrival_col: str | None = None,
) -> DataFrame:
    """One row per key: max timestamp, first-seen on ties.

    Aggregation rendering: partial-agg friendly, one shuffle keyed on
    ``key_cols`` carrying ~|keys| rows after map-side combine.
    """
    cols = df.columns
    picked = F.max_by(F.struct(*[F.col(c) for c in cols]), _ordering_struct(ts_col, arrival_col))
    out = df.groupBy(*[F.col(k) for k in key_cols]).agg(picked.alias("_row"))
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def latest_by_key_window(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    arrival_col: str | None = None,
) -> DataFrame:
    """Window rendering of the same semantics (row_number == 1)."""
    order = [F.coalesce(F.col(ts_col), EPOCH0()).desc()]
    if arrival_col is not None:
        order.append(F.col(arrival_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Generalization of the argmax to k>1 (SURVEY.md §2.2 top-k row).

    Window row_number over an explicit deterministic ordering. At scale
    this is one shuffle on the keys + a bounded per-key sort; AQE
    handles skewed keys.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def exact_dedup(df: DataFrame, subset: Sequence[str], keep_min_col: str | None = None) -> DataFrame:
    """Exact deduplication on a column subset.

    With ``keep_min_col`` the survivor is deterministic (the row with
    the minimal value of that column — e.g. earliest doc_id), rendered
    as a min_by hash aggregation (partial-agg friendly). Without it,
    plain ``dropDuplicates`` (non-deterministic survivor, cheapest).
    """
    if keep_min_col is None:
        return df.dropDuplicates(list(subset))
    cols = df.columns
    picked = F.min_by(F.struct(*[F.col(c) for c in cols]), F.col(keep_min_col))
    out = df.groupBy(*[F.col(c) for c in subset]).agg(picked.alias("_row"))
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair relation —
    the pairs -> clusters step every dedup pipeline ends with
    (canonical representative = min id reachable from each node).

    Iterative min-label propagation: symmetrize the edges, seed each
    node's label with its own id, then repeatedly take the min of a
    node's label and its neighbors' labels until a fixpoint. Each
    round is one shuffle (join on node id + groupBy min) and the round
    count is bounded by the graph diameter — duplicate-cluster graphs
    are shallow (near-cliques), so convergence is fast. The iteration
    is a driver LOOP over DataFrame ops with an eager localCheckpoint
    per round: the checkpoint cuts the exponentially-growing lineage
    and the convergence check is a bounded count(). For graphs with
    genuinely long chains swap the propagation for large-star/
    small-star (alternating min to root), which contracts diameter
    logarithmically — same dataflow shape per round.

    Returns (id, component) — every node that appears in ``edges``,
    labeled with the smallest id in its component.
    """
    # materialize the (possibly expensive) edge relation ONCE — every
    # round and every convergence count re-executes its plan otherwise
    sym = edges.select(F.col(src).alias("_n"), F.col(dst).alias("_m")).unionByName(
        edges.select(F.col(dst).alias("_n"), F.col(src).alias("_m"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select("_n").distinct().select(F.col("_n").alias("id"), F.col("_n").alias("component"))
    ).localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_iter):
        nb = (
            sym.join(labels, sym["_m"] == labels["id"])
            .select(F.col("_n").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(nb)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Partially-propagated labels are silently WRONG component ids —
        # a graph whose diameter exceeds max_iter (long duplicate
        # chains) must fail loudly, not dedup against bogus canonicals.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the edge graph has "
            "diameter > max_iter — raise max_iter or use a large-star/"
            "small-star contraction for log-diameter convergence"
        )
    return labels
