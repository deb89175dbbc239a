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
    # materialize the (possibly expensive) edge relation ONCE, BEFORE
    # symmetrizing: the union references the edge subtree twice, so an
    # uncheckpointed plan (e.g. the whole PPJoin pair generation) would
    # execute twice inside the sym materialization — measured ~2x the
    # dominant cost of dedup_clusters. Every round and every
    # convergence count then reads the sym checkpoint.
    e = edges.select(F.col(src).alias("_n"), F.col(dst).alias("_m")).localCheckpoint(
        eager=True
    )
    sym = e.unionByName(
        e.select(F.col("_m").alias("_n"), F.col("_n").alias("_m"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select("_n").distinct().select(F.col("_n").alias("id"), F.col("_n").alias("component"))
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nb = (
            sym.join(labels, sym["_m"] == labels["id"])
            .select(F.col("_n").alias("id"), F.col("component"))
        )
        # Checkpoint stays EAGER: a lazy checkpoint materialized by the
        # witness below was measured job-count NEUTRAL here (r11) — at
        # this label cardinality the witness broadcasts ln/lm, and the
        # broadcast-build job simply replaces the checkpoint job while
        # adding fill-in ambiguity. Same total passes either way.
        new_labels = (
            labels.unionByName(nb)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        # Convergence = every EDGE has label-equal endpoints — knowable
        # one round EARLIER than "no label changed" (which needs the
        # fixpoint round to run once more just to observe no change):
        # if all edges agree now, the next propagation is the identity.
        # One LIMIT-1 witness count over the checkpointed labels.
        ln = labels.select(F.col("id").alias("_n"), F.col("component").alias("_cn"))
        lm = labels.select(F.col("id").alias("_m"), F.col("component").alias("_cm"))
        bad = (
            sym.join(ln, "_n")
            .join(lm, "_m")
            .filter(F.col("_cn") != F.col("_cm"))
            .limit(1)
            .count()
        )
        if bad == 0:
            converged = True
            break
    if not converged:
        # Partially-propagated labels are silently WRONG component ids —
        # a graph whose diameter exceeds max_iter (long duplicate
        # chains) must fail loudly, not dedup against bogus canonicals.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(edges with label-unequal endpoints remain); the edge graph "
            "has diameter > max_iter — raise max_iter or use "
            "connected_components_star for log-diameter convergence"
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the log-diameter escalation for graphs where plain
    min-label propagation (diameter-bounded rounds) is too slow, e.g.
    long duplicate chains.

    Per round, with N(u) the current neighborhood and
    m(u) = min(N(u) ∪ {u}):
      * large-star rewires every STRICTLY LARGER neighbor to m(u):
        {(v, m(u)) : v ∈ N(u), v > u};
      * small-star rewires the smaller-or-equal neighbors and u
        itself: {(v, m(u)) : v ∈ N(u), v < u} ∪ {(u, m(u))}.
    Both preserve connectivity and strictly shrink tree height; the
    edge set converges to a star forest rooted at each component's
    minimum id in O(log^2 n) rounds (O(log n) observed). Each round
    is a groupBy-min plus a join — the same shuffle shape as one
    propagation round — with an eager localCheckpoint as the lineage
    cut, and convergence is an (count, xor-hash) fingerprint equality
    check on the edge set, one cheap agg per round.

    Returns (id, component) for every node in ``edges``, component =
    min id of the node's component — identical contract (and a pinned
    property-test equivalence) to ``connected_components``.
    """
    # materialize the (possibly expensive) edge relation ONCE: both the
    # canonicalized loop input below AND the final `nodes` union (which
    # references the subtree twice) read this checkpoint — without it
    # the full pair generation would execute three times (once here,
    # twice inside the nodes-union job); measured 12.0 -> 4.9 s
    # (min-of-4) on dedup_clusters_star at sf0.1.
    e0 = edges.select(
        F.col(src).alias("_a"), F.col(dst).alias("_b")
    ).localCheckpoint(eager=True)
    cur = (
        e0.filter(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("_a"), F.greatest("_a", "_b").alias("_b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    isolated = None  # star rounds drop nothing: every node keeps an edge
    prev_fp = None
    for _ in range(max_iter):
        sym = cur.select(F.col("_a").alias("_n"), F.col("_b").alias("_m")).unionByName(
            cur.select(F.col("_b").alias("_n"), F.col("_a").alias("_m"))
        )
        mn = (
            sym.groupBy("_n")
            .agg(F.min("_m").alias("_minm"))
            .select("_n", F.least("_minm", "_n").alias("_root"))
        )
        with_min = sym.join(mn, "_n")
        large = with_min.filter(F.col("_m") > F.col("_n")).select(
            F.col("_m").alias("_a"), F.col("_root").alias("_b")
        )
        cur = (
            large.filter(F.col("_a") != F.col("_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star on the large-star output
        sym = cur.select(F.col("_a").alias("_n"), F.col("_b").alias("_m")).unionByName(
            cur.select(F.col("_b").alias("_n"), F.col("_a").alias("_m"))
        )
        mn = (
            sym.groupBy("_n")
            .agg(F.min("_m").alias("_minm"))
            .select("_n", F.least("_minm", "_n").alias("_root"))
        )
        with_min = sym.join(mn, "_n")
        small = with_min.filter(F.col("_m") <= F.col("_n")).select(
            F.col("_m").alias("_v"), F.col("_root")
        ).unionByName(
            with_min.select(F.col("_n").alias("_v"), F.col("_root")).distinct()
        )
        cur = (
            small.filter(F.col("_v") != F.col("_root"))
            .select(F.col("_root").alias("_a"), F.col("_v").alias("_b"))
            .distinct()
            # EAGER on purpose: a lazy checkpoint riding the combined
            # witness job was measured r11 to ADD a job at this scale
            # (local-checkpoint fill-in after the witness's broadcast
            # builds) — the barrier here is the cheaper, unambiguous
            # form.
            .localCheckpoint(eager=True)
        )
        # Direct fixed-point test — saves the whole confirm-round the
        # fingerprint method needs: after small-star every edge is
        # (_root < _v) oriented, so the edge set is a DISJOINT star
        # forest with minimal roots iff (a) no node appears both as a
        # root (_a) and a leaf (_b), AND (b) no leaf carries edges to
        # TWO roots — small-star deliberately produces multi-rooted
        # leaves as the glue that merges roots next round (caught by
        # the union-find property test), so (a) alone is NOT enough.
        # Under (a)+(b) components are exactly the stars, each rooted
        # at its minimum, and both contractions are the identity. Two
        # bounded LIMIT-1 witness scans over the just-checkpointed
        # relation.
        leaf_stats = cur.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
        # ONE action per round: the star-forest witness AND the
        # xor-fold no-progress fingerprint (order-insensitive,
        # overflow-free — a SUM of xxhash64 can overflow bigint under
        # ANSI) ride the same job as a cross join of two 1-row
        # aggregates. The fingerprint branch used to be a second
        # collect on non-converged rounds — i.e. every round but the
        # last; on the converged round it is a few extra cached-scan
        # tasks inside the same job.
        chk = (
            leaf_stats.filter(F.col("_c") > 1)
            .select("_b")
            .unionByName(
                leaf_stats.join(
                    cur.select(F.col("_a").alias("_b")).distinct(),
                    "_b",
                    "left_semi",
                ).select("_b")
            )
            .limit(1)
            .agg(F.count(F.lit(1)).alias("bad"))
            .crossJoin(
                cur.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(xxhash64(_a, _b))").alias("h"),
                )
            )
            .collect()[0]
        )
        if chk["bad"] == 0:
            break
        if prev_fp == (chk["n"], chk["h"]):
            break
        prev_fp = (chk["n"], chk["h"])
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — pathological input (should not happen: star "
            "contraction converges in O(log^2 n))"
        )
    # cur is now a star forest (root=_a < leaf=_b). Labels: leaves map
    # to their root, roots (and any node present only as a root) to
    # themselves.
    nodes = (
        e0.select(F.col("_a").alias("id"))
        .unionByName(e0.select(F.col("_b").alias("id")))
        .distinct()
    )
    leaf_labels = cur.select(F.col("_b").alias("id"), F.col("_a").alias("component"))
    return (
        nodes.join(leaf_labels, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )
