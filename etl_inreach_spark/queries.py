"""Query registry: every implemented operator exposed as a named query
over the driver's test tables, paired with an ANSI-SQL DuckDB oracle.

Contract (see /root/repo/__spark_entry__.py): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL must produce
the same row count, schema (column names) and order-insensitive values
on the same parquet tables.

Float discipline (oracle parity): aggregate sums go through
DECIMAL so they are exact and order-insensitive in BOTH engines, then
cast back to DOUBLE; see SURVEY.md §7 "hard parts" #4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# --- Registry ordering -------------------------------------------------
#
# The driver's correctness harness verifies the FIRST 50 entries of
# queries() only, so dict order is the coverage dial (round-2 lesson:
# indices 50-62 silently got no oracle verdict). Policy: queries that
# have never had a green CORRECTNESS row, or whose implementation
# changed this round, are pinned to the FRONT; long-stable greens
# rotate to the TAIL; anything unlisted (e.g. a brand-new query that
# forgot to update these lists) lands in the middle, still inside the
# window as long as the tail stays >= (total - 50) names.
#
# Verdict history (r1 = CORRECTNESS_r01, r2 = CORRECTNESS_r02):
#   _FRONT: sessionize_events FAILED r1+r2 (fixed r3: NTZ normalize);
#     sliding_1h_user_activity green r1, unchecked+bench-broken r2
#     (same NTZ fix); seq_pack_*, contamination_check,
#     repetition_profile never checked (added r2 at idx 59-62);
#     streaming_stateful_latest new in r3; global_top10_orders ..
#     sql_revenue_by_nation green r1 but unchecked r2 (idx 50-58);
#     approx_distinct_users rows-only by design (HLL sketch) — needs
#     its rows-only row recorded each round.
#   _TAIL: green in BOTH r1 and r2 (or r2 with unchanged code since).
_FRONT: tuple[str, ...] = (
    "sessionize_events",
    "sliding_1h_user_activity",
    "seq_pack_chunks",
    "seq_pack_bins",
    "contamination_check",
    "repetition_profile",
    "streaming_stateful_latest",
    "streaming_groupstate_latest",
    "upsert_merge_roundtrip",
    # changed in r3 (eav_to_map rewrite -> LAST_WIN map policy;
    # unit_strip_cast two-projection regex-once rendering)
    "eav_pivot",
    "unit_strip_cast",
    "global_top10_orders",
    "shipping_priority_top10",
    "pivot_event_counts",
    "skew_safe_event_counts",
    "order_stats_summary",
    "full_outer_nation_activity",
    "unpivot_order_flags",
    "sql_revenue_by_nation",
    "approx_distinct_users",
)
_TAIL: tuple[str, ...] = (
    "text_stats",
    "lang_id_documents",
    "doc_fingerprints",
    "exact_dedup_documents",
    "embedding_topk",
    "multimodal_features",
    "embedding_norms",
    "embedding_cosine_dedup",
    "multimodal_frame_sample",
    "cube_pricing",
    "catalog_row_counts",
    "latest_per_key",
    "share_normalize",
    "split_coordinates",
    "json_props_extract",
    "timestamp_normalize",
    "time_window_filter",
    "string_functions_showcase",
    "broadcast_config_join",
    "top3_orders_per_customer",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "asof_last_click_before_purchase",
    "cross_join_region_nation",
    "range_join_ship_within_90d",
    "rollup_pricing",
    "set_ops_repeat_customers",
    "set_ops_churned_customers",
    "window_running_stats",
    "tumbling_15min_counts",
    "distinct_users_per_type",
)


def _ordered(names: list[str]) -> list[str]:
    front = [n for n in _FRONT if n in names]
    tail = [n for n in _TAIL if n in names]
    pinned = set(front) | set(tail)
    middle = [n for n in names if n not in pinned]
    return front + middle + tail


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _QUERIES[n] for n in _ordered(list(_QUERIES))}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _ordered(list(_QUERIES)) if n in _ORACLES}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # unconditional: a broken query module must fail LOUDLY, not
    # silently shrink the correctness surface the driver checks
    from etl_inreach_spark import (  # noqa: F401
        queries_extended,
        queries_kml,
        queries_pipeline,
        queries_reference,
        queries_relational,
        queries_training,
    )

    _LOADED = True
