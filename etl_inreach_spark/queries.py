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
# Verdict history (rN = CORRECTNESS_r0N):
#   Round-4 rotation, revised mid-round when 11 new queries landed
#   (the window is exactly full, so every addition displaces a name).
#   Staleness bound (VERDICT r3 item 4): a query may sit outside the
#   window at most 2 consecutive rounds.
#   _FRONT groups, in order:
#   (a) changed this round — the two r3 red rows (oracle-rendering
#       fixes), the js_try_to_timestamp widening (flows through both
#       KML-path queries), the shingle-materialization perf change,
#       the connected_components non-convergence raise, and the
#       streaming fixture cleanup (all four streaming fixtures);
#   (b) NEW this round, never driver-verified — 11 r4 additions
#       (analytics + curation modules) then the 7 r3-late additions;
#   (c) stale-since-r2 names rotating back in (out r2+r3 — at the
#       staleness bound, MUST be verified in r4);
#   (d) the two rows-only sketches (rows-only row recorded per round);
#   (e) r3-first-green names granted a second green round — the 8
#       most structural (packing/corpus/session/skew paths). The other
#       10 r3-first-greens (simple relational aggregates) rotate to
#       the tail mid-body and re-enter in r5.
#
#   ROUND-5 ROTATION PLAN (write this into _FRONT at r5 start):
#   1. all 12 _PENDING names — never driver-verified (local
#      oracle_check PASS only);
#   2. the _TAIL head block (12 names, top3_orders_per_customer ..
#      distinct_users_per_type) — out r3+r4, AT the staleness bound;
#   3. the r3-green/out-r4 mid-tail block (sessionize_events ..
#      approx_order_percentiles — includes the two rows-only sketches
#      and the 2 streaming fixtures streaming_tumbling_counts /
#      streaming_groupstate_latest) — out r4 only, 1 round of
#      headroom; fill remaining slots from its head;
#   4. r4-greens rotate to the tail to make room (they will have one
#      green round; prefer keeping any whose implementation changes
#      again in r5).
#   12 + 12 = 24 mandatory; ~26 slots remain for group 3 + changed
#   queries — fits.
_FRONT: tuple[str, ...] = (
    # (a) changed this round
    "seq_pack_chunks",
    "multimodal_resize",
    "kml_pipeline_roundtrip",
    "streaming_dedup_ids",
    "near_dup_jaccard",
    "minhash_lsh_dedup",
    "dedup_clusters",
    "streaming_stateful_latest",
    # (b) new in r4, never verified: analytics + curation modules
    "scd2_user_state",
    "resample_gapfill_events",
    "data_profile_orders",
    "tpch_q5_local_supplier",
    "orders_above_cust_avg",
    "streaming_stream_stream_join",
    "segment_dedup_rebuild",
    "stratified_sample_documents",
    "reservoir_sample_per_source",
    "domain_mix_weights",
    "udtf_token_runs",
    "pseudonymize_customers",
    "hof_array_zoo",
    "window_function_zoo",
    "streaming_static_enrich",
    "cdc_latest_state",
    "rollup_time_revenue",
    "variant_props_extract",
    "partitioned_sink_prune",
    "csv_roundtrip_orders",
    "cogroup_conversion_latency",
    "zorder_events_key",
    "ansi_safe_functions",
    # (b) late-r3 additions, never verified
    "doc_chunk_overlap",
    "triangle_count_copurchase",
    "vocab_top_terms",
    "tfidf_top_terms",
    "funnel_conversion",
    "histogram_order_totals",
    "embedding_quantize_int8",
    # (c) stale since r2, rotating back in (first half of old tail)
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
    # (d) rows-only sketches both rotated to the tail this round under
    # window pressure from the 20 new value-oracled queries — their
    # exact companions (kmv_distinct_users, order_value_percentiles)
    # carry the value signal; both re-enter in r5
)
# Added AFTER the r4 window froze: the window is exactly full with
# (a) changed + (b) never-verified + (c) at-the-staleness-bound names,
# so these cannot enter without evicting a name whose verification this
# round is mandatory. They sit at positions 50.. (head of the middle),
# carry local oracle_check PASS + pytest evidence, and MUST move to
# _FRONT in r5 (tests/test_registry_order.py enforces the bookkeeping:
# every registered query is FRONT, PENDING, or TAIL — nothing silently
# unverifiable).
_PENDING: tuple[str, ...] = (
    "tpch_q13_order_distribution",
    "tpch_q18_large_orders",
    "tpch_q21_last_shipper",
    "bm25_term_search",
    "walk3_centrality",
    "bloom_prune_join",
    "incremental_agg_merge",
    "embedding_argmax_arrow",
    "pandas_udaf_median_price",
    "corpus_curation_pipeline",
    "streaming_sliding_counts",
    "scd2_point_in_time_join",
)
_TAIL: tuple[str, ...] = (
    # held-back half of the stale-since-r2 set — 2 rounds unverified
    # after r4; MUST rotate into the r5 window (keep at tail head so
    # they re-enter first if window slots free up)
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
    # r3-first-greens displaced by the r4 additions (green r3, out
    # r4 — re-enter in r5, one round before their staleness bound)
    "sessionize_events",
    "session_window_native",
    "salted_skew_join",
    "sliding_1h_user_activity",
    "seq_pack_bins",
    "repetition_profile",
    "contamination_check",
    "upsert_merge_roundtrip",
    # r4 change was fixture cleanup only (try/finally rmtree), query
    # logic unchanged and green in r3 — rotated out under window
    # pressure, re-enter r5 (stateful coverage stays in-window via
    # streaming_stateful_latest)
    "streaming_tumbling_counts",
    "streaming_groupstate_latest",
    "approx_distinct_users",
    "approx_order_percentiles",
    "global_top10_orders",
    "shipping_priority_top10",
    "pivot_event_counts",
    "skew_safe_event_counts",
    "order_stats_summary",
    "full_outer_nation_activity",
    "unpivot_order_flags",
    "sql_revenue_by_nation",
    "mode_ship_month",
    "order_value_percentiles",
    # two-round-stable greens (r2 AND r3)
    "ann_ivf_topk",
    "ann_lsh_topk",
    "corr_price_quantity",
    "date_dim_generate",
    "doc_fingerprints",
    "eav_pivot",
    "embedding_norms",
    "embedding_topk",
    "exact_dedup_documents",
    "grouping_sets_pricing",
    "hash_split_documents",
    "kmv_distinct_users",
    "lang_id_documents",
    "multimodal_features",
    "ntile_customer_value",
    "pricing_summary",
    "quality_filter_pipeline",
    "simhash_near_dup",
    "text_stats",
    "unit_strip_cast",
)


def _ordered(names: list[str]) -> list[str]:
    front = [n for n in _FRONT if n in names]
    pending = [n for n in _PENDING if n in names]
    tail = [n for n in _TAIL if n in names]
    pinned = set(front) | set(pending) | set(tail)
    middle = [n for n in names if n not in pinned]
    return front + pending + middle + tail


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
        queries_analytics,
        queries_curation,
        queries_extended,
        queries_kml,
        queries_pipeline,
        queries_reference,
        queries_relational,
        queries_training,
    )

    _LOADED = True
