"""Positive plan-shape assertions for representative queries — the
complement of test_plan_audit's blacklist. These pin the PROPERTIES
the scale story rests on (shuffle counts, broadcast choices, top-k
pushdown), so a refactor that silently degrades a plan fails a test
rather than a benchmark."""

from __future__ import annotations

import pytest

from etl_inreach_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_window_zoo_single_shuffle(spark):
    """Eleven window functions over one (partition, ordering) must
    plan ONE shuffle — per-function exchanges would multiply the
    dominant cost by eleven."""
    plan = _plan(spark, "window_function_zoo")
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_single_shuffle(spark):
    """lag -> running sum -> groupBy(user_id, state_seq) -> lead all
    share (or subset-satisfy) the user_id hash partitioning: one
    exchange total. HashPartitioning(user_id) satisfies the
    ClusteredDistribution(user_id, state_seq) of the aggregation, so
    EnsureRequirements must not insert a second shuffle."""
    plan = _plan(spark, "scd2_user_state")
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_q5_broadcasts_dimensions(spark):
    """supplier/nation/region are broadcast; the only shuffle joins
    allowed are the big-big lineitem x orders and orders x customer."""
    plan = _plan(spark, "tpch_q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2


def test_cdc_latest_state_rank_pushdown(spark):
    """The rn==1 filter must reach the window sort as a group-limit
    (WindowGroupLimit): at scale this keeps one row per key flowing
    out of each sort partition instead of ranking everything and
    discarding."""
    plan = _plan(spark, "cdc_latest_state")
    assert "WindowGroupLimit" in plan


def test_segment_dedup_two_shuffles(spark):
    """Keep-first argmin shuffles on segment content, rebuild shuffles
    on doc_id — and nothing else."""
    plan = _plan(spark, "segment_dedup_rebuild")
    assert plan.count("Exchange hashpartitioning") == 2


def test_stratified_sample_no_shuffle(spark):
    """Deterministic rate sampling is a pure per-row predicate: the
    plan must contain NO exchange at all."""
    plan = _plan(spark, "stratified_sample_documents")
    assert "Exchange" not in plan


def test_q21_decorrelation_stays_equi_join(spark):
    """The EXISTS/NOT-EXISTS rendering must plan as semi/anti
    EQUI-joins on l_orderkey (the inequality as a join residual) —
    never a BroadcastNestedLoopJoin, which would be |lineitem|^2 at
    scale."""
    plan = _plan(spark, "tpch_q21_last_shipper")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q18_having_precedes_joins(spark):
    """The quantity-threshold filter must apply to the aggregate
    BEFORE either join: the join inputs carry only qualifying orders.
    In the executed plan the Filter sits on the agg side, not above
    any join."""
    plan = _plan(spark, "tpch_q18_large_orders")
    join_pos = min(
        (plan.find(j) for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
         if plan.find(j) != -1),
        default=-1,
    )
    filt_pos = plan.find("Filter (isnotnull(_q")
    if filt_pos == -1:
        filt_pos = plan.find("Filter (_q")
    assert join_pos != -1 and filt_pos != -1
    # executedPlan prints top-down: the HAVING filter printing BELOW
    # (after) the first join node means it executes before the join
    assert filt_pos > join_pos


def test_bm25_stats_broadcast(spark):
    """The 1-row corpus stats must broadcast — a shuffled cross join
    against per-term postings would serialize the whole relation
    through one partition."""
    plan = _plan(spark, "bm25_term_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curation_pipeline_single_shuffle(spark):
    """quality gate -> dedup -> split must cost ONE hash exchange (the
    fingerprint groupBy); the survivor join-back broadcasts at this
    size (AQE would shuffle it only when the survivor set outgrows the
    threshold) and the split is a pure projection."""
    plan = _plan(spark, "corpus_curation_pipeline")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan
