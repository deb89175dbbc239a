"""Registry-ordering invariants.

The driver's correctness harness verifies only the FIRST 50 entries of
``queries()`` (round-2 lesson: 13 queries silently got no verdict), so
ordering is part of the correctness surface and is pinned here."""

from __future__ import annotations

from etl_inreach_spark import queries as Q

DRIVER_WINDOW = 50


def test_front_and_tail_names_exist():
    names = set(Q.all_queries())
    assert set(Q._FRONT) <= names, set(Q._FRONT) - names
    assert set(Q._PENDING) <= names, set(Q._PENDING) - names
    assert set(Q._TAIL) <= names, set(Q._TAIL) - names
    groups = [set(Q._FRONT), set(Q._PENDING), set(Q._TAIL)]
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            assert not a & b


def test_every_non_tail_query_inside_driver_window():
    """Anything not explicitly rotated to the tail (green in two
    straight rounds) or explicitly parked as PENDING (added after this
    round's window froze; must enter _FRONT next round) must land where
    the driver checks it — nothing gets silently unverifiable."""
    order = list(Q.all_queries())
    outside = set(order[DRIVER_WINDOW:])
    unaccounted = outside - set(Q._TAIL) - set(Q._PENDING)
    assert not unaccounted, (
        f"queries outside the driver's first-{DRIVER_WINDOW} window that are "
        f"neither rotated tail entries nor declared PENDING: {sorted(unaccounted)}"
    )
    # PENDING is a parking slot, not a second tail: it must stay small
    # (strictly fewer than the names that rotate OUT of a full window
    # each round) so everything parked can actually enter next round.
    assert len(Q._PENDING) <= 12, "PENDING outgrew next round's window capacity"
    # and PENDING names must sit at the head of the middle, directly
    # after the front, so a widened driver window would reach them first
    assert order[len(Q._FRONT) : len(Q._FRONT) + len(Q._PENDING)] == [
        n for n in Q._PENDING if n in set(order)
    ]


def test_front_queries_lead_the_registry():
    order = list(Q.all_queries())
    assert order[: len(Q._FRONT)] == [n for n in Q._FRONT if n in set(order)]


def test_oracles_subset_of_queries():
    qs, os_ = Q.all_queries(), Q.all_oracles()
    assert set(os_) <= set(qs)
    # every query has an oracle except the documented rows-only ones
    # (engine-specific sketches; each has a value-oracled exact or
    # portable companion: kmv_distinct_users, order_value_percentiles)
    rows_only = {"approx_distinct_users", "approx_order_percentiles"}
    assert set(qs) - set(os_) == rows_only


def test_round11_window_matches_the_written_plan():
    """The r11 _FRONT must be exactly the ROUND-11 ROTATION PLAN
    written at r10 close: 2 former _PENDING + the 41-name r7-window
    remainder + 7 r8-window head names = 50."""
    order = list(Q.all_queries())
    assert order[:2] == [
        "minhash_after_exact_dedup",
        "nb_quality_capped_vocab",
    ]
    assert order[2] == "tpch_q19_disjunctive_filter"
    assert order[42] == "recursive_nation_chain"
    assert order[43] == "incremental_dedup_convergence"
    assert order[49] == "embedding_project_jl"
    assert len(Q._FRONT) == DRIVER_WINDOW


def test_round12_rotation_groups_are_intact():
    """The ROUND-12 ROTATION PLAN (comment in queries.py) is executable
    only if the tail still leads with its priority group: the 43-name
    r8-window remainder (out r9+r10+r11 — past the staleness bound),
    then the r9-window block (out r10+r11, at the bound) as window
    fill, then the r10-window greens (one round of headroom). Pinning
    the group boundaries makes executing the plan at r12 start a
    mechanical copy, and any tail edit that would silently demote a
    stale query fails here instead."""
    assert Q._TAIL[0] == "schema_evolution_merge"
    assert Q._TAIL[42] == "tumbling_15min_counts"
    # r9-window block begins immediately after and runs 50 names deep
    assert Q._TAIL[43] == "ivf_pq_adc_topk"
    assert Q._TAIL[92] == "tpch_q14_promo_revenue"
    # r10 window follows (out r11 only — one round of headroom)
    assert Q._TAIL[93] == "kmeans_lloyd_round2_update"
    assert Q._TAIL[142] == "tpch_q17_small_qty_revenue"
    # everything in _PENDING enters r12 group 1 ahead of these
    assert len(Q._PENDING) + 43 + 7 <= 2 * DRIVER_WINDOW
