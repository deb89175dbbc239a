"""Spec test for ewma_user_daily's blocked exact rendering.

The query replaces the verbatim per-element fold (O(days^2) array
copies, ADVICE r7) with the floor-composition identity
``s_t = floor((s_in + sum_(j<=t) 2^(j-1) a_j) / 2^t)`` over 16-day
blocks. This test replays the VERBATIM sequential recurrence in
Python over the same day-count series and asserts bit-identical
output — sf0.001 users span 28+ days, so the first-block pretend
state, the cross-block state carry, and the partial final block are
all exercised.
"""

from __future__ import annotations

from collections import defaultdict

from etl_inreach_spark.catalog import load_table
from etl_inreach_spark.queries_analytics import _EWMA_G, ewma_user_daily


def test_ewma_blocked_rendering_matches_verbatim_recurrence(spark, sf_dir):
    import pyspark.sql.functions as F

    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["day"], r["c"]))
    expected = {}
    multi_block_users = 0
    for uid, rows in series.items():
        rows.sort()
        if len(rows) > 16:
            multi_block_users += 1
        s = None
        for day, c in rows:
            a = c * _EWMA_G
            s = a if s is None else (s + a) // 2
            expected[(uid, day)] = (c, s)
    # the fixture must actually cross the 16-day block boundary
    assert multi_block_users > 0

    got = ewma_user_daily(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        exp_c, exp_s = expected[(r["user_id"], r["day"])]
        assert (r["n_events"], r["ewma_fp"]) == (exp_c, exp_s), (
            r["user_id"],
            r["day"],
        )
