"""Registry-wide plan-discipline audit: no query may plan a cartesian
product or a row-at-a-time Python UDF (BatchEvalPython) — the two
blacklisted 100 TB anti-patterns. Arrow-batched pandas ops
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
sanctioned escape hatch and remain allowed."""

from __future__ import annotations

import pytest

from etl_inreach_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in all_queries().items():
        if name.startswith("streaming"):
            continue  # streaming fixtures drain checkpoints; covered elsewhere
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_no_row_at_a_time_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders
