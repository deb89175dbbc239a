"""Semantics tests for the training-pipeline / remaining-relational
queries (queries_pipeline.py) beyond the DuckDB value-hash oracle:
statistical sanity of the hash split, agreement of the exact-moment
statistics with Spark's native estimators, calendar conventions."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_hash_split_proportions_and_determinism(spark, sf_dir):
    from etl_inreach_spark.queries_pipeline import hash_split_documents

    rows = hash_split_documents(spark, sf_dir).collect()
    n = len(rows)
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    # 80/10/10 within binomial noise (4 sigma at n=500: ~7%)
    assert abs(len(by_split["train"]) / n - 0.8) < 0.08
    assert abs(len(by_split["val"]) / n - 0.1) < 0.06
    assert abs(len(by_split["test"]) / n - 0.1) < 0.06
    # determinism: a second evaluation assigns identically
    again = {r["doc_id"]: r["split"] for r in hash_split_documents(spark, sf_dir).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)
    # stratification: minority languages are never subsampled
    assert all(r["sampled"] for r in rows if r["lang"] != "en")
    en = [r for r in rows if r["lang"] == "en"]
    frac = sum(r["sampled"] for r in en) / len(en)
    assert abs(frac - 0.5) < 0.1


def test_quality_filter_first_failing_rule_wins(spark):
    from etl_inreach_spark.functions.text import LANG_MARKERS  # noqa: F401  (import sanity)
    from etl_inreach_spark.queries_pipeline import quality_filter_pipeline

    # craft a tiny documents table exercising each verdict; a single
    # parquet FILE, matching the driver testdata layout load_table reads
    import os

    import pandas as pd

    os.makedirs("/tmp/qf_docs", exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "one two",                      # too_short (<5 tokens)
                " ".join(["w"] * 501),          # too_long
                "the cat !!!!! ... ;;;",        # 5 tokens -> punct rule fires
                "the quick brown fox jumps",    # ok
                "zz yy xx ww vv uu",            # no_stopwords
            ],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [7, 1001, 21, 25, 17],
        }
    ).to_parquet("/tmp/qf_docs/documents.parquet")
    got = {
        r["doc_id"]: (r["verdict"], r["keep"])
        for r in quality_filter_pipeline(spark, "/tmp/qf_docs").collect()
    }
    assert got[1] == ("too_short", False)
    assert got[2] == ("too_long", False)
    assert got[3] == ("too_much_punct", False)
    assert got[4] == ("ok", True)
    assert got[5] == ("no_stopwords", False)


def test_corr_matches_native_estimator(spark, sf_dir):
    """The decimal-exact moments must agree with Spark's native
    double-accumulating corr/covar/stddev to float tolerance."""
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_pipeline import corr_price_quantity

    got = {r["l_returnflag"]: r for r in corr_price_quantity(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.stddev_samp("l_quantity").alias("sq"),
            F.stddev_samp("l_extendedprice").alias("sp"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for k in got:
        assert math.isclose(got[k]["corr_qty_price"], ref[k]["c"], rel_tol=1e-6)
        assert math.isclose(got[k]["covar_samp"], ref[k]["cv"], rel_tol=1e-6)
        assert math.isclose(got[k]["stddev_qty"], ref[k]["sq"], rel_tol=1e-6)
        assert math.isclose(got[k]["stddev_price"], ref[k]["sp"], rel_tol=1e-6)


def test_date_dim_weekday_iso(spark):
    from etl_inreach_spark.queries_pipeline import date_dim_generate

    rows = {str(r["d"]): r for r in date_dim_generate(spark, "unused").collect()}
    assert len(rows) == 731  # 1995 + leap 1996
    # 1995-01-02 was a Monday
    assert rows["1995-01-02"]["weekday"] == 0 and not rows["1995-01-02"]["is_weekend"]
    assert rows["1995-01-01"]["weekday"] == 6 and rows["1995-01-01"]["is_weekend"]
    assert rows["1996-02-29"]["m"] == 2  # leap day present


def test_grouping_sets_shape(spark, sf_dir):
    from etl_inreach_spark.queries_pipeline import grouping_sets_pricing

    rows = grouping_sets_pricing(spark, sf_dir).collect()
    # every row is exactly one of the two sets: flag-only or status-only
    assert all((r["l_returnflag"] is None) != (r["l_linestatus"] is None) for r in rows)
    flags = {r["l_returnflag"] for r in rows if r["l_returnflag"] is not None}
    statuses = {r["l_linestatus"] for r in rows if r["l_linestatus"] is not None}
    assert flags == {"A", "N", "R"} and statuses == {"F", "O"}


def _physical_ops(df):
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    return [
        re.match(r"^\(\d+\) (\S+)", line).group(1)
        for line in plan.splitlines()
        if re.match(r"^\(\d+\)", line)
    ]


def test_plan_shapes(spark, sf_dir):
    """Plan regressions for the pipeline queries: the split is a pure
    no-shuffle projection; corr is ONE partial+final aggregation pair;
    grouping sets is a single Expand (one scan, not one per set)."""
    from etl_inreach_spark.queries_pipeline import (
        corr_price_quantity,
        grouping_sets_pricing,
        hash_split_documents,
    )

    split_ops = _physical_ops(hash_split_documents(spark, sf_dir))
    assert "Exchange" not in split_ops and "HashAggregate" not in split_ops

    corr_ops = _physical_ops(corr_price_quantity(spark, sf_dir))
    assert corr_ops.count("HashAggregate") == 2  # partial + final
    assert corr_ops.count("Exchange") == 1
    assert corr_ops.count("Scan") == 1

    gs_ops = _physical_ops(grouping_sets_pricing(spark, sf_dir))
    assert gs_ops.count("Expand") == 1
    assert gs_ops.count("Scan") == 1


def test_ntile_quartiles_balanced(spark, sf_dir):
    from etl_inreach_spark.queries_pipeline import ntile_customer_value

    rows = ntile_customer_value(spark, sf_dir).collect()
    n = len(rows)
    sizes = [sum(1 for r in rows if r["quartile"] == q) for q in (1, 2, 3, 4)]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == n
    top = max(rows, key=lambda r: (r["c_acctbal"], -r["c_custkey"]))
    assert top["quartile"] == 1 and top["pct_rank"] == 0.0
    bottom = min(rows, key=lambda r: (r["c_acctbal"], -r["c_custkey"]))
    assert bottom["quartile"] == 4 and bottom["cume"] == 1.0


def test_ntile_no_single_partition_row_stream(spark, sf_dir):
    """VERDICT r6 'What's wrong': the old rendering moved the whole
    customer table through one WindowExec partition. The rewrite goes
    through global_row_index, so the only unpartitioned window must be
    over the <=B-row bucket-count relation: the row-stream window is
    partitioned by _bucket and every SinglePartition exchange feeds an
    aggregate (same pin as test_indexing / global_row_index_orders)."""
    from etl_inreach_spark.queries_pipeline import ntile_customer_value

    plan = (
        ntile_customer_value(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_bucket" in plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
