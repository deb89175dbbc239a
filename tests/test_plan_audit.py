"""Registry-wide plan-discipline audit: no query may plan a cartesian
product or a row-at-a-time Python UDF (BatchEvalPython) — the two
blacklisted 100 TB anti-patterns. Arrow-batched pandas ops
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are the
sanctioned escape hatch and remain allowed."""

from __future__ import annotations

import pytest

from etl_inreach_spark.queries import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def analyzed(spark):
    import os

    # Disable eager localCheckpoint barriers: a checkpoint truncates
    # lineage to Scan ExistingRDD, which would HIDE the materialized
    # subtree (shingle pipelines) from the audits below — and execute
    # real jobs during what should be plan inspection.
    os.environ["SPARK_GRAFT_NO_MATERIALIZE"] = "1"
    out = {}
    try:
        for name, fn in all_queries().items():
            if name.startswith("streaming"):
                continue  # streaming fixtures drain checkpoints; covered elsewhere
            df = fn(spark, SF_DIR)
            out[name] = (df.schema, df._jdf.queryExecution().executedPlan().toString())
    finally:
        os.environ.pop("SPARK_GRAFT_NO_MATERIALIZE", None)
    return out


def test_no_cartesian_products(analyzed):
    offenders = [n for n, (_, p) in analyzed.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_no_row_at_a_time_python_udfs(analyzed):
    offenders = [n for n, (_, p) in analyzed.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_oracle_gated_output_columns_are_atomic(analyzed):
    """Driver-contract invariant (CORRECTNESS_r03 multimodal_resize):
    the driver's pandas canonicalizer sorts every output column, and
    any cell type pandas cannot hash (bytearray, list, dict, Row,
    VariantVal) crashes it the way the BINARY resized column did.
    So an oracle-gated query's TOP-LEVEL columns must all be atomic —
    binary as hex(...) strings, arrays exploded or joined, structs
    projected, maps unpivoted. (Currently every gated query complies;
    this pins it.)"""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
    )

    def non_atomic(dt) -> bool:
        return isinstance(
            dt, (ArrayType, BinaryType, MapType, StructType)
        ) or "variant" in dt.simpleString()

    gated = set(all_oracles())
    offenders = {
        n: [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if non_atomic(f.dataType)
        ]
        for n, (schema, _) in analyzed.items()
        if n in gated and any(non_atomic(f.dataType) for f in schema.fields)
    }
    assert not offenders, offenders
