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


def test_no_binary_columns_in_oracle_gated_output(analyzed):
    """Driver-contract invariant (CORRECTNESS_r03 multimodal_resize):
    the driver's pandas canonicalizer crashes sorting bytearray cells,
    so an oracle-gated query must never output a BINARY column — emit
    hex(...) strings instead. Nested binary (struct/array/map fields)
    is equally fatal, so the whole type tree is scanned."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    def has_binary(dt) -> bool:
        if isinstance(dt, BinaryType):
            return True
        if isinstance(dt, StructType):
            return any(has_binary(f.dataType) for f in dt.fields)
        if isinstance(dt, ArrayType):
            return has_binary(dt.elementType)
        if isinstance(dt, MapType):
            return has_binary(dt.keyType) or has_binary(dt.valueType)
        return False

    gated = set(all_oracles())
    offenders = {
        n: [f.name for f in schema.fields if has_binary(f.dataType)]
        for n, (schema, _) in analyzed.items()
        if n in gated and any(has_binary(f.dataType) for f in schema.fields)
    }
    assert not offenders, offenders
