"""File-format coverage (SURVEY.md §2.2 scans/sources row): the silver
feature table round-trips losslessly through CSV and JSON with explicit
schemas — no inference jobs, scan-ready at scale."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_inreach_spark.plans.inreach import inreach_pipeline
from tests.test_kml_pipeline import GOOD_FEED


def _features(spark):
    shares = spark.createDataFrame(
        [Row(share_id="AAA", callsign="ALPHA", password=None)],
        "share_id string, callsign string, password string",
    )
    feeds = spark.createDataFrame([Row(share_id="AAA", body=GOOD_FEED)])
    return inreach_pipeline(shares, feeds)


def _key_rows(df):
    return sorted(
        (r["id"], r["callsign"], r["lon"], r["lat"], str(r["time"]))
        for r in df.collect()
    )


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    out = _features(spark)
    dest = str(tmp_path / "csv")
    # timestampFormat pins the wire format; header off + explicit read
    # schema means NO inference pass over the data
    (
        out.write.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .mode("overwrite")
        .csv(dest)
    )
    back = (
        spark.read.schema(out.schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(dest)
    )
    assert _key_rows(back) == _key_rows(out)


def test_json_lines_roundtrip_with_explicit_schema(spark, tmp_path):
    out = _features(spark)
    dest = str(tmp_path / "jsonl")
    out.write.mode("overwrite").json(dest)
    back = spark.read.schema(out.schema).json(dest)
    assert _key_rows(back) == _key_rows(out)
    # spot-check one JSON line is plain JSONL (one object per line)
    import glob
    import json as _json

    part = glob.glob(f"{dest}/part-*.json")[0]
    first = open(part).readline()
    obj = _json.loads(first)
    assert obj["id"].startswith("inreach-")


def test_orc_roundtrip(spark, tmp_path):
    """ORC source/sink (gap-table scans/sinks row): columnar format
    with predicate pushdown, same write->read->value contract as
    parquet."""
    out = _features(spark)
    dest = str(tmp_path / "orc")
    out.write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    assert back.schema == out.schema
    assert _key_rows(back) == _key_rows(out)
    # pushdown reaches the ORC scan
    plan = back.filter(back["id"] == "inreach-1")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "inreach-1" in plan
