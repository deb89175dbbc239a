"""Corrupt-input isolation on file scans: at 100 TB a scan touches
millions of objects and a few WILL be truncated/corrupt; the engine
contract is the same feed-granular isolation the KML source gives
(SURVEY O19) — skip and count the bad unit, never kill the job. Spark
ships this as ``spark.sql.files.ignoreCorruptFiles``; these tests pin
both sides of the contract so a conf regression is caught."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_inreach_spark.catalog import load_table


@pytest.fixture()
def corrupted_dir(spark, sf_dir, tmp_path):
    p = str(tmp_path / "data")
    load_table(spark, sf_dir, "orders").select("o_orderkey").repartition(
        8
    ).write.parquet(p)
    files = sorted(glob.glob(p + "/*.parquet"))
    good_rows = spark.read.parquet(p).count()
    # truncate one file mid-body: footer gone -> unreadable
    victim = files[3]
    keep = os.path.getsize(victim) // 2
    with open(victim, "r+b") as fh:
        fh.truncate(keep)
    return p, good_rows


def _restore(spark, key, prev):
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_corrupt_file_fails_scan_by_default(spark, corrupted_dir):
    p, _ = corrupted_dir
    key = "spark.sql.files.ignoreCorruptFiles"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        with pytest.raises(Exception):
            spark.read.parquet(p).count()
    finally:
        _restore(spark, key, prev)


def test_ignore_corrupt_files_isolates_and_keeps_the_rest(spark, corrupted_dir):
    p, good_rows = corrupted_dir
    key = "spark.sql.files.ignoreCorruptFiles"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "true")
        got = spark.read.parquet(p).count()
        # the other 7 files' rows all arrive; the corrupt file's are
        # skipped (strictly fewer than the original total)
        assert 0 < got < good_rows
        # and the skipped unit is identifiable for observability: the
        # readable files account for exactly `got` rows
        per_file = (
            spark.read.parquet(p)
            .groupBy(F.col("_metadata.file_name").alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert sum(r["n"] for r in per_file) == got
        assert len(per_file) == 7
    finally:
        _restore(spark, key, prev)
