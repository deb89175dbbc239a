"""KML feed DataSource tests — file:// transport, no live network."""

from __future__ import annotations

import json

import pytest

from etl_inreach_spark.sources.http_kml import KMLFeedDataSource, build_feed_url
from tests.test_kml_pipeline import GOOD_FEED


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("feeds")
    (d / "AAA").write_text(GOOD_FEED)
    return d


def test_reads_one_partition_per_share_with_error_isolation(spark, feed_dir):
    spark.dataSource.register(KMLFeedDataSource)
    shares = [{"share_id": "AAA"}, {"share_id": "MISSING"}]
    df = (
        spark.read.format("kml_feed")
        .option("shares", json.dumps(shares))
        .option("base_url", f"file://{feed_dir}/")
        .option("lookback_minutes", "0")  # no d1 on file URLs
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per share
    rows = {r["share_id"]: r for r in df.collect()}
    assert rows["AAA"]["body"] == GOOD_FEED and rows["AAA"]["error"] is None
    # missing feed -> error row, job still succeeds (task.ts:165-168)
    assert rows["MISSING"]["body"] is None and rows["MISSING"]["error"]


def test_source_feeds_the_pipeline(spark, feed_dir):
    from pyspark.sql import Row

    from etl_inreach_spark.plans.inreach import inreach_pipeline

    spark.dataSource.register(KMLFeedDataSource)
    feeds = (
        spark.read.format("kml_feed")
        .option("shares", json.dumps([{"share_id": "AAA"}]))
        .option("base_url", f"file://{feed_dir}/")
        .option("lookback_minutes", "0")
        .load()
        .filter("error IS NULL")
        .select("share_id", "body")
    )
    shares = spark.createDataFrame(
        [Row(share_id="AAA", callsign="ALPHA", password=None)],
        "share_id string, callsign string, password string",
    )
    ids = sorted(r["id"] for r in inreach_pipeline(shares, feeds).collect())
    assert ids == ["inreach-111", "inreach-222"]


def test_d1_lookback_is_pushed_into_url():
    # percent-encoded: '+' in a query string decodes as a space
    url = build_feed_url("https://share.garmin.com/Feed/Share/", "XYZ", "2024-01-01T00:00:00.000Z")
    assert url == "https://share.garmin.com/Feed/Share/XYZ?d1=2024-01-01T00%3A00%3A00.000Z"
    assert build_feed_url("https://h/f/", "XYZ", None) == "https://h/f/XYZ"


def test_d1_is_millisecond_z_format():
    from datetime import datetime, timezone

    from etl_inreach_spark.sources.http_kml import _utc_iso_ms

    s = _utc_iso_ms(datetime(2024, 1, 2, 3, 4, 5, 678901, tzinfo=timezone.utc))
    assert s == "2024-01-02T03:04:05.678Z"  # Date.toISOString() shape


def test_streaming_poll_source(spark, feed_dir, tmp_path_factory):
    """readStream over the feed source: one poll round per micro-batch
    (scheduled-invocation analog), error isolation preserved."""
    spark.dataSource.register(KMLFeedDataSource)
    shares = [{"share_id": "AAA"}, {"share_id": "MISSING"}]
    stream = (
        spark.readStream.format("kml_feed")
        .option("shares", json.dumps(shares))
        .option("base_url", f"file://{feed_dir}/")
        .option("lookback_minutes", "0")
        .load()
    )
    ckpt = tmp_path_factory.mktemp("ckpt_stream_src")
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_stream")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["share_id"]: r for r in spark.sql("SELECT * FROM feed_stream").collect()}
    assert rows["AAA"]["body"] == GOOD_FEED and rows["AAA"]["error"] is None
    assert rows["MISSING"]["body"] is None and rows["MISSING"]["error"]


def test_feed_observation_metrics(spark, feed_dir):
    from etl_inreach_spark.observability import observe_feed_metrics

    spark.dataSource.register(KMLFeedDataSource)
    shares = [{"share_id": "AAA"}, {"share_id": "MISSING"}]
    feeds = (
        spark.read.format("kml_feed")
        .option("shares", json.dumps(shares))
        .option("base_url", f"file://{feed_dir}/")
        .option("lookback_minutes", "0")
        .load()
    )
    observed, obs = observe_feed_metrics(feeds)
    observed.write.format("noop").mode("overwrite").save()  # one action
    m = obs.get
    assert m["n_feeds"] == 2 and m["n_errors"] == 1 and m["n_empty_bodies"] == 0
