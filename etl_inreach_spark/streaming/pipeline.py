"""Structured Streaming rendering of the inReach pipeline.

The reference runs as a SCHEDULED batch: one Lambda invocation per
tick, each pulling a 30-minute lookback window and deduping within the
batch only (reference task.ts:32,80-82,92 — the dedup map is rebuilt
per run, so re-fetched overlap is re-submitted). The streaming analog:

  readStream (poll feed)                 <- Schedule invocation
  -> same narrow KML parse + projection  <- control() body
  -> withWatermark('time', lookback)     <- the d1 lookback param
  -> dropDuplicatesWithinWatermark(id)   <- STRONGER than reference:
                                            cross-batch exactly-once
                                            per device in-watermark
  -> foreachBatch(POST FeatureCollection) <- this.submit(fc)

Per SURVEY.md §2.2 (streaming rows), cross-batch dedup deliberately
STRENGTHENS the reference semantics, so it lives here, separate from
the batch operators the oracle gate checks. Batch latest-per-key
(argmax) is not streamable as a window function; the streaming dedup
keeps the FIRST in-watermark row per device, which for a
monotonically-arriving position feed is the same device set with
at-most-once emission per watermark period.

Every transform below is the SAME code path the batch plan uses
(plans/inreach.py) — narrow projections work identically on streaming
DataFrames; only the dedup and sink stages differ.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from etl_inreach_spark.plans.inreach import normalize_shares, placemarks_to_features
from etl_inreach_spark.sources.kml import kml_to_placemarks


def stream_features(
    feeds: DataFrame,
    shares: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming (share_id, body) micro-batches -> deduped feature
    stream.

    ``feeds`` must be a streaming DataFrame with at least
    (share_id string, body string). ``shares`` is the static config
    table (broadcast into every micro-batch — the closure capture of
    the reference, task.ts:68). Null/unparseable event times cannot
    participate in watermarking and are dropped here (the batch path
    keeps them as epoch-0; SURVEY.md §2.3.2 — documented divergence).
    """
    cfg = normalize_shares(shares)
    placemarks = kml_to_placemarks(feeds)
    features = placemarks_to_features(placemarks, cfg)
    return (
        features.filter(F.col("time").isNotNull())
        .withWatermark("time", watermark)
        .dropDuplicatesWithinWatermark(["id"])
    )


def write_feature_collections(
    features: DataFrame,
    post: Callable[[list[str]], None],
    checkpoint_dir: str,
    batch_size: int = 1000,
) -> DataStreamWriter:
    """foreachBatch sink: each micro-batch is rendered to GeoJSON
    Feature lines and handed to ``post`` in FeatureCollection chunks of
    ``batch_size`` — one POST per chunk per partition (the reference
    POSTs once per run, task.ts:172-182; per-partition chunking is the
    scale-safe equivalent)."""
    from etl_inreach_spark.sinks.geojson import features_to_json

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        json_df = features_to_json(batch_df)

        def handle_partition(rows) -> None:
            chunk: list[str] = []
            for row in rows:
                chunk.append(row["feature_json"])
                if len(chunk) >= batch_size:
                    post(chunk)
                    chunk = []
            if chunk:
                post(chunk)

        json_df.foreachPartition(handle_partition)

    return (
        features.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle_batch)
    )


def run_once(writer: DataStreamWriter) -> StreamingQuery:
    """Process all available input then stop — the scheduled-invocation
    trigger analog (one Lambda run == one availableNow drain)."""
    return writer.trigger(availableNow=True).start()
