"""The full inReach pipeline — the reference's control() body
(task.ts:60-183) as one declarative DataFrame plan.

Stages (all one logical plan; Catalyst fuses the narrow parts):
  shares config normalize (O1-O4)
  -> KML parse/explode (O7-O9, sources/kml.py)
  -> per-placemark feature projection (O10-O17)
  -> per-device latest-position dedup (O18)
  -> flat silver feature table (FIXTURES.md §4)
The GeoJSON FeatureCollection nesting is applied only at the sink
(sinks/geojson.py), keeping the analytic table flat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_inreach_spark.functions.nested import coord, map_get, split_coordinates
from etl_inreach_spark.functions.strings import (
    default_fill,
    normalize_share_id,
    share_link_url,
    strip_unit_to_double,
    surrogate_key,
)
from etl_inreach_spark.functions.units import kmh_to_ms
from etl_inreach_spark.operators.dedup import latest_by_key
from etl_inreach_spark.operators.relational import broadcast_dim_join


def normalize_shares(shares: DataFrame) -> DataFrame:
    """O1-O4: config scan + share-id normalize + callsign default.

    Input schema (FIXTURES.md §1): share_id, callsign?, password?.
    """
    share = normalize_share_id(F.col("share_id"))
    return shares.select(
        share.alias("share_id"),
        default_fill(F.col("callsign"), share).alias("callsign"),
        F.col("password"),
    )


def _ts(col: Column) -> Column:
    """KML `when` string -> timestamp; NULL-safe (invalid date analog,
    SURVEY.md §2.3.6). Same ``new Date()``-grammar parser as the
    feed-error verdict (sources/kml.js_try_to_timestamp) — a feed KEPT
    by the error check must never yield NULL times here."""
    from etl_inreach_spark.sources.kml import js_try_to_timestamp

    return js_try_to_timestamp(col)


def placemarks_to_features(placemarks: DataFrame, shares: DataFrame) -> DataFrame:
    """O10-O17: placemark rows -> flat feature rows (FIXTURES.md §4).

    ``shares`` (normalized) is broadcast-joined on share_id — the
    idiomatic rendering of the reference's closure capture
    (task.ts:68,121,128). Null-Point rows are dropped (O10,
    task.ts:103).
    """
    with_cfg = broadcast_dim_join(
        placemarks.filter(F.col("point_coordinates").isNotNull()),
        shares.drop("password"),
        on=["share_id"],
        how="left",
    )
    ext = F.col("extended")
    coords = split_coordinates(F.col("point_coordinates"))
    t = _ts(F.col("timestamp_when"))
    return with_cfg.select(
        F.col("share_id"),
        F.col("arrival_idx"),
        surrogate_key(map_get(ext, "IMEI")).alias("id"),
        F.col("callsign"),
        strip_unit_to_double(map_get(ext, "Course")).alias("course"),
        kmh_to_ms(strip_unit_to_double(map_get(ext, "Velocity"))).alias("speed"),
        t.alias("time"),
        t.alias("start"),
        share_link_url(F.col("share_id")).alias("link_url"),
        map_get(ext, "Id").alias("inreach_id"),
        map_get(ext, "Name").alias("inreach_name"),
        map_get(ext, "Device Type").alias("inreach_device_type"),
        map_get(ext, "IMEI").alias("inreach_imei"),
        map_get(ext, "Incident Id").alias("inreach_incident_id"),
        map_get(ext, "Valid GPS Fix").alias("inreach_valid_fix"),
        map_get(ext, "Text").alias("inreach_text"),
        map_get(ext, "Event").alias("inreach_event"),
        map_get(ext, "Device Identifier").alias("inreach_device_id"),
        t.alias("inreach_receive"),
        coord(coords, 1).alias("lon"),
        coord(coords, 2).alias("lat"),
        coord(coords, 3).alias("alt"),
        # component count of the raw coordinate CSV: the GeoJSON sink
        # needs it to tell 'no third component' (2-element geometry)
        # from 'third component unparseable' ([lon, lat, null] — the
        # reference parseFloat-maps every component, task.ts:105-107)
        F.size(coords).cast("int").alias("n_coords"),
    )


def dedup_features(features: DataFrame) -> DataFrame:
    """O18: one feature per device id PER SHARE — latest time,
    first-seen wins on ties, NULL time counts as epoch 0
    (task.ts:151-159). The reference's dedup map lives inside the
    per-share closure (task.ts:92), so the same device appearing in
    two configured shares emits one feature per share; keying on
    share_id also keeps the arrival_idx tie-break well-defined
    (arrival order restarts per feed)."""
    return latest_by_key(
        features, ["share_id", "id"], "time", arrival_col="arrival_idx"
    )


def inreach_pipeline(shares: DataFrame, feeds: DataFrame) -> DataFrame:
    """shares config + raw (share_id, body) feeds -> deduped flat
    feature table. End-to-end analog of control() (task.ts:60-183)."""
    from etl_inreach_spark.sources.kml import kml_to_placemarks

    cfg = normalize_shares(shares)
    placemarks = kml_to_placemarks(feeds)
    features = placemarks_to_features(placemarks, cfg)
    return dedup_features(features).drop("arrival_idx")
