"""Edge-case pins for the string/unit/nested function library
(the SURVEY.md §2.3 oracle traps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_inreach_spark.functions.nested import coord, eav_to_map, map_get, split_coordinates
from etl_inreach_spark.functions.strings import (
    normalize_share_id,
    strip_unit_to_double,
    surrogate_key,
)
from etl_inreach_spark.functions.units import KMH_TO_MS, kmh_to_ms


def one(spark, col, **data):
    cols = [F.lit(v).alias(k) for k, v in data.items()]
    return spark.range(1).select(*cols).select(col.alias("out")).collect()[0]["out"]


def test_normalize_share_id_variants(spark):
    cases = {
        "https://share.garmin.com/abc": "abc",
        "https://example.com/abc": "abc",
        "share.garmin.com/abc": "abc",
        "abc": "abc",
        # https branch is URL.pathname: query/fragment stripped
        # (task.ts:71); host-only URL -> '' (pathname '/')
        "https://share.garmin.com/abc?d1=2024-01-01#frag": "abc",
        "https://example.com/a/b?x=1": "a/b",
        "https://example.com": "",
        # garmin branch is a plain String.replace: query SURVIVES
        # (task.ts:73)
        "share.garmin.com/abc?x=1": "abc?x=1",
        # startsWith match but no trailing slash: replace is a no-op
        "share.garmin.com": "share.garmin.com",
    }
    for raw, want in cases.items():
        assert one(spark, normalize_share_id(F.col("s")), s=raw) == want


def test_strip_unit_variants(spark):
    # from the first whitespace (task.ts:119-120)
    assert one(spark, strip_unit_to_double(F.col("s")), s="45.5 ° True") == 45.5
    assert one(spark, strip_unit_to_double(F.col("s")), s="12.0 km/h") == 12.0
    # no unit at all
    assert one(spark, strip_unit_to_double(F.col("s")), s="7.25") == 7.25
    # empty (or whitespace-only) -> 0.0: JS Number('') === 0
    # (task.ts:119-120, SURVEY.md §2.3.5)
    assert one(spark, strip_unit_to_double(F.col("s")), s="") == 0.0
    assert one(spark, strip_unit_to_double(F.col("s")), s="  ") == 0.0
    # junk -> NULL (NaN analog), never an ANSI error
    assert one(spark, strip_unit_to_double(F.col("s")), s="N/A knots") is None
    # NULL in (missing key, §2.3.6) -> NULL out
    assert (
        one(spark, strip_unit_to_double(F.lit(None).cast("string"))) is None
    )


def test_kmh_constant_is_reference_exact(spark):
    # 0.277778, NOT 1/3.6 (task.ts:120, SURVEY.md §2.3.3)
    assert KMH_TO_MS == 0.277778
    assert one(spark, kmh_to_ms(F.col("v")), v=100.0) == 100.0 * 0.277778


def test_split_coordinates_with_and_without_alt(spark):
    c3 = one(spark, split_coordinates(F.col("s")), s="-105.1,39.7,1650.0")
    assert c3 == [-105.1, 39.7, 1650.0]
    arr = split_coordinates(F.col("s"))
    assert one(spark, coord(arr, 3), s="-105.1,39.7") is None
    # malformed component -> NULL element, row survives
    assert one(spark, coord(arr, 1), s="oops,39.7") is None


def test_eav_pivot_missing_key_is_null(spark):
    entries = F.array(
        F.struct(F.lit("IMEI").alias("name"), F.lit("123").alias("value")),
        F.struct(F.lit("Course").alias("name"), F.lit("10.0 °").alias("value")),
    )
    m = eav_to_map(entries)
    assert one(spark, map_get(m, "IMEI")) == "123"
    assert one(spark, map_get(m, "Text")) is None
    assert one(spark, surrogate_key(map_get(m, "IMEI"))) == "inreach-123"
