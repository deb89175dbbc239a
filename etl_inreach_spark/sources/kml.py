"""KML feed parsing — the reference's semi-structured input stage
(task.ts:89-112) re-expressed as native Spark XML.

The reference fetches Garmin MapShare KML per share, parses with
xml2js, walks ``kml.Document[0].Folder[0].Placemark[]`` and reads per
placemark: ``Point.coordinates`` (CSV string), ``TimeStamp.when`` and
the ``ExtendedData.Data[]`` name/value pairs (task.ts:98-111).

Here: ``from_xml`` with an explicit schema (Spark 4 native XML — no
UDF, stays in the JVM), then explode + map pivot. Error semantics
match the reference's FEED granularity (SURVEY.md §2.3.7) at BOTH
levels: a feed whose XML fails to parse becomes one NULL row
(PERMISSIVE) and is dropped whole, and a feed containing any
Point-bearing placemark that would throw inside the reference's
per-share closure — missing coordinates, missing/empty ExtendedData,
missing Course or Velocity key (``undefined.replace`` TypeError,
task.ts:119-120), missing TimeStamp, or an unparseable ``when``
(``Invalid Date.toISOString()`` RangeError, task.ts:122-123) — is
dropped whole too; sibling feeds are unaffected (task.ts:165-168).

Date-grammar parity: the reference accepts whatever JS ``new Date()``
accepts (task.ts:122-123). ``js_try_to_timestamp`` matches that
grammar for ISO-8601 plus the common non-ISO shapes JS engines accept
(slash dates, RFC-2822 with/without weekday and zone, US prose dates)
— all parsed in the session timezone, matching a UTC Lambda's
local-time interpretation. Residual divergence: ``new Date()``'s full
grammar is implementation-defined; a shape outside this list is
dropped here but might be kept by some JS engine (pinned by
tests/test_kml_pipeline.py::test_js_date_grammar_parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_inreach_spark.functions.nested import eav_to_map

# Access-path schema, mirroring exactly what the reference reads
# (task.ts:98-111). xml2js wraps every element in an array; in Spark a
# repeated element is an array and a singleton a struct — Folder and
# Placemark are declared arrays because the reference indexes
# Document[0].Folder[0] (first folder only) and iterates Placemark[].
# `_name` is the Data element's name= attribute (attributePrefix "_").
KML_SCHEMA = (
    "struct<Document: struct<Folder: array<struct<"
    "Placemark: array<struct<"
    "TimeStamp: struct<when: string>, "
    "Point: struct<coordinates: string>, "
    "ExtendedData: struct<Data: array<struct<_name: string, value: string>>>"
    ">>>>>>"
)

# ExtendedData keys the reference projects (task.ts:114-141).
EXTENDED_KEYS = (
    "Id",
    "Name",
    "Device Type",
    "IMEI",
    "Incident Id",
    "Valid GPS Fix",
    "Text",
    "Event",
    "Device Identifier",
    "Course",
    "Velocity",
)


def parse_kml(body: Column) -> Column:
    """XML text -> nested KML struct; NULL on malformed input."""
    return F.from_xml(body, KML_SCHEMA)


# Non-ISO shapes JS `new Date()` accepts that Spark's default
# try_to_timestamp grammar does not (task.ts:122-123 parity). Parsed
# in the session timezone — same as a UTC-host JS local-time parse.
JS_EXTRA_TS_PATTERNS = (
    "yyyy/M/d H:m:s",
    "yyyy/M/d H:m",
    "yyyy/M/d",
    "MMM d, yyyy H:m:s",
    "MMM d, yyyy H:m",
    "MMM d, yyyy",
    "MMMM d, yyyy H:m:s",
    "MMMM d, yyyy H:m",
    "MMMM d, yyyy",
    # RFC-2822 without weekday: seconds optional per the RFC, zone
    # name ("GMT"/"UTC") or offset (+0200 / +02:00) optional too. The
    # leading space lives INSIDE each optional section — a space
    # before `[` would be mandatory and reject the zone-less form.
    "d MMM yyyy H:m:s[ zzz][ xx]",
    "d MMM yyyy H:m[ zzz][ xx]",
    "d MMM yyyy",
)

# RFC-2822 *with* weekday is parsed by stripping the "EEE, " prefix
# first (Spark 4's parser rejects the EEE field outright); these are
# the patterns the stripped form retries.
_RFC_NO_WEEKDAY_PATTERNS = (
    "d MMM yyyy H:m:s[ zzz][ xx]",
    "d MMM yyyy H:m[ zzz][ xx]",
)


def js_try_to_timestamp(s: Column) -> Column:
    """``new Date()``-grammar timestamp parse: ISO-8601 first (the
    shape Garmin actually emits — stays the cheap common path), then
    the JS-accepted non-ISO fallbacks, then RFC-2822 with its weekday
    prefix stripped (Spark 4's parser rejects the EEE field outright).
    NULL when nothing matches — the Invalid Date analog. The fallback
    chain is pure codegen scalar expressions; coalesce stops at the
    first hit so well-formed feeds never pay for the long tail."""
    rfc = F.regexp_replace(s, r"^[A-Za-z]{3},\s*", "")
    return F.coalesce(
        F.try_to_timestamp(s),
        *[F.try_to_timestamp(s, F.lit(p)) for p in JS_EXTRA_TS_PATTERNS],
        *[F.try_to_timestamp(rfc, F.lit(p)) for p in _RFC_NO_WEEKDAY_PATTERNS],
    )


def placemark_feed_error(placemarks_arr: Column) -> Column:
    """TRUE when any Point-bearing placemark in the feed's placemark
    array would throw inside the reference's per-share closure and so
    drop the WHOLE feed (task.ts:103-142, isolation task.ts:165-168):

    - ``Point.coordinates`` absent (``undefined.split`` TypeError)
    - ``ExtendedData``/``Data`` absent or empty (``for..of undefined``)
    - no ``Course`` / ``Velocity`` entry (``undefined.replace``)
    - ``TimeStamp.when`` absent, or unparseable as a timestamp
      (``Invalid Date.toISOString()`` RangeError; judged here by
      Spark's grammar — see module docstring)

    Point-LESS placemarks are skipped before any of those reads
    (task.ts:104 ``continue``), so they can never poison a feed.
    Pure column expressions over the nested array (exists/HOF) — no
    UDF; runs pre-explode so the verdict is per-feed by construction.
    """

    def throws(p: Column) -> Column:
        data = p["ExtendedData"]["Data"]

        def has_key(k: str) -> Column:
            return F.coalesce(
                F.exists(data, lambda d: d["_name"] == F.lit(k)), F.lit(False)
            )

        when_s = p["TimeStamp"]["when"]
        return p["Point"].isNotNull() & (
            p["Point"]["coordinates"].isNull()
            | data.isNull()
            | ~has_key("Course")
            | ~has_key("Velocity")
            | when_s.isNull()
            | js_try_to_timestamp(when_s).isNull()
        )

    return F.coalesce(F.exists(placemarks_arr, throws), F.lit(False))


def kml_to_placemarks(
    feeds: DataFrame,
    body_col: str = "body",
    keep_cols: tuple[str, ...] = ("share_id",),
) -> DataFrame:
    """(share_id, body) -> one row per placemark.

    Output: keep_cols + arrival_idx (document order within the feed —
    required for the dedup tie-break, SURVEY.md §2.3.1),
    point_coordinates, timestamp_when, extended map.

    Pipeline (all narrow, fused by whole-stage codegen):
      empty-body short-circuit (O7, task.ts:95)
      -> from_xml (O8); malformed feed -> NULL -> dropped whole (O19)
      -> Document missing -> dropped (task.ts:98 throw-per-feed)
      -> feed-granular placemark validation (placemark_feed_error):
         any Point-bearing placemark that would throw in the
         reference's closure drops its WHOLE feed (SURVEY.md §2.3.7)
      -> first Folder, explode Placemark with position (O9)
      -> EAV pivot of ExtendedData (O12)
    The null-Point filter (O10) is NOT applied here — it belongs to the
    feature projection so callers can observe raw placemarks.

    Feed dropping is rendered as a NULL placemark array under
    ``posexplode`` (zero rows) rather than Filter nodes, and the parsed
    struct is BOUND TO A LAMBDA VARIABLE via a one-element transform():
    predicate pushdown substitutes a filtered alias's definition into
    each Filter, and CollapseProject inlines multiply-referenced
    aliases, so the round-2 plan re-evaluated ``from_xml`` 3x (and a
    naive no-filter rewrite 7x) per document — the
    kml_pipeline_roundtrip regression. A lambda variable is evaluated
    exactly once per element and no Catalyst rule can substitute
    through it, so every document is parsed ONCE, the plan stays
    narrow (no window/shuffle), and the same code serves the streaming
    pipeline where a per-feed window verdict would be unsupported.
    Pinned by tests/test_kml_pipeline.py::test_single_xml_parse_in_plan.
    """
    nonempty = feeds.filter(F.trim(F.col(body_col)) != "")

    def validated_placemarks(kml: Column) -> Column:
        # first folder only (Document[0].Folder[0], task.ts:101);
        # missing Folder -> NULL array -> no feed error, no rows
        pm_arr = F.try_element_at(kml["Document"]["Folder"], F.lit(1))["Placemark"]
        return F.when(
            kml["Document"].isNotNull() & ~placemark_feed_error(pm_arr), pm_arr
        )

    staged = nonempty.select(
        *[F.col(c) for c in keep_cols],
        F.element_at(
            F.transform(F.array(parse_kml(F.col(body_col))), validated_placemarks),
            1,
        ).alias("_pms"),
    )
    # OUTER explode + post-filter, not plain posexplode: for the
    # non-outer form InferFiltersFromGenerate infers `size(_pms) > 0`
    # and pushes it through the projection, re-parsing the XML inside
    # the Filter. The outer generate admits no such inference; the
    # null-row filter below reads only GENERATED columns, so it cannot
    # be pushed past the parse.
    placemarks = staged.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode_outer(F.col("_pms")).alias("arrival_idx", "_pm"),
    ).filter(F.col("arrival_idx").isNotNull())
    return placemarks.select(
        *[F.col(c) for c in keep_cols],
        F.col("arrival_idx").cast("long").alias("arrival_idx"),
        F.col("_pm.Point.coordinates").alias("point_coordinates"),
        F.col("_pm.TimeStamp.when").alias("timestamp_when"),
        eav_to_map(F.col("_pm.ExtendedData.Data"), "_name", "value").alias("extended"),
    )


def build_kml(placemarks: Column) -> Column:
    """Inverse of parse: render an array of placemark structs
    (point_coordinates, timestamp_when, extended entries array) into a
    KML document string. Used by fixtures and the roundtrip oracle —
    built-in string/array expressions only."""
    pm_xml = F.transform(
        placemarks,
        lambda p: F.concat(
            F.lit("<Placemark>"),
            # NULL-safe: concat null-propagates, so an unguarded NULL
            # `when` would silently erase the ENTIRE placemark
            F.when(
                p["timestamp_when"].isNotNull(),
                F.concat(
                    F.lit("<TimeStamp><when>"),
                    p["timestamp_when"],
                    F.lit("</when></TimeStamp>"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                p["point_coordinates"].isNotNull(),
                F.concat(
                    F.lit("<Point><coordinates>"),
                    p["point_coordinates"],
                    F.lit("</coordinates></Point>"),
                ),
            ).otherwise(F.lit("")),
            F.lit("<ExtendedData>"),
            F.array_join(
                F.transform(
                    p["entries"],
                    lambda e: F.concat(
                        F.lit('<Data name="'),
                        e["name"],
                        F.lit('"><value>'),
                        e["value"],
                        F.lit("</value></Data>"),
                    ),
                ),
                "",
            ),
            F.lit("</ExtendedData></Placemark>"),
        ),
    )
    return F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder>'),
        F.array_join(pm_xml, ""),
        F.lit("</Folder></Document></kml>"),
    )
