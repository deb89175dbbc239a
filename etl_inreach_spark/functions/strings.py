"""String transforms observed in the reference (SURVEY.md §2.1).

All pure Column expressions — whole-stage-codegen friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference operator O2 (task.ts:70-74): a ShareId may arrive as a bare
# id, as "https://<host>/<id>", or as "share.garmin.com/<id>".
GARMIN_SHARE_BASE = "https://share.garmin.com/"


def normalize_share_id(share_id: Column) -> Column:
    """O2 — strip URL prefixes down to the bare share key.

    Two distinct branches, mirroring task.ts:71-74 exactly:

    - ``https://...`` -> ``new URL(s).pathname`` minus one leading
      ``/``: host, query string AND fragment are all stripped (URL
      pathname never contains ``?query`` / ``#fragment``).
    - ``share.garmin.com/...`` -> only that literal prefix is removed
      (plain ``String.replace``, no URL parse) — a query/fragment
      SURVIVES in this branch.
    - anything else passes through unchanged.
    """
    pathname = F.regexp_replace(
        F.regexp_replace(share_id, r"^https://[^/?#]*", ""), r"[?#].*$", ""
    )
    return F.when(
        share_id.startswith("https://"), F.regexp_replace(pathname, r"^/", "")
    ).otherwise(F.regexp_replace(share_id, r"^share\.garmin\.com/", ""))


def default_fill(primary: Column, fallback: Column) -> Column:
    """O3 (task.ts:75) — CallSign defaults to ShareId when absent.

    The reference tests JS falsiness (`if (!share.CallSign)`), so an
    EMPTY STRING falls back too, not just NULL."""
    return F.when(
        primary.isNull() | (primary == F.lit("")), fallback
    ).otherwise(primary)


def share_feed_url(share_id: Column) -> Column:
    """O4 (task.ts:78) — per-share feed URL."""
    return F.concat(F.lit(GARMIN_SHARE_BASE + "Feed/Share/"), share_id)


def share_link_url(share_id: Column) -> Column:
    """Feature link URL (task.ts:128)."""
    return F.concat(F.lit(GARMIN_SHARE_BASE), share_id)


def surrogate_key(imei: Column, prefix: str = "inreach-") -> Column:
    """O13 (task.ts:114) — device-identity surrogate key.

    IMEI, not message Id (reference CHANGELOG.md:122-124, v3.7.3).
    A missing IMEI yields the literal key 'inreach-undefined' (JS
    string concat with undefined, task.ts:114) — NOT NULL, which would
    both vanish from the GeoJSON id field and collapse with every
    other NULL under a dedup key."""
    return F.concat(F.lit(prefix), F.coalesce(imei, F.lit("undefined")))


def strip_unit(value: Column) -> Column:
    """O14 (task.ts:119-120, ``.replace(/\\s.*/, '')``) — drop
    everything from the first whitespace: '"123.0 ° True"' ->
    '"123.0"'. Rendered as ``regexp_extract('^\\S*')`` — the leading
    non-whitespace run — because the anchored extract scans once and
    copies only the keep-side, measured 1.58 -> 1.19 s on the 600k-row
    sf0.1 strip query (min-of-6; replace must also build the
    replacement string, and split(\\s, 2) was slower still at 2.0 s).

    Equivalence scope: identical to ``regexp_replace('\\s.*$', '')``
    for every input WITHOUT line terminators (incl. NULL, empty, and
    leading-whitespace strings). On embedded newlines the variants
    diverge three ways ('a b\\nc': extract -> 'a', replace-$ -> 'a b',
    the JS reference /\\s.*/ -> 'a\\nc'); the feed's coordinate/speed/
    course strings are single-line, so the divergence is unreachable
    on real data and the faster extract is kept."""
    return F.regexp_extract(value, r"^\S*", 0)


def strip_unit_to_double(value: Column) -> Column:
    """O14 + cast, with the reference's ``Number()`` semantics
    (task.ts:119-120): ``Number('') === 0``, so a value that is empty —
    or whitespace-only, which the unit strip reduces to empty — casts
    to 0.0, NOT NULL (SURVEY.md §2.3.5). Other unparseable values ->
    NULL via try_cast (the NaN analog; ANSI-safe), and NULL in -> NULL
    out (missing key, §2.3.6)."""
    stripped = strip_unit(value)
    return F.when(stripped == F.lit(""), F.lit(0.0)).otherwise(
        stripped.try_cast("double")
    )
