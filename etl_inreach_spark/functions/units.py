"""Unit and timestamp normalization (SURVEY.md §2.1 O15/O16)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# O15 (task.ts:120): the reference multiplies by the literal 0.277778,
# NOT by 1000/3600 — the ~1e-7 difference matters for value-hash parity
# (SURVEY.md §2.3.3).
KMH_TO_MS = 0.277778

# ISO-8601 with MILLISECONDS — exactly Date.toISOString()'s shape
# (reference task.ts:122-123,142 emits 3 fractional digits).
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def kmh_to_ms(speed_kmh: Column) -> Column:
    return speed_kmh * F.lit(KMH_TO_MS)


def to_iso8601(ts: Column) -> Column:
    """O16 — render a timestamp as ISO-8601 (UTC, millisecond)."""
    return F.date_format(ts, ISO_FMT)


def parse_iso8601(s: Column) -> Column:
    """O16 — parse ISO-8601; NULL (not job failure) on malformed."""
    return F.try_to_timestamp(s, F.lit(ISO_FMT))
