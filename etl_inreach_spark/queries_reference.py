"""Queries covering the reference's observed operator surface
(SURVEY.md §2.1, O1-O21), phrased over the driver's tables per the
FIXTURES.md §5 mapping.

Each docstring cites the reference operator it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_inreach_spark.catalog import load_table
from etl_inreach_spark.operators.dedup import latest_by_key
from etl_inreach_spark.queries import query
from etl_inreach_spark.session import tune


@query(
    "latest_per_key",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT e.*,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY coalesce(ts, TIMESTAMP '1970-01-01 00:00:00') DESC,
                            event_id ASC
               ) AS rn
        FROM events e
    )
    WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — the reference's core computation: latest position
    report per device (keyed argmax dedup, task.ts:92,151-159), with
    the strict-``>`` first-seen tie-break (task.ts:154) and null-time-
    as-epoch-0 semantics.

    events.user_id plays the device id, ts the report time, event_id
    the arrival order. Rendered as a max_by hash aggregation (partial
    agg => shuffle carries ~|keys| rows; see operators/dedup.py).
    """
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    out = latest_by_key(ev, ["user_id"], "ts", arrival_col="event_id")
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")
