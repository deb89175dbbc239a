"""Query registry: every implemented operator exposed as a named query
over the driver's test tables, paired with an ANSI-SQL DuckDB oracle.

Contract (see /root/repo/__spark_entry__.py): each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL must produce
the same row count, schema (column names) and order-insensitive values
on the same parquet tables.

Float discipline (oracle parity): aggregate sums go through
DECIMAL so they are exact and order-insensitive in BOTH engines, then
cast back to DOUBLE; see SURVEY.md §7 "hard parts" #4.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # unconditional: a broken query module must fail LOUDLY, not
    # silently shrink the correctness surface the driver checks
    from etl_inreach_spark import (  # noqa: F401
        queries_extended,
        queries_kml,
        queries_pipeline,
        queries_reference,
        queries_relational,
        queries_training,
    )

    _LOADED = True
