"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) at
sf0.001.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 plus the training-data pipeline operators; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each (same column names — the driver
hashes values after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_webhook_gateway_spark.workloads import all_entries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from duckdb_webhook_gateway_spark.workloads.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §beyond)."""
    return {name: fn for name, (fn, _sql) in all_entries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (omitted for entries with
    no SQL-expressible oracle; the driver then does a rows-only check)."""
    return {
        name: sql for name, (_fn, sql) in all_entries().items() if sql is not None
    }
