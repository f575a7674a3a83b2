"""Headline workloads: the SQL operator surface of SURVEY.md §2B plus the
large-scale training-data operators, each paired with a DuckDB oracle.

Every entry is ``name -> (spark_fn, oracle_sql_or_None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and the oracle is ANSI SQL DuckDB
can run over the same parquet tables.  Column names/aliases match exactly
between the two — the driver's comparator sorts columns by name before
hashing values.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, Optional[str]]

from . import analytics, datapipe  # noqa: E402


def all_entries() -> dict[str, Entry]:
    entries: dict[str, Entry] = {}
    entries.update(analytics.ENTRIES)
    entries.update(datapipe.ENTRIES)
    return entries
