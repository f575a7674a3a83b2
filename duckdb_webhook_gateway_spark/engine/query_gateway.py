"""Ad-hoc analytics gateway (the reference's ``/query`` endpoint).

Arbitrary read-only SQL over the whole event store
(reference: src/app.py:955-991): write-keyword denylist (971-973), rows
returned as list-of-lists with datetimes ISO-formatted (978-986).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import SparkSession

from ..functions import rewrite_dialect
from ..plans.guard import is_read_only_sql


class ReadOnlyViolation(PermissionError):
    """Reference returns HTTP 400 for denylisted queries (src/app.py:971-973)."""


def _cell(value: Any) -> Any:
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    return value


def run_adhoc_query(
    spark: SparkSession, query: str, params: dict[str, Any] | None = None
) -> dict[str, Any]:
    """Execute read-only SQL; serialize rows as list-of-lists with ISO
    datetimes (reference: src/app.py:975-991).

    ``params`` supports named parameter binding — ``:name`` markers in the
    SQL (the reference bound DuckDB ``?``/``$n`` params,
    src/app.py:200-239; Spark 4 named parameters are the idiomatic
    equivalent and injection-safe, unlike string interpolation).
    """
    if not is_read_only_sql(query):
        raise ReadOnlyViolation(
            "Write operations are not allowed through the query endpoint"
        )
    df = spark.sql(rewrite_dialect(query), args=params or {})
    columns = df.columns
    result = [[_cell(v) for v in row] for row in df.collect()]
    return {"status": "success", "columns": columns, "result": result}
