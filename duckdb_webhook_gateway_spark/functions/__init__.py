"""SQL dialect shims + deterministic hashing primitives.

The reference exposes DuckDB's SQL dialect to users; the two observable
dialect deltas (SURVEY §4.2) are handled here:

- ``json_extract(col, path)`` (DuckDB,
  frontend/src/pages/SqlQuery.tsx:38) vs Spark's ``get_json_object`` —
  solved twice: a SQL-text rewrite (zero-cost, keeps the query JVM-side)
  plus a registered backstop UDF for queries that bypass the rewrite.
- ``sqlite_master`` catalog introspection (tests/test_db_manager.py:24-26)
  is shimmed in the query gateway: queries touching it get a just-in-time
  temp view over the engine catalog (engine/query_gateway.py).
"""

from __future__ import annotations

import json as _json
import re
from typing import Any, Optional, Union

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_JSON_EXTRACT_RE = re.compile(r"\bjson_extract(_string)?\s*\(", re.IGNORECASE)


def epoch_us(col: Union[str, Column]) -> Column:
    """Exact integer epoch microseconds, NTZ-safe (== DuckDB ``epoch_us``).

    The testdata parquet stores naive (non-UTC-adjusted) timestamps, which
    Spark 4 reads as TIMESTAMP_NTZ when ``parquet.inferTimestampNTZ`` is on
    (the driver's harness session) and as TIMESTAMP otherwise — and
    ``unix_micros`` rejects NTZ input outright.  ``timestamp_diff`` from the
    NTZ epoch accepts NTZ directly with no timezone in the arithmetic; for
    LTZ input the ``timestamp_ntz`` cast first recovers the wall-clock the
    naive parquet value was read as, so both session flavors produce the
    same integer DuckDB computes.  Stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def rewrite_dialect(sql: str) -> str:
    """Rewrite DuckDB-dialect calls to Spark SQL equivalents.

    ``json_extract(x, '$.k')`` / ``json_extract_string(x, '$.k')`` ->
    ``get_json_object(x, '$.k')``.  Signatures match 1:1, so a name
    rewrite is sufficient and the expression stays inside whole-stage
    codegen (a UDF here would drop the hot path out of the JVM).
    """
    return _JSON_EXTRACT_RE.sub("get_json_object(", sql)


def _json_path_get(blob: Optional[str], path: str) -> Optional[str]:
    """Minimal $.a.b[0] JSON-path getter for the backstop UDF."""
    if blob is None:
        return None
    try:
        obj: Any = _json.loads(blob)
    except (ValueError, TypeError):
        return None
    if not path.startswith("$"):
        return None
    tokens = re.findall(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]", path)
    for name, idx in tokens:
        try:
            obj = obj[name] if name else obj[int(idx)]
        except (KeyError, IndexError, TypeError):
            return None
    if obj is None:
        return None
    if isinstance(obj, (dict, list)):
        return _json.dumps(obj)
    if isinstance(obj, bool):
        return "true" if obj else "false"
    return str(obj)


def register_engine_functions(spark: SparkSession) -> None:
    """Register dialect-compat functions on the session.

    ``json_extract`` backstop: only hit when a query dodges
    :func:`rewrite_dialect`; row-at-a-time is acceptable for that cold
    path (per-event relations are 1..N rows).
    """
    spark.udf.register("json_extract", _json_path_get, "string")
    spark.udf.register("json_extract_string", _json_path_get, "string")
