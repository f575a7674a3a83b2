"""Ad-hoc analytics gateway (the reference's ``/query`` endpoint).

Arbitrary read-only SQL over the whole event store
(reference: src/app.py:955-991): write-keyword denylist (971-973), rows
returned as list-of-lists with datetimes ISO-formatted (978-986).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any, Sequence

from pyspark.sql import SparkSession

from ..functions import rewrite_dialect
from ..plans.guard import is_read_only_sql


class ReadOnlyViolation(PermissionError):
    """Reference returns HTTP 400 for denylisted queries (src/app.py:971-973)."""


def _cell(value: Any) -> Any:
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    return value


_NUMBERED_RE = re.compile(r"\$(\d+)")
_DOLLAR_NAMED_RE = re.compile(r"\$([A-Za-z_][A-Za-z0-9_]*)")

# The 5 engine tables the reference's DuckDB catalog reports
# (tests/test_db_manager.py:24-34); ref_* CTAS tables appear alongside.
_ENGINE_TABLES = (
    "webhooks",
    "raw_events",
    "transformed_events",
    "reference_tables",
    "python_udfs",
)


def _register_sqlite_master(spark: SparkSession) -> None:
    """Shim DuckDB's sqlite_master compatibility catalog as a temp view.

    The reference's own tests introspect the catalog via
    ``SELECT name FROM sqlite_master WHERE type='table'``
    (reference: tests/test_db_manager.py:24-26).  Spark has no such
    relation, so queries touching it get a just-in-time temp view built
    from the session catalog — refreshed per query so CTAS'd ``ref_*``
    tables show up immediately.
    """
    names = sorted(
        {
            t.name
            for t in spark.catalog.listTables()
            if t.name in _ENGINE_TABLES or t.name.startswith("ref_")
        }
    )
    rows = [("table", n, n, f"CREATE TABLE {n}") for n in names]
    from ..plans.localrel import local_df

    local_df(
        spark, rows, "type string, name string, tbl_name string, sql string"
    ).createOrReplaceTempView("sqlite_master")


def _bind_params(query: str, params: Any) -> tuple[str, Any]:
    """Normalize the reference's three parameter-binding styles to Spark's.

    The reference accepts (src/app.py:200-239, tests/test_db_manager.py:52-74):

    - **tuple/list** positional against ``?`` or numbered ``$1`` markers;
    - **dict** against ``?`` markers — integer / numeric-string keys bind
      by 1-based position, other keys bind in dict order (both quirks
      mirrored exactly, including the missing-placeholder error);
    - **dict** against named ``:name`` / ``$name`` markers.

    Spark SQL natively binds ``?`` from a list and ``:name`` from a dict,
    so the work here is marker rewriting + argument reordering.
    """
    if params is None:
        return query, None
    if isinstance(params, Sequence) and not isinstance(params, (str, bytes)):
        if _NUMBERED_RE.search(query):
            # $k occurrences -> ? in textual order; args follow that order
            # so repeated / out-of-order $k still bind correctly.
            order = [int(m.group(1)) for m in _NUMBERED_RE.finditer(query)]
            return _NUMBERED_RE.sub("?", query), [params[k - 1] for k in order]
        return query, list(params)
    if isinstance(params, dict):
        # Reference heuristic verbatim: '?' style iff the query has ?
        # markers and no named markers.
        if "?" in query and ":" not in query and "@" not in query:
            n = query.count("?")
            if all(
                isinstance(k, int) or str(k).isdigit() for k in params.keys()
            ):
                args = []
                for i in range(1, n + 1):
                    if i in params:
                        args.append(params[i])
                    elif str(i) in params:
                        args.append(params[str(i)])
                    else:
                        raise ValueError(
                            f"Missing parameter for placeholder {i}"
                        )
                return query, args
            return query, list(params.values())
        if _NUMBERED_RE.search(query) and all(
            isinstance(k, int) or str(k).isdigit() for k in params.keys()
        ):
            order = [int(m.group(1)) for m in _NUMBERED_RE.finditer(query)]
            by_pos = {int(k): v for k, v in params.items()}
            return _NUMBERED_RE.sub("?", query), [by_pos[k] for k in order]
        # Named: accept DuckDB's $name alongside Spark's :name.
        return _DOLLAR_NAMED_RE.sub(r":\1", query), {
            str(k): v for k, v in params.items()
        }
    return query, params


def run_adhoc_query(
    spark: SparkSession, query: str, params: Any = None
) -> dict[str, Any]:
    """Execute read-only SQL; serialize rows as list-of-lists with ISO
    datetimes (reference: src/app.py:975-991).

    ``params`` accepts every style the reference does — named dict
    (``:name`` / ``$name``), positional tuple/list (``?`` / ``$1``), and
    the dict-against-``?`` conversion — see :func:`_bind_params`.
    Binding is parameterized (injection-safe), never string interpolation.
    """
    # WEBHOOK_GATEWAY_STRICT_GUARD=1 opts into bug-for-bug parity with
    # the reference's substring denylist (src/app.py:971) — including
    # its false positives; default is the documented stronger guard.
    import os as _os

    strict = _os.environ.get("WEBHOOK_GATEWAY_STRICT_GUARD", "") == "1"
    if not is_read_only_sql(query, spark=spark, strict=strict):
        from ..plans.guard import READ_ONLY_MESSAGE

        raise ReadOnlyViolation(READ_ONLY_MESSAGE)
    if "sqlite_master" in query.lower():
        _register_sqlite_master(spark)
    bound_query, args = _bind_params(query, params)
    df = spark.sql(rewrite_dialect(bound_query), args=args or {})
    columns = df.columns
    result = [[_cell(v) for v in row] for row in df.collect()]
    return {"status": "success", "columns": columns, "result": result}
