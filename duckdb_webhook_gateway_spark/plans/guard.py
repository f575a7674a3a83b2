"""Read-only guard for the ad-hoc query gateway.

The reference guards ``/query`` with a naive uppercase-substring denylist
on DROP/DELETE/TRUNCATE/INSERT/UPDATE (src/app.py:971-973).  This guard
strengthens it two ways (SURVEY §4.2's "stronger variant") while staying
purely lexical: the denylist matches WHOLE WORDS case-insensitively
(catching lowercase ``drop`` and piggybacked second statements, without
the reference's "SELECT updated_at" false positive), and a
command-prefix check rejects every statement FORM that isn't a query —
CREATE/ALTER/SET/CACHE/..., plus Spark 4's indirect-execution forms
(EXECUTE IMMEDIATE, DECLARE, BEGIN...END scripting, CALL), which could
otherwise smuggle a write inside a string expression that no keyword
scan can see.  Commands the reference's five-word list never covered.
"""

from __future__ import annotations

import re

# Reference denylist (src/app.py:971-973) — applied as whole words, which
# fixes the reference's "SELECT updated_at" false positive while still
# rejecting everything the reference rejects in its tests.
_DENY_WORDS = ("DROP", "DELETE", "TRUNCATE", "INSERT", "UPDATE")
_DENY_RE = re.compile(r"\b(" + "|".join(_DENY_WORDS) + r")\b", re.IGNORECASE)

# Command keywords that start non-query statements in Spark SQL.
# EXECUTE (IMMEDIATE), DECLARE, BEGIN and CALL matter most: they can run
# SQL built from string EXPRESSIONS ('dr' || 'op ...'), which neither the
# word denylist nor any keyword scan of the outer text could catch.
_COMMAND_PREFIX_RE = re.compile(
    r"^\s*(DROP|DELETE|TRUNCATE|INSERT|UPDATE|MERGE|CREATE|ALTER|REPLACE|"
    r"SET|RESET|ADD|REFRESH|CACHE|UNCACHE|ANALYZE|GRANT|REVOKE|LOAD|"
    r"IMPORT|EXPORT|MSCK|USE|COMMENT|CALL|EXECUTE|DECLARE|BEGIN|"
    r"OPTIMIZE|VACUUM)\b",
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
