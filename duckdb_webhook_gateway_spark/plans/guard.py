"""Read-only guard for the ad-hoc query gateway.

The reference guards ``/query`` with a naive uppercase-substring denylist
on DROP/DELETE/TRUNCATE/INSERT/UPDATE (src/app.py:971-973).  This guard
strengthens it three ways (SURVEY §4.2's "stronger variant"):

1. **Comment-aware command-prefix check.**  Leading ``--`` line and
   ``/* */`` block comments (including Spark's nested block comments) are
   stripped before matching, so ``/**/ CREATE TABLE …`` or
   ``-- c\\nEXECUTE IMMEDIATE …`` cannot smuggle a command behind a
   comment.  The prefix list rejects every statement FORM that isn't a
   query — CREATE/ALTER/SET/CACHE/…, plus Spark 4's indirect-execution
   forms (EXECUTE IMMEDIATE, DECLARE, BEGIN…END scripting, CALL), which
   could otherwise run SQL built from string EXPRESSIONS
   (``'dr' || 'op …'``) that no keyword scan can see.

2. **Parser-grade verdict** (when a SparkSession is supplied).  The
   statement is parsed with ``sessionState().sqlParser().parsePlan`` and
   rejected if the root logical plan is a ``Command`` node or a DML
   statement node (InsertIntoStatement/UpdateTable/DeleteFromTable/
   MergeIntoTable parse as plain plans pre-analysis).  A clean pure-query
   parse ALSO overrides the lexical denylist's false positives: a string
   literal ``SELECT 'drop'`` or a column named ``update`` is provably not
   a write once parsed.  Parse failures (DuckDB-dialect spellings,
   ``$n`` markers, piggybacked second statements) fall back to rule 3.

3. **Word-boundary denylist fallback.**  The reference's five words
   matched as WHOLE WORDS case-insensitively — catching lowercase
   ``drop`` and piggybacked second statements without the reference's
   ``SELECT updated_at`` false positive.  Deliberate, documented
   deviation from the reference's substring match.
"""

from __future__ import annotations

import re
from typing import Optional

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

# Logical-plan root classes that are writes/commands but do NOT extend
# the Command trait before analysis, plus indirect-execution roots.
_WRITE_PLAN_RE = re.compile(
    r"(Insert|Update|Delete|Merge|Create|Drop|Alter|Replace|Truncate|"
    r"Write|Cache|Refresh|Analyze|Repair|Execute|Call|Declare|"
    r"CompoundBody|SetVariable|SetCatalog|SetNamespace|Command)"
)


def _strip_leading_comments(sql: str) -> str:
    """Remove leading whitespace, ``--`` line comments, and (nested)
    ``/* */`` block comments — Spark's lexer skips all three before the
    first token, so the prefix check must too.  Unterminated block
    comments yield "" (nothing executable can follow)."""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch.isspace():
            i += 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            if j == -1:
                return ""
            i = j + 1
        elif sql.startswith("/*", i):
            depth = 1
            i += 2
            while i < n and depth:
                if sql.startswith("/*", i):
                    depth += 1
                    i += 2
                elif sql.startswith("*/", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
            if depth:
                return ""
        else:
            break
    return sql[i:]


def _parser_verdict(spark, sql: str) -> Optional[bool]:
    """Parse ``sql`` and classify the root plan.  True = provably a pure
    query, False = provably a command/DML, None = could not parse (the
    caller falls back to the lexical denylist)."""
    try:
        jparser = spark._jsparkSession.sessionState().sqlParser()
        jplan = jparser.parsePlan(sql)
    except Exception:
        return None
    try:
        command_cls = spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.plans.logical.Command"
        )
        if command_cls.isInstance(jplan):
            return False
    except Exception:
        return None
    simple_name = jplan.getClass().getName().rsplit(".", 1)[-1]
    if _WRITE_PLAN_RE.search(simple_name):
        return False
    return True


def is_read_only_sql(query: str, spark=None, strict: bool = False) -> bool:
    """``strict=True`` reproduces the reference's check EXACTLY
    (src/app.py:971: ``any(k in query.upper() for k in [...])`` — a raw
    substring scan of the unstripped text): same rejections AND the same
    false positives (``SELECT updated_at`` is denied, ``drop`` inside a
    string literal is denied).  The default mode is the documented
    stronger variant below; strict exists for deployments that need
    bug-for-bug reference parity (WEBHOOK_GATEWAY_STRICT_GUARD=1 on the
    server)."""
    if strict:
        up = query.upper()
        return not any(w in up for w in _DENY_WORDS)
    stripped = _strip_leading_comments(query).strip().rstrip(";").strip()
    if not stripped:
        return False
    if _COMMAND_PREFIX_RE.match(stripped):
        return False
    if spark is not None:
        verdict = _parser_verdict(spark, stripped)
        if verdict is not None:
            return verdict
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


def assert_read_only(query: str, spark=None) -> None:
    if not is_read_only_sql(query, spark=spark):
        raise PermissionError(READ_ONLY_MESSAGE)
