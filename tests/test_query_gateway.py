"""Ad-hoc query gateway, mirroring the reference's /query tests
(tests/test_api_endpoints.py: query + write-rejection cases)."""

from __future__ import annotations

import pytest

from duckdb_webhook_gateway_spark.engine import (
    ReadOnlyViolation,
    WebhookConfig,
    run_adhoc_query,
)
from duckdb_webhook_gateway_spark.plans import is_read_only_sql


def test_select_over_event_store(gateway, spark):
    gateway.register_webhook(
        WebhookConfig(
            source_path="/q",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    gateway.ingest("/q", {"a": 1})
    out = run_adhoc_query(spark, "SELECT source_path, payload FROM raw_events")
    assert out["status"] == "success"
    assert out["result"][0][0] == "/q"


def test_datetime_iso_serialization(gateway, spark):
    # reference: src/app.py:978-986
    gateway.register_webhook(
        WebhookConfig(
            source_path="/q2",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    gateway.ingest("/q2", {"a": 1})
    out = run_adhoc_query(spark, "SELECT timestamp FROM raw_events LIMIT 1")
    assert isinstance(out["result"][0][0], str)
    assert "T" in out["result"][0][0]


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE webhooks",
        "delete from raw_events",
        "INSERT INTO raw_events VALUES (1)",
        "UPDATE webhooks SET owner = 'x'",
        "TRUNCATE TABLE raw_events",
        "CREATE TABLE t AS SELECT 1",
        "SELECT 1; DROP TABLE webhooks",
        # indirect-execution forms: the inner SQL is a string EXPRESSION
        # no keyword scan of the outer text can see through
        "EXECUTE IMMEDIATE 'dr' || 'op table webhooks'",
        "DECLARE v STRING",
        "BEGIN SELECT 1; END",
        "CALL some_proc(1)",
        "COMMENT ON TABLE webhooks IS 'x'",
        # comment-prefixed commands: Spark's lexer skips leading comments,
        # so the prefix check must strip them before matching
        "/**/ CREATE TABLE pwn AS SELECT 1",
        "-- c\nEXECUTE IMMEDIATE 'dr' || 'op table webhooks'",
        "/* a */ /* b */ MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE",
        # nested block comment (valid in Spark) hiding a command — the
        # parser-grade check catches it even though no deny word appears
        "/* /* x */ */ CREATE TABLE pwn2 AS SELECT 1",
        "--only a comment",
        "/* unterminated comment CREATE TABLE t AS SELECT 1",
    ],
)
def test_writes_rejected(spark, bad):
    # reference denylist: src/app.py:971-973 (+ parser-grade prefix check)
    with pytest.raises(ReadOnlyViolation):
        run_adhoc_query(spark, bad)


def test_benign_column_names_allowed():
    # better than the reference: a column named updated_at is not a write
    assert is_read_only_sql("SELECT updated_at FROM webhooks")


def test_parser_verdict_clears_literal_false_positives(spark):
    """SURVEY §4.2 stronger variant: a parsed pure query overrides the
    lexical denylist, so deny words inside string literals or used as
    column identifiers are provably not writes."""
    out = run_adhoc_query(spark, "SELECT 'drop' AS w")
    assert out["result"] == [["drop"]]
    out = run_adhoc_query(spark, "SELECT 1 AS update")
    assert out["result"] == [[1]]
    # comment-prefixed pure queries still pass
    out = run_adhoc_query(spark, "-- note\n/* x */ SELECT 2 AS n")
    assert out["result"] == [[2]]


def test_parser_verdict_still_rejects_commands(spark):
    # scripting / indirect-execution forms fail even via the parser path
    assert not is_read_only_sql("BEGIN SELECT 1; END", spark=spark)
    assert not is_read_only_sql(
        "EXECUTE IMMEDIATE 'sel' || 'ect 1'", spark=spark
    )
    assert not is_read_only_sql(
        "/* /* nested */ */ CREATE TABLE z AS SELECT 1", spark=spark
    )
    # lexical fallback (no session): deny words still reject
    assert not is_read_only_sql("SELECT 1; DROP TABLE webhooks")


def test_json_extract_shim(gateway, spark):
    # reference dialect: json_extract (frontend/src/pages/SqlQuery.tsx:38)
    gateway.register_webhook(
        WebhookConfig(
            source_path="/j",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    gateway.ingest("/j", {"type": "PushEvent"})
    out = run_adhoc_query(
        spark,
        "SELECT json_extract(payload, '$.type') AS t, COUNT(*) AS n "
        "FROM raw_events GROUP BY t",
    )
    assert out["result"] == [["PushEvent", 1]]


def test_parameter_binding(gateway, spark):
    # reference: param binding (src/app.py:200-239; tests/test_db_manager.py:52-74)
    gateway.register_webhook(
        WebhookConfig(
            source_path="/pb",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
        )
    )
    gateway.ingest("/pb", {"a": 1})
    gateway.ingest("/pb", {"a": 2})
    out = run_adhoc_query(
        spark,
        "SELECT count(*) AS n FROM raw_events WHERE source_path = :path",
        params={"path": "/pb"},
    )
    assert out["result"] == [[2]]
    out = run_adhoc_query(
        spark, "SELECT :x + :y AS s", params={"x": 40, "y": 2}
    )
    assert out["result"] == [[42]]


def test_parameter_binding_reference_styles(spark):
    """The three styles the reference accepts (src/app.py:200-239,
    mirrored from tests/test_db_manager.py:52-74) must all bind."""
    # dict against ? markers: values in dict order
    out = run_adhoc_query(spark, "SELECT ? AS value", {"value": 42})
    assert out["result"] == [[42]]
    # dict with numbered keys against ? markers: 1-based positions
    out = run_adhoc_query(
        spark, "SELECT ? AS first, ? AS second", {1: "one", 2: "two"}
    )
    assert out["result"] == [["one", "two"]]
    # tuple positional
    out = run_adhoc_query(spark, "SELECT ? AS value", ("test",))
    assert out["result"] == [["test"]]
    # DuckDB numbered $n with a tuple (repeated + out of order)
    out = run_adhoc_query(
        spark, "SELECT $2 AS a, $1 AS b, $2 AS c", ("one", "two")
    )
    assert out["result"] == [["two", "one", "two"]]
    # DuckDB named $name with a dict
    out = run_adhoc_query(spark, "SELECT $x + $y AS s", {"x": 40, "y": 2})
    assert out["result"] == [[42]]
    # reference quirk: a missing numbered placeholder raises
    import pytest
    with pytest.raises(ValueError, match="Missing parameter"):
        run_adhoc_query(spark, "SELECT ? AS a, ? AS b", {1: "only"})


def test_sqlite_master_lists_engine_tables(gateway, spark):
    """reference: tests/test_db_manager.py:24-34 — catalog introspection
    through the SQLite-compat relation must list the 5 engine tables."""
    out = run_adhoc_query(
        spark, "SELECT name FROM sqlite_master WHERE type='table'"
    )
    names = {r[0] for r in out["result"]}
    assert {
        "webhooks",
        "raw_events",
        "transformed_events",
        "reference_tables",
        "python_udfs",
    } <= names


def test_strict_guard_is_bug_for_bug_reference_parity():
    """strict=True reproduces the reference's raw substring denylist
    (src/app.py:971) exactly: its rejections AND its false positives.
    The default mode fixes both false-positive classes (documented
    deviation, SURVEY §4.2)."""
    from duckdb_webhook_gateway_spark.plans.guard import is_read_only_sql

    # both modes reject real writes
    for q in ("DROP TABLE t", "delete from t", "INSERT INTO t VALUES (1)"):
        assert not is_read_only_sql(q, strict=True)
        assert not is_read_only_sql(q)
    # reference false positives, faithfully reproduced under strict only
    for q in (
        "SELECT updated_at FROM webhooks",   # UPDATE substring in a name
        "SELECT 'backdrop' AS s",            # DROP inside a literal
    ):
        assert not is_read_only_sql(q, strict=True)
        assert is_read_only_sql(q)
    # strict is a SUBSTRING scan, so comment smuggling of a denied word
    # is still caught, but non-denylist commands pass (the reference
    # never guarded CREATE) — parity includes the gaps
    assert not is_read_only_sql("/**/ DROP TABLE t", strict=True)
    assert is_read_only_sql("CREATE TABLE t AS SELECT 1", strict=True)
    assert not is_read_only_sql("CREATE TABLE t AS SELECT 1")


def test_strict_guard_env_switch(gateway, spark, monkeypatch):
    import pytest

    from duckdb_webhook_gateway_spark.engine.query_gateway import (
        ReadOnlyViolation, run_adhoc_query,
    )

    q = "SELECT updated_at FROM webhooks"
    assert run_adhoc_query(spark, q)["status"] == "success"
    monkeypatch.setenv("WEBHOOK_GATEWAY_STRICT_GUARD", "1")
    with pytest.raises(ReadOnlyViolation):
        run_adhoc_query(spark, q)
