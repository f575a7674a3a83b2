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
    ],
)
def test_writes_rejected(spark, bad):
    # reference denylist: src/app.py:971-973 (+ parser-grade prefix check)
    with pytest.raises(ReadOnlyViolation):
        run_adhoc_query(spark, bad)


def test_benign_column_names_allowed():
    # better than the reference: a column named updated_at is not a write
    assert is_read_only_sql("SELECT updated_at FROM webhooks")


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
