"""Webhook catalog semantics, mirroring the reference's
tests/test_webhook_management.py:13-148 and delete/toggle behavior."""

from __future__ import annotations

import pytest

from duckdb_webhook_gateway_spark.engine import WebhookConfig
from duckdb_webhook_gateway_spark.engine.catalog import ValidationError


def _cfg(**kw):
    base = dict(
        source_path="/test",
        destination_url="http://example.com/dest",
        transform_query="SELECT * FROM {{payload}}",
    )
    base.update(kw)
    return WebhookConfig(**base)


def test_register_and_get_by_path(gateway):
    rec = gateway.register_webhook(_cfg())
    assert rec["id"]
    got = gateway.catalog.get_by_path("/test")
    assert got["id"] == rec["id"]
    assert got["destination_url"] == "http://example.com/dest"


def test_path_normalization(gateway):
    # reference: src/app.py:57-62; tests/test_webhook_management.py:129-148
    rec = gateway.register_webhook(_cfg(source_path="noslash"))
    assert rec["source_path"] == "/noslash"
    assert gateway.catalog.get_by_path("noslash")["id"] == rec["id"]


def test_path_case_sensitive(gateway):
    # reference: tests/test_webhook_management.py:111-126
    gateway.register_webhook(_cfg(source_path="/CaseSensitive"))
    assert gateway.catalog.get_by_path("/casesensitive") is None
    assert gateway.catalog.get_by_path("/CaseSensitive") is not None


def test_register_same_path_upserts_keeping_id(gateway):
    # reference: src/app.py:265-287; tests/test_webhook_management.py:44-80
    first = gateway.register_webhook(_cfg())
    second = gateway.register_webhook(
        _cfg(destination_url="http://example.com/other")
    )
    assert second["id"] == first["id"]
    assert gateway.catalog.get_by_path("/test")["destination_url"] == (
        "http://example.com/other"
    )
    assert len(gateway.catalog.list()) == 1


def test_transform_must_contain_macro(gateway):
    # reference: src/app.py:64-69; tests/test_api_endpoints.py:121-140
    with pytest.raises(ValidationError):
        _cfg(transform_query="SELECT 1")


def test_sql_visibility(gateway, spark):
    gateway.register_webhook(_cfg())
    rows = spark.sql("SELECT source_path FROM webhooks").collect()
    assert [r.source_path for r in rows] == ["/test"]


def test_delete_without_history_hard_deletes(gateway):
    rec = gateway.register_webhook(_cfg())
    assert gateway.delete_webhook(rec["id"]) == "deleted"
    assert gateway.catalog.get_by_id(rec["id"]) is None


def test_delete_with_history_soft_deletes(gateway):
    # reference: src/app.py:1746-1753
    rec = gateway.register_webhook(_cfg())
    gateway.ingest("/test", {"a": 1})
    assert gateway.delete_webhook(rec["id"]) == "deactivated"
    row = gateway.catalog.get_by_id(rec["id"])
    assert row["source_path"] == f"/inactive_{rec['id']}"
    assert not gateway.catalog.is_active(row)


def test_status_toggle(gateway):
    # reference: src/app.py:1600-1672 (reactivation strips the prefix with
    # str.replace, so the restored path is '/<id>', not the original)
    rec = gateway.register_webhook(_cfg())
    gateway.catalog.set_active(rec["id"], False)
    row = gateway.catalog.get_by_id(rec["id"])
    assert row["source_path"] == f"/inactive_{rec['id']}"
    gateway.catalog.set_active(rec["id"], True)
    row = gateway.catalog.get_by_id(rec["id"])
    assert row["source_path"] == f"/{rec['id']}"


def test_persistence_across_store_restart(gateway, spark):
    rec = gateway.register_webhook(_cfg())
    from duckdb_webhook_gateway_spark.engine import Gateway

    reopened = Gateway(spark, workdir=gateway.workdir)
    assert reopened.catalog.get_by_id(rec["id"])["source_path"] == "/test"
