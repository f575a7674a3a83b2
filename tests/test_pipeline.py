"""End-to-end per-event pipeline, mirroring the reference's
tests/test_event_processing.py:174-351 and tests/test_integration.py flows."""

from __future__ import annotations

import json

import pytest

from duckdb_webhook_gateway_spark.engine import WebhookConfig
from duckdb_webhook_gateway_spark.engine.audit import FILTERED_OUT_BODY
from duckdb_webhook_gateway_spark.engine.pipeline import UnknownPathError


def test_milestone0_end_to_end(gateway, spark):
    """SURVEY §7.1: the reference's first integration test
    (tests/test_integration.py:97-165), no HTTP shell."""
    gateway.register_webhook(
        WebhookConfig(
            source_path="/m0",
            destination_url="http://example.com/webhook-receiver",
            transform_query=(
                "SELECT field1, field2, field1 || ' - ' || field2 AS combined "
                "FROM {{payload}}"
            ),
        )
    )
    outcome = gateway.ingest(
        "/m0", {"field1": "value1", "field2": "value2", "field3": "value3"}
    )
    assert outcome.filtered_out is False
    assert outcome.transformed == {
        "field1": "value1",
        "field2": "value2",
        "combined": "value1 - value2",
    }
    assert outcome.delivery.success is True  # mocked example.com

    raw = spark.sql("SELECT * FROM raw_events").collect()
    assert len(raw) == 1
    assert json.loads(raw[0].payload)["field3"] == "value3"

    tr = spark.sql("SELECT * FROM transformed_events").collect()
    assert len(tr) == 1
    assert tr[0].success is True
    assert json.loads(tr[0].transformed_payload)["combined"] == "value1 - value2"
    assert tr[0].raw_event_id == outcome.raw_event_id


def test_filter_gate_blocks_and_audits(gateway, spark):
    # reference: src/app.py:1150-1170; tests/test_integration.py:174-217
    gateway.register_webhook(
        WebhookConfig(
            source_path="/gate",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
            filter_query="type = 'allowed'",
        )
    )
    ok = gateway.ingest("/gate", {"type": "allowed", "data": "test"})
    blocked = gateway.ingest("/gate", {"type": "blocked", "data": "test"})
    assert ok.filtered_out is False
    assert blocked.filtered_out is True

    tr = {r.raw_event_id: r for r in spark.sql("SELECT * FROM transformed_events").collect()}
    assert tr[ok.raw_event_id].success is True
    assert tr[blocked.raw_event_id].success is False
    assert FILTERED_OUT_BODY in tr[blocked.raw_event_id].response_body


def test_unknown_path_raises(gateway):
    # reference: 404 (src/app.py:1089-1092)
    with pytest.raises(UnknownPathError):
        gateway.ingest("/never-registered", {"a": 1})


def test_multi_row_payload_pipeline(gateway):
    gateway.register_webhook(
        WebhookConfig(
            source_path="/multi",
            destination_url="http://example.com/x",
            transform_query="SELECT id, name FROM {{payload}} ORDER BY id",
        )
    )
    outcome = gateway.ingest(
        "/multi", [{"id": 2, "name": "b"}, {"id": 1, "name": "a"}]
    )
    assert outcome.transformed == {
        "results": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    }


def test_stats_and_recent_events(gateway):
    # reference: src/app.py:1246-1294 (stats), 1464-1501 (recent feed)
    gateway.register_webhook(
        WebhookConfig(
            source_path="/s",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
            filter_query="keep = true",
        )
    )
    gateway.ingest("/s", {"keep": True, "v": 1})
    gateway.ingest("/s", {"keep": False, "v": 2})
    stats = gateway.stats()
    assert stats["webhooks"] == 1
    assert stats["raw_events"] == 2
    assert stats["transformed_events"] == 2
    (per,) = stats["per_webhook"]
    assert per["total"] == 2
    assert per["successes"] == 1
    assert abs(per["success_rate"] - 0.5) < 1e-9

    feed = gateway.recent_events(limit=10)
    assert len(feed) == 2
    # newest first (ORDER BY timestamp DESC)
    assert feed[0]["timestamp"] >= feed[1]["timestamp"]


def test_event_detail(gateway):
    gateway.register_webhook(
        WebhookConfig(
            source_path="/d",
            destination_url="http://example.com/x",
            transform_query="SELECT a * 2 AS doubled FROM {{payload}}",
        )
    )
    outcome = gateway.ingest("/d", {"a": 21})
    detail = gateway.event_detail(outcome.raw_event_id)
    assert detail["raw_event"]["payload"] == {"a": 21}
    assert detail["transformed_events"][0]["transformed_payload"] == {"doubled": 42}


def test_processing_error_is_audited(gateway, spark):
    # reference: src/app.py:1226-1244 — errors produce an audit row with
    # success=False and "Error: ..." body; the pipeline never raises.
    gateway.register_webhook(
        WebhookConfig(
            source_path="/err",
            destination_url="http://example.com/x",
            transform_query="SELECT * FROM {{payload}}",
            filter_query="missing_col = 'x'",
        )
    )
    outcome = gateway.ingest("/err", {})  # empty payload: column unresolvable
    assert outcome.delivery is None
    tr = spark.sql("SELECT * FROM transformed_events").collect()
    assert len(tr) == 1
    assert tr[0].success is False
    assert tr[0].response_body.startswith("Error:")


def test_recent_events_pushdown_route_matches_single_pass(gateway):
    """The two-phase feed (top-K raw -> IN-filtered transformed) must return
    exactly what the single-pass full-join route returns, including the join
    multiplication when one raw event has several transformed rows."""
    import uuid
    from datetime import datetime, timedelta

    st = gateway.store
    base = datetime(2026, 8, 1, 12, 0, 0)
    raw_rows, tr_rows = [], []
    for i in range(12):
        rid = str(uuid.uuid4())
        ts = base + timedelta(seconds=i)  # distinct -> deterministic order
        raw_rows.append(
            {"id": rid, "timestamp": ts, "source_path": "/feed",
             "payload": '{"i": %d}' % i}
        )
        # newest event carries TWO transformed rows; one event carries none
        copies = 2 if i == 11 else (0 if i == 10 else 1)
        for c in range(copies):
            tr_rows.append(
                {"id": str(uuid.uuid4()), "raw_event_id": rid,
                 "webhook_id": "w1", "timestamp": ts,
                 "transformed_payload": '{"i": %d, "c": %d}' % (i, c),
                 "destination_url": "http://example.com/x",
                 "success": True, "response_code": 200,
                 "response_body": "ok"}
            )
    st.append_events("raw_events", raw_rows)
    st.append_events("transformed_events", tr_rows)

    got = gateway.recent_events(limit=5)
    # force the single-pass fallback route to produce the reference answer
    gateway._FEED_PUSHDOWN_MAX_LIMIT = 0
    try:
        want = gateway.recent_events(limit=5)
    finally:
        del gateway.__dict__["_FEED_PUSHDOWN_MAX_LIMIT"]
    # rows 11a/11b (newest, 2 copies) then 10 (no transformed -> NULLs) ...
    assert len(want) == 5
    assert [w["payload"] for w in want][:3] == [
        '{"i": 11}', '{"i": 11}', '{"i": 10}'
    ]
    assert want[2]["success"] is None and want[2]["response_code"] is None
    # the two transformed copies of row 11 may legitimately swap order
    # (equal sort keys) — compare as row multisets plus the sorted key order
    def key(r):
        return sorted(r.items(), key=lambda kv: kv[0])

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert [g["timestamp"] for g in got] == [w["timestamp"] for w in want]


def test_recent_events_pushdown_empty_store(gateway):
    assert gateway.recent_events(limit=5) == []


def test_event_detail_not_found_and_multi_transformed(gateway):
    """The speculative transformed lookup must not change values: unknown id
    -> None; a raw event with two transformed rows returns both."""
    import uuid
    from datetime import datetime

    assert gateway.event_detail("no-such-id") is None

    st = gateway.store
    rid = str(uuid.uuid4())
    ts = datetime(2026, 8, 2, 9, 0, 0)
    st.append_events(
        "raw_events",
        [{"id": rid, "timestamp": ts, "source_path": "/d2",
          "payload": '{"a": 1}'}],
    )
    st.append_events(
        "transformed_events",
        [{"id": str(uuid.uuid4()), "raw_event_id": rid, "webhook_id": "w1",
          "timestamp": ts, "transformed_payload": '{"n": %d}' % n,
          "destination_url": "http://example.com/x", "success": True,
          "response_code": 200, "response_body": "ok"} for n in (1, 2)],
    )
    detail = gateway.event_detail(rid)
    assert detail["raw_event"]["payload"] == {"a": 1}
    assert sorted(
        t["transformed_payload"]["n"] for t in detail["transformed_events"]
    ) == [1, 2]
