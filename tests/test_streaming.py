"""Streaming micro-batch pipeline: same semantics as the synchronous path,
batched audit writes, exactly-once via checkpoint."""

from __future__ import annotations

import json

from duckdb_webhook_gateway_spark.engine import WebhookConfig
from duckdb_webhook_gateway_spark.engine.audit import FILTERED_OUT_BODY
from duckdb_webhook_gateway_spark.streaming import StreamingGateway


def _register(gateway):
    return gateway.register_webhook(
        WebhookConfig(
            source_path="/stream",
            destination_url="http://example.com/sink",
            transform_query=(
                "SELECT kind, value * 2 AS doubled FROM {{payload}}"
            ),
            filter_query="kind <> 'drop'",
        )
    )


def test_streaming_end_to_end(gateway, spark):
    _register(gateway)
    sg = StreamingGateway(gateway)
    ids = [
        sg.ingest("/stream", {"kind": "a", "value": 1}),
        sg.ingest("/stream", {"kind": "drop", "value": 2}),
        sg.ingest("/stream", {"kind": "b", "value": 3}),
        sg.ingest("/unknown-path", {"kind": "c", "value": 4}),
    ]
    sg.run_available()

    raw = {r.id: r for r in spark.sql("SELECT * FROM raw_events").collect()}
    assert set(raw) == set(ids)

    tr = {
        r.raw_event_id: r
        for r in spark.sql("SELECT * FROM transformed_events").collect()
    }
    assert set(tr) == set(ids[:3])  # unknown path: raw-logged only
    assert json.loads(tr[ids[0]].transformed_payload) == {"kind": "a", "doubled": 2}
    assert tr[ids[1]].success is False
    assert FILTERED_OUT_BODY in tr[ids[1]].response_body
    assert json.loads(tr[ids[2]].transformed_payload) == {"kind": "b", "doubled": 6}


def test_streaming_exactly_once(gateway, spark):
    _register(gateway)
    sg = StreamingGateway(gateway)
    sg.ingest("/stream", {"kind": "x", "value": 10})
    sg.run_available()
    # Re-running the drain must not reprocess the already-checkpointed file.
    sg.run_available()
    assert spark.sql("SELECT count(*) AS n FROM raw_events").first().n == 1
    assert spark.sql("SELECT count(*) AS n FROM transformed_events").first().n == 1
    # New events still flow.
    sg.ingest("/stream", {"kind": "y", "value": 20})
    sg.run_available()
    assert spark.sql("SELECT count(*) AS n FROM raw_events").first().n == 2
