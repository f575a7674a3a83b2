"""True end-to-end delivery: a live HTTP receiver captures the forwarded
payload, mirroring the reference's integration strategy
(tests/test_integration.py:23-165 — real destination server, assertions
on RECEIVED content)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from duckdb_webhook_gateway_spark.engine import WebhookConfig


class _Receiver(BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        _Receiver.received.append(json.loads(self.rfile.read(n).decode()))
        body = b'{"status": "received"}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):
        pass


@pytest.fixture()
def receiver():
    _Receiver.received = []
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Receiver)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def test_real_delivery_to_live_receiver(gateway, spark, receiver):
    gateway.register_webhook(
        WebhookConfig(
            source_path="/real",
            # 127.0.0.1 is not in the reference's substring mock list ->
            # real HTTP delivery
            destination_url=f"http://127.0.0.1:{receiver}/hook",
            transform_query=(
                "SELECT field1, field2, field1 || ' - ' || field2 AS combined "
                "FROM {{payload}}"
            ),
        )
    )
    outcome = gateway.ingest(
        "/real", {"field1": "value1", "field2": "value2", "field3": "value3"}
    )
    assert outcome.delivery.success is True
    assert outcome.delivery.response_code == 200
    # the receiver got exactly the transformed payload, field3 excluded
    assert _Receiver.received == [
        {"field1": "value1", "field2": "value2", "combined": "value1 - value2"}
    ]
    tr = spark.sql("SELECT * FROM transformed_events").collect()
    assert tr[0].success is True
    assert json.loads(tr[0].response_body) == {"status": "received"}


def test_delivery_failure_audited(gateway, spark):
    # unreachable destination (closed port on 127.0.0.1): connection error
    # -> success=False, never retried (reference: src/app.py:1205-1213)
    gateway.register_webhook(
        WebhookConfig(
            source_path="/dead",
            destination_url="http://127.0.0.1:1/hook",
            transform_query="SELECT a FROM {{payload}}",
        )
    )
    outcome = gateway.ingest("/dead", {"a": 1})
    assert outcome.delivery.success is False
    assert outcome.delivery.response_code is None
    tr = spark.sql("SELECT * FROM transformed_events").collect()
    assert tr[0].success is False
    assert "Error" in tr[0].response_body
