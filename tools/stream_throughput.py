"""End-to-end streaming micro-batch throughput probe.

Usage: SPARK_GRAFT_CPUS=32 python tools/stream_throughput.py [N] [mode]

Modes:
- ``files`` (default): N direct ``ingest()`` calls, one landing file
  per event — the worst-case producer.
- ``bulk``: ``ingest_many`` batches of 500 — a producer that already
  holds batches.
- ``posts``: N single-event HTTP POSTs from 64 concurrent client
  threads against a real GatewayHTTPServer(streaming=True); the
  server's default GROUP COMMIT (20 ms window) coalesces concurrent
  requests into shared landing files — clients never call
  ``ingest_many``, batching is entirely server-side.  Reports the
  landing-file count so the coalescing is visible.

Registers one webhook (filter + transform), ingests N events (default
5000) into a fresh temp workdir, drains with run_available(), and
reports ev/s plus audit/delivery counts.  The numbers quoted in
BASELINE.md round 6 (205 ev/s at N=5000, 261 at N=20000 locally) come
from this probe; much lower usually means a multi-batch drain — check
StreamingGateway(max_files_per_trigger=...).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_webhook_gateway_spark import get_spark
from duckdb_webhook_gateway_spark.engine import Gateway, WebhookConfig
from duckdb_webhook_gateway_spark.streaming.webhook_source import (
    StreamingGateway,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark(
        "tput", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp()
    try:
        gw = Gateway(spark, workdir=wd)
        gw.register_webhook(
            WebhookConfig(
                source_path="/stream",
                destination_url="http://example.com/sink",
                transform_query=(
                    "SELECT kind, value * 2 AS doubled FROM {{payload}}"
                ),
                filter_query="kind <> 'drop'",
            )
        )
        mode = sys.argv[2] if len(sys.argv) > 2 else "files"
        if mode == "posts":
            return _posts_mode(spark, gw, n)
        sg = StreamingGateway(gw)
        t0 = time.perf_counter()
        if mode == "bulk":
            # ingest_many: one landing file per 500 events — the path a
            # bulk producer or buffering HTTP shell takes
            for start in range(0, n, 500):
                sg.ingest_many(
                    "/stream",
                    [
                        {"kind": f"k{i % 7}", "value": i}
                        for i in range(start, min(start + 500, n))
                    ],
                )
        else:
            for i in range(n):
                sg.ingest("/stream", {"kind": f"k{i % 7}", "value": i})
        t1 = time.perf_counter()
        sg.run_available()
        t2 = time.perf_counter()
        rows = spark.sql(
            "SELECT count(*) AS n, count_if(success) AS ok "
            "FROM transformed_events"
        ).first()
        print(
            f"N={n} mode={mode} ingest {t1 - t0:.2f}s "
            f"process {t2 - t1:.2f}s "
            f"ev/s={n / (t2 - t1):.0f} audited={rows['n']} "
            f"delivered_ok={rows['ok']}"
        )
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def _posts_mode(spark, gw, n: int, n_clients: int = 64) -> None:
    """Drive the REAL ingest surface: concurrent single-event POSTs.

    The server's ingestion path submits each event to the group-commit
    WAL (20 ms default window); a sustained concurrent load therefore
    lands as json-lines files of ~rate x window events each with NO
    client-side batching.  ThreadingHTTPServer gives each connection a
    thread, so the ack cap is n_clients / window — size n_clients to
    the offered load, exactly like any WAL-fronted ingest tier.
    """
    import http.client
    import json
    from concurrent.futures import ThreadPoolExecutor

    from duckdb_webhook_gateway_spark.api.server import GatewayHTTPServer

    srv = GatewayHTTPServer(gw, streaming=True, drain_interval=3600).start()
    try:
        def client(idx: int) -> list[int]:
            # one persistent HTTP/1.1 connection per producer (the
            # load-balancer topology): the server keeps one handler
            # thread per client instead of a thread per event
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
            statuses = []
            try:
                for i in range(idx, n, n_clients):
                    body = json.dumps({"kind": f"k{i % 7}", "value": i})
                    conn.request(
                        "POST",
                        "/stream",
                        body=body,
                        headers={"Content-Type": "application/json"},
                    )
                    resp = conn.getresponse()
                    resp.read()
                    statuses.append(resp.status)
            finally:
                conn.close()
            return statuses

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_clients) as ex:
            statuses = [
                s for chunk in ex.map(client, range(n_clients)) for s in chunk
            ]
        t1 = time.perf_counter()
        assert len(statuses) == n and all(s == 200 for s in statuses), (
            "non-200 ingest ack"
        )
        landing = srv.streaming_gateway.landing_dir
        n_files = len(
            [f for f in os.listdir(landing) if not f.startswith(".")]
        )
        srv.streaming_gateway.run_available()
        t2 = time.perf_counter()
        rows = spark.sql(
            "SELECT count(*) AS n, count_if(success) AS ok "
            "FROM transformed_events"
        ).first()
        print(
            f"N={n} mode=posts clients={n_clients} "
            f"ingest {t1 - t0:.2f}s ({n / (t1 - t0):.0f} ev/s ack) "
            f"landing_files={n_files} "
            f"process {t2 - t1:.2f}s "
            f"end_to_end_ev/s={n / (t2 - t0):.0f} "
            f"audited={rows['n']} delivered_ok={rows['ok']}"
        )
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
