"""End-to-end streaming micro-batch throughput probe.

Usage: SPARK_GRAFT_CPUS=32 python tools/stream_throughput.py [N]

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
        sg = StreamingGateway(gw)
        mode = sys.argv[2] if len(sys.argv) > 2 else "files"
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


if __name__ == "__main__":
    main()
