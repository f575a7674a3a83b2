"""Fast clean-window detector for bench sessions on this shared host.

Load average does not predict the post-reboot bandwidth-contention regime
(a session launched at load 0.18 still read 2.7x inflated), but a solo
q1_pricing_summary probe does: its idle anchor is 0.31-0.37 s and it reads
0.8 s+ when the invisible neighbor is active (third-session attribution
probe, OPTIMIZATION_r14.md).  Run q1 min-of-6 after the standard warmups
and print one JSON line {"q1_min": s, "clean": bool} — callers launch the
full bench/pairing only on clean=true.

The gate is NECESSARY, not sufficient (fifth-session finding): two
sessions launched at gate 0.39-0.46 — and re-reading clean immediately
after — still benched 1.4-1.7x inflated across the bandwidth-bound rows.
The solo 6-rep probe samples a few seconds; the bench sustains 32-thread
pressure for minutes and sees contention windows the probe misses.  For
anchor-grade sessions gate at <=0.4, expect to discard sessions whose own
in-bench q1 reads >1.3x the gate value, and treat the probe as a cheap
pre-filter, not a certificate.

Usage: SPARK_GRAFT_CPUS=32 python tools/idle_gate_q1.py [threshold=0.5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_webhook_gateway_spark.session import get_spark
from duckdb_webhook_gateway_spark.workloads import all_entries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    spark = get_spark(
        "idle-gate",
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = all_entries()["q1_pricing_summary"]
    fn(spark, WARM).count()
    fn(spark, SF_DIR).count()
    spark.sparkContext._jvm.System.gc()
    best = min(
        (lambda t0: (fn(spark, SF_DIR).count(), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(6)
    )
    print(json.dumps({"q1_min": round(best, 3), "clean": best <= threshold}))


if __name__ == "__main__":
    main()
