"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() over the result — forces
the full plan without driver-side row materialization cost dominating).
A warmup pass on sf0.001 triggers JVM/codegen warmup so measured numbers
reflect steady-state execution, which is what matters at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_webhook_gateway_spark.session import get_spark
from duckdb_webhook_gateway_spark.workloads import all_entries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"

# Headline set: the analytics suite + the scale-relevant datapipe operators.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_by_value",
    "customer_order_counts",
    "order_priority_rate",
    "events_json_bucket",
    "events_recent_topk",
    "window_top_orders_per_customer",
    "supplier_revenue_having",
    "orders_per_month",
    "part_avg_qty_subquery",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_token_stats",
    "doc_fingerprint",
    "ann_cosine_topk",
    "multimodal_features",
]


def main() -> None:
    entries = all_entries()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    names = [n for n in BENCH_QUERIES if n in entries]

    # Warmup: run each once at tiny scale (codegen + class loading).
    for name in names:
        fn, _ = entries[name]
        try:
            fn(spark, WARMUP_DIR).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        fn, _ = entries[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
