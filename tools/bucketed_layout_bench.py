"""Bucketed-layout demonstration: the q5-class fact exchange is
removable only by LAYOUT, and bucketing removes it.

BASELINE round 9 decomposes q5_region_revenue's sf1 remainder to the
lineitem⋈orders exchange itself (~1.0 s of 1.5 s; equal under every
join strategy).  That exchange is not a plan defect — it is the cost of
co-locating join keys at query time.  The 100 TB answer is to co-locate
at WRITE time: bucket both fact tables by the join key with the same
bucket count (operators/joins.py::write_bucketed), and the join's
ClusteredDistribution requirement is satisfied straight off the scan —
no Exchange on either side, on any cluster size.

Usage: SPARK_GRAFT_CPUS=32 python tools/bucketed_layout_bench.py [sf_dir]

Materializes bucketed copies of orders/lineitem (one-time write cost,
reported), then times the q3/q5 join spines parquet-vs-bucketed in one
session and verifies from the physical plan that the bucketed variants
scan with ZERO exchanges below the join.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.operators.joins import write_bucketed
from duckdb_webhook_gateway_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _spine(orders, lineitem):
    """The q3/q5 fact spine: orders⋈lineitem on orderkey + group-agg."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _timed(mk, reps: int = 3) -> float:
    mk().count()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        mk().count()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    wh = tempfile.mkdtemp(prefix="bucketed_wh_")
    spark = get_spark(
        "bucketed-layout",
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.warehouse.dir": wh,
            "spark.ui.showConsoleProgress": "false",
            # the point of the demo: the join must NOT fall back to
            # broadcasting the orders side at small scale
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        orders_pq = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li_pq = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

        t0 = time.perf_counter()
        write_bucketed(
            orders_pq, "orders_b", ["o_orderkey"], 32, ["o_orderkey"]
        )
        write_bucketed(
            li_pq, "lineitem_b", ["l_orderkey"], 32, ["l_orderkey"]
        )
        write_cost = time.perf_counter() - t0
        orders_b = spark.table("orders_b")
        li_b = spark.table("lineitem_b")

        plan_b = (
            _spine(orders_b, li_b)._jdf.queryExecution().executedPlan().toString()
        )
        join_part = plan_b[plan_b.index("Join"):]
        n_exchanges_below_join = join_part.count("Exchange")
        plain = _timed(lambda: _spine(orders_pq, li_pq))
        bucketed = _timed(lambda: _spine(orders_b, li_b))
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "one_time_bucketed_write_s": round(write_cost, 2),
                    "spine_parquet_s": round(plain, 3),
                    "spine_bucketed_s": round(bucketed, 3),
                    "exchanges_below_join_bucketed": n_exchanges_below_join,
                    "exchange_free": n_exchanges_below_join == 0,
                }
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
