"""Paired Spark-vs-DuckDB timing for named workload queries.

Usage: SPARK_GRAFT_CPUS=32 python tools/paired_bench.py q1_pricing_summary ...

Protocol (the one BASELINE.md round-6 numbers use): ONE session pair at
$SPARK_GRAFT_SF_DIR (default sf0.1), per query — Spark warm (one sf0.001
run + GC, then min-of-2 timed), DuckDB warm (one full run, then min-of-2
timed), printed as {"query": {"spark": s, "duckdb": s, "ratio": r}}.
Both sides warm at full scale so neither min-of-2 lands in a JIT ramp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from duckdb_webhook_gateway_spark.session import get_spark
from duckdb_webhook_gateway_spark.workloads import all_entries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    names = sys.argv[1:]
    entries = all_entries()
    unknown = [n for n in names if n not in entries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        "paired",
        **{
            "spark.sql.adaptive.enabled": "false",
            # 8 is the sf0.1 sizing (see bench.py); sf1 runs size up via
            # the same partitions-sized-to-data rule.
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"
            ),
            # single-file-per-table local data: see bench.py — without
            # this the sf1 fact scans run 1-2 tasks wide while DuckDB
            # reads row groups on all 32 threads, and the pairing
            # measures scan-split policy instead of plan quality.
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
            ),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm_system = spark.sparkContext._jvm.System

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    # Cap the oracle's spill: at sf1 several quadratic oracles (naive
    # shingle-pair enumeration, all-pairs cosine) otherwise fill the
    # disk with temp blocks — one run wrote 80+ GB before dying and took
    # the host's free space with it.  A capped oracle raises instead and
    # is recorded as DNF below, which IS the measurement.
    con.execute("SET memory_limit='40GB'")
    con.execute("SET max_temp_directory_size='15GB'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    out = {}
    for name in names:
        fn, sql = entries[name]
        try:
            fn(spark, WARM).count()
        except Exception:
            pass
        fn(spark, SF_DIR).count()  # full-scale warm (JIT tier-up)
        jvm_system.gc()
        ss = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            ss.append(time.perf_counter() - t0)
        s = min(ss)
        if sql is None:
            out[name] = {"spark": round(s, 3), "duckdb": None, "ratio": None}
            print(name, out[name], flush=True)
            continue
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()  # full-scale warm
            warm_d = time.perf_counter() - t0
            if warm_d > 100:
                # one timed pass is the evidence at this cost; a second
                # would double a multi-minute oracle for nothing
                ds = [warm_d]
            else:
                ds = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    ds.append(time.perf_counter() - t0)
        except Exception as e:  # OOM / temp-cap: the oracle DNF'd
            out[name] = {
                "spark": round(s, 3),
                "duckdb": f"DNF: {str(e)[:120]}",
                "ratio": None,
            }
            print(name, out[name], flush=True)
            continue
        d = min(ds)
        out[name] = {
            "spark": round(s, 3),
            "duckdb": round(d, 3),
            "ratio": round(s / d, 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
