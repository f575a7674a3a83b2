"""Decompose the streaming replay queries' wall time into phases.

Round 14 fourth-session probe for the one "Not yet optimized" item with
real bench weight: `streaming_user_sessions` (~1.6 s) and
`streaming_dedup_events` (~1.3 s) pay a fixed per-drain cost whose split
(JSON landing write vs micro-batch drain vs post-drain ordering) decides
whether any further lever exists:

- If the drain dominates and runs >1 micro-batch, batch-count is the lever.
- If checkpoint/state-store file I/O dominates (temp checkpoint lives on
  ext4 /tmp here), placement is the lever.
- If it is all planning/scheduling floor, the item stays closed (the r14
  second session already measured parquet-vs-JSON landing a wash and the
  x10-volume probe showed the fixed cost amortizing).

Usage:  SPARK_GRAFT_CPUS=32 python tools/probe_streaming_drain.py [sf_dir]
Prints per-phase seconds (min over ROUNDS after one warmup drain) and the
micro-batch count/durations from the streaming query's progress log.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_webhook_gateway_spark.session import get_spark  # noqa: E402
from duckdb_webhook_gateway_spark.workloads.datapipe import read_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = 3


def phase_sessions(spark, landing_root=None, ckpt_root=None):
    """replay_user_sessions split into its three phases (same code path,
    instrumented; values are discarded — this is a timing probe only)."""
    import shutil
    import tempfile
    import uuid

    ev = read_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    landing = tempfile.mkdtemp(prefix="probe_sessions_", dir=landing_root)
    ntz_us = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    t0 = time.perf_counter()
    ev.coalesce(4).write.mode("overwrite").option(
        "timestampNTZFormat", ntz_us
    ).json(landing)
    t_land = time.perf_counter() - t0

    stream = (
        spark.readStream.schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP_NTZ")
        .option("timestampNTZFormat", ntz_us)
        .json(landing)
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    name = "probe_sess_" + uuid.uuid4().hex[:8]
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    ckpt = None
    if ckpt_root is not None:
        ckpt = tempfile.mkdtemp(prefix="probe_ckpt_", dir=ckpt_root)
        writer = writer.option("checkpointLocation", ckpt)
    t0 = time.perf_counter()
    q = writer.start()
    t_start = time.perf_counter() - t0
    t0 = time.perf_counter()
    q.awaitTermination()
    t_drain = time.perf_counter() - t0
    batches = [
        (p["batchId"], p["durationMs"]) for p in (q.recentProgress or [])
    ]
    q.stop()

    t0 = time.perf_counter()
    spark.table(name).orderBy("user_id", "session_start").localCheckpoint(
        eager=True
    ).count()
    t_post = time.perf_counter() - t0
    spark.catalog.dropTempView(name)
    shutil.rmtree(landing, ignore_errors=True)
    if ckpt is not None:
        shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "land": t_land,
        "start": t_start,
        "drain": t_drain,
        "post": t_post,
        "batches": batches,
    }


def main() -> None:
    spark = get_spark(
        "probe-streaming",
        **{
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    variants = [
        ("all-tmp-ext4", None, None),
        ("land-shm", "/dev/shm", None),
        ("ckpt-shm", None, "/dev/shm"),
        ("both-shm", "/dev/shm", "/dev/shm"),
    ]
    for label, land_root, ckpt_root in variants:
        phase_sessions(spark, land_root, ckpt_root)  # warmup
        best = None
        for _ in range(ROUNDS):
            r = phase_sessions(spark, land_root, ckpt_root)
            if best is None or (r["land"] + r["drain"] + r["post"]) < (
                best["land"] + best["drain"] + best["post"]
            ):
                best = r
        print(
            f"{label}: land={best['land']:.3f} start={best['start']:.3f} "
            f"drain={best['drain']:.3f} post={best['post']:.3f} "
            f"batches={best['batches']}"
        )


if __name__ == "__main__":
    main()
