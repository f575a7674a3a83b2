"""The driver contract must work under a SparkSession the DRIVER builds —
none of our session.py defaults can be assumed (the nanos-timestamp conf
in particular is load-bearing for the events table)."""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("vanilla")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
assert e.entry(spark).count() > 0
qs = e.queries()
assert qs["events_json_bucket"](spark, "/root/testdata/sf0.001").count() > 0
assert qs["events_recent_topk"](spark, "/root/testdata/sf0.001").count() > 0
# TIMESTAMP_NTZ regression: a vanilla Spark 4 session reads the naive
# parquet ts as NTZ (inferTimestampNTZ on), which unix_micros rejects —
# every epoch-arithmetic query must run under that dtype (functions.epoch_us).
ts_type = dict(spark.read.parquet("/root/testdata/sf0.001/events.parquet").dtypes)["ts"]
assert ts_type == "timestamp_ntz", ts_type
for q in ("events_sessionize", "events_cohort_retention", "events_asof_attribution",
          "events_hopping_windows", "events_hourly_gapfill",
          "events_markov_transitions", "events_range_join"):
    assert qs[q](spark, "/root/testdata/sf0.001").count() > 0, q
print("VANILLA_OK")
"""


def test_driver_contract_under_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "VANILLA_OK" in out.stdout, out.stderr[-2000:]


def test_session_defaults_pin_utc_timezone(spark):
    """The LTZ->NTZ wall-clock recovery (functions.epoch_us, the
    streaming replay bridges) matches the DuckDB oracle's naive
    timestamps only under a UTC session timezone — session.py pins it
    so the contract is host-independent (ADVICE r11)."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
