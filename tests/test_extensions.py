"""UDTF + applyInPandas extension points (beyond-reference surface)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.functions.extensions import (
    grouped_zscore,
    register_json_kv_udtf,
)


def test_json_kv_udtf(spark):
    register_json_kv_udtf(spark)
    rows = spark.sql(
        """SELECT key, value_json FROM json_kv('{"a": 1, "b": {"c": 2}}') ORDER BY key"""
    ).collect()
    assert [(r.key, r.value_json) for r in rows] == [("a", "1"), ("b", '{"c": 2}')]


def test_json_kv_udtf_lateral_join(spark):
    register_json_kv_udtf(spark)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(5)
    ev.createOrReplaceTempView("ev5")
    rows = spark.sql(
        "SELECT e.event_id, kv.key, kv.value_json "
        "FROM ev5 e, LATERAL json_kv(e.props) kv"
    ).collect()
    assert len(rows) == 5
    assert all(r.key == "k" for r in rows)


def test_grouped_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        ["g", "v"],
    )
    out = {(r.g, r.v): r.zscore for r in grouped_zscore(df, "g", "v").collect()}
    assert abs(out[("a", 2.0)]) < 1e-9  # group mean
    assert math.isclose(out[("a", 3.0)], 1.224745, abs_tol=1e-5)
    assert out[("b", 10.0)] == 0.0  # zero-variance group


def test_asof_join_backward_semantics(spark):
    """Backward as-of: greatest right ts <= left ts per key; equal ts
    matches; no earlier right row -> null."""
    from duckdb_webhook_gateway_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
        ["k", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, 100, "c1"), (1, 200, "c2"), (2, 60, "c3")],
        ["k", "ts", "cid"],
    )
    out = {
        r.pid: r.cid
        for r in asof_join_backward(left, right, "k", "ts", ["cid"]).collect()
    }
    assert out == {"p1": "c1", "p2": "c2", "p3": None}
