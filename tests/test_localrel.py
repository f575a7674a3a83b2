"""plans/localrel.py::local_df — the Arrow-local literal relation.

Load-bearing since r14: catalog views, rank picks, PQ codebooks, the
IVF layout sidecar and the sqlite_master shim all ride it.  Contracts:
(a) the plan is a LocalTableScan (never a pickled Python RDD scan),
(b) tuples and dicts round-trip typed values exactly (arrays,
timestamps, nullable strings), (c) empty rows keep the typed-empty
path, (d) DDL strings and StructType schemas are interchangeable.
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from duckdb_webhook_gateway_spark.plans.localrel import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tuples_yield_local_table_scan(spark):
    df = local_df(
        spark,
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "id bigint, v array<double>",
    )
    assert "LocalTableScan" in _plan(df)
    assert "ExistingRDD" not in _plan(df)
    rows = {(r["id"], tuple(r["v"])) for r in df.collect()}
    assert rows == {(1, (1.0, 2.0)), (2, (3.0, 4.0))}


def test_dict_rows_align_by_name_with_nullable_gaps(spark):
    st = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("owner", T.StringType(), True),
            T.StructField("created_at", T.TimestampType(), True),
        ]
    )
    ts = datetime.datetime(2026, 8, 17, 1, 2, 3)
    rows = [
        {"id": "a", "owner": None, "created_at": ts},
        {"id": "b", "owner": "o", "created_at": None},
    ]
    df = local_df(spark, rows, st)
    assert "LocalTableScan" in _plan(df)
    got = {(r["id"], r["owner"], r["created_at"]) for r in df.collect()}
    assert got == {("a", None, ts), ("b", "o", None)}


def test_empty_rows_keep_typed_empty(spark):
    df = local_df(spark, [], "a int, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_structtype_and_ddl_agree(spark):
    st = T.StructType([T.StructField("x", T.LongType(), True)])
    a = local_df(spark, [(7,)], st)
    b = local_df(spark, [(7,)], "x bigint")
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_generator_rows_accepted(spark):
    df = local_df(spark, ((i, i * 2) for i in range(3)), "a bigint, b bigint")
    assert {(r["a"], r["b"]) for r in df.collect()} == {(0, 0), (1, 2), (2, 4)}
