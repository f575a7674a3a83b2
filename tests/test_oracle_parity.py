"""Differential correctness: every queries() entry vs its DuckDB oracle.

Mirrors the driver's t2 gate: same parquet inputs, row-count + column-name
+ order-insensitive value comparison.  Runs at sf0.001 by default for
speed; set SPARK_GRAFT_PARITY_SF=sf0.01 to match the driver exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from conftest import TESTDATA

SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "sf0.001")
SF_DIR = os.path.join(TESTDATA, SF)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402

ALL = sorted(entry_mod.queries().keys())
ORACLES = entry_mod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: stable text for floats
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", ALL)
def test_parity(spark, oracle_con, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    spark_cols = list(df.columns)
    spark_rows = [tuple(r) for r in df.collect()]

    assert name in ORACLES, f"no oracle for {name} (rows-only check)"
    res = oracle_con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sset = _rowset(spark_cols, spark_rows)
    dset = _rowset(duck_cols, duck_rows)
    if sset != dset:
        diffs = [
            (a, b) for a, b in zip(sset, dset) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "l_returnflag"
