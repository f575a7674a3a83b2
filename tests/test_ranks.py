"""global_ntile (operators/ranks.py) == F.ntile over a single-task
global window, on corpora designed to stress the composition:

- random values with duplicates (the tie-break key decides),
- n not divisible by n_tiles (first r tiles one row larger),
- n < n_tiles (every tile size 0/1),
- heavy duplication of the primary sort key (the range partitioner can
  only balance because the tie-break makes the composite key unique),
- stability under different partition counts (rank must be independent
  of the physical layout).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.operators.ranks import global_ntile


def _reference(spark, rows, n_tiles):
    df = spark.createDataFrame(rows, "id bigint, v double")
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    return {
        r["id"]: r["t"]
        for r in df.withColumn("t", F.ntile(n_tiles).over(w)).collect()
    }


def _composed(spark, rows, n_tiles, shuffle=None):
    df = spark.createDataFrame(rows, "id bigint, v double")
    if shuffle is not None:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        try:
            out = global_ntile(
                df, n_tiles, [F.desc("v"), F.asc("id")], "t"
            ).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    else:
        out = global_ntile(
            df, n_tiles, [F.desc("v"), F.asc("id")], "t"
        ).collect()
    return {r["id"]: r["t"] for r in out}


@pytest.mark.parametrize("seed,n,n_tiles", [
    (7, 200, 4),
    (11, 199, 4),     # not divisible: first 3 tiles one larger
    (13, 1000, 10),
    (17, 3, 10),      # n < tiles
    (19, 1, 4),
    (23, 500, 7),
])
def test_global_ntile_matches_window_ntile(spark, seed, n, n_tiles):
    rng = random.Random(seed)
    rows = [(i, round(rng.random() * 10, 1)) for i in range(n)]  # dups in v
    assert _composed(spark, rows, n_tiles) == _reference(
        spark, rows, n_tiles
    )


def test_global_ntile_constant_key_balanced_by_tiebreak(spark):
    # every v identical: the composite (v, id) order is still total, so
    # the range partitioner splits on id and no task sorts everything
    rows = [(i, 1.0) for i in range(400)]
    assert _composed(spark, rows, 4) == _reference(spark, rows, 4)


@pytest.mark.parametrize("shuffle", [1, 3, 16])
def test_global_ntile_partitioning_invariant(spark, shuffle):
    rng = random.Random(31)
    rows = [(i, round(rng.random() * 5, 1)) for i in range(137)]
    assert _composed(spark, rows, 4, shuffle=shuffle) == _reference(
        spark, rows, 4
    )


def test_global_ntile_empty(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    out = global_ntile(df, 4, [F.desc("v"), F.asc("id")], "t")
    assert out.count() == 0
    assert out.schema["t"].dataType.typeName() == "integer"


def test_global_ntile_small_input_routes_to_plain_window(spark):
    # metadata routing: a statable-small source keeps the plain window
    # (identical assignment, no checkpoint/collect); unknown or large
    # bytes take the range composition (the scale-safe default)
    rows = [(i, float(i % 9)) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    order = [F.desc("v"), F.asc("id")]
    small = global_ntile(df, 4, order, "t", input_bytes=1024)
    assert "ntile(4)" in small._jdf.queryExecution().executedPlan().toString()
    big = global_ntile(df, 4, order, "t", input_bytes=1 << 40)
    assert "Scan ExistingRDD" in (
        big._jdf.queryExecution().executedPlan().toString()
    )
    # both routes produce the identical assignment
    assert {r["id"]: r["t"] for r in small.collect()} == {
        r["id"]: r["t"] for r in big.collect()
    }


# -- global_quantiles -------------------------------------------------------

from duckdb_webhook_gateway_spark.operators.ranks import global_quantiles


def _q_reference(spark, rows, fracs):
    df = spark.createDataFrame(rows, "id bigint, v double")
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    ranked = df.withColumn("rnk", F.row_number().over(w)).collect()
    n = len(ranked)
    by_rank = {r["rnk"]: (r["id"], r["v"]) for r in ranked}
    out = set()
    for num, den in fracs:
        r = (n * num + den - 1) // den
        if 1 <= r <= n:
            out.add((num / den, r, *by_rank[r]))
    return out


@pytest.mark.parametrize("seed,n", [(3, 500), (5, 37), (7, 1)])
def test_global_quantiles_matches_reference(spark, seed, n):
    rng = random.Random(seed)
    rows = [(i, round(rng.random() * 7, 1)) for i in range(n)]  # dup values
    fracs = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
    for ib in (None, 1024):  # scale path and plain-window route
        got = {
            (r["quantile"], r["value_rank"], r["id"], r["v"])
            for r in global_quantiles(
                spark.createDataFrame(rows, "id bigint, v double"),
                [F.asc("v"), F.asc("id")],
                fracs,
                input_bytes=ib,
            ).collect()
        }
        assert got == _q_reference(spark, rows, fracs), (ib, n)


def test_global_quantiles_empty_and_out_of_range(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    out = global_quantiles(df, [F.asc("v"), F.asc("id")], [(1, 2)])
    assert out.count() == 0
    assert out.columns == ["quantile", "value_rank", "id", "v"]


def test_global_quantiles_prunes_nontarget_partitions(spark):
    # the scale path must touch ONLY partitions holding a target rank:
    # since the round-13 in-plan rewrite the prune is a broadcast hash
    # join on the partition id (the hashed relation holds just the
    # crossing targets, so every other partition's rows drop map-side)
    # and the cutoff is the rank equality fused into that join — no
    # window function and no driver collect anywhere in the scale path
    rows = [(i, float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, v double").repartition(8)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = global_quantiles(
            df, [F.asc("v"), F.asc("id")], [(1, 2)], input_bytes=1 << 40
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        assert re.search(
            r"BroadcastHashJoin \[_gq_pid#\d+", plan
        ), plan
        # no data-cardinality window: the only windowspec allowed is the
        # partition-count offset scan (ordered by the pid, <= shuffle
        # partitions rows)
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "_gq_pid" in spec, spec
        assert "row_number" not in plan
        rows_out = out.collect()
        assert len(rows_out) == 1 and rows_out[0]["value_rank"] == 1000
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


# -- global_cumulative_cutoff ----------------------------------------------

from duckdb_webhook_gateway_spark.operators.ranks import (
    global_cumulative_cutoff,
)


def _c_reference(rows, fracs):
    # rows: (id, weight); order: weight desc, id asc
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    total = sum(w for _, w in ordered)
    out = set()
    for num, den in fracs:
        t = (total * num + den - 1) // den
        if not (0 < t <= total):
            continue
        cum = 0
        for rank, (i, w) in enumerate(ordered, start=1):
            cum += w
            if cum >= t:
                out.add((num / den, rank, cum, i, w))
                break
    return out


@pytest.mark.parametrize("seed,n", [(101, 300), (103, 12), (107, 1)])
def test_cumulative_cutoff_matches_reference(spark, seed, n):
    rng = random.Random(seed)
    # integer weights with duplicates and zeros (zero-weight rows must
    # never be picked as a crossing row)
    rows = [(i, rng.randrange(0, 9)) for i in range(n)]
    if all(w == 0 for _, w in rows):
        rows[0] = (0, 5)
    fracs = [(1, 2), (9, 10), (99, 100), (1, 1)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = {
        (r["coverage"], r["cutoff_rank"], r["cum_weight"], r["id"], r["w"])
        for r in global_cumulative_cutoff(
            df, [F.desc("w"), F.asc("id")], "w", fracs
        ).collect()
    }
    assert got == _c_reference(rows, fracs), (seed, n)


@pytest.mark.parametrize("shuffle", [1, 3, 16])
def test_cumulative_cutoff_partitioning_invariant(spark, shuffle):
    rng = random.Random(113)
    rows = [(i, rng.randrange(1, 50)) for i in range(211)]
    fracs = [(1, 2), (3, 4)]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    try:
        df = spark.createDataFrame(rows, "id bigint, w bigint")
        got = {
            (r["coverage"], r["cutoff_rank"], r["cum_weight"], r["id"])
            for r in global_cumulative_cutoff(
                df, [F.desc("w"), F.asc("id")], "w", fracs
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == {
        (c, r, cw, i) for c, r, cw, i, _ in _c_reference(rows, fracs)
    }


def test_cumulative_cutoff_empty(spark):
    df = spark.createDataFrame([], "id bigint, w bigint")
    out = global_cumulative_cutoff(df, [F.desc("w"), F.asc("id")], "w", [(1, 2)])
    assert out.count() == 0
    assert out.columns == ["coverage", "cutoff_rank", "cum_weight", "id", "w"]


def test_cumulative_cutoff_small_route_matches_scale_route(spark):
    rng = random.Random(131)
    rows = [(i, rng.randrange(0, 20)) for i in range(400)]
    rows[0] = (0, 3)
    fracs = [(1, 2), (9, 10), (1, 1)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    order = [F.desc("w"), F.asc("id")]
    small = global_cumulative_cutoff(
        df, order, "w", fracs, input_bytes=1024
    )
    assert "ntile" not in small._jdf.queryExecution().executedPlan().toString()
    got_small = {
        (r["coverage"], r["cutoff_rank"], r["cum_weight"], r["id"])
        for r in small.collect()
    }
    got_scale = {
        (r["coverage"], r["cutoff_rank"], r["cum_weight"], r["id"])
        for r in global_cumulative_cutoff(
            df, order, "w", fracs, input_bytes=1 << 40
        ).collect()
    }
    assert got_small == got_scale == {
        (c, r, cw, i) for c, r, cw, i, _ in _c_reference(rows, fracs)
    }


def test_empty_fracs_returns_typed_empty_on_both_routes(spark):
    # r13 review fix: the in-plan rewrite builds F.array(*fracs), and a
    # zero-element array is VOID-typed (struct extraction raises) — an
    # empty fracs list must keep the pre-r13 typed-empty contract on
    # both operators and both routes
    df = spark.createDataFrame([(1, 2.0, 3)], "id bigint, v double, w bigint")
    for ib in (None, 1024):
        q = global_quantiles(df, [F.asc("v"), F.asc("id")], [], input_bytes=ib)
        assert q.count() == 0
        assert q.columns == ["quantile", "value_rank", "id", "v", "w"]
        c = global_cumulative_cutoff(
            df, [F.desc("w"), F.asc("id")], "w", [], input_bytes=ib
        )
        assert c.count() == 0
        assert c.columns == [
            "coverage", "cutoff_rank", "cum_weight", "id", "v", "w",
        ]
