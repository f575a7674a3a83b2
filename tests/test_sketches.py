"""Misra-Gries heavy hitters: superset guarantee + exact, deterministic
output under adversarial partitionings.

The operator's contract (operators/sketches.py) is that the FINAL output
equals the exact set {item : freq > n/k} for ANY physical partitioning of
the input — the per-partition candidate sets may differ, but the
integer-exact recount filter erases that.  These tests drive skewed data
through hostile layouts (all-one-partition, item-clustered, round-robin)
and diff against a plain-Python exact count.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.operators import sketches as SK


def _zipf_tokens():
    # deterministic skew: token_i appears ~ N/(i+1) times
    toks = []
    for i in range(40):
        toks.extend([f"tok{i:02d}"] * (400 // (i + 1)))
    return toks


def _exact_hh(tokens, k):
    n = len(tokens)
    return {t: c for t, c in Counter(tokens).items() if c * k > n}


@pytest.mark.parametrize("k", [5, 20, 100])
@pytest.mark.parametrize("layout", ["single", "clustered", "roundrobin"])
def test_heavy_hitters_exact_any_partitioning(spark, k, layout):
    toks = _zipf_tokens()
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    if layout == "single":
        df = df.coalesce(1)
    elif layout == "clustered":
        # worst case for candidate locality: all copies of a token land
        # in the same partition
        df = df.repartition(8, "token")
    else:
        df = df.repartition(8)

    got = {
        r["token"]: r["cnt"]
        for r in SK.heavy_hitters(df, "token", k).collect()
    }
    assert got == _exact_hh(toks, k)


def test_candidates_are_superset(spark):
    toks = _zipf_tokens()
    df = spark.createDataFrame([(t,) for t in toks], "token string").repartition(8)
    k = 10
    cand = {
        r["token"]
        for r in SK.misra_gries_candidates(df, "token", k).distinct().collect()
    }
    assert set(_exact_hh(toks, k)) <= cand
    # bounded summary: at most partitions * k candidates survive
    assert len(cand) <= 8 * k


def test_no_heavy_hitters_when_uniform(spark):
    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "token string"
    ).repartition(4)
    assert SK.heavy_hitters(df, "token", 50).count() == 0


def test_total_shortcut_matches(spark):
    toks = _zipf_tokens()
    df = spark.createDataFrame([(t,) for t in toks], "token string").repartition(4)
    a = sorted(map(tuple, SK.heavy_hitters(df, "token", 8).collect()))
    b = sorted(
        map(tuple, SK.heavy_hitters(df, "token", 8, total=len(toks)).collect())
    )
    assert a == b


def test_plan_is_map_side(spark):
    """Candidate pass must be shuffle-free: mapInPandas straight over the
    scan, no Exchange below it."""
    df = spark.createDataFrame([("a",), ("b",)], "token string")
    plan = (
        SK.misra_gries_candidates(df, "token", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_grouped_topk_equals_window_plan(spark):
    """Candidate-pruned top-k must equal the naive window plan exactly,
    including under ties and hostile partitionings."""
    import random

    from pyspark.sql import Window

    from duckdb_webhook_gateway_spark.operators.sketches import grouped_topk

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(6)}", float(rng.randrange(20)), i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id bigint")
    for layout in (df.coalesce(1), df.repartition(8), df.repartition(8, "g")):
        got = sorted(
            map(
                tuple,
                grouped_topk(layout, ["g"], "v", 3, tiebreak="id").collect(),
            )
        )
        w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
        want = sorted(
            map(
                tuple,
                layout.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 3)
                .collect(),
            )
        )
        assert got == want


def test_grouped_topk_has_mapside_candidate_pass(spark):
    from duckdb_webhook_gateway_spark.operators.sketches import grouped_topk

    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, id bigint")
    plan = (
        grouped_topk(df, ["g"], "v", 2, tiebreak="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    # the rank window sorts candidates, not the scan: MapInPandas must sit
    # below the window's exchange
    assert plan.index("Window") < plan.index("MapInPandas")


# ---------------------------------------------------------------------------
# grouped HLL distinct
# ---------------------------------------------------------------------------


def test_hll_register_sum_partition_independent(spark):
    rows = [("g", f"v{i}") for i in range(3000)] + [
        ("h", f"v{i}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    one = {
        r["grp"]: (r["register_sum"], r["hll_estimate"])
        for r in SK.grouped_hll_distinct(df.repartition(1), "grp", "v").collect()
    }
    many = {
        r["grp"]: (r["register_sum"], r["hll_estimate"])
        for r in SK.grouped_hll_distinct(df.repartition(16), "grp", "v").collect()
    }
    assert one == many  # bit-exact: integer registers, order-free MAX/SUM


def test_hll_estimate_within_error_bound(spark):
    # m=256 -> stderr ~= 1.04/sqrt(256) = 6.5%; allow 4 sigma
    n = 5000
    df = spark.createDataFrame(
        [("g", f"key-{i}") for i in range(n)], "grp string, v string"
    )
    est = SK.grouped_hll_distinct(df, "grp", "v").collect()[0]["hll_estimate"]
    assert abs(est - n) / n < 0.26


def test_hll_duplicates_do_not_move_registers(spark):
    base = [("g", f"v{i}") for i in range(500)]
    df1 = spark.createDataFrame(base, "grp string, v string")
    df2 = spark.createDataFrame(base * 3, "grp string, v string")
    s1 = SK.grouped_hll_distinct(df1, "grp", "v").collect()[0]["register_sum"]
    s2 = SK.grouped_hll_distinct(df2, "grp", "v").collect()[0]["register_sum"]
    assert s1 == s2


def test_functional_dependencies_verdicts(spark):
    from duckdb_webhook_gateway_spark.operators.profile import (
        functional_dependencies,
    )

    rows = [
        ("a", 1, 10),  # x -> y holds (each x maps to one y)
        ("a", 1, 20),  # ...but x -> z fails (a maps to 10 and 20)
        ("b", 2, 30),
        ("b", 2, 30),
    ]
    df = spark.createDataFrame(rows, "x string, y int, z int")
    got = {
        (r["lhs"], r["rhs"]): r["holds"]
        for r in functional_dependencies(df, ["x", "y", "z"]).collect()
    }
    assert got[("x", "y")] is True
    assert got[("x", "z")] is False
    assert got[("y", "x")] is True   # 1<->a, 2<->b bijection
    # z values map 10->a, 20->a, 30->b: every z determines one x
    assert got[("z", "x")] is True


def test_grouped_topk_keeps_null_group(spark):
    rows = [(None, 9.0, 2), (None, 8.0, 3), ("a", 5.0, 1), (None, 7.0, 4)]
    df = spark.createDataFrame(rows, "g string, v double, id int")
    rows_out = [
        (r["g"], r["v"])
        for r in SK.grouped_topk(
            df.repartition(3), ["g"], "v", 2, tiebreak="id"
        ).collect()
    ]
    got = sorted(rows_out, key=lambda t: (t[0] or "", -t[1]))
    # the NULL group must surface its top-2 like any other group
    assert got == [(None, 9.0), (None, 8.0), ("a", 5.0)]


def test_heavy_hitters_bigint_items(spark):
    rows = [(7,)] * 50 + [(8,)] * 3 + [(9,)] * 2
    df = spark.createDataFrame(rows, "user_id bigint")
    got = {r["user_id"]: r["cnt"] for r in SK.heavy_hitters(df, "user_id", 4).collect()}
    assert got == {7: 50}  # only 7 exceeds 55/4; schema follows the column type


def test_kmv_ranked_matches_global_kmins(spark):
    import hashlib

    vals = [f"u{i}" for i in range(500)]
    hs = sorted(int(hashlib.md5(v.encode()).hexdigest()[:12], 16) for v in vals)
    df = spark.createDataFrame(
        [("g", int(hashlib.md5(v.encode()).hexdigest()[:12], 16)) for v in vals],
        "grp string, h long",
    ).repartition(16)
    got = (
        SK.kmv_ranked(df, ["grp"], k=64, shards=32)
        .filter("rn <= 64")
        .orderBy("rn")
        .collect()
    )
    # the sharded-partial merge must reproduce the TRUE global 64 smallest
    assert [r["h"] for r in got] == hs[:64]
    assert got[0]["cnt"] <= 32 * 64


def test_functional_dependencies_hostile_column_names(spark):
    # 'a_'+'b' vs 'a'+'_b' would collide under name-derived aliases;
    # positional aliases + escaped labels keep them distinct
    rows = [(1, 2, 3, 4)] * 3
    df = spark.createDataFrame(rows, "`a_` int, `b` int, `a` int, `_b` int")
    out = SK_profile_fd(df, ["a_", "b", "a", "_b"]).collect()
    assert len(out) == 12
    assert {(r["lhs"], r["rhs"]) for r in out} >= {("a_", "b"), ("a", "_b")}


def SK_profile_fd(df, cols):
    from duckdb_webhook_gateway_spark.operators.profile import (
        functional_dependencies,
    )

    return functional_dependencies(df, cols)


def test_mg_batch_tracks_null_items_like_row_rule(spark):
    """r13 review fix: pandas value_counts drops missing values, but the
    misra_gries_candidates superset contract covers a NULL item too —
    a stream where NULL's frequency exceeds n/k must surface a null
    candidate row, exactly as the row-at-a-time rule did."""
    from duckdb_webhook_gateway_spark.operators.sketches import (
        misra_gries_candidates,
    )

    rows = [(None,)] * 60 + [(f"t{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "token string").coalesce(1)
    cand = misra_gries_candidates(df, "token", 3).collect()
    assert any(r["token"] is None for r in cand)
