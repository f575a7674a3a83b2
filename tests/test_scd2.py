"""SCD Type 2 operator: merge == rebuild, version semantics, plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from duckdb_webhook_gateway_spark.operators.scd import (
    scd2_from_events,
    scd2_merge,
)

SCHEMA = "k bigint, state string, ts timestamp, id bigint"


def _df(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [(k, s, dt.datetime(2026, 1, 1) + dt.timedelta(days=d), i) for k, s, d, i in rows],
        SCHEMA,
    )


def _rows(df):
    return sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"], r["version"])
        for r in df.collect()
    )


def test_merge_equals_rebuild_random_streams(spark):
    rng = random.Random(42)
    rows = []
    for i in range(300):
        rows.append((rng.randrange(12), f"s{rng.randrange(4)}", rng.randrange(200), i))
    cut = 120
    past = [r for r in rows if r[2] < cut]
    future = [r for r in rows if r[2] >= cut]
    base = scd2_from_events(_df(spark, past), "k", "state", "ts", "id")
    merged = scd2_merge(base, _df(spark, future), "k", "state", "ts", "id")
    full = scd2_from_events(_df(spark, rows), "k", "state", "ts", "id")
    assert _rows(merged) == _rows(full)


def test_same_state_batch_extends_current_run(spark):
    base = scd2_from_events(
        _df(spark, [(1, "a", 0, 0), (1, "b", 10, 1)]), "k", "state", "ts", "id"
    )
    merged = scd2_merge(
        base, _df(spark, [(1, "b", 20, 2)]), "k", "state", "ts", "id"
    )
    got = _rows(merged)
    # still exactly two versions; the current run absorbed the event
    assert len(got) == 2
    assert got[1][1] == "b" and got[1][4] is True and got[1][5] == 2


def test_state_change_closes_out_current_version(spark):
    import datetime as dt

    base = scd2_from_events(_df(spark, [(1, "a", 0, 0)]), "k", "state", "ts", "id")
    merged = scd2_merge(
        base, _df(spark, [(1, "b", 5, 1)]), "k", "state", "ts", "id"
    )
    got = _rows(merged)
    assert len(got) == 2
    old, new = got
    assert old[1] == "a" and old[4] is False
    assert old[3] == dt.datetime(2026, 1, 6)  # closed at the new run's start
    assert new[1] == "b" and new[4] is True


def test_new_key_in_batch_gets_fresh_history(spark):
    base = scd2_from_events(_df(spark, [(1, "a", 0, 0)]), "k", "state", "ts", "id")
    merged = scd2_merge(
        base, _df(spark, [(2, "x", 5, 1)]), "k", "state", "ts", "id"
    )
    got = _rows(merged)
    assert [(r[0], r[1], r[5]) for r in got] == [(1, "a", 1), (2, "x", 1)]


def test_untouched_keys_pass_through_broadcast_anti(spark):
    """The dimension side must never shuffle: batch keys broadcast into
    both the anti (pass-through) and semi (rebuild) probes."""
    base = scd2_from_events(
        _df(spark, [(i, "a", 0, i) for i in range(10)]), "k", "state", "ts", "id"
    )
    merged = scd2_merge(
        base, _df(spark, [(1, "b", 5, 99)]), "k", "state", "ts", "id"
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan
