"""Slowly-changing-dimension (Type 2) maintenance as a Spark operator.

A training/analytics pipeline that re-ingests mutable upstream entities
(users, sources, licensing states) needs versioned history: one row per
(key, state-run) with ``valid_from`` / ``valid_to`` / ``is_current``.
The reference's closest machinery is replace-on-reupload reference tables
(/root/reference/src/app.py CTAS path); SCD2 is the beyond-reference
extension that keeps history instead of overwriting.

Two entry points:

- ``scd2_from_events``: full rebuild — collapse an event stream into
  state runs (gaps-and-islands) per key.
- ``scd2_merge``: incremental maintenance — apply a batch of new events
  to an existing dimension.  Only keys PRESENT IN THE BATCH are rebuilt
  (their history unrolled back into synthetic events and re-collapsed
  with the new events); untouched keys pass through via a broadcast
  anti-join against the batch's key list.  At 100 TB this is the whole
  point: the nightly delta is small, so the merge cost is
  O(delta keys' history), not O(dimension).

Correctness contract (pinned by the oracle and tests/test_scd2.py):
``scd2_merge(scd2_from_events(past), future) == scd2_from_events(all)``
whenever every batch event is strictly later than every base event —
run-collapse is associative under time-ordered concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: synthetic tiebreak for events unrolled from dimension rows: orders
#: them by version among same-timestamp run starts and below any real
#: event id (real ids are non-negative).
_DIM_EVENT_ID_BASE = -1_000_000_000


def scd2_from_events(
    events: DataFrame,
    key: str,
    state: str,
    ts: str,
    id_col: str,
) -> DataFrame:
    """Collapse an event stream into SCD2 version rows.

    ``id_col`` breaks same-timestamp ties deterministically.  Output:
    ``key, state, valid_from, valid_to, is_current, version`` where
    ``version`` is the 1-based run index per key.
    """
    w = Window.partitionBy(key).orderBy(ts, id_col)
    changed = (
        events.withColumn("_prev", F.lag(state).over(w))
        # first event or state flip starts a new run; NULL-safe compare
        .filter(~F.col("_prev").eqNullSafe(F.col(state)))
        .drop("_prev")
    )
    # the same (ts, id) ordering drives run detection above and the
    # version numbering below — one spec, no chance of divergence
    return changed.select(
        key,
        state,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


def scd2_merge(
    dim: DataFrame,
    events: DataFrame,
    key: str,
    state: str,
    ts: str,
    id_col: str,
) -> DataFrame:
    """Apply a batch of new events to an existing SCD2 dimension.

    Every event in ``events`` must be strictly later than every event
    that built ``dim`` (a cutoff-partitioned ingest guarantees this).
    Keys absent from the batch are passed through untouched (broadcast
    anti-join — the batch key list is delta-sized); batch keys have
    their stored versions unrolled into synthetic events and re-collapsed
    together with the new events, which both extends still-current runs
    (same state → no new version) and closes out changed ones.
    """
    from pyspark.sql import types as T

    # the synthetic unroll ids below are BIGINT; a string id column would
    # coerce them to strings and break the same-timestamp tiebreak
    # ORDERING lexicographically ("-999999999" > "-999999998") — fail
    # loudly instead of silently re-collapsing runs in the wrong order
    id_type = events.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"scd2_merge requires an integral id_col for deterministic "
            f"tie-breaking against its synthetic unroll ids; got "
            f"{id_type.simpleString()!r} — map string event ids to a "
            f"monotonic integer first"
        )
    batch_keys = events.select(key).distinct()
    untouched = dim.join(F.broadcast(batch_keys), key, "left_anti")
    unrolled = dim.join(F.broadcast(batch_keys), key, "left_semi").select(
        key,
        state,
        F.col("valid_from").alias(ts),
        (F.lit(_DIM_EVENT_ID_BASE) + F.col("version")).alias(id_col),
    )
    merged_events = unrolled.unionByName(
        events.select(key, state, ts, id_col)
    )
    rebuilt = scd2_from_events(merged_events, key, state, ts, id_col)
    return untouched.unionByName(rebuilt)
