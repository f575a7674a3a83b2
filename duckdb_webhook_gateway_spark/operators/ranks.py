"""Scale-safe EXACT global ranking: ntile over a total order without a
single-task window.

``F.ntile(n).over(Window.orderBy(...))`` (no partitionBy) compiles to a
physical plan with ONE partition: the entire relation is shuffled onto a
single task, sorted there, and numbered — the canonical 100 TB
scale-killer.  DuckDB parallelizes the same SQL with a morsel-driven
shared sort, so the semantics are portable; only Spark's window
execution makes the naive form unscalable.

``global_ntile`` computes the identical assignment (SQL ntile semantics:
``n`` buckets over the total order, the first ``N mod n`` buckets one
row larger) from a composition that never materializes the total order
on one task:

1. ``repartitionByRange`` on the sort key — contiguous, disjoint key
   ranges per partition (a sampled range partitioner; sampling only
   moves partition BOUNDARIES, never the total order itself).
2. A per-partition ``row_number`` window keyed on
   ``spark_partition_id()`` — each task sorts only its own range.
3. The ranked relation is materialized ONCE (``localCheckpoint``).
   This is load-bearing for correctness, not just speed: the range
   partitioner's reservoir sample is seeded per-RDD, so two separate
   actions over the same lineage may pick DIFFERENT boundaries — the
   per-partition counts and the main pass must read the same physical
   partitioning or the offsets silently misalign.
4. Per-partition row counts, collected to the driver.  This collect is
   PARTITION-cardinality (== spark.sql.shuffle.partitions), not data
   cardinality — the same bounded-collect class as the repo's
   convergence checks.
5. global rank = (cumulative offset of the row's partition) + local
   rank, attached with a broadcast join on the partition id; the tile
   follows from the exact integer ntile formula (DIV arithmetic — no
   float ever decides a bucket).

Two shuffles of the projected relation (range, then pid-hash for the
window) replace the one-task global sort; every stage is bounded by
partition size, so the shape survives any scale-up.  The pid-hash
shuffle could be elided with an RDD ``zipWithIndex`` but that drops to
row-at-a-time Python; both shuffles stay whole-stage-codegen JVM.

Determinism: callers must pass a TOTAL order (unique tie-break key,
house rule), which makes rank — and therefore the tile — independent of
partitioning and of the range partitioner's sampling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Below this SOURCE size the one-task window is not a hazard (a single
# task routinely processes a 128 MB scan split) and the range
# composition's fixed cost (checkpoint + counts job + two shuffles,
# ~0.6 s locally) buys nothing — route to the plain window.  Same
# metadata-driven auto-routing contract as similarity.py's
# EXACT_NEAR_DUP_CEILING: callers pass what they cheaply know
# (parquet footer/file bytes); unknown means assume big, the safe
# direction at scale.
SMALL_INPUT_CEILING = 16 * 1024 * 1024


def global_ntile(
    rel: DataFrame,
    n_tiles: int,
    order: Sequence[Column],
    tile_col: str = "tile",
    input_bytes: int | None = None,
    small_input_ceiling: int = SMALL_INPUT_CEILING,
) -> DataFrame:
    """Attach SQL-exact ``ntile(n_tiles)`` over the global ``order``.

    ``order`` must be a total order (include a unique tie-break).
    Returns ``rel`` plus ``tile_col`` (int); row identity is preserved.
    ``input_bytes`` (optional): statable size of the SOURCE feeding
    ``rel`` (``plans/spread.py::scan_bytes``) — at or under
    ``small_input_ceiling`` the plain single-task window runs instead
    (identical result; the assignment is order-determined either way).
    """
    spark = rel.sparkSession
    if input_bytes is not None and input_bytes <= small_input_ceiling:
        w = Window.orderBy(*order)
        return rel.withColumn(
            tile_col, F.ntile(n_tiles).over(w).cast("int")
        )
    num = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = rel.repartitionByRange(num, *order).withColumn(
        "_gnt_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_gnt_lrank",
        F.row_number().over(
            Window.partitionBy("_gnt_pid").orderBy(*order)
        ),
    ).localCheckpoint(eager=True)  # pin ONE range sampling (see module doc)
    counts = sorted(
        (r["_gnt_pid"], r["n"])
        for r in local.groupBy("_gnt_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(c for _, c in counts)
    if total == 0:  # empty input: preserve schema, no rows
        return rel.withColumn(tile_col, F.lit(None).cast("int"))
    offsets = []
    acc = 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets, "_gnt_pid int, _gnt_off bigint")
    q, r = divmod(total, n_tiles)
    # SQL ntile: first r tiles have q+1 rows, the rest q.  All-integer
    # DIV arithmetic; the ELSE divisor q is only reachable when q > 0
    # (rank > r*(q+1) implies total > r*(q+1), i.e. q >= 1) — max(q, 1)
    # keeps the unreachable branch from ever evaluating 0 as a divisor.
    big = r * (q + 1)
    rank = "(_gnt_off + _gnt_lrank)"
    tile = (
        f"CAST(CASE WHEN {rank} <= {big} "
        f"THEN ({rank} - 1) DIV {q + 1} + 1 "
        f"ELSE {r} + ({rank} - {big} - 1) DIV {max(q, 1)} + 1 "
        f"END AS INT)"
    )
    return (
        local.join(F.broadcast(off_df), "_gnt_pid")
        .withColumn(tile_col, F.expr(tile))
        .drop("_gnt_pid", "_gnt_lrank", "_gnt_off")
    )


def global_quantiles(
    rel: DataFrame,
    order: Sequence[Column],
    fracs: Sequence[tuple[int, int]],
    label_col: str = "quantile",
    rank_col: str = "value_rank",
    input_bytes: int | None = None,
    small_input_ceiling: int = SMALL_INPUT_CEILING,
) -> DataFrame:
    """EXACT type-1 (lower/ceil) quantiles over a total ``order``:
    for each rational fraction ``(num, den)`` return the row at global
    rank ``ceil(num*N/den)`` — all INTEGER arithmetic, so the selected
    rank is bit-identical on any engine (``ceil(0.9 * N)`` in floats
    picks the WRONG rank whenever 0.9*N lands on an ulp boundary, e.g.
    0.9*150000 -> 135000.0000000000333 -> 135001).

    Scale shape: the single-task alternative (``row_number`` over an
    unpartitioned window, or Spark's ``percentile`` aggregate buffering
    every value in one reducer) cannot hold a 100 TB column.  Here the
    relation is range-partitioned on ``order`` and pinned with ONE
    checkpoint (same correctness argument as :func:`global_ntile`);
    per-partition counts (partition-cardinality collect) locate which
    partitions hold target ranks, and ONLY those partitions — at most
    ``len(fracs)`` of them — are rank-numbered and probed.  Everything
    else is pruned by partition id before any window shuffle.

    Same ``input_bytes`` routing as :func:`global_ntile`: a
    statable-small source takes the plain window (identical rows).

    Returns one row per fraction: ``label_col`` (num/den as double,
    a label only — never used in arithmetic), ``rank_col`` (the
    selected 1-based global rank) and every column of ``rel``.
    Fractions out of range (rank < 1 or > N) and empty inputs yield
    no row for that fraction.
    """
    spark = rel.sparkSession
    if input_bytes is not None and input_bytes <= small_input_ceiling:
        w = Window.orderBy(*order)
        ranked = rel.withColumn(rank_col, F.row_number().over(w))
        n_df = ranked.groupBy().agg(F.max(rank_col).alias("_gq_n"))
        lab = F.array(
            *[
                F.struct(
                    F.lit(num / den).alias("q"),
                    F.expr(f"CAST((_gq_n * {num} + {den} - 1) DIV {den} AS BIGINT)").alias("r"),
                )
                for num, den in fracs
            ]
        )
        picks = (
            n_df.select(F.explode(lab).alias("p"))
            .select(
                F.col("p.q").alias(label_col),
                F.col("p.r").alias(rank_col),
            )
            .filter(F.col(rank_col) >= 1)
        )
        return picks.join(ranked, rank_col).select(
            label_col, rank_col, *rel.columns
        )
    num_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        rel.repartitionByRange(num_parts, *order)
        .withColumn("_gq_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin ONE range sampling
    )
    counts = sorted(
        (r["_gq_pid"], r["n"])
        for r in ranged.groupBy("_gq_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(c for _, c in counts)
    picks: list[tuple[float, int]] = []
    for num, den in fracs:
        r = (total * num + den - 1) // den  # ceil, integer-exact
        if 1 <= r <= total:
            picks.append((num / den, r))
    if not picks:
        return (
            ranged.drop("_gq_pid")
            .withColumn(label_col, F.lit(None).cast("double"))
            .withColumn(rank_col, F.lit(None).cast("bigint"))
            .select(label_col, rank_col, *rel.columns)
            .limit(0)
        )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    wanted = sorted({r for _, r in picks})
    targets = [
        pid
        for pid, c in counts
        if any(offsets[pid] < r <= offsets[pid] + c for r in wanted)
    ]
    off_df = spark.createDataFrame(
        [(p, offsets[p]) for p in targets], "_gq_pid int, _gq_off bigint"
    )
    pick_df = spark.createDataFrame(
        picks, f"{label_col} double, {rank_col} bigint"
    )
    local = (
        ranged.filter(F.col("_gq_pid").isin(targets))
        .withColumn(
            "_gq_lrank",
            F.row_number().over(
                Window.partitionBy("_gq_pid").orderBy(*order)
            ),
        )
        .join(F.broadcast(off_df), "_gq_pid")
        .withColumn(rank_col, F.col("_gq_off") + F.col("_gq_lrank"))
    )
    return local.join(F.broadcast(pick_df), rank_col).select(
        label_col, rank_col, *rel.columns
    )
