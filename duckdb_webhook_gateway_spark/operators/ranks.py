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
    n_rows: int | None = None,
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
        if n_rows is not None:
            # caller knows |rel| (e.g. an unfiltered table's parquet
            # footer): target ranks become driver-side literals — the
            # in-plan N subtree (which re-executes the window lineage)
            # disappears entirely
            lits = []
            for num, den in fracs:
                r = (n_rows * num + den - 1) // den
                if 1 <= r <= n_rows:
                    lits.append((num / den, r))
            if not lits:
                return (
                    ranked.withColumn(label_col, F.lit(None).cast("double"))
                    .select(label_col, rank_col, *rel.columns)
                    .limit(0)
                )
            pick_df = spark.createDataFrame(
                lits, f"{label_col} double, {rank_col} bigint"
            )
            return (
                ranked.join(
                    F.broadcast(pick_df), rank_col
                ).select(label_col, rank_col, *rel.columns)
            )
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


def global_cumulative_cutoff(
    rel: DataFrame,
    order: Sequence[Column],
    weight_col: str,
    fracs: Sequence[tuple[int, int]],
    label_col: str = "coverage",
    rank_col: str = "cutoff_rank",
    cum_col: str = "cum_weight",
    input_bytes: int | None = None,
    small_input_ceiling: int = SMALL_INPUT_CEILING,
) -> DataFrame:
    """Cumulative-mass cutoffs over a total ``order``: for each rational
    fraction ``(num, den)`` return the FIRST row (in order) at which the
    running sum of ``weight_col`` reaches ``num/den`` of the total —
    e.g. "how many distinct tokens cover 95% of all token occurrences"
    (Zipf truncation / nucleus-style vocabulary cutoffs).

    The one-task formulation is ``SUM(w) OVER (ORDER BY ...)`` — a
    global running window, unbounded at scale.  Here: range-partition
    on ``order`` (pinned with ONE checkpoint, same argument as
    :func:`global_ntile`), collect per-partition weight SUMS and row
    counts (partition-cardinality), turn them into exclusive prefix
    offsets, and compute each row's global running sum as
    (weight offset of its partition) + (running sum within its
    partition).  The threshold test and cutoff pick then happen inside
    the partition that crosses each target — located on the driver from
    the offsets, so only crossing partitions (at most ``len(fracs)``)
    are window-scanned at all, mirroring :func:`global_quantiles`.

    Thresholds are integer-exact when ``weight_col`` is integral:
    target = ceil(num*W/den) compares against BIGINT running sums; no
    float ever decides the cutoff.  (Float weights would reintroduce
    summation-order drift — callers should scale to integers first,
    the repo-wide determinism rule.)

    Returns one row per fraction: ``label_col`` (num/den as double,
    label only), ``rank_col`` (1-based rank of the cutoff row),
    ``cum_col`` (the running sum at that row) and every ``rel`` column
    of the cutoff row.

    Same ``input_bytes`` routing as :func:`global_ntile`: a
    statable-small source takes the plain running window (identical
    rows, none of the checkpoint/collect fixed cost).
    """
    spark = rel.sparkSession
    if input_bytes is not None and input_bytes <= small_input_ceiling:
        w_run = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked = rel.withColumn(
            cum_col, F.sum(F.col(weight_col)).over(w_run).cast("bigint")
        ).withColumn(
            rank_col,
            F.row_number().over(Window.orderBy(*order)).cast("bigint"),
        )
        tot = ranked.groupBy().agg(F.max(cum_col).alias("_gcc_w"))
        lab = F.array(
            *[
                F.struct(
                    F.lit(num / den).alias("q"),
                    F.expr(
                        f"CAST((_gcc_w * {num} + {den} - 1) DIV {den} AS BIGINT)"
                    ).alias("t"),
                )
                for num, den in fracs
            ]
        )
        tg = (
            tot.select(F.explode(lab).alias("p"))
            .select(
                F.col("p.q").alias(label_col), F.col("p.t").alias("_gcc_t")
            )
            .filter(F.col("_gcc_t") >= 1)
        )
        hit = ranked.join(
            F.broadcast(tg),
            (F.col(cum_col) >= F.col("_gcc_t"))
            & (F.col(cum_col) - F.col(weight_col) < F.col("_gcc_t")),
        )
        return hit.select(label_col, rank_col, cum_col, *rel.columns)
    num_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        rel.repartitionByRange(num_parts, *order)
        .withColumn("_gcc_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin ONE range sampling
    )
    stats = sorted(
        (r["_gcc_pid"], r["n"], r["w"])
        for r in ranged.groupBy("_gcc_pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(weight_col)).cast("bigint").alias("w"),
        )
        .collect()
    )
    total_w = sum(w for _, _, w in stats)
    targets: list[tuple[float, int]] = []  # (label, threshold)
    for num, den in fracs:
        t = (total_w * num + den - 1) // den  # ceil, integer-exact
        if 0 < t <= total_w:
            targets.append((num / den, t))
    if not targets:
        return (
            ranged.drop("_gcc_pid")
            .withColumn(label_col, F.lit(None).cast("double"))
            .withColumn(rank_col, F.lit(None).cast("bigint"))
            .withColumn(cum_col, F.lit(None).cast("bigint"))
            .select(label_col, rank_col, cum_col, *rel.columns)
            .limit(0)
        )
    # exclusive prefix offsets; find the partition whose weight range
    # crosses each threshold (running sums are strictly increasing per
    # row only when weights are positive — zero-weight rows make the
    # crossing row the FIRST row reaching the target, which the strict
    # < on the previous running sum below still selects correctly)
    n_off, w_off, pids = {}, {}, []
    acc_n = acc_w = 0
    for pid, n, w in stats:
        n_off[pid], w_off[pid] = acc_n, acc_w
        acc_n += n
        acc_w += w
    cross = {}  # pid -> list[(label, threshold)]
    for label, t in targets:
        for pid, n, w in stats:
            if w_off[pid] < t <= w_off[pid] + w:
                cross.setdefault(pid, []).append((label, t))
                break
    pid_list = sorted(cross)
    off_df = spark.createDataFrame(
        [(p, n_off[p], w_off[p]) for p in pid_list],
        "_gcc_pid int, _gcc_noff bigint, _gcc_woff bigint",
    )
    tgt_df = spark.createDataFrame(
        [(p, lab, t) for p in pid_list for lab, t in cross[p]],
        f"_gcc_pid int, {label_col} double, _gcc_t bigint",
    )
    w_run = (
        Window.partitionBy("_gcc_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("_gcc_pid").orderBy(*order)
    local = (
        ranged.filter(F.col("_gcc_pid").isin(pid_list))
        .withColumn("_gcc_run", F.sum(F.col(weight_col)).over(w_run).cast("bigint"))
        .withColumn("_gcc_lrank", F.row_number().over(w_rank))
        .join(F.broadcast(off_df), "_gcc_pid")
        .withColumn(cum_col, F.col("_gcc_woff") + F.col("_gcc_run"))
        .withColumn(rank_col, F.col("_gcc_noff") + F.col("_gcc_lrank"))
    )
    # cutoff row for threshold t: running sum reaches t here and had
    # not reached it on the previous row
    hit = local.join(F.broadcast(tgt_df), "_gcc_pid").filter(
        (F.col(cum_col) >= F.col("_gcc_t"))
        & (F.col(cum_col) - F.col(weight_col) < F.col("_gcc_t"))
    )
    return hit.select(label_col, rank_col, cum_col, *rel.columns)
