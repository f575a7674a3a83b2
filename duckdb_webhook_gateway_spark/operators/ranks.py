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
   moves partition BOUNDARIES, never the total order itself) — then
   ``sortWithinPartitions`` (a NARROW sort, no second exchange) and
   ``monotonically_increasing_id`` as the in-partition position (its
   value is partition_index << 33 + row index in iteration order ==
   sorted order, so local rank = mid − min(mid per partition) + 1).
2. The sorted relation is materialized ONCE (``localCheckpoint``).
   This is load-bearing for correctness, not just speed: the range
   partitioner's reservoir sample is seeded per-RDD, so two separate
   actions over the same lineage may pick DIFFERENT boundaries — the
   per-partition counts and the main pass must read the same physical
   partitioning or the offsets silently misalign.  (An exchange-reuse
   formulation without the checkpoint was prototyped in round 13 and
   rejected: if Catalyst ever fails to dedupe the two range-exchange
   subtrees, the branches sample different boundaries and the offsets
   are SILENTLY wrong — a correctness cliff for ~0.1 s local gain.)
3. Per-partition counts/offsets stay IN-PLAN (rewritten round 13; the
   original form collected them to the driver and re-entered them as a
   literal relation — one extra blocking job round per call): a
   partition-cardinality aggregate over the checkpointed relation
   (== spark.sql.shuffle.partitions rows), a RUNNING window over those
   rows ordered by partition id (bounded by construction — never
   data-cardinality), and a 1-row broadcast total.
4. global rank = (cumulative offset of the row's partition) + local
   rank, attached with a broadcast join on the partition id; the tile
   follows from the exact integer ntile formula evaluated on the
   broadcast total's COLUMNS (DIV arithmetic — no float ever decides a
   bucket, and no driver collect ever happens).

ONE shuffle of the projected relation (the range exchange) plus one
narrow in-partition sort replace the one-task global sort; every stage
is bounded by partition size, so the shape survives any scale-up.  The
round-13 sf1 decomposition (BASELINE.md) sized the replaced pieces:
the pid-hash window exchange was ~0.1 s and the counts-collect job
round ~0.2-0.3 s of the 1.18 s total.

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
    local = (
        rel.repartitionByRange(num, *order)
        .sortWithinPartitions(*order)
        .withColumn("_gnt_pid", F.spark_partition_id())
        .withColumn("_gnt_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)  # pin ONE range sampling (module doc)
    )
    # Partition-cardinality stats, IN-PLAN: the running offset window is
    # over <= spark.sql.shuffle.partitions rows by construction (never
    # data-cardinality), the total is a 1-row broadcast.  mid is frozen
    # by the checkpoint, so min(mid) per partition is consistent across
    # both consumers of `local`.
    counts = local.groupBy("_gnt_pid").agg(
        F.count(F.lit(1)).alias("_gnt_n"),
        F.min("_gnt_mid").alias("_gnt_base"),
    ).localCheckpoint(eager=False)  # offs + tot share ONE counting pass
    w_off = Window.orderBy("_gnt_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = counts.groupBy().agg(F.sum("_gnt_n").alias("_gnt_tot"))
    offs = (
        counts.withColumn(
            "_gnt_off", F.coalesce(F.sum("_gnt_n").over(w_off), F.lit(0))
        )
        .crossJoin(F.broadcast(tot))
        .select("_gnt_pid", "_gnt_base", "_gnt_off", "_gnt_tot")
    )
    # SQL ntile: first (tot % n) tiles have tot DIV n + 1 rows, the rest
    # tot DIV n.  All-integer DIV arithmetic on the broadcast total's
    # COLUMNS; the ELSE divisor q is only reachable when q > 0 (rank >
    # r*(q+1) implies total > r*(q+1), i.e. q >= 1) — greatest(q, 1)
    # keeps the unreachable branch from ever evaluating 0 as a divisor.
    # Empty input: counts/offs are empty, the join yields zero rows with
    # the tile column typed int — schema preserved.
    q = f"(_gnt_tot DIV {n_tiles})"
    r = f"(_gnt_tot % {n_tiles})"
    big = f"({r} * ({q} + 1))"
    rank = "(_gnt_off + _gnt_mid - _gnt_base + 1)"
    tile = (
        f"CAST(CASE WHEN {rank} <= {big} "
        f"THEN ({rank} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + ({rank} - {big} - 1) DIV greatest({q}, 1) + 1 "
        f"END AS INT)"
    )
    return (
        local.join(F.broadcast(offs), "_gnt_pid")
        .withColumn(tile_col, F.expr(tile))
        .drop("_gnt_pid", "_gnt_mid", "_gnt_base", "_gnt_off", "_gnt_tot")
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
    per-partition counts — IN-PLAN since round 13, no driver collect —
    locate which partitions hold target ranks, and ONLY those
    partitions (at most ``len(fracs)``) survive the broadcast-hash
    partition-id prune.  Everything else drops map-side.

    Same ``input_bytes`` routing as :func:`global_ntile`: a
    statable-small source takes the plain window (identical rows).

    Returns one row per fraction: ``label_col`` (num/den as double,
    a label only — never used in arithmetic), ``rank_col`` (the
    selected 1-based global rank) and every column of ``rel``.
    Fractions out of range (rank < 1 or > N) and empty inputs yield
    no row for that fraction; an EMPTY ``fracs`` returns a typed empty
    frame (guarded explicitly — a zero-element ``F.array`` is VOID-typed
    and the struct-field extraction below would raise).
    """
    spark = rel.sparkSession
    if not fracs:
        return (
            rel.withColumn(label_col, F.lit(None).cast("double"))
            .withColumn(rank_col, F.lit(None).cast("bigint"))
            .select(label_col, rank_col, *rel.columns)
            .limit(0)
        )
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
        .sortWithinPartitions(*order)
        .withColumn("_gq_pid", F.spark_partition_id())
        .withColumn("_gq_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)  # pin ONE range sampling
    )
    # Partition-cardinality stats IN-PLAN (rewritten round 13, the
    # global_ntile treatment: the counts collect was one blocking job
    # round per call); the running offset window is over
    # <= shuffle.partitions rows, the total is a 1-row broadcast, and
    # the picks explode against the total's COLUMN (integer-exact
    # ceil((N*num + den - 1) DIV den), never float).
    counts = ranged.groupBy("_gq_pid").agg(
        F.count(F.lit(1)).alias("_gq_n"),
        F.min("_gq_mid").alias("_gq_base"),
    ).localCheckpoint(eager=False)  # offs + tot share ONE counting pass
    w_off = Window.orderBy("_gq_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = counts.groupBy().agg(F.sum("_gq_n").alias("_gq_tot"))
    offs = counts.withColumn(
        "_gq_off", F.coalesce(F.sum("_gq_n").over(w_off), F.lit(0))
    )
    lab = F.array(
        *[
            F.struct(
                F.lit(num / den).alias("q"),
                F.expr(
                    f"CAST((_gq_tot * {num} + {den} - 1) DIV {den} "
                    "AS BIGINT)"
                ).alias("r"),
            )
            for num, den in fracs
        ]
    )
    picks = (
        tot.select(F.explode(lab).alias("p"))
        .select(
            F.col("p.q").alias(label_col), F.col("p.r").alias(rank_col)
        )
        .filter(F.col(rank_col) >= 1)
    )
    # Target location: a bounded non-equi pairing of <= num_parts offset
    # rows with <= len(fracs) picks (rank > total is excluded because no
    # partition range contains it).  The data-side prune is then an
    # EQUI broadcast join on the partition id — unprobed partitions'
    # rows drop map-side, and the cutoff row is an integer equality on
    # the mid-derived rank; no window function anywhere in the scale
    # path.
    targets = offs.join(
        F.broadcast(picks),
        (F.col("_gq_off") < F.col(rank_col))
        & (F.col(rank_col) <= F.col("_gq_off") + F.col("_gq_n")),
    ).select("_gq_pid", "_gq_base", "_gq_off", label_col, rank_col)
    hit = ranged.join(F.broadcast(targets), "_gq_pid").filter(
        F.col("_gq_off") + F.col("_gq_mid") - F.col("_gq_base") + 1
        == F.col(rank_col)
    )
    return hit.select(label_col, rank_col, *rel.columns)


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
    rows, none of the checkpoint/collect fixed cost).  An EMPTY
    ``fracs`` returns a typed empty frame (guarded — a zero-element
    ``F.array`` is VOID-typed and the extraction below would raise).
    """
    spark = rel.sparkSession
    if not fracs:
        return (
            rel.withColumn(label_col, F.lit(None).cast("double"))
            .withColumn(rank_col, F.lit(None).cast("bigint"))
            .withColumn(cum_col, F.lit(None).cast("bigint"))
            .select(label_col, rank_col, cum_col, *rel.columns)
            .limit(0)
        )
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
    # Partition-cardinality stats IN-PLAN (rewritten round 13, the
    # global_ntile treatment: the stats collect was one blocking job
    # round per call).  Exclusive prefix offsets via a running window
    # over <= shuffle.partitions rows; thresholds explode against the
    # 1-row broadcast total (integer-exact ceil DIV).  The crossing
    # partition for each threshold is located by a bounded non-equi
    # pairing of offset rows x thresholds (unique per threshold:
    # running sums are strictly increasing per partition-weight range,
    # and a zero-weight partition's empty range can never satisfy
    # woff < t <= woff + w).
    stats = ranged.groupBy("_gcc_pid").agg(
        F.count(F.lit(1)).alias("_gcc_n"),
        F.sum(F.col(weight_col)).cast("bigint").alias("_gcc_w"),
    ).localCheckpoint(eager=False)  # offs + tot share ONE counting pass
    w_offw = Window.orderBy("_gcc_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = stats.groupBy().agg(F.sum("_gcc_w").alias("_gcc_totw"))
    offs = stats.withColumn(
        "_gcc_noff", F.coalesce(F.sum("_gcc_n").over(w_offw), F.lit(0))
    ).withColumn(
        "_gcc_woff", F.coalesce(F.sum("_gcc_w").over(w_offw), F.lit(0))
    )
    lab = F.array(
        *[
            F.struct(
                F.lit(num / den).alias("q"),
                F.expr(
                    f"CAST((_gcc_totw * {num} + {den} - 1) DIV {den} "
                    "AS BIGINT)"
                ).alias("t"),
            )
            for num, den in fracs
        ]
    )
    tgts = (
        tot.select(F.explode(lab).alias("p"))
        .select(
            F.col("p.q").alias(label_col), F.col("p.t").alias("_gcc_t")
        )
        .filter(F.col("_gcc_t") >= 1)
    )
    cross = offs.join(
        F.broadcast(tgts),
        (F.col("_gcc_woff") < F.col("_gcc_t"))
        & (F.col("_gcc_t") <= F.col("_gcc_woff") + F.col("_gcc_w")),
    ).select("_gcc_pid", "_gcc_noff", "_gcc_woff", label_col, "_gcc_t")
    # Only crossing partitions (at most len(fracs)) are window-scanned:
    # the data-side prune is an EQUI broadcast join on the partition id
    # (map-side drop for every other partition).  The windows key on
    # the pinned range partition id.  The threshold rows attach AFTER
    # the windows so a partition holding two thresholds never double-
    # counts its running sum.
    pids = cross.select("_gcc_pid").distinct()
    w_run = (
        Window.partitionBy("_gcc_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rank = Window.partitionBy("_gcc_pid").orderBy(*order)
    local = (
        ranged.join(F.broadcast(pids), "_gcc_pid")
        .withColumn(
            "_gcc_run", F.sum(F.col(weight_col)).over(w_run).cast("bigint")
        )
        .withColumn("_gcc_lrank", F.row_number().over(w_rank))
    )
    # cutoff row for threshold t: running sum reaches t here and had
    # not reached it on the previous row
    hit = (
        local.join(F.broadcast(cross), "_gcc_pid")
        .withColumn(cum_col, F.col("_gcc_woff") + F.col("_gcc_run"))
        .withColumn(
            rank_col,
            (F.col("_gcc_noff") + F.col("_gcc_lrank")).cast("bigint"),
        )
        .filter(
            (F.col(cum_col) >= F.col("_gcc_t"))
            & (F.col(cum_col) - F.col(weight_col) < F.col("_gcc_t"))
        )
    )
    return hit.select(label_col, rank_col, cum_col, *rel.columns)
