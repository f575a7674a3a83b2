"""Scan-parallelism probe: should a CPU-heavy map stage repartition first?

CPU-heavy per-row operators (tokenize, shingle, hash) serialize on one
core when the scan yields fewer partitions than the cluster has slots.
The cheap driver-side probe here decides whether to pay one repartition
shuffle of the raw rows, WITHOUT forcing plan-to-RDD conversion
(``df.rdd.getNumPartitions()`` runs the full analyzer per call).

Spark splits file scans at ``spark.sql.files.maxPartitionBytes``
boundaries, so the effective scan parallelism of a file source is
roughly ``max(n_files, total_bytes / maxPartitionBytes)`` — a SINGLE
large parquet file still scans as many splits.  Counting only files
(the previous heuristic) made every single-large-file input pay a
full-corpus shuffle it didn't need.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _local_size(path: str) -> int | None:
    """Size of a scan file if it is locally statable, else None.

    ``inputFiles()`` returns URIs (``file:///...`` locally).  Remote
    filesystems (hdfs/s3) aren't statable from here without a Hadoop
    round-trip — callers fall back to file count for those.
    """
    u = urlparse(path)
    if u.scheme not in ("", "file"):
        return None
    p = u.path or path
    try:
        return os.path.getsize(p)
    except OSError:
        return None


def scan_splits(spark: SparkSession, df: DataFrame) -> int:
    """Estimated scan parallelism for a file-sourced DataFrame.

    max(file count, ceil(total_bytes / maxPartitionBytes)) when every
    file's size is statable locally; plain file count otherwise.
    Derived (non-file-scan) inputs report zero files -> returns 0, the
    "unknown, assume narrow" direction — repartitioning is the safe
    choice for a CPU-bound consumer.
    """
    files = df.inputFiles()
    if not files:
        return 0
    sizes = [_local_size(f) for f in files]
    if any(s is None for s in sizes):
        return len(files)
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    )
    total = sum(sizes)  # type: ignore[arg-type]
    return max(len(files), -(-total // max(1, max_bytes)))


_UNITS = {"": 1, "b": 1, "k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf strings: '134217728', '128MB', '1g', '512k'."""
    s = v.strip().lower()
    num = s.rstrip("kmgtb")
    suffix = s[len(num):].rstrip("b")
    try:
        return int(float(num)) * _UNITS.get(suffix, 1)
    except ValueError:
        return 128 * 2**20


def spread(
    spark: SparkSession, df: DataFrame, *cols: str
) -> DataFrame:
    """Repartition ``df`` to core count iff its scan is narrower than that.

    At cluster scale inputs arrive in many splits (or one big file whose
    byte count already yields many splits) and this is a no-op; locally a
    small single-file scan pays one shuffle of the raw rows to unlock
    full parallelism.  Optional ``cols`` hash-partition by those columns.
    """
    target = spark.sparkContext.defaultParallelism
    if scan_splits(spark, df) >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def plan_preserves_scan_rows(df: DataFrame) -> bool:
    """True iff ``df``'s optimized logical plan is just scan+project —
    i.e. its row count EQUALS the source files' footer row count.

    Whitelist, not blacklist: any node other than a projection over the
    relation (filters, joins, aggregates, limits, samples, generators)
    changes cardinality, so only plans whose every line is a
    Project/Relation qualify.  Unparseable plans report False (the
    conservative direction: callers then pay a count() job instead of
    trusting a wrong estimate).
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0]
        if not node:
            continue
        if node not in ("Project", "Relation", "LogicalRelation"):
            return False
    return True


def footer_rows(path: str) -> int | None:
    """Row count from ONE local parquet file's footer (sub-ms,
    driver-side, no Spark job); None for unreadable/directory paths.
    The single shared footer reader — ``scan_rows`` loops it over a
    frame's input files, ``workloads/datapipe.py::_footer_rows``
    delegates here for path-named tables.
    """
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def scan_rows(df: DataFrame) -> int | None:
    """Total row count from the parquet footers behind a file-sourced
    DataFrame, or None when that metadata can't be read cheaply.

    This is DRIVER-SIDE METADATA, not a Spark job: each local parquet
    footer is statted once (microseconds per file).  It is the
    PRE-FILTER scan cardinality — an UPPER BOUND for a filtered or
    aggregated frame, since ``inputFiles()`` survives any derivation.
    Whether the bound is the safe direction is the CALLER's call:
    for spill/partition sizing an over-estimate is safe; for LSH hash
    widths it is NOT (over-widening silently costs recall), so such
    callers must gate on :func:`plan_preserves_scan_rows` or pay a
    ``count()``.  None when the input is derived (no files), any file
    is remote, or any file is not parquet.
    """
    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("", "file"):
            return None
        p = u.path or f
        if not p.endswith(".parquet"):
            return None
        n = footer_rows(p)
        if n is None:
            return None
        total += n
    return total


def scan_bytes(df: DataFrame) -> int | None:
    """Total statable bytes behind a file-sourced DataFrame.

    None when the input is derived (no files) or any file is remote —
    callers treating None as "unknown" should fall back to the
    splits-only heuristic.  Used to gate repartitions that only pay for
    themselves past a work floor: a narrow scan of a tiny file should
    NOT buy a shuffle just because splits < slots.
    """
    files = df.inputFiles()
    if not files:
        return None
    sizes = [_local_size(f) for f in files]
    if any(s is None for s in sizes):
        return None
    return sum(sizes)  # type: ignore[arg-type]
