"""Data-layout operators: multi-dimensional clustering for file skipping.

Parquet scans prune files/row-groups whose column min/max statistics
exclude the query predicate.  Sorting by a single column makes its stats
tight but leaves every other column's span full-width; Z-ordering
(Morton-interleaving the bits of two normalized keys and range-sorting on
the interleave) makes BOTH columns' per-file spans narrow, so a 2-D
predicate (``x BETWEEN .. AND y BETWEEN ..``) skips most files.  At
100 TB layout is the cheapest query accelerator there is: it costs one
write-side shuffle and pays on every subsequent scan, with zero reader
cooperation needed — the stats live in standard parquet footers.

Normalization is rank-free and deterministic: each key is min/max scaled
to 16 bits from a one-row stats aggregate (broadcast), so the operator is
two jobs: tiny stats pass + range-partitioned sorted write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale16(col: Column, mn: Column, mx: Column) -> Column:
    """Min/max scale to [0, 65535] as integer; constant column -> 0."""
    span = (mx - mn).cast("double")
    pos = (col - mn).cast("double")
    return (
        F.when(span == 0, F.lit(0))
        .otherwise(F.least(F.floor(pos / span * 65536), F.lit(65535)))
        .cast("bigint")
    )


def morton_interleave(x16: Column, y16: Column) -> Column:
    """Bit-interleave two 16-bit integers into a 32-bit Morton code.

    Pure integer expression (32 shift/mask/or terms) — stays inside
    whole-stage codegen, no UDF.
    """
    x = x16.cast("bigint")
    y = y16.cast("bigint")
    z = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    for i in range(16):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1))
    return z


def write_zordered(
    df: DataFrame, path: str, xcol: str, ycol: str, n_files: int = 16
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of (xcol, ycol).

    Plan: one stats aggregate (min/max of both keys, 1 row, broadcast
    into the scale expressions), then ``repartitionByRange`` on the
    Morton code (range exchange = contiguous Z-ranges per file) with an
    in-partition sort.  Each output file covers a compact 2-D tile, so
    its footer min/max on BOTH keys is narrow.
    """
    stats = df.agg(
        F.min(xcol).alias("_xmn"),
        F.max(xcol).alias("_xmx"),
        F.min(ycol).alias("_ymn"),
        F.max(ycol).alias("_ymx"),
    )
    with_z = df.join(F.broadcast(stats)).withColumn(
        "_z",
        morton_interleave(
            _scale16(F.col(xcol), F.col("_xmn"), F.col("_xmx")),
            _scale16(F.col(ycol), F.col("_ymn"), F.col("_ymx")),
        ),
    )
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_xmn", "_xmx", "_ymn", "_ymx", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Rewrite a directory of (typically many small) parquet files into
    balanced files of roughly ``target_file_bytes`` each; returns the
    output file count.

    Small files are the silent scan killer at scale: every file costs a
    driver listing entry, a footer read, and a task floor, so a
    landing-zone table with 10^6 kilobyte files can spend more time on
    metadata than data.  Sizing uses the REAL on-disk bytes (footer
    metadata sum, driver-side, no Spark job), not row-count heuristics,
    so compression ratios carry over.  ``sort_col`` optionally
    re-clusters during the rewrite (compaction is the natural moment to
    fix ordering — the data is already being rewritten).
    """
    import glob
    import os

    # recursive: hive-partitioned layouts keep part files in subdirs —
    # a flat glob would size them as 0 bytes and funnel the whole
    # dataset through repartition(1)
    files = glob.glob(
        os.path.join(src_path, "**", "*.parquet"), recursive=True
    )
    total = sum(os.path.getsize(f) for f in files)
    if total == 0:
        # non-local path (s3://, hdfs://) or nothing visible to the
        # driver's filesystem: size through Hadoop's FileSystem instead
        # of silently collapsing to one output file
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(src_path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        total = fs.getContentSummary(hpath).getLength()
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src_path)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    return n_out
